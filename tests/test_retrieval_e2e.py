"""End-to-end open-vocabulary retrieval QUALITY on structured fakes.

The unit tests (test_viz_query.py) pin the query FORMULA
(0.2 sbert + 0.8 clip, reference vis_interaction.py:356-438); this module
scores retrieval quality through the full deployed path. A 12-object map
bundle is built from semantically STRUCTURED fake encoders — orthonormal
class anchors in CLIP (512-d) and SBERT (384-d) space, per-object
observation stacks with within-class noise plus junk outliers (so the
DBSCAN majority-cluster mean has real work to do), and 3 orthonormal part
anchors painting vertex regions — then round-tripped through
save_map_bundle -> load_map_bundle, queried, and served over real HTTP:

  * text->object retrieval: recall@1 / top-k / MRR over every class text
    (eval.retrieval_metrics, the paper's retrieval task) + per-class
    precision@|class|;
  * object+part query: per-vertex localization accuracy over the 3 part
    types on every object (reference vis_interaction.py:410-438);
  * the same queries through viz.server.QueryService and an actual HTTP
    round trip, asserting the served ranking matches the direct call.
"""

import json
import threading
import urllib.parse
import urllib.request

import numpy as np
import pytest

from openobj_tpu.eval import retrieval_metrics
from openobj_tpu.viz import export, query
from openobj_tpu.viz import server as S

# class name -> object ids (12 objects, repeated classes so top-k has to
# rank whole equivalence groups, not just find one hit)
CLASSES = {
    "chair": [3, 4, 5],
    "table": [6, 7, 8],
    "lamp": [9, 10],
    "sofa": [11, 12],
    "plant": [13, 14],
}
PARTS = ("leg", "seat", "back")     # 3 part types, painted on every object
N_OBS = 8                           # observations per object...
N_JUNK = 2                          # ...of which this many are pure junk
OBS_NOISE = 0.3                     # within-class observation noise norm
PART_NOISE = 0.25                   # per-vertex part-feature noise norm
V_PER_PART = 40                     # vertices per part region


def _orthonormal(rng, dim, n):
    q, _ = np.linalg.qr(rng.normal(size=(dim, n)))
    return q.T.astype(np.float64)   # [n, dim] rows orthonormal


def _noisy(rng, anchor, scale):
    v = anchor + rng.normal(size=anchor.shape) * (scale / np.sqrt(anchor.size))
    return v / np.linalg.norm(v)


@pytest.fixture(scope="module")
def world():
    """Anchors, encoders, bundle (post save/load roundtrip), GT labels."""
    rng = np.random.default_rng(7)
    names = list(CLASSES)
    clip_anchors = _orthonormal(rng, 512, len(names) + len(PARTS))
    class_clip = dict(zip(names, clip_anchors[: len(names)]))
    part_clip = dict(zip(PARTS, clip_anchors[len(names):]))
    class_sbert = dict(zip(names, _orthonormal(rng, 384, len(names))))

    bundle = {}
    part_labels = {}                # oid -> [V] region index into PARTS
    for cname, oids in CLASSES.items():
        for oid in oids:
            obs_c = [_noisy(rng, class_clip[cname], OBS_NOISE)
                     for _ in range(N_OBS - N_JUNK)]
            obs_s = [_noisy(rng, class_sbert[cname], OBS_NOISE)
                     for _ in range(N_OBS - N_JUNK)]
            for _ in range(N_JUNK):  # junk the majority cluster must drop
                obs_c.append(_noisy(rng, np.zeros(512), 1.0))
                obs_s.append(_noisy(rng, np.zeros(384), 1.0))
            labels = np.repeat(np.arange(len(PARTS)), V_PER_PART)
            pf = np.stack([
                _noisy(rng, part_clip[PARTS[r]], PART_NOISE) for r in labels
            ])
            nv = len(labels)
            bundle[oid] = {
                "mesh": {
                    "vertices": rng.normal(size=(nv, 3)).astype(np.float32),
                    "faces": np.stack(
                        [np.arange(nv - 2), np.arange(1, nv - 1),
                         np.arange(2, nv)], axis=1).astype(np.uint32),
                },
                "color": None,
                "part_feat": pf.astype(np.float32),
                "clip_feat": np.stack(obs_c).astype(np.float32),
                "caption_feat": np.stack(obs_s).astype(np.float32),
                "class_id": names.index(cname),
            }
            part_labels[oid] = labels

    def clip_enc(texts):
        return np.stack([class_clip.get(t, part_clip.get(t)) for t in texts])

    def sbert_enc(texts):
        return np.stack([class_sbert.get(t, np.zeros(384)) for t in texts])

    return {
        "bundle": bundle, "clip_enc": clip_enc, "sbert_enc": sbert_enc,
        "part_labels": part_labels,
    }


@pytest.fixture(scope="module")
def loaded(world, tmp_path_factory):
    """The bundle as consumers see it: through the pkl.gz contract."""
    path = str(tmp_path_factory.mktemp("mapvis") / "map_vis.pkl.gz")
    export.save_map_bundle(path, world["bundle"])
    return export.load_map_bundle(path)


class TestObjectRetrieval:
    def test_recall_and_mrr_over_all_class_texts(self, world, loaded):
        scores, gts = [], []
        for cname, oids in CLASSES.items():
            scores.append(query.query_objects(
                cname, loaded, world["clip_enc"], world["sbert_enc"]))
            gts.append(oids)
        m = retrieval_metrics(scores, gts, ks=(1, 3))
        assert m["top1_acc"] == 1.0, m
        assert m["top3_acc"] == 1.0, m
        assert m["mrr"] == 1.0, m

    def test_whole_class_fills_the_top_k(self, world, loaded):
        # stronger than recall: precision@|class| == 1 for every class
        for cname, oids in CLASSES.items():
            s = query.query_objects(
                cname, loaded, world["clip_enc"], world["sbert_enc"])
            top = sorted(s, key=s.get, reverse=True)[: len(oids)]
            assert set(top) == set(oids), (cname, top, s)

    def test_margin_survives_junk_observations(self, world, loaded):
        # majority-cluster mean must shrug off the N_JUNK outliers: the
        # in-class score stays near 1 and the class gap stays wide
        for cname, oids in CLASSES.items():
            s = query.query_objects(
                cname, loaded, world["clip_enc"], world["sbert_enc"])
            in_c = [s[o] for o in oids]
            out_c = [v for o, v in s.items() if o not in oids]
            assert min(in_c) > 0.85, (cname, s)
            assert min(in_c) - max(out_c) > 0.4, (cname, s)


class TestPartLocalization:
    def test_vertex_argmax_accuracy_all_objects(self, world, loaded):
        """For every object and its class text, score all 3 part texts and
        check the per-vertex argmax recovers the painted region."""
        accs = []
        for cname, oids in CLASSES.items():
            k = len(oids)
            per_part = {
                p: query.query_part(
                    cname, p, loaded, world["clip_enc"], world["sbert_enc"],
                    top_k_objects=k)
                for p in PARTS
            }
            for oid in oids:
                assert all(oid in per_part[p] for p in PARTS)
                sims = np.stack([per_part[p][oid] for p in PARTS])  # [3, V]
                pred = np.argmax(sims, axis=0)
                accs.append(float(
                    np.mean(pred == world["part_labels"][oid])))
        assert len(accs) == sum(len(v) for v in CLASSES.values())
        assert min(accs) >= 0.95, accs

    def test_part_scores_separate_regions(self, world, loaded):
        s = query.query_part("chair", "leg", loaded, world["clip_enc"],
                             world["sbert_enc"], top_k_objects=1)
        (oid, sim), = s.items()
        labels = world["part_labels"][oid]
        assert sim[labels == 0].mean() - sim[labels != 0].mean() > 0.5


class TestServedPath:
    @pytest.fixture(scope="class")
    def base_url(self, world, loaded):
        service = S.QueryService(
            loaded, world["clip_enc"], world["sbert_enc"])
        httpd = S.make_server(service, port=0)
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{httpd.server_address[1]}"
        httpd.shutdown()

    def _get(self, url):
        with urllib.request.urlopen(url, timeout=10) as r:
            return json.loads(r.read())

    def test_served_ranking_matches_direct(self, world, loaded, base_url):
        for cname, oids in CLASSES.items():
            out = self._get(
                f"{base_url}/query?text={urllib.parse.quote(cname)}&topk=3")
            direct = query.query_objects(
                cname, loaded, world["clip_enc"], world["sbert_enc"])
            ranked_direct = sorted(direct, key=direct.get, reverse=True)
            assert [o for o, _ in out["ranked"]] == ranked_direct
            assert set(o for o, _ in out["ranked"][: len(oids)]) == set(oids)

    def test_served_part_query_heats_picked_greys_rest(
            self, world, loaded, base_url):
        import base64

        out = self._get(f"{base_url}/query?text=table&part=seat&topk=2")
        assert out["part"] == "seat"
        # every object gets a coloring; picked ones carry per-vertex heat,
        # the rest the flat grey 165 (viewer.bake_part_query)
        assert set(map(int, out["colors"])) == set(loaded)
        picked = {o for o, _ in out["ranked"][:2]}
        assert picked == set(CLASSES["table"][:2]) or picked <= set(
            CLASSES["table"])
        for oid, b in out["colors"].items():
            rgb = np.frombuffer(base64.b64decode(b), np.uint8).reshape(-1, 3)
            if int(oid) in picked:
                assert len(np.unique(rgb, axis=0)) > 1     # real heat map
            else:
                assert (rgb == 165).all()

    def test_objects_endpoint_metadata(self, base_url):
        out = self._get(f"{base_url}/objects")
        assert len(out) == sum(len(v) for v in CLASSES.values())
        for cname, oids in CLASSES.items():
            for oid in oids:
                e = out[str(oid)]
                assert e["has_part_feat"]
                assert e["class_id"] == list(CLASSES).index(cname)
