"""Export bundle + open-vocab query API tests (reference gen_map_vis +
vis_interaction math)."""

import numpy as np
import pytest

from openobj_tpu.viz import export, query


def _unit(v):
    v = np.asarray(v, np.float64)
    return v / np.linalg.norm(v)


def _fake_bundle(rng):
    """Two objects with known CLIP/caption features + part fields."""
    chair_clip = _unit(rng.normal(size=512))
    chair_cap = _unit(rng.normal(size=384))
    table_clip = _unit(rng.normal(size=512))
    table_cap = _unit(rng.normal(size=384))
    leg_feat = _unit(rng.normal(size=512))
    seat_feat = _unit(rng.normal(size=512))
    pf_chair = np.stack([leg_feat] * 10 + [seat_feat] * 10)
    bundle = {
        4: {
            "mesh": {"vertices": rng.normal(size=(20, 3)), "faces": np.zeros((2, 3), int)},
            "color": None,
            "part_feat": pf_chair.astype(np.float32),
            "clip_feat": np.stack([chair_clip + rng.normal(size=512) * 0.01
                                   for _ in range(5)]),
            "caption_feat": np.stack([chair_cap + rng.normal(size=384) * 0.01
                                      for _ in range(5)]),
            "class_id": 7,
        },
        5: {
            "mesh": {"vertices": rng.normal(size=(8, 3)), "faces": np.zeros((2, 3), int)},
            "color": None,
            "part_feat": np.stack([_unit(rng.normal(size=512))] * 8).astype(np.float32),
            "clip_feat": table_clip[None],
            "caption_feat": table_cap[None],
            "class_id": 9,
        },
    }
    encoders = {
        "chair": (chair_clip, chair_cap),
        "table": (table_clip, table_cap),
        "leg": (leg_feat, None),
        "seat": (seat_feat, None),
    }
    return bundle, encoders


@pytest.fixture
def bundle_enc(rng):
    return _fake_bundle(rng)


def _mk_encoders(enc):
    def clip_enc(texts):
        return np.stack([enc[t][0] for t in texts])

    def sbert_enc(texts):
        return np.stack([enc[t][1] if enc[t][1] is not None
                         else np.zeros(384) for t in texts])

    return clip_enc, sbert_enc


class TestQuery:
    def test_object_retrieval(self, bundle_enc):
        bundle, enc = bundle_enc
        clip_enc, sbert_enc = _mk_encoders(enc)
        scores = query.query_objects("chair", bundle, clip_enc, sbert_enc)
        assert scores[4] > scores[5]
        assert scores[4] > 0.9  # 0.8 * ~1.0 + 0.2 * ~1.0
        scores_t = query.query_objects("table", bundle, clip_enc, sbert_enc)
        assert scores_t[5] > scores_t[4]

    def test_top_k(self, bundle_enc):
        bundle, enc = bundle_enc
        clip_enc, sbert_enc = _mk_encoders(enc)
        top = query.query_objects("chair", bundle, clip_enc, sbert_enc, top_k=1)
        assert list(top.keys()) == [4]

    def test_part_query(self, bundle_enc):
        bundle, enc = bundle_enc
        clip_enc, sbert_enc = _mk_encoders(enc)
        out = query.query_part("chair", "leg", bundle, clip_enc, sbert_enc)
        assert set(out.keys()) == {4}
        sims = out[4]
        assert sims[:10].mean() > 0.9   # leg vertices
        assert sims[:10].mean() > sims[10:].mean() + 0.3

    def test_pca_colors(self, bundle_enc, rng):
        pf = rng.normal(size=(50, 512)).astype(np.float32)
        colors = query.part_feature_pca_colors(pf)
        assert colors.shape == (50, 3)
        assert colors.min() >= 0 and colors.max() <= 1 + 1e-9


class TestSemantics:
    def test_caption_wins_when_confident(self, rng):
        class_clip = np.stack([_unit(rng.normal(size=512)) for _ in range(4)])
        class_cap = np.stack([_unit(rng.normal(size=384)) for _ in range(4)])
        # observations agree with class 2 via caption, class 1 via clip
        obs_cap = np.stack([class_cap[2] + rng.normal(size=384) * 0.01
                            for _ in range(4)])
        obs_clip = np.stack([class_clip[1] + rng.normal(size=512) * 0.01
                             for _ in range(4)])
        cid = query.assign_semantics(obs_clip, obs_cap, class_clip, class_cap)
        assert cid == 2  # caption confident -> caption wins

    def test_clip_fallback(self, rng):
        class_clip = np.stack([_unit(rng.normal(size=512)) for _ in range(4)])
        class_cap = np.stack([_unit(rng.normal(size=384)) for _ in range(4)])
        obs_clip = np.stack([class_clip[3] + rng.normal(size=512) * 0.01
                             for _ in range(3)])
        obs_cap = np.stack([_unit(rng.normal(size=384))  # unrelated captions
                            for _ in range(3)])
        cid = query.assign_semantics(
            obs_clip, obs_cap, class_clip, class_cap, caption_confidence=0.99
        )
        assert cid == 3


class TestBundleIO:
    def test_save_load(self, bundle_enc, tmp_path):
        bundle, _ = bundle_enc
        p = str(tmp_path / "map_vis.pkl.gz")
        export.save_map_bundle(p, bundle)
        back = export.load_map_bundle(p)
        assert set(back.keys()) == {4, 5}
        np.testing.assert_array_equal(
            back[4]["part_feat"], bundle[4]["part_feat"]
        )
        assert back[4]["class_id"] == 7


class TestRetrievalMetrics:
    def test_topk_and_mrr(self):
        from openobj_tpu.eval import retrieval_metrics

        scores = [
            {4: 0.9, 5: 0.5, 6: 0.1},   # gt 4 at rank 1
            {4: 0.2, 5: 0.8, 6: 0.5},   # gt 6 at rank 2
            {4: 0.3, 5: 0.9, 6: 0.6},   # gt [5, 6]: 5 at rank 1
        ]
        out = retrieval_metrics(scores, [4, 6, [5, 6]], ks=(1, 3))
        assert out["top1_acc"] == pytest.approx(2 / 3)
        assert out["top3_acc"] == 1.0
        assert out["mrr"] == pytest.approx((1 + 1 / 2 + 1) / 3)
