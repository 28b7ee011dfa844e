"""Live query server (viz.server): service logic + HTTP round trips."""

import base64
import gzip
import json
import pickle
import threading
import urllib.request

import numpy as np
import pytest

from openobj_tpu.viz import server as S
from openobj_tpu.viz import viewer


@pytest.fixture
def bundle(tmp_path):
    rng = np.random.default_rng(0)
    b = {}
    for oid in (4, 7):
        v = rng.normal(size=(20, 3)).astype(np.float32)
        f = rng.integers(0, 20, (12, 3)).astype(np.int32)
        clip = rng.normal(size=(3, 512)).astype(np.float32)
        cap = rng.normal(size=(3, 384)).astype(np.float32)
        b[oid] = {
            "mesh": {"vertices": v, "faces": f},
            "color": rng.integers(0, 255, (20, 3)).astype(np.uint8),
            "part_feat": rng.normal(size=(20, 512)).astype(np.float32),
            "clip_feat": clip / np.linalg.norm(clip, axis=-1, keepdims=True),
            "caption_feat": cap / np.linalg.norm(cap, axis=-1, keepdims=True),
            "class_id": oid % 3,
        }
    path = str(tmp_path / "map_vis.pkl.gz")
    with gzip.open(path, "wb") as f:
        pickle.dump(b, f)
    return b, path


@pytest.fixture
def service(bundle):
    b, _ = bundle
    clip_enc, sbert_enc = viewer.make_encoders("fake")
    return S.QueryService(b, clip_enc, sbert_enc)


class TestQueryService:
    def test_object_query(self, service):
        out = service.query("a red chair")
        assert set(out["colors"]) == {"4", "7"}
        for oid in ("4", "7"):
            raw = base64.b64decode(out["colors"][oid])
            assert len(raw) == 20 * 3
        assert len(out["ranked"]) == 2
        # normalized scores in [0, 1]
        assert all(0.0 <= s <= 1.0 for s in out["scores"].values())

    def test_part_query(self, service):
        out = service.query("a red chair", part="leg", topk=1)
        assert out["part"] == "leg"
        # picked object gets a heat map, the other grey
        cols = {o: np.frombuffer(base64.b64decode(c), np.uint8).reshape(20, 3)
                for o, c in out["colors"].items()}
        grey = np.tile(np.array([165, 165, 165], np.uint8), (20, 1))
        n_grey = sum(int(np.array_equal(c, grey)) for c in cols.values())
        assert n_grey == 1

    def test_html_has_live_box(self, service):
        h = service.html()
        assert "qtext" in h and "/query?text=" in h
        assert service.html() is h  # cached

    def test_objects_metadata(self, service):
        out = service.objects()
        assert out["4"]["n_vertices"] == 20
        assert out["4"]["has_part_feat"]


class TestHTTP:
    @pytest.fixture
    def srv(self, service):
        httpd = S.make_server(service, port=0)
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{httpd.server_address[1]}"
        httpd.shutdown()

    def _get(self, url):
        with urllib.request.urlopen(url, timeout=10) as r:
            return r.status, r.read()

    def test_index(self, srv):
        code, body = self._get(srv + "/")
        assert code == 200
        assert b"openobj-tpu map" in body and b"qgo" in body

    def test_query_roundtrip(self, srv):
        code, body = self._get(srv + "/query?text=wooden%20table&topk=1")
        assert code == 200
        j = json.loads(body)
        assert j["query"] == "wooden table"
        assert set(j["colors"]) == {"4", "7"}

    def test_bad_topk_400(self, srv):
        with pytest.raises(urllib.error.HTTPError) as e:
            self._get(srv + "/query?text=chair&topk=abc")
        assert e.value.code == 400

    def test_missing_text_400(self, srv):
        with pytest.raises(urllib.error.HTTPError) as e:
            self._get(srv + "/query")
        assert e.value.code == 400

    def test_unknown_path_404(self, srv):
        with pytest.raises(urllib.error.HTTPError) as e:
            self._get(srv + "/nope")
        assert e.value.code == 404

    def test_cli_wiring(self, bundle, srv):
        """main() parses args and builds the same service (smoke: don't
        bind, just check the parser path by invoking with --help)."""
        with pytest.raises(SystemExit) as e:
            S.main(["--help"])
        assert e.value.code == 0
