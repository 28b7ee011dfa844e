"""Interactive map viewer: self-contained HTML (three.js) + CLI.

The reference serves its map through an Open3D ``VisualizerWithKeyCallback``
window (/root/reference/visualization/vis_interaction.py) with key-driven
modes. Open3D is a desktop GL dependency that makes no sense for a TPU pod
workflow, so this framework renders the same interactions into a single
self-contained HTML file (three.js; rotate/zoom in any browser) plus a
headless CLI:

  reference key -> this viewer
    R  vertex RGB                -> mode button / key R
    I  instance colors           -> key I
    S  class (semantic) colors   -> key S (needs a class color YAML or
                                    generated palette, viz.colors)
    O  part-feature PCA RGB      -> key O (per-object PCA, :205-215)
    C  ceiling toggle            -> key C (min-vertex-height > 1 m
                                    heuristic, :150-161)
    A  object bboxes             -> key A
    H  hide all but query hits   -> key H
    F  text query                -> --query "..." bakes a similarity
                                    coloring (0.2 sbert + 0.8 clip,
                                    rainbow or top-k red, :322-376)
    P  object+part query         -> --query + --part-query bakes the
                                    per-vertex part-field similarity
                                    (:378-438)
    viewpoint save/restore       -> keys V / B (browser localStorage)

Queries run at export time (text encoders are injectable; see
``make_encoders``) and are baked into the HTML as extra colorings — the
HTML itself needs no model weights or server.
"""

from __future__ import annotations

import argparse
import base64
import json
import os

import numpy as np

from openobj_tpu.viz import colors as C
from openobj_tpu.viz import query as Q
from openobj_tpu.viz.export import load_map_bundle


# --------------------------------------------------------------------------- #
# colorings
# --------------------------------------------------------------------------- #


def bundle_colorings(bundle: dict[int, dict], class_colors=None) -> dict:
    """mode -> {obj_id: [V, 3] uint8} for the static modes (rgb / instance /
    class / part-PCA)."""
    modes: dict[str, dict] = {"rgb": {}, "instance": {}, "class": {}, "partpca": {}}
    for oid, e in bundle.items():
        v = e["mesh"]["vertices"].shape[0]
        rgb = e.get("color")
        modes["rgb"][oid] = (
            rgb.astype(np.uint8) if rgb is not None
            else np.full((v, 3), 180, np.uint8)
        )
        modes["instance"][oid] = np.tile(C.instance_color(oid), (v, 1))
        if class_colors is not None and e.get("class_id") is not None:
            # the reference viewer looks up mapping[class_id + 1]
            # (vis_interaction.py:284)
            col = class_colors.color_of(int(e["class_id"]) + 1)
        else:
            col = np.array([128, 128, 128], np.uint8)
        modes["class"][oid] = np.tile(col, (v, 1))
        pf = e.get("part_feat")
        if pf is not None and pf.shape[0] == v and pf.shape[0] >= 3:
            modes["partpca"][oid] = (
                Q.part_feature_pca_colors(pf) * 255
            ).astype(np.uint8)
        else:
            modes["partpca"][oid] = modes["rgb"][oid]
    return modes


def bake_object_query(bundle, scores: dict[int, float], top_k: int | None = None):
    """Similarity coloring: rainbow heat over all objects, or top-k red
    (reference :322-376)."""
    out = {}
    norm = C.normalize_scores(scores)
    if top_k is not None:
        top = set(sorted(scores, key=scores.get, reverse=True)[:top_k])
    for oid, e in bundle.items():
        v = e["mesh"]["vertices"].shape[0]
        if top_k is not None:
            col = (np.array([255, 40, 40], np.uint8) if oid in top
                   else np.array([165, 165, 165], np.uint8))
            out[oid] = np.tile(col, (v, 1))
        else:
            out[oid] = np.tile(
                C.rainbow_colormap(np.asarray([norm.get(oid, 0.0)]))[0], (v, 1)
            )
    return out


def bake_part_query(bundle, part_scores: dict[int, np.ndarray]):
    """Per-vertex heat on the picked objects; everything else grey
    (reference :410-438)."""
    out = {}
    for oid, e in bundle.items():
        v = e["mesh"]["vertices"].shape[0]
        if oid in part_scores:
            s = np.asarray(part_scores[oid], np.float64)
            s = (s - s.min()) / max(s.max() - s.min(), 1e-9)
            out[oid] = C.rainbow_colormap(s)
        else:
            out[oid] = np.tile(np.array([165, 165, 165], np.uint8), (v, 1))
    return out


# --------------------------------------------------------------------------- #
# encoders
# --------------------------------------------------------------------------- #


def make_encoders(kind: str, vocab_path: str | None = None):
    """(clip_text_encoder, sbert_text_encoder).

    kind:
      * "hf"    — live transformers CLIP/SBERT (needs local weights);
      * "vocab" — precomputed vocabulary npz {"terms": [str...],
                  "clip": [N,512], "sbert": [N,384]}; nearest exact-match;
      * "fake"  — deterministic hashing projections (demos/tests).
    """
    if kind == "hf":
        from openobj_tpu.perception.encoders import HFClipEncoder, HFSbertEncoder

        clip, sbert = HFClipEncoder(), HFSbertEncoder()
        return clip.encode_texts, sbert.encode_texts
    if kind == "vocab":
        z = np.load(vocab_path, allow_pickle=True)
        terms = {str(t): i for i, t in enumerate(z["terms"])}

        def enc(mat):
            def f(texts):
                idx = [terms[t] for t in texts]
                return mat[idx]
            return f

        return enc(z["clip"]), enc(z["sbert"])
    if kind == "fake":
        import hashlib

        def hashing_encoder(dim):
            def f(texts):
                out = np.empty((len(texts), dim), np.float32)
                for i, t in enumerate(texts):
                    # hashlib, not hash(): stable across processes
                    # (PYTHONHASHSEED), so fake-encoded artifacts match
                    # fake-encoded queries from any later process
                    digest = hashlib.sha256(
                        f"openobj:{t}".encode()
                    ).digest()
                    rng = np.random.default_rng(
                        int.from_bytes(digest[:8], "little")
                    )
                    v = rng.normal(size=dim)
                    out[i] = v / np.linalg.norm(v)
                return out
            return f

        return hashing_encoder(512), hashing_encoder(384)
    raise ValueError(f"unknown encoder kind {kind!r}")


# --------------------------------------------------------------------------- #
# HTML emission
# --------------------------------------------------------------------------- #


def _b64(a: np.ndarray) -> str:
    return base64.b64encode(np.ascontiguousarray(a).tobytes()).decode()


_HTML = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>
 body {{ margin:0; background:#101014; color:#ddd; font:13px sans-serif; }}
 #hud {{ position:fixed; top:8px; left:8px; background:#000a; padding:8px 10px;
        border-radius:6px; max-width:330px; }}
 #hud b {{ color:#8cf; }}
 select {{ background:#222; color:#ddd; border:1px solid #555; }}
</style></head><body>
<div id="hud">
 <div><b>{title}</b></div>
 <div>mode: <select id="mode"></select></div>
 <div>[R]gb [I]nstance [S]emantic part-pca[O] [C]eiling [A]bboxes [H]ide-misses
      [V]save view [B]restore</div>
 <div id="info"></div>{live_block}
</div>
<script type="importmap">{{"imports":{{
 "three":"https://unpkg.com/three@0.160.0/build/three.module.js",
 "three/addons/":"https://unpkg.com/three@0.160.0/examples/jsm/"
}}}}</script>
<script type="module">
import * as THREE from 'three';
import {{ OrbitControls }} from 'three/addons/controls/OrbitControls.js';
const DATA = {data_json};
const b64f32 = s => new Float32Array(Uint8Array.from(atob(s), c=>c.charCodeAt(0)).buffer);
const b64u32 = s => new Uint32Array(Uint8Array.from(atob(s), c=>c.charCodeAt(0)).buffer);
const b64u8  = s => Uint8Array.from(atob(s), c=>c.charCodeAt(0));

const scene = new THREE.Scene();
scene.background = new THREE.Color(0x101014);
const cam = new THREE.PerspectiveCamera(60, innerWidth/innerHeight, 0.01, 1000);
const renderer = new THREE.WebGLRenderer({{antialias:true}});
renderer.setSize(innerWidth, innerHeight);
document.body.appendChild(renderer.domElement);
const ctl = new OrbitControls(cam, renderer.domElement);
scene.add(new THREE.AmbientLight(0xffffff, 0.7));
const dl = new THREE.DirectionalLight(0xffffff, 1.2); dl.position.set(1,2,1.5);
scene.add(dl);

const meshes = {{}}, boxes = [];
const bb = new THREE.Box3();
for (const [oid, o] of Object.entries(DATA.objects)) {{
  const g = new THREE.BufferGeometry();
  g.setAttribute('position', new THREE.BufferAttribute(b64f32(o.v), 3));
  g.setIndex(new THREE.BufferAttribute(b64u32(o.f), 1));
  g.computeVertexNormals();
  const m = new THREE.Mesh(g, new THREE.MeshLambertMaterial({{vertexColors:true}}));
  m.userData = {{oid:oid, maxY:o.maxY, score:o.score}};
  scene.add(m); meshes[oid] = m;
  bb.expandByObject(m);
  const bh = new THREE.Box3Helper(new THREE.Box3().setFromObject(m), 0x44ff88);
  bh.visible = false; scene.add(bh); boxes.push(bh);
}}
const ctr = bb.getCenter(new THREE.Vector3());
cam.position.set(ctr.x, ctr.y + 2.0, ctr.z + bb.getSize(new THREE.Vector3()).length()*0.7);
ctl.target.copy(ctr);

function setMode(name) {{
  const mode = DATA.colorings[name]; if (!mode) return;
  for (const [oid, m] of Object.entries(meshes)) {{
    const c = b64u8(mode[oid]);
    const f = new Float32Array(c.length);
    for (let i=0;i<c.length;i++) f[i]=c[i]/255;
    m.geometry.setAttribute('color', new THREE.BufferAttribute(f, 3));
  }}
  document.getElementById('mode').value = name;
  document.getElementById('info').textContent = 'mode: ' + name;
}}
const sel = document.getElementById('mode');
for (const name of Object.keys(DATA.colorings)) {{
  const o = document.createElement('option'); o.value = o.textContent = name;
  sel.appendChild(o);
}}
sel.onchange = e => setMode(e.target.value);
let ceilingHidden = false, hideMisses = false;
addEventListener('keydown', e => {{
  const k = e.key.toLowerCase();
  if (k==='r') setMode('rgb');
  if (k==='i') setMode('instance');
  if (k==='s') setMode('class');
  if (k==='o') setMode('partpca');
  if (k==='a') boxes.forEach(b => b.visible = !b.visible);
  if (k==='c') {{ ceilingHidden = !ceilingHidden;
    for (const m of Object.values(meshes))
      if (m.userData.maxY > {ceiling_height}) m.visible = !ceilingHidden; }}
  if (k==='h') {{ hideMisses = !hideMisses;
    for (const m of Object.values(meshes))
      if (m.userData.score !== null && m.userData.score < {hide_thresh})
        m.visible = !hideMisses; }}
  if (k==='v') localStorage.setItem('oo_view', JSON.stringify(
      {{p:cam.position.toArray(), t:ctl.target.toArray()}}));
  if (k==='b') {{ const s = JSON.parse(localStorage.getItem('oo_view')||'null');
    if (s) {{ cam.position.fromArray(s.p); ctl.target.fromArray(s.t); }} }}
}});
setMode(DATA.initial);{live_js}
addEventListener('resize', () => {{
  cam.aspect = innerWidth/innerHeight; cam.updateProjectionMatrix();
  renderer.setSize(innerWidth, innerHeight);
}});
renderer.setAnimationLoop(() => {{ ctl.update(); renderer.render(scene, cam); }});
</script></body></html>
"""


# substituted into _HTML's {live_js} field (plain value — not re-formatted,
# so raw JS braces are fine here)
_LIVE_JS = """
const qgo = document.getElementById('qgo');
qgo.onclick = async () => {
  const t = document.getElementById('qtext').value;
  if (!t) return;
  const p = document.getElementById('qpart').value;
  const k = document.getElementById('qtopk').value;
  const u = `/query?text=${encodeURIComponent(t)}` +
            (p ? `&part=${encodeURIComponent(p)}` : '') +
            (k ? `&topk=${encodeURIComponent(k)}` : '');
  document.getElementById('info').textContent = 'querying...';
  try {
    const r = await fetch(u);
    if (!r.ok) throw new Error(await r.text());
    const j = await r.json();
    DATA.colorings['live'] = j.colors;
    for (const [oid, m] of Object.entries(meshes))
      if (j.scores && j.scores[oid] !== undefined)
        m.userData.score = j.scores[oid];
    if (![...sel.options].some(o => o.value === 'live')) {
      const o = document.createElement('option');
      o.value = o.textContent = 'live'; sel.appendChild(o);
    }
    setMode('live');
    document.getElementById('info').textContent =
      `live: ${j.query}` + (j.part ? ` / ${j.part}` : '');
  } catch (e) {
    document.getElementById('info').textContent = 'query failed: ' + e.message;
  }
};
"""


def build_html(
    bundle: dict[int, dict],
    out_path: str,
    colorings: dict[str, dict] | None = None,
    class_colors=None,
    scores: dict[int, float] | None = None,
    initial: str = "rgb",
    title: str = "openobj-tpu map",
    ceiling_height: float = 1.0,
    hide_thresh: float = 0.5,
    live_query: bool = False,
) -> str:
    """Write the self-contained viewer HTML; returns the path.

    live_query=True adds a query box that POSTs to the serving process's
    /query endpoint (viz.server) and installs the returned coloring as a
    'live' mode — interactive re-querying with real encoders, reference
    F/P keys (vis_interaction.py:322-438) without rebaking the HTML."""
    modes = bundle_colorings(bundle, class_colors=class_colors)
    if colorings:
        modes.update(colorings)
    norm = C.normalize_scores(scores) if scores else {}
    objects = {}
    for oid, e in bundle.items():
        v = e["mesh"]["vertices"].astype(np.float32)
        objects[str(oid)] = {
            "v": _b64(v),
            "f": _b64(e["mesh"]["faces"].astype(np.uint32)),
            "maxY": float(v[:, 1].max()) if len(v) else 0.0,
            "score": norm.get(oid) if scores else None,
        }
    data = {
        "objects": objects,
        "colorings": {
            name: {str(oid): _b64(col.astype(np.uint8))
                   for oid, col in mode.items()}
            for name, mode in modes.items()
        },
        "initial": initial if initial in modes else "rgb",
    }
    live_block = live_js = ""
    if live_query:
        live_block = (
            '\n <div id="livebox">query <input id="qtext" size="16"> '
            'part <input id="qpart" size="10"> '
            'top-k <input id="qtopk" size="3"> '
            '<button id="qgo">go</button></div>'
        )
        live_js = _LIVE_JS
    html = _HTML.format(
        title=title, data_json=json.dumps(data),
        ceiling_height=ceiling_height, hide_thresh=hide_thresh,
        live_block=live_block, live_js=live_js,
    )
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        f.write(html)
    return out_path


def export_plys(bundle, coloring: dict[int, np.ndarray], out_dir: str):
    """Write one colored PLY per object for external viewers."""
    from openobj_tpu.utils.geometry import TriangleMesh

    os.makedirs(out_dir, exist_ok=True)
    for oid, e in bundle.items():
        mesh = TriangleMesh(
            vertices=e["mesh"]["vertices"], faces=e["mesh"]["faces"],
            vertex_colors=coloring[oid],
        )
        mesh.export_ply(os.path.join(out_dir, f"obj_{oid}.ply"))


# --------------------------------------------------------------------------- #
# CLI
# --------------------------------------------------------------------------- #


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Open-vocabulary map viewer/query (reference "
                    "vis_interaction.py, headless + HTML)")
    ap.add_argument("bundle", help="map_vis bundle (.pkl.gz)")
    ap.add_argument("--out-html", default="map_viewer.html")
    ap.add_argument("--ply-dir", default=None)
    ap.add_argument("--query", default=None, help="text -> object retrieval")
    ap.add_argument("--part-query", default=None,
                    help="part text (with --query: object+part mode)")
    ap.add_argument("--top-k", type=int, default=None)
    ap.add_argument("--encoders", default="fake",
                    choices=("fake", "hf", "vocab"))
    ap.add_argument("--vocab", default=None, help="vocabulary npz for "
                    "--encoders vocab")
    ap.add_argument("--class-colors", default=None,
                    help="reference-format color map YAML")
    args = ap.parse_args(argv)

    bundle = load_map_bundle(args.bundle)
    print(f"loaded {len(bundle)} objects from {args.bundle}")
    class_colors = (
        C.ClassColorMap.from_yaml(args.class_colors)
        if args.class_colors else None
    )

    colorings, scores, initial = {}, None, "rgb"
    if args.query:
        clip_enc, sbert_enc = make_encoders(args.encoders, args.vocab)
        scores = Q.query_objects(args.query, bundle, clip_enc, sbert_enc)
        ranked = sorted(scores.items(), key=lambda kv: -kv[1])
        print(f"query {args.query!r}:")
        for oid, s in ranked[:10]:
            print(f"  obj {oid:4d}  sim {s:+.4f}")
        if args.part_query:
            part = Q.query_part(
                args.query, args.part_query, bundle, clip_enc, sbert_enc,
                top_k_objects=args.top_k or 1,
            )
            colorings["part_query"] = bake_part_query(bundle, part)
            initial = "part_query"
        else:
            colorings["query"] = bake_object_query(
                bundle, scores, top_k=args.top_k
            )
            initial = "query"

    path = build_html(
        bundle, args.out_html, colorings=colorings, class_colors=class_colors,
        scores=scores, initial=initial,
    )
    print(f"wrote {path}")
    if args.ply_dir:
        modes = bundle_colorings(bundle, class_colors=class_colors)
        modes.update(colorings)
        export_plys(bundle, modes[initial], args.ply_dir)
        print(f"wrote PLYs to {args.ply_dir}")


if __name__ == "__main__":
    main()
