"""Open-vocabulary demo: train a synthetic scene, export the object map,
run text queries, and emit the interactive viewer HTML.

    python examples/open_vocab_demo.py [out_dir]

No dataset or model weights needed: the scene is analytic (colored spheres
in a box room) and the text encoders are the deterministic fakes — swap
``--encoders hf`` in the viewer CLI for real CLIP/SBERT. The printed
ranking and the HTML's `query` coloring demonstrate the full retrieval
path (viz.query: 0.2 sbert + 0.8 clip cosine, reference
vis_interaction.py:356-376).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

from openobj_tpu.core.scene import Camera, SceneMapper  # noqa: E402
from openobj_tpu.core import trainer  # noqa: E402
from openobj_tpu.data import synthetic  # noqa: E402
from openobj_tpu.utils.geometry import object_bound_from_keyframes  # noqa: E402
from openobj_tpu.viz import export as viz_export  # noqa: E402
from openobj_tpu.viz import query as viz_query  # noqa: E402
from openobj_tpu.viz import viewer as viz_viewer  # noqa: E402


def main(out_dir: str = "/tmp/openobj_demo"):
    os.makedirs(out_dir, exist_ok=True)
    cam = Camera(width=96, height=72, fx=60.0, fy=60.0, cx=48.0, cy=36.0)
    cfg = trainer.TrainConfig(
        n_iters_per_frame=40, win_size=2, n_samples_per_frame=24,
        win_size_bg=2, n_samples_per_frame_bg=24,
        hidden=16, hidden_bg=16, clip_size=16, part_mode=True, part_down=4,
    )
    mapper = SceneMapper(cam, cfg, frame_capacity=10, max_objects=8,
                         keyframe_buffer_size=6, keyframe_step=2,
                         keyframe_step_bg=2, initial_bucket=4)

    # the fake text encoders are deterministic hashes — give each object the
    # encoding of its own description so queries resolve to the right object
    clip_enc, sbert_enc = viz_viewer.make_encoders("fake")
    descriptions = {4: "a red ball", 5: "a blue ball"}
    obj_clip = {k: clip_enc([v])[0] for k, v in descriptions.items()}
    obj_cap = {k: sbert_enc([v])[0] for k, v in descriptions.items()}

    scene = synthetic.default_scene(n_spheres=2)
    dirs = np.asarray(cam.ray_dirs())
    rng = np.random.default_rng(0)
    print("[train]")
    for i in range(8):
        t_wc = synthetic.orbit_pose(2 * np.pi * i / 12)
        rgb, depth, inst = scene.render(t_wc, dirs)
        pf = rng.normal(size=(72 // 4, 96 // 4, 16)).astype(np.float32)
        mapper.process_frame(rgb, depth, inst, t_wc, partfeat=pf,
                             obj_clip=obj_clip, obj_cap=obj_cap)
    mapper.finish()
    print(f"  {mapper.n_objects} objects, last loss "
          f"{mapper.loss_history[-1]:.2f}")

    print("[export]")
    for inst_id, slot in mapper.registry.inst_to_slot.items():
        st = mapper.registry.slots[slot]
        kfs = mapper.registry.kf_frames[slot][: st.n_kf]
        st.bbox3d = object_bound_from_keyframes(
            np.asarray(mapper.store.depth[kfs]),
            np.asarray(mapper.store.inst[kfs]) == inst_id,
            np.asarray(mapper.store.t_wc[kfs]),
            cam.fx, cam.fy, cam.cx, cam.cy,
        )
    bundle_path = os.path.join(out_dir, "map_vis.pkl.gz")
    bundle = viz_export.export_scene_map(mapper, bundle_path, grid_dim=48)
    print(f"  {len(bundle)} meshed objects -> {bundle_path}")

    print("[query]")
    for text in ("a red ball", "a blue ball"):
        scores = viz_query.query_objects(text, bundle, clip_enc, sbert_enc)
        ranked = sorted(scores.items(), key=lambda kv: -kv[1])
        print(f"  {text!r}: " + ", ".join(
            f"obj {o} {s:+.3f}" for o, s in ranked))
        top = ranked[0][0]
        assert descriptions.get(top) == text, (top, text)

    html = os.path.join(out_dir, "viewer.html")
    scores = viz_query.query_objects("a red ball", bundle, clip_enc, sbert_enc)
    viz_viewer.build_html(
        bundle, html,
        colorings={"query": viz_viewer.bake_object_query(bundle, scores)},
        scores=scores, initial="query",
    )
    print(f"[viewer] {html}  (open in a browser; keys R/I/S/O/C/A/H/V/B)")
    print("DEMO OK")


if __name__ == "__main__":
    main(*sys.argv[1:2])
