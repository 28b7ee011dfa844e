"""Drive the full mapping surface end-to-end on a synthetic scene:
perception association -> SceneMapper incremental training -> per-object
render + compositing -> mesh export. Prints per-stage results and final
held-out PSNR; exits nonzero if quality gates fail."""

import os
import sys
import tempfile

import numpy as np

import jax

if jax.default_backend() not in ("tpu",):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from openobj_tpu.core import meshing, renderer, trainer  # noqa: E402
from openobj_tpu.core.scene import Camera, SceneMapper  # noqa: E402
from openobj_tpu.data import synthetic  # noqa: E402
from openobj_tpu.perception import pipeline  # noqa: E402
from openobj_tpu.utils import geometry  # noqa: E402


def _unit(v):
    v = np.asarray(v, np.float64)
    return v / np.linalg.norm(v)


def main():
    rng = np.random.default_rng(0)
    cam = Camera(width=80, height=60, fx=50.0, fy=50.0, cx=40.0, cy=30.0)
    dirs = np.asarray(cam.ray_dirs())
    scene = synthetic.default_scene(n_spheres=2)

    # ---- stage 1: perception association over the sequence ----
    feats = {
        4: (_unit(rng.normal(size=384)), _unit(rng.normal(size=512)), "a red ball"),
        5: (_unit(rng.normal(size=384)), _unit(rng.normal(size=512)), "a blue ball"),
        0: (_unit(rng.normal(size=384)), _unit(rng.normal(size=512)), "a wall"),
    }
    wall_ft = feats[0][0]
    angles = np.linspace(-0.6, 0.6, 8)
    views = [(synthetic.orbit_pose(a),) + scene.render(synthetic.orbit_pose(a), dirs)
             for a in angles]
    frames = []
    for t_wc, rgb, depth, inst in views:
        masks, caps, capfts, clipfts = [], [], [], []
        for oid, (capft, clipft, cap) in feats.items():
            m = inst == oid
            if m.sum() < 30:
                continue
            masks.append(m)
            caps.append(cap)
            capfts.append(capft + rng.normal(size=384) * 0.01)
            clipfts.append(clipft + rng.normal(size=512) * 0.01)
        frames.append(pipeline.FrameInput(
            masks=masks, captions=caps, capfeats=capfts, clipfeats=clipfts,
            depth=depth, rgb=rgb, t_wc=t_wc,
        ))
    acfg = pipeline.AssociationConfig(
        fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
        min_component_px=20, dbscan_min_points=10, dbscan_eps=0.2,
    )
    assoc = pipeline.associate(frames, bg_feats={"wall": wall_ft[None]}, cfg=acfg)
    print(f"[assoc] {assoc['n_objects']} global ids; "
          f"per-frame ids: {assoc['final_ids']}")

    # ---- stage 2: incremental NeRF mapping on associated instances ----
    tcfg = trainer.TrainConfig(
        n_iters_per_frame=25, win_size=2, n_samples_per_frame=24,
        win_size_bg=2, n_samples_per_frame_bg=64,
        hidden=32, hidden_bg=64, clip_size=16,
    )
    mapper = SceneMapper(cam, tcfg, frame_capacity=16, initial_bucket=4)
    for (t_wc, rgb, depth, _), inst_img in zip(views, assoc["inst_images"]):
        # wall (reserved id 1) -> bg instance 0 for the bg model
        inst_m = np.where(inst_img == 1, 0, inst_img)
        inst_m = np.where(inst_img == 0, -1, inst_m)  # unlabeled -> unknown
        losses = mapper.process_frame(rgb, depth, inst_m.astype(np.int32),
                                      t_wc, train=True)
    print(f"[train] {mapper.n_objects} objects; last-frame loss "
          f"{losses[0]:.2f} -> {losses[-1]:.2f}")

    # ---- stage 3: render a held-out view, composite, PSNR on spheres ----
    t_eval = synthetic.orbit_pose(0.05)
    rgb_gt, depth_gt, inst_gt = scene.render(t_eval, dirs)
    views_r, class_of = {}, {}
    for inst_id, slot in mapper.registry.inst_to_slot.items():
        st = mapper.registry.slots[slot]
        # object bound from its keyframes
        kfs = mapper.registry.kf_frames[slot][: st.n_kf]
        depths = np.asarray(mapper.store.depth[kfs])
        insts = np.asarray(mapper.store.inst[kfs])
        poses = np.asarray(mapper.store.t_wc[kfs])
        obb = geometry.object_bound_from_keyframes(
            depths, insts == inst_id, poses, cam.fx, cam.fy, cam.cx, cam.cy,
        )
        if obb is None:
            print(f"[warn] no bound for instance {inst_id}")
            continue
        st.bbox3d = obb
        views_r[inst_id] = renderer.render_object_view(
            mapper.slot_params(slot), obb, st.obj_center, t_eval, mapper.cam_dirs,
            jax.random.PRNGKey(5), n_bins=96, chunk_size=1024,
        )
        class_of[inst_id] = inst_id
    comp = renderer.composite_views(views_r, class_of, cam.height, cam.width)
    obj_mask = (inst_gt > 0)
    covered = comp["instid"] > 0
    hit = obj_mask & covered
    if hit.sum() < 100:
        print(f"FAIL: too few composited object pixels ({hit.sum()})")
        sys.exit(1)
    mse = np.mean(
        (comp["rgb"][hit] / 255.0 - rgb_gt[hit] / 255.0) ** 2
    )
    psnr = -10 * np.log10(mse + 1e-12)
    derr = np.abs(comp["depth"][hit] - depth_gt[hit]).mean()
    iou = (obj_mask & covered).sum() / (obj_mask | covered).sum()
    print(f"[render] held-out object-pixel PSNR {psnr:.1f} dB, "
          f"depth MAE {derr:.3f} m, silhouette IoU {iou:.2f}")

    # ---- stage 4: mesh export ----
    outdir = tempfile.mkdtemp(prefix="openobj_mesh_")
    n_meshes = 0
    for inst_id, slot in mapper.registry.inst_to_slot.items():
        st = mapper.registry.slots[slot]
        if st.bbox3d is None:
            continue
        mesh = meshing.mesh_object(
            mapper.slot_params(slot), st.bbox3d, st.obj_center,
            grid_dim=48, with_color=True,
        )
        if mesh is not None:
            mesh.export_obj(os.path.join(outdir, f"obj_{inst_id}.obj"))
            n_meshes += 1
    print(f"[mesh] exported {n_meshes} meshes to {outdir}")

    ok = psnr > 18 and derr < 0.3 and n_meshes >= 1
    print("PIPELINE OK" if ok else "PIPELINE WEAK", f"(psnr={psnr:.1f})")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
