"""Training entry point: config-driven incremental multi-object mapping.

The TPU-native counterpart of /root/reference/objnerf/train.py:

    python -m openobj_tpu.train --config configs/replica/room_0.json \
        --logdir logs/room_0 [--class-features class_feats.npz]

Per frame: ingest (frame store + keyframe policy) then ONE jitted device
program (sampling + n_iters optimizer steps). At n_vis_iter cadence and at
the end (reference train.py:491): open-vocab semantic assignment
(train.py:497-526), per-object checkpoints + camera pose (train.py:529-541),
optional whole-dataset rendering (rgb/depth/maskid PNGs, train.py:550-612),
optional meshing + OBJ export (train.py:617-652).

Class-name CLIP/SBERT features come from a precomputed .npz (names,
clipfeat [C,512], capfeat [C,384]) or live encoders — this container has no
model weights, so precomputed-first.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil

import numpy as np


def load_class_features(path: str | None):
    if path is None:
        return None
    z = np.load(path, allow_pickle=True)
    return {
        "names": list(z["names"]),
        "clipfeat": z["clipfeat"].astype(np.float32),
        "capfeat": z["capfeat"].astype(np.float32),
    }


def assign_all_semantics(mapper, class_feats):
    """Reference train.py:497-526: reserved ids 0/2/3 -> wall/floor/ceiling
    class indices; others via DBSCAN-majority features + caption-confident
    argmax."""
    from openobj_tpu.viz.query import assign_semantics

    names = class_feats["names"]
    mapping = {}
    reserved = {0: "wall", 2: "floor", 3: "ceiling"}
    for inst_id, cname in reserved.items():
        if cname in names:
            mapping[inst_id] = names.index(cname)
    for inst_id, slot in mapper.registry.inst_to_slot.items():
        if inst_id in mapping:
            mapper.registry.slots[slot].semantic_id = mapping[inst_id]
            continue
        st = mapper.registry.slots[slot]
        if not st.clip_feats:
            continue
        cid = assign_semantics(
            np.stack(st.clip_feats), np.stack(st.caption_feats),
            class_feats["clipfeat"], class_feats["capfeat"],
        )
        mapping[inst_id] = cid
        st.semantic_id = cid
    if mapper.registry.bg is not None and "wall" in names:
        mapper.registry.bg.semantic_id = names.index("wall")
        mapping[0] = names.index("wall")
    return mapping


def save_checkpoints(mapper, log_dir: str, t_wc_last: np.ndarray):
    """Per-object .npz checkpoints + last camera pose (train.py:529-541)."""
    from openobj_tpu.core import checkpoint
    from openobj_tpu.utils.geometry import object_bound_from_keyframes

    cam = mapper.camera
    for inst_id, slot in mapper.registry.inst_to_slot.items():
        st = mapper.registry.slots[slot]
        if st.bbox3d is None or not st.bbox_final:
            kfs = mapper.registry.kf_frames[slot][: st.n_kf]
            st.bbox3d = object_bound_from_keyframes(
                np.asarray(mapper.store.depth[kfs]),
                np.asarray(mapper.store.inst[kfs]) == inst_id,
                np.asarray(mapper.store.t_wc[kfs]),
                cam.fx, cam.fy, cam.cx, cam.cy,
            )
        ckpt_dir = os.path.join(log_dir, "ckpt", str(inst_id))
        checkpoint.save_object_checkpoint(
            os.path.join(ckpt_dir, f"obj_{inst_id}.npz"),
            inst_id, mapper.slot_params(slot), mapper.cfg.obj_scale,
            bbox3d=st.bbox3d, obj_center=st.obj_center,
            clip_feats=np.stack(st.clip_feats) if st.clip_feats else None,
            caption_feats=np.stack(st.caption_feats) if st.caption_feats else None,
            semantic_id=st.semantic_id,
        )
    if mapper.cfg.do_bg and mapper.registry.bg_seen:
        bg = mapper.registry.bg
        kfs = mapper.registry.bg_kf_frames[: bg.n_kf]
        bbox = object_bound_from_keyframes(
            np.asarray(mapper.store.depth[kfs]),
            np.asarray(mapper.store.inst[kfs]) == 0,
            np.asarray(mapper.store.t_wc[kfs]),
            cam.fx, cam.fy, cam.cx, cam.cy,
        )
        bg.bbox3d = bbox
        checkpoint.save_object_checkpoint(
            os.path.join(log_dir, "ckpt", "0", "obj_0.npz"),
            0, mapper.state.bg_params, mapper.cfg.bg_scale,
            bbox3d=bbox,
            clip_feats=np.stack(bg.clip_feats) if bg.clip_feats else None,
            caption_feats=np.stack(bg.caption_feats) if bg.caption_feats else None,
            semantic_id=bg.semantic_id,
        )
    cam_dir = os.path.join(log_dir, "cam_pose")
    os.makedirs(cam_dir, exist_ok=True)
    np.savez(os.path.join(cam_dir, "twc_frame.npz"), twc=t_wc_last)


def render_dataset(mapper, dataset, log_dir: str, mapping_class: dict,
                   bg_ids=(0, 2, 3), n_bins: int = 150, chunk: int = 2048,
                   hit_frac: float = 0.25, two_pass: bool = False,
                   n_probe: int = 32, refine_bins: int | None = None,
                   adaptive_bins: bool = False):
    """Render every dataset pose through all object fields with z-buffer
    compositing; write rgb/depth/maskid PNGs (train.py:550-612 — the maskid
    images are the mIoU-eval artifact).

    Foreground objects render in ONE jitted dispatch per frame
    (renderer.render_frame_batched, OBB-hit-compacted); background-id
    entries (wall/floor/ceiling + the bg model, which paint color but never
    the z-buffer — reference train.py:592-594) render per object.

    two_pass: probe-and-tighten empty-space skipping (renderer docstring) —
    measured 1.6x faster at the room_0 render envelope with the refine pass
    at 64 bins; parity depends on the fields having converged to hard
    surfaces, so it is opt-in. refine_bins sets the refine pass's bin count
    explicitly (default: max(n_bins // 2, 48)) so config n_bins and the
    empty-space-skipping tradeoff stay independently controllable.

    adaptive_bins: per-object bin counts — the configured bin count anchors
    the sampling density at the largest object; smaller objects get
    proportionally fewer bins in a few bucketed dispatch sizes
    (renderer.render_frame_bucketed). Composes with two_pass."""
    import cv2
    import jax
    import jax.numpy as jnp
    from openobj_tpu.core import renderer

    eff_bins = n_bins
    if two_pass:
        eff_bins = refine_bins if refine_bins is not None else max(n_bins // 2, 48)
    from openobj_tpu.ops import sampling as S

    out_dir = os.path.join(log_dir, "render")
    os.makedirs(out_dir, exist_ok=True)
    # persist the instance->class mapping the maskid images were painted
    # with, so eval can score semantics in the SAME id space (the class_our
    # GT images carry global INSTANCE ids — reference mask_graph.py:1240-
    # 1264 writes the identical image to class_our and instance_our)
    with open(os.path.join(out_dir, "mapping_class.json"), "w") as f:
        json.dump({str(k): int(v) for k, v in mapping_class.items()}, f)
    h, w = mapper.camera.height, mapper.camera.width

    fg, bg_entries = [], []
    for inst_id, slot in mapper.registry.inst_to_slot.items():
        st = mapper.registry.slots[slot]
        if st.bbox3d is None:
            continue
        if inst_id in bg_ids:
            bg_entries.append((inst_id, mapper.slot_params(slot), st))
        else:
            fg.append((inst_id, slot, st))
    if mapper.cfg.do_bg and mapper.registry.bg is not None \
            and mapper.registry.bg.bbox3d is not None:
        bg_entries.append((0, mapper.state.bg_params, mapper.registry.bg))

    params_sub = t_wo = extents = centers = active = None
    inst_arr = np.zeros(0, np.int32)
    if fg:
        slot_idx = jnp.asarray([s for _, s, _ in fg])
        params_sub = jax.tree.map(lambda x: x[slot_idx], mapper.state.fg_params)
        t_wo = np.tile(np.eye(4, dtype=np.float32), (len(fg), 1, 1))
        extents = np.zeros((len(fg), 3), np.float32)
        centers = np.zeros((len(fg), 3), np.float32)
        for j, (_, _, st) in enumerate(fg):
            t_wo[j, :3, :3] = st.bbox3d.r
            t_wo[j, :3, 3] = st.bbox3d.center
            extents[j] = st.bbox3d.extent
            centers[j] = st.obj_center
        active = jnp.ones((len(fg),), bool)
        inst_arr = np.asarray([i for i, _, _ in fg], np.int32)
        class_arr = np.asarray(
            [mapping_class.get(int(x), 0) for x in inst_arr], np.uint16
        )  # frame-invariant instance -> class LUT, built once
        mhr_full = -(-(h * w) // chunk) * chunk
        mhr = min(-(-int(h * w * hit_frac) // chunk) * chunk, mhr_full)

    dirs_c = jnp.asarray(mapper.cam_dirs).reshape(-1, 3)
    key = jax.random.PRNGKey(0)
    for i in range(len(dataset)):
        sample = dataset[i]
        t = jnp.asarray(sample.t_wc, jnp.float32)
        origins, dirs_w = S.origin_dirs_w(
            jnp.broadcast_to(t, (dirs_c.shape[0], 4, 4)), dirs_c
        )
        rgb_img = np.zeros((h, w, 3), np.uint8)
        maskid = np.zeros((h, w), np.uint16)
        instid = np.zeros((h, w), np.int32)
        zbuf = np.full((h, w), 100.0, np.float32)
        if fg:
            key, k = jax.random.split(key)
            # size the compaction cap from the TRUE per-object coverage so a
            # close-up object (e.g. a bed filling the view) never loses
            # pixels; double to the next chunk multiple so recompiles stay
            # O(log) over the run
            counts = renderer.obb_hit_counts(
                jnp.asarray(t_wo), jnp.asarray(extents), active,
                origins, dirs_w,
            )
            need = int(jnp.max(counts))
            while mhr < min(need, mhr_full):
                mhr = min(mhr * 2, mhr_full)
                print(f"render: raising max_hit_rays to {mhr} "
                      f"(an object covers {need} rays)")
            extra = {"hit_counts": counts} if adaptive_bins else {}
            render_fn = (renderer.render_frame_bucketed if adaptive_bins
                         else renderer.render_frame_batched)
            out = render_fn(
                params_sub, jnp.asarray(t_wo), jnp.asarray(extents),
                jnp.asarray(centers), active, origins, dirs_w, k,
                n_bins=eff_bins,
                max_hit_rays=mhr, chunk=chunk,
                max_deg=mapper.cfg.max_deg,
                two_pass=two_pass, n_probe=n_probe, **extra,
            )
            if int(jnp.max(out["n_hit"])) > mhr:   # survives python -O
                raise ValueError(
                    f"render cap regression: an object covers "
                    f"{int(jnp.max(out['n_hit']))} rays > cap {mhr}"
                )
            win = np.asarray(out["winner"]).reshape(h, w)
            zb = np.asarray(out["depth"]).reshape(h, w)
            col = np.asarray(out["color"]).reshape(h, w, 3)
            hitm = win >= 0
            rgb_img[hitm] = (np.clip(col[hitm], 0, 1) * 255).astype(np.uint8)
            ids = inst_arr[np.maximum(win, 0)]
            instid[hitm] = ids[hitm]
            maskid[hitm] = class_arr[np.maximum(win, 0)][hitm]
            zbuf[hitm] = zb[hitm]
        bg_zbuf = np.full((h, w), 100.0, np.float32)
        for inst_id, params, st in bg_entries:
            key, k = jax.random.split(key)
            v = renderer.render_object_view(
                params, st.bbox3d, st.obj_center, sample.t_wc,
                mapper.cam_dirs, k,
                n_bins=eff_bins,
                two_pass=two_pass, n_probe=n_probe,
            )
            d = np.where(v["hit"], v["depth"], 100.0)
            # bg ids never write the MAIN depth buffer (train.py:592-594);
            # bg-vs-bg overlaps depth-test against their own buffer (the
            # reference resolves them by iteration order — a flagged wart)
            ok = (zbuf > d) & (bg_zbuf > d)
            rgb_img[ok] = (np.clip(v["color"], 0, 1)[ok] * 255).astype(np.uint8)
            maskid[ok] = mapping_class.get(inst_id, 0)
            instid[ok] = inst_id
            bg_zbuf[ok] = d[ok]
        depth_img = np.where(zbuf >= 100.0, 0.0, zbuf)
        fid = sample.frame_id
        cv2.imwrite(os.path.join(out_dir, f"rgb_{fid}.png"),
                    cv2.cvtColor(rgb_img, cv2.COLOR_RGB2BGR))
        cv2.imwrite(os.path.join(out_dir, f"depth_{fid}.png"),
                    (depth_img * 1000).astype(np.uint16))
        cv2.imwrite(os.path.join(out_dir, f"maskid_{fid}.png"),
                    maskid.astype(np.uint16))
        # global instance ids (beyond reference: enables instance-level
        # IoU against instance_our GT, since the ids are the association
        # pipeline's own)
        cv2.imwrite(os.path.join(out_dir, f"inst_{fid}.png"),
                    np.maximum(instid, 0).astype(np.uint16))


def export_meshes(mapper, log_dir: str, grid_dim: int, live_voxel_size: float,
                  save_mesh: bool = True, save_pcd: bool = False):
    """Meshing + OBJ export per object; with save_pcd also the occ > 0.5
    grid-point cloud as a PLY (reference train.py:617-652, trainer.py:70-79)."""
    from openobj_tpu.core import meshing
    from openobj_tpu.utils.geometry import TriangleMesh

    mesh_dir = os.path.join(log_dir, "scene_mesh")
    os.makedirs(mesh_dir, exist_ok=True)
    n = 0
    for inst_id, slot in mapper.registry.inst_to_slot.items():
        st = mapper.registry.slots[slot]
        if st.bbox3d is None:
            continue
        dim = meshing.adaptive_grid_dim(st.bbox3d, live_voxel_size, grid_dim)
        params = mapper.slot_params(slot)
        mesh = meshing.mesh_object(
            params, st.bbox3d, st.obj_center, grid_dim=dim, with_color=True,
        )
        if mesh is None:
            print(f"meshing failed obj {inst_id}")
            continue
        if save_mesh:
            mesh.export_obj(os.path.join(mesh_dir, f"obj{inst_id}.obj"))
        if save_pcd:
            pc = meshing.object_point_cloud(
                params, st.bbox3d, st.obj_center, grid_dim=dim,
            )
            if pc is not None:
                pts, cols = pc
                TriangleMesh(
                    vertices=pts.astype(np.float32),
                    faces=np.zeros((0, 3), np.int32),
                    vertex_colors=(np.clip(cols, 0, 1) * 255).astype(np.uint8),
                ).export_ply(os.path.join(mesh_dir, f"obj{inst_id}_pcd.ply"))
        n += 1
    return n


def main(argv=None):
    parser = argparse.ArgumentParser(description="openobj_tpu training")
    parser.add_argument("--config", required=True)
    parser.add_argument("--logdir", default="./logs/debug")
    parser.add_argument("--class-features", default=None,
                        help=".npz with names/clipfeat/capfeat")
    parser.add_argument("--max-frames", type=int, default=None)
    parser.add_argument("--frame-capacity", type=int, default=256,
                        help="device frame-store slots; sequences longer "
                             "than this train in constant memory via "
                             "keyframe-ring eviction (SceneMapper)")
    parser.add_argument("--tensorboard", action="store_true",
                        help="log per-frame scalars via tensorboardX")
    parser.add_argument("--ckpt-every", type=int, default=None,
                        help="also checkpoint every N frames (the reference's "
                             "n_vis_iter cadence; default: end of run only)")
    parser.add_argument("--prng", default="threefry",
                        choices=("threefry", "rbg"),
                        help="JAX PRNG impl; rbg avoids the threefry "
                             "while-loop (~2-4%% at the room_0 envelope) at "
                             "the cost of a different (still high-quality) "
                             "random stream")
    parser.add_argument("--render-two-pass", action="store_true",
                        help="empty-space-skipping render (probe pass + "
                             "tightened refine pass; ~1.6x faster at the "
                             "room_0 render envelope)")
    parser.add_argument("--render-refine-bins", type=int, default=None,
                        help="bin count for the two-pass refine pass "
                             "(default: max(render n_bins // 2, 48)); only "
                             "used with --render-two-pass")
    parser.add_argument("--render-adaptive-bins", action="store_true",
                        help="per-object render bin counts (density anchored "
                             "at the largest object, bucketed static sizes); "
                             "composes with --render-two-pass")
    parser.add_argument("--compilation-cache", default=None, metavar="DIR",
                        help="persistent XLA compilation cache dir (default "
                             "<repo>/.cache/jax or $OPENOBJ_COMPILATION_CACHE"
                             "; pass '0' to disable). Warm starts skip the "
                             "tens-of-seconds frame-program compile; "
                             "multi-scene runs reuse entries across scenes "
                             "at matching shape buckets")
    parser.add_argument("--resume", action="store_true",
                        help="resume from <logdir>/scene_state.npz (full "
                             "training state incl. optimizer — the reference "
                             "cannot do this); already-seen frames are "
                             "re-ingested into the frame store without "
                             "re-training")
    args = parser.parse_args(argv)

    from openobj_tpu.config import load_scene_config, make_mapper
    from openobj_tpu.data.loaders import init_loader, make_dataset
    from openobj_tpu.utils.profiling import (
        performance_measure, reset_stats, stats,
    )

    reset_stats()  # timing.json must cover THIS run only (multi-scene
    # drivers reuse worker threads, so the thread-local dict persists)
    from openobj_tpu.utils.compcache import enable_persistent_cache

    cache_info = enable_persistent_cache(args.compilation_cache)
    if cache_info["dir"]:
        print(f"compilation cache: {cache_info['dir']} "
              f"({cache_info['entries_before']} entries)")
    if args.prng != "threefry":
        import jax

        jax.config.update("jax_default_prng_impl", args.prng)
    os.makedirs(args.logdir, exist_ok=True)
    shutil.copy(args.config, args.logdir)
    cfg = load_scene_config(args.config)
    dataset = make_dataset(cfg)
    n_frames = len(dataset)
    if args.max_frames:
        n_frames = min(n_frames, args.max_frames)
    mapper = make_mapper(
        cfg, frame_capacity=min(n_frames + 1, args.frame_capacity)
    )
    class_feats = load_class_features(args.class_features)

    resume_from = 0
    if args.resume:
        from openobj_tpu.core.checkpoint import load_scene
        from openobj_tpu.core.frame_store import append_frame

        load_scene(args.logdir, mapper)
        resume_from = mapper.frame_count
        print(f"resuming after frame {resume_from}")

    tb = None
    if args.tensorboard:
        try:
            from tensorboardX import SummaryWriter

            tb = SummaryWriter(os.path.join(args.logdir, "tb"))
        except Exception as e:  # pragma: no cover
            print(f"tensorboard logging unavailable: {e}")

    t_wc_last = np.eye(4)
    for i, sample in enumerate(init_loader(dataset)):
        if i >= n_frames:
            break
        if args.resume and i < resume_from:
            # store-only re-ingest: keyframe tables index into the store by
            # frame slot, so each frame must land in the SAME slot it had
            # originally (frame_slots replays the eviction mapping; later
            # writes to a recycled slot overwrite earlier ones, reproducing
            # the final store); the registry/optimizer state already came
            # from the snapshot
            at = mapper.frame_slots[i] if i < len(mapper.frame_slots) else None
            mapper.store, _ = append_frame(
                mapper.store, sample.rgb, sample.depth, sample.inst,
                sample.t_wc, sample.part_feat, at=at,
            )
            t_wc_last = sample.t_wc
            continue
        with performance_measure(f"frame {i}", verbose=False):
            losses = mapper.process_frame(
                sample.rgb, sample.depth, sample.inst, sample.t_wc,
                bboxes=sample.bboxes, partfeat=sample.part_feat,
                obj_clip=sample.obj_clip, obj_cap=sample.obj_cap,
            )
        t_wc_last = sample.t_wc
        if losses is not None and i % 10 == 0:
            print(f"frame {i}/{n_frames}: loss {losses[0]:.3f} -> "
                  f"{losses[-1]:.3f}, objects {mapper.n_objects}")
        if tb is not None and losses is not None:
            tb.add_scalar("train/frame_loss", float(losses[-1]), i)
            tb.add_scalar("train/n_objects", mapper.n_objects, i)
        if args.ckpt_every and (i + 1) % args.ckpt_every == 0:
            save_checkpoints(mapper, args.logdir, t_wc_last)
    mapper.finish()   # drain the async pipeline (validates the last frame)
    from openobj_tpu.core.checkpoint import save_scene
    save_scene(args.logdir, mapper)   # full resumable snapshot
    if tb is not None:
        tb.close()

    mapping_class = {}
    if class_feats is not None:
        mapping_class = assign_all_semantics(mapper, class_feats)
    save_checkpoints(mapper, args.logdir, t_wc_last)
    vis = cfg.raw.get("vis", {})
    if bool(vis.get("if_render", 0)):
        render_dataset(mapper, dataset, args.logdir, mapping_class,
                       bg_ids=cfg.bg_ids,
                       two_pass=args.render_two_pass
                       or bool(vis.get("two_pass", 0)),
                       refine_bins=args.render_refine_bins,
                       adaptive_bins=args.render_adaptive_bins)
    # reference gate: meshing runs iff if_obj (train.py:617-652); save_mesh
    # only selects the output kind inside the block (room_0 ships
    # if_obj: 0, save_mesh: 1 and exports nothing)
    if bool(vis.get("if_obj", 0)):
        n = export_meshes(mapper, args.logdir, cfg.grid_dim,
                          cfg.live_voxel_size, cfg.save_mesh, cfg.save_pcd)
        print(f"exported {n} meshes")
    summary = {k: round(v["mean_ms"], 1) for k, v in stats().items()}
    with open(os.path.join(args.logdir, "timing.json"), "w") as f:
        json.dump(summary, f)
    print("done:", args.logdir)


if __name__ == "__main__":
    main()
