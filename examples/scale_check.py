"""Scale check: 24 objects, slot-bucket growth, batched held-out render.

Run on TPU or CPU:
    python examples/scale_check.py
Trains a 24-sphere synthetic scene (objects appear over 16 orbit frames,
slot buckets grow 8 -> 16 -> 32), then renders a held-out pose through the
batched whole-frame renderer and checks silhouette IoU + color error.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
from openobj_tpu.core.scene import Camera, SceneMapper
from openobj_tpu.core import trainer
from openobj_tpu.data import synthetic

W, H = 160, 120
cam = Camera(width=W, height=H, fx=100.0, fy=100.0, cx=80.0, cy=60.0)
rng = np.random.default_rng(0)
# 24 spheres in a 6x4 grid on the back wall
spheres = []
for i in range(24):
    gx, gy = i % 6, i // 6
    spheres.append(synthetic.Sphere(
        center=np.array([-1.25 + 0.5 * gx, -0.75 + 0.5 * gy,
                         -0.5 + 0.33 * (i % 4)]),
        radius=0.2, color=rng.uniform(0.2, 1.0, 3), inst_id=4 + i))
scene = synthetic.SyntheticScene(
    room=synthetic.BoxRoom(half_extent=np.array([3.5, 3.5, 3.5]),
                           color=np.array([0.6, 0.6, 0.62])),
    spheres=spheres)
dirs = np.asarray(cam.ray_dirs())

cfg = trainer.TrainConfig(
    n_iters_per_frame=40, win_size=3, n_samples_per_frame=24,
    win_size_bg=3, n_samples_per_frame_bg=64,
    hidden=32, hidden_bg=64, clip_size=32, part_mode=True, part_down=4,
)
m = SceneMapper(cam, cfg, frame_capacity=24, max_objects=32,
                keyframe_buffer_size=8, keyframe_step=2, keyframe_step_bg=4)
t0 = time.perf_counter()
for i in range(16):
    t_wc = synthetic.orbit_pose(np.pi / 2 - 0.35 + 0.7 * i / 16, radius=2.8)
    rgb, depth, inst = scene.render(t_wc, dirs)
    pf = rng.normal(size=(H // 4, W // 4, 32)).astype(np.float32)
    m.process_frame(rgb, depth, inst, t_wc, partfeat=pf)
m.finish()
print(f"trained 16 frames, {m.n_objects} objects, slots={m.state.n_slots}, "
      f"{time.perf_counter()-t0:.0f}s")
print("losses:", [round(x, 2) for x in m.loss_history[::4]])
assert m.n_objects >= 20, m.n_objects
assert m.state.n_slots == 32
assert all(np.isfinite(v) for v in m.loss_history)
assert m.loss_history[-1] < m.loss_history[0] * 1.2  # not exploding

# held-out render quality on one object via the batched renderer
import jax.numpy as jnp
from openobj_tpu.core import renderer
from openobj_tpu.ops import sampling as S
from openobj_tpu.utils.geometry import object_bound_from_keyframes

t_eval = synthetic.orbit_pose(np.pi / 2, radius=2.8)
rgb_gt, depth_gt, inst_gt = scene.render(t_eval, dirs)
fg = []
for inst_id, slot in m.registry.inst_to_slot.items():
    st = m.registry.slots[slot]
    kfs = m.registry.kf_frames[slot][: st.n_kf]
    try:
        st.bbox3d = object_bound_from_keyframes(
            np.asarray(m.store.depth[kfs]), np.asarray(m.store.inst[kfs]) == inst_id,
            np.asarray(m.store.t_wc[kfs]), cam.fx, cam.fy, cam.cx, cam.cy)
    except Exception:
        continue
    if st.bbox3d is not None:
        fg.append((inst_id, slot, st))
slot_idx = jnp.asarray([s for _, s, _ in fg])
params_sub = jax.tree.map(lambda x: x[slot_idx], m.state.fg_params)
t_wo = np.tile(np.eye(4, dtype=np.float32), (len(fg), 1, 1))
ext = np.zeros((len(fg), 3), np.float32); ctr = np.zeros((len(fg), 3), np.float32)
for j, (_, _, st) in enumerate(fg):
    t_wo[j, :3, :3] = st.bbox3d.r; t_wo[j, :3, 3] = st.bbox3d.center
    ext[j] = st.bbox3d.extent; ctr[j] = st.obj_center
dirs_c = jnp.asarray(m.cam_dirs).reshape(-1, 3)
origins, dirs_w = S.origin_dirs_w(jnp.broadcast_to(jnp.asarray(t_eval, jnp.float32), (dirs_c.shape[0], 4, 4)), dirs_c)
out = renderer.render_frame_batched(
    params_sub, jnp.asarray(t_wo), jnp.asarray(ext), jnp.asarray(ctr),
    jnp.ones((len(fg),), bool), origins, dirs_w, jax.random.PRNGKey(5),
    n_bins=80, max_hit_rays=8192, chunk=1024)
win = np.asarray(out["winner"]).reshape(H, W)
col = np.asarray(out["color"]).reshape(H, W, 3)
inst_arr = np.asarray([i for i, _, _ in fg])
hit = win >= 0
gt_obj = inst_gt >= 4
inter = (hit & gt_obj).sum(); union = (hit | gt_obj).sum()
print(f"fg objects rendered: {len(fg)}; silhouette IoU {inter/union:.2f}")
pix = hit & gt_obj
if pix.any():
    mae = np.abs(col[pix] - rgb_gt[pix].astype(np.float64) / 255).mean()
    mse = ((col[pix] - rgb_gt[pix].astype(np.float64) / 255) ** 2).mean()
    print(f"object-pixel color MAE {mae:.3f}, PSNR {-10*np.log10(mse+1e-12):.1f} dB")
    assert mae < 0.2
print("SCALE CHECK OK")
