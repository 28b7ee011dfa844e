import numpy as np, jax, jax.numpy as jnp
from openobj_tpu.core import trainer
from openobj_tpu.core.frame_store import append_frame, init_frame_store
from openobj_tpu.core.scene import Camera

N_OBJ, N_SLOTS, H, W = 50, 64, 680, 1200
cfg = trainer.TrainConfig(part_mode=True)
key = jax.random.PRNGKey(0)
state = trainer.init_train_state(key, cfg, n_slots=N_SLOTS)
store = init_frame_store(20, H, W, part_feat_dim=cfg.clip_size, part_down=cfg.part_down)
rng = np.random.default_rng(0)
inst = rng.integers(-1, N_OBJ, (H, W)).astype(np.int32)
for f in range(20):
    pose = np.eye(4, dtype=np.float32); pose[:3, 3] = [0.1 * f, 0, 0]
    store, _ = append_frame(store, rng.integers(0,255,(H,W,3)).astype(np.uint8),
        rng.uniform(0.5,6.0,(H,W)).astype(np.float32), inst, pose,
        partfeat=rng.normal(size=(H//5, W//5, cfg.clip_size)).astype(np.float32))
cam = Camera(width=W, height=H, fx=600.0, fy=600.0, cx=599.5, cy=339.5)
cam_dirs = cam.ray_dirs()
fg_tables = {
    "kf_frames": jnp.tile(jnp.arange(20, dtype=jnp.int32), (N_SLOTS,1)),
    "kf_bbox": jnp.tile(jnp.asarray([0,H,0,W], jnp.float32), (N_SLOTS,20,1)),
    "n_kf": jnp.full((N_SLOTS,), 20, jnp.int32),
    "latest2": jnp.tile(jnp.asarray([18,19], jnp.int32), (N_SLOTS,1)),
    "active": jnp.arange(N_SLOTS) < N_OBJ,
    "obj_inst": jnp.arange(N_SLOTS, dtype=jnp.int32),
    "obj_center": jnp.zeros((N_SLOTS,3), jnp.float32),
}
bg_tables = {"kf_frames": fg_tables["kf_frames"][0], "kf_bbox": fg_tables["kf_bbox"][0],
             "n_kf": jnp.asarray(20, jnp.int32), "latest2": fg_tables["latest2"][0]}
state, l = trainer.train_frame(state, store, cam_dirs, fg_tables, bg_tables, jax.random.PRNGKey(1), cfg)
jax.block_until_ready(l)
with jax.profiler.trace("/tmp/oo_trace3"):
    for i in range(2):
        state, l = trainer.train_frame(state, store, cam_dirs, fg_tables, bg_tables, jax.random.PRNGKey(2+i), cfg)
    jax.block_until_ready(l)
print("done")
