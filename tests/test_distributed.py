"""2-process jax.distributed smoke test (CPU backend, gloo collectives):
the multi-host story — each process joins the runtime, takes its scene
shard, trains it end to end, and cross-process collectives work
(SURVEY.md §2.5 'jax.distributed + collectives'; the reference has no
distributed backend at all)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np

_CHILD = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
pid, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]

from openobj_tpu.parallel import distributed, multislice
distributed.initialize(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2 * jax.local_device_count()

# scene-shard split: every process takes its i:n slice
scenes = ["sceneA", "sceneB", "sceneC"]
mine = multislice.shard_scene_list(scenes, distributed.process_scene_shard())

# train this process's shard: a tiny synthetic scene per entry
import numpy as np
from openobj_tpu.core import trainer
from openobj_tpu.core.scene import Camera, SceneMapper
from openobj_tpu.data import synthetic

losses = {}
for scene_name in mine:
    cam = Camera(width=32, height=24, fx=20.0, fy=20.0, cx=16.0, cy=12.0)
    cfg = trainer.TrainConfig(
        n_iters_per_frame=3, win_size=2, n_samples_per_frame=8,
        win_size_bg=2, n_samples_per_frame_bg=16,
        hidden=16, hidden_bg=16, clip_size=4,
    )
    m = SceneMapper(cam, cfg, frame_capacity=6, initial_bucket=4)
    scene = synthetic.default_scene(n_spheres=1)
    dirs = np.asarray(cam.ray_dirs())
    for rgb, depth, inst, t_wc in synthetic.make_sequence(scene, dirs, 3):
        m.process_frame(rgb, depth, inst, t_wc)
    m.finish()
    losses[scene_name] = float(m.loss_history[-1])
    assert np.isfinite(m.loss_history[-1])

# cross-process collective: allgather each process's scene count
from jax.experimental import multihost_utils
import jax.numpy as jnp
counts = multihost_utils.process_allgather(jnp.asarray([len(mine)]))
distributed.barrier("end")
json.dump(
    {"pid": pid, "scenes": mine, "losses": losses,
     "allgather_counts": np.asarray(counts).reshape(-1).tolist()},
    open(out_path, "w"),
)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


class TestTwoProcessDistributed:
    def test_scene_shard_training(self, tmp_path):
        port = _free_port()
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env.pop("JAX_PLATFORMS", None)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        procs, outs = [], []
        for pid in range(2):
            out = str(tmp_path / f"proc{pid}.json")
            outs.append(out)
            procs.append(subprocess.Popen(
                [sys.executable, "-c", _CHILD, str(pid), str(port), out],
                env=env, cwd=repo,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            ))
        for p in procs:
            try:
                o, e = p.communicate(timeout=600)
            except subprocess.TimeoutExpired:
                p.kill()
                raise
            assert p.returncode == 0, f"rc={p.returncode}\n{o}\n{e}"

        results = [json.load(open(o)) for o in outs]
        # shards partition the scene list (round-robin i:n)
        assert results[0]["scenes"] == ["sceneA", "sceneC"]
        assert results[1]["scenes"] == ["sceneB"]
        for r in results:
            for v in r["losses"].values():
                assert np.isfinite(v)
            # the collective saw BOTH processes' counts
            assert r["allgather_counts"] == [2, 1]
