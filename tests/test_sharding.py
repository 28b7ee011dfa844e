"""Multi-device tests on the virtual 8-CPU mesh: object-sharded training
must produce the same math as single-device, and the graft entry points
must compile and run."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openobj_tpu.parallel import sharding


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


class TestMesh:
    def test_make_mesh(self, eight_devices):
        mesh = sharding.make_mesh(eight_devices, ("object",))
        assert mesh.shape["object"] == 8

    def test_indivisible_slots_rejected(self, eight_devices, key):
        from openobj_tpu.core import trainer

        mesh = sharding.make_mesh(eight_devices, ("object",))
        cfg = trainer.TrainConfig(hidden=8, hidden_bg=8, clip_size=4)
        st = trainer.init_train_state(key, cfg, n_slots=6)  # 6 % 8 != 0
        with pytest.raises(ValueError):
            sharding.shard_scene(mesh, st, {})


class TestGraftEntry:
    def test_entry_compiles(self):
        import __graft_entry__ as g

        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        assert out[0].shape == (8, 120)
        assert out[1].shape == (8, 120, 3)
        assert out[2].shape == (8, 120, 512)
        assert all(bool(jnp.isfinite(o).all()) for o in out)

    def test_dryrun_multichip(self, eight_devices, monkeypatch):
        import __graft_entry__ as g

        # core checks only: the lifecycle/envelope tail is the DRIVER
        # gate's job and costs minutes of CPU compiles per run
        monkeypatch.setenv("OPENOBJ_DRYRUN_CORE_ONLY", "1")
        g.dryrun_multichip(8)  # asserts internally


class TestDryrunDriverEnvironment:
    """Round-2 regression (MULTICHIP_r02.json ok=false): the container's
    sitecustomize forces the platform via jax.config.update at interpreter
    start, so env vars (JAX_PLATFORMS/XLA_FLAGS) are lies. These tests run
    WITHOUT conftest, in subprocesses that reproduce that hostile setup."""

    def _run(self, code, tmp_path, extra_env=None, timeout=540):
        import os
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        # Fake sitecustomize: forces a 1-device CPU backend through jax.config
        # (the mechanism the real axon sitecustomize uses), regardless of what
        # the env claims — exactly the condition that defeated round 2.
        (tmp_path / "sitecustomize.py").write_text(
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "jax.config.update('jax_num_cpu_devices', 1)\n"
        )
        env = dict(os.environ)
        env.pop("_OPENOBJ_DRYRUN_CHILD", None)
        env["PYTHONPATH"] = f"{tmp_path}{os.pathsep}{repo}"
        # The env LIES: claims an 8-device CPU platform the sitecustomize
        # overrides. The old probe believed this and skipped the child.
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        # share the suite's persistent compile cache so the child is fast
        env.setdefault(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(repo, ".cache", "jax"),
        )
        # routing + per-mesh parity only — the lifecycle/envelope tail is
        # the driver gate's job and would blow the subprocess timeout
        env["OPENOBJ_DRYRUN_CORE_ONLY"] = "1"
        env.update(extra_env or {})
        return subprocess.run(
            [sys.executable, "-c", code],
            env=env, cwd=repo, capture_output=True, text=True, timeout=timeout,
        )

    def test_probe_is_env_blind(self, tmp_path):
        """With the backend uninitialized and the env claiming cpu×8, the
        probe must report UNKNOWN (None) — never an env-derived count."""
        res = self._run(
            "import __graft_entry__ as g\n"
            "n = g._initialized_device_count()\n"
            "assert n is None, f'probe trusted something pre-init: {n}'\n"
            "print('PROBE_NONE')\n",
            tmp_path,
        )
        assert res.returncode == 0, res.stderr
        assert "PROBE_NONE" in res.stdout

    def test_dryrun_reaches_child_and_succeeds(self, tmp_path):
        """Full gate under the hostile setup: parent sees (at most) 1 device
        no matter what env says, must route to the tunnel-free child, and
        the child's late jax.config.update calls must defeat the fake
        sitecustomize (which also runs in the child via PYTHONPATH)."""
        res = self._run(
            "import __graft_entry__ as g\n"
            "g.dryrun_multichip(4)\n",
            tmp_path,
        )
        assert res.returncode == 0, f"stdout:{res.stdout}\nstderr:{res.stderr}"
        assert "dryrun_multichip OK [1d-object]" in res.stdout
        assert "dryrun_multichip OK [2d-data2]" in res.stdout


class TestShardedParity:
    def test_sharded_equals_replicated(self, eight_devices, key):
        """One train_frame step with object-sharded state must match the
        unsharded run bit-for-bit in loss (same keys, same math)."""
        from openobj_tpu.core import trainer
        from openobj_tpu.core.frame_store import append_frame, init_frame_store
        from openobj_tpu.core.scene import Camera

        cfg = trainer.TrainConfig(
            n_iters_per_frame=2, win_size=2, n_samples_per_frame=8,
            win_size_bg=2, n_samples_per_frame_bg=8,
            hidden=16, hidden_bg=16, clip_size=4,
        )
        cam = Camera(width=32, height=24, fx=20.0, fy=20.0, cx=16.0, cy=12.0)
        state = trainer.init_train_state(key, cfg, n_slots=8)

        store = init_frame_store(2, 24, 32)
        rng = np.random.default_rng(0)
        store, _ = append_frame(
            store,
            rng.integers(0, 255, (24, 32, 3)).astype(np.uint8),
            rng.uniform(0.5, 3.0, (24, 32)).astype(np.float32),
            rng.integers(-1, 4, (24, 32)).astype(np.int32),
            np.eye(4, dtype=np.float32),
        )
        tables = {
            "kf_frames": jnp.zeros((8, 2), jnp.int32),
            "kf_bbox": jnp.tile(jnp.asarray([0, 24, 0, 32], jnp.float32), (8, 2, 1)),
            "n_kf": jnp.ones((8,), jnp.int32),
            "latest2": jnp.zeros((8, 2), jnp.int32),
            "active": jnp.ones((8,), bool),
            "obj_inst": jnp.arange(8, dtype=jnp.int32),
            "obj_center": jnp.zeros((8, 3), jnp.float32),
        }
        bg_tables = {
            "kf_frames": tables["kf_frames"][0],
            "kf_bbox": tables["kf_bbox"][0],
            "n_kf": jnp.asarray(1, jnp.int32),
            "latest2": tables["latest2"][0],
        }
        cam_dirs = cam.ray_dirs()
        k = jax.random.PRNGKey(7)

        import copy
        state_copy = jax.tree.map(lambda x: x.copy(), state)
        _, losses_single = trainer.train_frame(
            state_copy, store, cam_dirs, tables, bg_tables, k, cfg
        )

        mesh = sharding.make_mesh(eight_devices, ("object",))
        s_state, s_tables, s_store = sharding.shard_scene(mesh, state, tables, store)
        _, losses_sharded = trainer.train_frame(
            s_state, s_store, cam_dirs, s_tables, bg_tables, k, cfg
        )
        np.testing.assert_allclose(
            np.asarray(losses_single), np.asarray(losses_sharded), rtol=2e-5
        )

    def test_2d_mesh_ray_dp_matches(self, eight_devices, key):
        """('data', 'object') mesh: per-step ray slices shard over 'data'
        (trainer.maybe_constrain path); losses must match the single-device
        run to float tolerance."""
        from openobj_tpu.core import trainer
        from openobj_tpu.core.frame_store import append_frame, init_frame_store
        from openobj_tpu.core.scene import Camera

        cfg = trainer.TrainConfig(
            n_iters_per_frame=2, win_size=2, n_samples_per_frame=8,
            win_size_bg=2, n_samples_per_frame_bg=8,
            hidden=16, hidden_bg=16, clip_size=4,
        )
        cam = Camera(width=32, height=24, fx=20.0, fy=20.0, cx=16.0, cy=12.0)
        state = trainer.init_train_state(key, cfg, n_slots=8)
        store = init_frame_store(2, 24, 32)
        rng = np.random.default_rng(0)
        store, _ = append_frame(
            store,
            rng.integers(0, 255, (24, 32, 3)).astype(np.uint8),
            rng.uniform(0.5, 3.0, (24, 32)).astype(np.float32),
            rng.integers(-1, 4, (24, 32)).astype(np.int32),
            np.eye(4, dtype=np.float32),
        )
        tables = {
            "kf_frames": jnp.zeros((8, 2), jnp.int32),
            "kf_bbox": jnp.tile(jnp.asarray([0, 24, 0, 32], jnp.float32), (8, 2, 1)),
            "n_kf": jnp.ones((8,), jnp.int32),
            "latest2": jnp.zeros((8, 2), jnp.int32),
            "active": jnp.ones((8,), bool),
            "obj_inst": jnp.arange(8, dtype=jnp.int32),
            "obj_center": jnp.zeros((8, 3), jnp.float32),
        }
        bg_tables = {
            "kf_frames": tables["kf_frames"][0],
            "kf_bbox": tables["kf_bbox"][0],
            "n_kf": jnp.asarray(1, jnp.int32),
            "latest2": tables["latest2"][0],
        }
        cam_dirs = cam.ray_dirs()
        k = jax.random.PRNGKey(7)

        state_copy = jax.tree.map(lambda x: x.copy(), state)
        _, losses_single = trainer.train_frame(
            state_copy, store, cam_dirs, tables, bg_tables, k, cfg
        )

        mesh = sharding.make_mesh_2d(eight_devices, n_data=2)
        assert dict(mesh.shape) == {"data": 2, "object": 4}
        s_state, s_tables, s_store = sharding.shard_scene(mesh, state, tables, store)
        with jax.set_mesh(mesh):
            new_state, losses_2d = trainer.train_frame(
                s_state, s_store, cam_dirs, s_tables, bg_tables, k, cfg
            )
        np.testing.assert_allclose(
            np.asarray(losses_single), np.asarray(losses_2d), rtol=2e-5
        )
        # params still sharded over object after the step
        leaf = jax.tree.leaves(new_state.fg_params)[0]
        assert len(leaf.sharding.device_set) >= 4
