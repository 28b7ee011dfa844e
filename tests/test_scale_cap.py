"""The reference's actual model cap: 100 fg objects + bg (train.py:231,
configs/Replica/room_0.json:22). The envelope rows in bench/dryrun run
64 slots / 50 active; this module exercises the 128-slot/100-active
scale end-to-end on CPU — slot growth straight to the cap bucket with
every slot genuinely active in the step (not marked quick: two
train_frame compiles at the 32- and 128-slot buckets)."""

import numpy as np
import pytest

import jax

from openobj_tpu.core import trainer
from openobj_tpu.core.scene import Camera, SceneMapper

H, W = 260, 300


def _frame(n_objects):
    """Instance map with ``n_objects`` >=20x20 px blocks on a grid."""
    inst = np.full((H, W), -1, np.int32)
    cols = 10
    for i in range(n_objects):
        r, c = divmod(i, cols)
        inst[5 + 25 * r: 25 + 25 * r, 5 + 28 * c: 25 + 28 * c] = 4 + i
    rgb = np.zeros((H, W, 3), np.uint8)
    rgb[..., 0] = (inst % 251).astype(np.uint8)
    depth = np.full((H, W), 2.0, np.float32)
    return rgb, depth, inst


class TestReferenceModelCap:
    def test_grow_to_128_bucket_with_100_active(self):
        cfg = trainer.TrainConfig(
            n_iters_per_frame=2, win_size=2, n_samples_per_frame=4,
            win_size_bg=2, n_samples_per_frame_bg=8,
            hidden=8, hidden_bg=8, clip_size=4,
        )
        cam = Camera(width=W, height=H, fx=150.0, fy=150.0,
                     cx=W / 2.0, cy=H / 2.0)
        m = SceneMapper(cam, cfg, frame_capacity=4, max_objects=128,
                        initial_bucket=32)

        # frame 0: 30 objects — fits the initial bucket, no growth
        rgb, depth, inst = _frame(30)
        losses = m.process_frame(rgb, depth, inst,
                                 np.eye(4, dtype=np.float32))
        assert m.state.n_slots == 32
        assert np.isfinite(np.asarray(losses)).all()

        # frame 1: all 100 objects appear -> one growth hop 32 -> 128
        # (the reference cap's bucket), every slot active in the step
        rgb, depth, inst = _frame(100)
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = 0.05
        losses = m.process_frame(rgb, depth, inst, pose)
        assert m.n_objects == 100
        assert m.state.n_slots == 128
        assert np.isfinite(np.asarray(losses)).all()

        # params for a late slot exist and a first-frame object's slot
        # survived the growth (stacked-axis copy, trainer.grow_train_state)
        p_first = m.params_for_instance(4)
        p_last = m.params_for_instance(103)
        for a, b in zip(jax.tree.leaves(p_first), jax.tree.leaves(p_last)):
            assert a.shape == b.shape

    def test_101st_object_dropped_at_reference_cap(self):
        """At max_objects=100 the 101st instance is silently dropped —
        reference parity (train.py:231-233 caps the model list) — and the
        bucket clamps to exactly 100 (never 128)."""
        cfg = trainer.TrainConfig(
            n_iters_per_frame=1, win_size=2, n_samples_per_frame=4,
            win_size_bg=2, n_samples_per_frame_bg=8,
            hidden=8, hidden_bg=8, clip_size=4,
        )
        cam = Camera(width=W, height=H, fx=150.0, fy=150.0,
                     cx=W / 2.0, cy=H / 2.0)
        m = SceneMapper(cam, cfg, frame_capacity=4, max_objects=100,
                        initial_bucket=32)
        rgb, depth, inst = _frame(100)
        # a 101st instance in the same frame
        inst[H - 22: H - 2, W - 24: W - 4] = 4 + 100
        losses = m.process_frame(rgb, depth, inst,
                                 np.eye(4, dtype=np.float32))
        assert m.n_objects == 100
        assert m.state.n_slots == 100       # clamped, not 128
        # the 101st instance (id 4+100) itself must be the one dropped —
        # admitting it by evicting an earlier object would also keep
        # len()==100, which is why the count alone is not the assertion
        assert 4 + 100 not in m.registry.inst_to_slot
        assert np.isfinite(np.asarray(losses)).all()


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
