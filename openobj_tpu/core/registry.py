"""Host-side object registry: slot allocation + keyframe ring policy.

Objects are preallocated slots on a stacked device axis (SURVEY.md §7.1);
this registry is the tiny host mirror that decides, once per frame per
object, WHICH frame index lands in WHICH keyframe slot. The bulky pixel data
never leaves the device (see core.frame_store); only [O, K] index tables and
[O, K, 4] bboxes are uploaded each frame (~KBs).

Keyframe policy parity (reference vmap.py:166-257):
  * a frame is a keyframe iff frame_cnt % keyframe_step == 0 or the object
    has a single keyframe so far;
  * while the buffer is below K-1 entries: keyframes append, non-keyframes
    overwrite the newest slot;
  * at K-1 entries the buffer is "full": every frame writes into a floating
    pointer slot, and keyframes trigger a random prune (excluding the two
    most recent keyframes) whose slot becomes the next pointer;
  * the two most recent keyframe slots are tracked (forced into every
    training sample draw, vmap.py:390-412).

keyframe_step differs for bg (reference cfg.py:83-84: step / stride, bg 50
vs fg 25). Per-object CLIP/caption observation features are stacked here for
the semantic-assignment stage (reference vmap.py:243-247, train.py:497-526).
"""

from __future__ import annotations

import numpy as np


class SlotState:
    """Per-slot host state (one object)."""

    __slots__ = (
        "inst_id", "n_kf", "frame_cnt", "kf_pointer", "latest", "is_bg",
        "clip_feats", "caption_feats", "captions", "semantic_id",
        "bbox3d", "bbox_final", "obj_center",
    )

    def __init__(self, inst_id: int, is_bg: bool):
        self.inst_id = inst_id
        self.is_bg = is_bg
        self.n_kf = 0
        self.frame_cnt = 0
        self.kf_pointer: int | None = None
        self.latest: list[int] = []
        self.clip_feats: list[np.ndarray] = []
        self.caption_feats: list[np.ndarray] = []
        self.captions: list[str] = []
        self.semantic_id: int | None = None
        self.bbox3d = None          # geometry.OrientedBox once computed
        self.bbox_final = False
        self.obj_center = np.zeros(3, dtype=np.float32)


class ObjectRegistry:
    """Maps global instance ids to object slots and runs the keyframe policy.

    Slot 0 is reserved for the background (instance id 0) when do_bg is set,
    mirroring the reference's separate bg model (train.py:236-242). Slots are
    never freed in the offline pipeline (objects persist); `max_objects`
    caps foreground models like reference train.py:231-233.
    """

    def __init__(
        self,
        max_objects: int,
        keyframe_buffer_size: int,
        keyframe_step: float,
        keyframe_step_bg: float,
        do_bg: bool = True,
        seed: int = 0,
    ):
        self.max_objects = max_objects      # fg slots
        self.K = keyframe_buffer_size
        self.keyframe_step = max(1, int(keyframe_step))
        self.keyframe_step_bg = max(1, int(keyframe_step_bg))
        self.do_bg = do_bg
        self._rng = np.random.default_rng(seed)

        O = max_objects
        self.kf_frames = np.zeros((O, self.K), dtype=np.int32)
        self.kf_bbox = np.zeros((O, self.K, 4), dtype=np.float32)  # r0,r1,c0,c1
        self.slots: dict[int, SlotState] = {}        # slot -> state
        self.inst_to_slot: dict[int, int] = {}
        self.active = np.zeros((O,), dtype=bool)
        self.n_kf = np.zeros((O,), dtype=np.int32)
        self.latest2 = np.zeros((O, 2), dtype=np.int32)
        self.obj_inst = np.full((O,), -(10**9), dtype=np.int32)  # never matches
        self.new_slots_this_frame: list[int] = []

        # bg bookkeeping (separate single model)
        self.bg = SlotState(0, True) if do_bg else None
        self.bg_kf_frames = np.zeros((self.K,), dtype=np.int32)
        self.bg_kf_bbox = np.zeros((self.K, 4), dtype=np.float32)
        self.bg_latest2 = np.zeros((2,), dtype=np.int32)
        self.bg_seen = False

    # ------------------------------------------------------------------ #

    def _alloc_slot(self, inst_id: int) -> int | None:
        n_used = len(self.slots)
        if n_used >= self.max_objects:
            return None  # models full (reference train.py:231-233)
        slot = n_used
        self.slots[slot] = SlotState(inst_id, is_bg=False)
        self.inst_to_slot[inst_id] = slot
        self.active[slot] = True
        self.obj_inst[slot] = inst_id
        self.new_slots_this_frame.append(slot)
        return slot

    def _observe(
        self, st: SlotState, kf_frames, kf_bbox, latest2,
        frame_idx: int, bbox: np.ndarray, step: int,
    ):
        """Run the append_keyframe policy for one object (vmap.py:166-257)."""
        if st.n_kf == 0:  # first observation: always keyframe slot 0
            kf_frames[0] = frame_idx
            kf_bbox[0] = bbox
            st.n_kf = 1
            st.latest = [0]
            st.frame_cnt = 0
        else:
            is_kf = (st.frame_cnt % step == 0) or st.n_kf == 1
            if st.n_kf == self.K - 1:  # buffer full
                if st.kf_pointer is None:
                    st.kf_pointer = st.n_kf
                ptr = st.kf_pointer
                kf_frames[ptr] = frame_idx
                kf_bbox[ptr] = bbox
                if is_kf:
                    st.latest.append(ptr)
                    # prune a random keyframe, excluding the 2 most recent
                    protected = set(st.latest[-2:])
                    candidates = [
                        i for i in range(st.n_kf + 1)
                        if i not in protected and i != ptr
                    ]
                    st.kf_pointer = int(self._rng.choice(candidates))
            else:
                if not is_kf:  # overwrite newest slot
                    idx = st.n_kf - 1
                    kf_frames[idx] = frame_idx
                    kf_bbox[idx] = bbox
                else:  # append
                    idx = st.n_kf
                    kf_frames[idx] = frame_idx
                    kf_bbox[idx] = bbox
                    st.latest.append(idx)
                    st.n_kf += 1
            st.frame_cnt += 1
        if len(st.latest) > 2:
            st.latest = st.latest[-2:]
        l = st.latest[-2:] if len(st.latest) >= 2 else st.latest * 2
        latest2[0], latest2[1] = l[0], l[1]

    def observe_object(
        self,
        inst_id: int,
        frame_idx: int,
        bbox: np.ndarray,
        clip_feat: np.ndarray | None = None,
        caption_feat: np.ndarray | None = None,
        caption: str | None = None,
    ) -> int | None:
        """Register one object observation in ``frame_idx``. Returns the slot
        (None if fg models are full), handling bg (inst 0) separately."""
        bbox = np.asarray(bbox, dtype=np.float32)
        if self.do_bg and inst_id == 0:
            st = self.bg
            self.bg_seen = True
            self._observe(
                st, self.bg_kf_frames, self.bg_kf_bbox, self.bg_latest2,
                frame_idx, bbox, self.keyframe_step_bg,
            )
            slot = -1  # sentinel: background
        else:
            slot = self.inst_to_slot.get(inst_id)
            if slot is None:
                slot = self._alloc_slot(inst_id)
                if slot is None:
                    return None
            st = self.slots[slot]
            self._observe(
                st, self.kf_frames[slot], self.kf_bbox[slot],
                self.latest2[slot], frame_idx, bbox, self.keyframe_step,
            )
            self.n_kf[slot] = st.n_kf
        if clip_feat is not None:
            st.clip_feats.append(np.asarray(clip_feat).reshape(-1))
        if caption_feat is not None:
            st.caption_feats.append(np.asarray(caption_feat).reshape(-1))
        if caption is not None:
            st.captions.append(caption)
        return slot

    def referenced_frames(self) -> set:
        """Every store frame index any keyframe ring (fg or bg) may still
        reference — the NON-evictable set. Conservative: all K entries of
        each active slot count (ring entries never written hold 0, which
        over-retains store slot 0 only)."""
        ref = set()
        if self.active.any():
            ref.update(np.unique(self.kf_frames[self.active]).tolist())
        if self.bg is not None and self.bg_seen:
            ref.update(np.unique(self.bg_kf_frames).tolist())
        return ref

    def pop_new_slots(self) -> list[int]:
        out = self.new_slots_this_frame
        self.new_slots_this_frame = []
        return out

    @property
    def n_objects(self) -> int:
        return len(self.slots)

    def fg_tables(self):
        """Device-upload view of the fg keyframe tables."""
        return {
            "kf_frames": self.kf_frames,
            "kf_bbox": self.kf_bbox,
            "n_kf": self.n_kf,
            "latest2": self.latest2,
            "active": self.active.copy(),
            "obj_inst": self.obj_inst,
        }

    def bg_tables(self):
        st = self.bg
        return {
            "kf_frames": self.bg_kf_frames,
            "kf_bbox": self.bg_kf_bbox,
            "n_kf": np.int32(st.n_kf if st else 0),
            "latest2": self.bg_latest2,
        }
