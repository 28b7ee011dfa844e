"""Part-level per-pixel CLIP feature maps.

Parity with /root/reference/partlevel/sam_clip_dir.py:
  * per SAM mask: bbox enlarged x1.3 clipped to the image (:42-59);
  * CLIP crop features assigned to the mask's pixels at 1/down resolution
    (:113-126). The reference computes a stability-score weight sum but
    never divides — the effective behavior is stability-scaled
    LAST-WRITER-WINS per pixel; we reproduce that (later masks overwrite);
  * saved as (H/down, W/down, C) .npy (:133).
"""

from __future__ import annotations

import numpy as np


def enlarge_bbox_xyxy(bbox, scale: float, h: int, w: int):
    """(r0, c0, r1, c1) enlarged about center, clipped (sam_clip_dir.py:42-59)."""
    r0, c0, r1, c1 = bbox
    rc, cc = (r0 + r1) / 2, (c0 + c1) / 2
    rh, ch = (r1 - r0) * scale / 2, (c1 - c0) * scale / 2
    return (
        int(max(0, rc - rh)), int(max(0, cc - ch)),
        int(min(h, rc + rh)), int(min(w, cc + ch)),
    )


def build_part_feature_map(
    masks: list[np.ndarray],            # [H, W] bool, in SAM output order
    features: list[np.ndarray],         # [C] CLIP feature per mask
    stability_scores: list[float] | None = None,
    down: int = 5,
) -> np.ndarray:
    """(H/down, W/down, C) map; later masks overwrite earlier ones at shared
    pixels, each scaled by its stability score (sam_clip_dir.py:113-126)."""
    if not masks:
        raise ValueError("no masks")
    h, w = masks[0].shape
    c = len(features[0])
    hd, wd = h // down, w // down
    out = np.zeros((hd, wd, c), np.float32)
    if stability_scores is None:
        stability_scores = [1.0] * len(masks)
    for mask, feat, s in zip(masks, features, stability_scores):
        md = mask[: hd * down : down, : wd * down : down]
        out[md] = np.asarray(feat, np.float32) * float(s)
    return out


def save_part_features(path: str, pf: np.ndarray):
    np.save(path, pf)
