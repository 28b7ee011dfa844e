"""Evaluation harness: render PSNR + zero-shot semantic segmentation mIoU.

The reference ships NO eval code (SURVEY.md §4); its paper protocol is
reconstructed here from the artifacts it writes: rendered ``maskid_*.png``
class-id images (train.py:591,611) vs GT semantic labels for mIoU, and
rendered RGB vs GT images for PSNR. These are the parity metrics in
BASELINE.md.
"""

from __future__ import annotations

import numpy as np


def psnr(pred: np.ndarray, gt: np.ndarray, mask: np.ndarray | None = None,
         max_val: float = 1.0) -> float:
    """Peak signal-to-noise ratio; inputs in [0, max_val] (or uint8)."""
    pred = np.asarray(pred, np.float64)
    gt = np.asarray(gt, np.float64)
    if mask is not None:
        pred, gt = pred[mask], gt[mask]
    mse = np.mean((pred - gt) ** 2)
    return float(-10.0 * np.log10(mse / (max_val**2) + 1e-12))


def depth_l1(pred: np.ndarray, gt: np.ndarray,
             mask: np.ndarray | None = None) -> float:
    if mask is None:
        mask = gt > 0
    return float(np.abs(pred[mask] - gt[mask]).mean())


def confusion_matrix(pred: np.ndarray, gt: np.ndarray, n_classes: int,
                     ignore: int = -1) -> np.ndarray:
    valid = gt != ignore
    idx = gt[valid].astype(np.int64) * n_classes + pred[valid].astype(np.int64)
    return np.bincount(idx, minlength=n_classes**2).reshape(n_classes, n_classes)


def miou_from_confusion(conf: np.ndarray):
    """(mIoU, frequency-weighted mIoU, mean accuracy, per-class IoU) —
    the paper's zero-shot seg metrics (mIoU / fmIoU / mAcc)."""
    inter = np.diag(conf).astype(np.float64)
    union = conf.sum(0) + conf.sum(1) - inter
    freq = conf.sum(1).astype(np.float64)
    present = freq > 0
    iou = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
    miou = float(iou[present].mean()) if present.any() else 0.0
    fmiou = float((iou * freq / max(freq.sum(), 1))[present].sum())
    acc = np.where(freq > 0, inter / np.maximum(freq, 1), 0.0)
    macc = float(acc[present].mean()) if present.any() else 0.0
    return {"miou": miou, "fmiou": fmiou, "macc": macc, "per_class_iou": iou}


def evaluate_semantic_maps(pred_maps: list[np.ndarray],
                           gt_maps: list[np.ndarray],
                           n_classes: int, ignore: int = -1):
    conf = np.zeros((n_classes, n_classes), np.int64)
    for p, g in zip(pred_maps, gt_maps):
        conf += confusion_matrix(p, g, n_classes, ignore)
    return miou_from_confusion(conf)


def evaluate_renders(pred_rgbs, gt_rgbs, pred_depths=None, gt_depths=None,
                     masks=None):
    """Aggregate PSNR (and depth L1) over a set of rendered frames."""
    ps, dl = [], []
    for i, (p, g) in enumerate(zip(pred_rgbs, gt_rgbs)):
        m = masks[i] if masks is not None else None
        ps.append(psnr(np.asarray(p) / 255.0, np.asarray(g) / 255.0, m))
        if pred_depths is not None:
            dm = (np.asarray(gt_depths[i]) > 0)
            if m is not None:
                dm &= m
            dl.append(depth_l1(np.asarray(pred_depths[i]),
                               np.asarray(gt_depths[i]), dm))
    out = {"psnr": float(np.mean(ps))}
    if dl:
        out["depth_l1"] = float(np.mean(dl))
    return out
