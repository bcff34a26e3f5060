"""Completeness IoU — behavioral equivalent of reference `eval.py:169-178`:
predicted alpha > 0.1 vs GT mask > 0.5, plain intersection/union."""

from __future__ import annotations

import numpy as np


def completeness_iou(pred_alpha: np.ndarray, gt_mask: np.ndarray,
                     pred_threshold: float = 0.5,
                     smooth: float = 0.0) -> float:
    pred = np.asarray(pred_alpha) > pred_threshold
    gt = np.asarray(gt_mask).astype(bool)
    intersection = float(np.logical_and(pred, gt).sum())
    union = float(np.logical_or(pred, gt).sum())
    return (intersection + smooth) / max(union + smooth, 1e-12)
