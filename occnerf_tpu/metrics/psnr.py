"""PSNR metric — behavioral equivalent of reference `eval.py:76-87`."""

from __future__ import annotations

import numpy as np


def psnr_metric(img_pred: np.ndarray, img_gt: np.ndarray) -> float:
    """PSNR over [0, 1]-ranged images: ``-10 log10(mse)``.

    A zero-MSE (identical) pair is clamped to the float64-epsilon floor
    (~313 dB) instead of printing ``inf`` into eval averages — the
    reference's unclamped form (`eval.py:76-87`) divides by zero there.
    """
    mse = np.mean((np.asarray(img_pred, np.float64)
                   - np.asarray(img_gt, np.float64)) ** 2)
    mse = max(float(mse), np.finfo(np.float64).eps ** 2)
    return float(-10.0 * np.log(mse) / np.log(10.0))
