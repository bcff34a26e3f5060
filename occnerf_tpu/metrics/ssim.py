"""Structural similarity (SSIM).

Clean-room implementation of the classic Wang et al. SSIM with the same
defaults the reference relies on through
``skimage.metrics.structural_similarity(multichannel=True, full=True)``
(`eval.py:196`): 7x7 uniform window, K1=0.01, K2=0.03, sample covariance
normalization (N/(N-1)), per-channel maps averaged for the scalar.
skimage is not in this environment, so this is the framework's own port.
"""

from __future__ import annotations

import numpy as np
from scipy.ndimage import uniform_filter


def _uniform_filter(img: np.ndarray, win: int) -> np.ndarray:
    """Box filter — scipy's uniform_filter is what skimage uses
    internally, so numerics match exactly."""
    return uniform_filter(img.astype(np.float64), size=win)


def _ssim_single(x: np.ndarray, y: np.ndarray, win: int, data_range: float,
                 K1: float, K2: float) -> np.ndarray:
    NP = win * win
    cov_norm = NP / (NP - 1.0)  # sample covariance, like skimage
    ux = _uniform_filter(x, win)
    uy = _uniform_filter(y, win)
    uxx = _uniform_filter(x * x, win)
    uyy = _uniform_filter(y * y, win)
    uxy = _uniform_filter(x * y, win)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    A1 = 2.0 * ux * uy + C1
    A2 = 2.0 * vxy + C2
    B1 = ux ** 2 + uy ** 2 + C1
    B2 = vx + vy + C2
    return (A1 * A2) / (B1 * B2)


def structural_similarity(im1: np.ndarray, im2: np.ndarray,
                          win_size: int = 7, data_range: float = 1.0,
                          multichannel: bool = True, full: bool = False,
                          K1: float = 0.01, K2: float = 0.03):
    """SSIM between two images in [0, data_range].

    Returns the mean SSIM, and additionally the full per-pixel map when
    ``full=True`` — the reference averages the map over body / visibility
    masks (`eval.py:198-204`).  The scalar crops a ``win_size//2`` border
    before averaging, like skimage.
    """
    im1 = np.asarray(im1, np.float64)
    im2 = np.asarray(im2, np.float64)
    assert im1.shape == im2.shape

    if multichannel and im1.ndim == 3:
        maps = np.stack([
            _ssim_single(im1[..., c], im2[..., c], win_size, data_range,
                         K1, K2)
            for c in range(im1.shape[-1])], axis=-1)
    else:
        maps = _ssim_single(im1, im2, win_size, data_range, K1, K2)

    pad = (win_size - 1) // 2
    cropped = maps[pad:maps.shape[0] - pad, pad:maps.shape[1] - pad]
    mssim = float(cropped.mean())
    if full:
        return mssim, maps
    return mssim
