"""Metric tests: PSNR, SSIM (vs closed-form cases), IoU, LPIPS plumbing."""

import numpy as np
import jax

from occnerf_tpu.metrics import (LPIPS, completeness_iou, psnr_metric,
                                 structural_similarity)


def test_psnr_known_values():
    a = np.zeros((8, 8, 3))
    b = np.full((8, 8, 3), 0.1)
    # mse = 0.01 -> psnr = -10*log10(0.01) = 20
    assert np.isclose(psnr_metric(a, b), 20.0)
    assert psnr_metric(a, a) == np.inf or psnr_metric(a, a) > 100


def test_ssim_identical_and_scaled():
    rng = np.random.default_rng(0)
    img = rng.random((32, 32, 3))
    s = structural_similarity(img, img)
    assert np.isclose(s, 1.0)
    s2, full = structural_similarity(img, np.clip(img + 0.25, 0, 1),
                                     full=True)
    assert s2 < 1.0
    assert full.shape == img.shape


def test_ssim_constant_shift():
    # constant images with a mean shift: variance terms vanish; SSIM
    # reduces to the luminance term (2ab+C1)/(a^2+b^2+C1)
    a = np.full((16, 16), 0.4)
    b = np.full((16, 16), 0.6)
    C1 = (0.01 * 1.0) ** 2
    expected = (2 * 0.4 * 0.6 + C1) / (0.4 ** 2 + 0.6 ** 2 + C1)
    s = structural_similarity(a, b, multichannel=False)
    assert np.isclose(s, expected, rtol=1e-6)


def test_completeness_iou():
    pred = np.zeros((10, 10))
    pred[:5] = 1.0
    gt = np.zeros((10, 10), bool)
    gt[:5] = True
    assert np.isclose(completeness_iou(pred, gt), 1.0)
    gt2 = np.zeros((10, 10), bool)
    gt2[2:7] = True  # overlap 30, union 70
    assert np.isclose(completeness_iou(pred, gt2), 30 / 70)


def test_lpips_basic_properties():
    lp = LPIPS()
    params = lp.init_random(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jax.numpy.asarray(rng.uniform(-1, 1, (2, 32, 32, 3))
                          .astype(np.float32))
    d_same = lp.apply(params, x, x)
    assert d_same.shape == (2,)
    assert np.allclose(np.asarray(d_same), 0.0, atol=1e-6)
    y = x * 0.5
    d_diff = np.asarray(lp.apply(params, x, y))
    assert np.all(d_diff > 0)


def test_lpips_weight_roundtrip(tmp_path):
    lp = LPIPS()
    params = lp.init_random(jax.random.PRNGKey(1))
    path = str(tmp_path / "w.npz")
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})
    loaded = LPIPS.load_weights(path)
    assert set(loaded) == set(params)
    for k in params:
        np.testing.assert_array_equal(np.asarray(loaded[k]),
                                      np.asarray(params[k]))
