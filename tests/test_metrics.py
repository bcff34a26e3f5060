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
    # identical images: clamped to the float64-eps floor, finite and no
    # divide-by-zero warning
    with np.errstate(divide="raise"):
        p = psnr_metric(a, a)
    assert np.isfinite(p) and p > 100


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


def test_lpips_weight_modes(tmp_path):
    """weights_mode / load_params: pretrained, heads-only hybrid (random
    backbone + loaded heads), and random fallback."""
    lp = LPIPS()
    full = lp.init_random(jax.random.PRNGKey(1))

    missing = str(tmp_path / "nope.npz")
    assert LPIPS.weights_mode(missing) == "random"
    p_rand = lp.load_params(jax.random.PRNGKey(0), missing)
    assert set(p_rand) == set(full)

    full_path = str(tmp_path / "full.npz")
    np.savez(full_path, **{k: np.asarray(v) for k, v in full.items()})
    assert LPIPS.weights_mode(full_path) == "pretrained"
    assert LPIPS.has_pretrained(full_path)

    heads_path = str(tmp_path / "heads.npz")
    heads = {f"lin{k}": np.full((c,), 0.5, np.float32)
             for k, c in enumerate([64, 128, 256, 512, 512])}
    np.savez(heads_path, **heads)
    assert LPIPS.weights_mode(heads_path) == "heads-only"
    assert not LPIPS.has_pretrained(heads_path)
    p = lp.load_params(jax.random.PRNGKey(0), heads_path)
    # heads come from the npz, backbone from the fixed random init
    np.testing.assert_array_equal(np.asarray(p["lin0"]), heads["lin0"])
    np.testing.assert_array_equal(np.asarray(p["conv0_w"]),
                                  np.asarray(p_rand["conv0_w"]))


def test_lpips_committed_reference_heads():
    """The converted reference linear heads ship in-repo (converted from
    `third_parties/lpips/weights/v0.1/vgg.pth`, the file the reference
    itself distributes): heads-only mode loads with the VGG16 tap
    channel layout and non-negative entries."""
    import os
    from occnerf_tpu.metrics.lpips import DEFAULT_WEIGHTS_PATH as path
    assert os.path.exists(path), "committed heads npz missing"
    mode = LPIPS.weights_mode(path)
    assert mode in ("heads-only", "pretrained")
    w = LPIPS.load_weights(path)
    for k, c in enumerate([64, 128, 256, 512, 512]):
        assert w[f"lin{k}"].shape == (c,)
        assert np.all(np.asarray(w[f"lin{k}"]) >= 0)
    lp = LPIPS()
    params = lp.load_params(jax.random.PRNGKey(0), path)
    x = jax.numpy.asarray(np.random.default_rng(0).uniform(
        -1, 1, (1, 16, 16, 3)).astype(np.float32))
    assert float(lp.apply(params, x, x)[0]) < 1e-6


def test_eval_lpips_metric_helper():
    """eval.py's lpips_metric helper (mirrors the reference's unused
    LPIPS instantiation, `eval.py:90-97`) — covered so it can't rot
    (ADVICE r2)."""
    import importlib
    import sys as _sys
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    _sys.path.insert(0, repo)
    try:
        eval_mod = importlib.import_module("eval")
    finally:
        _sys.path.pop(0)
    lp = LPIPS()
    params = lp.init_random(jax.random.PRNGKey(0))
    img = np.random.default_rng(1).uniform(0, 1, (16, 16, 3)) \
        .astype(np.float32)
    d_same = eval_mod.lpips_metric((lp, params), img, img)
    assert abs(d_same) < 1e-6
    d_diff = eval_mod.lpips_metric((lp, params), img, img * 0.25)
    assert d_diff > 0


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
