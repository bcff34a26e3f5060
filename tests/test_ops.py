import numpy as np
import pytest

import jax
import jax.numpy as jnp

from occnerf_tpu.ops import (HashGridSpec, hash_grid_encode, knn,
                             multiscale_knn, raw2outputs, sample_zvals,
                             stratify_zvals, grid_sample_3d,
                             sample_motion_fields, sh_encode)


# ---------------------------------------------------------------------------
# trilinear grid sampling vs torch grid_sample oracle
# ---------------------------------------------------------------------------

def test_grid_sample_matches_torch(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    vol = rng.normal(size=(9, 7, 5)).astype(np.float32)   # (D, H, W)
    coords = rng.uniform(-1.3, 1.3, size=(400, 3)).astype(np.float32)  # xyz

    ours = np.asarray(grid_sample_3d(jnp.asarray(vol), jnp.asarray(coords)))

    t_out = F.grid_sample(
        torch.tensor(vol)[None, None],
        torch.tensor(coords)[None, None, None],
        padding_mode="zeros", align_corners=True)[0, 0, 0, 0].numpy()

    np.testing.assert_allclose(ours, t_out, atol=1e-5)


def test_sample_motion_fields_matches_loop_oracle(rng):
    """Cross-check the fused sampler against a per-bone torch loop that
    mirrors the reference `_sample_motion_fields` (network.py:351-402)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    B, G, N = 5, 8, 64
    Rs = rng.normal(size=(B, 3, 3)).astype(np.float32)
    Ts = rng.normal(size=(B, 3)).astype(np.float32)
    vol = np.abs(rng.normal(size=(B + 1, G, G, G))).astype(np.float32)
    pts = rng.normal(size=(N, 3)).astype(np.float32)
    mn = np.array([-1.5, -1.5, -1.5], np.float32)
    scale = np.array([0.7, 0.8, 0.9], np.float32)

    x_skel, fg = sample_motion_fields(
        jnp.asarray(pts), jnp.asarray(Rs), jnp.asarray(Ts), jnp.asarray(vol),
        jnp.asarray(mn), jnp.asarray(scale))

    # oracle: reference-style loop
    tp = torch.tensor(pts)
    weights_list, pos_list = [], []
    for i in range(B):
        pos = torch.tensor(Rs[i]) @ tp.T
        pos = pos.T + torch.tensor(Ts[i])
        grid = (pos - torch.tensor(mn)) * torch.tensor(scale) - 1.0
        w = F.grid_sample(torch.tensor(vol[i])[None, None],
                          grid[None, None, None],
                          padding_mode="zeros", align_corners=True)
        weights_list.append(w[0, 0, 0, 0][:, None])
        pos_list.append(pos)
    w = torch.cat(weights_list, dim=-1)             # (N, B)
    wsum = w.sum(-1, keepdim=True)
    x_ref = sum(w[:, i:i + 1] * pos_list[i] for i in range(B)) \
        / wsum.clamp(min=1e-4)

    np.testing.assert_allclose(np.asarray(x_skel), x_ref.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(fg), wsum.numpy(), atol=1e-5)


# ---------------------------------------------------------------------------
# knn vs numpy oracle (compare distances, not indices — tie order may differ)
# ---------------------------------------------------------------------------

def test_knn_exact_matches_numpy(rng):
    q = rng.normal(size=(300, 3)).astype(np.float32)
    p = rng.normal(size=(750, 3)).astype(np.float32)
    d, idx = knn(jnp.asarray(q), jnp.asarray(p), k=10, backend="exact",
                 block=128)
    ref = np.sort(np.linalg.norm(q[:, None] - p[None], axis=-1), axis=-1)[:, :10]
    np.testing.assert_allclose(np.asarray(d), ref, atol=1e-4)
    # indices consistent with distances
    gathered = np.linalg.norm(q[:, None] - p[np.asarray(idx)], axis=-1)
    np.testing.assert_allclose(np.sort(gathered, -1), ref, atol=1e-4)


def test_knn_approx_recall(rng):
    q = rng.normal(size=(256, 3)).astype(np.float32)
    p = rng.normal(size=(2048, 3)).astype(np.float32)
    _, idx_a = knn(jnp.asarray(q), jnp.asarray(p), k=10, backend="approx")
    _, idx_e = knn(jnp.asarray(q), jnp.asarray(p), k=10, backend="exact")
    recall = np.mean([
        len(set(np.asarray(idx_a)[i]) & set(np.asarray(idx_e)[i])) / 10
        for i in range(256)])
    assert recall > 0.9


def test_multiscale_knn_indices_point_into_base(rng):
    q = rng.normal(size=(100, 3)).astype(np.float32)
    base = rng.normal(size=(500, 3)).astype(np.float32)
    fps = [np.arange(0, 500, 4), np.arange(0, 500, 16)]
    idx = multiscale_knn(jnp.asarray(q), jnp.asarray(base),
                         [jnp.asarray(f) for f in fps], k=5)
    assert idx.shape == (100, 3, 5)
    # level 1 indices must come from the fps subset
    assert np.all(np.isin(np.asarray(idx[:, 1]), fps[0]))
    assert np.all(np.isin(np.asarray(idx[:, 2]), fps[1]))
    # level 0 = plain knn into base
    ref = np.argsort(np.linalg.norm(q[:, None] - base[None], axis=-1), -1)[:, :5]
    d_ours = np.linalg.norm(q[:, None] - base[np.asarray(idx[:, 0])], axis=-1)
    d_ref = np.linalg.norm(q[:, None] - base[ref], axis=-1)
    np.testing.assert_allclose(np.sort(d_ours, -1), np.sort(d_ref, -1), atol=1e-4)


# ---------------------------------------------------------------------------
# hash grid
# ---------------------------------------------------------------------------

def _small_spec():
    return HashGridSpec.create(input_dim=3, num_levels=4, level_dim=2,
                               base_resolution=4, log2_hashmap_size=7,
                               desired_resolution=32)


def _oracle_grid_index(pl, spec, lvl):
    """Scalar get_grid_index (gridencoder.cu): dense strided index while
    the stride fits the table, spatial hash otherwise."""
    primes = np.array([1, 2654435761, 805459861, 3674653429, 2097192037],
                      dtype=np.uint64)
    res = spec.resolutions[lvl]
    hsize = spec.offsets[lvl + 1] - spec.offsets[lvl]
    per_dim = res if spec.align_corners else res + 1
    stride, index = 1, 0
    for d in range(spec.input_dim):
        if stride <= hsize:
            index += int(pl[d]) * stride
            stride *= per_dim
    if stride > hsize:  # hash
        h = np.uint64(0)
        for d in range(spec.input_dim):
            h ^= np.uint64(int(pl[d]) * int(primes[d])) \
                & np.uint64(0xFFFFFFFF)
        index = int(h & np.uint64(0xFFFFFFFF))
    return index % hsize


def _numpy_hashgrid_oracle(x, table, spec):
    """Independent scalar transliteration of the CUDA algorithm
    (gridencoder.cu:50-200) for cross-checking; honors align_corners
    (+0.0 offset, res-per-dim stride) and smoothstep interpolation."""
    D, L, C = spec.input_dim, spec.num_levels, spec.level_dim
    N = x.shape[0]
    out = np.zeros((N, L * C), np.float32)
    for n in range(N):
        if np.any((x[n] < 0) | (x[n] > 1)):
            continue
        for lvl in range(L):
            scale = spec.scales[lvl]
            pos = x[n] * scale + (0.0 if spec.align_corners else 0.5)
            pg = np.floor(pos).astype(np.uint64)
            fr = pos - pg
            if spec.interpolation == "smoothstep":
                fr = fr * fr * (3.0 - 2.0 * fr)
            acc = np.zeros(C, np.float64)
            for ci in range(1 << D):
                w = 1.0
                pl = pg.copy()
                for d in range(D):
                    if ci & (1 << d):
                        w *= fr[d]
                        pl[d] += 1
                    else:
                        w *= 1 - fr[d]
                index = _oracle_grid_index(pl, spec, lvl) + spec.offsets[lvl]
                acc += w * table[index]
            out[n, lvl * C:(lvl + 1) * C] = acc
    return out


def test_hashgrid_spec_matches_reference_layout():
    # the production spec used by occnerf_mlp (occnerf_mlp.py:45), bound=1
    spec = HashGridSpec.create(input_dim=4, num_levels=16, level_dim=2,
                               base_resolution=16, log2_hashmap_size=19,
                               desired_resolution=2048)
    assert spec.num_levels == 16
    # level 0: res 16 -> 17^4 = 83521 -> ceil/8*8 = 83528
    assert spec.offsets[1] - spec.offsets[0] == 83528
    # finest level capped at 2^19
    assert spec.offsets[-1] - spec.offsets[-2] == 2 ** 19
    assert spec.resolutions[0] == 16
    assert abs(spec.resolutions[-1] - 2048) <= 1
    assert not spec.use_hash[0] and spec.use_hash[-1]


def test_hashgrid_matches_numpy_oracle(rng):
    spec = _small_spec()
    table = rng.normal(0, 0.1, (spec.table_size, spec.level_dim)
                       ).astype(np.float32)
    x = rng.uniform(0, 1, (50, 3)).astype(np.float32)
    x[:3] = [[0, 0, 0], [1, 1, 1], [0.5, 0.25, 0.75]]
    x[3] = [1.2, 0.5, 0.5]  # oob -> zeros
    ours = np.asarray(hash_grid_encode(jnp.asarray(x), jnp.asarray(table), spec))
    ref = _numpy_hashgrid_oracle(x, table, spec)
    np.testing.assert_allclose(ours, ref, atol=1e-4)
    assert np.all(ours[3] == 0.0)


@pytest.mark.parametrize("D,C,align,interp", [
    (3, 2, False, "smoothstep"),
    (3, 2, True, "linear"),
    (2, 8, True, "smoothstep"),
    (5, 1, False, "linear"),
    (4, 4, False, "smoothstep"),
])
def test_hashgrid_extended_modes_match_oracle(rng, D, C, align, interp):
    """The CUDA extension's full surface (gridencoder.cu: D 2..5,
    C 1/2/4/8, align_corners, smoothstep) vs the scalar oracle."""
    spec = HashGridSpec.create(
        input_dim=D, num_levels=3, level_dim=C, base_resolution=4,
        log2_hashmap_size=7, desired_resolution=16,
        align_corners=align, interpolation=interp)
    table = rng.normal(0, 0.1, (spec.table_size, C)).astype(np.float32)
    x = rng.uniform(0, 1, (20, D)).astype(np.float32)
    x[0] = 0.0
    x[1] = 1.0
    ours = np.asarray(hash_grid_encode(jnp.asarray(x), jnp.asarray(table),
                                       spec))
    ref = _numpy_hashgrid_oracle(x, table, spec)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_hashgrid_smoothstep_input_grads(rng):
    """Smoothstep input gradients (the CUDA pos_deriv chain term,
    gridencoder.cu:151-158) via AD vs central finite differences."""
    spec = HashGridSpec.create(input_dim=3, num_levels=3, level_dim=2,
                               base_resolution=4, log2_hashmap_size=7,
                               desired_resolution=16,
                               interpolation="smoothstep")
    table = jnp.asarray(rng.normal(0, 0.1, (spec.table_size, 2))
                        .astype(np.float32))
    x0 = np.array([[0.31, 0.57, 0.73]], np.float32)

    def f(xx):
        return jnp.sum(hash_grid_encode(xx, table, spec))

    with jax.enable_x64():
        x64 = jnp.asarray(x0, jnp.float64)
        g_ad = np.asarray(jax.grad(f)(x64))
        eps = 1e-6
        for d in range(3):
            xp = x0.astype(np.float64).copy()
            xm = xp.copy()
            xp[0, d] += eps
            xm[0, d] -= eps
            g_fd = (float(f(jnp.asarray(xp))) - float(f(jnp.asarray(xm)))) \
                / (2 * eps)
            np.testing.assert_allclose(g_ad[0, d], g_fd, rtol=1e-4,
                                       atol=1e-6)


def test_hashgrid_sorted_backward_extended_modes(rng):
    """The sorted (scatter-free) table backward stays exact vs the AD
    oracle under smoothstep + align_corners and wide level_dim."""
    from occnerf_tpu.ops.hashgrid import hash_grid_encode_sorted
    spec = HashGridSpec.create(input_dim=3, num_levels=3, level_dim=4,
                               base_resolution=4, log2_hashmap_size=7,
                               desired_resolution=16, align_corners=True,
                               interpolation="smoothstep")
    table = jnp.asarray(rng.normal(0, 0.1, (spec.table_size, 4))
                        .astype(np.float32))
    x = jnp.asarray(rng.uniform(0, 1, (64, 3)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(64, spec.output_dim))
                    .astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(hash_grid_encode_sorted(x, table, spec)),
        np.asarray(hash_grid_encode(x, table, spec)), atol=1e-6)
    g_ad = jax.grad(lambda t: jnp.sum(hash_grid_encode(x, t, spec) * g))(
        table)
    g_sorted = jax.grad(
        lambda t: jnp.sum(hash_grid_encode_sorted(x, t, spec) * g))(table)
    np.testing.assert_allclose(np.asarray(g_sorted), np.asarray(g_ad),
                               atol=2e-5)


def _numpy_tv_grad_oracle(x, table, spec, weight):
    """Scalar transliteration of kernel_grad_tv (gridencoder.cu:507-609):
    anchor-only gradient, per-channel rsqrt normalization."""
    D, C = spec.input_dim, spec.level_dim
    grad = np.zeros_like(table, dtype=np.float64)
    w = weight / (2 * D)
    for n in range(x.shape[0]):
        if np.any((x[n] < 0) | (x[n] > 1)):
            continue
        for lvl in range(spec.num_levels):
            scale = spec.scales[lvl]
            res = spec.resolutions[lvl]
            pos = x[n] * scale + (0.0 if spec.align_corners else 0.5)
            pg = np.floor(pos).astype(np.int64)
            anchor = _oracle_grid_index(pg, spec, lvl) + spec.offsets[lvl]
            results = np.zeros(C, np.float64)
            idelta = np.zeros(C, np.float64)
            for d in range(D):
                for side in (+1, -1):
                    if side > 0 and pg[d] >= res:
                        continue
                    if side < 0 and pg[d] <= 0:
                        continue
                    pl = pg.copy()
                    pl[d] += side
                    nb = _oracle_grid_index(pl, spec, lvl) \
                        + spec.offsets[lvl]
                    diff = table[anchor] - table[nb]
                    results += diff
                    idelta += diff * diff
            grad[anchor] += w * results / np.sqrt(idelta + 1e-9)
    return grad.astype(np.float32)


def test_hashgrid_tv_grad_matches_oracle(rng):
    """grad_total_variation vs the scalar CUDA-semantics oracle
    (grid.py:174-194 usage; kernel_grad_tv)."""
    from occnerf_tpu.ops.hashgrid import grad_total_variation
    spec = _small_spec()
    table = rng.normal(0, 0.1, (spec.table_size, spec.level_dim)
                       ).astype(np.float32)
    x = rng.uniform(0, 1, (40, 3)).astype(np.float32)
    x[0] = 0.0   # boundary anchors: left neighbors skipped
    x[1] = 1.0   # right neighbors skipped
    x[2] = [1.5, 0.5, 0.5]  # oob -> no contribution
    ours = np.asarray(grad_total_variation(
        jnp.asarray(x), jnp.asarray(table), spec, weight=1e-3))
    ref = _numpy_tv_grad_oracle(x, table, spec, weight=1e-3)
    np.testing.assert_allclose(ours, ref, atol=1e-7)


def test_hashgrid_4d_production_spec_runs(rng):
    spec = HashGridSpec.create(input_dim=4, num_levels=16, level_dim=2,
                               base_resolution=16, log2_hashmap_size=19,
                               desired_resolution=512)
    table = spec.init_table(jax.random.PRNGKey(0))
    x = rng.uniform(0, 1, (128, 4)).astype(np.float32)
    out = hash_grid_encode(jnp.asarray(x), table, spec)
    assert out.shape == (128, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_hashgrid_gradients(rng):
    spec = _small_spec()
    table = jnp.asarray(rng.normal(0, 0.1, (spec.table_size, spec.level_dim)
                                   ).astype(np.float32))
    x = jnp.asarray(rng.uniform(0.1, 0.9, (8, 3)).astype(np.float32))

    def loss_t(t):
        return jnp.sum(hash_grid_encode(x, t, spec) ** 2)

    def loss_x(xx):
        return jnp.sum(hash_grid_encode(xx, table, spec) ** 2)

    # table gradient: directional finite difference
    g_t = jax.grad(loss_t)(table)
    v = jnp.asarray(rng.normal(size=table.shape).astype(np.float32))
    eps = 1e-3
    fd = (loss_t(table + eps * v) - loss_t(table - eps * v)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(g_t, v)), float(fd), rtol=2e-2)

    # input gradient (replaces CUDA dy_dx): finite difference.  The encode
    # is piecewise-linear in the inputs, so keep eps small enough that the
    # probe does not straddle an interpolation-cell boundary, and use x64
    # to keep FD noise below the signal.
    with jax.enable_x64():
        x64 = x.astype(jnp.float64)
        t64 = table.astype(jnp.float64)

        def loss_x64(xx):
            return jnp.sum(hash_grid_encode(xx, t64, spec) ** 2)

        g_x = jax.grad(loss_x64)(x64)
        vx = jnp.asarray(rng.normal(size=x.shape))
        eps2 = 1e-7
        fdx = (loss_x64(x64 + eps2 * vx) - loss_x64(x64 - eps2 * vx)) / (2 * eps2)
        np.testing.assert_allclose(float(jnp.vdot(g_x, vx)), float(fdx),
                                   rtol=1e-4)


# ---------------------------------------------------------------------------
# raymarch
# ---------------------------------------------------------------------------

def test_raw2outputs_matches_numpy_oracle(rng):
    N, S = 32, 16
    raw = rng.normal(size=(N, S, 4)).astype(np.float32)
    mask = (rng.uniform(size=(N, S, 1)) > 0.3).astype(np.float32)
    z = np.sort(rng.uniform(1, 3, (N, S)).astype(np.float32), axis=-1)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    bg = np.array([255.0, 128.0, 0.0], np.float32)

    out = raw2outputs(jnp.asarray(raw), jnp.asarray(mask), jnp.asarray(z),
                      jnp.asarray(d), jnp.asarray(bg))

    # independent loop oracle
    def softplus(x):
        return np.log1p(np.exp(-np.abs(x))) + np.maximum(x, 0)

    dists = np.concatenate([z[:, 1:] - z[:, :-1],
                            np.full((N, 1), 1e10, np.float32)], -1)
    dists = dists * np.linalg.norm(d, axis=-1, keepdims=True)
    sig = 1 / (1 + np.exp(-raw[..., :3]))
    alpha = (1 - np.exp(-softplus(raw[..., 3]) * dists)) * mask[..., 0]
    rgb_ref = np.zeros((N, 3))
    depth_ref = np.zeros(N)
    acc_ref = np.zeros(N)
    for n in range(N):
        T = 1.0
        for s in range(S):
            w = alpha[n, s] * T
            rgb_ref[n] += w * sig[n, s]
            depth_ref[n] += w * z[n, s]
            acc_ref[n] += w
            T *= 1 - alpha[n, s] + 1e-10
    rgb_ref += (1 - acc_ref[:, None]) * bg / 255.0

    np.testing.assert_allclose(np.asarray(out.rgb), rgb_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.depth), depth_ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.acc), acc_ref, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.term_idx),
                                  np.argmax(alpha, axis=1))


def test_zval_sampling():
    near = jnp.full((8, 1), 2.0)
    far = jnp.full((8, 1), 4.0)
    z = sample_zvals(near, far, 16)
    assert z.shape == (8, 16)
    np.testing.assert_allclose(np.asarray(z[:, 0]), 2.0)
    np.testing.assert_allclose(np.asarray(z[:, -1]), 4.0)
    zs = stratify_zvals(jax.random.PRNGKey(0), z)
    assert np.all(np.asarray(zs) >= 2.0 - 1e-5)
    assert np.all(np.asarray(zs) <= 4.0 + 1e-5)
    assert np.all(np.diff(np.asarray(zs), axis=-1) > -0.3)


# ---------------------------------------------------------------------------
# spherical harmonics
# ---------------------------------------------------------------------------

def test_sh_encode_sum_rule(rng):
    """sum_m Y_lm(d)^2 == (2l+1)/(4pi) for real SH at any direction."""
    d = rng.normal(size=(64, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    out = np.asarray(sh_encode(jnp.asarray(d), degree=4))
    assert out.shape == (64, 16)
    groups = [(0, 1), (1, 4), (4, 9), (9, 16)]
    for l, (a, b) in enumerate(groups):
        expect = (2 * l + 1) / (4 * np.pi)
        np.testing.assert_allclose((out[:, a:b] ** 2).sum(-1), expect,
                                   rtol=1e-5)


def test_sh_encode_degrees_5_to_8(rng):
    """Degrees 5..8 (CUDA shencoder.cu supports <= 8): sum rule per l,
    agreement of the recurrence evaluator with the hardcoded basis on the
    shared degrees, and exact pole values Y_l^0(z-hat) = sqrt((2l+1)/4pi)."""
    from occnerf_tpu.ops.sh import _sh_general

    d = rng.normal(size=(64, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    # recurrence == hardcoded on degrees 1..4
    for deg in range(1, 5):
        np.testing.assert_allclose(
            np.asarray(_sh_general(jnp.asarray(d), deg)),
            np.asarray(sh_encode(jnp.asarray(d), degree=deg)),
            atol=1e-5)

    out = np.asarray(sh_encode(jnp.asarray(d), degree=8))
    assert out.shape == (64, 64)
    for l in range(8):
        a, b = l * l, (l + 1) * (l + 1)
        np.testing.assert_allclose(
            (out[:, a:b] ** 2).sum(-1), (2 * l + 1) / (4 * np.pi),
            rtol=1e-4)

    pole = np.asarray(sh_encode(jnp.asarray([[0.0, 0.0, 1.0]]), degree=8))[0]
    for l in range(8):
        for m in range(-l, l + 1):
            idx = l * l + (m + l)
            expect = np.sqrt((2 * l + 1) / (4 * np.pi)) if m == 0 else 0.0
            np.testing.assert_allclose(pole[idx], expect, atol=1e-6)


# ---------------------------------------------------------------------------
# sorted (scatter-free) hash-grid backward
# ---------------------------------------------------------------------------

def test_hashgrid_sorted_backward_matches_ad(rng):
    """hash_grid_encode_sorted: identical forward, table grads equal to
    the AD scatter oracle, zero input cotangent (no-input-grad contract)."""
    from occnerf_tpu.ops.hashgrid import hash_grid_encode_sorted

    spec = HashGridSpec.create(input_dim=4, num_levels=6, level_dim=2,
                               base_resolution=4, log2_hashmap_size=10,
                               desired_resolution=64)
    table = spec.init_table(jax.random.PRNGKey(1), std=0.5)
    x = jnp.asarray(rng.uniform(-0.1, 1.1, (257, 4)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(257, spec.output_dim))
                    .astype(np.float32))

    out_ad = hash_grid_encode(x, table, spec)
    out_sorted = hash_grid_encode_sorted(x, table, spec)
    np.testing.assert_array_equal(np.asarray(out_ad), np.asarray(out_sorted))

    g_ad = jax.grad(lambda t: jnp.sum(hash_grid_encode(x, t, spec) * g))(
        table)
    g_sorted, g_x = jax.grad(
        lambda t, xx: jnp.sum(hash_grid_encode_sorted(xx, t, spec) * g),
        argnums=(0, 1))(table, x)
    np.testing.assert_allclose(np.asarray(g_ad), np.asarray(g_sorted),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(g_x), 0.0)


def test_searchsorted_iota_matches_numpy(rng):
    """The anchored integer-query searchsorted (the sorted backward's
    boundary lookup) equals np.searchsorted on random sorted keys,
    including duplicate-heavy, all-equal and single-element inputs, and
    window widths around the anchor stride."""
    from occnerf_tpu.ops.hashgrid import _searchsorted_iota

    cases = []
    for n_rows, m in ((5000, 20000), (300, 7), (64, 64), (1000, 1)):
        cases.append((np.sort(rng.integers(0, n_rows, m)).astype(np.int32),
                      n_rows))
    cases.append((np.full(129, 3, np.int32), 10))       # one fat segment
    cases.append((np.arange(100, dtype=np.int32), 100))  # all unique
    for keys, n_rows in cases:
        got = np.asarray(_searchsorted_iota(jnp.asarray(keys), n_rows))
        want = np.searchsorted(keys, np.arange(n_rows + 1))
        np.testing.assert_array_equal(got, want)


def test_motion_proxy_upper_bounds_exact():
    """The pooled+dilated half-res proxy (tpu.motion_rank_proxy ranking)
    upper-bounds the exact trilinear foreground likelihood for every
    sample — in-range, boundary and out-of-support — and is exactly 0
    where the exact kernel's zero padding gives 0 support."""
    import jax
    import jax.numpy as jnp

    from occnerf_tpu.ops.trilinear import (pool_dilate_volume,
                                           sample_motion_fields,
                                           sample_motion_proxy)

    rng = np.random.default_rng(7)
    B = 5
    vols = jnp.asarray(rng.uniform(size=(B + 1, 32, 32, 32))
                       .astype(np.float32))
    Rs = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
                     + rng.normal(0, 0.05, (B, 3, 3)).astype(np.float32))
    Ts = jnp.asarray(rng.normal(0, 0.3, (B, 3)).astype(np.float32))
    mn = jnp.asarray(np.float32([-1.2, -1.1, -1.3]))
    scale = jnp.asarray(np.float32([0.9, 1.0, 0.8]))
    # points spanning well past the volume so OOB paths are exercised
    pts = jnp.asarray(rng.uniform(-4, 4, (2000, 3)).astype(np.float32))

    _, fg = sample_motion_fields(pts, Rs, Ts, vols, mn, scale,
                                 use_pallas=False)
    proxy = pool_dilate_volume(vols[:B])
    ub = sample_motion_proxy(pts, Rs, Ts, proxy, mn, scale,
                             use_pallas=False)
    fg = np.asarray(fg)[:, 0]
    ub = np.asarray(ub)[:, 0]
    assert (ub >= fg - 1e-5).all(), \
        f"proxy below exact by {float((fg - ub).max())}"
    # far-OOB samples must be exactly 0 under both
    far = jnp.asarray(np.float32([[50.0, 50.0, 50.0]]))
    _, fg_far = sample_motion_fields(far, Rs, Ts, vols, mn, scale,
                                     use_pallas=False)
    ub_far = sample_motion_proxy(far, Rs, Ts, proxy, mn, scale,
                                 use_pallas=False)
    assert float(fg_far[0, 0]) == 0.0 and float(ub_far[0, 0]) == 0.0


def test_obs_proxy_bounds_grid_interp():
    """The baked observation-space ranking volume (tpu.obs_rank_proxy,
    ops/trilinear.build_obs_proxy): (a) at its own grid points it
    upper-bounds the per-bone canonical proxy it was built from; (b) at
    arbitrary in-bbox points it upper-bounds the trilinear interpolation
    of the grid sampling (the pool_dilate_volume bound, applied to the
    obs grid); (c) far outside the frame bbox it is exactly 0."""
    import jax.numpy as jnp

    from occnerf_tpu.ops.trilinear import (_flat_trilinear,
                                           build_obs_proxy,
                                           pool_dilate_volume,
                                           sample_motion_proxy,
                                           sample_obs_proxy)

    rng = np.random.default_rng(11)
    B, F = 5, 32
    vols = jnp.asarray(rng.uniform(size=(B, F, F, F)).astype(np.float32))
    proxy = pool_dilate_volume(vols)            # canonical ranking proxy
    Rs = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
                     + rng.normal(0, 0.05, (B, 3, 3)).astype(np.float32))
    Ts = jnp.asarray(rng.normal(0, 0.3, (B, 3)).astype(np.float32))
    mn = jnp.asarray(np.float32([-1.2, -1.1, -1.3]))
    scale = jnp.asarray(np.float32([0.9, 1.0, 0.8]))
    obs_min = jnp.asarray(np.float32([-2.0, -1.8, -2.2]))
    obs_max = jnp.asarray(np.float32([1.9, 2.1, 1.7]))
    OF = 64
    vol, omin, ostep = build_obs_proxy(
        proxy, Rs, Ts, mn, scale, obs_min, obs_max,
        fine_size=2 * F, obs_fine=OF)

    # (a) at the obs grid points the baked volume dominates the
    # canonical proxy bound (pool+dilate >= original at every grid pt)
    idx = np.arange(OF, dtype=np.float32)
    gz, gy, gx = np.meshgrid(idx, idx, idx, indexing="ij")
    gpts = jnp.asarray(np.stack(
        [np.asarray(omin)[0] + gx * np.asarray(ostep)[0],
         np.asarray(omin)[1] + gy * np.asarray(ostep)[1],
         np.asarray(omin)[2] + gz * np.asarray(ostep)[2]],
        axis=-1).reshape(-1, 3).astype(np.float32))
    sub = gpts[:: 37]                            # keep the test fast
    ub_cnl = np.asarray(sample_motion_proxy(
        sub, Rs, Ts, proxy, mn, scale, fine_size=2 * F,
        use_pallas=False))[:, 0]
    ub_obs = np.asarray(sample_obs_proxy(
        sub, vol, omin, ostep, use_pallas=False))[:, 0]
    assert (ub_obs >= ub_cnl - 1e-5).all(), \
        f"obs proxy below canonical bound by {float((ub_cnl-ub_obs).max())}"

    # (b) arbitrary in-bbox points dominate the grid interpolation
    pts = jnp.asarray(rng.uniform(-2.4, 2.4, (3000, 3)).astype(np.float32))
    grid_vals = sample_motion_proxy(
        gpts, Rs, Ts, proxy, mn, scale, fine_size=2 * F,
        use_pallas=False).reshape(OF, OF, OF)
    f = ((pts - omin[None, :]) / ostep[None, :]).T
    interp = np.asarray(_flat_trilinear(
        grid_vals[None], f[0][None], f[1][None], f[2][None]))[0]
    ub_any = np.asarray(sample_obs_proxy(
        pts, vol, omin, ostep, use_pallas=False))[:, 0]
    assert (ub_any >= interp - 1e-5).all(), \
        f"obs proxy below grid interp by {float((interp-ub_any).max())}"

    # (c) far out of the frame bbox: exactly 0
    far = jnp.asarray(np.float32([[40.0, -40.0, 40.0]]))
    assert float(sample_obs_proxy(far, vol, omin, ostep,
                                  use_pallas=False)[0, 0]) == 0.0
