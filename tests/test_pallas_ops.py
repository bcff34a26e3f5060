"""Pallas kernel oracle tests (interpret mode on CPU).

Each TPU kernel is checked against the XLA reference implementation it
replaces — values and gradients (SURVEY.md §4(b)).
"""

import numpy as np
import jax
import jax.numpy as jnp


def test_motion_pallas_matches_xla_fwd_and_grads():
    from occnerf_tpu.ops.motion_pallas import trilinear_bone_weights
    from occnerf_tpu.ops.trilinear import _flat_trilinear

    B, D, N = 3, 32, 640
    rng = np.random.default_rng(0)
    vols = jnp.asarray(rng.uniform(size=(B, D, D, D)).astype(np.float32))
    fx = jnp.asarray(rng.uniform(-2, 33, (B, N)).astype(np.float32))
    fy = jnp.asarray(rng.uniform(-2, 33, (B, N)).astype(np.float32))
    fz = jnp.asarray(rng.uniform(-2, 33, (B, N)).astype(np.float32))

    w = trilinear_bone_weights(vols, fx, fy, fz)
    w_ref = _flat_trilinear(vols, fx, fy, fz)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref),
                               atol=1e-5)

    def loss(vols, fx, fy, fz):
        return jnp.sum(trilinear_bone_weights(vols, fx, fy, fz) ** 2)

    def loss_ref(vols, fx, fy, fz):
        return jnp.sum(_flat_trilinear(vols, fx, fy, fz) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2, 3))(vols, fx, fy, fz)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(vols, fx, fy, fz)
    for a, b, name in zip(g, g_ref, ("dvols", "dfx", "dfy", "dfz")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, err_msg=name)


def test_hashgrid_pallas_matches_xla():
    from occnerf_tpu.ops.hashgrid import HashGridSpec, hash_grid_encode
    from occnerf_tpu.ops.hashgrid_pallas import (hash_grid_encode_tpu,
                                                 supports)

    spec = HashGridSpec.create(input_dim=4, num_levels=4, level_dim=2,
                               base_resolution=16, log2_hashmap_size=13,
                               desired_resolution=512)
    assert supports(spec)
    key = jax.random.PRNGKey(0)
    table = spec.init_table(key)
    x = jax.random.uniform(key, (640, 4), minval=-0.05, maxval=1.05)

    out = hash_grid_encode_tpu(x, table, spec)
    ref = hash_grid_encode(x, table, spec)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    g = jax.grad(lambda t: jnp.sum(hash_grid_encode_tpu(x, t, spec) ** 2)
                 )(table)
    g_ref = jax.grad(lambda t: jnp.sum(hash_grid_encode(x, t, spec) ** 2)
                     )(table)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-4)


def test_hashgrid_pallas_supports_gate():
    from occnerf_tpu.ops.hashgrid import HashGridSpec
    from occnerf_tpu.ops.hashgrid_pallas import supports

    big = HashGridSpec.create(input_dim=4, num_levels=16, level_dim=2,
                              base_resolution=16, log2_hashmap_size=19,
                              desired_resolution=4096)
    assert not supports(big)  # 2^19 tables: one-hot matmuls not viable
    # 3-D specs have dense (non-hashed) coarse levels -> XLA path
    d3 = HashGridSpec.create(input_dim=3, num_levels=16, level_dim=2,
                             base_resolution=16, log2_hashmap_size=14,
                             desired_resolution=2048)
    assert not supports(d3)
    # extended gridencoder modes the kernel does NOT implement must be
    # rejected — 'auto' would otherwise silently compute linear,
    # +0.5-offset features for them
    smooth = HashGridSpec.create(input_dim=4, num_levels=4, level_dim=2,
                                 base_resolution=16, log2_hashmap_size=13,
                                 desired_resolution=512,
                                 interpolation="smoothstep")
    assert not supports(smooth)
    ac = HashGridSpec.create(input_dim=4, num_levels=4, level_dim=2,
                             base_resolution=16, log2_hashmap_size=13,
                             desired_resolution=512, align_corners=True)
    assert not supports(ac)


def test_motion_pallas_integer_coord_grads():
    """At exact integer coordinates the lerp derivative is one-sided
    (d/dt of the floor-based lerp at t=0 is v[i+1] - v[i]); the tent
    formulation must reproduce the oracle's convention."""
    from occnerf_tpu.ops.motion_pallas import trilinear_bone_weights
    from occnerf_tpu.ops.trilinear import _flat_trilinear

    B, D = 2, 32
    rng = np.random.default_rng(3)
    vols = jnp.asarray(rng.uniform(size=(B, D, D, D)).astype(np.float32))
    # exact integers (including boundaries) and near-integers
    vals = np.array([0.0, 1.0, 5.0, 30.0, 31.0, 4.9999, 5.0001, -1.0,
                     32.0, 7.5], np.float32)
    fx = jnp.asarray(np.tile(vals, (B, 1)))
    fy = jnp.asarray(np.tile(np.roll(vals, 3), (B, 1)))
    fz = jnp.asarray(np.tile(np.roll(vals, 6), (B, 1)))

    def loss(f, which):
        args = [fx, fy, fz]
        args[which] = f
        return jnp.sum(trilinear_bone_weights(vols, *args) ** 2)

    def loss_ref(f, which):
        args = [fx, fy, fz]
        args[which] = f
        return jnp.sum(_flat_trilinear(vols, *args) ** 2)

    for which, f in ((0, fx), (1, fy), (2, fz)):
        g = jax.grad(loss)(f, which)
        g_ref = jax.grad(loss_ref)(f, which)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   atol=1e-4, err_msg=f"coord {which}")


def test_motion_pallas_bf16_compute_dtype_close():
    """Per-call bfloat16 matmul inputs (the no-grad ranking/eval dtype,
    cfg.tpu.{rank,eval}_compute_dtype) stay within bf16 rounding of the
    exact f32 kernel."""
    from occnerf_tpu.ops.motion_pallas import trilinear_bone_weights
    from occnerf_tpu.ops.trilinear import _flat_trilinear

    B, D, N = 3, 32, 640
    rng = np.random.default_rng(1)
    vols = jnp.asarray(rng.uniform(size=(B, D, D, D)).astype(np.float32))
    fx = jnp.asarray(rng.uniform(-2, 33, (B, N)).astype(np.float32))
    fy = jnp.asarray(rng.uniform(-2, 33, (B, N)).astype(np.float32))
    fz = jnp.asarray(rng.uniform(-2, 33, (B, N)).astype(np.float32))

    w = trilinear_bone_weights(vols, fx, fy, fz,
                               compute_dtype=jnp.bfloat16)
    w_ref = _flat_trilinear(vols, fx, fy, fz)
    # tent weights and table entries round to 8 mantissa bits; the
    # 1024-term contraction accumulates in f32 (few nonzero terms)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref),
                               atol=3e-2)
    assert w.dtype == jnp.float32
    # default call stays exact (unchanged by the bf16 plumbing)
    w32 = trilinear_bone_weights(vols, fx, fy, fz)
    np.testing.assert_allclose(np.asarray(w32), np.asarray(w_ref),
                               atol=1e-5)


def test_hashgrid_pallas_bf16_compute_dtype_close():
    """Per-call bfloat16 on the hash-encode one-hot matmuls (~0.4%
    feature rounding, the eval/render dtype)."""
    from occnerf_tpu.ops.hashgrid import HashGridSpec, hash_grid_encode
    from occnerf_tpu.ops.hashgrid_pallas import hash_grid_encode_tpu

    spec = HashGridSpec.create(input_dim=4, num_levels=4, level_dim=2,
                               base_resolution=16, log2_hashmap_size=13,
                               desired_resolution=512)
    key = jax.random.PRNGKey(3)
    table = spec.init_table(key)
    x = jax.random.uniform(key, (640, 4), minval=-0.05, maxval=1.05)

    out = hash_grid_encode_tpu(x, table, spec,
                               compute_dtype=jnp.bfloat16)
    ref = hash_grid_encode(x, table, spec)
    # init table entries are U(-1e-4, 1e-4): absolute rounding ~1e-6
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6)
    out32 = hash_grid_encode_tpu(x, table, spec)
    np.testing.assert_allclose(np.asarray(out32), np.asarray(ref),
                               atol=1e-5)


def test_xla_matmul_precision_knob():
    """cfg.tpu.xla_matmul_precision names resolve onto
    jax_default_matmul_precision; unknown names raise; the default cfg
    carries the knob."""
    import pytest
    from occnerf_tpu.config.defaults import get_default_cfg
    from occnerf_tpu.ops import set_xla_matmul_precision

    assert get_default_cfg().tpu.xla_matmul_precision == "default"
    before = jax.config.jax_default_matmul_precision
    try:
        for name, want in (("tensorfloat32", "tensorfloat32"),
                           ("tf32", "tensorfloat32"),
                           ("float32", "float32"),
                           ("highest", "float32"),
                           ("default", "default")):
            set_xla_matmul_precision(name)
            assert jax.config.jax_default_matmul_precision == want
        with pytest.raises(ValueError):
            set_xla_matmul_precision("fp8")
    finally:
        jax.config.update("jax_default_matmul_precision", before)


def test_kernel_dots_immune_to_global_matmul_precision():
    """A global tpu.xla_matmul_precision=tensorfloat32 session must not
    leak Precision.HIGH into the Pallas kernels' dots (Mosaic's dot
    lowering rejects HIGH; the kernels pin DEFAULT/HIGHEST per dot).
    Regression: the r4 lever sweep's xla_tf32 arm crashed in
    _dot_general_lowering_rule before this pin."""
    from jax.lax import Precision
    from occnerf_tpu.ops._dtypes import mxu_dot, mxu_dot_onehot

    def dot_precisions(fn, *args):
        precs = []
        for eqn in jax.make_jaxpr(fn)(*args).jaxpr.eqns:
            if eqn.primitive.name == "dot_general":
                precs.append(eqn.params["precision"])
        assert precs, "expected at least one dot_general"
        return precs

    a = jnp.ones((8, 16), jnp.float32)
    b = jnp.ones((16, 4), jnp.float32)
    oh = jnp.eye(8, 16, dtype=jnp.float32)
    before = jax.config.jax_default_matmul_precision
    try:
        jax.config.update("jax_default_matmul_precision", "tensorfloat32")
        for key in ("f32", "f32h", "bf16"):
            for precs in (dot_precisions(lambda x, y: mxu_dot(x, y, key),
                                         a, b),
                          dot_precisions(
                              lambda x, y: mxu_dot_onehot(x, y, key),
                              oh, b)):
                for p in precs:
                    assert p != (Precision.HIGH, Precision.HIGH), key
                    assert p is None or p in (
                        (Precision.DEFAULT, Precision.DEFAULT),
                        (Precision.HIGHEST, Precision.HIGHEST)), (key, p)
    finally:
        jax.config.update("jax_default_matmul_precision", before)


def test_compute_mode_key_plumbing():
    """Config-string compute modes ('tfloat32', 'bfloat16', ...) resolve
    through dt_key/matmul_precision and reach every kernel entrypoint
    (per-call arg AND the set_compute_dtype module default) without
    error; interpret mode computes exact f32 regardless, so values must
    match the exact path."""
    import jax.lax as lax
    from occnerf_tpu import ops as _ops
    from occnerf_tpu.ops._dtypes import dt_key, matmul_precision
    from occnerf_tpu.ops.motion_pallas import trilinear_bone_weights
    from occnerf_tpu.ops.trilinear import _flat_trilinear
    from occnerf_tpu.ops.vertagg import knn_weighted_agg

    assert dt_key("tfloat32") == dt_key("tf32") == "f32h"
    assert dt_key("float32") == dt_key(jnp.float32) == "f32"
    assert dt_key("bfloat16") == dt_key(jnp.bfloat16) == "bf16"
    assert matmul_precision("f32") == lax.Precision.HIGHEST
    assert matmul_precision("f32h") == lax.Precision.HIGH
    assert matmul_precision(jnp.bfloat16) == lax.Precision.DEFAULT

    rng = np.random.default_rng(2)
    B, D, N = 2, 32, 256
    vols = jnp.asarray(rng.uniform(size=(B, D, D, D)).astype(np.float32))
    f = [jnp.asarray(rng.uniform(0, 31, (B, N)).astype(np.float32))
         for _ in range(3)]
    ref = np.asarray(_flat_trilinear(vols, *f))
    for mode in ("tfloat32", "tf32", "float32"):
        w = trilinear_bone_weights(vols, *f, compute_dtype=mode)
        np.testing.assert_allclose(np.asarray(w), ref, atol=1e-5)

    tbl = jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 64, (96, 4)).astype(np.int32))
    atts = jnp.asarray(rng.uniform(size=(96, 4)).astype(np.float32))
    want = np.asarray(jnp.einsum("nk,nkc->nc", atts, tbl[idx]))
    try:
        _ops.set_compute_dtype("tfloat32")
        from occnerf_tpu.ops import vertagg as _va
        assert _va.COMPUTE_DTYPE == "f32h"
        out = knn_weighted_agg(tbl, idx, atts)   # module default path
        np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)
    finally:
        _ops.set_compute_dtype("float32")


def test_motion_pallas_generalized_side_16():
    """The side-generalized kernel (compaction-ranking proxy volumes are
    16^3) matches the XLA trilinear oracle at side 16, fwd and grads."""
    from occnerf_tpu.ops.motion_pallas import trilinear_bone_weights
    from occnerf_tpu.ops.trilinear import _flat_trilinear

    B, S, N = 3, 16, 640
    rng = np.random.default_rng(5)
    vols = jnp.asarray(rng.uniform(size=(B, S, S, S)).astype(np.float32))
    fx = jnp.asarray(rng.uniform(-2, 17, (B, N)).astype(np.float32))
    fy = jnp.asarray(rng.uniform(-2, 17, (B, N)).astype(np.float32))
    fz = jnp.asarray(rng.uniform(-2, 17, (B, N)).astype(np.float32))

    w = trilinear_bone_weights(vols, fx, fy, fz)
    w_ref = _flat_trilinear(vols, fx, fy, fz)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), atol=1e-5)

    g = jax.grad(lambda v: jnp.sum(
        trilinear_bone_weights(v, fx, fy, fz) ** 2))(vols)
    g_ref = jax.grad(lambda v: jnp.sum(
        _flat_trilinear(v, fx, fy, fz) ** 2))(vols)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-4)


def test_motion_proxy_pallas_matches_xla():
    """sample_motion_proxy through the (interpret-mode) Pallas kernel
    equals its XLA fallback."""
    from occnerf_tpu.ops.trilinear import (pool_dilate_volume,
                                           sample_motion_proxy)

    rng = np.random.default_rng(6)
    B = 4
    vols = jnp.asarray(rng.uniform(size=(B, 32, 32, 32)).astype(np.float32))
    proxy = pool_dilate_volume(vols)
    Rs = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (B, 1, 1)))
    Ts = jnp.asarray(rng.normal(0, 0.3, (B, 3)).astype(np.float32))
    mn = jnp.asarray(np.float32([-1.0, -1.0, -1.0]))
    scale = jnp.asarray(np.float32([1.0, 1.0, 1.0]))
    pts = jnp.asarray(rng.uniform(-3, 3, (700, 3)).astype(np.float32))

    a = sample_motion_proxy(pts, Rs, Ts, proxy, mn, scale, use_pallas=True)
    b = sample_motion_proxy(pts, Rs, Ts, proxy, mn, scale, use_pallas=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_canonical_enc_dtype_reaches_pallas_kernel():
    """The eval-path enc_dtype kwarg threads through
    OccNeRFCanonicalMLP.apply -> _encode_no_input_grad -> the Pallas
    kernel (forced backend, interpret mode on CPU) and stays within
    bf16 rounding of the XLA backend."""
    from occnerf_tpu import ops as ops_pkg
    from occnerf_tpu.models.canonical import OccNeRFCanonicalMLP

    # base_resolution 16 so every level hashes (dense coarse levels make
    # supports() reject the spec)
    mlp = OccNeRFCanonicalMLP(mlp_depth=2, mlp_width=32, bound=1.0,
                              num_levels=4, level_dim=2,
                              base_resolution=16, log2_hashmap_size=10)
    params = mlp.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(9)
    N, k = 96, 3
    xyz = jnp.asarray(rng.normal(0, 0.3, (N, 3)).astype(np.float32))
    knn_points = jnp.asarray(rng.normal(0, 0.3, (N, k, 3))
                             .astype(np.float32))
    point_norms = jnp.asarray(rng.normal(size=(N, k, 3)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 40, (N, 4, k)).astype(np.int32))
    # lane 0 = visibility counter, then enc_dim (= 4 levels x 2), then
    # the 3 learnable point coords
    vert_feat = jnp.asarray(
        rng.normal(0, 0.1, (40, 1 + mlp.enc_dim + 3)).astype(np.float32))

    def run(backend, dt):
        ops_pkg.set_hashgrid_backend(backend)
        try:
            return np.asarray(mlp.apply(
                params, xyz=xyz, knn_points=knn_points,
                point_norms=point_norms, knn_idxs=idx,
                vert_feat=vert_feat, enc_dtype=dt))
        finally:
            ops_pkg.set_hashgrid_backend("auto")

    ref = run("xla", None)
    pal32 = run("pallas", None)
    palbf = run("pallas", jnp.bfloat16)
    np.testing.assert_allclose(pal32, ref, atol=1e-5)
    np.testing.assert_allclose(palbf, ref, atol=3e-2)
    # bf16 must actually differ from exact f32 (the dtype reached the
    # kernel rather than being dropped on the floor)
    assert np.abs(palbf - pal32).max() > 0


def test_vertagg_kernel_matches_gather_einsum():
    """knn_weighted_agg == gather+einsum (values and table grads), with
    non-divisible N (pad path) and padded V rows."""
    from occnerf_tpu.ops.vertagg import knn_weighted_agg, supports

    V, C, K, N = 333, 36, 40, 700   # V, N both force padding
    rng = np.random.default_rng(3)
    table = jnp.asarray(rng.normal(size=(V, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, V, (N, K)).astype(np.int32))
    atts = jnp.asarray(rng.uniform(size=(N, K)).astype(np.float32))
    assert supports(V, C, K)

    def ref(table):
        return jnp.einsum("nk,nkc->nc", atts, table[idx])

    out = knn_weighted_agg(table, idx, atts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref(table)),
                               rtol=2e-5, atol=2e-5)

    cot = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))
    g = jax.grad(lambda t: jnp.sum(knn_weighted_agg(t, idx, atts) * cot))(
        table)
    g_ref = jax.grad(lambda t: jnp.sum(ref(t) * cot))(table)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=2e-5, atol=2e-5)


def test_vertagg_reference_scale_with_groups():
    """The V-block-tiled backward at the real 6,890-vert concat-cloud
    geometry (9,149 rows, 4 scale groups with disjoint row/lane ranges)
    matches the AD scatter oracle; supports() covers it."""
    import pytest
    from occnerf_tpu.ops.vertagg import knn_weighted_agg, supports

    sizes = (6890, 1722, 430, 107)   # base + FPS pyramid at ratio 1/4
    k, C = 10, 36
    V = sum(sizes)
    N = 1000                          # forces Q padding too
    assert supports(V, C, 4 * k)

    rng = np.random.default_rng(11)
    table = jnp.asarray(rng.normal(size=(V, C)).astype(np.float32))
    groups, idx_cols, off = [], [], 0
    for s, v in enumerate(sizes):
        groups.append((off, off + v, s * k, (s + 1) * k))
        idx_cols.append(rng.integers(off, off + v, (N, k)))
        off += v
    groups = tuple(groups)
    idx = jnp.asarray(np.concatenate(idx_cols, axis=1).astype(np.int32))
    atts = jnp.asarray(rng.uniform(size=(N, 4 * k)).astype(np.float32))

    def ref(table):
        return jnp.einsum("nk,nkc->nc", atts, table[idx])

    out = knn_weighted_agg(table, idx, atts, groups=groups)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref(table)),
                               rtol=2e-5, atol=2e-5)

    cot = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))
    g = jax.grad(lambda t: jnp.sum(
        knn_weighted_agg(t, idx, atts, groups=groups) * cot))(table)
    g_ref = jax.grad(lambda t: jnp.sum(ref(t) * cot))(table)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=2e-5, atol=2e-5)

    # malformed groups (gap in rows / lanes, wrong coverage) must raise
    with pytest.raises(ValueError):
        knn_weighted_agg(table, idx, atts, groups=((0, V - 1, 0, 4 * k),))
    with pytest.raises(ValueError):
        knn_weighted_agg(table, idx, atts,
                         groups=((0, 6890, 0, 10), (6891, V, 10, 4 * k)))


def test_vertagg_backend_equivalence_through_canonical_mlp():
    """Forcing the vertagg kernel through the full OccNeRF canonical MLP
    matches the XLA gather+einsum path — outputs and encoder/table grads."""
    from occnerf_tpu import ops as _ops
    from occnerf_tpu.models.canonical import OccNeRFCanonicalMLP

    mlp = OccNeRFCanonicalMLP(mlp_depth=2, mlp_width=32,
                              log2_hashmap_size=8)
    params = mlp.init(jax.random.PRNGKey(0))

    N, k, V = 96, 10, 50
    rng = np.random.default_rng(7)
    xyz = jnp.asarray(rng.uniform(-0.5, 0.5, (N, 3)).astype(np.float32))
    knn_points = jnp.asarray(
        rng.uniform(-0.5, 0.5, (N, k, 3)).astype(np.float32))
    point_norms = jnp.asarray(rng.normal(size=(N, k, 3)).astype(np.float32))
    knn_idxs = jnp.asarray(rng.integers(0, V, (N, 4, k)).astype(np.int32))
    kwargs = dict(
        knn_att_per_vertex=jnp.asarray(
            rng.uniform(size=(V,)).astype(np.float32)),
        surface_points=jnp.asarray(
            rng.uniform(-0.5, 0.5, (V, 3)).astype(np.float32)),
        point_sdf=jnp.asarray(rng.uniform(size=(V, 1)).astype(np.float32)),
        learnable_points=jnp.asarray(
            rng.uniform(-0.5, 0.5, (V, 3)).astype(np.float32)))

    def run(params):
        return mlp.apply(params, xyz, knn_points, point_norms, knn_idxs,
                         **kwargs)

    old = _ops.VERTAGG_BACKEND
    try:
        _ops.set_vertagg_backend("pallas")
        out_k = run(params)
        g_k = jax.grad(lambda p: jnp.sum(run(p) ** 2))(params)
        _ops.set_vertagg_backend("xla")
        out_x = run(params)
        g_x = jax.grad(lambda p: jnp.sum(run(p) ** 2))(params)
    finally:
        _ops.VERTAGG_BACKEND = old

    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               rtol=1e-4, atol=1e-4)
    flat_k, tree_k = jax.tree_util.tree_flatten(g_k)
    flat_x, tree_x = jax.tree_util.tree_flatten(g_x)
    assert tree_k == tree_x
    for a, b in zip(flat_k, flat_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
