"""Pallas TPU kernel for batched trilinear volume sampling (motion weights).

Replaces the gather-based inner loop of the inverse-LBS motion-field
sampler on TPU.  XLA lowers a computed-index gather to a scalar loop
(~8.7 ns/element measured on v5e — 1.3 s for the 24x786k samples of one
reference-scale train step).  The TPU has no general vectorized gather, so
this kernel reformulates the 8-corner trilinear lookup as dense MXU math:

- table layout: each bone's 32^3 volume is reshaped to (1024, 128) — one
  (z, y) x-row per sublane row, x in the first 32 lanes (rest zero);
- a "4-hot" matrix F (Q, 1024) holds the four (z,y) corner rows of each
  query weighted by the bilinear zy-weights (out-of-bounds corners get
  weight 0 — the grid_sample zero-padding semantics);
- one MXU matmul A = F @ T (Q,1024)x(1024,128) performs all row selection
  and the zy-lerp at once;
- a "2-hot" lane mask W (Q, 128) with (1-tx, tx) at lanes (x0, x1)
  finishes the x-lerp as an elementwise multiply + lane reduction.

Cost: table_size MAC per query on the MXU — ~2.5 TMAC per reference step,
orders faster than the scalar-gather path it replaces.  The backward pass
is two more matmuls (dT = F^T @ dA, corner extractions for coordinate
grads), wired as a custom_vjp; gradients flow to both the volume and the
sample coordinates.

Queries arrive as (N, B) panels (queries in sublanes, bones in lanes);
each kernel invocation handles one (query-block, bone) pair, extracting
its bone column with a lane mask (Mosaic requires full-width or
128-divisible lane blocks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 32                 # volume side (32^3); table rows = 32*32 = 1024
ROWS = D * D           # 1024
LANES = 128
Q_BLK = 512            # queries per grid step

# matmul input dtype (see hashgrid_pallas.COMPUTE_DTYPE)
COMPUTE_DTYPE = jnp.float32


def _interpret() -> bool:
    """Run in interpreter mode off-TPU (CPU tests / virtual meshes)."""
    return jax.default_backend() != "tpu"


def _col(ref, b, width):
    """Extract lane column ``b`` of a (Q, width) block as (Q, 1)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, ref.shape, 1)
    return jnp.sum(jnp.where(lane == b, ref[:], 0.0), axis=1,
                   keepdims=True)


def _corner_terms(fx, fy, fz):
    """Corner rows/weights for the four (dz, dy) corners; OOB weight 0."""
    x0f = jnp.floor(fx)
    y0f = jnp.floor(fy)
    z0f = jnp.floor(fz)
    tx = fx - x0f
    ty = fy - y0f
    tz = fz - z0f

    corners = []
    for dz in (0, 1):
        wz = tz if dz else 1.0 - tz
        zc = z0f + dz
        z_ok = (zc >= 0) & (zc <= D - 1)
        zi = jnp.clip(zc, 0, D - 1).astype(jnp.int32)
        for dy in (0, 1):
            wy = ty if dy else 1.0 - ty
            yc = y0f + dy
            y_ok = (yc >= 0) & (yc <= D - 1)
            yi = jnp.clip(yc, 0, D - 1).astype(jnp.int32)
            w = jnp.where(z_ok & y_ok, wz * wy, 0.0)
            corners.append((zi * D + yi, w))
    return corners, x0f, tx, ty, tz, y0f, z0f


def _xmask(x0f, tx):
    """(Q, 128) two-hot x-lerp mask with OOB zeroing."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (x0f.shape[0], LANES), 1)
    x0_ok = (x0f >= 0) & (x0f <= D - 1)
    x1_ok = (x0f + 1 >= 0) & (x0f + 1 <= D - 1)
    x0i = jnp.clip(x0f, 0, D - 1).astype(jnp.int32)
    x1i = jnp.clip(x0f + 1, 0, D - 1).astype(jnp.int32)
    w0 = jnp.where(x0_ok, 1.0 - tx, 0.0)
    w1 = jnp.where(x1_ok, tx, 0.0)
    return ((lane == x0i) * w0 + (lane == x1i) * w1).astype(jnp.float32)


def _fourhot(corners):
    """(Q, 1024) zy 4-hot row-selection matrix."""
    q = corners[0][0].shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (q, ROWS), 1)
    F = jnp.zeros((q, ROWS), jnp.float32)
    for r_idx, w in corners:
        F = F + (row == r_idx) * w
    return F


# ---------------------------------------------------------------------------
def _fwd_kernel(fx_ref, fy_ref, fz_ref, tbl_ref, out_ref):
    b = pl.program_id(1)
    nb = out_ref.shape[1]
    fx = _col(fx_ref, b, nb)
    fy = _col(fy_ref, b, nb)
    fz = _col(fz_ref, b, nb)

    corners, x0f, tx, *_ = _corner_terms(fx, fy, fz)
    F = _fourhot(corners)                            # (Q, 1024)
    A = jnp.dot(F.astype(COMPUTE_DTYPE),
                tbl_ref[0].astype(COMPUTE_DTYPE),
                preferred_element_type=jnp.float32)
    W = _xmask(x0f, tx)                              # (Q, 128)
    val = jnp.sum(A * W, axis=1, keepdims=True)      # (Q, 1)

    @pl.when(b == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    lane = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
    out_ref[:] += jnp.where(lane == b, val, 0.0)


def _bwd_tbl_kernel(fx_ref, fy_ref, fz_ref, g_ref, dtbl_ref):
    """dT accumulation: grid (B, nblk), nblk inner; dT revisited across
    the consecutive query blocks of each bone."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb = fx_ref.shape[1]
    fx = _col(fx_ref, b, nb)
    fy = _col(fy_ref, b, nb)
    fz = _col(fz_ref, b, nb)
    g = _col(g_ref, b, nb)

    @pl.when(i == 0)
    def _():
        dtbl_ref[0] = jnp.zeros_like(dtbl_ref[0])

    corners, x0f, tx, *_ = _corner_terms(fx, fy, fz)
    F = _fourhot(corners)
    W = _xmask(x0f, tx)
    dA = g * W                                       # (Q, 128)
    dtbl_ref[0] += jnp.dot(F.T.astype(COMPUTE_DTYPE),
                           dA.astype(COMPUTE_DTYPE),
                           preferred_element_type=jnp.float32)


def _bwd_f_kernel(fx_ref, fy_ref, fz_ref, g_ref, tbl_ref,
                  dfx_ref, dfy_ref, dfz_ref):
    """Coordinate gradients; grid (nblk, B), bones inner, df blocks
    accumulated across bones into their lane columns."""
    b = pl.program_id(1)
    nb = fx_ref.shape[1]
    fx = _col(fx_ref, b, nb)
    fy = _col(fy_ref, b, nb)
    fz = _col(fz_ref, b, nb)
    g = _col(g_ref, b, nb)
    tbl = tbl_ref[0]                                 # (1024, 128)

    corners, x0f, tx, ty, tz, y0f, z0f = _corner_terms(fx, fy, fz)
    F = _fourhot(corners)
    A = jnp.dot(F.astype(COMPUTE_DTYPE), tbl.astype(COMPUTE_DTYPE),
                preferred_element_type=jnp.float32)          # (Q,128)
    W = _xmask(x0f, tx)

    # dtx: d/dtx of the two-hot = (at x1) - (at x0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (fx.shape[0], LANES), 1)
    x0_ok = (x0f >= 0) & (x0f <= D - 1)
    x1_ok = (x0f + 1 >= 0) & (x0f + 1 <= D - 1)
    x0i = jnp.clip(x0f, 0, D - 1).astype(jnp.int32)
    x1i = jnp.clip(x0f + 1, 0, D - 1).astype(jnp.int32)
    dW_dtx = ((lane == x1i) * jnp.where(x1_ok, 1.0, 0.0)
              - (lane == x0i) * jnp.where(x0_ok, 1.0, 0.0))
    dfx = g * jnp.sum(A * dW_dtx, axis=1, keepdims=True)

    # coordinate grads via DIFFERENCE selectors — one matmul each instead
    # of four per-corner extractions:
    #   dval/dty = (1-tz)(v01 - v00) + tz(v11 - v10)
    #   dval/dtz = (1-ty)(v10 - v00) + ty(v11 - v01)
    # with v_c = (onehot(r_c) @ T * W).sum(lanes) and per-corner OOB masks
    # folded into the selector weights.
    row = jax.lax.broadcasted_iota(jnp.int32, (fx.shape[0], ROWS), 1)

    def ok(c):
        return ((c >= 0) & (c <= D - 1)).astype(jnp.float32)
    m_z0, m_z1 = ok(z0f), ok(z0f + 1)
    m_y0, m_y1 = ok(y0f), ok(y0f + 1)
    (r00, _), (r01, _), (r10, _), (r11, _) = corners

    def sel(r_idx):
        return (row == r_idx).astype(jnp.float32)

    S_y = ((sel(r01) * (m_z0 * m_y1) - sel(r00) * (m_z0 * m_y0))
           * (1.0 - tz)
           + (sel(r11) * (m_z1 * m_y1) - sel(r10) * (m_z1 * m_y0)) * tz)
    S_z = ((sel(r10) * (m_z1 * m_y0) - sel(r00) * (m_z0 * m_y0))
           * (1.0 - ty)
           + (sel(r11) * (m_z1 * m_y1) - sel(r01) * (m_z0 * m_y1)) * ty)
    tbl_c = tbl.astype(COMPUTE_DTYPE)
    dfy = g * jnp.sum(
        jnp.dot(S_y.astype(COMPUTE_DTYPE), tbl_c,
                preferred_element_type=jnp.float32) * W,
        axis=1, keepdims=True)
    dfz = g * jnp.sum(
        jnp.dot(S_z.astype(COMPUTE_DTYPE), tbl_c,
                preferred_element_type=jnp.float32) * W,
        axis=1, keepdims=True)

    @pl.when(b == 0)
    def _():
        dfx_ref[:] = jnp.zeros_like(dfx_ref)
        dfy_ref[:] = jnp.zeros_like(dfy_ref)
        dfz_ref[:] = jnp.zeros_like(dfz_ref)

    out_lane = jax.lax.broadcasted_iota(jnp.int32, dfx_ref.shape, 1)
    dfx_ref[:] += jnp.where(out_lane == b, dfx, 0.0)
    dfy_ref[:] += jnp.where(out_lane == b, dfy, 0.0)
    dfz_ref[:] += jnp.where(out_lane == b, dfz, 0.0)


# ---------------------------------------------------------------------------
def _prep(vols, fx, fy, fz):
    """vols (B,32,32,32) -> (B,1024,128) lane-padded; f (B,N) -> (N,B)."""
    B = vols.shape[0]
    tbl = jnp.pad(vols.reshape(B, ROWS, D),
                  ((0, 0), (0, 0), (0, LANES - D)))
    return tbl, fx.T, fy.T, fz.T


def _pad_n(a, qb):
    n = a.shape[0]
    pad = (-n) % qb
    if pad:
        # -10 -> every corner OOB -> zero weights/grads for pad rows
        a = jnp.pad(a, ((0, pad), (0, 0)), constant_values=-10.0)
    return a, n


@jax.custom_vjp
def trilinear_bone_weights(vols: jnp.ndarray, fx: jnp.ndarray,
                           fy: jnp.ndarray, fz: jnp.ndarray) -> jnp.ndarray:
    """Sample every bone volume at per-bone fractional coords.

    Args:
        vols: (B, 32, 32, 32) weight volumes.
        fx/fy/fz: (B, N) fractional voxel coordinates (0..31 in-range;
            out-of-range samples read 0 — grid_sample zero-padding).

    Returns:
        (B, N) interpolated weights.
    """
    return _fwd(vols, fx, fy, fz)[0]


def _fwd(vols, fx, fy, fz):
    B, N = fx.shape
    tbl, fxT, fyT, fzT = _prep(vols, fx, fy, fz)
    fxT, n = _pad_n(fxT, Q_BLK)
    fyT, _ = _pad_n(fyT, Q_BLK)
    fzT, _ = _pad_n(fzT, Q_BLK)
    npad = fxT.shape[0]
    nblk = npad // Q_BLK

    qspec = pl.BlockSpec((Q_BLK, B), lambda i, b: (i, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(nblk, B),
        in_specs=[qspec, qspec, qspec,
                  pl.BlockSpec((1, ROWS, LANES), lambda i, b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((Q_BLK, B), lambda i, b: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, B), jnp.float32),
        interpret=_interpret(),
    )(fxT, fyT, fzT, tbl)
    w = out[:n].T                                    # (B, N)
    return w, (vols, fx, fy, fz)


def _bwd(res, g):
    vols, fx, fy, fz = res
    B, N = fx.shape
    tbl, fxT, fyT, fzT = _prep(vols, fx, fy, fz)
    fxT, n = _pad_n(fxT, Q_BLK)
    fyT, _ = _pad_n(fyT, Q_BLK)
    fzT, _ = _pad_n(fzT, Q_BLK)
    gT, _ = _pad_n(g.T, Q_BLK)
    npad = fxT.shape[0]
    nblk = npad // Q_BLK

    # dT: grid (B, nblk) — per-bone accumulator revisited over query blocks
    qspec_bi = pl.BlockSpec((Q_BLK, B), lambda b, i: (i, 0),
                            memory_space=pltpu.VMEM)
    dtbl = pl.pallas_call(
        _bwd_tbl_kernel,
        grid=(B, nblk),
        in_specs=[qspec_bi, qspec_bi, qspec_bi, qspec_bi],
        out_specs=pl.BlockSpec((1, ROWS, LANES), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, ROWS, LANES), jnp.float32),
        interpret=_interpret(),
    )(fxT, fyT, fzT, gT)
    dvols = dtbl[:, :, :D].reshape(B, D, D, D)

    # df: grid (nblk, B) — per-block outputs accumulated over bones
    qspec_ib = pl.BlockSpec((Q_BLK, B), lambda i, b: (i, 0),
                            memory_space=pltpu.VMEM)
    dfx, dfy, dfz = pl.pallas_call(
        _bwd_f_kernel,
        grid=(nblk, B),
        in_specs=[qspec_ib, qspec_ib, qspec_ib, qspec_ib,
                  pl.BlockSpec((1, ROWS, LANES), lambda i, b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(qspec_ib, qspec_ib, qspec_ib),
        out_shape=tuple(
            jax.ShapeDtypeStruct((npad, B), jnp.float32) for _ in range(3)),
        interpret=_interpret(),
    )(fxT, fyT, fzT, gT, tbl)

    return (dvols, dfx[:n].T, dfy[:n].T, dfz[:n].T)


trilinear_bone_weights.defvjp(_fwd, _bwd)
