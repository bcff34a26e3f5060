"""Pallas TPU kernel for batched trilinear volume sampling (motion weights).

Replaces the gather-based inner loop of the inverse-LBS motion-field
sampler on TPU.  XLA lowers a computed-index gather to a scalar loop
(~8.7 ns/element measured on v5e — 1.3 s for the 24x786k samples of one
reference-scale train step).  The TPU has no general vectorized gather, so
this kernel reformulates the 8-corner trilinear lookup as dense MXU math:

- table layout: each bone's 32^3 volume is reshaped to (1024, 128) — one
  (z, y) x-row per sublane row, x in the first 32 lanes (rest zero);
- trilinear corner weights are TENT functions of the coordinate:
  ``w(lane) = relu(1 - |coord - lane|)`` reproduces the two-corner lerp
  weights exactly, including the grid_sample zero-padding semantics
  (corners outside [0, D-1] have no lane inside the tent support).  The
  (z, y) selection matrix is therefore a product of two tents
  ``F[q, z*32+y] = tent_z(q, z) * tent_y(q, y)`` — built with ~9 VPU
  passes over (Q, 1024) instead of four per-corner compare/select chains;
- one MXU matmul A = F @ T (Q,1024)x(1024,128) performs all row selection
  and the zy-lerp at once;
- an x-tent ``W (Q, 128)`` finishes the x-lerp as an elementwise multiply
  + lane reduction (table lanes >= 32 are zero-padded, so the tent's
  support never reads garbage).

Cost: table_size MAC per query on the MXU — ~2.5 TMAC per reference step,
orders faster than the scalar-gather path it replaces.  The backward pass
is two more matmuls (dT = F^T @ dA; coordinate grads contract tent
DERIVATIVES against the table), wired as a custom_vjp; gradients flow to
both the volume and the sample coordinates.

Queries arrive as (N, B) panels (queries in sublanes, bones in lanes);
each kernel invocation handles one (query-block, bone) pair, extracting
its bone column with a lane mask (Mosaic requires full-width or
128-divisible lane blocks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._dtypes import dt_key as _dt_key_, mxu_dot as _mxu_dot_

D = 32                 # default volume side (32^3); table rows = 1024.
                       # kernels are generalized over the side (the
                       # compaction-ranking proxy uses pooled 16^3
                       # volumes) — `side` is threaded through explicitly
ROWS = D * D           # 1024
LANES = 128
Q_BLK = 512            # queries per grid step

# default matmul input dtype (see hashgrid_pallas.COMPUTE_DTYPE);
# per-call override via trilinear_bone_weights(compute_dtype=...)
COMPUTE_DTYPE = "f32"   # module-default compute mode key (see ops/_dtypes.py)



def _interpret() -> bool:
    """Run in interpreter mode off-TPU (CPU tests / virtual meshes)."""
    return jax.default_backend() != "tpu"


def _col(ref, b, width):
    """Extract lane column ``b`` of a (Q, width) block as (Q, 1)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, ref.shape, 1)
    return jnp.sum(jnp.where(lane == b, ref[:], 0.0), axis=1,
                   keepdims=True)


def _zy_lanes(q, side=D):
    """Loop-invariant (z, y) lane coordinate planes for (Q, side^2)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (q, side * side), 1)
    return ((lane // side).astype(jnp.float32),
            (lane % side).astype(jnp.float32))


def _tent(coord, lane_f):
    """relu(1 - |coord - lane|): the exact lerp weight of each corner
    lane, zero outside [coord-1, coord+1] — which also implements the
    grid_sample zero-padding (OOB corners have no lane in support)."""
    return jax.nn.relu(1.0 - jnp.abs(coord - lane_f))


def _dtent(coord, lane_f):
    """d/dcoord of :func:`_tent` with floor-lerp (right-derivative)
    convention at integer coords: -1 on [lane, lane+1), +1 on
    [lane-1, lane)."""
    d = coord - lane_f
    return (jnp.where((d >= -1.0) & (d < 0.0), 1.0, 0.0)
            - jnp.where((d >= 0.0) & (d < 1.0), 1.0, 0.0))


def _xlane(q):
    lane = jax.lax.broadcasted_iota(jnp.int32, (q, LANES), 1)
    return lane.astype(jnp.float32)


# ---------------------------------------------------------------------------
def _fwd_kernel(dtk, side, fx_ref, fy_ref, fz_ref, tbl_ref, out_ref):
    b = pl.program_id(1)
    nb = out_ref.shape[1]
    fx = _col(fx_ref, b, nb)
    fy = _col(fy_ref, b, nb)
    fz = _col(fz_ref, b, nb)

    q = fx.shape[0]
    zl, yl = _zy_lanes(q, side)
    F = _tent(fz, zl) * _tent(fy, yl)                # (Q, 1024)
    A = _mxu_dot_(F, tbl_ref[0], dtk)
    W = _tent(fx, _xlane(q))                         # (Q, 128)
    val = jnp.sum(A * W, axis=1, keepdims=True)      # (Q, 1)

    @pl.when(b == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    lane = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
    out_ref[:] += jnp.where(lane == b, val, 0.0)


def _bwd_tbl_kernel(dtk, side, fx_ref, fy_ref, fz_ref, g_ref, dtbl_ref):
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

    q = fx.shape[0]
    zl, yl = _zy_lanes(q, side)
    F = _tent(fz, zl) * _tent(fy, yl)
    W = _tent(fx, _xlane(q))
    dA = g * W                                       # (Q, 128)
    dtbl_ref[0] += _mxu_dot_(F.T, dA, dtk)


def _bwd_f_kernel(dtk, side, fx_ref, fy_ref, fz_ref, g_ref, tbl_ref,
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

    q = fx.shape[0]
    zl, yl = _zy_lanes(q, side)
    Zt = _tent(fz, zl)
    Yt = _tent(fy, yl)
    xl = _xlane(q)
    W = _tent(fx, xl)

    def contract(S):
        return _mxu_dot_(S, tbl, dtk)

    A = contract(Zt * Yt)                            # (Q, 128)
    # dval/dfx: tent derivative over the x lanes (table lanes >= 32 are
    # zero, so their spurious dtent contributions multiply into zeros)
    dfx = g * jnp.sum(A * _dtent(fx, xl), axis=1, keepdims=True)
    # dval/dfy and dval/dfz: same contraction with one tent replaced by
    # its derivative
    dfy = g * jnp.sum(contract(Zt * _dtent(fy, yl)) * W,
                      axis=1, keepdims=True)
    dfz = g * jnp.sum(contract(_dtent(fz, zl) * Yt) * W,
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
    """vols (B,s,s,s) -> (B,s*s,128) lane-padded; f (B,N) -> (N,B)."""
    B, side = vols.shape[0], vols.shape[1]
    tbl = jnp.pad(vols.reshape(B, side * side, side),
                  ((0, 0), (0, 0), (0, LANES - side)))
    return tbl, fx.T, fy.T, fz.T


def _pad_n(a, qb):
    n = a.shape[0]
    pad = (-n) % qb
    if pad:
        # -10 -> every corner OOB -> zero weights/grads for pad rows
        a = jnp.pad(a, ((0, pad), (0, 0)), constant_values=-10.0)
    return a, n


def trilinear_bone_weights(vols: jnp.ndarray, fx: jnp.ndarray,
                           fy: jnp.ndarray, fz: jnp.ndarray,
                           compute_dtype=None) -> jnp.ndarray:
    """Sample every bone volume at per-bone fractional coords.

    Args:
        vols: (B, 32, 32, 32) weight volumes.
        fx/fy/fz: (B, N) fractional voxel coordinates (0..31 in-range;
            out-of-range samples read 0 — grid_sample zero-padding).
        compute_dtype: matmul input dtype for this call (None = the
            module default set via ops.set_compute_dtype).  bfloat16
            rounds the tent weights/table to 8 mantissa bits (~4e-3
            weight error) for ~2x MXU rate — acceptable for no-grad
            ranking/eval calls, not for the differentiable train pass.

    Returns:
        (B, N) interpolated weights.
    """
    dt = COMPUTE_DTYPE if compute_dtype is None else compute_dtype
    return _tbw(_dt_key_(dt), vols, fx, fy, fz)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _tbw(dtk, vols, fx, fy, fz):
    return _fwd(dtk, vols, fx, fy, fz)[0]


def _fwd(dtk, vols, fx, fy, fz):
    B, N = fx.shape
    side = vols.shape[1]
    rows = side * side
    tbl, fxT, fyT, fzT = _prep(vols, fx, fy, fz)
    fxT, n = _pad_n(fxT, Q_BLK)
    fyT, _ = _pad_n(fyT, Q_BLK)
    fzT, _ = _pad_n(fzT, Q_BLK)
    npad = fxT.shape[0]
    nblk = npad // Q_BLK

    qspec = pl.BlockSpec((Q_BLK, B), lambda i, b: (i, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, dtk, side),
        grid=(nblk, B),
        in_specs=[qspec, qspec, qspec,
                  pl.BlockSpec((1, rows, LANES), lambda i, b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((Q_BLK, B), lambda i, b: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, B), jnp.float32),
        interpret=_interpret(),
    )(fxT, fyT, fzT, tbl)
    w = out[:n].T                                    # (B, N)
    return w, (vols, fx, fy, fz)


def _bwd(dtk, res, g):
    vols, fx, fy, fz = res
    B, N = fx.shape
    side = vols.shape[1]
    rows = side * side
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
        functools.partial(_bwd_tbl_kernel, dtk, side),
        grid=(B, nblk),
        in_specs=[qspec_bi, qspec_bi, qspec_bi, qspec_bi],
        out_specs=pl.BlockSpec((1, rows, LANES), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, rows, LANES), jnp.float32),
        interpret=_interpret(),
    )(fxT, fyT, fzT, gT)
    dvols = dtbl[:, :, :side].reshape(B, side, side, side)

    # df: grid (nblk, B) — per-block outputs accumulated over bones
    qspec_ib = pl.BlockSpec((Q_BLK, B), lambda i, b: (i, 0),
                            memory_space=pltpu.VMEM)
    dfx, dfy, dfz = pl.pallas_call(
        functools.partial(_bwd_f_kernel, dtk, side),
        grid=(nblk, B),
        in_specs=[qspec_ib, qspec_ib, qspec_ib, qspec_ib,
                  pl.BlockSpec((1, rows, LANES), lambda i, b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(qspec_ib, qspec_ib, qspec_ib),
        out_shape=tuple(
            jax.ShapeDtypeStruct((npad, B), jnp.float32) for _ in range(3)),
        interpret=_interpret(),
    )(fxT, fyT, fzT, gT, tbl)

    return (dvols, dfx[:n].T, dfy[:n].T, dfz[:n].T)


_tbw.defvjp(_fwd, _bwd)
