"""Pallas TPU kernel for the KNN vertex-feature weighted aggregation.

The OccNeRF canonical MLP gathers a 36-lane per-vertex feature row for
each of the 4x10 multiscale neighbours of every sample and reduces them
with detached visibility-attention weights (reference
`canonical_mlps/occnerf_mlp.py:171-178`):

    agg[n, c] = sum_k atts[n, k] * table[idx[n, k], c]

On TPU the straightforward gather+einsum pays twice: the (N*K, C)
neighbour gather materializes ~1M rows per ray chunk, and its VJP is an
XLA scatter-add into the small (V, C) table that costs ~5 ms per chunk
(~80 ms of a reference-scale train step — the single largest non-kernel
op in the profile).

Because the attention weights are stop-gradient'd, the cotangent of the
gathered block is RANK-ONE in (k, c): d gathered[n,k,c] = atts[n,k] *
d agg[n,c].  Both directions therefore collapse onto one attention-
weighted one-hot matrix

    W[n, v] = sum_k atts[n, k] * [idx[n, k] == v]          (Q, Vp)

built with K VPU passes per query block, giving

    agg = W @ table            (MXU, forward)
    dT  = W^T @ d agg          (MXU, backward — no scatter at all)

Cost per query block: K * Q * Vp VPU ops to build W plus Q * Vp * C MXU
MACs — for V <= MAX_V (padded) this is ~5x cheaper than the gather/
scatter pair it replaces.  The W build scales with V, so large clouds
(real-SMPL 6890-vertex subjects concat to ~9k rows) stay on the XLA
path via :func:`supports`.

Numerics: the forward accumulates the K attention contributions into W
in float32 BEFORE the table multiply, so it matches the XLA
gather+einsum to reassociation (~1e-6); the backward dT is exactly the
transposed forward.  Gradients flow to the table only — callers
stop-gradient ``atts`` (the reference detaches the softmax) and ``idx``
is integral.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._dtypes import DTYPES as _DTYPES_, dt_key as _dt_key_

LANES = 128
Q_BLK = 512
MAX_V = 2048      # padded table rows; W is (Q_BLK, Vp) f32 in VMEM (4 MB
                  # at the cap) and the K-pass build cost scales with Vp

# default matmul input dtype (see hashgrid_pallas.COMPUTE_DTYPE)
COMPUTE_DTYPE = jnp.float32


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def supports(n_rows: int, n_feat: int, k: int) -> bool:
    """Kernel viable: table fits the one-hot build budget and blocks tile."""
    vp = -(-n_rows // LANES) * LANES
    return vp <= MAX_V and n_feat <= LANES and k <= LANES


def _col_f(ref, k, width):
    lane = jax.lax.broadcasted_iota(jnp.int32, ref.shape, 1)
    return jnp.sum(jnp.where(lane == k, ref[:], 0.0), axis=1, keepdims=True)


def _col_i(ref, k, width):
    lane = jax.lax.broadcasted_iota(jnp.int32, ref.shape, 1)
    return jnp.sum(jnp.where(lane == k, ref[:], 0), axis=1, keepdims=True)


def _build_w(idx_ref, att_ref, vp, K):
    """W[q, v] = sum_k att[q, k] * [idx[q, k] == v]  (f32, (Q, Vp))."""
    q = idx_ref.shape[0]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (q, vp), 1)

    def body(k, W):
        iv = _col_i(idx_ref, k, K)                     # (Q, 1) int32
        av = _col_f(att_ref, k, K)                     # (Q, 1) f32
        return W + av * (row_iota == iv).astype(jnp.float32)

    return jax.lax.fori_loop(0, K, body, jnp.zeros((q, vp), jnp.float32))


def _fwd_kernel(cdt, vp, K, idx_ref, att_ref, tbl_ref, out_ref):
    W = _build_w(idx_ref, att_ref, vp, K)
    out_ref[:] = jnp.dot(W.astype(cdt), tbl_ref[:].astype(cdt),
                         preferred_element_type=jnp.float32)


def _bwd_kernel(cdt, vp, K, idx_ref, att_ref, g_ref, dtbl_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dtbl_ref[:] = jnp.zeros_like(dtbl_ref)

    W = _build_w(idx_ref, att_ref, vp, K)
    dtbl_ref[:] += jnp.dot(W.T.astype(cdt), g_ref[:].astype(cdt),
                           preferred_element_type=jnp.float32)


def knn_weighted_agg(table: jnp.ndarray, idx: jnp.ndarray,
                     atts: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    """``sum_k atts[n,k] * table[idx[n,k]]`` as one-hot MXU matmuls.

    Args:
        table: (V, C) per-vertex feature rows (C <= 128); receives the
            exact scatter-add gradient via the transposed matmul.
        idx: (N, K) int32 rows into ``table``; no gradient.
        atts: (N, K) detached aggregation weights; NO gradient flows to
            them (the reference stop-gradients the attention softmax) —
            callers must stop-gradient, matching `occnerf_mlp.py:120`.
        compute_dtype: per-call matmul input dtype (None = module
            default).  W entries are attention sums — bfloat16 rounds
            them AND the features to 8 mantissa bits; keep float32 for
            the differentiable train pass.

    Returns:
        (N, C) aggregated features.
    """
    dt = COMPUTE_DTYPE if compute_dtype is None else compute_dtype
    return _agg(_dt_key_(dt), table, idx, atts)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _agg(dtk, table, idx, atts):
    return _agg_fwd(dtk, table, idx, atts)[0]


def _pad_inputs(table, idx, atts):
    V, C = table.shape
    vp = -(-V // LANES) * LANES
    tbl = jnp.pad(table, ((0, vp - V), (0, 0)))
    n = idx.shape[0]
    pad = (-n) % Q_BLK
    if pad:
        idx = jnp.pad(idx, ((0, pad), (0, 0)), constant_values=-1)
        atts = jnp.pad(atts, ((0, pad), (0, 0)))
    return tbl, idx, atts, vp, n


def _agg_fwd(dtk, table, idx, atts):
    cdt = _DTYPES_[dtk]
    V, C = table.shape
    K = idx.shape[1]
    tbl, idxp, attsp, vp, n = _pad_inputs(table, idx, atts)
    nblk = idxp.shape[0] // Q_BLK

    qspec = pl.BlockSpec((Q_BLK, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, cdt, vp, K),
        grid=(nblk,),
        in_specs=[qspec, qspec,
                  pl.BlockSpec((vp, C), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((Q_BLK, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((idxp.shape[0], C), jnp.float32),
        interpret=_interpret(),
    )(idxp, attsp, tbl)
    return out[:n], (table, idx, atts)


def _agg_bwd(dtk, res, g):
    cdt = _DTYPES_[dtk]
    table, idx, atts = res
    V, C = table.shape
    K = idx.shape[1]
    _, idxp, attsp, vp, n = _pad_inputs(table, idx, atts)
    gp = jnp.pad(g, ((0, idxp.shape[0] - n), (0, 0)))
    nblk = idxp.shape[0] // Q_BLK

    qspec = pl.BlockSpec((Q_BLK, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    dtbl = pl.pallas_call(
        functools.partial(_bwd_kernel, cdt, vp, K),
        grid=(nblk,),
        in_specs=[qspec, qspec,
                  pl.BlockSpec((Q_BLK, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((vp, C), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((vp, C), jnp.float32),
        interpret=_interpret(),
    )(idxp, attsp, gp)
    return (dtbl[:V],
            np.zeros(idx.shape, dtype=jax.dtypes.float0),
            jnp.zeros_like(atts))


_agg.defvjp(_agg_fwd, _agg_bwd)
