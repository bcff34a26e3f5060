"""Scatter-free backward for the KNN vertex-feature weighted aggregation.

The OccNeRF canonical MLP gathers a 36-lane per-vertex feature row for
each of the 4x10 multiscale neighbours of every sample and reduces them
with detached visibility-attention weights (reference
`canonical_mlps/occnerf_mlp.py:171-178`):

    agg[n, c] = sum_k atts[n, k] * table[idx[n, k], c]

The FORWARD is cheap on TPU — vectorized row gathers move whole 36-lane
rows (~1 ms per ray chunk measured) — so it stays on XLA.  The VJP is
the problem: XLA lowers the scatter-add into the small (V, C) table to
~5 ms per chunk (~80 ms of a reference-scale train step, the largest
non-kernel op in the profile).  Because the attention weights are
stop-gradient'd, the cotangent of the gathered block is RANK-ONE in
(k, c): d gathered[n,k,c] = atts[n,k] * d agg[n,c], so the whole
per-block table gradient collapses onto one attention-weighted one-hot
matrix

    W[n, v] = sum_k atts[n, k] * [idx[n, k] == v]          (Q, Vp)
    dT      = W^T @ d agg                                  (MXU matmul)

built with K VPU compare/fma passes per query block — ~3x cheaper than
the scatter it replaces, and exactly the transposed forward (matches
the AD oracle to reassociation).

Earlier attempts, kept here as measured guidance: a Pallas FORWARD
(W @ table) re-paid the W build in the forward AND its remat recompute
(9.5k -> 9.1k rays/s), and extracting the attention lane with a 1-D
scalar take cost +160 ms/step (TPU scalar-gathers ~7 ns/element) —
row gathers and e0 contractions are the fast idioms.

The W build scales with V, so large clouds (real-SMPL 6890-vertex
subjects concat to ~9k rows) stay entirely on the XLA path via
:func:`supports`.  Gradients flow to the table only — callers
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


def _col_f(ref, k):
    lane = jax.lax.broadcasted_iota(jnp.int32, ref.shape, 1)
    return jnp.sum(jnp.where(lane == k, ref[:], 0.0), axis=1, keepdims=True)


def _col_i(ref, k):
    lane = jax.lax.broadcasted_iota(jnp.int32, ref.shape, 1)
    return jnp.sum(jnp.where(lane == k, ref[:], 0), axis=1, keepdims=True)


def _build_w(idx_ref, att_ref, vp, K):
    """W[q, v] = sum_k att[q, k] * [idx[q, k] == v]  (f32, (Q, Vp))."""
    q = idx_ref.shape[0]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (q, vp), 1)

    def body(k, W):
        iv = _col_i(idx_ref, k)                        # (Q, 1) int32
        av = _col_f(att_ref, k)                        # (Q, 1) f32
        return W + av * (row_iota == iv).astype(jnp.float32)

    return jax.lax.fori_loop(0, K, body, jnp.zeros((q, vp), jnp.float32))


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
    """``sum_k atts[n,k] * table[idx[n,k]]`` — XLA row-gather forward,
    one-hot MXU matmul (scatter-free) table gradient.

    Args:
        table: (V, C) per-vertex feature rows (C <= 128); receives the
            exact scatter-add gradient via the transposed matmul.
        idx: (N, K) int32 rows into ``table``; no gradient.
        atts: (N, K) detached aggregation weights; NO gradient flows to
            them (the reference stop-gradients the attention softmax) —
            callers must stop-gradient, matching `occnerf_mlp.py:120`.
        compute_dtype: matmul input dtype of the backward (None = module
            default; keep float32 for the differentiable train pass).

    Returns:
        (N, C) aggregated features.
    """
    dt = COMPUTE_DTYPE if compute_dtype is None else compute_dtype
    return _agg(_dt_key_(dt), table, idx, atts)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _agg(dtk, table, idx, atts):
    return _agg_fwd(dtk, table, idx, atts)[0]


def _agg_fwd(dtk, table, idx, atts):
    # vectorized row gather + einsum: the fast XLA idiom (whole 36-lane
    # rows per index; ~1 ms/chunk measured at reference scale)
    out = jnp.einsum("nk,nkc->nc", atts, table[idx])
    return out, (table, idx, atts)


def _agg_bwd(dtk, res, g):
    cdt = _DTYPES_[dtk]
    table, idx, atts = res
    V, C = table.shape
    n, K = idx.shape
    vp = -(-V // LANES) * LANES
    pad = (-n) % Q_BLK
    idxp, attsp, gp = idx, atts, g
    if pad:
        idxp = jnp.pad(idx, ((0, pad), (0, 0)), constant_values=-1)
        attsp = jnp.pad(atts, ((0, pad), (0, 0)))
        gp = jnp.pad(g, ((0, pad), (0, 0)))
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
            np.zeros((n, K), dtype=jax.dtypes.float0),
            jnp.zeros_like(atts))


_agg.defvjp(_agg_fwd, _agg_bwd)
