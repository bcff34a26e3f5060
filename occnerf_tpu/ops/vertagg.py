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

**Scaling to reference-size clouds.**  The W build costs Q * V * K
compare/fma ops, so a naive kernel dies at the real 6,890-vertex SMPL
subject (the concat [base; 3 FPS levels] cloud is ~9.1k rows).  Two
structural facts fix it:

1. *V-block tiling*: the table gradient is built per v-block of
   ``V_BLK`` rows (grid = (n_vblocks, n_qblocks), q innermost so each
   output block stays VMEM-resident while all query blocks stream
   through), instead of one monolithic (Q, Vp) one-hot in VMEM.
2. *Per-scale group factorization*: the 4 KNN scales occupy DISJOINT
   contiguous row ranges of the concat cloud, and each scale's
   neighbours occupy a known contiguous lane range of ``idx``
   (lanes [s*k, (s+1)*k) can only hit rows [off_s, off_s + V_s)).
   Callers pass these static ``groups``; the backward then runs one
   pallas_call per group with only that group's k lanes, cutting the
   build cost from Q*V*K to sum_s Q*V_s*k — 4x at the reference
   geometry.  At V=9,149/K=40 this prices the build at ~1.2x the old
   V=1024/K=40 kernel rather than ~4.5x.

Earlier attempts, kept here as measured guidance: a Pallas FORWARD
(W @ table) re-paid the W build in the forward AND its remat recompute
(9.5k -> 9.1k rays/s), and extracting the attention lane with a 1-D
scalar take cost +160 ms/step (TPU scalar-gathers ~7 ns/element) —
row gathers and e0 contractions are the fast idioms.

Gradients flow to the table only — callers stop-gradient ``atts`` (the
reference detaches the softmax) and ``idx`` is integral.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._dtypes import dt_key as _dt_key_, mxu_dot as _mxu_dot_

LANES = 128
Q_BLK = 512
V_BLK_MAX = 1024  # W tile is (Q_BLK, V_BLK) f32 in VMEM (2 MB at the cap)

# default matmul input dtype (see hashgrid_pallas.COMPUTE_DTYPE)
COMPUTE_DTYPE = "f32"   # module-default compute mode key (see ops/_dtypes.py)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def supports(n_rows: int, n_feat: int, k: int) -> bool:
    """Kernel viable: feature lanes and k fit one vreg row.  Any table
    size works — V is tiled into ``V_BLK`` grid blocks."""
    del n_rows
    return n_feat <= LANES and k <= LANES


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _col_f(ref, k):
    lane = jax.lax.broadcasted_iota(jnp.int32, ref.shape, 1)
    return jnp.sum(jnp.where(lane == k, ref[:], 0.0), axis=1, keepdims=True)


def _col_i(ref, k):
    lane = jax.lax.broadcasted_iota(jnp.int32, ref.shape, 1)
    return jnp.sum(jnp.where(lane == k, ref[:], 0), axis=1, keepdims=True)


def _bwd_kernel(dtk, v_blk, K, idx_ref, att_ref, g_ref, dtbl_ref):
    """One (v-block j, q-block i) cell: accumulate this v-block's slice
    of W^T @ g.  W[q, v] = sum_k att[q, k] * [idx[q, k] == j*v_blk + v],
    built with K compare/fma passes over the (Q, v_blk) tile."""
    j = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dtbl_ref[:] = jnp.zeros_like(dtbl_ref)

    q = idx_ref.shape[0]
    row_iota = (jax.lax.broadcasted_iota(jnp.int32, (q, v_blk), 1)
                + j * v_blk)

    def body(k, W):
        iv = _col_i(idx_ref, k)                        # (Q, 1) int32
        av = _col_f(att_ref, k)                        # (Q, 1) f32
        return W + av * (row_iota == iv).astype(jnp.float32)

    W = jax.lax.fori_loop(0, K, body, jnp.zeros((q, v_blk), jnp.float32))
    dtbl_ref[:] += _mxu_dot_(W.T, g_ref[:], dtk)


def knn_weighted_agg(table: jnp.ndarray, idx: jnp.ndarray,
                     atts: jnp.ndarray, compute_dtype=None,
                     groups=None) -> jnp.ndarray:
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
        groups: optional static tuple of (row_start, row_end, lane_start,
            lane_end) ints declaring that idx lanes [lane_start,
            lane_end) only ever address rows [row_start, row_end) — the
            multiscale-KNN concat structure.  Row ranges must tile
            [0, V) contiguously and lane ranges must tile [0, K); the
            backward then builds each group's one-hot from its own k
            lanes only (sum_s Q*V_s*k_s instead of Q*V*K work).
            Violating the row containment silently drops gradient.

    Returns:
        (N, C) aggregated features.
    """
    dt = COMPUTE_DTYPE if compute_dtype is None else compute_dtype
    V = table.shape[0]
    K = idx.shape[1]
    if groups is None:
        groups = ((0, V, 0, K),)
    groups = tuple(tuple(int(x) for x in g) for g in groups)
    row, lane = 0, 0
    for rs, re_, ls, le in groups:
        if rs != row or ls != lane or re_ <= rs or le <= ls:
            raise ValueError(f"groups must tile rows/lanes contiguously; "
                             f"got {groups}")
        row, lane = re_, le
    if row != V or lane != K:
        raise ValueError(f"groups {groups} do not cover (V={V}, K={K})")
    return _agg(_dt_key_(dt), groups, table, idx, atts)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _agg(dtk, groups, table, idx, atts):
    return _agg_fwd(dtk, groups, table, idx, atts)[0]


def _agg_fwd(dtk, groups, table, idx, atts):
    # vectorized row gather + einsum: the fast XLA idiom (whole 36-lane
    # rows per index; ~1 ms/chunk measured at reference scale)
    out = jnp.einsum("nk,nkc->nc", atts, table[idx])
    return out, (table, idx, atts)


def _agg_bwd(dtk, groups, res, g):
    table, idx, atts = res
    V, C = table.shape
    n, K = idx.shape
    pad = (-n) % Q_BLK
    idxp, attsp, gp = idx, atts, g
    if pad:
        idxp = jnp.pad(idx, ((0, pad), (0, 0)), constant_values=-1)
        attsp = jnp.pad(atts, ((0, pad), (0, 0)))
        gp = jnp.pad(g, ((0, pad), (0, 0)))
    nblk_q = idxp.shape[0] // Q_BLK
    gspec = pl.BlockSpec((Q_BLK, C), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM)

    parts = []
    for rs, re_, ls, le in groups:
        vg = re_ - rs
        kg = le - ls
        v_blk = min(V_BLK_MAX, _ceil_to(vg, LANES))
        vp = _ceil_to(vg, v_blk)
        # local row ids; the -1 query padding stays negative -> no match
        idx_g = idxp[:, ls:le] - rs
        atts_g = attsp[:, ls:le]
        qspec = pl.BlockSpec((Q_BLK, kg), lambda j, i: (i, 0),
                             memory_space=pltpu.VMEM)
        dtbl_g = pl.pallas_call(
            functools.partial(_bwd_kernel, dtk, v_blk, kg),
            grid=(vp // v_blk, nblk_q),
            in_specs=[qspec, qspec, gspec],
            out_specs=pl.BlockSpec((v_blk, C), lambda j, i: (j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((vp, C), jnp.float32),
            interpret=_interpret(),
        )(idx_g, atts_g, gp)
        parts.append(dtbl_g[:vg])
    dtbl = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    return (dtbl,
            np.zeros((n, K), dtype=jax.dtypes.float0),
            jnp.zeros_like(atts))


_agg.defvjp(_agg_fwd, _agg_bwd)
