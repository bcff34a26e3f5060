"""Brute-force k-nearest-neighbour search on TPU.

Replaces the reference's PyKeOps JIT-CUDA KNN (`core/nets/occnerf/knn.py`)
and the block-sparse 4-scale launch (`core/nets/occnerf/network.py:239-255`).
On TPU the candidate sets are small and fixed (6890 + 3 FPS levels), so the
MXU-friendly formulation is a tiled distance matmul
``d2 = |q|^2 - 2 q.p + |p|^2`` followed by a top-k.  ``backend='approx'``
uses ``jax.lax.approx_max_k`` (TPU-native partial reduction); ``'exact'``
uses ``jax.lax.top_k``.  Ties may order differently from KeOps — tests
compare distances, not indices (SURVEY.md hard-part #5).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


# recall target for the 'approx' backend (lax.approx_max_k partial
# reduction).  0.95 is the jax default; 0.85 is ~30% faster on v5e with
# negligible effect on the normal-weighted aggregates downstream (ties are
# distance-compared, SURVEY.md hard-part #5).
APPROX_RECALL = 0.95


def _topk_neg_dist(neg_d2: jnp.ndarray, k: int, backend: str):
    if backend == "approx":
        vals, idx = jax.lax.approx_max_k(neg_d2, k=k,
                                         recall_target=APPROX_RECALL)
    else:
        vals, idx = jax.lax.top_k(neg_d2, k=k)
    return vals, idx


def knn(queries: jnp.ndarray, points: jnp.ndarray, k: int,
        backend: str = "exact", block: int = 8192
        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest points for each query.

    Args:
        queries: (N, 3) float.
        points: (M, 3) float.
        k: neighbours per query.
        backend: 'exact' | 'approx'.
        block: query tile size (static); N is padded to a multiple.

    Returns:
        (dists (N, k) sorted ascending, indices (N, k) into points)
    """
    N = queries.shape[0]
    M = points.shape[0]
    queries = queries.astype(jnp.float32)
    points = points.astype(jnp.float32)

    # degenerate candidate sets (k > M, e.g. tiny test meshes): truncate and
    # pad by repeating the farthest neighbour
    k_eff = min(k, M)

    p_sq = jnp.sum(points * points, axis=-1)                  # (M,)

    nb = max(1, -(-N // block))
    pad = nb * block - N
    q = jnp.pad(queries, ((0, pad), (0, 0))).reshape(nb, block, 3)

    def one_block(qb):
        q_sq = jnp.sum(qb * qb, axis=-1, keepdims=True)       # (b, 1)
        # HIGHEST precision: bf16 MXU rounding would misrank near-tied
        # neighbours
        qp = jax.lax.dot_general(
            qb, points.T, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
        d2 = q_sq - 2.0 * qp + p_sq[None, :]                  # (b, M)
        vals, idx = _topk_neg_dist(-d2, k_eff, backend)
        return -vals, idx

    if nb == 1:
        d2, idx = one_block(q[0])
    else:
        d2, idx = jax.lax.map(one_block, q)
        d2 = d2.reshape(nb * block, k_eff)
        idx = idx.reshape(nb * block, k_eff)

    d2 = d2[:N]
    idx = idx[:N]
    if k_eff < k:
        d2 = jnp.concatenate(
            [d2] + [d2[:, -1:]] * (k - k_eff), axis=-1)
        idx = jnp.concatenate(
            [idx] + [idx[:, -1:]] * (k - k_eff), axis=-1)
    return jnp.sqrt(jnp.maximum(d2, 0.0)), idx


def multiscale_knn(queries: jnp.ndarray,
                   base_points: jnp.ndarray,
                   fps_indices: Sequence[jnp.ndarray],
                   k: int,
                   backend: str = "exact",
                   block: int = 8192) -> jnp.ndarray:
    """KNN of each query against the base cloud and each FPS level.

    Equivalent to the reference's single block-sparse KeOps launch over 4
    concatenated clouds followed by offset removal and FPS re-indexing
    (`network.py:234-255`): every returned index points into the *base*
    cloud.

    Returns:
        indices (N, 1 + len(fps_indices), k) int32 into base_points.
    """
    outs = []
    _, idx0 = knn(queries, base_points, k, backend=backend, block=block)
    outs.append(idx0)
    for fps_idx in fps_indices:
        sub = base_points[fps_idx]
        _, idx = knn(queries, sub, k, backend=backend, block=block)
        outs.append(jnp.asarray(fps_idx, jnp.int32)[idx])
    return jnp.stack(outs, axis=1)


def multiscale_knn_concat(queries: jnp.ndarray,
                          base_points: jnp.ndarray,
                          fps_indices: Sequence[jnp.ndarray],
                          k: int,
                          backend: str = "exact",
                          block: int = 8192
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Multiscale KNN with indices into the CONCATENATED cloud.

    Like :func:`multiscale_knn` but skips the per-neighbour FPS
    re-indexing (a 23M-element scalar gather per reference-scale step on
    TPU): returned indices address the virtual concatenation
    ``[base; base[fps_0]; base[fps_1]; ...]``.  ``concat_map`` maps each
    concatenated row to its base index, so per-vertex tables are lifted
    once with one small gather (``table[concat_map]``) instead of
    re-indexing every neighbour.

    Returns:
        (indices (N, 1 + levels, k) int32 into the concat cloud,
         concat_map (V + sum(level sizes),) int32 into base_points)
    """
    outs = []
    offset = 0
    maps = [jnp.arange(base_points.shape[0], dtype=jnp.int32)]
    _, idx0 = knn(queries, base_points, k, backend=backend, block=block)
    outs.append(idx0)
    offset += base_points.shape[0]
    for fps_idx in fps_indices:
        sub = base_points[fps_idx]
        _, idx = knn(queries, sub, k, backend=backend, block=block)
        outs.append(idx + offset)
        maps.append(jnp.asarray(fps_idx, jnp.int32))
        offset += sub.shape[0]
    return jnp.stack(outs, axis=1), jnp.concatenate(maps)
