"""Multi-resolution hash-grid encoding (instant-ngp style) for TPU.

Replaces the reference's CUDA `gridencoder` extension
(`core/nets/occnerf/gridencoder/src/gridencoder.cu`, `grid.py`) with a
fully-differentiable XLA formulation: per (point, level) the 2^D corner
indices are computed with the same spatial-hash recipe (prime-XOR hash for
levels whose dense grid exceeds the table, direct strided indexing
otherwise — `gridencoder.cu:50-84`), gathered from one flat table and
lerped.  The backward pass falls out of JAX AD: the gather transposes to a
scatter-add, which is the atomics-free TPU equivalent of the CUDA
``atomicAdd`` backward (`gridencoder.cu:248-340`).

Level geometry (resolutions, per-level table offsets capped at
2^log2_hashmap_size and 8-aligned) matches `grid.py:119-132` exactly, so a
converted reference checkpoint drops in.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

_PRIMES = np.array(
    [1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437, 2165219737],
    dtype=np.uint32)


@dataclasses.dataclass(frozen=True)
class HashGridSpec:
    """Static geometry of a hash grid (all fields Python/numpy constants).

    Covers the CUDA extension's full public surface: D in 2..5, C in
    {1, 2, 4, 8}, ``gridtype`` hash/tiled, ``align_corners`` (grid stride
    ``res`` vs ``res+1`` and no +0.5 offset, `gridencoder.cu:141,36-39` of
    get_grid_index), and ``interpolation`` linear/smoothstep
    (`gridencoder.cu:40-47,151-158`).
    """

    input_dim: int = 3
    num_levels: int = 16
    level_dim: int = 2
    per_level_scale: float = 2.0
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    align_corners: bool = False
    interpolation: str = "linear"
    # derived
    offsets: Tuple[int, ...] = ()
    resolutions: Tuple[int, ...] = ()
    scales: Tuple[float, ...] = ()
    use_hash: Tuple[bool, ...] = ()

    @staticmethod
    def create(input_dim: int = 3, num_levels: int = 16, level_dim: int = 2,
               per_level_scale: float = 2.0, base_resolution: int = 16,
               log2_hashmap_size: int = 19,
               desired_resolution: float | None = None,
               gridtype: str = "hash", align_corners: bool = False,
               interpolation: str = "linear") -> "HashGridSpec":
        if level_dim not in (1, 2, 4, 8):
            raise ValueError(f"level_dim must be 1/2/4/8, got {level_dim}")
        if not 2 <= input_dim <= 5:
            raise ValueError(f"input_dim must be 2..5, got {input_dim}")
        if interpolation not in ("linear", "smoothstep"):
            raise ValueError(f"unknown interpolation {interpolation!r}")
        if desired_resolution is not None:
            per_level_scale = float(np.exp2(
                np.log2(desired_resolution / base_resolution)
                / (num_levels - 1)))
        max_params = 2 ** log2_hashmap_size
        S = np.log2(per_level_scale)
        offsets, resolutions, scales, use_hash = [0], [], [], []
        offset = 0
        for lvl in range(num_levels):
            scale = float(np.exp2(lvl * S) * base_resolution - 1.0)
            res = int(np.ceil(scale)) + 1
            # grid samples per dim: res (align_corners) / res+1 (default),
            # `grid.py:124`
            dense = (res if align_corners else res + 1) ** input_dim
            params = min(max_params, dense)
            params = int(np.ceil(params / 8) * 8)
            offset += params
            offsets.append(offset)
            resolutions.append(res)
            scales.append(scale)
            # hashing kicks in iff the dense stride exceeds the table
            # (gridencoder.cu:66-82); only meaningful for gridtype='hash'
            use_hash.append(gridtype == "hash" and dense > params)
        return HashGridSpec(
            input_dim=input_dim, num_levels=num_levels, level_dim=level_dim,
            per_level_scale=per_level_scale, base_resolution=base_resolution,
            log2_hashmap_size=log2_hashmap_size,
            align_corners=align_corners, interpolation=interpolation,
            offsets=tuple(offsets), resolutions=tuple(resolutions),
            scales=tuple(scales), use_hash=tuple(use_hash))

    @property
    def table_size(self) -> int:
        return self.offsets[-1]

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim

    def init_table(self, key: jax.Array, std: float = 1e-4) -> jnp.ndarray:
        """U(-std, std) init, like `grid.py:146-148`."""
        return jax.random.uniform(
            key, (self.table_size, self.level_dim),
            minval=-std, maxval=std, dtype=jnp.float32)


def _corner_bits(D: int) -> np.ndarray:
    """(2^D, D) binary corner offsets."""
    n = 1 << D
    return ((np.arange(n)[:, None] >> np.arange(D)[None, :]) & 1).astype(np.int32)


def _grid_stride(spec: HashGridSpec, lvl: int) -> int:
    """Samples per dim at a level: res (align_corners) / res+1 (default),
    matching get_grid_index's stride multiplier (`gridencoder.cu`)."""
    return spec.resolutions[lvl] + (0 if spec.align_corners else 1)


def _level_cells(x: jnp.ndarray, spec: HashGridSpec, lvl: int):
    """(pos_grid uint32 (D, N), frac (D, N)) for one level — frac is the
    *interpolation* fraction (smoothstepped when configured,
    `gridencoder.cu:151-158`); AD through the smoothstep polynomial
    supplies the input-gradient chain term the CUDA tracks as
    ``pos_deriv``."""
    xt = x.T                                                    # (D, N)
    scale = jnp.asarray(spec.scales[lvl], x.dtype)
    pos = xt * scale + (0.0 if spec.align_corners else 0.5)
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid
    if spec.interpolation == "smoothstep":
        frac = frac * frac * (3.0 - 2.0 * frac)
    return pos_grid.astype(jnp.uint32), frac


def _corner_index(pos_grid, bits_ci, spec: HashGridSpec, lvl: int):
    """Table row (without level offset) of one corner, (N,) int32."""
    D = spec.input_dim
    hsize = spec.offsets[lvl + 1] - spec.offsets[lvl]
    strides = [1]
    for d in range(1, D):
        strides.append((strides[-1] * _grid_stride(spec, lvl)) & 0xFFFFFFFF)
    idx = None
    h = None
    for d in range(D):
        corner_d = pos_grid[d] + jnp.uint32(bits_ci[d])
        if spec.use_hash[lvl]:
            term = corner_d * jnp.uint32(_PRIMES[d])
            h = term if h is None else h ^ term
        else:
            term = corner_d * jnp.uint32(strides[d])
            idx = term if idx is None else idx + term
    idx = h if spec.use_hash[lvl] else idx
    return (idx % jnp.uint32(hsize)).astype(jnp.int32)


def _level_corner_indices(x: jnp.ndarray, spec: HashGridSpec, lvl: int):
    """Per-corner (table index, lerp weight) for one level.

    Returns ``idx`` (2^D, N) int32 table rows WITHOUT the level offset and
    ``w`` (2^D, N) weights.  Shared by the forward lerp and the sorted
    backward (which recomputes them instead of saving 2^D x N residuals).
    """
    D = spec.input_dim
    bits = _corner_bits(D)
    pos_grid, frac = _level_cells(x, spec, lvl)

    idx_list, w_list = [], []
    for ci in range(1 << D):
        w = None
        for d in range(D):
            wd = frac[d] if bits[ci, d] else (1.0 - frac[d])
            w = wd if w is None else w * wd
        idx_list.append(_corner_index(pos_grid, bits[ci], spec, lvl))
        w_list.append(w)
    return jnp.stack(idx_list), jnp.stack(w_list)


def hash_grid_encode(inputs: jnp.ndarray, table: jnp.ndarray,
                     spec: HashGridSpec) -> jnp.ndarray:
    """Encode points in [0, 1]^D -> (N, L*C) features.

    Out-of-range inputs produce zeros (and zero grads), matching
    `gridencoder.cu:108-135`.  Differentiable in both ``table`` and
    ``inputs`` (input grads replace the CUDA ``dy_dx`` path).
    """
    D, L, C = spec.input_dim, spec.num_levels, spec.level_dim
    x = inputs.reshape(-1, D)
    if not jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(jnp.float32)

    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1)              # (N,)
    xc = jnp.clip(x, 0.0, 1.0)

    # TPU layout note: keep N as the trailing (lane) dimension everywhere.
    # A (N, L, 2^D) layout tiles as (8, 128) on the tiny trailing dims and
    # pads 8x — at 786k points that turned 1.5 GB of temps into 12 GB.
    bits = _corner_bits(D)                                      # (2^D, D) np

    feats = []
    for lvl in range(L):
        pos_grid, frac = _level_cells(xc, spec, lvl)
        lvl_feat = None
        for ci in range(1 << D):
            w = None
            for d in range(D):
                wd = frac[d] if bits[ci, d] else (1.0 - frac[d])
                w = wd if w is None else w * wd
            idx = _corner_index(pos_grid, bits[ci], spec, lvl) \
                + spec.offsets[lvl]
            g = table[idx]                                      # (N, C)
            contrib = w[:, None] * g
            lvl_feat = contrib if lvl_feat is None else lvl_feat + contrib
        feats.append(lvl_feat)                                  # (N, C)

    feat = jnp.concatenate(feats, axis=-1)                      # (N, L*C)
    feat = jnp.where(oob[:, None], 0.0, feat)
    return feat.reshape(inputs.shape[:-1] + (L * C,))


# ---------------------------------------------------------------------------
# Sorted backward for big (2^19) tables
# ---------------------------------------------------------------------------
# The AD backward of ``hash_grid_encode`` is a scatter-add of N x 2^D
# contributions per level; XLA's TPU scatter lowering is effectively serial
# (~14 s/step at the reference-flagship 2^19 x 16-level geometry).  The
# TPU-native formulation is scatter-free: sort the (index, contribution)
# pairs per level, segmented-scan exact per-segment sums, then *gather*
# each table row's total via a binary-search boundary lookup.  Everything
# is a sort / scan / gather — all well-lowered on TPU.


def _seg_inclusive_scan(start: jnp.ndarray, vals: jnp.ndarray
                        ) -> jnp.ndarray:
    """Segmented inclusive scan along the last-but-one axis of ``vals``.

    ``start`` (..., M) bool segment-start flags, ``vals`` (..., M, C).
    Hillis-Steele doubling with CONTIGUOUS pad-shifts: log2(M) steps of
    (pad, elementwise combine).  ``lax.associative_scan`` computes the
    same thing via an odd/even recursion whose strided slices relayout
    on TPU — measured 2,069 ms vs ~90 ms for this form at the 2^19
    production geometry (L=16, M=6.3M, C=2; benchmarks/prof_sorted_bwd).
    Exact f32 adds (different association order than the sequential sum;
    no prefix-sum cancellation).
    """
    flag = start
    s = vals
    M = vals.shape[-2]
    d = 1
    while d < M:
        pad_s = [(0, 0)] * vals.ndim
        pad_s[-2] = (d, 0)
        pad_f = [(0, 0)] * flag.ndim
        pad_f[-1] = (d, 0)
        s_shift = jnp.pad(s, pad_s)[..., :M, :]
        f_shift = jnp.pad(flag, pad_f)[..., :M]
        s = s + jnp.where(flag[..., None], 0.0, s_shift)
        flag = flag | f_shift
        d *= 2
    return s


def _searchsorted_iota(keys: jnp.ndarray, n_rows: int,
                       anchor: int = 64) -> jnp.ndarray:
    """``searchsorted(keys, arange(n_rows + 1))`` (left bounds), fast.

    Exploits that the queries are ALL consecutive integers: anchor keys
    every ``anchor`` elements, then the coarse locate step — "how many
    anchors sort below each integer q" — is a histogram of the anchors
    over the query range followed by an exclusive cumsum (one tiny
    scatter + scan instead of per-query binary search).  Each bound then
    lies in a window of ``anchor + 1`` positions, pinned down by
    ceil(log2(anchor + 2)) gather rounds.  At the 2^19 production
    geometry this replaces a 23-round binary search / a full extra sort
    (~2.1 s / ~1.3 s measured) with ~7 gather rounds over the queries.

    ``keys`` (M,) int32 sorted ascending in [0, n_rows).
    """
    M = keys.shape[0]
    q = jnp.arange(n_rows + 1, dtype=jnp.int32)
    anchors = keys[::anchor]                                # strided slice
    hist = jnp.zeros((n_rows + 1,), jnp.int32).at[anchors].add(
        1, mode="drop")                                     # values < n_rows
    # m[q] = #anchors with value < q  (exclusive cumsum of the histogram)
    m = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                         jnp.cumsum(hist)[:-1]])
    # anchors 0..m-1 sort below q and anchor m (if any) does not, so the
    # bound sits in [anchor*(m-1), anchor*m] (m=0 -> [0, anchor])
    lo = jnp.maximum(m - 1, 0) * anchor
    hi = jnp.minimum(m * anchor, M)
    rounds = int(np.ceil(np.log2(anchor + 2)))
    for _ in range(rounds):
        mid = (lo + hi) // 2
        kmid = keys[jnp.clip(mid, 0, max(M - 1, 0))]
        go_right = (kmid < q) & (mid < M)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return lo


def _segmented_sums(keys: jnp.ndarray, vals: jnp.ndarray, n_rows: int
                    ) -> jnp.ndarray:
    """Sum ``vals`` rows by sorted ``keys`` into a (n_rows, C) array.

    ``keys`` (M,) int32 sorted ascending in [0, n_rows); ``vals`` (M, C).
    Exact per-segment sums (segmented inclusive scan — no prefix-sum
    cancellation), then one anchored boundary lookup over the n_rows+1
    integer queries (see ``_searchsorted_iota``).
    """
    start = jnp.concatenate(
        [jnp.ones((1,), bool), keys[1:] != keys[:-1]])
    scan = _seg_inclusive_scan(start, vals)

    bounds = _searchsorted_iota(keys, n_rows).astype(jnp.int32)
    left, right = bounds[:-1], bounds[1:]
    seg_end = jnp.clip(right - 1, 0, keys.shape[0] - 1)
    return jnp.where((right > left)[:, None], scan[seg_end], 0.0)


def _sorted_level_grads(keys_lvls, vals_lvls, spec: HashGridSpec
                        ) -> jnp.ndarray:
    """Per-level sorted segment-sums, batched into ONE sort.

    ``keys_lvls``: L arrays (M,) of level-LOCAL row ids; ``vals_lvls``:
    L arrays (M, C).  Levels are stacked on a leading axis and sorted in
    a single batched `lax.sort` along the last axis — L separate sort
    ops at 2^19 scale produce a program large enough to OOM the AOT
    compiler (observed: tpu_compile_helper SIGKILL at L=16, M=6.3M),
    and one batched sort is faster anyway.  Segment sums run vmapped at
    the max level size; each level's rows are then sliced out.

    HBM peak trade-off (accepted): stacking materializes the (L, M)
    keys and (L, M, C) vals plus their sorted copies simultaneously —
    ~1-2.4 GB of temps at the 2^19/L=16/M=6.3M production geometry —
    where the per-level loop it replaced peaked at ~1/L of that.  The
    v5e's 16 GB HBM absorbs it at every shipped configuration; if
    profiling ever shows HBM pressure here, donate/free the unsorted
    stacks or group levels by hsize bucket (the vmapped searchsorted
    over hmax+1 boundaries also does redundant lookups for small
    low-res levels — provably-zero rows beyond each hsize are sliced
    away below).
    """
    L, C = spec.num_levels, vals_lvls[0].shape[-1]
    keys = jnp.stack(keys_lvls)                           # (L, M)
    vals = jnp.stack(vals_lvls)                           # (L, M, C)
    keys, *cols = jax.lax.sort(
        (keys, *(vals[..., c] for c in range(C))), num_keys=1)
    vals = jnp.stack(cols, axis=-1)
    hsizes = [spec.offsets[l + 1] - spec.offsets[l] for l in range(L)]
    hmax = max(hsizes)
    seg = jax.vmap(lambda k, v: _segmented_sums(k, v, hmax))(keys, vals)
    return jnp.concatenate(
        [seg[l, :hsizes[l]] for l in range(L)], axis=0)   # (table_size, C)


def _table_grad_sorted(x: jnp.ndarray, oob: jnp.ndarray, g: jnp.ndarray,
                       spec: HashGridSpec) -> jnp.ndarray:
    """d(loss)/d(table) from upstream feature grads ``g`` (N, L*C)."""
    C = spec.level_dim
    g = jnp.where(oob[:, None], 0.0, g)
    keys_lvls, vals_lvls = [], []
    for lvl in range(spec.num_levels):
        idx, w = _level_corner_indices(x, spec, lvl)      # (2^D, N) each
        g_lvl = g[:, lvl * C:(lvl + 1) * C]               # (N, C)
        contrib = (w[..., None] * g_lvl[None, :, :]).reshape(-1, C)
        keys_lvls.append(idx.reshape(-1))
        vals_lvls.append(contrib)
    return _sorted_level_grads(keys_lvls, vals_lvls, spec)


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def hash_grid_encode_sorted(inputs: jnp.ndarray, table: jnp.ndarray,
                            spec: HashGridSpec) -> jnp.ndarray:
    """``hash_grid_encode`` with the sort-based table backward.

    Contract: inputs carry NO gradient (the caller stop-gradients them —
    the per-sample encode path, `canonical.py::_encode_no_input_grad`);
    the input cotangent returned is zeros.  Forward numerics are identical
    to ``hash_grid_encode``.
    """
    return hash_grid_encode(inputs, table, spec)


def _hges_fwd(inputs, table, spec):
    out = hash_grid_encode(inputs, table, spec)
    return out, inputs


def _hges_bwd(spec, inputs, g):
    D = spec.input_dim
    x = inputs.reshape(-1, D)
    if not jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(jnp.float32)
    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1)
    xc = jnp.clip(x, 0.0, 1.0)
    g2 = g.reshape(-1, spec.output_dim).astype(jnp.float32)
    dtable = _table_grad_sorted(xc, oob, g2, spec)
    return jnp.zeros_like(inputs), dtable


hash_grid_encode_sorted.defvjp(_hges_fwd, _hges_bwd)


def grad_total_variation(inputs: jnp.ndarray, table: jnp.ndarray,
                         spec: HashGridSpec,
                         weight: float = 1e-7) -> jnp.ndarray:
    """Stochastic total-variation gradient w.r.t. the table.

    Behavioral equivalent of the CUDA ``grad_total_variation``
    (`grid.py:174-194`, `gridencoder.cu` kernel_grad_tv): per sampled
    point and level, the anchor cell accumulates
    ``w * sum_d(anchor - neighbor_d±) * rsqrt(sum_d diff² + 1e-9)`` with
    ``w = weight / (2D)`` — gradients land on the *anchor row only* (the
    CUDA kernel's asymmetric approximation, kept deliberately).
    Out-of-range points contribute nothing.  The caller adds the result
    into its table gradient before the optimizer step, mirroring the
    torch usage (after ``loss.backward()``).

    Scatter-free on TPU: contributions are sorted by anchor row and
    segment-summed (same machinery as the sorted training backward).

    Args:
        inputs: (..., D) points in [0, 1]^D.
        table: (table_size, C) embeddings.
        spec: grid geometry.
        weight: TV weight (CUDA default 1e-7).
    Returns:
        (table_size, C) gradient array.
    """
    D, C = spec.input_dim, spec.level_dim
    x = inputs.reshape(-1, D)
    if not jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(jnp.float32)
    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1)               # (N,)
    xc = jnp.clip(x, 0.0, 1.0)
    w = weight / (2 * D)
    zero_bits = np.zeros((D,), np.int32)

    keys_lvls, vals_lvls = [], []
    for lvl in range(spec.num_levels):
        res = spec.resolutions[lvl]
        pos_grid, _ = _level_cells(xc, spec, lvl)               # (D, N)
        anchor = _corner_index(pos_grid, zero_bits, spec, lvl)  # (N,)
        g_anchor = table[anchor + spec.offsets[lvl]]            # (N, C)

        results = jnp.zeros_like(g_anchor)
        idelta = jnp.zeros_like(g_anchor)
        for d in range(D):
            for side in (+1, -1):
                shifted = pos_grid.at[d].add(
                    jnp.uint32(side & 0xFFFFFFFF))  # -1 wraps (masked)
                # CUDA-exact bound (`gridencoder.cu:572` cur_d <
                # resolution).  Reference quirk preserved deliberately:
                # for align_corners grids (stride = res, samples
                # 0..res-1) this admits a +1 neighbour at coordinate
                # res, which get_grid_index wraps to an unrelated row —
                # the CUDA kernel does the same
                valid = (pos_grid[d] < res) if side > 0 \
                    else (pos_grid[d] > 0)                      # (N,)
                nb = _corner_index(shifted, zero_bits, spec, lvl)
                diff = (g_anchor - table[nb + spec.offsets[lvl]]) \
                    * valid[:, None]
                results = results + diff
                idelta = idelta + diff * diff

        val = w * results * jax.lax.rsqrt(idelta + 1e-9)
        val = jnp.where(oob[:, None], 0.0, val)
        keys_lvls.append(anchor)
        vals_lvls.append(val)
    return _sorted_level_grads(keys_lvls, vals_lvls, spec)
