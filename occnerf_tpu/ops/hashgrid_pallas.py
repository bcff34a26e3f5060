"""Pallas TPU kernel for multiresolution hash-grid encoding (capped tables).

XLA lowers the hash-table gathers of :mod:`occnerf_tpu.ops.hashgrid` to a
scalar loop (~5.7 ns/lookup measured on v5e: 1.15 s forward and 14 s
backward-scatter for one reference-scale train step).  For tables capped
at <= 2^15 entries per level — ``log2_hashmap_size`` is a reference config
knob (`gridencoder grid.py:119-132`) — the lookup reformulates as dense
MXU math like the motion-field kernel:

- per level, the table is laid out (E/64, 128): entry ``e`` keeps its two
  features at lanes ``2*(e%64)`` and ``2*(e%64)+1`` of row ``e//64``;
- each of the 2^D corners contributes one 1-hot row-selection matmul
  (Q, R) x (R, 128) plus two 1-hot lane extractions;
- hashes are computed in-kernel with the same prime-XOR recipe
  (int32 wrap-around multiplies == the CUDA uint arithmetic) and masked
  with E-1 (capped tables are exact powers of two).

Cost: 2 x table_size MAC per lookup — ~3.3 TMAC per reference-scale
encode at 2^14, ~25 ms on the MXU vs ~15 s for gather+scatter.

The custom_vjp computes the TABLE gradient only (same matmuls transposed);
input gradients are zero.  That matches the only large-N call site: the
canonical MLP's per-sample encode, whose inputs are stop-gradient'd
surface points and distances (`occnerf_mlp.py:146-167`).  The per-vertex
encode (V=6890), which does need input grads, stays on the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._dtypes import dt_key as _dt_key_, mxu_dot_onehot as _oh_dot_

from .hashgrid import _PRIMES, HashGridSpec

LANES = 128
Q_BLK = 512
MAX_LOG2 = 15          # one-hot matmul viable up to 2^15-entry tables

# default matmul input dtype: float32 (exact vs the XLA path) or bfloat16
# (~0.4% feature rounding, ~2x MXU).  Set BEFORE the first jit trace, e.g.
# via occnerf_tpu.ops.set_compute_dtype; per-call override via
# hash_grid_encode_tpu(compute_dtype=...).
COMPUTE_DTYPE = "f32"   # module-default compute mode key (see ops/_dtypes.py)



def supports(spec: HashGridSpec) -> bool:
    """Kernel handles specs whose every level hashes into the same
    power-of-two table size (true for 4-D inputs with capped tables).

    The kernel implements the flagship semantics only — linear
    interpolation, align_corners=False (`_all_hw` hardcodes the
    +0.5 offset and linear fracs): reject the extended gridencoder modes
    so the 'auto' backend routes them to the exact XLA/sorted paths
    instead of silently computing linear features for them."""
    if spec.level_dim != 2 or spec.input_dim > 4:
        return False
    if spec.interpolation != "linear" or spec.align_corners:
        return False
    if spec.log2_hashmap_size > MAX_LOG2:
        return False
    E = 2 ** spec.log2_hashmap_size
    sizes = {spec.offsets[i + 1] - spec.offsets[i]
             for i in range(spec.num_levels)}
    return sizes == {E} and all(spec.use_hash)


def _col(ref, d):
    """Extract lane column d of a (Q, D) block as (Q, 1) float32."""
    lane = jax.lax.broadcasted_iota(jnp.int32, ref.shape, 1)
    return jnp.sum(jnp.where(lane == d, ref[:], 0.0), axis=1,
                   keepdims=True)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _primes_i32(spec):
    out = []
    for d in range(spec.input_dim):
        v = int(_PRIMES[d])
        out.append(v - (1 << 32) if v >= (1 << 31) else v)
    return out


def _all_hw(x_cols, scale, spec, primes, E, q):
    """Lane-batched (hash, weight) for ALL (level, corner) pairs at once:
    two (Q, L*2^D) arrays, lane ``lvl*2^D + ci``.  ``scale`` is the
    (1, L*2^D) per-lane level-scale vector (a kernel input: pallas
    rejects captured array constants).

    The per-corner hash/weight chains on (Q, 1) columns cost the VPU as
    many cycles as full (Q, 128) ops (a one-lane column still occupies
    whole vregs), so evaluating L x 2^D chains separately wastes ~L*2^D
    the cycles — the fwd kernel was measured VPU-bound on exactly this
    (bf16 matmuls only 12% faster than the 3-pass exact-f32 split).
    One (Q, L*2^D)-shaped chain computes every pair in parallel lanes
    with the exact same per-dim op order (pos = x*scale + 0.5, floor,
    frac, +bit, *prime, xor), so results are bitwise identical; the
    corner loop then just extracts its lane."""
    D = spec.input_dim
    n_corners = 1 << D
    CL = spec.num_levels * n_corners
    cl = jax.lax.broadcasted_iota(jnp.int32, (q, CL), 1)
    corner = jax.lax.rem(cl, jnp.int32(n_corners))
    h = jnp.zeros((q, CL), jnp.int32)
    w = None
    for d in range(D):
        pos = x_cols[d] * scale + 0.5                        # (Q, CL)
        g = jnp.floor(pos)
        f = pos - g
        bit = (corner >> d) & 1
        cd = g.astype(jnp.int32) + bit
        h = h ^ (cd * jnp.int32(primes[d]))
        wd = jnp.where(bit == 1, f, 1.0 - f)
        w = wd if w is None else w * wd
    return h & (E - 1), w


def _lane(x, ci, n_lanes):
    """Extract lane ``ci`` of a (Q, n_lanes) array as (Q, 1)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    zero = jnp.zeros((), x.dtype)
    return jnp.sum(jnp.where(lane == ci, x, zero), axis=1, keepdims=True)


def _build_fwd_kernel(spec: HashGridSpec, E: int, n_rows: int,
                      dtk: str = "f32"):
    L = spec.num_levels
    D = spec.input_dim
    n_corners = 1 << D

    def kernel(x_ref, scl_ref, tbl_ref, out_ref):
        x_cols = [_col(x_ref, d) for d in range(D)]
        # out-of-range input -> all-zero features (gridencoder.cu:108-135)
        ok = None
        for d in range(D):
            c = (x_cols[d] >= 0.0) & (x_cols[d] <= 1.0)
            ok = c if ok is None else (ok & c)
        ok = ok.astype(jnp.float32)                     # (Q, 1)

        q = x_ref.shape[0]
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (q, n_rows), 1)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (q, LANES), 1)
        half_iota = lane_iota >> 1                      # entry-pair id
        # entry features sit at lanes (2e, 2e+1): parity separates them
        even = (lane_iota & 1) == 0
        even_f = even.astype(jnp.float32)
        odd_f = 1.0 - even_f

        primes = _primes_i32(spec)
        # one lane-batched hash/weight chain for ALL (level, corner)
        # pairs — bitwise identical to the per-corner chains it replaces
        h_all, w_all = _all_hw(x_cols, scl_ref[:], spec, primes, E, q)
        CL = L * n_corners

        feats = []
        for lvl in range(L):
            tbl = tbl_ref[lvl]

            UNROLL = 4

            def body(cg, accA, lvl=lvl):
                # UNROLL corners per iteration: the fori overhead dominates
                # at 2^D x L x n_blocks iterations otherwise
                for u in range(UNROLL):
                    ci = cg * UNROLL + u
                    h = _lane(h_all, lvl * n_corners + ci, CL)
                    w = _lane(w_all, lvl * n_corners + ci, CL)
                    row = h // 64
                    onehot = row_iota == row
                    # NOTE: Mosaic requires 32-bit matmul accumulators
                    # ('tpu.matmul op Expected matmul acc to be 32-bit'),
                    # so narrowing only affects the inputs; a dot
                    # WITHOUT an explicit schedule silently runs one
                    # bf16 pass even on f32 inputs.  The 0/1 one-hot is
                    # exactly bf16, so exact f32 = a 3-term split of
                    # the table (see _dtypes.mxu_dot_onehot).
                    A = _oh_dot_(onehot, tbl, dtk)
                    # keep only the corner's two feature lanes, weighted;
                    # corners accumulate in ONE (Q, 128) panel and the
                    # final parity reduction separates the two features
                    pair = (half_iota == h % 64).astype(jnp.float32)
                    accA = accA + (w * pair) * A
                return accA

            accA = jax.lax.fori_loop(
                0, n_corners // UNROLL, body,
                jnp.zeros((q, LANES), jnp.float32))
            feats.append(jnp.sum(accA * even_f, axis=1, keepdims=True) * ok)
            feats.append(jnp.sum(accA * odd_f, axis=1, keepdims=True) * ok)
        out_ref[:] = jnp.concatenate(feats, axis=1)

    return kernel


def _build_bwd_kernel(spec: HashGridSpec, E: int, n_rows: int,
                      dtk: str = "f32"):
    L = spec.num_levels
    D = spec.input_dim

    def kernel(x_ref, scl_ref, g_ref, dtbl_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            dtbl_ref[:] = jnp.zeros_like(dtbl_ref)

        x_cols = [_col(x_ref, d) for d in range(D)]
        ok = None
        for d in range(D):
            c = (x_cols[d] >= 0.0) & (x_cols[d] <= 1.0)
            ok = c if ok is None else (ok & c)
        ok = ok.astype(jnp.float32)

        q = x_ref.shape[0]
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (q, n_rows), 1)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (q, LANES), 1)
        half_iota = lane_iota >> 1
        even_f = ((lane_iota & 1) == 0).astype(jnp.float32)
        odd_f = 1.0 - even_f
        g_lane = jax.lax.broadcasted_iota(jnp.int32, g_ref.shape, 1)
        n_corners = 1 << D
        primes = _primes_i32(spec)
        h_all, w_all = _all_hw(x_cols, scl_ref[:], spec, primes, E, q)
        CL = L * n_corners

        for lvl in range(L):
            g0 = jnp.sum(jnp.where(g_lane == 2 * lvl, g_ref[:], 0.0),
                         axis=1, keepdims=True) * ok
            g1 = jnp.sum(jnp.where(g_lane == 2 * lvl + 1, g_ref[:], 0.0),
                         axis=1, keepdims=True) * ok
            # per-level cotangent panel: g0 at even lanes, g1 at odd —
            # per corner the pair mask selects its entry's two lanes
            g01 = even_f * g0 + odd_f * g1               # (q, 128)

            def body(ci, dlvl, lvl=lvl, g01=g01):
                h = _lane(h_all, lvl * n_corners + ci, CL)
                w = _lane(w_all, lvl * n_corners + ci, CL)
                row = h // 64
                onehot = row_iota == row
                pair = (half_iota == h % 64).astype(jnp.float32)
                dA = (w * pair) * g01
                return dlvl + _oh_dot_(onehot, dA, dtk,
                                       transpose_lhs=True)

            dtbl_ref[lvl] += jax.lax.fori_loop(
                0, n_corners, body,
                jnp.zeros((n_rows, LANES), jnp.float32))

    return kernel


def _scales_lanes(spec: HashGridSpec) -> jnp.ndarray:
    """(1, L*2^D) per-lane level scales, lane lvl*2^D + ci."""
    n_corners = 1 << spec.input_dim
    return jnp.asarray(np.repeat(
        np.asarray(spec.scales[:spec.num_levels], np.float32),
        n_corners))[None, :]


def _prep_tables(table: jnp.ndarray, spec: HashGridSpec, E: int
                 ) -> jnp.ndarray:
    """Flat (T, 2) table -> (L, E/64, 128) lane-interleaved per level."""
    L = spec.num_levels
    per = [table[spec.offsets[i]:spec.offsets[i + 1]] for i in range(L)]
    t = jnp.stack(per)                                  # (L, E, 2)
    return t.reshape(L, E // 64, 128)


def _unprep_tables(t: jnp.ndarray, spec: HashGridSpec, E: int,
                   total: int) -> jnp.ndarray:
    L = spec.num_levels
    flat = t.reshape(L, E, 2)
    return flat.reshape(L * E, 2)


def hash_grid_encode_tpu(inputs: jnp.ndarray, table: jnp.ndarray,
                         spec: HashGridSpec,
                         compute_dtype=None) -> jnp.ndarray:
    """MXU hash-grid encode for capped tables.  Inputs get NO gradient
    (call sites must stop-gradient them); the table gets the exact
    scatter-add gradient via transposed one-hot matmuls.

    ``compute_dtype`` overrides the module-default matmul input dtype for
    this call (bfloat16: ~0.4% feature rounding, ~2x MXU — for no-grad
    eval/render paths)."""
    assert supports(spec), "spec not kernel-compatible; use hash_grid_encode"
    dt = COMPUTE_DTYPE if compute_dtype is None else compute_dtype
    shape = inputs.shape[:-1]
    x = inputs.reshape(-1, spec.input_dim).astype(jnp.float32)
    out = _encode(x, table, spec, _dt_key_(dt))
    return out.reshape(shape + (spec.output_dim,))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _encode(x, table, spec, dtk):
    return _encode_fwd(x, table, spec, dtk)[0]


def _encode_fwd(x, table, spec, dtk):
    E = 2 ** spec.log2_hashmap_size
    n_rows = E // 64
    n = x.shape[0]
    pad = (-n) % Q_BLK
    xp = jnp.pad(x, ((0, pad), (0, 0)), constant_values=-10.0)
    nblk = xp.shape[0] // Q_BLK
    tbl = _prep_tables(table, spec, E)
    scl = _scales_lanes(spec)

    out = pl.pallas_call(
        _build_fwd_kernel(spec, E, n_rows, dtk),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((Q_BLK, spec.input_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(scl.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spec.num_levels, n_rows, LANES),
                         lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Q_BLK, spec.output_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], spec.output_dim),
                                       jnp.float32),
        interpret=_interpret(),
    )(xp, scl, tbl)
    return out[:n], (x, table)


def _encode_bwd(spec, dtk, res, g):
    x, table = res
    E = 2 ** spec.log2_hashmap_size
    n_rows = E // 64
    n = x.shape[0]
    pad = (-n) % Q_BLK
    xp = jnp.pad(x, ((0, pad), (0, 0)), constant_values=-10.0)
    gp = jnp.pad(g, ((0, pad), (0, 0)))
    nblk = xp.shape[0] // Q_BLK
    scl = _scales_lanes(spec)

    dtbl = pl.pallas_call(
        _build_bwd_kernel(spec, E, n_rows, dtk),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((Q_BLK, spec.input_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(scl.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q_BLK, spec.output_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((spec.num_levels, n_rows, LANES),
                               lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (spec.num_levels, n_rows, LANES), jnp.float32),
        interpret=_interpret(),
    )(xp, scl, gp)
    dtable = _unprep_tables(dtbl, spec, E, table.shape[0])
    return jnp.zeros_like(x), dtable


_encode.defvjp(_encode_fwd, _encode_bwd)
