#!/usr/bin/env python
"""Stage breakdown of the sorted 2^19 hash-grid backward.

The full fwd+bwd at reference-flagship geometry (2^19, L=16, D=4,
N=393k -> M=6.3M pairs/level) measured ~5 s; this isolates the stages
so optimization effort lands on the real bottleneck:

  corner   : recompute per-level corner indices + weights (fwd-like)
  sort     : batched (L, M) lax.sort, 1 i32 key + C f32 payloads
  sort_k   : same sort, key only (payload traffic share)
  scan     : segmented inclusive associative_scan over (L, M, C)
  bounds   : vmapped searchsorted (hmax+1 queries) + boundary gather

    python benchmarks/prof_sorted_bwd.py [--n 393216] [--log2 19]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np  # noqa: E402


def _time(fn, *a):
    import jax
    out = fn(*a)
    leaf = jax.tree.leaves(out)[0]
    _ = float(np.asarray(leaf).ravel()[0])   # force (block_until_ready lies)
    times = []
    for _i in range(3):
        t0 = time.time()
        out = fn(*a)
        leaf = jax.tree.leaves(out)[0]
        _ = float(np.asarray(leaf).ravel()[0])
        times.append(time.time() - t0)
    return float(np.median(times))


def main() -> None:
    from occnerf_tpu.utils.platform import ensure_platform
    ensure_platform()
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=393_216)
    ap.add_argument("--log2", type=int, default=19)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from occnerf_tpu.ops.hashgrid import (HashGridSpec, _level_corner_indices,
                                          _segmented_sums)

    spec = HashGridSpec.create(
        input_dim=4, num_levels=16, level_dim=2, base_resolution=16,
        log2_hashmap_size=args.log2, desired_resolution=2048)
    L, C = spec.num_levels, spec.level_dim
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (args.n, 4)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((args.n, L * C)).astype(np.float32))

    def corners(x, g):
        keys, vals = [], []
        for lvl in range(L):
            idx, w = _level_corner_indices(x, spec, lvl)
            g_lvl = g[:, lvl * C:(lvl + 1) * C]
            keys.append(idx.reshape(-1))
            vals.append((w[..., None] * g_lvl[None]).reshape(-1, C))
        return jnp.stack(keys), jnp.stack(vals)

    keys, vals = jax.jit(corners)(x, g)
    keys = jax.block_until_ready(keys)
    M = keys.shape[1]
    print(f"geometry: L={L} M={M} C={C} table={spec.table_size}", flush=True)

    t = _time(jax.jit(lambda x, g: jnp.sum(corners(x, g)[1])), x, g)
    print(f"corner  : {t*1e3:7.0f} ms", flush=True)

    def full_sort(keys, vals):
        k, *cols = jax.lax.sort(
            (keys, *(vals[..., c] for c in range(C))), num_keys=1)
        return k[0, 0] + cols[0][0, 0]
    print(f"sort    : {_time(jax.jit(full_sort), keys, vals)*1e3:7.0f} ms",
          flush=True)

    def key_sort(keys):
        (k,) = jax.lax.sort((keys,), num_keys=1)
        return k[0, 0]
    print(f"sort_k  : {_time(jax.jit(key_sort), keys)*1e3:7.0f} ms",
          flush=True)

    def iota_sort(keys):
        n = jax.lax.broadcasted_iota(jnp.int32, keys.shape, 1)
        k, perm = jax.lax.sort((keys, n), num_keys=1)
        return k[0, 0] + perm[0, 0]
    print(f"sort_ki : {_time(jax.jit(iota_sort), keys)*1e3:7.0f} ms",
          flush=True)

    hsizes = [spec.offsets[l + 1] - spec.offsets[l] for l in range(L)]
    hmax = max(hsizes)
    keys_s, *cols = jax.jit(lambda k, v: jax.lax.sort(
        (k, *(v[..., c] for c in range(C))), num_keys=1))(keys, vals)
    vals_s = jnp.stack(cols, axis=-1)
    keys_s, vals_s = map(jax.block_until_ready, (keys_s, vals_s))

    from occnerf_tpu.ops.hashgrid import _seg_inclusive_scan

    def scan_only(keys, vals):
        start = jnp.concatenate(
            [jnp.ones((L, 1), bool), keys[:, 1:] != keys[:, :-1]], axis=1)
        return jnp.sum(_seg_inclusive_scan(start, vals)[:, -1])
    print(f"scan    : {_time(jax.jit(scan_only), keys_s, vals_s)*1e3:7.0f} ms",
          flush=True)

    def bounds_only(keys):
        b = jax.vmap(lambda k: jnp.searchsorted(
            k, jnp.arange(hmax + 1), method="sort"))(keys)
        return jnp.sum(b[:, -1])
    print(f"bounds  : {_time(jax.jit(bounds_only), keys_s)*1e3:7.0f} ms",
          flush=True)

    def seg_full(keys, vals):
        seg = jax.vmap(lambda k, v: _segmented_sums(k, v, hmax))(keys, vals)
        return jnp.sum(seg)
    print(f"seg_full: {_time(jax.jit(seg_full), keys_s, vals_s)*1e3:7.0f} ms "
          "(scan + bounds + gather)", flush=True)


if __name__ == "__main__":
    main()
