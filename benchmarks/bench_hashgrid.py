#!/usr/bin/env python
"""Hash-grid encode backend micro-benchmark at reference scale.

Times forward and forward+backward (table grads) for:
  - pallas  : MXU one-hot kernel (tables <= 2^15), 2^14 geometry
  - sorted  : XLA gather forward + sort/segmented-scan backward, 2^19
  - xla     : XLA gather forward + AD scatter backward, 2^19 (oracle;
              skipped by default — ~14 s/step at this scale)

    python benchmarks/bench_hashgrid.py [--n 393216] [--xla]
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
    for _i in range(5):
        t0 = time.time()
        out = fn(*a)
        leaf = jax.tree.leaves(out)[0]
        _ = float(np.asarray(leaf).ravel()[0])
        times.append(time.time() - t0)
    return float(np.median(times))


def main() -> None:
    from occnerf_tpu.utils.platform import ensure_platform
    ensure_platform()  # honor JAX_PLATFORMS before backend init
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=393_216,
                    help="samples (786k raw; ~393k at compaction 0.5)")
    ap.add_argument("--xla", action="store_true",
                    help="also time the AD scatter backward at 2^19")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from occnerf_tpu.ops import hashgrid_pallas
    from occnerf_tpu.ops.hashgrid import (HashGridSpec, hash_grid_encode,
                                          hash_grid_encode_sorted)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (args.n, 4)).astype(np.float32))

    def arms():
        # only on TPU: off-TPU the pallas kernel can't run and a silent
        # substitution would print misleading backend timings (ADVICE r2)
        if jax.default_backend() == "tpu":
            yield ("pallas-2^14-f32", 14,
                   lambda x, t, s: hashgrid_pallas.hash_grid_encode_tpu(
                       x, t, s, compute_dtype=jnp.float32))
            yield ("pallas-2^14-bf16", 14,
                   lambda x, t, s: hashgrid_pallas.hash_grid_encode_tpu(
                       x, t, s, compute_dtype=jnp.bfloat16))
        else:
            print("# pallas-2^14 arms skipped: backend is "
                  f"{jax.default_backend()!r}, not tpu")
        yield ("sorted-2^19", 19, hash_grid_encode_sorted)
        if args.xla:
            yield ("xla-ad-2^19", 19, hash_grid_encode)

    for name, log2, enc in arms():
        spec = HashGridSpec.create(
            input_dim=4, num_levels=16, level_dim=2, base_resolution=16,
            log2_hashmap_size=log2, desired_resolution=2048)
        table = spec.init_table(jax.random.PRNGKey(0))

        # reduce to a SCALAR on device: the axon device->host tunnel is
        # ~MB/s, so fetching even one element of a (N, 32) output drags
        # the whole buffer across and times the transfer, not the kernel
        fwd = jax.jit(lambda xx, t, enc=enc, spec=spec:
                      jnp.sum(enc(xx, t, spec)))
        t_fwd = _time(fwd, x, table)
        print(f"{name}: table {spec.table_size} rows | "
              f"fwd {t_fwd*1e3:.0f} ms ({args.n} samples)", flush=True)

        bwd = jax.jit(lambda t, xx, enc=enc, spec=spec: jnp.sum(jax.grad(
            lambda tt: jnp.sum(enc(xx, tt, spec) ** 2))(t) ** 2))
        t_bwd = _time(bwd, table, x)
        print(f"{name}: table {spec.table_size} rows | "
              f"fwd+bwd {t_bwd*1e3:.0f} ms ({args.n} samples)", flush=True)


if __name__ == "__main__":
    main()
