#!/usr/bin/env python
"""KNN backend micro-benchmark.

The TPU-native counterpart of the reference's root-level `test_knn.py`
(which timed five CUDA KNN candidates on SMPL-vertex queries and justified
the PyKeOps choice).  Here the candidates are the two TPU formulations of
the brute-force distance matmul: exact ``lax.top_k`` vs the TPU-native
partial-reduction ``lax.approx_max_k``, at the production shapes (queries
= ray samples, candidates = 6890 SMPL verts + 3 FPS levels).

Usage: python benchmarks/bench_knn.py [n_queries]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main() -> None:
    from occnerf_tpu.utils.platform import ensure_platform
    ensure_platform()  # honor JAX_PLATFORMS before backend init
    from occnerf_tpu.ops.knn import knn, multiscale_knn
    from occnerf_tpu.utils.mesh import multiscale_fps_indices

    n_queries = int(sys.argv[1]) if len(sys.argv) > 1 else 786_432
    rng = np.random.default_rng(0)
    verts = jnp.asarray(rng.normal(0, 0.3, (6890, 3)).astype(np.float32))
    queries = jnp.asarray(
        rng.normal(0, 0.4, (n_queries, 3)).astype(np.float32))
    fps_idx = [jnp.asarray(i, jnp.int32) for i in
               multiscale_fps_indices(np.asarray(verts), levels=3)]

    for backend in ("exact", "approx"):
        f = jax.jit(lambda q, backend=backend: multiscale_knn(
            q, verts, fps_idx, k=10, backend=backend))
        out = f(queries)
        _ = int(out[0, 0, 0])  # force completion through a host fetch
        times = []
        for _i in range(5):
            t0 = time.time()
            out = f(queries)
            _ = int(out[123, 3, 9])
            times.append(time.time() - t0)
        dt = float(np.median(times))
        print(f"multiscale_knn[{backend}]: {dt * 1000:.1f} ms "
              f"({n_queries / dt / 1e6:.1f} M queries/s, 4 scales, k=10)")

    # recall of approx vs exact (distances, not indices — tie order
    # differs, SURVEY.md hard-part #5)
    d_e, _ = knn(queries[:8192], verts, 10, backend="exact")
    d_a, _ = knn(queries[:8192], verts, 10, backend="approx")
    recall = float(jnp.mean(jnp.isclose(d_e, d_a, atol=1e-5)))
    print(f"approx distance recall@10: {recall:.4f}")


if __name__ == "__main__":
    main()
