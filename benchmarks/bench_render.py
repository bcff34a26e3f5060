#!/usr/bin/env python
"""Render throughput benchmark: rays/sec at the t-pose camera geometry.

The BASELINE.json north-star's second metric: inference rays/sec/chip at a
512x512 render (the tpose camera, `core/data/occnerf/tpose.py:22-25`),
flagship OccNeRF MLP, no gradients.

Usage: python benchmarks/bench_render.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np  # noqa: E402


def main() -> None:
    from occnerf_tpu.utils.platform import ensure_platform
    ensure_platform()  # honor JAX_PLATFORMS before backend init
    import jax

    from occnerf_tpu.config import get_default_cfg, set_cfg
    from occnerf_tpu.data.synthetic import make_synthetic_subject

    tmp = tempfile.mkdtemp()
    subject_path = os.path.join(tmp, "subject")
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--eval-chunk", type=int, default=2048,
                    help="rays per render chunk (tpu.eval_chunk)")
    ap.add_argument("--compaction", type=float, default=0.375)
    ap.add_argument("--eval-compaction", type=float, default=None,
                    help="eval-path compaction fraction "
                         "(tpu.eval_sample_compaction; default: follow "
                         "--compaction)")
    ap.add_argument("--eval-dtype", default="float32",
                    choices=("float32", "tfloat32", "bfloat16"),
                    help="matmul compute mode of the no-grad eval path "
                         "(tpu.eval_compute_dtype)")
    ap.add_argument("--rank-dtype", default="float32",
                    choices=("float32", "tfloat32", "bfloat16"),
                    help="tpu.rank_compute_dtype")
    ap.add_argument("--compute-dtype", default="float32",
                    choices=("float32", "tfloat32", "bfloat16"),
                    help="tpu.compute_dtype (train-pass kernels)")
    ap.add_argument("--proxy", action="store_true",
                    help="rank compaction with the half-res upper-bound "
                         "volume (tpu.motion_rank_proxy)")
    ap.add_argument("--obs-proxy", action="store_true",
                    help="bake the ranking bound into one obs-space "
                         "volume per frame (tpu.obs_rank_proxy; needs "
                         "--proxy)")
    ap.add_argument("--knn-recall", type=float, default=0.95,
                    help="approx_max_k recall target (tpu.knn_recall)")
    ap.add_argument("--n-verts", type=int, default=1024,
                    help="6890 = reference-scale SMPL cloud")
    ap.add_argument("--dump", default=None, metavar="OUT.npy",
                    help="save the rendered rgb rays to OUT.npy so arms "
                         "(e.g. bf16 vs f32) can be diffed for quality")
    args = ap.parse_args()

    make_synthetic_subject(subject_path, n_frames=2, img_size=512,
                           n_verts=args.n_verts, seed=0)

    c = get_default_cfg()
    c.synthetic_dataset_path = subject_path
    c.canonical_mlp.module = "core.nets.occnerf.canonical_mlps.occnerf_mlp"
    c.canonical_mlp.mlp_depth = 4
    c.canonical_mlp.log2_hashmap_size = 14
    # recommended TPU configuration (see bench.py / docs/ROADMAP.md)
    c.tpu.sample_compaction = args.compaction
    if args.eval_compaction is not None:
        c.tpu.eval_sample_compaction = args.eval_compaction
    c.tpu.eval_chunk = args.eval_chunk
    c.tpu.eval_compute_dtype = args.eval_dtype
    c.tpu.rank_compute_dtype = args.rank_dtype
    c.tpu.compute_dtype = args.compute_dtype
    c.tpu.motion_rank_proxy = args.proxy
    c.tpu.obs_rank_proxy = args.obs_proxy
    c.tpu.knn_recall = args.knn_recall
    c.logdir = os.path.join(tmp, "logs")
    set_cfg(c)

    from occnerf_tpu.app import build_model
    from occnerf_tpu.data import create_dataset
    from occnerf_tpu.train.trainer import _device_batch

    ds = create_dataset("tpose")
    network, statics, params, state = build_model(ds.subject)

    batch = ds[0]
    n_rays = batch["rays"].shape[1]

    @jax.jit
    def render(params, state, batch):
        out, _ = network.forward(params, statics, state, batch, 1e7,
                                 training=False, perturb=0.0,
                                 ignore_non_rigid=True)
        return out["rgb"]

    dbatch = _device_batch(batch)
    rgb = render(params, state, dbatch)
    _ = float(rgb[0, 0])  # force completion (block_until_ready lies here)

    times = []
    for _i in range(5):
        t0 = time.time()
        rgb = render(params, state, dbatch)
        _ = float(rgb[123, 1])
        times.append(time.time() - t0)
    dt = float(np.median(times))
    print(f"render {n_rays} rays x {c.N_samples} samples: "
          f"{dt * 1000:.0f} ms -> {n_rays / dt:.0f} rays/s/chip "
          f"(512x512 tpose camera, occnerf MLP, eval_chunk "
          f"{args.eval_chunk}, compaction {args.compaction}, "
          f"eval_compaction {args.eval_compaction}, "
          f"eval_dtype {args.eval_dtype}, proxy {args.proxy}, "
          f"obs_proxy {args.obs_proxy}, knn_recall {args.knn_recall})")
    if args.dump:
        np.save(args.dump, np.asarray(rgb, dtype=np.float32))
        print(f"rgb dumped to {args.dump}")


if __name__ == "__main__":
    main()
