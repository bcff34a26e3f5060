#!/usr/bin/env python
"""Capture a profiler trace of the eval/render path and summarize it.

Same workload as benchmarks/bench_render.py (512x512 tpose camera,
flagship OccNeRF MLP, no gradients — the inference half of the
BASELINE.json north star), wrapping N post-compile renders in
``jax.profiler.start_trace`` and printing the per-op self-time table via
tools/summarize_profile.py.

Usage: python benchmarks/profile_render.py [--steps 3] [--out DIR]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def main() -> None:
    from occnerf_tpu.utils.platform import ensure_platform
    ensure_platform()  # honor JAX_PLATFORMS before backend init
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default="")
    ap.add_argument("--top", type=int, default=25)
    # defaults = the shipped TPU overlay knobs
    # (configs/occnerf/zju_mocap/387/occnerf_tpu.yaml)
    ap.add_argument("--eval-chunk", type=int, default=2048)
    ap.add_argument("--compaction", type=float, default=0.375)
    ap.add_argument("--eval-compaction", type=float, default=0.25)
    ap.add_argument("--proxy", type=int, default=1,
                    help="tpu.motion_rank_proxy")
    ap.add_argument("--eval-dtype", default="bfloat16",
                    choices=("float32", "bfloat16"))
    ap.add_argument("--rank-dtype", default="bfloat16",
                    choices=("float32", "bfloat16"))
    ap.add_argument("--compute-dtype", default="bfloat16",
                    choices=("float32", "tfloat32", "bfloat16"))
    ap.add_argument("--n-verts", type=int, default=6890,
                    help="6890 = reference-scale SMPL cloud")
    args = ap.parse_args()

    import jax

    from occnerf_tpu.config import get_default_cfg, set_cfg
    from occnerf_tpu.data.synthetic import make_synthetic_subject

    tmp = tempfile.mkdtemp()
    subject_path = os.path.join(tmp, "subject")
    make_synthetic_subject(subject_path, n_frames=2, img_size=512,
                           n_verts=args.n_verts, seed=0)

    c = get_default_cfg()
    c.synthetic_dataset_path = subject_path
    c.canonical_mlp.module = "core.nets.occnerf.canonical_mlps.occnerf_mlp"
    c.canonical_mlp.mlp_depth = 4
    c.canonical_mlp.log2_hashmap_size = 14
    c.tpu.sample_compaction = args.compaction
    c.tpu.eval_sample_compaction = args.eval_compaction
    c.tpu.motion_rank_proxy = bool(args.proxy)
    c.tpu.eval_chunk = args.eval_chunk
    c.tpu.eval_compute_dtype = args.eval_dtype
    c.tpu.rank_compute_dtype = args.rank_dtype
    c.tpu.compute_dtype = args.compute_dtype
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

    trace_dir = args.out or os.path.join(tmp, "trace")
    jax.profiler.start_trace(trace_dir)
    for _i in range(args.steps):
        rgb = render(params, state, dbatch)
        _ = float(rgb[123, 1])
    jax.profiler.stop_trace()
    print(f"# {n_rays} rays; trace written to {trace_dir}", flush=True)

    here = os.path.dirname(os.path.abspath(__file__))
    subprocess.run([sys.executable,
                    os.path.join(here, os.pardir, "tools",
                                 "summarize_profile.py"),
                    trace_dir, str(args.top), str(args.steps)], check=False)


if __name__ == "__main__":
    main()
