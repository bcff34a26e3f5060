#!/usr/bin/env python
"""Sample-compaction convergence A/B at flagship scale.

Trains the flagship OccNeRF recipe for a fixed iteration budget at each
``tpu.sample_compaction`` arm on a synthetic subject, then runs the full
eval metric stack (PSNR/SSIM per region + IoU) on the held-out split and
prints one JSON line per arm.  Used to validate compaction promotions on
additional subjects (docs/ROADMAP.md records the results).

    python benchmarks/ab_compaction.py --seed 1 --iters 300 \
        --arms 1.0,0.5,0.375
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def run_arm(subject_path: str, compaction: float, iters: int,
            seed: int, log2_hashmap: int = 14,
            rank_dtype: str = "float32",
            eval_dtype: str = "float32",
            knn_recall: float = 0.95,
            compute_dtype: str = "float32",
            lpips_weight: float | None = None,
            proxy: bool = False,
            eval_both: bool = False,
            eval_compaction: float | None = None) -> dict:
    import numpy as np

    from occnerf_tpu.config import cfg, get_default_cfg, set_cfg

    tmp = tempfile.mkdtemp()
    c = get_default_cfg()
    c.synthetic_dataset_path = subject_path
    c.canonical_mlp.module = "core.nets.occnerf.canonical_mlps.occnerf_mlp"
    c.canonical_mlp.mlp_depth = 4
    c.canonical_mlp.mlp_width = 256
    c.canonical_mlp.log2_hashmap_size = log2_hashmap
    c.pose_decoder.kick_in_iter = 2_000_000
    c.non_rigid_motion_mlp.kick_in_iter = 100_000
    c.tpu.sample_compaction = compaction
    c.tpu.motion_rank_proxy = proxy
    c.tpu.rank_compute_dtype = rank_dtype
    c.tpu.eval_compute_dtype = eval_dtype
    c.tpu.knn_recall = knn_recall
    c.tpu.compute_dtype = compute_dtype
    if lpips_weight is not None:
        c.train.lossweights.lpips = lpips_weight
    c.tpu.train_chunk = 512
    c.train.maxiter = iters
    c.train.log_interval = 100
    c.train.save_checkpt_interval = 10 ** 9
    c.progress.dump_interval = 10 ** 9
    c.movement.dataset = "synthetic_test"
    c.logdir = os.path.join(tmp, "logs")
    set_cfg(c)

    from occnerf_tpu.app import build_model
    from occnerf_tpu.data import create_dataloader
    from occnerf_tpu.train import create_trainer

    loader = create_dataloader("train")
    network, statics, params, state = build_model(loader.dataset.subject)
    trainer = create_trainer(network, statics, params, state)

    t0 = time.time()
    n_timed = 0
    while trainer.iter <= iters:
        done = trainer.train(0, loader)
        if done:
            break
    import jax
    jax.block_until_ready(trainer.params)
    wall = time.time() - t0

    # eval with the trained params (full eval.py metric stack).  The
    # metric render always runs EXACT f32 kernels regardless of the
    # arm's training dtype — the A/B measures TRAINING quality, and
    # eval_model rebuilds the network from cfg, so a bf16 train arm
    # would otherwise also render its metrics in bf16 and conflate
    # eval-render rounding with training-quality loss (round-4 gates
    # hit exactly this).  Pass eval_both=True to also measure the pure
    # eval-rounding delta on the same trained weights.
    cfg.perturb = 0.0
    cfg.bgcolor = [255.0, 255.0, 255.0]
    trainer.save_ckpt("latest")
    cfg.tpu.compute_dtype = "float32"
    cfg.tpu.eval_compute_dtype = "float32"
    if eval_compaction is not None:
        # metric-eval wall-time lever only: the eval-knob gate (fixed
        # checkpoint, docs/ROADMAP.md) measured eval_sample_compaction
        # 0.25 metric-neutral to ~3e-5 dB (every swept arm <= ~1e-4),
        # far below any gate's decision threshold — and it applies
        # identically to every arm.
        cfg.tpu.eval_sample_compaction = eval_compaction
    import eval as eval_entry
    means = eval_entry.eval_model(render_folder_name=f"ab_{compaction}")
    meta = {"compaction": compaction, "iters": iters, "seed": seed,
            "log2_hashmap": log2_hashmap,
            "rank_dtype": rank_dtype, "eval_dtype": eval_dtype,
            "knn_recall": knn_recall, "compute_dtype": compute_dtype,
            "lpips_weight": lpips_weight, "proxy": proxy,
            "eval_compaction": eval_compaction,
            "wall_sec": round(wall, 1),
            "sec_per_iter": round(wall / max(iters, 1), 3)}
    means.update(meta)
    if eval_both:
        cfg.tpu.eval_compute_dtype = "bfloat16"
        bf = eval_entry.eval_model(render_folder_name=f"ab_{compaction}_bf16")
        bf.update(meta)
        bf["eval_pass"] = "bfloat16"
        print("AB_RESULT " + json.dumps(bf), flush=True)
        cfg.tpu.eval_compute_dtype = "float32"
    return means


def main() -> None:
    from occnerf_tpu.utils.platform import ensure_platform
    ensure_platform()  # honor JAX_PLATFORMS before backend init
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=1,
                    help="synthetic-subject geometry seed")
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--arms", type=str, default="1.0,0.5,0.375")
    ap.add_argument("--log2", type=str, default="14",
                    help="comma list of log2_hashmap_size arms (e.g. "
                         "'14,19' to A/B the reference-exact 2^19 "
                         "geometry against the MXU-capped 2^14)")
    ap.add_argument("--proxy", action="store_true",
                    help="tpu.motion_rank_proxy for every arm")
    ap.add_argument("--rank-dtype", default="float32",
                    choices=("float32", "bfloat16"),
                    help="tpu.rank_compute_dtype for every arm")
    ap.add_argument("--eval-dtype", default="float32",
                    choices=("float32", "bfloat16"),
                    help="tpu.eval_compute_dtype for every arm")
    ap.add_argument("--knn-recall", type=float, default=0.95,
                    help="tpu.knn_recall for every arm")
    ap.add_argument("--compute-dtype", default="float32",
                    choices=("float32", "tfloat32", "bfloat16"),
                    help="tpu.compute_dtype for every arm")
    ap.add_argument("--lpips-weight", type=float, default=None,
                    help="override train.lossweights.lpips (0 = pure "
                         "MSE+completeness loss-robustness check)")
    ap.add_argument("--eval-both", action="store_true",
                    help="after the exact-f32 metric eval, re-evaluate "
                         "the same trained weights with eval_compute_"
                         "dtype=bfloat16 (second AB_RESULT line, "
                         "eval_pass=bfloat16) — isolates eval-render "
                         "rounding from training quality")
    ap.add_argument("--eval-compaction", type=float, default=None,
                    help="tpu.eval_sample_compaction for the metric "
                         "eval pass only (0.25 is measured metric-"
                         "neutral; cuts eval wall ~27%%)")
    ap.add_argument("--n-verts", type=int, default=1024)
    ap.add_argument("--texture-freq", type=float, default=7.0,
                    help="synthetic texture spatial frequency (>= 50 "
                         "stresses hash-table collisions)")
    ap.add_argument("--img-size", type=int, default=512)
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()

    from occnerf_tpu.data.synthetic import make_synthetic_subject
    subject_path = os.path.join(tempfile.mkdtemp(), "subject")
    make_synthetic_subject(subject_path, n_frames=args.frames,
                           img_size=args.img_size, n_verts=args.n_verts,
                           seed=args.seed, texture_freq=args.texture_freq)

    for log2 in [int(a) for a in args.log2.split(",")]:
        for arm in [float(a) for a in args.arms.split(",")]:
            res = run_arm(subject_path, arm, args.iters, args.seed,
                          log2_hashmap=log2,
                          rank_dtype=args.rank_dtype,
                          eval_dtype=args.eval_dtype,
                          knn_recall=args.knn_recall,
                          compute_dtype=args.compute_dtype,
                          lpips_weight=args.lpips_weight,
                          proxy=args.proxy,
                          eval_both=args.eval_both,
                          eval_compaction=args.eval_compaction)
            print("AB_RESULT " + json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
