#!/usr/bin/env python
"""Eval-path knob gate: same trained weights, different render knobs.

The eval/render path is no-grad, so its knobs (``tpu.eval_sample_
compaction``, ``tpu.eval_chunk``, ``tpu.eval_compute_dtype``) can be
gated directly: re-run the full eval metric stack (``eval.eval_model``)
on ONE fixed trained checkpoint under each arm and diff the metrics.
Unlike a convergence A/B there is no seed noise — any metric delta is
pure render-path rounding/approximation, so ~1e-3 dB resolution is
decision-grade (this is the same dual-eval design that promoted
``eval_compute_dtype bfloat16``, docs/ROADMAP.md round-4 gates).

Point it at a leftover ``ab_compaction.py`` run (its tempdirs persist):

    python benchmarks/eval_knobs.py \
        --subject /tmp/.../subject --logdir /tmp/.../logs \
        --arms "follow,2048,float32;0.25,4096,bfloat16"

Each arm is ``eval_compaction,eval_chunk,eval_dtype[,obs]`` —
compaction ``follow`` keeps the train-side fraction
(eval_sample_compaction=-1); a 4th token ``obs`` turns on
``tpu.obs_rank_proxy`` (baked observation-space ranking volume).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def main() -> None:
    from occnerf_tpu.utils.platform import ensure_platform
    ensure_platform()
    ap = argparse.ArgumentParser()
    ap.add_argument("--subject", required=True,
                    help="synthetic subject dir (make_synthetic_subject)")
    ap.add_argument("--logdir", required=True,
                    help="trained logdir containing latest.ckpt")
    ap.add_argument("--arms", required=True,
                    help="semicolon list of eval_compaction,eval_chunk,"
                         "eval_dtype triples; compaction 'follow' = -1")
    ap.add_argument("--compaction", type=float, default=0.375,
                    help="train-side tpu.sample_compaction the ckpt was "
                         "trained with (the 'follow' arm inherits it)")
    ap.add_argument("--log2", type=int, default=14)
    ap.add_argument("--mlp-depth", type=int, default=4)
    ap.add_argument("--mlp-width", type=int, default=256)
    args = ap.parse_args()

    from occnerf_tpu.config import cfg, get_default_cfg, set_cfg

    c = get_default_cfg()
    c.synthetic_dataset_path = args.subject
    c.canonical_mlp.module = "core.nets.occnerf.canonical_mlps.occnerf_mlp"
    c.canonical_mlp.mlp_depth = args.mlp_depth
    c.canonical_mlp.mlp_width = args.mlp_width
    c.canonical_mlp.log2_hashmap_size = args.log2
    c.pose_decoder.kick_in_iter = 2_000_000
    c.non_rigid_motion_mlp.kick_in_iter = 100_000
    c.tpu.sample_compaction = args.compaction
    c.tpu.motion_rank_proxy = True
    c.movement.dataset = "synthetic_test"
    c.logdir = args.logdir
    c.perturb = 0.0
    c.bgcolor = [255.0, 255.0, 255.0]
    set_cfg(c)

    import eval as eval_entry

    for arm in args.arms.split(";"):
        toks = [t.strip() for t in arm.split(",")]
        ec_s, chunk_s, dtype = toks[:3]
        obs = len(toks) > 3 and toks[3] == "obs"
        ec = -1.0 if ec_s == "follow" else float(ec_s)
        cfg.tpu.eval_sample_compaction = ec
        cfg.tpu.eval_chunk = int(chunk_s)
        cfg.tpu.eval_compute_dtype = dtype
        cfg.tpu.obs_rank_proxy = obs
        t0 = time.time()
        means = eval_entry.eval_model(
            render_folder_name="evalknobs_%s_%s_%s%s" % (
                ec_s, chunk_s, dtype, "_obs" if obs else ""),
            show_truth=False, show_alpha=False)
        means.update({"eval_compaction": ec, "eval_chunk": int(chunk_s),
                      "eval_dtype": dtype, "obs_rank_proxy": obs,
                      "wall_sec": round(time.time() - t0, 1)})
        print("EVALKNOBS_RESULT " + json.dumps(means), flush=True)


if __name__ == "__main__":
    main()
