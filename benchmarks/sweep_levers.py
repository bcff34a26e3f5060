#!/usr/bin/env python
"""Throughput sweep of the built-but-unpromoted TPU levers (VERDICT r3 #2).

Measures the shipped-recipe train step (and optionally the no-grad
render) at the reference-scale 6,890-vert subject for each lever arm,
reusing ``bench._measure_arm`` so the numbers are directly comparable to
the BENCH headline.  One JSON line per arm:

    python benchmarks/sweep_levers.py            # default arm set
    python benchmarks/sweep_levers.py --render   # include render timing

Quality gates for any promotion live in ``ab_compaction.py`` (the
convergence A/B harness grew --rank-dtype/--eval-dtype/--knn-recall
arms); this script is throughput-only.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

ARMS = [
    ("baseline", []),
    ("rank_bf16", ["tpu.rank_compute_dtype", "bfloat16"]),
    ("recall_0.85", ["tpu.knn_recall", "0.85"]),
    ("compute_tf32", ["tpu.compute_dtype", "tfloat32"]),
    ("compute_bf16", ["tpu.compute_dtype", "bfloat16"]),
    ("eval_bf16", ["tpu.eval_compute_dtype", "bfloat16"]),
    ("xla_tf32", ["tpu.xla_matmul_precision", "tensorfloat32"]),
    ("combo", ["tpu.rank_compute_dtype", "bfloat16",
               "tpu.knn_recall", "0.85",
               "tpu.compute_dtype", "tfloat32",
               "tpu.eval_compute_dtype", "bfloat16"]),
]


def main() -> None:
    from occnerf_tpu.utils.platform import ensure_platform
    ensure_platform()

    ap = argparse.ArgumentParser()
    ap.add_argument("--render", action="store_true",
                    help="measure the no-grad render path per arm")
    ap.add_argument("--n-verts", type=int, default=6890)
    ap.add_argument("--arms", type=str, default="",
                    help="comma list of arm names to run (default: all)")
    args = ap.parse_args()

    import bench
    from occnerf_tpu.data.synthetic import make_synthetic_subject

    subj = os.path.join(tempfile.mkdtemp(), f"subject_{args.n_verts}")
    make_synthetic_subject(subj, n_frames=4, img_size=512,
                           n_verts=args.n_verts, seed=0)

    want = set(a for a in args.arms.split(",") if a)
    for name, opts in ARMS:
        if want and name not in want:
            continue
        res = bench._measure_arm(subj, opts, measure_render=args.render)
        res["arm"] = name
        print("SWEEP_RESULT " + json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
