#!/usr/bin/env python
"""Capture a profiler trace of the flagship train step and summarize it.

Same workload as bench.py (the SHIPPED TPU recipe,
configs/occnerf/zju_mocap/387/occnerf_tpu.yaml at the reference's
6x32x32x128 per-iteration geometry), but wraps N post-compile steps in
``jax.profiler.start_trace`` and prints the per-op self-time table via
tools/summarize_profile.py.

Usage: python benchmarks/profile_train.py [--steps 5] [--out DIR]
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
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--out", default="")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--n-verts", type=int, default=1024,
                    help="synthetic subject vertex count (6890 = the "
                         "reference-scale headline geometry)")
    ap.add_argument("opts", nargs="*",
                    help="extra 'key value' config overrides, as bench.py")
    args = ap.parse_args()

    import jax

    from occnerf_tpu.config import init_cfg
    from occnerf_tpu.data.synthetic import make_synthetic_subject

    tmp = tempfile.mkdtemp()
    subject_path = os.path.join(tmp, "subject")
    make_synthetic_subject(subject_path, n_frames=4, img_size=512,
                           n_verts=args.n_verts, seed=0)
    c = init_cfg("configs/occnerf/zju_mocap/387/occnerf_tpu.yaml", [
        "train.dataset", "synthetic_train",
        "synthetic_dataset_path", subject_path,
        "progress.dump_interval", "1000000000",
        "train.save_checkpt_interval", "1000000000",
        # sync init save: an async writer would stream ~780 MB through
        # the slow device->host tunnel DURING the timed region and
        # contend with the per-step scalar fetches
        "tpu.async_checkpoint", "False",
        "train.log_interval", "1000000000",
    ] + args.opts)
    c.logdir = os.path.join(tmp, "logs")

    from occnerf_tpu.app import build_model
    from occnerf_tpu.data import create_dataloader
    from occnerf_tpu.train import create_trainer

    loader = create_dataloader("train")
    network, statics, params, state = build_model(loader.dataset.subject)
    trainer = create_trainer(network, statics, params, state)

    batches = []
    it = iter(loader)
    for _ in range(2):
        batches.append(next(it))

    def _sync():
        import numpy as _np
        leaf = jax.tree.leaves(trainer.params)[0]
        return float(_np.asarray(leaf).ravel()[0])

    trainer.train_step(batches[0])
    _sync()

    trace_dir = args.out or os.path.join(tmp, "trace")
    jax.profiler.start_trace(trace_dir)
    for i in range(args.steps):
        trainer.train_step(batches[i % len(batches)])
    _sync()
    jax.profiler.stop_trace()
    print(f"# trace written to {trace_dir}", flush=True)

    here = os.path.dirname(os.path.abspath(__file__))
    subprocess.run([sys.executable,
                    os.path.join(here, os.pardir, "tools",
                                 "summarize_profile.py"),
                    trace_dir, str(args.top), str(args.steps)], check=False)


if __name__ == "__main__":
    main()
