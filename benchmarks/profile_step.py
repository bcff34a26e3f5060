#!/usr/bin/env python
"""Capture a profiler trace of the flagship train step and print the
per-op self-time summary.

    python benchmarks/profile_step.py [--compaction 0.375] [--steps 5]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir)


def main() -> None:
    from occnerf_tpu.utils.platform import ensure_platform
    ensure_platform()  # honor JAX_PLATFORMS before backend init
    ap = argparse.ArgumentParser()
    ap.add_argument("--compaction", type=float, default=0.5)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import numpy as np
    import jax

    from occnerf_tpu.config import cfg, init_cfg
    from occnerf_tpu.data.synthetic import make_synthetic_subject

    tmp = tempfile.mkdtemp()
    subject_path = os.path.join(tmp, "subject")
    make_synthetic_subject(subject_path, n_frames=4, img_size=512,
                           n_verts=1024, seed=0)

    c = init_cfg(
        os.path.join(REPO, "configs/occnerf/zju_mocap/387/occnerf_tpu.yaml"),
        ["train.dataset", "synthetic_train",
         "synthetic_dataset_path", subject_path,
         "tpu.sample_compaction", str(args.compaction),
         "progress.dump_interval", "1000000000",
         "train.save_checkpt_interval", "1000000000",
         "train.log_interval", "1000000000"])
    c.logdir = os.path.join(tmp, "logs")

    from occnerf_tpu.app import build_model
    from occnerf_tpu.data import create_dataloader
    from occnerf_tpu.train import create_trainer

    loader = create_dataloader("train")
    network, statics, params, state = build_model(loader.dataset.subject)
    trainer = create_trainer(network, statics, params, state)
    it = iter(loader)
    batch = next(it)

    def sync():
        leaf = jax.tree.leaves(trainer.params)[0]
        return float(np.asarray(leaf).ravel()[0])

    trainer.train_step(batch)   # compile
    sync()

    trace_dir = os.path.join(tmp, "trace")
    jax.profiler.start_trace(trace_dir)
    for _ in range(args.steps):
        trainer.train_step(batch)
    sync()
    jax.profiler.stop_trace()

    subprocess.run([sys.executable,
                    os.path.join(REPO, "tools", "summarize_profile.py"),
                    trace_dir, str(args.top), str(args.steps)])


if __name__ == "__main__":
    main()
