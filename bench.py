#!/usr/bin/env python
"""Benchmark: training-step throughput at the reference's per-iteration
workload on one TPU chip.

Workload per step (BASELINE.md "work per train iter"): 6 patches x 32x32
rays x 128 samples = 786,432 point queries through the full OccNeRF
pipeline — inverse-LBS motion field, multiscale KNN, hash-grid canonical
MLP, volume compositing, LPIPS+MSE+completeness loss, clipped Adam update.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` compares PER-DEVICE rates (the metric is rays/s/chip):
the reference finishes its 100k-iteration recipe in ~12.5h on a
4x2080Ti rig (no number is published — BASELINE.md), i.e. ~2.2 iter/s
for the rig and ~0.55 iter/s per GPU; this anchor is an estimate.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import jax

    from occnerf_tpu.config import get_default_cfg, set_cfg
    from occnerf_tpu.data.synthetic import make_synthetic_subject

    tmp = tempfile.mkdtemp()
    subject_path = os.path.join(tmp, "subject")
    make_synthetic_subject(subject_path, n_frames=4, img_size=512,
                           n_verts=1024, seed=0)

    c = get_default_cfg()
    c.synthetic_dataset_path = subject_path
    # flagship model at reference scale; the 2^14 hash cap selects the MXU
    # one-hot encoder kernel (the 2^19 XLA gather path costs ~15 s/step)
    c.canonical_mlp.module = "core.nets.occnerf.canonical_mlps.occnerf_mlp"
    c.canonical_mlp.mlp_depth = 4
    c.canonical_mlp.mlp_width = 256
    c.canonical_mlp.log2_hashmap_size = 14
    # shipped 387 recipe: pose refiner kicked in far past maxiter
    # (configs/occnerf/zju_mocap/387/occnerf.yaml:32-33)
    c.pose_decoder.kick_in_iter = 2_000_000
    c.non_rigid_motion_mlp.kick_in_iter = 100_000
    # occupancy-guided sample compaction: query the canonical MLP for the
    # top-half of samples by foreground likelihood (the rest carry
    # ~0 alpha through the reference's own mask multiply); A/B'd for
    # convergence parity on the synthetic subject (docs/ROADMAP.md)
    c.tpu.sample_compaction = 0.5
    c.tpu.train_chunk = 512     # swept 256/512/1024/2048: 512 is fastest
    c.logdir = os.path.join(tmp, "logs")
    c.progress.dump_interval = 10 ** 9
    c.train.save_checkpt_interval = 10 ** 9
    c.train.log_interval = 10 ** 9
    set_cfg(c)

    from occnerf_tpu.app import build_model
    from occnerf_tpu.data import create_dataloader
    from occnerf_tpu.train import create_trainer

    loader = create_dataloader("train")
    network, statics, params, state = build_model(loader.dataset.subject)
    trainer = create_trainer(network, statics, params, state)

    batches = []
    it = iter(loader)
    for _ in range(4):
        batches.append(next(it))

    # compile + warmup
    trainer.train_step(batches[0])
    jax.block_until_ready(trainer.params)

    n_iters = 20
    t0 = time.time()
    for i in range(n_iters):
        trainer.train_step(batches[i % len(batches)])
    jax.block_until_ready(trainer.params)
    dt = (time.time() - t0) / n_iters

    rays = c.patch.N_patches * c.patch.size ** 2
    rays_per_s = rays / dt
    iters_per_s = 1.0 / dt
    # per-DEVICE anchor: ~2.2 iter/s estimated for the reference's
    # 4x2080Ti rig -> ~0.55 iter/s per GPU (see docstring); the metric
    # compares one v5e chip against one reference GPU
    baseline_iters_per_s = 2.2 / 4.0

    print(json.dumps({
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_s, 1),
        "unit": "rays/s (6x32x32 patches x 128 samples, full train step)",
        "vs_baseline": round(iters_per_s / baseline_iters_per_s, 3),
    }))


if __name__ == "__main__":
    main()
