"""End-to-end CLI integration: train -> render -> evaluate in-process on
the tiny synthetic config (the reference's de-facto smoke path)."""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def workdir(tmp_path_factory, monkeypatch=None):
    from occnerf_tpu.data.synthetic import make_synthetic_subject
    root = tmp_path_factory.mktemp("cli")
    make_synthetic_subject(str(root / "dataset" / "synthetic" / "subject"),
                           n_frames=3, img_size=64, n_verts=128, seed=0)
    return root


def _chdir(monkeypatch, workdir):
    monkeypatch.chdir(workdir)
    monkeypatch.syspath_prepend(REPO)


def test_train_run_eval_cli(workdir, monkeypatch):
    _chdir(monkeypatch, workdir)
    cfg_path = os.path.join(REPO, "configs", "synthetic", "tiny.yaml")

    import train as train_entry
    monkeypatch.setattr(sys, "argv", [
        "train.py", "--cfg", cfg_path,
        "train.maxiter", "2", "N_samples", "4", "patch.size", "16",
        "mweight_volume.module",
        "core.nets.occnerf.mweight_vol_decoders.self_vol_decoder",
        "patch.N_patches", "1", "tpu.eval_ray_bucket", "1024",
        "progress.dump_interval", "100000"])
    train_entry.main()
    logdir = "experiments/occnerf/synthetic/subject/tiny"
    assert os.path.exists(os.path.join(logdir, "latest.ckpt"))
    assert os.path.exists(os.path.join(logdir, "metrics.jsonl"))

    import run as run_entry
    monkeypatch.setattr(sys, "argv", [
        "run.py", "--type", "movement", "--cfg", cfg_path,
        "N_samples", "4", "tpu.eval_ray_bucket", "1024",
        "mweight_volume.module",
        "core.nets.occnerf.mweight_vol_decoders.self_vol_decoder"])
    run_entry.main()
    out_dir = os.path.join(logdir, "latest", "movement")
    pngs = [f for f in os.listdir(out_dir) if f.endswith(".png")]
    assert len(pngs) == 3

    import eval as eval_entry
    monkeypatch.setattr(sys, "argv", [
        "eval.py", "--cfg", cfg_path, "eval", "False",
        "N_samples", "4", "tpu.eval_ray_bucket", "1024",
        "mweight_volume.module",
        "core.nets.occnerf.mweight_vol_decoders.self_vol_decoder"])
    eval_entry.main()


def test_render_types_cli(workdir, monkeypatch):
    """The remaining run.py types (freeview/tpose/backview/allview) each
    produce frames from the trained tiny checkpoint."""
    _chdir(monkeypatch, workdir)
    cfg_path = os.path.join(REPO, "configs", "synthetic", "tiny.yaml")
    logdir = "experiments/occnerf/synthetic/subject/tiny"
    if not os.path.exists(os.path.join(logdir, "latest.ckpt")):
        pytest.skip("train CLI test must run first (module-scoped workdir)")

    import run as run_entry
    common = ["N_samples", "4", "tpu.eval_ray_bucket", "1024",
              "mweight_volume.module",
              "core.nets.occnerf.mweight_vol_decoders.self_vol_decoder",
              "render_frames", "2"]
    # freeview writes to freeview_{frame_idx} (reference run.py naming)
    for rtype, subdir, expect in (("freeview", "freeview_0", 2),
                                  ("tpose", "tpose", 1),
                                  ("backview", "backview", 3),
                                  ("allview", "allview_0", None)):
        monkeypatch.setattr(sys, "argv", [
            "run.py", "--type", rtype, "--cfg", cfg_path] + common)
        run_entry.main()
        out_dir = os.path.join(logdir, "latest", subdir)
        pngs = [f for f in os.listdir(out_dir) if f.endswith(".png")]
        if expect is None:
            assert len(pngs) >= 1
        else:
            assert len(pngs) == expect, (rtype, pngs)
