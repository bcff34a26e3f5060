#!/usr/bin/env python
"""Wild multi-camera preparation for the allview renderer.

Behavioral equivalent of `tools/prepare_wild/prepare_all_cameras.py`:
reads ``metadata_{0..5}.json`` (one per camera), applies the same global-
rotation transfer as the single-view prep, and writes ``all_cameras.pkl``
and ``all_mesh_infos.pkl`` with per-view stacked arrays keyed by frame.

Usage: python prepare_all_cameras.py --cfg wild.yaml
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))
from prep_common import dump_pickle, load_smpl_model, load_yaml  # noqa

MODEL_DIR = "../../third_parties/smpl/models"
N_CAMERAS = 6


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="wild.yaml")
    args = ap.parse_args()
    cfg = load_yaml(args.cfg)

    subject = cfg["dataset"]["subject"]
    sex = cfg["dataset"]["sex"]
    subject_dir = os.path.join(cfg["dataset"]["path"], subject)

    frame_infoss = []
    for ci in range(N_CAMERAS):
        with open(os.path.join(subject_dir, f"metadata_{ci}.json")) as f:
            frame_infoss.append(json.load(f))

    smpl_model = load_smpl_model(sex, MODEL_DIR)

    cameras, mesh_infos = {}, {}
    for name in frame_infoss[0]:
        per_view = {k: [] for k in ("K", "E", "Rh", "Th", "poses", "betas",
                                    "joints", "tpose_joints")}
        for infos in frame_infoss:
            info = infos[name]
            poses = np.array(info["poses"], np.float32)
            betas = np.array(info["betas"], np.float32)
            K = np.array(info["cam_intrinsics"], np.float32)
            E = np.array(info["cam_extrinsics"], np.float32)

            _, tpose_joints = smpl_model(np.zeros_like(poses), betas)
            pelvis = tpose_joints[0].copy()
            per_view["Rh"].append(poses[:3].copy())
            per_view["Th"].append(pelvis)
            per_view["tpose_joints"].append(tpose_joints - pelvis[None])
            poses = poses.copy()
            poses[:3] = 0.0
            _, joints = smpl_model(poses, betas)
            per_view["joints"].append(joints - pelvis[None])
            per_view["poses"].append(poses)
            per_view["betas"].append(betas)

            if "trans" in info:
                w2c = np.eye(4, dtype=np.float32)
                w2c[:3, 3] = np.array(info["trans"], np.float32)
                E = E @ w2c
            per_view["K"].append(K)
            per_view["E"].append(E)

        cameras[name] = {"intrinsics": np.stack(per_view["K"]),
                         "extrinsics": np.stack(per_view["E"])}
        mesh_infos[name] = {
            k: np.stack(per_view[k]) for k in
            ("Rh", "Th", "poses", "betas", "joints", "tpose_joints")}

    dump_pickle(cameras, os.path.join(subject_dir, "all_cameras.pkl"))
    dump_pickle(mesh_infos, os.path.join(subject_dir,
                                         "all_mesh_infos.pkl"))
    print(f"wrote {subject_dir}/all_cameras.pkl and all_mesh_infos.pkl")


if __name__ == "__main__":
    main()
