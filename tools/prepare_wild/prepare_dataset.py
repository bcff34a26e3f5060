#!/usr/bin/env python
"""Wild (monocular) capture preparation.

Behavioral equivalent of `tools/prepare_wild/prepare_dataset.py`: converts
``metadata.json`` (per-frame poses 72, betas 10, K 3x3, E 4x4, optional
trans) into the pkl set.  The global body rotation is transferred into the
camera: Rh/Th come from the pelvis, the body pose's first 3 entries are
zeroed, joints are pelvis-centered (`prepare_dataset.py:66-94`); an
optional per-frame ``trans`` is folded into the extrinsics
(`prepare_dataset.py:96-112`).

Usage: python prepare_dataset.py --cfg wild.yaml
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))
from prep_common import (dump_pickle, load_smpl_model, load_yaml,  # noqa
                         write_canonical_joints)

MODEL_DIR = "../../third_parties/smpl/models"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="wild.yaml")
    args = ap.parse_args()
    cfg = load_yaml(args.cfg)

    subject = cfg["dataset"]["subject"]
    sex = cfg["dataset"]["sex"]
    subject_dir = os.path.join(cfg["dataset"]["path"], subject)
    output_path = subject_dir

    with open(os.path.join(subject_dir, "metadata.json"), "r") as f:
        frame_infos = json.load(f)

    smpl_model = load_smpl_model(sex, MODEL_DIR)

    cameras, mesh_infos, all_betas = {}, {}, []
    for name, info in frame_infos.items():
        poses = np.array(info["poses"], np.float32)
        betas = np.array(info["betas"], np.float32)
        K = np.array(info["cam_intrinsics"], np.float32)
        E = np.array(info["cam_extrinsics"], np.float32)
        trans = (np.array(info["trans"], np.float32)
                 if "trans" in info else None)
        all_betas.append(betas)

        # transfer the global body rotation into the camera pose
        _, tpose_joints = smpl_model(np.zeros_like(poses), betas)
        pelvis = tpose_joints[0].copy()
        Th = pelvis
        Rh = poses[:3].copy()
        tpose_joints = tpose_joints - pelvis[None, :]
        poses = poses.copy()
        poses[:3] = 0.0
        _, joints = smpl_model(poses, betas)
        joints = joints - pelvis[None, :]

        mesh_infos[name] = {
            "Rh": Rh, "Th": Th, "poses": poses, "betas": betas,
            "joints": joints, "tpose_joints": tpose_joints,
        }

        if trans is not None:
            w2c = np.eye(4, dtype=np.float32)
            w2c[:3, 3] = trans
            E = E @ w2c
        else:
            print(f"{name}: no trans!")

        cameras[name] = {"intrinsics": K, "extrinsics": E}

    dump_pickle(cameras, os.path.join(output_path, "cameras.pkl"))
    dump_pickle(mesh_infos, os.path.join(output_path, "mesh_infos.pkl"))
    write_canonical_joints(output_path, smpl_model, all_betas)
    print(f"wrote {output_path}")


if __name__ == "__main__":
    main()
