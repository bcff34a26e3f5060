#!/usr/bin/env python
"""ZJU-MoCap single-view training-set preparation.

Behavioral equivalent of the reference prep tool
(`tools/prepare_zju_mocap/prepare_dataset.py`): reads ``annots.npy`` camera
calibration + ``new_params/*.npy`` SMPL fits for one training view, writes
``images/``, ``masks/`` (union of `mask` and `mask_cihp`), ``cameras.pkl``
(K, E, D per frame), ``mesh_infos.pkl`` (Rh/Th/poses/betas/joints/
tpose_joints/dapose_joints) and ``canonical_joints.pkl`` with avg_betas.
Subjects 313/315 carry their SMPL frame index inside the image basename
(`prepare_dataset.py:123-128`).

Usage: python prepare_dataset.py --cfg 387.yaml
"""

from __future__ import annotations

import argparse
import os
import sys
from shutil import copyfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))
from prep_common import (dump_pickle, load_smpl_model, load_yaml,  # noqa
                         mesh_info_for, prepare_dir, union_mask,
                         write_canonical_joints)
from occnerf_tpu.utils.files import split_path  # noqa: E402
from occnerf_tpu.utils.image import load_image, save_image, \
    to_3ch_image  # noqa: E402

MODEL_DIR = "../../third_parties/smpl/models"


def load_annots(subject_dir: str, view):
    annots = np.load(os.path.join(subject_dir, "annots.npy"),
                     allow_pickle=True).item()
    cams = annots["cams"]
    K = np.array(cams["K"])[view].astype(np.float32)
    R = np.array(cams["R"])[view].astype(np.float32)
    T = np.array(cams["T"])[view].astype(np.float32) / 1000.0
    D = np.array(cams["D"])[view].astype(np.float32)
    E = np.eye(4)
    E[:3, :3] = R
    E[:3, 3] = T[:3, 0]
    img_paths = np.array([np.array(f["ims"])[view] for f in annots["ims"]])
    return K, E, D[:, 0], img_paths


def smpl_frame_index(subject: str, img_path: str, idx: int) -> int:
    """313/315 encode the SMPL fit index in the image basename."""
    if subject in ("313", "315"):
        _, base, _ = split_path(img_path)
        start = base.find(")_")
        return int(base[start + 2: start + 6])
    return idx


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="387.yaml")
    args = ap.parse_args()
    cfg = load_yaml(args.cfg)

    subject = cfg["dataset"]["subject"]
    sex = cfg["dataset"]["sex"]
    max_frames = cfg["max_frames"]
    subject_dir = os.path.join(cfg["dataset"]["zju_mocap_path"],
                               f"CoreView_{subject}")
    smpl_params_dir = os.path.join(subject_dir, "new_params")

    K, E, D, img_paths = load_annots(subject_dir, cfg["training_view"])
    if max_frames > 0:
        img_paths = img_paths[:max_frames]

    output_path = os.path.join(
        cfg["output"]["dir"], cfg["output"].get("name", subject))
    os.makedirs(output_path, exist_ok=True)
    out_img_dir = prepare_dir(output_path, "images")
    out_mask_dir = prepare_dir(output_path, "masks")
    copyfile(args.cfg, os.path.join(output_path, "config.yaml"))

    smpl_model = load_smpl_model(sex, MODEL_DIR)

    cameras, mesh_infos, all_betas = {}, {}, []
    for idx, ipath in enumerate(img_paths):
        out_name = f"frame_{idx:06d}"
        img = np.array(load_image(os.path.join(subject_dir, str(ipath))))

        smpl_idx = smpl_frame_index(subject, str(ipath), idx)
        params = np.load(os.path.join(smpl_params_dir, f"{smpl_idx}.npy"),
                         allow_pickle=True).item()
        betas = params["shapes"][0]
        poses = params["poses"][0]
        all_betas.append(betas)

        cameras[out_name] = {"intrinsics": K, "extrinsics": E,
                             "distortions": D}
        mesh_infos[out_name] = mesh_info_for(
            smpl_model, poses, betas, params["Rh"][0], params["Th"][0])

        save_image(to_3ch_image(union_mask(subject_dir, str(ipath))),
                   os.path.join(out_mask_dir, out_name + ".png"))
        save_image(img, os.path.join(out_img_dir, out_name + ".png"))
        if idx % 50 == 0:
            print(f"  frame {idx}/{len(img_paths)}")

    dump_pickle(cameras, os.path.join(output_path, "cameras.pkl"))
    dump_pickle(mesh_infos, os.path.join(output_path, "mesh_infos.pkl"))
    write_canonical_joints(output_path, smpl_model, all_betas)
    print(f"wrote {output_path}")


if __name__ == "__main__":
    main()
