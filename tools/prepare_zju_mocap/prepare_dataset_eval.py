#!/usr/bin/env python
"""ZJU-MoCap multi-view evaluation-set preparation.

Behavioral equivalent of `tools/prepare_zju_mocap/prepare_dataset_eval.py`:
iterates an ``eval_view`` camera range with a frame ``skip``, writing frames
named ``camera_{c:02d}_frame_{f:06d}`` (camera index is 1-based in the
name, `prepare_dataset_eval.py:139-144`).  Output feeds the eval dataset
paths selected when ``cfg.eval=True`` (`core/data/dataset_args.py:25-37`).

Usage: python prepare_dataset_eval.py --cfg 387_eval.yaml
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
                         mesh_info_for, parse_view_spec, prepare_dir,
                         union_mask, write_canonical_joints)
from prepare_dataset import smpl_frame_index  # noqa: E402
from occnerf_tpu.utils.image import load_image, save_image, \
    to_3ch_image  # noqa: E402

MODEL_DIR = "../../third_parties/smpl/models"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="387_eval.yaml")
    args = ap.parse_args()
    cfg = load_yaml(args.cfg)

    subject = cfg["dataset"]["subject"]
    sex = cfg["dataset"]["sex"]
    max_frames = cfg["max_frames"]
    skip = cfg["skip"]
    subject_dir = os.path.join(cfg["dataset"]["zju_mocap_path"],
                               f"CoreView_{subject}")
    smpl_params_dir = os.path.join(subject_dir, "new_params")

    select_view = parse_view_spec(cfg["eval_view"])

    annots = np.load(os.path.join(subject_dir, "annots.npy"),
                     allow_pickle=True).item()
    cams = annots["cams"]
    Ks = np.array(cams["K"])[select_view].astype(np.float32)
    Rs = np.array(cams["R"])[select_view].astype(np.float32)
    Ts = np.array(cams["T"])[select_view].astype(np.float32) / 1000.0
    Ds = np.array(cams["D"])[select_view].astype(np.float32)[..., 0]
    Es = np.zeros((len(select_view), 4, 4), np.float32)
    Es[:, :3, :3] = Rs
    Es[:, :3, 3] = Ts[..., 0]
    Es[:, 3, 3] = 1.0

    img_paths = np.stack([np.array(f["ims"])[select_view]
                          for f in annots["ims"]], 0)
    if max_frames > 0:
        img_paths = img_paths[:max_frames]
    img_paths = img_paths[::skip]

    output_path = os.path.join(
        cfg["output"]["dir"], cfg["output"].get("name", subject))
    os.makedirs(output_path, exist_ok=True)
    out_img_dir = prepare_dir(output_path, "images")
    out_mask_dir = prepare_dir(output_path, "masks")
    copyfile(args.cfg, os.path.join(output_path, "config.yaml"))

    smpl_model = load_smpl_model(sex, MODEL_DIR)

    cameras, mesh_infos, all_betas = {}, {}, []
    for fi, frame_views in enumerate(img_paths):
        real_frame = fi * skip
        for ci, ipath in enumerate(frame_views):
            real_cam = int(select_view[ci]) + 1
            out_name = f"camera_{real_cam:02d}_frame_{real_frame:06d}"

            img = np.array(load_image(os.path.join(subject_dir,
                                                   str(ipath))))
            smpl_idx = smpl_frame_index(subject, str(ipath), real_frame)
            params = np.load(
                os.path.join(smpl_params_dir, f"{smpl_idx}.npy"),
                allow_pickle=True).item()
            betas = params["shapes"][0]
            poses = params["poses"][0]
            all_betas.append(betas)

            cameras[out_name] = {"intrinsics": Ks[ci],
                                 "extrinsics": Es[ci],
                                 "distortions": Ds[ci]}
            mesh_infos[out_name] = mesh_info_for(
                smpl_model, poses, betas, params["Rh"][0], params["Th"][0])

            save_image(to_3ch_image(union_mask(subject_dir, str(ipath))),
                       os.path.join(out_mask_dir, out_name + ".png"))
            save_image(img, os.path.join(out_img_dir, out_name + ".png"))
        print(f"  frame {real_frame} ({len(frame_views)} views)")

    dump_pickle(cameras, os.path.join(output_path, "cameras.pkl"))
    dump_pickle(mesh_infos, os.path.join(output_path, "mesh_infos.pkl"))
    write_canonical_joints(output_path, smpl_model, all_betas)
    print(f"wrote {output_path}")


if __name__ == "__main__":
    main()
