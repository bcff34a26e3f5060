#!/usr/bin/env python
"""Write ``all_cameras.pkl`` (per-view K/E/D arrays keyed by frame name)
for the allview renderer (behavioral equivalent of
`tools/prepare_zju_mocap/prepare_all_cameras.py:119-120`).

Usage: python prepare_all_cameras.py --cfg 387.yaml
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))
from prep_common import dump_pickle, load_yaml  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="387.yaml")
    args = ap.parse_args()
    cfg = load_yaml(args.cfg)

    subject = cfg["dataset"]["subject"]
    max_frames = cfg["max_frames"]
    subject_dir = os.path.join(cfg["dataset"]["zju_mocap_path"],
                               f"CoreView_{subject}")

    annots = np.load(os.path.join(subject_dir, "annots.npy"),
                     allow_pickle=True).item()
    cams = annots["cams"]
    K = np.array(cams["K"]).astype(np.float32)             # (V, 3, 3)
    R = np.array(cams["R"]).astype(np.float32)
    T = np.array(cams["T"]).astype(np.float32) / 1000.0
    D = np.array(cams["D"]).astype(np.float32)[:, :, 0]    # (V, 5)
    E = np.repeat(np.eye(4)[None], K.shape[0], axis=0)
    E[:, :3, :3] = R
    E[:, :3, 3] = T[:, :3, 0]
    print(f"total {K.shape[0]} cameras")

    view = cfg["training_view"]
    img_paths = np.array([np.array(f["ims"])[view]
                          for f in annots["ims"]])
    if max_frames > 0:
        img_paths = img_paths[:max_frames]

    output_path = os.path.join(
        cfg["output"]["dir"], cfg["output"].get("name", subject))
    os.makedirs(output_path, exist_ok=True)

    cameras = {f"frame_{idx:06d}": {"intrinsics": K, "extrinsics": E,
                                    "distortions": D}
               for idx in range(len(img_paths))}
    dump_pickle(cameras, os.path.join(output_path, "all_cameras.pkl"))
    print(f"wrote {output_path}/all_cameras.pkl")


if __name__ == "__main__":
    main()
