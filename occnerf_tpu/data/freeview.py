"""Freeview (orbit-camera) dataset.

Behavioral equivalent of `core/data/occnerf/freeview.py`: a fixed training
frame (``cfg.freeview.frame_idx``) rendered from ``cfg.render_frames``
orbit-camera positions.  The orbit axis/direction is per-source
(`freeview.py:25-28`): z-axis with inverted angle for zju_mocap, y-axis
for wild captures.  Output rays use the static image-mode packing.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np
import cv2

from ..config import cfg
from ..utils.body import body_pose_to_body_RTs, get_canonical_global_tfms
from ..utils.camera import (apply_global_tfm_to_camera,
                            rotate_camera_by_frame_idx)
from ..utils.image import load_image
from .rays import build_rays, pack_image_rays
from .subject import SubjectData

ROT_CAM_PARAMS = {
    "zju_mocap": {"rotate_axis": "z", "inv_angle": True},
    "wild": {"rotate_axis": "y", "inv_angle": False},
}


class Dataset:
    def __init__(self, dataset_path: str,
                 keyfilter: Optional[List[str]] = None,
                 maxframes: int = -1, skip: int = 1, bgcolor=None,
                 src_type: str = "zju_mocap", **_):
        print("[Dataset Path]", dataset_path)
        self.subject = SubjectData(dataset_path)
        self.keyfilter = list(keyfilter or [])
        self.bgcolor = np.array(
            bgcolor if bgcolor is not None else [255.0, 255.0, 255.0],
            dtype=np.float32)
        self.src_type = src_type

        framelist = self.subject.frame_list()[::skip]
        if maxframes > 0:
            framelist = framelist[:maxframes]
        self.train_frame_name = framelist[cfg.freeview.frame_idx]
        self.train_camera = self.subject.cameras[self.train_frame_name]
        self.total_frames = cfg.render_frames

    def __len__(self) -> int:
        return self.total_frames

    # ------------------------------------------------------------------
    def _orbit_camera(self, frame_idx: int, trans=None):
        E = rotate_camera_by_frame_idx(
            extrinsics=self.train_camera["extrinsics"],
            frame_idx=frame_idx, period=self.total_frames, trans=trans,
            **ROT_CAM_PARAMS[self.src_type])
        K = self.train_camera["intrinsics"].copy()
        K[:2] *= cfg.resize_img_scale
        return K, E

    def _load_image(self, frame_name: str):
        """Raw image (no bg blend — only used for size and target_rgbs,
        like `freeview.py:144-172`)."""
        img = np.array(load_image(
            os.path.join(self.subject.image_dir, f"{frame_name}.png")),
            dtype=np.float64)
        alpha = np.array(load_image(
            os.path.join(self.subject.dataset_path, "masks",
                         f"{frame_name}.png")), dtype=np.float64)
        if "distortions" in self.train_camera:
            img = cv2.undistort(img, self.train_camera["intrinsics"],
                                self.train_camera["distortions"])
            alpha = cv2.undistort(alpha, self.train_camera["intrinsics"],
                                  self.train_camera["distortions"])
        alpha = alpha / 255.0
        if cfg.resize_img_scale != 1.0:
            img = cv2.resize(img, None, fx=cfg.resize_img_scale,
                             fy=cfg.resize_img_scale,
                             interpolation=cv2.INTER_LANCZOS4)
            alpha = cv2.resize(alpha, None, fx=cfg.resize_img_scale,
                               fy=cfg.resize_img_scale,
                               interpolation=cv2.INTER_LINEAR)
        return img, alpha

    def _metadata(self, poses, tpose_joints) -> Dict[str, np.ndarray]:
        out: Dict[str, np.ndarray] = {}
        if "motion_bases" in self.keyfilter:
            dst_Rs, dst_Ts = body_pose_to_body_RTs(poses, tpose_joints)
            out.update({
                "dst_Rs": dst_Rs, "dst_Ts": dst_Ts,
                "cnl_gtfms": get_canonical_global_tfms(
                    self.subject.canonical_joints)})
        if "motion_weights_priors" in self.keyfilter:
            out["motion_weights_priors"] = \
                self.subject.motion_weights_priors.copy()
        if "cnl_bbox" in self.keyfilter:
            out.update(self.subject.cnl_bbox_arrays())
        if "dst_posevec_69" in self.keyfilter:
            out["dst_posevec"] = (poses[3:] + 1e-2).astype(np.float32)
        return out

    # ------------------------------------------------------------------
    def __getitem__(self, idx: int) -> Dict:
        frame_name = self.train_frame_name
        results: Dict = {"frame_name": frame_name}

        img, alpha = self._load_image(frame_name)
        img = (img / 255.0).astype(np.float32)
        H, W = img.shape[:2]

        skel = self.subject.skeleton(frame_name)
        K, E = self._orbit_camera(idx, trans=skel["Th"])
        E = apply_global_tfm_to_camera(E, skel["Rh"], skel["Th"])
        ray_data = build_rays(H, W, K, E, skel["bbox"])

        if "rays" in self.keyfilter:
            packed = pack_image_rays(
                ray_data, img, alpha,
                bucket=cfg.get("tpu", {}).get("eval_ray_bucket", 8192))
            packed.pop("target_rgbs")
            results.update(packed)
            results.update({"img_width": W, "img_height": H,
                            "bgcolor": self.bgcolor})
        if "target_rgbs" in self.keyfilter:
            results["target_rgbs"] = img  # full image, like the reference

        results.update(self._metadata(skel["poses"],
                                      skel["dst_tpose_joints"]))
        return results
