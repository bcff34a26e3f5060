"""Allview dataset: render a fixed frame from every real eval camera.

Behavioral equivalent of `core/data/occnerf/allview.py`: cameras come from
``all_cameras.pkl`` (per-view K/E/D arrays keyed by frame name), optionally
with per-view SMPL fits from ``all_mesh_infos.pkl``; 23 views for ZJU, 6
for wild (`allview.py:69`).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional

import numpy as np
import cv2

from ..config import cfg
from ..utils.body import body_pose_to_body_RTs, get_canonical_global_tfms
from ..utils.camera import apply_global_tfm_to_camera
from ..utils.image import load_image
from .rays import build_rays, pack_image_rays
from .subject import SubjectData, skeleton_to_bbox


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

        with open(os.path.join(dataset_path, "all_cameras.pkl"), "rb") as f:
            self.all_cameras = pickle.load(f)

        self.all_mesh_infos = None
        amp = os.path.join(dataset_path, "all_mesh_infos.pkl")
        if os.path.exists(amp):
            with open(amp, "rb") as f:
                self.all_mesh_infos = pickle.load(f)

        framelist = self.subject.frame_list()[::skip]
        if maxframes > 0:
            framelist = framelist[:maxframes]
        self.frame_name = framelist[cfg.freeview.frame_idx]
        self.view_cameras = self.all_cameras[self.frame_name]
        # the reference hardcodes 23 views for zju / 6 for wild
        # (`allview.py:69`); we clamp to what the pkl actually provides
        n_avail = len(self.view_cameras["extrinsics"])
        self.total_views = min(6 if "wild" in dataset_path else 23, n_avail)

    def __len__(self) -> int:
        return self.total_views

    def _view_skeleton(self, view_idx: int) -> Dict:
        if self.all_mesh_infos is not None:
            info = self.all_mesh_infos[self.frame_name]
            joints = info["joints"][view_idx]
            return {
                "poses": info["poses"][view_idx].astype(np.float32),
                "dst_tpose_joints":
                    info["tpose_joints"][view_idx].astype(np.float32),
                "bbox": skeleton_to_bbox(joints, self.subject.bbox_offset),
                "Rh": info["Rh"][view_idx].astype(np.float32),
                "Th": info["Th"][view_idx].astype(np.float32),
            }
        return self.subject.skeleton(self.frame_name)

    def __getitem__(self, idx: int) -> Dict:
        results: Dict = {"frame_name": f"{self.frame_name}_view{idx:02d}"}

        img = np.array(load_image(os.path.join(
            self.subject.image_dir, f"{self.frame_name}.png")),
            dtype=np.float32)
        if "distortions" in self.view_cameras:
            img = cv2.undistort(
                img, self.view_cameras["intrinsics"][idx][:3, :3],
                self.view_cameras["distortions"][idx])
        if cfg.resize_img_scale != 1.0:
            img = cv2.resize(img, None, fx=cfg.resize_img_scale,
                             fy=cfg.resize_img_scale,
                             interpolation=cv2.INTER_LANCZOS4)
        H, W = img.shape[:2]
        img = img / 255.0
        alpha = np.zeros_like(img)

        skel = self._view_skeleton(idx)
        K = np.asarray(self.view_cameras["intrinsics"][idx])[:3, :3].copy()
        K[:2] *= cfg.resize_img_scale
        E = np.asarray(self.view_cameras["extrinsics"][idx])
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
            results["target_rgbs"] = img.astype(np.float32)

        if "motion_bases" in self.keyfilter:
            dst_Rs, dst_Ts = body_pose_to_body_RTs(
                skel["poses"], skel["dst_tpose_joints"])
            results.update({
                "dst_Rs": dst_Rs, "dst_Ts": dst_Ts,
                "cnl_gtfms": get_canonical_global_tfms(
                    self.subject.canonical_joints)})
        if "motion_weights_priors" in self.keyfilter:
            results["motion_weights_priors"] = \
                self.subject.motion_weights_priors.copy()
        if "cnl_bbox" in self.keyfilter:
            results.update(self.subject.cnl_bbox_arrays())
        if "dst_posevec_69" in self.keyfilter:
            results["dst_posevec"] = \
                (skel["poses"][3:] + 1e-2).astype(np.float32)
        return results
