"""Backview dataset: the full motion sequence from a fixed rotated camera.

Behavioral equivalent of `core/data/occnerf/backview.py`: iterate every
training frame, but render from a camera rotated half the orbit period away
from the original view; the rotated (K, E) is computed once on the first
frame and cached for the rest (`backview.py:201-210`).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..config import cfg
from ..utils.body import body_pose_to_body_RTs, get_canonical_global_tfms
from ..utils.camera import (apply_global_tfm_to_camera,
                            rotate_camera_by_frame_idx)
from .freeview import ROT_CAM_PARAMS
from .rays import build_rays, pack_image_rays
from .subject import SubjectData


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
        self.framelist = framelist
        self.period = cfg.render_frames
        self.reference_angle_idx = cfg.render_frames // 2
        self._cached_camera = None

    def __len__(self) -> int:
        return len(self.framelist)

    def _backview_camera(self, frame_name: str):
        E = rotate_camera_by_frame_idx(
            extrinsics=self.subject.cameras[frame_name]["extrinsics"],
            frame_idx=self.reference_angle_idx, period=self.period,
            trans=None, **ROT_CAM_PARAMS[self.src_type])
        K = self.subject.cameras[frame_name]["intrinsics"].copy()
        K[:2] *= cfg.resize_img_scale
        return K, E

    def __getitem__(self, idx: int) -> Dict:
        frame_name = self.framelist[idx]
        results: Dict = {"frame_name": frame_name}

        skel = self.subject.skeleton(frame_name)
        if self._cached_camera is None:
            self._cached_camera = self._backview_camera(frame_name)
        K, E = self._cached_camera
        E = apply_global_tfm_to_camera(E, skel["Rh"], skel["Th"])

        # image only sets the canvas size; rays carry no targets
        import os
        import cv2
        from ..utils.image import load_image
        img = np.array(load_image(os.path.join(
            self.subject.image_dir, f"{frame_name}.png")), dtype=np.float32)
        if cfg.resize_img_scale != 1.0:
            img = cv2.resize(img, None, fx=cfg.resize_img_scale,
                             fy=cfg.resize_img_scale)
        H, W = img.shape[:2]
        img = img / 255.0
        alpha = np.zeros_like(img)

        ray_data = build_rays(H, W, K.copy(), E, skel["bbox"])
        if "rays" in self.keyfilter:
            packed = pack_image_rays(
                ray_data, img, alpha,
                bucket=cfg.get("tpu", {}).get("eval_ray_bucket", 8192))
            packed.pop("target_rgbs")
            results.update(packed)
            results.update({"img_width": W, "img_height": H,
                            "bgcolor": self.bgcolor})

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
