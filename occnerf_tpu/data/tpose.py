"""T-pose (canonical appearance) dataset.

Behavioral equivalent of `core/data/occnerf/tpose.py`: renders the
canonical body (zero pose) from a synthetic 512x512 camera at radius 6 /
focal 1250 (`tpose.py:22-25,65-84`); per frame the body's root rotation and
the canonical bbox are rotated by the frame angle (`tpose.py:144-153`).
The shipped renderer draws a single frame (`tpose.py:50`).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..config import cfg
from ..utils.body import body_pose_to_body_RTs, get_canonical_global_tfms
from ..utils.camera import _exact_rodrigues, get_camrot
from .rays import build_rays, pack_image_rays
from .subject import SubjectData

RENDER_SIZE = 512
CAM_PARAMS = {"radius": 6.0, "focal": 1250.0}


def setup_camera(img_size: int, radius: float, focal: float):
    campos = np.array([0.0, -0.25, radius], dtype=np.float32)
    camrot = get_camrot(campos, lookat=np.array([0.0, -0.25, 0.0]),
                        inv_camera=True)
    E = np.eye(4, dtype=np.float32)
    E[:3, :3] = camrot
    E[:3, 3] = -camrot @ campos
    K = np.eye(3, dtype=np.float32)
    K[0, 0] = K[1, 1] = focal
    K[:2, 2] = img_size / 2.0
    return K, E


def rotate_bbox(bbox: Dict, rmtx: np.ndarray) -> Dict:
    """AABB of the rotated bbox corners (`tpose.py:106-128`)."""
    mn, mx = bbox["min_xyz"], bbox["max_xyz"]
    corners = np.array([[x, y, z] for x in (mn[0], mx[0])
                        for y in (mn[1], mx[1]) for z in (mn[2], mx[2])])
    rot = corners @ rmtx
    return {"min_xyz": rot.min(0), "max_xyz": rot.max(0)}


class Dataset:
    def __init__(self, dataset_path: str,
                 keyfilter: Optional[List[str]] = None,
                 bgcolor=None, src_type: str = "zju_mocap", **_):
        print("[Dataset Path]", dataset_path)
        self.subject = SubjectData(dataset_path)
        self.keyfilter = list(keyfilter or [])
        self.bgcolor = np.array(
            bgcolor if bgcolor is not None else [255.0, 255.0, 255.0],
            dtype=np.float32)
        self.total_frames = 1
        self.img_size = RENDER_SIZE
        K, E = setup_camera(self.img_size, **CAM_PARAMS)
        self.camera = {"K": K, "E": E}

    def __len__(self) -> int:
        return self.total_frames

    def __getitem__(self, idx: int) -> Dict:
        results: Dict = {"frame_name": f"tpose_{idx:06d}"}
        H = W = self.img_size

        dst_bbox = dict(self.subject.canonical_bbox)
        dst_poses = np.zeros(72, dtype=np.float32)
        dst_skel_joints = self.subject.canonical_joints.copy()

        # rotate the body's root (and the bbox) by the frame angle
        angle = 2 * np.pi / self.total_frames * idx
        add_rmtx = _exact_rodrigues(np.array([0.0, -angle, 0.0]))
        root_rmtx = add_rmtx @ _exact_rodrigues(dst_poses[:3])
        # matrix -> axis-angle (inverse Rodrigues)
        cos_t = np.clip((np.trace(root_rmtx) - 1.0) / 2.0, -1.0, 1.0)
        theta = np.arccos(cos_t)
        if theta > 1e-8:
            axis = np.array([root_rmtx[2, 1] - root_rmtx[1, 2],
                             root_rmtx[0, 2] - root_rmtx[2, 0],
                             root_rmtx[1, 0] - root_rmtx[0, 1]])
            axis = axis / (2.0 * np.sin(theta))
            dst_poses[:3] = (axis * theta).astype(np.float32)
        dst_bbox = rotate_bbox(dst_bbox, add_rmtx)

        K, E = self.camera["K"].copy(), self.camera["E"].copy()
        ray_data = build_rays(H, W, K, E, dst_bbox)

        if "rays" in self.keyfilter:
            alpha = np.zeros((H, W, 3), np.float32)
            img = np.zeros((H, W, 3), np.float32)
            packed = pack_image_rays(
                ray_data, img, alpha,
                bucket=cfg.get("tpu", {}).get("eval_ray_bucket", 8192))
            packed.pop("target_rgbs")
            results.update(packed)
            results.update({"img_width": W, "img_height": H,
                            "bgcolor": self.bgcolor})

        if "motion_bases" in self.keyfilter:
            dst_Rs, dst_Ts = body_pose_to_body_RTs(dst_poses,
                                                   dst_skel_joints)
            results.update({
                "dst_Rs": dst_Rs, "dst_Ts": dst_Ts,
                "cnl_gtfms": get_canonical_global_tfms(
                    self.subject.canonical_joints),
                "joints": dst_skel_joints,
            })
        if "motion_weights_priors" in self.keyfilter:
            results["motion_weights_priors"] = \
                self.subject.motion_weights_priors.copy()
        if "cnl_bbox" in self.keyfilter:
            results.update(self.subject.cnl_bbox_arrays())
        if "dst_posevec_69" in self.keyfilter:
            results["dst_posevec"] = (dst_poses[3:] + 1e-2).astype(np.float32)
        return results
