"""Ray generation and static-shape sampling (host-side numpy).

The reference emits a *variable* number of rays per item — patch mode keeps
only rays inside both the patch window and the body bbox
(`core/data/occnerf/train.py:225-273`), image mode keeps only bbox-hitting
rays (`train.py:446-451`).  Dynamic shapes would force an XLA recompile per
frame, so both modes are reshaped here into fixed-size buffers:

- patch mode: ALL ``P*P`` rays of each patch window are emitted
  (``N_patches*P*P`` rays, always).  Rays that miss the bbox get
  ``near = far = 0`` and ``ray_valid = 0``; the renderer gives them
  ``acc = 0`` so they composite to exactly ``bgcolor`` — the same value the
  reference's ``_unpack_imgs`` writes into un-rendered patch pixels
  (`trainer.py:31-41`).  The loss is therefore identical, with no dynamic
  shapes anywhere.
- image mode: bbox-hitting rays are packed and padded to a multiple of a
  static bucket size.

Patch *placement* follows the reference exactly: centers drawn from the
subject mask with probability ``sample_subject_ratio``, else from
bbox-minus-subject (`train.py:186-199`), window clamped inside the image
(`train.py:236-247`).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ..utils.camera import get_rays_from_KRT, rays_intersect_3d_bbox


def build_rays(H: int, W: int, K: np.ndarray, E: np.ndarray,
               bbox: Dict, use_native: bool = True
               ) -> Dict[str, np.ndarray]:
    """Full-image rays + bbox intersection.

    Returns dense per-pixel arrays plus the flat ``ray_mask`` of rays that
    hit the (margin-expanded) body bbox.  Uses the fused C++ core
    (occnerf_tpu.native) when its toolchain is available; the numpy path
    below is the reference implementation and the fallback.
    """
    R, T = E[:3, :3], E[:3, 3]

    if use_native:
        from .. import native
        out = native.build_rays_native(
            H, W, K, R, T, np.asarray(bbox["min_xyz"], np.float64),
            np.asarray(bbox["max_xyz"], np.float64))
        if out is not None:
            rays_o, rays_d, near, far, ray_mask = out
            return {"rays_o": rays_o, "rays_d": rays_d,
                    "near": near, "far": far, "ray_mask": ray_mask}

    rays_o, rays_d = get_rays_from_KRT(H, W, K, R, T)
    rays_o = rays_o.reshape(-1, 3).astype(np.float32)
    rays_d = rays_d.reshape(-1, 3).astype(np.float32)
    near_v, far_v, ray_mask = rays_intersect_3d_bbox(bbox, rays_o, rays_d)

    near = np.zeros(rays_o.shape[0], np.float32)
    far = np.zeros(rays_o.shape[0], np.float32)
    near[ray_mask] = near_v
    far[ray_mask] = far_v
    return {
        "rays_o": rays_o, "rays_d": rays_d,
        "near": near, "far": far, "ray_mask": ray_mask,
    }


def _choose_patch_window(candidate_mask: np.ndarray, patch_size: int,
                         H: int, W: int, rng: np.random.Generator
                         ) -> Tuple[int, int]:
    """Pick a patch top-left corner whose center lies on the candidate mask,
    clamped inside the image (reference `train.py:229-247`)."""
    ys, xs = np.where(candidate_mask)
    i = int(rng.integers(0, ys.shape[0]))
    half = patch_size // 2
    x_min = int(np.clip(xs[i] - half, 0, W - patch_size))
    y_min = int(np.clip(ys[i] - half, 0, H - patch_size))
    return x_min, y_min


def sample_patch_rays(ray_data: Dict[str, np.ndarray], img: np.ndarray,
                      subject_mask: np.ndarray, n_patches: int,
                      patch_size: int, sample_subject_ratio: float,
                      rng: np.random.Generator) -> Dict[str, np.ndarray]:
    """Static-shape patch sampling.

    Returns:
        rays (2, N_patches*P*P, 3), near/far (N,1), ray_valid (N,) float32,
        patch_masks (N_patches, P, P) bool (ray hits bbox),
        target_patches (N_patches, P, P, 3),
        patch_xy (N_patches, 2) top-left corners.
    """
    H, W = img.shape[:2]
    P = patch_size
    ray_mask2d = ray_data["ray_mask"].reshape(H, W)
    bbox_not_subject = ray_mask2d & ~subject_mask

    # degenerate guards: fall back to any valid mask
    if not subject_mask.any():
        subject_mask = ray_mask2d
    if not bbox_not_subject.any():
        bbox_not_subject = subject_mask

    ro = ray_data["rays_o"].reshape(H, W, 3)
    rd = ray_data["rays_d"].reshape(H, W, 3)
    nr = ray_data["near"].reshape(H, W)
    fr = ray_data["far"].reshape(H, W)

    rays_o, rays_d, near, far, valid = [], [], [], [], []
    patch_masks, targets, corners = [], [], []
    for _ in range(n_patches):
        cand = (subject_mask
                if rng.random() < sample_subject_ratio else bbox_not_subject)
        x0, y0 = _choose_patch_window(cand, P, H, W, rng)
        sl = np.s_[y0:y0 + P, x0:x0 + P]
        rays_o.append(ro[sl].reshape(-1, 3))
        rays_d.append(rd[sl].reshape(-1, 3))
        near.append(nr[sl].reshape(-1))
        far.append(fr[sl].reshape(-1))
        m = ray_mask2d[sl]
        valid.append(m.reshape(-1).astype(np.float32))
        patch_masks.append(m)
        targets.append(img[sl])
        corners.append((x0, y0))

    N = n_patches * P * P
    out = {
        "rays": np.stack([np.concatenate(rays_o), np.concatenate(rays_d)],
                         axis=0).astype(np.float32),
        "near": np.concatenate(near)[:, None].astype(np.float32),
        "far": np.concatenate(far)[:, None].astype(np.float32),
        "ray_valid": np.concatenate(valid).astype(np.float32),
        "patch_masks": np.stack(patch_masks, axis=0),
        "target_patches": np.stack(targets, axis=0).astype(np.float32),
        "patch_xy": np.asarray(corners, np.int32),
    }
    assert out["rays"].shape == (2, N, 3)
    return out


def pack_image_rays(ray_data: Dict[str, np.ndarray], img: np.ndarray,
                    alpha: np.ndarray, bucket: int
                    ) -> Dict[str, np.ndarray]:
    """Image-mode packing: masked rays padded to a bucket multiple.

    Padded rays get ``near = far = 0`` and ``ray_valid = 0``; the renderer
    composites them to bgcolor and ``unpack_to_image`` drops them via
    ``ray_mask`` (reference `run.py:40-63`).
    """
    mask = ray_data["ray_mask"]
    n = int(mask.sum())
    n_pad = max(bucket, ((n + bucket - 1) // bucket) * bucket)

    def pad(a, fill=0.0):
        shp = (n_pad,) + a.shape[1:]
        out = np.full(shp, fill, a.dtype)
        out[:n] = a[mask]
        return out

    flat_img = img.reshape(-1, 3).astype(np.float32)
    flat_alpha = alpha.reshape(-1, alpha.shape[-1] if alpha.ndim == 3 else 1)
    valid = np.zeros(n_pad, np.float32)
    valid[:n] = 1.0
    return {
        "rays": np.stack([pad(ray_data["rays_o"]), pad(ray_data["rays_d"])],
                         axis=0),
        "near": pad(ray_data["near"][:, None]),
        "far": pad(ray_data["far"][:, None]),
        "ray_valid": valid,
        "ray_mask": mask,
        "target_rgbs": pad(flat_img),
        "ray_alpha": pad(flat_alpha.astype(np.float32)),
        "n_valid_rays": np.int32(n),
    }


def unpack_to_image(H: int, W: int, ray_mask: np.ndarray,
                    fill, packed: np.ndarray, n_valid: int) -> np.ndarray:
    """Scatter per-ray values back onto an image canvas through ``ray_mask``
    (reference `run.py:40-63`).  ``fill`` paints un-rendered pixels — the
    bgcolor for rgb maps, 0 for alpha/depth maps."""
    packed = np.asarray(packed)
    ch = packed.shape[1:] if packed.ndim > 1 else ()
    canvas = np.broadcast_to(
        np.asarray(fill, np.float32), (H * W,) + ch).copy()
    canvas[ray_mask] = packed[:n_valid]
    return canvas.reshape((H, W) + ch)
