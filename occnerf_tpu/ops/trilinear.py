"""Trilinear volume sampling and the fused inverse-LBS motion-field sampler.

Replaces the reference's per-bone Python loop of 24 ``F.grid_sample`` calls
(`core/nets/occnerf/network.py:351-402`) with one vectorized gather-lerp:
all 24 bone transforms are applied as a single batched matmul and the
24-channel weight volume is sampled in one shot.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_3d(vol: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Trilinear sample with zero padding, align_corners=True.

    Matches ``F.grid_sample(vol[None, None], grid, padding_mode='zeros',
    align_corners=True)`` semantics for a single-channel volume.

    Args:
        vol: (D, H, W) volume, indexed [z, y, x].
        coords: (..., 3) normalized coordinates in [-1, 1], ordered (x, y, z)
            where x indexes W (the fastest axis) — the grid_sample convention.

    Returns:
        (...,) sampled values; zero outside the volume.
    """
    D, H, W = vol.shape
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    # align_corners=True: -1 -> 0, +1 -> size-1
    fx = (x + 1.0) * 0.5 * (W - 1)
    fy = (y + 1.0) * 0.5 * (H - 1)
    fz = (z + 1.0) * 0.5 * (D - 1)

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    z0 = jnp.floor(fz)
    tx = fx - x0
    ty = fy - y0
    tz = fz - z0

    def gather(ix, iy, iz):
        inb = ((ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
               & (iz >= 0) & (iz <= D - 1))
        ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        izc = jnp.clip(iz, 0, D - 1).astype(jnp.int32)
        vals = vol[izc, iyc, ixc]
        return jnp.where(inb, vals, 0.0)

    x1, y1, z1 = x0 + 1, y0 + 1, z0 + 1
    c000 = gather(x0, y0, z0)
    c100 = gather(x1, y0, z0)
    c010 = gather(x0, y1, z0)
    c110 = gather(x1, y1, z0)
    c001 = gather(x0, y0, z1)
    c101 = gather(x1, y0, z1)
    c011 = gather(x0, y1, z1)
    c111 = gather(x1, y1, z1)

    c00 = c000 * (1 - tx) + c100 * tx
    c10 = c010 * (1 - tx) + c110 * tx
    c01 = c001 * (1 - tx) + c101 * tx
    c11 = c011 * (1 - tx) + c111 * tx
    c0 = c00 * (1 - ty) + c10 * ty
    c1 = c01 * (1 - ty) + c11 * ty
    return c0 * (1 - tz) + c1 * tz


def sample_motion_fields(pts: jnp.ndarray,
                         motion_scale_Rs: jnp.ndarray,
                         motion_Ts: jnp.ndarray,
                         motion_weights_vol: jnp.ndarray,
                         cnl_bbox_min_xyz: jnp.ndarray,
                         cnl_bbox_scale_xyz: jnp.ndarray,
                         weight_clamp: float = 0.0001):
    """Inverse-LBS skeletal warp: observation points -> canonical points.

    Behavioral equivalent of `network.py:351-402` (minus its background
    channel): for each bone b, transform ``pos_b = R_b p + T_b``, sample the
    bone's motion-weight channel at the normalized canonical coordinate, and
    return the weight-normalized average of the transformed positions plus
    the weight-sum foreground likelihood.

    Args:
        pts: (..., 3) observation-space sample points.
        motion_scale_Rs: (B, 3, 3) observation->canonical rotations/scales.
        motion_Ts: (B, 3) translations.
        motion_weights_vol: (B+1, D, H, W) softmax weight volume; the last
            channel (background) is ignored, as in the reference
            (`network.py:363`).
        cnl_bbox_min_xyz: (3,) canonical bbox min.
        cnl_bbox_scale_xyz: (3,) = 2 / (max - min).

    Returns:
        (x_skel (..., 3), fg_likelihood_mask (..., 1))
    """
    orig_shape = pts.shape[:-1]
    p = pts.reshape(-1, 3)                                    # (N, 3)
    B = motion_scale_Rs.shape[0]
    weights_vol = motion_weights_vol[:B]                      # drop bg channel

    # (B, N, 3): all bone transforms in one einsum.  HIGHEST precision —
    # positions feed floor()/lerp, so bf16 MXU rounding is not acceptable.
    pos = jnp.einsum("bij,nj->bni", motion_scale_Rs, p,
                     precision=jax.lax.Precision.HIGHEST) \
        + motion_Ts[:, None, :]
    grid = (pos - cnl_bbox_min_xyz) * cnl_bbox_scale_xyz - 1.0  # (B, N, 3) xyz

    weights = jax.vmap(grid_sample_3d)(weights_vol, grid)     # (B, N)
    wsum = jnp.sum(weights, axis=0)                           # (N,)
    x_skel = jnp.einsum("bn,bni->ni", weights, pos) / \
        jnp.clip(wsum, weight_clamp, None)[:, None]

    return (x_skel.reshape(*orig_shape, 3),
            wsum.reshape(*orig_shape, 1))
