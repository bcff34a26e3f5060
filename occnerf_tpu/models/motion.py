"""Motion basis: observation-pose -> canonical-pose rigid transforms.

Behavioral equivalent of MotionBasisComputer
(`core/utils/network_util.py:138-200`): forward-kinematics chain of the
destination pose's local (R, T)s down the SMPL tree, then
``f = cnl_gtfms @ inv(dst_gtfms)`` giving per-bone (scale_R, T) that map
observation-space points into canonical space.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..utils.body import SMPL_PARENT


def motion_basis(dst_Rs: jnp.ndarray, dst_Ts: jnp.ndarray,
                 cnl_gtfms: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Args: dst_Rs (B,3,3), dst_Ts (B,3), cnl_gtfms (B,4,4).
    Returns: (scale_Rs (B,3,3), Ts (B,3))."""
    B = dst_Rs.shape[0]
    local = jnp.zeros((B, 4, 4), dst_Rs.dtype)
    local = local.at[:, :3, :3].set(dst_Rs)
    local = local.at[:, :3, 3].set(dst_Ts)
    local = local.at[:, 3, 3].set(1.0)

    # FK down the (static) SMPL tree; unrolled — 24 4x4 matmuls
    gtfms = [local[0]]
    for i in range(1, B):
        gtfms.append(gtfms[SMPL_PARENT[i]] @ local[i])
    dst_gtfms = jnp.stack(gtfms, axis=0)

    f = cnl_gtfms @ jnp.linalg.inv(dst_gtfms)
    return f[:, :3, :3], f[:, :3, 3]
