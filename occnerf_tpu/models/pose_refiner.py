"""Body pose refiner (reference `pose_decoders/mlp_delta_body_pose.py`).

MLP(depth 4, width 256): 69-d pose vector -> 23 axis-angle deltas ->
Rodrigues -> per-joint delta rotations, near-identity at init (last layer
U(-1e-5, 1e-5), zero bias).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import (RELU_GAIN, apply_mlp, init_linear, init_uniform_linear,
                     rodrigues_device)


class BodyPoseRefiner:
    def __init__(self, embedding_size: int = 69, mlp_width: int = 256,
                 mlp_depth: int = 4, total_bones: int = 24):
        self.embedding_size = embedding_size
        self.mlp_width = mlp_width
        self.mlp_depth = mlp_depth
        self.n_joints = total_bones - 1

    def init(self, key: jax.Array):
        dims = [self.embedding_size] + [self.mlp_width] * self.mlp_depth
        keys = jax.random.split(key, len(dims))
        layers = [init_linear(keys[i], dims[i], dims[i + 1], RELU_GAIN)
                  for i in range(len(dims) - 1)]
        layers.append(init_uniform_linear(
            keys[-1], self.mlp_width, 3 * self.n_joints, 1e-5))
        return {"layers": layers}

    def apply(self, params, posevec: jnp.ndarray):
        rvec = apply_mlp(params["layers"], posevec).reshape(-1, 3)
        Rs = rodrigues_device(rvec).reshape(-1, self.n_joints, 3, 3)
        return {"Rs": Rs}
