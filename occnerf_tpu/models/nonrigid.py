"""Non-rigid motion offset MLP (reference `non_rigid_motion_mlps/mlp_offset.py`).

Input: (hann-windowed positional embedding, 69-d pose condition); output:
3-d offset added to the canonical position.  Skip layers re-concatenate the
positional embedding.  Last layer U(-1e-5, 1e-5) so offsets start ~zero.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from .layers import RELU_GAIN, init_linear, init_uniform_linear, linear


class NonRigidMotionMLP:
    def __init__(self, pos_embed_size: int = 36, condition_code_size: int = 69,
                 mlp_width: int = 128, mlp_depth: int = 6,
                 skips: Sequence[int] = (4,)):
        self.pos_embed_size = pos_embed_size
        self.condition_code_size = condition_code_size
        self.mlp_width = mlp_width
        self.mlp_depth = mlp_depth
        self.skips = tuple(skips) if skips is not None else (4,)

    def init(self, key: jax.Array):
        keys = jax.random.split(key, self.mlp_depth + 1)
        layers = [init_linear(keys[0],
                              self.pos_embed_size + self.condition_code_size,
                              self.mlp_width, RELU_GAIN)]
        for i in range(1, self.mlp_depth):
            n_in = self.mlp_width + (self.pos_embed_size
                                     if i in self.skips else 0)
            layers.append(init_linear(keys[i], n_in, self.mlp_width,
                                      RELU_GAIN))
        layers.append(init_uniform_linear(keys[-1], self.mlp_width, 3, 1e-5))
        return {"layers": layers}

    def apply(self, params, pos_embed: jnp.ndarray, pos_xyz: jnp.ndarray,
              condition_code: jnp.ndarray):
        layers = params["layers"]
        h = jnp.concatenate([condition_code, pos_embed], axis=-1)
        for i, p in enumerate(layers):
            if 1 <= i < self.mlp_depth and i in self.skips:
                h = jnp.concatenate([h, pos_embed], axis=-1)
            h = linear(p, h)
            if i < len(layers) - 1:
                h = jax.nn.relu(h)
        return {"xyz": pos_xyz + h, "offsets": h}


class PointOffsetMLP:
    """Hash-grid-encoded non-rigid offset variant.

    A *working* equivalent of the reference's experimental
    `non_rigid_motion_mlps/point_offset.py` (dead there: it imports a
    nonexistent module, `point_offset.py:5`): the canonical position is
    hash-grid encoded instead of fourier-embedded, concatenated with the
    pose condition, and decoded to a 3-d offset.
    """

    def __init__(self, condition_code_size: int = 69, mlp_width: int = 128,
                 mlp_depth: int = 4, bound: float = 1.5,
                 num_levels: int = 8, level_dim: int = 2,
                 log2_hashmap_size: int = 14):
        from ..ops.hashgrid import HashGridSpec
        self.spec = HashGridSpec.create(
            input_dim=3, num_levels=num_levels, level_dim=level_dim,
            base_resolution=16, log2_hashmap_size=log2_hashmap_size,
            desired_resolution=512 * bound)
        self.bound = float(bound)
        self.condition_code_size = condition_code_size
        self.mlp_width = mlp_width
        self.mlp_depth = mlp_depth

    def init(self, key: jax.Array):
        k_enc, k_mlp = jax.random.split(key)
        keys = jax.random.split(k_mlp, self.mlp_depth + 1)
        n_in = self.spec.output_dim + self.condition_code_size
        layers = [init_linear(keys[0], n_in, self.mlp_width, RELU_GAIN)]
        for i in range(1, self.mlp_depth):
            layers.append(init_linear(keys[i], self.mlp_width,
                                      self.mlp_width, RELU_GAIN))
        layers.append(init_uniform_linear(keys[-1], self.mlp_width, 3,
                                          1e-5))
        return {"encoder": self.spec.init_table(k_enc), "layers": layers}

    def apply(self, params, pos_embed, pos_xyz: jnp.ndarray,
              condition_code: jnp.ndarray):
        from ..ops.hashgrid import hash_grid_encode
        x01 = (pos_xyz + self.bound) / (2 * self.bound)
        enc = hash_grid_encode(x01, params["encoder"], self.spec)
        h = jnp.concatenate([condition_code, enc], axis=-1)
        for i, p in enumerate(params["layers"]):
            h = linear(p, h)
            if i < len(params["layers"]) - 1:
                h = jax.nn.relu(h)
        return {"xyz": pos_xyz + h, "offsets": h}
