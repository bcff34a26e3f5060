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
