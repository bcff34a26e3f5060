"""Motion-weight volume decoders.

- DeconvVolumeDecoder (reference `mweight_vol_decoders/deconv_vol_decoder.py`
  + `ConvDecoder3D`, `core/utils/network_util.py:12-50`): a learnable 256-d
  constant embedding -> Linear(1024) -> transposed-conv stack
  1³x1024 -> 2³x512 -> 4³x512 -> 8³x256 -> 16³x256 -> 32³x(bones+1),
  LeakyReLU(0.2) between; output ``softmax(decoded + log(prior))``.
- SelfVolumeDecoder (reference `self_vol_decoder.py`): direct learnable
  (bones+1, V, V, V) logits, softmax over channels; seeded with log(prior)
  by the train entry (reference `train.py:29-31`).
"""

from __future__ import annotations

import math
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .layers import init_linear, leaky_relu_gain, linear

_SLOPE = 0.2


def _convt_channel_plan(volume_size: int,
                        base_channels: int = 1024) -> List[tuple]:
    """(in, out) per transposed conv, mirroring ConvDecoder3D's channel
    halving schedule (`network_util.py:26-39`).  ``base_channels`` scales
    the whole plan (1024 = reference-exact; smaller values are a
    TPU-extension used to cover the conv-transpose sharding path on
    memory-limited test meshes)."""
    plan = []
    inc, outc = base_channels, base_channels // 2
    for _ in range(int(np.log2(volume_size)) - 1):
        plan.append((inc, outc))
        if inc == outc:
            outc = inc // 2
        else:
            inc = outc
    return plan, inc


def _init_convt(key: jax.Array, n_in: int, n_out: int, gain: float,
                k: int = 4, s: int = 2) -> Dict[str, jnp.ndarray]:
    """Xavier-uniform w/ transposed-conv fan correction plus the reference's
    blockwise phase-tying init (`network_util.py:247-253,298-313`): all
    2x2x2 output phases share the same sub-kernel."""
    ksize = k ** 3 // s ** 3
    std = gain * math.sqrt(2.0 / ((n_in + n_out) * ksize))
    bound = std * math.sqrt(3.0)
    base = jax.random.uniform(key, (n_in, n_out, k // 2, k // 2, k // 2),
                              minval=-bound, maxval=bound, dtype=jnp.float32)
    # phase tying w[:, :, i::2, j::2, l::2] = base for all 8 phases is a
    # nearest-neighbour upsample of the sub-kernel
    w = base
    for axis in (2, 3, 4):
        w = jnp.repeat(w, 2, axis=axis)
    return {"w": w, "b": jnp.zeros((n_out,), jnp.float32)}


def conv_transpose3d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                     stride: int = 2, pad: int = 1) -> jnp.ndarray:
    """Torch-semantics ConvTranspose3d(k, stride, pad) for NCDHW inputs and
    (in, out, k, k, k) weights: conv of the stride-dilated input with the
    spatially-flipped, io-swapped kernel."""
    k = w.shape[-1]
    rhs = jnp.flip(w, axis=(-1, -2, -3)).transpose(1, 0, 2, 3, 4)  # (O,I,...)
    y = jax.lax.conv_general_dilated(
        x, rhs, window_strides=(1, 1, 1),
        padding=[(k - 1 - pad,) * 2] * 3,
        lhs_dilation=(stride,) * 3,
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))
    return y + b[None, :, None, None, None]


class DeconvVolumeDecoder:
    def __init__(self, embedding_size: int = 256, volume_size: int = 32,
                 total_bones: int = 24, base_channels: int = 1024):
        self.embedding_size = embedding_size
        self.volume_size = volume_size
        self.total_bones = total_bones
        self.base_channels = base_channels
        self.plan, last_in = _convt_channel_plan(volume_size, base_channels)
        self.final = (last_in, total_bones + 1)

    def init(self, key: jax.Array):
        n_convs = len(self.plan) + 1
        keys = jax.random.split(key, n_convs + 2)
        gain = leaky_relu_gain(_SLOPE)
        convs = [_init_convt(keys[i], cin, cout, gain)
                 for i, (cin, cout) in enumerate(self.plan)]
        convs.append(_init_convt(keys[n_convs - 1], *self.final, 1.0))
        return {
            "const_embedding": jax.random.normal(
                keys[-2], (self.embedding_size,), jnp.float32),
            "mlp": init_linear(keys[-1], self.embedding_size,
                               self.base_channels, leaky_relu_gain(_SLOPE)),
            "convs": convs,
        }

    def apply(self, params, motion_weights_priors: jnp.ndarray):
        """priors: (1, bones+1, V, V, V) -> softmax volume of same shape."""
        h = linear(params["mlp"], params["const_embedding"][None])
        h = jax.nn.leaky_relu(h, _SLOPE)
        h = h.reshape(1, self.base_channels, 1, 1, 1)
        for i, c in enumerate(params["convs"]):
            h = conv_transpose3d(h, c["w"], c["b"])
            if i < len(params["convs"]) - 1:
                h = jax.nn.leaky_relu(h, _SLOPE)
        return jax.nn.softmax(h + jnp.log(motion_weights_priors), axis=1)


class SelfVolumeDecoder:
    def __init__(self, embedding_size: int = 256, volume_size: int = 32,
                 total_bones: int = 24):
        self.volume_size = volume_size
        self.total_bones = total_bones

    def init(self, key: jax.Array):
        v = self.volume_size
        return {"matrix": jax.random.normal(
            key, (self.total_bones + 1, v, v, v), jnp.float32)}

    def apply(self, params, motion_weights_priors: jnp.ndarray):
        return jax.nn.softmax(params["matrix"], axis=0)[None]
