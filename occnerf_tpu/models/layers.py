"""Parameter initialisation and MLP plumbing.

Pure-function, pytree-of-dicts style: each module exposes ``init(key, ...)
-> params`` and ``apply(params, ...) -> out``.  Initialisation reproduces
the reference's distributions (`core/utils/network_util.py:207-334`):
xavier-uniform with the activation gain of the *following* layer
(sqrt(2) before ReLU, sqrt(2/(1+a^2)) before LeakyReLU(a), 1.0 for the
last layer), zero biases.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

RELU_GAIN = math.sqrt(2.0)


def leaky_relu_gain(negative_slope: float) -> float:
    return math.sqrt(2.0 / (1.0 + negative_slope ** 2))


def init_linear(key: jax.Array, n_in: int, n_out: int,
                gain: float = 1.0) -> Dict[str, jnp.ndarray]:
    """U(-std*sqrt(3), std*sqrt(3)) with std = gain*sqrt(2/(n_in+n_out))."""
    std = gain * math.sqrt(2.0 / (n_in + n_out))
    bound = std * math.sqrt(3.0)
    w = jax.random.uniform(key, (n_in, n_out), minval=-bound, maxval=bound,
                           dtype=jnp.float32)
    return {"w": w, "b": jnp.zeros((n_out,), jnp.float32)}


def init_uniform_linear(key: jax.Array, n_in: int, n_out: int,
                        bound: float) -> Dict[str, jnp.ndarray]:
    """U(-bound, bound) weights, zero bias (for near-identity last layers)."""
    w = jax.random.uniform(key, (n_in, n_out), minval=-bound, maxval=bound,
                           dtype=jnp.float32)
    return {"w": w, "b": jnp.zeros((n_out,), jnp.float32)}


def linear(p: Dict[str, jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
    return x @ p["w"] + p["b"]


def init_mlp(key: jax.Array, dims: Sequence[int],
             last_gain: float = 1.0,
             hidden_gain: float = RELU_GAIN) -> List[Dict[str, jnp.ndarray]]:
    """Init a plain MLP: hidden layers get ``hidden_gain``, last ``last_gain``."""
    n = len(dims) - 1
    keys = jax.random.split(key, n)
    layers = []
    for i in range(n):
        gain = hidden_gain if i < n - 1 else last_gain
        layers.append(init_linear(keys[i], dims[i], dims[i + 1], gain))
    return layers


def apply_mlp(layers: Sequence[Dict[str, jnp.ndarray]], x: jnp.ndarray,
              skip_input: Optional[jnp.ndarray] = None,
              skip_at: Sequence[int] = (),
              final_activation: bool = False) -> jnp.ndarray:
    """ReLU MLP; at layer indices in ``skip_at`` the input is re-concatenated
    *before* the layer (matching the reference's skip wiring)."""
    h = x
    n = len(layers)
    for i, p in enumerate(layers):
        if i in skip_at:
            h = jnp.concatenate([h, skip_input], axis=-1)
        h = linear(p, h)
        if i < n - 1 or final_activation:
            h = jax.nn.relu(h)
    return h


def rodrigues_device(rvec: jnp.ndarray) -> jnp.ndarray:
    """Batched axis-angle -> R with the reference's on-device regularisation
    ``theta = sqrt(1e-5 + |r|^2)`` (`network_util.py:98-124`)."""
    theta = jnp.sqrt(1e-5 + jnp.sum(rvec ** 2, axis=-1))
    r = rvec / theta[..., None]
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    x, y, z = r[..., 0], r[..., 1], r[..., 2]
    one = jnp.ones_like(c)
    R = jnp.stack([
        x * x + (one - x * x) * c, x * y * (one - c) - z * s,
        x * z * (one - c) + y * s,
        x * y * (one - c) + z * s, y * y + (one - y * y) * c,
        y * z * (one - c) - x * s,
        x * z * (one - c) - y * s, y * z * (one - c) + x * s,
        z * z + (one - z * z) * c,
    ], axis=-1)
    return R.reshape(rvec.shape[:-1] + (3, 3))
