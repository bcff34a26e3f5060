"""Volume-rendering compositing along rays.

Behavioral equivalent of the reference's ``_raw2outputs``
(`core/nets/occnerf/network.py:320-348`): softplus-density alpha,
exclusive-cumprod transmittance, sigmoid RGB, background compositing and
the alpha-argmax termination index used by the visibility counter.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RenderOutputs(NamedTuple):
    rgb: jnp.ndarray        # (N, 3)
    acc: jnp.ndarray        # (N,)
    weights: jnp.ndarray    # (N, S)
    depth: jnp.ndarray      # (N,)
    term_idx: jnp.ndarray   # (N,) int32 argmax of alpha along the ray


def raw2outputs(raw: jnp.ndarray, raw_mask: jnp.ndarray, z_vals: jnp.ndarray,
                rays_d: jnp.ndarray, bgcolor: jnp.ndarray) -> RenderOutputs:
    """Composite per-sample (rgb, sigma) into per-ray outputs.

    Args:
        raw: (N, S, 4+) — channels [:3] rgb logits, [3] density logits.
        raw_mask: (N, S, 1) foreground-likelihood mask multiplied into alpha.
        z_vals: (N, S) sample depths.
        rays_d: (N, 3) (unnormalized) ray directions.
        bgcolor: (3,) in [0, 255] (divided by 255 here, like the reference).
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1)
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    rgb = jax.nn.sigmoid(raw[..., :3])
    alpha = 1.0 - jnp.exp(-jax.nn.softplus(raw[..., 3]) * dists)
    alpha = alpha * raw_mask[:, :, 0]

    # exclusive cumulative transmittance: prod_{j<i} (1 - alpha_j + 1e-10)
    t = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[:, :1]),
                         1.0 - alpha + 1e-10], axis=-1), axis=-1)[:, :-1]
    weights = alpha * t

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    rgb_map = rgb_map + (1.0 - acc_map[..., None]) * bgcolor[None, :] / 255.0

    term_idx = jnp.argmax(alpha, axis=1).astype(jnp.int32)
    return RenderOutputs(rgb_map, acc_map, weights, depth_map, term_idx)


def sample_zvals(near: jnp.ndarray, far: jnp.ndarray, n_samples: int
                 ) -> jnp.ndarray:
    """Uniform depth samples between near and far (`network.py:416-420`)."""
    t = jnp.linspace(0.0, 1.0, n_samples)
    return near * (1.0 - t) + far * t


def stratify_zvals(key: jax.Array, z_vals: jnp.ndarray) -> jnp.ndarray:
    """Stratified jitter within bins (`network.py:423-432`)."""
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
    lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
    t = jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
    return lower + (upper - lower) * t
