"""Positional embedders.

- Fourier embedder (reference `core/nets/occnerf/embedders/fourier.py`):
  [x, sin(f_j x), cos(f_j x) ...] with f_j = 2^linspace(0, multires-1).
- Hann-windowed fourier (reference `embedders/hannw_fourier.py`): the
  coarse-to-fine annealed embedding feeding the non-rigid MLP; no raw
  input term, per-frequency window w_j = (1-cos(pi clamp(a-j, 0, 1)))/2
  with a = m*(iter-kick_in)/(full_band-kick_in) — all-zero before
  kick_in_iter.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def fourier_out_dim(multires: int, input_dims: int = 3,
                    include_input: bool = True) -> int:
    return input_dims * ((1 if include_input else 0) + 2 * multires)


def fourier_embed(x: jnp.ndarray, multires: int,
                  include_input: bool = True) -> jnp.ndarray:
    freqs = np.asarray(2.0 ** np.linspace(0.0, multires - 1, multires),
                       dtype=np.float32)
    outs = [x] if include_input else []
    for f in freqs:
        outs.append(jnp.sin(x * f))
        outs.append(jnp.cos(x * f))
    return jnp.concatenate(outs, axis=-1)


def hannw_fourier_embed(x: jnp.ndarray, multires: int, iter_val: jnp.ndarray,
                        kick_in_iter: int, full_band_iter: int) -> jnp.ndarray:
    freqs = np.asarray(2.0 ** np.linspace(0.0, multires - 1, multires),
                       dtype=np.float32)
    t = jnp.clip(jnp.asarray(iter_val, jnp.float32) - kick_in_iter, 0.0, None)
    denom = float(full_band_iter - kick_in_iter)
    alpha = multires * t / denom
    outs = []
    for j, f in enumerate(freqs):
        w = (1.0 - jnp.cos(np.pi * jnp.clip(alpha - j, 0.0, 1.0))) / 2.0
        outs.append(w * jnp.sin(x * f))
        outs.append(w * jnp.cos(x * f))
    return jnp.concatenate(outs, axis=-1)


def get_fourier_embedder(multires: int, i_embed: int = 0,
                         input_dims: int = 3):
    """Registry-facing factory mirroring `fourier.py:34-48`."""
    if i_embed == -1:
        return (lambda x: x), input_dims

    def embed(x):
        return fourier_embed(x, multires, include_input=True)

    return embed, fourier_out_dim(multires, input_dims, True)


def get_hannw_fourier_embedder(multires: int, is_identity: int = 0,
                               iter_val=None, kick_in_iter: int = 0,
                               full_band_iter: int = 1):
    """Registry-facing factory mirroring `hannw_fourier.py:50-63`."""
    if is_identity == -1:
        return (lambda x: x), 3

    def embed(x, it=iter_val):
        return hannw_fourier_embed(x, multires, it, kick_in_iter,
                                   full_band_iter)

    return embed, fourier_out_dim(multires, 3, False)
