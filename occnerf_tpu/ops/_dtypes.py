"""Shared per-call matmul-dtype helper for the Pallas kernels.

The motion and hash-grid kernels accept a per-call matmul input dtype
(float32 = exact; bfloat16 = ~8-bit-mantissa rounding, ~2x MXU rate,
f32 accumulation either way).  custom_vjp static args must be hashable,
so calls thread a short string key resolved back through ``DTYPES``.
"""

from __future__ import annotations

import jax.numpy as jnp

DTYPES = {"f32": jnp.float32, "bf16": jnp.bfloat16}


def dt_key(dtype) -> str:
    """Hashable key for a matmul dtype (custom_vjp static arg)."""
    return "bf16" if jnp.dtype(dtype) == jnp.bfloat16 else "f32"
