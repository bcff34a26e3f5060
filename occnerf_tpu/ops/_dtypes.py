"""Shared per-call matmul compute-mode helper for the Pallas kernels.

The motion, hash-grid and vertagg kernels accept a per-call matmul
compute mode.  custom_vjp static args must be hashable, so calls thread
a short string key; :func:`mxu_dot` resolves it into the right MXU
schedule (accumulation is float32 in every mode):

    key      inputs    MXU passes   error vs exact f32
    "f32"    float32   several      exact to f32 ulp   (HIGHEST)
    "f32h"   float32   3            ~1e-6 relative     (manual bf16x3)
    "bf16"   bfloat16  1            ~2e-3 relative     (DEFAULT)

Measured on v5e (2026-08, _prec_check.py geometry; max-rel error vs
the XLA AD oracle / exact path):

    kernel                      f32         f32h ("tf32")   bf16
    vertagg bwd  19k queries    17.7 ms     12.6  (4e-6)    11.8  (2e-3)
    motion fwd   196k x 24      186 ms      116   (1e-5)    98.7  (4e-3)
    hashgrid f+b 49k, 2^14      45.5 ms     36.4  (3e-6)    42.2  (2e-3)

The vertagg backward is dominated by its VPU one-hot build, so its
mode barely matters; the motion and hash-grid kernels see 20-40%
savings from "f32h" at ~1e-6 error.  (The hash-grid one-hot helper
makes bf16 only one pass cheaper than f32h, within timing noise.)

CRITICAL precision notes (both measured on v5e):

1. The TPU MXU multiplies bf16 natively, and a dot with DEFAULT
   precision runs ONE bf16 pass even on float32 inputs — i.e. without
   an explicit ``precision`` the "f32" kernels silently round both
   operands to 8 mantissa bits (~0.2% relative error on the vertagg
   table gradient vs the exact XLA scatter; interpret-mode CPU tests
   cannot catch this).  Rounds 1-3 benchmarked without it, so their
   "f32" numbers were de-facto one-pass bf16 (docs/ROADMAP.md r4 perf
   notes re-baseline this honestly).
2. Mosaic's dot lowering accepts only DEFAULT and HIGHEST —
   ``lax.Precision.HIGH`` (XLA's bf16x3) raises ``NotImplementedError``
   inside a Pallas kernel (jax/_src/pallas/mosaic/lowering.py
   ``_dot_general_lowering_rule``).  The "f32h" mode therefore splits
   each operand into bf16 high+low halves by hand and issues three
   DEFAULT-precision dots: A@B ~= Ah@Bh + (Ah@Bl + Al@Bh), dropping
   only the Al@Bl term (~2^-32 relative).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DTYPES = {"f32": jnp.float32, "f32h": jnp.float32, "bf16": jnp.bfloat16}

# config-string spellings (cfg.tpu.*_compute_dtype) -> key
_CFG_NAMES = {
    "float32": "f32", "f32": "f32",
    "tfloat32": "f32h", "tf32": "f32h", "f32h": "f32h",
    "bfloat16": "bf16", "bf16": "bf16",
}


def dt_key(dtype_or_key) -> str:
    """Hashable key for a matmul compute mode (custom_vjp static arg).
    Accepts a key/config string ("f32", "tf32", "bfloat16", ...) or a
    dtype; bare float32 means exact."""
    if isinstance(dtype_or_key, str) and dtype_or_key in _CFG_NAMES:
        return _CFG_NAMES[dtype_or_key]
    return ("bf16" if jnp.dtype(dtype_or_key) == jnp.bfloat16 else "f32")


def _bf16_split(x):
    """x (f32) -> (hi, lo) bf16 with hi + lo == x to bf16x2 fidelity."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def mxu_dot(a, b, key: str):
    """``a @ b`` on the MXU at the given compute mode, f32 accumulation.
    Mosaic-safe (see module docstring): never emits Precision.HIGH."""
    # precision is pinned on every dot: an unpinned dot resolves the
    # GLOBAL jax default_matmul_precision at trace time, so a
    # tpu.xla_matmul_precision=tensorfloat32 session would push
    # Precision.HIGH into these kernel dots and Mosaic would reject it.
    _d = jax.lax.Precision.DEFAULT
    if key == "bf16":
        return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32, precision=_d)
    if key == "f32h":
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
        ah, al = _bf16_split(a)
        bh, bl = _bf16_split(b)
        f32 = jnp.float32
        return (jnp.dot(ah, bh, preferred_element_type=f32, precision=_d)
                + (jnp.dot(ah, bl, preferred_element_type=f32, precision=_d)
                   + jnp.dot(al, bh, preferred_element_type=f32,
                             precision=_d)))
    return jnp.dot(a.astype(jnp.float32), b.astype(jnp.float32),
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def mxu_dot_onehot(onehot, b, key: str, transpose_lhs: bool = False):
    """``onehot @ b`` (or ``onehot.T @ b``) where the LHS is EXACTLY
    bf16-representable (0/1 one-hot masks, as in the hash-grid encode).
    Exploits that to run cheaper schedules than the generic
    :func:`mxu_dot`: the LHS never needs splitting, so exact f32 is a
    3-term split of ``b`` (3 MXU passes vs HIGHEST's 6) and "f32h" a
    2-term split (2 passes).  bf16: 1 pass.

    3-term exactness: a normal f32 has 24 mantissa bits and each bf16
    term carries 8, so ``b == b1 + b2 + b3`` exactly (the usual
    two-prod split argument); with an exact 0/1 LHS each pass is then
    an exact product and the f32 accumulation matches Precision.HIGHEST
    to the ulp of the final sum.
    """
    oh = onehot.astype(jnp.bfloat16)
    if transpose_lhs:
        oh = oh.T
    f32 = jnp.float32

    def p(term):
        # DEFAULT pinned for the same global-precision-leak reason as
        # mxu_dot — each bf16 pass must stay a single MXU pass.
        return jnp.dot(oh, term, preferred_element_type=f32,
                       precision=jax.lax.Precision.DEFAULT)

    if key == "bf16":
        return p(b.astype(jnp.bfloat16))
    b = b.astype(f32)
    b1 = b.astype(jnp.bfloat16)
    rem = b - b1.astype(f32)
    b2 = rem.astype(jnp.bfloat16)
    if key == "f32h":
        return p(b1) + p(b2)
    b3 = (rem - b2.astype(f32)).astype(jnp.bfloat16)
    return p(b1) + (p(b2) + p(b3))


def matmul_precision(key_or_dtype):
    """Dot precision for an XLA-side (non-Pallas) matmul at the given
    compute mode.  Inside Pallas kernels use :func:`mxu_dot` — Mosaic
    rejects Precision.HIGH (see module docstring)."""
    key = (key_or_dtype if isinstance(key_or_dtype, str)
           else dt_key(key_or_dtype))
    return {"f32": jax.lax.Precision.HIGHEST,
            "f32h": jax.lax.Precision.HIGH,
            "bf16": jax.lax.Precision.DEFAULT}[key]
