"""Platform selection helper.

The axon TPU plugin's sitecustomize force-sets ``jax_platforms`` at
interpreter start, which silently defeats the standard ``JAX_PLATFORMS``
environment variable.  Entry points call :func:`ensure_platform` to make
the env var authoritative again (needed for CPU test/verification runs on
a machine with a TPU attached).
"""

from __future__ import annotations

import os


def ensure_platform() -> None:
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax
    try:
        jax.config.update("jax_platforms", want)
    except Exception:
        pass
