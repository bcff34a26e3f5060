"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on a virtual CPU mesh
(xla_force_host_platform_device_count) since only one real TPU chip is
attached in CI; the driver separately dry-runs the multi-chip path.
"""

import os

# Force (not setdefault): the axon harness exports JAX_PLATFORMS=axon into
# every process, and the CLI entry points call ensure_platform() which
# makes the env var authoritative — with the var left at "axon", the first
# CLI test silently flipped the whole pytest process onto the real TPU
# chip and every later test computed with TPU transcendental numerics
# (~1e-5 drift on exp/softmax: the round-1/2 "order-dependent flakes").
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) force-sets jax_platforms="axon,cpu"
# at interpreter start, defeating the env var — override after import.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _fresh_cfg():
    """Each test starts from pristine defaults."""
    from occnerf_tpu.config import set_cfg, get_default_cfg
    set_cfg(get_default_cfg())
    yield


@pytest.fixture(autouse=True)
def _no_platform_leak():
    """Fail the *leaking* test if it flips jax off the CPU test platform
    (e.g. via ensure_platform with a TPU env var) instead of letting
    every numeric test downstream fail by silent TPU-vs-CPU drift."""
    yield
    assert jax.default_backend() == "cpu", (
        "this test leaked a jax platform change "
        f"(default_backend={jax.default_backend()!r}); suite must stay "
        "on the virtual CPU mesh")
