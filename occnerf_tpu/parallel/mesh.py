"""Device mesh construction and batch sharding layout."""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import cfg

# batch keys carrying a leading/inner ray axis, sharded over the mesh.
# key -> index of the ray axis in that array's shape.
RAY_SHARDED_KEYS = {
    "rays": 1,          # (2, N, 3)
    "near": 0,          # (N, 1)
    "far": 0,           # (N, 1)
    "ray_valid": 0,     # (N,)
    "target_rgbs": 0,   # (N, 3) image mode
    "ray_alpha": 0,     # (N, C)
}


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: Optional[str] = None) -> Mesh:
    """1-D data mesh over all (or the given) devices.

    Shape/axis names come from ``cfg.tpu.mesh_shape`` /
    ``cfg.tpu.mesh_axis_names``; a -1 entry means "all devices".  When
    ``devices`` is not given, ``mesh_shape=[n]`` takes the first n local
    devices (n must not exceed the local device count).
    """
    if devices is None:
        devices = jax.devices()
        shape = cfg.get("tpu", {}).get("mesh_shape", [-1])
        n = int(shape[0]) if shape else -1
        if n > 0:
            if n > len(devices):
                raise ValueError(
                    f"tpu.mesh_shape requests {n} devices but only "
                    f"{len(devices)} are visible")
            devices = devices[:n]
    devices = list(devices)
    names = cfg.get("tpu", {}).get("mesh_axis_names", ["data"])
    axis_name = axis_name or names[0]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_shardings(mesh: Mesh, batch: Dict[str, Any],
                    axis_name: Optional[str] = None) -> Dict[str, Any]:
    """NamedSharding per batch key: ray-axis keys sharded, rest replicated.

    Ray counts are always padded to a multiple of the bucket/patch size by
    the data layer; callers must pick bucket sizes divisible by the mesh
    size.
    """
    axis_name = axis_name or mesh.axis_names[0]
    out = {}
    for k, v in batch.items():
        if k in RAY_SHARDED_KEYS and hasattr(v, "ndim"):
            axis = RAY_SHARDED_KEYS[k]
            spec = [None] * v.ndim
            spec[axis] = axis_name
            out[k] = NamedSharding(mesh, P(*spec))
        else:
            out[k] = NamedSharding(mesh, P())
    return out


def shard_batch(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """device_put each batch array with its sharding.

    Host numpy arrays go straight to their target shards (no staging copy
    through the default device).
    """
    shardings = batch_shardings(mesh, batch)
    return {k: jax.device_put(
                v if hasattr(v, "ndim") else np.asarray(v), shardings[k])
            for k, v in batch.items()}


def replicated(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree (params/state/statics) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding)
        if hasattr(x, "ndim") else x, tree)
