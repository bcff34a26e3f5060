"""Component registry.

The reference resolves every pluggable component at runtime from a config
string via ``imp.load_source`` (`/root/reference/core/nets/create_network.py:5-9`,
`core/nets/occnerf/component_factory.py:3-26`, `core/data/create_dataset.py:13-17`).
We keep the *config strings* as the public API but resolve them through an
explicit registry of lazy import targets — no filesystem-path imports, and
new components register with :func:`register`.

The reference's torch module paths (e.g. ``core.nets.occnerf.network``) are
pre-registered as aliases of the TPU-native implementations so existing yaml
configs work verbatim.
"""

from __future__ import annotations

import importlib
from typing import Any, Dict

_REGISTRY: Dict[str, Dict[str, str]] = {}


def register(kind: str, key: str, target: str) -> None:
    """Register ``kind``/``key`` -> ``"module:attr"`` lazy target."""
    _REGISTRY.setdefault(kind, {})[key] = target


def resolve(kind: str, key: str) -> Any:
    table = _REGISTRY.get(kind, {})
    if key not in table:
        known = ", ".join(sorted(table))
        raise KeyError(f"Unknown {kind} module '{key}'. Registered: {known}")
    target = table[key]
    mod_name, _, attr = target.partition(":")
    mod = importlib.import_module(mod_name)
    return getattr(mod, attr) if attr else mod


def registered(kind: str) -> Dict[str, str]:
    return dict(_REGISTRY.get(kind, {}))


def _alias(kind: str, keys, target: str) -> None:
    for k in keys:
        register(kind, k, target)


# ---------------------------------------------------------------------------
# Built-in components.  Reference module paths are aliases of ours.
# ---------------------------------------------------------------------------

_alias("network",
       ["core.nets.occnerf.network", "occnerf_tpu.models.network"],
       "occnerf_tpu.models.network:Network")

_alias("embedder",
       ["core.nets.occnerf.embedders.fourier",
        "occnerf_tpu.models.embedders.fourier"],
       "occnerf_tpu.models.embedders:get_fourier_embedder")
_alias("embedder",
       ["core.nets.occnerf.embedders.hannw_fourier",
        "occnerf_tpu.models.embedders.hannw_fourier"],
       "occnerf_tpu.models.embedders:get_hannw_fourier_embedder")

_alias("canonical_mlp",
       ["core.nets.occnerf.canonical_mlps.mlp_rgb_sigma",
        "occnerf_tpu.models.canonical.mlp_rgb_sigma"],
       "occnerf_tpu.models.canonical:VanillaCanonicalMLP")
_alias("canonical_mlp",
       ["core.nets.occnerf.canonical_mlps.occnerf_mlp",
        # the shipped ocmotion configs spell it without the _mlp suffix
        # (`configs/occnerf/ocmotion/0011_02/occnerf.yaml:8`)
        "core.nets.occnerf.canonical_mlps.occnerf",
        "occnerf_tpu.models.canonical.occnerf_mlp"],
       "occnerf_tpu.models.canonical:OccNeRFCanonicalMLP")

_alias("mweight_vol_decoder",
       ["core.nets.occnerf.mweight_vol_decoders.deconv_vol_decoder",
        "occnerf_tpu.models.mweight.deconv_vol_decoder"],
       "occnerf_tpu.models.mweight:DeconvVolumeDecoder")
_alias("mweight_vol_decoder",
       ["core.nets.occnerf.mweight_vol_decoders.self_vol_decoder",
        "occnerf_tpu.models.mweight.self_vol_decoder"],
       "occnerf_tpu.models.mweight:SelfVolumeDecoder")

_alias("non_rigid_motion_mlp",
       ["core.nets.occnerf.non_rigid_motion_mlps.mlp_offset",
        "occnerf_tpu.models.nonrigid.mlp_offset"],
       "occnerf_tpu.models.nonrigid:NonRigidMotionMLP")
_alias("non_rigid_motion_mlp",
       ["core.nets.occnerf.non_rigid_motion_mlps.point_offset",
        "occnerf_tpu.models.nonrigid.point_offset"],
       "occnerf_tpu.models.nonrigid:PointOffsetMLP")

_alias("pose_decoder",
       ["core.nets.occnerf.pose_decoders.mlp_delta_body_pose",
        "occnerf_tpu.models.pose_refiner.mlp_delta_body_pose"],
       "occnerf_tpu.models.pose_refiner:BodyPoseRefiner")

_alias("trainer",
       ["core.train.trainers.occnerf.trainer", "occnerf_tpu.train.trainer"],
       "occnerf_tpu.train.trainer:Trainer")

_alias("optimizer",
       ["core.train.optimizers.occnerf.optimizer", "occnerf_tpu.train.optimizer"],
       "occnerf_tpu.train.optimizer:get_optimizer")

_alias("lr_updater",
       ["core.train.trainers.occnerf.lr_updaters.exp_decay",
        "occnerf_tpu.train.lr.exp_decay"],
       "occnerf_tpu.train.lr:exp_decay_schedule")

_alias("dataset",
       ["core.data.occnerf.train", "occnerf_tpu.data.train"],
       "occnerf_tpu.data.train:Dataset")
_alias("dataset",
       ["core.data.occnerf.freeview", "occnerf_tpu.data.freeview"],
       "occnerf_tpu.data.freeview:Dataset")
_alias("dataset",
       ["core.data.occnerf.tpose", "occnerf_tpu.data.tpose"],
       "occnerf_tpu.data.tpose:Dataset")
_alias("dataset",
       ["core.data.occnerf.allview", "occnerf_tpu.data.allview"],
       "occnerf_tpu.data.allview:Dataset")
_alias("dataset",
       ["core.data.occnerf.backview", "occnerf_tpu.data.backview"],
       "occnerf_tpu.data.backview:Dataset")
