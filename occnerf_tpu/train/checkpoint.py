"""Checkpointing.

Same semantics as the reference (`trainer.py:398-430`): a ``{name}``
checkpoint holding ``{iter, network params, optimizer state}`` under the
logdir, with ``latest`` refreshed every ``save_checkpt_interval`` and
permanent ``iter_N`` snapshots every ``save_model_interval``; resume via
``cfg.resume`` / ``cfg.load_net``.

Format: a ``.npz`` of the flattened pytree leaves (C-speed, no
per-element msgpack walk) restored against the caller's pytree templates —
structure comes from the template, data from the file, so restore is
shape-checked the same way the reference's ``load_state_dict(strict=True)``
is.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np


def ckpt_path(logdir: str, name: str) -> str:
    return os.path.join(logdir, f"{name}.ckpt")


def ckpt_exists(logdir: str, name: str) -> bool:
    return os.path.exists(ckpt_path(logdir, name))


def _flatten(tree: Any):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


_SECTIONS = ("params", "state", "opt_state")


def save_ckpt(logdir: str, name: str, *, iter_val: int, params: Any,
              state: Any, opt_state: Any = None) -> str:
    os.makedirs(logdir, exist_ok=True)
    payload = {"params": params, "state": state, "opt_state": opt_state}
    arrays = {"__iter__": np.int64(iter_val)}
    for sec in _SECTIONS:
        leaves, _ = _flatten(payload[sec])
        arrays[f"__n_{sec}__"] = np.int64(len(leaves))
        for i, leaf in enumerate(leaves):
            arrays[f"{sec}_{i}"] = np.asarray(jax.device_get(leaf))
    path = ckpt_path(logdir, name)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)
    return path


def load_ckpt(logdir: str, name: str, *, params_template: Any,
              state_template: Any, opt_state_template: Any = None
              ) -> Dict[str, Any]:
    """Restore into the provided pytree templates (shape-checked; the
    reference pre-sizes dynamic point-cloud params the same way,
    `trainer.py:415-427`).  A ``None`` template skips that section —
    renderers restore params/state without the optimizer."""
    templates = {"params": params_template, "state": state_template,
                 "opt_state": opt_state_template}
    restored: Dict[str, Any] = {}
    with np.load(ckpt_path(logdir, name), allow_pickle=False) as data:
        restored["iter"] = int(data["__iter__"])
        for sec in _SECTIONS:
            tmpl = templates[sec]
            if tmpl is None:
                restored[sec] = None
                continue
            t_leaves, treedef = _flatten(tmpl)
            n = int(data[f"__n_{sec}__"])
            if n != len(t_leaves):
                raise ValueError(
                    f"checkpoint section '{sec}' has {n} leaves, template "
                    f"has {len(t_leaves)} — structure mismatch")
            leaves = []
            for i, t in enumerate(t_leaves):
                arr = data[f"{sec}_{i}"]
                if tuple(arr.shape) != tuple(np.shape(t)):
                    raise ValueError(
                        f"'{sec}' leaf {i} shape {arr.shape} != template "
                        f"{np.shape(t)}")
                leaves.append(arr)
            restored[sec] = jax.tree_util.tree_unflatten(treedef, leaves)
    return restored
