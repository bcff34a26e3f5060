"""Optimizer factory.

Behavioral equivalent of the reference optimizer
(`core/train/optimizers/occnerf/optimizer.py:9-43`): Adam(0.9, 0.999) with
per-parameter learning-rate groups selected by name-substring match against
the ``cfg.train.lr_*`` table (e.g. ``lr_mweight_vol_decoder``), composed
the optax way: global-norm clip 1.0 (reference `trainer.py:248`) then
``optax.multi_transform`` with one exp-decay Adam chain per group.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import optax

from ..config import cfg
from .lr import NO_DECAY_SUBSTRINGS, exp_decay_schedule


def _lr_table() -> Dict[str, float]:
    """cfg.train.lr_<name> entries, longest-name-first so the most specific
    substring wins (mirrors the reference's dict iteration match)."""
    table = {k[len("lr_"):]: float(v) for k, v in cfg.train.items()
             if k.startswith("lr_")}
    return dict(sorted(table.items(), key=lambda kv: -len(kv[0])))


def _label_for(path_str: str, table: Dict[str, float]) -> str:
    for name in table:
        if name in path_str:
            return name
    return "__base__"


def param_labels(params: Dict[str, Any]) -> Dict[str, Any]:
    """Pytree of group labels, keyed by top-level-down path substrings."""
    table = _lr_table()
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label_tree(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: _label_for(
                "/".join(str(getattr(p, "key", getattr(p, "idx", "")))
                         for p in path), table),
            tree)

    del flat
    return label_tree(params)


def get_optimizer(params: Dict[str, Any]
                  ) -> Tuple[optax.GradientTransformation, Any]:
    """Build the optimizer and its initial state for a params pytree."""
    assert cfg.train.optimizer == "adam", cfg.train.optimizer
    table = _lr_table()
    base_lr = float(cfg.train.lr)

    def adam_chain(lr: float, decay: bool) -> optax.GradientTransformation:
        return optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale_by_schedule(exp_decay_schedule(lr, decay=decay)),
            optax.scale(-1.0),
        )

    transforms = {"__base__": adam_chain(base_lr, decay=True)}
    for name, lr in table.items():
        decay = not any(s in name for s in NO_DECAY_SUBSTRINGS)
        transforms[name] = adam_chain(lr, decay=decay)

    labels = param_labels(params)
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.multi_transform(transforms, labels),
    )
    return tx, tx.init(params)
