"""Training: trainer, optimizer factory, LR schedules, checkpointing.

Public factory surface mirrors `core/train/__init__.py:1-3`.
"""

from .. import registry
from ..config import cfg


def create_trainer(network, statics, params, state, **kwargs):
    trainer_cls = registry.resolve("trainer", cfg.trainer_module)
    return trainer_cls(network, statics, params, state, **kwargs)


def create_optimizer(params):
    get_opt = registry.resolve("optimizer", cfg.optimizer_module)
    return get_opt(params)


def create_lr_updater():
    return registry.resolve("lr_updater", cfg.lr_updater_module)
