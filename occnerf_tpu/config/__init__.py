"""Global configuration singleton.

The reference builds its ``cfg``/``args`` singletons at import time via
argparse (`/root/reference/configs/config.py:65-72`), which makes the package
unusable as a library.  We keep the same public names (``cfg``, ``args``,
``make_cfg``) but initialise lazily: apps call :func:`parse_args` +
:func:`make_cfg` (or :func:`init_cfg`); tests call :func:`set_cfg` with a
programmatically-built node.  ``cfg`` is a live proxy so ``from
occnerf_tpu.config import cfg`` observes later initialisation, matching the
reference's pervasive `from configs import cfg` idiom.
"""

from __future__ import annotations

import argparse
import os
from typing import Any, List, Optional

from .node import CfgNode
from .defaults import get_default_cfg

__all__ = ["CfgNode", "cfg", "args", "get_default_cfg", "make_cfg",
           "set_cfg", "init_cfg", "parse_args"]


class _CfgProxy:
    """Attribute/bracket proxy over the active CfgNode."""

    _node: Optional[CfgNode] = None

    def _require(self) -> CfgNode:
        if _CfgProxy._node is None:
            # default-initialise so library use "just works"
            _CfgProxy._node = get_default_cfg()
        return _CfgProxy._node

    # dict-ish surface
    def __getattr__(self, name: str) -> Any:
        return getattr(self._require(), name)

    def __setattr__(self, name: str, value: Any) -> None:
        setattr(self._require(), name, value)

    def __getitem__(self, key: str) -> Any:
        return self._require()[key]

    def __setitem__(self, key: str, value: Any) -> None:
        self._require()[key] = value

    def __contains__(self, key: str) -> bool:
        return key in self._require()

    def __iter__(self):
        return iter(self._require())

    def keys(self):
        return self._require().keys()

    def items(self):
        return self._require().items()

    def get(self, key: str, default: Any = None) -> Any:
        return self._require().get(key, default)

    def node(self) -> CfgNode:
        return self._require()

    def __str__(self) -> str:
        return str(self._require())


cfg = _CfgProxy()


class _Args:
    """Parsed CLI arguments (populated by parse_args)."""

    cfg: Optional[str] = None
    eval: str = "full"
    type: str = "skip"
    opts: List[str] = []


args = _Args()


def parse_args(argv: Optional[List[str]] = None) -> _Args:
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", required=True, type=str)
    parser.add_argument("--eval", default="full", type=str)
    parser.add_argument("--type", default="skip", type=str)
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    ns = parser.parse_args(argv)
    args.cfg = ns.cfg
    args.eval = ns.eval
    args.type = ns.type
    args.opts = ns.opts or []
    return args


def _parse_derived(c: CfgNode) -> None:
    """Derive logdir exactly like the reference (configs/config.py:33)."""
    c.logdir = os.path.join(
        "experiments", c.category, c.get("task", "task"),
        c.get("subject", "subject"), c.get("experiment", "experiment"))


def _merge_yaml_with_base(c: CfgNode, path: str, _depth: int = 0) -> None:
    """Merge a yaml file into ``c``, honouring an optional top-level
    ``_base_: <relative path>`` key (merged first, recursively).

    Beyond-reference addition that keeps overlay configs (e.g. the
    ``occnerf_tpu.yaml`` TPU recipes) free of duplicated subject blocks;
    plain reference-style yamls have no ``_base_`` and behave unchanged.
    """
    import yaml

    if _depth > 8:
        raise ValueError(f"_base_ chain too deep at {path}")
    with open(path) as f:
        d = yaml.safe_load(f) or {}
    base = d.pop("_base_", None)
    if base:
        _merge_yaml_with_base(
            c, os.path.join(os.path.dirname(path), base), _depth + 1)
    c.merge_from_dict(d)


def make_cfg(a: Optional[_Args] = None) -> CfgNode:
    """defaults -> (optional default.yaml next to subject cfg) -> subject
    yaml (with optional ``_base_`` chain) -> CLI opt list, then derive
    logdir."""
    a = a or args
    c = get_default_cfg()
    if a.cfg:
        # honour a sibling/ancestor default.yaml if the config tree ships one
        for cand in ("configs/default.yaml",
                     os.path.join(os.path.dirname(a.cfg), "default.yaml")):
            if os.path.exists(cand) and os.path.abspath(cand) != os.path.abspath(a.cfg):
                c.merge_from_file(cand)
                break
        _merge_yaml_with_base(c, a.cfg)
    if a.opts:
        c.merge_from_list(a.opts)
    _parse_derived(c)
    set_cfg(c)
    return c


def init_cfg(path: Optional[str] = None, opts: Optional[List[str]] = None) -> CfgNode:
    """Programmatic equivalent of parse_args + make_cfg."""
    args.cfg = path
    args.opts = opts or []
    return make_cfg(args)


def set_cfg(c: CfgNode) -> CfgNode:
    if not isinstance(c, CfgNode):
        c = CfgNode(c)
    if "logdir" not in c:
        _parse_derived(c)
    _CfgProxy._node = c
    return c
