"""Hierarchical configuration node.

A clean-room, dependency-light re-implementation of the config surface the
reference framework exposes through its vendored yacs
(`/root/reference/third_parties/yacs/yacs.py`): attribute-style access,
``clone()``, ``merge_from_file()`` and ``merge_from_list()`` with type-checked
merging.  Unlike yacs we deliberately allow *new* keys to be introduced by a
merge (the reference relies on per-subject yaml files adding keys such as
``occlude`` / ``include_img`` that are absent from the defaults —
`configs/occnerf/zju_mocap/387/occnerf.yaml:7,14`).
"""

from __future__ import annotations

import copy
from typing import Any, Dict, List

import yaml


_VALID_SCALAR = (int, float, bool, str, type(None))


class CfgNode(dict):
    """A dict subclass with attribute access and recursive merging."""

    def __init__(self, init_dict: Dict[str, Any] | None = None):
        super().__init__()
        if init_dict:
            for k, v in init_dict.items():
                self[k] = self._convert(v)

    # -- conversion -------------------------------------------------------
    @classmethod
    def _convert(cls, value: Any) -> Any:
        if isinstance(value, CfgNode):
            return value
        if isinstance(value, dict):
            return cls(value)
        if isinstance(value, (list, tuple)):
            return [cls._convert(v) for v in value]
        return value

    # -- attribute access --------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = self._convert(value)

    def __delattr__(self, name: str) -> None:
        try:
            del self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    # -- cloning -----------------------------------------------------------
    def clone(self) -> "CfgNode":
        return copy.deepcopy(self)

    def __deepcopy__(self, memo) -> "CfgNode":
        node = CfgNode()
        memo[id(self)] = node
        for k, v in self.items():
            node[copy.deepcopy(k, memo)] = copy.deepcopy(v, memo)
        return node

    # -- merging -----------------------------------------------------------
    def merge_from_other(self, other: "CfgNode") -> None:
        _merge_into(other, self, [])

    def merge_from_dict(self, d: Dict[str, Any]) -> None:
        self.merge_from_other(CfgNode(d))

    def merge_from_file(self, filename: str) -> None:
        with open(filename, "r") as f:
            loaded = yaml.safe_load(f)
        if loaded is None:
            return
        self.merge_from_other(CfgNode(loaded))

    def merge_from_list(self, opts: List[str]) -> None:
        if opts is None:
            return
        assert len(opts) % 2 == 0, (
            f"Override list has odd length {len(opts)}; it must be "
            f"[key, value, ...] pairs: {opts}"
        )
        for key, value in zip(opts[0::2], opts[1::2]):
            parts = key.split(".")
            node = self
            for p in parts[:-1]:
                if p not in node:
                    node[p] = CfgNode()
                node = node[p]
                assert isinstance(node, CfgNode), f"{key}: {p} is not a config node"
            leaf = parts[-1]
            decoded = _decode_value(value)
            if leaf in node:
                decoded = _coerce(decoded, node[leaf], key)
            node[leaf] = self._convert(decoded)

    # -- (de)serialisation ---------------------------------------------------
    def to_dict(self) -> Dict[str, Any]:
        def _plain(v: Any) -> Any:
            if isinstance(v, CfgNode):
                return {k: _plain(x) for k, x in v.items()}
            if isinstance(v, list):
                return [_plain(x) for x in v]
            return v

        return _plain(self)

    def dump(self) -> str:
        return yaml.safe_dump(self.to_dict(), default_flow_style=False)

    def __str__(self) -> str:
        def _indent(s: str, n: int) -> str:
            pad = " " * n
            return "\n".join(pad + line if line else line for line in s.split("\n"))

        lines = []
        for k in sorted(self.keys(), key=str):
            v = self[k]
            if isinstance(v, CfgNode):
                lines.append(f"{k}:")
                lines.append(_indent(str(v), 2))
            else:
                lines.append(f"{k}: {v!r}")
        return "\n".join(lines)

    def __repr__(self) -> str:
        return f"{self.__class__.__name__}({super().__repr__()})"


def _merge_into(src: CfgNode, dst: CfgNode, path: List[str]) -> None:
    for key, value in src.items():
        full = ".".join(path + [str(key)])
        if key in dst and isinstance(dst[key], CfgNode) and isinstance(value, CfgNode):
            _merge_into(value, dst[key], path + [str(key)])
        elif key in dst and not isinstance(value, CfgNode):
            dst[key] = CfgNode._convert(_coerce(value, dst[key], full))
        else:
            dst[key] = CfgNode._convert(copy.deepcopy(value))


def _coerce(new: Any, old: Any, key: str) -> Any:
    """Type-check a replacement value, with the same leniencies as yacs."""
    if old is None or new is None:
        return new
    if isinstance(old, CfgNode) and isinstance(new, dict):
        return new
    old_t, new_t = type(old), type(new)
    if old_t is new_t:
        return new
    # numeric cross-casts
    if isinstance(old, bool) and isinstance(new, int) and not isinstance(new, bool):
        return bool(new)
    if isinstance(old, float) and isinstance(new, int) and not isinstance(new, bool):
        return float(new)
    if isinstance(old, int) and isinstance(new, float) and not isinstance(old, bool):
        return new  # allow widening int -> float (yaml `0.5` over default `1`)
    if isinstance(old, (list, tuple)) and isinstance(new, (list, tuple)):
        return list(new)
    raise ValueError(
        f"Type mismatch for config key '{key}': cannot replace "
        f"{old_t.__name__} ({old!r}) with {new_t.__name__} ({new!r})"
    )


def _decode_value(value: str) -> Any:
    """Parse a CLI override string into a Python value (yaml-style)."""
    if not isinstance(value, str):
        return value
    try:
        return yaml.safe_load(value)
    except yaml.YAMLError:
        return value
