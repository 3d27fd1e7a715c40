"""Lightweight hierarchical config system.

A from-scratch replacement for the yacs ``CfgNode`` used by the reference
(``lib/config/default.py:15-18``): attribute-style access, three-level
precedence (code defaults < YAML file < CLI dotted ``KEY VALUE`` overrides),
and freezing after merge.  Unlike yacs this is a plain ~150-line module with
no external dependency, and it deliberately reproduces the two yacs behaviors
the reference relies on:

* YAML scalars that *look* like Python literals (e.g. ``GPUS: (0,)`` which
  YAML parses as the string ``"(0,)"``) are decoded with
  ``ast.literal_eval`` so reference experiment YAMLs load unchanged.
* CLI override values given as strings are coerced the same way
  (``merge_from_list`` mirrors yacs ``_decode_cfg_value``).
"""

from __future__ import annotations

import ast
import copy
from typing import Any, Dict, List

import yaml


class FrozenError(AttributeError):
    pass


def _decode(value: Any) -> Any:
    """Decode a YAML/CLI scalar the way yacs does.

    Strings that parse as Python literals (tuples, lists, numbers, bools,
    None) are converted; everything else passes through untouched.
    """
    if isinstance(value, dict):
        return CfgNode(value)
    if not isinstance(value, str):
        return value
    if value.lower() in ("true", "false"):
        return value.lower() == "true"
    try:
        return ast.literal_eval(value)
    except (ValueError, SyntaxError):
        return value


def _check_type_match(old: Any, new: Any, key: str) -> Any:
    """Allow value replacement when types are compatible (yacs semantics)."""
    if old is None or new is None:
        return new
    if isinstance(old, type(new)) or isinstance(new, type(old)):
        return new
    # int/float promotion and list/tuple interchange
    casts = [(tuple, list), (list, tuple), (int, float), (float, int)]
    for src, dst in casts:
        if isinstance(new, src) and isinstance(old, dst):
            return dst(new)
    raise TypeError(
        f"type mismatch for key '{key}': {type(old).__name__} vs {type(new).__name__}"
    )


class CfgNode(dict):
    """dict with attribute access, recursive merge, and freeze support."""

    _FROZEN = "_is_frozen"
    _NEW_ALLOWED = "_new_allowed"

    def __init__(self, init: Dict | None = None, new_allowed: bool = False):
        super().__init__()
        object.__setattr__(self, CfgNode._FROZEN, False)
        object.__setattr__(self, CfgNode._NEW_ALLOWED, new_allowed)
        if init:
            for k, v in init.items():
                self[k] = CfgNode(v, new_allowed=new_allowed) if isinstance(v, dict) else v

    # -- attribute protocol ---------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        if object.__getattribute__(self, CfgNode._FROZEN):
            raise FrozenError(f"config is frozen; cannot set '{name}'")
        self[name] = value

    # -- freeze ---------------------------------------------------------------
    def freeze(self) -> None:
        self._set_frozen(True)

    def defrost(self) -> None:
        self._set_frozen(False)

    def is_frozen(self) -> bool:
        return object.__getattribute__(self, CfgNode._FROZEN)

    def _set_frozen(self, flag: bool) -> None:
        object.__setattr__(self, CfgNode._FROZEN, flag)
        for v in self.values():
            if isinstance(v, CfgNode):
                v._set_frozen(flag)

    # -- merging --------------------------------------------------------------
    def merge_from_other(self, other: "CfgNode") -> None:
        self._merge(other, [])

    def _merge(self, other: Dict, path: List[str]) -> None:
        for k, v in other.items():
            full = ".".join(path + [str(k)])
            v = _decode(v)
            if k in self:
                old = self[k]
                if isinstance(old, CfgNode) and isinstance(v, dict):
                    old._merge(v, path + [str(k)])
                else:
                    dict.__setitem__(self, k, _check_type_match(old, v, full))
            elif object.__getattribute__(self, CfgNode._NEW_ALLOWED):
                dict.__setitem__(
                    self, k, CfgNode(v, new_allowed=True) if isinstance(v, dict) else v
                )
            else:
                raise KeyError(f"non-existent config key: {full}")

    def merge_from_file(self, filename: str) -> None:
        with open(filename, "r") as f:
            loaded = yaml.safe_load(f)
        if loaded:
            self._merge(loaded, [])

    def merge_from_list(self, opts: List[str]) -> None:
        assert len(opts) % 2 == 0, f"override list must be key/value pairs, got {opts}"
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                if p not in node:
                    raise KeyError(f"non-existent config key: {key}")
                node = node[p]
            leaf = parts[-1]
            if leaf not in node and not object.__getattribute__(node, CfgNode._NEW_ALLOWED):
                raise KeyError(f"non-existent config key: {key}")
            old = node.get(leaf)
            dict.__setitem__(node, leaf, _check_type_match(old, _decode(value), key))

    # -- misc -----------------------------------------------------------------
    def clone(self) -> "CfgNode":
        return copy.deepcopy(self)

    def to_dict(self) -> Dict:
        out = {}
        for k, v in self.items():
            out[k] = v.to_dict() if isinstance(v, CfgNode) else v
        return out

    def dump_yaml(self) -> str:
        def _plain(v):
            if isinstance(v, CfgNode):
                return {k: _plain(x) for k, x in v.items()}
            if isinstance(v, tuple):
                return list(v)
            return v

        return yaml.safe_dump(_plain(self), sort_keys=False)

    def __deepcopy__(self, memo):
        node = CfgNode(new_allowed=object.__getattribute__(self, CfgNode._NEW_ALLOWED))
        for k, v in self.items():
            dict.__setitem__(node, k, copy.deepcopy(v, memo))
        return node

    def __repr__(self) -> str:
        return f"CfgNode({dict.__repr__(self)})"
