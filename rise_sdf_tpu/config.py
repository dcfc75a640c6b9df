"""Self-contained YAML config system.

Output-compatible with the reference's OmegaConf usage (reference:
``utils/misc.py:7-45``): nested attribute access, ``${a.b}`` interpolation,
custom resolvers (``${add:...}``, ``${calc_exp_lr_decay_rate:...}``, ...),
CLI dotlist overrides, and YAML round-trip dumping.  Implemented from
scratch on top of PyYAML because OmegaConf is not a dependency of this
framework.
"""

from __future__ import annotations

import copy
import math
import os
import re
from typing import Any, Callable, Dict, List, Optional

import yaml

__all__ = [
    "ConfigNode",
    "load_config",
    "parse_cli_overrides",
    "register_resolver",
    "config_to_primitive",
    "dump_config",
]

# --------------------------------------------------------------------------- #
# Resolvers (reference: utils/misc.py:7-13)
# --------------------------------------------------------------------------- #

_RESOLVERS: Dict[str, Callable[..., Any]] = {}


def register_resolver(name: str, fn: Callable[..., Any]) -> None:
    _RESOLVERS[name] = fn


register_resolver("calc_exp_lr_decay_rate", lambda factor, n: float(factor) ** (1.0 / float(n)))
register_resolver("add", lambda a, b: _num(a) + _num(b))
register_resolver("sub", lambda a, b: _num(a) - _num(b))
register_resolver("mul", lambda a, b: _num(a) * _num(b))
register_resolver("div", lambda a, b: _num(a) / _num(b))
register_resolver("idiv", lambda a, b: int(_num(a) // _num(b)))
register_resolver("basename", lambda p: os.path.basename(str(p)))


def _num(x: Any) -> Any:
    if isinstance(x, (int, float)):
        return x
    s = str(x)
    try:
        return int(s)
    except ValueError:
        return float(s)


# --------------------------------------------------------------------------- #
# ConfigNode
# --------------------------------------------------------------------------- #


class ConfigNode(dict):
    """A dict with attribute access and nested wrapping.

    Missing mandatory values are represented by the string ``'???'`` (same
    convention as OmegaConf); accessing one raises a ``ValueError``.
    """

    def __init__(self, data: Optional[dict] = None):
        super().__init__()
        if data:
            for k, v in data.items():
                self[k] = v

    # -- wrapping ----------------------------------------------------------- #
    @staticmethod
    def _wrap(value: Any) -> Any:
        if isinstance(value, ConfigNode):
            return value
        if isinstance(value, dict):
            return ConfigNode(value)
        if isinstance(value, list):
            return [ConfigNode._wrap(v) for v in value]
        return value

    def __setitem__(self, key: str, value: Any) -> None:
        super().__setitem__(key, ConfigNode._wrap(value))

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def __getattr__(self, key: str) -> Any:
        try:
            value = self[key]
        except KeyError as e:
            raise AttributeError(key) from e
        if isinstance(value, str) and value == "???":
            raise ValueError(f"Missing mandatory config value: {key}")
        return value

    def get(self, key: str, default: Any = None) -> Any:
        value = super().get(key, default)
        if isinstance(value, str) and value == "???":
            raise ValueError(f"Missing mandatory config value: {key}")
        return value

    # -- deep ops ----------------------------------------------------------- #
    def merge(self, other: dict) -> "ConfigNode":
        """Deep-merge ``other`` into self (other wins)."""
        for k, v in other.items():
            if k in self and isinstance(self[k], ConfigNode) and isinstance(v, dict):
                self[k].merge(v)
            else:
                self[k] = v
        return self

    def set_dotted(self, dotted_key: str, value: Any) -> None:
        parts = dotted_key.split(".")
        node = self
        for p in parts[:-1]:
            if p not in node or not isinstance(node[p], ConfigNode):
                node[p] = ConfigNode()
            node = node[p]
        node[parts[-1]] = value

    def get_dotted(self, dotted_key: str) -> Any:
        node: Any = self
        for p in dotted_key.split("."):
            if isinstance(node, list):
                node = node[int(p)]
            else:
                node = node[p]
        return node

    def to_primitive(self) -> dict:
        out: Dict[str, Any] = {}
        for k, v in self.items():
            out[k] = _to_primitive(v)
        return out

    def copy(self) -> "ConfigNode":  # type: ignore[override]
        return ConfigNode(copy.deepcopy(self.to_primitive()))


def _to_primitive(v: Any) -> Any:
    if isinstance(v, ConfigNode):
        return v.to_primitive()
    if isinstance(v, list):
        return [_to_primitive(x) for x in v]
    return v


def config_to_primitive(cfg: Any) -> Any:
    return _to_primitive(cfg)


# --------------------------------------------------------------------------- #
# Interpolation
# --------------------------------------------------------------------------- #

_INTERP_RE = re.compile(r"\$\{([^${}]+)\}")


def _resolve_string(s: str, root: ConfigNode, stack: tuple) -> Any:
    """Resolve all ``${...}`` occurrences in ``s``."""
    while True:
        m = _INTERP_RE.search(s)
        if m is None:
            return s
        expr = m.group(1)
        val = _resolve_expr(expr, root, stack)
        if m.span() == (0, len(s)):
            return val  # full-string interpolation keeps the value's type
        s = s[: m.start()] + str(val) + s[m.end():]


def _resolve_expr(expr: str, root: ConfigNode, stack: tuple) -> Any:
    if expr in stack:
        raise ValueError(f"Interpolation cycle detected at '{expr}'")
    stack = stack + (expr,)
    if ":" in expr:
        name, _, argstr = expr.partition(":")
        if name not in _RESOLVERS:
            raise KeyError(f"Unknown config resolver '{name}'")
        args = [_resolve_string(a, root, stack) if isinstance(a, str) else a
                for a in _split_args(argstr)]
        return _RESOLVERS[name](*args)
    # plain ${a.b.c} reference
    val = root.get_dotted(expr)
    return _resolve_value(val, root, stack)


def _split_args(argstr: str) -> List[str]:
    """Split resolver args on commas not nested inside ``${...}``."""
    args, depth, cur = [], 0, []
    for ch in argstr:
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
        if ch == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        args.append("".join(cur).strip())
    return args


def _resolve_value(v: Any, root: ConfigNode, stack: tuple) -> Any:
    if isinstance(v, str):
        return _resolve_string(v, root, stack)
    if isinstance(v, ConfigNode):
        out = ConfigNode()
        for k, sub in v.items():
            out[k] = _resolve_value(sub, root, stack)
        return out
    if isinstance(v, list):
        return [_resolve_value(x, root, stack) for x in v]
    return v


def resolve(cfg: ConfigNode) -> ConfigNode:
    """Eagerly resolve every interpolation in the tree."""
    return _resolve_value(cfg, cfg, ())


# --------------------------------------------------------------------------- #
# Loading
# --------------------------------------------------------------------------- #


def parse_cli_overrides(dotlist: List[str]) -> ConfigNode:
    """Parse ``a.b.c=value`` CLI overrides (values parsed as YAML scalars)."""
    out = ConfigNode()
    for item in dotlist:
        if "=" not in item:
            raise ValueError(f"Malformed override (expected key=value): {item}")
        key, _, raw = item.partition("=")
        out.set_dotted(key.strip(), yaml.safe_load(raw))
    return out


def load_config(*yaml_files: str, cli_args: Optional[List[str]] = None,
                extra: Optional[dict] = None) -> ConfigNode:
    cfg = ConfigNode()
    for f in yaml_files:
        with open(f, "r") as fh:
            data = yaml.safe_load(fh) or {}
        cfg.merge(data)
    if cli_args:
        cfg.merge(parse_cli_overrides(cli_args))
    if extra:
        cfg.merge(extra)
    cfg = resolve(cfg)
    return cfg


def dump_config(cfg: ConfigNode, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        yaml.safe_dump(cfg.to_primitive(), fh, sort_keys=False)
