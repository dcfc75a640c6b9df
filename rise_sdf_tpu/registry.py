"""Decorator-based name -> class registries.

Mirrors the registry surface of the reference (``models/__init__.py:1-14``,
``systems/__init__.py``, ``datasets/__init__.py``) so configs stay
compatible: components are instantiated by ``make(name, config)``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict


class Registry:
    def __init__(self, kind: str):
        self.kind = kind
        self._items: Dict[str, Callable[..., Any]] = {}

    def register(self, name: str):
        def decorator(cls):
            if name in self._items:
                raise KeyError(f"{self.kind} '{name}' already registered")
            self._items[name] = cls
            return cls

        return decorator

    def make(self, name: str, *args, **kwargs):
        if name not in self._items:
            raise KeyError(
                f"Unknown {self.kind} '{name}'. Available: {sorted(self._items)}"
            )
        return self._items[name](*args, **kwargs)

    def __contains__(self, name: str) -> bool:
        return name in self._items

    def names(self):
        return sorted(self._items)


models = Registry("model")
systems = Registry("system")
datasets = Registry("dataset")
