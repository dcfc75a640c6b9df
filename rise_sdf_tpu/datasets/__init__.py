from ..registry import datasets as _registry

make = _registry.make
register = _registry.register

from . import blender, synthetic, tensoir  # noqa: E402,F401
try:  # colmap needs no extra deps but keep import non-fatal
    from . import colmap  # noqa: E402,F401
except Exception:  # pragma: no cover
    pass
