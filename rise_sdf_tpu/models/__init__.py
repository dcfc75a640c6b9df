from ..registry import models as _registry

make = _registry.make
register = _registry.register

from . import (  # noqa: E402,F401
    geometry,
    light,
    neus,
    scatterer,
    split_mixed_occ,
    texture,
    variance,
)
