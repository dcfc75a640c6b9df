"""rise_sdf_tpu: TPU-native inverse rendering framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of RISE-SDF
(dehezhang2/RISE-SDF): NeuS SDF volume rendering over a multiresolution
hash grid, diffuse/specular-split radiance, split-sum PBR material
decomposition with an optimizable mip-cubemap environment light,
secondary-ray occlusion/indirect shading, relighting, metrics and mesh +
material export.
"""

__version__ = "0.1.0"

import os as _os

# single-core host: multithreaded BLAS spin-waits burn the only core
_os.environ.setdefault("OMP_NUM_THREADS", "1")
_os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
_os.environ.setdefault("MKL_NUM_THREADS", "1")

# persistent XLA compilation cache: this host has a single CPU core, so
# avoiding recompiles across processes matters enormously
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                       _os.path.expanduser("~/.jax_compile_cache"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

from . import config, registry  # noqa: F401,E402
