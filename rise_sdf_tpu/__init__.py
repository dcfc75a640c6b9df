"""rise_sdf_tpu: TPU-native inverse rendering framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of RISE-SDF
(dehezhang2/RISE-SDF): NeuS SDF volume rendering over a multiresolution
hash grid, diffuse/specular-split radiance, split-sum PBR material
decomposition with an optimizable mip-cubemap environment light,
secondary-ray occlusion/indirect shading, relighting, metrics and mesh +
material export.
"""

__version__ = "0.1.0"

from . import config, registry  # noqa: F401
