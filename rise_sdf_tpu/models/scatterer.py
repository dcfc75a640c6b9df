"""Monte-Carlo BRDF scatterer (sample / pdf / eval) for the MC path.

Implements the ``brdf-ggx`` scatterer the reference configs name
(``configs/split-mixed-occ-tensoir.yaml:126-127``) but never register —
a recorded latent bug in the reference (``models/texture.py:445`` looks
up an unregistered model).  Here it exists for real: metallic-workflow
GGX with cosine-diffuse + VNDF-specular mixture sampling.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from . import register
from ..ops.warp import (
    eval_ggx_ndf,
    eval_ggx_vndf_pdf,
    fresnel_schlick,
    sample_ggx_vndf,
    smith_ggx_g1,
    square_to_cosine_hemisphere,
    to_local,
    to_world,
)


@register("brdf-ggx")
class BRDFGGXScatterer:
    def __init__(self, config=None):
        self.config = config or {}
        self.min_alpha = float(self.config.get("min_alpha", 1e-3))

    def init(self, key):
        return {}

    # ------------------------------------------------------------------ #
    def sample(self, rng, n, wi, alpha_x, alpha_y, albedo, metallic,
               attenuation=None):
        """Sample outgoing directions: 50/50 cosine-diffuse vs GGX-VNDF."""
        alpha = jnp.maximum(alpha_x ** 2, self.min_alpha)
        k1, k2, k3 = jax.random.split(rng, 3)
        u = jax.random.uniform(k1, (*alpha.shape, 2))
        wi_l = to_local(wi, n)
        # specular: reflect wi about a VNDF-sampled half-vector
        h_l = sample_ggx_vndf(wi_l, alpha, u)
        wo_spec_l = 2.0 * jnp.sum(wi_l * h_l, -1, keepdims=True) * h_l - wi_l
        wo_diff_l = square_to_cosine_hemisphere(
            jax.random.uniform(k2, (*alpha.shape, 2)))
        pick_spec = jax.random.uniform(k3, alpha.shape) < 0.5
        wo_l = jnp.where(pick_spec[..., None], wo_spec_l, wo_diff_l)
        return to_world(wo_l, n)

    def pdf(self, n, wi, wo, alpha_x, alpha_y, albedo, metallic,
            attenuation=None):
        alpha = jnp.maximum(alpha_x ** 2, self.min_alpha)
        wi_l = to_local(wi, n)
        wo_l = to_local(wo, n)
        h_l = wi_l + wo_l
        h_l = h_l / jnp.maximum(jnp.linalg.norm(h_l, axis=-1, keepdims=True),
                                1e-9)
        pdf_diff = jnp.clip(wo_l[..., 2], 0.0, None) / math.pi
        jac = 1.0 / jnp.maximum(
            4.0 * jnp.abs(jnp.sum(wo_l * h_l, -1)), 1e-6)
        pdf_spec = eval_ggx_vndf_pdf(wi_l, h_l, alpha) * jac
        return (0.5 * pdf_diff + 0.5 * pdf_spec)[..., None]

    def eval(self, wi, n, wo, alpha_x, alpha_y, albedo, metallic,
             attenuation=None):
        """Returns (diffuse, specular) BRDF * cos terms."""
        alpha = jnp.maximum(alpha_x ** 2, self.min_alpha)
        wi_l = to_local(wi, n)
        wo_l = to_local(wo, n)
        cos_i = jnp.clip(wi_l[..., 2:3], 0.0, 1.0)
        cos_o = jnp.clip(wo_l[..., 2:3], 0.0, 1.0)
        h_l = wi_l + wo_l
        h_l = h_l / jnp.maximum(jnp.linalg.norm(h_l, axis=-1, keepdims=True),
                                1e-9)
        d = eval_ggx_ndf(alpha, h_l[..., 2])[..., None]
        g = (smith_ggx_g1(alpha, wi_l[..., 2])
             * smith_ggx_g1(alpha, wo_l[..., 2]))[..., None]
        f0 = 0.04 * (1 - metallic) + metallic * albedo
        f = fresnel_schlick(f0, jnp.sum(wi_l * h_l, -1, keepdims=True))
        spec = d * g * f / jnp.maximum(4.0 * cos_i, 1e-6)
        diff = cos_o / math.pi
        return diff, spec * cos_o / jnp.maximum(cos_o, 1e-6)
