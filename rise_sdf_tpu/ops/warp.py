"""Sampling / BSDF math toolbox (GGX importance sampling, Fresnel, Smith).

jnp port of the semantics of the reference's Monte-Carlo toolbox
(``lib/pbr/utils/warp_utils.py``): local frames, hemisphere/GGX-VNDF
samplers and the microfacet terms used by the ``brdf-ggx`` scatterer
(``models/texture.py:436-537``).  The shipped split-sum pipeline doesn't
need these, but the MC path (``volume-pbr``) does, and they double as
test oracles for the FG LUT.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def coordinate_system(n):
    """Build an orthonormal frame (t, b) around normal n [..., 3]
    (Duff et al. branchless ONB)."""
    sign = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack([1.0 + sign * n[..., 0] ** 2 * a, sign * b,
                   -sign * n[..., 0]], -1)
    bt = jnp.stack([b, sign + n[..., 1] ** 2 * a, -n[..., 1]], -1)
    return t, bt


def to_local(v, n):
    t, b = coordinate_system(n)
    return jnp.stack([jnp.sum(v * t, -1), jnp.sum(v * b, -1),
                      jnp.sum(v * n, -1)], -1)


def to_world(v, n):
    t, b = coordinate_system(n)
    return v[..., 0:1] * t + v[..., 1:2] * b + v[..., 2:3] * n


def square_to_cosine_hemisphere(u):
    """u in [0,1]^2 -> cosine-weighted hemisphere direction (local +z)."""
    r = jnp.sqrt(u[..., 0])
    phi = 2 * math.pi * u[..., 1]
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.clip(1 - u[..., 0], 0.0, 1.0))
    return jnp.stack([x, y, z], -1)


SPECULAR_EPS = 1e-4  # reference bsdf.py specular_epsilon


def fresnel_schlick(f0, cos_theta, f90=1.0):
    """Schlick Fresnel (bsdf_fresnel_shlick mirror: cos clamped to
    [eps, 1-eps])."""
    c = jnp.clip(cos_theta, SPECULAR_EPS, 1.0 - SPECULAR_EPS)
    return f0 + (f90 - f0) * (1.0 - c) ** 5


def eval_ggx_ndf(alpha, cos_theta_h):
    """GGX NDF (bsdf_ndf_ggx mirror; alpha = roughness²)."""
    c = jnp.clip(cos_theta_h, SPECULAR_EPS, 1.0 - SPECULAR_EPS)
    a2 = alpha * alpha
    d = (c * a2 - c) * c + 1.0
    return a2 / jnp.maximum(d * d * math.pi, 1e-12)


def smith_ggx_g1(alpha, cos_theta):
    c = jnp.clip(cos_theta, 1e-6, 1.0)
    a2 = alpha * alpha
    t2 = (1.0 - c * c) / (c * c)
    return 2.0 / (1.0 + jnp.sqrt(1.0 + a2 * t2))


def smith_ggx_lambda(alpha, cos_theta):
    """Smith Λ for GGX (bsdf_lambda_ggx mirror; alpha = roughness²)."""
    c = jnp.clip(cos_theta, SPECULAR_EPS, 1.0 - SPECULAR_EPS)
    t2 = (1.0 - c * c) / (c * c)
    return 0.5 * (jnp.sqrt(1.0 + (alpha * alpha) * t2) - 1.0)


def smith_ggx_g_correlated(alpha, cos_theta_i, cos_theta_o):
    """Height-correlated Smith masking-shadowing
    (bsdf_masking_smith_ggx_correlated mirror): 1 / (1 + Λi + Λo)."""
    return 1.0 / (1.0 + smith_ggx_lambda(alpha, cos_theta_i)
                  + smith_ggx_lambda(alpha, cos_theta_o))


def sample_ggx_vndf(wi_local, alpha, u):
    """Visible-NDF GGX sampling (Heitz 2018). wi_local [...,3], u [...,2]."""
    vh = jnp.stack([alpha * wi_local[..., 0], alpha * wi_local[..., 1],
                    wi_local[..., 2]], -1)
    vh = vh / jnp.maximum(jnp.linalg.norm(vh, axis=-1, keepdims=True), 1e-9)
    lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
    inv = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-12))
    t1 = jnp.where(lensq[..., None] > 1e-7,
                   jnp.stack([-vh[..., 1], vh[..., 0],
                              jnp.zeros_like(vh[..., 0])], -1) * inv[..., None],
                   jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), vh.shape))
    t2 = jnp.cross(vh, t1)
    r = jnp.sqrt(u[..., 0])
    phi = 2 * math.pi * u[..., 1]
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.clip(1.0 - p1 ** 2, 0.0, 1.0)) + s * p2
    p3 = jnp.sqrt(jnp.clip(1.0 - p1 ** 2 - p2 ** 2, 0.0, 1.0))
    nh = p1[..., None] * t1 + p2[..., None] * t2 + p3[..., None] * vh
    h = jnp.stack([alpha * nh[..., 0], alpha * nh[..., 1],
                   jnp.maximum(nh[..., 2], 0.0)], -1)
    return h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-9)


def eval_ggx_vndf_pdf(wi_local, h_local, alpha):
    """pdf of sample_ggx_vndf in half-vector space."""
    g1 = smith_ggx_g1(alpha, wi_local[..., 2])
    d = eval_ggx_ndf(alpha, h_local[..., 2])
    return g1 * d * jnp.clip(jnp.sum(wi_local * h_local, -1), 0.0, None) \
        / jnp.maximum(wi_local[..., 2], 1e-6)


# ---------------------------------------------------------------------- #
# Analytic BSDF terms (python mirrors of lib/renderutils/bsdf.py — the
# reference's own test oracles for its CUDA kernels)
# ---------------------------------------------------------------------- #


def lambert(nrm, wi):
    """Lambert diffuse term max(dot(n, wi), 0) / pi."""
    return jnp.clip(jnp.sum(nrm * wi, -1, keepdims=True), 0.0, None) / math.pi


def frostbite_diffuse(nrm, wi, wo, linear_roughness):
    """Frostbite normalized Disney diffuse (bsdf_frostbite mirror:
    wiScatter * woScatter * energyFactor, zeroed when either side is
    backfacing — no extra cosine/pi factor, exactly like the oracle)."""
    wi_dot_n = jnp.sum(nrm * wi, -1, keepdims=True)
    wo_dot_n = jnp.sum(nrm * wo, -1, keepdims=True)
    h = wi + wo
    h = h / jnp.sqrt(jnp.sum(h * h, -1, keepdims=True) + 1e-20)
    wi_dot_h = jnp.sum(wi * h, -1, keepdims=True)
    energy_bias = 0.5 * linear_roughness
    energy_factor = 1.0 - (0.51 / 1.51) * linear_roughness
    f90 = energy_bias + 2.0 * wi_dot_h ** 2 * linear_roughness
    light_scatter = fresnel_schlick(1.0, wi_dot_n, f90=f90)
    view_scatter = fresnel_schlick(1.0, wo_dot_n, f90=f90)
    mask = (wi_dot_n > 0) & (wo_dot_n > 0)
    return jnp.where(mask, light_scatter * view_scatter * energy_factor, 0.0)


def pbr_specular(col, nrm, wo, wi, alpha, min_roughness=0.08):
    """Cook-Torrance GGX specular (bsdf.py pbr_specular mirror)."""
    alpha = jnp.clip(alpha, min_roughness ** 2, 1.0)
    h = wi + wo
    h = h / jnp.sqrt(jnp.sum(h * h, -1, keepdims=True) + 1e-20)
    wo_dot_n = jnp.sum(wo * nrm, -1, keepdims=True)
    wi_dot_n = jnp.sum(wi * nrm, -1, keepdims=True)
    wo_dot_h = jnp.sum(wo * h, -1, keepdims=True)
    n_dot_h = jnp.sum(nrm * h, -1, keepdims=True)
    a = alpha[..., 0]  # scalar-cos helpers take [...]-shaped args
    d = eval_ggx_ndf(a, n_dot_h[..., 0])[..., None]
    # height-correlated Smith (reference bsdf_pbr_specular uses
    # bsdf_masking_smith_ggx_correlated, not separable G1*G1)
    g = smith_ggx_g_correlated(a, wi_dot_n[..., 0],
                               wo_dot_n[..., 0])[..., None]
    f = fresnel_schlick(col, wo_dot_h)
    res = f * d * g * 0.25 / jnp.clip(wo_dot_n, SPECULAR_EPS, None)
    mask = (wi_dot_n > SPECULAR_EPS) & (wo_dot_n > SPECULAR_EPS)
    return jnp.where(mask, res, 0.0)


# ---------------------------------------------------------------------- #
# Spherical-Gaussian helpers (reference lib/pbr/utils/light_utils.py:6-69)
# ---------------------------------------------------------------------- #


def compute_energy(lgt_sgs):
    """Total energy of SG mixture [N,7] (lobe, lambda, mu)."""
    lam = jnp.abs(lgt_sgs[:, 3:4])
    mu = jnp.abs(lgt_sgs[:, 4:])
    return mu * 2.0 * math.pi / lam * (1.0 - jnp.exp(-2.0 * lam))


def fibonacci_sphere(samples: int = 1):
    """Uniform points on the sphere (numpy, reference :22-43)."""
    import numpy as np

    i = np.arange(samples, dtype=np.float64)
    phi = math.pi * (3.0 - math.sqrt(5.0))
    z = 1 - (i / float(samples - 1)) * 2
    radius = np.sqrt(np.clip(1 - z * z, 0, None))
    theta = phi * i
    return np.stack([np.cos(theta) * radius, np.sin(theta) * radius, z], -1)


def eval_sgs(lgt_sgs, viewdirs):
    """Evaluate an SG mixture at view directions (reference :46-69)."""
    v = viewdirs[..., None, :]
    lobes = lgt_sgs[..., :3] / jnp.sqrt(
        jnp.sum(lgt_sgs[..., :3] ** 2, -1, keepdims=True) + 1e-12)
    lam = jnp.abs(lgt_sgs[..., 3:4])
    mu = jnp.abs(lgt_sgs[..., -3:])
    lo = mu * jnp.exp(lam * (jnp.sum(v * lobes, -1, keepdims=True) - 1.0))
    return jnp.sum(lo, axis=-2)
