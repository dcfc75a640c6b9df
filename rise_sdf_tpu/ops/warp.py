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


# ---------------------------------------------------------------------- #
# Basic samplers (reference warp_utils.py:107-224)
# ---------------------------------------------------------------------- #


def gen_stratified_samples(rng, batch_size, n_rows, n_cols,
                           is_training=True):
    """Stratified [0,1)^2 samples, one per (row, col) stratum per batch
    element; deterministic stratum centers at eval."""
    dx, dy = 1.0 / n_cols, 1.0 / n_rows
    jj = jnp.arange(n_cols, dtype=jnp.float32)[None, None, :]
    ii = jnp.arange(n_rows, dtype=jnp.float32)[None, :, None]
    if is_training:
        off = jax.random.uniform(rng, (2, batch_size, n_rows, n_cols))
        off_x, off_y = off[0] * dx, off[1] * dy
    else:
        off_x = jnp.full((batch_size, n_rows, n_cols), 0.5 * dx)
        off_y = jnp.full((batch_size, n_rows, n_cols), 0.5 * dy)
    x = (jj * dx + off_x).reshape(-1)
    y = (ii * dy + off_y).reshape(-1)
    return jnp.stack([x, y], -1)


def sample_uniform_disk_concentric(u):
    """[0,1)^2 -> unit disk via concentric warping (PBRT 13.6.2)."""
    off = 2.0 * u - 1.0
    ax, ay = jnp.abs(off[..., 0]), jnp.abs(off[..., 1])
    safe = lambda num, den: num / jnp.where(jnp.abs(den) > 0, den, 1.0)
    r = jnp.where(ax > ay, off[..., 0], off[..., 1])
    theta = jnp.where(
        ax > ay,
        math.pi / 4.0 * safe(off[..., 1], off[..., 0]),
        math.pi / 2.0 - math.pi / 4.0 * safe(off[..., 0], off[..., 1]))
    r = jnp.where((ax == 0) & (ay == 0), 0.0, r)
    return r[..., None] * jnp.stack([jnp.cos(theta), jnp.sin(theta)], -1)


def sample_uniform_cylinder(u):
    """[0,1)^2 -> uniform point on the unit cylinder surface."""
    z = u[..., 0] * 2.0 - 1.0
    phi = 2.0 * math.pi * u[..., 1]
    return jnp.stack([jnp.cos(phi), jnp.sin(phi), z], -1)


def sample_uniform_hemisphere(u, n):
    """[0,1)^2 -> uniform direction on the hemisphere around normal n."""
    cyl = sample_uniform_cylinder(u)
    z = u[..., 0]
    r = jnp.sqrt(jnp.clip(1.0 - z * z, 0.0, None))
    local = jnp.stack([cyl[..., 0] * r, cyl[..., 1] * r, z], -1)
    return to_world(local, n)


def eval_uniform_hemisphere(wo, n):
    return jnp.where(jnp.sum(wo * n, -1) >= 0.0, 0.5 / math.pi, 0.0)


def sample_lambertian_surface(u, n):
    """Cosine-weighted direction about n (reference :578-596)."""
    d = sample_uniform_disk_concentric(u)
    z = jnp.sqrt(jnp.clip(1.0 - d[..., 0] ** 2 - d[..., 1] ** 2, 0.0, None))
    return to_world(jnp.stack([d[..., 0], d[..., 1], z], -1), n)


def eval_lambertian_surface(wo, n):
    return jax.nn.relu(jnp.sum(n * wo, -1)) / math.pi


def sample_specular_mirror(u, n, wi, alpha=None):
    """Perfect mirror reflection of wi about n (reference :800-811)."""
    return -wi + 2.0 * n * jnp.sum(n * wi, -1, keepdims=True)


# ---------------------------------------------------------------------- #
# SGGX microflake distribution (Heitz et al. 2015; reference :226-575).
# Isotropic surface-like S = diag(a^2, a^2, 1) in the (t, b, n) frame.
# ---------------------------------------------------------------------- #


def _sggx_dots(v, t, b, n):
    return (jnp.sum(v * t, -1), jnp.sum(v * b, -1), jnp.sum(v * n, -1))


def sample_sggx_vndf(u, n, wi, alpha):
    """Sample a visible microflake normal of the SGGX distribution."""
    r = jnp.sqrt(u[..., 0])
    phi = 2 * math.pi * u[..., 1]
    pu = r * jnp.cos(phi)
    pv = r * jnp.sin(phi)
    pw = jnp.sqrt(jnp.clip(1.0 - pu ** 2 - pv ** 2, 0.0, None))

    wk, wj = coordinate_system(wi)
    t, b = coordinate_system(n)
    rough = alpha * alpha
    kt, kb, kn = _sggx_dots(wk, t, b, n)
    jt, jb, jn = _sggx_dots(wj, t, b, n)
    it_, ib, in_ = _sggx_dots(wi, t, b, n)

    s_kk = rough * (kt * kt + kb * kb) + kn * kn
    s_kj = rough * (kt * jt + kb * jb) + kn * jn
    s_ki = rough * (kt * it_ + kb * ib) + kn * in_
    s_jj = rough * (jt * jt + jb * jb) + jn * jn
    s_ji = rough * (jt * it_ + jb * ib) + jn * in_
    s_ii = rough * (it_ * it_ + ib * ib) + in_ * in_

    sqrt_det = jnp.sqrt(jnp.abs(
        s_kk * s_jj * s_ii - s_kj * s_kj * s_ii - s_ki * s_ki * s_jj
        - s_ji * s_ji * s_kk + 2.0 * s_kj * s_ki * s_ji))
    eps = 1e-6
    inv_sqrt_sii = 1.0 / (jnp.sqrt(jnp.clip(s_ii, 0.0, None)) + eps)
    tmp = jnp.sqrt(jnp.clip(s_jj * s_ii - s_ji * s_ji, 0.0, None))
    inv_tmp = 1.0 / (tmp + eps)
    zeros = jnp.zeros_like(tmp)
    mk = jnp.stack([sqrt_det * inv_tmp, zeros, zeros], -1)
    mj = jnp.stack([-inv_sqrt_sii * (s_ki * s_ji - s_kj * s_ii) * inv_tmp,
                    inv_sqrt_sii * tmp, zeros], -1)
    mi = jnp.stack([inv_sqrt_sii * s_ki, inv_sqrt_sii * s_ji,
                    inv_sqrt_sii * s_ii], -1)
    wm_kji = pu[..., None] * mk + pv[..., None] * mj + pw[..., None] * mi
    wm_kji = wm_kji / jnp.maximum(
        jnp.linalg.norm(wm_kji, axis=-1, keepdims=True), 1e-9)
    ret = (wm_kji[..., 0:1] * wk + wm_kji[..., 1:2] * wj
           + wm_kji[..., 2:3] * wi) + 1e-6
    return ret / jnp.maximum(jnp.linalg.norm(ret, axis=-1, keepdims=True),
                             1e-9)


def eval_sggx_ndf(wo, n, alpha):
    """SGGX NDF D(wm) for isotropic surface-like S."""
    rough = alpha ** 2
    t, b = coordinate_system(n)
    ot, ob, on = _sggx_dots(wo, t, b, n)
    m_sinv_m = (ot ** 2 + ob ** 2) / rough + on ** 2
    m2 = m_sinv_m ** 2
    eps = 1e-6
    return jnp.where(m2 > eps, 1.0 / (math.pi * rough * (m2 + eps)), 0.0)


def eval_sggx_vndf(wo, n, wi, alpha):
    """SGGX visible-NDF pdf D_wi(wm = wo)."""
    rough = alpha ** 2
    t, b = coordinate_system(n)
    it_, ib, in_ = _sggx_dots(wi, t, b, n)
    wi_s_wi = jnp.clip(rough * (it_ ** 2 + ib ** 2) + in_ ** 2, 0.0, None)
    sigma = jnp.sqrt(wi_s_wi)
    d_wm = eval_sggx_ndf(wo, n, alpha)
    dot = jnp.clip(jnp.sum(wi * wo, -1), 0.0, 1.0)
    eps = 1e-6
    return jnp.where(sigma > eps, dot * d_wm / (sigma + eps), 0.0)


def sample_diffuse_sggx(u1, u2, n, wi, alpha):
    """Diffuse SGGX phase-function sample: cosine lobe about a sampled
    visible microflake normal."""
    wm = jax.lax.stop_gradient(sample_sggx_vndf(u1, n, wi, alpha))
    w1, w2 = coordinate_system(wm)
    d = sample_uniform_disk_concentric(u2)
    x, y = d[..., 0:1], d[..., 1:2]
    z = jnp.sqrt(jnp.clip(1.0 - x ** 2 - y ** 2, 0.0, None))
    wo = x * w1 + y * w2 + z * wm
    return wo / jnp.maximum(jnp.linalg.norm(wo, axis=-1, keepdims=True),
                            1e-9)


def eval_diffuse_sggx(u, wi, n, wo, alpha):
    """Single-sample MC estimate of the diffuse-SGGX pdf (stochastic,
    reparameterized through the VNDF sample like the reference)."""
    wm = sample_sggx_vndf(u, n, wi, alpha)
    return jax.nn.relu(jnp.sum(wo * wm, -1)) / math.pi


def sample_specular_sggx(u, n, wi, alpha):
    """Specular SGGX: mirror wi about a sampled visible normal."""
    wm = jax.lax.stop_gradient(sample_sggx_vndf(u, n, wi, alpha))
    wo = -wi + 2.0 * wm * jnp.sum(wm * wi, -1, keepdims=True)
    return wo / jnp.maximum(jnp.linalg.norm(wo, axis=-1, keepdims=True),
                            1e-9)


def eval_specular_sggx(wi, n, wo, alpha):
    """Specular SGGX pdf: D(wh) / (4 sigma(wi))."""
    rough = alpha ** 2
    wh = wi + wo
    wh = wh / jnp.maximum(jnp.linalg.norm(wh, axis=-1, keepdims=True), 1e-9)
    t, b = coordinate_system(n)
    it_, ib, in_ = _sggx_dots(wi, t, b, n)
    sigma = jnp.sqrt(jnp.clip(rough * (it_ ** 2 + ib ** 2) + in_ ** 2,
                              0.0, None))
    eps = 1e-6
    return jnp.where(sigma > eps,
                     0.25 * eval_sggx_ndf(wh, n, alpha) / (sigma + eps),
                     0.0)


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


def smith_ggx_g1_aniso(v_local, alpha_x, alpha_y):
    """Anisotropic Smith G1 in the local shading frame (reference
    warp_utils.py:684-707)."""
    c2 = v_local[..., 2] ** 2
    eps = 1e-6
    delta = jnp.where(
        c2 > eps,
        -0.5 + 0.5 * jnp.sqrt(
            1.0 + ((v_local[..., 0] * alpha_x) ** 2
                   + (v_local[..., 1] * alpha_y) ** 2) / (c2 + eps)),
        0.0)
    return 1.0 / (1.0 + delta)


def smith_ggx_g1_schlick(v_local, k):
    """Schlick's G1 approximation with remapped roughness k."""
    nom = v_local[..., 2]
    denom = nom * (1.0 - k) + k
    eps = 1e-6
    return jnp.where(denom > eps, nom / (denom + eps), 0.0)


def eval_ggx_ndf_aniso(wh_local, alpha_x, alpha_y, eps=1e-6):
    """Anisotropic GGX NDF (local-frame half vector)."""
    denom = (wh_local[..., 0] ** 2 / (alpha_x * alpha_x)
             + wh_local[..., 1] ** 2 / (alpha_y * alpha_y)
             + wh_local[..., 2] ** 2)
    return 1.0 / (math.pi * alpha_x * alpha_y * (denom + eps) ** 2)


def eval_ggx_vndf_local(wh_local, wi_local, alpha_x, alpha_y, eps=1e-6):
    """GGX VNDF pdf in the local frame (Schlick-G1 form, reference
    warp_utils.py:776-797)."""
    k = (alpha_x ** 2 + 2 * alpha_x + 1) / 8.0
    val = (smith_ggx_g1_schlick(wi_local, k)
           * jnp.clip(jnp.sum(wh_local * wi_local, -1), 0.0, None)
           * eval_ggx_ndf_aniso(wh_local, alpha_x, alpha_y)
           / (wi_local[..., 2] + eps))
    return jnp.where((wh_local[..., 2] > eps) & (wi_local[..., 2] > eps),
                     val, 0.0)


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


def phong(nrm, wo, wi, exponent):
    """Normalized Phong specular (bsdf_phong mirror)."""
    refl = 2.0 * jnp.sum(wo * nrm, -1, keepdims=True) * nrm - wo
    dp_r = jnp.clip(jnp.sum(refl * wi, -1, keepdims=True), 0.0, 1.0)
    dp_l = jnp.clip(jnp.sum(nrm * wi, -1, keepdims=True), 0.0, 1.0)
    return (dp_r ** exponent) * dp_l * (exponent + 2) / (2 * math.pi)


def pbr_bsdf(kd, arm, pos, nrm, view_pos, light_pos, min_roughness=0.08,
             bsdf=0):
    """Full point-light PBR BSDF (bsdf_pbr mirror): diffuse
    (lambert/frostbite by ``bsdf``) + GGX specular with the
    spec-strength/roughness/metallic 'arm' packing."""
    def nrmz(v):
        return v / jnp.sqrt(jnp.sum(v * v, -1, keepdims=True) + 1e-20)

    wo = nrmz(view_pos - pos)
    wi = nrmz(light_pos - pos)
    spec_str = arm[..., 0:1]
    roughness = arm[..., 1:2]
    metallic = arm[..., 2:3]
    ks = (0.04 * (1.0 - metallic) + kd * metallic) * (1 - spec_str)
    kd = kd * (1.0 - metallic)
    if bsdf == 0:
        diffuse = kd * lambert(nrm, wi)
    else:
        diffuse = kd * frostbite_diffuse(nrm, wi, wo, roughness)
    specular = pbr_specular(ks, nrm, wo, wi, roughness * roughness,
                            min_roughness=min_roughness)
    return diffuse + specular


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
