"""SGGX microflake + sampler family: distribution/property tests.

These are the reference's Monte-Carlo toolbox functions
(lib/pbr/utils/warp_utils.py); they are dead in the shipped split-sum
pipeline but ported for inventory completeness, so tests check
mathematical invariants rather than pipeline behavior.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from rise_sdf_tpu.ops import warp


def _nrm(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_disk_concentric_in_disk_uniform():
    u = jax.random.uniform(jax.random.PRNGKey(0), (4096, 2))
    p = np.asarray(warp.sample_uniform_disk_concentric(u))
    r = np.linalg.norm(p, axis=-1)
    assert (r <= 1.0 + 1e-6).all()
    # uniform density: mean radius of a uniform disk = 2/3
    assert abs(r.mean() - 2.0 / 3.0) < 0.02
    # center maps to center
    c = np.asarray(warp.sample_uniform_disk_concentric(
        jnp.asarray([[0.5, 0.5]])))
    assert np.abs(c).max() < 1e-6


def test_uniform_hemisphere_pdf_and_side():
    n = jnp.asarray(_nrm(np.array([[0.3, -0.5, 0.8]] * 2048, np.float32)))
    u = jax.random.uniform(jax.random.PRNGKey(1), (2048, 2))
    wo = np.asarray(warp.sample_uniform_hemisphere(u, n))
    cos = np.sum(wo * np.asarray(n), -1)
    assert (cos >= -1e-5).all()
    np.testing.assert_allclose(np.linalg.norm(wo, axis=-1), 1.0, atol=1e-4)
    # uniform on hemisphere: E[cos] = 1/2
    assert abs(cos.mean() - 0.5) < 0.03
    pdf = np.asarray(warp.eval_uniform_hemisphere(jnp.asarray(wo), n))
    np.testing.assert_allclose(pdf, 0.5 / math.pi, atol=1e-7)


def test_lambertian_sampler_matches_pdf():
    n = jnp.asarray(_nrm(np.array([[0.0, 0.0, 1.0]] * 4096, np.float32)))
    u = jax.random.uniform(jax.random.PRNGKey(2), (4096, 2))
    wo = np.asarray(warp.sample_lambertian_surface(u, n))
    cos = wo[:, 2]
    assert (cos >= -1e-5).all()
    # cosine-weighted: E[cos] = 2/3
    assert abs(cos.mean() - 2.0 / 3.0) < 0.03
    pdf = np.asarray(warp.eval_lambertian_surface(jnp.asarray(wo), n))
    np.testing.assert_allclose(pdf, np.clip(cos, 0, None) / math.pi,
                               atol=1e-6)


def test_stratified_samples_cover_strata():
    s = np.asarray(warp.gen_stratified_samples(jax.random.PRNGKey(0), 1,
                                               4, 8))
    assert s.shape == (32, 2)
    assert (s >= 0).all() and (s < 1).all()
    # eval mode: exact stratum centers
    se = np.asarray(warp.gen_stratified_samples(None, 1, 2, 2,
                                                is_training=False))
    np.testing.assert_allclose(sorted(se[:, 0]), [0.25, 0.25, 0.75, 0.75])


def test_sggx_vndf_sample_visible_and_unit():
    key = jax.random.PRNGKey(3)
    n = jnp.asarray(_nrm(np.array([[0.2, 0.1, 0.97]] * 2048, np.float32)))
    wi = jnp.asarray(_nrm(np.array([[0.5, 0.0, 0.87]] * 2048, np.float32)))
    alpha = jnp.full((2048,), 0.4)
    u = jax.random.uniform(key, (2048, 2))
    wm = np.asarray(warp.sample_sggx_vndf(u, n, wi, alpha))
    np.testing.assert_allclose(np.linalg.norm(wm, axis=-1), 1.0, atol=1e-4)
    # visible normals face the camera
    assert (np.sum(wm * np.asarray(wi), -1) >= -1e-4).all()


def test_sggx_ndf_matches_reference_formula():
    """The reference's (simplified, non-unit-normalized) SGGX NDF is the
    spec: D = 1/(pi a^2 ((1-cos^2)/a^2 + cos^2)^2) for the isotropic
    surface-like S in the shading frame.  MC integral over the sphere
    must match the quadrature of that formula (2.760 at a=0.5)."""
    key = jax.random.PRNGKey(4)
    n = jnp.asarray(_nrm(np.array([[0.0, 0.0, 1.0]], np.float32)))
    a = 0.5
    m = 200000
    v = jax.random.normal(key, (m, 3))
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    d = np.asarray(warp.eval_sggx_ndf(v, jnp.broadcast_to(n, (m, 3)),
                                      jnp.full((m,), a)))
    # pointwise parity with the closed-form isotropic expression
    cos = np.asarray(v)[:, 2]
    want = 1.0 / (math.pi * a * a
                  * ((1 - cos ** 2) / (a * a) + cos ** 2) ** 2)
    np.testing.assert_allclose(d, want, rtol=1e-3, atol=1e-5)
    integral = 4.0 * math.pi * d.mean()
    assert abs(integral - 2.760) < 0.06, integral


def test_sggx_specular_sample_is_reflection():
    key = jax.random.PRNGKey(5)
    n = jnp.asarray(_nrm(np.array([[0.0, 0.0, 1.0]] * 64, np.float32)))
    wi = jnp.asarray(_nrm(np.array([[0.3, 0.2, 0.93]] * 64, np.float32)))
    alpha = jnp.full((64,), 1e-3)  # near-smooth: wm ~ n
    u = jax.random.uniform(key, (64, 2))
    wo = np.asarray(warp.sample_specular_sggx(u, n, wi, alpha))
    mirror = np.asarray(warp.sample_specular_mirror(None, n, wi))
    mirror = _nrm(mirror)
    # smooth limit: specular SGGX == perfect mirror
    assert np.abs(wo - mirror).max() < 0.05


def test_sggx_vndf_pdf_nonnegative_and_zero_backface():
    key = jax.random.PRNGKey(6)
    m = 1024
    n = jnp.asarray(_nrm(np.array([[0.0, 0.0, 1.0]] * m, np.float32)))
    wi = jnp.asarray(_nrm(np.array([[0.4, -0.1, 0.9]] * m, np.float32)))
    alpha = jnp.full((m,), 0.3)
    wo = jax.random.normal(key, (m, 3))
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    pdf = np.asarray(warp.eval_sggx_vndf(wo, n, wi, alpha))
    assert (pdf >= 0).all()
    # backfacing wrt wi -> dot clamp zeroes the pdf
    back = np.sum(np.asarray(wo) * np.asarray(wi), -1) <= 0
    assert (pdf[back] == 0).all()


def test_aniso_ggx_reduces_to_isotropic():
    key = jax.random.PRNGKey(7)
    wh = jax.random.normal(key, (512, 3))
    wh = wh / jnp.linalg.norm(wh, axis=-1, keepdims=True)
    wh = wh.at[:, 2].set(jnp.abs(wh[:, 2]))
    a = 0.37
    iso = np.asarray(warp.eval_ggx_ndf(jnp.asarray(a), wh[:, 2]))
    aniso = np.asarray(warp.eval_ggx_ndf_aniso(wh, a, a))
    np.testing.assert_allclose(aniso, iso, rtol=2e-3, atol=1e-4)


def test_diffuse_sggx_sampler_upper_hemisphere_of_wm():
    key = jax.random.PRNGKey(8)
    m = 512
    n = jnp.asarray(_nrm(np.array([[0.0, 0.0, 1.0]] * m, np.float32)))
    wi = jnp.asarray(_nrm(np.array([[0.1, 0.3, 0.95]] * m, np.float32)))
    alpha = jnp.full((m,), 0.5)
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, (m, 2))
    u2 = jax.random.uniform(k2, (m, 2))
    wo = np.asarray(warp.sample_diffuse_sggx(u1, u2, n, wi, alpha))
    np.testing.assert_allclose(np.linalg.norm(wo, axis=-1), 1.0, atol=1e-4)
    pdf = np.asarray(warp.eval_diffuse_sggx(u1, wi, n, jnp.asarray(wo),
                                            alpha))
    assert (pdf >= 0).all() and pdf.mean() > 0.05
