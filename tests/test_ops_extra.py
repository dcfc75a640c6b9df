import jax
import jax.numpy as jnp
import numpy as np

from rise_sdf_tpu.ops.grid_sample import grid_sample_2d, grid_sample_3d
from rise_sdf_tpu.ops.resample import ray_resampling
from rise_sdf_tpu.ops.warp import (
    coordinate_system,
    eval_ggx_ndf,
    fibonacci_sphere,
    frostbite_diffuse,
    lambert,
    pbr_specular,
    sample_ggx_vndf,
    square_to_cosine_hemisphere,
    to_local,
    to_world,
)


def test_grid_sample_2d_exact_and_secondorder():
    img = jnp.arange(12.0).reshape(3, 4, 1)
    # corners map exactly (align_corners=True)
    uv = jnp.asarray([[-1.0, -1.0], [1.0, 1.0], [0.0, 0.0]])
    out = grid_sample_2d(img, uv)
    np.testing.assert_allclose(np.asarray(out[:, 0]), [0.0, 11.0, 5.5],
                               atol=1e-5)
    # second-order differentiability (the whole point vs torch)
    f = lambda g: (grid_sample_2d(img, g) ** 2).sum()
    h = jax.hessian(f)(jnp.asarray([[0.1, 0.2]]))
    assert np.isfinite(np.asarray(h)).all()


def test_grid_sample_3d_constant():
    vol = jnp.full((4, 5, 6, 2), 3.0)
    g = jax.random.uniform(jax.random.PRNGKey(0), (10, 3)) * 2 - 1
    out = grid_sample_3d(vol, g)
    np.testing.assert_allclose(np.asarray(out), 3.0, atol=1e-6)


def test_ray_resampling_concentrates():
    r, s = 2, 32
    t = jnp.linspace(0, 1, s + 1)
    ts = jnp.tile(t[:-1][None], (r, 1))
    te = jnp.tile(t[1:][None], (r, 1))
    w = jnp.zeros((r, s)).at[:, 16].set(100.0)  # all mass near t=0.5
    live = jnp.ones((r, s), bool)
    nts, nte = ray_resampling(ts, te, w, live, n_new=16)
    mids = np.asarray(0.5 * (nts + nte))
    # most new samples should sit near 0.5
    assert (np.abs(mids - 0.516) < 0.1).mean() > 0.5
    assert (np.diff(np.asarray(nts), axis=1) >= -1e-6).all()


def test_frames_roundtrip():
    n = jax.random.normal(jax.random.PRNGKey(1), (50, 3))
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    v = jax.random.normal(jax.random.PRNGKey(2), (50, 3))
    back = to_world(to_local(v, n), n)
    np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=1e-5)
    t, b = coordinate_system(n)
    np.testing.assert_allclose(np.asarray(jnp.sum(t * n, -1)), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.sum(t * b, -1)), 0, atol=1e-5)


def test_cosine_hemisphere_distribution():
    u = jax.random.uniform(jax.random.PRNGKey(3), (20000, 2))
    d = square_to_cosine_hemisphere(u)
    assert float(d[:, 2].min()) >= 0
    # E[cos] for cosine-weighted = 2/3
    np.testing.assert_allclose(float(d[:, 2].mean()), 2.0 / 3.0, atol=0.02)


def test_ggx_vndf_normalized_dirs():
    wi = jnp.asarray([[0.3, 0.1, 0.95]])
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    wi = jnp.tile(wi, (1000, 1))
    u = jax.random.uniform(jax.random.PRNGKey(4), (1000, 2))
    h = sample_ggx_vndf(wi, jnp.full((1000,), 0.3), u)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(h, axis=-1)), 1.0,
                               atol=1e-5)
    assert float(h[:, 2].min()) >= -1e-6


def test_bsdf_mirrors_sane():
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    wi = jnp.asarray([[0.0, 0.6, 0.8]])
    wo = jnp.asarray([[0.0, -0.6, 0.8]])
    lam = lambert(n, wi)
    np.testing.assert_allclose(float(lam[0, 0]), 0.8 / np.pi, rtol=1e-5)
    fro = frostbite_diffuse(n, wi, wo, jnp.asarray([[0.5]]))
    assert np.isfinite(np.asarray(fro)).all() and float(fro[0, 0]) > 0
    spec = pbr_specular(jnp.asarray([[0.9, 0.9, 0.9]]), n, wo, wi,
                        jnp.asarray([0.2]))
    assert np.isfinite(np.asarray(spec)).all() and float(spec[0, 0]) > 0
    # below-horizon light gives zero
    wi_below = jnp.asarray([[0.0, 0.6, -0.8]])
    assert float(lambert(n, wi_below)[0, 0]) == 0.0


def test_fibonacci_sphere():
    pts = fibonacci_sphere(100)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=-1), 1.0, atol=1e-6)
    assert np.abs(pts.mean(0)).max() < 0.05
