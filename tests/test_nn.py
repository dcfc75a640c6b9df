import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rise_sdf_tpu.nn import (
    MLP,
    FrequencyEncoding,
    SHEncoding,
    get_encoding,
    spherical_harmonics,
)


def test_mlp_shapes_and_grad():
    mlp = MLP(16, 4, {"n_neurons": 32, "n_hidden_layers": 2,
                      "output_activation": None})
    params = mlp.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (7, 16))
    y = mlp.apply(params, x)
    assert y.shape == (7, 4)
    g = jax.grad(lambda p: mlp.apply(p, x).sum())(params)
    assert jax.tree_util.tree_structure(g) == jax.tree_util.tree_structure(params)


def test_sphere_init_approximates_sphere():
    """Sphere-init SDF net ~ |x| - r at init (reference network_utils:128-144)."""
    cfg = {"n_neurons": 64, "n_hidden_layers": 2, "sphere_init": True,
           "sphere_init_radius": 0.5, "weight_norm": True,
           "output_activation": None}
    mlp = MLP(3, 1, cfg)
    params = mlp.init(jax.random.PRNGKey(0))
    pts = jax.random.normal(jax.random.PRNGKey(1), (256, 3))
    pts = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    sdf = {r: mlp.apply(params, pts * r)[:, 0] for r in [0.2, 0.5, 0.9]}
    # zero level set near the init radius, negative inside, positive outside
    assert jnp.abs(sdf[0.5]).mean() < 0.1
    assert float(sdf[0.2].max()) < 0.0
    assert float(sdf[0.9].min()) > 0.0
    assert jnp.abs(sdf[0.9] - 0.4).mean() < 0.25


def test_weight_norm_identity_at_init():
    cfg = {"n_neurons": 8, "n_hidden_layers": 1, "weight_norm": True,
           "output_activation": None}
    mlp = MLP(4, 2, cfg)
    params = mlp.init(jax.random.PRNGKey(0))
    layer = params["layers"][0]
    w = MLP._weight(layer)
    np.testing.assert_allclose(np.asarray(w), np.asarray(layer["v"]), rtol=1e-5)


def test_frequency_encoding():
    enc = FrequencyEncoding(3, {"n_frequencies": 4})
    x = jnp.array([[0.1, 0.2, 0.3]])
    out = enc.apply({}, x)
    assert out.shape == (1, 3 * 2 * 4)
    np.testing.assert_allclose(np.asarray(out[0, :3]),
                               np.sin(np.array([0.1, 0.2, 0.3])), rtol=1e-5)


def test_frequency_mask_progression():
    enc = FrequencyEncoding(3, {"n_frequencies": 4, "n_masking_step": 100})
    m0 = enc.mask(0)
    m_half = enc.mask(50)
    m_end = enc.mask(100)
    assert float(m0[0]) == 0.0
    assert float(m_half[0]) == 1.0 and float(m_half[-1]) == 0.0
    assert np.allclose(np.asarray(m_end), 1.0)


def test_sh_orthonormality():
    """Monte-Carlo check: SH basis is orthonormal over the sphere."""
    n = 200000
    rng = np.random.default_rng(0)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    basis = np.asarray(spherical_harmonics(jnp.asarray(v), 5))  # [n, 25]
    gram = basis.T @ basis / n * (4 * np.pi)
    np.testing.assert_allclose(gram, np.eye(25), atol=0.15)


def test_hashgrid_encoding_basic():
    cfg = {"otype": "HashGrid", "n_levels": 4, "n_features_per_level": 2,
           "log2_hashmap_size": 15, "base_resolution": 4,
           "per_level_scale": 2.0, "include_xyz": True}
    enc = get_encoding(3, cfg)
    params = enc.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (11, 3))
    out = enc.apply(params, x)
    assert out.shape == (11, 3 + 4 * 2)
    # xyz passthrough scaled to [-1, 1]
    np.testing.assert_allclose(np.asarray(out[:, :3]),
                               np.asarray(x * 2 - 1), rtol=1e-5)
    # grads flow to the table
    g = jax.grad(lambda p: enc.apply(p, x).sum())(params)
    assert float(jnp.abs(g["table"]).sum()) > 0


def test_hashgrid_continuity():
    """Trilinear interp: encoding is continuous across a corner."""
    cfg = {"otype": "HashGrid", "n_levels": 2, "n_features_per_level": 2,
           "log2_hashmap_size": 10, "base_resolution": 8,
           "per_level_scale": 2.0}
    enc = get_encoding(3, cfg)
    params = enc.init(jax.random.PRNGKey(3))
    eps = 1e-6
    x0 = jnp.array([[0.25 - eps, 0.3, 0.4]])
    x1 = jnp.array([[0.25 + eps, 0.3, 0.4]])
    a, b = enc.apply(params, x0), enc.apply(params, x1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_progressive_hashgrid_mask():
    cfg = {"otype": "ProgressiveBandHashGrid", "n_levels": 8,
           "n_features_per_level": 2, "log2_hashmap_size": 12,
           "base_resolution": 4, "per_level_scale": 1.5,
           "start_level": 2, "start_step": 100, "update_steps": 50}
    enc = get_encoding(3, cfg)
    params = enc.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (5, 3))
    out0 = enc.apply(params, x, step=0)
    assert np.abs(np.asarray(out0[:, 2 * 2:])).max() == 0  # levels >= 2 masked
    out_late = enc.apply(params, x, step=100 + 50 * 6)
    assert np.abs(np.asarray(out_late[:, -2:])).max() > 0  # all levels open
