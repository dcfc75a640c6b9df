"""Sorted-segment custom VJP vs plain autodiff for the hash encode."""

import jax
import jax.numpy as jnp
import numpy as np

from rise_sdf_tpu.ops.hashgrid import HashGridEncoding


def make_enc():
    return HashGridEncoding(3, {
        "otype": "HashGrid", "n_levels": 4, "n_features_per_level": 2,
        "log2_hashmap_size": 10, "base_resolution": 4,
        "per_level_scale": 1.7})


def test_forward_identical():
    enc = make_enc()
    params = enc.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=0.01,
                           maxval=0.99)
    a = enc.apply(params, x, grad_impl="plain")
    b = enc.apply(params, x, grad_impl="sorted")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_table_grads_match():
    enc = make_enc()
    params = enc.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=0.01,
                           maxval=0.99)
    w = jax.random.normal(jax.random.PRNGKey(2), (enc.n_output_dims,))

    def loss(p, impl):
        return jnp.sum(enc.apply(p, x, grad_impl=impl) * w[None, :] ** 2)

    g_plain = jax.grad(lambda p: loss(p, "plain"))(params)["table"]
    g_sorted = jax.grad(lambda p: loss(p, "sorted"))(params)["table"]
    # prefix-sum accumulation: f32 error ~ eps * |prefix|; well below
    # optimizer noise
    np.testing.assert_allclose(np.asarray(g_sorted), np.asarray(g_plain),
                               rtol=1e-3, atol=1e-4)


def test_x_grads_match():
    enc = make_enc()
    params = enc.init(jax.random.PRNGKey(3))
    x = jax.random.uniform(jax.random.PRNGKey(4), (32, 3), minval=0.05,
                           maxval=0.95)

    def loss(xx, impl):
        return jnp.sum(jnp.sin(enc.apply(params, xx, grad_impl=impl) * 50))

    g_plain = jax.grad(lambda xx: loss(xx, "plain"))(x)
    g_sorted = jax.grad(lambda xx: loss(xx, "sorted"))(x)
    np.testing.assert_allclose(np.asarray(g_sorted), np.asarray(g_plain),
                               rtol=1e-3, atol=1e-4)


def test_progressive_mask_grads():
    enc = HashGridEncoding(3, {
        "otype": "ProgressiveBandHashGrid", "n_levels": 4,
        "n_features_per_level": 2, "log2_hashmap_size": 10,
        "base_resolution": 4, "per_level_scale": 1.7,
        "start_level": 2, "start_step": 0, "update_steps": 100})
    params = enc.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3))

    def loss(p, impl):
        return jnp.sum(enc.apply(p, x, step=0, grad_impl=impl))

    g_p = jax.grad(lambda p: loss(p, "plain"))(params)["table"]
    g_s = jax.grad(lambda p: loss(p, "sorted"))(params)["table"]
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_p), atol=1e-5)
    # masked levels (>= 2) receive zero gradient
    assert np.abs(np.asarray(g_s)[2:]).max() == 0.0
