"""Pallas scatter-add kernel parity (interpret mode on the CPU suite;
the real kernel path is exercised on TPU by scripts/scatter_kernel_bench
and the training step)."""

import jax
import jax.numpy as jnp
import numpy as np

from rise_sdf_tpu.ops.scatter_pallas import (
    pallas_scatter_add,
    scatter_add_reference,
    table_grad_lookup,
)


def test_scatter_add_matches_xla():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    m, t = 3 * 8192 + 100, 4096  # non-multiple M exercises padding
    idx = jax.random.randint(k1, (m,), 0, t, dtype=jnp.int32)
    vals = jax.random.normal(k2, (m, 2))
    got = pallas_scatter_add(idx, vals, t, True)
    want = scatter_add_reference(idx, vals, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_scatter_add_odd_table_size():
    # dense-level table sizes aren't multiples of 64 entries
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    m, t = 8192, 35937  # (32+1)^3
    idx = jax.random.randint(k1, (m,), 0, t, dtype=jnp.int32)
    vals = jax.random.normal(k2, (m, 2))
    got = pallas_scatter_add(idx, vals, t, True)
    want = scatter_add_reference(idx, vals, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_table_grad_lookup_backward_matches_gather():
    key = jax.random.PRNGKey(2)
    k1, k2, k3 = jax.random.split(key, 3)
    t = 2048
    table = jax.random.normal(k1, (t, 2))
    flat = jax.random.randint(k2, (512, 8), 0, t, dtype=jnp.int32)
    cot = jax.random.normal(k3, (512, 8, 2))

    def loss_custom(tb):
        return jnp.sum(table_grad_lookup(tb, flat, True) * cot)

    def loss_plain(tb):
        return jnp.sum(tb[flat] * cot)

    np.testing.assert_allclose(float(loss_custom(table)),
                               float(loss_plain(table)), rtol=1e-6)
    g_c = np.asarray(jax.grad(loss_custom)(table))
    g_p = np.asarray(jax.grad(loss_plain)(table))
    np.testing.assert_allclose(g_c, g_p, rtol=1e-5, atol=1e-5)


def test_hashgrid_pallas_grads_match_xla():
    """Full encode + FD-style loss: table gradients identical between the
    XLA and Pallas(interpret) scatter implementations, including the
    second-order eikonal pattern."""
    from rise_sdf_tpu.models.geometry import VolumeSDF
    from rise_sdf_tpu.presets import geometry_cfg

    def build(impl):
        cfg = geometry_cfg("finite_difference", progressive=True, levels=4)
        cfg["xyz_encoding_config"]["scatter_impl"] = impl
        cfg["xyz_encoding_config"]["log2_hashmap_size"] = 10
        g = VolumeSDF(cfg)
        params = g.init(jax.random.PRNGKey(0))
        params["encoding"]["table"] = jax.random.normal(
            jax.random.PRNGKey(1), params["encoding"]["table"].shape) * 0.1
        leaves, treedef = jax.tree_util.tree_flatten(params["mlp"])
        keys = jax.random.split(jax.random.PRNGKey(2), len(leaves))
        params["mlp"] = jax.tree_util.tree_unflatten(
            treedef, [l + 0.05 * jax.random.normal(k, jnp.shape(l))
                      for l, k in zip(leaves, keys)])
        return g, params

    x = jax.random.uniform(jax.random.PRNGKey(3), (64, 3),
                           minval=-1.0, maxval=1.0)

    def eikonal(g, params):
        def f(p):
            out = g.forward(p, x, 1000, with_grad=True, with_feature=True,
                            levels=4)
            gn = jnp.sqrt(jnp.sum(out["grad"] ** 2, -1) + 1e-12)
            return (jnp.mean((gn - 1.0) ** 2)
                    + jnp.mean(out["feature"] ** 2))
        return jax.grad(f)(params)

    g_x, params = build("xla")
    g_p, _ = build("pallas")
    gx = eikonal(g_x, params)
    gp = eikonal(g_p, params)
    np.testing.assert_allclose(
        np.asarray(gp["encoding"]["table"]),
        np.asarray(gx["encoding"]["table"]), rtol=1e-4, atol=1e-6)
