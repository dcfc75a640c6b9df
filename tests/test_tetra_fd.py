"""Tetrahedral 4-probe FD gradients vs 6-point central differences."""

import jax
import jax.numpy as jnp
import numpy as np

from rise_sdf_tpu.models.geometry import VolumeSDF
from rise_sdf_tpu.presets import geometry_cfg


def _make(mode, taylor):
    cfg = geometry_cfg("finite_difference", progressive=True, levels=6)
    cfg["xyz_encoding_config"]["per_level_scale"] = 1.45
    cfg["fd_probe_mode"] = mode
    cfg["fd_taylor_coarse"] = taylor
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


def test_tetra_close_to_central_both_paths():
    x = jax.random.uniform(jax.random.PRNGKey(3), (512, 3),
                           minval=-1.0, maxval=1.0)
    for taylor in (False, True):
        g6, params = _make("central6", taylor)
        g4, _ = _make("tetra4", taylor)
        L = g6.encoding.encoding.n_levels
        o6 = g6.forward(params, x, 1000, with_grad=True, levels=L)
        o4 = g4.forward(params, x, 1000, with_grad=True, levels=L)
        gp, gt = np.asarray(o6["grad"]), np.asarray(o4["grad"])
        cos = np.sum(gp * gt, -1) / (np.linalg.norm(gp, axis=-1)
                                     * np.linalg.norm(gt, axis=-1) + 1e-9)
        # same field, same eps scale: directions agree strongly on average
        assert np.mean(cos) > 0.95, (taylor, np.mean(cos))
        # magnitudes in the same ballpark
        ratio = (np.linalg.norm(gt, axis=-1) + 1e-6) \
            / (np.linalg.norm(gp, axis=-1) + 1e-6)
        assert 0.8 < np.median(ratio) < 1.25, (taylor, np.median(ratio))


def test_tetra_exact_on_linear_field():
    """On an affine function both probe sets are exact."""
    g4, params = _make("tetra4", False)

    w = np.array([0.3, -0.7, 0.5], np.float32)
    eps = 0.05
    v = np.asarray(g4._fd_offsets())
    s = jnp.asarray((v @ w)[:, None] * eps + 2.0)  # s(x + eps v) - affine
    grad = np.asarray(g4._fd_combine(s, jnp.asarray(eps)))
    np.testing.assert_allclose(grad[0], w, rtol=1e-5, atol=1e-6)
