"""Hybrid FD/analytic hash-grid gradients vs the plain 6-probe FD path.

The hybrid path Taylor-expands the coarse levels (linear within a cell)
and re-encodes only the finest levels at the probe points; it must agree
with plain FD wherever no coarse-cell boundary lies between the probes,
and stay close on average elsewhere.  Level specialization (static
``levels``) must be exactly equivalent to the masked full encode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rise_sdf_tpu.models.geometry import VolumeSDF
from rise_sdf_tpu.presets import geometry_cfg


def make_sdf(fd_taylor):
    cfg = geometry_cfg("finite_difference", progressive=True, levels=6)
    cfg["xyz_encoding_config"]["per_level_scale"] = 1.45
    cfg["xyz_encoding_config"]["base_resolution"] = 8
    cfg["fd_taylor_coarse"] = fd_taylor
    g = VolumeSDF(cfg)
    params = g.init(jax.random.PRNGKey(0))
    # non-trivial table so gradients are informative
    params["encoding"]["table"] = jax.random.normal(
        jax.random.PRNGKey(1), params["encoding"]["table"].shape) * 0.1
    # perturb the MLP off sphere init: its feature-input columns start
    # exactly zero, which makes table gradients legitimately vanish
    keys = jax.random.split(jax.random.PRNGKey(2), 16)
    leaves, treedef = jax.tree_util.tree_flatten(params["mlp"])
    leaves = [l + 0.05 * jax.random.normal(k, jnp.shape(l))
              for l, k in zip(leaves, keys)]
    params["mlp"] = jax.tree_util.tree_unflatten(treedef, leaves)
    return g, params


def test_levels_specialization_matches_masked_encode():
    g, params = make_sdf(False)
    x = jax.random.uniform(jax.random.PRNGKey(2), (257, 3),
                           minval=-1.4, maxval=1.4)
    # step such that 4 of 6 levels are open: start_level=2, start_step=10,
    # update_steps=10 -> step 30 opens level 4
    step = 30
    hg = g.encoding.encoding
    open_now = int(hg.start_level + max(step - hg.start_step, 0)
                   // hg.update_steps)
    assert g.open_levels(step) == open_now
    full = g.raw(params, x, step)               # traced mask zeroes closed
    spec = g.raw(params, x, step, levels=open_now)
    np.testing.assert_allclose(np.asarray(full), np.asarray(spec),
                               rtol=1e-6, atol=1e-7)


def test_hybrid_fd_matches_plain_fd():
    g_plain, params = make_sdf(False)
    g_hyb, _ = make_sdf(True)
    x = jax.random.uniform(jax.random.PRNGKey(3), (512, 3),
                           minval=-1.0, maxval=1.0)
    step = 1000  # all levels open
    L = g_plain.encoding.encoding.n_levels
    out_p = g_plain.forward(params, x, step, with_grad=True,
                            with_feature=True, levels=L)
    out_h = g_hyb.forward(params, x, step, with_grad=True,
                          with_feature=True, levels=L)
    # identical base values (same gathers, same head)
    np.testing.assert_allclose(np.asarray(out_p["sdf"]),
                               np.asarray(out_h["sdf"]), rtol=2e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_p["feature"]),
                               np.asarray(out_h["feature"]), rtol=2e-5,
                               atol=1e-6)
    gp = np.asarray(out_p["grad"])
    gh = np.asarray(out_h["grad"])
    # gradients agree closely (exact unless a coarse-cell boundary falls
    # between probe points; this table is iid noise — the worst case for
    # the Taylor term, real trained tables are far smoother)
    err = np.linalg.norm(gp - gh, axis=-1)
    scale = np.linalg.norm(gp, axis=-1) + 1e-3
    assert np.median(err / scale) < 0.05, np.median(err / scale)
    assert np.mean(err / scale) < 0.2, np.mean(err / scale)
    # direction agreement (what the eikonal/normals consume)
    cos = np.sum(gp * gh, -1) / (np.linalg.norm(gp, axis=-1)
                                 * np.linalg.norm(gh, axis=-1) + 1e-9)
    assert np.mean(cos) > 0.995, np.mean(cos)


def test_hybrid_fd_second_order_differentiable():
    """The eikonal loss differentiates through the FD grad — the hybrid
    path's table gradients must be finite, nonzero, and close to the
    plain-FD path's."""
    g_plain, params = make_sdf(False)
    g_hyb, _ = make_sdf(True)
    x = jax.random.uniform(jax.random.PRNGKey(4), (64, 3),
                           minval=-1.0, maxval=1.0)
    L = g_plain.encoding.encoding.n_levels

    def eikonal(g):
        def f(p):
            out = g.forward(p, x, 1000, with_grad=True, with_feature=False,
                            levels=L)
            gn = jnp.sqrt(jnp.sum(out["grad"] ** 2, -1) + 1e-12)
            return jnp.mean((gn - 1.0) ** 2)
        return f

    gp = jax.grad(eikonal(g_plain))(params)
    gh = jax.grad(eikonal(g_hyb))(params)
    for leaf in jax.tree_util.tree_leaves(gh):
        assert np.isfinite(np.asarray(leaf)).all()
    tp = np.asarray(gp["encoding"]["table"]).ravel()
    th = np.asarray(gh["encoding"]["table"]).ravel()
    assert np.abs(th).sum() > 0.0
    # cosine similarity of the second-order table gradients
    cos = np.dot(tp, th) / (np.linalg.norm(tp) * np.linalg.norm(th) + 1e-12)
    assert cos > 0.95, cos


def test_hybrid_laplace_close_to_plain():
    g_plain, params = make_sdf(False)
    g_hyb, _ = make_sdf(True)
    x = jax.random.uniform(jax.random.PRNGKey(6), (256, 3),
                           minval=-1.0, maxval=1.0)
    L = g_plain.encoding.encoding.n_levels
    k = jax.random.PRNGKey(7)
    lp = np.asarray(g_plain.forward(params, x, 1000, with_grad=True,
                                    with_laplace=True, rng=k,
                                    levels=L)["laplace"])
    lh = np.asarray(g_hyb.forward(params, x, 1000, with_grad=True,
                                  with_laplace=True, rng=k,
                                  levels=L)["laplace"])
    # curvature probes differ slightly (plain FD grad vs hybrid + the
    # offset-grad construction); require aggregate agreement
    assert np.isfinite(lh).all()
    np.testing.assert_allclose(lh.mean(), lp.mean(), rtol=0.2, atol=0.02)


def test_curvature_probe_trim_stride():
    """curvature_probe_frac < 1 probes a strided subset: [ceil(N/s)]
    laplace, finite, and an unbiased estimate of the full-probe mean
    (both hybrid and plain-FD branches)."""
    for fd_taylor in (True, False):
        g_full, params = make_sdf(fd_taylor)
        cfg = dict(g_full.config)
        cfg["curvature_probe_frac"] = 0.25
        g_trim = VolumeSDF(cfg)
        assert g_trim.laplace_stride == 4

        x = jax.random.uniform(jax.random.PRNGKey(8), (512, 3),
                               minval=-1.0, maxval=1.0)
        L = g_full.encoding.encoding.n_levels
        k = jax.random.PRNGKey(9)
        lt = np.asarray(g_trim.forward(params, x, 1000, with_grad=True,
                                       with_laplace=True, rng=k,
                                       levels=L)["laplace"])
        lf = np.asarray(g_full.forward(params, x, 1000, with_grad=True,
                                       with_laplace=True, rng=k,
                                       levels=L)["laplace"])
        assert lt.shape == (128,)
        assert lf.shape == (512,)
        assert np.isfinite(lt).all()
        # same estimator on a 4x-smaller sample: means agree loosely
        np.testing.assert_allclose(lt.mean(), lf.mean(), rtol=0.35,
                                   atol=0.03)


def test_fd_fine_k_override():
    g, _ = make_sdf(True)
    assert g._fd_fine_k() >= 1
    cfg = dict(g.config)
    cfg["fd_fine_k"] = 3
    assert VolumeSDF(cfg)._fd_fine_k() == 3
