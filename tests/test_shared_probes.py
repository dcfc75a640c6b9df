"""Shared-neighborhood FD-probe encode parity.

``HashGridEncoding.encode_axis_probes`` reconstructs the base point's
and every axis-aligned probe's trilinear interpolation from ONE
32-point "plus" neighborhood gather (vs 7 x 8 corner gathers), cutting
the hybrid-FD fine band's gather AND backward scatter rows by 43%
(replaces tcnn's fused probe encodes around reference
``models/geometry.py:304-320`` finite differences).  It must match the
per-point ``apply`` path exactly (up to fp reduction order).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rise_sdf_tpu.models.geometry import VolumeSDF
from rise_sdf_tpu.ops.hashgrid import HashGridEncoding
from rise_sdf_tpu.presets import geometry_cfg

AXES = (0, 0, 1, 1, 2, 2)
SIGNS = (1.0, -1.0, 1.0, -1.0, 1.0, -1.0)


def _grid(levels=6, log2=8, base=4, scale=1.5):
    # base=4, log2=8: levels 0-2 dense-indexed, the rest hashed
    return HashGridEncoding(3, {
        "otype": "HashGrid", "n_levels": levels,
        "n_features_per_level": 2, "log2_hashmap_size": log2,
        "base_resolution": base, "per_level_scale": scale})


def _points(hg, n=257, seed=0, edge=False):
    rng = np.random.RandomState(seed)
    if edge:
        # cluster at the domain faces so probes clip and i0 clamps
        u = rng.rand(n, 3).astype(np.float32)
        u[: n // 2] *= 0.01
        u[n // 2:] = 1.0 - 0.01 * u[n // 2:]
    else:
        u = rng.rand(n, 3).astype(np.float32)
    eps = 1.0 / float(hg.resolutions[-1])
    probes = []
    for axis, sign in zip(AXES, SIGNS):
        up = u.copy()
        up[:, axis] = np.clip(up[:, axis] + sign * eps, 0.0, 1.0)
        probes.append(up)
    return jnp.asarray(u), jnp.asarray(np.stack(probes))


@pytest.mark.parametrize("levels", [None, (2, 5)])
@pytest.mark.parametrize("edge", [False, True])
def test_encode_axis_probes_matches_apply(levels, edge):
    hg = _grid()
    params = hg.init(jax.random.PRNGKey(1))
    u, up = _points(hg, edge=edge)
    fused = hg.encode_axis_probes(params, u, up, AXES, levels=levels)
    ref = jnp.stack([hg.apply(params, u, levels=levels)]
                    + [hg.apply(params, up[p], levels=levels)
                       for p in range(len(AXES))])
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=2e-6)


def test_encode_axis_probes_table_grad_matches():
    hg = _grid()
    params = hg.init(jax.random.PRNGKey(2))
    u, up = _points(hg, n=129, seed=3)
    cot = jax.random.normal(jax.random.PRNGKey(4),
                            (len(AXES) + 1, 129, hg.n_output_dims))

    def loss_fused(p):
        return jnp.sum(hg.encode_axis_probes(p, u, up, AXES) * cot)

    def loss_ref(p):
        out = jnp.stack([hg.apply(p, u)]
                        + [hg.apply(p, up[i]) for i in range(len(AXES))])
        return jnp.sum(out * cot)

    g_f = jax.grad(loss_fused)(params)["table"]
    g_r = jax.grad(loss_ref)(params)["table"]
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_r), atol=2e-5)


def _geom(shared: bool):
    cfg = geometry_cfg("finite_difference", progressive=True)
    cfg["fd_shared_probes"] = shared
    return VolumeSDF(cfg)


def test_hybrid_fd_shared_probes_parity():
    """Full geometry forward (sdf/grad/feature/laplace) is unchanged by
    the shared-neighborhood path at an open-level count where the fine
    band is active."""
    g_on, g_off = _geom(True), _geom(False)
    assert g_on._shared_probes_ok(4) and not g_off._shared_probes_ok(4)
    params = g_on.init(jax.random.PRNGKey(0))
    x = (jax.random.uniform(jax.random.PRNGKey(5), (333, 3)) * 2.4 - 1.2)
    rng = jax.random.PRNGKey(6)
    step = jnp.asarray(25, jnp.int32)
    o_on = g_on.forward(params, x, step, with_laplace=True, rng=rng,
                        levels=4)
    o_off = g_off.forward(params, x, step, with_laplace=True, rng=rng,
                          levels=4)
    for k in ("sdf", "grad", "feature", "laplace"):
        np.testing.assert_allclose(np.asarray(o_on[k]), np.asarray(o_off[k]),
                                   atol=5e-5, err_msg=k)


def test_hybrid_fd_shared_probes_param_grads_parity():
    """Training-path equivalence: d loss / d params match between the
    shared and per-probe encodes (eikonal-style loss on the FD grad)."""
    g_on, g_off = _geom(True), _geom(False)
    params = g_on.init(jax.random.PRNGKey(0))
    x = (jax.random.uniform(jax.random.PRNGKey(7), (129, 3)) * 2.0 - 1.0)
    step = jnp.asarray(25, jnp.int32)

    def loss(geom):
        def f(p):
            out = geom.forward(p, x, step, levels=4)
            eik = jnp.mean((jnp.linalg.norm(out["grad"], axis=-1) - 1.0) ** 2)
            return eik + jnp.mean(out["sdf"] ** 2)
        return f

    g1 = jax.grad(loss(g_on))(params)
    g2 = jax.grad(loss(g_off))(params)
    flat1 = jax.tree_util.tree_leaves(g1)
    flat2 = jax.tree_util.tree_leaves(g2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
