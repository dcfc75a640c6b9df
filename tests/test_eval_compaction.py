"""Eval-path compaction parity: secondary-sample compaction and
visibility compaction must reproduce the full-width render (differences
bounded by the dropped weight<1e-5 contributions)."""

import jax
import jax.numpy as jnp
import numpy as np

from rise_sdf_tpu import models
from rise_sdf_tpu.presets import tiny_split_config


def _setup(shell_occ=False, **model_overrides):
    cfg = tiny_split_config()
    for k, v in model_overrides.items():
        cfg["model"][k] = v
    model = models.make(cfg.model.name, cfg.model)
    params = model.init(jax.random.PRNGKey(0))
    res = model.grid_resolution
    if shell_occ:
        # realistic converged-like occupancy: thin shell at r = 0.5
        g = (np.arange(res) + 0.5) / res * 2 * model.radius - model.radius
        x, y, z = np.meshgrid(g, g, g, indexing="ij")
        r = np.sqrt(x * x + y * y + z * z)
        cell = 2 * model.radius / res
        occ = jnp.asarray((np.abs(r - 0.5) < 2 * cell).reshape(-1))
    else:
        occ = jnp.ones((res ** 3,), bool)
    n_rays = 64
    rays_o = jnp.tile(jnp.asarray([[0.0, 0.0, -4.0]]), (n_rays, 1))
    z = jnp.linspace(-0.3, 0.3, n_rays)
    rays_d = jnp.stack([z * 0.5, z, jnp.ones_like(z)], -1)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays = jnp.concatenate([rays_o, rays_d], -1)
    return model, params, occ, rays


def _render(model, params, occ, rays, capacity=2048):
    mips = model.emitter.build_mips(params["emitter"])
    return model.forward(
        params, rays, occ_binary=occ, mips=mips,
        step=jnp.asarray(20, jnp.int32), rng=None, stage=1, train=False,
        capacity=capacity, background_color=jnp.ones((3,)))


def test_compaction_matches_full_width():
    model_full, params, occ, rays = _setup(shell_occ=True)
    model_cmp, _, _, _ = _setup(shell_occ=True,
                                secondary_sample_capacity_frac=0.5,
                                eval_visibility_frac=0.5)
    out_f = _render(model_full, params, occ, rays)
    out_c = _render(model_cmp, params, occ, rays)
    assert bool(out_c["ray_included"].all()), "unexpected overflow"
    for k in ("comp_rgb_full", "comp_rgb_phys_full", "comp_albedo",
              "opacity", "depth"):
        np.testing.assert_allclose(
            np.asarray(out_c[k]), np.asarray(out_f[k]), atol=2e-3,
            err_msg=k)


def test_secondary_overflow_flags_rays():
    """A tiny secondary budget must flag (not silently corrupt) rays."""
    model, params, occ, rays = _setup(secondary_sample_capacity_frac=0.01)
    out = _render(model, params, occ, rays)
    # with a full occupancy grid nearly every secondary sample is live ->
    # most rays with secondary blending overflow the 1% budget
    assert not bool(out["ray_included"].all())


def test_visibility_overflow_flags_rays():
    model, params, occ, rays = _setup(eval_visibility_frac=0.01)
    out = _render(model, params, occ, rays)
    assert not bool(out["ray_included"].all())
