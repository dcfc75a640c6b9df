"""Unit tests for the eval-time dense SDF bake (ops/sdf_bake.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rise_sdf_tpu.ops import sdf_bake

AABB_MIN = jnp.asarray([-1.5, -1.5, -1.5])
AABB_MAX = jnp.asarray([1.5, 1.5, 1.5])


def _rand_pos(n, key=0, margin=1e-3):
    rng = np.random.RandomState(key)
    lo = np.asarray(AABB_MIN) + margin
    hi = np.asarray(AABB_MAX) - margin
    return jnp.asarray(rng.uniform(lo, hi, size=(n, 3)).astype(np.float32))


def test_linear_field_exact():
    """Trilinear interpolation reproduces affine fields exactly."""
    a = jnp.asarray([0.3, -0.7, 0.2])
    fn = lambda p: p @ a + 0.1
    bake = sdf_bake.bake_packed(fn, AABB_MIN, AABB_MAX, cells=8, chunk=4096)
    pos = _rand_pos(512)
    got = sdf_bake.sample_packed(bake, pos, AABB_MIN, AABB_MAX)
    np.testing.assert_allclose(np.asarray(got), np.asarray(fn(pos)),
                               rtol=0, atol=1e-5)


def test_vertex_values_roundtrip():
    fn = lambda p: jnp.sin(p[:, 0] * 2) * jnp.cos(p[:, 1]) + p[:, 2]
    cells = 6
    verts = sdf_bake.bake_sdf_vertices(fn, AABB_MIN, AABB_MAX, cells,
                                       chunk=128)
    bake = {"packed": sdf_bake.pack_corners(verts),
            "cells": jnp.asarray(cells, jnp.int32)}
    lin = np.arange(cells + 1) / cells
    pts = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"),
                   -1).reshape(-1, 3).astype(np.float32)
    pos = jnp.asarray(np.asarray(AABB_MIN)
                      + pts * (np.asarray(AABB_MAX) - np.asarray(AABB_MIN)))
    got = sdf_bake.sample_packed(bake, pos, AABB_MIN, AABB_MAX)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(verts).reshape(-1), atol=2e-5)


def test_sphere_sdf_accuracy():
    """Smooth-SDF interpolation error is O(h^2): far below the probe's
    one-coarse-interval (0.02) safety margin at the default bake res."""
    fn = lambda p: jnp.linalg.norm(p, axis=-1) - 0.8
    bake = sdf_bake.bake_packed(fn, AABB_MIN, AABB_MAX, cells=64,
                                chunk=1 << 16)
    pos = _rand_pos(4096, key=1)
    got = sdf_bake.sample_packed(bake, pos, AABB_MIN, AABB_MAX)
    ref = fn(pos)
    err = np.abs(np.asarray(got) - np.asarray(ref))
    # keep the bound away from the grid origin where |x| curvature blows
    # up (err ~ h^2 / r); at r > 0.3, h = 3/64 = 0.047 -> ~2e-3 worst
    # case — two orders under the probe's 0.02 safety margin either way
    mask = np.asarray(jnp.linalg.norm(pos, axis=-1)) > 0.3
    assert err[mask].max() < 2e-3, err[mask].max()
    near = mask & (np.abs(np.asarray(ref)) < 0.1)
    assert err[near].max() < 1e-3, err[near].max()


def test_grad_matches_autodiff():
    fn = lambda p: jnp.linalg.norm(p, axis=-1) - 0.8
    bake = sdf_bake.bake_packed(fn, AABB_MIN, AABB_MAX, cells=16,
                                chunk=8192)
    pos = _rand_pos(256, key=2)

    sdf, grad = sdf_bake.sample_packed_grad(bake, pos, AABB_MIN, AABB_MAX)
    sdf2 = sdf_bake.sample_packed(bake, pos, AABB_MIN, AABB_MAX)
    np.testing.assert_allclose(np.asarray(sdf), np.asarray(sdf2), atol=1e-6)

    ad = jax.vmap(jax.grad(
        lambda p: sdf_bake.sample_packed(bake, p[None], AABB_MIN,
                                         AABB_MAX)[0]))(pos)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(ad),
                               rtol=1e-4, atol=1e-4)


def test_grad_approximates_true_normal():
    fn = lambda p: jnp.linalg.norm(p, axis=-1) - 0.8
    bake = sdf_bake.bake_packed(fn, AABB_MIN, AABB_MAX, cells=64,
                                chunk=1 << 16)
    # points near the surface, away from cell boundaries
    rng = np.random.RandomState(3)
    d = rng.normal(size=(512, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pos = jnp.asarray((d * rng.uniform(0.7, 0.9, (512, 1)))
                      .astype(np.float32))
    _, grad = sdf_bake.sample_packed_grad(bake, pos, AABB_MIN, AABB_MAX)
    g = np.array(grad)
    g /= np.linalg.norm(g, axis=-1, keepdims=True)
    cos = (g * d).sum(-1)
    assert cos.min() > 0.99, cos.min()  # within ~8 deg of the true normal


def test_out_of_aabb_clamps():
    fn = lambda p: p[:, 0]
    bake = sdf_bake.bake_packed(fn, AABB_MIN, AABB_MAX, cells=4, chunk=1024)
    pos = jnp.asarray([[5.0, 0.0, 0.0], [-5.0, 0.0, 0.0]])
    got = sdf_bake.sample_packed(bake, pos, AABB_MIN, AABB_MAX)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), [1.5, -1.5], atol=1e-5)


def _sphere_rays(n_rays=32):
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -4.0]]), (n_rays, 1))
    b = jnp.linspace(-0.45, 0.45, n_rays)
    d = jnp.stack([jnp.zeros_like(b), b / 4.0, jnp.ones_like(b)], -1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


@pytest.mark.parametrize("mode", ["probe", "full"])
def test_model_banded_eval_bake_parity(mode):
    """Banded eval served from the baked SDF grid (probe only / probe +
    secondary) matches the hash-served banded render; the bake only
    changes WHERE the band/transmittance numbers come from, not the
    shading math, so the images must agree to interpolation error."""
    from rise_sdf_tpu import models
    from rise_sdf_tpu.presets import tiny_split_config

    cfg = tiny_split_config()
    cfg["model"]["variance"]["init_val"] = 0.7  # inv_s ~ 1097
    cfg["model"]["num_samples_per_ray"] = 256
    base = {**{k: cfg.model[k] for k in cfg.model},
            "visibility_prefilter": True, "prefilter_stride": 4,
            "prefilter_margin_intervals": 1.0}
    model = models.make(cfg.model.name, base)
    model_b = models.make(cfg.model.name, {
        **base, "eval_sdf_bake": mode, "eval_sdf_bake_cells": 96})
    params = model.init(jax.random.PRNGKey(0))
    res = model.grid_resolution
    occ = jnp.ones((res ** 3,), bool)
    o, d = _sphere_rays(32)
    rays = jnp.concatenate([o, d], -1)
    mips = model.emitter.build_mips(params["emitter"])
    step = jnp.asarray(20, jnp.int32)
    cap = 768

    ref = model.forward(params, rays, occ_binary=occ, mips=mips, step=step,
                        rng=None, stage=1, train=False, capacity=cap,
                        background_color=jnp.ones((3,)), prefilter=True,
                        banded=True)
    assert bool(ref["ray_included"].all())

    bake = model_b.bake_eval_sdf(params, 20)
    assert bake is not None and bake["packed"].shape[-1] == 8
    params_b = {**params, "_eval_bake": bake}
    got = model_b.forward(params_b, rays, occ_binary=occ, mips=mips,
                          step=step, rng=None, stage=1, train=False,
                          capacity=cap, background_color=jnp.ones((3,)),
                          prefilter=True, banded=True)
    assert bool(got["ray_included"].all())
    for k, atol in (("comp_rgb_full", 1e-2), ("opacity", 1e-2),
                    ("depth", 2e-2)):
        np.testing.assert_allclose(np.asarray(got[k]),
                                   np.asarray(ref[k]), atol=atol,
                                   err_msg=k)


def test_train_params_never_bake():
    """Without the eval-only params key the baked model renders through
    the hash path bit-for-bit (training params never see the bake)."""
    from rise_sdf_tpu import models
    from rise_sdf_tpu.presets import tiny_split_config

    cfg = tiny_split_config()
    cfg["model"]["visibility_prefilter"] = True
    base = {k: cfg.model[k] for k in cfg.model}
    model = models.make(cfg.model.name, base)
    model_b = models.make(cfg.model.name,
                          {**base, "eval_sdf_bake": "full"})
    params = model.init(jax.random.PRNGKey(0))
    occ = jnp.ones((model.grid_resolution ** 3,), bool)
    o, d = _sphere_rays(8)
    rays = jnp.concatenate([o, d], -1)
    mips = model.emitter.build_mips(params["emitter"])
    step = jnp.asarray(20, jnp.int32)
    a = model.forward(params, rays, occ_binary=occ, mips=mips, step=step,
                      rng=None, stage=1, train=False, capacity=1024,
                      background_color=jnp.ones((3,)), prefilter=True)
    b = model_b.forward(params, rays, occ_binary=occ, mips=mips, step=step,
                        rng=None, stage=1, train=False, capacity=1024,
                        background_color=jnp.ones((3,)), prefilter=True)
    np.testing.assert_array_equal(np.asarray(a["comp_rgb_full"]),
                                  np.asarray(b["comp_rgb_full"]))


def test_neus_model_bake_probe_parity():
    """The NeuS model's visibility probe served from the bake matches
    the hash-probe prefiltered render (NeuS has no secondary pass, so
    probe == full there)."""
    from rise_sdf_tpu import models
    from rise_sdf_tpu.presets import tiny_neus_config

    cfg = tiny_neus_config()
    cfg["model"]["variance"]["init_val"] = 0.7
    cfg["model"]["num_samples_per_ray"] = 256
    base = {**{k: cfg.model[k] for k in cfg.model},
            "visibility_prefilter": True}
    model = models.make(cfg.model.name, base)
    model_b = models.make(cfg.model.name, {
        **base, "eval_sdf_bake": "probe", "eval_sdf_bake_cells": 96})
    params = model.init(jax.random.PRNGKey(0))
    occ = jnp.ones((model.grid_resolution ** 3,), bool)
    o, d = _sphere_rays(16)
    rays = jnp.concatenate([o, d], -1)
    step = jnp.asarray(20, jnp.int32)

    ref = model.forward(params, rays, occ_binary=occ, step=step, rng=None,
                        train=False, capacity=2048,
                        background_color=jnp.ones((3,)), prefilter=True)
    bake = model_b.bake_eval_sdf(params, 20)
    got = model_b.forward({**params, "_eval_bake": bake}, rays,
                          occ_binary=occ, step=step, rng=None, train=False,
                          capacity=2048, background_color=jnp.ones((3,)),
                          prefilter=True)
    for k in ("comp_rgb_full", "opacity", "depth"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   atol=1e-2, err_msg=k)
