"""Sharded eval render: mesh-rendered chunk == single-device chunk.

Eval is deterministic (rng=None), so sharding the ray chunk over the
8-CPU mesh must reproduce the single-device render exactly up to float
reduction order (the eval analog of the reference's DDP all_gather)."""

import jax
import numpy as np
import pytest

from rise_sdf_tpu import datasets, systems
from rise_sdf_tpu.parallel import get_mesh
from rise_sdf_tpu.presets import tiny_split_config

pytestmark = pytest.mark.slow  # multi-device e2e: excluded from the fast gate

NDEV = 4


@pytest.fixture(scope="module")
def system(tmp_path_factory):
    cfg = tiny_split_config()
    dm = datasets.make(cfg.dataset.name, cfg.dataset)
    return systems.make(cfg.system.name, cfg, dm,
                        save_dir=str(tmp_path_factory.mktemp("seval")))


def test_sharded_render_matches_single(system):
    assert len(jax.devices()) >= NDEV
    state = system.init_state(0)
    state["step"] = state["step"] + 20  # stage 1
    split = system.datamodule.val()
    single = system.make_render_chunk(1)
    sharded = system.make_render_chunk(1, mesh=get_mesh(NDEV))
    out_s = system.render_image(state, split, 0, single, stage=1)
    out_m = system.render_image(state, split, 0, sharded, stage=1)
    for k in ("comp_rgb_full", "comp_rgb_phys_full", "opacity", "depth"):
        np.testing.assert_allclose(out_m[k], out_s[k], atol=2e-3,
                                   err_msg=k)


def test_sharded_surface_render_matches_single(tmp_path_factory):
    """The sphere-traced eval chunk under a data mesh == single-device
    (deterministic trace, rays split over 'data')."""
    assert len(jax.devices()) >= NDEV
    cfg = tiny_split_config()
    cfg["model"]["eval_mode"] = "sphere_trace"
    cfg["model"]["variance"]["init_val"] = 0.9
    dm = datasets.make(cfg.dataset.name, cfg.dataset)
    system = systems.make(cfg.system.name, cfg, dm,
                          save_dir=str(tmp_path_factory.mktemp("ssurf")))
    state = system.init_state(0)
    state["step"] = state["step"] + 20
    split = system.datamodule.val()
    single = system.make_render_chunk(1)
    sharded = system.make_render_chunk(1, mesh=get_mesh(NDEV))
    out_s = system.render_image(state, split, 0, single, stage=1)
    out_m = system.render_image(state, split, 0, sharded, stage=1)
    for k in ("comp_rgb_full", "comp_rgb_phys_full", "opacity", "depth"):
        np.testing.assert_allclose(out_m[k], out_s[k], atol=2e-3,
                                   err_msg=k)


def test_sharded_multi_emitter_matches_single(system):
    """The multi-emitter chunk (NVS + relight from one geometry pass)
    under a data mesh == single-device multi chunk, per light."""
    import jax.numpy as jnp

    assert len(jax.devices()) >= NDEV
    state = system.init_state(0)
    state["step"] = state["step"] + 20  # stage 1
    split = system.datamodule.val()
    base0 = state["params"]["emitter"]["base"]
    base2 = jnp.roll(base0 * 1.7 + 0.05, 1, -1)
    single = system.make_render_chunk(1, n_relights=1)
    sharded = system.make_render_chunk(1, mesh=get_mesh(NDEV),
                                       n_relights=1)
    out_s = system.render_image(state, split, 0, single, stage=1,
                                emitter_base=[base0, base2])
    out_m = system.render_image(state, split, 0, sharded, stage=1,
                                emitter_base=[base0, base2])
    for k in ("comp_rgb_full", "comp_rgb_phys_full",
              "relight0/comp_rgb_phys_full", "opacity", "depth"):
        np.testing.assert_allclose(out_m[k], out_s[k], atol=2e-3,
                                   err_msg=k)


def test_validate_runs_with_mesh(system):
    system.mesh = get_mesh(NDEV)
    try:
        state = system.init_state(1)
        res = system.validate(state, n_images=1)
        assert np.isfinite(res["psnr"])
    finally:
        system.mesh = None


def test_sharded_render_with_bake_matches_single(tmp_path_factory):
    """Bake injection under the data mesh: the packed grid replicates
    (table_specs maps it to P()) and the sharded banded render matches
    single-device with the bake on."""
    assert len(jax.devices()) >= NDEV
    cfg = tiny_split_config()
    cfg["model"]["visibility_prefilter"] = True
    cfg["model"]["eval_sdf_bake"] = "full"
    cfg["model"]["eval_sdf_bake_cells"] = 48
    dm = datasets.make(cfg.dataset.name, cfg.dataset)
    system = systems.make(cfg.system.name, cfg, dm,
                          save_dir=str(tmp_path_factory.mktemp("sbake")))
    state = system.init_state(0)
    state["step"] = state["step"] + 20
    state = system._with_eval_bake(state)
    assert "_eval_bake" in state["params"]
    split = system.datamodule.val()
    single = system.make_render_chunk(1)
    sharded = system.make_render_chunk(1, mesh=get_mesh(NDEV))
    out_s = system.render_image(state, split, 0, single, stage=1)
    out_m = system.render_image(state, split, 0, sharded, stage=1)
    for k in ("comp_rgb_full", "comp_rgb_phys_full", "opacity", "depth"):
        np.testing.assert_allclose(out_m[k], out_s[k], atol=2e-3,
                                   err_msg=k)
