"""Multi-emitter eval: one geometry pass shaded under N lights.

The reference re-renders the FULL pipeline once per relight light
(``/root/reference/systems/split_occ.py:402-430``).  Here the march /
SDF forward / NeuS weights / secondary transmittance / third-bounce hit
geometry are emitter-independent and computed once
(``SplitMixedOcc.forward_multi`` / ``forward_surface_multi``); per light
only the mip-cubemap lookups + accumulation re-run.  The contract
tested: the multi path reproduces the single-light ``forward`` /
``forward_surface`` outputs light-for-light (same helpers by
construction, so any drift is a wiring bug), and the system-level
multi chunk matches separate NVS + relight chunks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rise_sdf_tpu import models
from rise_sdf_tpu.presets import tiny_split_config


def _fan_rays(n=64, origin=(0.0, 0.0, -4.0), spread=0.3):
    o = jnp.tile(jnp.asarray([origin]), (n, 1))
    z = jnp.linspace(-spread, spread, n)
    d = jnp.stack([z * 0.5, z, jnp.ones_like(z)], -1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.concatenate([o, d], -1)


def _setup(**model_overrides):
    cfg = tiny_split_config()
    cfg["model"]["variance"]["init_val"] = 0.9
    for k, v in model_overrides.items():
        node = cfg["model"]
        for p in k.split(".")[:-1]:
            node = node[p]
        node[k.split(".")[-1]] = v
    model = models.make(cfg.model.name, cfg.model)
    params = model.init(jax.random.PRNGKey(0))
    occ = jnp.ones((model.grid_resolution ** 3,), bool)
    # a second, clearly different light: brightened + channel-rolled base
    base2 = jnp.roll(params["emitter"]["base"] * 1.7 + 0.05, 1, axis=-1)
    mips0 = model.emitter.build_mips(params["emitter"])
    mips1 = model.emitter.build_mips({"base": base2})
    return model, params, occ, _fan_rays(), mips0, mips1


STEP = jnp.asarray(20, jnp.int32)
CHECK_KEYS = ("comp_rgb_full", "comp_rgb_phys_full", "comp_albedo",
              "comp_metallic", "comp_roughness", "comp_spec_rgb_phys",
              "opacity", "depth", "comp_normal")


def _assert_match(out_multi, out_single, keys=CHECK_KEYS, tol=1e-5):
    np.testing.assert_array_equal(np.asarray(out_multi["ray_included"]),
                                  np.asarray(out_single["ray_included"]))
    for k in keys:
        if k not in out_single:
            continue
        a, b = np.asarray(out_multi[k]), np.asarray(out_single[k])
        assert np.abs(a - b).max() < tol, (k, np.abs(a - b).max())


def test_forward_multi_matches_single_volume():
    model, params, occ, rays, mips0, mips1 = _setup()
    kw = dict(occ_binary=occ, step=STEP, stage=1, capacity=8192,
              background_color=jnp.ones((3,)))
    outs = model.forward_multi(params, rays, mips_list=[mips0, mips1],
                               relight_flags=(False, True), **kw)
    out_nvs = model.forward(params, rays, mips=mips0, rng=None, train=False,
                            relighting=False, **kw)
    out_rel = model.forward(params, rays, mips=mips1, rng=None, train=False,
                            relighting=True, **kw)
    _assert_match(outs[0], out_nvs)
    # relight output: the physically-based channels are what the test
    # protocol consumes; the NN channels are shared with the NVS pass
    _assert_match(outs[1], out_rel,
                  keys=("comp_rgb_phys_full", "comp_spec_rgb_phys",
                        "comp_albedo", "comp_roughness", "depth"))
    # the two lights genuinely differ
    d = np.abs(np.asarray(outs[0]["comp_rgb_phys_full"])
               - np.asarray(outs[1]["comp_rgb_phys_full"]))
    assert d.max() > 1e-3


def test_forward_multi_matches_single_volume_compacted():
    """Same parity under eval visibility compaction + secondary
    compaction (the production eval configuration)."""
    model, params, occ, rays, mips0, mips1 = _setup()
    kw = dict(occ_binary=occ, step=STEP, stage=1, capacity=8192,
              vis_frac=0.5, secondary_frac=0.5,
              background_color=jnp.ones((3,)))
    outs = model.forward_multi(params, rays, mips_list=[mips0, mips1],
                               relight_flags=(False, True), **kw)
    out_nvs = model.forward(params, rays, mips=mips0, rng=None, train=False,
                            relighting=False, **kw)
    out_rel = model.forward(params, rays, mips=mips1, rng=None, train=False,
                            relighting=True, **kw)
    _assert_match(outs[0], out_nvs)
    _assert_match(outs[1], out_rel,
                  keys=("comp_rgb_phys_full", "comp_spec_rgb_phys"))


def test_forward_surface_multi_matches_single():
    model, params, occ, rays, mips0, mips1 = _setup()
    kw = dict(occ_binary=occ, step=STEP, stage=1,
              background_color=jnp.ones((3,)))
    outs = model.forward_surface_multi(
        params, rays, mips_list=[mips0, mips1],
        relight_flags=(False, True), **kw)
    out_nvs = model.forward_surface(params, rays, mips=mips0,
                                    relighting=False, **kw)
    out_rel = model.forward_surface(params, rays, mips=mips1,
                                    relighting=True, **kw)
    _assert_match(outs[0], out_nvs)
    _assert_match(outs[1], out_rel,
                  keys=("comp_rgb_phys_full", "comp_spec_rgb_phys",
                        "comp_albedo", "depth"))


def test_multi_chunk_matches_separate_chunks(tmp_path):
    """System wiring: a chunk with n_relights=1 returns the NVS channels
    under their usual names plus relight0/comp_rgb_phys_full, matching
    the two separate single-light chunks the non-multi path would run."""
    from rise_sdf_tpu import datasets, systems

    cfg = tiny_split_config()
    cfg["model"]["variance"]["init_val"] = 0.9
    dm = datasets.make(cfg.dataset.name, cfg.dataset)
    system = systems.make(cfg.system.name, cfg, dm, save_dir=str(tmp_path))
    state = system.init_state(0)
    state["step"] = STEP
    rays = _fan_rays(system.eval_chunk)
    mips0 = system.model.emitter.build_mips(state["params"]["emitter"])
    base2 = jnp.roll(state["params"]["emitter"]["base"] * 1.7 + 0.05, 1, -1)
    mips1 = system.model.emitter.build_mips({"base": base2})

    multi = system.make_render_chunk(1, n_relights=1)
    res_m = multi(state["params"], state["occ_binary"], rays, state["step"],
                  mips0, mips1)
    single = system.make_render_chunk(1)
    res_nvs = single(state["params"], state["occ_binary"], rays,
                     state["step"], mips0)
    relight = system.make_render_chunk(1, relighting=True)
    res_rel = relight(state["params"], state["occ_binary"], rays,
                      state["step"], mips1)
    for k in ("comp_rgb_full", "comp_rgb_phys_full", "comp_albedo",
              "opacity", "depth"):
        a, b = np.asarray(res_m[k]), np.asarray(res_nvs[k])
        assert np.abs(a - b).max() < 1e-5, k
    a = np.asarray(res_m["relight0/comp_rgb_phys_full"])
    b = np.asarray(res_rel["comp_rgb_phys_full"])
    assert np.abs(a - b).max() < 1e-5
    # fallback chunk inherits the relight count
    fb = system._make_fallback_chunk(multi, 2)
    res_fb = fb(state["params"], state["occ_binary"], rays, state["step"],
                mips0, mips1)
    assert "relight0/comp_rgb_phys_full" in res_fb
    assert np.isfinite(np.asarray(res_fb["comp_rgb_full"])).all()


def test_render_image_multi_emitter(tmp_path):
    """render_image with a list of emitter bases drives the multi chunk
    end-to-end (pad rays, fallback plumbing) and returns per-light
    images identical to two single-light render_image calls."""
    from rise_sdf_tpu import datasets, systems

    cfg = tiny_split_config()
    cfg["model"]["variance"]["init_val"] = 0.9
    dm = datasets.make(cfg.dataset.name, cfg.dataset)
    system = systems.make(cfg.system.name, cfg, dm, save_dir=str(tmp_path))
    state = system.init_state(0)
    state["step"] = STEP
    split = system.datamodule.val()
    base0 = state["params"]["emitter"]["base"]
    base2 = jnp.roll(base0 * 1.7 + 0.05, 1, -1)

    multi = system.make_render_chunk(1, n_relights=1)
    out_m = system.render_image(state, split, 0, multi, 1,
                                emitter_base=[base0, base2])
    out_nvs = system.render_image(state, split, 0,
                                  system.make_render_chunk(1), 1)
    relight = system.make_render_chunk(1, relighting=True)
    out_rel = system.render_image(state, split, 0, relight, 1,
                                  emitter_base=base2)
    for k in ("comp_rgb_full", "comp_rgb_phys_full", "opacity"):
        assert np.abs(out_m[k] - out_nvs[k]).max() < 1e-5, k
    assert np.abs(out_m["relight0/comp_rgb_phys_full"]
                  - out_rel["comp_rgb_phys_full"]).max() < 1e-5


@pytest.mark.slow
def test_protocol_metrics_match_single_light_path(tmp_path):
    """system.test() end-to-end: the multi-emitter protocol reproduces
    the per-light re-render protocol's metrics (reference behavior)."""
    from rise_sdf_tpu import datasets, systems

    def run(multi):
        cfg = tiny_split_config()
        cfg["model"]["variance"]["init_val"] = 0.9
        cfg["dataset"]["relight_list"] = ["warm"]
        cfg["dataset"]["hdr_filepath"] = str(tmp_path / "envs")
        cfg["dataset"]["n_images"] = 2
        cfg["system"]["multi_emitter_eval"] = multi
        dm = datasets.make(cfg.dataset.name, cfg.dataset)
        system = systems.make(cfg.system.name, cfg, dm,
                              save_dir=str(tmp_path / f"save{multi}"))
        state = system.init_state(0)
        state["step"] = state["step"] + 20  # stage 1
        return system.test(state, export=False)

    res_m, res_s = run(True), run(False)
    assert set(res_m) == set(res_s)
    for k in res_s:
        assert abs(res_m[k] - res_s[k]) < 1e-3, (k, res_m[k], res_s[k])
