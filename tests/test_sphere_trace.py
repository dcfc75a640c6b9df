"""Sphere-traced fast eval (``ops/sphere_trace.py`` +
``SplitMixedOcc.forward_surface``).

No reference analog (the reference always volume-renders,
``/root/reference/models/split_mixed_occ.py:230-333``); the contract
here is (a) the trace finds the SDF zero crossing to sub-step accuracy,
(b) the surface-mode render matches the volumetric render once the
surface is sharp, and (c) unresolved rays are flagged for the
volumetric fallback ladder instead of silently corrupting pixels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rise_sdf_tpu import models
from rise_sdf_tpu.ops.sphere_trace import sphere_trace
from rise_sdf_tpu.presets import tiny_split_config

AABB = (jnp.asarray([-1.5] * 3), jnp.asarray([1.5] * 3))


def _fan_rays(n=128, origin=(0.0, 0.0, -4.0), spread=0.3):
    o = jnp.tile(jnp.asarray([origin]), (n, 1))
    z = jnp.linspace(-spread, spread, n)
    d = jnp.stack([z * 0.5, z, jnp.ones_like(z)], -1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def test_trace_analytic_sphere():
    o, d = _fan_rays()
    r = 0.5
    res = sphere_trace(o, d, sdf_fn=lambda p: jnp.linalg.norm(p, axis=-1) - r,
                       aabb_min=AABB[0], aabb_max=AABB[1])
    # closed form: |o + t d| = r with unit d
    b = jnp.sum(o * d, -1)
    disc = b * b - (jnp.sum(o * o, -1) - r * r)
    hits = disc > 0
    t_ref = -b - jnp.sqrt(jnp.where(hits, disc, 0.0))
    np.testing.assert_array_equal(np.asarray(res.hit), np.asarray(hits))
    assert bool(res.converged.all())
    # along-ray error grows ~1/cos at grazing incidence, but the hit
    # point's distance to the surface stays inside hit_eps
    np.testing.assert_allclose(np.asarray(res.t_hit[hits]),
                               np.asarray(t_ref[hits]), atol=3e-3)
    p = o + d * res.t_hit[:, None]
    dist = jnp.abs(jnp.linalg.norm(p, axis=-1) - r)
    assert float(dist[hits].max()) < 1e-3
    # non-grazing rays (|cos| > 0.5 against the surface) are sub-1e-4
    cosg = jnp.abs(jnp.sum(d * (p / jnp.linalg.norm(p, axis=-1,
                                                    keepdims=True)), -1))
    solid = np.asarray(hits & (cosg > 0.5))
    np.testing.assert_allclose(np.asarray(res.t_hit[solid]),
                               np.asarray(t_ref[solid]), atol=1e-4)


def test_trace_non_unit_sdf_converges():
    """A conservative (0.6x-scaled) distance bound still converges —
    just in more iterations; and sdf_last sits inside hit_eps."""
    o, d = _fan_rays(64)
    res = sphere_trace(
        o, d, sdf_fn=lambda p: 0.6 * (jnp.linalg.norm(p, axis=-1) - 0.5),
        aabb_min=AABB[0], aabb_max=AABB[1], n_iters=96)
    assert bool(res.converged.all())
    assert np.abs(np.asarray(res.sdf_last[res.hit])).max() < 1e-3


def test_trace_flags_unresolved_rays():
    """Too few iterations on a slow SDF: the rays must report
    converged=False (-> ray_included=False -> volumetric fallback),
    never a bogus hit."""
    o, d = _fan_rays(64)
    res = sphere_trace(
        o, d, sdf_fn=lambda p: 0.05 * (jnp.linalg.norm(p, axis=-1) - 0.5),
        aabb_min=AABB[0], aabb_max=AABB[1], n_iters=8)
    assert not bool(res.converged.all())
    assert not bool(res.hit[~res.converged].any())


def _setup(**model_overrides):
    cfg = tiny_split_config()
    for k, v in model_overrides.items():
        node = cfg["model"]
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    model = models.make(cfg.model.name, cfg.model)
    params = model.init(jax.random.PRNGKey(0))
    occ = jnp.ones((model.grid_resolution ** 3,), bool)
    o, d = _fan_rays(64)
    rays = jnp.concatenate([o, d], -1)
    return model, params, occ, rays


def _surface(model, params, occ, rays, **kw):
    mips = model.emitter.build_mips(params["emitter"])
    return model.forward_surface(
        params, rays, occ_binary=occ, mips=mips,
        step=jnp.asarray(20, jnp.int32), stage=1,
        background_color=jnp.ones((3,)), **kw)


def test_forward_surface_matches_volume_when_sharp():
    """With a sharp surface (inv_s ~ 8000 via variance.init_val) the
    volumetric expectation collapses onto the crossing, so surface and
    volume renders agree on every eval channel."""
    # fine marching (512 samples/ray) so the volumetric crossing is
    # quantized well below the texture fields' variation — the residual
    # disagreement is then the volumetric discretization error itself
    model, params, occ, rays = _setup(**{"variance.init_val": 0.9,
                                         "num_samples_per_ray": 512})
    out_s = _surface(model, params, occ, rays)
    mips = model.emitter.build_mips(params["emitter"])
    out_v = model.forward(
        params, rays, occ_binary=occ, mips=mips,
        step=jnp.asarray(20, jnp.int32), rng=None, stage=1, train=False,
        capacity=24576, background_color=jnp.ones((3,)))
    assert bool(out_v["ray_included"].all()), "volumetric overflow"
    hit = np.asarray(out_s["opacity"][:, 0]) > 0.5
    assert hit.any() and not hit.all()
    # agreement on hit rays; exact background on misses
    np.testing.assert_allclose(np.asarray(out_s["opacity"][:, 0]),
                               np.asarray(out_v["opacity"][:, 0]), atol=2e-2)
    for k in ("comp_rgb_full", "comp_rgb_phys_full", "comp_albedo",
              "comp_roughness"):
        diff = np.abs(np.asarray(out_s[k][hit]) - np.asarray(out_v[k][hit]))
        assert diff.max() < 8e-2, (k, diff.max())   # grazing boundary rays
        assert diff.mean() < 1e-2, (k, diff.mean())
    np.testing.assert_allclose(np.asarray(out_s["depth"][hit]),
                               np.asarray(out_v[("depth")][hit]),
                               atol=2 * model.render_step_size)
    np.testing.assert_allclose(np.asarray(out_s["comp_rgb_full"][~hit]),
                               1.0, atol=1e-5)


def test_forward_surface_relighting_runs():
    model, params, occ, rays = _setup(**{"variance.init_val": 0.9})
    out = _surface(model, params, occ, rays, relighting=True)
    for k in ("comp_rgb_phys_full", "comp_spec_rgb_phys"):
        assert np.isfinite(np.asarray(out[k])).all(), k


def test_render_chunk_dispatches_surface_mode(tmp_path):
    """System wiring: eval_mode sphere_trace builds a surface chunk
    whose keys feed the existing metrics path, and the fallback chunk
    (explicit capacity) stays volumetric."""
    from rise_sdf_tpu import datasets, systems

    cfg = tiny_split_config()
    cfg["model"]["eval_mode"] = "sphere_trace"
    cfg["model"]["variance"]["init_val"] = 0.9
    dm = datasets.make(cfg.dataset.name, cfg.dataset)
    system = systems.make(cfg.system.name, cfg, dm, save_dir=str(tmp_path))
    state = system.init_state(0)
    state["step"] = jnp.asarray(20, jnp.int32)
    chunk = system.make_render_chunk(1)
    mips = system.model.emitter.build_mips(state["params"]["emitter"])
    _, d = _fan_rays(system.eval_chunk)
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -4.0]]), (system.eval_chunk, 1))
    rays = jnp.concatenate([o, d], -1)
    res = chunk(state["params"], state["occ_binary"], rays, state["step"],
                mips)
    assert "comp_rgb_phys_full" in res and "comp_albedo" in res
    assert np.isfinite(np.asarray(res["comp_rgb_full"])).all()
    # fallback ladder must produce the volumetric path
    fb = system._make_fallback_chunk(chunk, 2)
    res_fb = fb(state["params"], state["occ_binary"], rays, state["step"],
                mips)
    assert np.isfinite(np.asarray(res_fb["comp_rgb_full"])).all()


def test_occ_guard_flags_suspect_rays():
    """With a fully-occupied grid every ray has occupied cells well
    before its hit (or exits through occupied space) -> the tunneling
    guard must flag ALL of them for the volumetric residual; with the
    guard off, converged rays stay included.  With a tight shell grid
    hugging the true surface, hit rays stay included (the occupancy
    dilation sits inside the 3-cell margin).

    The SDF-clearance gate is disabled here to pin the *conservative*
    guard contract (every miss through occupied space flagged); the
    gate's own contract is test_clearance_gate_passes_clear_misses."""
    model, params, occ_full, rays = _setup(
        **{"variance.init_val": 0.9, "sphere_trace_sdf_clearance": 0.0})
    out = _surface(model, params, occ_full, rays)
    inc_full = np.asarray(out["ray_included"])
    miss = np.asarray(out["opacity"][:, 0]) <= 0.5
    # core guarantee 1: no silent background — every miss ray traversed
    # occupied space and must be flagged for the volumetric residual
    assert not inc_full[miss].any()
    # core guarantee 2: non-grazing hits whose occupied lead (t_hit
    # minus the AABB-entry t, everything occupied in a full grid)
    # clearly exceeds the guard margin must be flagged.  Excluded:
    # grazing hits (cos-scaled margin blows up) and hits right at the
    # AABB entry (no occupied lead exists before them, so including
    # them is correct)
    d0 = np.asarray(rays[:, 3:])
    cos_full = np.abs((d0 * np.asarray(out["comp_normal"])).sum(-1))
    dep = np.asarray(out["depth"]).reshape(-1)
    t_entry = (4.0 - model.radius) / d0[:, 2]  # rays start at z=-4
    cell = 2 * model.radius / model.grid_resolution
    margin = model.st_guard_margin * cell / np.clip(cos_full, 0.15, 1.0)
    # the guard probes 64 points across the AABB span: suspect iff the
    # first occupied probe sits before t_hit - margin; grant 2 probe
    # spacings of slop so the assertion only covers unambiguous rays
    spacing = 2 * model.radius * 2 / d0[:, 2] / 64
    deep = ~miss & (cos_full > 0.6) & (dep - t_entry > margin + 2 * spacing)
    assert deep.any()
    assert not inc_full[deep].any()
    assert inc_full.mean() < 0.2

    model_ng, *_ = _setup(**{"variance.init_val": 0.9,
                             "sphere_trace_occ_guard": False})
    out_ng = _surface(model_ng, params, occ_full, rays)
    assert bool(np.asarray(out_ng["ray_included"]).any())

    # shell occupancy hugging the *actual* init-SDF zero set (what a
    # converged occupancy grid looks like): |sdf| < 2 cells
    res = model.grid_resolution
    g = (np.arange(res) + 0.5) / res * 2 * model.radius - model.radius
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    cell = 2 * model.radius / res
    centers = jnp.asarray(
        np.stack([x, y, z], -1).reshape(-1, 3).astype(np.float32))
    sdf_c = model.geometry.sdf(params["geometry"], centers,
                               jnp.asarray(20, jnp.int32))
    shell = jnp.abs(sdf_c) < 2 * cell
    out_sh = _surface(model, params, shell, rays)
    hit = np.asarray(out_sh["opacity"][:, 0]) > 0.5
    inc = np.asarray(out_sh["ray_included"])
    # grazing rays cross the shell obliquely (occupied cells appear in t
    # far before the hit) and are conservatively flagged — that is the
    # intended behavior; solid (non-grazing) hits must pass the guard
    d = np.asarray(rays[:, 3:])
    nrm = np.asarray(out_sh["comp_normal"])
    cosg = np.abs((d * nrm).sum(-1))
    solid = hit & (cosg > 0.6)
    assert solid.any()
    assert inc[solid].mean() > 0.95
    assert inc[hit].mean() > 0.5


def test_clearance_gate_passes_clear_misses():
    """The guard's SDF-clearance gate (default on): a MISS whose
    closest approach satisfies sdf_min * inv_s > k carries no NeuS
    weight mass anywhere on the ray, so the occupied cells it crossed
    are grid dilation, not tunneling — it must stay *included* (these
    rays were r3's 13% needless-fallback population).  Near misses
    (small sdf_min) stay conservatively flagged.  Physics check: the
    volumetric render the gate skips would indeed return ~background
    (opacity < 1 - sigmoid(k)) on every gated ray.

    The near-miss band (hit_eps < sdf_min <= k/inv_s) is only nonempty
    when k/inv_s exceeds the trace's hit_eps, so this runs at a
    moderate sharpness (inv_s ~ 150 -> band ~0.026 wide) and scans a
    dense strip of parallel rays across the silhouette so hits, near
    misses, and clear misses all appear."""
    model, params, occ_full, _ = _setup(
        **{"variance.init_val": 0.5, "num_samples_per_ray": 512})
    assert model.st_sdf_clearance > 0  # default-on
    step = jnp.asarray(20, jnp.int32)
    n = 200
    x = jnp.linspace(0.75, 1.15, n)
    o = jnp.stack([x, jnp.zeros(n), jnp.full((n,), -4.0)], -1)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    rays = jnp.concatenate([o, d], -1)

    res = sphere_trace(
        o, d,
        sdf_fn=lambda p: model.geometry.sdf(params["geometry"], p, step),
        aabb_min=model.aabb_min, aabb_max=model.aabb_max,
        n_iters=model.st_iters, refine_iters=model.st_refine,
        hit_eps=model.st_hit_eps, relax=model.st_relax)
    inv_s = float(model.variance.inv_s(params["variance"], step))
    hit = np.asarray(res.hit)
    conv = np.asarray(res.converged)
    # the model's gate: clearance beyond k/inv_s + half a marching step
    # (the NeuS midpoint estimator's section extension)
    sclr = (np.asarray(res.sdf_min) - 0.5 * model.render_step_size) * inv_s
    clear = ~hit & conv & (sclr > model.st_sdf_clearance)
    near = ~hit & conv & ~(sclr > model.st_sdf_clearance)
    assert hit.any() and clear.any() and near.any()

    out = _surface(model, params, occ_full, rays)
    inc = np.asarray(out["ray_included"])
    assert inc[clear].all()
    assert not inc[near].any()
    # physics: the fallback the gate skips agrees — volumetric opacity
    # on gated rays is bounded by the transmittance floor the gate
    # guarantees (sigmoid(k) never crossed; sampled min sdf >= traced
    # min, so this holds at any sampling density)
    mips = model.emitter.build_mips(params["emitter"])
    out_v = model.forward(
        params, rays, occ_binary=occ_full, mips=mips, step=step,
        rng=None, stage=1, train=False, capacity=98304,
        background_color=jnp.ones((3,)))
    assert bool(out_v["ray_included"].all()), "volumetric overflow"
    op_v = np.asarray(out_v["opacity"][:, 0])
    bound = 1.0 - 1.0 / (1.0 + np.exp(-model.st_sdf_clearance))
    assert op_v[clear].max() < bound + 3e-3


def test_surface_residual_merges_volumetric_rows(tmp_path):
    """When every surface ray is flagged (full occupancy + guard), the
    residual path must reproduce the volumetric render row-for-row."""
    from rise_sdf_tpu import datasets, systems

    def build(eval_mode):
        cfg = tiny_split_config()
        cfg["model"]["eval_mode"] = eval_mode
        cfg["model"]["variance"]["init_val"] = 0.9
        # starve the trace so NO ray resolves -> the whole image goes
        # through the residual path and must equal the volumetric render
        cfg["model"]["sphere_trace_iters"] = 1
        cfg["model"]["sphere_trace_refine_iters"] = 0
        cfg["model"]["sphere_trace_occ_guard"] = True
        dm = datasets.make(cfg.dataset.name, cfg.dataset)
        return systems.make(cfg.system.name, cfg, dm,
                            save_dir=str(tmp_path / eval_mode))

    sys_s, sys_v = build("sphere_trace"), build("volume")
    state = sys_s.init_state(0)
    state["step"] = jnp.asarray(20, jnp.int32)
    split = sys_s.datamodule.val()
    out_s = sys_s.render_image(state, split, 0, stage=1)
    out_v = sys_v.render_image(state, split, 0, stage=1)
    assert bool(out_s["ray_included"].all())
    # residual and ladder chunks use different buffer sizes -> float
    # reduction order (and boundary-sample inclusion) differs slightly;
    # depth tolerance is in marching-step units
    tol = {"depth": sys_s.model.render_step_size}
    for k in ("comp_rgb_full", "comp_rgb_phys_full", "opacity", "depth"):
        diff = np.abs(out_s[k] - out_v[k])
        assert diff.max() < tol.get(k, 1e-2), (k, diff.max())
        assert diff.mean() < 1e-3, (k, diff.mean())


def test_surface_residual_partial_flags(tmp_path):
    """Mixed image — a healthy trace with the guard on flags only a
    SUBSET of rays (grazing silhouettes / guard suspects).  The
    row-wise merge must (a) leave resolved surface rows bit-identical
    to a residual-free surface render and (b) replace flagged rows
    with finite volumetric values, ending with every ray included."""
    from rise_sdf_tpu import datasets, systems

    def build(guard):
        cfg = tiny_split_config()
        cfg["model"]["eval_mode"] = "sphere_trace"
        cfg["model"]["variance"]["init_val"] = 0.9
        cfg["model"]["sphere_trace_occ_guard"] = guard
        dm = datasets.make(cfg.dataset.name, cfg.dataset)
        return systems.make(cfg.system.name, cfg, dm,
                            save_dir=str(tmp_path / f"g{guard}"))

    sys_g = build(True)
    state = sys_g.init_state(0)
    state["step"] = jnp.asarray(20, jnp.int32)
    split = sys_g.datamodule.val()

    # raw surface chunk result (pre-residual) for row-identity checks
    chunk_fn = sys_g.make_render_chunk(1)
    n = sys_g.eval_chunk
    from rise_sdf_tpu.utils.rays import get_rays
    rays_o, rays_d = get_rays(jnp.asarray(np.asarray(split.directions)),
                              jnp.asarray(np.asarray(split.all_c2w[0])))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    all_rays = jnp.concatenate([rays_o, rays_d], -1)
    # center crop: rows crossing the object (hits AND grazing edges)
    mid = all_rays.shape[0] // 2
    first = all_rays[mid - n // 2: mid + (n + 1) // 2]
    mips = sys_g.model.emitter.build_mips(state["params"]["emitter"])
    raw = chunk_fn(state["params"], state["occ_binary"], first,
                   state["step"], mips)
    inc_raw = np.asarray(raw["ray_included"])
    # at the dense init-state grid the guard flags most rays (occupied
    # space precedes every hit) while a couple of entry-adjacent hits
    # pass — exactly the mixed case the merge must handle
    assert inc_raw.any()
    if not inc_raw.all():        # partial-flag scenario materialized
        merged = sys_g._render_surface_residual(
            chunk_fn, raw, first, state, mips)
        assert bool(np.asarray(merged["ray_included"]).all())
        for k in ("comp_rgb_full", "opacity", "depth"):
            m, r = np.asarray(merged[k]), np.asarray(raw[k])
            # resolved rows untouched (bit-identical)
            np.testing.assert_array_equal(m[inc_raw], r[inc_raw])
            assert np.isfinite(m).all(), k
    # full image through render_image: everything included and finite
    out = sys_g.render_image(state, split, 0, stage=1)
    assert bool(out["ray_included"].all())
    for k in ("comp_rgb_full", "comp_rgb_phys_full", "opacity"):
        assert np.isfinite(out[k]).all(), k
