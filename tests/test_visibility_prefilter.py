"""Transmittance-aware marching (visibility prefilter).

Parity targets: nerfacc ``render_visibility`` (reference
``lib/nerfacc/vol_rendering.py:453-520``) and the ``alpha_fn``-prefiltered
``OccGridEstimator.sampling`` call (``models/split_mixed_occ.py:264-272``).
The TPU design derives a per-ray transmittance cut distance from a coarse
SDF probe and masks fine candidates before compaction.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rise_sdf_tpu import models
from rise_sdf_tpu.models.neus import neus_alpha
from rise_sdf_tpu.ops.march import compute_visibility_cut, march_rays
from rise_sdf_tpu.ops.volrend import (
    render_visibility,
    render_weight_from_alpha_dense,
    transmittance_band,
    transmittance_cut,
)
from rise_sdf_tpu.presets import tiny_split_config

AABB_MIN = jnp.array([-1.5, -1.5, -1.5])
AABB_MAX = jnp.array([1.5, 1.5, 1.5])


def test_render_visibility_matches_nerfacc_docstring():
    """The worked example in nerfacc's render_visibility docstring."""
    alphas = jnp.array([0.4, 0.8, 0.1, 0.8, 0.1, 0.0, 0.9])
    ray_indices = jnp.array([0, 0, 0, 1, 1, 2, 2], jnp.int32)
    ray_start = jnp.array([0, 3, 5], jnp.int32)
    valid = jnp.ones((7,), bool)
    vis = render_visibility(alphas, ray_start, ray_indices, valid, 3,
                            early_stop_eps=0.3, alpha_thre=0.2)
    np.testing.assert_array_equal(
        np.asarray(vis), [True, True, False, True, False, False, True])


def test_transmittance_cut_prefix():
    """Cut lands at the first sample whose pre-sample T drops below eps."""
    # ray 0: opaque wall at sample 1 -> samples >= 2 occluded
    # ray 1: transparent throughout -> no cut
    alphas = jnp.array([0.0, 0.99999, 0.5, 0.0, 0.1, 0.1, 0.1])
    t_starts = jnp.array([0.0, 1.0, 2.0, 3.0, 0.0, 1.0, 2.0])
    ray_indices = jnp.array([0, 0, 0, 0, 1, 1, 1], jnp.int32)
    ray_start = jnp.array([0, 4], jnp.int32)
    valid = jnp.ones((7,), bool)
    cut = transmittance_cut(alphas, t_starts, ray_start, ray_indices, valid,
                            2, early_stop_eps=1e-4, margin=0.0)
    assert np.isclose(float(cut[0]), 2.0)
    assert float(cut[1]) > 1e9  # no saturation -> +inf, no cut


def test_transmittance_band_entry_and_cut():
    """Band entry at the first weight > eps probe; cut as in
    transmittance_cut; background rays unconstrained."""
    # ray 0: empty approach, surface at t=2, opaque wall at t=3
    # ray 1: fully transparent (background)
    alphas = jnp.array([0.0, 0.0, 0.9, 0.99999, 0.1, 0.0, 0.0])
    t_starts = jnp.array([0.0, 1.0, 2.0, 3.0, 4.0, 0.0, 1.0])
    ray_indices = jnp.array([0, 0, 0, 0, 0, 1, 1], jnp.int32)
    ray_start = jnp.array([0, 5], jnp.int32)
    valid = jnp.ones((7,), bool)
    lo, cut = transmittance_band(alphas, t_starts, ray_start, ray_indices,
                                 valid, 2, early_stop_eps=1e-4, margin=0.5)
    assert np.isclose(float(lo[0]), 2.0 - 0.5)
    assert np.isclose(float(cut[0]), 4.0 + 0.5)  # T before t=4 is 1e-6
    assert float(lo[1]) < -1e9  # background: no lower constraint
    assert float(cut[1]) > 1e9


def _sphere_rays(n_rays=32):
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -4.0]]), (n_rays, 1))
    b = jnp.linspace(-0.45, 0.45, n_rays)  # impact parameters across sphere
    d = jnp.stack([jnp.zeros_like(b), b / 4.0, jnp.ones_like(b)], -1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def test_cut_vs_dense_oracle_solid_sphere():
    """Against a dense full-width transmittance oracle on a solid sphere:
    the cut must (a) keep every truly-visible sample (conservative) and
    (b) drop the deep-interior samples behind the surface."""
    n_rays, s = 32, 512
    radius, inv_s = 0.5, 800.0
    step = float(3.0 * jnp.sqrt(3.0) / s)
    o, d = _sphere_rays(n_rays)

    def sdf_fn(p):
        return jnp.linalg.norm(p, axis=-1) - radius

    # no occupancy grid -> every in-range coarse candidate is live
    # (~74/ray), so give the probe headroom; with a grid the default
    # 64/ray covers ~256 live fine samples
    cut = compute_visibility_cut(
        o, d, sdf_fn=sdf_fn, inv_s=inv_s, aabb_min=AABB_MIN,
        aabb_max=AABB_MAX, step_size=step, num_samples=s,
        capacity=n_rays * 128, grid_binary=None, stride=4,
        early_stop_eps=1e-4, margin_intervals=1.0)

    # dense oracle with the TRUE cosine (analytic sphere normal)
    from rise_sdf_tpu.ops.march import candidate_intervals, ray_aabb_intersect
    tn, tf = ray_aabb_intersect(o, d, AABB_MIN, AABB_MAX)
    ts, te, live = candidate_intervals(o, d, tn, tf, step, s)
    tm = 0.5 * (ts + te)
    pos = o[:, None, :] + d[:, None, :] * tm[..., None]
    sdf = jnp.linalg.norm(pos, axis=-1) - radius
    normal = pos / jnp.maximum(jnp.linalg.norm(pos, axis=-1, keepdims=True),
                               1e-9)
    cos = jnp.sum(d[:, None, :] * normal, -1)
    alpha = jnp.where(live, neus_alpha(sdf, inv_s, cos, te - ts, 1.0), 0.0)
    _, trans = render_weight_from_alpha_dense(alpha, live)
    oracle_vis = live & (trans >= 1e-4)

    kept = live & (tm < cut[:, None])
    # (a) conservative: every oracle-visible sample survives the cut
    assert bool(jnp.all(~oracle_vis | kept)), \
        "cut dropped truly-visible samples"
    # (b) effective: deep-interior samples (T < 1e-6) are dropped
    deep = live & (trans < 1e-6)
    n_deep = int(deep.sum())
    assert n_deep > 1000  # a solid sphere has a big occluded interior
    assert int((deep & kept).sum()) <= int(0.05 * n_deep)
    # (c) per-ray kept counts stay close to the visible counts
    kept_per_ray = np.asarray(kept.sum(1))
    vis_per_ray = np.asarray(oracle_vis.sum(1))
    assert (kept_per_ray <= vis_per_ray + 16).all()  # margin + coarse slack


def test_cut_fixes_capacity_overflow():
    """The proven round-2 failure mode: solid interiors overflow the
    fixed sample budget.  With the cut, the same small budget fits."""
    n_rays, s = 16, 512
    radius, inv_s = 0.5, 800.0
    step = float(3.0 * jnp.sqrt(3.0) / s)
    o, d = _sphere_rays(n_rays)

    def sdf_fn(p):
        return jnp.linalg.norm(p, axis=-1) - radius

    # solid occupancy: everything inside r < radius + margin occupied
    res = 32
    g = (np.arange(res) + 0.5) / res * 3.0 - 1.5
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    occ = jnp.asarray(
        (np.sqrt(x * x + y * y + z * z) < radius + 0.15).reshape(-1))

    cap = n_rays * 48  # << the ~170 occupied samples/ray of the interior
    kw = dict(aabb_min=AABB_MIN, aabb_max=AABB_MAX, step_size=step,
              num_samples=s, capacity=cap, grid_binary=occ,
              grid_resolution=res)
    rs_plain = march_rays(o, d, **kw)
    assert not bool(rs_plain.ray_included.all()), \
        "test setup: the plain march should overflow"

    cut = compute_visibility_cut(
        o, d, sdf_fn=sdf_fn, inv_s=inv_s, aabb_min=AABB_MIN,
        aabb_max=AABB_MAX, step_size=step, num_samples=s,
        capacity=n_rays * 64, grid_binary=occ, grid_resolution=res,
        stride=4, early_stop_eps=1e-4, margin_intervals=1.0)
    rs_cut = march_rays(o, d, t_cut=cut, **kw)
    assert bool(rs_cut.ray_included.all()), \
        "prefiltered march still overflowed"
    # the surviving samples still cover the visible surface band
    assert int(rs_cut.num_live) > n_rays * 4


def test_band_vs_dense_oracle_solid_sphere():
    """The banded probe keeps the full visible weight mass while
    dropping both the empty approach and the occluded interior — a
    solid sphere's in-band sample count is a small fraction of the
    occupancy-live count."""
    n_rays, s = 32, 512
    radius, inv_s = 0.5, 800.0
    step = float(3.0 * jnp.sqrt(3.0) / s)
    o, d = _sphere_rays(n_rays)

    def sdf_fn(p):
        return jnp.linalg.norm(p, axis=-1) - radius

    lo, cut = compute_visibility_cut(
        o, d, sdf_fn=sdf_fn, inv_s=inv_s, aabb_min=AABB_MIN,
        aabb_max=AABB_MAX, step_size=step, num_samples=s,
        capacity=n_rays * 128, grid_binary=None, stride=4,
        early_stop_eps=1e-4, margin_intervals=1.0, band=True)
    assert bool(jnp.all(lo < cut))

    from rise_sdf_tpu.ops.march import candidate_intervals, ray_aabb_intersect
    tn, tf = ray_aabb_intersect(o, d, AABB_MIN, AABB_MAX)
    ts, te, live = candidate_intervals(o, d, tn, tf, step, s)
    tm = 0.5 * (ts + te)
    pos = o[:, None, :] + d[:, None, :] * tm[..., None]
    sdf = jnp.linalg.norm(pos, axis=-1) - radius
    normal = pos / jnp.maximum(jnp.linalg.norm(pos, axis=-1, keepdims=True),
                               1e-9)
    cos = jnp.sum(d[:, None, :] * normal, -1)
    alpha = jnp.where(live, neus_alpha(sdf, inv_s, cos, te - ts, 1.0), 0.0)
    w, _ = render_weight_from_alpha_dense(alpha, live)

    in_band = live & (tm >= lo[:, None]) & (tm < cut[:, None])
    # (a) conservative: all weight mass outside the band is negligible.
    # neus_alpha's (p+1e-5)/(c+1e-5) stabilizer (reference
    # models/neus.py:128-150) puts a ~1e-5 alpha floor on every empty
    # sample, so the band unavoidably drops ~1e-5 x approach-length of
    # floor mass (~1e-3/channel here, invisible); surface mass must
    # all be inside.
    missed = jnp.where(~in_band, w, 0.0).sum(1)
    assert float(missed.max()) < 2e-3
    # (b) effective: the band is small vs the live candidate set
    assert int(in_band.sum()) < 0.25 * int(live.sum())


def test_model_banded_eval_small_capacity_parity():
    """Banded eval (prefilter + [t_lo, t_cut) band) matches the
    full-budget render at a fraction of the sample capacity that the
    plain *prefiltered* march cannot fit (it keeps the empty approach
    region; the band drops it)."""
    cfg = tiny_split_config()
    cfg["model"]["variance"]["init_val"] = 0.7  # inv_s ~ 1097
    # fine marching grid so the empty-approach region dominates the
    # live count (the production regime: ~170 approach vs ~20 band
    # samples per central ray)
    cfg["model"]["num_samples_per_ray"] = 256
    model_pf = models.make(cfg.model.name, {
        **{k: cfg.model[k] for k in cfg.model},
        "visibility_prefilter": True, "prefilter_stride": 4,
        "prefilter_margin_intervals": 1.0})
    model = models.make(cfg.model.name, cfg.model)
    params = model.init(jax.random.PRNGKey(0))
    res = model.grid_resolution
    occ = jnp.ones((res ** 3,), bool)
    n_rays = 32
    o, d = _sphere_rays(n_rays)
    rays = jnp.concatenate([o, d], -1)
    mips = model.emitter.build_mips(params["emitter"])
    step = jnp.asarray(20, jnp.int32)

    big = model.forward(params, rays, occ_binary=occ, mips=mips, step=step,
                        rng=None, stage=1, train=False, capacity=8192,
                        background_color=jnp.ones((3,)))
    assert bool(big["ray_included"].all())
    cap = 768  # 24 samples/ray
    small_cut_only = model_pf.forward(
        params, rays, occ_binary=occ, mips=mips, step=step, rng=None,
        stage=1, train=False, capacity=cap,
        background_color=jnp.ones((3,)), prefilter=True)
    assert not bool(small_cut_only["ray_included"].all()), \
        "test setup: the cut-only prefilter should overflow this budget"
    banded = model_pf.forward(
        params, rays, occ_binary=occ, mips=mips, step=step, rng=None,
        stage=1, train=False, capacity=cap,
        background_color=jnp.ones((3,)), prefilter=True, banded=True)
    assert bool(banded["ray_included"].all()), \
        "banded eval did not fit the small budget"
    # depth gets a slightly looser bound: dropping the ~1e-5
    # alpha-floor mass (see the oracle test) shifts the weighted-t
    # accumulation by ~0.2% relative on grazing rays
    for k, atol in (("comp_rgb_full", 5e-3), ("opacity", 5e-3),
                    ("depth", 1.2e-2)):
        np.testing.assert_allclose(np.asarray(banded[k]),
                                   np.asarray(big[k]), atol=atol,
                                   err_msg=k)


def test_system_banded_render_chunk_wiring(tmp_path):
    """``eval_banded_samples_per_ray`` in the config makes
    ``make_render_chunk`` build a banded chunk (24/ray here vs the
    256/ray full budget) that reproduces the full render;
    ``eval_band_reserve`` adds absolute slack rows on top of the
    chunk*K budget (for rays whose coarse probe never saturates and so
    keep full candidate sets — silhouettes; scripts/drop_probe.py:
    12.1% of the frozen 800^2 protocol's rays drop at a pure chunk*8
    budget vs 0.31% with a 16384-row reserve)."""
    from rise_sdf_tpu import datasets, systems

    def mk(band):
        cfg = tiny_split_config()
        cfg["model"]["variance"]["init_val"] = 0.7
        cfg["model"]["num_samples_per_ray"] = 256
        cfg["model"]["eval_samples_per_ray"] = 256
        cfg["model"]["ray_chunk"] = 32
        cfg["model"]["visibility_prefilter"] = True
        if band:
            cfg["model"]["eval_banded_samples_per_ray"] = 24
            cfg["model"]["eval_band_reserve"] = 512
        dm = datasets.make(cfg.dataset.name, cfg.dataset)
        return systems.make(cfg.system.name, cfg, dm, save_dir=str(tmp_path))

    sys_f, sys_b = mk(False), mk(True)
    assert sys_b.eval_band_capacity == 32 * 24 + 512
    state = sys_f.init_state()
    occ = jnp.ones_like(state["occ_binary"])
    o, d = _sphere_rays(32)
    rays = jnp.concatenate([o, d], -1)
    step = jnp.asarray(20, jnp.int32)
    mips = sys_f.model.emitter.build_mips(state["params"]["emitter"])

    full = sys_f.make_render_chunk(stage=1)(
        state["params"], occ, rays, step, mips)
    banded = sys_b.make_render_chunk(stage=1)(
        state["params"], occ, rays, step, mips)
    assert bool(full["ray_included"].all())
    assert bool(banded["ray_included"].all())
    for k, atol in (("comp_rgb_full", 5e-3), ("opacity", 5e-3),
                    ("depth", 1.2e-2)):
        np.testing.assert_allclose(np.asarray(banded[k]),
                                   np.asarray(full[k]), atol=atol,
                                   err_msg=k)


def test_march_band_exact_k_never_overflows():
    """Exact-K band sampling (``march_rays(band_k=K)``): every
    finite-band ray contributes exactly K samples spanning its own band
    regardless of band width, so ``capacity = R * K`` cannot overflow —
    the fine-step-masked variant drops rays whenever a band is wider
    than K fine steps (the failure mode of the r4 band8/stride8 bench
    arms: 25% of rays dropped)."""
    n_rays, s = 32, 512
    radius, inv_s = 0.5, 800.0
    step = float(3.0 * jnp.sqrt(3.0) / s)
    o, d = _sphere_rays(n_rays)

    def sdf_fn(p):
        return jnp.linalg.norm(p, axis=-1) - radius

    # wide margin (2 coarse = 8 fine intervals each side) -> bands of
    # ~18+ fine steps, far wider than K=8
    lo, cut = compute_visibility_cut(
        o, d, sdf_fn=sdf_fn, inv_s=inv_s, aabb_min=AABB_MIN,
        aabb_max=AABB_MAX, step_size=step, num_samples=s,
        capacity=n_rays * 128, grid_binary=None, stride=4,
        early_stop_eps=1e-4, margin_intervals=2.0, band=True)

    k = 8
    kw = dict(aabb_min=AABB_MIN, aabb_max=AABB_MAX, step_size=step,
              num_samples=s, capacity=n_rays * k)
    rs_mask = march_rays(o, d, t_cut=cut, t_band_lo=lo, **kw)
    assert not bool(rs_mask.ray_included.all()), \
        "test setup: fine-step banding should overflow K=8 budgets here"

    rs_k = march_rays(o, d, t_cut=cut, t_band_lo=lo, band_k=k, **kw)
    assert bool(rs_k.ray_included.all())
    finite = np.asarray((cut < 1e9) & (lo > -1e9))
    counts = np.asarray(rs_k.ray_count)
    assert (counts[finite] == k).all(), \
        "finite-band rays must get exactly K samples"
    # samples span each ray's band: midpoints inside [lo, cut)
    tm = 0.5 * (np.asarray(rs_k.t_starts) + np.asarray(rs_k.t_ends))
    ridx = np.asarray(rs_k.ray_indices)
    val = np.asarray(rs_k.valid) & (ridx < n_rays)
    lo_n, cut_n = np.asarray(lo), np.asarray(cut)
    assert (tm[val] >= lo_n[ridx[val]] - 1e-6).all()
    assert (tm[val] < cut_n[ridx[val]]).all()
    # coverage: the K samples span (not just prefix) the band — the
    # last sample of each finite ray sits in the band's top interval
    for r in np.nonzero(finite)[0][:8]:
        tms = tm[val & (ridx == r)]
        width = cut_n[r] - lo_n[r]
        assert tms.max() > lo_n[r] + width * (1 - 1.5 / k)


def test_model_band_exact_parity_where_masked_band_overflows():
    """Model-level: with ``eval_band_exact`` (default) a K=8 banded
    render fits, includes every ray, and matches the full-budget render;
    the opt-out (fine-step masked) banding overflows the same budget."""
    cfg = tiny_split_config()
    cfg["model"]["variance"]["init_val"] = 0.7  # inv_s ~ 1097
    cfg["model"]["num_samples_per_ray"] = 256
    base = {k: cfg.model[k] for k in cfg.model}
    pf = {"visibility_prefilter": True, "prefilter_stride": 4,
          "prefilter_margin_intervals": 1.0,
          "eval_banded_samples_per_ray": 8}
    model_exact = models.make(cfg.model.name, {**base, **pf})
    model_mask = models.make(cfg.model.name,
                             {**base, **pf, "eval_band_exact": False})
    model = models.make(cfg.model.name, cfg.model)
    params = model.init(jax.random.PRNGKey(0))
    occ = jnp.ones((model.grid_resolution ** 3,), bool)
    n_rays = 32
    o, d = _sphere_rays(n_rays)
    rays = jnp.concatenate([o, d], -1)
    mips = model.emitter.build_mips(params["emitter"])
    step = jnp.asarray(20, jnp.int32)

    big = model.forward(params, rays, occ_binary=occ, mips=mips, step=step,
                        rng=None, stage=1, train=False, capacity=8192,
                        background_color=jnp.ones((3,)))
    assert bool(big["ray_included"].all())
    cap = n_rays * 8
    masked = model_mask.forward(
        params, rays, occ_binary=occ, mips=mips, step=step, rng=None,
        stage=1, train=False, capacity=cap,
        background_color=jnp.ones((3,)), prefilter=True, banded=True)
    assert not bool(masked["ray_included"].all()), \
        "test setup: masked banding should overflow 8 samples/ray"
    exact = model_exact.forward(
        params, rays, occ_binary=occ, mips=mips, step=step, rng=None,
        stage=1, train=False, capacity=cap,
        background_color=jnp.ones((3,)), prefilter=True, banded=True)
    assert bool(exact["ray_included"].all()), \
        "exact-K banding overflowed its own K budget"
    # K=8 intervals across a sharp band: slightly looser bars than the
    # 24/ray parity test (quantization of the section CDF), still
    # far below a visible difference
    for k, atol in (("comp_rgb_full", 1.5e-2), ("opacity", 1e-2),
                    ("depth", 3e-2)):
        np.testing.assert_allclose(np.asarray(exact[k]),
                                   np.asarray(big[k]), atol=atol,
                                   err_msg=k)


def test_model_prefilter_plumbing_noop_when_transparent():
    """With a soft (low inv_s) field nothing saturates: the prefiltered
    forward must equal the unfiltered one exactly (t_cut = +inf)."""
    cfg = tiny_split_config()
    cfg["model"]["visibility_prefilter"] = True
    model = models.make(cfg.model.name, cfg.model)
    params = model.init(jax.random.PRNGKey(0))
    res = model.grid_resolution
    occ = jnp.ones((res ** 3,), bool)
    n_rays = 32
    o, d = _sphere_rays(n_rays)
    rays = jnp.concatenate([o, d], -1)
    mips = model.emitter.build_mips(params["emitter"])

    def render(pf):
        return model.forward(
            params, rays, occ_binary=occ, mips=mips,
            step=jnp.asarray(20, jnp.int32), rng=None, stage=1, train=False,
            capacity=2048, background_color=jnp.ones((3,)), prefilter=pf)

    out_a, out_b = render(False), render(True)
    for k in ("comp_rgb_full", "opacity", "depth"):
        np.testing.assert_allclose(np.asarray(out_a[k]),
                                   np.asarray(out_b[k]), atol=1e-6,
                                   err_msg=k)


def test_model_prefilter_sharp_field_parity_and_capacity():
    """Sharp variance (inv_s ~ 1100, sphere-init geometry ~ solid sphere):
    the prefiltered render must match the full render on visible content
    while fitting a much smaller sample budget."""
    cfg = tiny_split_config()
    cfg["model"]["variance"]["init_val"] = 0.7  # inv_s = e^7 ~ 1097
    model_pf = models.make(cfg.model.name, {
        **{k: cfg.model[k] for k in cfg.model},
        "visibility_prefilter": True, "prefilter_stride": 4,
        "prefilter_margin_intervals": 1.0})
    model = models.make(cfg.model.name, cfg.model)
    params = model.init(jax.random.PRNGKey(0))
    res = model.grid_resolution
    occ = jnp.ones((res ** 3,), bool)  # worst case: fully occupied
    n_rays = 32
    o, d = _sphere_rays(n_rays)
    rays = jnp.concatenate([o, d], -1)
    mips = model.emitter.build_mips(params["emitter"])
    step = jnp.asarray(20, jnp.int32)

    big = model.forward(params, rays, occ_binary=occ, mips=mips, step=step,
                        rng=None, stage=1, train=False, capacity=8192,
                        background_color=jnp.ones((3,)))
    assert bool(big["ray_included"].all())
    small_plain = model.forward(
        params, rays, occ_binary=occ, mips=mips, step=step, rng=None,
        stage=1, train=False, capacity=1024,
        background_color=jnp.ones((3,)))
    assert not bool(small_plain["ray_included"].all()), \
        "test setup: the small budget should overflow without the cut"
    small_pf = model_pf.forward(
        params, rays, occ_binary=occ, mips=mips, step=step, rng=None,
        stage=1, train=False, capacity=1024,
        background_color=jnp.ones((3,)), prefilter=True)
    assert bool(small_pf["ray_included"].all()), \
        "prefilter did not fit the small budget"
    for k in ("comp_rgb_full", "opacity", "depth"):
        np.testing.assert_allclose(np.asarray(small_pf[k]),
                                   np.asarray(big[k]), atol=5e-3,
                                   err_msg=k)


def test_prefilter_levels_probe_only_cut():
    """``prefilter_levels`` restricts the coarse probe's SDF encode to
    the lowest K hash levels — the probe is the dominant share of eval
    gather rows and only places a conservative band (1-interval margin);
    the marched samples and shading still use every level.  With 2 of 4
    levels the probe's hash-gather rows must exactly halve, and the cut
    must remain usable (finite band bounds on saturating rays)."""
    from rise_sdf_tpu.ops.hashgrid import count_gather_rows

    cfg = tiny_split_config()
    cfg["model"]["variance"]["init_val"] = 0.7
    base = {k: cfg.model[k] for k in cfg.model}
    pf = {"visibility_prefilter": True}
    m_full = models.make(cfg.model.name, {**base, **pf})
    m_cut = models.make(cfg.model.name,
                        {**base, **pf, "prefilter_levels": 2})
    params = m_full.init(jax.random.PRNGKey(0))
    occ = jnp.ones((m_full.grid_resolution ** 3,), bool)
    o, d = _sphere_rays(32)
    step = jnp.asarray(20, jnp.int32)

    def rows_of(m):
        def f(p):
            return m.visibility_cut(p, o, d, occ, step, band=True)

        with count_gather_rows() as gc:
            jax.jit(f).lower(params)
        return gc.rows

    rf, rc = rows_of(m_full), rows_of(m_cut)
    assert rf > 0 and rc * 2 == rf
    lo, cut = m_cut.visibility_cut(params, o, d, occ, step, band=True)
    lo, cut = np.asarray(lo), np.asarray(cut)
    assert np.isfinite(cut[cut < 1e9]).all()
    banded = (cut < 1e9) & (lo > -1e9)
    assert (cut[banded] > lo[banded]).all()
