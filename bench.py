"""Throughput benchmark: rays/sec for a full 800x800 PBR render.

Measures the BASELINE.md north-star (rays/sec/chip at 800^2 render with
the flagship split-mixed-occ model, stage 1: split-sum shading +
secondary occlusion rays) on whatever accelerator JAX exposes.  Uses
production-scale hyperparameters (512^2 env light, 16-level 2^19 hash
grid, 128^3 occupancy grid, 1024-sample marching) with an untrained
model, no dataset required.

Protocols, all full 800^2 images with every chunk blocked.  The
``headline`` protocol is FROZEN as of round 3 — it is the permanent
headline metric so BENCH_rN results form a comparable series; the other
rows are carried unchanged for cross-round continuity:

  headline  converged-like scene: SOLID occupancy (interior cells stay
            occupied — the proven round-2 overflow regime), sharp
            surface (inv_s ~ 800), BANDED transmittance-prefiltered
            marching (samples restricted to the weight-mass band
            [t_lo, t_cut)) at the config's eval_banded_samples_per_ray
            budget.  This is what eval actually looks like at the end
            of training.  Falls back to the cut-only protocol when
            banding is disabled in the config.
  cutonly   same scene, cut-only prefilter at eval_samples_per_ray
            (the round-3 pre-band headline, for continuity).
  shell     legacy round-1/2 protocol (thin-shell occupancy, soft
            inv_s ~ 20, no prefilter) for cross-round continuity.
  nopf192   the round-2 workaround on the converged scene: no
            prefilter, 192 samples/ray — what the headline replaces.
  sphere    sphere-traced surface eval (ops/sphere_trace.py +
            forward_surface): no sample buffers at all; the beyond-
            parity fast path for converged surfaces (reported
            separately, not the headline — it renders the surface,
            not the volume).

Env: RISE_BENCH_SIZE overrides the 800 image side (CPU smoke).

Also reports the roofline position (achieved TFLOP/s + HBM GB/s from
XLA cost_analysis over measured wall time vs chip peaks).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import os

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_compile_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# Analytic bound on the REFERENCE pipeline's eval throughput on its own
# hardware class (RTX 3090), derived term-by-term from the reference's
# kernel semantics in BASELINE.md ("GPU anchor" section): tcnn fused
# hashgrid+MLP inference rate, nerfacc visible-sample counts, the dense
# 96-sample secondary occlusion march, texture-head FLOPs, and measured
# PyTorch per-chunk dispatch overhead.  The reference publishes no
# throughput numbers (README.md:23 states only a hardware floor), so
# vs_baseline is reported against this defended estimate.
REF_GPU_RAYS_PER_SEC_BOUND = 300_000.0  # defended 3090 estimate; see
# BASELINE.md "GPU anchor": speed-of-light 1.5M (kernels only), typical
# measured class 20-130k; 300k = optimized-reference midpoint.


def make_occupancy(model, kind):
    """'shell' = thin band at r=0.5; 'solid' = filled ball (converged
    grids keep solid interiors occupied — the occ_eval alpha is ~1
    inside an object)."""
    import jax.numpy as jnp

    res = model.grid_resolution
    g = (np.arange(res) + 0.5) / res * 2 * model.radius - model.radius
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    r = np.sqrt(x * x + y * y + z * z)
    cell = 2 * model.radius / res
    if kind == "shell":
        binary = np.abs(r - 0.5) < (2.0 * cell)
    else:
        binary = r < (0.5 + 2.0 * cell)
    log(f"occupancy[{kind}]: {binary.mean() * 100:.2f}% cells")
    return jnp.asarray(binary.reshape(-1))


def image_rays(w=None, h=None):
    import jax.numpy as jnp

    side = int(os.environ.get("RISE_BENCH_SIZE", "800"))
    w = w or side
    h = h or side

    from rise_sdf_tpu.datasets.synthetic import look_at
    from rise_sdf_tpu.utils.rays import get_ray_directions, get_rays

    focal = 0.5 * w / np.tan(0.5 * 0.35)
    dirs = get_ray_directions(w, h, focal, focal, w // 2, h // 2)
    c2w = look_at(np.array([0.0, -4.0, 0.0]))
    rays_o, rays_d = get_rays(jnp.asarray(dirs), jnp.asarray(c2w))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    return jnp.concatenate([rays_o, rays_d], -1)


def run_protocol(model, params, occ_binary, rays, *, step, capacity,
                 prefilter, chunk, label, banded=False, surface=False,
                 gather_ns_per_row=None, pipeline_depth=1, bake_fn=None):
    import jax
    import jax.numpy as jnp

    from rise_sdf_tpu.ops.hashgrid import count_gather_rows
    from rise_sdf_tpu.utils import roofline
    from rise_sdf_tpu.utils.misc import pipeline_chunks

    build_mips = jax.jit(lambda p: model.emitter.build_mips(p["emitter"]))

    if bake_fn is not None:
        # eval-time dense SDF bake (model.eval_sdf_bake != off): inject
        # the packed grid like the systems' eval does.  The timed loop
        # below re-bakes once per image — conservative vs real eval,
        # which amortizes one bake per checkpoint over a 32-view test.
        params = {**params, "_eval_bake": bake_fn()}

    if surface:
        # sphere-traced fast eval (ops/sphere_trace.py): no sample
        # buffers at all — capacity/prefilter/banded are moot
        def body(params, rays_chunk, mips):
            out = model.forward_surface(
                params, rays_chunk, occ_binary=occ_binary, mips=mips,
                step=step, stage=1, background_color=jnp.ones((3,)))
            return out["comp_rgb_full"], out["ray_included"]
    else:
        def body(params, rays_chunk, mips):
            out = model.forward(
                params, rays_chunk, occ_binary=occ_binary, mips=mips,
                step=step, rng=None, stage=1, train=False, capacity=capacity,
                background_color=jnp.ones((3,)), prefilter=prefilter,
                banded=banded)
            return out["comp_rgb_full"], out["ray_included"]

    t0 = time.time()
    mips = build_mips(params)
    with count_gather_rows() as gc:
        lowered = jax.jit(body).lower(params, rays[:chunk], mips)
    compiled = lowered.compile()
    img0, _ = compiled(params, rays[:chunk], mips)
    img0.block_until_ready()
    log(f"[{label}] compile+first chunk: {time.time() - t0:.1f}s; "
        f"{gc.rows / 1e6:.1f}M table-gather rows/chunk")
    costs = roofline.module_costs(compiled)

    n = rays.shape[0]
    dropped = 0
    t0 = time.time()
    mips = build_mips(params)  # once per image, like a real eval
    if bake_fn is not None:
        bake = bake_fn()       # once per image (timed), see above
        jax.block_until_ready(bake["packed"])
        params = {**params, "_eval_bake": bake}
        log(f"[{label}] sdf bake: {time.time() - t0:.2f}s (in timed loop)")

    def dispatch(s):
        rc = rays[s:s + chunk]
        if rc.shape[0] < chunk:
            rc = jnp.pad(rc, ((0, chunk - rc.shape[0]), (0, 0)))
        return compiled(params, rc, mips)

    def consume(s, disp):
        out, inc = disp
        # consume each result like a real render loop does; under the
        # axon runtime merely blocking a LATER dispatch does NOT imply
        # the earlier queued ones executed, so every chunk's inclusion
        # mask is host-read (same computation as out).  pipeline_depth>1
        # keeps the next chunk queued while this one is read (the real
        # eval loops do the same via the eval_pipeline_depth knob).
        out.block_until_ready()
        return int((~np.asarray(inc)).sum())

    per_chunk = pipeline_chunks(range(0, n, chunk), dispatch, consume,
                                depth=pipeline_depth)
    dropped = sum(per_chunk)
    n_chunks = len(per_chunk)
    dt = time.time() - t0
    rays_per_sec = n / dt
    res = {"rays_per_sec": rays_per_sec, "dropped_rays": dropped, "dt": dt}
    if costs is not None:
        res.update(roofline.summarize(costs, n_chunks, dt,
                                      device=jax.devices()[0]))
    if not surface and gather_ns_per_row is not None and gc.rows:
        # honest roofline: exact trace-time gather counts + ray/image IO
        # vs the measured gather-issue roof (sphere-trace excluded: its
        # SDF probes sit inside a lax.scan, so trace counts undercount)
        io_bytes = chunk * 6 * 4 + chunk * 4 * 4
        res.update(roofline.analytic_summarize(
            gc.rows, gc.bytes, io_bytes, n_chunks, dt,
            gather_ns_per_row, device=jax.devices()[0]))
    log(f"[{label}] {n} rays in {dt:.2f}s -> {rays_per_sec:.0f} rays/s; "
        f"dropped={dropped}"
        + (f"; {res['achieved_tflops']:.2f} TFLOP/s "
           f"(mfu {res['est_mfu'] * 100:.2f}%)"
           if costs is not None else " (no cost model on this backend)")
        + (f"; gather {res['gather_rows_per_sec'] / 1e6:.0f}M rows/s = "
           f"{res['gather_roof_frac'] * 100:.0f}% of the "
           f"{gather_ns_per_row:.1f} ns/row issue roof; "
           f"analytic HBM >= {res['analytic_hbm_gbs_lb']:.1f} GB/s "
           f"({res['analytic_membw_frac'] * 100:.1f}% of peak)"
           if "gather_roof_frac" in res else ""))
    return res


def main():
    # JAX_PLATFORMS=cpu in the env alone does not stop the axon plugin
    # from grabbing compilation on this host — mirror it into the config
    # (same guard as launch.py; see tpu-host-quirks)
    plat = os.environ.get("JAX_PLATFORMS")
    import jax

    if plat:
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp

    from rise_sdf_tpu import models
    from rise_sdf_tpu.config import load_config

    # extra dotlist overrides pass through (e.g. model.eval_samples_per_ray=48)
    cfg = load_config("configs/split-mixed-occ-tensoir.yaml",
                      cli_args=["dataset.scene=bench"] + sys.argv[1:])
    model = models.make(cfg.model.name, cfg.model)
    params = model.init(jax.random.PRNGKey(0))
    log("model initialized; devices:", jax.devices())

    # converged-like variance: the production run ends at inv_s ~ 816
    # (BASELINE.md); exp(10 * 0.67) ~ 812
    params_sharp = dict(params)
    params_sharp["variance"] = {**params["variance"],
                                "variance": jnp.asarray(0.67, jnp.float32)}

    rays = image_rays()
    rays_rowmajor = rays  # continuity rows pin the historical ordering
    chunk = int(cfg.model.ray_chunk)
    ilv = cfg.model.get("eval_ray_interleave", False)
    if ilv:
        # same interleave as the systems' eval path: spreads silhouette
        # load across chunks so smaller single-pass buffers stay drop-
        # compliant; per-ray results are order-independent, so protocol
        # totals are unchanged
        from rise_sdf_tpu.utils.misc import interleave_order

        order, _ = interleave_order(rays.shape[0], chunk, ilv)
        if order is not None:
            rays = rays[jnp.asarray(order)]
    spr = int(cfg.model.get("eval_samples_per_ray", 64))
    pdepth = int(cfg.model.get("eval_pipeline_depth", 1))
    step = jnp.asarray(cfg.model.split_sum_kick_in_step + 1, jnp.int32)

    solid = make_occupancy(model, "solid")
    shell = make_occupancy(model, "shell")

    band_spr = int(cfg.model.get("eval_banded_samples_per_ray", 0))

    from rise_sdf_tpu.utils import roofline

    # per-dispatch round-trip: on the tunneled axon runtime every chunk
    # pays a host<->device RTT (the render loop blocks per chunk); with
    # 157 chunks/image this can dominate wall time.  Reported so the
    # headline can be decomposed into compute vs dispatch, and measured
    # FIRST so the gather-roof micro-bench can subtract it per call.
    trivial = jax.jit(lambda x: x + 1.0)
    float(trivial(jnp.float32(0.0)))
    t0 = time.time()
    for i in range(20):
        float(trivial(jnp.float32(i)))
    dispatch_ms = (time.time() - t0) / 20 * 1e3
    log(f"per-dispatch round-trip: {dispatch_ms:.2f} ms")

    t0 = time.time()
    gather_ns = roofline.measure_gather_issue_rate(
        dispatch_s=dispatch_ms / 1e3)
    log(f"gather issue roof: {gather_ns:.2f} ns/row (measured in-process,"
        f" forced reads, 24-deep dependent chain per dispatch;"
        f" {time.time() - t0:.1f}s)")

    # RISE_BENCH_FAST=1: headline-protocol rows only (cutonly + banded
    # headline) for quick config-arm A/Bs; the official driver run stays
    # the full 5-protocol suite.
    fast = os.environ.get("RISE_BENCH_FAST", "") not in ("", "0")

    # eval-time dense SDF bake arm (model.eval_sdf_bake=probe|full):
    # injected exactly like the systems' eval; continuity rows below
    # never bake (frozen protocols)
    bake_fn = None
    if getattr(model, "eval_sdf_bake", "off") != "off":
        bake_fn = lambda: model.bake_eval_sdf(params_sharp, int(step))
        log(f"sdf bake arm: mode={model.eval_sdf_bake} "
            f"cells={model.eval_sdf_bake_cells}")

    cutonly = run_protocol(
        model, params_sharp, solid, rays, step=step, capacity=chunk * spr,
        prefilter=True, chunk=chunk, label="cutonly solid+prefilter",
        gather_ns_per_row=gather_ns, pipeline_depth=pdepth, bake_fn=bake_fn)
    band_reserve = int(cfg.model.get("eval_band_reserve", 0))
    if band_spr > 0:
        headline = run_protocol(
            model, params_sharp, solid, rays, step=step,
            capacity=chunk * band_spr + band_reserve, prefilter=True,
            banded=True,
            chunk=chunk, label=f"headline banded {band_spr}spr",
            gather_ns_per_row=gather_ns, pipeline_depth=pdepth,
            bake_fn=bake_fn)
        mdesc = "banded prefiltered marching"
        # the SAME protocol serial-forced (depth=1): r4's driver bench
        # (7,951) vs session bench (9,179) differed ~13% with no way to
        # attribute it; printing both rows + the RTT drift below makes
        # the dispatch-overlap share of the headline explicit per run
        headline_serial = run_protocol(
            model, params_sharp, solid, rays, step=step,
            capacity=chunk * band_spr + band_reserve, prefilter=True,
            banded=True, chunk=chunk,
            label=f"headline banded {band_spr}spr SERIAL",
            gather_ns_per_row=gather_ns, pipeline_depth=1,
            bake_fn=bake_fn)
    else:
        headline, mdesc = cutonly, "prefiltered marching"
        headline_serial = None
    # RTT drift: re-measure the per-dispatch round-trip after the
    # headline rows — the tunneled runtime's RTT varies run-to-run and
    # is the suspected cause of driver-vs-session headline gaps
    t0 = time.time()
    for i in range(20):
        float(trivial(jnp.float32(i)))
    dispatch_ms_post = (time.time() - t0) / 20 * 1e3
    log(f"per-dispatch round-trip after headline: {dispatch_ms_post:.2f} ms"
        f" (pre: {dispatch_ms:.2f} ms)")
    legacy = nopf = sphere = None
    if not fast:
        # continuity rows pin their HISTORICAL chunk (4096), row-major
        # ray order AND serial dispatch (pipeline_depth=1): they exist to
        # compare across rounds, so config arms (e.g. ray_chunk=16384,
        # eval_ray_interleave=golden, eval_pipeline_depth=2) must not
        # perturb them — ordering changes per-chunk load (dropped rays)
        # and pipelining changes timing
        lchunk = 4096
        legacy = run_protocol(
            model, params, shell, rays_rowmajor, step=step,
            capacity=lchunk * spr,
            prefilter=False, chunk=lchunk, label="legacy shell",
            gather_ns_per_row=gather_ns, pipeline_depth=1)
        nopf = run_protocol(
            model, params_sharp, solid, rays_rowmajor, step=step,
            capacity=lchunk * 192, prefilter=False, chunk=lchunk,
            label="nopf192 (r2 workaround)", gather_ns_per_row=gather_ns,
            pipeline_depth=1)
        sphere = run_protocol(
            model, params_sharp, solid, rays_rowmajor, step=step,
            capacity=0,
            prefilter=False, chunk=lchunk,
            label="sphere-trace surface eval",
            surface=True, pipeline_depth=1) if hasattr(model, "forward_surface") else None

    side = int(os.environ.get("RISE_BENCH_SIZE", "800"))
    out = {
        "metric": f"rays/sec/chip at {side}^2 split-sum PBR render "
                  f"(converged solid occupancy, {mdesc})",
        "value": round(headline["rays_per_sec"], 1),
        "unit": "rays/s",
        "vs_baseline": None,
        # FROZEN continuity protocol (r3+): converged-solid occupancy,
        # sharp inv_s~800, banded prefiltered marching at the config's
        # eval_banded_samples_per_ray, 800^2, production hyperparams.
        # The headline stays this protocol permanently; legacy rows ride
        # along unchanged so BENCH_rN form a comparable series.
        "protocol": "banded-solid-800sq (frozen r3)",
        "dispatch_ms_per_call": round(dispatch_ms, 3),
        "dispatch_ms_per_call_post": round(dispatch_ms_post, 3),
        "eval_pipeline_depth": pdepth,
        "headline_serial_rays_per_sec":
            round(headline_serial["rays_per_sec"], 1)
            if headline_serial else None,
        "eval_sdf_bake": getattr(model, "eval_sdf_bake", "off"),
        "dropped_rays": headline["dropped_rays"],
        "cut_only_rays_per_sec": round(cutonly["rays_per_sec"], 1),
        "legacy_shell_rays_per_sec":
            round(legacy["rays_per_sec"], 1) if legacy else None,
        "no_prefilter_192spr_rays_per_sec":
            round(nopf["rays_per_sec"], 1) if nopf else None,
    }
    if sphere is not None:
        out["sphere_trace_rays_per_sec"] = round(sphere["rays_per_sec"], 1)
        out["sphere_trace_unresolved_rays"] = sphere["dropped_rays"]
    for k in ("achieved_tflops", "est_mfu", "gather_rows_per_sec",
              "gather_roof_frac", "gather_ns_per_row_roof",
              "analytic_hbm_gbs_lb", "analytic_membw_frac",
              "xla_costmodel_gbs_ub", "xla_costmodel_membw_frac_ub"):
        if k in headline:
            out[k] = round(headline[k], 4)
    if REF_GPU_RAYS_PER_SEC_BOUND:
        out["vs_baseline"] = round(
            headline["rays_per_sec"] / REF_GPU_RAYS_PER_SEC_BOUND, 3)
        out["baseline_anchor"] = (
            "analytic RTX3090 bound on the reference eval pipeline, "
            f"{REF_GPU_RAYS_PER_SEC_BOUND:.0f} rays/s — "
            "derivation in BASELINE.md (GPU anchor)")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
