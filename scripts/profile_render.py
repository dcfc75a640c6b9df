"""Bisect the render-chunk cost at production sizes on the attached device."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


from _timing import timeit_op


def timeit(name, f, *args, iters=5):
    return timeit_op(name, f, *args, iters=iters)


def main():
    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    from rise_sdf_tpu import models
    from rise_sdf_tpu.config import load_config
    from rise_sdf_tpu.ops import march, volrend

    cfg = load_config("configs/split-mixed-occ-tensoir.yaml",
                      cli_args=["dataset.scene=bench"])
    model = models.make(cfg.model.name, cfg.model)
    params = model.init(jax.random.PRNGKey(0))

    res = model.grid_resolution
    g = (np.arange(res) + 0.5) / res * 2 * model.radius - model.radius
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    r = np.sqrt(x * x + y * y + z * z)
    cell = 2 * model.radius / res
    occ_binary = jnp.asarray((np.abs(r - 0.5) < 2 * cell).reshape(-1))

    n_rays = 4096
    key = jax.random.PRNGKey(1)
    rays_o = jnp.tile(jnp.asarray([[0.0, -4.0, 0.0]]), (n_rays, 1))
    d = jax.random.normal(key, (n_rays, 3)) * 0.08 + jnp.asarray([0, 1.0, 0])
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.concatenate([rays_o, d], -1)
    capacity = 4096 * 128
    step = jnp.asarray(20000, jnp.int32)

    # 1. march only
    @jax.jit
    def f_march(d):
        return march.march_rays(
            rays_o, d, aabb_min=model.aabb_min, aabb_max=model.aabb_max,
            step_size=model.render_step_size, num_samples=1024,
            capacity=capacity, grid_binary=occ_binary, grid_resolution=res
        ).t_starts

    timeit("march 4096x1024 -> 512k", f_march, d)

    rs = march.march_rays(
        rays_o, d, aabb_min=model.aabb_min, aabb_max=model.aabb_max,
        step_size=model.render_step_size, num_samples=1024,
        capacity=capacity, grid_binary=occ_binary, grid_resolution=res)
    t_mid = 0.5 * (rs.t_starts + rs.t_ends)
    ridx = jnp.clip(rs.ray_indices, 0, n_rays - 1)
    positions = rays_o[ridx] + d[ridx] * t_mid[:, None]
    t_dirs = d[ridx]
    print(f"live samples: {int(rs.num_live)}", file=sys.stderr, flush=True)

    # 2. geometry field eval (no grad)
    @jax.jit
    def f_geo_nograd(p, pos):
        return model.geometry.raw(p["geometry"], pos, step)

    timeit("geometry raw 512k", f_geo_nograd, params, positions)

    # 3. geometry with FD grad
    @jax.jit
    def f_geo_fd(p, pos):
        out = model.geometry.forward(p["geometry"], pos, step,
                                     with_grad=True, with_feature=True)
        return out["sdf"], out["grad"]

    timeit("geometry FD grad 512k", f_geo_fd, params, positions)

    # 4. build_mips alone
    @jax.jit
    def f_mips(p):
        m = model.emitter.build_mips(p["emitter"])
        return m.diffuse

    timeit("build_mips 512", f_mips, params)

    mips = model.emitter.build_mips(params["emitter"])
    geo = model.geometry.forward(params["geometry"], positions, step,
                                 with_grad=True, with_feature=True)
    normal = geo["grad"] / jnp.maximum(
        jnp.linalg.norm(geo["grad"], axis=-1, keepdims=True), 1e-6)

    # 5. texture heads (stage 1, incl. mip eval + FG LUT)
    @jax.jit
    def f_tex(p, feat, td, nrm, pos, base):
        m = model.emitter.build_mips({"base": base})
        out = model.texture.apply(p["texture"], feat, td, nrm, pos,
                                  emitter=model.emitter, mips=m, stage=1,
                                  step=step)
        return out["spec_rgb_pbr"]

    timeit("texture stage1 512k (incl mips)", f_tex, params, geo["feature"],
           t_dirs, normal, positions, params["emitter"]["base"])

    # 5b. texture heads stage 0 (no PBR)
    @jax.jit
    def f_tex0(p, feat, td, nrm, pos):
        out = model.texture.apply(p["texture"], feat, td, nrm, pos,
                                  stage=0, step=step)
        return out["spec_rgb"]

    timeit("texture stage0 512k", f_tex0, params, geo["feature"], t_dirs,
           normal, positions)

    # 6. mip eval alone at 512k samples
    rough = jnp.full((positions.shape[0], 1), 0.3)

    @jax.jit
    def f_mip_eval(base, dirs2, ro):
        m = model.emitter.build_mips({"base": base})
        return model.emitter.eval_mip(m, dirs2, specular=True, roughness=ro)

    timeit("mips+spec eval 512k", f_mip_eval, params["emitter"]["base"],
           normal, rough)

    # 7. secondary indirect full-width
    @jax.jit
    def f_secondary(p, o2, d2):
        return model.compute_indirect_radiance(p, o2, d2, occ_binary, step)

    timeit("secondary 4096x96", f_secondary, params, rays_o, d)

    # 8. volrend scan+accum
    alphas = jax.random.uniform(key, (capacity,)) * 0.3
    vals = jax.random.uniform(key, (capacity, 24))

    @jax.jit
    def f_vr(a):
        w, _ = volrend.render_weight_from_alpha(
            a, rs.ray_start, rs.ray_indices, rs.valid, n_rays)
        return volrend.accumulate_along_rays(w, rs.ray_indices, vals, n_rays)

    timeit("volrend 512k x24", f_vr, alphas)

    # ---- surface (sphere-trace) eval breakdown --------------------- #
    # informs the two-phase-trace decision: if trace time dominates
    # forward_surface AND truncated-level tracing is much cheaper, a
    # coarse-march + full-refine split is worth building; if shading/
    # secondary dominates, it is not.
    from rise_sdf_tpu.ops.sphere_trace import sphere_trace

    solid = jnp.asarray((r < 0.5 + 2 * cell).reshape(-1))
    params_sharp = dict(params)
    params_sharp["variance"] = {**params["variance"],
                                "variance": jnp.asarray(0.67, jnp.float32)}

    def f_trace(p, levels=None):
        res_t = sphere_trace(
            rays_o, d,
            sdf_fn=lambda pts: model.geometry.sdf(p["geometry"], pts, step,
                                                  levels=levels),
            aabb_min=model.aabb_min, aabb_max=model.aabb_max,
            n_iters=model.st_iters, refine_iters=model.st_refine,
            hit_eps=model.st_hit_eps, relax=model.st_relax)
        return res_t.t_hit

    timeit("sphere_trace 4k rays (full levels)", f_trace, params_sharp)
    for lv in (10, 8):
        timeit(f"sphere_trace 4k rays (levels={lv})",
               lambda p, lv=lv: f_trace(p, levels=lv), params_sharp)

    mips_s = model.emitter.build_mips(params_sharp["emitter"])

    def f_surface(p, occb):
        out = model.forward_surface(
            p, rays, occ_binary=occb, mips=mips_s, step=step, stage=1,
            background_color=jnp.ones((3,)))
        return out["comp_rgb_full"]

    if hasattr(model, "forward_surface"):
        timeit("forward_surface 4k rays (guard on)", f_surface, params_sharp,
               solid)
        guard_prev = model.st_occ_guard
        model.st_occ_guard = False
        timeit("forward_surface 4k rays (guard off)",
               lambda p: f_surface(p, solid), params_sharp)
        model.st_occ_guard = guard_prev


if __name__ == "__main__":
    main()
