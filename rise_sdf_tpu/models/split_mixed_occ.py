"""Split-mixed-occ renderer — the full PBIR model, functional TPU design.

Re-designs the reference ``models/split_mixed_occ.py`` (SplitMixedOCCModel):

* occupancy-pruned padded marching + fixed-capacity compaction for the
  primary pass; masked dense marching for secondary occlusion rays;
* stage gating (0: NN radiance split; 1: + split-sum PBR) is a *static*
  flag — exactly two jit specializations over the whole run;
* the data-dependent secondary/third-bounce subsets
  (``valid_indices``/roughness masks, reference :291-331) become
  fixed-width masked computations;
* all channel accumulation is one segment-sum over a packed value
  matrix.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import make, register
from .neus import neus_alpha, occ_eval_alpha
from .variance import Variance
from ..ops import march, volrend
from ..utils.color import rgb_to_srgb


def _normalize(v, eps=1e-6):
    """Zero-safe normalize (finite gradient at v = 0)."""
    return v / jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + eps * eps)


@register("split-mixed-occ")
class SplitMixedOccModel:
    def __init__(self, config):
        self.config = config
        self.radius = float(config["radius"])
        self.num_samples_per_ray = int(config["num_samples_per_ray"])
        self.render_step_size = 1.732 * 2 * self.radius / self.num_samples_per_ray
        self.num_samples_per_secondary_ray = int(
            config.get("num_samples_per_secondary_ray", 96))
        self.secondary_near_plane = float(config.get("secondary_near_plane", 0.05))
        self.secondary_far_plane = float(config.get("secondary_far_plane", 1.5))
        # fraction of R*S secondary samples kept after occupancy
        # compaction (1.0 = full-width, exact reference behavior)
        self.secondary_sample_capacity_frac = float(
            config.get("secondary_sample_capacity_frac", 1.0))
        # eval-only: fraction of the sample capacity kept for the texture
        # stage after visibility (weight > 1e-5) compaction (1.0 = off)
        self.eval_visibility_frac = float(
            config.get("eval_visibility_frac", 1.0))
        self.grid_resolution = int(config.get("grid_resolution", 128))
        # transmittance-aware marching (reference alpha_fn prefilter +
        # early termination): coarse SDF probe -> per-ray t_cut
        self.visibility_prefilter = bool(
            config.get("visibility_prefilter", False))
        self.prefilter_stride = int(config.get("prefilter_stride", 4))
        self.prefilter_coarse_per_ray = int(
            config.get("prefilter_coarse_per_ray", 64))
        self.prefilter_margin_intervals = float(
            config.get("prefilter_margin_intervals", 1.0))
        # probe-only SDF level cut (0/None = all levels): the coarse
        # probe is ~55% of eval gather rows at 8 corners x L levels per
        # probe point, and its job is only to place a conservative band
        # around the surface (1-interval margin) — the marched samples
        # and shading still use every level.  Quality gate: parity
        # validate on a converged checkpoint before flipping.
        self.prefilter_levels = int(config.get("prefilter_levels", 0) or 0)
        # eval-time dense SDF bake (ops/sdf_bake.py): once per checkpoint
        # the full SDF is baked onto a corner-packed trilinear grid, and
        # the coarse visibility probe ("probe") — plus the secondary
        # occlusion march's alpha ("full") — read it back at ONE gather
        # row per sample instead of 8 corners x L hash levels + MLP.
        # Together those passes are ~86% of eval gather rows, and TPU
        # gathers are issue-rate-bound (BASELINE.md roofline), so this is
        # the structural row-volume lever.  The bake rides an eval-only
        # ``params["_eval_bake"]`` entry injected by the systems/bench
        # (never present in training params).  Gate: converged-checkpoint
        # PSNR parity (<0.1 dB) before any default flip.
        self.eval_sdf_bake = str(config.get("eval_sdf_bake", "off")
                                 or "off")
        assert self.eval_sdf_bake in ("off", "probe", "full"), \
            self.eval_sdf_bake
        self.eval_sdf_bake_cells = int(config.get("eval_sdf_bake_cells",
                                                  128))
        # exact-K band sampling (ops/march.py band_k): banded rays get
        # exactly K samples spanning their own band, so banded eval
        # cannot overflow; opt-out reproduces fine-step-masked banding
        self.eval_band_spr = int(config.get("eval_banded_samples_per_ray", 0))
        self.eval_band_exact = bool(config.get("eval_band_exact", True))
        self.prefilter_start_step = int(
            config.get("prefilter_start_step",
                       config.get("split_sum_kick_in_step", 0)))
        # sphere-traced fast eval (forward_surface): opt-in via
        # eval_mode: sphere_trace; parameters of ops/sphere_trace.py.
        # EXPERIMENTAL (demoted r4): on the converged r4mini checkpoint
        # it measured -1.83 dB NN PSNR AND 1% slower than banded volume
        # eval (BASELINE.md "win-or-demote"); not a headline alternative
        self.eval_mode = str(config.get("eval_mode", "volume"))
        self.st_iters = int(config.get("sphere_trace_iters", 48))
        self.st_refine = int(config.get("sphere_trace_refine_iters", 4))
        self.st_hit_eps = float(config.get("sphere_trace_hit_eps", 1e-3))
        self.st_relax = float(config.get("sphere_trace_relax", 0.9))
        self.st_occ_guard = bool(config.get("sphere_trace_occ_guard", True))
        # occupied lead of a surface's own dilation: ~2 cells of shell +
        # cell-center sampling slop, stretched by eikonal residual
        self.st_guard_margin = float(
            config.get("sphere_trace_guard_margin_cells", 4.0))
        # clearance gate on the guard: a MISS whose minimum SDF along
        # the whole trace stayed above k/inv_s carries no NeuS weight
        # mass anywhere on the ray — the volumetric fallback would
        # return background identically — so occupied cells it crossed
        # are grid dilation (the ~2-cell silhouette shell), not
        # tunneling.  r3's 13% unresolved-ray population was almost
        # entirely this shell; 0 disables.
        self.st_sdf_clearance = float(
            config.get("sphere_trace_sdf_clearance", 4.0))
        self.cos_anneal_end = int(config.get("cos_anneal_end", 0))
        self.randomized = bool(config.get("randomized", True))
        self.split_sum_kick_in_step = int(config.get("split_sum_kick_in_step", 0))
        self.indirect_pred = bool(config.get("indirect_pred", True))
        self.relighting_threshold = float(config.get("relighting_threshold", 0.3))
        self.aabb_min = jnp.asarray([-self.radius] * 3)
        self.aabb_max = jnp.asarray([self.radius] * 3)

        self.geometry = make(config["geometry"]["name"], config["geometry"])
        self.texture = make(config["texture"]["name"], config["texture"])
        self.emitter = make(config["light"]["name"], config["light"])
        self.variance = Variance(config["variance"])
        self.fd_grad = config["geometry"].get("grad_type") == "finite_difference"

    def init(self, key):
        ks = jax.random.split(key, 4)
        return {
            "geometry": self.geometry.init(ks[0]),
            "texture": self.texture.init(ks[1]),
            "variance": self.variance.init(ks[2]),
            "emitter": self.emitter.init(ks[3]),
        }

    # ------------------------------------------------------------------ #
    def stage(self, step: int) -> int:
        """Python-level stage flag (static under jit; one recompile at flip)."""
        return 1 if step >= self.split_sum_kick_in_step else 0

    def post_update(self, params, step):
        """Non-gradient buffer maintenance after the optimizer step
        (variance modulation's ``prev_inv_s`` tracker)."""
        v = self.variance.post_update(params["variance"], step)
        if v is not params["variance"]:
            params = {**params, "variance": v}
        return params

    def cos_anneal_ratio(self, step):
        if self.cos_anneal_end == 0:
            return jnp.asarray(1.0)
        return jnp.minimum(1.0, jnp.asarray(step, jnp.float32)
                           / self.cos_anneal_end)

    def occ_eval(self, params, x, step, levels=None):
        sdf = self.geometry.sdf(params["geometry"], x, step, levels=levels)
        inv_s = self.variance.inv_s(params["variance"], step)
        return occ_eval_alpha(sdf, inv_s, self.render_step_size)

    def open_levels(self, step: int):
        """Static open-level count of the geometry hash grid (None when
        not progressive) — for compile-time level specialization."""
        return self.geometry.open_levels(step) \
            if hasattr(self.geometry, "open_levels") else None

    # ------------------------------------------------------------------ #
    def _alpha_at(self, params, positions, t_dirs, dists, step,
                  cos_anneal_ratio, levels=None):
        bake = params.get("_eval_bake") if isinstance(params, dict) else None
        if bake is not None and self.eval_sdf_bake == "full":
            # eval-only baked path: trilinear SDF + its analytic cell
            # gradient from ONE packed gather row per sample (the
            # secondary march only needs transmittance through the
            # surface; |grad| ~ 1 by the eikonal property either way)
            from ..ops import sdf_bake as _sb

            sdf, grad = _sb.sample_packed_grad(
                bake, positions, self.aabb_min, self.aabb_max)
            normal = _normalize(grad)
            inv_s = self.variance.inv_s(params["variance"], step)
            true_cos = jnp.sum(t_dirs * normal, -1)
            return neus_alpha(sdf, inv_s, true_cos, dists,
                              cos_anneal_ratio)
        geo = self.geometry.forward(params["geometry"], positions, step,
                                    with_grad=True, with_feature=False,
                                    grad_mode="analytic", levels=levels)
        normal = _normalize(geo["grad"])
        inv_s = self.variance.inv_s(params["variance"], step)
        true_cos = jnp.sum(t_dirs * normal, -1)
        return neus_alpha(geo["sdf"], inv_s, true_cos, dists, cos_anneal_ratio)

    def compute_indirect_radiance(self, params, rays_o, rays_d, occ_binary,
                                  step, levels=None, frac=None):
        """Transmittance + expected depth along secondary rays (no grad).

        Reference ``models/split_mixed_occ.py:179-222``: 96 uniform
        samples in [0.05, 1.5], occupancy-masked, NeuS alpha, returns
        (1 - opacity, depth, included).  The geometry eval runs on
        occupancy-live samples compacted to a fixed budget (live
        fraction along secondary rays is small once the grid converges
        — full-width eval was ~half the render-chunk cost); overflowed
        rays are flagged so the caller's 2x fallback re-renders them.
        """
        ts, te, live = march.march_rays_dense(
            rays_o, rays_d, near_plane=self.secondary_near_plane,
            far_plane=self.secondary_far_plane,
            num_samples=self.num_samples_per_secondary_ray,
            aabb_min=self.aabb_min, aabb_max=self.aabb_max,
            grid_binary=occ_binary, grid_resolution=self.grid_resolution)
        t_mid = 0.5 * (ts + te)
        dists = te - ts
        pos = rays_o[:, None, :] + rays_d[:, None, :] * t_mid[..., None]
        n, s = pos.shape[0], pos.shape[1]
        t_dirs = jnp.broadcast_to(rays_d[:, None, :], pos.shape)

        if frac is None:
            frac = self.secondary_sample_capacity_frac
        cap = int(frac * n * s)
        if cap >= n * s:
            alpha = self._alpha_at(
                params, pos.reshape(-1, 3), t_dirs.reshape(-1, 3),
                dists.reshape(-1), step, jnp.asarray(1.0),
                levels=levels).reshape(n, s)
            included = jnp.ones((n,), bool)
        else:
            # compact live samples -> fixed buffer (march-style cumsum)
            flat_live = live.reshape(-1)
            pos_in_buf = jnp.cumsum(flat_live.astype(jnp.int32)) - 1
            ok = flat_live & (pos_in_buf < cap)
            dest = jnp.where(ok, pos_in_buf, cap)
            flat_idx = jnp.arange(n * s, dtype=jnp.int32)
            src = jnp.zeros((cap,), jnp.int32).at[dest].set(
                flat_idx, mode="drop")
            n_in = jnp.minimum(pos_in_buf[-1] + 1, cap)
            buf_valid = jnp.arange(cap) < n_in
            a_c = self._alpha_at(
                params, pos.reshape(-1, 3)[src], t_dirs.reshape(-1, 3)[src],
                dists.reshape(-1)[src], step, jnp.asarray(1.0),
                levels=levels)
            a_c = jnp.where(buf_valid, a_c, 0.0)
            alpha = jnp.zeros((n * s,), a_c.dtype).at[
                jnp.where(buf_valid, src, n * s)].set(
                a_c, mode="drop").reshape(n, s)
            # rays whose live samples overflowed the buffer
            ray_end = jnp.cumsum(live.sum(axis=1).astype(jnp.int32))
            included = ray_end <= cap
        alpha = jnp.where(live, alpha, 0.0)
        w, _ = volrend.render_weight_from_alpha_dense(alpha, live)
        acc = w.sum(axis=1, keepdims=True)
        depth = (w * t_mid).sum(axis=1, keepdims=True)
        return jax.lax.stop_gradient(jnp.clip(1.0 - acc, 0.0, 1.0)), \
            jax.lax.stop_gradient(depth), included, \
            live.sum().astype(jnp.int32)

    def _secondary_geom(self, params, rays_o, rays_d, occ_binary, step, *,
                        levels, secondary_frac, normal_map, depth_map,
                        acc_map, included, need_third: bool):
        """Emitter-independent half of the secondary pass: transmittance
        + depth along the reflected rays, the indirect-radiance MLP, and
        (when a relighting shade will follow) the third-bounce hit
        geometry + material cache.  Computed ONCE per geometry pass and
        shared by every light's ``_secondary_shade``."""
        sec_valid = acc_map[:, 0] > 0.5
        if not self.indirect_pred:
            return {"included": included, "sec_live": jnp.zeros((), jnp.int32)}
        sec_o = rays_o + depth_map * rays_d
        wo = -rays_d
        sec_d = 2.0 * jnp.sum(wo * normal_map, -1, keepdims=True) \
            * normal_map - wo
        tr, sec_depth, sec_inc, sec_live = self.compute_indirect_radiance(
            params, sec_o, sec_d, occ_binary, step, levels=levels,
            frac=secondary_frac)
        # secondary-compaction overflow only matters where the
        # secondary result is actually blended in
        included = included & (sec_inc | ~sec_valid)
        sec_geo = self.geometry.forward(
            params["geometry"], sec_o, step, with_grad=False,
            with_feature=True, levels=levels)
        sec_rgb = self.texture.secondary_shading(
            params["texture"], sec_geo["feature"], sec_d, normal_map,
            step=step)
        sg = {"sec_valid": sec_valid, "sec_d": sec_d, "tr": tr,
              "sec_rgb": sec_rgb, "sec_live": sec_live,
              "included": included}
        if need_third:
            # third mirror bounce for glossy points (reference :323-332)
            third_o = sec_o + sec_depth * sec_d
            tg = self.geometry.forward(
                params["geometry"], third_o, step, with_grad=True,
                with_feature=True, grad_mode="analytic", levels=levels)
            third_normal = _normalize(tg["grad"])
            if getattr(self.texture, "supports_multi_emitter", False):
                sg["third_cache"] = self.texture.secondary_pbr_cache(
                    params["texture"], tg["feature"], sec_d, third_normal,
                    third_o, step=step)
            else:
                sg["third_inputs"] = (tg["feature"], third_normal, third_o,
                                      step)
        return sg

    def _secondary_shade(self, params, sg, maps, *, stage, relighting, mips):
        """Per-light half of the secondary pass: blend the shared
        indirect radiance into the spec maps; under ``relighting``,
        shade the shared third-bounce hit with THIS light."""
        maps = dict(maps)
        if not self.indirect_pred:
            return maps
        mask = sg["sec_valid"][:, None]
        tr, sec_rgb = sg["tr"], sg["sec_rgb"]
        maps["spec_rgb"] = jnp.where(
            mask, tr * maps["spec_rgb"] + (1 - tr) * sec_rgb,
            maps["spec_rgb"])
        if stage != 0:
            if not relighting:
                maps["spec_rgb_pbr"] = jnp.where(
                    mask, tr * maps["spec_rgb_pbr"] + (1 - tr) * sec_rgb,
                    maps["spec_rgb_pbr"])
            else:
                rough_mask = mask & (maps["roughness"]
                                     <= self.relighting_threshold)
                if "third_cache" in sg:
                    third_rgb = self.texture.secondary_shade_pbr_cached(
                        sg["third_cache"], self.emitter, mips)
                else:
                    feat, third_normal, third_o, t_step = sg["third_inputs"]
                    third_rgb = self.texture.secondary_shading_pbr(
                        params["texture"], feat, sg["sec_d"], third_normal,
                        third_o, self.emitter, mips, step=t_step)
                maps["spec_light"] = jnp.where(
                    rough_mask,
                    tr * maps["spec_light"] + (1 - tr) * third_rgb,
                    maps["spec_light"])
                maps["spec_rgb_pbr"] = maps["spec_ref"] * maps["spec_light"]
        return maps

    def _apply_secondary(self, params, rays_o, rays_d, occ_binary, step, *,
                         levels, secondary_frac, stage, relighting, mips,
                         normal_map, depth_map, acc_map, maps, included):
        """Secondary occlusion / indirect radiance blend, shared by the
        volumetric ``forward`` and the sphere-traced ``forward_surface``
        (both produce per-ray surface maps by this point).  ``maps``
        holds spec_rgb (+ stage-1 spec_rgb_pbr/spec_ref/spec_light/
        roughness); returns the updated maps, the overflow-aware
        ``ray_included`` and the live secondary-sample count.  Built
        from ``_secondary_geom`` + ``_secondary_shade`` so the single-
        and multi-emitter paths share one set of numerics."""
        sg = self._secondary_geom(
            params, rays_o, rays_d, occ_binary, step, levels=levels,
            secondary_frac=secondary_frac, normal_map=normal_map,
            depth_map=depth_map, acc_map=acc_map, included=included,
            need_third=(stage != 0 and relighting))
        maps = self._secondary_shade(params, sg, maps, stage=stage,
                                     relighting=relighting, mips=mips)
        return maps, sg["included"], sg["sec_live"]

    def _assemble_out(self, *, diff_rgb_map, maps, blend_map, normal_map,
                      depth_map, acc_map, num_samples, included, inv_s,
                      background_color, stage, diff_rgb_pbr_map=None,
                      albedo_map=None, metallic_map=None):
        """Per-ray output dict shared by the volumetric ``forward`` and
        the sphere-traced ``forward_surface`` — ONE place defines the
        eval channel set so the two modes cannot drift (callers append
        their mode-specific extras: train tensors, calibration stats)."""
        spec_rgb_map = maps["spec_rgb"]
        rgb_map = diff_rgb_map + spec_rgb_map
        bg = jnp.broadcast_to(background_color[None, :], rgb_map.shape)
        out = {
            "comp_rgb": rgb_map,
            "comp_diffuse_rgb": diff_rgb_map,
            "comp_spec_rgb": spec_rgb_map,
            "comp_blend": blend_map,
            "comp_normal": normal_map,
            "opacity": acc_map,
            "depth": depth_map,
            "rays_valid": acc_map > 0,
            "num_samples": num_samples,
            "ray_included": included,
            "inv_s": inv_s,
            "comp_rgb_full": jnp.clip(
                rgb_to_srgb(rgb_map + bg * (1.0 - acc_map)), 0.0, 1.0),
            "rays_valid_full": acc_map > 0,
        }
        if stage != 0:
            spec_rgb_pbr_map = maps["spec_rgb_pbr"]
            rgb_pbr_map = diff_rgb_pbr_map + spec_rgb_pbr_map
            out.update({
                "comp_rgb_phys": rgb_pbr_map,
                "comp_diffuse_rgb_phys": diff_rgb_pbr_map,
                "comp_spec_rgb_phys": spec_rgb_pbr_map,
                "comp_albedo": albedo_map,
                "comp_metallic": metallic_map,
                "comp_roughness": maps["roughness"],
                "comp_rgb_phys_full": jnp.clip(
                    rgb_to_srgb(rgb_pbr_map + bg * (1.0 - acc_map)),
                    0.0, 1.0),
                "comp_spec_rgb_full": jnp.clip(
                    rgb_to_srgb(spec_rgb_map + bg * (1.0 - acc_map)),
                    0.0, 1.0),
                "comp_spec_rgb_phys_full": jnp.clip(
                    rgb_to_srgb(spec_rgb_pbr_map + bg * (1.0 - acc_map)),
                    0.0, 1.0),
            })
        return out

    # ------------------------------------------------------------------ #
    def prefilter_on(self, step: int, train: bool = True) -> bool:
        """Python-level (static) flag: is the visibility prefilter active?
        During training it kicks in once the surface is sharp enough to
        saturate transmittance (default: the split-sum kick-in step);
        at eval it is simply on when configured."""
        if not self.visibility_prefilter:
            return False
        return (step >= self.prefilter_start_step) if train else True

    def bake_eval_sdf(self, params, step):
        """Bake the full geometry SDF onto the eval grid (ops/sdf_bake).

        Called by the systems/bench once per checkpoint before an eval
        render session; the result is injected as ``params["_eval_bake"]``
        so every render path (escalation ladder, multi-emitter, sharded)
        sees it without signature changes.  Returns ``None`` when the
        bake is disabled.  The per-chunk SDF evaluation is jitted once
        and cached on the model, so repeated bakes (one per val) reuse
        the compile.
        """
        from ..ops import sdf_bake as _sb

        return _sb.bake_for_model(self, params, step)

    def visibility_cut(self, params, rays_o, rays_d, occ_binary, step,
                       levels=None, cos_anneal_ratio=1.0,
                       band: bool = False):
        """Per-ray transmittance cut (or ``(t_lo, t_cut)`` band when
        ``band=True``) from the coarse SDF probe."""
        n_rays = rays_o.shape[0]
        cap = n_rays * min(self.prefilter_coarse_per_ray,
                           max(self.num_samples_per_ray
                               // self.prefilter_stride, 1))
        if levels is None and self.prefilter_levels:
            levels = self.prefilter_levels  # probe-only level cut
        bake = params.get("_eval_bake") if isinstance(params, dict) else None
        if bake is not None and self.eval_sdf_bake != "off":
            # eval-only baked probe: one packed gather row per probe
            # point instead of 8 corners x L levels + the SDF MLP
            from ..ops import sdf_bake as _sb

            sdf_fn = lambda p: _sb.sample_packed(bake, p, self.aabb_min,
                                                 self.aabb_max)
        else:
            sdf_fn = lambda p: self.geometry.sdf(params["geometry"], p,
                                                 step, levels=levels)
        return march.compute_visibility_cut(
            rays_o, rays_d,
            sdf_fn=sdf_fn,
            inv_s=self.variance.inv_s(params["variance"], step),
            aabb_min=self.aabb_min, aabb_max=self.aabb_max,
            step_size=self.render_step_size,
            num_samples=self.num_samples_per_ray, capacity=cap,
            grid_binary=occ_binary, grid_resolution=self.grid_resolution,
            stride=self.prefilter_stride,
            cos_anneal_ratio=cos_anneal_ratio,
            early_stop_eps=volrend.EARLY_STOP_EPS,
            margin_intervals=self.prefilter_margin_intervals, band=band)

    def _march_compact(self, params, rays, *, occ_binary, step, rng, train,
                       capacity, levels, prefilter, banded, vis_frac):
        """March + geometry + NeuS weights + eval visibility compaction —
        the emitter-independent front half of ``forward``, shared with
        ``forward_multi`` (one geometry pass shading N lights)."""
        n_rays = rays.shape[0]
        rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
        march_rng = laplace_rng = None
        if rng is not None:
            rng, k1, k2 = jax.random.split(rng, 3)
            laplace_rng = k2
            if self.randomized and train:
                march_rng = k1

        t_cut = t_band_lo = None
        if prefilter and occ_binary is not None:
            vc = self.visibility_cut(
                params, rays_o, rays_d, occ_binary, step, levels=levels,
                cos_anneal_ratio=self.cos_anneal_ratio(step), band=banded)
            t_band_lo, t_cut = vc if banded else (None, vc)

        rs = march.march_rays(
            rays_o, rays_d, aabb_min=self.aabb_min, aabb_max=self.aabb_max,
            step_size=self.render_step_size,
            num_samples=self.num_samples_per_ray, capacity=capacity,
            grid_binary=occ_binary, grid_resolution=self.grid_resolution,
            rng=march_rng, t_cut=t_cut, t_band_lo=t_band_lo,
            band_k=(self.eval_band_spr
                    if (banded and self.eval_band_exact
                        and self.eval_band_spr > 0) else None),
            cone_angle=float(self.config.get("cone_angle", 0.0)))
        t_mid = 0.5 * (rs.t_starts + rs.t_ends)
        dists = rs.t_ends - rs.t_starts
        ridx = jnp.clip(rs.ray_indices, 0, n_rays - 1)
        positions = rays_o[ridx] + rays_d[ridx] * t_mid[:, None]
        t_dirs = rays_d[ridx]

        want_laplace = self.fd_grad and train
        geo = self.geometry.forward(
            params["geometry"], positions, step, with_grad=True,
            with_feature=True, with_laplace=want_laplace, rng=laplace_rng,
            grad_mode=None if train else "analytic", levels=levels)
        feature = geo["feature"]
        normal = _normalize(geo["grad"])
        inv_s = self.variance.inv_s(params["variance"], step)
        true_cos = jnp.sum(t_dirs * normal, -1)
        alpha = neus_alpha(geo["sdf"], inv_s, true_cos, dists,
                           self.cos_anneal_ratio(step))

        weights, _ = volrend.render_weight_from_alpha(
            alpha, rs.ray_start, rs.ray_indices, rs.valid, n_rays)

        included = rs.ray_included
        eff_vis_frac = self.eval_visibility_frac if vis_frac is None \
            else float(vis_frac)
        use_vis = (not train) and eff_vis_frac < 1.0
        if use_vis:
            # eval visibility compaction: the expensive texture stage
            # (5 MLP heads + mip evals + FG LUT) only runs on samples
            # whose render weight exceeds tau — everything below
            # contributes < tau per channel and is dropped
            cap2 = max(int(capacity * eff_vis_frac), 16)
            vis = (weights > 1e-5) & rs.valid
            pos_in_buf = jnp.cumsum(vis.astype(jnp.int32)) - 1
            ok = vis & (pos_in_buf < cap2)
            dest = jnp.where(ok, pos_in_buf, cap2)
            src = jnp.zeros((cap2,), jnp.int32).at[dest].set(
                jnp.arange(capacity, dtype=jnp.int32), mode="drop")
            n_in = jnp.minimum(pos_in_buf[-1] + 1, cap2)
            bv = jnp.arange(cap2) < n_in
            vis_cnt = jax.ops.segment_sum(
                vis.astype(jnp.int32), rs.ray_indices,
                num_segments=n_rays + 1)[:n_rays]
            included = included & (jnp.cumsum(vis_cnt) <= cap2)
            s_feature = feature[src]
            s_dirs = t_dirs[src]
            s_normal = normal[src]
            s_pos = positions[src]
            s_tmid = t_mid[src]
            s_weights = jnp.where(bv, weights[src], 0.0)
            s_ridx = jnp.where(bv, rs.ray_indices[src], n_rays)
        else:
            s_feature, s_dirs, s_normal = feature, t_dirs, normal
            s_pos, s_tmid = positions, t_mid
            s_weights, s_ridx = weights, rs.ray_indices

        return {"rs": rs, "geo": geo, "weights": weights,
                "included": included, "inv_s": inv_s, "t_mid": t_mid,
                "dists": dists, "s_feature": s_feature, "s_dirs": s_dirs,
                "s_normal": s_normal, "s_pos": s_pos, "s_tmid": s_tmid,
                "s_weights": s_weights, "s_ridx": s_ridx}

    def forward(self, params, rays, *, occ_binary, mips, step, rng=None,
                stage: int = 0, train: bool = False, relighting: bool = False,
                capacity: int, background_color, levels=None,
                secondary_frac=None, prefilter: bool = False,
                vis_frac=None, banded: bool = False):
        """rays [R,6] -> per-ray dict. stage/train/relighting/capacity/
        levels/secondary_frac/prefilter/vis_frac/banded static
        (``levels`` = open hash levels; None = all;
        ``secondary_frac``/``vis_frac`` override the secondary-sample /
        texture-visibility compaction budgets — e.g. the eval overflow
        fallback, or the derived fractions from
        ``SplitOccSystem.calibrate_eval``; ``prefilter`` enables
        transmittance-aware marching; ``banded`` additionally restricts
        eval samples to the probe's weight-mass band ``[t_lo, t_cut)``
        so a much smaller ``capacity`` suffices)."""
        mc = self._march_compact(
            params, rays, occ_binary=occ_binary, step=step, rng=rng,
            train=train, capacity=capacity, levels=levels,
            prefilter=prefilter, banded=banded, vis_frac=vis_frac)
        n_rays = rays.shape[0]
        rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
        rs, geo, weights, included, inv_s = \
            mc["rs"], mc["geo"], mc["weights"], mc["included"], mc["inv_s"]
        sdf, sdf_grad = geo["sdf"], geo["grad"]
        t_mid, dists = mc["t_mid"], mc["dists"]
        s_feature, s_dirs, s_normal = \
            mc["s_feature"], mc["s_dirs"], mc["s_normal"]
        s_pos, s_tmid = mc["s_pos"], mc["s_tmid"]
        s_weights, s_ridx = mc["s_weights"], mc["s_ridx"]
        want_laplace = self.fd_grad and train

        tex = self.texture.apply(
            params["texture"], s_feature, s_dirs, s_normal, s_pos,
            emitter=self.emitter, mips=mips, stage=stage, step=step)

        # pack per-sample channels for one fused accumulation
        chans = [tex["diff_rgb"], tex["spec_rgb"], tex["blend"]]
        if stage != 0:
            chans += [tex["diff_rgb_pbr"], tex["spec_rgb_pbr"],
                      tex["spec_ref"], tex["spec_light"], tex["albedo"],
                      tex["metallic"], tex["roughness"]]
        norm_orient = jnp.clip(jnp.sum(s_dirs * s_normal, -1, keepdims=True),
                               0.0, None)
        chans += [s_normal, s_tmid[:, None], jnp.ones_like(s_tmid)[:, None],
                  norm_orient]
        packed = jnp.concatenate(chans, axis=-1)
        acc = volrend.accumulate_along_rays(s_weights, s_ridx, packed,
                                            n_rays)
        i = 0

        def take(d):
            nonlocal i
            v = acc[:, i:i + d]
            i += d
            return v

        diff_rgb_map = take(3)
        spec_rgb_map = take(3)
        blend_map = take(1)
        if stage != 0:
            diff_rgb_pbr_map = take(3)
            spec_rgb_pbr_map = take(3)
            spec_ref_map = take(3)
            spec_light_map = take(3)
            albedo_map = take(3)
            metallic_map = take(1)
            roughness_map = take(1)
        normal_map = take(3)
        depth_map = take(1)
        acc_map = take(1)
        norm_orient_map = take(1)

        # ---- secondary occlusion / indirect pass (masked full-width) ---- #
        maps = {"spec_rgb": spec_rgb_map}
        if stage != 0:
            maps.update(spec_rgb_pbr=spec_rgb_pbr_map,
                        spec_ref=spec_ref_map, spec_light=spec_light_map,
                        roughness=roughness_map)
        maps, included, sec_live = self._apply_secondary(
            params, rays_o, rays_d, occ_binary, step, levels=levels,
            secondary_frac=secondary_frac, stage=stage,
            relighting=relighting, mips=mips, normal_map=normal_map,
            depth_map=depth_map, acc_map=acc_map, maps=maps,
            included=included)
        out = self._assemble_out(
            diff_rgb_map=diff_rgb_map, maps=maps, blend_map=blend_map,
            normal_map=normal_map, depth_map=depth_map, acc_map=acc_map,
            num_samples=rs.num_live, included=included, inv_s=inv_s,
            background_color=background_color, stage=stage,
            diff_rgb_pbr_map=diff_rgb_pbr_map if stage != 0 else None,
            albedo_map=albedo_map if stage != 0 else None,
            metallic_map=metallic_map if stage != 0 else None)
        if not train:
            # occupancy/visibility statistics for eval-capacity
            # calibration (SplitOccSystem.calibrate_eval): live samples
            # in the buffer, weight>1e-5 texture-stage samples, and live
            # secondary samples (pre-compaction)
            out["stat_live"] = rs.num_live
            out["stat_vis"] = ((weights > 1e-5) & rs.valid).sum()\
                .astype(jnp.int32)
            if self.indirect_pred:
                out["stat_secondary_live"] = sec_live
        if train:
            out.update({
                "sdf_samples": sdf,
                "sdf_grad_samples": sdf_grad,
                "samples_valid": rs.valid,
                "weights": weights,
                "points": t_mid,
                "intervals": dists,
                "ray_indices": rs.ray_indices,
                "ray_start": rs.ray_start,
                "normals_orientation_loss_map": norm_orient_map,
            })
            if want_laplace:
                out["sdf_laplace_samples"] = geo["laplace"]
                # curvature-probe trim: the probe ran on a strided subset
                # of samples; the loss must mask with the same stride
                ls = getattr(self.geometry, "laplace_stride", 1)
                out["sdf_laplace_valid"] = rs.valid[::ls]
        return out

    def forward_multi(self, params, rays, *, occ_binary, mips_list, step,
                      relight_flags, stage: int = 1, capacity: int,
                      background_color, levels=None, secondary_frac=None,
                      vis_frac=None, prefilter: bool = False,
                      banded: bool = False):
        """Multi-emitter eval: ONE geometry pass (march, SDF forward,
        NeuS weights, visibility compaction, secondary transmittance,
        third-bounce hit geometry) shaded under ``len(mips_list)``
        environment lights; returns one per-ray output dict per light.

        ``mips_list[i]`` pairs with the static ``relight_flags[i]``
        (False = the training emitter's NVS/phys render, True = a
        relight render with the third-bounce mirror path).  Per extra
        light the only per-sample work is two mip-cubemap lookups +
        arithmetic and a 9-channel accumulation — the march and every
        MLP run once.  The reference re-renders the full pipeline per
        relight light (``systems/split_occ.py:402-430``); results here
        are identical by construction because the shared pass is
        emitter-independent (same ``_march_compact`` /
        ``_secondary_geom`` the single-light ``forward`` uses)."""
        assert len(mips_list) == len(relight_flags) and mips_list
        assert getattr(self.texture, "supports_multi_emitter", False), \
            "texture model lacks the material_cache/shade_cached split"
        n_rays = rays.shape[0]
        rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
        mc = self._march_compact(
            params, rays, occ_binary=occ_binary, step=step, rng=None,
            train=False, capacity=capacity, levels=levels,
            prefilter=prefilter, banded=banded, vis_frac=vis_frac)
        rs, weights, inv_s = mc["rs"], mc["weights"], mc["inv_s"]
        s_normal, s_tmid = mc["s_normal"], mc["s_tmid"]
        s_weights, s_ridx = mc["s_weights"], mc["s_ridx"]

        texc = self.texture.material_cache(
            params["texture"], mc["s_feature"], mc["s_dirs"], s_normal,
            mc["s_pos"], stage=stage, step=step)

        # light-independent accumulation (NN radiance split + materials
        # + geometry maps), once
        chans = [texc["diff_rgb"], texc["spec_rgb"], texc["blend"]]
        if stage != 0:
            chans += [texc["spec_ref"], texc["albedo"], texc["metallic"],
                      texc["roughness"]]
        chans += [s_normal, s_tmid[:, None], jnp.ones_like(s_tmid)[:, None]]
        acc = volrend.accumulate_along_rays(
            s_weights, s_ridx, jnp.concatenate(chans, axis=-1), n_rays)
        i = 0

        def take(d):
            nonlocal i
            v = acc[:, i:i + d]
            i += d
            return v

        diff_rgb_map = take(3)
        spec_rgb_map = take(3)
        blend_map = take(1)
        if stage != 0:
            spec_ref_map = take(3)
            albedo_map = take(3)
            metallic_map = take(1)
            roughness_map = take(1)
        normal_map = take(3)
        depth_map = take(1)
        acc_map = take(1)

        sg = self._secondary_geom(
            params, rays_o, rays_d, occ_binary, step, levels=levels,
            secondary_frac=secondary_frac, normal_map=normal_map,
            depth_map=depth_map, acc_map=acc_map, included=mc["included"],
            need_third=(stage != 0 and any(relight_flags)))
        included = sg["included"]

        outs = []
        for mips, relighting in zip(mips_list, relight_flags):
            maps = {"spec_rgb": spec_rgb_map}
            if stage != 0:
                shade = self.texture.shade_cached(texc, self.emitter, mips,
                                                  stage=stage)
                acc_l = volrend.accumulate_along_rays(
                    s_weights, s_ridx,
                    jnp.concatenate([shade["diff_rgb_pbr"],
                                     shade["spec_rgb_pbr"],
                                     shade["spec_light"]], axis=-1), n_rays)
                diff_rgb_pbr_map = acc_l[:, 0:3]
                maps.update(spec_rgb_pbr=acc_l[:, 3:6],
                            spec_light=acc_l[:, 6:9],
                            spec_ref=spec_ref_map, roughness=roughness_map)
            maps = self._secondary_shade(params, sg, maps, stage=stage,
                                         relighting=relighting, mips=mips)
            out = self._assemble_out(
                diff_rgb_map=diff_rgb_map, maps=maps, blend_map=blend_map,
                normal_map=normal_map, depth_map=depth_map, acc_map=acc_map,
                num_samples=rs.num_live, included=included, inv_s=inv_s,
                background_color=background_color, stage=stage,
                diff_rgb_pbr_map=diff_rgb_pbr_map if stage != 0 else None,
                albedo_map=albedo_map if stage != 0 else None,
                metallic_map=metallic_map if stage != 0 else None)
            outs.append(out)
        # calibration statistics ride the first (NVS) output
        outs[0]["stat_live"] = rs.num_live
        outs[0]["stat_vis"] = ((weights > 1e-5) & rs.valid).sum()\
            .astype(jnp.int32)
        if self.indirect_pred:
            outs[0]["stat_secondary_live"] = sg["sec_live"]
        return outs

    def _surface_geometry(self, params, rays, *, occ_binary, step, levels):
        """Sphere trace + hit geometry + occupancy tunneling guard —
        the emitter-independent front half of ``forward_surface``,
        shared with ``forward_surface_multi``."""
        from ..ops.sphere_trace import sphere_trace

        rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
        res = sphere_trace(
            rays_o, rays_d,
            sdf_fn=lambda p: self.geometry.sdf(params["geometry"], p, step,
                                               levels=levels),
            aabb_min=self.aabb_min, aabb_max=self.aabb_max,
            n_iters=self.st_iters, refine_iters=self.st_refine,
            hit_eps=self.st_hit_eps, relax=self.st_relax)
        hit = res.hit
        included = res.converged
        pos = rays_o + rays_d * res.t_hit[:, None]
        geo = self.geometry.forward(
            params["geometry"], pos, step, with_grad=True,
            with_feature=True, grad_mode="analytic", levels=levels)
        normal = _normalize(geo["grad"])
        if occ_binary is not None and self.st_occ_guard:
            # tunneling guard: sphere tracing can overstep a thin sheet
            # when the learned SDF overestimates true distance (eikonal
            # residual > 1/relax), reporting a clean exit or a too-far
            # hit with no error signal.  A pure occupancy probe
            # (bitfield gathers, no MLP) along the ray flags rays whose
            # first occupied cell lies well before the reported hit —
            # or that "exited" through occupied space: those go to the
            # volumetric residual re-render instead of compositing
            # background.  The hit's own occupancy dilation leads the
            # crossing by ~dilation/cos(incidence) along the ray, so the
            # margin is cos-scaled (a fixed-t margin would flag every
            # oblique hit).
            t_near, t_far = march.ray_aabb_intersect(
                rays_o, rays_d, self.aabb_min, self.aabb_max)
            m = 64
            frac = (jnp.arange(m, dtype=rays.dtype) + 0.5) / m
            span = jnp.maximum(t_far - t_near, 0.0)
            ts = t_near[:, None] + span[:, None] * frac[None]
            pts = rays_o[:, None] + rays_d[:, None] * ts[..., None]
            occ = march.occupancy_lookup(
                occ_binary, pts.reshape(-1, 3), self.aabb_min,
                self.aabb_max, self.grid_resolution
            ).reshape(ts.shape)
            cell = 2.0 * self.radius / self.grid_resolution
            cos = jnp.abs(jnp.sum(rays_d * normal, -1))
            margin = self.st_guard_margin * cell / jnp.clip(cos, 0.15, 1.0)
            limit = jnp.where(hit, res.t_hit - margin, t_far + 1.0)
            suspect = (occ & (ts < limit[:, None])).any(-1)
            if self.st_sdf_clearance > 0:
                # clearance gate (see __init__): misses whose closest
                # approach clears k/inv_s PLUS half a marching step have
                # zero weight mass along the entire ray (the NeuS
                # midpoint estimator extends each section by cos*step/2,
                # so a bare sdf_min > k/inv_s still picks up silhouette
                # alpha), so the occupied cells they crossed are the
                # dilation shell — don't send them to the volumetric
                # fallback it would agree with anyway
                inv_s = self.variance.inv_s(params["variance"], step)
                clear_miss = (~hit) & (
                    (res.sdf_min - 0.5 * self.render_step_size) * inv_s
                    > self.st_sdf_clearance)
                suspect = suspect & ~clear_miss
            included = included & ~suspect
        return {"res": res, "hit": hit, "included": included, "pos": pos,
                "normal": normal, "geo": geo}

    def forward_surface(self, params, rays, *, occ_binary, mips, step,
                        stage: int = 1, relighting: bool = False,
                        background_color, levels=None, secondary_frac=None):
        """Sphere-traced surface eval: the fast non-parity eval mode.

        Replaces marching + volume rendering with a fixed-iteration
        root find on the SDF (``ops/sphere_trace.py``) and shades the
        single hit point per ray through the SAME texture / split-sum /
        secondary-occlusion path as ``forward`` (whose per-ray maps it
        mirrors key-for-key).  Valid once the surface is sharp
        (inv_s >~ 500): the NeuS weight distribution then concentrates
        within ~3/inv_s of the zero crossing, so the volumetric
        expectation degenerates to the surface value.  Rays the trace
        could not resolve within the iteration budget report
        ``ray_included=False`` so the caller's fallback ladder re-renders
        them volumetrically (systems/neus.py:_escalate_fallback).

        No reference analog (always volumetric there:
        ``models/split_mixed_occ.py:230-333``); enabled per-config with
        ``model.eval_mode: sphere_trace``.
        """
        sr = self._surface_geometry(params, rays, occ_binary=occ_binary,
                                    step=step, levels=levels)
        rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
        res, hit, included = sr["res"], sr["hit"], sr["included"]
        pos, normal = sr["pos"], sr["normal"]
        geo = sr["geo"]
        tex = self.texture.apply(
            params["texture"], geo["feature"], rays_d, normal, pos,
            emitter=self.emitter, mips=mips, stage=stage, step=step)

        w = hit.astype(rays.dtype)[:, None]
        diff_rgb_map = tex["diff_rgb"] * w
        blend_map = tex["blend"] * w
        normal_map = normal * w
        depth_map = res.t_hit[:, None] * w
        acc_map = w
        maps = {"spec_rgb": tex["spec_rgb"] * w}
        if stage != 0:
            diff_rgb_pbr_map = tex["diff_rgb_pbr"] * w
            albedo_map = tex["albedo"] * w
            metallic_map = tex["metallic"] * w
            maps.update(spec_rgb_pbr=tex["spec_rgb_pbr"] * w,
                        spec_ref=tex["spec_ref"] * w,
                        spec_light=tex["spec_light"] * w,
                        roughness=tex["roughness"] * w)

        maps, included, sec_live = self._apply_secondary(
            params, rays_o, rays_d, occ_binary, step, levels=levels,
            secondary_frac=secondary_frac, stage=stage,
            relighting=relighting, mips=mips, normal_map=normal_map,
            depth_map=depth_map, acc_map=acc_map, maps=maps,
            included=included)
        out = self._assemble_out(
            diff_rgb_map=diff_rgb_map, maps=maps, blend_map=blend_map,
            normal_map=normal_map, depth_map=depth_map, acc_map=acc_map,
            num_samples=(hit.sum() * (self.st_iters + self.st_refine))
            .astype(jnp.int32), included=included,
            inv_s=self.variance.inv_s(params["variance"], step),
            background_color=background_color, stage=stage,
            diff_rgb_pbr_map=diff_rgb_pbr_map if stage != 0 else None,
            albedo_map=albedo_map if stage != 0 else None,
            metallic_map=metallic_map if stage != 0 else None)
        if self.indirect_pred:
            out["stat_secondary_live"] = sec_live
        return out

    def forward_surface_multi(self, params, rays, *, occ_binary, mips_list,
                              step, relight_flags, stage: int = 1,
                              background_color, levels=None,
                              secondary_frac=None):
        """Multi-emitter sphere-traced eval: trace + hit geometry +
        tunneling guard + secondary geometry once, shade per light
        (see ``forward_multi``)."""
        assert len(mips_list) == len(relight_flags) and mips_list
        assert getattr(self.texture, "supports_multi_emitter", False), \
            "texture model lacks the material_cache/shade_cached split"
        sr = self._surface_geometry(params, rays, occ_binary=occ_binary,
                                    step=step, levels=levels)
        rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
        res, hit = sr["res"], sr["hit"]
        pos, normal = sr["pos"], sr["normal"]
        texc = self.texture.material_cache(
            params["texture"], sr["geo"]["feature"], rays_d, normal, pos,
            stage=stage, step=step)

        w = hit.astype(rays.dtype)[:, None]
        diff_rgb_map = texc["diff_rgb"] * w
        blend_map = texc["blend"] * w
        normal_map = normal * w
        depth_map = res.t_hit[:, None] * w
        acc_map = w
        spec_rgb_map = texc["spec_rgb"] * w
        if stage != 0:
            albedo_map = texc["albedo"] * w
            metallic_map = texc["metallic"] * w
            spec_ref_map = texc["spec_ref"] * w
            roughness_map = texc["roughness"] * w

        sg = self._secondary_geom(
            params, rays_o, rays_d, occ_binary, step, levels=levels,
            secondary_frac=secondary_frac, normal_map=normal_map,
            depth_map=depth_map, acc_map=acc_map, included=sr["included"],
            need_third=(stage != 0 and any(relight_flags)))
        included = sg["included"]

        outs = []
        for mips, relighting in zip(mips_list, relight_flags):
            maps = {"spec_rgb": spec_rgb_map}
            if stage != 0:
                shade = self.texture.shade_cached(texc, self.emitter, mips,
                                                  stage=stage)
                maps.update(spec_rgb_pbr=shade["spec_rgb_pbr"] * w,
                            spec_light=shade["spec_light"] * w,
                            spec_ref=spec_ref_map, roughness=roughness_map)
                diff_rgb_pbr_map = shade["diff_rgb_pbr"] * w
            maps = self._secondary_shade(params, sg, maps, stage=stage,
                                         relighting=relighting, mips=mips)
            out = self._assemble_out(
                diff_rgb_map=diff_rgb_map, maps=maps, blend_map=blend_map,
                normal_map=normal_map, depth_map=depth_map, acc_map=acc_map,
                num_samples=(hit.sum() * (self.st_iters + self.st_refine))
                .astype(jnp.int32), included=included,
                inv_s=self.variance.inv_s(params["variance"], step),
                background_color=background_color, stage=stage,
                diff_rgb_pbr_map=diff_rgb_pbr_map if stage != 0 else None,
                albedo_map=albedo_map if stage != 0 else None,
                metallic_map=metallic_map if stage != 0 else None)
            outs.append(out)
        if self.indirect_pred:
            outs[0]["stat_secondary_live"] = sg["sec_live"]
        return outs

    def forward_level(self, params, x, step=None):
        return self.geometry.forward_level(params["geometry"], x, step)
