"""NeuS renderer (geometry + radiance, no PBR) — functional.

TPU re-design of the reference ``models/neus.py``: occupancy-pruned
padded marching + compaction (``ops/march.py``) instead of nerfacc's
dynamic-shape sampler, segmented scans for weights, masked accumulation.
Schedule state (cos-anneal ratio) is a pure function of the step.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from . import make, register
from .variance import Variance
from ..ops import march, volrend


def _normalize(v, eps=1e-6):
    """Zero-safe normalize (finite gradient at v = 0)."""
    return v / jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + eps * eps)


def neus_alpha(sdf, inv_s, true_cos, dists, cos_anneal_ratio):
    """NeuS section-CDF alpha (reference models/neus.py:128-150)."""
    iter_cos = -(
        jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - cos_anneal_ratio)
        + jax.nn.relu(-true_cos) * cos_anneal_ratio
    )
    est_next = sdf + iter_cos * dists * 0.5
    est_prev = sdf - iter_cos * dists * 0.5
    prev_cdf = jax.nn.sigmoid(est_prev * inv_s)
    next_cdf = jax.nn.sigmoid(est_next * inv_s)
    p = prev_cdf - next_cdf
    c = prev_cdf
    return jnp.clip((p + 1e-5) / (c + 1e-5), 0.0, 1.0)


def occ_eval_alpha(sdf, inv_s, step_size):
    """Occupancy-grid alpha probe (reference models/neus.py:101-112)."""
    est_next = sdf - step_size * 0.5
    est_prev = sdf + step_size * 0.5
    prev_cdf = jax.nn.sigmoid(est_prev * inv_s)
    next_cdf = jax.nn.sigmoid(est_next * inv_s)
    return jnp.clip((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5), 0.0, 1.0)


@register("neus")
class NeuSModel:
    def __init__(self, config):
        self.config = config
        self.radius = float(config["radius"])
        self.num_samples_per_ray = int(config["num_samples_per_ray"])
        self.render_step_size = 1.732 * 2 * self.radius / self.num_samples_per_ray
        self.grid_resolution = int(config.get("grid_resolution", 128))
        self.cos_anneal_end = int(config.get("cos_anneal_end", 0))
        self.randomized = bool(config.get("randomized", True))
        self.aabb_min = jnp.asarray([-self.radius] * 3)
        self.aabb_max = jnp.asarray([self.radius] * 3)
        # eval-time dense SDF bake for the visibility probe (see
        # split_mixed_occ.py / ops/sdf_bake.py; NeuS has no secondary
        # pass, so "full" and "probe" are equivalent here)
        self.eval_sdf_bake = str(config.get("eval_sdf_bake", "off")
                                 or "off")
        self.eval_sdf_bake_cells = int(config.get("eval_sdf_bake_cells",
                                                  128))
        self.geometry = make(config["geometry"]["name"], config["geometry"])
        self.texture = make(config["texture"]["name"], config["texture"])
        self.variance = Variance(config["variance"])
        self.learned_background = bool(config.get("learned_background", False))
        if self.learned_background:
            self.geometry_bg = make(config["geometry_bg"]["name"],
                                    config["geometry_bg"])
            self.texture_bg = make(config["texture_bg"]["name"],
                                   config["texture_bg"])
            self.num_samples_per_ray_bg = int(
                config.get("num_samples_per_ray_bg", 64))
            self.near_plane_bg, self.far_plane_bg = 0.1, 1e3

    def init(self, key):
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        params = {
            "geometry": self.geometry.init(k1),
            "texture": self.texture.init(k2),
            "variance": self.variance.init(k3),
        }
        if self.learned_background:
            params["geometry_bg"] = self.geometry_bg.init(k4)
            params["texture_bg"] = self.texture_bg.init(k5)
        return params

    # ------------------------------------------------------------------ #
    def forward_bg(self, params, rays_o, rays_d, step):
        """Learned background in contracted space (reference
        models/neus.py:152-225): exponentially-spaced samples beyond the
        foreground AABB, density field + radiance, dense masked weights.
        """
        from .geometry import contract_to_unisphere
        from ..ops.volrend import render_weight_from_alpha_dense

        n_rays = rays_o.shape[0]
        s = self.num_samples_per_ray_bg
        _, t_exit = march.ray_aabb_intersect(rays_o, rays_d, self.aabb_min,
                                             self.aabb_max)
        t0 = jnp.maximum(self.near_plane_bg,
                         jnp.where(t_exit > 0, t_exit, self.near_plane_bg))
        # log-spaced marching t0 -> far (the TPU analog of nerfacc's
        # cone_angle growing steps)
        frac = jnp.arange(s, dtype=jnp.float32)[None, :] / (s - 1)
        t = t0[:, None] * (self.far_plane_bg / t0[:, None]) ** frac
        t_mid = 0.5 * (t[:, 1:] + t[:, :-1])
        dists = t[:, 1:] - t[:, :-1]
        pos = rays_o[:, None, :] + rays_d[:, None, :] * t_mid[..., None]
        u = contract_to_unisphere(pos.reshape(-1, 3), self.radius)
        density, feature = self.geometry_bg.forward(
            params["geometry_bg"], u, step)
        t_dirs = jnp.broadcast_to(rays_d[:, None, :], pos.shape).reshape(-1, 3)
        rgb = self.texture_bg.apply(params["texture_bg"], feature, t_dirs,
                                    step=step)
        alpha = 1.0 - jnp.exp(-jax.nn.relu(density).reshape(n_rays, s - 1)
                              * dists)
        live = jnp.ones_like(alpha, bool)
        w, _ = render_weight_from_alpha_dense(alpha, live)
        comp_rgb = jnp.einsum("rs,rsc->rc", w, rgb.reshape(n_rays, s - 1, 3))
        opacity = w.sum(-1, keepdims=True)
        depth = (w * t_mid).sum(-1, keepdims=True)
        return {"comp_rgb": comp_rgb, "opacity": opacity, "depth": depth,
                "rays_valid": opacity > 0}

    # ------------------------------------------------------------------ #
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
        """Per-cell occupancy alpha for the grid EMA update."""
        sdf = self.geometry.sdf(params["geometry"], x, step, levels=levels)
        inv_s = self.variance.inv_s(params["variance"], step)
        return occ_eval_alpha(sdf, inv_s, self.render_step_size)

    def open_levels(self, step: int):
        """Static open-level count of the geometry hash grid (None when
        not progressive) — for compile-time level specialization."""
        return self.geometry.open_levels(step) \
            if hasattr(self.geometry, "open_levels") else None

    # ------------------------------------------------------------------ #
    def prefilter_on(self, step: int, train: bool = True) -> bool:
        """The reference NeuS model marches without an ``alpha_fn``
        prefilter (``models/neus.py:232``) — off unless configured."""
        if not bool(self.config.get("visibility_prefilter", False)):
            return False
        return (step >= int(self.config.get("prefilter_start_step", 0))) \
            if train else True

    def bake_eval_sdf(self, params, step):
        """Per-checkpoint dense SDF bake (ops/sdf_bake.bake_for_model)."""
        from ..ops import sdf_bake as _sb

        return _sb.bake_for_model(self, params, step)

    def visibility_cut(self, params, rays_o, rays_d, occ_binary, step,
                       levels=None, cos_anneal_ratio=1.0,
                       band: bool = False):
        stride = int(self.config.get("prefilter_stride", 4))
        per_ray = int(self.config.get("prefilter_coarse_per_ray", 64))
        cap = rays_o.shape[0] * min(
            per_ray, max(self.num_samples_per_ray // stride, 1))
        if levels is None and int(self.config.get("prefilter_levels", 0)
                                  or 0):
            # probe-only SDF level cut (see split_mixed_occ.py)
            levels = int(self.config["prefilter_levels"])
        bake = params.get("_eval_bake") if isinstance(params, dict) else None
        if bake is not None and self.eval_sdf_bake != "off":
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
            stride=stride, cos_anneal_ratio=cos_anneal_ratio,
            early_stop_eps=volrend.EARLY_STOP_EPS,
            margin_intervals=float(
                self.config.get("prefilter_margin_intervals", 1.0)),
            band=band)

    def forward(self, params, rays, *, occ_binary, step, rng=None,
                train: bool = False, capacity: int, background_color,
                levels=None, prefilter: bool = False, banded: bool = False):
        """rays [R,6] -> per-ray render dict. ``train``/``capacity``/
        ``levels``/``prefilter``/``banded`` static."""
        n_rays = rays.shape[0]
        rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
        march_rng = None
        if rng is not None and self.randomized and train:
            rng, march_rng = jax.random.split(rng)

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
            band_k=(int(self.config.get("eval_banded_samples_per_ray", 0))
                    if (banded
                        and bool(self.config.get("eval_band_exact", True))
                        and int(self.config.get(
                            "eval_banded_samples_per_ray", 0)) > 0)
                    else None),
            cone_angle=float(self.config.get("cone_angle", 0.0)),
        )
        t_mid = 0.5 * (rs.t_starts + rs.t_ends)
        dists = rs.t_ends - rs.t_starts
        ridx = jnp.clip(rs.ray_indices, 0, n_rays - 1)
        positions = rays_o[ridx] + rays_d[ridx] * t_mid[:, None]
        t_dirs = rays_d[ridx]

        geo = self.geometry.forward(params["geometry"], positions, step,
                                    with_grad=True, with_feature=True,
                                    grad_mode=None if train else "analytic",
                                    levels=levels)
        sdf, sdf_grad, feature = geo["sdf"], geo["grad"], geo["feature"]
        normal = _normalize(sdf_grad)
        inv_s = self.variance.inv_s(params["variance"], step)
        true_cos = jnp.sum(t_dirs * normal, -1)
        alpha = neus_alpha(sdf, inv_s, true_cos,
                           dists, self.cos_anneal_ratio(step))
        rgb = self.texture.apply(params["texture"], feature, t_dirs, normal,
                                 step=step)

        weights, _ = volrend.render_weight_from_alpha(
            alpha, rs.ray_start, rs.ray_indices, rs.valid, n_rays)
        packed = jnp.concatenate(
            [rgb, normal, t_mid[:, None], jnp.ones_like(t_mid)[:, None]],
            axis=-1)
        acc = volrend.accumulate_along_rays(weights, rs.ray_indices, packed,
                                            n_rays)
        comp_rgb, comp_normal = acc[:, 0:3], acc[:, 3:6]
        depth, opacity = acc[:, 6:7], acc[:, 7:8]

        if self.learned_background:
            bg_out = self.forward_bg(params, rays_o, rays_d, step)
            bg = bg_out["comp_rgb"] + background_color[None, :] \
                * (1.0 - bg_out["opacity"])
        else:
            bg = jnp.broadcast_to(background_color[None, :], comp_rgb.shape)
        out = {
            "comp_rgb": comp_rgb,
            "comp_normal": _normalize(comp_normal),
            "opacity": opacity,
            "depth": depth,
            "rays_valid": opacity > 0,
            "num_samples": rs.num_live,
            "ray_included": rs.ray_included,
            "comp_rgb_full": comp_rgb + bg * (1.0 - opacity),
            "rays_valid_full": opacity > 0,
            "inv_s": inv_s,
        }
        if self.learned_background:
            out["comp_rgb_bg"] = bg
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
            })
        return out

    def forward_level(self, params, x, step=None):
        return self.geometry.forward_level(params["geometry"], x, step)
