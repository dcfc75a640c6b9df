"""Split-occ system: the full physically-based inverse-rendering pipeline.

Reference ``systems/split_occ.py`` re-designed: one jitted train step per
stage (radiance-only / +split-sum PBR); the emitter mip build runs inside
the loss so gradients flow to the base cubemap; evaluation computes the
full metric suite (PSNR/SSIM, median-ratio-aligned albedo & roughness,
per-light relighting) and exports mesh + materials.

Note (deliberate deviation, cf. SURVEY "quirks"): the reference rebuilds
emitter mips every step even in stage 0 where they are unused
(``systems/split_occ.py:151-152``); here the build is gated on stage.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import register
from .criterions import binary_cross_entropy, mean_angular_error, psnr, ssim
from .lpips import available as lpips_available, lpips
from .neus import NeuSSystem
from ..utils.color import linear_to_srgb_np
from ..utils.misc import pipeline_chunks


@register("split-occ-system")
class SplitOccSystem(NeuSSystem):
    def prepare(self):
        super().prepare()
        self.bg_srgb = True  # composite bg in sRGB (reference split_occ.py)
        self.relight_list = list(self.config["dataset"].get("relight_list", []))

    # ------------------------------------------------------------------ #
    def compute_losses(self, out, batch, step, stage: int = 0):
        cfg = self.config["system"]["loss"]
        loss, losses = super().compute_losses(out, batch, step)
        sel = out["rays_valid_full"][:, 0] & out["ray_included"]
        inc = out["ray_included"]
        sv = out["samples_valid"]

        if stage != 0:
            diff = out["comp_rgb_phys_full"] - batch["rgb"]
            losses["rgb_phys_mse"] = self.masked_mean(diff ** 2, sel)
            losses["rgb_phys_l1"] = self.masked_mean(jnp.abs(diff), sel)
            loss = loss \
                + losses["rgb_phys_mse"] * self.C(cfg["lambda_rgb_phys_mse"], step) \
                + losses["rgb_phys_l1"] * self.C(cfg["lambda_rgb_phys_l1"], step)
            lam_distill = cfg.get("lambda_emitter_distillation", 0.0)
            if not isinstance(lam_distill, (int, float)) or lam_distill > 0:
                d = out["comp_spec_rgb_full"] - out["comp_spec_rgb_phys_full"]
                losses["emitter_distillation"] = self.masked_mean(d ** 2, sel)
                loss = loss + losses["emitter_distillation"] \
                    * self.C(lam_distill, step)

        lam_curv = cfg.get("lambda_curvature", 0.0)
        if "sdf_laplace_samples" in out and (
                not isinstance(lam_curv, (int, float)) or lam_curv > 0):
            losses["curvature"] = self.masked_mean(
                jnp.abs(out["sdf_laplace_samples"]),
                out.get("sdf_laplace_valid", sv))
            loss = loss + losses["curvature"] * self.C(lam_curv, step)

        lam_no = cfg.get("lambda_normal_orientation", 0.0)
        if "normals_orientation_loss_map" in out:
            losses["normal_orientation"] = self.masked_mean(
                out["normals_orientation_loss_map"], inc)
            loss = loss + losses["normal_orientation"] * self.C(lam_no, step)
        return loss, losses

    # ------------------------------------------------------------------ #
    def forward_loss(self, params, batch, occ_binary, step, rng, stage,
                     capacity, levels=None, prefilter=False):
        stage = 0 if stage is None else stage
        model = self.model
        mips = model.emitter.build_mips(params["emitter"]) \
            if stage != 0 else None
        out = model.forward(
            params, batch["rays"], occ_binary=occ_binary, mips=mips,
            step=step, rng=rng, stage=stage, train=True, capacity=capacity,
            background_color=batch["bg"], levels=levels, prefilter=prefilter)
        loss, losses = self.compute_losses(out, batch, step, stage)
        aux = dict(losses)
        aux["inv_s"] = out["inv_s"]
        aux["num_samples"] = out["num_samples"]
        aux["num_rays"] = out["ray_included"].sum()
        return loss, aux

    def train_stage(self, step: int) -> int:
        return self.model.stage(step)

    def make_render_chunk(self, stage: int = 1, relighting: bool = False,
                          capacity=None, secondary_frac=None, vis_frac=None,
                          mesh=None, n_relights: int = 0):
        from ..parallel import data_shard_count

        # memoize compiled chunks on their static arguments: validate()
        # runs every val_check_interval and used to rebuild (and fully
        # recompile) the eval render each time — ~minutes per val at
        # production scale for an identical computation
        key = (stage, relighting, capacity, secondary_frac, vis_frac,
               id(mesh), n_relights)
        cache = getattr(self, "_render_chunk_cache", None)
        if cache is None:
            cache = self._render_chunk_cache = {}
        if key in cache:
            return cache[key]
        if n_relights:
            render_chunk = self._make_render_chunk_multi(
                stage, capacity, secondary_frac, vis_frac, mesh, n_relights)
            cache[key] = render_chunk
            return render_chunk

        model = self.model
        # sphere-traced fast eval: surface mode replaces marching +
        # volume rendering entirely (model.forward_surface).  An
        # explicit capacity keeps the volumetric path — that is the
        # escalation-fallback / calibration-probe contract, so rays the
        # trace cannot resolve (ray_included=False) re-render
        # volumetrically through the existing 2x/4x ladder.
        surface = (capacity is None
                   and getattr(model, "eval_mode", "volume")
                   == "sphere_trace"
                   and hasattr(model, "forward_surface"))
        if surface:

            def body_surface(params, occ_binary, rays, step, mips):
                out = model.forward_surface(
                    params, rays, occ_binary=occ_binary, mips=mips,
                    step=step, stage=stage, relighting=relighting,
                    secondary_frac=secondary_frac,
                    background_color=jnp.ones((3,)))
                keep = ["comp_rgb_full", "comp_normal", "opacity", "depth",
                        "comp_blend", "comp_diffuse_rgb", "comp_spec_rgb",
                        "ray_included"]
                if mesh is None:
                    keep += ["stat_secondary_live"]
                if stage != 0:
                    keep += ["comp_rgb_phys_full", "comp_albedo",
                             "comp_metallic", "comp_roughness",
                             "comp_spec_rgb_phys", "comp_diffuse_rgb_phys"]
                return {k: out[k] for k in keep if k in out}

            render_chunk = jax.jit(body_surface) if mesh is None \
                else self._shard_render(body_surface, mesh)
            render_chunk._stage = stage
            render_chunk._relighting = relighting
            render_chunk._sec_frac = secondary_frac
            render_chunk._vis_frac = vis_frac
            render_chunk._surface = True
            cache[key] = render_chunk
            return render_chunk

        pf = model.prefilter_on(0, train=False) \
            if hasattr(model, "prefilter_on") else False
        banded = bool(pf and self.eval_band_spr > 0)
        base_cap = capacity or (self.eval_band_capacity
                                if banded else self.eval_capacity)
        cap = max(base_cap // data_shard_count(mesh), 16)
        if banded:
            # the band IS the texture-stage visibility compaction —
            # a weight-threshold recut of the small banded buffer would
            # re-apply calibrate_eval fractions sized for the full one
            vis_frac = 1.0

        def body(params, occ_binary, rays, step, mips):
            out = model.forward(
                params, rays, occ_binary=occ_binary, mips=mips, step=step,
                rng=None, stage=stage, train=False, relighting=relighting,
                capacity=cap, secondary_frac=secondary_frac,
                vis_frac=vis_frac,
                background_color=jnp.ones((3,)), prefilter=pf,
                banded=banded)
            keep = ["comp_rgb_full", "comp_normal", "opacity", "depth",
                    "comp_blend", "comp_diffuse_rgb", "comp_spec_rgb",
                    "ray_included"]
            if mesh is None:
                # calibration statistics are rank-0 — they cannot ride
                # the P("data") out_specs of the sharded path, and
                # calibrate_eval only ever probes unsharded chunks
                keep += ["stat_live", "stat_vis", "stat_secondary_live"]
            if stage != 0:
                keep += ["comp_rgb_phys_full", "comp_albedo", "comp_metallic",
                         "comp_roughness", "comp_spec_rgb_phys",
                         "comp_diffuse_rgb_phys"]
            return {k: out[k] for k in keep if k in out}

        render_chunk = jax.jit(body) if mesh is None \
            else self._shard_render(body, mesh)
        render_chunk._stage = stage
        render_chunk._relighting = relighting
        render_chunk._sec_frac = secondary_frac
        render_chunk._vis_frac = vis_frac
        cache[key] = render_chunk
        return render_chunk

    def _make_render_chunk_multi(self, stage, capacity, secondary_frac,
                                 vis_frac, mesh, n_relights):
        """Multi-emitter render chunk: ONE geometry pass shaded under
        the training emitter + ``n_relights`` relight emitters
        (``model.forward_multi`` / ``forward_surface_multi``).  Returns
        a FLAT dict — the main (NVS/phys) channels under their usual
        names plus ``relight{j}/comp_rgb_phys_full`` — so the generic
        chunk loop, fallback ladder and row-merge machinery work
        unchanged.  The chunk takes ``1 + n_relights`` trailing mips
        arguments."""
        from ..parallel import data_shard_count

        model = self.model
        assert stage != 0, "relighting requires the split-sum stage"
        relight_flags = (False,) + (True,) * n_relights
        keep_main = ["comp_rgb_full", "comp_normal", "opacity", "depth",
                     "comp_blend", "comp_diffuse_rgb", "comp_spec_rgb",
                     "comp_rgb_phys_full", "comp_albedo", "comp_metallic",
                     "comp_roughness", "comp_spec_rgb_phys",
                     "comp_diffuse_rgb_phys"]

        def flatten(outs):
            res = {k: outs[0][k] for k in keep_main if k in outs[0]}
            res["ray_included"] = outs[0]["ray_included"]
            if mesh is None:
                for k in ("stat_live", "stat_vis", "stat_secondary_live"):
                    if k in outs[0]:
                        res[k] = outs[0][k]
            for j, o in enumerate(outs[1:]):
                res[f"relight{j}/comp_rgb_phys_full"] = \
                    o["comp_rgb_phys_full"]
            return res

        surface = (capacity is None
                   and getattr(model, "eval_mode", "volume")
                   == "sphere_trace"
                   and hasattr(model, "forward_surface_multi"))
        if surface:

            def body(params, occ_binary, rays, step, *mips_list):
                outs = model.forward_surface_multi(
                    params, rays, occ_binary=occ_binary,
                    mips_list=list(mips_list), step=step,
                    relight_flags=relight_flags, stage=stage,
                    secondary_frac=secondary_frac,
                    background_color=jnp.ones((3,)))
                return flatten(outs)
        else:
            pf = model.prefilter_on(0, train=False) \
                if hasattr(model, "prefilter_on") else False
            banded = bool(pf and self.eval_band_spr > 0)
            base_cap = capacity or (self.eval_band_capacity
                                    if banded else self.eval_capacity)
            cap = max(base_cap // data_shard_count(mesh), 16)
            vf = 1.0 if banded else vis_frac

            def body(params, occ_binary, rays, step, *mips_list):
                outs = model.forward_multi(
                    params, rays, occ_binary=occ_binary,
                    mips_list=list(mips_list), step=step,
                    relight_flags=relight_flags, stage=stage, capacity=cap,
                    secondary_frac=secondary_frac, vis_frac=vf,
                    background_color=jnp.ones((3,)), prefilter=pf,
                    banded=banded)
                return flatten(outs)

        render_chunk = jax.jit(body) if mesh is None \
            else self._shard_render(body, mesh)
        render_chunk._stage = stage
        render_chunk._relighting = False
        render_chunk._sec_frac = secondary_frac
        render_chunk._vis_frac = vis_frac
        render_chunk._n_relights = n_relights
        if surface:
            render_chunk._surface = True
        return render_chunk

    def render_image(self, state, split, index: int, render_chunk=None,
                     stage: int = 1, emitter_base=None):
        from ..utils.rays import get_rays

        if render_chunk is None:
            render_chunk = self.make_render_chunk(stage)
        if emitter_base is None:
            emitter_base = state["params"]["emitter"]["base"]
        # multi-emitter chunks take a list of bases: [train, relight...]
        bases = emitter_base if isinstance(emitter_base, (list, tuple)) \
            else [emitter_base]
        # build the light mips once per image, not once per chunk
        stage_used = getattr(render_chunk, "_stage", stage)
        if stage_used != 0:
            if not hasattr(self, "_jit_build_mips"):
                self._jit_build_mips = jax.jit(
                    lambda b: self.model.emitter.build_mips({"base": b}))
            mips = tuple(self._jit_build_mips(b) for b in bases)
        else:
            mips = (None,) * len(bases)
        dirs = jnp.asarray(np.asarray(split.directions))
        c2w = jnp.asarray(np.asarray(split.all_c2w[index]))
        rays_o, rays_d = get_rays(dirs, c2w)
        rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        rays = jnp.concatenate([rays_o, rays_d], -1)
        n = rays.shape[0]
        order, inv = self._eval_ray_order(n)
        if order is not None:
            rays = rays[jnp.asarray(order)]
        def dispatch(s):
            chunk = rays[s:s + self.eval_chunk]
            pad = self.eval_chunk - chunk.shape[0]
            if pad:
                # edge-pad: zero-direction pad rays overflow the buffer
                # and spuriously escalate the fallback (see neus.py)
                chunk = jnp.pad(chunk, ((0, pad), (0, 0)), mode="edge")
            return chunk, pad, render_chunk(
                state["params"], state["occ_binary"], chunk, state["step"],
                *mips)

        def consume(s, disp):
            chunk, pad, res = disp
            # fallback + pipeline memory interaction: see neus.py consume
            # (escalated 4x re-render runs while the next base-capacity
            # dispatch is queued; buffers must leave that headroom)
            if "ray_included" in res and not bool(res["ray_included"].all()):
                if getattr(render_chunk, "_surface", False):
                    # sphere-trace mode: unresolved rays are structural
                    # (grazing silhouettes), not rare overflow — re-render
                    # ONLY those rays volumetrically and merge row-wise
                    res = self._render_surface_residual(
                        render_chunk, res, chunk, state, mips)
                else:
                    res = self._escalate_fallback(
                        render_chunk,
                        lambda fn: fn(state["params"], state["occ_binary"],
                                      chunk, state["step"], *mips))
                self._warn_dropped_rays(res, s)
            return {k: np.asarray(v)[:self.eval_chunk - pad]
                    for k, v in res.items()
                    if not k.startswith("stat_")}

        outs = pipeline_chunks(range(0, n, self.eval_chunk), dispatch,
                               consume, depth=self.eval_pipeline_depth)
        img = {k: np.concatenate([o[k] for o in outs], 0) for k in outs[0]}
        if inv is not None:
            img = {k: v[inv] for k, v in img.items()}
        return img

    def _render_surface_residual(self, render_chunk, res, chunk, state,
                                 mips):
        """Volumetric re-render of ONLY the rays the sphere trace could
        not resolve, merged row-wise into the surface result.

        Unresolved rays are structural in surface mode (near-tangent
        silhouette rays, occupancy-flagged tunnel suspects) — unlike the
        rare buffer-overflow case the 2x/4x whole-chunk ladder was built
        for.  They are compacted into fixed-width residual chunks
        (``eval_chunk/8`` rays at a 2x per-ray budget), so one grazing
        ray costs ~1/8 of a volumetric chunk instead of a full 2x
        re-render of all rays."""
        inc = np.asarray(res["ray_included"])
        idx = np.nonzero(~inc)[0]
        width = max(self.eval_chunk // 8, 16)
        per_ray = max(self.eval_capacity * 2 // self.eval_chunk, 8)
        # normalize: callers pass a tuple of 1 + n_relights mips args;
        # a bare mips pytree (itself tuple-shaped) means one light
        n_args = getattr(render_chunk, "_n_relights", 0) + 1
        if not (isinstance(mips, tuple) and len(mips) == n_args):
            mips = (mips,)
        vol = self.make_render_chunk(
            getattr(render_chunk, "_stage", 1),
            getattr(render_chunk, "_relighting", False),
            capacity=per_ray * width,
            secondary_frac=getattr(render_chunk, "_sec_frac", None),
            vis_frac=getattr(render_chunk, "_vis_frac", None),
            n_relights=getattr(render_chunk, "_n_relights", 0))
        out = {k: (v if k.startswith("stat_") else np.asarray(v).copy())
               for k, v in res.items()}
        inc_new = inc.copy()
        chunk_np = np.asarray(chunk)
        for s0 in range(0, len(idx), width):
            sel = idx[s0:s0 + width]
            sub = chunk_np[sel]
            padn = width - len(sel)
            if padn:
                sub = np.concatenate([sub, np.repeat(sub[-1:], padn, 0)])
            r = vol(state["params"], state["occ_binary"], jnp.asarray(sub),
                    state["step"], *mips)
            for k in out:
                if k.startswith("stat_") or k == "ray_included":
                    continue
                if k in r:
                    out[k][sel] = np.asarray(r[k])[:len(sel)]
            inc_new[sel] = np.asarray(r["ray_included"])[:len(sel)]
        out["ray_included"] = inc_new
        return out

    def _make_fallback_chunk(self, render_chunk, mult: int = 2):
        base_frac = getattr(render_chunk, "_sec_frac", None)
        if base_frac is None:
            base_frac = self.model.secondary_sample_capacity_frac
        return self.make_render_chunk(
            getattr(render_chunk, "_stage", 1),
            getattr(render_chunk, "_relighting", False),
            capacity=self.eval_capacity * mult,
            secondary_frac=min(base_frac * mult, 1.0),
            vis_frac=getattr(render_chunk, "_vis_frac", None),
            n_relights=getattr(render_chunk, "_n_relights", 0))

    # ------------------------------------------------------------------ #
    def _save_envmap(self, state):
        img = np.asarray(self.model.emitter.generate_image(
            state["params"]["emitter"]))
        step = int(state["step"])
        self.saver.save_image_grid(f"it{step}-envmap.exr", [
            {"type": "hdr", "img": img, "kwargs": {"data_format": "HWC"}}])

    def validate(self, state, n_images: Optional[int] = None):
        state = self._with_eval_bake(state)
        split = self.datamodule.val()
        stage = self.model.stage(int(state["step"]))
        render_chunk = self.make_render_chunk(stage, mesh=self.mesh)
        self._save_envmap(state)
        n = len(split) if n_images is None else min(n_images, len(split))
        psnrs, phys_psnrs = [], []
        step = int(state["step"])
        for i in range(n):
            out = self.render_image(state, split, i, render_chunk, stage)
            h, w = split.h, split.w
            gt = np.asarray(split.all_images[i]).reshape(-1, 3)
            mask = np.asarray(split.all_fg_masks[i]).reshape(-1, 1)
            gt = gt * mask + linear_to_srgb_np(np.ones(3))[None] * (1 - mask)
            psnrs.append(float(psnr(jnp.asarray(out["comp_rgb_full"]),
                                    jnp.asarray(gt))))
            grid = [
                {"type": "rgb", "img": gt.reshape(h, w, 3),
                 "kwargs": {"data_format": "HWC"}},
                {"type": "rgb", "img": out["comp_rgb_full"].reshape(h, w, 3),
                 "kwargs": {"data_format": "HWC"}},
                {"type": "grayscale", "img": out["comp_blend"].reshape(h, w),
                 "kwargs": {"data_range": None, "cmap": None}},
                {"type": "rgb", "img": out["comp_spec_rgb"].reshape(h, w, 3),
                 "kwargs": {"data_format": "HWC"}},
                {"type": "rgb",
                 "img": out["comp_diffuse_rgb"].reshape(h, w, 3),
                 "kwargs": {"data_format": "HWC"}},
                {"type": "grayscale", "img": out["depth"].reshape(h, w),
                 "kwargs": {}},
                {"type": "rgb", "img": out["comp_normal"].reshape(h, w, 3),
                 "kwargs": {"data_format": "HWC", "data_range": (-1, 1)}},
            ]
            self.saver.save_image_grid(f"it{step}-{i}.png", grid)
            if stage != 0:
                phys_psnrs.append(float(psnr(
                    jnp.asarray(out["comp_rgb_phys_full"]), jnp.asarray(gt))))
                self.saver.save_image_grid(f"it{step}-{i}-pbr.png", [
                    {"type": "rgb", "img": gt.reshape(h, w, 3),
                     "kwargs": {"data_format": "HWC"}},
                    {"type": "rgb",
                     "img": out["comp_rgb_phys_full"].reshape(h, w, 3),
                     "kwargs": {"data_format": "HWC"}},
                    {"type": "rgb", "img": out["comp_albedo"].reshape(h, w, 3),
                     "kwargs": {"data_format": "HWC"}},
                    {"type": "grayscale",
                     "img": out["comp_metallic"].reshape(h, w),
                     "kwargs": {"data_range": None, "cmap": None}},
                    {"type": "grayscale",
                     "img": out["comp_roughness"].reshape(h, w),
                     "kwargs": {"data_range": None, "cmap": None}},
                ])
        res = {"psnr": float(np.mean(psnrs))}
        if phys_psnrs:
            res["phys_psnr"] = float(np.mean(phys_psnrs))
        print(f"val: {res}", flush=True)
        return res

    # ------------------------------------------------------------------ #
    @staticmethod
    def _median_align(pred, gt, mask):
        """Per-channel median-ratio alignment (reference
        systems/split_occ.py:371-400)."""
        m = mask.astype(bool).reshape(-1)
        if m.sum() == 0:
            return pred
        ratio = np.median(gt.reshape(-1, gt.shape[-1])[m]
                          / np.clip(pred.reshape(-1, pred.shape[-1])[m],
                                    1e-6, None), axis=0)
        out = pred.copy().reshape(-1, pred.shape[-1])
        out[m] = np.clip(ratio * out[m], 0.0, 1.0)
        return out.reshape(pred.shape)

    def calibrate_eval(self, state, split, n_chunks: int = 2):
        """Derive the eval compaction fractions from measured statistics
        instead of hand-tuned constants.

        Renders a few central chunks of view 0 with generous budgets
        (2x capacity, no compaction) and reads the per-chunk maxima of
        live secondary samples and weight>1e-5 texture-stage samples;
        capacities are sized at 1.25x the observed maxima, snapped up to
        1/16 granularity (compile stability).  The per-chunk 2x overflow
        fallback still guards the tail.  The dynamic-shape analog in the
        reference is its adaptive ray count (systems/split_occ.py:159);
        on TPU the shapes are static, so we *choose* them from one
        measurement instead of tuning them by hand.
        """
        from ..utils.rays import get_rays

        stage = self.model.stage(int(state["step"]))
        probe = self.make_render_chunk(
            stage, capacity=self.eval_capacity * 2,
            secondary_frac=1.0, vis_frac=1.0)
        mips = None
        if stage != 0:
            if not hasattr(self, "_jit_build_mips"):
                self._jit_build_mips = jax.jit(
                    lambda b: self.model.emitter.build_mips({"base": b}))
            mips = self._jit_build_mips(state["params"]["emitter"]["base"])
        dirs = jnp.asarray(np.asarray(split.directions))
        c2w = jnp.asarray(np.asarray(split.all_c2w[0]))
        rays_o, rays_d = get_rays(dirs, c2w)
        rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        rays = jnp.concatenate([rays_o, rays_d], -1)
        # calibration must probe the same chunk composition eval will
        # render: under eval_ray_interleave every chunk's load sits at
        # the image mean (vs the central-row worst case), so the
        # calibrated fractions tighten to mean * 1.25 instead of
        # central-max * 1.25
        order, _ = self._eval_ray_order(rays.shape[0])
        if order is not None:
            rays = rays[jnp.asarray(order)]
        mid = rays.shape[0] // 2  # central rows see the object densest
        vis_max = sec_max = 0
        for k in range(n_chunks):
            s = mid - (k + 1) * self.eval_chunk // 2 * (1 if k % 2 else -1)
            s = int(np.clip(s, 0, max(rays.shape[0] - self.eval_chunk, 0)))
            res = probe(state["params"], state["occ_binary"],
                        rays[s:s + self.eval_chunk], state["step"], mips)
            vis_max = max(vis_max, int(res.get("stat_vis", 0)))
            sec_max = max(sec_max, int(res.get("stat_secondary_live", 0)))

        def snap(frac):
            return min(np.ceil(frac * 16.0) / 16.0, 1.0)

        vis_frac = snap(1.25 * vis_max / max(self.eval_capacity, 1))
        s2 = self.eval_chunk * self.model.num_samples_per_secondary_ray
        sec_frac = snap(1.25 * sec_max / max(s2, 1))
        print(f"calibrated eval compaction: vis_frac={vis_frac:.3f} "
              f"(max {vis_max} vis samples), secondary_frac={sec_frac:.3f} "
              f"(max {sec_max} live)", flush=True)
        return {"vis_frac": float(max(vis_frac, 1.0 / 16.0)),
                "secondary_frac": float(max(sec_frac, 1.0 / 16.0))}

    def test(self, state, export: bool = True):
        state = self._with_eval_bake(state)
        split = self.datamodule.test()
        stage = self.model.stage(int(state["step"]))
        fr = {}
        if self.config["model"].get("derive_compaction", False):
            cal = self.calibrate_eval(state, split)
            fr = {"secondary_frac": cal["secondary_frac"],
                  "vis_frac": cal["vis_frac"]}
        # multi-emitter eval: NVS/phys + every relight from ONE geometry
        # pass per chunk (model.forward_multi) — per extra light only the
        # mip lookups + accumulation re-run.  The reference re-renders
        # the full pipeline per light (systems/split_occ.py:402-430);
        # results are identical by construction (emitter-independent
        # geometry).  Opt out with system.multi_emitter_eval: false.
        multi = (stage != 0 and bool(self.relight_list)
                 and hasattr(self.model, "forward_multi")
                 and getattr(self.model.texture, "supports_multi_emitter",
                             False)
                 and bool(self.config["system"].get("multi_emitter_eval",
                                                    True)))
        if multi:
            render_chunk = self.make_render_chunk(
                stage, mesh=self.mesh, n_relights=len(self.relight_list),
                **fr)
            relight_chunk = None
        else:
            render_chunk = self.make_render_chunk(stage, mesh=self.mesh,
                                                  **fr)
            relight_chunk = self.make_render_chunk(
                stage, relighting=True, mesh=self.mesh, **fr) \
                if self.relight_list else None
        self._save_envmap(state)
        step = int(state["step"])
        has_albedo = hasattr(split, "all_albedo") and \
            self.config["dataset"].get("has_albedo", False)
        has_rough = hasattr(split, "all_roughness") and \
            self.config["dataset"].get("has_roughness", False)
        has_normal = hasattr(split, "all_normals")
        use_lpips = lpips_available()
        agg = {k: [] for k in
               ["psnr", "phys_psnr", "phys_ssim", "phys_lpips",
                "albedo_psnr", "albedo_ssim", "albedo_lpips",
                "roughness_psnr", "normal_mae"]}
        relight_agg = {l: {"psnr": [], "ssim": [], "lpips": []}
                       for l in self.relight_list}

        relight_bases = {}
        for light in self.relight_list:
            hdr_dir = self.config["dataset"]["hdr_filepath"]
            ext = "hdr" if self.config["dataset"]["name"] == "tensoir" else "exr"
            p = os.path.join(hdr_dir, f"{light}.{ext}")
            relight_bases[light] = self.model.emitter.relight_params(p)["base"]

        import time as _time
        t_protocol0 = _time.time()
        for i in range(len(split)):
            # per-view heartbeat: the full protocol renders each view
            # several times (nvs/phys + one pass per relight env), which
            # is minutes/view at 800^2 — external watchdogs need liveness
            print(f"test view {i + 1}/{len(split)}", flush=True)
            if multi:
                bases = [state["params"]["emitter"]["base"]] + \
                    [relight_bases[l] for l in self.relight_list]
                out = self.render_image(state, split, i, render_chunk,
                                        stage, emitter_base=bases)
            else:
                out = self.render_image(state, split, i, render_chunk, stage)
            h, w = split.h, split.w
            gt = np.asarray(split.all_images[i]).reshape(-1, 3)
            mask = np.asarray(split.all_fg_masks[i]).reshape(-1, 1)
            gt = gt * mask + linear_to_srgb_np(np.ones(3))[None] * (1 - mask)
            agg["psnr"].append(float(psnr(jnp.asarray(out["comp_rgb_full"]),
                                          jnp.asarray(gt))))
            grid = [
                {"type": "rgb", "img": gt.reshape(h, w, 3),
                 "kwargs": {"data_format": "HWC"}},
                {"type": "rgb", "img": out["comp_rgb_full"].reshape(h, w, 3),
                 "kwargs": {"data_format": "HWC"}},
                {"type": "grayscale", "img": out["comp_blend"].reshape(h, w),
                 "kwargs": {"data_range": None, "cmap": None}},
                {"type": "rgb", "img": out["comp_spec_rgb"].reshape(h, w, 3),
                 "kwargs": {"data_format": "HWC"}},
                {"type": "rgb",
                 "img": out["comp_diffuse_rgb"].reshape(h, w, 3),
                 "kwargs": {"data_format": "HWC"}},
                {"type": "grayscale", "img": out["depth"].reshape(h, w),
                 "kwargs": {}},
                {"type": "rgb", "img": out["comp_normal"].reshape(h, w, 3),
                 "kwargs": {"data_format": "HWC", "data_range": (-1, 1)}},
            ]
            self.saver.save_image_grid(f"it{step}-test/{i}.png", grid)

            if stage != 0:
                pred_phys = out["comp_rgb_phys_full"]
                agg["phys_psnr"].append(float(psnr(jnp.asarray(pred_phys),
                                                   jnp.asarray(gt))))
                agg["phys_ssim"].append(float(ssim(
                    jnp.asarray(pred_phys.reshape(h, w, 3)),
                    jnp.asarray(gt.reshape(h, w, 3)))))
                if use_lpips:
                    agg["phys_lpips"].append(lpips(
                        pred_phys.reshape(h, w, 3), gt.reshape(h, w, 3)))
                self.saver.save_image_grid(f"it{step}-test/{i}-pbr.png", [
                    {"type": "rgb", "img": gt.reshape(h, w, 3),
                     "kwargs": {"data_format": "HWC"}},
                    {"type": "rgb", "img": pred_phys.reshape(h, w, 3),
                     "kwargs": {"data_format": "HWC"}},
                    {"type": "rgb", "img": out["comp_albedo"].reshape(h, w, 3),
                     "kwargs": {"data_format": "HWC"}},
                    {"type": "grayscale",
                     "img": out["comp_metallic"].reshape(h, w),
                     "kwargs": {"data_range": None, "cmap": None}},
                    {"type": "grayscale",
                     "img": out["comp_roughness"].reshape(h, w),
                     "kwargs": {"data_range": None, "cmap": None}},
                    {"type": "rgb",
                     "img": out["comp_spec_rgb_phys"].reshape(h, w, 3),
                     "kwargs": {"data_format": "HWC"}},
                    {"type": "rgb",
                     "img": out["comp_diffuse_rgb_phys"].reshape(h, w, 3),
                     "kwargs": {"data_format": "HWC"}},
                ])

                if has_albedo:
                    gt_alb = np.asarray(split.all_albedo[i]).reshape(-1, 3)
                    alb = self._median_align(out["comp_albedo"], gt_alb, mask)
                    agg["albedo_psnr"].append(float(psnr(jnp.asarray(alb),
                                                         jnp.asarray(gt_alb))))
                    agg["albedo_ssim"].append(float(ssim(
                        jnp.asarray(alb.reshape(h, w, 3)),
                        jnp.asarray(gt_alb.reshape(h, w, 3)))))
                    if use_lpips:
                        agg["albedo_lpips"].append(lpips(
                            alb.reshape(h, w, 3), gt_alb.reshape(h, w, 3)))
                    self.saver.save_image_grid(
                        f"it{step}-test/{i}-albedo.png", [
                            {"type": "rgb", "img": gt_alb.reshape(h, w, 3),
                             "kwargs": {"data_format": "HWC"}},
                            {"type": "rgb", "img": alb.reshape(h, w, 3),
                             "kwargs": {"data_format": "HWC"}}])
                if has_rough:
                    gt_r = np.asarray(split.all_roughness[i]).reshape(-1, 1)
                    r = self._median_align(out["comp_roughness"], gt_r, mask)
                    agg["roughness_psnr"].append(float(psnr(jnp.asarray(r),
                                                            jnp.asarray(gt_r))))
                if has_normal:
                    # degrees, foreground-masked — the reference registers
                    # this criterion (systems/split_occ.py:49 -> MAE at
                    # criterions.py:161-181) but never evaluates it; we do
                    gt_n = np.asarray(split.all_normals[i]).reshape(-1, 3)
                    agg["normal_mae"].append(float(mean_angular_error(
                        jnp.asarray(out["comp_normal"].reshape(-1, 3)),
                        jnp.asarray(gt_n), mask=jnp.asarray(mask),
                        degrees=True)))

                for j, light in enumerate(self.relight_list):
                    if multi:
                        rout = {"comp_rgb_phys_full":
                                out[f"relight{j}/comp_rgb_phys_full"]}
                    else:
                        rout = self.render_image(
                            state, split, i, relight_chunk, stage,
                            emitter_base=relight_bases[light])
                    gt_rel = np.asarray(
                        split.relight_images[light][i]).reshape(-1, 3)
                    gt_rel = gt_rel * mask + \
                        linear_to_srgb_np(np.ones(3))[None] * (1 - mask)
                    pred = self._median_align(rout["comp_rgb_phys_full"],
                                              gt_rel, mask)
                    relight_agg[light]["psnr"].append(
                        float(psnr(jnp.asarray(pred), jnp.asarray(gt_rel))))
                    relight_agg[light]["ssim"].append(float(ssim(
                        jnp.asarray(pred.reshape(h, w, 3)),
                        jnp.asarray(gt_rel.reshape(h, w, 3)))))
                    if use_lpips:
                        relight_agg[light]["lpips"].append(lpips(
                            pred.reshape(h, w, 3), gt_rel.reshape(h, w, 3)))
                    self.saver.save_image_grid(
                        f"it{step}-test/{i}-relight-{light}.png", [
                            {"type": "rgb", "img": gt_rel.reshape(h, w, 3),
                             "kwargs": {"data_format": "HWC"}},
                            {"type": "rgb",
                             "img": rout["comp_rgb_phys_full"].reshape(h, w, 3),
                             "kwargs": {"data_format": "HWC"}}])

        res = {k: float(np.mean(v)) for k, v in agg.items() if v}
        for light, d in relight_agg.items():
            for k, v in d.items():
                if v:
                    res[f"relight_{k}_{light}"] = float(np.mean(v))
        dt_protocol = _time.time() - t_protocol0
        n_renders = len(split) * (1 if multi
                                  else 1 + len(self.relight_list))
        mode = "multi-emitter geometry passes" if multi else "full renders"
        print(f"test protocol wall time: {dt_protocol:.1f}s for "
              f"{len(split)} views ({dt_protocol / max(len(split), 1):.1f} "
              f"s/view, {n_renders} {mode} incl. metrics/IO)",
              flush=True)
        print(f"test: {res}", flush=True)
        self.saver.save_img_sequence(f"it{step}-test", f"it{step}-test",
                                     r"(\d+)\.png")
        if stage != 0:
            self.saver.save_img_sequence(f"it{step}-test-pbr",
                                         f"it{step}-test", r"(\d+)\-pbr.png")
        if export:
            self.export(state)
        return res

    # ------------------------------------------------------------------ #
    def export(self, state):
        from ..export import export_mesh

        step = int(state["step"])
        mesh = export_mesh(self.model, state, self.config)
        if mesh is None:
            return None
        iso = self.config["model"]["geometry"]["isosurface"]
        self.saver.save_mesh(
            f"it{step}-{iso['method']}{iso['resolution']}.ply",
            mesh["v_pos"], mesh["t_pos_idx"], mesh.get("v_rgb"))
        if "albedo" in mesh:
            self.saver.save_npy("albedo.npy",
                                linear_to_srgb_np(mesh["albedo"]))
            self.saver.save_npy("metallic.npy",
                                linear_to_srgb_np(mesh["metallic"]))
            self.saver.save_npy("roughness.npy",
                                linear_to_srgb_np(mesh["roughness"]))
        return mesh

    def predict(self, state, hdr_filepath: str):
        """Relighting render for every test view under a given HDR map
        (reference --predict, launch.py:111-118)."""
        state = self._with_eval_bake(state)
        split = self.datamodule.test()
        stage = 1
        chunk = self.make_render_chunk(stage, relighting=True)
        base = self.model.emitter.relight_params(hdr_filepath)["base"]
        step = int(state["step"])
        name = os.path.splitext(os.path.basename(hdr_filepath))[0]
        for i in range(len(split)):
            out = self.render_image(state, split, i, chunk, stage,
                                    emitter_base=base)
            h, w = split.h, split.w
            self.saver.save_image_grid(
                f"it{step}-predict-{name}/{i}.png", [
                    {"type": "rgb",
                     "img": out["comp_rgb_phys_full"].reshape(h, w, 3),
                     "kwargs": {"data_format": "HWC"}}])
        self.saver.save_img_sequence(f"it{step}-predict-{name}",
                                     f"it{step}-predict-{name}", r"(\d+)\.png")
