"""NeuS system: geometry-only training/eval pipeline.

Reference ``systems/neus.py`` re-designed as one jitted train step:
on-device ray sampling -> padded march -> field eval -> losses -> grads
-> optax update.  The occupancy-grid EMA sweep runs as a second jitted
function every 16 steps (reference ``update_every_n_steps``).
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import register
from .base import BaseSystem
from .criterions import binary_cross_entropy, psnr
from .optim import make_optimizer
from ..ops import grid as occ_grid
from ..ops.volrend import distortion_loss
from ..utils.misc import pipeline_chunks
from ..utils.rays import get_rays


@register("neus-system")
class NeuSSystem(BaseSystem):
    def prepare(self):
        mc = self.config["model"]
        self.train_num_rays = int(mc.get("max_train_num_rays",
                                         mc.get("train_num_rays", 4096)))
        target_rays = int(mc.get("train_num_rays", 256))
        default_cap = min(
            self.train_num_rays * int(mc["num_samples_per_ray"]), 1 << 20)
        if mc.get("dynamic_ray_sampling", False):
            default_cap = target_rays * int(mc["num_samples_per_ray"])
        self.capacity = int(mc.get("train_sample_capacity", default_cap))
        # once the visibility prefilter is active the budget holds only
        # visible samples (~20-40/ray at convergence vs ~190 live), so a
        # smaller buffer keeps full ray coverage while cutting the
        # FD-probe volume proportionally
        self.capacity_prefiltered = int(
            mc.get("train_sample_capacity_prefiltered", self.capacity))
        self.eval_chunk = int(mc.get("ray_chunk", 4096))
        self.eval_capacity = self.eval_chunk * int(
            mc.get("eval_samples_per_ray", 128))
        # banded surface eval: with the visibility prefilter's coarse
        # probe returning the weight-mass band [t_lo, t_cut), eval can
        # march with this many samples/ray instead of
        # eval_samples_per_ray (0 = off); the 2x/4x overflow ladder
        # still guards band misestimates
        self.eval_band_spr = int(mc.get("eval_banded_samples_per_ray", 0))
        # exact-K banding bounds *banded* rays at K rows, but rays whose
        # coarse probe never saturates (background/silhouette) keep full
        # candidate sets; this reserve restores per-chunk slack for them
        # without paying K*rays at a larger K (band8+reserve still
        # undercuts band16's buffer while holding more unbanded slack)
        self.eval_band_reserve = int(mc.get("eval_band_reserve", 0))
        self.eval_band_capacity = (self.eval_chunk * self.eval_band_spr
                                   + self.eval_band_reserve)
        # interleaved eval chunking ("golden"/"strided"/off): spreads the
        # spatially-clustered silhouette sample load evenly over chunks so
        # smaller static buffers stay drop-free and the 2x/4x fallback
        # ladder is starved of overflow chunks; the rendered image is
        # unchanged (see utils.misc.interleave_order)
        self.eval_ray_interleave = mc.get("eval_ray_interleave", False)
        # dispatches kept in flight per eval loop (utils.misc.
        # pipeline_chunks): 2 overlaps the ~30 ms/chunk host RTT with
        # device compute; 1 = classic dispatch-then-read
        self.eval_pipeline_depth = int(mc.get("eval_pipeline_depth", 1))
        self.grid_prune = bool(mc.get("grid_prune", True))
        self.background_color_mode = mc.get("background_color", "random")
        self.bg_srgb = False  # split system composites bg in sRGB space
        self.tx = None

    # ------------------------------------------------------------------ #
    def init_state(self, seed: int = 42) -> Dict:
        rng = jax.random.PRNGKey(seed)
        params = self.model.init(rng)
        self.tx = make_optimizer(self.config["system"], params)
        g = occ_grid.init_grid(self.model.grid_resolution)
        return {
            "params": params,
            "opt_state": self.tx.init(params),
            "occs": g.occs,
            "occ_binary": g.binary,
            "step": jnp.asarray(0, jnp.int32),
        }

    def device_data(self, split) -> Dict[str, jnp.ndarray]:
        return {
            "images": jnp.asarray(split.all_images),
            "masks": jnp.asarray(split.all_fg_masks),
            "c2w": jnp.asarray(split.all_c2w),
            "directions": jnp.asarray(split.directions),
        }

    # ------------------------------------------------------------------ #
    def sample_batch(self, rng, data, bg_srgb: Optional[bool] = None,
                     num_rays: Optional[int] = None):
        """On-device random (image, pixel) ray batch (reference
        systems/neus.py:34-86)."""
        if bg_srgb is None:
            bg_srgb = self.bg_srgb
        n_img, h, w = data["images"].shape[:3]
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        r = num_rays or self.train_num_rays
        idx = jax.random.randint(k1, (r,), 0, n_img)
        x = jax.random.randint(k2, (r,), 0, w)
        y = jax.random.randint(k3, (r,), 0, h)
        dirs = data["directions"][y, x]
        rays_o, rays_d = get_rays(dirs, data["c2w"][idx])
        rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        rgb = data["images"][idx, y, x]
        mask = data["masks"][idx, y, x]
        if self.background_color_mode == "white":
            bg = jnp.ones((3,))
        elif self.background_color_mode == "black":
            bg = jnp.zeros((3,))
        else:
            bg = jax.random.uniform(k4, (3,))
        if bg_srgb:
            from ..utils.color import rgb_to_srgb

            rgb = rgb * mask[:, None] + rgb_to_srgb(bg)[None, :] \
                * (1 - mask[:, None])
        else:
            rgb = rgb * mask[:, None] + bg[None, :] * (1 - mask[:, None])
        return {"rays": jnp.concatenate([rays_o, rays_d], -1), "rgb": rgb,
                "mask": mask, "bg": bg}

    # ------------------------------------------------------------------ #
    def compute_losses(self, out, batch, step):
        cfg = self.config["system"]["loss"]
        sel = out["rays_valid_full"][:, 0] & out["ray_included"]
        inc = out["ray_included"]
        sv = out["samples_valid"]

        losses = {}
        diff = out["comp_rgb_full"] - batch["rgb"]
        losses["rgb_mse"] = self.masked_mean(diff ** 2, sel)
        losses["rgb_l1"] = self.masked_mean(jnp.abs(diff), sel)
        # safe norm: garbage (padded / clipped-outside-AABB) slots can have
        # an exactly-zero gradient; sqrt'(0) = inf leaks NaN through the
        # masked mean (0 * inf), so keep the argument strictly positive
        grad_norm = jnp.sqrt(
            jnp.sum(out["sdf_grad_samples"] ** 2, axis=-1) + 1e-12)
        losses["eikonal"] = self.masked_mean((grad_norm - 1.0) ** 2, sv)
        opacity = jnp.clip(out["opacity"][:, 0], 1e-3, 1 - 1e-3)
        m = jnp.where(inc, 1.0, 0.0)
        losses["mask"] = -jnp.sum(
            (batch["mask"] * jnp.log(opacity)
             + (1 - batch["mask"]) * jnp.log(1 - opacity)) * m) \
            / jnp.maximum(m.sum(), 1.0)
        losses["opaque"] = -jnp.sum(
            (opacity * jnp.log(opacity)
             + (1 - opacity) * jnp.log(1 - opacity)) * m) \
            / jnp.maximum(m.sum(), 1.0)
        losses["sparsity"] = self.masked_mean(
            jnp.exp(-float(cfg.get("sparsity_scale", 1.0))
                    * jnp.abs(out["sdf_samples"])), sv)

        loss = (losses["rgb_mse"] * self.C(cfg["lambda_rgb_mse"], step)
                + losses["rgb_l1"] * self.C(cfg["lambda_rgb_l1"], step)
                + losses["eikonal"] * self.C(cfg["lambda_eikonal"], step)
                + losses["mask"] * self.C(cfg["lambda_mask"], step)
                + losses["opaque"] * self.C(cfg["lambda_opaque"], step)
                + losses["sparsity"] * self.C(cfg["lambda_sparsity"], step))
        lam_dist = cfg.get("lambda_distortion", 0.0)
        if isinstance(lam_dist, (list, tuple)) or lam_dist > 0:
            ld = distortion_loss(
                out["weights"], out["points"], out["intervals"],
                out["ray_indices"], out["ray_start"], out["samples_valid"],
                batch["rgb"].shape[0]) / jnp.maximum(m.sum(), 1.0)
            losses["distortion"] = ld
            loss = loss + ld * self.C(lam_dist, step)
        return loss, losses

    # ------------------------------------------------------------------ #
    def forward_loss(self, params, batch, occ_binary, step, rng, stage,
                     capacity, levels=None, prefilter=False):
        """Model forward + loss assembly; the one train-step body shared by
        the single-device and sharded paths.  ``stage`` is ignored here
        (geometry-only); the split system overrides this."""
        out = self.model.forward(
            params, batch["rays"], occ_binary=occ_binary, step=step, rng=rng,
            train=True, capacity=capacity, background_color=batch["bg"],
            levels=levels, prefilter=prefilter)
        loss, losses = self.compute_losses(out, batch, step)
        aux = dict(losses)
        aux["inv_s"] = out["inv_s"]
        aux["num_samples"] = out["num_samples"]
        aux["num_rays"] = out["ray_included"].sum()
        return loss, aux

    def train_stage(self, step: int):
        """Static stage flag for step (None = unstaged); split overrides."""
        return None

    def train_prefilter(self, step: int) -> bool:
        """Static visibility-prefilter flag for step (one recompile when
        it kicks in, like the stage flip)."""
        return self.model.prefilter_on(step, train=True) \
            if hasattr(self.model, "prefilter_on") else False

    def make_train_step(self, stage=None, mesh=None, levels=None,
                        prefilter=False):
        """One jitted train step.

        With ``mesh`` (a 1-D ``data`` mesh), the ray batch is sharded over
        devices via ``shard_map`` — each device samples/marches its own
        rays with a per-device sample budget and gradients are ``pmean``-ed
        over ICI (DDP semantics, reference ``launch.py:84-97``).  The loss
        body is identical in both modes.  Sharded signature:
        ``f(state, rngs[D], data)``; single-device: ``f(state, rng, data)``.

        ``levels``: static open-hash-level count — closed levels are
        compiled away (one recompile per opened band, ~11 per run).
        """
        from ..parallel import (data_shard_count, table_shard_count,
                                table_sharding, table_specs)

        tx = self.tx
        # rays/sample budgets split over 'data' only: with table
        # sharding (a 2-D mesh), each 'model'-group device processes the
        # same rays against its table-row shard (embedding-style tensor
        # parallelism; one psum per encode reassembles features)
        dp = data_shard_count(mesh)
        tp = table_shard_count(mesh)
        num_rays = max(self.train_num_rays // dp, 1)
        base_cap = self.capacity_prefiltered if prefilter else self.capacity
        capacity = max(base_cap // dp, 16)
        axis = "data" if mesh is not None else None
        all_axes = ("data", "model") if tp > 1 else ("data",)

        def step_body(params, opt_state, occ_binary, step, rng, data):
            k_batch, k_model = jax.random.split(rng)
            batch = self.sample_batch(k_batch, data, num_rays=num_rays)

            def loss_fn(p):
                return self.forward_loss(p, batch, occ_binary, step, k_model,
                                         stage, capacity, levels=levels,
                                         prefilter=prefilter)

            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            if axis:
                grads = jax.lax.pmean(grads, axis)
                aux = jax.tree_util.tree_map(
                    lambda x: jax.lax.pmean(jnp.asarray(x, jnp.float32), axis),
                    aux)
                loss = jax.lax.pmean(loss, axis)
            aux["loss"] = loss
            # finite-grads guard: a poisoned backward (observed: rare
            # non-finite table grads from the Pallas scatter path at a
            # level-opening recompile, see TODO.md) must not corrupt the
            # params/opt state — skip the update and log it instead of
            # silently destroying the run
            grads_ok = jnp.all(jnp.asarray([
                jnp.all(jnp.isfinite(g))
                for g in jax.tree_util.tree_leaves(grads)]))
            if axis:
                # the skip decision must be identical on every device
                # (table-sharded grads differ per 'model' shard): a bad
                # value anywhere skips the update everywhere
                grads_ok = jax.lax.pmean(
                    grads_ok.astype(jnp.float32), all_axes) == 1.0
            aux["skipped_nonfinite"] = 1.0 - grads_ok.astype(jnp.float32)
            updates, new_opt_state = tx.update(grads, opt_state, params)
            new_params = jax.tree_util.tree_map(
                lambda p, u: jnp.where(grads_ok, p + u, p), params, updates)
            new_opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(grads_ok, new, old)
                if isinstance(new, jnp.ndarray) and new.shape == old.shape
                else new,
                new_opt_state, opt_state)
            new_params = self.model.post_update(new_params, step)
            return new_params, new_opt_state, aux

        if mesh is None:
            @partial(jax.jit, donate_argnums=(0,))
            def train_step(state, rng, data):
                params, opt_state, aux = step_body(
                    state["params"], state["opt_state"], state["occ_binary"],
                    state["step"], rng, data)
                return {
                    "params": params, "opt_state": opt_state,
                    "occs": state["occs"], "occ_binary": state["occ_binary"],
                    "step": state["step"] + 1,
                }, aux

            return train_step

        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def per_device(params, opt_state, occ_binary, step, rngs, data):
            if tp > 1:
                # tracing-scoped: the encoding's lookups become
                # shard-local masked gathers + one psum over 'model'
                with table_sharding("model", tp):
                    return step_body(params, opt_state, occ_binary, step,
                                     rngs[0], data)
            return step_body(params, opt_state, occ_binary, step, rngs[0],
                             data)

        if tp == 1:
            sharded = shard_map(
                per_device, mesh=mesh,
                in_specs=(P(), P(), P(), P(), P("data"), P()),
                out_specs=(P(), P(), P()), check_vma=False)

            @partial(jax.jit, donate_argnums=(0,))
            def train_step(state, rngs, data):
                params, opt_state, aux = sharded(
                    state["params"], state["opt_state"], state["occ_binary"],
                    state["step"], rngs, data)
                return {
                    "params": params, "opt_state": opt_state,
                    "occs": state["occs"], "occ_binary": state["occ_binary"],
                    "step": state["step"] + 1,
                }, aux

            return train_step

        # 2-D (data, model) mesh: hash-table rows (and their Adam
        # moments) shard over 'model'; the spec trees depend on the
        # params/opt-state structure, so the shard_map is built at trace
        # time from the live pytrees.  rngs is [dp, 2]: one key per data
        # shard, replicated over 'model' so every device in a model
        # group samples the same rays.
        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state, rngs, data):
            p_specs = table_specs(state["params"])
            o_specs = table_specs(state["opt_state"])
            sharded = shard_map(
                per_device, mesh=mesh,
                in_specs=(p_specs, o_specs, P(), P(), P("data"), P()),
                out_specs=(p_specs, o_specs, P()), check_vma=False)
            params, opt_state, aux = sharded(
                state["params"], state["opt_state"], state["occ_binary"],
                state["step"], rngs, data)
            return {
                "params": params, "opt_state": opt_state,
                "occs": state["occs"], "occ_binary": state["occ_binary"],
                "step": state["step"] + 1,
            }, aux

        return train_step

    # ------------------------------------------------------------------ #
    @staticmethod
    def _shard_render(body, mesh):
        """Wrap a per-device render body so the ray chunk is sharded over
        the 1-D data mesh: params/grid replicated, rays and all ray-major
        outputs split over devices (the eval analog of the DDP training
        shard; the reference gathers per-rank images with all_gather)."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from ..parallel import table_shard_count, table_sharding, table_specs

        tp = table_shard_count(mesh)

        def tp_body(params, occ_binary, rays, step, *extra):
            with table_sharding("model", tp):
                return body(params, occ_binary, rays, step, *extra)

        def sharded(params, occ_binary, rays, step, *extra):
            p_specs = table_specs(params) if tp > 1 else P()
            fn = shard_map(
                tp_body if tp > 1 else body, mesh=mesh,
                in_specs=(p_specs, P(), P("data"), P()) + tuple(
                    P() for _ in extra),
                out_specs=P("data"), check_vma=False)
            return fn(params, occ_binary, rays, step, *extra)

        return jax.jit(sharded)

    def make_render_chunk(self, capacity=None, mesh=None):
        from ..parallel import data_shard_count

        # memoize compiled chunks (see SplitOccSystem.make_render_chunk)
        key = (capacity, id(mesh))
        cache = getattr(self, "_render_chunk_cache", None)
        if cache is None:
            cache = self._render_chunk_cache = {}
        if key in cache:
            return cache[key]

        model = self.model
        pf = model.prefilter_on(0, train=False) \
            if hasattr(model, "prefilter_on") else False
        banded = bool(pf and self.eval_band_spr > 0)
        base_cap = capacity or (self.eval_band_capacity
                                if banded else self.eval_capacity)
        # rays (and the per-device sample budget) split over 'data' only;
        # 'model'-axis devices render the same rays against their table
        # shard (see make_train_step)
        cap = max(base_cap // data_shard_count(mesh), 16)

        def body(params, occ_binary, rays, step):
            out = model.forward(
                params, rays, occ_binary=occ_binary, step=step, rng=None,
                train=False, capacity=cap,
                background_color=jnp.ones((3,)), prefilter=pf,
                banded=banded)
            keep = ["comp_rgb_full", "comp_normal", "opacity", "depth",
                    "ray_included"]
            return {k: out[k] for k in keep if k in out}

        render_chunk = jax.jit(body) if mesh is None \
            else self._shard_render(body, mesh)
        cache[key] = render_chunk
        return render_chunk

    def render_image(self, state, split, index: int,
                     render_chunk=None) -> Dict[str, np.ndarray]:
        if render_chunk is None:
            render_chunk = self.make_render_chunk()
        dirs = np.asarray(split.directions)
        c2w = np.asarray(split.all_c2w[index])
        rays_o, rays_d = get_rays(jnp.asarray(dirs), jnp.asarray(c2w))
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
                # edge-pad: zero-direction pad rays march degenerately and
                # overflow the sample buffer, spuriously escalating the
                # fallback on every image's last chunk (seen in the r3
                # long-run vals); duplicated real rays behave like their
                # source
                chunk = jnp.pad(chunk, ((0, pad), (0, 0)), mode="edge")
            return chunk, pad, render_chunk(
                state["params"], state["occ_binary"], chunk, state["step"])

        def consume(s, disp):
            chunk, pad, res = disp
            # overflow fallback: if the fixed sample budget dropped rays,
            # re-render this chunk with escalating 2x/4x buffers
            # (compiled lazily, once per level).  Memory interaction with
            # eval_pipeline_depth>1: the next chunk's base-capacity
            # dispatch is already queued when an escalated (up to 4x)
            # re-render launches, so peak device memory is base + 4x
            # concurrently live — sample buffers must leave that headroom
            # (at the production 4096x(8+reserve) buffers this is ~100 MB,
            # far under the 16 GB HBM; revisit before sizing buffers near
            # capacity)
            if "ray_included" in res and not bool(res["ray_included"].all()):
                res = self._escalate_fallback(
                    render_chunk,
                    lambda fn: fn(state["params"], state["occ_binary"],
                                  chunk, state["step"]))
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

    def _eval_ray_order(self, n):
        """Interleave permutation for eval chunking (see
        ``utils.misc.interleave_order``): each chunk samples the whole
        image quasi-uniformly instead of one contiguous silhouette-heavy
        row band.  Returns ``(order, inverse)`` numpy index arrays, or
        ``(None, None)`` when off or when one chunk covers the image."""
        from ..utils.misc import interleave_order

        return interleave_order(n, self.eval_chunk, self.eval_ray_interleave)

    def _escalate_fallback(self, render_chunk, invoke):
        """Re-render an overflowed chunk with a 2x, then 4x sample
        buffer until every ray fits (soft mid-training fields can
        overflow 2x; observed at the step-1125 val of the r3 long run).
        Each level compiles lazily once per render_chunk and is cached
        on it.  ``invoke``: chunk_fn -> res (binds the chunk args)."""
        res = None
        fbs = getattr(render_chunk, "_fallbacks", None)
        if fbs is None:
            fbs = render_chunk._fallbacks = {}
        for mult in (2, 4):
            if mult not in fbs:
                fbs[mult] = self._make_fallback_chunk(render_chunk, mult)
            res = invoke(fbs[mult])
            if bool(res["ray_included"].all()):
                break
        return res

    @staticmethod
    def _warn_dropped_rays(res, chunk_start):
        """If even the largest fallback buffer overflowed, eval metrics
        are computed on partially-rendered pixels — make that
        detectable."""
        if "ray_included" in res:
            dropped = int((~np.asarray(res["ray_included"])).sum())
            if dropped:
                print(f"WARNING: eval chunk at ray {chunk_start}: {dropped} "
                      "rays overflowed the 2x fallback sample buffer and "
                      "were rendered partially — metrics may be corrupted",
                      flush=True)

    def _make_fallback_chunk(self, render_chunk, mult: int = 2):
        # escalation is always relative to the FULL eval capacity, even
        # for a banded/starved base chunk: overflow is the rare
        # correctness path, so jump straight to budgets proven to fit
        return self.make_render_chunk(capacity=self.eval_capacity * mult)

    # ------------------------------------------------------------------ #
    def fit(self, max_steps: Optional[int] = None, seed: int = 42,
            state=None, log_every: int = 100,
            val_every: Optional[int] = None, on_log=None):
        """Training loop (single-device, or sharded when ``self.mesh``
        is set — the reference auto-enables DDP over the visible GPUs,
        ``launch.py:84-97``)."""
        cfg_tr = self.config["trainer"]
        max_steps = max_steps or int(cfg_tr["max_steps"])
        save_every = int(cfg_tr.get("save_every_n_steps", 0) or 0)
        if state is None:
            state = self.init_state(seed)
        elif self.tx is None:
            self.init_state(seed)  # build optimizer for resumed state
        train_split = self.datamodule.train()
        data = self.device_data(train_split)
        mesh = self.mesh
        # one rng per *data* shard; 'model'-axis devices share their data
        # shard's key (they must sample identical rays)
        from ..parallel import data_shard_count
        ndev = data_shard_count(mesh)
        step_fns = {}
        occ_update = self.occupancy_update_fn()
        # per-step keys via fold_in: the stream is a pure function of
        # (seed, step), so a resumed run replays the exact batches of an
        # uninterrupted one (bit-deterministic checkpoint/resume)
        rng = jax.random.PRNGKey(seed + 1)
        t0 = time.time()
        start = int(state["step"])
        for step in range(start, max_steps):
            if self.grid_prune and step % 16 == 0:
                k = jax.random.fold_in(rng, 2 * step + 1)
                occs, binary = occ_update(state["params"], state["occs"],
                                          state["step"], k)
                state["occs"], state["occ_binary"] = occs, binary
            stage = self.train_stage(step)
            levels = self.model.open_levels(step) \
                if hasattr(self.model, "open_levels") else None
            pf = self.train_prefilter(step)
            key = (stage, levels, pf)
            if key not in step_fns:
                # probation after a scatter fallback: the non-finite-grad
                # fault is graph-specific (level-opening recompiles, see
                # TODO.md), so a *different* graph gets the preferred
                # Pallas kernel back — unless probation already failed
                # twice (then the fallback is sticky for the run)
                hg = getattr(getattr(self.model.geometry, "encoding", None),
                             "encoding", None)
                if (hg is not None
                        and getattr(self, "_fallback_key", None) is not None
                        and key != self._fallback_key
                        and getattr(self, "_fallback_count", 0) < 3
                        and hg.scatter_impl != self._scatter_pref):
                    print(f"step {step}: new graph {key} — retrying the "
                          f"preferred '{self._scatter_pref}' table-gradient "
                          "scatter (probation)", flush=True)
                    hg.set_scatter_impl(self._scatter_pref)
                    self._fallback_key = None
                step_fns[key] = self.make_train_step(stage, mesh=mesh,
                                                     levels=levels,
                                                     prefilter=pf)
            k = jax.random.fold_in(rng, 2 * step)
            if mesh is not None:
                k = jax.random.split(k, ndev)
            state, aux = step_fns[key](state, k, data)
            # self-healing scatter fallback: the Pallas table-gradient
            # kernel can produce persistent non-finite grads on rare
            # level-opening graphs (forensics in TODO.md).  The guard in
            # the step skips poisoned updates; two consecutive skips =>
            # rebuild the step with plain XLA scatter (slower, proven
            # clean) and continue — fold_in rng keeps the batch stream
            # aligned, so only the skipped steps are lost.
            if "skipped_nonfinite" in aux:
                if float(aux["skipped_nonfinite"]) > 0:
                    self._consecutive_skips = getattr(
                        self, "_consecutive_skips", 0) + 1
                else:
                    self._consecutive_skips = 0
                hg = getattr(getattr(self.model.geometry, "encoding", None),
                             "encoding", None)
                if self._consecutive_skips >= 2 and hg is not None \
                        and getattr(hg, "scatter_impl", "xla") != "xla":
                    print(f"WARNING: step {step}: persistent non-finite "
                          "grads — falling back to XLA table-gradient "
                          "scatter and recompiling", flush=True)
                    if not hasattr(self, "_scatter_pref"):
                        self._scatter_pref = hg.scatter_impl
                    self._fallback_key = key
                    self._fallback_count = getattr(
                        self, "_fallback_count", 0) + 1
                    hg.set_scatter_impl("xla")
                    step_fns.clear()
                    self._consecutive_skips = 0
            if log_every and (step % log_every == 0 or step == max_steps - 1):
                m = {k2: float(v) for k2, v in aux.items()}
                m["steps_per_sec"] = (step - start + 1) / (time.time() - t0)
                # windowed rate since the previous log line — excludes
                # startup compile, so it converges to the true step time
                now = time.time()
                last_step, last_t = getattr(self, "_rate_mark",
                                            (start, t0))
                m["steps_per_sec_window"] = (step - last_step) \
                    / max(now - last_t, 1e-9) if step > last_step else 0.0
                self._rate_mark = (step, now)
                if m.get("skipped_nonfinite", 0) > 0:
                    print(f"WARNING: step {step}: non-finite grads — "
                          "update skipped", flush=True)
                if on_log:
                    on_log(step, m)
                else:
                    tag = f"[s{stage}]" if stage is not None else ""
                    extra = (f" phys={m['rgb_phys_mse']:.5f}"
                             if "rgb_phys_mse" in m else "")
                    print(f"step {step}{tag}: loss={m['loss']:.4f} "
                          f"mse={m['rgb_mse']:.5f}{extra} "
                          f"inv_s={m['inv_s']:.1f} "
                          f"rays={int(m['num_rays'])} "
                          f"samples={int(m['num_samples'])} "
                          f"sps={m['steps_per_sec']:.2f} "
                          f"w={m['steps_per_sec_window']:.3f}",
                          flush=True)
            if save_every and step > 0 and step % save_every == 0:
                # async: the ~270 MB serialization+write overlaps the
                # next training steps (the device->host pull is sync)
                self.save_checkpoint(state, os.path.join(
                    self.ckpt_dir, "latest.ckpt.npz"), async_write=True)
            if val_every and step > 0 and step % val_every == 0:
                self.validate(state, n_images=1)
        self.save_checkpoint(state)
        return state

    # ------------------------------------------------------------------ #
    def _with_eval_bake(self, state):
        """Inject the per-checkpoint dense SDF bake into a copy of state.

        The bake (model.bake_eval_sdf / ops/sdf_bake.bake_for_model) is
        memoized on the step so a test session's N views and relights
        share one bake; training state is never mutated — every
        downstream render path (escalation ladder, calibration probes,
        multi-emitter chunks, sharded eval) reads the injected
        ``params["_eval_bake"]`` copy.  No-op when the model has no
        bake configured.
        """
        model = self.model
        if getattr(model, "eval_sdf_bake", "off") == "off":
            return state
        key = int(state["step"])
        cache = getattr(self, "_eval_bake_cache", None)
        if cache is None or cache[0] != key:
            import time as _time

            t0 = _time.time()
            bake = model.bake_eval_sdf(state["params"], key)
            jax.block_until_ready(bake["packed"])
            print(f"baked eval SDF grid "
                  f"({model.eval_sdf_bake_cells}^3 cells, "
                  f"{_time.time() - t0:.1f}s)", flush=True)
            self._eval_bake_cache = cache = (key, bake)
        return {**state, "params": {**state["params"],
                                    "_eval_bake": cache[1]}}

    def validate(self, state, n_images: Optional[int] = None):
        state = self._with_eval_bake(state)
        split = self.datamodule.val()
        render_chunk = self.make_render_chunk(mesh=self.mesh)
        n = len(split) if n_images is None else min(n_images, len(split))
        psnrs = []
        for i in range(n):
            out = self.render_image(state, split, i, render_chunk)
            h, w = split.h, split.w
            gt = np.asarray(split.all_images[i]).reshape(-1, 3)
            mask = np.asarray(split.all_fg_masks[i]).reshape(-1, 1)
            gt = gt * mask + 1.0 * (1 - mask)
            p = float(psnr(jnp.asarray(out["comp_rgb_full"]), jnp.asarray(gt)))
            psnrs.append(p)
            step = int(state["step"])
            self.saver.save_image_grid(f"it{step}-{i}.png", [
                {"type": "rgb", "img": gt.reshape(h, w, 3),
                 "kwargs": {"data_format": "HWC"}},
                {"type": "rgb", "img": out["comp_rgb_full"].reshape(h, w, 3),
                 "kwargs": {"data_format": "HWC"}},
                {"type": "grayscale", "img": out["depth"].reshape(h, w),
                 "kwargs": {}},
                {"type": "rgb", "img": out["comp_normal"].reshape(h, w, 3),
                 "kwargs": {"data_format": "HWC", "data_range": (-1, 1)}},
            ])
        mean_psnr = float(np.mean(psnrs))
        print(f"val/psnr = {mean_psnr:.3f}", flush=True)
        return {"psnr": mean_psnr}

    def test(self, state, export: bool = True):
        state = self._with_eval_bake(state)
        split = self.datamodule.test()
        render_chunk = self.make_render_chunk(mesh=self.mesh)
        psnrs = []
        step = int(state["step"])
        for i in range(len(split)):
            print(f"test view {i + 1}/{len(split)}", flush=True)
            out = self.render_image(state, split, i, render_chunk)
            h, w = split.h, split.w
            gt = np.asarray(split.all_images[i]).reshape(-1, 3)
            mask = np.asarray(split.all_fg_masks[i]).reshape(-1, 1)
            gt = gt * mask + 1.0 * (1 - mask)
            psnrs.append(float(psnr(jnp.asarray(out["comp_rgb_full"]),
                                    jnp.asarray(gt))))
            self.saver.save_image_grid(f"it{step}-test/{i}.png", [
                {"type": "rgb", "img": gt.reshape(h, w, 3),
                 "kwargs": {"data_format": "HWC"}},
                {"type": "rgb", "img": out["comp_rgb_full"].reshape(h, w, 3),
                 "kwargs": {"data_format": "HWC"}},
                {"type": "grayscale", "img": out["depth"].reshape(h, w),
                 "kwargs": {}},
                {"type": "rgb", "img": out["comp_normal"].reshape(h, w, 3),
                 "kwargs": {"data_format": "HWC", "data_range": (-1, 1)}},
            ])
        res = {"psnr": float(np.mean(psnrs))}
        print(f"test/psnr = {res['psnr']:.3f}", flush=True)
        self.saver.save_img_sequence(f"it{step}-test", f"it{step}-test",
                                     r"(\d+)\.png")
        if export:
            self.export(state)
        return res

    # ------------------------------------------------------------------ #
    def predict(self, state, hdr_filepath=None):
        """Render the predict split (e.g. the spheric trajectory the
        colmap loader generates) into an image sequence."""
        state = self._with_eval_bake(state)
        dm = self.datamodule
        split = dm.predict() if hasattr(dm, "predict") else dm.test()
        render_chunk = self.make_render_chunk()
        step = int(state["step"])
        for i in range(len(split)):
            out = self.render_image(state, split, i, render_chunk)
            h, w = split.h, split.w
            self.saver.save_image_grid(f"it{step}-predict/{i}.png", [
                {"type": "rgb", "img": out["comp_rgb_full"].reshape(h, w, 3),
                 "kwargs": {"data_format": "HWC"}}])
        self.saver.save_img_sequence(f"it{step}-predict",
                                     f"it{step}-predict", r"(\d+)\.png")

    # ------------------------------------------------------------------ #
    def export(self, state):
        from ..export import export_mesh

        step = int(state["step"])
        mesh = export_mesh(self.model, state, self.config)
        if mesh is not None:
            iso = self.config["model"]["geometry"]["isosurface"]
            self.saver.save_mesh(
                f"it{step}-{iso['method']}{iso['resolution']}.ply",
                mesh["v_pos"], mesh["t_pos_idx"], mesh.get("v_rgb"))
        return mesh
