"""Optimizable mip-cubemap environment light (split-sum IBL).

Functional re-design of the reference ``EnvironmentLightMipCube``
(``lib/pbr/light.py:126-370``): the learnable base cubemap is a param
pytree; ``build_mips`` is a pure function producing the filtered mip
pyramid each step (avg-pool chain + precomputed diffuse/GGX spherical
filters — see ``ops/prefilter.py``); ``eval_mip`` is a trilinear
mip-cubemap lookup replacing ``dr.texture(boundary_mode='cube')``.
"""

from __future__ import annotations

import os
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import register
from ..ops import prefilter
from ..ops.cubemap import (
    avg_pool_cubemap,
    blender_latlong_to_cubemap,
    cubemap_to_latlong,
    nmf_latlong_to_cubemap,
    sample_cubemap,
    sample_cubemap_mips,
    sample_cubemap_mips_atlas,
)

MIN_ROUGHNESS = prefilter.MIN_ROUGHNESS
MAX_ROUGHNESS = prefilter.MAX_ROUGHNESS
LIGHT_MIN_RES = prefilter.LIGHT_MIN_RES


def load_hdr_image(path: str) -> np.ndarray:
    """Load an .hdr/.exr lat-long image as float32 RGB [H, W, 3].

    Replaces the reference's cv2-based loader
    (``lib/pbr/utils/nvdiffrecmc_util.py:380-410``).
    """
    if path.endswith(".exr"):
        from ..utils.exr import read_exr

        return np.ascontiguousarray(read_exr(path)[..., :3])
    os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
    import cv2

    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    img = img.astype(np.float32)
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    return np.ascontiguousarray(img[..., :3][..., ::-1])  # BGR -> RGB


class EnvMips(NamedTuple):
    diffuse: jnp.ndarray            # [6, 16, 16, 3]
    specular: List[jnp.ndarray]     # per-level [6, N_l, N_l, 3]


@register("envlight-mip-cube")
class EnvLightMipCube:
    def __init__(self, config):
        self.config = config
        ec = config["envlight_config"]
        self.base_res = int(ec.get("base_res", 512))
        self.scale = float(ec.get("scale", 0.5))
        self.bias = float(ec.get("bias", 0.25))
        self.clamp = bool(ec.get("clamp", False))
        self.nmf_format = bool(ec.get("nmf_format", False))
        self.hdr_filepath = ec.get("hdr_filepath", None)
        # number of mip levels base_res .. 16
        self.n_levels = 1
        r = self.base_res
        while r > LIGHT_MIN_RES:
            r //= 2
            self.n_levels += 1
        # build filters eagerly so the precompute never runs under a
        # jit trace (it is numpy, but lazy building from inside jit
        # would bake avoidable overhead into tracing)
        self._filters = None
        _ = self.filters

    # ------------------------------------------------------------------ #
    def init(self, key) -> dict:
        if self.hdr_filepath is None:
            base = (
                jax.random.uniform(key, (6, self.base_res, self.base_res, 3))
                * self.scale + self.bias
            )
        else:
            latlong = jnp.asarray(load_hdr_image(self.hdr_filepath))
            if self.clamp:
                latlong = jnp.clip(latlong, 0.0, 1.0)
            conv = nmf_latlong_to_cubemap if self.nmf_format else \
                blender_latlong_to_cubemap
            base = conv(latlong, self.base_res)
        return {"base": base.astype(jnp.float32)}

    def relight_params(self, file_name: str) -> dict:
        """Fresh (non-trainable) params from an HDR file
        (reference light.py:155-158)."""
        latlong = jnp.asarray(load_hdr_image(file_name))
        conv = nmf_latlong_to_cubemap if self.nmf_format else \
            blender_latlong_to_cubemap
        return {"base": conv(latlong, self.base_res).astype(jnp.float32)}

    # ------------------------------------------------------------------ #
    @property
    def filters(self):
        if self._filters is None:
            self._filters = prefilter.build_specular_filter_bank(self.base_res)
        return self._filters

    def build_mips(self, params) -> EnvMips:
        """Differentiable mip build (reference light.py:169-180)."""
        base = params["base"]
        chain = [base]
        while chain[-1].shape[1] > LIGHT_MIN_RES:
            chain.append(avg_pool_cubemap(chain[-1]))
        diffuse = prefilter.apply_diffuse_filter(chain[-1])
        specular = [
            prefilter.apply_specular_level_filter(f, chain)
            for f in self.filters
        ]
        return EnvMips(diffuse=diffuse, specular=specular)

    # ------------------------------------------------------------------ #
    def get_mip(self, roughness):
        """Roughness -> fractional mip level (reference light.py:182-185)."""
        n = self.n_levels
        lo = (jnp.clip(roughness, MIN_ROUGHNESS, MAX_ROUGHNESS) - MIN_ROUGHNESS) \
            / (MAX_ROUGHNESS - MIN_ROUGHNESS) * (n - 2)
        hi = (jnp.clip(roughness, MAX_ROUGHNESS, 1.0) - MAX_ROUGHNESS) \
            / (1.0 - MAX_ROUGHNESS) + n - 2
        return jnp.where(roughness < MAX_ROUGHNESS, lo, hi)

    def eval_mip(self, mips: EnvMips, directions, specular: bool = False,
                 roughness=None):
        """[N,3] dirs -> [N,3] radiance (reference light.py:188-206)."""
        if specular:
            assert roughness is not None
            mip = self.get_mip(roughness)
            if mip.ndim == directions.ndim:
                mip = mip[..., 0]
            return sample_cubemap_mips_atlas(mips.specular, directions, mip)
        return sample_cubemap(mips.diffuse, directions)

    def eval_base(self, params, directions):
        """Raw base lookup (reference light.py:250-263)."""
        return sample_cubemap(params["base"], directions)

    def generate_image(self, params) -> jnp.ndarray:
        """Lat-long dump of the learned light (reference light.py:366-370)."""
        return cubemap_to_latlong(params["base"], (512, 1024))

    # ------------------------------------------------------------------ #
    # Importance sampling over a lat-long projection (reference
    # light.py:215-364; unused by the shipped split-sum path but part of
    # the MC toolbox).  The reference applies its lat-long pdf math to
    # the cubemap tensor directly (latent bug); we project properly.
    def update_pdf(self, params, res=(128, 256)):
        """Returns {'pdf' [H,W], 'rows' [H+1], 'cols' [H, W+1]} CDF state."""
        img = cubemap_to_latlong(params["base"], res)
        h, w = res
        y = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        pdf = jnp.max(img, axis=-1) * jnp.sin(y * jnp.pi)[:, None]
        pdf = jnp.maximum(pdf, 1e-6)
        pdf = pdf / pdf.sum()
        cols = jnp.cumsum(pdf, axis=1)
        rows = jnp.cumsum(cols[:, -1])
        cols = cols / jnp.maximum(cols[:, -1:], 1e-12)
        rows = rows / jnp.maximum(rows[-1], 1e-12)
        return {
            "pdf": pdf,
            "rows": jnp.concatenate([jnp.zeros((1,)), rows]),
            "cols": jnp.concatenate([jnp.zeros((h, 1)), cols], axis=1),
        }

    def sample(self, pdf_state, rng, num_samples: int):
        """Importance-sample directions from the environment CDFs."""
        h, w = pdf_state["pdf"].shape
        k1, k2 = jax.random.split(rng)
        u1 = jax.random.uniform(k1, (num_samples,))
        u2 = jax.random.uniform(k2, (num_samples,))
        rows, cols = pdf_state["rows"], pdf_state["cols"]
        ri = jnp.clip(jnp.searchsorted(rows, u1, side="right") - 1, 0, h - 1)
        rfrac = (u1 - rows[ri]) / jnp.maximum(rows[ri + 1] - rows[ri], 1e-12)
        crow = cols[ri]
        ci = jnp.clip(
            jax.vmap(lambda c, u: jnp.searchsorted(c, u, side="right"))(
                crow, u2) - 1, 0, w - 1)
        cfrac = (u2 - jnp.take_along_axis(crow, ci[:, None], 1)[:, 0]) \
            / jnp.maximum(
                jnp.take_along_axis(crow, ci[:, None] + 1, 1)[:, 0]
                - jnp.take_along_axis(crow, ci[:, None], 1)[:, 0], 1e-12)
        v = (ri + rfrac) / h
        u = (ci + cfrac) / w
        theta = v * jnp.pi
        phi = u * 2 * jnp.pi - jnp.pi
        st, ct = jnp.sin(theta), jnp.cos(theta)
        # matches the y-up lat-long convention of cubemap_to_latlong
        return jnp.stack([st * jnp.sin(phi), ct, -st * jnp.cos(phi)], -1)

    def sample_stratified(self, rng, batch_size: int, n_rows: int,
                          n_cols: int, jitter: bool = True):
        """Stratified env-map direction sampling (reference
        light.py:50-120, from TensoIR).  Returns (dirs [B*H*W, 3],
        inv_pdf [B*H*W, 1])."""
        lat_step = jnp.pi / n_rows
        lng_step = 2 * jnp.pi / n_cols
        theta = jnp.linspace(jnp.pi / 2 - 0.5 * lat_step,
                             -jnp.pi / 2 + 0.5 * lat_step, n_rows)
        phi = jnp.linspace(jnp.pi - 0.5 * lng_step,
                           -jnp.pi + 0.5 * lng_step, n_cols)
        theta, phi = jnp.meshgrid(theta, phi, indexing="ij")
        sin_t = jnp.sin(jnp.pi / 2 - theta)
        inv_pdf = 4 * jnp.pi * sin_t / jnp.sum(sin_t)
        inv_pdf = jnp.tile(inv_pdf[None], (batch_size, 1, 1))
        if jitter and rng is not None:
            k1, k2 = jax.random.split(rng)
            phi = phi[None] + lng_step * (
                jax.random.uniform(k1, (batch_size, n_rows, n_cols)) - 0.5)
            theta = theta[None] + lat_step * (
                jax.random.uniform(k2, (batch_size, n_rows, n_cols)) - 0.5)
        else:
            theta = jnp.tile(theta[None], (batch_size, 1, 1))
            phi = jnp.tile(phi[None], (batch_size, 1, 1))
        dirs = jnp.stack([jnp.cos(phi) * jnp.cos(theta),
                          jnp.sin(phi) * jnp.cos(theta),
                          jnp.sin(theta)], -1)
        dirs = dirs / jnp.sqrt(jnp.sum(dirs ** 2, -1, keepdims=True) + 1e-12)
        return dirs.reshape(-1, 3), inv_pdf.reshape(-1, 1)

    def pdf(self, pdf_state, directions):
        """Solid-angle pdf of given directions under the lat-long CDF."""
        h, w = pdf_state["pdf"].shape
        x, y, z = directions[..., 0], directions[..., 1], directions[..., 2]
        theta = jnp.arccos(jnp.clip(y, -1.0, 1.0))
        phi = jnp.arctan2(x, -z)
        u = (phi + jnp.pi) / (2 * jnp.pi)
        v = theta / jnp.pi
        ci = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
        ri = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
        sin_t = jnp.maximum(jnp.sin(theta), 1e-6)
        scale = (h * w) / (2 * jnp.pi * jnp.pi)
        return pdf_state["pdf"][ri, ci] * scale / sin_t
