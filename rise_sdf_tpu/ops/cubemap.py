"""Cubemap sampling, mip sampling and lat-long conversion in pure jnp.

Replaces nvdiffrast's ``dr.texture(..., boundary_mode='cube')`` usage
(reference ``lib/pbr/light.py:182-263``) and the lat-long<->cubemap
converters (reference ``lib/pbr/utils/light_utils.py:85-206``).

Face/uv conventions match nvdiffrast's cube-direction mapping
(``cube_to_dir`` at ``light_utils.py:85-92``):

  face 0: +x  (u -> -z, v -> -y)
  face 1: -x  (u -> +z, v -> -y)
  face 2: +y  (u -> +x, v -> +z)
  face 3: -y  (u -> +x, v -> -z)
  face 4: +z  (u -> +x, v -> -y)
  face 5: -z  (u -> -x, v -> -y)

Bilinear filtering is face-local with clamped uv (nvdiffrast filters
across cube edges; the seam error at >=16^2 resolution is sub-texel and
does not affect any loss path).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def cube_to_dir(face: int, u, v):
    """Texel center (u, v in [-1,1]) on ``face`` -> unnormalized direction."""
    one = jnp.ones_like(u)
    if face == 0:
        return jnp.stack([one, -v, -u], -1)
    if face == 1:
        return jnp.stack([-one, -v, u], -1)
    if face == 2:
        return jnp.stack([u, one, v], -1)
    if face == 3:
        return jnp.stack([u, -one, -v], -1)
    if face == 4:
        return jnp.stack([u, -v, one], -1)
    if face == 5:
        return jnp.stack([-u, -v, -one], -1)
    raise ValueError(face)


def face_directions(res: int) -> jnp.ndarray:
    """[6, res, res, 3] unit directions of all texel centers."""
    g = (jnp.arange(res, dtype=jnp.float32) + 0.5) / res * 2.0 - 1.0
    v, u = jnp.meshgrid(g, g, indexing="ij")
    dirs = jnp.stack([cube_to_dir(s, u, v) for s in range(6)], axis=0)
    return dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)


def dir_to_face_uv(dirs):
    """Directions [..., 3] -> (face [...], u [...], v [...]) with u,v in [-1,1]."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    # choose major axis
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    is_z = ~(is_x | is_y)
    face = jnp.where(
        is_x, jnp.where(x >= 0, 0, 1),
        jnp.where(is_y, jnp.where(y >= 0, 2, 3), jnp.where(z >= 0, 4, 5)),
    ).astype(jnp.int32)
    m = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    m = jnp.maximum(m, 1e-12)
    # invert cube_to_dir per face
    u = jnp.where(
        is_x, jnp.where(x >= 0, -z, z),
        jnp.where(is_y, x, jnp.where(z >= 0, x, -x)),
    ) / m
    v = jnp.where(is_x, -y, jnp.where(is_y, jnp.where(y >= 0, z, -z), -y)) / m
    return face, u, v


def sample_cubemap(cubemap, dirs):
    """Bilinear cubemap lookup. cubemap: [6, N, N, C]; dirs: [..., 3]."""
    res = cubemap.shape[1]
    face, u, v = dir_to_face_uv(dirs)
    # uv in [-1,1] -> texel coords [0, res-1] (texel centers at half-integers)
    fu = (u * 0.5 + 0.5) * res - 0.5
    fv = (v * 0.5 + 0.5) * res - 0.5
    u0 = jnp.clip(jnp.floor(fu).astype(jnp.int32), 0, res - 1)
    v0 = jnp.clip(jnp.floor(fv).astype(jnp.int32), 0, res - 1)
    u1 = jnp.clip(u0 + 1, 0, res - 1)
    v1 = jnp.clip(v0 + 1, 0, res - 1)
    wu = jnp.clip(fu - u0, 0.0, 1.0)[..., None]
    wv = jnp.clip(fv - v0, 0.0, 1.0)[..., None]
    flat = cubemap.reshape(6 * res * res, -1)

    def tap(vi, ui):
        idx = (face * res + vi) * res + ui
        return flat[idx]

    c00, c01 = tap(v0, u0), tap(v0, u1)
    c10, c11 = tap(v1, u0), tap(v1, u1)
    top = c00 * (1 - wu) + c01 * wu
    bot = c10 * (1 - wu) + c11 * wu
    return top * (1 - wv) + bot * wv


def sample_cubemap_mips(mips, dirs, mip_level):
    """Trilinear (bilinear x mip-lerp) lookup over a mip pyramid.

    mips: list of [6, N_l, N_l, C]; mip_level: [...] float in
    [0, len(mips)-1].  Equivalent to nvdiffrast
    ``filter_mode='linear-mipmap-linear'`` with per-pixel
    ``mip_level_bias`` (reference ``lib/pbr/light.py:194-199``).
    """
    n_levels = len(mips)
    m = jnp.clip(mip_level, 0.0, n_levels - 1.0)
    l0 = jnp.clip(jnp.floor(m).astype(jnp.int32), 0, n_levels - 1)
    frac = (m - l0.astype(m.dtype))[..., None]
    # evaluate every level once (static unroll), then select the two
    # bracketing levels per sample; levels are few (<=7) and lookups cheap
    samples = jnp.stack([sample_cubemap(mp, dirs) for mp in mips], axis=0)

    def take_level(lvl):
        oh = jax.nn.one_hot(lvl, n_levels, dtype=samples.dtype)
        return jnp.einsum("l...c,...l->...c", samples, oh)

    s0 = take_level(l0)
    s1 = take_level(jnp.clip(l0 + 1, 0, n_levels - 1))
    return s0 * (1 - frac) + s1 * frac


def sample_cubemap_mips_atlas(mips, dirs, mip_level):
    """Trilinear mip lookup via a flattened atlas — 8 taps per sample.

    Functionally equivalent to ``sample_cubemap_mips`` (which evaluates
    every level and one-hot selects, 4*n_levels taps) but gathers only
    from the two bracketing levels; the winning formulation on TPU where
    gathers dominate.  Levels must be a power-of-two pyramid.
    """
    n_levels = len(mips)
    base_res = mips[0].shape[1]
    c = mips[0].shape[-1]
    atlas = jnp.concatenate([m.reshape(-1, c) for m in mips], axis=0)
    sizes = [6 * m.shape[1] * m.shape[2] for m in mips]
    offsets = jnp.asarray([0] + list(jnp.cumsum(jnp.asarray(sizes))[:-1]),
                          jnp.int32)
    log2_base = int(math.log2(base_res))

    m = jnp.clip(mip_level, 0.0, n_levels - 1.0)
    l0 = jnp.clip(jnp.floor(m).astype(jnp.int32), 0, n_levels - 1)
    l1 = jnp.clip(l0 + 1, 0, n_levels - 1)
    frac = (m - l0.astype(m.dtype))[..., None]

    face, u, v = dir_to_face_uv(dirs)

    def tap_level(l):
        res = jnp.left_shift(1, log2_base - l)  # base_res >> l, per sample
        resf = res.astype(jnp.float32)
        fu = (u * 0.5 + 0.5) * resf - 0.5
        fv = (v * 0.5 + 0.5) * resf - 0.5
        u0 = jnp.clip(jnp.floor(fu).astype(jnp.int32), 0, res - 1)
        v0 = jnp.clip(jnp.floor(fv).astype(jnp.int32), 0, res - 1)
        u1 = jnp.minimum(u0 + 1, res - 1)
        v1 = jnp.minimum(v0 + 1, res - 1)
        wu = jnp.clip(fu - u0, 0.0, 1.0)[..., None]
        wv = jnp.clip(fv - v0, 0.0, 1.0)[..., None]
        off = offsets[l]

        def tap(vi, ui):
            return atlas[off + (face * res + vi) * res + ui]

        top = tap(v0, u0) * (1 - wu) + tap(v0, u1) * wu
        bot = tap(v1, u0) * (1 - wu) + tap(v1, u1) * wu
        return top * (1 - wv) + bot * wv

    s0 = tap_level(l0)
    s1 = tap_level(l1)
    return s0 * (1 - frac) + s1 * frac


def avg_pool_cubemap(cubemap):
    """2x2 average-pool mip reduction ([6,N,N,C] -> [6,N/2,N/2,C]).

    Forward matches the reference's ``cubemap_mip``
    (``light_utils.py:94-109``); backward here is exact autodiff instead
    of the reference's approximate texture-based backward.
    """
    f, n, _, c = cubemap.shape
    x = cubemap.reshape(f, n // 2, 2, n // 2, 2, c)
    return x.mean(axis=(2, 4))


def texel_solid_angle(res: int) -> jnp.ndarray:
    """[res, res] solid angle of each texel (same for every face).

    Uses the standard closed-form via the projected-area integral, the
    continuous analog of the reference's ``pixel_area`` weights
    (``cubemap.cu``).
    """
    def integrate(x, y):
        return np.arctan2(x * y, np.sqrt(x * x + y * y + 1.0))

    e = np.linspace(-1.0, 1.0, res + 1)
    x0, x1 = e[:-1][:, None], e[1:][:, None]
    y0, y1 = e[:-1][None, :], e[1:][None, :]
    omega = (integrate(x1, y1) - integrate(x0, y1)
             - integrate(x1, y0) + integrate(x0, y0))
    return jnp.asarray(omega, jnp.float32)


# --------------------------------------------------------------------------- #
# lat-long conversions (Blender + NMF conventions, reference
# light_utils.py:111-206).  Lat-long images are [H, W, C].
# --------------------------------------------------------------------------- #


def _sample_latlong(latlong, tu, tv):
    """Bilinear sample of a lat-long image at normalized (tu, tv) in [0,1]."""
    h, w = latlong.shape[0], latlong.shape[1]
    fu = tu * w - 0.5
    fv = tv * h - 0.5
    u0 = jnp.floor(fu).astype(jnp.int32)
    v0 = jnp.clip(jnp.floor(fv).astype(jnp.int32), 0, h - 1)
    v1 = jnp.clip(v0 + 1, 0, h - 1)
    wu = (fu - u0)[..., None]
    wv = (fv - v0)[..., None]
    u0w = jnp.mod(u0, w)  # wrap in azimuth
    u1w = jnp.mod(u0 + 1, w)
    c00 = latlong[v0, u0w]
    c01 = latlong[v0, u1w]
    c10 = latlong[v1, u0w]
    c11 = latlong[v1, u1w]
    top = c00 * (1 - wu) + c01 * wu
    bot = c10 * (1 - wu) + c11 * wu
    return top * (1 - wv) + bot * wv


def blender_latlong_to_cubemap(latlong, res: int):
    """Reference ``light_utils.py:126-139`` (Blender convention)."""
    dirs = face_directions(res)
    tu = jnp.arctan2(-dirs[..., 1], dirs[..., 0]) / (2 * math.pi) + 0.5
    tv = jnp.arccos(jnp.clip(dirs[..., 2], -1, 1)) / math.pi
    return _sample_latlong(latlong, tu, tv)


def nmf_latlong_to_cubemap(latlong, res: int):
    """Reference ``light_utils.py:158-174`` (NMF mirrored azimuth)."""
    dirs = face_directions(res)
    tu = jnp.arctan2(-dirs[..., 1], dirs[..., 0]) / (2 * math.pi) + 0.5
    tu = jnp.where(tu < 0.5, 0.5 - tu, 1.5 - tu)
    tv = jnp.arccos(jnp.clip(dirs[..., 2], -1, 1)) / math.pi
    return _sample_latlong(latlong, tu, tv)


def cubemap_to_blender_latlong(cubemap, out_hw):
    """Reference ``light_utils.py:111-124``."""
    h, w = out_hw
    gy = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    gx = ((jnp.arange(w, dtype=jnp.float32) + 0.5) / w) * 2.0 - 1.0
    gy, gx = jnp.meshgrid(gy, gx, indexing="ij")
    st, ct = jnp.sin(gy * math.pi), jnp.cos(gy * math.pi)
    sp, cp = jnp.sin(gx * math.pi), jnp.cos(gx * math.pi)
    refl = jnp.stack([st * cp, -st * sp, ct], axis=-1)
    return sample_cubemap(cubemap, refl)


def cubemap_to_latlong(cubemap, out_hw):
    """y-up convention used for envmap image dumps (``light_utils.py:176-190``)."""
    h, w = out_hw
    gy = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    gx = ((jnp.arange(w, dtype=jnp.float32) + 0.5) / w) * 2.0 - 1.0
    gy, gx = jnp.meshgrid(gy, gx, indexing="ij")
    st, ct = jnp.sin(gy * math.pi), jnp.cos(gy * math.pi)
    sp, cp = jnp.sin(gx * math.pi), jnp.cos(gx * math.pi)
    refl = jnp.stack([st * sp, ct, -st * cp], axis=-1)
    return sample_cubemap(cubemap, refl)


def sample_texture2d(tex, uv):
    """Bilinear 2D lookup with clamped borders.

    Replaces ``dr.texture(..., boundary_mode='clamp')`` for the FG LUT
    (reference ``models/texture.py:338-341``).  tex: [H, W, C]; uv: [...,
    2] in [0,1] with u -> W axis, v -> H axis.
    """
    h, w = tex.shape[0], tex.shape[1]
    fu = jnp.clip(uv[..., 0], 0.0, 1.0) * w - 0.5
    fv = jnp.clip(uv[..., 1], 0.0, 1.0) * h - 0.5
    u0 = jnp.clip(jnp.floor(fu).astype(jnp.int32), 0, w - 1)
    v0 = jnp.clip(jnp.floor(fv).astype(jnp.int32), 0, h - 1)
    u1 = jnp.clip(u0 + 1, 0, w - 1)
    v1 = jnp.clip(v0 + 1, 0, h - 1)
    wu = jnp.clip(fu - u0, 0.0, 1.0)[..., None]
    wv = jnp.clip(fv - v0, 0.0, 1.0)[..., None]
    top = tex[v0, u0] * (1 - wu) + tex[v0, u1] * wu
    bot = tex[v1, u0] * (1 - wu) + tex[v1, u1] * wu
    return top * (1 - wv) + bot * wv
