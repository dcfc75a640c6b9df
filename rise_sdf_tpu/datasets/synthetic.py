"""Procedural synthetic dataset (no files needed).

Ray-traces a glossy sphere with spatially-varying albedo under a simple
analytic environment, producing the same attribute surface as the
blender/tensoir loaders.  Used by unit/integration tests and by
``bench.py`` so the framework can be exercised end-to-end without
downloading TensoIR data.
"""

from __future__ import annotations

import math
import os

import numpy as np

from . import register
from ..utils.rays import get_ray_directions

SPHERE_RADIUS = 0.5


def look_at(eye: np.ndarray) -> np.ndarray:
    """[3,4] c2w, camera -z looks at origin (OpenGL convention)."""
    forward = -eye / np.linalg.norm(eye)
    up = np.array([0.0, 0.0, 1.0])
    if abs(forward @ up) > 0.99:
        up = np.array([0.0, 1.0, 0.0])
    right = np.cross(forward, up)
    right /= np.linalg.norm(right)
    true_up = np.cross(right, forward)
    return np.stack([right, true_up, -forward, eye], axis=1).astype(np.float32)


def camera_poses(n: int, radius: float = 4.0, seed: int = 0,
                 phase: float = 0.0) -> np.ndarray:
    """``phase`` (in pose-index units) rotates the azimuth ladder so two
    shards of n views (phase 0 and 0.5) interleave into 2n distinct
    views — used to split the full test protocol into processes shorter
    than the axon tunnel's ~2h hang horizon."""
    rng = np.random.default_rng(seed)
    poses = []
    for i in range(n):
        theta = 2 * math.pi * (i + phase) / n
        phi = math.pi / 4 + 0.3 * math.sin(3 * theta) + 0.05 * rng.standard_normal()
        eye = radius * np.array([
            math.cos(theta) * math.sin(phi),
            math.sin(theta) * math.sin(phi),
            math.cos(phi),
        ])
        poses.append(look_at(eye))
    return np.stack(poses)


def env_radiance(d: np.ndarray) -> np.ndarray:
    """Smooth analytic environment light (RGB), d: [...,3] unit."""
    sky = np.array([0.5, 0.6, 0.8]) * (0.5 + 0.5 * d[..., 2:3])
    sun_dir = np.array([0.5, 0.3, 0.8])
    sun_dir = sun_dir / np.linalg.norm(sun_dir)
    sun = np.array([1.0, 0.95, 0.8]) * np.maximum(
        (d @ sun_dir), 0.0)[..., None] ** 16 * 2.0
    return (sky + sun).astype(np.float32)


def env_radiance_warm(d: np.ndarray) -> np.ndarray:
    """Alternate analytic environment (warm sunset) for relighting GT."""
    horizon = np.array([0.9, 0.5, 0.25]) * (1.0 - np.abs(d[..., 2:3])) ** 2
    sky = np.array([0.25, 0.3, 0.5]) * (0.4 + 0.6 * d[..., 2:3])
    sun_dir = np.array([-0.7, 0.2, 0.25])
    sun_dir = sun_dir / np.linalg.norm(sun_dir)
    sun = np.array([1.2, 0.7, 0.35]) * np.maximum(
        (d @ sun_dir), 0.0)[..., None] ** 24 * 3.0
    return (horizon + sky + sun).astype(np.float32)


def env_radiance_bright(d: np.ndarray) -> np.ndarray:
    """High-contrast environment (broad bright sun) — the concave scene's
    default.  Occluding this sun in mirror directions is what gives the
    scene its measurable secondary-occlusion signal: with it, a renderer
    that ignores occlusion caps at ~26.6 dB vs GT (vs ~37 dB under the
    low-contrast ``env_radiance``), well below the model's convergence
    floor, so the ablation has headroom."""
    sky = np.array([0.5, 0.6, 0.8]) * (0.5 + 0.5 * d[..., 2:3])
    sun_dir = np.array([0.5, 0.3, 0.8])
    sun_dir = sun_dir / np.linalg.norm(sun_dir)
    sun = np.array([1.0, 0.95, 0.8]) * np.maximum(
        (d @ sun_dir), 0.0)[..., None] ** 8 * 6.0
    return (sky + sun).astype(np.float32)


_ENVS = {"default": env_radiance, "warm": env_radiance_warm,
         "bright": env_radiance_bright}


def write_env_latlong_exr(path: str, env_fn, height: int = 128):
    """Write an env function as a Blender-convention lat-long EXR so the
    emitter's ``relight_params`` can load it."""
    from ..utils.exr import write_exr

    h, w = height, 2 * height
    v = (np.arange(h) + 0.5) / h
    u = (np.arange(w) + 0.5) / w
    uu, vv = np.meshgrid(u, v)
    # Blender lat-long convention (matches models/light.py HDR init)
    theta = vv * math.pi
    phi = -(uu * 2.0 - 1.0) * math.pi
    d = np.stack([np.sin(theta) * np.cos(phi),
                  np.sin(theta) * np.sin(phi),
                  np.cos(theta)], -1)
    write_exr(path, env_fn(d).astype(np.float32))


def sphere_albedo(p: np.ndarray) -> np.ndarray:
    """Spatially-varying albedo on the sphere surface."""
    a = 0.5 + 0.5 * np.sin(6.0 * p[..., 0:1])
    b = 0.5 + 0.5 * np.sin(6.0 * p[..., 1:2] + 1.0)
    c = 0.5 + 0.5 * np.cos(6.0 * p[..., 2:3])
    return np.concatenate([0.8 * a, 0.6 * b, 0.7 * c], axis=-1).astype(np.float32)


# --------------------------------------------------------------------- #
# Concave SDF scene: sphere + torus union.  Unlike the convex sphere,
# this scene has real self-occlusion (the torus shadows the sphere's
# mirror directions and vice versa) and real interreflection (the gap
# between sphere and torus sees one-bounce radiance), so ground truth
# *depends* on the secondary-occlusion / indirect-radiance machinery the
# model implements (reference models/split_mixed_occ.py:179-222,306-332).
# --------------------------------------------------------------------- #

# Geometry/material/env chosen by sweep (RESULTS.md r4): under the
# "bright" env a renderer that ignores mirror-direction occlusion caps at
# ~26.6 dB PSNR vs this GT (vs 37 dB for the first-draft 0.35/0.55/0.13
# @ metallic 0.6 under the low-contrast env) — i.e. the secondary
# occlusion/indirect signal sits well above the model's convergence
# floor, so a with/without-secondary ablation is measurable.
CONCAVE_SPHERE_R = 0.45
CONCAVE_TORUS_R = 0.63  # major radius, torus lies in the z=0 plane
CONCAVE_TORUS_r = 0.17  # minor radius
CONCAVE_ROUGHNESS = 0.12  # < relighting_threshold: third bounce engages
CONCAVE_METALLIC = 0.95


def concave_sdf(p: np.ndarray) -> np.ndarray:
    """Exact SDF of the sphere+torus union, p: [...,3] -> [...]."""
    sphere = np.linalg.norm(p, axis=-1) - CONCAVE_SPHERE_R
    ring = np.hypot(p[..., 0], p[..., 1]) - CONCAVE_TORUS_R
    torus = np.hypot(ring, p[..., 2]) - CONCAVE_TORUS_r
    return np.minimum(sphere, torus)


def concave_normal(p: np.ndarray, eps: float = 1e-5) -> np.ndarray:
    """Central-difference SDF normal (robust across the union seam)."""
    offs = np.eye(3, dtype=p.dtype) * eps
    g = np.stack([concave_sdf(p + offs[i]) - concave_sdf(p - offs[i])
                  for i in range(3)], axis=-1)
    return g / np.maximum(np.linalg.norm(g, axis=-1, keepdims=True), 1e-12)


def sphere_trace_np(o: np.ndarray, d: np.ndarray, t0: float, t1: float,
                    iters: int = 128, eps: float = 5e-5):
    """Vectorized numpy sphere trace against ``concave_sdf`` with
    active-set compaction.  Returns (hit mask, t)."""
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    n = o.shape[0]
    t = np.full(n, t0, np.float64)
    hit = np.zeros(n, bool)
    active = np.arange(n)
    for _ in range(iters):
        if active.size == 0:
            break
        p = o[active] + t[active, None] * d[active]
        s = concave_sdf(p)
        t[active] += np.maximum(s, 0.0) * 0.9 + np.minimum(s, 0.0)
        newly_hit = s < eps
        hit[active[newly_hit]] = True
        escaped = t[active] > t1
        active = active[~(newly_hit | escaped)]
    return hit, t


_IRR_CACHE = {}


def _irradiance_map(env_fn, res: int = 24, n_quad: int = 48):
    """Cosine-convolved irradiance of ``env_fn`` on a lat-long grid of
    normals (precomputed once per env per process); returns a lookup
    closure ``irr(n) -> [...,3]`` (nearest-cell, smooth envs)."""
    key = id(env_fn)
    if key not in _IRR_CACHE:
        h, w = res, 2 * res
        theta_n = (np.arange(h) + 0.5) / h * math.pi
        phi_n = (np.arange(w) + 0.5) / w * 2 * math.pi
        tt, pp = np.meshgrid(theta_n, phi_n, indexing="ij")
        normals = np.stack([np.sin(tt) * np.cos(pp),
                            np.sin(tt) * np.sin(pp), np.cos(tt)], -1)
        # quadrature directions over the sphere (uniform lat-long weights)
        qt = (np.arange(n_quad) + 0.5) / n_quad * math.pi
        qp = (np.arange(2 * n_quad) + 0.5) / (2 * n_quad) * 2 * math.pi
        qtt, qpp = np.meshgrid(qt, qp, indexing="ij")
        dirs = np.stack([np.sin(qtt) * np.cos(qpp),
                         np.sin(qtt) * np.sin(qpp), np.cos(qtt)], -1)
        dirs = dirs.reshape(-1, 3)
        w_solid = (np.sin(qtt).reshape(-1) * (math.pi / n_quad)
                   * (math.pi / n_quad))
        rad = env_fn(dirs)  # [Q,3]
        cosw = np.clip(normals.reshape(-1, 3) @ dirs.T, 0.0, None)  # [N,Q]
        irr = (cosw * w_solid) @ rad / math.pi  # [N,3] (irradiance/pi)
        _IRR_CACHE[key] = irr.reshape(h, w, 3).astype(np.float32)

    table = _IRR_CACHE[key]
    h, w = table.shape[:2]

    def lookup(n):
        nz = np.clip(n[..., 2], -1.0, 1.0)
        theta = np.arccos(nz)
        phi = np.arctan2(n[..., 1], n[..., 0]) % (2 * math.pi)
        i = np.clip((theta / math.pi * h).astype(int), 0, h - 1)
        j = np.clip((phi / (2 * math.pi) * w).astype(int), 0, w - 1)
        return table[i, j]

    return lookup


def _shade_direct(p, n, wo, env_fn, irr, roughness, metallic,
                  spec_in=None):
    """Split-sum-flavored direct shading (linear RGB) shared by the
    primary and one-bounce passes.  ``spec_in`` overrides the specular
    incoming radiance (defaults to the unoccluded env at the mirror
    direction)."""
    alb = sphere_albedo(p)
    nov = np.clip(np.sum(n * wo, -1, keepdims=True), 0, 1)
    refl = 2 * nov * n - wo
    diff = (1 - metallic) * alb * irr(n)
    f0 = 0.04 * (1 - metallic) + metallic * alb
    fres = f0 + (1 - f0) * (1 - nov) ** 5
    if spec_in is None:
        spec_in = env_fn(refl)
    return diff + fres * spec_in, refl


def render_image_concave(c2w: np.ndarray, directions: np.ndarray,
                         env_fn=env_radiance):
    """One-bounce path-traced GT of the concave scene.

    Primary hit shaded split-sum style; the mirror ray is traced against
    the scene — if occluded, the specular term sees the *blocker's*
    direct shading (one-bounce interreflection) instead of the env.
    Returns (rgb [H,W,3], mask, albedo, rough, normal) like
    ``render_image``.
    """
    h, w = directions.shape[:2]
    d = directions @ c2w[:3, :3].T
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    d = d.reshape(-1, 3)
    o = np.broadcast_to(c2w[:, 3], d.shape).astype(np.float64)

    extent = CONCAVE_TORUS_R + CONCAVE_TORUS_r
    dist = np.linalg.norm(c2w[:, 3])
    hit, t = sphere_trace_np(o, d, max(dist - extent - 0.2, 0.0),
                             dist + extent + 0.2)
    p = o + t[:, None] * d
    n = concave_normal(p)
    irr = _irradiance_map(env_fn)

    rgb_lin = np.zeros((h * w, 3), np.float32)
    alb_full = np.zeros((h * w, 3), np.float32)
    nrm_full = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (h * w, 1))
    if hit.any():
        hp, hn, hd = p[hit], n[hit], d[hit]
        wo = -hd
        refl = 2 * np.clip(np.sum(hn * wo, -1, keepdims=True),
                           0, 1) * hn - wo
        # secondary: trace the mirror ray for occlusion / interreflection
        so = hp + 1e-3 * hn
        hit2, t2 = sphere_trace_np(so, refl, 1e-3, 4.0 * extent)
        q = so + t2[:, None] * refl
        spec_in = env_fn(refl.astype(np.float32))
        if hit2.any():
            nq = concave_normal(q[hit2])
            # one bounce: the blocker is shaded with the (unoccluded)
            # direct model — matches the model's third-bounce shading
            blocker_rgb, _ = _shade_direct(
                q[hit2], nq, -refl[hit2], env_fn, irr,
                CONCAVE_ROUGHNESS, CONCAVE_METALLIC)
            spec_in[hit2] = blocker_rgb
        full, _ = _shade_direct(hp, hn, wo, env_fn, irr,
                                CONCAVE_ROUGHNESS, CONCAVE_METALLIC,
                                spec_in=spec_in)
        rgb_lin[hit] = full
        alb_full[hit] = sphere_albedo(hp)
        nrm_full[hit] = hn

    srgb = np.where(rgb_lin <= 0.0031308, rgb_lin * 12.92,
                    1.055 * np.maximum(rgb_lin, 0.0031308) ** (1 / 2.4)
                    - 0.055)
    srgb = np.clip(srgb, 0, 1).reshape(h, w, 3)
    mask = hit.reshape(h, w).astype(np.float32)
    rgb = srgb * mask[..., None] + (1 - mask[..., None])  # white bg
    albedo = alb_full.reshape(h, w, 3)
    rough = (np.full((h, w, 1), CONCAVE_ROUGHNESS, np.float32)
             * mask[..., None])
    normal = nrm_full.reshape(h, w, 3)
    return (rgb.astype(np.float32), mask, albedo.astype(np.float32),
            rough, normal.astype(np.float32))


def render_image(c2w: np.ndarray, directions: np.ndarray,
                 roughness: float = 0.3, metallic: float = 0.5,
                 env_fn=env_radiance):
    """Ray-trace the sphere scene -> (rgb [H,W,3], mask, albedo, rough, normal)."""
    h, w = directions.shape[:2]
    d = directions @ c2w[:3, :3].T
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(c2w[:, 3], d.shape)

    b = np.sum(o * d, -1)
    c = np.sum(o * o, -1) - SPHERE_RADIUS ** 2
    disc = b * b - c
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0.0))
    hit &= t > 0
    p = o + t[..., None] * d
    n = p / SPHERE_RADIUS
    alb = sphere_albedo(p)
    wo = -d
    refl = 2 * np.sum(wo * n, -1, keepdims=True) * n - wo
    nov = np.clip(np.sum(n * wo, -1, keepdims=True), 0, 1)
    # crude split-sum-flavored shading: diffuse env + fresnel-weighted mirror
    diff = (1 - metallic) * alb * env_fn(n) * 0.7
    f0 = 0.04 * (1 - metallic) + metallic * alb
    fres = f0 + (1 - f0) * (1 - nov) ** 5
    spec = fres * env_fn(refl)
    rgb_lin = diff + spec
    srgb = np.where(rgb_lin <= 0.0031308, rgb_lin * 12.92,
                    1.055 * np.maximum(rgb_lin, 0.0031308) ** (1 / 2.4) - 0.055)
    srgb = np.clip(srgb, 0, 1)
    mask = hit.astype(np.float32)
    rgb = srgb * mask[..., None] + (1 - mask[..., None])  # white bg
    normal = np.where(hit[..., None], n, np.array([0.0, 0.0, 1.0]))
    # black background: comparable to the accumulated (opacity-
    # premultiplied) comp_albedo the eval produces, like TensoIR's EXR GT
    albedo = np.where(hit[..., None], alb, 0.0)
    rough = np.full((h, w, 1), roughness, np.float32) * mask[..., None]
    return (rgb.astype(np.float32), mask, albedo.astype(np.float32),
            rough, normal.astype(np.float32))


class SyntheticSplit:
    def __init__(self, config, split):
        self.config = config
        self.split = split
        self.has_mask = True
        self.apply_mask = True
        self.shape = str(config.get("shape", "sphere"))
        w, h = config.get("img_wh", [64, 64])
        self.w, self.h = int(w), int(h)
        self.img_wh = (self.w, self.h)
        self.near = float(config.get("near_plane", 2.0))
        self.far = float(config.get("far_plane", 6.0))
        n_images = int(config.get("n_images", 8))
        # default fov: object fills the frame (concave scene is wider)
        default_fov = 0.42 if self.shape == "concave" else 0.35
        fov = float(config.get("fov", default_fov))
        self.focal = 0.5 * self.w / math.tan(0.5 * fov)
        self.directions = get_ray_directions(
            self.w, self.h, self.focal, self.focal, self.w // 2, self.h // 2)
        seed = {"train": 0, "val": 1, "test": 2}.get(split, 3)
        self.all_c2w = camera_poses(
            n_images, seed=seed,
            phase=float(config.get("pose_phase", 0.0)))
        render = (render_image_concave if self.shape == "concave"
                  else render_image)
        # training-time env: the concave scene defaults to the
        # high-contrast "bright" sun (see env_radiance_bright docstring)
        default_env = "bright" if self.shape == "concave" else "default"
        self.env_name = str(config.get("env", default_env))
        train_env = _ENVS[self.env_name]
        imgs, masks, albs, roughs, normals = [], [], [], [], []
        for i in range(n_images):
            rgb, m, a, r, nrm = render(self.all_c2w[i], self.directions,
                                       env_fn=train_env)
            imgs.append(rgb)
            masks.append(m)
            albs.append(a)
            roughs.append(r)
            normals.append(nrm)
        self.all_images = np.stack(imgs)
        self.all_fg_masks = np.stack(masks)
        self.all_albedo = np.stack(albs)
        self.all_roughness = np.stack(roughs)
        self.all_normals = np.stack(normals)
        # relighting GT: re-render under alternate analytic envs and dump
        # each env as a lat-long EXR under hdr_filepath so the emitter's
        # relight path can load it (reference TensoIR relight protocol)
        self.relight_images = {}
        relight_list = list(config.get("relight_list", []) or [])
        # only the test split's relight GT is ever consumed
        # (systems/split_occ.py test protocol) — skip the per-view analytic
        # re-render for train/val splits
        if relight_list and split == "test":
            hdr_dir = config.get("hdr_filepath") or "/tmp/synthetic_envmaps"
            os.makedirs(hdr_dir, exist_ok=True)
            for light in relight_list:
                env_fn = _ENVS[light]
                exr_path = os.path.join(hdr_dir, f"{light}.exr")
                # always overwrite: a stale EXR from an earlier run (other
                # env fn / height / convention) would silently skew relight
                # metrics while the GT images are re-rendered analytically
                write_env_latlong_exr(exr_path, env_fn)
                rel = [render(self.all_c2w[i], self.directions,
                              env_fn=env_fn)[0]
                       for i in range(n_images)]
                self.relight_images[light] = np.stack(rel)

    def __len__(self):
        return len(self.all_images)


@register("synthetic-sphere")
class SyntheticDataModule:
    def __init__(self, config):
        self.config = config

    def split(self, name):
        return SyntheticSplit(self.config, name)

    def train(self):
        return self.split("train")

    def val(self):
        return self.split("val")

    def test(self):
        return self.split("test")


@register("synthetic-concave")
class ConcaveDataModule(SyntheticDataModule):
    """Sphere+torus union with one-bounce GT — self-occlusion and
    interreflection the convex sphere cannot exercise."""

    def __init__(self, config):
        config["shape"] = "concave"
        super().__init__(config)
