"""Generic volume-rendering drivers — the full reference driver family.

The reference ships seven near-duplicate ~200-line drivers
(``models/volrend.py``: ``rendering``, ``secondary_rendering``,
``rendering_with_normals``, ``rendering_with_normals_sdf``,
``rendering_with_normals_mats``, ``rendering_with_normals_mats_sdf``,
``rendering_with_normals_mats_sdf_dir``) differing only in which
per-sample channels they accumulate and which extras (sdf, grads,
laplace) they thread through.  The shipped pipeline uses only the
``_sdf`` variant + ``secondary_rendering`` (those live fused inside the
models); this module exposes the whole family over the padded-native
sample layout so the reference API surface is complete: each driver is
the generic channel accumulation with the variant's channel set.

Drivers take a ``RaySamples`` buffer (``ops/march.py``) and a
``field_fn(t_starts, t_ends, ray_indices) -> dict`` that returns
per-sample channels — the analog of the reference's
``rgb_alpha_fn``/``rgb_sigma_fn`` callables.  Required keys per driver:

=============================== ========================================
rendering                        rgb, alpha (or sigma)
rendering_with_normals           + normal
rendering_with_normals_sdf       + sdf, sdf_grad (laplace optional)
rendering_with_normals_mats      + albedo, roughness, metallic
rendering_with_normals_mats_sdf  union of the above
..._mats_sdf_dir                 + the view direction passthrough
=============================== ========================================
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax.numpy as jnp

from . import volrend
from .march import RaySamples


def _alpha_from(field_out, dists):
    if "alpha" in field_out:
        return field_out["alpha"]
    sigma = field_out["sigma"]
    return 1.0 - jnp.exp(-sigma * dists)


def _render(rs: RaySamples, field_fn: Callable, n_rays: int,
            channel_keys, render_bkgd=None,
            extras_keys=()) -> Dict[str, jnp.ndarray]:
    dists = rs.t_ends - rs.t_starts
    out = field_fn(rs.t_starts, rs.t_ends, rs.ray_indices)
    alpha = jnp.where(rs.valid, _alpha_from(out, dists), 0.0)
    weights, trans = volrend.render_weight_from_alpha(
        alpha, rs.ray_start, rs.ray_indices, rs.valid, n_rays)

    chans, widths, names = [], [], []
    for k in channel_keys:
        v = out[k]
        v = v[:, None] if v.ndim == 1 else v
        chans.append(v)
        widths.append(v.shape[-1])
        names.append(k)
    t_mid = 0.5 * (rs.t_starts + rs.t_ends)
    chans += [t_mid[:, None], jnp.ones_like(t_mid)[:, None]]
    packed = jnp.concatenate(chans, axis=-1)
    acc = volrend.accumulate_along_rays(weights, rs.ray_indices, packed,
                                        n_rays)
    res = {}
    i = 0
    for k, d in zip(names, widths):
        res[f"comp_{k}"] = acc[:, i:i + d]
        i += d
    depth = acc[:, i:i + 1]
    opacity = acc[:, i + 1:i + 2]
    res.update({"depth": depth, "opacity": opacity, "weights": weights,
                "trans": trans, "alphas": alpha,
                "ray_included": rs.ray_included})
    if render_bkgd is not None and "comp_rgb" in res:
        res["comp_rgb"] = res["comp_rgb"] + render_bkgd[None, :] \
            * (1.0 - opacity)
    for k in extras_keys:
        if k in out:
            res[f"{k}_samples"] = out[k]
    return res


def rendering(rs, field_fn, n_rays, render_bkgd=None):
    """nerfacc-style base driver (reference volrend.py:129)."""
    return _render(rs, field_fn, n_rays, ["rgb"], render_bkgd)


def rendering_with_normals(rs, field_fn, n_rays, render_bkgd=None):
    """+ accumulated normals (reference volrend.py:298)."""
    return _render(rs, field_fn, n_rays, ["rgb", "normal"], render_bkgd)


def rendering_with_normals_sdf(rs, field_fn, n_rays, render_bkgd=None):
    """+ sdf/grad/laplace extras threaded through (reference :739)."""
    return _render(rs, field_fn, n_rays, ["rgb", "normal"], render_bkgd,
                   extras_keys=("sdf", "sdf_grad", "laplace"))


def rendering_with_normals_mats(rs, field_fn, n_rays, render_bkgd=None):
    """+ accumulated albedo/roughness/metallic maps (reference :482)."""
    return _render(rs, field_fn, n_rays,
                   ["rgb", "normal", "albedo", "roughness", "metallic"],
                   render_bkgd)


def rendering_with_normals_mats_sdf(rs, field_fn, n_rays,
                                    render_bkgd=None):
    """mats + sdf extras (reference :898)."""
    return _render(rs, field_fn, n_rays,
                   ["rgb", "normal", "albedo", "roughness", "metallic"],
                   render_bkgd,
                   extras_keys=("sdf", "sdf_grad", "laplace"))


def rendering_with_normals_mats_sdf_dir(rs, field_fn, n_rays, dirs,
                                        render_bkgd=None):
    """mats + sdf extras + per-sample view dirs passthrough (reference
    :1110): ``dirs`` [n_rays, 3] gathered to samples and returned."""
    res = rendering_with_normals_mats_sdf(rs, field_fn, n_rays, render_bkgd)
    ridx = jnp.clip(rs.ray_indices, 0, n_rays - 1)
    res["dirs_samples"] = dirs[ridx]
    return res


def secondary_rendering(rs, alpha_fn, n_rays):
    """Opacity + depth only (reference volrend.py:18-127): transmittance
    view of the field without color accumulation."""
    dists = rs.t_ends - rs.t_starts
    out = alpha_fn(rs.t_starts, rs.t_ends, rs.ray_indices)
    alpha = jnp.where(rs.valid, _alpha_from(out, dists), 0.0)
    weights, trans = volrend.render_weight_from_alpha(
        alpha, rs.ray_start, rs.ray_indices, rs.valid, n_rays)
    t_mid = 0.5 * (rs.t_starts + rs.t_ends)
    packed = jnp.stack([t_mid, jnp.ones_like(t_mid)], -1)
    acc = volrend.accumulate_along_rays(weights, rs.ray_indices, packed,
                                        n_rays)
    return {"depth": acc[:, 0:1], "opacity": acc[:, 1:2],
            "transmittance": 1.0 - acc[:, 1:2]}
