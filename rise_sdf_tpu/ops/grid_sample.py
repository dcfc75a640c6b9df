"""Differentiable 2D/3D grid_sample (align_corners=True, border padding).

Replaces the vendored second-order CUDA ``grid_sample`` extension
(reference ``lib/grid_sample_grad2/``, ``utils/cuda_gridsample.py``):
torch's native grid_sample has no double-backward, so the reference
vendors custom kernels; in JAX a gather+lerp formulation is arbitrarily
differentiable by construction.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample_2d(image, grid):
    """image: [H, W, C]; grid: [..., 2] in [-1, 1] (x, y). -> [..., C]."""
    h, w = image.shape[0], image.shape[1]
    fx = (grid[..., 0] * 0.5 + 0.5) * (w - 1)
    fy = (grid[..., 1] * 0.5 + 0.5) * (h - 1)
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    wx = jnp.clip(fx - x0, 0.0, 1.0)[..., None]
    wy = jnp.clip(fy - y0, 0.0, 1.0)[..., None]
    top = image[y0, x0] * (1 - wx) + image[y0, x1] * wx
    bot = image[y1, x0] * (1 - wx) + image[y1, x1] * wx
    return top * (1 - wy) + bot * wy


def grid_sample_3d(volume, grid):
    """volume: [D, H, W, C]; grid: [..., 3] in [-1, 1] (x, y, z) with x ->
    W axis (torch convention). -> [..., C]."""
    d, h, w = volume.shape[0], volume.shape[1], volume.shape[2]
    fx = (grid[..., 0] * 0.5 + 0.5) * (w - 1)
    fy = (grid[..., 1] * 0.5 + 0.5) * (h - 1)
    fz = (grid[..., 2] * 0.5 + 0.5) * (d - 1)
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, h - 1)
    z0 = jnp.clip(jnp.floor(fz).astype(jnp.int32), 0, d - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    z1 = jnp.clip(z0 + 1, 0, d - 1)
    wx = jnp.clip(fx - x0, 0.0, 1.0)[..., None]
    wy = jnp.clip(fy - y0, 0.0, 1.0)[..., None]
    wz = jnp.clip(fz - z0, 0.0, 1.0)[..., None]

    def at(zi, yi, xi):
        return volume[zi, yi, xi]

    c00 = at(z0, y0, x0) * (1 - wx) + at(z0, y0, x1) * wx
    c01 = at(z0, y1, x0) * (1 - wx) + at(z0, y1, x1) * wx
    c10 = at(z1, y0, x0) * (1 - wx) + at(z1, y0, x1) * wx
    c11 = at(z1, y1, x0) * (1 - wx) + at(z1, y1, x1) * wx
    c0 = c00 * (1 - wy) + c01 * wy
    c1 = c10 * (1 - wy) + c11 * wy
    return c0 * (1 - wz) + c1 * wz
