"""Camera ray helpers (reference models/ray_utils.py)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def get_ray_directions(w, h, fx, fy, cx, cy, use_pixel_centers=True,
                       openGL_camera=True) -> np.ndarray:
    """[H, W, 3] camera-space directions (reference ray_utils.py:9-29)."""
    pc = 0.5 if use_pixel_centers else 0.0
    i, j = np.meshgrid(
        np.arange(w, dtype=np.float32) + pc,
        np.arange(h, dtype=np.float32) + pc,
        indexing="xy",
    )
    z = -np.ones_like(i) if openGL_camera else np.ones_like(i)
    return np.stack([(i - cx) / fx, -(j - cy) / fy, z], -1)


def get_rays(directions, c2w):
    """Rotate/translate camera rays to world (reference ray_utils.py:32-56).

    directions: [N,3] with c2w [N,3,4], or [H,W,3] with c2w [3,4].
    Returns flattened (rays_o, rays_d) [M,3].
    """
    if directions.ndim == 2:
        rays_d = (directions[:, None, :] * c2w[:, :3, :3]).sum(-1)
        rays_o = jnp.broadcast_to(c2w[:, :, 3], rays_d.shape)
    else:
        rays_d = (directions[:, :, None, :] * c2w[None, None, :3, :3]).sum(-1)
        rays_o = jnp.broadcast_to(c2w[None, None, :, 3], rays_d.shape)
    return rays_o.reshape(-1, 3), rays_d.reshape(-1, 3)
