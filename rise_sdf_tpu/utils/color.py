"""Color-space transforms (reference lib/pbr/utils/nvdiffrecmc_util.py:95-113
and systems/split_occ.py:21-36)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rgb_to_srgb(f):
    return jnp.where(
        f <= 0.0031308,
        f * 12.92,
        jnp.power(jnp.clip(f, 0.0031308, None), 1.0 / 2.4) * 1.055 - 0.055,
    )


def srgb_to_rgb(f):
    return jnp.where(
        f <= 0.04045,
        f / 12.92,
        jnp.power((jnp.clip(f, 0.04045, None) + 0.055) / 1.055, 2.4),
    )


def linear_to_srgb_np(linear: np.ndarray) -> np.ndarray:
    eps = np.finfo(np.float32).eps
    srgb0 = 323 / 25 * linear
    srgb1 = (211 * np.maximum(eps, linear) ** (5 / 12) - 11) / 200
    return np.where(linear <= 0.0031308, srgb0, srgb1)
