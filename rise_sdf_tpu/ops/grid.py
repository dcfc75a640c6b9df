"""Occupancy grid state + EMA update (nerfacc OccGridEstimator equivalent).

Reference semantics (vendored nerfacc ``lib/nerfacc/grid.py:196-277``):
every 16 steps evaluate candidate cells, EMA ``occs = max(occs*0.95, occ)``,
binarize at ``occs > min(mean(occs), occ_thre)``.  The reference subsamples
cells after a warmup; on TPU we evaluate *all* cells every update — it is a
dense batched field eval (MXU-friendly) and keeps shapes static.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class OccupancyGridState(NamedTuple):
    occs: jnp.ndarray    # [res^3] float32 EMA occupancy
    binary: jnp.ndarray  # [res^3] bool


def init_grid(resolution: int = 128) -> OccupancyGridState:
    n = resolution ** 3
    return OccupancyGridState(
        occs=jnp.zeros((n,), jnp.float32),
        binary=jnp.ones((n,), bool),  # fully occupied until first update
    )


def cell_positions(resolution: int, aabb_min, aabb_max, rng=None):
    """World positions of all cells (jittered uniformly inside each cell)."""
    r = resolution
    idx = jnp.arange(r ** 3, dtype=jnp.int32)
    k = idx % r
    j = (idx // r) % r
    i = idx // (r * r)
    ijk = jnp.stack([i, j, k], axis=-1).astype(jnp.float32)
    if rng is not None:
        u = jax.random.uniform(rng, ijk.shape)
    else:
        u = 0.5
    unit = (ijk + u) / r
    return aabb_min + unit * (aabb_max - aabb_min)


def update_grid(state: OccupancyGridState, occ_new: jnp.ndarray,
                occ_thre: float = 0.01,
                ema_decay: float = 0.95) -> OccupancyGridState:
    """EMA + binarize given freshly evaluated per-cell occupancies [res^3]."""
    occs = jnp.maximum(state.occs * ema_decay, occ_new)
    thre = jnp.minimum(occs.mean(), occ_thre)
    return OccupancyGridState(occs=occs, binary=occs > thre)
