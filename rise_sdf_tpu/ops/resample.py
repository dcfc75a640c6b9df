"""Importance resampling along rays (CDF inversion).

Equivalent of the vendored nerfacc ``ray_resampling``
(``lib/nerfacc/cdf.py``, ``csrc/cdf.cu``) — unused by the reference's
shipped configs but part of its kernel surface; useful for hierarchical
sampling experiments.  Padded/masked formulation: every ray resamples a
fixed ``n_new`` intervals from its weight distribution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ray_resampling(t_starts, t_ends, weights, live, n_new: int,
                   rng=None, padding: float = 0.01):
    """Resample per-ray intervals proportionally to ``weights``.

    t_starts/t_ends/weights/live: [R, S].  Returns (new_t_starts,
    new_t_ends) with shape [R, n_new].  ``padding`` adds a uniform floor
    (the reference's un-normalized background interval) so empty regions
    keep non-zero probability.
    """
    r, s = weights.shape
    w = jnp.where(live, jnp.maximum(weights, 0.0), 0.0) + padding / s
    cdf = jnp.cumsum(w, axis=1)
    cdf = cdf / cdf[:, -1:]
    cdf = jnp.concatenate([jnp.zeros((r, 1)), cdf], axis=1)  # [R, S+1]

    if rng is not None:
        u = (jnp.arange(n_new)[None, :]
             + jax.random.uniform(rng, (r, n_new))) / n_new
    else:
        u = jnp.broadcast_to(
            (jnp.arange(n_new)[None, :] + 0.5) / n_new, (r, n_new))

    # invert the CDF per ray
    idx = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(
        cdf, u)
    idx = jnp.clip(idx - 1, 0, s - 1)
    c0 = jnp.take_along_axis(cdf, idx, axis=1)
    c1 = jnp.take_along_axis(cdf, idx + 1, axis=1)
    frac = (u - c0) / jnp.maximum(c1 - c0, 1e-12)
    ts = jnp.take_along_axis(t_starts, idx, axis=1)
    te = jnp.take_along_axis(t_ends, idx, axis=1)
    t = ts + frac * (te - ts)
    # convert point samples to contiguous intervals via midpoints
    mids = 0.5 * (t[:, 1:] + t[:, :-1])
    new_ts = jnp.concatenate([t[:, :1], mids], axis=1)
    new_te = jnp.concatenate([mids, t[:, -1:]], axis=1)
    return new_ts, new_te
