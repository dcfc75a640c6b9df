"""Batched fixed-iteration sphere tracing on a learned SDF.

A TPU-native *fast eval* path with no reference analog (the reference
always volume-renders, ``models/split_mixed_occ.py:230-333``): once the
surface is converged (inv_s >~ 500) the NeuS weights collapse onto the
zero crossing, so a direct root find replaces the 16-64 samples/ray
volumetric eval with ~``n_iters`` batched SDF probes shared by the whole
chunk — every iteration is one [R] hash-encode+MLP eval, no sample
buffers, no compaction, no segmented scans.

Fixed iteration counts + masked lanes (no data-dependent control flow)
keep the whole trace inside one XLA computation; a secant refinement
brackets the crossing to ~1e-3 cells in 4 extra probes.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .march import ray_aabb_intersect


class TraceResult(NamedTuple):
    t_hit: jnp.ndarray      # [R] parameter of the surface crossing
    hit: jnp.ndarray        # [R] bool: converged onto a crossing
    converged: jnp.ndarray  # [R] bool: ray resolved (hit OR exited the
    #                             AABB) — ``~converged`` rays ran out of
    #                             iterations inside the volume and need
    #                             the volumetric fallback
    sdf_last: jnp.ndarray   # [R] SDF value at t_hit (diagnostic)
    sdf_min: jnp.ndarray    # [R] minimum SDF seen over every probe of
    #                             the trace — a MISS ray's closest
    #                             approach; sdf_min * inv_s >> 1 means
    #                             the ray carries no NeuS weight mass
    #                             anywhere (used by the occupancy
    #                             tunneling guard's clearance gate)


def sphere_trace(rays_o: jnp.ndarray, rays_d: jnp.ndarray, *,
                 sdf_fn: Callable[[jnp.ndarray], jnp.ndarray],
                 aabb_min, aabb_max, n_iters: int = 48,
                 refine_iters: int = 4, hit_eps: float = 1e-3,
                 relax: float = 0.9) -> TraceResult:
    """March ``t += relax * sdf`` from the AABB entry until the SDF
    drops below ``hit_eps`` (arrival) or goes negative (overshoot —
    bracketed and refined by false position), with everything masked
    and fixed-size.

    ``relax`` < 1 guards learned SDFs whose eikonal residual makes them
    slightly over-unit; rays_d must be unit-norm.
    """
    t_near, t_far = ray_aabb_intersect(rays_o, rays_d, aabb_min, aabb_max)
    inside = t_near <= t_far
    t0 = jnp.where(inside, t_near, t_far)

    def probe(t):
        return sdf_fn(rays_o + rays_d * t[:, None])

    s0 = jnp.where(inside, probe(t0), jnp.inf)

    def step(carry, _):
        t, s, t_lo, s_lo, s_min, done = carry
        arrived = s < hit_eps          # includes overshoot (s < 0)
        done_now = done | arrived | (t > t_far)
        # last strictly-positive probe becomes the bracket floor
        adv = ~done_now
        t_lo = jnp.where(adv, t, t_lo)
        s_lo = jnp.where(adv, s, s_lo)
        t_new = jnp.where(adv, t + relax * s, t)
        s_new = jnp.where(done_now, s, probe(t_new))
        return (t_new, s_new, t_lo, s_lo, jnp.minimum(s_min, s_new),
                done_now | done), None

    carry = (t0, s0, t0, s0, s0, ~inside)
    carry, _ = jax.lax.scan(step, carry, None, length=n_iters)
    t, s, t_lo, s_lo, s_min, _ = carry

    # refinement: false position on bracketed crossings (s_lo > 0 > s);
    # arrivals that stopped short (0 <= s < hit_eps, never crossed)
    # close the residual gap with full un-relaxed t += s steps — one
    # shared probe per iteration serves both cases
    arrived_short = (s >= 0.0) & (s < hit_eps) & inside
    bracketed = (s < 0.0) & (s_lo > 0.0)
    t_hi, s_hi = t, s
    for _ in range(refine_iters):
        denom = s_lo - s_hi
        t_fp = jnp.where(jnp.abs(denom) > 1e-12,
                         t_lo + s_lo * (t_hi - t_lo) / denom,
                         0.5 * (t_lo + t_hi))
        t_cand = jnp.where(bracketed, t_fp,
                           jnp.where(arrived_short, t + s, t))
        active = bracketed | arrived_short
        s_cand = jnp.where(active, probe(t_cand), s)
        neg = s_cand < 0.0
        t_hi = jnp.where(bracketed & neg, t_cand, t_hi)
        s_hi = jnp.where(bracketed & neg, s_cand, s_hi)
        t_lo = jnp.where(bracketed & ~neg, t_cand, t_lo)
        s_lo = jnp.where(bracketed & ~neg, s_cand, s_lo)
        # a short-arrival step that overshoots becomes a bracket
        t_lo = jnp.where(arrived_short & neg, t, t_lo)
        s_lo = jnp.where(arrived_short & neg, s, s_lo)
        t_hi = jnp.where(arrived_short & neg, t_cand, t_hi)
        s_hi = jnp.where(arrived_short & neg, s_cand, s_hi)
        bracketed = bracketed | (arrived_short & neg)
        arrived_short = arrived_short & ~neg
        t = jnp.where(active, t_cand, t)
        s = jnp.where(active, s_cand, s)

    hit = inside & (s < hit_eps) & (t <= t_far)
    exited = t > t_far
    converged = ~inside | hit | exited
    return TraceResult(t_hit=t, hit=hit, converged=converged, sdf_last=s,
                       sdf_min=jnp.minimum(s_min, s))
