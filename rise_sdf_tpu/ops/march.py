"""Padded, masked ray marching with fixed-capacity compaction.

TPU-native replacement for nerfacc's occupancy-grid sampler
(reference: ``lib/nerfacc/cuda/csrc/ray_marching.cu``,
``OccGridEstimator.sampling`` in nerfacc 0.5.3, used at
``models/split_mixed_occ.py:264-272``).  Instead of the GPU two-pass
count/compact kernel with dynamic output shapes, we:

1. generate a static ``[R, S]`` grid of candidate intervals per ray
   (stratified offset per ray),
2. mask candidates by AABB range and a binary occupancy-grid lookup,
3. compact live samples into a fixed-capacity ray-major buffer with a
   cumsum + scatter (``mode='drop'``); rays whose samples overflow the
   buffer are flagged excluded so the training loss can ignore them —
   this *is* the TPU analog of the reference's dynamic ray-count
   adaptation (``systems/split_occ.py:159-161``): when the scene is
   dense, fewer rays fit the fixed sample budget.

All shapes are static; everything jits.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


def ray_aabb_intersect(rays_o, rays_d, aabb_min, aabb_max):
    """Slab test. Returns (t_near, t_far); miss encoded as t_near > t_far.

    Mirrors nerfacc ``csrc/intersection.cu`` semantics: t_near clamped >= 0.
    """
    inv_d = 1.0 / jnp.where(jnp.abs(rays_d) > 1e-10, rays_d,
                            jnp.where(rays_d >= 0, 1e-10, -1e-10))
    t0 = (aabb_min - rays_o) * inv_d
    t1 = (aabb_max - rays_o) * inv_d
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    t_near = jnp.maximum(t_near, 0.0)
    return t_near, t_far


class RaySamples(NamedTuple):
    """Compacted ray-major sample buffer (all arrays length ``capacity``)."""

    t_starts: jnp.ndarray      # [C]
    t_ends: jnp.ndarray        # [C]
    ray_indices: jnp.ndarray   # [C] int32; == n_rays for empty slots
    valid: jnp.ndarray         # [C] bool
    ray_start: jnp.ndarray     # [R] int32 buffer offset of each ray's samples
    ray_count: jnp.ndarray     # [R] int32 live samples per ray (pre-drop)
    ray_included: jnp.ndarray  # [R] bool: all live samples made it into buffer
    num_live: jnp.ndarray      # [] int32 total live samples before dropping


def pack_occupancy_bits(binary):
    """[M] bool -> [M/32] uint32 words (M must be a multiple of 32)."""
    bits = binary.reshape(-1, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(bits << shifts[None, :], axis=1, dtype=jnp.uint32)


def occupancy_lookup(binary, positions, aabb_min, aabb_max, resolution):
    """Binary occupancy test of world positions against a [res^3] bitfield.

    The bool field is packed to uint32 words in-graph so the gathered
    table is 32x smaller (VMEM-resident at 128^3), which is the fast
    regime for TPU gathers; the packing itself is cheap elementwise work
    and CSE'd across lookups within one jit.
    """
    words = pack_occupancy_bits(binary)
    u = (positions - aabb_min) / (aabb_max - aabb_min)
    idx = jnp.floor(u * resolution).astype(jnp.int32)
    inside = jnp.all((idx >= 0) & (idx < resolution), axis=-1)
    idx = jnp.clip(idx, 0, resolution - 1)
    flat = (idx[..., 0] * resolution + idx[..., 1]) * resolution + idx[..., 2]
    w = words[flat >> 5]
    bit = (w >> (flat & 31).astype(jnp.uint32)) & jnp.uint32(1)
    return jnp.where(inside, bit == 1, False)


def candidate_intervals(rays_o, rays_d, t_near, t_far, step_size, num_samples,
                        rng: Optional[jax.Array] = None,
                        near_plane: Optional[float] = None,
                        far_plane: Optional[float] = None,
                        cone_angle: float = 0.0,
                        dt_max: float = 1e10):
    """[R,S] stratified candidate intervals along each ray.

    ``cone_angle > 0`` reproduces nerfacc's growing steps
    (``lib/nerfacc/cuda/csrc/ray_marching.cu:9-14``): the k-th step is
    ``clamp(t_k * cone_angle, step_size, dt_max)`` — uniform near the
    camera, geometric growth beyond ``step_size / cone_angle``.  The
    shipped configs all use 0.0 (uniform), which keeps the closed-form
    fast path.
    """
    n_rays = rays_o.shape[0]
    if near_plane is not None:
        t_near = jnp.maximum(t_near, near_plane)
    if far_plane is not None:
        t_far = jnp.minimum(t_far, far_plane)
    if rng is not None:
        u = jax.random.uniform(rng, (n_rays, 1))
    else:
        u = jnp.zeros((n_rays, 1)) + 0.5
    if cone_angle and cone_angle > 0.0:
        def step_fn(t, _):
            dt = jnp.clip(t * cone_angle, step_size, dt_max)
            return t + dt, (t, dt)

        _, (t_lo, dts) = jax.lax.scan(step_fn, t_near,
                                      None, length=num_samples)
        t_lo, dts = t_lo.T, dts.T                    # [R, S]
        t0 = t_lo + u * dts                          # jitter inside each step
        t_starts = t0 - 0.5 * dts
        t_ends = t0 + 0.5 * dts
    else:
        steps = jnp.arange(num_samples, dtype=jnp.float32)[None, :]
        t0 = t_near[:, None] + (steps + u) * step_size
        t_starts = t0 - 0.5 * step_size
        t_ends = t0 + 0.5 * step_size
    in_range = (t0 >= t_near[:, None]) & (t0 < t_far[:, None])
    return t_starts, t_ends, in_range


def march_rays(rays_o, rays_d, *, aabb_min, aabb_max, step_size, num_samples,
               capacity, grid_binary=None, grid_resolution=128,
               rng: Optional[jax.Array] = None,
               near_plane: Optional[float] = None,
               far_plane: Optional[float] = None,
               t_cut: Optional[jnp.ndarray] = None,
               t_band_lo: Optional[jnp.ndarray] = None,
               band_k: Optional[int] = None,
               cone_angle: float = 0.0,
               dt_max: float = 1e10) -> RaySamples:
    """Occupancy-pruned marching, compacted to a fixed-size buffer.

    ``t_cut`` ([R], optional) is a per-ray visibility cut distance
    (from :func:`compute_visibility_cut`): candidates at ``t_mid >=
    t_cut`` are occluded (transmittance below the early-stop eps) and
    dropped before compaction — the TPU analog of nerfacc's ``alpha_fn``
    prefilter + early termination during marching (reference
    ``models/split_mixed_occ.py:264-272``,
    ``lib/nerfacc/vol_rendering.py:453-520``).

    ``t_band_lo`` ([R], optional) additionally drops candidates *before*
    that distance — the banded surface-eval mode: with a converged sharp
    surface the NeuS weight mass lives in a thin band ending at
    ``t_cut``, so eval restricts samples to ``[t_band_lo, t_cut)`` and a
    much smaller ``capacity`` suffices.  Rays without a finite cut
    (background / semi-transparent) pass ``-inf`` and keep the full
    candidate set.

    ``band_k`` (static int, optional; requires ``t_cut``+``t_band_lo``):
    exact-K band sampling — each ray with a *finite* band is given
    exactly ``band_k`` uniform samples spanning its own band (per-ray
    step ``width / band_k``) instead of fine-step candidates masked to
    the band.  Every banded ray then contributes exactly ``band_k``
    samples regardless of how wide its band is, so a capacity of
    ``n_rays * band_k`` can never overflow from banded rays — the
    fine-step variant drops whole rays whenever a band is wider than
    the per-ray budget (coarser probes / larger margins widen bands).
    The NeuS section-CDF alpha is exact for any interval over a locally
    linear SDF, so the wider per-sample intervals stay principled.
    Rays without a finite band keep the global candidate grid.
    """
    n_rays = rays_o.shape[0]
    t_near, t_far = ray_aabb_intersect(rays_o, rays_d, aabb_min, aabb_max)
    t_starts, t_ends, live = candidate_intervals(
        rays_o, rays_d, t_near, t_far, step_size, num_samples, rng,
        near_plane, far_plane, cone_angle, dt_max,
    )
    if band_k is not None and t_cut is not None and t_band_lo is not None:
        k = min(int(band_k), num_samples)
        tn, tf = t_near, t_far
        if near_plane is not None:
            tn = jnp.maximum(tn, near_plane)
        if far_plane is not None:
            tf = jnp.minimum(tf, far_plane)
        big = jnp.asarray(1e9, t_cut.dtype)
        lo = jnp.maximum(t_band_lo, tn)
        hi = jnp.minimum(t_cut, tf)
        finite = (t_cut < big) & (t_band_lo > -big) & (hi > lo)
        step_b = (hi - lo) / k                       # [R]
        if rng is not None:
            ub = jax.random.uniform(jax.random.fold_in(rng, 1),
                                    (n_rays, 1))
        else:
            ub = jnp.zeros((n_rays, 1)) + 0.5
        steps = jnp.arange(num_samples, dtype=jnp.float32)[None, :]
        t0b = lo[:, None] + (steps + ub) * step_b[:, None]
        f = finite[:, None]
        t_starts = jnp.where(f, t0b - 0.5 * step_b[:, None], t_starts)
        t_ends = jnp.where(f, t0b + 0.5 * step_b[:, None], t_ends)
        live = jnp.where(f, steps < k, live)

    t_mid = 0.5 * (t_starts + t_ends)
    if t_cut is not None:
        live = live & (t_mid < t_cut[:, None])
    if t_band_lo is not None:
        live = live & (t_mid >= t_band_lo[:, None])
    if grid_binary is not None:
        pos = rays_o[:, None, :] + rays_d[:, None, :] * t_mid[..., None]
        occ = occupancy_lookup(grid_binary, pos, aabb_min, aabb_max,
                               grid_resolution)
        live = live & occ

    # ---- compaction (ray-major flatten preserves per-ray ordering) ---- #
    flat_live = live.reshape(-1)
    flat_ts = t_starts.reshape(-1)
    flat_te = t_ends.reshape(-1)
    flat_ray = jnp.repeat(jnp.arange(n_rays, dtype=jnp.int32), num_samples)

    pos_in_buf = jnp.cumsum(flat_live.astype(jnp.int32)) - 1
    num_live = jnp.where(flat_live.shape[0] > 0,
                         pos_in_buf[-1] + 1, 0).astype(jnp.int32)
    ok = flat_live & (pos_in_buf < capacity)
    dest = jnp.where(ok, pos_in_buf, capacity)

    buf_ts = jnp.zeros((capacity,), flat_ts.dtype).at[dest].set(
        flat_ts, mode="drop")
    buf_te = jnp.zeros((capacity,), flat_te.dtype).at[dest].set(
        flat_te, mode="drop")
    buf_ray = jnp.full((capacity,), n_rays, jnp.int32).at[dest].set(
        flat_ray, mode="drop")
    n_in_buf = jnp.minimum(num_live, capacity)
    buf_valid = jnp.arange(capacity) < n_in_buf

    ray_count = live.sum(axis=1).astype(jnp.int32)
    ray_end = jnp.cumsum(ray_count)
    ray_start = (ray_end - ray_count).astype(jnp.int32)
    ray_included = ray_end <= capacity

    return RaySamples(
        t_starts=buf_ts, t_ends=buf_te, ray_indices=buf_ray, valid=buf_valid,
        ray_start=jnp.minimum(ray_start, capacity).astype(jnp.int32),
        ray_count=ray_count, ray_included=ray_included, num_live=num_live,
    )


def compute_visibility_cut(rays_o, rays_d, *, sdf_fn, inv_s, aabb_min,
                           aabb_max, step_size, num_samples, capacity,
                           grid_binary=None, grid_resolution=128,
                           stride: int = 4, cos_anneal_ratio=1.0,
                           early_stop_eps: float = 1e-4,
                           margin_intervals: float = 1.0,
                           band: bool = False):
    """Per-ray transmittance cut distance from a cheap coarse SDF probe.

    TPU-native equivalent of the reference marcher's ``alpha_fn``
    visibility prefilter with transmittance early termination
    (``models/split_mixed_occ.py:228-240`` + nerfacc ``render_visibility``
    with ``early_stop_eps=1e-4``, ``lib/nerfacc/vol_rendering.py:453-520``):
    instead of evaluating alpha for every candidate sample sequentially,
    march a *coarse* grid (``stride`` fine steps per probe), evaluate the
    SDF forward-only, estimate the ray-direction cosine from consecutive
    probe SDF differences (the directional derivative; |grad| ~ 1 by the
    eikonal property) and compute NeuS section-CDF alphas, whose
    transmittance telescopes to the fine-grid transmittance wherever the
    SDF is linear across a coarse interval.  The returned cut is
    conservative: one coarse interval of safety margin is added, and any
    ray whose probes overflow ``capacity`` (or that never saturates)
    gets +inf, i.e. no cut.

    Returns ``t_cut`` [R] for :func:`march_rays`'s ``t_cut`` argument —
    or, with ``band=True``, the ``(t_lo, t_cut)`` weight-mass band
    (see :func:`volrend.transmittance_band`) for banded surface eval.
    """
    from . import volrend
    from ..models.neus import neus_alpha

    n_rays = rays_o.shape[0]
    coarse_step = step_size * stride
    n_coarse = max(num_samples // stride, 1)
    rs = march_rays(
        rays_o, rays_d, aabb_min=aabb_min, aabb_max=aabb_max,
        step_size=coarse_step, num_samples=n_coarse, capacity=capacity,
        grid_binary=grid_binary, grid_resolution=grid_resolution, rng=None)
    t_mid = 0.5 * (rs.t_starts + rs.t_ends)
    ridx = jnp.clip(rs.ray_indices, 0, n_rays - 1)
    pos = rays_o[ridx] + rays_d[ridx] * t_mid[:, None]
    sdf = jax.lax.stop_gradient(sdf_fn(pos))

    # ray-direction cosine from neighbouring probes of the same ray
    # (one-sided at ray boundaries; lone probes fall back to head-on
    # cos=-1, the conservative-opaque estimate)
    c = capacity
    pos_idx = jnp.arange(c)
    same_p = (jnp.roll(rs.ray_indices, 1) == rs.ray_indices) \
        & jnp.roll(rs.valid, 1) & (pos_idx > 0)
    same_n = (jnp.roll(rs.ray_indices, -1) == rs.ray_indices) \
        & jnp.roll(rs.valid, -1) & (pos_idx < c - 1)
    s_lo = jnp.where(same_p, jnp.roll(sdf, 1), sdf)
    t_lo = jnp.where(same_p, jnp.roll(t_mid, 1), t_mid)
    s_hi = jnp.where(same_n, jnp.roll(sdf, -1), sdf)
    t_hi = jnp.where(same_n, jnp.roll(t_mid, -1), t_mid)
    denom = t_hi - t_lo
    cos = jnp.where(denom > 1e-8, (s_hi - s_lo) / jnp.maximum(denom, 1e-8),
                    -1.0)
    cos = jnp.clip(cos, -1.0, 1.0)

    alpha = neus_alpha(sdf, inv_s, cos, rs.t_ends - rs.t_starts,
                       cos_anneal_ratio)
    if band:
        return volrend.transmittance_band(
            alpha, rs.t_starts, rs.ray_start, rs.ray_indices, rs.valid,
            n_rays, early_stop_eps=early_stop_eps,
            margin=margin_intervals * coarse_step)
    return volrend.transmittance_cut(
        alpha, rs.t_starts, rs.ray_start, rs.ray_indices, rs.valid, n_rays,
        early_stop_eps=early_stop_eps, margin=margin_intervals * coarse_step)


def march_rays_dense(rays_o, rays_d, *, near_plane, far_plane, num_samples,
                     aabb_min, aabb_max, grid_binary=None, grid_resolution=128,
                     rng: Optional[jax.Array] = None):
    """Non-compacted masked marching in a fixed [near, far] range.

    Used for secondary occlusion rays (reference
    ``models/split_mixed_occ.py:179-222``: 96 uniform samples in
    [0.05, 1.5], no stratification by default).  Returns ``(t_starts,
    t_ends, live)`` with shape [R, S]; the step size follows the
    reference: ``(far - near) / (S - 1)``.
    """
    n_rays = rays_o.shape[0]
    step_size = (far_plane - near_plane) / (num_samples - 1)
    t_near, t_far = ray_aabb_intersect(rays_o, rays_d, aabb_min, aabb_max)
    t_near = jnp.maximum(t_near, near_plane)
    t_far = jnp.minimum(t_far, far_plane)
    # unstratified: samples at exactly near + i*step, i = 0..S-1 (covers
    # the full [near, far] range like the reference's uniform marching);
    # stratified jitter only when an rng is provided
    if rng is not None:
        u = jax.random.uniform(rng, (n_rays, 1))
    else:
        u = jnp.zeros((n_rays, 1))
    steps = jnp.arange(num_samples, dtype=jnp.float32)[None, :]
    t0 = near_plane + (steps + u) * step_size
    t_starts = t0 - 0.5 * step_size
    t_ends = t0 + 0.5 * step_size
    live = (t0 >= t_near[:, None]) & (t0 < t_far[:, None])
    if grid_binary is not None:
        pos = rays_o[:, None, :] + rays_d[:, None, :] * t0[..., None]
        occ = occupancy_lookup(grid_binary, pos, aabb_min, aabb_max,
                               grid_resolution)
        live = live & occ
    return t_starts, t_ends, live
