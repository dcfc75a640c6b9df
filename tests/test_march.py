import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rise_sdf_tpu.ops.march import (
    march_rays,
    march_rays_dense,
    ray_aabb_intersect,
)
from rise_sdf_tpu.ops.volrend import (
    accumulate_along_rays,
    distortion_loss,
    render_weight_from_alpha,
    render_weight_from_alpha_dense,
)

AABB_MIN = jnp.array([-1.5, -1.5, -1.5])
AABB_MAX = jnp.array([1.5, 1.5, 1.5])


def test_aabb_intersect():
    o = jnp.array([[0.0, 0.0, -5.0], [0.0, 5.0, 0.0], [5.0, 5.0, 5.0]])
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    tn, tf = ray_aabb_intersect(o, d, AABB_MIN, AABB_MAX)
    np.testing.assert_allclose(np.asarray(tn[0]), 3.5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tf[0]), 6.5, atol=1e-5)
    assert tn[1] > tf[1]  # miss
    assert tn[2] > tf[2]  # miss


def test_march_compaction_roundtrip():
    n_rays, s = 4, 32
    o = jnp.tile(jnp.array([[0.0, 0.0, -5.0]]), (n_rays, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n_rays, 1))
    rs = march_rays(o, d, aabb_min=AABB_MIN, aabb_max=AABB_MAX,
                    step_size=3.0 * jnp.sqrt(3.0) / s, num_samples=s,
                    capacity=256)
    # all rays identical -> same live count; buffer ray-major sorted
    counts = np.asarray(rs.ray_count)
    assert (counts == counts[0]).all() and counts[0] > 0
    assert bool(rs.ray_included.all())
    ridx = np.asarray(rs.ray_indices)
    valid = np.asarray(rs.valid)
    assert (np.diff(ridx[valid]) >= 0).all()
    # positions of samples are inside the box
    mid = 0.5 * (rs.t_starts + rs.t_ends)
    pos = o[rs.ray_indices.clip(0, n_rays - 1)] + \
        d[rs.ray_indices.clip(0, n_rays - 1)] * mid[:, None]
    assert bool((jnp.abs(pos[rs.valid]) <= 1.5 + 1e-4).all())


def test_march_overflow_drops_whole_tail_rays():
    n_rays, s = 8, 16
    o = jnp.tile(jnp.array([[0.0, 0.0, -5.0]]), (n_rays, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n_rays, 1))
    rs = march_rays(o, d, aabb_min=AABB_MIN, aabb_max=AABB_MAX,
                    step_size=3.0 * jnp.sqrt(3.0) / s, num_samples=s,
                    capacity=20)
    inc = np.asarray(rs.ray_included)
    # first ray(s) fit, later ones don't
    assert inc[0] and not inc[-1]
    # included flag is prefix-monotone for identical rays
    assert (np.diff(inc.astype(int)) <= 0).all()


def test_occupancy_pruning():
    res = 16
    binary = jnp.zeros((res ** 3,), bool)  # nothing occupied
    o = jnp.array([[0.0, 0.0, -5.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    rs = march_rays(o, d, aabb_min=AABB_MIN, aabb_max=AABB_MAX,
                    step_size=0.1, num_samples=64, capacity=64,
                    grid_binary=binary, grid_resolution=res)
    assert int(rs.num_live) == 0


def test_transmittance_matches_cumprod():
    """Segmented scan == per-ray cumprod reference."""
    rng = np.random.default_rng(0)
    n_rays = 3
    counts = [5, 0, 7]
    alphas_per_ray = [rng.uniform(0, 0.9, size=c) for c in counts]
    capacity = 16
    flat = np.concatenate(alphas_per_ray)
    c_total = len(flat)
    alphas = np.zeros(capacity)
    alphas[:c_total] = flat
    ray_indices = np.full(capacity, n_rays, np.int32)
    ray_indices[:counts[0]] = 0
    ray_indices[counts[0]:counts[0] + counts[2]] = 2
    valid = np.arange(capacity) < c_total
    ray_start = np.array([0, counts[0], counts[0]], np.int32)

    w, t = render_weight_from_alpha(
        jnp.asarray(alphas), jnp.asarray(ray_start),
        jnp.asarray(ray_indices), jnp.asarray(valid), n_rays)
    w, t = np.asarray(w), np.asarray(t)

    for ray, a in [(0, alphas_per_ray[0]), (2, alphas_per_ray[2])]:
        tr_ref = np.cumprod(np.concatenate([[1.0], 1 - a]))[:-1]
        w_ref = tr_ref * a
        got = w[ray_indices == ray]
        # log/exp-space scan vs direct cumprod: f32 agreement to ~1e-4
        np.testing.assert_allclose(got, w_ref, rtol=5e-4, atol=1e-6)
    assert w[~valid].sum() == 0


def test_accumulate_and_opacity():
    n_rays = 2
    capacity = 8
    alphas = jnp.array([0.5, 0.5, 0.5, 1.0, 0, 0, 0, 0])
    ray_indices = jnp.array([0, 0, 0, 1, 2, 2, 2, 2], jnp.int32)
    valid = jnp.array([1, 1, 1, 1, 0, 0, 0, 0], bool)
    ray_start = jnp.array([0, 3], jnp.int32)
    w, _ = render_weight_from_alpha(alphas, ray_start, ray_indices, valid, n_rays)
    opacity = accumulate_along_rays(w, ray_indices, None, n_rays)
    np.testing.assert_allclose(np.asarray(opacity[0, 0]), 1 - 0.5 ** 3,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(opacity[1, 0]),
                               1.0, rtol=1e-4, atol=1e-4)
    vals = jnp.ones((capacity, 3))
    rgb = accumulate_along_rays(w, ray_indices, vals, n_rays)
    np.testing.assert_allclose(np.asarray(rgb[0]),
                               np.full(3, float(opacity[0, 0])), rtol=1e-5)


def test_dense_weights_match_compacted():
    rng = jax.random.PRNGKey(0)
    alphas = jax.random.uniform(rng, (4, 8), minval=0.0, maxval=0.8)
    live = jnp.ones((4, 8), bool)
    w, t = render_weight_from_alpha_dense(alphas, live)
    tr_ref = jnp.cumprod(1 - alphas, axis=1)
    # log-space scan vs cumprod: f32 agreement to ~1e-4 absolute
    np.testing.assert_allclose(np.asarray(1 - w.sum(1)),
                               np.asarray(tr_ref[:, -1]), rtol=1e-2, atol=2e-5)


def test_march_dense_range():
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    ts, te, live = march_rays_dense(
        o, d, near_plane=0.05, far_plane=1.5, num_samples=96,
        aabb_min=AABB_MIN, aabb_max=AABB_MAX)
    assert ts.shape == (1, 96)
    mid = np.asarray(0.5 * (ts + te))[0]
    assert mid.min() >= 0.0 and mid.max() <= 1.55
    assert bool(live.any())


def test_distortion_loss_matches_bruteforce():
    rng = np.random.default_rng(1)
    n_rays, capacity = 2, 12
    counts = [5, 6]
    w = rng.uniform(0, 0.3, size=capacity)
    m = np.sort(rng.uniform(0, 1, size=capacity))
    iv = rng.uniform(0.01, 0.02, size=capacity)
    ray_indices = np.array([0] * 5 + [1] * 6 + [n_rays], np.int32)[:capacity]
    valid = np.arange(capacity) < sum(counts)
    ray_start = np.array([0, 5], np.int32)
    # brute force
    ref = 0.0
    for r, (s, c) in enumerate(zip([0, 5], counts)):
        wr, mr, ivr = w[s:s + c], m[s:s + c], iv[s:s + c]
        ref += np.sum(wr[:, None] * wr[None, :] * np.abs(mr[:, None] - mr[None, :]))
        ref += np.sum(wr ** 2 * ivr) / 3.0
    got = distortion_loss(jnp.asarray(w), jnp.asarray(m), jnp.asarray(iv),
                          jnp.asarray(ray_indices), jnp.asarray(ray_start),
                          jnp.asarray(valid), n_rays)
    np.testing.assert_allclose(float(got), ref, rtol=1e-4)


def test_cone_angle_growing_steps():
    """candidate_intervals(cone_angle>0) matches the nerfacc recurrence
    dt_k = clamp(t_k * cone_angle, dt_min, dt_max) (ray_marching.cu:9-14)."""
    from rise_sdf_tpu.ops.march import candidate_intervals

    o = jnp.array([[0.0, 0.0, -5.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    tn, tf = ray_aabb_intersect(o, d, AABB_MIN, AABB_MAX)
    dt_min, cone, dt_max = 0.01, 0.02, 0.08
    s = 64
    ts, te, live = candidate_intervals(o, d, tn, tf, dt_min, s,
                                       cone_angle=cone, dt_max=dt_max)
    # python oracle
    t = float(tn[0])
    mids = []
    for _ in range(s):
        dt = min(max(t * cone, dt_min), dt_max)
        mids.append(t + 0.5 * dt)
        t += dt
    got = np.asarray(0.5 * (ts + te))[0]
    np.testing.assert_allclose(got, np.asarray(mids), rtol=1e-5)
    # growing: later steps are wider, clamped at dt_max
    widths = np.asarray(te - ts)[0]
    assert widths[0] == pytest.approx(max(float(tn[0]) * cone, dt_min),
                                      rel=1e-5)
    assert (np.diff(widths) >= -1e-6).all()
    assert widths[-1] == pytest.approx(dt_max, rel=1e-5)
