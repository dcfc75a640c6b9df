"""Generic rendering-driver family: accumulation semantics + variants."""

import jax
import jax.numpy as jnp
import numpy as np

from rise_sdf_tpu.ops import march, rendering_drivers as rd


def _make_samples(n_rays=8, capacity=2048):
    rays_o = jnp.tile(jnp.asarray([[0.0, 0.0, -3.0]]), (n_rays, 1))
    z = jnp.linspace(-0.2, 0.2, n_rays)
    rays_d = jnp.stack([z, z * 0.3, jnp.ones_like(z)], -1)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rs = march.march_rays(
        rays_o, rays_d, aabb_min=jnp.asarray([-1.5] * 3),
        aabb_max=jnp.asarray([1.5] * 3), step_size=0.05, num_samples=128,
        capacity=capacity, grid_binary=None)
    return rs, rays_d


def _field(ts, te, ridx):
    t_mid = 0.5 * (ts + te)
    n = ts.shape[0]
    return {
        "rgb": jnp.stack([jnp.sin(t_mid) * 0.5 + 0.5,
                          jnp.cos(t_mid) * 0.5 + 0.5,
                          jnp.full((n,), 0.3)], -1),
        "alpha": jnp.full((n,), 0.1),
        "normal": jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1)),
        "albedo": jnp.full((n, 3), 0.6),
        "roughness": jnp.full((n,), 0.4),
        "metallic": jnp.full((n,), 0.2),
        "sdf": t_mid - 1.0,
        "sdf_grad": jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (n, 1)),
    }


def test_rendering_basic_accumulation():
    rs, _ = _make_samples()
    res = rd.rendering(rs, _field, 8, render_bkgd=jnp.ones((3,)))
    assert res["comp_rgb"].shape == (8, 3)
    # alpha 0.1 over >20 live samples -> opacity close to 1
    assert float(res["opacity"].min()) > 0.8
    assert np.isfinite(np.asarray(res["comp_rgb"])).all()
    # constant-channel accumulation: comp ~= const * opacity
    res2 = rd.rendering_with_normals_mats(rs, _field, 8)
    np.testing.assert_allclose(
        np.asarray(res2["comp_albedo"]),
        np.broadcast_to(0.6 * np.asarray(res2["opacity"]), (8, 3)),
        atol=1e-5)
    np.testing.assert_allclose(np.asarray(res2["comp_metallic"]),
                               0.2 * np.asarray(res2["opacity"]), atol=1e-5)


def test_sigma_form_matches_alpha_form():
    rs, _ = _make_samples()

    def field_sigma(ts, te, ridx):
        out = _field(ts, te, ridx)
        dists = te - ts
        # alpha = 1 - exp(-sigma d)  ->  sigma = -log(1-alpha)/d
        out = dict(out)
        alpha = out.pop("alpha")
        out["sigma"] = -jnp.log(1 - alpha) / jnp.maximum(dists, 1e-8)
        return out

    a = rd.rendering(rs, _field, 8)
    b = rd.rendering(rs, field_sigma, 8)
    np.testing.assert_allclose(np.asarray(a["comp_rgb"]),
                               np.asarray(b["comp_rgb"]), rtol=1e-4,
                               atol=1e-5)


def test_sdf_and_dir_variants_thread_extras():
    rs, dirs = _make_samples()
    res = rd.rendering_with_normals_mats_sdf_dir(rs, _field, 8, dirs)
    assert "sdf_samples" in res and "sdf_grad_samples" in res
    assert res["dirs_samples"].shape == (rs.t_starts.shape[0], 3)
    assert "comp_roughness" in res and "comp_normal" in res


def test_secondary_rendering_transmittance():
    rs, _ = _make_samples()
    res = rd.secondary_rendering(rs, _field, 8)
    tr = np.asarray(res["transmittance"])
    assert tr.shape == (8, 1)
    assert ((tr >= -1e-5) & (tr <= 1.0 + 1e-5)).all()
    full = rd.rendering(rs, _field, 8)
    np.testing.assert_allclose(tr, 1.0 - np.asarray(full["opacity"]),
                               atol=1e-5)
