import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rise_sdf_tpu.ops.cubemap import (
    avg_pool_cubemap,
    blender_latlong_to_cubemap,
    cubemap_to_blender_latlong,
    dir_to_face_uv,
    face_directions,
    sample_cubemap,
    sample_cubemap_mips,
    sample_texture2d,
    texel_solid_angle,
)


def test_face_dir_roundtrip():
    """dir -> (face, uv) -> dir must be identity for texel centers."""
    res = 8
    dirs = np.asarray(face_directions(res)).reshape(-1, 3)
    face, u, v = dir_to_face_uv(jnp.asarray(dirs))
    face = np.asarray(face)
    expected_faces = np.repeat(np.arange(6), res * res)
    np.testing.assert_array_equal(face, expected_faces)
    # uv centers on the grid
    g = (np.arange(res) + 0.5) / res * 2 - 1
    vv, uu = np.meshgrid(g, g, indexing="ij")
    np.testing.assert_allclose(np.asarray(u).reshape(6, res, res)[0], uu,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(v).reshape(6, res, res)[0], vv,
                               atol=1e-5)


def test_sample_cubemap_exact_at_centers():
    res = 16
    key = jax.random.PRNGKey(0)
    cm = jax.random.uniform(key, (6, res, res, 3))
    dirs = face_directions(res)
    out = sample_cubemap(cm, dirs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(cm), atol=1e-5)


def test_sample_cubemap_constant():
    cm = jnp.ones((6, 8, 8, 3)) * 0.7
    dirs = jax.random.normal(jax.random.PRNGKey(1), (100, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    out = sample_cubemap(cm, dirs)
    np.testing.assert_allclose(np.asarray(out), 0.7, atol=1e-6)


def test_mip_sampling_interpolates_levels():
    mips = [jnp.full((6, r, r, 1), float(i))
            for i, r in enumerate([16, 8, 4])]
    dirs = jnp.asarray([[1.0, 0.1, 0.2], [0.0, 1.0, 0.0]])
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    out = sample_cubemap_mips(mips, dirs, jnp.asarray([0.5, 1.75]))
    np.testing.assert_allclose(np.asarray(out[:, 0]), [0.5, 1.75], atol=1e-5)


def test_solid_angles_sum_to_sphere():
    for res in [4, 16]:
        total = 6 * float(jnp.sum(texel_solid_angle(res)))
        np.testing.assert_allclose(total, 4 * np.pi, rtol=1e-6)


def test_avg_pool():
    cm = jnp.arange(6 * 4 * 4 * 2, dtype=jnp.float32).reshape(6, 4, 4, 2)
    out = avg_pool_cubemap(cm)
    assert out.shape == (6, 2, 2, 2)
    np.testing.assert_allclose(
        float(out[0, 0, 0, 0]),
        float(cm[0, :2, :2, 0].mean()), rtol=1e-6)


def test_latlong_roundtrip():
    """latlong -> cubemap -> latlong preserves a smooth function."""
    h, w = 64, 128
    gy = (np.arange(h) + 0.5) / h
    gx = (np.arange(w) + 0.5) / w
    yy, xx = np.meshgrid(gy, gx, indexing="ij")
    img = np.stack([np.sin(2 * np.pi * xx) * np.sin(np.pi * yy),
                    np.cos(np.pi * yy),
                    0.5 + 0.5 * np.sin(np.pi * yy)], -1).astype(np.float32)
    cm = blender_latlong_to_cubemap(jnp.asarray(img), 32)
    back = cubemap_to_blender_latlong(cm, (h, w))
    err = np.abs(np.asarray(back) - img)
    # poles & bilinear resampling cost some accuracy; interior matches
    assert err[8:-8].mean() < 0.03


def test_texture2d_lookup():
    tex = jnp.arange(16, dtype=jnp.float32).reshape(4, 4, 1)
    # texel centers
    uv = jnp.asarray([[0.125, 0.125], [0.875, 0.875]])
    out = sample_texture2d(tex, uv)
    np.testing.assert_allclose(np.asarray(out[:, 0]), [0.0, 15.0], atol=1e-5)


def test_fg_lut_properties():
    from rise_sdf_tpu.ops.fg_lut import fg_lut

    lut = fg_lut(64, cache_dir="/tmp/fg_lut_test")
    assert lut.shape == (64, 64, 2)
    assert np.isfinite(lut).all()
    a, b = lut[..., 0], lut[..., 1]
    # split-sum energy conservation: F0*A + B <= 1
    assert (a >= 0).all() and (b >= 0).all()
    assert (a + b <= 1.0 + 1e-3).all()
    # known property: at high NoV / low roughness, A -> ~1, B -> small
    assert a[2, -1] > 0.8
    assert b[2, -1] < 0.1
