import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rise_sdf_tpu.models.light import EnvLightMipCube, load_hdr_image
from rise_sdf_tpu.utils.exr import write_exr

pytestmark = pytest.mark.slow  # e2e: excluded from the fast gate (-m 'not slow')


def _write_hdr(path, img):
    import cv2

    bgr = np.ascontiguousarray(img[..., ::-1]).astype(np.float32)
    assert cv2.imwrite(path, bgr)


@pytest.fixture
def latlong(tmp_path):
    h, w = 32, 64
    gy = (np.arange(h) + 0.5) / h
    gx = (np.arange(w) + 0.5) / w
    yy, xx = np.meshgrid(gy, gx, indexing="ij")
    img = np.stack([1.0 + np.sin(2 * np.pi * xx),
                    0.5 + 0.5 * np.cos(np.pi * yy),
                    np.full_like(xx, 0.25)], -1).astype(np.float32)
    return img


def test_load_hdr_roundtrip(tmp_path, latlong):
    p = str(tmp_path / "env.hdr")
    _write_hdr(p, latlong)
    back = load_hdr_image(p)
    assert back.shape == latlong.shape
    # Radiance HDR is lossy (~1%)
    np.testing.assert_allclose(back, latlong, rtol=0.02, atol=0.02)


def test_load_exr_roundtrip(tmp_path, latlong):
    p = str(tmp_path / "env.exr")
    write_exr(p, latlong)
    back = load_hdr_image(p)
    np.testing.assert_allclose(back, latlong, rtol=1e-6)


def test_relight_params_and_eval(tmp_path, latlong):
    p = str(tmp_path / "bridge.hdr")
    _write_hdr(p, latlong)
    light = EnvLightMipCube({"envlight_config": {
        "hdr_filepath": None, "clamp": False, "nmf_format": False,
        "scale": 0.5, "bias": 0.25, "base_res": 32}})
    params = light.relight_params(p)
    assert params["base"].shape == (32 * 0 + 6, 32, 32, 3)
    assert np.isfinite(np.asarray(params["base"])).all()
    # eval_base must reproduce the latlong colors approximately
    mips = light.build_mips(params)
    dirs = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0],
                        [0.0, 1.0, 0.0]])
    vals = np.asarray(light.eval_base(params, dirs))
    assert np.isfinite(vals).all() and (vals >= 0).all()
    d = np.asarray(light.eval_mip(mips, dirs))
    assert np.isfinite(d).all()


def test_hdr_init_from_file(tmp_path, latlong):
    p = str(tmp_path / "init.hdr")
    _write_hdr(p, latlong)
    light = EnvLightMipCube({"envlight_config": {
        "hdr_filepath": p, "clamp": True, "nmf_format": False,
        "scale": 0.5, "bias": 0.25, "base_res": 16}})
    params = light.init(jax.random.PRNGKey(0))
    base = np.asarray(params["base"])
    assert base.max() <= 1.0 + 1e-6  # clamp applied
    assert base.shape == (6, 16, 16, 3)
