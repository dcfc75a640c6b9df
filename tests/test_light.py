import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rise_sdf_tpu.models.light import EnvLightMipCube
from rise_sdf_tpu.ops.prefilter import (
    apply_diffuse_filter,
    build_specular_filter_bank,
    ggx_cutoff_costheta,
)


def make_light(base_res=64):
    return EnvLightMipCube({"envlight_config": {
        "hdr_filepath": None, "clamp": True, "nmf_format": False,
        "scale": 0.5, "bias": 0.25, "base_res": base_res}})


def test_diffuse_filter_energy():
    """Cosine filtering of a constant env must return the constant
    (the kernel integrates to 1 over the hemisphere)."""
    cm = jnp.ones((6, 16, 16, 3)) * 2.5
    out = apply_diffuse_filter(cm)
    np.testing.assert_allclose(np.asarray(out), 2.5, rtol=2e-2)


def test_specular_filters_normalized():
    """GGX prefilter weights are normalized -> constant maps invariant."""
    light = make_light(64)
    params = light.init(jax.random.PRNGKey(0))
    const = {"base": jnp.ones_like(params["base"]) * 1.7}
    mips = light.build_mips(const)
    for spec in mips.specular:
        np.testing.assert_allclose(np.asarray(spec), 1.7, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(mips.diffuse), 1.7, rtol=2e-2)


def test_specular_blur_increases_with_level():
    """A point light blurs progressively across the mip ladder."""
    light = make_light(64)
    base = np.zeros((6, 64, 64, 3), np.float32)
    base[4, 30:34, 30:34] = 50.0  # bright spot on +z face
    mips = light.build_mips({"base": jnp.asarray(base)})
    maxima = [float(jnp.max(s)) for s in mips.specular]
    # peak magnitude decreases monotonically with roughness/level
    # (level 0's kernel may be sub-texel at low res -> near-identity)
    assert all(maxima[i] > maxima[i + 1] for i in range(len(maxima) - 1)), maxima
    assert maxima[0] <= 50.0 * (1 + 1e-5) and maxima[-1] < 10.0


def test_cutoff_monotone():
    assert ggx_cutoff_costheta(0.08) > ggx_cutoff_costheta(0.3) > \
        ggx_cutoff_costheta(0.7)


def test_mip_level_mapping():
    light = make_light(64)  # 3 levels: 64, 32, 16
    assert light.n_levels == 3
    get = lambda r: float(light.get_mip(jnp.asarray(r)))
    np.testing.assert_allclose(get(0.08), 0.0, atol=1e-6)
    np.testing.assert_allclose(get(0.5), light.n_levels - 2, atol=1e-6)
    np.testing.assert_allclose(get(1.0), light.n_levels - 1, atol=1e-6)
    assert get(0.2) > 0.0 and get(0.2) < light.n_levels - 2


def test_eval_mip_shapes_and_diffuse():
    light = make_light(32)
    params = light.init(jax.random.PRNGKey(1))
    mips = light.build_mips(params)
    dirs = jax.random.normal(jax.random.PRNGKey(2), (17, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    d = light.eval_mip(mips, dirs)
    s = light.eval_mip(mips, dirs, specular=True,
                       roughness=jnp.full((17, 1), 0.3))
    assert d.shape == (17, 3) and s.shape == (17, 3)
    assert np.isfinite(np.asarray(d)).all() and np.isfinite(np.asarray(s)).all()


def test_grad_flows_through_mips():
    light = make_light(32)
    params = light.init(jax.random.PRNGKey(3))
    dirs = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])

    def loss(p):
        mips = light.build_mips(p)
        s = light.eval_mip(mips, dirs, specular=True,
                           roughness=jnp.full((2, 1), 0.4))
        return (s ** 2).sum() + light.eval_mip(mips, dirs).sum()

    g = jax.grad(loss)(params)["base"]
    assert float(jnp.abs(g).sum()) > 0
    assert np.isfinite(np.asarray(g)).all()


def test_importance_sampling_consistency():
    """Monte-Carlo estimate of env integral with importance sampling
    matches the direct sum."""
    light = make_light(32)
    key = jax.random.PRNGKey(4)
    params = {"base": jax.random.uniform(key, (6, 32, 32, 3)) + 0.1}
    st = light.update_pdf(params, res=(64, 128))
    dirs = light.sample(st, jax.random.PRNGKey(5), 20000)
    pdf = light.pdf(st, dirs)
    vals = light.eval_base(params, dirs)
    est = float(jnp.mean(jnp.max(vals, -1) / jnp.maximum(pdf, 1e-9)))
    # reference integral of max-channel over sphere
    from rise_sdf_tpu.ops.cubemap import cubemap_to_latlong
    img = np.asarray(cubemap_to_latlong(params["base"], (64, 128)))
    h = 64
    y = (np.arange(h) + 0.5) / h
    sin_t = np.sin(y * np.pi)[:, None]
    ref = float((img.max(-1) * sin_t).sum() * (np.pi / h) * (2 * np.pi / 128))
    assert abs(est - ref) / ref < 0.1, (est, ref)
