import jax
import jax.numpy as jnp
import numpy as np

from rise_sdf_tpu.ops.cubemap import (
    sample_cubemap_mips,
    sample_cubemap_mips_atlas,
)


def test_atlas_matches_stacked_sampler():
    key = jax.random.PRNGKey(0)
    mips = [jax.random.uniform(jax.random.fold_in(key, i), (6, r, r, 3))
            for i, r in enumerate([32, 16, 8])]
    dirs = jax.random.normal(jax.random.PRNGKey(1), (257, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    lvl = jax.random.uniform(jax.random.PRNGKey(2), (257,)) * 2.0
    a = sample_cubemap_mips(mips, dirs, lvl)
    b = sample_cubemap_mips_atlas(mips, dirs, lvl)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)


def test_occupancy_packing_roundtrip():
    from rise_sdf_tpu.ops.march import occupancy_lookup

    res = 16
    rng = np.random.default_rng(0)
    binary = jnp.asarray(rng.random(res ** 3) < 0.3)
    pos = jnp.asarray(rng.uniform(-1.4, 1.4, (500, 3)).astype(np.float32))
    aabb_min = jnp.asarray([-1.5] * 3)
    aabb_max = jnp.asarray([1.5] * 3)
    got = occupancy_lookup(binary, pos, aabb_min, aabb_max, res)
    # reference: direct bool indexing
    u = (np.asarray(pos) + 1.5) / 3.0
    idx = np.clip(np.floor(u * res).astype(int), 0, res - 1)
    flat = (idx[:, 0] * res + idx[:, 1]) * res + idx[:, 2]
    ref = np.asarray(binary)[flat]
    np.testing.assert_array_equal(np.asarray(got), ref)
