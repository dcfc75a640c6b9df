"""Microbenchmarks of hot ops (stderr logs). Forced-read scan timing
(see scripts/_timing.py) — block_until_ready is not honest on axon."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_compile_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import sys
import time

import jax
import jax.numpy as jnp


from _timing import timeit_chain


def timeit(name, make_fn, x0, iters=10):
    """make_fn returns f(x) -> (out, x_next); forced-read scan timing."""
    return timeit_chain(name, make_fn, x0, iters=iters)


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    key = jax.random.PRNGKey(0)
    n = 262144

    from rise_sdf_tpu.ops.hashgrid import HashGridEncoding

    enc = HashGridEncoding(3, {
        "otype": "HashGrid", "n_levels": 16, "n_features_per_level": 2,
        "log2_hashmap_size": 19, "base_resolution": 32,
        "per_level_scale": 1.447269237440378})
    params = enc.init(key)
    x = jax.random.uniform(key, (n, 3), minval=0.01, maxval=0.99)

    def f_enc(x):
        out = enc.apply(params, x)
        return out, x + out[:, :3] * 1e-12

    timeit(f"hash encode {n}", f_enc, x)

    def f_enc_g(x):
        g = jax.grad(lambda p: enc.apply(p, x).sum())(params)
        return g["table"], x + g["table"][0, 0, 0] * 1e-12

    timeit(f"hash encode grad {n}", f_enc_g, x)

    w1 = jax.random.normal(key, (35, 128)) * 0.1
    w2 = jax.random.normal(key, (128, 128)) * 0.1
    w3 = jax.random.normal(key, (128, 48)) * 0.1
    xin = jax.random.normal(key, (n, 35))

    def f_mlp(x):
        h = jax.nn.relu(x @ w1)
        h = jax.nn.relu(h @ w2)
        out = h @ w3
        return out, x + out[:, :35] * 1e-12

    timeit(f"mlp {n} f32", f_mlp, xin)

    def f_mlp_bf16(x):
        xb = x.astype(jnp.bfloat16)
        h = jax.nn.relu(xb @ w1.astype(jnp.bfloat16))
        h = jax.nn.relu(h @ w2.astype(jnp.bfloat16))
        out = (h @ w3.astype(jnp.bfloat16)).astype(jnp.float32)
        return out, x + out[:, :35] * 1e-12

    timeit(f"mlp {n} bf16", f_mlp_bf16, xin)

    # ---- march components ---- #
    from rise_sdf_tpu.ops.march import march_rays, occupancy_lookup

    binary = jax.random.uniform(key, (128 ** 3,)) < 0.03
    rays_o = jnp.tile(jnp.asarray([[0.0, 0.0, -4.0]]), (4096, 1))
    rays_d0 = jax.random.normal(key, (4096, 3))
    rays_d0 = rays_d0 / jnp.linalg.norm(rays_d0, axis=-1, keepdims=True)
    aabb_min = jnp.asarray([-1.5] * 3)
    aabb_max = jnp.asarray([1.5] * 3)

    def f_march(d):
        rs = march_rays(rays_o, d, aabb_min=aabb_min, aabb_max=aabb_max,
                        step_size=1.732 * 3 / 1024, num_samples=1024,
                        capacity=262144, grid_binary=binary,
                        grid_resolution=128)
        return rs.t_starts, d + rs.t_starts[0] * 1e-12

    timeit("march full 4096x1024", f_march, rays_d0)

    def f_occ(d):
        t = jnp.arange(1024, dtype=jnp.float32)[None, :] * (1.732 * 3 / 1024)
        pos = rays_o[:, None, :] + d[:, None, :] * t[..., None]
        occ = occupancy_lookup(binary, pos, aabb_min, aabb_max, 128)
        return occ, d + occ[0, 0] * 1e-12

    timeit("march: occ gather 4096x1024", f_occ, rays_d0)

    def f_cumsum(d):
        t = jnp.arange(1024, dtype=jnp.float32)[None, :] * d[:, 2:3]
        live = t > 1.0
        c = jnp.cumsum(live.reshape(-1).astype(jnp.int32))
        return c, d + c[-1] * 1e-12

    timeit("march: flat cumsum 4.2M", f_cumsum, rays_d0)

    def f_scatter(d):
        t = (jnp.arange(1024, dtype=jnp.float32)[None, :] * d[:, 2:3]).reshape(-1)
        live = t > 0.5
        pos = jnp.cumsum(live.astype(jnp.int32)) - 1
        dest = jnp.where(live & (pos < 262144), pos, 262144)
        buf = jnp.zeros((262144,), jnp.float32).at[dest].set(t, mode="drop")
        return buf, d + buf[0] * 1e-12

    timeit("march: scatter compaction", f_scatter, rays_d0)

    # ---- cubemap mip eval ---- #
    from rise_sdf_tpu.ops.cubemap import sample_cubemap_mips

    mips = [jax.random.uniform(key, (6, r, r, 3))
            for r in [512, 256, 128, 64, 32, 16]]
    dirs_big = jnp.tile(rays_d0, (64, 1))
    lvl = jax.random.uniform(key, (dirs_big.shape[0],)) * 5

    def f_mip(d):
        out = sample_cubemap_mips(mips, d, lvl)
        return out, d + out * 1e-12

    timeit(f"cubemap mip eval {dirs_big.shape[0]}", f_mip, dirs_big)

    # ---- env prefilter ---- #
    from rise_sdf_tpu.models.light import EnvLightMipCube

    light = EnvLightMipCube({"envlight_config": {"base_res": 512}})
    lp = light.init(key)

    def f_mips(base):
        m = light.build_mips({"base": base})
        return m.diffuse, base + m.diffuse[0, 0, 0, 0] * 1e-12

    timeit("build_mips 512", f_mips, lp["base"])

    # segment scan + accumulate on 262k buffer
    from rise_sdf_tpu.ops.volrend import (accumulate_along_rays,
                                          render_weight_from_alpha)

    alphas = jax.random.uniform(key, (262144,)) * 0.5
    ray_idx = jnp.sort(jax.random.randint(key, (262144,), 0, 4096))
    ray_start = jnp.searchsorted(ray_idx, jnp.arange(4096)).astype(jnp.int32)
    valid = jnp.ones((262144,), bool)
    vals = jax.random.uniform(key, (262144, 24))

    def f_vr(a):
        w, tr = render_weight_from_alpha(a, ray_start, ray_idx, valid, 4096)
        acc = accumulate_along_rays(w, ray_idx, vals, 4096)
        return acc, a + acc[0, 0] * 1e-12

    timeit("volrend scan+accum 262k x24ch", f_vr, alphas)


if __name__ == "__main__":
    main()
