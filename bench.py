"""Throughput benchmark: rays/sec for a full 800x800 PBR render.

Measures the BASELINE.md north-star (rays/sec/chip at 800^2 render with
the flagship split-mixed-occ model, stage 1: split-sum shading +
secondary occlusion rays) on whatever accelerator JAX exposes.  Uses
production-scale hyperparameters (512^2 env light, 16-level 2^19 hash
grid, 128^3 occupancy grid, 1024-sample marching) with an untrained
model and a plausible occupancy pattern (thin shell), so no dataset is
required.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import os

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_compile_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from rise_sdf_tpu import models
    from rise_sdf_tpu.config import load_config

    cfg = load_config("configs/split-mixed-occ-tensoir.yaml",
                      cli_args=["dataset.scene=bench"])
    model = models.make(cfg.model.name, cfg.model)
    params = model.init(jax.random.PRNGKey(0))
    log("model initialized; devices:", jax.devices())

    # plausible occupancy: shell around a sphere of radius 0.5 (~ a few %
    # of cells), mirroring a converged grid on a TensoIR object
    res = model.grid_resolution
    g = (np.arange(res) + 0.5) / res * 2 * model.radius - model.radius
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    r = np.sqrt(x * x + y * y + z * z)
    cell = 2 * model.radius / res
    binary = np.abs(r - 0.5) < (2.0 * cell)
    occ_binary = jnp.asarray(binary.reshape(-1))
    log(f"occupancy: {binary.mean() * 100:.2f}% cells")

    # camera rays for an 800^2 view
    w = h = 800
    chunk = int(cfg.model.ray_chunk)
    eval_capacity = chunk * int(cfg.model.get("eval_samples_per_ray", 128))
    from rise_sdf_tpu.utils.rays import get_ray_directions, get_rays
    from rise_sdf_tpu.datasets.synthetic import look_at

    focal = 0.5 * w / np.tan(0.5 * 0.35)
    dirs = get_ray_directions(w, h, focal, focal, w // 2, h // 2)
    c2w = look_at(np.array([0.0, -4.0, 0.0]))
    rays_o, rays_d = get_rays(jnp.asarray(dirs), jnp.asarray(c2w))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays = jnp.concatenate([rays_o, rays_d], -1)

    step = jnp.asarray(cfg.model.split_sum_kick_in_step + 1, jnp.int32)

    build_mips = jax.jit(lambda p: model.emitter.build_mips(p["emitter"]))

    @jax.jit
    def render_chunk(params, rays_chunk, mips):
        out = model.forward(
            params, rays_chunk, occ_binary=occ_binary, mips=mips, step=step,
            rng=None, stage=1, train=False, capacity=eval_capacity,
            background_color=jnp.ones((3,)))
        return out["comp_rgb_full"]

    # warmup / compile
    t0 = time.time()
    mips = build_mips(params)
    img0 = render_chunk(params, rays[:chunk], mips)
    img0.block_until_ready()
    log(f"compile+first chunk: {time.time() - t0:.1f}s")

    n = rays.shape[0]
    t0 = time.time()
    mips = build_mips(params)  # once per image (differentiable per step in training)
    outs = []
    for s in range(0, n, chunk):
        rc = rays[s:s + chunk]
        if rc.shape[0] < chunk:
            rc = jnp.pad(rc, ((0, chunk - rc.shape[0]), (0, 0)))
        out = render_chunk(params, rc, mips)
        # block per chunk: consuming each result is what a real render
        # loop does, and under the axon runtime blocking only the final
        # output does NOT imply the queued dispatches executed (observed
        # 157 chunks "finishing" in 0.8s while each takes 447ms blocked)
        out.block_until_ready()
        outs.append(out)
    dt = time.time() - t0
    rays_per_sec = n / dt
    log(f"rendered {n} rays in {dt:.2f}s -> {rays_per_sec:.0f} rays/s")

    print(json.dumps({
        "metric": "rays/sec/chip at 800^2 split-sum PBR render",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
