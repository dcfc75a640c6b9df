"""Offline drop-rate probe for the banded eval headline protocol.

Reproduces bench.py's frozen protocol setup (converged-solid occupancy,
sharp inv_s, 800^2 rays, production config) but runs ONLY the coarse
visibility probe + march per chunk — no shading — and records each
ray's live-sample count.  From the per-ray counts the single-pass drop
count of ANY capacity follows exactly (a ray is dropped iff its
cumulative sample end exceeds the buffer), so one cheap CPU pass scores
every candidate (band_k, capacity) arm that tonight's TPU bench would
measure.  Drop accounting is backend-independent: rng=None eval
marching is deterministic and identical on CPU and TPU.

Usage: JAX_PLATFORMS=cpu python scripts/drop_probe.py [overrides...]
       DROP_PROBE_SAVE=/tmp/counts.npz ... python scripts/drop_probe.py
       python scripts/drop_probe.py analyze /tmp/counts.npz

``analyze`` re-scores a saved per-ray count dump under candidate ray
ORDERINGS as well as capacities: the image's silhouette rays are
spatially clustered, so row-major chunking concentrates heavy rays in a
few chunks (the observed chunk*514 worst case); a fixed strided
interleave spreads them so every chunk's load approaches the mean and
the single-pass capacity can shrink toward ``chunk * mean_count``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np


def drops_for_order(counts, order, chunk, cap):
    """Single-pass dropped-ray count when rays are processed in
    ``order`` in chunks of ``chunk`` against a ``cap``-row buffer (a ray
    is dropped iff its cumulative sample end within its chunk exceeds
    the buffer — exactly march_rays' allocation rule)."""
    c = counts[order]
    pad = (-len(c)) % chunk
    if pad:
        c = np.concatenate([c, np.zeros(pad, c.dtype)])
    ends = np.cumsum(c.reshape(-1, chunk).astype(np.int64), axis=1)
    return int((ends > cap).sum()), ends[:, -1]


def analyze(path):
    data = np.load(path)
    chunk = int(data["chunk"])
    ks = [int(k.split("_")[1]) for k in data.files if k.startswith("counts_")]
    n = len(data[f"counts_{ks[0]}"])
    rng = np.random.default_rng(0)
    p = int(n * 0.6180339887498949) or 1
    while np.gcd(p, n) != 1:
        p += 1
    orders = {
        "row-major": np.arange(n),
        # fixed strided interleave: ray i of chunk j is j + i*n_chunks —
        # a transpose of the (n_chunks, chunk) grid; deterministic, and
        # its inverse is the same transpose (cheap to apply at eval).
        # NOTE: aliases with image width when chunk ~ a multiple of it
        "strided": np.arange(n).reshape(-1, chunk).T.reshape(-1)
        if n % chunk == 0 else np.arange(n),
        # golden multiplicative low-discrepancy stride — the production
        # eval_ray_interleave mode (utils/misc.py:interleave_order)
        "golden": (np.arange(n, dtype=np.int64) * p) % n,
        "shuffled": rng.permutation(n),
    }
    for k in ks:
        counts = data[f"counts_{k}"].astype(np.int64)
        mean = counts.mean()
        print(f"-- band_k={k}: mean count {mean:.2f}/ray "
              f"(mean chunk load {mean * chunk:,.0f} rows)")
        caps = sorted({chunk * 6, chunk * 7, chunk * 8,
                       chunk * 8 + 8192, chunk * 8 + 16384, chunk * 12,
                       chunk * 16})
        for name, order in orders.items():
            loads = None
            line = [f"   {name:>9}:"]
            for cap in caps:
                d, loads = drops_for_order(counts, order, chunk, cap)
                line.append(f" cap*{cap / chunk:g}={d}"
                            f"({d / n * 100:.2f}%)")
            line.append(f" | worst chunk {int(loads.max()):,} rows"
                        f" (= chunk*{loads.max() / chunk:.1f})")
            print("".join(line))


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "analyze":
        analyze(sys.argv[2])
        return
    plat = os.environ.get("JAX_PLATFORMS")
    import jax

    if plat:
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp

    from bench import image_rays, make_occupancy
    from rise_sdf_tpu import models
    from rise_sdf_tpu.config import load_config
    from rise_sdf_tpu.ops import march

    cfg = load_config("configs/split-mixed-occ-tensoir.yaml",
                      cli_args=["dataset.scene=dropprobe"] + sys.argv[1:])
    model = models.make(cfg.model.name, cfg.model)
    params = model.init(jax.random.PRNGKey(0))
    params = dict(params)
    params["variance"] = {**params["variance"],
                          "variance": jnp.asarray(0.67, jnp.float32)}
    solid = make_occupancy(model, "solid")
    rays = image_rays()
    chunk = int(cfg.model.ray_chunk)
    step = jnp.asarray(cfg.model.split_sum_kick_in_step + 1, jnp.int32)

    def counts_fn(rays_chunk, band_k):
        ro, rd = rays_chunk[:, 0:3], rays_chunk[:, 3:6]
        t_lo, t_cut = model.visibility_cut(params, ro, rd, solid, step,
                                           band=True)
        rs = march.march_rays(
            ro, rd, aabb_min=model.aabb_min, aabb_max=model.aabb_max,
            step_size=model.render_step_size,
            num_samples=model.num_samples_per_ray, capacity=16,
            grid_binary=solid, grid_resolution=model.grid_resolution,
            rng=None, t_cut=t_cut, t_band_lo=t_lo, band_k=band_k,
            cone_angle=float(model.config.get("cone_angle", 0.0)))
        # replicate the kernel's own banding predicate (march.py:182-185)
        tn, tf = march.ray_aabb_intersect(ro, rd, model.aabb_min,
                                          model.aabb_max)
        big = jnp.asarray(1e9, t_cut.dtype)
        lo = jnp.maximum(t_lo, tn)
        hi = jnp.minimum(t_cut, tf)
        finite = (t_cut < big) & (t_lo > -big) & (hi > lo)
        return rs.ray_count, finite, t_cut, t_lo, tn, tf

    ks = [int(k) for k in os.environ.get("DROP_PROBE_KS", "8,16").split(",")]
    fns = {k: jax.jit(lambda rc, k=k: counts_fn(rc, k)) for k in ks}
    n = rays.shape[0]
    all_counts = {k: [] for k in ks}
    unbanded = 0
    heavy = []
    t0 = time.time()
    for s in range(0, n, chunk):
        rc = rays[s:s + chunk]
        if rc.shape[0] < chunk:
            rc = jnp.pad(rc, ((0, chunk - rc.shape[0]), (0, 0)))
        for k in ks:
            cnt, fin, t_cut, t_lo, tn, tf = fns[k](rc)
            all_counts[k].append(np.asarray(cnt))
        fin = np.asarray(fin)
        unbanded += int((~fin).sum())
        cnt = np.asarray(cnt)
        hv = cnt > max(ks) * 2
        if hv.any():
            for i in np.nonzero(hv)[0][:8]:
                heavy.append((s, int(i), int(cnt[i]), float(t_cut[i]),
                              float(t_lo[i]), float(tn[i]), float(tf[i]),
                              bool(fin[i])))
    print(f"marched {n} rays x {len(ks)} arms in {time.time() - t0:.1f}s; "
          f"kernel-unbanded rays: {unbanded} ({unbanded / n * 100:.2f}%)")
    print(f"heavy rays (count > {max(ks) * 2}), first {min(len(heavy), 24)} "
          "of sampled:")
    for s, i, c, tc, tl, tn_, tf_, f in heavy[:24]:
        print(f"  chunk@{s} ray {i}: count={c} t_cut={tc:.4f} t_lo={tl:.4f}"
              f" tn={tn_:.4f} tf={tf_:.4f} kernel_finite={f}")

    save = os.environ.get("DROP_PROBE_SAVE")
    if save:
        np.savez_compressed(
            save, chunk=np.int64(chunk),
            **{f"counts_{k}": np.concatenate(all_counts[k]).astype(np.uint16)
               for k in ks})
        print(f"saved per-ray counts to {save}")

    caps = [chunk * 8, chunk * 8 + 8192, chunk * 8 + 16384, chunk * 12,
            chunk * 16, chunk * 16 + 16384]
    for k in ks:
        per_chunk = all_counts[k]
        ends = [np.cumsum(c) for c in per_chunk]
        need = max(int(e[-1]) for e in ends)
        print(f"-- band_k={k}: zero-drop capacity needed = {need} "
              f"(= chunk*{need / chunk:.2f})")
        for cap in caps:
            drops = sum(int((e > cap).sum()) for e in ends)
            print(f"   cap {cap:6d} (chunk*{cap / chunk:>5.2f}): "
                  f"dropped {drops:6d} ({drops / n * 100:.3f}%)")


if __name__ == "__main__":
    main()
