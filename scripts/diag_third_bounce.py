"""Diagnose the relight third bounce on the concave scene (VERDICT r4 #4).

The r4 concave ablation found warm-relight slightly favors the
direct-only model (-0.24 dB) — the one place the paper's mirror-retrace
machinery (reference ``models/split_mixed_occ.py:323-332``) should win.
The offered explanation (traced-bounce errors compound with the new
envmap) was a hypothesis; this script measures it, isolating the
secondary/third-bounce machinery from primary-geometry error by feeding
the ANALYTIC primary hits (dataset ``sphere_trace_np`` ground truth)
into the model's traced bounce:

  1. occlusion classification of the mirror ray: model transmittance
     (1 - tr > 0.5) vs the analytic hit mask -> precision/recall
  2. expected-depth error |sec_depth - t2_gt| on both-occluded rays
  3. third-bounce hit position error |third_o - q_gt|

Usage: python scripts/diag_third_bounce.py <parsed.yaml> <ckpt.npz>
       [n_rays=4096] [view=0]

CPU-safe (JAX_PLATFORMS honored).  Output lines are bank_metrics-
compatible (DIAG prefix).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("OMP_NUM_THREADS", "4")


def main():
    cfg_path, ckpt_path = sys.argv[1], sys.argv[2]
    n_rays = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
    view = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    plat = os.environ.get("JAX_PLATFORMS")
    import jax

    if plat:
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp
    import numpy as np

    from rise_sdf_tpu import datasets, systems
    from rise_sdf_tpu.config import load_config
    from rise_sdf_tpu.datasets.synthetic import (
        concave_normal, sphere_trace_np, CONCAVE_TORUS_R, CONCAVE_TORUS_r)

    cfg = load_config(cfg_path, cli_args=sys.argv[5:])
    assert "concave" in str(cfg.dataset.get("name", "")) or \
        "concave" in str(cfg.dataset.get("scene", "")), \
        "third-bounce diagnosis needs the concave dataset (analytic GT)"
    dm = datasets.make(cfg.dataset.name, cfg.dataset)
    system = systems.make(cfg.system.name, cfg, dm, save_dir="/tmp/diag3b")
    state = system.load_checkpoint(ckpt_path, system.init_state(0))
    model = system.model
    step = int(state["step"])
    print(f"DIAG third-bounce: {ckpt_path} step {step}", flush=True)

    split = dm.test()
    c2w = np.asarray(split.all_c2w[view], np.float64)
    dirs = np.asarray(split.directions, np.float64)
    d = (dirs.reshape(-1, 3) @ c2w[:3, :3].T)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(c2w[:, 3], d.shape)

    extent = CONCAVE_TORUS_R + CONCAVE_TORUS_r
    dist = float(np.linalg.norm(c2w[:, 3]))
    hit, t = sphere_trace_np(o, d, max(dist - extent - 0.2, 0.0),
                             dist + extent + 0.2)
    idx = np.nonzero(hit)[0]
    rng = np.random.RandomState(0)
    if idx.size > n_rays:
        idx = idx[rng.permutation(idx.size)[:n_rays]]
    p = (o + t[:, None] * d)[idx]
    n = concave_normal(p)
    wo = -d[idx]
    refl = 2 * np.clip((n * wo).sum(-1, keepdims=True), 0, 1) * n - wo

    # ---- analytic GT for the mirror bounce ---- #
    so = p + 1e-3 * n
    hit2, t2 = sphere_trace_np(so, refl, 1e-3, 4.0 * extent)
    q_gt = so + t2[:, None] * refl

    # ---- model's traced bounce on the SAME reflected rays ---- #
    pad = (-len(idx)) % 256
    sec_o = jnp.asarray(np.pad(so, ((0, pad), (0, 0)), mode="edge"),
                        jnp.float32)
    sec_d = jnp.asarray(np.pad(refl, ((0, pad), (0, 0)), mode="edge"),
                        jnp.float32)
    tr, sec_depth, _inc, _live = model.compute_indirect_radiance(
        state["params"], sec_o, sec_d, state["occ_binary"],
        jnp.asarray(step, jnp.int32))
    tr = np.asarray(tr)[:len(idx), 0]
    sec_depth = np.asarray(sec_depth)[:len(idx), 0]
    third_o = so + sec_depth[:, None] * refl

    occ_pred = (1.0 - tr) > 0.5
    tp = (occ_pred & hit2).sum()
    prec = tp / max(occ_pred.sum(), 1)
    rec = tp / max(hit2.sum(), 1)
    both = occ_pred & hit2
    dt_err = np.abs(sec_depth - t2)[both]
    pos_err = np.linalg.norm(third_o - q_gt, axis=-1)[both]
    print(f"DIAG rays={len(idx)} gt_occluded={hit2.mean():.3f} "
          f"pred_occluded={occ_pred.mean():.3f}")
    print(f"DIAG occlusion precision={prec:.3f} recall={rec:.3f}")
    if both.any():
        print(f"DIAG depth_err: median={np.median(dt_err):.4f} "
              f"p90={np.percentile(dt_err, 90):.4f} (scene extent "
              f"{2 * extent:.2f})")
        print(f"DIAG third_hit_pos_err: median={np.median(pos_err):.4f} "
              f"p90={np.percentile(pos_err, 90):.4f}")
    # transmittance calibration on disagreements
    fp = occ_pred & ~hit2
    fn = ~occ_pred & hit2
    print(f"DIAG false_occluded={fp.mean():.3f} missed_occluded="
          f"{fn.mean():.3f} mean_tr_on_gt_open={tr[~hit2].mean():.3f} "
          f"mean_tr_on_gt_occ={tr[hit2].mean():.3f}", flush=True)


if __name__ == "__main__":
    main()
