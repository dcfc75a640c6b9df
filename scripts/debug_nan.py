"""Locate the first NaN in synthetic training: which step, which tree."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("OMP_NUM_THREADS", "1")

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def finite_map(tree):
    return {k: bool(jnp.all(jnp.isfinite(v)).item()) if hasattr(v, "dtype")
            else all(finite_map({"x": l}).values()
                     for l in jax.tree_util.tree_leaves(v))
            for k, v in tree.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--no-curvature", action="store_true")
    ap.add_argument("--no-secondary", action="store_true")
    ap.add_argument("--no-mask-loss", action="store_true")
    ap.add_argument("--no-occ-update", action="store_true")
    ap.add_argument("--analytic", action="store_true")
    args = ap.parse_args()

    from rise_sdf_tpu import datasets, systems
    import scripts.train_synthetic as ts

    sys.argv = ["x", "--steps", "400", "--kick", "200", "--res", "96",
                "--rays", "1024", "--capacity", "65536"]
    # rebuild the same config train_synthetic uses
    from rise_sdf_tpu.presets import tiny_split_config

    cfg = tiny_split_config()
    cfg.dataset.merge({"img_wh": [96, 96], "n_images": 16})
    cfg.model.geometry.xyz_encoding_config.merge(
        {"n_levels": 12, "log2_hashmap_size": 17, "base_resolution": 16,
         "per_level_scale": 1.447269237440378,
         "start_level": 4, "start_step": 50, "update_steps": 25})
    cfg.model.geometry.mlp_network_config.merge({"n_neurons": 64,
                                                 "n_hidden_layers": 1})
    cfg.model.geometry.feature_dim = 16
    cfg.model.merge({"num_samples_per_ray": 512, "train_num_rays": 1024,
                     "max_train_num_rays": 1024,
                     "train_sample_capacity": 65536,
                     "eval_samples_per_ray": 96, "ray_chunk": 4096,
                     "grid_resolution": 64, "cos_anneal_end": 200,
                     "split_sum_kick_in_step": 200,
                     "num_samples_per_secondary_ray": 48})
    if args.no_secondary:
        cfg.model.indirect_pred = False
    if args.analytic:
        cfg.model.geometry.grad_type = "analytic"
        del cfg.model.geometry["finite_difference_eps"]
    cfg.model.texture.input_feature_dim = 16
    for head in ["metallic", "albedo", "spec", "roughness", "secondary"]:
        cfg.model.texture[f"{head}_mlp_network_config"].merge(
            {"n_neurons": 64, "n_hidden_layers": 2})
    cfg.model.light.envlight_config.base_res = 128
    if args.no_curvature:
        cfg.system.loss.lambda_curvature = 0.0
    if args.no_mask_loss:
        cfg.system.loss.lambda_mask = 0.0

    dm = datasets.make(cfg.dataset.name, cfg.dataset)
    system = systems.make(cfg.system.name, cfg, dm, save_dir="/tmp/dbg_nan")
    state = system.init_state(0)
    data = system.device_data(dm.train())
    ts_fn = system.make_train_step(0)
    occ_update = system.occupancy_update_fn()
    rng = jax.random.PRNGKey(1)
    for step in range(args.steps):
        if not args.no_occ_update and step % 16 == 0:
            rng, k = jax.random.split(rng)
            occs, binary = occ_update(state["params"], state["occs"],
                                      state["step"], k)
            state["occs"], state["occ_binary"] = occs, binary
            if not bool(jnp.all(jnp.isfinite(occs)).item()):
                print(f"step {step}: OCCS NOT FINITE", flush=True)
                break
        rng, k = jax.random.split(rng)
        state, aux = ts_fn(state, k, data)
        fin = finite_map(state["params"])
        loss = float(aux["loss"])
        if step % 5 == 0 or not all(fin.values()) or not np.isfinite(loss):
            print(f"step {step}: loss={loss:.4f} "
                  f"samples={int(aux['num_samples'])} "
                  f"inv_s={float(aux['inv_s']):.2f} finite={fin} "
                  f"losses={ {k2: round(float(v2), 5) for k2, v2 in aux.items() if k2 not in ('num_samples','num_rays')} }",
                  flush=True)
        if not all(fin.values()) or not np.isfinite(loss):
            print("FIRST NON-FINITE at step", step, flush=True)
            break
    else:
        print("NO NAN in", args.steps, "steps", flush=True)


if __name__ == "__main__":
    main()
