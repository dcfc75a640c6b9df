"""Train the full pipeline on the procedural sphere scene (TPU-friendly).

Validates learning dynamics end-to-end without external datasets: NeuS
warmup -> split-sum PBR stage, reporting val PSNR along the way.

Usage: python scripts/train_synthetic.py [--steps N] [--system split|neus]
       [--res 128] [--out /tmp/synth]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_compile_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import argparse
import numpy as np
import sys
import time


def _apply_platform_env():
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def main():
    _apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--system", default="split", choices=["split", "neus"])
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--kick", type=int, default=1000)
    ap.add_argument("--out", default="/tmp/synth_train")
    ap.add_argument("--rays", type=int, default=2048)
    ap.add_argument("--capacity", type=int, default=131072)
    ap.add_argument("--val-every", type=int, default=0)
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 matmuls (f32 accum) on the geometry and "
                         "texture MLP heads — the measured 18%% train-step "
                         "lever; used for the quality A/B vs f32")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--save-every", type=int, default=0,
                    help="checkpoint every N steps (NaN forensics)")
    ap.add_argument("--resume", default=None,
                    help="checkpoint to resume from (replays the same "
                         "deterministic rng stream from the saved step)")
    ap.add_argument("--scatter", default=None,
                    choices=["auto", "xla", "pallas"],
                    help="hash-table gradient scatter impl override "
                         "(NaN isolation: 'xla' bypasses the Pallas "
                         "kernel)")
    ap.add_argument("--test", action="store_true",
                    help="run the full test protocol (nvs + phys + "
                         "albedo/roughness + relighting) after training; "
                         "adds the 'warm' relight GT to the dataset")
    ap.add_argument("--export", action="store_true",
                    help="with --test: also export the mesh (+ materials "
                         "for --system split)")
    ap.add_argument("--debug-nans", action="store_true",
                    help="jax_debug_nans: raise with a traceback at the "
                         "first NaN-producing op")
    ap.add_argument("--check-nan", action="store_true",
                    help="log every step and halt at the first non-finite "
                         "loss term (NaN bisection)")
    ap.add_argument("--lr", type=float, default=None,
                    help="override geometry/texture lr (the tiny preset's "
                         "0.01 can blow up at level openings; the "
                         "production config trains at 0.005)")
    ap.add_argument("--set", dest="overrides", action="append", default=[],
                    metavar="KEY=VALUE",
                    help="dotlist config override applied last (repeatable; "
                         "e.g. --set model.geometry.curvature_probe_frac=0.25"
                         " for perf/quality A/Bs)")
    ap.add_argument("--dump-config-only", action="store_true",
                    help="write <out>/parsed.yaml for these args and exit "
                         "(reconstructs the config of an already-finished "
                         "run for validate_ckpt.py)")
    args = ap.parse_args()

    from rise_sdf_tpu import datasets, systems
    from rise_sdf_tpu.presets import tiny_neus_config, tiny_split_config

    cfg = tiny_split_config() if args.system == "split" else tiny_neus_config()
    # scale the tiny preset up to a realistic-but-quick config
    cfg.dataset.merge({"img_wh": [args.res, args.res], "n_images": 16})
    geom_enc = {"n_levels": 12, "log2_hashmap_size": 17, "base_resolution": 16,
                "per_level_scale": 1.447269237440378}
    cfg.model.geometry.xyz_encoding_config.merge(geom_enc)
    if args.system == "split":
        cfg.model.geometry.xyz_encoding_config.merge(
            {"start_level": 4, "start_step": args.kick // 4,
             "update_steps": max(args.kick // 8, 1)})
    cfg.model.geometry.mlp_network_config.merge({"n_neurons": 64,
                                                 "n_hidden_layers": 1})
    cfg.model.geometry.feature_dim = 16
    # production default flips mirrored from configs/split-mixed-occ-
    # tensoir.yaml so mini-protocol runs exercise the shipped config:
    # - curvature_probe_frac 0.25 (r4 A/B, RESULTS.md r4ab_curv25
    #   30.46/28.81 vs control 30.35/28.79: unbiased 1/4-stride curvature
    #   estimate passes the bar at 75% fewer probe rows)
    # - fd_fine_k 3 (r4 A/B: finek3 30.57/28.97 vs derived-4 control,
    #   +0.22 dB at ~18% fewer train gather rows)
    cfg.model.geometry.curvature_probe_frac = 0.25
    cfg.model.geometry.fd_fine_k = 3
    cfg.model.merge({
        "num_samples_per_ray": 512, "train_num_rays": args.rays,
        "max_train_num_rays": args.rays,
        "train_sample_capacity": args.capacity,
        "eval_samples_per_ray": 96, "ray_chunk": 4096,
        "grid_resolution": 64, "cos_anneal_end": args.kick,
        # transmittance-aware marching: keeps converged-grid evals inside
        # the sample buffer (without it the 2x fallback overflows once the
        # surface is solid) and shrinks the post-kick-in train budget
        "visibility_prefilter": True,
    })
    if args.system == "split":
        cfg.model.split_sum_kick_in_step = args.kick
        cfg.model.num_samples_per_secondary_ray = 48
        cfg.model.texture.input_feature_dim = 16
        for head in ["metallic", "albedo", "spec", "roughness", "secondary"]:
            cfg.model.texture[f"{head}_mlp_network_config"].merge(
                {"n_neurons": 64, "n_hidden_layers": 2})
        cfg.model.light.envlight_config.base_res = 128
    else:
        cfg.model.texture.input_feature_dim = 16 + 3
        cfg.model.texture.mlp_network_config.merge({"n_neurons": 64,
                                                    "n_hidden_layers": 2})
    if args.bf16:
        cfg.model.geometry.mlp_network_config.compute_dtype = "bfloat16"
        if args.system == "split":
            for head in ["metallic", "albedo", "spec", "roughness",
                         "secondary"]:
                cfg.model.texture[f"{head}_mlp_network_config"]\
                    .compute_dtype = "bfloat16"
        else:
            cfg.model.texture.mlp_network_config.compute_dtype = "bfloat16"
    if args.scatter:
        cfg.model.geometry.xyz_encoding_config.scatter_impl = args.scatter
    if args.lr is not None:
        cfg.system.optimizer.args.lr = args.lr
        for grp in ("geometry", "texture"):
            if grp in cfg.system.optimizer.params:
                cfg.system.optimizer.params[grp].lr = args.lr
    cfg.trainer.max_steps = args.steps
    if args.save_every:
        cfg.trainer.save_every_n_steps = args.save_every
    cfg.system.scheduler = {
        "name": "SequentialLR", "milestones": [200],
        "schedulers": [
            {"name": "LinearLR", "args": {"start_factor": 0.01,
                                          "end_factor": 1.0,
                                          "total_iters": 200}},
            {"name": "ExponentialLR",
             "args": {"gamma": 0.1 ** (1.0 / max(args.steps - 200, 1))}},
        ],
    }

    if args.test and args.system == "split":
        # run-scoped envmap dir: a shared /tmp path could hand the emitter a
        # stale EXR from an earlier run with a different env function
        cfg.dataset.merge({"relight_list": ["warm"],
                           "hdr_filepath": os.path.join(args.out, "envmaps")})
    if args.overrides:
        from rise_sdf_tpu.config import parse_cli_overrides

        cfg.merge(parse_cli_overrides(args.overrides))
        print("overrides:", args.overrides, flush=True)

    if args.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)
    # dump the resolved config so validate_ckpt.py / post-hoc A/Bs can
    # rebuild this exact model around any checkpoint from this run
    from rise_sdf_tpu.config import dump_config

    os.makedirs(args.out, exist_ok=True)
    dump_config(cfg, os.path.join(args.out, "parsed.yaml"))
    if args.dump_config_only:
        print(f"wrote {os.path.join(args.out, 'parsed.yaml')}", flush=True)
        return None

    dm = datasets.make(cfg.dataset.name, cfg.dataset)
    system = systems.make(cfg.system.name, cfg, dm, save_dir=args.out)
    state = None
    if args.resume:
        state = system.load_checkpoint(args.resume, system.init_state(
            args.seed))
        print(f"resumed from {args.resume} at step {int(state['step'])}",
              flush=True)
    t0 = time.time()
    on_log = None
    if args.check_nan:
        def on_log(step, metrics):
            bad = {k: v for k, v in metrics.items()
                   if isinstance(v, float) and not np.isfinite(v)}
            print(f"step {step}: " + " ".join(
                f"{k}={v:.5g}" for k, v in sorted(metrics.items())),
                flush=True)
            if bad:
                print(f"NON-FINITE at step {step}: {sorted(bad)}", flush=True)
                raise SystemExit(3)
    state = system.fit(max_steps=args.steps,
                       log_every=1 if args.check_nan else 100,
                       seed=args.seed, val_every=args.val_every or None,
                       on_log=on_log, state=state)
    print(f"total train time {time.time() - t0:.1f}s", flush=True)
    res = system.validate(state, n_images=2)
    print("FINAL", res, flush=True)
    if args.test:
        t1 = time.time()
        system.test(state, export=args.export)
        print(f"test protocol time {time.time() - t1:.1f}s", flush=True)
    return res


if __name__ == "__main__":
    main()
