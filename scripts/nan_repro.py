"""Minimize the Pallas scatter-kernel non-finite-grad fault (TODO.md #1).

Forensics so far: on rare *fresh* levels=7 graphs (96^2 synthetic run,
~step 375) the Pallas table-gradient scatter emits NaN into the coarse
Taylor-band hash grads; the isolated kernel passes every stress test, so
the fault is graph-context-dependent.  The round-2 fatal checkpoint was
lost to an environment reset, so this script (a) re-provokes the fault
from scratch and dumps the exact pre-fault state, then (b) replays that
single step under perturbations to bisect the trigger.

Usage:
  python scripts/nan_repro.py provoke [--steps 600] [--out /tmp/nanrepro]
      Train the 96^2 synthetic config with the self-healing fallback
      DISABLED (pure pallas path); on the first skipped_nonfinite step,
      dump {params, opt_state, occ, step, rng-seed} to --out.

  python scripts/nan_repro.py replay --dump /tmp/nanrepro/fault.npz \
      [--scatter pallas|xla] [--repeat 5]
      Re-run the faulting step from the dump.  Reports finite/NaN per
      grad leaf.  --repeat re-executes the same compiled step to probe
      nondeterminism.

Run on the real TPU (the fault never reproduces on CPU or with the XLA
scatter).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_compile_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def build_system(out_dir, scatter="pallas", overrides=()):
    from rise_sdf_tpu import datasets, systems
    from rise_sdf_tpu.config import parse_cli_overrides
    from rise_sdf_tpu.presets import tiny_split_config

    cfg = tiny_split_config()
    cfg.dataset.merge({"img_wh": [96, 96], "n_images": 16})
    cfg.model.geometry.xyz_encoding_config.merge(
        {"otype": "ProgressiveBandHashGrid", "n_levels": 12,
         "log2_hashmap_size": 17, "base_resolution": 16,
         "per_level_scale": 1.447269237440378, "start_level": 4,
         "start_step": 50, "update_steps": 25,
         "scatter_impl": scatter})
    cfg.model.merge({"num_samples_per_ray": 512, "train_num_rays": 1024,
                     "train_sample_capacity": 65536})
    if overrides:
        # graph perturbations for `minimize` (loss terms / secondary off
        # / probe variants) — params structure must stay compatible with
        # the dump, so only graph-shape knobs belong here
        cfg.merge(parse_cli_overrides(list(overrides)))
    dm = datasets.make(cfg.dataset.name, cfg.dataset)
    system = systems.make(cfg.system.name, cfg, dm, save_dir=out_dir)
    return system


def provoke(args):
    import numpy as np

    import jax

    system = build_system(args.out)
    state = system.init_state(args.seed)
    os.makedirs(args.out, exist_ok=True)
    faults = []

    def on_log(step, m):
        print(f"step {step}: loss={m.get('loss', float('nan')):.4f} "
              f"skipped={int(m.get('skipped_nonfinite', 0))}", flush=True)

    # manual loop (no self-heal): mirror fit() without the fallback
    import jax.numpy as jnp

    occ_update = system.occupancy_update_fn()
    rng = jax.random.PRNGKey(args.seed + 1)
    data = system.device_data(system.datamodule.train())
    step_fns = {}
    prev_state = None
    for step in range(args.steps):
        if system.grid_prune and step % 16 == 0:
            k = jax.random.fold_in(rng, 2 * step + 1)
            occs, binary = occ_update(state["params"], state["occs"],
                                      state["step"], k)
            state["occs"], state["occ_binary"] = occs, binary
        stage = system.train_stage(step)
        levels = system.model.open_levels(step)
        pf = system.train_prefilter(step)
        key = (stage, levels, pf)
        if key not in step_fns:
            print(f"step {step}: new graph {key}", flush=True)
            step_fns[key] = system.make_train_step(
                stage, levels=levels, prefilter=pf)
        k = jax.random.fold_in(rng, 2 * step)
        # keep a host copy BEFORE the update so the faulting step can be
        # replayed exactly (the update itself is skipped on a fault, but
        # donation invalidates the device buffers)
        prev_state = jax.device_get(state)
        state, aux = step_fns[key](state, k, data)
        skipped = float(aux.get("skipped_nonfinite", 0.0))
        if step % 25 == 0 or skipped:
            on_log(step, {k2: float(v) for k2, v in aux.items()})
        if skipped:
            path = os.path.join(args.out, f"fault_step{step}.npz")
            flat = {"__step": np.asarray(step),
                    "__seed": np.asarray(args.seed),
                    "__stage": np.asarray(stage if stage is not None else -1),
                    "__levels": np.asarray(levels if levels is not None
                                           else -1),
                    "__prefilter": np.asarray(int(pf))}
            leaves, treedef = jax.tree_util.tree_flatten(prev_state)
            for i, leaf in enumerate(leaves):
                flat[f"leaf_{i}"] = np.asarray(leaf)
            np.savez_compressed(path, **flat)
            print(f"FAULT at step {step} (graph {key}) — state dumped to "
                  f"{path}", flush=True)
            faults.append(step)
            if len(faults) >= args.max_faults:
                break
    print(f"done: {len(faults)} fault(s) at steps {faults}", flush=True)


def replay(args):
    import numpy as np

    import jax

    system = build_system("/tmp/nanrepro_replay", scatter=args.scatter,
                          overrides=args.override)
    state0 = system.init_state(0)  # structure template (+ builds tx)
    d = np.load(args.dump)
    step = int(d["__step"])
    stage = int(d["__stage"])
    stage = None if stage < 0 else stage
    levels = int(d["__levels"])
    levels = None if levels < 0 else levels
    if args.levels is not None:
        levels = args.levels  # minimization: fewer open bands
    pf = bool(int(d["__prefilter"]))
    seed = int(d["__seed"])
    leaves, treedef = jax.tree_util.tree_flatten(state0)
    leaves = [d[f"leaf_{i}"] for i in range(len(leaves))]
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    data = system.device_data(system.datamodule.train())
    rng = jax.random.PRNGKey(seed + 1)
    k = jax.random.fold_in(rng, 2 * step)
    step_fn = system.make_train_step(stage, levels=levels, prefilter=pf)
    n_faults = 0
    for r in range(args.repeat):
        st = jax.tree_util.tree_map(jax.numpy.asarray, jax.device_get(state))
        new_state, aux = step_fn(st, k, data)
        skipped = int(float(aux["skipped_nonfinite"]))
        n_faults += skipped
        print(f"replay {r}: scatter={args.scatter} "
              f"skipped={skipped} "
              f"loss={float(aux['loss']):.5f}", flush=True)
    print(f"REPLAY_RESULT faults={n_faults}/{args.repeat}", flush=True)


# perturbation matrix for `minimize`: (label, env, extra replay args).
# Kernel-side knobs isolate the Mosaic loop structure; graph-side knobs
# strip components of the levels=7 backward graph until the fault
# disappears — the smallest faulting arm is the upstream repro.
MINIMIZE_ARMS = [
    ("baseline-pallas", {}, []),
    ("xla-control", {}, ["--scatter", "xla"]),
    ("chunk-4096", {"RISE_SCATTER_CHUNK": "4096"}, []),
    ("chunk-2048", {"RISE_SCATTER_CHUNK": "2048"}, []),
    ("chunk-16384", {"RISE_SCATTER_CHUNK": "16384"}, []),
    ("unroll-1", {"RISE_SCATTER_UNROLL": "1"}, []),
    ("unroll-4", {"RISE_SCATTER_UNROLL": "4"}, []),
    ("unroll-16", {"RISE_SCATTER_UNROLL": "16"}, []),
    ("no-curvature", {},
     ["--override", "system.loss.lambda_curvature=0.0"]),
    ("no-secondary", {}, ["--override", "model.indirect_pred=false"]),
    ("no-eikonal", {}, ["--override", "system.loss.lambda_eikonal=0.0"]),
    ("levels-6", {}, ["--levels", "6"]),
    ("levels-5", {}, ["--levels", "5"]),
]


def minimize(args):
    import subprocess

    results = {}
    for label, env, extra in MINIMIZE_ARMS:
        cmd = [sys.executable, os.path.abspath(__file__), "replay",
               "--dump", args.dump, "--repeat", str(args.repeat)] + extra
        e = dict(os.environ, **env)
        print(f"=== arm {label}: {' '.join(cmd)} env={env}", flush=True)
        try:
            p = subprocess.run(cmd, env=e, capture_output=True, text=True,
                               timeout=args.arm_timeout)
            out = p.stdout + p.stderr
        except subprocess.TimeoutExpired as ex:
            out = (ex.stdout or "") + (ex.stderr or "") + "\nARM TIMEOUT"
        tail = [ln for ln in out.splitlines() if ln.strip()][-6:]
        print("\n".join("    " + ln for ln in tail), flush=True)
        m = [ln for ln in out.splitlines()
             if ln.startswith("REPLAY_RESULT")]
        results[label] = m[-1] if m else "NO RESULT (crash/timeout)"
    print("\n=== MINIMIZE SUMMARY ===", flush=True)
    for label, r in results.items():
        print(f"{label:20s} {r}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("provoke")
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--out", default="/tmp/nanrepro")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--max-faults", type=int, default=3)
    p = sub.add_parser("replay")
    p.add_argument("--dump", required=True)
    p.add_argument("--scatter", default="pallas")
    p.add_argument("--repeat", type=int, default=5)
    p.add_argument("--override", action="append", default=[],
                   help="config dotlist override (graph perturbation)")
    p.add_argument("--levels", type=int, default=None,
                   help="override the static open-level count")
    p = sub.add_parser("minimize")
    p.add_argument("--dump", required=True)
    p.add_argument("--repeat", type=int, default=3)
    p.add_argument("--arm-timeout", type=int, default=1200)
    args = ap.parse_args()
    if args.cmd == "provoke":
        provoke(args)
    elif args.cmd == "minimize":
        minimize(args)
    else:
        replay(args)


if __name__ == "__main__":
    main()
