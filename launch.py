"""CLI launcher — output-compatible with the reference ``launch.py``.

Usage (same surface as reference launch.py:10-33):

    python launch.py --config configs/neus-blender.yaml --train \
        dataset.scene=lego [dotlist overrides...]

Experiment layout (reference launch.py:55-60):
    exp/[name]/[tag]@[timestamp]/{config,ckpt,save}
"""

from __future__ import annotations

import os

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_compile_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import argparse
import datetime
import os
import sys


def _apply_platform_env():
    """Make JAX_PLATFORMS authoritative: the experimental axon TPU
    plugin can claim the backend even when the env asks for cpu, so
    mirror the env var onto the live jax config before any tracing."""
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def main():
    _apply_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True, help="path to config file")
    parser.add_argument("--gpu", default="0",
                        help="device selector (kept for CLI compatibility)")
    parser.add_argument("--resume", default=None,
                        help="path to checkpoint to resume from")
    parser.add_argument("--resume_weights_only", action="store_true")
    group = parser.add_mutually_exclusive_group(required=True)
    group.add_argument("--train", action="store_true")
    group.add_argument("--validate", action="store_true")
    group.add_argument("--test", action="store_true")
    group.add_argument("--predict", action="store_true")
    parser.add_argument("--exp_dir", default="./exp")
    parser.add_argument("--verbose", action="store_true")
    args, extras = parser.parse_known_args()

    import numpy as np

    from rise_sdf_tpu import datasets, systems
    from rise_sdf_tpu.config import dump_config, load_config

    config = load_config(args.config, cli_args=extras)
    config.setdefault("cmd_args", vars(args))

    name = config.get("name", "exp")
    tag = config.get("tag", "") or ""
    ts = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    trial = f"{tag}@{ts}" if tag else f"@{ts}"
    trial_dir = os.path.join(args.exp_dir, name, trial)
    config["trial_dir"] = trial_dir
    save_dir = os.path.join(trial_dir, "save")
    ckpt_dir = os.path.join(trial_dir, "ckpt")
    config_dir = os.path.join(trial_dir, "config")
    for d in (save_dir, ckpt_dir, config_dir):
        os.makedirs(d, exist_ok=True)
    # config snapshot (reference utils/callbacks.py:84-91): parsed + raw
    dump_config(config, os.path.join(config_dir, "parsed.yaml"))
    try:
        import shutil

        shutil.copy(args.config, os.path.join(config_dir, "raw.yaml"))
    except OSError:
        pass
    # code snapshot via git ls-files (reference utils/callbacks.py:56-70)
    try:
        import subprocess

        files = subprocess.run(["git", "ls-files"], capture_output=True,
                               text=True, check=True).stdout.split()
        with open(os.path.join(trial_dir, "code_snapshot.txt"), "w") as f:
            head = subprocess.run(["git", "rev-parse", "HEAD"],
                                  capture_output=True, text=True).stdout.strip()
            f.write(f"commit {head}\n" + "\n".join(files) + "\n")
    except Exception:
        pass

    seed = int(config.get("seed", 42))
    np.random.seed(seed)

    dm = datasets.make(config["dataset"]["name"], config["dataset"])
    system = systems.make(config["system"]["name"], config, dm,
                          save_dir=save_dir, ckpt_dir=ckpt_dir)

    # data-parallel mesh over all visible devices (the reference wires DDP
    # over the --gpu list here, launch.py:84-97); single device = no mesh.
    # Multi-host (TPU pod) runs initialize the distributed runtime first
    # (guarded: no-op without a coordinator configured).
    import jax

    from rise_sdf_tpu.parallel import initialize_distributed

    initialize_distributed()
    if jax.device_count() > 1:
        from rise_sdf_tpu.parallel import get_mesh

        # system.table_shards > 1 carves a 'model' axis off the mesh that
        # shards hash-table rows (embedding-style tensor parallelism) —
        # tables and their Adam moments beyond one chip's HBM
        tp = int(config["system"].get("table_shards", 1))
        system.mesh = get_mesh(table_shards=tp)
        print(f"mesh over {jax.device_count()} devices: "
              f"data={system.mesh.shape['data']}"
              + (f" x model={tp}" if tp > 1 else "")
              + f" ({jax.process_count()} hosts)", flush=True)

    state = system.init_state(seed)
    if args.resume:
        if args.resume_weights_only:
            state = system.load_weights_only(args.resume, state)
        else:
            state = system.load_checkpoint(args.resume, state)

    val_every = config["trainer"].get("val_check_interval", None)
    log_every = int(config["trainer"].get("log_every_n_steps", 100))

    if args.train:
        state = system.fit(seed=seed, state=state, log_every=log_every,
                           val_every=val_every)
        system.test(state)
    elif args.validate:
        system.validate(state)
    elif args.test:
        system.test(state)
    elif args.predict:
        hdr = config["model"]["light"]["envlight_config"].get("hdr_filepath")
        system.predict(state, hdr)


if __name__ == "__main__":
    main()
