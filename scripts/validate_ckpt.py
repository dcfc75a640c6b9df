"""Validate a checkpoint with the current code (PSNR on n val views).

Usage: python scripts/validate_ckpt.py <parsed_config.yaml> <ckpt.npz>
       [n_images] [dotlist overrides...]

Renders with the current eval path (escalating 2x/4x overflow fallback),
so checkpoints from older runs get honest metrics even where the
in-process val overflowed (the r3 long-run step-2250 artifact).

Dotlist overrides after n_images apply to the loaded config, e.g.
``model.eval_mode=sphere_trace`` to A/B the surface eval against the
volumetric render on the same checkpoint (timing is printed per view).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cfg_path, ckpt_path = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    n_images = 1
    if rest and "=" not in rest[0]:
        n_images = int(rest[0])
        rest = rest[1:]
    overrides = rest

    from rise_sdf_tpu import datasets, systems
    from rise_sdf_tpu.config import load_config

    cfg = load_config(cfg_path, cli_args=overrides)
    dm = datasets.make(cfg.dataset.name, cfg.dataset)
    system = systems.make(cfg.system.name, cfg, dm, save_dir="/tmp/valck")
    state = system.load_checkpoint(ckpt_path, system.init_state(0))
    print(f"loaded {ckpt_path} at step {int(state['step'])}", flush=True)
    t0 = time.time()
    res = system.validate(state, n_images=n_images)
    dt = time.time() - t0
    print(f"validate ({dt:.1f}s incl. compile, {n_images} views):", res,
          flush=True)


if __name__ == "__main__":
    main()
