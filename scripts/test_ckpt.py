"""Run the FULL test protocol on a checkpoint with the current code.

Usage: python scripts/test_ckpt.py <parsed_config.yaml> <ckpt.npz>
       [--no-export] [key=value ...]

The reference protocol (`/root/reference/launch.py:119-127` --test) is
trainer.test() on the best checkpoint: NVS + phys PSNR/SSIM/LPIPS,
median-aligned albedo PSNR/SSIM, roughness PSNR, per-light relighting
PSNR/SSIM, mesh export.  This script is the standalone analog so
checkpoints from older runs get metrics from the *current* eval path
(escalating 2x/4x overflow fallback, edge-padded partial chunks).

Extra ``key=value`` dotlist args override the parsed config (e.g.
``dataset.n_test_images=8`` to bound wall-time on this 1-core host).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = [a for a in sys.argv[1:] if a != "--no-export"]
    export = "--no-export" not in sys.argv
    cfg_path, ckpt_path = args[0], args[1]
    dotlist = args[2:]

    from rise_sdf_tpu import datasets, systems
    from rise_sdf_tpu.config import load_config

    cfg = load_config(cfg_path, cli_args=dotlist)
    dm = datasets.make(cfg.dataset.name, cfg.dataset)
    save_dir = os.environ.get("TEST_CKPT_SAVE_DIR", "/tmp/testck")
    system = systems.make(cfg.system.name, cfg, dm, save_dir=save_dir)
    state = system.load_checkpoint(ckpt_path, system.init_state(0))
    print(f"loaded {ckpt_path} at step {int(state['step'])}", flush=True)
    res = system.test(state, export=export)
    print("test:", res, flush=True)


if __name__ == "__main__":
    main()
