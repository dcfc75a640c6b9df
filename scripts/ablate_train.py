"""Ablate the stage-1 train step at reference scale to locate hot parts.

Each variant toggles one subsystem via config overrides; the delta vs
the full step attributes its cost (XLA DCE removes subgraphs whose loss
weight/flag is off).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("OMP_NUM_THREADS", "1")

import time

import jax


VARIANTS = [
    ("full", []),
    ("no_curvature", ["system.loss.lambda_curvature=0.0"]),
    ("no_secondary", ["model.indirect_pred=false"]),
    ("analytic_grads", ["model.geometry.grad_type=analytic"]),
    ("plain_fd", ["model.geometry.fd_taylor_coarse=false"]),
    ("no_distill", ["system.loss.lambda_emitter_distillation=0.0"]),
]


def main():
    from rise_sdf_tpu import datasets, systems
    from rise_sdf_tpu.config import load_config

    stage = int(os.environ.get("ABLATE_STAGE", "1"))
    for name, overrides in VARIANTS:
        cfg = load_config(
            "configs/split-mixed-occ-tensoir.yaml",
            cli_args=["dataset.scene=bench", "dataset.name=synthetic-sphere",
                      "dataset.img_wh=[256,256]", "dataset.n_images=4"]
            + overrides)
        dm = datasets.make(cfg.dataset.name, cfg.dataset)
        system = systems.make(cfg.system.name, cfg, dm,
                              save_dir="/tmp/ablate")
        state = system.init_state(0)
        data = system.device_data(dm.train())
        levels = system.model.open_levels(10 ** 9)
        ts = system.make_train_step(stage, levels=levels)
        t0 = time.time()
        state, aux = ts(state, jax.random.PRNGKey(2), data)
        float(aux["loss"])  # host read: forces execution on axon
        compile_s = time.time() - t0
        t0 = time.time()
        n = 8
        for i in range(n):
            state, aux = ts(state, jax.random.PRNGKey(3 + i), data)
        # the state chain makes each step depend on the previous; reading
        # the final loss forces the whole sequence (axon defers otherwise)
        float(aux["loss"])
        dt = (time.time() - t0) / n * 1e3
        print(f"{name:16s} {dt:8.1f} ms/step  (compile {compile_s:.0f}s, "
              f"samples={int(aux['num_samples'])})", flush=True)


if __name__ == "__main__":
    main()
