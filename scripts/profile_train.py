"""Time the jitted training step (stage 0/1) at production scale."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("OMP_NUM_THREADS", "1")

import time

import jax
import numpy as np


def main():
    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    from rise_sdf_tpu import datasets, systems
    from rise_sdf_tpu.config import load_config

    cfg = load_config("configs/split-mixed-occ-tensoir.yaml",
                      cli_args=["dataset.scene=bench",
                                "dataset.name=synthetic-sphere",
                                "dataset.img_wh=[256,256]",
                                "dataset.n_images=4"])
    dm = datasets.make(cfg.dataset.name, cfg.dataset)
    system = systems.make(cfg.system.name, cfg, dm, save_dir="/tmp/ptrain")
    state = system.init_state(0)
    data = system.device_data(dm.train())

    occ_update = system.occupancy_update_fn()
    t0 = time.time()
    occs, binary = occ_update(state["params"], state["occs"], state["step"],
                              jax.random.PRNGKey(1))
    jax.block_until_ready(binary)
    print(f"occ update compile+run: {time.time() - t0:.1f}s",
          file=sys.stderr, flush=True)
    t0 = time.time()
    for i in range(3):
        occs, binary = occ_update(state["params"], occs, state["step"],
                                  jax.random.PRNGKey(i))
    jax.block_until_ready(binary)
    print(f"occ update steady: {(time.time() - t0) / 3 * 1e3:.1f} ms",
          file=sys.stderr, flush=True)
    state["occs"], state["occ_binary"] = occs, binary

    from rise_sdf_tpu.utils import roofline

    n_levels = system.model.open_levels(10 ** 9)  # all open
    warm_levels = system.model.open_levels(0)
    for stage, levels in ((0, warm_levels), (0, n_levels), (1, n_levels)):
        ts = system.make_train_step(stage, levels=levels)
        # AOT compile so XLA's own cost analysis (flops + bytes of the
        # emitted module) positions each stage against the chip roofs
        # (VERDICT r2 item 5: which roof binds each stage)
        t0 = time.time()
        compiled = ts.lower(state, jax.random.PRNGKey(2), data).compile()
        costs = roofline.module_costs(compiled)
        state, aux = compiled(state, jax.random.PRNGKey(2), data)
        jax.block_until_ready(aux["loss"])
        print(f"stage{stage}/L{levels} compile+first: {time.time() - t0:.1f}s "
              f"loss={float(aux['loss']):.4f}", file=sys.stderr, flush=True)
        t0 = time.time()
        n = 10
        for i in range(n):
            state, aux = compiled(state, jax.random.PRNGKey(3 + i), data)
            # force a host read per step: on the axon runtime
            # block_until_ready alone returns without executing
            # (measured — scripts/pallas_gather_bench.py docstring);
            # the ~25 ms round-trip is noise at seconds-per-step
            float(aux["loss"])
        dt = (time.time() - t0) / n
        line = (f"stage{stage}/L{levels} steady: {dt * 1e3:.1f} "
                f"ms/step rays={int(aux['num_rays'])} "
                f"samples={int(aux['num_samples'])} "
                f"samples/s={int(aux['num_samples']) / dt:.3g}")
        if costs is not None:
            r = roofline.summarize(costs, 1, dt, jax.devices()[0])
            line += (f" | {r['achieved_tflops']:.2f} TFLOP/s"
                     f" (mfu {r['est_mfu'] * 100:.1f}%),"
                     f" {r['achieved_hbm_gbs']:.0f} GB/s"
                     f" ({r['est_membw_frac'] * 100:.1f}% of HBM;"
                     f" pre-fusion upper bound)")
        print(line, file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
