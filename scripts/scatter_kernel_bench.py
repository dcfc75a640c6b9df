"""Microbenchmark: XLA scatter-add vs a Pallas VMEM-accumulator kernel.

Shapes mirror one hash level's table-gradient reduction at reference
scale: M ~ 12.6M contribution rows (6 probes x 8 corners x 262k samples)
into a [2^19, 2] f32 table (~24 collisions/entry).

The Pallas kernel keeps the whole accumulator in VMEM ([T/64, 128] so
the F=2 rows don't tile-pad), streams index chunks through SMEM, and
does a serial read-modify-write per contribution — no HBM round-trip
per row, which is where XLA's scatter burns its time.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 1 << 19
F = 2
LANES = 128
EPR = LANES // F  # table entries per accumulator row
CHUNK = 8192


def pallas_scatter_add(idx, vals, table_size=T):
    """idx [M] int32 in [0, table_size); vals [M, F] f32 -> [table_size, F]."""
    m = idx.shape[0]
    assert m % CHUNK == 0
    rows = table_size // EPR

    lane_iota = None

    def kernel(idx_ref, vals_ref, out_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

        def one(i):
            t = idx_ref[0, i]
            row = t // EPR
            lane = (t % EPR) * F
            v0 = vals_ref[0, i]
            v1 = vals_ref[1, i]
            # dynamic-lane RMW is not lane-aligned on TPU; build a
            # one-hot [1, LANES] contribution and add the whole row
            contrib = jnp.where(iota == lane, v0,
                                jnp.where(iota == lane + 1, v1, 0.0))
            out_ref[pl.ds(row, 1), :] = out_ref[pl.ds(row, 1), :] + contrib

        UNROLL = 8

        def body(j, _):
            base = j * UNROLL
            for k in range(UNROLL):
                one(base + k)
            return 0

        jax.lax.fori_loop(0, CHUNK // UNROLL, body, 0)

    out = pl.pallas_call(
        kernel,
        grid=(m // CHUNK,),
        in_specs=[
            pl.BlockSpec((1, CHUNK), lambda i: (0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((F, CHUNK), lambda i: (0, i),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((rows, LANES), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
    )(idx.reshape(1, -1), vals.T)
    return out.reshape(table_size, F)


def main():
    m = 3072 * 4096  # ~12.6M
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k1, (m,), 0, T, dtype=jnp.int32)
    vals = jax.random.normal(k2, (m, F), jnp.float32)

    @jax.jit
    def xla_scatter(idx, vals):
        return jnp.zeros((T, F), jnp.float32).at[idx].add(vals)

    pallas_fn = jax.jit(partial(pallas_scatter_add, table_size=T))

    # correctness
    want = np.asarray(xla_scatter(idx[:CHUNK * 4], vals[:CHUNK * 4]))
    got = np.asarray(pallas_fn(idx[:CHUNK * 4], vals[:CHUNK * 4]))
    err = np.abs(want - got).max()
    print(f"correctness max abs err (4 chunks): {err:.2e}", flush=True)
    assert err < 1e-3

    from _timing import timeit_op
    for name, fn in [("xla_scatter", xla_scatter), ("pallas", pallas_fn)]:
        dt = timeit_op(name, fn, idx, vals, iters=5, chain=1)
        print(f"{name:12s} {dt * 1e3:8.1f} ms  {dt / m * 1e9:6.2f} ns/row",
              flush=True)


if __name__ == "__main__":
    main()
