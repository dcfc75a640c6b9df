#!/usr/bin/env python
"""Can a Pallas kernel beat XLA's ~5.3 ns/row hash-table gather?

The train-step floor is the hash-encode gather volume (BASELINE.md).
XLA's TPU gather streams rows from HBM at an issue-rate-bound ~5.3
ns/row.  A 2^19 x 2 level table is only 4 MB — it fits in VMEM — so if
Mosaic can vector-gather from a VMEM-resident table, the floor drops.
This measures the candidates against the XLA baseline:

  xla        table[idx] (the production path today)
  pallas-row scatter-kernel-style per-row loop over a VMEM table
             (expected ~15 ns/row — the known-slow shape, for reference)
  pallas-take jnp.take on a VMEM-resident flattened table inside the
             kernel (whether Mosaic lowers this at all, and how fast)

Records results either way — a measured dead end is a result
(TODO.md: plain Pallas gather lost to XLA in round 2; this tests the
VMEM-resident variants specifically).

MEASURED (2026-08-17, v5e via axon; forced-host-read protocol — see
timeit below, block_until_ready alone is a LIE on this runtime):

  control (idx math + reduce)   3.06 ns/row  (~25 ms = fixed tunnel
                                round-trip overhead per forced read)
  xla gather                    7.35 ns/row  => ~4.3 ns/row net of
                                overhead (matches the r2 5.3 anchor)
  pallas-row                   29.4 ns/row   => ~26 net — 6x slower
  pallas-take                  does not lower (Mosaic AssertionError:
                               no vectorized dynamic VMEM gather on
                               this stack)

DEAD END: a Pallas VMEM-resident gather cannot beat XLA's issue-rate-
bound gather here; a fused encode kernel would have to win by removing
probe-redundant rows, not by a faster raw gather.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("OMP_NUM_THREADS", "1")

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

T = 1 << 19   # entries per level
F = 2         # features per entry
M = 1 << 23   # gather rows (~8.4M; a step issues ~100M+)
LANES = 128
EPR = LANES // F  # entries per packed row


def timeit(fn, *args, iters=5):
    """Forced-host-read timing: on the axon runtime block_until_ready
    returns WITHOUT executing (measured: an 8.4M-row gather "completes"
    in 0.1 ms, with or without host-side output->input chaining).  Only
    an actual host read of (a reduction of) the output forces the
    dispatch, so every iteration fetches a scalar sum; subtract the
    control row (same idx math + reduce, no gather) to remove the
    ~25 ms fixed tunnel round-trip."""
    red = jax.jit(lambda *a: fn(*a).sum())
    out = float(red(*args))
    t0 = time.time()
    for _ in range(iters):
        out = float(red(*args))
    dt = (time.time() - t0) / iters
    return dt, fn(*args)


def xla_gather(table, idx):
    return table[idx]


@partial(jax.jit, static_argnums=(2,))
def pallas_row_gather(table_packed, idx, interpret=False):
    """Per-row loop over a VMEM-resident packed [T/EPR, 128] table."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    chunk = 8192
    m = idx.shape[0]
    assert m % chunk == 0
    rows = table_packed.shape[0]

    def kernel(tab_ref, idx_ref, out_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

        def one(i):
            t = idx_ref[0, i]
            row = t // EPR
            lane = (t % EPR) * F
            vec = tab_ref[pl.ds(row, 1), :]
            for c in range(F):
                out_ref[c, i] = jnp.sum(
                    jnp.where(iota == lane + c, vec, 0.0))

        unroll = 8

        def body(j, _):
            base = j * unroll
            for k in range(unroll):
                one(base + k)
            return 0

        jax.lax.fori_loop(0, chunk // unroll, body, 0)

    out = pl.pallas_call(
        kernel,
        grid=(m // chunk,),
        in_specs=[
            pl.BlockSpec((rows, LANES), lambda i: (0, 0)),
            pl.BlockSpec((1, chunk), lambda i: (0, i),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((F, chunk), lambda i: (0, i),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((F, m), jnp.float32),
        interpret=interpret,
    )(table_packed, idx.reshape(1, -1))
    return out.T


@partial(jax.jit, static_argnums=(2,))
def pallas_take_gather(table_packed, idx, interpret=False):
    """jnp.take on the VMEM-resident table inside the kernel — probes
    whether Mosaic has a vectorized VMEM gather lowering."""
    from jax.experimental import pallas as pl

    chunk = 1 << 15
    m = idx.shape[0]
    assert m % chunk == 0
    rows = table_packed.shape[0]

    def kernel(tab_ref, idx_ref, out_ref):
        t = idx_ref[:]                      # [chunk] int32
        flat = tab_ref[:]                   # [rows, 128]
        row = t // EPR
        lane = (t % EPR) * F
        for c in range(F):
            # vectorized 2-D gather: per element (row, lane+c)
            out_ref[:, c] = flat[row, lane + c]

    out = pl.pallas_call(
        kernel,
        grid=(m // chunk,),
        in_specs=[
            pl.BlockSpec((rows, LANES), lambda i: (0, 0)),
            pl.BlockSpec((chunk,), lambda i: (i,)),
        ],
        out_specs=pl.BlockSpec((chunk, F), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, F), jnp.float32),
        interpret=interpret,
    )(table_packed, idx)
    return out


def main():
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(T, F).astype(np.float32))
    table_packed = table.reshape(T // EPR, LANES)
    idx = jnp.asarray(rng.randint(0, T, size=(M,)).astype(np.int32))

    dt, ref = timeit(jax.jit(xla_gather), table, idx)
    print(f"xla gather:     {dt * 1e9 / M:.2f} ns/row ({dt * 1e3:.1f} ms)")

    for name, fn in [("pallas-row", pallas_row_gather),
                     ("pallas-take", pallas_take_gather)]:
        try:
            dt, out = timeit(lambda a, b: fn(a, b, False), table_packed, idx)
            ok = bool(jnp.allclose(out, ref))
            print(f"{name}: {dt * 1e9 / M:.2f} ns/row ({dt * 1e3:.1f} ms) "
                  f"match={ok}")
        except Exception as e:
            print(f"{name}: FAILED — {type(e).__name__}: "
                  f"{(str(e).splitlines() or [repr(e)])[0][:200]}")


if __name__ == "__main__":
    main()
