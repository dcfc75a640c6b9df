"""Round-5 gather record: row-width sweep + the per-row DMA kernel.

Two questions the round-5 design rests on:

1. **Row width**: the eval-time SDF bake (ops/sdf_bake.py) packs 8
   corners into one 32-byte row on the premise that XLA's TPU gather is
   issue-rate-bound (ns/ROW roughly constant in width), so 1 wide row
   beats 8 narrow rows ~8x.  Measured here: [T,2] vs [T,8] vs [T,32]
   f32 tables at the same row count.

2. **Per-row DMA** (VERDICT r4 #1b): can a Pallas kernel beat XLA's
   ~4.3 ns/row issue roof by streaming rows with async HBM->VMEM copies
   (the embedding-lookup pattern, scalar-prefetched indices, 8 DMAs in
   flight)?  Prior dead ends (BASELINE.md): pallas-row VMEM loop 6x
   slower; pallas-take does not lower.  This bench closes the remaining
   branch of the design space either way — per-descriptor DMA overhead
   is O(100ns), so the expectation is a clean negative unless the DMA
   engines surprise us.

Timing protocol: forced host read of a reduction per dispatch (the axon
block_until_ready trap — see scripts/pallas_gather_bench.py), control
row subtracted.
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

T = 1 << 19
M = int(os.environ.get("ROWS", 1 << 22))  # 4.2M rows/dispatch


def timeit(fn, *args, iters=5):
    red = jax.jit(lambda *a: fn(*a).sum())
    float(red(*args))  # compile + warm
    t0 = time.time()
    for _ in range(iters):
        float(red(*args))
    return (time.time() - t0) / iters


@partial(jax.jit, static_argnums=(2, 3))
def pallas_dma_gather(table, idx, n_buf=8, chunk=512):
    """Per-row HBM->VMEM DMA gather, n_buf copies in flight."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = idx.shape[0]
    assert m % chunk == 0
    w = table.shape[1]

    def kernel(idx_ref, tab_ref, out_ref, scratch, sems):
        base = pl.program_id(0) * chunk

        def get_dma(slot, j):
            return pltpu.make_async_copy(
                tab_ref.at[pl.ds(idx_ref[base + j], 1), :],
                scratch.at[pl.ds(slot, 1), :],
                sems.at[slot])

        for j in range(min(n_buf, chunk)):
            get_dma(j % n_buf, j).start()

        def body(j, _):
            slot = j % n_buf

            get_dma(slot, j).wait()
            out_ref[pl.ds(j, 1), :] = scratch[pl.ds(slot, 1), :]

            @pl.when(j + n_buf < chunk)
            def _():
                get_dma(slot, j + n_buf).start()

            return 0

        jax.lax.fori_loop(0, chunk, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m // chunk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],  # table in HBM
        out_specs=pl.BlockSpec((chunk, w), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_buf, w), jnp.float32),
            pltpu.SemaphoreType.DMA((n_buf,)),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, w), jnp.float32),
    )(idx, table)


def main():
    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    rng = np.random.RandomState(0)
    idx = jnp.asarray(rng.randint(0, T, size=(M,)).astype(np.int32))

    # control: idx math + reduce, no gather (tunnel RTT floor)
    ctrl = timeit(jax.jit(lambda i: (i * 2).astype(jnp.float32)), idx)
    print(f"control (no gather):        {ctrl * 1e9 / M:6.2f} ns/row "
          f"({ctrl * 1e3:.1f} ms)")

    for w in (2, 8, 32):
        table = jnp.asarray(rng.randn(T, w).astype(np.float32))
        dt = timeit(jax.jit(lambda i, t=table: t[i]), idx)
        print(f"xla gather [T,{w:2d}] f32:     {dt * 1e9 / M:6.2f} ns/row "
              f"(net {max(dt - ctrl, 0) * 1e9 / M:5.2f}; {dt * 1e3:.1f} ms; "
              f"{M * w * 4 / max(dt - ctrl, 1e-9) / 1e9:.1f} GB/s)")

    # DMA kernel: smaller M (it will be slow); chunk*grid must cover it
    m_small = 1 << 16
    idx_s = idx[:m_small]
    table8 = jnp.asarray(rng.randn(T, 8).astype(np.float32))
    try:
        dt = timeit(lambda i: pallas_dma_gather(table8, i), idx_s, iters=3)
        print(f"pallas per-row DMA [T,8]:   {dt * 1e9 / m_small:6.2f} ns/row "
              f"({dt * 1e3:.1f} ms for {m_small} rows)")
    except Exception as e:  # noqa: BLE001 — record the lowering failure
        print(f"pallas per-row DMA: FAILED to lower/run: {type(e).__name__}: "
              f"{str(e)[:300]}")


if __name__ == "__main__":
    main()
