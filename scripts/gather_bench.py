"""Experiments: which gather formulation is fastest on this TPU."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("OMP_NUM_THREADS", "1")

import time

import jax
import jax.numpy as jnp
import numpy as np


from _timing import timeit_op


def timeit(name, f, *args, iters=10):
    return timeit_op(name, f, *args, iters=iters) * 1e3


def main():
    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    key = jax.random.PRNGKey(0)
    # optional argv[1]: row count (CPU smoke runs use a small one)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 524288
    t_size = 2 ** 19
    table = jax.random.normal(key, (t_size, 2))
    # 8 corner indices per sample like one hash level
    idx = jax.random.randint(key, (n, 8), 0, t_size)

    timeit("E1 gather [N,8] rows from [T,2]",
           jax.jit(lambda i: table[i]), idx)

    idx_flat = idx.reshape(-1)
    timeit("E1b gather [8N] rows flat",
           jax.jit(lambda i: table[i]), idx_flat)

    idx_sorted = jnp.sort(idx_flat)
    timeit("E2 gather sorted indices",
           jax.jit(lambda i: table[i]), idx_sorted)

    small = jax.random.normal(key, (4096, 2))
    idx_small = jax.random.randint(key, (n, 8), 0, 4096)
    timeit("E4 gather from small table [4096,2]",
           jax.jit(lambda i: small[i]), idx_small)

    table_bf16 = table.astype(jnp.bfloat16)
    timeit("E6 gather bf16 table",
           jax.jit(lambda i: table_bf16[i]), idx)

    table_wide = jax.random.normal(key, (t_size // 64, 128))
    idx_wide = idx // 64
    timeit("E7 gather 128-wide rows [T/64,128]",
           jax.jit(lambda i: table_wide[i]), idx_wide)

    # E9: one big gather over concatenated levels (16 levels x 8 corners)
    big_table = jax.random.normal(key, (16 * t_size, 2))
    big_idx = jax.random.randint(key, (n, 128), 0, 16 * t_size)
    timeit("E9 one gather [N,128] rows (full encode equiv)",
           jax.jit(lambda i: big_table[i]), big_idx)

    # E10: take_along_axis formulation
    timeit("E10 jnp.take fill",
           jax.jit(lambda i: jnp.take(table, i, axis=0,
                                      unique_indices=False,
                                      indices_are_sorted=False)), idx)

    # E11: scatter-add (gradient direction)
    updates = jax.random.normal(key, (n, 8, 2))

    def scat(i, u):
        return jnp.zeros((t_size, 2)).at[i].add(u)

    timeit("E11 scatter-add [N,8]->[T,2]", jax.jit(scat), idx, updates)

    # E12: gather via one dynamic_slice per 8-corner base (dense-style
    # packed corners): [T, 16] rows, one row per sample per level
    packed = jax.random.normal(key, (t_size, 16))
    idx1 = jax.random.randint(key, (n,), 0, t_size)
    timeit("E12 gather [N] rows of 16 floats",
           jax.jit(lambda i: packed[i]), idx1)

    # E13: int32 element gather (same row count, narrower elements)
    table_i8 = jax.random.randint(key, (t_size * 2,), -127, 127, jnp.int8)
    timeit("E13 gather int8 elements [8N]",
           jax.jit(lambda i: table_i8[i]), idx_flat)


if __name__ == "__main__":
    main()
