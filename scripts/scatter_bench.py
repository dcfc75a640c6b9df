"""Scatter-add alternatives for hash-table gradients."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("OMP_NUM_THREADS", "1")

import time

import jax
import jax.numpy as jnp


from _timing import timeit_op


def timeit(name, f, *args, iters=10):
    # chain through the float updates (arg 1) when present, else arg 0
    return timeit_op(name, f, *args, iters=iters,
                     chain=1 if len(args) > 1 else 0)


def main():
    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    key = jax.random.PRNGKey(0)
    n = 524288 * 8  # one level's corner count
    t_size = 2 ** 19
    idx = jax.random.randint(key, (n,), 0, t_size)
    upd = jax.random.normal(key, (n, 2))

    timeit("S1 scatter-add raw",
           jax.jit(lambda i, u: jnp.zeros((t_size, 2)).at[i].add(u)),
           idx, upd)

    def sorted_scatter(i, u):
        order = jnp.argsort(i)
        return jnp.zeros((t_size, 2)).at[i[order]].add(
            u[order], indices_are_sorted=True)

    timeit("S2 argsort + scatter(sorted)", jax.jit(sorted_scatter), idx, upd)

    def seg_sum(i, u):
        order = jnp.argsort(i)
        return jax.ops.segment_sum(u[order], i[order],
                                   num_segments=t_size,
                                   indices_are_sorted=True)

    timeit("S3 argsort + segment_sum", jax.jit(seg_sum), idx, upd)

    timeit("S4 segment_sum unsorted",
           jax.jit(lambda i, u: jax.ops.segment_sum(u, i,
                                                    num_segments=t_size)),
           idx, upd)

    # S5: scatter into fewer, wider rows (simulate [T/64, 128] layout)
    idx_w = idx // 64
    lane = (idx % 64) * 2
    upd_w = jnp.zeros((n, 128))  # placeholder cost: scatter of 128-wide rows
    timeit("S5 scatter-add 128-wide rows",
           jax.jit(lambda i, u: jnp.zeros((t_size // 64, 128)).at[i].add(u)),
           idx_w, upd_w)

    # S6: per-feature flat scatter
    flat_idx = jnp.concatenate([idx * 2, idx * 2 + 1])
    flat_upd = jnp.concatenate([upd[:, 0], upd[:, 1]])
    timeit("S6 flat scalar scatter",
           jax.jit(lambda i, u: jnp.zeros((t_size * 2,)).at[i].add(u)),
           flat_idx, flat_upd)

    # S7: sort cost alone
    timeit("S7 argsort 4.2M", jax.jit(jnp.argsort), idx)

    # S8: bincount-style via one_hot matmul on 4096-bucketed two-level
    # decomposition: scatter to [4096] coarse buckets via segment-sum of
    # presorted-by-bucket... measure two-level: sort by high bits then
    # segment_sum over full ids (already covered by S3)


if __name__ == "__main__":
    main()
