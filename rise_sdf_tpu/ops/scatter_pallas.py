"""Pallas TPU scatter-add for hash-table gradients.

XLA's scatter-add on TPU runs at ~46-80 ns/row (per-row HBM
round-trips); this kernel keeps the whole accumulator resident in VMEM
— laid out ``[T/EPR, 128]`` so an F-wide row doesn't tile-pad — streams
index/value chunks through SMEM, and performs one whole-row
read-modify-write per contribution with a built one-hot lane vector
(dynamic lane offsets are not vector-alignable on TPU).  Measured 17.2
ns/row vs 78.7 for XLA at the hash-grid shapes (12.6M rows into a
2^19 x 2 table, ~24 collisions/entry; ``scripts/scatter_kernel_bench.py``),
bit-exact against ``.at[idx].add``.

``table_grad_lookup`` wraps the forward gather ``table[flat]`` in a
``custom_vjp`` whose backward uses this kernel.  First-order only in the
table argument — fine everywhere in this framework: position-gradients
flow through the interpolation weights (integer corner indices cut the
x-path), so the table side of the gather is differentiated exactly once
even under the eikonal/curvature second-order losses.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128
# env-overridable for the NaN-fault minimizer (scripts/nan_repro.py):
# perturbing the stream chunk / manual unroll isolates whether the
# graph-context-dependent miscompile tracks the kernel's loop structure
CHUNK = int(os.environ.get("RISE_SCATTER_CHUNK", 8192))
UNROLL = int(os.environ.get("RISE_SCATTER_UNROLL", 8))
assert CHUNK % UNROLL == 0, (CHUNK, UNROLL)


def _use_tpu() -> bool:
    try:
        return any("TPU" in (d.device_kind or "").upper()
                   or d.platform in ("tpu", "axon")
                   for d in jax.devices())
    except Exception:  # backend not initialized / no devices
        return False


@partial(jax.jit, static_argnums=(2, 3))
def pallas_scatter_add(idx, vals, table_size: int, interpret: bool = False):
    """idx [M] int32 in [0, table_size); vals [M, F] f32 -> [table_size, F].

    F must divide 128.  M is padded internally to a CHUNK multiple
    (pad rows add 0.0 to entry 0 — a no-op).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, f = vals.shape
    assert LANES % f == 0, f
    epr = LANES // f
    padded_size = ((table_size + epr - 1) // epr) * epr
    rows = padded_size // epr
    pad = (-m) % CHUNK
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
        vals = jnp.concatenate([vals, jnp.zeros((pad, f), vals.dtype)])
        m += pad

    def kernel(idx_ref, vals_ref, out_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

        def one(i):
            t = idx_ref[0, i]
            row = t // epr
            lane = (t % epr) * f
            contrib = jnp.zeros((1, LANES), jnp.float32)
            for c in range(f):
                contrib = jnp.where(iota == lane + c, vals_ref[c, i],
                                    contrib)
            out_ref[pl.ds(row, 1), :] = out_ref[pl.ds(row, 1), :] + contrib

        unroll = UNROLL  # manual: Mosaic's fori_loop unroll allows 1/full

        def body(j, _):
            base = j * unroll
            for k in range(unroll):
                one(base + k)
            return 0

        jax.lax.fori_loop(0, CHUNK // unroll, body, 0)

    out = pl.pallas_call(
        kernel,
        grid=(m // CHUNK,),
        in_specs=[
            pl.BlockSpec((1, CHUNK), lambda i: (0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((f, CHUNK), lambda i: (0, i),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((rows, LANES), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        interpret=interpret,
    )(idx.reshape(1, -1), vals.T)
    return out.reshape(padded_size, f)[:table_size]


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def table_grad_lookup(table, flat, interpret=False):
    """``table[flat]`` with a Pallas scatter-add backward.

    table [T, F] f32, flat [..., ] int32 -> [..., F].  First-order in
    ``table`` (see module docstring); ``flat`` is non-differentiable.
    """
    return table[flat]


def _lookup_fwd(table, flat, interpret):
    return table[flat], (flat, table.shape)


def _lookup_bwd(interpret, resid, g):
    flat, shape = resid
    t, f = shape
    d = pallas_scatter_add(flat.reshape(-1).astype(jnp.int32),
                           g.reshape(-1, f).astype(jnp.float32),
                           t, interpret)
    return d.astype(g.dtype), None


table_grad_lookup.defvjp(_lookup_fwd, _lookup_bwd)


def scatter_add_reference(idx, vals, table_size):
    """XLA reference implementation (for tests/benchmarks)."""
    return jnp.zeros((table_size, vals.shape[-1]),
                     vals.dtype).at[idx].add(vals)
