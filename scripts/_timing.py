"""Forced-read timing helpers for the axon TPU runtime.

On this runtime ``jax.block_until_ready()`` can return *before* the
computation executes, and dispatches whose outputs are never read by the
host may never execute at all (measured 2026-08-17: an 8.4M-row gather
"completed" in 0.1 ms under block-only timing; see
scripts/pallas_gather_bench.py and TODO.md item 4b).  A per-iteration
host read is honest but pays the ~25 ms tunnel round-trip each time.

The protocol here amortizes that: run ``iters`` iterations inside ONE
``lax.scan`` whose carry threads a value-zero-but-fold-proof data
dependency through every iteration, then force a single host read of the
final carry.  XLA cannot dead-code-eliminate any iteration (each feeds
the next through the carry) and the host read forces the whole chain, so
``(wall time of dispatch+read) / iters`` is an honest per-iteration
latency up to one round-trip and scan overhead, both amortized.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

# On this host the axon TPU plugin wins platform selection even when
# JAX_PLATFORMS=cpu is exported (observed 2026-08-17: gather_bench under
# JAX_PLATFORMS=cpu initialized "TPU v5 lite0" and contended with a live
# training run).  Mirror the env var into the live config before any
# backend initializes — harmless when the backend is already the same.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def _dep(carry, x):
    """Add a value-zero perturbation of ``x`` that XLA cannot fold away.

    ``carry - carry`` on floats is not simplified (NaN/Inf semantics), so
    the result is a genuine data dependency on ``carry`` with value 0.
    """
    z = carry - carry  # f32 zero, fold-proof
    if jnp.issubdtype(x.dtype, jnp.bool_):
        return jnp.logical_xor(x, z.astype(jnp.int32).astype(jnp.bool_))
    return x + z.astype(x.dtype)


def _carry_of(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return leaf.ravel()[0].astype(jnp.float32)


def timeit_op(name, f, *args, iters=10, chain=0, stream=None):
    """Time jitted ``f(*args)``; returns mean seconds per call.

    ``chain`` selects which positional arg carries the iteration-to-
    iteration dependency (default: the first).
    """
    stream = stream or sys.stderr
    args = tuple(jnp.asarray(a) for a in args)

    def body(carry, _):
        a = list(args)
        a[chain] = _dep(carry, a[chain])
        return _carry_of(f(*a)), None

    @jax.jit
    def run():
        c, _ = lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    float(run())  # compile + warm, forced read
    t0 = time.time()
    v = float(run())
    dt = (time.time() - t0) / iters
    assert v == v, f"{name}: non-finite carry"
    print(f"{name}: {dt * 1e3:.3f} ms", file=stream, flush=True)
    return dt


def timeit_chain(name, make_fn, x0, iters=10, stream=None):
    """Time ``f(x) -> (out, x_next)`` with a serial chain (micro_bench
    style); folds ``out`` into the carry so off-path outputs execute too.
    Returns mean seconds per call."""
    stream = stream or sys.stderr

    def body(state, _):
        carry, x = state
        x = jax.tree_util.tree_map(lambda t: _dep(carry, t), x)
        out, x_next = make_fn(x)
        return (_carry_of(out), x_next), None

    @jax.jit
    def run(x):
        (c, x), _ = lax.scan(body, (jnp.float32(0), x), None, length=iters)
        return c, x

    c, x = run(x0)
    float(c)  # compile + warm, forced read
    t0 = time.time()
    c, x = run(x0)
    float(c)
    dt = (time.time() - t0) / iters
    print(f"{name}: {dt * 1e3:.3f} ms", file=stream, flush=True)
    return dt
