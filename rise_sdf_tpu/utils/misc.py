"""Misc utilities (reference utils/misc.py + models/utils.py helpers)."""

from __future__ import annotations

import gc
import os
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np


def get_rank() -> int:
    """Process rank from the usual launcher env vars (reference
    utils/misc.py:44-52); 0 in single-process runs."""
    for v in ("RANK", "LOCAL_RANK", "SLURM_PROCID", "JSM_NAMESPACE_RANK"):
        if v in os.environ:
            return int(os.environ[v])
    return 0


def scale_anything(x, in_range, out_range):
    """Linear range remap (reference models/utils.py scale_anything)."""
    lo, hi = in_range
    olo, ohi = out_range
    return (x - lo) / (hi - lo) * (ohi - olo) + olo


def chunk_batch(fn: Callable, chunk_size: int, *args, pad: bool = True):
    """Apply ``fn`` over the first axis of the array args in fixed chunks.

    TPU-friendly replacement for the reference's ``chunk_batch``
    (models/utils.py:14-51): the last chunk is padded to ``chunk_size``
    so one compiled shape serves every call; dict/tuple/array outputs are
    concatenated on host.
    """
    n = args[0].shape[0]
    outs = []
    for s in range(0, n, chunk_size):
        sl = [a[s:s + chunk_size] for a in args]
        cur = sl[0].shape[0]
        if pad and cur < chunk_size:
            sl = [jnp.pad(a, [(0, chunk_size - cur)] + [(0, 0)] * (a.ndim - 1))
                  for a in sl]
        out = fn(*sl)
        outs.append(jax.tree_util.tree_map(
            lambda v: np.asarray(v)[:cur], out))
    return jax.tree_util.tree_map(
        lambda *vs: np.concatenate(vs, axis=0), *outs)


def pipeline_chunks(items, dispatch, consume, depth: int = 1):
    """Drive a chunked device loop with ``depth`` dispatches in flight.

    ``dispatch(item)`` enqueues device work and returns its (async) result;
    ``consume(item, result)`` host-reads that result and returns the
    per-item output.  With ``depth`` > 1 the next chunk is already queued
    on the device while the host blocks reading the previous one, so the
    per-chunk host round-trip (~30 ms dispatch RTT on the tunneled axon
    runtime) overlaps device compute instead of serializing with it.

    Every result is still individually consumed (host-read) in order —
    required on the axon runtime, where merely ``block_until_ready`` on a
    later dispatch does NOT imply earlier queued dispatches executed.
    ``depth=1`` (the default) reproduces the classic dispatch-then-read
    loop exactly; pipelining is an explicit opt-in at the call site
    (systems pass their configured ``eval_pipeline_depth``).
    """
    from collections import deque

    depth = max(int(depth), 1)
    pending = deque()
    out = []
    for item in items:
        pending.append((item, dispatch(item)))
        if len(pending) >= depth:
            it, res = pending.popleft()
            out.append(consume(it, res))
    while pending:
        it, res = pending.popleft()
        out.append(consume(it, res))
    return out


def interleave_order(n: int, chunk: int, mode):
    """Deterministic eval-ray interleave permutation and its inverse.

    Silhouette rays are spatially clustered, so row-major chunking
    concentrates sample load into a few chunks (measured worst chunk:
    514x the mean; scripts/drop_probe.py).  Interleaving spreads every
    chunk's load toward the mean so smaller static sample buffers stay
    drop-free.  Per-ray results are order-independent, so rendering
    through ``order`` and gathering outputs back through ``inv`` leaves
    the image unchanged.

    ``mode``: falsy/"off" -> ``(None, None)``; ``"golden"`` (also
    ``True``) -> multiplicative low-discrepancy stride ``i*p % n`` with
    ``p ~ golden-ratio * n`` coprime to ``n`` — spreads every contiguous
    pixel run maximally evenly (zero drops at cap = chunk*11 on the
    frozen protocol for chunk 4096..16384, vs chunk*514 row-major);
    ``"strided"`` -> transpose of the (n_chunks, chunk) index grid
    (aliases with image width when chunk ~ multiple of it — kept for
    A/Bs).
    """
    if not mode or mode == "off":
        return None, None
    if n <= chunk:
        return None, None
    if mode == "strided":
        nc = -(-n // chunk)
        order = np.arange(nc * chunk).reshape(nc, chunk).T.reshape(-1)
        order = order[order < n]
    else:  # "golden" (default for mode=True)
        p = int(n * 0.6180339887498949) or 1
        while np.gcd(p, n) != 1:
            p += 1
        order = (np.arange(n, dtype=np.int64) * p) % n
    inv = np.empty(n, np.int64)
    inv[order] = np.arange(n)
    return order, inv


def cleanup():
    """gc sweep (reference models/utils.py:117-120; no CUDA caches here)."""
    gc.collect()


def gaussian_histogram(x, bins: int, vmin: float, vmax: float, sigma):
    """Differentiable soft histogram (reference models/utils.py:123-137
    ``GaussianHistogram``): each sample contributes a Gaussian kernel of
    width ``sigma`` to every bin center; returns [bins] masses."""
    delta = float(vmax - vmin) / float(bins)
    centers = vmin + delta * (jnp.arange(bins, dtype=jnp.float32) + 0.5)
    d = x[None, :] - centers[:, None]
    k = jnp.exp(-0.5 * (d / sigma) ** 2) / (sigma * jnp.sqrt(2.0 * jnp.pi)) \
        * delta
    return k.sum(axis=1)
