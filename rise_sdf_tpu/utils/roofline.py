"""Roofline / MFU accounting from XLA cost analysis.

The reference ships no profiling beyond manual CUDA-event timing
(``lib/renderutils/tests/test_perf.py:35-56``).  Here, every benched
computation reports its position against the chip's compute and
memory roofs: achieved TFLOP/s and HBM GB/s are derived from XLA's own
``cost_analysis()`` (flops + bytes accessed of the compiled module) and
the measured wall time, so MFU claims are tied to what the compiler
actually emitted rather than hand-counted estimates.
"""

from __future__ import annotations

from typing import Dict, Optional

# Published peaks per chip generation.  MXU peak is the bf16 figure;
# pure-f32 pipelines reach at most ~1/2 of it on v4/v5 hardware, so MFU
# against the bf16 roof is the honest (lower) bound.
CHIP_PEAKS = {
    "tpu v5e": {"flops_bf16": 197e12, "hbm_bytes": 819e9},
    "tpu v5":  {"flops_bf16": 459e12, "hbm_bytes": 1228e9},
    "tpu v4":  {"flops_bf16": 275e12, "hbm_bytes": 1200e9},
    "tpu v6e": {"flops_bf16": 918e12, "hbm_bytes": 1640e9},
}
DEFAULT_PEAKS = CHIP_PEAKS["tpu v5e"]


def device_peaks(device=None) -> Dict[str, float]:
    kind = ""
    if device is not None:
        kind = (getattr(device, "device_kind", "") or "").lower()
    for name, peaks in CHIP_PEAKS.items():
        if name.replace("tpu ", "") in kind:
            return peaks
    return DEFAULT_PEAKS


def module_costs(compiled) -> Optional[Dict[str, float]]:
    """flops / bytes-accessed of a compiled XLA module (one execution).

    ``compiled`` is the result of ``jax.jit(f).lower(*args).compile()``.
    Returns None when the backend exposes no cost model (e.g. some
    plugin backends).
    """
    try:
        ca = compiled.cost_analysis()
    except Exception:
        return None
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else None
    if not isinstance(ca, dict) or "flops" not in ca:
        return None
    return {"flops": float(ca.get("flops", 0.0)),
            "bytes": float(ca.get("bytes accessed", 0.0))}


def summarize(costs: Dict[str, float], executions: float, dt_seconds: float,
              device=None) -> Dict[str, float]:
    """XLA-cost-model rates for `executions` runs in `dt`.

    The cost model counts every op's operands/outputs BEFORE fusion, so
    its byte figure overcounts real HBM traffic severely (measured >6x
    on this pipeline) — these are labeled upper bounds and must not be
    read as achieved bandwidth.  ``analytic_summarize`` below holds the
    honest (<=1.0) roofline."""
    peaks = device_peaks(device)
    flops_s = costs["flops"] * executions / dt_seconds
    bytes_s = costs["bytes"] * executions / dt_seconds
    return {
        "achieved_tflops": flops_s / 1e12,
        "est_mfu": flops_s / peaks["flops_bf16"],
        "xla_costmodel_gbs_ub": bytes_s / 1e9,
        "xla_costmodel_membw_frac_ub": bytes_s / peaks["hbm_bytes"],
    }


def analytic_summarize(gather_rows: int, gather_bytes: int,
                       io_bytes: int, executions: float,
                       dt_seconds: float, gather_ns_per_row: float,
                       device=None) -> Dict[str, float]:
    """Roofline position from first-principles traffic counts.

    * ``gather_rows``/``gather_bytes``: exact per-execution hash-table
      gather volume from trace-time accounting
      (``ops.hashgrid.count_gather_rows``) — the pipeline's dominant
      HBM-touching op.
    * ``io_bytes``: other per-execution HBM traffic the caller can
      bound (ray/image IO etc.).
    * ``gather_ns_per_row``: the *measured* net issue rate of an XLA
      row gather on this device (micro-benched in-process with forced
      host reads) — the roof that actually binds a gather-dominated
      pipeline on TPU, since random row access is issue-rate-limited
      long before it saturates sequential HBM bandwidth.

    Returns fractions <= ~1.0 by construction: ``gather_roof_frac`` is
    time-at-the-gather-roof / wall time (how close the pipeline is to
    the speed-of-light of its dominant op); ``analytic_membw_frac`` is
    payload traffic vs sequential HBM peak (a lower bound on achieved
    bandwidth — real DRAM transactions are >= payload)."""
    peaks = device_peaks(device)
    rows_s = gather_rows * executions / dt_seconds
    bytes_s = (gather_bytes + io_bytes) * executions / dt_seconds
    return {
        "gather_rows_per_sec": rows_s,
        "gather_roof_frac": rows_s * gather_ns_per_row * 1e-9,
        "analytic_hbm_gbs_lb": bytes_s / 1e9,
        "analytic_membw_frac": bytes_s / peaks["hbm_bytes"],
        "gather_ns_per_row_roof": gather_ns_per_row,
    }


def measure_gather_issue_rate(table_rows: int = 2 ** 19, features: int = 2,
                              n_idx: int = 2 ** 21, iters: int = 4,
                              chain: int = 24,
                              dispatch_s: float = 0.0) -> float:
    """Micro-measure the net ns/row of a plain XLA row gather on the
    current default device.

    ``chain`` serially-dependent gathers run inside ONE jitted call
    (each iteration's indices are derived from the previous gather's
    values, so XLA can neither elide nor batch them), and one forced
    host read per call closes the timing (on the axon runtime
    ``block_until_ready`` can return without executing — TODO.md 4b).
    Chaining matters: a single 2^21-row gather per dispatch costs less
    device time than the host<->device round-trip on a tunneled
    runtime (~29 ms ≈ 14 ns/row of pure dispatch), which r3's
    one-gather-per-call version mis-attributed to the gather itself —
    inflating the "roof" to 19 ns/row and making the in-pipeline
    gathers (inside large fused chunk programs) appear to beat it at
    226%.  ``dispatch_s`` (the separately measured per-call round-trip)
    is subtracted from each call's wall time before dividing.

    This is the empirical speed-of-light for hash-table lookups that
    the analytic roofline compares against; min over ``iters`` calls."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    table = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (table_rows, features), dtype=np.float32))
    idx = jnp.asarray(
        np.random.default_rng(1).integers(0, table_rows, size=(n_idx,),
                                          dtype=np.int32))

    @jax.jit
    def f(t, i0):
        def body(_, carry):
            s, i = carry
            g = t[i]
            s = s + g.sum()
            # next indices depend on this gather's values -> serial chain
            i = (i + 1 + (g[:, 0] > 0.0).astype(jnp.int32)) % table_rows
            return s, i
        s, _ = jax.lax.fori_loop(
            0, chain, body, (jnp.zeros((), jnp.float32), i0))
        return s

    float(f(table, idx))  # compile + warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        float(f(table, idx))
        best = min(best, time.time() - t0)
    return max(best - dispatch_s, 1e-9) / (chain * n_idx) * 1e9
