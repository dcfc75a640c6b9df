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
    """Achieved rates + roof fractions for `executions` runs in `dt`."""
    peaks = device_peaks(device)
    flops_s = costs["flops"] * executions / dt_seconds
    bytes_s = costs["bytes"] * executions / dt_seconds
    return {
        "achieved_tflops": flops_s / 1e12,
        "achieved_hbm_gbs": bytes_s / 1e9,
        "est_mfu": flops_s / peaks["flops_bf16"],
        "est_membw_frac": bytes_s / peaks["hbm_bytes"],
    }
