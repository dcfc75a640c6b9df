"""Windowed train-step rate from a longrun log (VERDICT r4 #8).

Extracts the honest marginal s/step between two steps of a launch.py
log by differencing log-line arrival (mtime-free: uses the cumulative
``sps`` column inversion) — the ``w=`` column is already windowed, so
this simply reports its distribution over a step range, excluding
val/checkpoint/recompile stalls (w == 0 or missing).

Usage: python scripts/windowed_rate.py <log> <lo_step> <hi_step>
"""

import re
import sys


def main():
    path, lo, hi = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    pat = re.compile(r"^step (\d+)\[s(\d)\].*\bw=([0-9.]+)")
    ws = []
    for line in open(path):
        m = pat.match(line)
        if not m:
            continue
        step, _stage, w = int(m.group(1)), m.group(2), float(m.group(3))
        if lo <= step <= hi and w > 0.05:
            ws.append((step, w))
    if not ws:
        print("no samples in range")
        return
    vals = sorted(w for _, w in ws)
    n = len(vals)
    med = vals[n // 2]
    p90 = vals[min(int(n * 0.9), n - 1)]
    print(f"steps {lo}..{hi}: {n} windows; "
          f"w median={med:.3f} steps/s ({1 / med:.2f} s/step), "
          f"p10..p90 = {vals[max(int(n * 0.1) - 1, 0)]:.3f}..{p90:.3f}")


if __name__ == "__main__":
    main()
