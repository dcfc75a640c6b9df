"""Metric logging: console + CSV (replaces Lightning loggers + the
reference's unused ConsoleLogger, utils/loggers.py)."""

from __future__ import annotations

import csv
import os
import re
import sys
import time
from typing import Dict, Optional


class CSVLogger:
    """Append metric rows to ``<dir>/metrics.csv`` (union-of-keys header)."""

    def __init__(self, log_dir: str, filename: str = "metrics.csv"):
        self.path = os.path.join(log_dir, filename)
        os.makedirs(log_dir, exist_ok=True)
        self._keys = ["step"]
        self._rows = []

    def log(self, step: int, metrics: Dict[str, float]):
        row = {"step": step, **metrics}
        for k in row:
            if k not in self._keys:
                self._keys.append(k)
        self._rows.append(row)
        with open(self.path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._keys)
            w.writeheader()
            for r in self._rows:
                w.writerow(r)


class ConsoleLogger:
    """Regex-filtered metric printing (reference utils/loggers.py:9-40)."""

    def __init__(self, pattern: str = r".*", interval: float = 0.0):
        self.matcher = re.compile(pattern)
        self.interval = interval
        self._last = 0.0

    def log(self, step: int, metrics: Dict[str, float]):
        now = time.time()
        if now - self._last < self.interval:
            return
        self._last = now
        shown = {k: v for k, v in metrics.items() if self.matcher.search(k)}
        parts = " ".join(f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                         for k, v in shown.items())
        print(f"[step {step}] {parts}", file=sys.stderr, flush=True)


class MultiLogger:
    def __init__(self, *loggers):
        self.loggers = loggers

    def log(self, step: int, metrics: Dict[str, float]):
        for l in self.loggers:
            l.log(step, metrics)
