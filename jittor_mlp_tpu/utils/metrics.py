"""Structured training/serving metrics (SURVEY §5 'Metrics/logging').

The reference's observability is bare prints (gfnet.py:188-191); production
training needs machine-readable series. MetricsLogger appends one JSON object
per step to a .jsonl file (atomic line writes, safe across restarts) and
keeps lightweight running aggregates; read_metrics loads a file back into
column arrays for plotting/regression checks.

Designed for jitted loops: log() takes scalars (Python numbers or 0-d
arrays); device values are fetched once, at log time — call it outside the
jitted step so it never adds a device sync inside the hot path beyond the
loss fetch the loop already does.
"""

from __future__ import annotations

import json
import os
import time


class MetricsLogger:
    def __init__(self, path, flush_every=1, extra=None):
        self.path = path
        self.flush_every = flush_every
        self._buf = []
        self._t0 = time.time()
        self._count = 0
        if extra:
            self._write_line({"event": "meta", **extra})

    def _write_line(self, obj):
        d = os.path.dirname(self.path)
        if d:
            os.makedirs(d, exist_ok=True)
        with open(self.path, "a") as f:
            f.write(json.dumps(obj) + "\n")

    def log(self, step, **scalars):
        rec = {"step": int(step), "time": round(time.time() - self._t0, 3)}
        for k, v in scalars.items():
            rec[k] = float(v)
        self._buf.append(rec)
        self._count += 1
        if len(self._buf) >= self.flush_every:
            self.flush()
        return rec

    def flush(self):
        if not self._buf:
            return
        d = os.path.dirname(self.path)
        if d:
            os.makedirs(d, exist_ok=True)
        with open(self.path, "a") as f:
            for rec in self._buf:
                f.write(json.dumps(rec) + "\n")
        self._buf.clear()


def read_metrics(path):
    """Load a metrics .jsonl into {key: list} columns (meta events skipped)."""
    cols = {}
    for line in open(path):
        rec = json.loads(line)
        if rec.get("event") == "meta":
            continue
        for k, v in rec.items():
            cols.setdefault(k, []).append(v)
    return cols
