"""Structured metrics logging (SURVEY.md §5 "Metrics / logging").

The reference printed loss/AP to stdout. Here: JSONL rows (one per log step)
with step, walltime, lr, per-head losses, imgs/sec — machine-readable for the
bench harness and greppable by humans — plus optional TensorBoard scalar
export (tensorboard_dir=...; self-contained event-file writer in
utils/tbevents.py — no TensorFlow dependency).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, echo: bool = True,
                 tensorboard_dir: Optional[str] = None):
        self.path = path
        self.echo = echo
        self._f = None
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._f = open(path, "a", buffering=1)
        self._tb = None
        if tensorboard_dir:
            # Self-contained event-file writer (utils/tbevents.py): the
            # format is ~60 bytes/record of hand-encoded proto, so export
            # no longer depends on (or pays the ~35 s import of) TF.
            from multipathnet_tpu.utils.tbevents import EventFileWriter

            self._tb = EventFileWriter(tensorboard_dir)
        self._t0 = time.time()

    def log(self, step: int, **metrics) -> None:
        row = {"step": int(step), "time": round(time.time() - self._t0, 3)}
        scalars = {}
        for k, v in metrics.items():
            try:
                row[k] = round(float(v), 6)
                scalars[k] = float(v)
            except (TypeError, ValueError):
                row[k] = v
        if self._f:
            self._f.write(json.dumps(row) + "\n")
        if self._tb is not None and scalars:
            self._tb.add_scalars(int(step), scalars)
        if self.echo:
            parts = " ".join(
                f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
                for k, v in row.items() if k != "time"
            )
            print(f"[{row['time']:8.1f}s] {parts}", flush=True)

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        if self._f:
            self._f.close()
        self.flush()
        if self._tb is not None:
            self._tb.close()
