"""Profiling/observability helpers.

The reference brackets ``generate`` with ``time.time()``
(run_eval.py:738-742) and has no tracing at all (SURVEY.md §5).  Here:
``jax.profiler`` traces for TPU timelines, a completion-safe timer (on the
tunneled axon platform ``block_until_ready`` does not wait for remote
execution — fetching forces it), and a tiny JSONL metrics logger usable where
W&B is unavailable.
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace (view with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def block(tree: Any) -> None:
    """Reliable completion barrier: fetch one scalar per leaf's first element.

    ``block_until_ready`` is a no-op over the remote-device tunnel used in
    this environment; a tiny device_get is the portable barrier.
    """
    leaf = jax.tree.leaves(tree)[0]
    np.asarray(jax.device_get(leaf)).ravel()[:1]


class StepTimer:
    """Wall-clock timer with a proper device barrier."""

    def __init__(self):
        self.t0: Optional[float] = None
        self.total = 0.0
        self.count = 0

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def stop(self, result_tree: Any) -> float:
        block(result_tree)
        dt = time.perf_counter() - self.t0
        self.total += dt
        self.count += 1
        return dt

    def __exit__(self, *exc):
        return False

    @property
    def mean(self) -> float:
        return self.total / max(self.count, 1)


class MetricsLogger:
    """Append-only JSONL metrics sink (the offline stand-in for W&B).

    Multi-process: only process 0 writes — every host logs identical
    aggregate values, and concurrent appends to one file on a shared
    filesystem would interleave corruptly."""

    def __init__(self, path: str):
        self.path = Path(path)
        self._f = None
        if jax.process_index() == 0:
            self.path.parent.mkdir(parents=True, exist_ok=True)
            self._f = open(self.path, "a")

    def log(self, step: int, metrics: Dict[str, Any]) -> None:
        if self._f is None:
            return
        row = {"step": step, "time": time.time()}
        for k, v in metrics.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                row[k] = v
        self._f.write(json.dumps(row) + "\n")
        self._f.flush()

    def close(self) -> None:
        if self._f is not None:
            self._f.close()
