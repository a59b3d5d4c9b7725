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


class JsonlSink:
    """Append-only JSONL scalar sink — the zero-egress default."""

    def __init__(self, path: str):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._f = open(self.path, "a")

    def log(self, step: int, metrics: Dict[str, Any]) -> None:
        row = {"step": step, "time": time.time()}
        row.update(metrics)
        self._f.write(json.dumps(row) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()


class TensorBoardSink:
    """TensorBoard event files via torch.utils.tensorboard (the sink the
    reference uses as its W&B alternative, flax/run_distillation.py:764-777,
    :1030-1046).  Raises ImportError when tensorboard isn't installed."""

    def __init__(self, log_dir: str):
        from torch.utils.tensorboard import SummaryWriter
        self._w = SummaryWriter(log_dir=log_dir)

    def log(self, step: int, metrics: Dict[str, Any]) -> None:
        for k, v in metrics.items():
            if isinstance(v, (int, float)):
                self._w.add_scalar(k, v, step)

    def close(self) -> None:
        self._w.close()


class WandbSink:
    """W&B scalars (the reference's primary sink,
    run_distillation.py:481-498).  Env-gated: requires the wandb package and
    WANDB_PROJECT (or an explicit project) — absent in the zero-egress
    sandbox, active in W&B-capable deployments."""

    def __init__(self, project: Optional[str] = None,
                 run_name: Optional[str] = None):
        import os
        import wandb  # noqa: F401 — ImportError -> sink unavailable
        project = project or os.environ.get("WANDB_PROJECT")
        if not project:
            raise ImportError("WANDB_PROJECT not set")
        self._run = wandb.init(project=project, name=run_name,
                               reinit=True)

    def log(self, step: int, metrics: Dict[str, Any]) -> None:
        self._run.log(dict(metrics), step=step)

    def close(self) -> None:
        self._run.finish()


class MetricsLogger:
    """Multiplexing metrics writer: JSONL always, TensorBoard / W&B when
    requested AND available (``report_to`` mirrors the reference's
    ``--report_to`` semantics, run_distillation.py:501-537 + flax
    :764-816; unavailable sinks degrade with a warning, never an error).

    Multi-process: only process 0 writes — every host logs identical
    aggregate values, and concurrent appends to one file on a shared
    filesystem would interleave corruptly.  Custom sinks (any object with
    ``log(step, metrics)`` / ``close()``) can be passed via ``sinks``."""

    def __init__(self, path: str, report_to: tuple = ("jsonl",),
                 tensorboard_dir: Optional[str] = None,
                 wandb_project: Optional[str] = None,
                 run_name: Optional[str] = None,
                 sinks: Optional[list] = None):
        self.sinks = list(sinks or [])
        if jax.process_index() != 0:
            self.sinks = []
            return
        for kind in report_to:
            try:
                if kind == "jsonl":
                    self.sinks.append(JsonlSink(path))
                elif kind == "tensorboard":
                    self.sinks.append(TensorBoardSink(
                        tensorboard_dir or str(Path(path).parent / "tb")))
                elif kind == "wandb":
                    self.sinks.append(WandbSink(wandb_project, run_name))
                elif kind in ("none", ""):
                    pass
                else:
                    raise ValueError(f"unknown metrics sink '{kind}'")
            except ImportError as e:
                import logging
                logging.getLogger("distil_whisper_tpu").warning(
                    "metrics sink '%s' unavailable (%s) — skipping", kind, e)

    def log(self, step: int, metrics: Dict[str, Any]) -> None:
        if not self.sinks:
            return
        row: Dict[str, Any] = {}
        for k, v in metrics.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                row[k] = v
        for s in self.sinks:
            s.log(step, row)

    def close(self) -> None:
        for s in self.sinks:
            s.close()
