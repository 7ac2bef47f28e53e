"""Metrics logging: JSONL file writer + optional wandb, plus profiling hooks.

The reference logs through wandb unconditionally (training.py:32-38 etc.);
here logging is pluggable: a JSONL writer always works offline, wandb is used
when installed and enabled. Adds first-class step timing and jax.profiler
trace capture — absent from the reference (SURVEY.md 5.1).
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path
from typing import Optional


class MetricsWriter:
    """Append-only JSONL metrics + optional wandb mirror."""

    def __init__(self, log_dir: Optional[str] = None, use_wandb: bool = False,
                 wandb_kwargs: Optional[dict] = None):
        self._file = None
        if log_dir is not None:
            p = Path(log_dir)
            p.mkdir(parents=True, exist_ok=True)
            self._file = open(p / "metrics.jsonl", "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(**(wandb_kwargs or {}))
            except ImportError:
                pass

    def log(self, metrics: dict, step: Optional[int] = None):
        rec = {"_time": time.time(), **metrics}
        if step is not None:
            rec["_step"] = step
        if self._file is not None:
            self._file.write(json.dumps(rec) + "\n")
            self._file.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def finish(self):
        if self._file is not None:
            self._file.close()
        if self._wandb is not None:
            self._wandb.finish()


def make_metrics_writer(log_dir=None, use_wandb=False, **kw) -> MetricsWriter:
    return MetricsWriter(log_dir, use_wandb, kw or None)


@contextlib.contextmanager
def step_timer(writer: Optional[MetricsWriter], name: str, step=None):
    """Wall-clock phase timing (new capability; reference has none)."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if writer is not None:
        writer.log({f"time/{name}_s": dt}, step=step)


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
