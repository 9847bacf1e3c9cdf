"""Tracing / profiling hooks (SURVEY.md §5: the reference has only tqdm
bars; this layer adds jax.profiler traces and per-step wall timing).

Usage in a train loop:
    prof = StepTimer(log_path="metrics.jsonl", sync=some_array_fn)
    with maybe_trace(opt.trace_dir, enabled=bool(opt.trace_dir)):
        for step, batch in ...:
            with prof.step(step):
                out = train_step(...)
                prof.sink(out)           # last device array of the step

Timing on the tunneled TPU backend requires a device-to-host fetch to
observe completion (block_until_ready returns early there — see
.claude/skills/verify/SKILL.md), so ``sink`` fetches one scalar.
"""
from __future__ import annotations

import contextlib
import json
import time
from typing import Any, Optional

import numpy as np


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str], enabled: bool = True):
    """jax.profiler trace (Perfetto/TensorBoard-readable) around a region."""
    if not (trace_dir and enabled):
        yield
        return
    import jax
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (shows up in the profiler timeline)."""
    import jax
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock per-step timing with jsonl output and an EMA rate."""

    def __init__(self, log_path: Optional[str] = None, ema: float = 0.9,
                 items_per_step: int = 0):
        self.log_path = log_path
        self.ema = ema
        self.items_per_step = items_per_step
        self._rate = None
        self._t0 = None
        self._sink_val: Any = None

    @contextlib.contextmanager
    def step(self, step_idx: int, items: Optional[int] = None):
        self._t0 = time.perf_counter()
        self._sink_val = None
        yield self
        if self._sink_val is not None:
            # force completion: fetch one element to host
            np.asarray(self._sink_val).reshape(-1)[:1]
        dt = time.perf_counter() - self._t0
        n = items if items is not None else self.items_per_step
        rate = n / dt if n and dt > 0 else None
        if rate is not None:
            self._rate = rate if self._rate is None else \
                self.ema * self._rate + (1 - self.ema) * rate
        if self.log_path:
            rec = {"step": step_idx, "step_time_s": round(dt, 6)}
            if rate is not None:
                rec["items_per_s"] = round(rate, 2)
                rec["items_per_s_ema"] = round(self._rate, 2)
            with open(self.log_path, "a") as f:
                f.write(json.dumps(rec) + "\n")

    def sink(self, val: Any) -> Any:
        """Mark a device value whose completion ends the step."""
        leaves = [x for x in _tree_leaves(val) if hasattr(x, "dtype")]
        self._sink_val = leaves[-1] if leaves else None
        return val

    @property
    def rate_ema(self) -> Optional[float]:
        return self._rate


def _tree_leaves(tree):
    import jax
    return jax.tree_util.tree_leaves(tree)
