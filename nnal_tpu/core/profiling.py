"""Tracing / profiling utilities.

The reference's only observability is wall-clock files per query round
(PW_AL.py:848-855) and console prints (SURVEY.md §5.1).  Here per-phase
timing is a first-class metrics channel — a ``PhaseTimer`` records
score/select/train/eval phases per AL round into a structured JSONL
stream — plus thin wrappers over ``jax.profiler`` for device traces.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional


# module-global sub-phase accumulator: deep library code (strategy
# internals, SDP, gathers) records named spans with ``subphase`` and the
# engine's PhaseTimer folds them into its per-round JSONL record — no
# timer object has to be threaded through the scoring call stack.  Times
# are host wall-clock, so an async device dispatch bills to whichever
# span materializes its result (the attribution we want for tunnel work).
_SUB: Dict[str, float] = {}


@contextlib.contextmanager
def subphase(name: str):
    """Accumulate a named sub-span into the next committed round record
    (``sub`` field).  Nesting records both levels independently."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _SUB[name] = _SUB.get(name, 0.0) + (time.perf_counter() - t0)


def drain_subphases() -> Dict[str, float]:
    """Return and clear the accumulated sub-phase spans."""
    global _SUB
    out, _SUB = _SUB, {}
    return {k: round(v, 6) for k, v in out.items()}


class PhaseTimer:
    """Per-round phase timing journal (JSONL, one record per round)."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self.current: Dict[str, float] = {}
        self.records = []

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.current[name] = self.current.get(name, 0.0) + (
                time.perf_counter() - t0)

    def commit_round(self, round_id: int, **extra) -> dict:
        rec = {"round": int(round_id), **{k: round(v, 6) for k, v
                                          in self.current.items()}, **extra}
        sub = drain_subphases()
        if sub:
            rec["sub"] = sub
        self.records.append(rec)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        self.current = {}
        return rec


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context (TensorBoard-compatible)."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace annotation for profiler timelines."""
    import jax

    return jax.profiler.TraceAnnotation(name)
