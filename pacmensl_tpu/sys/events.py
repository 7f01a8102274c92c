"""Event logging / tracing / profiling.

TPU-native equivalent of the reference's PETSc event-log system
(``src/StateSet/StateSetBase.cpp:661-678``, ``FspSolverMultiSinks.cpp:283-301``
and ``ReduceComponentTiming`` at ``:467-516``): named phase timers with
call counts, plus per-ODE-step traces (model time, #equations, wall time;
reference ``OdeSolverBase.cpp:105-132``).

On a single host there is nothing to MPI-reduce; ``reduce()`` returns
(min, max, sum) per event for report parity with ``ReduceComponentTiming``.
``jax.profiler`` trace capture can be toggled for deep kernel-level
profiling.
"""
from __future__ import annotations

import csv
import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax

# Canonical event names, mirroring the phases the reference registers.
EVT_SETUP = "Setup"
EVT_PARTITION = "StatePartitioning"
EVT_MATGEN = "MatrixGeneration"
EVT_ODESOLVE = "ODESolve"
EVT_RHS = "RHSEvaluation"
EVT_SCATTER = "SolutionScatter"
EVT_EXPLORE = "StateExploration"
EVT_TOTAL = "Solving"


@dataclass
class EventRecord:
    count: int = 0
    total_s: float = 0.0


@dataclass
class StepTrace:
    """Per-accepted-step trace (reference FiniteProblemSolverPerfInfo)."""
    model_time: List[float] = field(default_factory=list)
    n_eqs: List[int] = field(default_factory=list)
    wall_time: List[float] = field(default_factory=list)

    def record(self, t: float, n_eqs: int):
        self.model_time.append(float(t))
        self.n_eqs.append(int(n_eqs))
        self.wall_time.append(time.perf_counter())

    @property
    def n_steps(self) -> int:
        return len(self.model_time)


class EventLog:
    """Named wall-clock phase timers with nesting support."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.events: Dict[str, EventRecord] = {}

    @contextmanager
    def timed(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            rec = self.events.setdefault(name, EventRecord())
            rec.count += 1
            rec.total_s += dt

    def add(self, name: str, seconds: float):
        rec = self.events.setdefault(name, EventRecord())
        rec.count += 1
        rec.total_s += seconds

    def reduce(self):
        """(min, max, sum) per event; single-host => all equal.

        Kept for report parity with the reference's ReduceComponentTiming.
        """
        return {k: (v.total_s, v.total_s, v.total_s)
                for k, v in self.events.items()}

    def report(self) -> str:
        lines = [f"{'event':<24}{'count':>8}{'total_s':>14}"]
        for name, rec in sorted(self.events.items()):
            lines.append(f"{name:<24}{rec.count:>8}{rec.total_s:>14.6f}")
        return "\n".join(lines)

    def dump_csv(self, path: str):
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["event", "count", "total_s"])
            for name, rec in sorted(self.events.items()):
                w.writerow([name, rec.count, rec.total_s])


@contextmanager
def profiler_trace(logdir: Optional[str]):
    """Capture a jax profiler trace (TensorBoard format) around a block."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
