"""Run metrics, timing, and observability.

Replaces the reference's scattered instrumentation (SURVEY.md §5): MATLAB
``tic/toc`` per MPC step with avg/max aggregate
(``ADMM_CVX_..._PI_antiwindup.m:53,211,241``), Python whole-run
``time.time()`` deltas (``casadi/main.py:41,203``), ``iter_his`` /
``sum_iter_num`` iteration histories, and per-step ``print`` lines of
step / iteration count / dual extremes / rho (``casadi/main.py:193-196``).
"""
from __future__ import annotations

import contextlib
import json
import logging
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

logger = logging.getLogger("dlp_admm_tpu")


@dataclass
class RunMetrics:
    """Per-step history + aggregate report of one MPC run.

    ``trace_path`` streams every logged step through the native buffered
    trace logger (``native/tracelog.cpp`` via ``utils.tracelog``) as
    fixed-width float32 records ``[step, iterations, extras... (sorted by
    key), zero-padded]`` — kHz-rate telemetry without stalling the dispatch
    thread; read back with :func:`~dlp_admm_tpu.utils.tracelog.read_tracelog`.
    """

    step_times: List[float] = field(default_factory=list)
    iter_history: List[int] = field(default_factory=list)     # `iter_his`
    extras: Dict[str, list] = field(default_factory=dict)
    trace_path: Optional[str] = None
    trace_record_floats: int = 8
    _t0: Optional[float] = None
    _trace: Optional[object] = field(default=None, repr=False)

    @contextlib.contextmanager
    def step_timer(self):
        t = time.perf_counter()
        yield
        self.step_times.append(time.perf_counter() - t)

    def log_step(self, step: int, iterations: int, **kv):
        """Record + log one MPC step (the reference's per-step print,
        ``casadi/main.py:193-196``)."""
        self.iter_history.append(int(iterations))
        for k, v in kv.items():
            self.extras.setdefault(k, []).append(v)
        logger.info("t_step: %d, iter: %d, %s", step, iterations,
                    ", ".join(f"{k}: {v}" for k, v in kv.items()))
        if self.trace_path is not None:
            self._trace_step(step, iterations, kv)

    def _trace_step(self, step, iterations, kv):
        import numpy as np
        if self._trace is None:
            from .tracelog import TraceLog
            self._trace = TraceLog(self.trace_path, self.trace_record_floats)
        vals = [float(step), float(iterations)]
        for k in sorted(kv):
            try:
                vals.append(float(kv[k]))
            except (TypeError, ValueError):
                pass
        vals = (vals + [0.0] * self.trace_record_floats)[
            :self.trace_record_floats]
        self._trace.append(np.asarray([vals], np.float32))

    def close(self) -> None:
        """Flush + close the native trace stream (no-op without one)."""
        if self._trace is not None:
            self._trace.close()
            self._trace = None

    @property
    def total_iterations(self) -> int:                        # `sum_iter_num`
        return sum(self.iter_history)

    def summary(self) -> dict:
        """Aggregate report (the MATLAB end-of-run print, ``:241``)."""
        n = max(len(self.step_times), 1)
        out = dict(
            steps=len(self.iter_history),
            total_iterations=self.total_iterations,
            mean_iterations=(self.total_iterations
                             / max(len(self.iter_history), 1)),
            total_time_s=sum(self.step_times),
            mean_step_time_s=sum(self.step_times) / n,
            max_step_time_s=max(self.step_times, default=0.0),
        )
        if self.step_times and self.total_iterations:
            out["iterations_per_s"] = (self.total_iterations
                                       / sum(self.step_times))
        return out

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump(dict(summary=self.summary(),
                           iter_history=self.iter_history,
                           step_times=self.step_times), f)


@contextlib.contextmanager
def trace(name: str, enabled: bool = False, trace_dir: str = "/tmp/jax_trace"):
    """jax.profiler trace wrapper (the TPU-native flamegraph the reference
    lacks — SURVEY.md §5 'tracing')."""
    if not enabled:
        yield
        return
    import jax
    with jax.profiler.trace(trace_dir):
        yield
    logger.info("profiler trace written to %s (%s)", trace_dir, name)
