"""Profiling & tracing subsystem.

The reference's only instrumentation is a wall-clock around the solve and a
console trace every 100 iterations (reference solver/msg_solver.cpp:16,
197-208, 172-183). This module is the TPU-native replacement promised in
SURVEY §5:

- :class:`Profiler` — per-phase wall timing + call counts + user counters,
  with ``jax.profiler.TraceAnnotation`` emitted per phase so phases show up
  on the TensorBoard/XPlane timeline when a device trace is being captured;
- :meth:`Profiler.device_trace` — wraps ``jax.profiler.trace`` to capture a
  full XLA device trace into a directory;
- throughput accounting: record iterations and operator nnz, report
  iterations/s and effective stencil-SpMV nnz/s (the BASELINE.md headline
  metric) alongside the phase table.

Used by ``cg_solve``/``refined_solve`` via ``CGOptions.profiler`` /
``refined_solve(profiler=...)``, and by the CLI's ``--profile`` /
``--trace-dir`` flags. All timing is host wall-clock around *synced* chunk
boundaries, so numbers are meaningful over an async dispatch tunnel.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, Iterator, Optional


@dataclass
class PhaseStat:
    calls: int = 0
    total_s: float = 0.0
    min_s: float = float("inf")
    max_s: float = 0.0

    def add(self, dt: float) -> None:
        self.calls += 1
        self.total_s += dt
        self.min_s = min(self.min_s, dt)
        self.max_s = max(self.max_s, dt)


@dataclass
class Profiler:
    """Collects per-phase timings and throughput counters for one solve."""

    phases: Dict[str, PhaseStat] = field(default_factory=dict)
    counters: Dict[str, float] = field(default_factory=dict)
    _t0: float = field(default_factory=time.perf_counter)
    # Only top-level phases count toward the throughput denominator: nested
    # phases (refined_solve's 'inner_solve' wraps the inner cg_solve's
    # 'setup'/'cg_chunk' on the same Profiler) would double-count wall time.
    _depth: int = 0
    _top_total_s: float = 0.0

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        """Time a phase; also emits a TraceAnnotation so the phase appears on
        the device-trace timeline if one is being captured."""
        import jax.profiler

        stat = self.phases.setdefault(name, PhaseStat())
        t0 = time.perf_counter()
        self._depth += 1
        try:
            with jax.profiler.TraceAnnotation(name):
                yield
        finally:
            self._depth -= 1
            dt = time.perf_counter() - t0
            stat.add(dt)
            if self._depth == 0:
                self._top_total_s += dt

    def count(self, name: str, value: float = 1.0) -> None:
        self.counters[name] = self.counters.get(name, 0.0) + value

    @contextlib.contextmanager
    def device_trace(self, log_dir: str) -> Iterator[None]:
        """Capture a full XLA/TPU device trace (TensorBoard XPlane format)."""
        import jax.profiler

        with jax.profiler.trace(log_dir):
            yield

    # --- reporting ---------------------------------------------------------

    @property
    def elapsed_s(self) -> float:
        return time.perf_counter() - self._t0

    def throughput(self) -> Dict[str, float]:
        """Derived rates from the standard counters (when present)."""
        out: Dict[str, float] = {}
        total = self._top_total_s or self.elapsed_s
        iters = self.counters.get("iterations")
        if iters:
            out["iterations_per_s"] = iters / total
        nnz = self.counters.get("nnz_per_apply")
        applies = self.counters.get("operator_applies")
        if nnz and applies:
            out["effective_nnz_per_s"] = nnz * applies / total
        return out

    def report(self) -> str:
        lines = ["=== Profile ===", f"{'phase':<24}{'calls':>7}{'total':>12}{'mean':>12}{'max':>12}"]
        for name, p in sorted(self.phases.items(), key=lambda kv: -kv[1].total_s):
            mean = p.total_s / max(p.calls, 1)
            lines.append(
                f"{name:<24}{p.calls:>7}{p.total_s * 1e3:>10.2f}ms"
                f"{mean * 1e3:>10.2f}ms{p.max_s * 1e3:>10.2f}ms"
            )
        if self.counters:
            lines.append("counters:")
            for k, v in sorted(self.counters.items()):
                lines.append(f"  {k:<26}{v:,.0f}")
        tp = self.throughput()
        if tp:
            lines.append("throughput:")
            for k, v in sorted(tp.items()):
                lines.append(f"  {k:<26}{v:,.3e}")
        return "\n".join(lines)
