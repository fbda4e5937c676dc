"""Mixed-precision iterative refinement (f64 outer / f32 inner MG-PCG).

The TPU f64 strategy decided in SURVEY §7: the reference computes everything
in `double` on CPU (solver/solver.hpp:11-15), but TPU f64 is software-emulated
and an order of magnitude slower than f32, while plain f32 CG stagnates at a
*true* residual of about eps_f32 · ‖A‖ · ‖x‖ (≈ 6e-2 max-norm already at 64²)
— far short of the reference's default eps = 1e-6.

Iterative refinement splits the work by precision:

- **Outer loop (f64, cheap)**: one residual evaluation ``r = b − A x`` and one
  accumulation ``x += d`` per outer step — O(5) stencil applies total, so the
  emulated-f64 cost is negligible.
- **Inner solve (f32, hot)**: MG-PCG on the correction equation ``A d = r`` to
  a loose *relative* tolerance (1e-4 by default — well inside f32 range since
  the inner problem is solved from zero each time).

Each outer step multiplies the true residual by ~inner_rel_tol, so reaching
1e-6/1e-9 absolute takes 3-6 outer steps regardless of grid size, with >95%
of the wall-time spent in f32 Pallas/XLA kernels. This is the framework's
default path to reference-grade (f64) accuracy at f32 speed.

The loop also serves as the convergence-contract adapter: the reference's
max-norm stop criteria (precision / residual / exact-error / iterations,
solver/msg_solver.cpp:144-162) are evaluated here on *f64 true* quantities —
stronger guarantees than the reference itself, whose residual criterion tests
the recurrence residual, not ``b − A x``.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass
from functools import partial
from typing import Callable, List, Optional

import jax.numpy as jnp
import numpy as np

import jax

from iterative_solvers_tpu.solvers.cg import CGOptions, CGResult, cg_solve
from iterative_solvers_tpu.solvers.stopping import StopConfig, StopReason


@jax.jit
def _outer_stats(r, d, x, u_true):
    """(‖r‖∞, ‖d‖∞, ‖x−u‖∞, ‖r‖₂²) in one device array → one host transfer."""
    e = (
        jnp.max(jnp.abs(x - u_true))
        if u_true is not None
        else jnp.asarray(jnp.inf, r.dtype)
    )
    return jnp.stack([jnp.max(jnp.abs(r)), jnp.max(jnp.abs(d)), e, jnp.sum(r * r)])


@partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
def _outer_update(A_hi, x, d_lo, b, u_true):
    """One refinement step as ONE compiled program: promote the correction,
    accumulate, evaluate the true high-precision residual, pack the progress
    scalars. Eagerly this would be dozens of dispatches (the f64 stencil
    alone is ~10 ops) — each a tunnel round-trip on a remote TPU."""
    d = d_lo.astype(b.dtype)
    x = x + d
    r = b - A_hi(x)
    e = (
        jnp.max(jnp.abs(x - u_true))
        if u_true is not None
        else jnp.asarray(jnp.inf, r.dtype)
    )
    stats = jnp.stack([jnp.max(jnp.abs(r)), jnp.max(jnp.abs(d)), e, jnp.sum(r * r)])
    return x, r, stats


@dataclass
class RefinedResult(CGResult):
    """CGResult plus refinement structure: ``iterations`` counts total inner
    CG iterations (the cost metric); ``outer_iterations`` counts f64
    refinement steps."""

    outer_iterations: int = 0
    inner_iterations: Optional[List[int]] = None
    escalated: bool = False  # precision ladder stepped up to the f64 inner


def refined_solve(
    A_hi: Callable,
    A_lo: Callable,
    b: jnp.ndarray,
    *,
    u_true: Optional[jnp.ndarray] = None,
    stop: Optional[StopConfig] = None,
    preconditioner: Optional[Callable] = None,
    inner_rel_tol: float = 1e-4,
    inner_max_iter: int = 200,
    max_outer: int = 40,
    lo_dtype=jnp.float32,
    escalate: bool = True,
    escalate_ratio: float = 0.05,
    callback: Optional[Callable[[int, float, float, float], None]] = None,
    stop_requested: Optional[Callable[[], bool]] = None,
    profiler=None,
    inner_solve_fn: Optional[Callable] = None,
) -> RefinedResult:
    """Solve ``A x = b`` to high-precision stopping criteria via mixed-precision
    iterative refinement.

    ``A_hi`` acts on ``b.dtype`` (f64) fields, ``A_lo`` on ``lo_dtype`` (f32)
    fields of the same shape; ``preconditioner`` (e.g.
    :class:`~iterative_solvers_tpu.solvers.multigrid.MultigridPreconditioner`)
    runs inside the f32 inner solve. Stop criteria follow the reference
    semantics (eps <= 0 disables) but are evaluated on true f64 residuals.

    **Precision ladder** (``escalate=True``): classic f32-inner IR stalls once
    the per-outer contraction hits the f32 floor — at 8192² the condition
    number is ~1.4e7, so eps_f32·cond ≈ 0.8 and the true residual flatlines
    around 4e-5 max-norm, short of the 1e-6 target. When an outer step shrinks
    the residual by less than ``escalate_ratio``×, the inner solve is escalated
    to ``b.dtype`` (f64 — XLA-emulated on TPU at only ~3x the f32 stencil
    cost), whose floor eps_f64·‖A‖·‖x‖ ≈ 6e-7 sits below the target. Typical
    profile at 8192²: ~5 cheap f32 outers + 2 f64 polish outers.
    """
    stop = stop or StopConfig()
    if b.dtype == lo_dtype:
        raise ValueError(
            f"b has dtype {b.dtype} == lo_dtype; enable jax_enable_x64 and pass "
            "an f64 right-hand side for the high-precision outer loop"
        )
    t0 = time.perf_counter()

    import contextlib

    phase = (
        profiler.phase if profiler is not None else (lambda name: contextlib.nullcontext())
    )
    def inner_options(eps_rel: float) -> CGOptions:
        return CGOptions(
            stop=StopConfig(
                eps_precision=-1.0,
                eps_residual=-1.0,
                eps_exact_error=-1.0,
                eps_relative=eps_rel,
                max_iterations=inner_max_iter,
            ),
            preconditioner=preconditioner,
            profiler=profiler,
        )

    def adaptive_inner_tol(r_max_now: float, r_norm_now: float) -> float:
        """Loosest inner tolerance that still meets the outer target this
        step (overshooting wastes inner iterations: the last outer typically
        needs only 1-2 digits, not the full inner_rel_tol). Quantized to
        decades so the jitted inner chunk is compiled per decade, not per
        outer step."""
        need = math.inf
        if stop.eps_relative > 0 and r_norm_now > 0:
            need = min(need, stop.eps_relative * r0_norm / r_norm_now)
        if stop.eps_residual > 0 and r_max_now > 0:
            need = min(need, stop.eps_residual / r_max_now)
        if not math.isfinite(need):
            return inner_rel_tol
        tol = min(max(inner_rel_tol, 0.3 * need), 0.1)
        return 10.0 ** math.floor(math.log10(tol))

    x = jnp.zeros_like(b)
    r = b
    s0 = np.asarray(_outer_stats(r, r, x, u_true))
    r_max = float(s0[0])
    err_max = float(s0[2]) if u_true is not None else math.inf
    r0_norm = math.sqrt(max(float(s0[3]), 0.0))
    r_norm = r0_norm
    prec_max = math.inf
    reason = StopReason.ITERATIONS
    total_inner = 0
    inner_counts: List[int] = []
    interrupted = False
    cur_dtype = lo_dtype
    escalated = False
    stalls = 0  # consecutive outers with <2x residual reduction at top precision

    if callback is not None:
        callback(0, math.inf, r_max, err_max)

    for outer in range(max_outer):
        if r_max == 0.0:
            reason = StopReason.RESIDUAL
            break
        if stop.eps_residual > 0 and r_max < stop.eps_residual:
            reason = StopReason.RESIDUAL
            break
        if stop.eps_exact_error > 0 and err_max < stop.eps_exact_error:
            reason = StopReason.EXACT_ERROR
            break
        if (
            stop.eps_precision > 0
            and outer > 0
            and prec_max < stop.eps_precision
        ):
            reason = StopReason.PRECISION
            break
        if stop.eps_relative > 0 and r_norm < stop.eps_relative * r0_norm:
            # reference MatrixFreeSolver criterion (matrix_free_system.cpp:409)
            # — evaluated on the TRUE f64 residual here
            reason = StopReason.RELATIVE_RESIDUAL
            break
        if total_inner >= stop.max_iterations:
            reason = StopReason.ITERATIONS
            break
        if stop_requested is not None and stop_requested():
            interrupted = True
            reason = StopReason.INTERRUPTED
            break

        with phase("inner_solve"):
            opts = inner_options(adaptive_inner_tol(r_max, r_norm))
            if inner_solve_fn is not None and cur_dtype == lo_dtype:
                # fast-engine hook (e.g. the fused Pallas PCG,
                # kernels/cg_fused.py) — f32 only; the escalated high-
                # precision polish falls back to the standard path below
                inner = inner_solve_fn(r.astype(cur_dtype), opts)
            else:
                inner = cg_solve(A_lo, r.astype(cur_dtype), options=opts)
        with phase("outer_residual"):
            # accumulate + true residual + stats: one program, one transfer
            x, r, stats_dev = _outer_update(A_hi, x, inner.x, b, u_true)
            total_inner += inner.iterations
            inner_counts.append(inner.iterations)
            stats = np.asarray(stats_dev)
        r_max_new, prec_max = float(stats[0]), float(stats[1])
        r_norm = math.sqrt(max(float(stats[3]), 0.0))
        if u_true is not None:
            err_max = float(stats[2])
        if not math.isfinite(r_max_new):
            r_max = r_max_new
            reason = StopReason.DIVERGED
            break
        if (
            escalate
            and not escalated
            and r_max_new > escalate_ratio * r_max
            and r_max_new > 0
        ):
            # f32 floor reached: polish with full-precision inner solves
            cur_dtype = b.dtype
            escalated = True
        elif cur_dtype == b.dtype or not escalate:
            # at top precision: bail out if the rounding floor is reached
            stalls = stalls + 1 if r_max_new > 0.5 * r_max else 0
            if stalls >= 2:
                r_max = r_max_new
                reason = StopReason.ITERATIONS
                break
        r_max = r_max_new
        if callback is not None:
            callback(total_inner, prec_max, r_max, err_max)

    converged = reason.converged and not interrupted
    return RefinedResult(
        x=x,
        iterations=total_inner,
        converged=bool(converged),
        reason=reason,
        precision_max=prec_max,
        residual_max=r_max,
        error_max=err_max,
        residual_norm=r_norm,
        initial_residual_norm=r0_norm,
        elapsed_s=time.perf_counter() - t0,
        history=None,
        outer_iterations=len(inner_counts),
        inner_iterations=inner_counts,
        escalated=escalated,
    )
