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
from typing import Callable, List, Optional

import jax.numpy as jnp
import numpy as np

from iterative_solvers_tpu.solvers.cg import CGOptions, CGResult, cg_solve
from iterative_solvers_tpu.solvers.stopping import StopConfig, StopReason


@dataclass
class RefinedResult(CGResult):
    """CGResult plus refinement structure: ``iterations`` counts total inner
    CG iterations (the cost metric); ``outer_iterations`` counts f64
    refinement steps."""

    outer_iterations: int = 0
    inner_iterations: Optional[List[int]] = None


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
    callback: Optional[Callable[[int, float, float, float], None]] = None,
    stop_requested: Optional[Callable[[], bool]] = None,
) -> RefinedResult:
    """Solve ``A x = b`` to high-precision stopping criteria via mixed-precision
    iterative refinement.

    ``A_hi`` acts on ``b.dtype`` (f64) fields, ``A_lo`` on ``lo_dtype`` (f32)
    fields of the same shape; ``preconditioner`` (e.g.
    :class:`~iterative_solvers_tpu.solvers.multigrid.MultigridPreconditioner`)
    runs inside the f32 inner solve. Stop criteria follow the reference
    semantics (eps <= 0 disables) but are evaluated on true f64 residuals.
    """
    stop = stop or StopConfig()
    if b.dtype == lo_dtype:
        raise ValueError(
            f"b has dtype {b.dtype} == lo_dtype; enable jax_enable_x64 and pass "
            "an f64 right-hand side for the high-precision outer loop"
        )
    t0 = time.perf_counter()

    inner_stop = StopConfig(
        eps_precision=-1.0,
        eps_residual=-1.0,
        eps_exact_error=-1.0,
        eps_relative=inner_rel_tol,
        max_iterations=inner_max_iter,
    )
    inner_opts = CGOptions(stop=inner_stop, preconditioner=preconditioner)

    x = jnp.zeros_like(b)
    r = b
    r_max = float(jnp.max(jnp.abs(r)))
    err_max = float(jnp.max(jnp.abs(x - u_true))) if u_true is not None else math.inf
    prec_max = math.inf
    reason = StopReason.ITERATIONS
    total_inner = 0
    inner_counts: List[int] = []
    interrupted = False

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
        if total_inner >= stop.max_iterations:
            reason = StopReason.ITERATIONS
            break
        if stop_requested is not None and stop_requested():
            interrupted = True
            reason = StopReason.INTERRUPTED
            break

        inner = cg_solve(A_lo, r.astype(lo_dtype), options=inner_opts)
        d = inner.x.astype(b.dtype)
        x = x + d
        r = b - A_hi(x)  # true residual, f64

        total_inner += inner.iterations
        inner_counts.append(inner.iterations)
        r_max = float(jnp.max(jnp.abs(r)))
        prec_max = float(jnp.max(jnp.abs(d)))
        if u_true is not None:
            err_max = float(jnp.max(jnp.abs(x - u_true)))
        if callback is not None:
            callback(total_inner, prec_max, r_max, err_max)

    converged = reason.converged and not interrupted
    r2 = float(jnp.sum(r * r))
    return RefinedResult(
        x=x,
        iterations=total_inner,
        converged=bool(converged),
        reason=reason,
        precision_max=prec_max,
        residual_max=r_max,
        error_max=err_max,
        residual_norm=math.sqrt(max(r2, 0.0)),
        initial_residual_norm=float(jnp.sqrt(jnp.sum(b * b))),
        elapsed_s=time.perf_counter() - t0,
        history=None,
        outer_iterations=len(inner_counts),
        inner_iterations=inner_counts,
    )
