"""A/B the device-IR outer-loop precision modes on real hardware.

Round-4 landed the double-f32 (ff) outer mode (ops/ddf32.py) with
equivalence tests, but left it opt-in "gated on the hardware profile of the
f64 apply". This tool pins that profile: the full headline solve (FMG warm
start + device-IR ladder) with the f64 float-float outer vs the ff outer,
warm, best-of-N, plus the micro cost of the two residual evaluations.

Usage:
  python tools/profile_ff.py          # 2D 8192^2 (fused engine path)
  python tools/profile_ff.py --3d     # 3D 512^3 (generic device-IR path)
  python tools/profile_ff.py --n 4096 # smaller 2D
"""

from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from iterative_solvers_tpu.solvers.stopping import StopConfig


def fence(x) -> float:
    return float(jnp.sum(x.astype(jnp.float32)[..., :1, :1]))


def best_of(fn, reps=3):
    fn()  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


def run_2d(n: int) -> None:
    from iterative_solvers_tpu.core.domain import Domain2D
    from iterative_solvers_tpu.core.problem import PoissonProblem
    from iterative_solvers_tpu.kernels.stencil_pallas import PallasStencilOperator
    from iterative_solvers_tpu.solvers.multigrid import (
        MultigridPreconditioner,
        PaddedPreconditioner,
    )
    from iterative_solvers_tpu.solvers.refine import (
        _padded_hi_operator,
        fused_refined_solve,
    )

    dom = Domain2D(nx=n, ny=n)
    prob = PoissonProblem.manufactured(dom)
    M = MultigridPreconditioner.from_domain(dom)
    stop = StopConfig(
        eps_precision=-1, eps_residual=-1, eps_relative=1e-6, max_iterations=100000
    )
    pop = PallasStencilOperator.from_domain(dom)
    Mp = PaddedPreconditioner(inner=M.with_fmg(prob), padded_op=pop)
    b64 = prob.rhs_field(jnp.float64)

    print(f"2D n={n}^2 (fused_refined_solve, fmg=True)")
    for ff in (False, True):
        t, res = best_of(
            lambda ff=ff: fused_refined_solve(pop, Mp, b64, stop=stop, fmg=True, ff=ff)
        )
        rel = res.residual_norm / res.initial_residual_norm
        print(
            f"  ff={ff!s:<5}  {t*1e3:8.1f} ms   rel={rel:.2e} "
            f"outers={res.outer_iterations} inners_total={res.iterations} "
            f"reason={res.reason.name} escalated={res.escalated}"
        )

    # micro: one true-residual evaluation, f64 float-float vs compensated f32
    from iterative_solvers_tpu.ops.ddf32 import residual_ff, split_f64

    # NB: big operands must be ARGUMENTS, not closure captures — a captured
    # device array is embedded in the HLO as a constant and the lowered
    # program blows the tunnel compile-server request limit (HTTP 413).
    A_hi = _padded_hi_operator(pop)
    bp = pop.pad(b64)
    x64 = bp * 0.5
    r64 = jax.jit(lambda b, x: b - A_hi(x))
    r64(bp, x64)
    t64 = best_of(lambda: fence(r64(bp, x64)))[0]
    bh, bl = split_f64(bp)
    xh, xl = split_f64(x64)
    rff = jax.jit(
        lambda bh, bl, xh, xl: residual_ff(
            A_hi.interior, A_hi.coeffs, (bh, bl), (xh, xl)
        )[0]
    )
    rff(bh, bl, xh, xl)
    tff = best_of(lambda: fence(rff(bh, bl, xh, xl)))[0]
    print(f"  micro residual: f64 {t64*1e3:.1f} ms  ff {tff*1e3:.1f} ms")


def run_3d(n: int) -> None:
    from iterative_solvers_tpu.core.domain import Domain3D
    from iterative_solvers_tpu.core.problem import PoissonProblem
    from iterative_solvers_tpu.kernels.stencil3d_pallas import Pallas3DStencilOperator
    from iterative_solvers_tpu.solvers.multigrid import (
        MultigridPreconditioner,
        PaddedPreconditioner,
    )
    from iterative_solvers_tpu.solvers.refine import (
        _padded_hi_operator,
        device_refined_solve,
    )

    dom = Domain3D(nx=n, ny=n, nz=n)
    prob = PoissonProblem.manufactured(dom)
    M = MultigridPreconditioner.from_domain(dom)
    stop = StopConfig(
        eps_precision=-1, eps_residual=-1, eps_relative=1e-6, max_iterations=100000
    )
    pop3 = Pallas3DStencilOperator.from_domain(dom)
    A_hi3 = _padded_hi_operator(pop3)
    Mp3 = PaddedPreconditioner(inner=M.with_fmg(prob), padded_op=pop3)
    b64p = pop3.pad(prob.rhs_field(jnp.float64))

    print(f"3D n={n}^3 (device_refined_solve, fmg=True)")
    for ff in (False, True):
        t, res = best_of(
            lambda ff=ff: device_refined_solve(
                A_hi3, pop3, b64p, stop=stop, preconditioner=Mp3, fmg=True, ff=ff
            )
        )
        rel = res.residual_norm / res.initial_residual_norm
        print(
            f"  ff={ff!s:<5}  {t*1e3:8.1f} ms   rel={rel:.2e} "
            f"outers={res.outer_iterations} inners_total={res.iterations} "
            f"reason={res.reason.name} escalated={res.escalated}"
        )


if __name__ == "__main__":
    args = sys.argv[1:]
    if "--3d" in args:
        ns = [a for a in args if a.isdigit()]
        run_3d(int(ns[0]) if ns else 512)
    else:
        ns = [a for a in args if a.isdigit()]
        run_2d(int(ns[0]) if ns else 8192)
