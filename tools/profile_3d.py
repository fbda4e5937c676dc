"""Phase breakdown of the 512^3 3D MG-IR solve (BENCH_MODE=3d anatomy).

Runs on the real TPU. Times each stage of device_refined_solve separately by
forcing completion with a scalar fetch after each stage (the tunnel makes
block_until_ready a no-op — fetch a scalar instead). The per-stage sync adds
~0.1 s RTT per fence, so the SUM here exceeds the fused end-to-end number;
the point is the ratio between stages.

Usage: python tools/profile_3d.py [n]   (default 512)
"""

from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from iterative_solvers_tpu.core.domain import Domain3D
from iterative_solvers_tpu.core.problem import PoissonProblem
from iterative_solvers_tpu.kernels.stencil3d_pallas import Pallas3DStencilOperator
from iterative_solvers_tpu.solvers.multigrid import (
    MultigridPreconditioner,
    PaddedPreconditioner,
)
from iterative_solvers_tpu.solvers.refine import (
    _FMG_POLISH_MAX_EXTENT,
    _FMG_SMOOTH_SWEEPS,
    _device_ir_generic,
    _padded_hi_operator,
    device_refined_solve,
)
from iterative_solvers_tpu.solvers.stopping import StopConfig


def fence(x) -> float:
    """Force completion of everything feeding x; return a scalar."""
    return float(jnp.sum(x.astype(jnp.float32)[..., :1, :1]))


def timed(label, fn, *args, reps=3, **kw):
    fn(*args, **kw)  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        fence(out if not isinstance(out, tuple) else out[0])
        best = min(best, time.perf_counter() - t0)
    print(f"  {label:<44s} {best*1e3:9.1f} ms")
    return best


def main(n: int) -> None:
    dom = Domain3D(nx=n, ny=n, nz=n)
    prob = PoissonProblem.manufactured(dom)
    M = MultigridPreconditioner.from_domain(dom)
    stop = StopConfig(
        eps_precision=-1, eps_residual=-1, eps_relative=1e-6, max_iterations=100000
    )
    pop3 = Pallas3DStencilOperator.from_domain(dom)
    A_hi3 = _padded_hi_operator(pop3)
    Mi = M.with_fmg(prob)
    Mp3 = PaddedPreconditioner(inner=Mi, padded_op=pop3)
    b64 = prob.rhs_field(jnp.float64)
    b64p = pop3.pad(b64)
    b32p = b64p.astype(jnp.float32)

    print(f"n={n}^3 padded={b64p.shape} levels={Mi.num_levels}")

    # --- stage micro-times ---------------------------------------------
    print("micro stages:")
    timed("A_lo (Pallas 7pt f32)", jax.jit(lambda x: pop3(x)), b32p)
    timed("A_hi (jnp 7pt f64 float-float)", jax.jit(lambda x: A_hi3(x)), b64p)
    timed("V-cycle finest (padded f32)", jax.jit(lambda r: Mp3(r)), b32p)
    timed(
        "FMG stepwise (full warm start)",
        lambda b: Mp3.fmg_stepwise(
            b,
            1,
            polish_max_extent=_FMG_POLISH_MAX_EXTENT,
            smooth_sweeps=_FMG_SMOOTH_SWEEPS,
        ),
        b32p,
    )
    timed("b - A_hi(x) residual (f64)", jax.jit(lambda x: b64p - A_hi3(x)), b64p)
    timed(
        "f64 norms (sum r*r + max|r|)",
        jax.jit(lambda r: jnp.sum(r * r) + jnp.max(jnp.abs(r))),
        b64p,
    )

    # --- IR program alone (cold start, no FMG) --------------------------
    def ir_only(x0):
        x, r, st = _device_ir_generic(
            A_hi3, pop3, Mp3, stop, 1e-4, 200, 8, b64p, None, x0
        )
        return st

    x0 = Mp3.fmg_stepwise(
        b32p,
        1,
        polish_max_extent=_FMG_POLISH_MAX_EXTENT,
        smooth_sweeps=_FMG_SMOOTH_SWEEPS,
    )
    x0 = jax.block_until_ready(x0)
    fence(x0)
    print("end-to-end stages:")
    ir_only(x0)  # compile
    for _ in range(2):
        t0 = time.perf_counter()
        st = ir_only(x0)
        stn = jax.device_get(st)
        print(
            f"  IR program (warm-started)    {time.perf_counter()-t0:9.3f} s"
            f"  outers={int(stn[0])} inners={int(stn[1])}"
        )

    # --- the real thing --------------------------------------------------
    def run():
        return device_refined_solve(
            A_hi3, pop3, b64p, stop=stop, preconditioner=Mp3, fmg=True
        )

    run()
    for _ in range(2):
        t0 = time.perf_counter()
        res = run()
        t = time.perf_counter() - t0
        rel = res.residual_norm / res.initial_residual_norm
        print(
            f"  device_refined_solve (fmg=True) {t:9.3f} s  rel={rel:.2e}"
            f"  outers={res.outer_iterations} inners={res.iterations}"
        )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512)
