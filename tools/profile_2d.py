"""Phase breakdown of the 8192^2 2D headline solve (BENCH_MODE=solve anatomy).

Same methodology as tools/profile_3d.py: per-stage scalar fences (the sum of
stages exceeds the fused end-to-end wall; ratios are the signal).

Usage: python tools/profile_2d.py [n]   (default 8192)
"""

from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from iterative_solvers_tpu.core.domain import Domain2D
from iterative_solvers_tpu.core.problem import PoissonProblem
from iterative_solvers_tpu.kernels.cg_fused import _engine_for
from iterative_solvers_tpu.kernels.stencil_pallas import PallasStencilOperator
from iterative_solvers_tpu.solvers.multigrid import (
    MultigridPreconditioner,
    PaddedPreconditioner,
)
from iterative_solvers_tpu.solvers.refine import (
    _FMG_POLISH_MAX_EXTENT,
    _FMG_SMOOTH_SWEEPS,
    _device_ir,
    _padded_hi_operator,
    fused_refined_solve,
)
from iterative_solvers_tpu.solvers.stopping import StopConfig


def fence(x) -> float:
    if getattr(x, "ndim", 0) == 0:
        return float(x)
    return float(jnp.sum(x.astype(jnp.float32)[..., :1, :1]))


def timed(label, fn, *args, reps=3, **kw):
    fn(*args, **kw)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        fence(out if not isinstance(out, tuple) else out[0])
        best = min(best, time.perf_counter() - t0)
    print(f"  {label:<44s} {best*1e3:9.1f} ms")
    return best


def main(n: int) -> None:
    dom = Domain2D(nx=n, ny=n)
    prob = PoissonProblem.manufactured(dom)
    M = MultigridPreconditioner.from_domain(dom, fuse=True)
    stop = StopConfig(
        eps_precision=-1, eps_residual=-1, eps_relative=1e-6, max_iterations=100000
    )
    pop = PallasStencilOperator.from_domain(dom)
    A_hi = _padded_hi_operator(pop)
    Mi = M.with_fmg(prob)
    Mp = PaddedPreconditioner(inner=Mi, padded_op=pop)
    engine = _engine_for(pop, Mp)
    b64 = prob.rhs_field(jnp.float64)
    b64p = pop.pad(b64)
    b32p = b64p.astype(jnp.float32)

    print(f"n={n}^2 padded={b64p.shape} levels={Mi.num_levels}")
    print("micro stages:")
    timed("A_lo (Pallas 5pt f32)", jax.jit(lambda x: pop(x)), b32p)
    timed("A_hi (jnp 5pt f64 float-float)", jax.jit(lambda x: A_hi(x)), b64p)
    timed("V-cycle finest (fused, padded f32)", jax.jit(lambda r: Mp(r)), b32p)
    timed(
        "one fused PCG iteration-equivalent (M+dots)",
        jax.jit(lambda r: Mp.inner.call_with_dot(r)[0] if hasattr(Mp.inner, "call_with_dot") else Mp(r)),
        b32p,
    )
    timed(
        "FMG stepwise (full warm start)",
        lambda b: Mp.fmg_stepwise(
            b,
            1,
            polish_max_extent=_FMG_POLISH_MAX_EXTENT,
            smooth_sweeps=_FMG_SMOOTH_SWEEPS,
        ),
        b32p,
    )
    # NB b must be an ARGUMENT — a captured 550 MB f64 array becomes an HLO
    # constant and blows the tunnel compile-server limit (HTTP 413)
    timed("b - A_hi(x) residual (f64)", jax.jit(lambda b, x: b - A_hi(x)), b64p, b64p)
    timed(
        "f64 norms (sum r*r + max|r|)",
        jax.jit(lambda r: jnp.sum(r * r) + jnp.max(jnp.abs(r))),
        b64p,
    )
    from iterative_solvers_tpu.kernels.resid_ff import ff_residual_fn
    from iterative_solvers_tpu.ops.ddf32 import residual_ff, split_f64

    bh, bl = split_f64(b64p)
    timed(
        "ff residual (jnp EFT chain)",
        jax.jit(
            lambda bh, bl, xh, xl: residual_ff(
                A_hi.interior, A_hi.coeffs, (bh, bl), (xh, xl)
            )[0]
        ),
        bh, bl, bh, bl,
    )
    rfk = ff_residual_fn(pop, pop.padded_shape)
    timed(
        "ff residual (fused Pallas kernel)",
        jax.jit(lambda bh, bl, xh, xl: rfk((bh, bl), (xh, xl))[0]),
        bh, bl, bh, bl,
    )

    x0 = Mp.fmg_stepwise(
        b32p,
        1,
        polish_max_extent=_FMG_POLISH_MAX_EXTENT,
        smooth_sweeps=_FMG_SMOOTH_SWEEPS,
    )
    fence(x0)

    def ir_only(x0):
        x, r, st = _device_ir(engine, A_hi, stop, 1e-4, 200, 8, b64p, None, x0)
        return st

    print("end-to-end stages:")
    ir_only(x0)
    for _ in range(2):
        t0 = time.perf_counter()
        st = ir_only(x0)
        stn = jax.device_get(st)
        print(
            f"  IR program (warm-started)    {time.perf_counter()-t0:9.3f} s"
            f"  outers={int(stn[0])} inners={int(stn[1])}"
        )

    for ff in (False, True):
        def run(ff=ff):
            return fused_refined_solve(pop, Mp, b64, stop=stop, fmg=True, ff=ff)

        run()
        for _ in range(2):
            t0 = time.perf_counter()
            res = run()
            t = time.perf_counter() - t0
            rel = res.residual_norm / res.initial_residual_norm
            print(
                f"  fused_refined_solve (fmg=True, ff={ff!s:<5})  {t:9.3f} s"
                f"  rel={rel:.2e}  outers={res.outer_iterations}"
                f" inners={res.iterations}"
            )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8192)
