"""Headline benchmark: CG time-to-1e-6 residual at 8192² (BASELINE.json
north-star), plus secondary kernel metrics.

Default mode (``BENCH_MODE=solve``): wall time for the full solver stack —
multigrid-preconditioned CG inside mixed-precision iterative refinement — to
reach a TRUE relative residual of 1e-6 (‖b − A x‖₂ / ‖b‖₂ evaluated fresh in
f64) on the 8192² Г-domain Dirichlet-Poisson problem. ``vs_baseline`` is the
measured speedup over the reference *algorithm* (plain unpreconditioned MSG
CG, reference solver/msg_solver.cpp:80-184) running on this framework's own
best plain-CG implementation (the fused two-kernel Pallas engine) to the same
nominal criterion. Measured on TPU v5e (NOTES_PERF.md): plain CG takes 14180
iterations ≈ 46 s warm — and its f32 recurrence overstates convergence: its
TRUE relative residual lands at only 3.5e-4, so the speedup understates the
quality gap.

Other modes: ``BENCH_MODE=nnz`` — matrix-free stencil-SpMV nnz/s per chip vs
70% of the bandwidth roofline (the BASELINE.json kernel target; vs_baseline
>= 1.0 means met). ``BENCH_MODE=cg`` — fused CG iteration rate.

Prints exactly ONE JSON line:
{"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Timing methodology (see NOTES_PERF.md): on-device loops use *traced* trip
counts (static counts let XLA fuse the chain), and completion is forced by
fetching a scalar — block_until_ready is a no-op over the axon tunnel.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

# Error classes worth retrying with a fresh backend: round 1's official bench
# artifact died on a FAILED_PRECONDITION at the first device fetch (a
# dirty/held TPU at driver-capture time) even though the same command passed
# minutes later. OOM (RESOURCE_EXHAUSTED) is deliberately NOT here.
_TRANSIENT_MARKERS = (
    "FAILED_PRECONDITION",
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "ABORTED",
    "INTERNAL",
    "Socket closed",
    "Connection reset",
)


def _reset_backend() -> None:
    """Drop compiled programs and the device client so the next call opens a
    fresh connection to the chip."""
    import jax

    try:
        jax.clear_caches()
    except Exception:
        pass
    try:
        import jax.extend.backend

        jax.extend.backend.clear_backends()
    except Exception:
        pass


def _device_probe(max_tries: int = 4) -> None:
    """Tiny compile+execute+fetch before the real bench, with retry/backoff.
    Catches the held-chip failure mode early and cheaply instead of after a
    multi-minute warmup."""
    import jax
    import jax.numpy as jnp

    last: Exception | None = None
    for attempt in range(max_tries):
        try:
            v = float(jax.jit(lambda a: jnp.sum(a * 2.0))(jnp.ones((128, 128), jnp.float32)))
            if v != 2.0 * 128 * 128:
                raise RuntimeError(f"probe value mismatch: {v}")
            return
        except Exception as e:  # noqa: BLE001 — any device error is probe-fatal
            last = e
            print(
                f"bench: device probe failed (attempt {attempt + 1}/{max_tries}): {e}",
                file=sys.stderr,
            )
            if attempt + 1 < max_tries:
                time.sleep(2.0 * (attempt + 1))
                _reset_backend()
    raise RuntimeError(f"device probe failed after {max_tries} attempts") from last


def _hbm_bandwidth_bytes(device_kind: str) -> float:
    k = device_kind.lower()
    if "v5 lite" in k or "v5e" in k or "v5lite" in k:
        return 819e9
    if "v5p" in k or "v5" in k:
        return 2765e9
    if "v6 lite" in k or "v6e" in k:
        return 1638e9
    if "v4" in k:
        return 1228e9
    if "v3" in k:
        return 900e9
    return 819e9  # conservative default


def _bench_cg_fused(n: int) -> None:
    """Alternative metric (BENCH_MODE=cg): fused-CG iteration rate. Reported
    as effective nnz/s of the two stencil evaluations per iteration."""
    import jax
    import jax.numpy as jnp

    from iterative_solvers_tpu.core.domain import Domain2D
    from iterative_solvers_tpu.core.problem import PoissonProblem
    from iterative_solvers_tpu.kernels.cg_fused import FusedCGEngine, _fused_chunk
    from iterative_solvers_tpu.kernels.stencil_pallas import PallasStencilOperator
    from iterative_solvers_tpu.ops.stencil import StencilOperator
    from iterative_solvers_tpu.solvers.cg import CGState
    from iterative_solvers_tpu.solvers.stopping import StopConfig, StopReason

    dom = Domain2D(nx=n, ny=n)
    op = PallasStencilOperator.from_domain(dom)
    b = op.pad(PoissonProblem.manufactured(dom).rhs_field(jnp.float32))
    engine = FusedCGEngine(op)
    stop = StopConfig(max_iterations=10**9).disable_all_but_iterations()
    r2_0 = jnp.sum(b * b)
    state = CGState(
        x=jnp.zeros_like(b), r=b, z=jnp.zeros_like(b),
        k=jnp.asarray(0, jnp.int32), done=jnp.asarray(False),
        reason=jnp.asarray(int(StopReason.ITERATIONS), jnp.int32),
        rz=jnp.asarray(1.0, jnp.float32), r_norm2=r2_0,
        prec_max=jnp.asarray(jnp.inf, jnp.float32), r_max=jnp.max(jnp.abs(b)),
        err_max=jnp.asarray(jnp.inf, jnp.float32), r0_norm=jnp.sqrt(r2_0),
    )

    def run(k):
        s = _fused_chunk(engine, stop, state, None, jnp.asarray(k, jnp.int32))
        return float(s.r_norm2)

    run(2)
    t = {}
    for K in (5, 25):
        t0 = time.perf_counter()
        run(K)
        t[K] = time.perf_counter() - t0
    per = (t[25] - t[5]) / 20
    nnz = StencilOperator.from_domain(dom).nnz()
    print(
        json.dumps(
            {
                "metric": f"fused_cg_iteration_ms_{n}x{n}",
                "value": per * 1e3,
                "unit": "ms/iteration",
                # vs the XLA-fused jnp CG path, recorded once at 8192^2 on
                # v5e (NOTES_PERF.md CG-iteration table) — a fixed reference
                # point so the ratio tracks THIS engine's regressions
                "vs_baseline": 6.90 / (per * 1e3),
            }
        )
    )


def _measure_plain_iter_ms(dom) -> float:
    """Live ms/iteration of the best plain-CG engine (the fused two-kernel
    Pallas MSG recurrence), as a two-point difference so dispatch/tunnel
    latency cancels out of the slope."""
    import jax
    import jax.numpy as jnp

    from iterative_solvers_tpu.core.problem import PoissonProblem
    from iterative_solvers_tpu.kernels.cg_fused import FusedCGEngine, _fused_chunk
    from iterative_solvers_tpu.kernels.stencil_pallas import PallasStencilOperator
    from iterative_solvers_tpu.solvers.cg import CGState
    from iterative_solvers_tpu.solvers.stopping import StopConfig, StopReason

    op = PallasStencilOperator.from_domain(dom)
    # the fused engine is f32-only; trace with x64 off (the solve mode enables
    # x64 globally for the f64 outer refinement)
    with jax.enable_x64(False):
        b = op.pad(PoissonProblem.manufactured(dom).rhs_field(jnp.float32))
        engine = FusedCGEngine(op)
        stop = StopConfig(max_iterations=10**9).disable_all_but_iterations()
        r2_0 = jnp.sum(b * b)
        state = CGState(
            x=jnp.zeros_like(b), r=b, z=jnp.zeros_like(b),
            k=jnp.asarray(0, jnp.int32), done=jnp.asarray(False),
            reason=jnp.asarray(int(StopReason.ITERATIONS), jnp.int32),
            rz=jnp.asarray(1.0, jnp.float32), r_norm2=r2_0,
            prec_max=jnp.asarray(jnp.inf, jnp.float32), r_max=jnp.max(jnp.abs(b)),
            err_max=jnp.asarray(jnp.inf, jnp.float32), r0_norm=jnp.sqrt(r2_0),
        )

        def run(k: int) -> float:
            t0 = time.perf_counter()
            s = _fused_chunk(engine, stop, state, None, jnp.asarray(k, jnp.int32))
            float(s.r_norm2)  # force completion (block_until_ready is a tunnel no-op)
            return time.perf_counter() - t0

        run(2)  # compile + warm
        t_lo = min(run(5) for _ in range(2))
        t_hi = min(run(105) for _ in range(2))
        return (t_hi - t_lo) / 100 * 1e3


def _bench_solve(n: int, on_tpu: bool) -> None:
    """Default headline: time-to-true-rel-1e-6 via mixed-precision MG-IR,
    vs the plain fused-CG reference algorithm."""
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from iterative_solvers_tpu.core.domain import Domain2D
    from iterative_solvers_tpu.core.problem import PoissonProblem
    from iterative_solvers_tpu.ops.stencil import StencilOperator
    from iterative_solvers_tpu.solvers.multigrid import MultigridPreconditioner
    from iterative_solvers_tpu.solvers.refine import refined_solve
    from iterative_solvers_tpu.solvers.stopping import StopConfig

    dom = Domain2D(nx=n, ny=n)
    prob = PoissonProblem.manufactured(dom)
    op = StencilOperator.from_domain(dom)
    b64 = prob.rhs_field(jnp.float64)
    M = MultigridPreconditioner.from_domain(dom)
    stop = StopConfig(
        eps_precision=-1, eps_residual=-1, eps_relative=1e-6, max_iterations=100000
    )

    if on_tpu and not os.environ.get("BENCH_HOST_IR"):
        # The whole mixed-precision IR loop runs ON DEVICE (one dispatch, one
        # packed-stats fetch): over the tunneled TPU each host sync costs
        # ~0.1 s — more than eight fused PCG iterations — so the host-driven
        # loop is latency-bound, not compute-bound.
        from iterative_solvers_tpu.kernels.stencil_pallas import PallasStencilOperator
        from iterative_solvers_tpu.solvers.multigrid import PaddedPreconditioner
        from iterative_solvers_tpu.solvers.refine import fused_refined_solve

        pop = PallasStencilOperator.from_domain(dom)
        # FMG warm start (round 3): one nested-iteration pass lands ~3
        # residual decades, cutting the ladder from 2x[4,4] to 1x[2] inner
        # PCG iterations — measured 0.242 -> 0.155 s warm at 8192²
        Mp = PaddedPreconditioner(inner=M.with_fmg(prob), padded_op=pop)

        def run_solve():
            # ff=True: double-f32 outer (ops/ddf32.py) — no f64 op in the
            # program. A/B'd on hardware 2026-08-20 (tools/profile_ff.py):
            # 161.6 vs 174.7 ms warm at 8192², identical trajectory
            # (1 outer / 2 inners, rel 1.20e-07 both).
            return fused_refined_solve(pop, Mp, b64, stop=stop, fmg=True, ff=True)

    else:

        def run_solve():
            return refined_solve(op, op, b64, stop=stop, preconditioner=M)

    # warm with the IDENTICAL stop config: the adaptive inner tolerance picks
    # per-decade jit buckets from the measured residual trajectory, so a
    # looser warm target would compile different buckets than the timed run
    run_solve()

    t0 = time.perf_counter()
    res = run_solve()
    t_solve = time.perf_counter() - t0
    rel = res.residual_norm / res.initial_residual_norm
    assert res.converged and rel < 1e-6, (res.converged, rel)

    # Baseline: plain MSG CG (the reference's only algorithm) on this
    # framework's fastest plain-CG path (the fused Pallas engine on TPU).
    # At 8192² the full run takes ~51 s, so the default measures ms/iteration
    # live (~0.7 s) and multiplies by the criterion-hit iteration count of the
    # f32 recurrence — an algorithmic property of the recurrence, not of
    # engine speed. The count is EVIDENCE, not memory: a committed
    # BENCH_PLAIN_FULL=1 run on 2026-08-17 (round 3, NOTES_PERF.md) hit the
    # criterion at exactly 14180 iterations in 51.09 s live.
    # BENCH_PLAIN_FULL=1 reruns it live any time.
    plain_note = "measured live (full run)"
    if on_tpu and n == 8192 and not os.environ.get("BENCH_PLAIN_FULL"):
        per_ms = _measure_plain_iter_ms(dom)
        plain_iters = 14180
        t_plain = per_ms * 1e-3 * plain_iters
        plain_note = f"measured {per_ms:.3f} ms/iter x recorded {plain_iters} iters"
    elif on_tpu:
        from iterative_solvers_tpu.kernels.cg_fused import fused_cg_solve
        from iterative_solvers_tpu.kernels.stencil_pallas import PallasStencilOperator
        from iterative_solvers_tpu.solvers.cg import CGOptions

        pop = PallasStencilOperator.from_domain(dom)
        b32 = prob.rhs_field(jnp.float32)
        fused_cg_solve(pop, b32, options=CGOptions(stop=stop))  # compile
        t0 = time.perf_counter()
        plain = fused_cg_solve(pop, b32, options=CGOptions(stop=stop))
        t_plain = time.perf_counter() - t0
        plain_note += f" ({plain.iterations} iters)"
    else:
        from iterative_solvers_tpu.solvers.cg import CGOptions, cg_solve

        plain = cg_solve(
            op,
            jnp.asarray(b64, jnp.float32),
            options=CGOptions(stop=stop),
        )
        t0 = time.perf_counter()
        plain = cg_solve(
            op,
            jnp.asarray(b64, jnp.float32),
            options=CGOptions(stop=stop),
        )
        t_plain = time.perf_counter() - t0

    print(
        f"bench solve: n={n} mg_ir={t_solve:.3f}s true_rel={rel:.2e} "
        f"outer={res.outer_iterations} inner={res.inner_iterations} "
        f"plain_cg={t_plain:.3f}s [{plain_note}]",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"cg_time_to_true_rel_1e-6_{n}x{n}",
                "value": t_solve,
                "unit": "s",
                "vs_baseline": t_plain / t_solve,
            }
        )
    )


def _bench_solve_3d(n: int) -> None:
    """BASELINE config '3D Poisson 512³ 7-point': the single-chip leg —
    mixed-precision MG-IR vs plain CG (Pallas 7-point kernel) at 512³.
    (The config's multi-host block partitioning is exercised structurally by
    BENCH_MODE=scale and the virtual-mesh tests; real N>=2 host hardware is
    not available this round.)"""
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from iterative_solvers_tpu.core.domain import Domain3D
    from iterative_solvers_tpu.core.problem import PoissonProblem
    from iterative_solvers_tpu.ops.stencil import StencilOperator
    from iterative_solvers_tpu.solvers.cg import CGOptions, cg_solve
    from iterative_solvers_tpu.solvers.multigrid import MultigridPreconditioner
    from iterative_solvers_tpu.solvers.refine import refined_solve
    from iterative_solvers_tpu.solvers.stopping import StopConfig

    dom = Domain3D(nx=n, ny=n, nz=n)
    prob = PoissonProblem.manufactured(dom)
    M = MultigridPreconditioner.from_domain(dom)
    stop = StopConfig(
        eps_precision=-1, eps_residual=-1, eps_relative=1e-6, max_iterations=100000
    )
    b64 = prob.rhs_field(jnp.float64)
    # One-dispatch device-side refinement on the PADDED layout: the Pallas
    # 7-point apply (7.1 vs 10.1 ms at 512^3), the fused 3D V-cycle with
    # padded pass-through, and the f64 outer all run on (D, Hp, Wp) fields —
    # no pad/crop sweeps inside the loop, clean (8,128) tiling everywhere.
    from iterative_solvers_tpu.kernels.stencil3d_pallas import Pallas3DStencilOperator
    from iterative_solvers_tpu.solvers.multigrid import PaddedPreconditioner
    from iterative_solvers_tpu.solvers.refine import device_refined_solve

    pop3 = Pallas3DStencilOperator.from_domain(dom)
    from iterative_solvers_tpu.solvers.refine import _padded_hi_operator

    A_hi3 = _padded_hi_operator(pop3)  # MaskSpec-based: no 135 MB constant
    # FMG warm start (round 3): on [0,1]³ the manufactured exp(xyz) is mild,
    # so one nested-iteration pass buys ~3 residual decades here too
    Mp3 = PaddedPreconditioner(inner=M.with_fmg(prob), padded_op=pop3)
    b64p = pop3.pad(b64)

    def run_3d():
        # ff=True A/B'd on hardware 2026-08-20 (tools/profile_ff.py --3d):
        # 406.4 vs 462.1 ms warm at 512³, identical trajectory (1 outer /
        # 3 inners, rel 9.57e-08 both).
        return device_refined_solve(
            A_hi3, pop3, b64p, stop=stop, preconditioner=Mp3, fmg=True, ff=True
        )

    run_3d()  # compile
    t0 = time.perf_counter()
    res = run_3d()
    t_mg = time.perf_counter() - t0
    rel = res.residual_norm / res.initial_residual_norm
    assert res.converged and rel < 1e-6

    # plain CG gets the best plain engine: the Pallas 7-point kernel. The
    # default measures the per-iteration slope and multiplies by the
    # criterion-hit count of the f32 recurrence (1320 iterations, recorded
    # by the round-3 full run). NOTE the round-3 wall receipt of that run
    # (319.1 s) was CONTAMINATED: it re-evaluated prob.rhs_field inside the
    # timed region — a ~300 s single-core host sweep at 512³, not CG. The
    # honest plain wall is slope x 1320 ≈ 18.4 s (13.9 ms/iter measured
    # 2026-08-19), and vs_baseline ≈ 40x, not the 724x round 3 recorded.
    # BENCH_PLAIN_FULL=1 reruns the full criterion run live any time.
    b32 = pop3.pad(prob.rhs_field(jnp.float32))
    if n == 512 and not os.environ.get("BENCH_PLAIN_FULL"):
        plain_iters = 1320
        run_iters = {}
        for k in (10, 110):
            kstop = StopConfig(max_iterations=k).disable_all_but_iterations()
            cg_solve(pop3, b32, options=CGOptions(stop=kstop))  # compile
            t0 = time.perf_counter()
            cg_solve(pop3, b32, options=CGOptions(stop=kstop))
            run_iters[k] = time.perf_counter() - t0
        per_s = (run_iters[110] - run_iters[10]) / 100
        t_plain = per_s * plain_iters
        plain_note = (
            f"measured {per_s*1e3:.1f} ms/iter x recorded {plain_iters} iters"
        )
    else:
        cg_solve(pop3, b32, options=CGOptions(stop=stop))  # compile
        t0 = time.perf_counter()
        plain = cg_solve(pop3, b32, options=CGOptions(stop=stop))
        t_plain = time.perf_counter() - t0
        plain_note = f"measured live (full run, {plain.iterations} iters)"
    print(
        f"bench 3d: n={n}^3 mg_ir={t_mg:.2f}s rel={rel:.2e} "
        f"plain_cg={t_plain:.2f}s [{plain_note}]",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"cg3d_time_to_true_rel_1e-6_{n}^3",
                "value": t_mg,
                "unit": "s",
                "vs_baseline": t_plain / t_mg,
            }
        )
    )


def _bench_csr_vs_matrix_free(n: int) -> None:
    """BASELINE config '1024² explicit CSR SpMV CG vs matrix-free path':
    time both operator paths through the same CG driver to the same
    iteration count; vs_baseline = csr_time / matrix_free_time."""
    import jax
    import jax.numpy as jnp

    from iterative_solvers_tpu.core.domain import Domain2D
    from iterative_solvers_tpu.core.problem import PoissonProblem
    from iterative_solvers_tpu.core import ordering
    from iterative_solvers_tpu.ops.sparse import SparseOperator
    from iterative_solvers_tpu.ops.stencil import StencilOperator
    from iterative_solvers_tpu.solvers.cg import CGOptions, cg_solve
    from iterative_solvers_tpu.solvers.stopping import StopConfig

    dom = Domain2D(nx=n, ny=n)
    prob = PoissonProblem.manufactured(dom)
    iters = 200
    stop = StopConfig(max_iterations=iters).disable_all_but_iterations()
    opts = CGOptions(stop=stop)

    op_mf = StencilOperator.from_domain(dom)
    b = prob.rhs_field(jnp.float32)
    cg_solve(op_mf, b, options=opts)  # compile
    t0 = time.perf_counter()
    r_mf = cg_solve(op_mf, b, options=opts)
    t_mf = time.perf_counter() - t0

    op_csr = SparseOperator.from_domain(dom, jnp.float32)
    bc = ordering.pack(b, dom)
    cg_solve(op_csr, bc, options=opts)  # compile
    t0 = time.perf_counter()
    r_csr = cg_solve(op_csr, bc, options=opts)
    t_csr = time.perf_counter() - t0
    assert r_mf.iterations == r_csr.iterations == iters
    print(
        f"bench csr: n={n} matrix_free={t_mf:.3f}s csr={t_csr:.3f}s "
        f"({iters} iterations each)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"matrix_free_vs_csr_cg_{n}x{n}",
                "value": t_mf / iters * 1e3,
                "unit": "ms/iteration (matrix-free)",
                "vs_baseline": t_csr / t_mf,
            }
        )
    )


def _bench_precond(n: int) -> None:
    """BASELINE config '4096² Jacobi/Chebyshev-preconditioned CG with fused
    Pallas kernels': Chebyshev-PCG on the Pallas stencil operator vs plain CG
    on the same operator, fixed-tolerance race (recurrence rel 1e-6)."""
    import jax
    import jax.numpy as jnp

    from iterative_solvers_tpu.core.domain import Domain2D
    from iterative_solvers_tpu.core.problem import PoissonProblem
    from iterative_solvers_tpu.kernels.stencil_pallas import PallasStencilOperator
    from iterative_solvers_tpu.solvers.cg import CGOptions, cg_solve
    from iterative_solvers_tpu.solvers.precond import ChebyshevPreconditioner
    from iterative_solvers_tpu.solvers.stopping import StopConfig

    dom = Domain2D(nx=n, ny=n)
    prob = PoissonProblem.manufactured(dom)
    op = PallasStencilOperator.from_domain(dom)
    b = op.pad(prob.rhs_field(jnp.float32))
    stop = StopConfig(
        eps_precision=-1, eps_residual=-1, eps_relative=1e-6, max_iterations=100000
    )
    from iterative_solvers_tpu.solvers.multigrid import (
        MultigridPreconditioner,
        PaddedPreconditioner,
    )

    M_cheb = ChebyshevPreconditioner.from_domain(op, dom, degree=8)
    M_mg = PaddedPreconditioner(
        inner=MultigridPreconditioner.from_domain(dom), padded_op=op
    )

    def race(M, engine=cg_solve):
        opts = CGOptions(stop=stop, preconditioner=M)
        engine(op, b, options=opts)  # compile
        t0 = time.perf_counter()
        r = engine(op, b, options=opts)
        return time.perf_counter() - t0, r.iterations

    from iterative_solvers_tpu.kernels.cg_fused import fused_cg_solve

    def fused_race(op_, b_, options):
        # the MG leg runs the framework's actual fast path: fused PCG
        # (K1/K2 around the fused V-cycle); b is already padded here
        return fused_cg_solve(op_, op_.crop(b_), options=options)

    t_plain, it_plain = race(None)
    t_cheb, it_cheb = race(M_cheb)
    t_mg, it_mg = race(M_mg, engine=fused_race)
    print(
        f"bench precond: n={n} plain={t_plain:.2f}s ({it_plain} iters) "
        f"chebyshev8={t_cheb:.2f}s ({it_cheb}) mg={t_mg:.2f}s ({it_mg})",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"mg_pcg_time_rel_1e-6_{n}x{n}",
                "value": t_mg,
                "unit": "s",
                "vs_baseline": t_plain / t_mg,
            }
        )
    )


def _bench_scaling() -> None:
    """BASELINE config 'row-partitioned across hosts': weak-scaling check of
    the halo-exchange CG on every available device vs one device. With one
    real chip this degenerates to 1.0 by construction; on a multi-chip slice
    (or the 8-device virtual CPU mesh) it measures real efficiency:
    eff = T(1 device, n²) / T(D devices, (n·sqrt(D))²)."""
    import math

    import jax
    import jax.numpy as jnp

    from iterative_solvers_tpu.core.domain import Domain2D
    from iterative_solvers_tpu.core.problem import PoissonProblem
    from iterative_solvers_tpu.ops.stencil import StencilOperator
    from iterative_solvers_tpu.parallel import make_solver_mesh, make_sharded_problem
    from iterative_solvers_tpu.solvers.cg import CGOptions, cg_solve
    from iterative_solvers_tpu.solvers.stopping import StopConfig

    devs = jax.devices()
    d = len(devs)
    if d == 1 and not os.environ.get("BENCH_SCALE_INNER"):
        # One real chip: the in-process measurement would degenerate to a
        # trivial 1.0. Record the number the mode was designed to measure —
        # weak-scaling efficiency on the 8-virtual-device CPU mesh — in a
        # subprocess (the virtual mesh needs XLA_FLAGS at interpreter start).
        import subprocess

        env = dict(os.environ)
        env["BENCH_SCALE_INNER"] = "1"
        env["BENCH_MODE"] = "scale"
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
        )
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=1800,
        )
        sys.stderr.write(p.stderr)
        line = next(
            (ln for ln in reversed(p.stdout.splitlines()) if ln.startswith("{")), None
        )
        if p.returncode == 0 and line:
            obj = json.loads(line)
            obj["metric"] = "virtual_cpu_mesh_" + obj["metric"]
            print(json.dumps(obj))
            return
        print("bench scale: virtual-mesh subprocess failed; falling back to "
              "the trivial single-device record", file=sys.stderr)
    # CPU default 512: smaller grids are dispatch-dominated on the virtual
    # mesh and measure framework overhead, not the halo/collective cost
    n1 = int(os.environ.get("BENCH_N_SCALE", "1024" if devs[0].platform != "cpu" else "512"))
    iters = 100
    stop = StopConfig(max_iterations=iters).disable_all_but_iterations()
    opts = CGOptions(stop=stop)

    def run(n, mesh_devices):
        dom = Domain2D(nx=n, ny=n)
        prob = PoissonProblem.manufactured(dom)
        if len(mesh_devices) == 1:
            op = StencilOperator.from_domain(dom)
            b = prob.rhs_field(jnp.float32)
        else:
            mesh = make_solver_mesh(devices=mesh_devices)
            op, b, _ = make_sharded_problem(prob, mesh, jnp.float32)
        cg_solve(op, b, options=opts)  # compile
        # Best of 3: a single sample puts any transient VM-load spike straight
        # into the efficiency ratio (observed: same code, same box, 0.75 vs
        # 1.01 across days). min() is the least-interference estimate.
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            cg_solve(op, b, options=opts)
            best = min(best, time.perf_counter() - t0)
        return best

    if d == 1:
        # one device: the two runs would be the same measurement; report the
        # trivial efficiency rather than timer noise
        t1 = td = run(n1, devs[:1])
        nd, eff = n1, 1.0
    else:
        t1 = run(n1, devs[:1])
        nd = int(n1 * math.sqrt(d))
        nd -= nd % 2  # keep the Г-mask legal
        td = run(nd, devs)
        cpu_virtual = devs[0].platform == "cpu"
        if cpu_virtual:
            # Virtual host devices share the same cores, so D× work can never
            # finish in T1 — the meaningful number is overhead vs the ideal
            # *serialized* compute D·T1 (sharding + halo + collective cost).
            # The metric is RENAMED below so it cannot be read as the
            # conventional t1/td weak-scaling efficiency.
            eff = d * t1 / td
        else:
            eff = t1 / td
    print(
        f"bench scale: devices={d} t({n1}²,1dev)={t1:.3f}s "
        f"t({nd}²,{d}dev)={td:.3f}s weak-scaling eff={eff:.2f}",
        file=sys.stderr,
    )
    name = (
        f"parallel_overhead_efficiency_vs_serialized_1_to_{d}_devices"
        if d > 1 and cpu_virtual
        else f"weak_scaling_efficiency_1_to_{d}_devices"
    )
    print(
        json.dumps(
            {
                "metric": name,
                "value": eff,
                "unit": "ratio",
                "vs_baseline": eff / 0.85,  # target >= 85% (BASELINE.md)
            }
        )
    )


def _guarded_solve() -> int:
    """Run the solve mode in a child with a wall budget; on a pathological
    compile day (tunnel-server variance once cost round 3 its artifact,
    rc=124 from the DRIVER's timeout) fall back to the fused-CG iteration
    metric — a degraded but honest, parseable line beats a killed process.
    Typical solve-mode wall is ~2m30s fresh (NOTES_PERF round 4); the
    default 480 s budget only trips on >3x outliers."""
    import signal
    import subprocess

    budget = float(os.environ.get("BENCH_SOLVE_BUDGET_S", "480"))
    env = dict(os.environ, _BENCH_CHILD="1")
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)],
        stdout=subprocess.PIPE,
        text=True,
        start_new_session=True,
        env=env,
    )
    try:
        out, _ = proc.communicate(timeout=budget)
    except subprocess.TimeoutExpired:
        try:
            os.killpg(proc.pid, signal.SIGKILL)  # exact pgid we started
        except ProcessLookupError:
            pass
        # collect whatever the child had already printed — over the tunnel a
        # solve can finish and then hang in backend teardown, in which case
        # the measured line is sitting in the pipe
        try:
            out, _ = proc.communicate(timeout=15)
        except Exception:
            out = ""
        print(
            f"bench: solve mode exceeded its {budget:.0f}s budget "
            "(falling back to BENCH_MODE=cg unless a line was captured)",
            file=sys.stderr,
        )
    line = next(
        (l for l in reversed(out.splitlines()) if l.startswith("{")), None
    )
    if line is not None:
        try:
            parsed = json.loads(line)
            if parsed.get("unit") != "error":
                # a valid measured line is a success regardless of how the
                # child exited afterwards (e.g. a flaky teardown)
                print(line)
                return 0
        except json.JSONDecodeError:
            pass
    os.environ["BENCH_MODE"] = "cg"
    os.environ["_BENCH_CHILD"] = "1"  # no recursive guard
    main()
    return 0


def main() -> None:
    """Fail-soft wrapper: the driver grades exactly one JSON line from this
    process, so transient device errors retry with a fresh backend and any
    terminal error still emits a parseable line with an "error" field."""
    mode = os.environ.get("BENCH_MODE", "solve")
    if (
        mode == "solve"
        and "_BENCH_CHILD" not in os.environ
        and os.environ.get("BENCH_GUARD", "1") != "0"
    ):
        sys.exit(_guarded_solve())
    attempts = int(os.environ.get("BENCH_ATTEMPTS", "2"))
    err: BaseException | None = None
    for attempt in range(attempts):
        try:
            _run_mode()
            return
        except (KeyboardInterrupt, SystemExit):
            raise
        except BaseException as e:  # noqa: BLE001 — must never lose the JSON line
            err = e
            traceback.print_exc()
            if attempt + 1 < attempts and any(m in str(e) for m in _TRANSIENT_MARKERS):
                print(
                    "bench: transient device error — resetting backend and retrying",
                    file=sys.stderr,
                )
                _reset_backend()
                time.sleep(5.0)
                continue
            break
    print(
        json.dumps(
            {
                "metric": f"bench_{mode}",
                "value": 0.0,
                "unit": "error",
                "vs_baseline": 0.0,
                "error": f"{type(err).__name__}: {err}"[:400],
            }
        )
    )


def _bench_sharded_fast_path(n: int) -> None:
    """Per-chip throughput of the round-3 sharded fast path vs the
    single-chip kernels, on a 1x1 mesh over the available chip (ppermutes
    become self-loops; the halo plumbing cost is fully included). The
    BASELINE bar '>= 70% of roofline ... per chip on v5p-16' is per chip
    *while sharded* — this mode pins that per-chip factor with 1 real chip."""
    import jax
    import jax.numpy as jnp

    from iterative_solvers_tpu.core.domain import Domain2D
    from iterative_solvers_tpu.parallel import make_solver_mesh
    from iterative_solvers_tpu.parallel.halo_pallas import (
        ShardedPallasStencilOperator,
    )
    from iterative_solvers_tpu.parallel.mg_sharded import ShardedFusedMultigrid
    from iterative_solvers_tpu.solvers.multigrid import MultigridPreconditioner

    dom = Domain2D(nx=n, ny=n)
    interpret = jax.default_backend() == "cpu"

    def timeit(chain, x):
        float(chain(x, jnp.asarray(2)))  # compile + warm

        def run(k):
            t0 = time.perf_counter()
            float(chain(x, jnp.asarray(k)))
            return time.perf_counter() - t0

        per = max(run(8) / 8, 1e-7)
        k_lo = max(8, int(0.2 / per))
        k_hi = 4 * k_lo
        t_lo = min(run(k_lo) for _ in range(3))
        t_hi = min(run(k_hi) for _ in range(3))
        return (t_hi - t_lo) / (k_hi - k_lo)

    M1 = MultigridPreconditioner.from_domain(dom, interpret=interpret)

    @jax.jit
    def c_single(a, k):
        return jnp.sum(jax.lax.fori_loop(0, k, lambda _, v: M1(v) * 1e-9, a))

    lev0 = M1.levels[0]
    shape1 = (
        lev0.kernels.padded_shape if hasattr(lev0, "kernels") else lev0.interior.shape
    )
    t_single = timeit(c_single, jnp.ones(shape1, jnp.float32))

    mesh = make_solver_mesh(1, (1, 1), devices=jax.devices()[:1])
    op = ShardedPallasStencilOperator.from_domain(dom, mesh, interpret=interpret)
    M2 = ShardedFusedMultigrid.from_operator(op, dom, interpret=interpret)

    @jax.jit
    def c_shard(a, k):
        return jnp.sum(jax.lax.fori_loop(0, k, lambda _, v: M2(v) * 1e-9, a))

    t_shard = timeit(c_shard, jnp.ones(op.padded_shape, jnp.float32))
    ratio = t_single / t_shard
    print(
        f"bench shard: n={n} fused V-cycle single-chip {t_single*1e3:.3f} ms, "
        f"sharded(1x1 mesh, {len(M2.levels)} fused levels) {t_shard*1e3:.3f} ms, "
        f"per-chip ratio {ratio:.2f}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"sharded_vcycle_per_chip_ms_{n}x{n}",
                "value": t_shard * 1e3,
                "unit": "ms",
                # target: sharded per-chip >= 90% of single-chip throughput
                "vs_baseline": ratio / 0.9,
            }
        )
    )


def _enable_compile_cache() -> None:
    """Opt-in persistent compilation cache (ISTPU_COMPILE_CACHE=1).

    The official bench runs in a fresh process, so every program recompiles
    through the tunnel's remote compile server — whose latency varies from
    seconds to >15 min per program on bad days (measured 2026-08-19, same
    program: 3.8 s → 907 s across one morning). A warm on-disk cache makes
    the wall immune to that variance. Off by default until the axon
    plugin's executable-deserialize path is verified fast; flip the default
    once tools/test_compile_cache.py shows a hit beats a recompile."""
    if os.environ.get("ISTPU_COMPILE_CACHE", "0") in ("0", "off", ""):
        return
    import jax

    cache_dir = os.environ.get("ISTPU_COMPILE_CACHE_DIR") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        print(f"bench: compile cache at {cache_dir}", file=sys.stderr)
    except Exception as e:  # noqa: BLE001 — cache is an optimization only
        print(f"bench: compile cache unavailable: {e}", file=sys.stderr)


def _run_mode() -> None:
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon sitecustomize pre-sets jax_platforms at interpreter start,
        # so the env var alone would be silently ignored
        jax.config.update("jax_platforms", "cpu")
    _enable_compile_cache()
    _device_probe()
    import jax.numpy as jnp

    from iterative_solvers_tpu.core.domain import Domain2D
    from iterative_solvers_tpu.ops.stencil import StencilOperator
    from iterative_solvers_tpu.kernels.stencil_pallas import PallasStencilOperator

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    n = int(os.environ.get("BENCH_N", "8192" if on_tpu else "256"))
    mode = os.environ.get("BENCH_MODE", "solve")
    if mode == "cg":
        _bench_cg_fused(n)
        return
    if mode == "solve":
        _bench_solve(n, on_tpu)
        return
    if mode == "3d":
        _bench_solve_3d(int(os.environ.get("BENCH_N_3D", "512" if on_tpu else "32")))
        return
    if mode == "csr":
        _bench_csr_vs_matrix_free(int(os.environ.get("BENCH_N_CSR", "1024" if on_tpu else "128")))
        return
    if mode == "precond":
        _bench_precond(int(os.environ.get("BENCH_N_PRECOND", "4096" if on_tpu else "128")))
        return
    if mode == "scale":
        _bench_scaling()
        return
    if mode == "shard":
        _bench_sharded_fast_path(n if on_tpu else 512)
        return

    dom = Domain2D(nx=n, ny=n)
    # block_rows=256 is the measured sweet spot of the in-place kernel; the
    # operator's padding follows the block size
    op = PallasStencilOperator.from_domain(dom, block_rows=256 if on_tpu else None)
    nnz = StencilOperator.from_domain(dom).nnz()
    n_grid = (n + 1) * (n + 1)

    if on_tpu:
        # The roofline path: donated-input SpMV writing in place (the
        # aliased ~2x-bandwidth mode of this HBM; side-buffer halo staging
        # makes it race-free — kernels/stencil_pipelined.py). The per-apply
        # scale keeping iterated values finite is folded into the kernel
        # epilogue so the chain is pure SpMV.
        from iterative_solvers_tpu.kernels.stencil_pipelined import (
            pallas_stencil_apply_inplace,
        )

        cd, cx, cy = op.coeffs

        @jax.jit
        def chain(a, k):
            return jnp.sum(
                jax.lax.fori_loop(
                    0,
                    k,
                    lambda _, v: pallas_stencil_apply_inplace(
                        v, nx=op.nx, ny=op.ny, cd=cd, cx=cx, cy=cy,
                        block_rows=op.block_rows, mask_mode=op.mask_mode,
                        scale=7e-6,
                    ),
                    a,
                )
            )

    else:

        @jax.jit
        def chain(a, k):
            # scale each apply so values stay finite across iterations; the
            # multiply fuses into the kernel epilogue
            y = jax.lax.fori_loop(0, k, lambda _, v: op(v) * 7e-6, a)
            return jnp.sum(y)

    x = jnp.ones(op.padded_shape, jnp.float32)
    float(chain(x, jnp.asarray(2)))  # compile + warm

    def run(k: int) -> float:
        t0 = time.perf_counter()
        float(chain(x, jnp.asarray(k)))
        return time.perf_counter() - t0

    # Calibrate so each measurement is long enough that the two-point
    # difference beats dispatch/tunnel noise, even on tiny grids.
    per_est = max(run(8) / 8, 1e-7)
    k_lo = max(8, int(0.15 / per_est))
    k_hi = 4 * k_lo
    per_apply = -1.0
    for _ in range(4):  # retry with more reps if noise still wins
        t_lo = min(run(k_lo) for _ in range(3))
        t_hi = min(run(k_hi) for _ in range(3))
        per_apply = (t_hi - t_lo) / (k_hi - k_lo)
        if per_apply > 0:
            break
        k_lo, k_hi = k_hi, 4 * k_hi

    nnz_per_s = nnz / per_apply
    bw = _hbm_bandwidth_bytes(getattr(dev, "device_kind", ""))
    roofline_nnz_per_s = nnz * bw / (9.0 * n_grid)
    baseline = 0.7 * roofline_nnz_per_s

    print(
        f"bench: {getattr(dev, 'device_kind', dev.platform)} n={n} "
        f"block_rows={op.block_rows} t={per_apply*1e3:.3f} ms/apply, "
        f"{nnz_per_s/1e9:.1f} Gnnz/s, 0.7*roofline {baseline/1e9:.1f} Gnnz/s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"stencil_spmv_nnz_per_s_{n}x{n}",
                "value": nnz_per_s,
                "unit": "nnz/s",
                "vs_baseline": nnz_per_s / baseline,
            }
        )
    )


if __name__ == "__main__":
    main()
