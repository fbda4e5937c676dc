"""Fused Pallas CG engine tests (interpret mode on CPU; measured on TPU at
3.26 ms/iter @ 8192² — see NOTES_PERF.md). The engine must reproduce the
standard MSG path exactly (same iterates at f32 round-off, same stop
behavior) while doing two HBM sweeps per iteration."""

import jax.numpy as jnp
import numpy as np
import pytest

from iterative_solvers_tpu.api import DirichletSolver
from iterative_solvers_tpu.core.domain import Domain2D
from iterative_solvers_tpu.core.problem import PoissonProblem
from iterative_solvers_tpu.kernels.cg_fused import fused_cg_solve
from iterative_solvers_tpu.kernels.stencil_pallas import PallasStencilOperator
from iterative_solvers_tpu.ops.stencil import StencilOperator
from iterative_solvers_tpu.solvers.cg import CGOptions, cg_solve
from iterative_solvers_tpu.solvers.stopping import StopConfig, StopReason


def _setup(n=16, block_rows=8):
    dom = Domain2D(nx=n, ny=n)
    prob = PoissonProblem.manufactured(dom)
    return (
        dom,
        PallasStencilOperator.from_domain(dom, block_rows=block_rows),
        StencilOperator.from_domain(dom),
        prob.rhs_field(jnp.float32),
        prob.true_solution_field(jnp.float32),
    )


def test_fused_matches_standard_iterates():
    dom, pal, std, b, u = _setup()
    stop = StopConfig(max_iterations=20).disable_all_but_iterations()
    rf = fused_cg_solve(pal, b, u_true=u, options=CGOptions(stop=stop))
    rs = cg_solve(std, b, u_true=u, options=CGOptions(stop=stop))
    assert rf.iterations == rs.iterations == 20
    x_f, x_s = np.asarray(rf.x), np.asarray(rs.x)
    np.testing.assert_allclose(x_f, x_s, rtol=2e-6, atol=2e-5)
    assert rf.residual_max == pytest.approx(rs.residual_max, rel=2e-5)
    assert rf.precision_max == pytest.approx(rs.precision_max, rel=2e-5)
    assert rf.error_max == pytest.approx(rs.error_max, rel=2e-4)


@pytest.mark.parametrize(
    "stop,expected",
    [
        (StopConfig(eps_precision=-1, eps_residual=5e-2, max_iterations=5000), StopReason.RESIDUAL),
        (StopConfig(eps_precision=1e-3, eps_residual=-1, max_iterations=5000), StopReason.PRECISION),
        (StopConfig(eps_precision=-1, eps_residual=-1, eps_relative=1e-4, max_iterations=5000), StopReason.RELATIVE_RESIDUAL),
        (StopConfig(max_iterations=7).disable_all_but_iterations(), StopReason.ITERATIONS),
    ],
)
def test_fused_stop_criteria(stop, expected):
    dom, pal, std, b, u = _setup()
    rf = fused_cg_solve(pal, b, options=CGOptions(stop=stop))
    rs = cg_solve(std, b, options=CGOptions(stop=stop))
    assert rf.reason == expected == rs.reason
    assert rf.iterations == rs.iterations


def test_fused_exact_error_stop():
    dom, pal, std, b, u = _setup()
    stop = StopConfig(eps_precision=-1, eps_residual=-1, eps_exact_error=5e-1,
                      max_iterations=5000)
    rf = fused_cg_solve(pal, b, u_true=u, options=CGOptions(stop=stop))
    assert rf.reason == StopReason.EXACT_ERROR
    assert rf.error_max < 5e-1


def test_fused_callbacks_and_interrupt():
    dom, pal, std, b, u = _setup(n=24)
    calls = []
    rf = fused_cg_solve(
        pal,
        b,
        options=CGOptions(
            stop=StopConfig(eps_residual=1e-300, eps_precision=-1, max_iterations=10000),
            callback=lambda k, p, r, e: calls.append(k),
            callback_every=5,
            stop_requested=lambda: len(calls) >= 4,
        ),
    )
    assert calls[0] == 0 and calls[1] == 1
    assert rf.reason == StopReason.INTERRUPTED


def test_fused_facade():
    stop = StopConfig(eps_precision=-1, eps_residual=5e-2, max_iterations=2000)
    rf = DirichletSolver(nx=16, ny=16, operator="fused", stop=stop).solve()
    rs = DirichletSolver(nx=16, ny=16, operator="stencil", stop=stop).solve()
    assert rf.converged and rf.iterations == rs.iterations
    np.testing.assert_allclose(rf.solution, rs.solution, rtol=1e-4, atol=1e-5)
    # fresh-apply residual agrees with the solver's final internal residual
    assert rf.residual_norm == pytest.approx(rf.residual_norm, rel=1e-3)


def test_fused_divergence_reason():
    # Overflowing RHS: ‖r‖² is inf at init, the first iteration's scalars go
    # NaN — the engine must report DIVERGED. Round-1 bug: the chunk fell out
    # of the loop via the r_norm2 > 0 guard with reason still ITERATIONS.
    dom, pal, std, b, u = _setup()
    b_huge = jnp.asarray(b, jnp.float32) * jnp.float32(1e30)
    stop = StopConfig(max_iterations=50).disable_all_but_iterations()
    rf = fused_cg_solve(pal, b_huge, options=CGOptions(stop=stop))
    assert rf.reason == StopReason.DIVERGED
    assert not rf.converged


def test_fused_rejects_unsupported():
    dom, pal, std, b, u = _setup()
    with pytest.raises(ValueError):
        fused_cg_solve(pal, b, options=CGOptions(beta_kind="fr"))


def test_fused_rect_domain():
    dom = Domain2D(nx=20, ny=12, shape="rect")
    prob = PoissonProblem.manufactured(dom)
    pal = PallasStencilOperator.from_domain(dom, block_rows=8)
    b = prob.rhs_field(jnp.float32)
    stop = StopConfig(eps_precision=-1, eps_residual=5e-2, max_iterations=2000)
    rf = fused_cg_solve(pal, b, options=CGOptions(stop=stop))
    rs = cg_solve(StencilOperator.from_domain(dom), b, options=CGOptions(stop=stop))
    assert rf.iterations == rs.iterations
    np.testing.assert_allclose(np.asarray(rf.x), np.asarray(rs.x), rtol=1e-4, atol=1e-5)


def test_fused_pcg_matches_standard_pcg():
    # Fused PCG (V-cycle between K2 and the next K1) must reproduce the
    # standard PCG path's iterate sequence at f32 round-off.
    from iterative_solvers_tpu.solvers.multigrid import (
        MultigridPreconditioner,
        PaddedPreconditioner,
    )

    dom, pal, std, b, u = _setup(n=16)
    Mstd = MultigridPreconditioner.from_domain(dom)
    Mpal = PaddedPreconditioner(inner=Mstd, padded_op=pal)
    stop = StopConfig(max_iterations=8).disable_all_but_iterations()
    rf = fused_cg_solve(
        pal, b, u_true=u, options=CGOptions(stop=stop, preconditioner=Mpal)
    )
    rs = cg_solve(std, b, u_true=u, options=CGOptions(stop=stop, preconditioner=Mstd))
    assert rf.iterations == rs.iterations == 8
    np.testing.assert_allclose(np.asarray(rf.x), np.asarray(rs.x), rtol=2e-5, atol=2e-5)
    assert rf.residual_max == pytest.approx(rs.residual_max, rel=1e-3)
    assert rf.precision_max == pytest.approx(rs.precision_max, rel=1e-3)


def test_fused_pcg_converges_and_stops():
    from iterative_solvers_tpu.solvers.multigrid import (
        MultigridPreconditioner,
        PaddedPreconditioner,
    )

    dom, pal, std, b, u = _setup(n=32)
    M = PaddedPreconditioner(
        inner=MultigridPreconditioner.from_domain(dom), padded_op=pal
    )
    stop = StopConfig(
        eps_precision=-1, eps_residual=-1, eps_relative=1e-6, max_iterations=100
    )
    rf = fused_cg_solve(pal, b, options=CGOptions(stop=stop, preconditioner=M))
    assert rf.converged and rf.reason == StopReason.RELATIVE_RESIDUAL
    # MG-PCG is resolution-independent: a handful of iterations, not O(n)
    assert rf.iterations < 20
    rs = cg_solve(
        StencilOperator.from_domain(dom),
        b,
        options=CGOptions(
            stop=stop, preconditioner=MultigridPreconditioner.from_domain(dom)
        ),
    )
    assert rf.iterations == rs.iterations


def test_fused_pcg_facade():
    stop = StopConfig(eps_precision=-1, eps_residual=-1, eps_relative=1e-5,
                      max_iterations=200)
    rf = DirichletSolver(
        nx=16, ny=16, operator="fused", preconditioner="mg", stop=stop
    ).solve()
    assert rf.converged
    rs = DirichletSolver(
        nx=16, ny=16, operator="stencil", preconditioner="mg", stop=stop
    ).solve()
    assert rf.iterations == rs.iterations
    np.testing.assert_allclose(rf.solution, rs.solution, rtol=1e-4, atol=1e-5)
