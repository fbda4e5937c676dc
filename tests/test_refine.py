"""Mixed-precision iterative-refinement tests (solvers/refine.py).

Contract: f32 inner MG-PCG + f64 outer residual reaches TRUE residuals far
below the f32 stagnation floor, with only a handful of outer steps.
"""

import math

import numpy as np
import pytest
import jax.numpy as jnp

from iterative_solvers_tpu.api import DirichletSolver
from iterative_solvers_tpu.core.domain import Domain2D
from iterative_solvers_tpu.core.problem import PoissonProblem
from iterative_solvers_tpu.ops.stencil import StencilOperator
from iterative_solvers_tpu.solvers.cg import CGOptions, cg_solve
from iterative_solvers_tpu.solvers.multigrid import MultigridPreconditioner
from iterative_solvers_tpu.solvers.refine import refined_solve
from iterative_solvers_tpu.solvers.stopping import StopConfig, StopReason


def _setup(n):
    dom = Domain2D(nx=n, ny=n)
    prob = PoissonProblem.manufactured(dom)
    op = StencilOperator.from_domain(dom)
    return dom, prob, op


def test_refined_beats_f32_floor():
    """Plain f32 CG cannot reach a true residual of 1e-6 at 64² (values scale
    with 1/h² ≈ 1.6e4); refinement gets there in a few outer steps."""
    dom, prob, op = _setup(64)
    b64 = prob.rhs_field(jnp.float64)
    M = MultigridPreconditioner.from_domain(dom)
    res = refined_solve(
        op,
        op,
        b64,
        u_true=prob.true_solution_field(jnp.float64),
        stop=StopConfig(eps_precision=-1, eps_residual=1e-6, max_iterations=10000),
        preconditioner=M,
    )
    assert res.converged and res.reason == StopReason.RESIDUAL
    # verify on the actual f64 true residual, independently
    r_true = float(jnp.max(jnp.abs(b64 - op(res.x))))
    assert r_true < 1e-6
    assert res.outer_iterations <= 6
    assert res.iterations <= 80  # total inner f32 iterations


def test_refined_reaches_1e9():
    dom, prob, op = _setup(32)
    b64 = prob.rhs_field(jnp.float64)
    res = refined_solve(
        op,
        op,
        b64,
        stop=StopConfig(eps_precision=-1, eps_residual=1e-9, max_iterations=10000),
        preconditioner=MultigridPreconditioner.from_domain(dom),
    )
    assert res.converged
    assert float(jnp.max(jnp.abs(b64 - op(res.x)))) < 1e-9


def test_refined_no_preconditioner():
    dom, prob, op = _setup(32)
    b64 = prob.rhs_field(jnp.float64)
    res = refined_solve(
        op,
        op,
        b64,
        stop=StopConfig(eps_precision=-1, eps_residual=1e-6, max_iterations=10000),
    )
    assert res.converged
    assert float(jnp.max(jnp.abs(b64 - op(res.x)))) < 1e-6


def test_refined_precision_criterion():
    dom, prob, op = _setup(32)
    b64 = prob.rhs_field(jnp.float64)
    res = refined_solve(
        op,
        op,
        b64,
        stop=StopConfig(eps_precision=1e-8, eps_residual=-1, max_iterations=10000),
        preconditioner=MultigridPreconditioner.from_domain(dom),
    )
    assert res.converged and res.reason == StopReason.PRECISION


def test_refined_interrupt():
    dom, prob, op = _setup(32)
    b64 = prob.rhs_field(jnp.float64)
    calls = {"n": 0}

    def stop_requested():
        calls["n"] += 1
        return calls["n"] > 1  # allow exactly one outer step

    res = refined_solve(
        op,
        op,
        b64,
        stop=StopConfig(eps_precision=-1, eps_residual=1e-12, max_iterations=10000),
        preconditioner=MultigridPreconditioner.from_domain(dom),
        stop_requested=stop_requested,
    )
    assert not res.converged and res.reason == StopReason.INTERRUPTED
    assert res.outer_iterations == 1


def test_refined_callback_protocol():
    dom, prob, op = _setup(32)
    b64 = prob.rhs_field(jnp.float64)
    seen = []
    res = refined_solve(
        op,
        op,
        b64,
        u_true=prob.true_solution_field(jnp.float64),
        stop=StopConfig(eps_precision=-1, eps_residual=1e-6, max_iterations=10000),
        preconditioner=MultigridPreconditioner.from_domain(dom),
        callback=lambda k, p, r, e: seen.append((k, p, r, e)),
    )
    assert seen[0][0] == 0 and math.isinf(seen[0][1])
    ks = [s[0] for s in seen]
    assert ks == sorted(ks) and ks[-1] == res.iterations
    rs = [s[2] for s in seen]
    assert rs[-1] < 1e-6 < rs[0]


def test_refined_rejects_low_precision_b():
    dom, prob, op = _setup(16)
    with pytest.raises(ValueError, match="lo_dtype"):
        refined_solve(op, op, prob.rhs_field(jnp.float32))


def test_facade_mixed_precision():
    s = DirichletSolver(
        nx=64,
        ny=64,
        preconditioner="mg",
        precision="mixed",
        stop=StopConfig(eps_precision=-1, eps_residual=1e-6, max_iterations=10000),
    )
    res = s.solve(record_history=False)
    assert res.converged
    # SolverResults recomputes the residual from scratch in f64
    assert res.residual_norm < 1e-6
    assert res.error_norm < 1e-3  # discretization-bound


def test_facade_mixed_requires_stencil():
    with pytest.raises(ValueError, match="stencil"):
        DirichletSolver(nx=16, ny=16, precision="mixed", operator="sparse")


def test_refined_with_fused_inner_engine():
    # inner_solve_fn hook: f32 inners run the fused Pallas PCG; the escalated
    # f64 polish falls back to the standard path. Result must meet the same
    # true-residual criterion as the plain configuration.
    from iterative_solvers_tpu.kernels.cg_fused import fused_cg_solve
    from iterative_solvers_tpu.kernels.stencil_pallas import PallasStencilOperator
    from iterative_solvers_tpu.solvers.multigrid import (
        MultigridPreconditioner,
        PaddedPreconditioner,
    )

    dom = Domain2D(nx=32, ny=32)
    prob = PoissonProblem.manufactured(dom)
    op = StencilOperator.from_domain(dom)
    b64 = prob.rhs_field(jnp.float64)
    M = MultigridPreconditioner.from_domain(dom)
    pop = PallasStencilOperator.from_domain(dom)
    Mp = PaddedPreconditioner(inner=M, padded_op=pop)
    stop = StopConfig(
        eps_precision=-1, eps_residual=-1, eps_relative=1e-10, max_iterations=10000
    )

    def fused_inner(r32, opts):
        return fused_cg_solve(
            pop, r32, options=CGOptions(stop=opts.stop, preconditioner=Mp)
        )

    res = refined_solve(
        op, op, b64, stop=stop, preconditioner=M, inner_solve_fn=fused_inner
    )
    assert res.converged
    rel = res.residual_norm / res.initial_residual_norm
    assert rel < 1e-10


def test_fused_refined_solve_device_loop():
    # The whole-IR-on-device path must meet the same true-residual criteria
    # as the host-driven loop (interpret-mode kernels on CPU).
    from iterative_solvers_tpu.kernels.stencil_pallas import PallasStencilOperator
    from iterative_solvers_tpu.solvers.multigrid import (
        MultigridPreconditioner,
        PaddedPreconditioner,
    )
    from iterative_solvers_tpu.solvers.refine import fused_refined_solve

    dom = Domain2D(nx=32, ny=32)
    prob = PoissonProblem.manufactured(dom)
    b64 = prob.rhs_field(jnp.float64)
    u64 = prob.true_solution_field(jnp.float64)
    pop = PallasStencilOperator.from_domain(dom)
    M = MultigridPreconditioner.from_domain(dom)
    Mp = PaddedPreconditioner(inner=M, padded_op=pop)
    stop = StopConfig(
        eps_precision=-1, eps_residual=-1, eps_relative=1e-9, max_iterations=10000
    )
    res = fused_refined_solve(pop, Mp, b64, u_true=u64, stop=stop)
    assert res.converged and res.reason == StopReason.RELATIVE_RESIDUAL
    assert res.x.shape == dom.grid_shape
    rel = res.residual_norm / res.initial_residual_norm
    assert rel < 1e-9
    # true residual cross-check against a fresh f64 apply
    op = StencilOperator.from_domain(dom)
    r = b64 - op(jnp.asarray(res.x))
    assert float(jnp.linalg.norm(r)) / res.initial_residual_norm < 1e-9
    assert res.outer_iterations >= 2 and res.iterations > 0


def test_fused_refined_solve_max_norm_criterion():
    from iterative_solvers_tpu.kernels.stencil_pallas import PallasStencilOperator
    from iterative_solvers_tpu.solvers.multigrid import (
        MultigridPreconditioner,
        PaddedPreconditioner,
    )
    from iterative_solvers_tpu.solvers.refine import fused_refined_solve

    dom = Domain2D(nx=16, ny=16)
    prob = PoissonProblem.manufactured(dom)
    b64 = prob.rhs_field(jnp.float64)
    pop = PallasStencilOperator.from_domain(dom)
    Mp = PaddedPreconditioner(
        inner=MultigridPreconditioner.from_domain(dom), padded_op=pop
    )
    stop = StopConfig(eps_precision=-1, eps_residual=1e-5, max_iterations=10000)
    res = fused_refined_solve(pop, Mp, b64, stop=stop)
    assert res.converged and res.reason == StopReason.RESIDUAL
    assert res.residual_max < 1e-5


def test_device_refined_solve_generic_3d():
    # Operator-agnostic one-dispatch refinement on a 3D box with the jnp
    # V-cycle preconditioner.
    from iterative_solvers_tpu.core.domain import Domain3D
    from iterative_solvers_tpu.solvers.refine import device_refined_solve

    dom = Domain3D(nx=16, ny=16, nz=16)
    prob = PoissonProblem.manufactured(dom)
    b64 = prob.rhs_field(jnp.float64)
    u64 = prob.true_solution_field(jnp.float64)
    op = StencilOperator.from_domain(dom)
    M = MultigridPreconditioner.from_domain(dom)
    stop = StopConfig(
        eps_precision=-1, eps_residual=-1, eps_relative=1e-9, max_iterations=10000
    )
    res = device_refined_solve(op, op, b64, u_true=u64, stop=stop, preconditioner=M)
    assert res.converged and res.reason == StopReason.RELATIVE_RESIDUAL
    rel = res.residual_norm / res.initial_residual_norm
    assert rel < 1e-9
    r = b64 - op(jnp.asarray(res.x))
    assert float(jnp.linalg.norm(r)) / res.initial_residual_norm < 1e-9


def test_device_refined_solve_no_preconditioner():
    from iterative_solvers_tpu.solvers.refine import device_refined_solve

    dom = Domain2D(nx=16, ny=16)
    prob = PoissonProblem.manufactured(dom)
    b64 = prob.rhs_field(jnp.float64)
    op = StencilOperator.from_domain(dom)
    stop = StopConfig(eps_precision=-1, eps_residual=-1, eps_relative=1e-8,
                      max_iterations=10000)
    res = device_refined_solve(op, op, b64, stop=stop)
    assert res.converged
    assert res.residual_norm / res.initial_residual_norm < 1e-8


def test_device_ir_precision_only_stop_keeps_tight_inner_tol():
    # Review regression: with neither relative nor residual criteria enabled,
    # the traced adaptive tolerance must fall back to inner_rel_tol (host
    # semantics), not saturate at the 0.1 clip ceiling — which made inner
    # solves 1000x looser and wasted outers.
    from iterative_solvers_tpu.kernels.stencil_pallas import PallasStencilOperator
    from iterative_solvers_tpu.solvers.multigrid import (
        MultigridPreconditioner,
        PaddedPreconditioner,
    )
    from iterative_solvers_tpu.solvers.refine import fused_refined_solve

    dom = Domain2D(nx=16, ny=16)
    prob = PoissonProblem.manufactured(dom)
    b64 = prob.rhs_field(jnp.float64)
    pop = PallasStencilOperator.from_domain(dom)
    Mp = PaddedPreconditioner(
        inner=MultigridPreconditioner.from_domain(dom), padded_op=pop
    )
    stop = StopConfig(eps_precision=1e-10, eps_residual=-1, max_iterations=10000)
    res = fused_refined_solve(pop, Mp, b64, stop=stop)
    assert res.converged and res.reason == StopReason.PRECISION
    # each outer contracts ~inner_rel_tol (1e-4): reaching |dx|_inf 1e-10
    # from O(1) takes only a few outers when the tolerance is tight
    assert res.outer_iterations <= 5


def test_device_ir_emits_convergence_history():
    """Per-outer history rides the packed stats fetch of the device-IR loop
    (round-3 VERDICT item 3): the fastest path keeps observability."""
    import jax.numpy as jnp

    from iterative_solvers_tpu.core.domain import Domain2D
    from iterative_solvers_tpu.core.problem import PoissonProblem
    from iterative_solvers_tpu.kernels.stencil_pallas import PallasStencilOperator
    from iterative_solvers_tpu.solvers.multigrid import (
        MultigridPreconditioner,
        PaddedPreconditioner,
    )
    from iterative_solvers_tpu.solvers.refine import fused_refined_solve

    dom = Domain2D(nx=64, ny=64)
    prob = PoissonProblem.manufactured(dom)
    pop = PallasStencilOperator.from_domain(dom)
    M = MultigridPreconditioner.from_domain(dom, fuse=False)
    Mp = PaddedPreconditioner(inner=M, padded_op=pop)
    stop = StopConfig(
        eps_precision=-1, eps_residual=-1, eps_exact_error=-1,
        eps_relative=1e-10, max_iterations=10000,
    )
    res = fused_refined_solve(pop, Mp, prob.rhs_field(jnp.float64), stop=stop)
    h = res.history
    # one row per outer plus the initial state row — same convention as the
    # host refined_solve path (consumers rely on ONE shape)
    assert h is not None and h.shape == (res.outer_iterations + 1, 5)
    assert h[0, 0] == 0 and h[0, 1] == np.inf
    assert (np.diff(h[:, 0]) > 0).all()  # cumulative inner iterations
    assert h[-1, 2] <= h[0, 2]  # |r|_inf decreases
    # the final history row agrees with the result's scalar fields
    assert h[-1, 0] == res.iterations
    assert h[-1, 2] == pytest.approx(res.residual_max, rel=1e-12)


def test_refined_solve_history_rows():
    from iterative_solvers_tpu.core.domain import Domain2D
    from iterative_solvers_tpu.core.problem import PoissonProblem
    from iterative_solvers_tpu.ops.stencil import StencilOperator
    from iterative_solvers_tpu.solvers.multigrid import MultigridPreconditioner
    from iterative_solvers_tpu.solvers.refine import refined_solve

    dom = Domain2D(nx=32, ny=32)
    prob = PoissonProblem.manufactured(dom)
    A = StencilOperator.from_domain(dom)
    res = refined_solve(
        A, A, prob.rhs_field(),
        stop=StopConfig(eps_precision=-1, eps_residual=-1, eps_exact_error=-1,
                        eps_relative=1e-8, max_iterations=10000),
        preconditioner=MultigridPreconditioner.from_domain(dom, fuse=False),
    )
    # one row per outer plus the initial state row
    assert res.history.shape == (res.outer_iterations + 1, 5)
    assert res.history[0, 0] == 0


def test_join_history_drops_duplicate_warm_start_row():
    """The escalated continuation's row 0 is the warm-start state the device
    history already ends with — joining must not duplicate the iteration
    index or inject an inf precision row mid-series."""
    from iterative_solvers_tpu.solvers.refine import _join_history

    dev = np.array([[0, np.inf, 1.0, 1.0, 1.0],
                    [4, 1e-3, 1e-2, 1e-2, 1e-2]])
    cont = np.array([[0, np.inf, 1e-2, 1e-2, 1e-2],
                     [3, 1e-6, 1e-5, 1e-5, 1e-5]])
    j = _join_history(dev, cont, 4)
    assert j.shape == (3, 5)
    assert (np.diff(j[:, 0]) > 0).all()
    assert np.isfinite(j[1:, 1]).all()  # inf only in the initial row
    assert j[-1, 0] == 7
    # degenerate ends
    only_cont = _join_history(None, cont, 0)
    assert only_cont.shape == cont.shape and only_cont[0, 0] == 0
    assert _join_history(dev, None, 4) is dev


def test_facade_mixed_produces_convergence_plot(tmp_path):
    from iterative_solvers_tpu import viz
    from iterative_solvers_tpu.api import DirichletSolver

    s = DirichletSolver(
        nx=32, ny=32, preconditioner="mg", precision="mixed",
        stop=StopConfig(eps_precision=-1, eps_residual=1e-6, max_iterations=10000),
    )
    res = s.solve(record_history=False)
    assert res.history is not None
    out = tmp_path / "conv.png"
    viz.convergence_plot(res, str(out))
    assert out.stat().st_size > 1000


def test_device_refined_solve_ff_matches_f64():
    """ff=True (double-f32 outer, ops/ddf32.py) must track the f64 outer:
    same stop reason, same outer count, true residual verified in f64."""
    from iterative_solvers_tpu.core.domain import Domain3D
    from iterative_solvers_tpu.solvers.refine import device_refined_solve

    dom = Domain3D(nx=16, ny=16, nz=16)
    prob = PoissonProblem.manufactured(dom)
    b64 = prob.rhs_field(jnp.float64)
    u64 = prob.true_solution_field(jnp.float64)
    op = StencilOperator.from_domain(dom)
    M = MultigridPreconditioner.from_domain(dom)
    stop = StopConfig(
        eps_precision=-1, eps_residual=-1, eps_relative=1e-9, max_iterations=10000
    )
    kw = dict(u_true=u64, stop=stop, preconditioner=M)
    res64 = device_refined_solve(op, op, b64, **kw)
    resff = device_refined_solve(op, op, b64, ff=True, **kw)
    assert resff.converged and resff.reason == res64.reason
    assert resff.outer_iterations == res64.outer_iterations
    assert resff.x.dtype == b64.dtype
    # the TRUE f64 residual of the ff result must meet the criterion too
    r = b64 - op(jnp.asarray(resff.x, jnp.float64))
    assert float(jnp.linalg.norm(r)) / resff.initial_residual_norm < 1e-8
    # histories line up row-for-row to f32-pair rounding
    h64, hff = res64.history, resff.history
    assert h64.shape == hff.shape
    np.testing.assert_allclose(hff[:, 4], h64[:, 4], rtol=1e-4)


def test_fused_refined_solve_ff_2d():
    from iterative_solvers_tpu.kernels.stencil_pallas import PallasStencilOperator
    from iterative_solvers_tpu.solvers.multigrid import (
        MultigridPreconditioner,
        PaddedPreconditioner,
    )
    from iterative_solvers_tpu.solvers.refine import fused_refined_solve

    dom = Domain2D(nx=32, ny=32)
    prob = PoissonProblem.manufactured(dom)
    b64 = prob.rhs_field(jnp.float64)
    pop = PallasStencilOperator.from_domain(dom)
    Mp = PaddedPreconditioner(
        inner=MultigridPreconditioner.from_domain(dom), padded_op=pop
    )
    stop = StopConfig(
        eps_precision=-1, eps_residual=-1, eps_relative=1e-9, max_iterations=10000
    )
    res = fused_refined_solve(pop, Mp, b64, stop=stop, ff=True)
    assert res.converged and res.reason == StopReason.RELATIVE_RESIDUAL
    op = StencilOperator.from_domain(dom)
    r = b64 - op(jnp.asarray(res.x, jnp.float64))
    assert float(jnp.linalg.norm(r)) / res.initial_residual_norm < 1e-8


def test_device_refined_solve_ff_fmg_and_max_norm():
    # ff with an FMG warm start and the max-norm RESIDUAL criterion
    from iterative_solvers_tpu.core.domain import Domain3D
    from iterative_solvers_tpu.solvers.refine import device_refined_solve

    dom = Domain3D(nx=16, ny=16, nz=16)
    prob = PoissonProblem.manufactured(dom)
    b64 = prob.rhs_field(jnp.float64)
    op = StencilOperator.from_domain(dom)
    M = MultigridPreconditioner.from_domain(dom).with_fmg(prob)
    stop = StopConfig(eps_precision=-1, eps_residual=1e-6, max_iterations=10000)
    res = device_refined_solve(
        op, op, b64, stop=stop, preconditioner=M, fmg=True, ff=True
    )
    assert res.converged and res.reason == StopReason.RESIDUAL
    r = b64 - op(jnp.asarray(res.x, jnp.float64))
    assert float(jnp.max(jnp.abs(r))) < 1.5e-6  # f32-pair slack on the f64 recheck
