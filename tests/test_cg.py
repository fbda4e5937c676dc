"""CG solver tests: golden 2-iteration parity with the reference NumPy
harness (reference py_debug.txt, produced by check_debug.py), stop-criterion
semantics, callback cadence, and manufactured-solution convergence."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from iterative_solvers_tpu.core.domain import Domain2D
from iterative_solvers_tpu.core.problem import PoissonProblem
from iterative_solvers_tpu.core import ordering
from iterative_solvers_tpu.ops.sparse import SparseOperator
from iterative_solvers_tpu.ops.stencil import StencilOperator
from iterative_solvers_tpu.solvers.cg import CGOptions, cg_solve
from iterative_solvers_tpu.solvers.stopping import StopConfig, StopReason

# Golden values from the reference debug trace (py_debug.txt:9,17; exact f64
# arithmetic of the recurrence in check.py:28-41, which is algebraically the
# MSG recurrence of msg_solver.cpp:96-169 — see test below).
GOLDEN_X1 = np.array([
    2.257072699072475, 7.248571962926923, 0.07962093761583211,
    2.2548176788469427, 0.018542342265779437, 1.350387933549494,
    0.16390417421062137, 0.15299409062593225, 0.23450782758785524,
    -0.21591189002100344, 0.7598564574300268, 0.033140248486989834,
    -0.0030954717344149245, -0.011005272843177285, -0.030101920543968902,
    0.5859958023389277,
])
GOLDEN_X2 = np.array([
    4.299475689190216, 7.2845816440687114, 1.6165833024997662,
    4.760761619050356, 0.43101095699219427, 2.108998067995631,
    0.1935617810430996, 0.25665835359881073, 0.16026779686626313,
    0.16612208672749215, 1.1914192276152509, 0.0813751361651942,
    0.057604590474169805, 0.060321870601777614, 0.09930790277346979,
    0.7140716250191494,
])
GOLDEN_ALPHA0 = 0.009716035051916759  # py_debug.txt:6


def _run_matrix_free(dom, n_iters, beta_kind="msg"):
    prob = PoissonProblem.manufactured(dom)
    op = StencilOperator.from_domain(dom)
    b = prob.rhs_field()
    opts = CGOptions(
        stop=StopConfig(max_iterations=n_iters).disable_all_but_iterations(),
        beta_kind=beta_kind,
    )
    res = cg_solve(op, b, options=opts)
    return np.asarray(ordering.pack(res.x, dom), np.float64), res


def test_golden_two_iterations_matrix_free():
    """End-to-end: assembly + 2 MSG iterations reproduce py_debug.txt.

    The golden b is printed to 8 decimals in check_debug.py and the 2-step CG
    recurrence amplifies that perturbation by ~1e2-1e3, hence the 1e-4
    tolerances here; the next test uses the exact golden b and matches to
    round-off.
    """
    dom = Domain2D(nx=6, ny=6)
    x1, _ = _run_matrix_free(dom, 1)
    np.testing.assert_allclose(x1, GOLDEN_X1, rtol=1e-5, atol=1e-5)
    x2, _ = _run_matrix_free(dom, 2)
    np.testing.assert_allclose(x2, GOLDEN_X2, rtol=1e-4, atol=1e-4)


def test_golden_two_iterations_exact_b(golden_16x16):
    """With the reference's exact golden RHS, the MSG recurrence matches the
    py_debug.txt trace to round-off. This pins the recurrence itself:
    alpha=(r,z)/(Az,z), beta=|r1|²/(r,z) (msg_solver.cpp:96-169) ==
    check.py's h0=-b negative-definite convention (check.py:28-41)."""
    A_ref, b_ref = golden_16x16
    dom = Domain2D(nx=6, ny=6)
    op = StencilOperator.from_domain(dom)
    b_field = ordering.unpack(jnp.asarray(b_ref), dom)

    opts1 = CGOptions(stop=StopConfig(max_iterations=1).disable_all_but_iterations())
    res1 = cg_solve(op, b_field, options=opts1)
    x1 = np.asarray(ordering.pack(res1.x, dom))
    np.testing.assert_allclose(x1, GOLDEN_X1, rtol=1e-12, atol=1e-12)
    # check.py steps along h0 = -b, we step along z0 = +b: identical iterates,
    # opposite alpha sign. x1 = -alpha0_golden * b.
    np.testing.assert_allclose(x1 / b_ref, -GOLDEN_ALPHA0, rtol=1e-10)

    opts2 = CGOptions(stop=StopConfig(max_iterations=2).disable_all_but_iterations())
    res2 = cg_solve(op, b_field, options=opts2)
    x2 = np.asarray(ordering.pack(res2.x, dom))
    np.testing.assert_allclose(x2, GOLDEN_X2, rtol=1e-11, atol=1e-11)


def test_sparse_path_matches_stencil_path():
    dom = Domain2D(nx=6, ny=6)
    prob = PoissonProblem.manufactured(dom)
    op_s = StencilOperator.from_domain(dom)
    op_m = SparseOperator.from_domain(dom)
    b = prob.rhs_field()
    bc = ordering.pack(b, dom)
    opts = lambda: CGOptions(stop=StopConfig(max_iterations=25).disable_all_but_iterations())
    res_s = cg_solve(op_s, b, options=opts())
    res_m = cg_solve(op_m, bc, options=opts())
    np.testing.assert_allclose(
        np.asarray(ordering.pack(res_s.x, dom)), np.asarray(res_m.x), rtol=1e-9, atol=1e-9
    )


def test_residual_stop_criterion():
    dom = Domain2D(nx=16, ny=16)
    prob = PoissonProblem.manufactured(dom)
    op = StencilOperator.from_domain(dom)
    b = prob.rhs_field()
    opts = CGOptions(
        stop=StopConfig(
            eps_precision=-1, eps_residual=1e-6, eps_exact_error=-1, max_iterations=5000
        )
    )
    res = cg_solve(op, b, options=opts)
    assert res.converged
    assert res.reason == StopReason.RESIDUAL
    assert res.residual_max < 1e-6
    # true residual check with a fresh apply
    r = np.asarray(b - op(res.x))
    assert np.max(np.abs(r)) < 1e-6


def test_precision_stop_and_priority():
    """Precision is checked before residual (msg_solver.cpp:144-162)."""
    dom = Domain2D(nx=16, ny=16)
    prob = PoissonProblem.manufactured(dom)
    op = StencilOperator.from_domain(dom)
    b = prob.rhs_field()
    res = cg_solve(
        op,
        b,
        options=CGOptions(stop=StopConfig(eps_precision=1e-4, eps_residual=1e-300)),
    )
    assert res.reason == StopReason.PRECISION
    assert res.precision_max < 1e-4


def test_exact_error_stop():
    dom = Domain2D(nx=16, ny=16)
    prob = PoissonProblem.manufactured(dom)
    op = StencilOperator.from_domain(dom)
    b = prob.rhs_field()
    u = prob.true_solution_field()
    res = cg_solve(
        op,
        b,
        u_true=u,
        options=CGOptions(
            stop=StopConfig(eps_precision=-1, eps_residual=-1, eps_exact_error=1.0)
        ),
    )
    assert res.reason == StopReason.EXACT_ERROR
    assert res.error_max < 1.0


def test_iteration_limit():
    dom = Domain2D(nx=16, ny=16)
    op = StencilOperator.from_domain(dom)
    b = PoissonProblem.manufactured(dom).rhs_field()
    res = cg_solve(
        op, b, options=CGOptions(stop=StopConfig(max_iterations=7).disable_all_but_iterations())
    )
    assert res.iterations == 7
    assert res.reason == StopReason.ITERATIONS
    assert not res.converged


def test_interrupt():
    """Cooperative stop (reference msg_solver.cpp:82-87 / atomic flag)."""
    dom = Domain2D(nx=32, ny=32)
    op = StencilOperator.from_domain(dom)
    b = PoissonProblem.manufactured(dom).rhs_field()
    calls = []

    def cb(k, prec, rmax, emax):
        calls.append(k)

    res = cg_solve(
        op,
        b,
        options=CGOptions(
            stop=StopConfig(eps_residual=1e-300, eps_precision=-1, max_iterations=100000),
            callback=cb,
            callback_every=10,
            stop_requested=lambda: len(calls) >= 3,
        ),
    )
    assert res.reason == StopReason.INTERRUPTED
    assert not res.converged
    assert res.iterations < 100000


def test_callback_cadence():
    """Reference cadence: iteration 0, 1, every N, final
    (msg_solver.cpp:75-77,172-183,192-195)."""
    dom = Domain2D(nx=16, ny=16)
    op = StencilOperator.from_domain(dom)
    b = PoissonProblem.manufactured(dom).rhs_field()
    calls = []
    res = cg_solve(
        op,
        b,
        options=CGOptions(
            stop=StopConfig(max_iterations=25).disable_all_but_iterations(),
            callback=lambda k, p, r, e: calls.append(k),
            callback_every=10,
        ),
    )
    assert calls[0] == 0 and calls[1] == 1
    assert 10 in calls and 20 in calls
    assert calls[-1] == 25
    # iteration-0 callback reports precision = +inf like the reference's DBL_MAX
    assert res.iterations == 25


def test_relative_residual_mode():
    """MatrixFreeSolver semantics (matrix_free_system.cpp:409): stop on
    ‖r‖₂ < eps·‖r₀‖₂ with Fletcher–Reeves beta."""
    dom = Domain2D(nx=16, ny=16)
    op = StencilOperator.from_domain(dom)
    b = PoissonProblem.manufactured(dom).rhs_field()
    res = cg_solve(
        op,
        b,
        options=CGOptions(
            stop=StopConfig(
                eps_precision=-1, eps_residual=-1, eps_relative=1e-8, max_iterations=5000
            ),
            beta_kind="fr",
        ),
    )
    assert res.reason == StopReason.RELATIVE_RESIDUAL
    assert res.residual_norm < 1e-8 * res.initial_residual_norm


def test_msg_and_fr_betas_agree_in_exact_arithmetic():
    dom = Domain2D(nx=12, ny=12)
    x_msg, _ = _run_matrix_free(dom, 30, "msg")
    x_fr, _ = _run_matrix_free(dom, 30, "fr")
    np.testing.assert_allclose(x_msg, x_fr, rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("n", [8, 16, 32])
def test_manufactured_convergence_order(n):
    """Discretization error shrinks ~O(h²) (method of manufactured solutions,
    the reference's de-facto integration test, SURVEY §4)."""
    dom = Domain2D(nx=n, ny=n)
    prob = PoissonProblem.manufactured(dom)
    op = StencilOperator.from_domain(dom)
    res = cg_solve(
        op,
        prob.rhs_field(),
        u_true=prob.true_solution_field(),
        options=CGOptions(
            stop=StopConfig(eps_precision=-1, eps_residual=1e-8, max_iterations=20000)
        ),
    )
    assert res.converged
    err = res.error_max
    # |u|~e³≈20 on [1,2]²; C·h² with C ~ |∂⁴u| scale
    assert err < 60.0 / n**2


def test_convergence_order_ratio():
    errs = {}
    for n in (8, 16, 32):
        dom = Domain2D(nx=n, ny=n)
        prob = PoissonProblem.manufactured(dom)
        op = StencilOperator.from_domain(dom)
        res = cg_solve(
            op,
            prob.rhs_field(),
            u_true=prob.true_solution_field(),
            options=CGOptions(
                stop=StopConfig(eps_precision=-1, eps_residual=1e-9, max_iterations=20000)
            ),
        )
        errs[n] = res.error_max
    # halving h should cut the error by ~4 (allow re-entrant-corner pollution)
    assert errs[8] / errs[16] > 2.5
    assert errs[16] / errs[32] > 2.5


def test_x0_warm_start():
    dom = Domain2D(nx=12, ny=12)
    prob = PoissonProblem.manufactured(dom)
    op = StencilOperator.from_domain(dom)
    b = prob.rhs_field()
    res0 = cg_solve(
        op, b, options=CGOptions(stop=StopConfig(eps_residual=1e-8, eps_precision=-1))
    )
    # warm start from the solution: should stop immediately-ish
    res1 = cg_solve(
        op,
        b,
        x0=res0.x,
        options=CGOptions(stop=StopConfig(eps_residual=1e-6, eps_precision=-1)),
    )
    assert res1.iterations <= 1


def test_divergence_detection():
    """A breakdown (here: the zero operator ⇒ alpha = rz/0) must stop with
    DIVERGED instead of iterating on NaNs — failure detection the reference
    lacks (SURVEY §5)."""
    import jax.numpy as jnp

    from iterative_solvers_tpu.solvers.stopping import StopReason

    dom = Domain2D(nx=8, ny=8)
    zero_op = StencilOperator(
        interior_arr=jnp.asarray(dom.interior), coeffs=(0.0, 0.0, 0.0)
    )
    b = PoissonProblem.manufactured(dom).rhs_field()
    res = cg_solve(
        zero_op,
        b,
        options=CGOptions(stop=StopConfig(max_iterations=100)),
    )
    assert res.reason == StopReason.DIVERGED
    assert not res.converged
    assert res.iterations <= 2


def test_zero_rhs_short_circuits():
    """b = 0 ⇒ x = 0 is exact; both the silent path (no callback) and the
    interactive path must stop immediately with RESIDUAL instead of 0/0."""
    import jax.numpy as jnp

    from iterative_solvers_tpu.solvers.stopping import StopReason

    dom = Domain2D(nx=8, ny=8)
    op = StencilOperator.from_domain(dom)
    b = jnp.zeros(dom.grid_shape)
    for cb in (None, lambda k, p, r, e: None):
        res = cg_solve(
            op, b, options=CGOptions(stop=StopConfig(max_iterations=50), callback=cb)
        )
        assert res.converged and res.reason == StopReason.RESIDUAL
        assert res.iterations == 0
        assert float(jnp.max(jnp.abs(res.x))) == 0.0


def test_silent_interrupt_before_first_chunk():
    # Round-1 advisor finding (medium): a silent solve (no callback, no
    # history, no init_state) whose stop_requested fires before the first
    # chunk raised UnboundLocalError on the never-synced stats. Must return a
    # well-formed INTERRUPTED result instead.
    dom = Domain2D(nx=8, ny=8)
    prob = PoissonProblem.manufactured(dom)
    op = StencilOperator.from_domain(dom)
    r = cg_solve(
        op,
        prob.rhs_field(jnp.float64),
        options=CGOptions(stop_requested=lambda: True),
    )
    assert r.reason == StopReason.INTERRUPTED
    assert not r.converged
    assert r.iterations == 0
