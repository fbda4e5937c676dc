"""Preconditioned CG tests."""

import numpy as np
import pytest

from iterative_solvers_tpu.api import DirichletSolver
from iterative_solvers_tpu.core.domain import Domain2D
from iterative_solvers_tpu.core.problem import PoissonProblem
from iterative_solvers_tpu.ops.stencil import StencilOperator
from iterative_solvers_tpu.solvers.cg import CGOptions, cg_solve
from iterative_solvers_tpu.solvers.precond import (
    ChebyshevPreconditioner,
    JacobiPreconditioner,
    make_preconditioner,
    spectral_bounds,
)
from iterative_solvers_tpu.solvers.stopping import StopConfig


def _setup(n=48):
    dom = Domain2D(nx=n, ny=n)
    prob = PoissonProblem.manufactured(dom)
    return dom, StencilOperator.from_domain(dom), prob.rhs_field()


def test_spectral_bounds_enclose_spectrum():
    from iterative_solvers_tpu.ops.sparse import assemble_dense

    dom = Domain2D(nx=12, ny=12)
    lo, hi = spectral_bounds(dom)
    eigs = np.linalg.eigvalsh(assemble_dense(dom))
    assert lo <= eigs.min() and eigs.max() <= hi < 0


def test_jacobi_preserves_iterates():
    """Constant diagonal ⇒ Jacobi is a scalar scaling ⇒ identical CG path."""
    dom, op, b = _setup(24)
    stop = StopConfig(eps_precision=-1, eps_residual=1e-8, max_iterations=5000)
    plain = cg_solve(op, b, options=CGOptions(stop=stop))
    jac = cg_solve(
        op,
        b,
        options=CGOptions(stop=stop, preconditioner=JacobiPreconditioner.from_operator(op, dom)),
    )
    assert jac.converged
    assert abs(jac.iterations - plain.iterations) <= 1
    np.testing.assert_allclose(np.asarray(jac.x), np.asarray(plain.x), rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("degree", [2, 4, 8])
def test_chebyshev_accelerates(degree):
    dom, op, b = _setup(48)
    stop = StopConfig(eps_precision=-1, eps_residual=1e-8, max_iterations=20000)
    plain = cg_solve(op, b, options=CGOptions(stop=stop))
    cheb = cg_solve(
        op,
        b,
        options=CGOptions(
            stop=stop,
            preconditioner=ChebyshevPreconditioner.from_domain(op, dom, degree),
        ),
    )
    assert cheb.converged
    # degree-m Chebyshev cuts the iteration count substantially (the exact
    # factor depends on how tight the spectral bounds are)
    expected_gain = {2: 1.5, 4: 2.5, 8: 4.0}[degree]
    assert cheb.iterations < plain.iterations / expected_gain
    np.testing.assert_allclose(np.asarray(cheb.x), np.asarray(plain.x), rtol=1e-6, atol=1e-8)


def test_facade_preconditioner():
    s = DirichletSolver(
        nx=32,
        ny=32,
        preconditioner="chebyshev:4",
        stop=StopConfig(eps_precision=-1, eps_residual=1e-7),
    )
    res = s.solve()
    assert res.converged
    s_plain = DirichletSolver(nx=32, ny=32, stop=StopConfig(eps_precision=-1, eps_residual=1e-7))
    res_plain = s_plain.solve()
    assert res.iterations < res_plain.iterations
    np.testing.assert_allclose(res.solution, res_plain.solution, rtol=1e-5, atol=1e-7)


def test_make_preconditioner_errors():
    dom, op, _ = _setup(8)
    with pytest.raises(ValueError):
        make_preconditioner("ilu", op, dom)
