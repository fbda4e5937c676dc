"""DirichletSolver configuration-validation matrix.

Round-1 VERDICT: unsupported option combinations used to surface as raw shape
errors deep in the solver (e.g. operator='sparse' + preconditioner='mg').
Every constructor-reachable combination must now either be rejected at
__init__ with an actionable ValueError, or solve a tiny problem end-to-end.
"""

import itertools

import pytest

from iterative_solvers_tpu.api import DirichletSolver
from iterative_solvers_tpu.core.domain import Domain3D
from iterative_solvers_tpu.solvers.stopping import StopConfig

OPERATORS = ("stencil", "sparse", "pallas", "fused")
PRECONDITIONERS = (None, "jacobi", "chebyshev:2", "mg")
PRECISIONS = (None, "mixed")
DIMS = ("2d", "3d")

# A tiny stop config so every valid combo solves in well under a second.
STOP = StopConfig(max_iterations=12).disable_all_but_iterations()


def _expect_valid(operator, precond, precision, dim):
    """The supported-combination predicate (the validation contract)."""
    if dim == "3d" and operator == "fused":
        return False
    if precond == "mg" and operator == "sparse":
        return False
    if operator == "fused" and precond in ("jacobi", "chebyshev:2"):
        return False
    if precision == "mixed" and operator != "stencil":
        return False
    return True


@pytest.mark.parametrize(
    "operator,precond,precision,dim",
    list(itertools.product(OPERATORS, PRECONDITIONERS, PRECISIONS, DIMS)),
)
def test_combo_matrix(operator, precond, precision, dim):
    kwargs = dict(
        operator=operator,
        preconditioner=precond,
        precision=precision,
        stop=STOP,
    )
    if dim == "3d":
        kwargs["domain"] = Domain3D(nx=8, ny=8, nz=8)
    else:
        kwargs["nx"] = kwargs["ny"] = 8

    if not _expect_valid(operator, precond, precision, dim):
        with pytest.raises(ValueError):
            DirichletSolver(**kwargs)
        return

    s = DirichletSolver(**kwargs)
    res = s.solve(record_history=False)
    # must complete without shape/precision errors; 'mixed' reports inner
    # iterations summed over refinement outers, so allow a few multiples
    assert 0 < res.iterations <= 4 * STOP.max_iterations
    assert res.solution.size > 0


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(operator="nope"),
        dict(beta_kind="pr"),
        dict(operator="fused", beta_kind="fr"),
        dict(preconditioner="mg:-1"),
        dict(preconditioner="chebyshev:x"),
        dict(preconditioner="jacobi:3"),
        dict(preconditioner="ssor"),
        dict(precision="half"),
    ],
)
def test_bad_options_rejected_at_init(kwargs):
    with pytest.raises(ValueError):
        DirichletSolver(nx=8, ny=8, **kwargs)


def test_mesh_operator_validation():
    import jax

    from iterative_solvers_tpu.parallel import make_solver_mesh

    mesh = make_solver_mesh(devices=jax.devices())
    # sparse stays rejected; 'pallas'/'fused' are the round-3 sharded fast path
    with pytest.raises(ValueError):
        DirichletSolver(nx=8, ny=8, operator="sparse", mesh=mesh)
    DirichletSolver(nx=8, ny=8, operator="pallas", mesh=mesh)
    DirichletSolver(nx=8, ny=8, operator="fused", mesh=mesh)
    # the sharded fused engine is 2D-only
    from iterative_solvers_tpu.core.domain import Domain3D

    with pytest.raises(ValueError, match="2D-only"):
        DirichletSolver(
            domain=Domain3D(nx=8, ny=8, nz=8), operator="fused", mesh=mesh
        )


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(outer="f32"),  # unknown value
        dict(outer="ff"),  # ff without precision='mixed'
        dict(outer="ff", precision="mixed", operator="pallas"),  # no mesh
    ],
)
def test_outer_option_rejected_at_init(kwargs):
    with pytest.raises(ValueError):
        DirichletSolver(nx=8, ny=8, **kwargs)


def test_outer_ff_mesh_rejected():
    import jax

    from iterative_solvers_tpu.parallel import make_solver_mesh

    mesh = make_solver_mesh(devices=jax.devices())
    with pytest.raises(ValueError, match="single-chip"):
        DirichletSolver(
            nx=8, ny=8, operator="pallas", precision="mixed",
            preconditioner="mg", mesh=mesh, outer="ff",
        )


def test_outer_ff_facade_solve_matches_f64():
    """outer='ff' forces the one-dispatch device-IR ladder even on the CPU
    backend (api.solve: the ff arithmetic is backend-agnostic), so the
    facade ff path is exercised end-to-end by the CPU suite. It must land
    the same converged answer as the default host ladder."""
    from iterative_solvers_tpu.solvers.stopping import StopConfig

    stop = StopConfig(
        eps_precision=-1, eps_residual=-1, eps_relative=1e-8,
        max_iterations=10000,
    )
    kw = dict(nx=16, ny=16, precision="mixed", preconditioner="mg", stop=stop)
    res_ff = DirichletSolver(outer="ff", **kw).solve(record_history=False)
    res_64 = DirichletSolver(outer="f64", **kw).solve(record_history=False)
    assert res_ff.converged and res_64.converged
    # both land at the discretization error; the iterates differ only at the
    # double-f32 ladder floor (~1e-8 relative at this size)
    assert res_ff.error_norm == pytest.approx(res_64.error_norm, rel=1e-5)
    import numpy as np

    assert np.max(
        np.abs(np.asarray(res_ff.solution) - np.asarray(res_64.solution))
    ) < 1e-6 * np.max(np.abs(np.asarray(res_64.solution)))


def test_outer_ff_rejects_live_callback():
    s = DirichletSolver(
        nx=8, ny=8, precision="mixed", preconditioner="mg", outer="ff",
        stop=STOP,
    )
    with pytest.raises(RuntimeError, match="callback"):
        s.solve(callback=lambda *a: None)
