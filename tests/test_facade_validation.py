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
