"""3D (7-point stencil) end-to-end tests — extension per BASELINE.md's
512³ block-partitioned config."""

import jax
import numpy as np
import pytest

from iterative_solvers_tpu.api import DirichletSolver
from iterative_solvers_tpu.core.domain import Domain3D
from iterative_solvers_tpu.core.problem import PoissonProblem
from iterative_solvers_tpu.ops.stencil import StencilOperator
from iterative_solvers_tpu.parallel import (
    ShardedStencilOperator,
    crop_field,
    make_sharded_problem,
    make_solver_mesh,
    shard_field,
)
from iterative_solvers_tpu.solvers.cg import CGOptions, cg_solve
from iterative_solvers_tpu.solvers.stopping import StopConfig, StopReason


def test_facade_3d_solve():
    dom = Domain3D(nx=12, ny=12, nz=12)
    s = DirichletSolver(domain=dom, problem=PoissonProblem.manufactured(dom),
                        stop=StopConfig(eps_precision=-1, eps_residual=1e-7))
    res = s.solve()
    assert res.converged
    assert res.solution.size == 11**3
    assert res.z_coords is not None and res.z_coords.size == 11**3
    # O(h²) discretization error for u = exp(xyz) on [0,1]³
    assert res.error_norm < 3.0 / 12**2
    assert len(res.bounds) == 6
    assert "x 12 intervals" in res.report()


def test_3d_convergence_order():
    errs = {}
    for n in (8, 16):
        dom = Domain3D(nx=n, ny=n, nz=n)
        prob = PoissonProblem.manufactured(dom)
        op = StencilOperator.from_domain(dom)
        res = cg_solve(
            op,
            prob.rhs_field(),
            u_true=prob.true_solution_field(),
            options=CGOptions(stop=StopConfig(eps_precision=-1, eps_residual=1e-9)),
        )
        errs[n] = res.error_max
    assert errs[8] / errs[16] > 3.0  # ~4 expected


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_3d_sharded_matches_local():
    dom = Domain3D(nx=14, ny=14, nz=14)
    mesh = make_solver_mesh(8, (4, 2))
    local = StencilOperator.from_domain(dom)
    sharded = ShardedStencilOperator.from_domain(dom, mesh)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(dom.grid_shape)
    import jax.numpy as jnp

    y_local = np.asarray(local(jnp.asarray(x)))
    y_shard = np.asarray(crop_field(sharded(shard_field(x, mesh)), dom.grid_shape))
    np.testing.assert_allclose(y_shard, y_local, rtol=1e-13, atol=1e-13)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_3d_sharded_cg():
    dom = Domain3D(nx=12, ny=12, nz=12)
    prob = PoissonProblem.manufactured(dom)
    mesh = make_solver_mesh(8, (2, 4))
    op, b, u = make_sharded_problem(prob, mesh)
    stop = StopConfig(eps_precision=-1, eps_residual=1e-7)
    res = cg_solve(op, b, u_true=u, options=CGOptions(stop=stop))
    assert res.converged and res.reason == StopReason.RESIDUAL
    local = cg_solve(
        StencilOperator.from_domain(dom),
        prob.rhs_field(),
        options=CGOptions(stop=stop),
    )
    assert res.iterations == local.iterations
    np.testing.assert_allclose(
        np.asarray(crop_field(res.x, dom.grid_shape)),
        np.asarray(local.x),
        rtol=1e-10,
        atol=1e-10,
    )


def test_3d_results_io_roundtrip(tmp_path):
    from iterative_solvers_tpu import results_io

    dom = Domain3D(nx=8, ny=8, nz=8)
    s = DirichletSolver(domain=dom, problem=PoissonProblem.manufactured(dom),
                        stop=StopConfig(eps_precision=-1, eps_residual=1e-6))
    res = s.solve()
    p = str(tmp_path / "r3d.txt")
    results_io.save_results(p, res)
    loaded, _ = results_io.load_results(p)
    assert loaded.nz == 8 and len(loaded.bounds) == 6
    np.testing.assert_allclose(loaded.solution, res.solution, rtol=1e-15)
    np.testing.assert_allclose(loaded.z_coords, res.z_coords, rtol=1e-15)
