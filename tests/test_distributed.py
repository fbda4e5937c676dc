"""Multi-device tests on a virtual 8-device CPU mesh: the sharded
halo-exchange operator and the distributed CG must be partition-invariant
(bit-for-bit agreement with the single-device path up to float reduction
order)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iterative_solvers_tpu.core.domain import Domain2D
from iterative_solvers_tpu.core.problem import PoissonProblem
from iterative_solvers_tpu.ops.stencil import StencilOperator
from iterative_solvers_tpu.parallel import (
    ShardedStencilOperator,
    crop_field,
    make_sharded_problem,
    make_solver_mesh,
    pad_field,
    shard_field,
)
from iterative_solvers_tpu.solvers.cg import CGOptions, cg_solve
from iterative_solvers_tpu.solvers.stopping import StopConfig, StopReason

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

MESH_SHAPES = [(4, 2), (2, 4), (8, 1), (1, 8), (2, 2)]


@pytest.mark.parametrize("mesh_shape", MESH_SHAPES)
def test_sharded_stencil_matches_local(mesh_shape):
    dom = Domain2D(nx=30, ny=30)  # 31x31 grid: not divisible -> exercises padding
    mesh = make_solver_mesh(n_devices=mesh_shape[0] * mesh_shape[1], shape=mesh_shape)
    local = StencilOperator.from_domain(dom)
    sharded = ShardedStencilOperator.from_domain(dom, mesh)

    rng = np.random.default_rng(0)
    x = rng.standard_normal(dom.grid_shape)
    y_local = np.asarray(local(jnp.asarray(x)))
    y_shard = np.asarray(crop_field(sharded(shard_field(x, mesh)), dom.grid_shape))
    np.testing.assert_allclose(y_shard, y_local, rtol=1e-13, atol=1e-13)


def test_sharded_cg_matches_local():
    dom = Domain2D(nx=30, ny=30)
    prob = PoissonProblem.manufactured(dom)
    stop = StopConfig(eps_precision=-1, eps_residual=1e-6, max_iterations=5000)

    local_res = cg_solve(
        StencilOperator.from_domain(dom),
        prob.rhs_field(),
        u_true=prob.true_solution_field(),
        options=CGOptions(stop=stop),
    )

    mesh = make_solver_mesh(8, (4, 2))
    op, b, u = make_sharded_problem(prob, mesh)
    dist_res = cg_solve(op, b, u_true=u, options=CGOptions(stop=stop))

    assert dist_res.converged and dist_res.reason == StopReason.RESIDUAL
    # identical math up to reduction order => same iteration count in f64
    assert dist_res.iterations == local_res.iterations
    x_local = np.asarray(local_res.x)
    x_dist = np.asarray(crop_field(dist_res.x, dom.grid_shape))
    np.testing.assert_allclose(x_dist, x_local, rtol=1e-10, atol=1e-10)
    assert abs(dist_res.error_max - local_res.error_max) < 1e-10


@pytest.mark.parametrize("mesh_shape", [(4, 2), (1, 8)])
def test_partition_invariance(mesh_shape):
    """Same solve on different mesh factorizations gives the same answer."""
    dom = Domain2D(nx=24, ny=24)
    prob = PoissonProblem.manufactured(dom)
    stop = StopConfig(eps_precision=-1, eps_residual=1e-8, max_iterations=5000)
    mesh = make_solver_mesh(8, mesh_shape)
    op, b, u = make_sharded_problem(prob, mesh)
    res = cg_solve(op, b, u_true=u, options=CGOptions(stop=stop))
    ref = cg_solve(
        StencilOperator.from_domain(dom),
        prob.rhs_field(),
        options=CGOptions(stop=stop),
    )
    np.testing.assert_allclose(
        np.asarray(crop_field(res.x, dom.grid_shape)),
        np.asarray(ref.x),
        rtol=1e-9,
        atol=1e-9,
    )


def test_gspmd_auto_sharding_path():
    """The plain jnp stencil under jit on sharded inputs (GSPMD; XLA inserts
    the halo exchange itself) agrees with the explicit shard_map operator."""
    # grid (36, 32): divisible by the (4, 2) mesh, as device_put requires
    dom = Domain2D(nx=31, ny=35, shape="rect")
    mesh = make_solver_mesh(8, (4, 2))
    local = StencilOperator.from_domain(dom)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(dom.grid_shape)
    xs = jax.device_put(
        jnp.asarray(x),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("y", "x")),
    )
    y = np.asarray(jax.jit(local)(xs))
    np.testing.assert_allclose(y, np.asarray(local(jnp.asarray(x))), rtol=1e-13)


def test_padding_is_semantically_free():
    dom = Domain2D(nx=30, ny=30)
    mesh = make_solver_mesh(8, (4, 2))
    f = np.ones(dom.grid_shape)
    padded = pad_field(f, mesh)
    assert padded.shape == (32, 32)
    np.testing.assert_array_equal(crop_field(padded, dom.grid_shape), f)
    # padded interior mask stays False in the pad region
    op = ShardedStencilOperator.from_domain(dom, mesh)
    m = np.asarray(op.interior)
    assert not m[31, :].any() and not m[:, 31].any()


def test_sharded_multigrid_pcg_matches_local():
    """Distributed MG-PCG (GSPMD V-cycle through the pad/crop adapter) takes
    the same iteration path and solution as the single-device solver."""
    from iterative_solvers_tpu.core.problem import PoissonProblem
    from iterative_solvers_tpu.ops.stencil import StencilOperator
    from iterative_solvers_tpu.parallel import make_sharded_problem
    from iterative_solvers_tpu.solvers.cg import CGOptions, cg_solve
    from iterative_solvers_tpu.solvers.multigrid import (
        MultigridPreconditioner,
        ShardedMultigridPreconditioner,
    )
    from iterative_solvers_tpu.solvers.stopping import StopConfig

    dom = Domain2D(nx=64, ny=64)
    prob = PoissonProblem.manufactured(dom)
    mesh = make_solver_mesh(8)
    op, b, u = make_sharded_problem(prob, mesh, jnp.float32)
    M = ShardedMultigridPreconditioner.from_domain(dom, mesh)
    stop = StopConfig(eps_precision=-1, eps_residual=1e-4, max_iterations=100)
    res = cg_solve(op, b, u_true=u, options=CGOptions(stop=stop, preconditioner=M))
    assert res.converged and res.iterations <= 15

    op1 = StencilOperator.from_domain(dom)
    res1 = cg_solve(
        op1,
        prob.rhs_field(jnp.float32),
        options=CGOptions(
            stop=stop, preconditioner=MultigridPreconditioner.from_domain(dom)
        ),
    )
    assert res.iterations == res1.iterations
    x_sh = np.asarray(crop_field(res.x, dom.grid_shape))
    np.testing.assert_allclose(x_sh, np.asarray(res1.x), atol=5e-5)


def test_facade_mesh_mg():
    """DirichletSolver(mesh=...) runs the whole stack distributed."""
    from iterative_solvers_tpu.api import DirichletSolver
    from iterative_solvers_tpu.solvers.stopping import StopConfig

    mesh = make_solver_mesh(8)
    s = DirichletSolver(
        nx=64,
        ny=64,
        preconditioner="mg",
        mesh=mesh,
        stop=StopConfig(eps_precision=-1, eps_residual=1e-3, max_iterations=50),
    )
    res = s.solve(record_history=False)
    assert res.converged and res.iterations <= 15
    s1 = DirichletSolver(
        nx=64,
        ny=64,
        preconditioner="mg",
        stop=StopConfig(eps_precision=-1, eps_residual=1e-3, max_iterations=50),
    )
    res1 = s1.solve(record_history=False)
    np.testing.assert_allclose(res.solution, res1.solution, atol=1e-4)


def test_facade_mesh_mixed_precision():
    from iterative_solvers_tpu.api import DirichletSolver
    from iterative_solvers_tpu.solvers.stopping import StopConfig

    mesh = make_solver_mesh(8)
    s = DirichletSolver(
        nx=64,
        ny=64,
        preconditioner="mg",
        precision="mixed",
        mesh=mesh,
        stop=StopConfig(eps_precision=-1, eps_residual=1e-6, max_iterations=10000),
    )
    res = s.solve(record_history=False)
    assert res.converged and res.residual_norm < 1e-6
