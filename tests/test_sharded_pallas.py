"""Sharded Pallas fast path (round-3 VERDICT item 1): the single-chip Pallas
stencil arithmetic per block under shard_map must match the local operator
and the jnp sharded operator across mesh factorizations, and plug into CG
unchanged."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from iterative_solvers_tpu.core.domain import Domain2D
from iterative_solvers_tpu.core.problem import PoissonProblem
from iterative_solvers_tpu.ops.stencil import StencilOperator
from iterative_solvers_tpu.parallel import (
    ShardedPallasStencilOperator,
    ShardedStencilOperator,
    make_solver_mesh,
    shard_field,
)
from iterative_solvers_tpu.solvers.cg import CGOptions, cg_solve
from iterative_solvers_tpu.solvers.stopping import StopConfig, StopReason

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

MESH_SHAPES = [(4, 2), (2, 4), (8, 1), (1, 8), (2, 2)]


@pytest.mark.parametrize("mesh_shape", MESH_SHAPES)
@pytest.mark.parametrize("nx,ny,shape", [(30, 30, "gamma"), (46, 38, "rect")])
def test_sharded_pallas_matches_local(mesh_shape, nx, ny, shape):
    dom = Domain2D(nx=nx, ny=ny, shape=shape)
    mesh = make_solver_mesh(
        n_devices=mesh_shape[0] * mesh_shape[1], shape=mesh_shape
    )
    local = StencilOperator.from_domain(dom)
    op = ShardedPallasStencilOperator.from_domain(dom, mesh, block_rows=8)

    rng = np.random.default_rng(0)
    x = rng.standard_normal(dom.grid_shape)
    y_local = np.asarray(local(jnp.asarray(x)))
    y_shard = np.asarray(op.crop(op(op.shard(x))))
    np.testing.assert_allclose(y_shard, y_local, rtol=1e-12, atol=1e-12)


def test_sharded_pallas_matches_jnp_sharded_f32():
    """The two sharded operators agree to f32 round-off on the same mesh
    (the VERDICT's 'iterates match the jnp sharded path' criterion)."""
    dom = Domain2D(nx=64, ny=64)
    mesh = make_solver_mesh(8, (4, 2))
    jnp_op = ShardedStencilOperator.from_domain(dom, mesh)
    pls_op = ShardedPallasStencilOperator.from_domain(dom, mesh, block_rows=8)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(dom.grid_shape).astype(np.float32)
    y1 = np.asarray(
        ShardedStencilOperator.from_domain(dom, mesh)(
            shard_field(jnp.asarray(x), mesh)
        )
    )[: dom.grid_shape[0], : dom.grid_shape[1]]
    y2 = np.asarray(pls_op.crop(pls_op(pls_op.shard(x))))
    # both paths are f32; stencil terms are O(coeff ~ 4e3) so abs round-off
    # is O(coeff * eps_f32 * nterms) ~ 3e-3
    np.testing.assert_allclose(y2, y1, rtol=1e-5, atol=1e-2)


def test_sharded_pallas_hybrid_mesh():
    """3-axis DCN x ICI mesh: row dim sharded over ('slice', 'y') combined."""
    devs = np.asarray(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(devs, ("slice", "y", "x"))
    dom = Domain2D(nx=30, ny=30)
    local = StencilOperator.from_domain(dom)
    op = ShardedPallasStencilOperator.from_domain(dom, mesh, block_rows=8)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(dom.grid_shape)
    y_local = np.asarray(local(jnp.asarray(x)))
    y_shard = np.asarray(op.crop(op(op.shard(x))))
    np.testing.assert_allclose(y_shard, y_local, rtol=1e-12, atol=1e-12)


def test_sharded_pallas_cg_matches_local():
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
    op = ShardedPallasStencilOperator.from_domain(dom, mesh, block_rows=8)
    res = cg_solve(
        op,
        op.shard(prob.rhs_field()),
        u_true=op.shard(prob.true_solution_field()),
        options=CGOptions(stop=stop),
    )
    assert res.converged and res.reason == StopReason.RESIDUAL
    assert res.iterations == local_res.iterations
    np.testing.assert_allclose(
        np.asarray(op.crop(res.x)), np.asarray(local_res.x), atol=1e-9
    )


def test_sharded_pallas_rejects_custom_domains():
    dom = Domain2D(nx=16, ny=16, shape="custom", inside_fn=lambda x, y: x > 0)
    mesh = make_solver_mesh(8, (4, 2))
    with pytest.raises(ValueError, match="gamma/rect"):
        ShardedPallasStencilOperator.from_domain(dom, mesh)
