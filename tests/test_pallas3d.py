"""Pallas 3D 7-point stencil kernel tests (interpret mode on CPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from iterative_solvers_tpu.core.domain import Domain3D
from iterative_solvers_tpu.core.problem import PoissonProblem
from iterative_solvers_tpu.kernels.stencil3d_pallas import Pallas3DStencilOperator
from iterative_solvers_tpu.ops.stencil import StencilOperator
from iterative_solvers_tpu.solvers.cg import CGOptions, cg_solve
from iterative_solvers_tpu.solvers.stopping import StopConfig


@pytest.mark.parametrize("dims", [(8, 8, 8), (6, 10, 14), (12, 9, 7)])
def test_matches_jnp_operator(dims):
    nz, ny, nx = dims
    dom = Domain3D(nx=nx, ny=ny, nz=nz)
    op_ref = StencilOperator.from_domain(dom)
    op = Pallas3DStencilOperator.from_domain(dom)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal(dom.grid_shape), jnp.float32)
    y_ref = np.asarray(op_ref(x))
    y = np.asarray(op.crop(op(op.pad(x))))
    np.testing.assert_allclose(y, y_ref, rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize("dims,bz", [((17, 10, 12), 9), ((31, 8, 8), 16), ((11, 9, 13), 4)])
def test_chunked_matches_per_plane(dims, bz):
    """The z-chunked kernel (each plane read once) must agree exactly with
    the per-plane kernel — same arithmetic, different blocking."""
    nz, ny, nx = dims
    dom = Domain3D(nx=nx, ny=ny, nz=nz)
    op1 = Pallas3DStencilOperator.from_domain(dom, block_z=1)
    opc = Pallas3DStencilOperator.from_domain(dom, block_z=bz)
    assert opc.block_z == bz and (nz + 1) % bz == 0
    rng = np.random.default_rng(9)
    xp = op1.pad(jnp.asarray(rng.standard_normal(dom.grid_shape), jnp.float32))
    a, b = np.asarray(op1(xp)), np.asarray(opc(xp))
    # identical arithmetic, but XLA may contract multiplies into FMAs
    # differently across the two programs — allow rounding-level spread
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5 * np.abs(a).max())


def test_auto_block_z():
    from iterative_solvers_tpu.kernels.stencil3d_pallas import _auto_block_z

    assert _auto_block_z(513) == 9  # 512^3 bench volume
    assert _auto_block_z(32) == 16
    assert _auto_block_z(13) == 13  # small prime: one whole-depth chunk
    assert _auto_block_z(257) == 1  # big prime: per-plane fallback


def test_chunked_ragged_depth_falls_back():
    """A block_z that does not divide the field depth must still produce
    correct results (the apply falls back to the per-plane kernel)."""
    dom = Domain3D(nx=8, ny=8, nz=12)  # D=13
    op = Pallas3DStencilOperator.from_domain(dom, block_z=4)  # 13 % 4 != 0
    op_ref = StencilOperator.from_domain(dom)
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.standard_normal(dom.grid_shape), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(op.crop(op(op.pad(x)))), np.asarray(op_ref(x)),
        rtol=2e-5, atol=2e-4,
    )


def test_padding_inert():
    dom = Domain3D(nx=8, ny=8, nz=8)
    op = Pallas3DStencilOperator.from_domain(dom)
    rng = np.random.default_rng(8)
    xp = op.pad(jnp.asarray(rng.standard_normal(dom.grid_shape), jnp.float32))
    # junk in the pad region must not leak into the result
    junk = xp.at[:, -1, :].set(1e6).at[:, :, -1].set(-1e6)
    y1 = np.asarray(op(xp))
    y2 = np.asarray(op(junk))
    np.testing.assert_allclose(op.crop(jnp.asarray(y1)), op.crop(jnp.asarray(y2)))


def test_cg_with_pallas3d_matches_jnp():
    dom = Domain3D(nx=10, ny=10, nz=10)
    prob = PoissonProblem.manufactured(dom)
    stop = StopConfig(eps_precision=-1, eps_residual=1e-3, max_iterations=500)

    op_ref = StencilOperator.from_domain(dom)
    b = prob.rhs_field(jnp.float32)
    res_ref = cg_solve(op_ref, b, options=CGOptions(stop=stop))

    op = Pallas3DStencilOperator.from_domain(dom)
    res = cg_solve(op, op.pad(b), options=CGOptions(stop=stop))
    assert res.converged and res.iterations == res_ref.iterations
    np.testing.assert_allclose(
        np.asarray(op.crop(res.x)), np.asarray(res_ref.x), atol=1e-4
    )


def test_facade_pallas_3d():
    from iterative_solvers_tpu.api import DirichletSolver
    from iterative_solvers_tpu.core.problem import PoissonProblem

    dom = Domain3D(nx=8, ny=8, nz=8)
    s = DirichletSolver(
        problem=PoissonProblem.manufactured(dom),
        operator="pallas",
        stop=StopConfig(eps_precision=-1, eps_residual=1e-3, max_iterations=500),
    )
    res = s.solve(record_history=False)
    assert res.converged
    s2 = DirichletSolver(
        problem=PoissonProblem.manufactured(dom),
        stop=StopConfig(eps_precision=-1, eps_residual=1e-3, max_iterations=500),
    )
    res2 = s2.solve(record_history=False)
    np.testing.assert_allclose(res.solution, res2.solution, atol=1e-4)
