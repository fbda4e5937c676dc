"""Custom-mask fast path (round-3 VERDICT item 4): the int8 mask-operand
variants of the Pallas stencil, fused CG engine, and fused V-cycle legs must
match the jnp reference paths on a decidedly non-gamma domain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iterative_solvers_tpu.core.domain import Domain2D
from iterative_solvers_tpu.core.problem import PoissonProblem
from iterative_solvers_tpu.kernels.cg_fused import fused_cg_solve
from iterative_solvers_tpu.kernels.stencil_pallas import PallasStencilOperator
from iterative_solvers_tpu.ops.stencil import StencilOperator
from iterative_solvers_tpu.solvers.cg import CGOptions, cg_solve
from iterative_solvers_tpu.solvers.multigrid import (
    MultigridPreconditioner,
    _FusedLevel,
)
from iterative_solvers_tpu.solvers.stopping import StopConfig


def _notched_disk(n):
    def inside(ix, iy):
        return ((ix - n / 2) ** 2 + (iy - n / 2) ** 2 <= (0.45 * n) ** 2) & ~(
            (ix > n / 2) & (np.abs(iy - n / 2) < n / 10)
        )

    return inside


@pytest.fixture(scope="module")
def custom_dom():
    return Domain2D(nx=64, ny=64, shape="custom", inside_fn=_notched_disk(64))


def test_custom_pallas_stencil_matches_jnp(custom_dom):
    dom = custom_dom
    ref = StencilOperator.from_domain(dom)
    op = PallasStencilOperator.from_domain(dom, block_rows=32)
    assert op.mask8 is not None and op.mask_mode == "custom"
    rng = np.random.default_rng(0)
    # pre-masked input contract (all solver fields are masked)
    x = np.where(
        np.asarray(dom.interior), rng.standard_normal(dom.grid_shape), 0.0
    )
    y_ref = np.asarray(ref(jnp.asarray(x)))
    y_p = np.asarray(op.crop(op(op.pad(jnp.asarray(x)))))
    np.testing.assert_allclose(y_p, y_ref, rtol=1e-11, atol=1e-11)


def test_custom_fused_engine_matches_standard_cg(custom_dom):
    dom = custom_dom
    prob = PoissonProblem.manufactured(dom)
    stop = StopConfig(eps_precision=-1, eps_residual=1e-3, max_iterations=2000)
    ref = cg_solve(
        StencilOperator.from_domain(dom),
        prob.rhs_field(jnp.float32),
        options=CGOptions(stop=stop),
    )
    pop = PallasStencilOperator.from_domain(dom)
    res = fused_cg_solve(
        pop, prob.rhs_field(jnp.float32), options=CGOptions(stop=stop)
    )
    assert res.converged
    assert abs(res.iterations - ref.iterations) <= 1
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(ref.x), atol=2e-5
    )


def test_custom_fused_vcycle_matches_jnp(custom_dom):
    dom = custom_dom
    Mf = MultigridPreconditioner.from_domain(
        dom, fuse=True, fuse_min_extent=33, interpret=True
    )
    Mr = MultigridPreconditioner.from_domain(dom, fuse=False)
    assert sum(isinstance(l, _FusedLevel) for l in Mf.levels) >= 1
    rng = np.random.default_rng(1)
    r = np.where(
        np.asarray(dom.interior), rng.standard_normal(dom.grid_shape), 0.0
    ).astype(np.float32)
    z1 = np.asarray(Mf(jnp.asarray(r)))
    z2 = np.asarray(Mr(jnp.asarray(r)))
    scale = np.abs(z2).max()
    np.testing.assert_allclose(z1 / scale, z2 / scale, atol=1e-5)


def test_custom_fused_pcg_engine(custom_dom):
    """operator='fused' + preconditioner='mg' end-to-end on a custom domain
    (K2-PCG with the mask operand + custom fused V-cycle)."""
    from iterative_solvers_tpu.api import DirichletSolver

    dom = custom_dom
    s = DirichletSolver(
        domain=dom, operator="fused", preconditioner="mg",
        stop=StopConfig(eps_precision=-1, eps_residual=1e-3, max_iterations=500),
    )
    res = s.solve(record_history=False)
    assert res.converged
    s2 = DirichletSolver(
        domain=dom, preconditioner="mg",
        stop=StopConfig(eps_precision=-1, eps_residual=1e-3, max_iterations=500),
    )
    res2 = s2.solve(record_history=False)
    np.testing.assert_allclose(res.solution, res2.solution, atol=1e-3)


def test_custom_pallas_operator_facade(custom_dom):
    from iterative_solvers_tpu.api import DirichletSolver

    dom = custom_dom
    s = DirichletSolver(
        domain=dom, operator="pallas",
        stop=StopConfig(eps_precision=-1, eps_residual=1e-3, max_iterations=2000),
    )
    res = s.solve(record_history=False)
    assert res.converged
    s2 = DirichletSolver(
        domain=dom,
        stop=StopConfig(eps_precision=-1, eps_residual=1e-3, max_iterations=2000),
    )
    res2 = s2.solve(record_history=False)
    np.testing.assert_allclose(res.solution, res2.solution, atol=1e-6)


def test_custom_mixed_precision_facade(custom_dom):
    from iterative_solvers_tpu.api import DirichletSolver

    s = DirichletSolver(
        domain=custom_dom, preconditioner="mg", precision="mixed",
        stop=StopConfig(eps_precision=-1, eps_residual=1e-6, max_iterations=10000),
    )
    res = s.solve(record_history=False)
    assert res.converged and res.residual_norm < 1e-6
