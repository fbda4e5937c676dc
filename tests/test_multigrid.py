"""Geometric multigrid preconditioner tests.

The contract (solvers/multigrid.py): the V-cycle is a SYMMETRIC linear
operator approximating A⁻¹, and MG-PCG converges in a resolution-independent
number of iterations — unlike plain CG whose count grows O(n)
(the reference's only solver, solver/msg_solver.cpp:80-184).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from iterative_solvers_tpu.api import DirichletSolver
from iterative_solvers_tpu.core.domain import Domain2D, Domain3D
from iterative_solvers_tpu.core.problem import PoissonProblem
from iterative_solvers_tpu.ops.stencil import StencilOperator
from iterative_solvers_tpu.solvers.cg import CGOptions, cg_solve
from iterative_solvers_tpu.solvers.multigrid import (
    MultigridPreconditioner,
    prolong_linear,
    restrict_full_weighting,
)
from iterative_solvers_tpu.solvers.stopping import StopConfig


def test_transfer_adjointness():
    """R = Pᵀ / 2^ndim — the identity that makes the V-cycle symmetric."""
    rng = np.random.default_rng(0)
    uf = jnp.asarray(rng.standard_normal((33, 33)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((17, 17)), jnp.float32)
    lhs = float(jnp.sum(restrict_full_weighting(uf) * vc))
    rhs = float(jnp.sum(uf * prolong_linear(vc))) / 4.0
    assert abs(lhs - rhs) < 1e-4 * max(1.0, abs(lhs))


def test_transfer_adjointness_3d():
    rng = np.random.default_rng(1)
    uf = jnp.asarray(rng.standard_normal((9, 9, 9)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((5, 5, 5)), jnp.float32)
    lhs = float(jnp.sum(restrict_full_weighting(uf) * vc))
    rhs = float(jnp.sum(uf * prolong_linear(vc))) / 8.0
    assert abs(lhs - rhs) < 1e-4 * max(1.0, abs(lhs))


def test_prolong_exact_on_linear_fields():
    """Bilinear interpolation reproduces affine functions exactly."""
    yc, xc = np.mgrid[0:9, 0:9].astype(np.float32)
    coarse = 2.0 * xc - 3.0 * yc + 1.0
    fine = np.asarray(prolong_linear(jnp.asarray(coarse)))
    yf, xf = np.mgrid[0:17, 0:17].astype(np.float32) / 2.0
    np.testing.assert_allclose(fine, 2.0 * xf - 3.0 * yf + 1.0, rtol=1e-6)


def test_vcycle_symmetry():
    dom = Domain2D(nx=32, ny=32)
    op = StencilOperator.from_domain(dom)
    M = MultigridPreconditioner.from_domain(dom)
    rng = np.random.default_rng(2)
    u = op.mask(jnp.asarray(rng.standard_normal(dom.grid_shape), jnp.float32))
    v = op.mask(jnp.asarray(rng.standard_normal(dom.grid_shape), jnp.float32))
    s1 = float(jnp.sum(u * M(v)))
    s2 = float(jnp.sum(v * M(u)))
    assert abs(s1 - s2) <= 1e-5 * abs(s1)


def test_vcycle_negative_definite_action():
    """(r, M r) < 0 for the negative-definite Laplacian's approximate inverse
    — the sign convention PCG's alpha/beta recurrences rely on."""
    dom = Domain2D(nx=16, ny=16)
    op = StencilOperator.from_domain(dom)
    M = MultigridPreconditioner.from_domain(dom)
    rng = np.random.default_rng(3)
    for _ in range(5):
        r = op.mask(jnp.asarray(rng.standard_normal(dom.grid_shape), jnp.float32))
        assert float(jnp.sum(r * M(r))) < 0


@pytest.mark.parametrize("n", [32, 64, 128])
def test_mg_pcg_resolution_independent_iterations(n):
    dom = Domain2D(nx=n, ny=n)
    prob = PoissonProblem.manufactured(dom)
    op = StencilOperator.from_domain(dom)
    b = prob.rhs_field(jnp.float32)
    M = MultigridPreconditioner.from_domain(dom)
    res = cg_solve(
        op,
        b,
        options=CGOptions(
            stop=StopConfig(eps_precision=-1, eps_residual=1e-3, max_iterations=100),
            preconditioner=M,
        ),
    )
    assert res.converged
    assert res.iterations <= 15  # plain CG needs ~90 at n=32, ~360 at n=128
    assert res.residual_max < 1e-3


def test_mg_pcg_beats_plain_cg_iterations():
    dom = Domain2D(nx=64, ny=64)
    b = PoissonProblem.manufactured(dom).rhs_field(jnp.float32)
    op = StencilOperator.from_domain(dom)
    stop = StopConfig(eps_precision=-1, eps_residual=1e-3, max_iterations=2000)
    plain = cg_solve(op, b, options=CGOptions(stop=stop))
    mg = cg_solve(
        op,
        b,
        options=CGOptions(
            stop=stop, preconditioner=MultigridPreconditioner.from_domain(dom)
        ),
    )
    assert mg.converged and plain.converged
    assert mg.iterations * 5 < plain.iterations


def test_mg_pcg_correct_solution():
    """MG-PCG converges to the same discrete solution as plain CG (the
    manufactured-solution error is discretization-dominated, SURVEY §0)."""
    dom = Domain2D(nx=64, ny=64)
    prob = PoissonProblem.manufactured(dom)
    op = StencilOperator.from_domain(dom)
    b = prob.rhs_field(jnp.float32)
    u = prob.true_solution_field(jnp.float32)
    res = cg_solve(
        op,
        b,
        u_true=u,
        options=CGOptions(
            stop=StopConfig(eps_precision=-1, eps_residual=1e-4, max_iterations=100),
            preconditioner=MultigridPreconditioner.from_domain(dom),
        ),
    )
    assert res.converged
    assert res.error_max < 1e-3  # O(h²) discretization error at n=64


def test_mg_nu2_smoothing():
    dom = Domain2D(nx=64, ny=64)
    b = PoissonProblem.manufactured(dom).rhs_field(jnp.float32)
    op = StencilOperator.from_domain(dom)
    M = MultigridPreconditioner.from_domain(dom, nu_pre=2, nu_post=2)
    res = cg_solve(
        op,
        b,
        options=CGOptions(
            stop=StopConfig(eps_precision=-1, eps_residual=1e-3, max_iterations=50),
            preconditioner=M,
        ),
    )
    assert res.converged and res.iterations <= 10


def test_mg_asymmetric_nu_rejected():
    with pytest.raises(ValueError, match="symmetric"):
        MultigridPreconditioner.from_domain(Domain2D(nx=16, ny=16), nu_pre=2, nu_post=1)


def test_mg_non_coarsenable_grid_single_level():
    """30x30 Г-grid (GUI default, qt_gui/src/mainwindow.cpp:112-113) cannot be
    halved (15 odd) — the hierarchy degenerates to an exact coarse solve and
    PCG converges in a couple of iterations."""
    dom = Domain2D(nx=30, ny=30)
    b = PoissonProblem.manufactured(dom).rhs_field(jnp.float32)
    op = StencilOperator.from_domain(dom)
    M = MultigridPreconditioner.from_domain(dom)
    assert M.num_levels == 1
    res = cg_solve(
        op,
        b,
        options=CGOptions(
            stop=StopConfig(eps_precision=-1, eps_residual=1e-3, max_iterations=10),
            preconditioner=M,
        ),
    )
    assert res.converged and res.iterations <= 3


def test_mg_chebyshev_coarse_fallback():
    """Force the Chebyshev coarse solve by disallowing the dense inverse."""
    dom = Domain2D(nx=64, ny=64)
    b = PoissonProblem.manufactured(dom).rhs_field(jnp.float32)
    op = StencilOperator.from_domain(dom)
    M = MultigridPreconditioner.from_domain(dom, dense_coarse_limit=0)
    res = cg_solve(
        op,
        b,
        options=CGOptions(
            stop=StopConfig(eps_precision=-1, eps_residual=1e-3, max_iterations=100),
            preconditioner=M,
        ),
    )
    assert res.converged and res.iterations <= 30


def test_mg_rect_domain():
    dom = Domain2D(nx=64, ny=32, shape="rect")
    b = PoissonProblem.manufactured(dom).rhs_field(jnp.float32)
    op = StencilOperator.from_domain(dom)
    M = MultigridPreconditioner.from_domain(dom)
    assert M.num_levels >= 2
    res = cg_solve(
        op,
        b,
        options=CGOptions(
            stop=StopConfig(eps_precision=-1, eps_residual=1e-3, max_iterations=50),
            preconditioner=M,
        ),
    )
    assert res.converged and res.iterations <= 15


def test_mg_3d():
    dom = Domain3D(nx=16, ny=16, nz=16)
    prob = PoissonProblem.manufactured(dom)
    op = StencilOperator.from_domain(dom)
    b = prob.rhs_field(jnp.float32)
    M = MultigridPreconditioner.from_domain(dom)
    assert M.num_levels >= 2
    res = cg_solve(
        op,
        b,
        options=CGOptions(
            stop=StopConfig(eps_precision=-1, eps_residual=1e-2, max_iterations=50),
            preconditioner=M,
        ),
    )
    assert res.converged and res.iterations <= 15


def test_facade_mg():
    s = DirichletSolver(
        nx=64,
        ny=64,
        preconditioner="mg",
        stop=StopConfig(eps_precision=-1, eps_residual=1e-3, max_iterations=100),
    )
    res = s.solve(record_history=False)
    assert res.converged and res.iterations <= 15


def test_make_preconditioner_mg_nu():
    from iterative_solvers_tpu.solvers.precond import make_preconditioner

    dom = Domain2D(nx=32, ny=32)
    op = StencilOperator.from_domain(dom)
    M = make_preconditioner("mg:2", op, dom)
    assert M.nu_pre == 2 and M.nu_post == 2


# --- fused Pallas V-cycle (kernels/mg_fused.py) -------------------------------


@pytest.mark.parametrize("shape,n", [("gamma", 64), ("rect", 48), ("gamma", 128)])
def test_fused_vcycle_matches_jnp(shape, n):
    """The fused down/up kernels compute the same V-cycle arithmetic as the
    jnp path — required for the symmetry argument to carry over."""
    from iterative_solvers_tpu.ops.stencil import StencilOperator

    dom = Domain2D(nx=n, ny=n, shape=shape)
    op = StencilOperator.from_domain(dom)
    M_ref = MultigridPreconditioner.from_domain(dom, fuse=False)
    M_fused = MultigridPreconditioner.from_domain(
        dom, fuse=True, fuse_min_extent=16, interpret=True
    )
    assert any(hasattr(l, "kernels") for l in M_fused.levels)
    rng = np.random.default_rng(0)
    r = op.mask(jnp.asarray(rng.standard_normal(dom.grid_shape), jnp.float32))
    z_ref = np.asarray(M_ref(r))
    z = np.asarray(M_fused(r))
    np.testing.assert_allclose(z, z_ref, atol=5e-6 * np.abs(z_ref).max())


def test_fused_vcycle_pcg_same_path():
    from iterative_solvers_tpu.core.problem import PoissonProblem
    from iterative_solvers_tpu.ops.stencil import StencilOperator
    from iterative_solvers_tpu.solvers.cg import CGOptions, cg_solve

    dom = Domain2D(nx=64, ny=64)
    op = StencilOperator.from_domain(dom)
    b = PoissonProblem.manufactured(dom).rhs_field(jnp.float32)
    stop = StopConfig(eps_precision=-1, eps_residual=1e-4, max_iterations=100)
    r1 = cg_solve(
        op, b, options=CGOptions(stop=stop, preconditioner=MultigridPreconditioner.from_domain(dom, fuse=False))
    )
    r2 = cg_solve(
        op,
        b,
        options=CGOptions(
            stop=stop,
            preconditioner=MultigridPreconditioner.from_domain(
                dom, fuse=True, fuse_min_extent=16, interpret=True
            ),
        ),
    )
    assert r1.iterations == r2.iterations
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x), atol=1e-5)


def test_fused_vcycle_symmetry():
    from iterative_solvers_tpu.ops.stencil import StencilOperator

    dom = Domain2D(nx=32, ny=32)
    op = StencilOperator.from_domain(dom)
    M = MultigridPreconditioner.from_domain(
        dom, fuse=True, fuse_min_extent=16, interpret=True
    )
    rng = np.random.default_rng(2)
    u = op.mask(jnp.asarray(rng.standard_normal(dom.grid_shape), jnp.float32))
    v = op.mask(jnp.asarray(rng.standard_normal(dom.grid_shape), jnp.float32))
    s1 = float(jnp.sum(u * M(v)))
    s2 = float(jnp.sum(v * M(u)))
    assert abs(s1 - s2) <= 2e-5 * abs(s1)


def test_fused_requires_v11():
    """nu != 1 falls back to the jnp path (the fused legs hard-code V(1,1))."""
    M = MultigridPreconditioner.from_domain(
        Domain2D(nx=64, ny=64), fuse=True, fuse_min_extent=16, interpret=True,
        nu_pre=2, nu_post=2,
    )
    assert not any(hasattr(l, "kernels") for l in M.levels)


def test_fused_vcycle_f64_field_takes_jnp_leg():
    """The Pallas legs are f32-only; an f64 field (e.g. the escalated inner
    solve of solvers/refine.py) must transparently use the jnp path."""
    from iterative_solvers_tpu.ops.stencil import StencilOperator

    dom = Domain2D(nx=64, ny=64)
    op = StencilOperator.from_domain(dom)
    M_fused = MultigridPreconditioner.from_domain(
        dom, fuse=True, fuse_min_extent=16, interpret=True
    )
    M_ref = MultigridPreconditioner.from_domain(dom, fuse=False)
    rng = np.random.default_rng(5)
    r64 = op.mask(jnp.asarray(rng.standard_normal(dom.grid_shape), jnp.float64))
    z1 = np.asarray(M_fused(r64))
    z2 = np.asarray(M_ref(r64))
    np.testing.assert_allclose(z1, z2, rtol=1e-12)
    assert z1.dtype == np.float64


def test_refine_escalation_with_fused_mg():
    """Force the precision ladder (crippled inner solves) and check the
    escalated f64 inner pass works with a fused-kernel preconditioner."""
    from iterative_solvers_tpu.core.problem import PoissonProblem
    from iterative_solvers_tpu.ops.stencil import StencilOperator
    from iterative_solvers_tpu.solvers.refine import refined_solve

    dom = Domain2D(nx=32, ny=32)
    prob = PoissonProblem.manufactured(dom)
    op = StencilOperator.from_domain(dom)
    M = MultigridPreconditioner.from_domain(
        dom, fuse=True, fuse_min_extent=16, interpret=True
    )
    res = refined_solve(
        op,
        op,
        prob.rhs_field(jnp.float64),
        stop=StopConfig(eps_precision=-1, eps_residual=1e-9, max_iterations=10000),
        preconditioner=M,
        escalate_ratio=1e-12,  # any real contraction "stalls": step up at once
    )
    assert res.escalated
    assert res.converged and res.residual_max < 1e-9


def test_fused_padded_passthrough():
    # A field already in the fine level's padded layout must pass through the
    # V-cycle with no pad/crop copies and come back padded, numerically equal
    # to the unpadded path.
    import jax

    dom = Domain2D(nx=32, ny=32)
    M = MultigridPreconditioner.from_domain(
        dom, fuse=True, fuse_min_extent=16, interpret=True
    )
    lev0 = M.levels[0]
    hp, wp = lev0.kernels.padded_shape
    assert M.accepts_padded((hp, wp)) and not M.accepts_padded(dom.grid_shape)
    r = jax.random.normal(jax.random.PRNGKey(3), dom.grid_shape).astype(jnp.float32)
    r = jnp.where(jnp.asarray(dom.interior), r, 0.0)
    z = M(r)
    rp = jnp.pad(r, ((0, hp - r.shape[0]), (0, wp - r.shape[1])))
    zp = M(rp)
    assert zp.shape == (hp, wp)
    np.testing.assert_allclose(np.asarray(zp[: r.shape[0], : r.shape[1]]),
                               np.asarray(z), rtol=1e-6, atol=1e-6)
    assert float(jnp.max(jnp.abs(zp[r.shape[0]:, :]))) == 0.0


def test_fused3d_vcycle_matches_jnp():
    # The 3D fused z-leg kernels (kernels/mg_fused3d.py) must reproduce the
    # jnp V-cycle's output to f32 round-off on the box domain.
    from iterative_solvers_tpu.core.domain import Domain3D

    dom = Domain3D(nx=16, ny=16, nz=16)
    M_jnp = MultigridPreconditioner.from_domain(dom, fuse=False)
    M_fused = MultigridPreconditioner.from_domain(
        dom, fuse=True, fuse_min_extent=16, interpret=True
    )
    from iterative_solvers_tpu.solvers.multigrid import _FusedLevel3D

    assert isinstance(M_fused.levels[0], _FusedLevel3D)
    r = jax.random.normal(jax.random.PRNGKey(7), dom.grid_shape).astype(jnp.float32)
    r = jnp.where(jnp.asarray(dom.interior), r, 0.0)
    z_jnp = np.asarray(M_jnp(r))
    z_fused = np.asarray(M_fused(r))
    scale = np.max(np.abs(z_jnp))
    np.testing.assert_allclose(z_fused, z_jnp, rtol=1e-5, atol=2e-6 * scale)


def test_fused3d_vcycle_odd_panel_layouts():
    from iterative_solvers_tpu.core.domain import Domain3D

    # ny+1 = 25 -> hp = 32 with padding rows; nz != ny exercises distinct
    # z/y extents in the kernels
    dom = Domain3D(nx=16, ny=24, nz=8)
    M_jnp = MultigridPreconditioner.from_domain(dom, fuse=False)
    M_fused = MultigridPreconditioner.from_domain(
        dom, fuse=True, fuse_min_extent=16, interpret=True
    )
    r = jax.random.normal(jax.random.PRNGKey(8), dom.grid_shape).astype(jnp.float32)
    r = jnp.where(jnp.asarray(dom.interior), r, 0.0)
    z_jnp = np.asarray(M_jnp(r))
    z_fused = np.asarray(M_fused(r))
    scale = np.max(np.abs(z_jnp))
    np.testing.assert_allclose(z_fused, z_jnp, rtol=1e-5, atol=2e-6 * scale)


def test_fused3d_padded_passthrough():
    from iterative_solvers_tpu.core.domain import Domain3D

    dom = Domain3D(nx=16, ny=16, nz=16)
    M = MultigridPreconditioner.from_domain(
        dom, fuse=True, fuse_min_extent=16, interpret=True
    )
    lev0 = M.levels[0]
    dz, hp, wp = lev0.kernels.padded_shape
    assert M.accepts_padded((dz, hp, wp))
    r = jax.random.normal(jax.random.PRNGKey(9), dom.grid_shape).astype(jnp.float32)
    r = jnp.where(jnp.asarray(dom.interior), r, 0.0)
    z = M(r)
    rp = jnp.pad(r, ((0, 0), (0, hp - r.shape[1]), (0, wp - r.shape[2])))
    zp = M(rp)
    assert zp.shape == (dz, hp, wp)
    np.testing.assert_allclose(
        np.asarray(zp[:, : r.shape[1], : r.shape[2]]), np.asarray(z),
        rtol=1e-6, atol=1e-6,
    )


def test_fused3d_multi_panel_layout():
    # ny=128 -> hp=136, by=8 -> 17 y-panels per plane: exercises the clamped
    # y-halo BlockSpec logic the single-panel tests cannot reach (review
    # coverage gap).
    from iterative_solvers_tpu.core.domain import Domain3D
    from iterative_solvers_tpu.solvers.multigrid import _FusedLevel3D

    dom = Domain3D(nx=16, ny=128, nz=8)
    M_jnp = MultigridPreconditioner.from_domain(dom, fuse=False)
    M_fused = MultigridPreconditioner.from_domain(
        dom, fuse=True, fuse_min_extent=16, interpret=True
    )
    lev0 = M_fused.levels[0]
    assert isinstance(lev0, _FusedLevel3D)
    assert lev0.kernels.padded_shape[1] // lev0.kernels.block_rows > 1
    r = jax.random.normal(jax.random.PRNGKey(11), dom.grid_shape).astype(jnp.float32)
    r = jnp.where(jnp.asarray(dom.interior), r, 0.0)
    z_jnp = np.asarray(M_jnp(r))
    z_fused = np.asarray(M_fused(r))
    scale = np.max(np.abs(z_jnp))
    np.testing.assert_allclose(z_fused, z_jnp, rtol=1e-5, atol=2e-6 * scale)


def test_fused_levels_f64_fallback():
    # Review regression: the non-f32 jnp fallback masks through the CHILD
    # level object, which may itself be fused — fused levels must expose
    # mask(). Exercised with >= 2 consecutive fused levels in 2D and 3D.
    from iterative_solvers_tpu.core.domain import Domain3D

    dom2 = Domain2D(nx=64, ny=64)
    M2 = MultigridPreconditioner.from_domain(
        dom2, fuse=True, fuse_min_extent=16, interpret=True
    )
    r2 = jnp.asarray(np.random.default_rng(0).normal(size=dom2.grid_shape))
    r2 = jnp.where(jnp.asarray(dom2.interior), r2, 0.0)  # f64 under x64
    z2 = M2(r2)
    assert z2.dtype == jnp.float64
    M2_ref = MultigridPreconditioner.from_domain(dom2, fuse=False)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(M2_ref(r2)), rtol=1e-12)

    dom3 = Domain3D(nx=16, ny=16, nz=16)
    M3 = MultigridPreconditioner.from_domain(
        dom3, fuse=True, fuse_min_extent=16, interpret=True
    )
    r3 = jnp.asarray(np.random.default_rng(1).normal(size=dom3.grid_shape))
    r3 = jnp.where(jnp.asarray(dom3.interior), r3, 0.0)
    z3 = M3(r3)
    assert z3.dtype == jnp.float64
    M3_ref = MultigridPreconditioner.from_domain(dom3, fuse=False)
    np.testing.assert_allclose(np.asarray(z3), np.asarray(M3_ref(r3)), rtol=1e-12)


def test_call_with_dot_matches_separate_dot():
    # The fused K_up dot epilogue must equal M(r), sum(r*M(r)) — padded
    # pass-through (fused path) and unpadded (generic fallback) both.
    from iterative_solvers_tpu.kernels.stencil_pallas import PallasStencilOperator
    from iterative_solvers_tpu.solvers.multigrid import PaddedPreconditioner

    dom = Domain2D(nx=32, ny=32)
    M = MultigridPreconditioner.from_domain(
        dom, fuse=True, fuse_min_extent=16, interpret=True
    )
    pal = PallasStencilOperator.from_domain(dom)
    Mp = PaddedPreconditioner(inner=M, padded_op=pal)
    r = jax.random.normal(jax.random.PRNGKey(12), dom.grid_shape).astype(jnp.float32)
    r = jnp.where(jnp.asarray(dom.interior), r, 0.0)
    rp = pal.pad(r)
    z_ref = Mp(rp)
    rz_ref = float(jnp.sum(rp * z_ref))
    z, rz = Mp.call_with_dot(rp)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), rtol=1e-6)
    assert float(rz) == pytest.approx(rz_ref, rel=1e-5)
    # unpadded fallback
    z2, rz2 = M.call_with_dot(r)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(M(r)), rtol=1e-6)
    assert float(rz2) == pytest.approx(float(jnp.sum(r * M(r))), rel=1e-5)


def test_fused3d_chunked_legs_match_per_plane():
    """The z-chunked down/up legs (block_z>1, incl. ragged depth chunks)
    must reproduce the per-plane legs to FMA-reassociation round-off."""
    import dataclasses

    from iterative_solvers_tpu.core.domain import Domain3D
    from iterative_solvers_tpu.solvers.multigrid import _FusedLevel3D

    for dims, bz in [((16, 16, 16), 4), ((8, 24, 16), 6), ((8, 128, 16), 4)]:
        nz, ny, nx = dims
        dom = Domain3D(nx=nx, ny=ny, nz=nz)
        M = MultigridPreconditioner.from_domain(
            dom, fuse=True, fuse_min_extent=min(dims), interpret=True
        )
        lev0 = M.levels[0]
        assert isinstance(lev0, _FusedLevel3D)
        k1 = lev0.kernels
        kc = dataclasses.replace(k1, block_z=bz)
        dz, hp, wp = k1.padded_shape
        assert dz % bz != 0 or bz == 4  # keep at least one ragged case
        key = jax.random.PRNGKey(13)
        b = jax.random.normal(key, (dz, hp, wp)).astype(jnp.float32)
        d1, d2 = np.asarray(k1.down(b)), np.asarray(kc.down(b))
        s = max(np.abs(d1).max(), 1e-30)
        np.testing.assert_allclose(d2, d1, rtol=1e-5, atol=1e-5 * s)
        dc = nz // 2 + 1
        ec = jax.random.normal(jax.random.PRNGKey(14), (dc, hp, wp)).astype(
            jnp.float32
        )
        u1, u2 = np.asarray(k1.up(b, ec)), np.asarray(kc.up(b, ec))
        s = max(np.abs(u1).max(), 1e-30)
        np.testing.assert_allclose(u2, u1, rtol=1e-5, atol=1e-5 * s)


@pytest.mark.parametrize("shape,n", [("gamma", 32), ("rect", 32)])
def test_jacobi_kernel_matches_jnp_sweep(shape, n):
    """The fused Jacobi-sweep kernel (FMG polish fast path) must reproduce
    x + (ω/d)·(b − A x) of the jnp level to f32 round-off."""
    dom = Domain2D(nx=n, ny=n, shape=shape)
    M = MultigridPreconditioner.from_domain(
        dom, fuse=True, fuse_min_extent=16, interpret=True
    )
    from iterative_solvers_tpu.solvers.multigrid import _FusedLevel

    lev = M.levels[0]
    assert isinstance(lev, _FusedLevel)
    rng = np.random.default_rng(3)
    jl = lev.jnp_level
    x = jl.mask(jnp.asarray(rng.standard_normal(dom.grid_shape), jnp.float32))
    b = jl.mask(jnp.asarray(rng.standard_normal(dom.grid_shape), jnp.float32))
    want = x + jl.omega_over_diag * (b - jl.apply(x))
    got = lev.kernels.jacobi(lev.pad_in(x), lev.pad_in(b))[: lev.h, : lev.w]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-6 * float(jnp.abs(want).max())
    )


def test_jacobi3d_kernel_matches_jnp_sweep():
    from iterative_solvers_tpu.core.domain import Domain3D
    from iterative_solvers_tpu.solvers.multigrid import _FusedLevel3D

    dom = Domain3D(nx=16, ny=16, nz=16)
    M = MultigridPreconditioner.from_domain(
        dom, fuse=True, fuse_min_extent=16, interpret=True
    )
    lev = M.levels[0]
    assert isinstance(lev, _FusedLevel3D)
    jl = lev.jnp_level
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    x = jl.mask(jax.random.normal(k1, dom.grid_shape).astype(jnp.float32))
    b = jl.mask(jax.random.normal(k2, dom.grid_shape).astype(jnp.float32))
    want = x + jl.omega_over_diag * (b - jl.apply(x))
    got = lev.kernels.jacobi(lev.pad_in(x), lev.pad_in(b))[:, : lev.h, : lev.w]
    scale = float(jnp.abs(want).max())
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=2e-6 * scale
    )


def test_fmg_polish_pallas_path_matches_jnp():
    """fmg_stepwise with a polish cutoff must produce the same warm start
    whether the smoothing sweeps run the fused Jacobi kernel or the jnp
    fallback (forced via a small polish_max_extent so fine levels smooth)."""
    from iterative_solvers_tpu.core.problem import PoissonProblem

    dom = Domain2D(nx=32, ny=32)
    prob = PoissonProblem.manufactured(dom)
    b = prob.rhs_field(jnp.float32)
    M_fused = MultigridPreconditioner.from_domain(
        dom, fuse=True, fuse_min_extent=16, interpret=True
    ).with_fmg(prob)
    M_jnp = MultigridPreconditioner.from_domain(dom, fuse=False).with_fmg(prob)
    x_fused = M_fused.fmg_stepwise(b, 1, polish_max_extent=8, smooth_sweeps=4)
    x_jnp = M_jnp.fmg_stepwise(b, 1, polish_max_extent=8, smooth_sweeps=4)
    scale = float(jnp.abs(x_jnp).max())
    np.testing.assert_allclose(
        np.asarray(x_fused), np.asarray(x_jnp), atol=1e-5 * scale
    )


def test_fused3d_auto_chunk_default_matches_per_plane():
    """fuse_block_z=None now auto-selects z-chunked legs (bz=8) on levels
    with D >= 32 — incl. ragged D (33 % 8 != 0). The auto default must
    reproduce the per-plane V-cycle to FMA round-off."""
    from iterative_solvers_tpu.core.domain import Domain3D
    from iterative_solvers_tpu.solvers.multigrid import _FusedLevel3D

    dom = Domain3D(nx=32, ny=32, nz=32)  # D=33: ragged against bz=8
    M_auto = MultigridPreconditioner.from_domain(
        dom, fuse=True, fuse_min_extent=16, interpret=True
    )
    M_pp = MultigridPreconditioner.from_domain(
        dom, fuse=True, fuse_min_extent=16, interpret=True, fuse_block_z=1
    )
    lev = M_auto.levels[0]
    assert isinstance(lev, _FusedLevel3D) and lev.kernels.block_z == 8
    assert M_auto.levels[1].kernels.block_z == 1  # D=17 < 32 stays per-plane
    assert M_pp.levels[0].kernels.block_z == 1
    r = M_pp.levels[0].mask(
        jax.random.normal(jax.random.PRNGKey(2), dom.grid_shape).astype(
            jnp.float32
        )
    )
    z_auto = np.asarray(M_auto(r))
    z_pp = np.asarray(M_pp(r))
    scale = max(np.abs(z_pp).max(), 1e-30)
    np.testing.assert_allclose(z_auto, z_pp, rtol=1e-5, atol=1e-5 * scale)


def test_jacobi3d_chunked_matches_per_plane():
    """The z-chunked Jacobi sweep (auto default at D>=32, ragged D=33) must
    reproduce the per-plane sweep kernel to FMA round-off."""
    from iterative_solvers_tpu.core.domain import Domain3D
    from iterative_solvers_tpu.solvers.multigrid import _FusedLevel3D

    dom = Domain3D(nx=32, ny=32, nz=32)
    M_c = MultigridPreconditioner.from_domain(
        dom, fuse=True, fuse_min_extent=16, interpret=True
    )
    M_p = MultigridPreconditioner.from_domain(
        dom, fuse=True, fuse_min_extent=16, interpret=True, fuse_block_z=1
    )
    lev_c, lev_p = M_c.levels[0], M_p.levels[0]
    assert lev_c.kernels.block_z == 8 and lev_p.kernels.block_z == 1
    k1, k2 = jax.random.split(jax.random.PRNGKey(9))
    jl = lev_p.jnp_level
    x = jl.mask(jax.random.normal(k1, dom.grid_shape).astype(jnp.float32))
    b = jl.mask(jax.random.normal(k2, dom.grid_shape).astype(jnp.float32))
    xp, bp = lev_p.pad_in(x), lev_p.pad_in(b)
    got_c = np.asarray(lev_c.kernels.jacobi(xp, bp))
    got_p = np.asarray(lev_p.kernels.jacobi(xp, bp))
    scale = max(np.abs(got_p).max(), 1e-30)
    np.testing.assert_allclose(got_c, got_p, rtol=1e-5, atol=1e-5 * scale)
