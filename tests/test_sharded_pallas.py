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


# --- sharded fused V-cycle (parallel/mg_sharded.py) -------------------------


def _masked_noise(dom, seed=0):
    rng = np.random.default_rng(seed)
    r = rng.standard_normal(dom.grid_shape)
    return np.where(np.asarray(dom.interior), r, 0).astype(np.float32)


@pytest.mark.parametrize("mesh_shape", [(4, 2), (8, 1), (1, 8)])
@pytest.mark.parametrize("shape", ["gamma", "rect"])
def test_sharded_fused_vcycle_matches_jnp(mesh_shape, shape):
    from iterative_solvers_tpu.parallel.mg_sharded import ShardedFusedMultigrid
    from iterative_solvers_tpu.solvers.multigrid import MultigridPreconditioner

    dom = Domain2D(nx=64, ny=64, shape=shape)
    mesh = make_solver_mesh(8, mesh_shape)
    op = ShardedPallasStencilOperator.from_domain(dom, mesh, block_rows=16)
    M = ShardedFusedMultigrid.from_operator(op, dom, fuse_min_extent=33)
    assert len(M.levels) >= 1  # the fused sharded leg is actually exercised
    Mref = MultigridPreconditioner.from_domain(dom, fuse=False)
    r = _masked_noise(dom)
    z_ref = np.asarray(Mref(jnp.asarray(r)))
    z_sh = np.asarray(op.crop(M(op.shard(r))))
    scale = np.abs(z_ref).max()
    np.testing.assert_allclose(z_sh / scale, z_ref / scale, atol=1e-5)


def test_sharded_fused_vcycle_two_levels_and_symmetry():
    from iterative_solvers_tpu.parallel.mg_sharded import ShardedFusedMultigrid
    from iterative_solvers_tpu.solvers.multigrid import MultigridPreconditioner

    dom = Domain2D(nx=128, ny=128)
    mesh = make_solver_mesh(4, (2, 2))
    op = ShardedPallasStencilOperator.from_domain(dom, mesh, block_rows=32)
    M = ShardedFusedMultigrid.from_operator(op, dom, fuse_min_extent=33)
    assert len(M.levels) == 2
    Mref = MultigridPreconditioner.from_domain(dom, fuse=False)
    r = _masked_noise(dom)
    z_ref = np.asarray(Mref(jnp.asarray(r)))
    z_sh = np.asarray(op.crop(M(op.shard(r))))
    scale = np.abs(z_ref).max()
    np.testing.assert_allclose(z_sh / scale, z_ref / scale, atol=1e-5)
    # symmetry (PCG-safety): (u, Mv) == (v, Mu) to f32 round-off
    u = op.shard(_masked_noise(dom, 1))
    v = op.shard(_masked_noise(dom, 2))
    d1 = float(jnp.sum(u * M(v)))
    d2 = float(jnp.sum(v * M(u)))
    assert abs(d1 - d2) / abs(d1) < 1e-5


def test_sharded_fused_pcg_iteration_count():
    """MG-PCG through the sharded fast path takes the same iteration path as
    the single-chip jnp MG-PCG."""
    from iterative_solvers_tpu.parallel.mg_sharded import ShardedFusedMultigrid
    from iterative_solvers_tpu.solvers.multigrid import MultigridPreconditioner

    dom = Domain2D(nx=64, ny=64)
    mesh = make_solver_mesh(8, (4, 2))
    op = ShardedPallasStencilOperator.from_domain(dom, mesh, block_rows=16)
    M = ShardedFusedMultigrid.from_operator(op, dom, fuse_min_extent=33)
    prob = PoissonProblem.manufactured(dom)
    stop = StopConfig(eps_precision=-1, eps_residual=1e-4, max_iterations=100)
    res = cg_solve(
        op,
        op.shard(prob.rhs_field(jnp.float32)),
        options=CGOptions(stop=stop, preconditioner=M),
    )
    from iterative_solvers_tpu.ops.stencil import StencilOperator

    res1 = cg_solve(
        StencilOperator.from_domain(dom),
        prob.rhs_field(jnp.float32),
        options=CGOptions(
            stop=stop, preconditioner=MultigridPreconditioner.from_domain(dom, fuse=False)
        ),
    )
    assert res.converged
    assert abs(res.iterations - res1.iterations) <= 1
    np.testing.assert_allclose(
        np.asarray(op.crop(res.x)), np.asarray(res1.x), atol=2e-5
    )


def test_mesh_device_ir_sharded_fast_path():
    """The one-dispatch device-side refinement loop over the mesh with the
    sharded Pallas operator + sharded fused V-cycle (VERDICT r2 item 2)."""
    from iterative_solvers_tpu.parallel.halo import ShardedStencilOperator
    from iterative_solvers_tpu.parallel.mg_sharded import ShardedFusedMultigrid
    from iterative_solvers_tpu.solvers.refine import device_refined_solve

    dom = Domain2D(nx=64, ny=64)
    mesh = make_solver_mesh(8, (4, 2))
    prob = PoissonProblem.manufactured(dom)
    pop = ShardedPallasStencilOperator.from_domain(dom, mesh, block_rows=16)
    M = ShardedFusedMultigrid.from_operator(pop, dom, fuse_min_extent=33)
    assert len(M.levels) >= 1
    A_hi = ShardedStencilOperator(
        mesh=mesh,
        coeffs=pop.coeffs,
        grid_shape=pop.grid_shape,
        padded_shape=pop.padded_shape,
        mask_kind=pop.mask_mode,
        dims=(dom.nx, dom.ny),
    )
    b64 = pop.shard(prob.rhs_field(jnp.float64))
    res = device_refined_solve(
        A_hi,
        pop,
        b64,
        preconditioner=M,
        stop=StopConfig(
            eps_precision=-1.0,
            eps_residual=-1.0,
            eps_exact_error=-1.0,
            eps_relative=1e-8,
            max_iterations=10000,
        ),
    )
    assert res.converged
    assert res.residual_norm < 1e-8 * res.initial_residual_norm


def test_facade_mesh_pallas_mg_and_mixed():
    """DirichletSolver(mesh=..., operator='pallas') end-to-end."""
    from iterative_solvers_tpu.api import DirichletSolver

    mesh = make_solver_mesh(8)
    s = DirichletSolver(
        nx=64, ny=64, operator="pallas", preconditioner="mg", mesh=mesh,
        stop=StopConfig(eps_precision=-1, eps_residual=1e-3, max_iterations=50),
    )
    res = s.solve(record_history=False)
    assert res.converged and res.iterations <= 15

    s1 = DirichletSolver(
        nx=64, ny=64, preconditioner="mg",
        stop=StopConfig(eps_precision=-1, eps_residual=1e-3, max_iterations=50),
    )
    res1 = s1.solve(record_history=False)
    np.testing.assert_allclose(res.solution, res1.solution, atol=1e-4)

    s2 = DirichletSolver(
        nx=64, ny=64, operator="pallas", preconditioner="mg",
        precision="mixed", mesh=mesh,
        stop=StopConfig(eps_precision=-1, eps_residual=1e-6, max_iterations=10000),
    )
    res2 = s2.solve(record_history=False)
    assert res2.converged and res2.residual_norm < 1e-6


def test_facade_mesh_pallas_validation():
    from iterative_solvers_tpu.api import DirichletSolver
    from iterative_solvers_tpu.core.domain import Domain2D as D2

    mesh = make_solver_mesh(8)
    with pytest.raises(ValueError, match="gamma/rect"):
        DirichletSolver(
            domain=D2(nx=16, ny=16, shape="custom", inside_fn=lambda x, y: x > 0),
            operator="pallas",
            mesh=mesh,
        )
    # mesh + 'fused' is valid since the sharded engine landed; 3D is not
    DirichletSolver(nx=16, ny=16, operator="fused", mesh=mesh)
    from iterative_solvers_tpu.core.domain import Domain3D

    with pytest.raises(ValueError, match="2D-only"):
        DirichletSolver(
            domain=Domain3D(nx=8, ny=8, nz=8), operator="fused", mesh=mesh
        )


def test_sharded_fused_vcycle_hybrid_mesh():
    """Shard-fused V-cycle on a 3-axis DCN x ICI mesh (row halos over the
    combined ('slice','y') axes)."""
    from iterative_solvers_tpu.parallel.mg_sharded import ShardedFusedMultigrid
    from iterative_solvers_tpu.solvers.multigrid import MultigridPreconditioner

    devs = np.asarray(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(devs, ("slice", "y", "x"))
    dom = Domain2D(nx=64, ny=64)
    op = ShardedPallasStencilOperator.from_domain(dom, mesh, block_rows=16)
    M = ShardedFusedMultigrid.from_operator(op, dom, fuse_min_extent=33)
    assert len(M.levels) >= 1
    Mref = MultigridPreconditioner.from_domain(dom, fuse=False)
    r = _masked_noise(dom)
    z_ref = np.asarray(Mref(jnp.asarray(r)))
    z_sh = np.asarray(op.crop(M(op.shard(r))))
    scale = np.abs(z_ref).max()
    np.testing.assert_allclose(z_sh / scale, z_ref / scale, atol=1e-5)


def test_facade_mesh_pallas_jacobi():
    """Non-MG preconditioners work with the sharded Pallas operator too
    (diagonal built from the iota mask on the operator's padded layout)."""
    from iterative_solvers_tpu.api import DirichletSolver

    mesh = make_solver_mesh(8)
    s = DirichletSolver(
        nx=32, ny=32, operator="pallas", preconditioner="jacobi", mesh=mesh,
        stop=StopConfig(eps_precision=-1, eps_residual=1e-4, max_iterations=3000),
    )
    res = s.solve(record_history=False)
    assert res.converged


# --- sharded fused CG engine (parallel/cg_fused_sharded.py) ------------------


def test_sharded_fused_engine_msg_matches_single_chip():
    from iterative_solvers_tpu.kernels.cg_fused import fused_cg_solve
    from iterative_solvers_tpu.kernels.stencil_pallas import PallasStencilOperator
    from iterative_solvers_tpu.parallel.cg_fused_sharded import (
        sharded_fused_cg_solve,
    )

    dom = Domain2D(nx=64, ny=64)
    prob = PoissonProblem.manufactured(dom)
    stop = StopConfig(eps_precision=-1, eps_residual=1e-3, max_iterations=500)
    b32 = prob.rhs_field(jnp.float32)
    ref = fused_cg_solve(
        PallasStencilOperator.from_domain(dom), b32,
        options=CGOptions(stop=stop),
    )
    mesh = make_solver_mesh(8, (4, 2))
    op = ShardedPallasStencilOperator.from_domain(dom, mesh, block_rows=16)
    res = sharded_fused_cg_solve(op, b32, options=CGOptions(stop=stop))
    assert res.converged
    assert res.iterations == ref.iterations  # identical recurrence path
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(ref.x), atol=2e-5
    )


def test_sharded_fused_engine_pcg_matches_single_chip():
    from iterative_solvers_tpu.kernels.cg_fused import fused_cg_solve
    from iterative_solvers_tpu.kernels.stencil_pallas import PallasStencilOperator
    from iterative_solvers_tpu.parallel.cg_fused_sharded import (
        sharded_fused_cg_solve,
    )
    from iterative_solvers_tpu.parallel.mg_sharded import ShardedFusedMultigrid
    from iterative_solvers_tpu.solvers.multigrid import (
        MultigridPreconditioner,
        PaddedPreconditioner,
    )

    dom = Domain2D(nx=64, ny=64)
    prob = PoissonProblem.manufactured(dom)
    stop = StopConfig(eps_precision=-1, eps_residual=1e-3, max_iterations=100)
    b32 = prob.rhs_field(jnp.float32)
    pop1 = PallasStencilOperator.from_domain(dom)
    M1 = PaddedPreconditioner(
        inner=MultigridPreconditioner.from_domain(dom, fuse=False),
        padded_op=pop1,
    )
    ref = fused_cg_solve(
        pop1, b32, options=CGOptions(stop=stop, preconditioner=M1)
    )
    mesh = make_solver_mesh(8, (4, 2))
    op = ShardedPallasStencilOperator.from_domain(dom, mesh, block_rows=16)
    M = ShardedFusedMultigrid.from_operator(op, dom, fuse_min_extent=33)
    res = sharded_fused_cg_solve(
        op, b32, options=CGOptions(stop=stop, preconditioner=M)
    )
    assert res.converged
    assert abs(res.iterations - ref.iterations) <= 1
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(ref.x), atol=2e-5
    )


def test_engine_refined_solve_over_mesh():
    """The whole mixed-precision IR ladder in one dispatch with the sharded
    fused engine + shard-fused V-cycle."""
    from iterative_solvers_tpu.parallel.cg_fused_sharded import (
        ShardedFusedCGEngine,
    )
    from iterative_solvers_tpu.parallel.halo import ShardedStencilOperator
    from iterative_solvers_tpu.parallel.mg_sharded import ShardedFusedMultigrid
    from iterative_solvers_tpu.solvers.refine import engine_refined_solve

    dom = Domain2D(nx=64, ny=64)
    prob = PoissonProblem.manufactured(dom)
    mesh = make_solver_mesh(8, (4, 2))
    pop = ShardedPallasStencilOperator.from_domain(dom, mesh, block_rows=16)
    M = ShardedFusedMultigrid.from_operator(pop, dom, fuse_min_extent=33)
    engine = ShardedFusedCGEngine(pop, M)
    A_hi = ShardedStencilOperator(
        mesh=mesh, coeffs=pop.coeffs, grid_shape=pop.grid_shape,
        padded_shape=pop.padded_shape, mask_kind=pop.mask_mode,
        dims=(dom.nx, dom.ny),
    )
    b64 = pop.shard(prob.rhs_field(jnp.float64))
    res = engine_refined_solve(
        engine, A_hi, b64,
        stop=StopConfig(
            eps_precision=-1.0, eps_residual=-1.0, eps_exact_error=-1.0,
            eps_relative=1e-8, max_iterations=10000,
        ),
    )
    assert res.converged
    assert res.residual_norm < 1e-8 * res.initial_residual_norm
    assert res.history is not None and res.history.shape[1] == 5
    # FMG warm start over the mesh (round 3): payload attached to the jnp
    # inner hierarchy, warm ladder must converge to the same criterion in
    # no more inner iterations than the cold start
    warm = engine_refined_solve(
        engine.replace_M(M.with_fmg(prob)) if hasattr(engine, "replace_M")
        else type(engine)(pop, M.with_fmg(prob)),
        A_hi, b64,
        stop=StopConfig(
            eps_precision=-1.0, eps_residual=-1.0, eps_exact_error=-1.0,
            eps_relative=1e-8, max_iterations=10000,
        ),
        fmg=True,
    )
    assert warm.converged
    assert warm.residual_norm < 1e-8 * warm.initial_residual_norm
    assert warm.iterations <= res.iterations, (warm.iterations, res.iterations)


def test_facade_mesh_fused_paths():
    from iterative_solvers_tpu.api import DirichletSolver

    mesh = make_solver_mesh(8)
    stop = StopConfig(eps_precision=-1, eps_residual=1e-3, max_iterations=500)
    r = DirichletSolver(nx=64, ny=64, operator="fused", mesh=mesh, stop=stop).solve(
        record_history=False
    )
    assert r.converged
    r0 = DirichletSolver(nx=64, ny=64, stop=stop).solve(record_history=False)
    np.testing.assert_allclose(r.solution, r0.solution, atol=1e-4)

    r2 = DirichletSolver(
        nx=64, ny=64, operator="fused", preconditioner="mg", mesh=mesh,
        stop=StopConfig(eps_precision=-1, eps_residual=1e-3, max_iterations=100),
    ).solve(record_history=False)
    assert r2.converged and r2.iterations <= 15

    r3 = DirichletSolver(
        nx=64, ny=64, operator="fused", preconditioner="mg",
        precision="mixed", mesh=mesh,
        stop=StopConfig(eps_precision=-1, eps_residual=1e-6, max_iterations=10000),
    ).solve(record_history=False)
    assert r3.converged and r3.residual_norm < 1e-6


# --- 3D sharded Pallas operator ----------------------------------------------


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 2), (1, 8)])
def test_sharded_pallas_3d_matches_local(mesh_shape):
    from iterative_solvers_tpu.core.domain import Domain3D
    from iterative_solvers_tpu.parallel.halo_pallas import (
        ShardedPallas3DStencilOperator,
    )

    dom = Domain3D(nx=18, ny=14, nz=22)
    mesh = make_solver_mesh(mesh_shape[0] * mesh_shape[1], mesh_shape)
    local = StencilOperator.from_domain(dom)
    op = ShardedPallas3DStencilOperator.from_domain(dom, mesh, block_rows=8)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(dom.grid_shape)
    y_local = np.asarray(local(jnp.asarray(x)))
    y_shard = np.asarray(op.crop(op(op.shard(x))))
    np.testing.assert_allclose(y_shard, y_local, rtol=1e-11, atol=1e-11)


def test_facade_mesh_pallas_3d():
    from iterative_solvers_tpu.api import DirichletSolver
    from iterative_solvers_tpu.core.domain import Domain3D

    mesh = make_solver_mesh(8)
    dom = Domain3D(nx=16, ny=16, nz=16)
    stop = StopConfig(eps_precision=-1, eps_residual=1e-4, max_iterations=3000)
    r = DirichletSolver(domain=dom, operator="pallas", mesh=mesh, stop=stop).solve(
        record_history=False
    )
    assert r.converged
    r0 = DirichletSolver(domain=dom, stop=stop).solve(record_history=False)
    assert r.iterations == r0.iterations
    np.testing.assert_allclose(r.solution, r0.solution, atol=1e-8)

    r2 = DirichletSolver(
        domain=dom, operator="pallas", preconditioner="mg",
        precision="mixed", mesh=mesh,
        stop=StopConfig(eps_precision=-1, eps_residual=1e-7, max_iterations=10000),
    ).solve(record_history=False)
    assert r2.converged and r2.residual_norm < 1e-7


@pytest.mark.parametrize("mesh_shape", [(4, 2), (1, 8)])
@pytest.mark.parametrize("shape", ["gamma", "rect"])
def test_sharded_fused_vcycle_call_with_dot(mesh_shape, shape):
    """The PCG (r, w) dot fused into the finest sharded K_up's epilogue
    matches the separate two-field reduction exactly on w and to f32
    round-off on the dot."""
    from iterative_solvers_tpu.parallel.mg_sharded import ShardedFusedMultigrid

    dom = Domain2D(nx=64, ny=64, shape=shape)
    mesh = make_solver_mesh(8, mesh_shape)
    op = ShardedPallasStencilOperator.from_domain(dom, mesh, block_rows=16)
    M = ShardedFusedMultigrid.from_operator(op, dom, fuse_min_extent=33)
    assert len(M.levels) >= 1
    rng = np.random.default_rng(3)
    r = np.where(
        np.asarray(dom.interior), rng.standard_normal(dom.grid_shape), 0
    ).astype(np.float32)
    rs = op.shard(r)
    w_ref = M(rs)
    dot_ref = float(jnp.sum(rs * w_ref))
    w, rz = M.call_with_dot(rs)
    np.testing.assert_array_equal(np.asarray(w), np.asarray(w_ref))
    np.testing.assert_allclose(float(rz), dot_ref, rtol=1e-5)


def test_sharded_fmg_stepwise_matches_monolithic():
    """Mesh FMG via per-level GSPMD programs (fmg_stepwise, what the mesh
    engine-IR ladder dispatches) equals the monolithic mesh fmg() to f32
    round-off — iota masks and lazy payload recipes shard like any op."""
    from iterative_solvers_tpu.core.problem import PoissonProblem
    from iterative_solvers_tpu.parallel.mg_sharded import ShardedFusedMultigrid

    dom = Domain2D(nx=64, ny=64)
    prob = PoissonProblem.manufactured(dom)
    mesh = make_solver_mesh(8, (4, 2))
    op = ShardedPallasStencilOperator.from_domain(dom, mesh, block_rows=16)
    M = ShardedFusedMultigrid.from_operator(op, dom, fuse_min_extent=33).with_fmg(prob)
    b = op.shard(np.asarray(prob.rhs_field(jnp.float32)))
    x_mono = np.asarray(op.crop(M.fmg(b)))
    x_step = np.asarray(op.crop(M.fmg_stepwise(b)))
    scale = np.abs(x_mono).max()
    np.testing.assert_allclose(x_step / scale, x_mono / scale, atol=1e-5)
    # the smoothing-polish variant still lands a deep warm start
    from iterative_solvers_tpu.ops.stencil import StencilOperator

    x_sm = np.asarray(
        op.crop(M.fmg_stepwise(b, polish_max_extent=32, smooth_sweeps=4))
    )
    A = StencilOperator.from_domain(dom)
    bb = np.asarray(prob.rhs_field(jnp.float32))
    rel = np.linalg.norm(bb - np.asarray(A(jnp.asarray(x_sm)))) / np.linalg.norm(bb)
    assert rel < 5e-3, rel
