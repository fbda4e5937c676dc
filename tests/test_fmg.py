"""Full multigrid (nested iteration) — multigrid.with_fmg/fmg and its use as
the warm start of the device-IR refinement ladder (refine.py fmg=True).

Extension beyond the reference (which has only plain CG). The FMG contract:
with the per-problem payload (rediscretized per-level RHS + BC-aware
prolongation), ONE O(N) pass lands the error at the discretization level —
the optimal route to the reference's EXACT_ERROR criterion class
(reference solver/msg_solver.cpp:157-162).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from iterative_solvers_tpu.core.domain import Domain2D, Domain3D
from iterative_solvers_tpu.core.problem import PoissonProblem
from iterative_solvers_tpu.ops.stencil import StencilOperator
from iterative_solvers_tpu.solvers.multigrid import MultigridPreconditioner
from iterative_solvers_tpu.solvers.stopping import StopConfig


def _setup(n, shape="gamma", dtype=jnp.float64):
    dom = Domain2D(nx=n, ny=n, shape=shape)
    prob = PoissonProblem.manufactured(dom)
    op = StencilOperator.from_domain(dom)
    b = prob.rhs_field(dtype)
    return dom, prob, op, b


@pytest.mark.parametrize("shape", ["gamma", "rect"])
def test_fmg_lands_at_discretization_error(shape):
    dom, prob, op, b = _setup(64, shape)
    M = MultigridPreconditioner.from_domain(dom).with_fmg(prob, dtype=jnp.float64)
    x = M.fmg(b)
    # error at the discretization level in one pass (observed constant
    # ~60/n² max-norm for the manufactured problem, .claude verify notes)
    u = prob.true_solution_field(jnp.float64)
    err = float(jnp.max(jnp.abs(jnp.where(jnp.asarray(dom.interior), x - u, 0.0))))
    assert err < 1.5 * 60.0 / dom.nx**2, err
    # and >2 decades of relative residual (the warm-start currency)
    rel = float(jnp.linalg.norm(b - op(x)) / jnp.linalg.norm(b))
    assert rel < 5e-3, rel


def test_fmg_algebraic_fallback_without_payload():
    """Without with_fmg, fmg still runs (restricted RHS, zero-BC
    prolongation) but is only a mild warm start — document that contract."""
    dom, prob, op, b = _setup(64)
    M = MultigridPreconditioner.from_domain(dom)
    x = M.fmg(b)
    rel = float(jnp.linalg.norm(b - op(x)) / jnp.linalg.norm(b))
    assert rel < 0.5, rel


def test_fmg_fallback_is_linear():
    dom, prob, op, b = _setup(32)
    M = MultigridPreconditioner.from_domain(dom)
    b2 = jnp.where(jnp.asarray(dom.interior), jnp.sin(7.0 * b), 0.0)
    x_sum = M.fmg(b + 2.5 * b2)
    x_parts = M.fmg(b) + 2.5 * M.fmg(b2)
    np.testing.assert_allclose(
        np.asarray(x_sum), np.asarray(x_parts), rtol=1e-10, atol=1e-10
    )


def test_fmg_3d():
    """3D: the manufactured exp(xyz) problem is much sharper than the 2D one
    (u spans e¹..e⁸ on [1,2]³), so the per-level interpolation constant is
    large and FMG needs n_vcycles > 1 of polish — each extra V-cycle must
    contract the error by ~3x toward the discretization level (measured:
    43x/15x/6x of disc error for nv=1/2/3 at 16³)."""
    dom = Domain3D(nx=16, ny=16, nz=16, x0=1, x1=2, y0=1, y1=2, z0=1, z1=2)
    prob = PoissonProblem.manufactured(dom)
    op = StencilOperator.from_domain(dom)
    b = prob.rhs_field(jnp.float64)
    M = MultigridPreconditioner.from_domain(dom).with_fmg(prob, dtype=jnp.float64)
    u = prob.true_solution_field(jnp.float64)
    interior = jnp.asarray(dom.interior)
    disc = 0.575  # measured tight-solve discretization error at 16³
    errs = []
    for nv in (1, 2, 3):
        x = M.fmg(b, n_vcycles=nv)
        errs.append(
            float(jnp.max(jnp.abs(jnp.where(interior, x - u, 0.0))))
        )
    assert errs[2] < errs[1] < errs[0], errs
    assert errs[2] < 8 * disc, errs
    rel = float(jnp.linalg.norm(b - op(M.fmg(b))) / jnp.linalg.norm(b))
    assert rel < 5e-2, rel  # >1.5 residual decades even at nv=1


def test_fmg_error_shrinks_like_h2():
    """FMG output must track the O(h²) discretization error, not stall."""
    errs = {}
    for n in (32, 64):
        dom, prob, op, b = _setup(n)
        M = MultigridPreconditioner.from_domain(dom).with_fmg(
            prob, dtype=jnp.float64
        )
        u = prob.true_solution_field(jnp.float64)
        x = M.fmg(b)
        errs[n] = float(
            jnp.max(jnp.abs(jnp.where(jnp.asarray(dom.interior), x - u, 0.0)))
        )
    assert errs[64] < errs[32] / 2.5, errs  # ~4x expected for h -> h/2


def test_fused_device_loop_fmg():
    """The single-chip headline path (fused_refined_solve) with fmg=True:
    fewer inner iterations, same criterion (interpret-mode kernels on CPU)."""
    from iterative_solvers_tpu.kernels.stencil_pallas import PallasStencilOperator
    from iterative_solvers_tpu.solvers.multigrid import PaddedPreconditioner
    from iterative_solvers_tpu.solvers.refine import fused_refined_solve

    dom, prob, op, b64 = _setup(32)
    pop = PallasStencilOperator.from_domain(dom)
    M = MultigridPreconditioner.from_domain(dom).with_fmg(prob)
    Mp = PaddedPreconditioner(inner=M, padded_op=pop)
    stop = StopConfig(
        eps_precision=-1, eps_residual=-1, eps_relative=1e-9, max_iterations=10000
    )
    cold = fused_refined_solve(pop, Mp, b64, stop=stop, fmg=False)
    warm = fused_refined_solve(pop, Mp, b64, stop=stop, fmg=True)
    for res in (cold, warm):
        assert res.converged
        assert res.residual_norm / res.initial_residual_norm < 1e-8
    assert warm.iterations < cold.iterations, (warm.iterations, cold.iterations)


def test_facade_attaches_fmg_payload():
    """precision='mixed' + preconditioner='mg' must carry the FMG payload
    through the facade's cached adapters (used by the device-IR paths)."""
    from iterative_solvers_tpu import DirichletSolver
    from iterative_solvers_tpu.api import _attach_fmg
    from iterative_solvers_tpu.solvers.multigrid import PaddedPreconditioner

    s = DirichletSolver(nx=32, ny=32, preconditioner="mg", precision="mixed")
    res = s.solve()
    assert res.converged
    M = s._M
    inner = M.inner if isinstance(M, PaddedPreconditioner) else M
    assert inner.fmg_data is not None
    # without mixed precision the payload is NOT paid for
    s2 = DirichletSolver(nx=32, ny=32, preconditioner="mg")
    s2.solve()
    M2 = s2._M
    inner2 = M2.inner if isinstance(M2, PaddedPreconditioner) else M2
    assert inner2.fmg_data is None


def test_device_ir_fmg_converges_same_criterion():
    """Generic device-IR ladder, cold vs FMG start: both converge to the
    relative criterion; the FMG start must not take MORE inner iterations."""
    from iterative_solvers_tpu.solvers.refine import device_refined_solve

    dom, prob, op, b = _setup(128)
    M = MultigridPreconditioner.from_domain(dom).with_fmg(prob)
    stop = StopConfig(
        eps_precision=-1, eps_residual=-1, eps_relative=1e-8, max_iterations=10000
    )
    cold = device_refined_solve(op, op, b, preconditioner=M, stop=stop, fmg=False)
    warm = device_refined_solve(op, op, b, preconditioner=M, stop=stop, fmg=True)
    for res in (cold, warm):
        assert res.converged
        assert res.residual_norm / res.initial_residual_norm < 1e-8 * 10
    assert warm.iterations <= cold.iterations, (warm.iterations, cold.iterations)
    np.testing.assert_allclose(
        np.asarray(warm.x), np.asarray(cold.x), rtol=0, atol=1e-7
    )


def test_supports_fmg_probes_through_adapters():
    """_maybe_fmg_x0 must skip the warm start when an adapter's inner has no
    real fmg (the padded/sharded adapters delegate unconditionally — probing
    only the outer object used to trace into an AttributeError)."""
    from iterative_solvers_tpu.kernels.stencil_pallas import PallasStencilOperator
    from iterative_solvers_tpu.solvers.multigrid import PaddedPreconditioner
    from iterative_solvers_tpu.solvers.refine import _maybe_fmg_x0, _supports_fmg

    dom, prob, op, b = _setup(32)
    pop = PallasStencilOperator.from_domain(dom)
    M = MultigridPreconditioner.from_domain(dom)
    assert _supports_fmg(M)
    assert _supports_fmg(PaddedPreconditioner(inner=M, padded_op=pop))
    jacobi = PaddedPreconditioner(inner=lambda r: 0.25 * r, padded_op=pop)
    assert not _supports_fmg(jacobi)
    assert not _supports_fmg(lambda r: r)
    # end-to-end: fmg=True with a non-MG inner cleanly skips the warm start
    assert _maybe_fmg_x0(jacobi, True, pop.pad(b.astype(jnp.float32))) is None


def test_fused_ir_parts_no_double_padding():
    """Facade device-IR cache: when M is already adapted to the operator's
    padded layout, _fused_ir_parts must reuse it — a second
    PaddedPreconditioner wrap pads twice and breaks every shape in the
    trace (round-3 review finding)."""
    from iterative_solvers_tpu import DirichletSolver
    from iterative_solvers_tpu.kernels.stencil_pallas import PallasStencilOperator
    from iterative_solvers_tpu.solvers.multigrid import PaddedPreconditioner
    from iterative_solvers_tpu.solvers.refine import fused_refined_solve

    dom, prob, op, b64 = _setup(32)
    s = DirichletSolver(domain=dom, preconditioner="mg", precision="mixed")
    pop = PallasStencilOperator.from_domain(dom)
    M = MultigridPreconditioner.from_domain(dom).with_fmg(prob)
    Mp = PaddedPreconditioner(inner=M, padded_op=pop)

    pop2, Mp2 = s._fused_ir_parts(dom, Mp)
    assert Mp2 is Mp and pop2 is pop  # reused, not re-wrapped
    pop3, Mp3 = s._fused_ir_parts(dom, M)
    assert isinstance(Mp3, PaddedPreconditioner) and Mp3.inner is M
    assert not isinstance(Mp3.inner, PaddedPreconditioner)

    # the fused device-IR program traces and converges on the reused parts
    stop = StopConfig(
        eps_precision=-1, eps_residual=-1, eps_relative=1e-8, max_iterations=10000
    )
    res = fused_refined_solve(pop2, Mp2, b64, stop=stop, fmg=True)
    assert res.converged


def test_facade_M_cache_rebuilds_on_precision_change():
    """The cached preconditioner depends on precision (FMG payload attach):
    toggling precision between solves must rebuild M, not reuse the
    payload-less entry (round-3 review finding)."""
    from iterative_solvers_tpu import DirichletSolver
    from iterative_solvers_tpu.solvers.multigrid import PaddedPreconditioner

    s = DirichletSolver(nx=32, ny=32, preconditioner="mg")
    s.solve()
    inner = s._M.inner if isinstance(s._M, PaddedPreconditioner) else s._M
    assert inner.fmg_data is None
    s.precision = "mixed"  # mirrors the reference's mutable-setter usage
    res = s.solve()
    assert res.converged
    inner = s._M.inner if isinstance(s._M, PaddedPreconditioner) else s._M
    assert inner.fmg_data is not None, "stale payload-less M reused from cache"


def test_fmg_cycles_knob_and_host_path_warm_start():
    """fmg_cycles plumbs n polish V-cycles end-to-end (round-3 review: the
    parameter was dead — no call path could pass it), and the host chunked
    ladder (live callback) gets the same FMG warm start as the device paths."""
    from iterative_solvers_tpu import DirichletSolver

    stop = StopConfig(
        eps_precision=-1, eps_residual=-1, eps_relative=1e-8, max_iterations=10000
    )
    counts = {}
    for nv in (0, 1, 2):
        s = DirichletSolver(
            nx=64, ny=64, preconditioner="mg", precision="mixed",
            stop=stop, fmg_cycles=nv,
        )
        # a live callback forces the host chunked path on every backend
        res = s.solve(callback=lambda k, p, r, e: None)
        assert res.converged
        counts[nv] = (res.history[0, 2], res.iterations)
    # cold start begins at the full RHS residual; FMG starts decades lower
    assert counts[1][0] < 1e-2 * counts[0][0]
    # extra polish only helps: never worse than FMG(1), total work no higher
    assert counts[2][0] <= counts[1][0] * 1.001
    assert counts[1][1] <= counts[0][1]

    with pytest.raises(ValueError, match="fmg_cycles"):
        DirichletSolver(nx=8, ny=8, fmg_cycles=-1)
    with pytest.raises(ValueError, match="fmg_cycles"):
        DirichletSolver(nx=8, ny=8, fmg_cycles=1.5)


def test_facade_M_cache_rebuilds_on_problem_swap():
    """Swapping the problem object must rebuild M even when CPython hands the
    new problem the old one's recycled id (round-3 review: the id()-only key
    could silently keep the stale FMG payload)."""
    import dataclasses as dc

    from iterative_solvers_tpu import DirichletSolver

    s = DirichletSolver(nx=32, ny=32, preconditioner="mg", precision="mixed")
    s.solve()
    M_first = s._M
    assert s._M_problem is s.problem  # the cache pins the problem object
    # same-grid problem with a scaled RHS: id() may or may not be recycled,
    # the identity check must catch the swap either way
    s.problem = dc.replace(
        s.problem, f=lambda x, y: 2.0 * (x**2 + y**2) * jnp.exp(x**2 - y**2)
    )
    res = s.solve()
    assert res.converged
    assert s._M is not M_first, "stale preconditioner reused after problem swap"
    assert s._M_problem is s.problem


@pytest.mark.parametrize("shape", ["gamma", "rect"])
def test_fmg_stepwise_matches_monolithic(shape):
    """fmg_stepwise (one compiled program per level — the compile-time fix
    for the monolithic O(levels²) FMG program) is the same op sequence as
    fmg(); only XLA fusion boundaries differ, so fields agree to f32
    round-off. Also covers the single-level hierarchy (coarsest == finest,
    payload RHS None) via the 30² grid."""
    for n, nv in ((64, 1), (64, 2), (30, 1)):
        if shape == "gamma" and n % 2:
            continue
        dom, prob, op, b = _setup(n, shape, dtype=jnp.float32)
        M = MultigridPreconditioner.from_domain(dom).with_fmg(prob)
        x_mono = np.asarray(M.fmg(b, nv))
        x_step = np.asarray(M.fmg_stepwise(b, nv))
        scale = np.max(np.abs(x_mono))
        assert np.max(np.abs(x_mono - x_step)) <= 1e-5 * scale


@pytest.mark.parametrize("shape", ["gamma", "rect"])
def test_fmg_stepwise_combine_matches_per_level(shape):
    """combine=True (the whole ladder as ONE program — saves ~2 ms of
    dispatch overhead per rung over a tunneled TPU) is the same trace as
    the per-level rung programs, so fields agree bit-exactly; covers the
    polish cutoff (mixed V-cycle / Jacobi-sweep rungs) and a single-level
    hierarchy (n=30)."""
    for n, cut in ((64, None), (64, 32), (30, None)):
        if shape == "gamma" and n % 2:
            continue
        dom, prob, op, b = _setup(n, shape, dtype=jnp.float32)
        M = MultigridPreconditioner.from_domain(dom).with_fmg(prob)
        a = np.asarray(M.fmg_stepwise(b, 1, polish_max_extent=cut, smooth_sweeps=2))
        c = np.asarray(
            M.fmg_stepwise(
                b, 1, polish_max_extent=cut, smooth_sweeps=2, combine=True
            )
        )
        assert np.max(np.abs(a - c)) <= 1e-6 * np.max(np.abs(a))


def test_fmg_stepwise_combine_matches_per_level_3d():
    dom = Domain3D(nx=16, ny=16, nz=16)
    prob = PoissonProblem.manufactured(dom)
    M = MultigridPreconditioner.from_domain(dom).with_fmg(prob)
    b = prob.rhs_field(jnp.float32)
    a = np.asarray(M.fmg_stepwise(b, 1, polish_max_extent=8, smooth_sweeps=2))
    c = np.asarray(
        M.fmg_stepwise(b, 1, polish_max_extent=8, smooth_sweeps=2, combine=True)
    )
    assert np.max(np.abs(a - c)) <= 1e-6 * np.max(np.abs(a))


def test_fmg_stepwise_requires_payload():
    dom, prob, op, b = _setup(32)
    M = MultigridPreconditioner.from_domain(dom)
    with pytest.raises(ValueError, match="with_fmg"):
        M.fmg_stepwise(b)


def test_fused_device_loop_uses_stepwise_fmg(monkeypatch):
    """The headline path's warm start routes through fmg_stepwise (the
    monolithic program is the compile-time hazard the round-3 bench timed
    out on); the solve still converges to the same criterion."""
    from iterative_solvers_tpu.kernels.stencil_pallas import PallasStencilOperator
    from iterative_solvers_tpu.solvers import refine
    from iterative_solvers_tpu.solvers.multigrid import PaddedPreconditioner
    from iterative_solvers_tpu.solvers.refine import fused_refined_solve

    dom, prob, op, b64 = _setup(32)
    pop = PallasStencilOperator.from_domain(dom)
    M = MultigridPreconditioner.from_domain(dom).with_fmg(prob)
    Mp = PaddedPreconditioner(inner=M, padded_op=pop)
    calls = []
    orig = type(M).fmg_stepwise
    monkeypatch.setattr(
        type(M), "fmg_stepwise",
        lambda self, b, nv=1, **kw: (calls.append(nv), orig(self, b, nv, **kw))[1],
    )

    def fail_monolithic(*a, **k):  # pragma: no cover - guard
        raise AssertionError("monolithic _fmg_start used on the payload path")

    monkeypatch.setattr(refine, "_fmg_start", fail_monolithic)
    stop = StopConfig(
        eps_precision=-1, eps_residual=-1, eps_relative=1e-9, max_iterations=10000
    )
    res = fused_refined_solve(pop, Mp, b64, stop=stop, fmg=True)
    assert res.converged and calls == [1]


def test_fmg_stepwise_smoothing_polish_quality():
    """With the polish cutoff, levels above the extent bound replace the
    V-cycle polish by weighted-Jacobi sweeps; the landing residual stays
    within ~2x of full polish (the compile-time/quality trade the official
    bench rides — refine._FMG_POLISH_MAX_EXTENT)."""
    dom, prob, op, b = _setup(256, dtype=jnp.float32)
    M = MultigridPreconditioner.from_domain(dom).with_fmg(prob)
    nb = float(jnp.linalg.norm(b))
    rel_full = float(jnp.linalg.norm(b - op(M.fmg_stepwise(b)))) / nb
    x = M.fmg_stepwise(b, polish_max_extent=64, smooth_sweeps=4)
    rel_smooth = float(jnp.linalg.norm(b - op(x))) / nb
    assert rel_smooth < 5e-4, rel_smooth  # still a >3-decade warm start
    assert rel_smooth < 10 * rel_full, (rel_smooth, rel_full)
    # without smoothing the skipped levels cost ~a decade — document why
    x0 = M.fmg_stepwise(b, polish_max_extent=64, smooth_sweeps=0)
    rel_none = float(jnp.linalg.norm(b - op(x0))) / nb
    assert rel_none > 2 * rel_smooth, (rel_none, rel_smooth)
