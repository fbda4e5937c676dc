"""Parity of the fused Pallas ff-residual kernels (kernels/resid_ff.py)
against the jnp reference ops/ddf32.residual_ff — same EFT arithmetic, one
HBM pass. Reference role: the all-double residual check of
solver/dirichlet_solver.cpp:147-161, kept f32-pair on TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iterative_solvers_tpu.core.domain import Domain2D, Domain3D
from iterative_solvers_tpu.kernels.resid_ff import ff_residual_fn
from iterative_solvers_tpu.ops.ddf32 import residual_ff, split_f64


def _pair_fields(rng, op, scale=1.0):
    """Random f64 field -> padded (hi, lo) f32 pair + the padded f64."""
    shp = op.padded_shape
    f64 = jnp.asarray(rng.standard_normal(shp) * scale)
    f64 = op.mask(f64)
    return split_f64(f64), f64


@pytest.mark.parametrize("shape,n", [("gamma", 32), ("rect", 48)])
def test_resid_ff_2d_matches_jnp(shape, n):
    from iterative_solvers_tpu.kernels.stencil_pallas import PallasStencilOperator
    from iterative_solvers_tpu.solvers.refine import _padded_hi_operator

    dom = Domain2D(nx=n, ny=n, shape=shape)
    pop = PallasStencilOperator.from_domain(dom)
    fn = ff_residual_fn(pop, pop.padded_shape)
    assert fn is not None
    A_hi = _padded_hi_operator(pop)
    rng = np.random.default_rng(7)
    b_pair, _ = _pair_fields(rng, pop, scale=1e4)
    x_pair, _ = _pair_fields(rng, pop)
    want_h, want_l = residual_ff(A_hi.interior, A_hi.coeffs, b_pair, x_pair)
    got_h, got_l = fn(b_pair, x_pair)
    np.testing.assert_array_equal(np.asarray(got_h), np.asarray(want_h))
    # low channel: the kernel mirrors the jnp op order exactly, but XLA may
    # FMA-contract rounded products under jit (non-power-of-two coeffs), so
    # allow a few pair-ulps (pair ulp ~ scale*2^-48)
    scale = float(jnp.max(jnp.abs(b_pair[0])))
    np.testing.assert_allclose(
        np.asarray(got_l), np.asarray(want_l), atol=32 * scale * 2.0**-48
    )


@pytest.mark.parametrize(
    "shape,n", [("gamma", 64), ("rect", 48)]  # pow2 and non-pow2 1/h² coeffs
)
def test_resid_ff_2d_accuracy_vs_f64(shape, n):
    """The kernel's pair residual must reproduce the true f64 residual to
    pair precision (same bound ops/ddf32 is pinned to in test_ddf32)."""
    from iterative_solvers_tpu.kernels.stencil_pallas import PallasStencilOperator
    from iterative_solvers_tpu.ops.stencil import stencil_apply
    from iterative_solvers_tpu.solvers.refine import _padded_hi_operator

    dom = Domain2D(nx=n, ny=n, shape=shape)
    pop = PallasStencilOperator.from_domain(dom)
    fn = ff_residual_fn(pop, pop.padded_shape)
    A_hi = _padded_hi_operator(pop)
    rng = np.random.default_rng(3)
    b_pair, b64 = _pair_fields(rng, pop, scale=1e4)
    x_pair, x64 = _pair_fields(rng, pop)
    r64 = jnp.where(
        A_hi.interior, b64 - stencil_apply(x64, A_hi.interior, *A_hi.coeffs), 0.0
    )
    got_h, got_l = fn(b_pair, x_pair)
    got = np.asarray(got_h, np.float64) + np.asarray(got_l, np.float64)
    scale = float(jnp.max(jnp.abs(r64)))
    np.testing.assert_allclose(got, np.asarray(r64), atol=2e-12 * scale)


def test_resid_ff_3d_matches_jnp():
    from iterative_solvers_tpu.kernels.stencil3d_pallas import (
        Pallas3DStencilOperator,
    )
    from iterative_solvers_tpu.solvers.refine import _padded_hi_operator

    dom = Domain3D(nx=16, ny=16, nz=16)
    pop = Pallas3DStencilOperator.from_domain(dom)
    fn = ff_residual_fn(pop, pop.padded_shape)
    assert fn is not None
    A_hi = _padded_hi_operator(pop)
    rng = np.random.default_rng(11)
    b_pair, _ = _pair_fields(rng, pop, scale=1e4)
    x_pair, _ = _pair_fields(rng, pop)
    want_h, want_l = residual_ff(A_hi.interior, A_hi.coeffs, b_pair, x_pair)
    got_h, got_l = fn(b_pair, x_pair)
    np.testing.assert_array_equal(np.asarray(got_h), np.asarray(want_h))
    scale = float(jnp.max(jnp.abs(b_pair[0])))
    np.testing.assert_allclose(
        np.asarray(got_l), np.asarray(want_l), atol=32 * scale * 2.0**-48
    )


def test_ff_residual_fn_gating():
    """Custom masks, jnp operators, and layout mismatches must return None
    (the device-IR loop falls back to the jnp residual_ff)."""
    from iterative_solvers_tpu.kernels.stencil_pallas import PallasStencilOperator
    from iterative_solvers_tpu.ops.stencil import StencilOperator

    dom = Domain2D(nx=32, ny=32)
    pop = PallasStencilOperator.from_domain(dom)
    assert ff_residual_fn(pop, pop.padded_shape) is not None
    assert ff_residual_fn(pop, dom.grid_shape) is None  # unpadded fields
    assert ff_residual_fn(StencilOperator.from_domain(dom), pop.padded_shape) is None

    dom_c = Domain2D(
        nx=32, ny=32, shape="custom",
        inside_fn=lambda x, y: (x - 1.5) ** 2 + (y - 1.5) ** 2 < 0.2,
    )
    pop_c = PallasStencilOperator.from_domain(dom_c)
    assert ff_residual_fn(pop_c, pop_c.padded_shape) is None


def test_outer_loop_trajectory_kernel_vs_jnp():
    """_outer_refine_loop_ff must follow the same trajectory (same outer
    count, same inner totals, converged iterate to pair rounding) whether
    the residual is the fused kernel or the jnp EFT chain."""
    from iterative_solvers_tpu.core.problem import PoissonProblem
    from iterative_solvers_tpu.kernels.stencil_pallas import PallasStencilOperator
    from iterative_solvers_tpu.solvers.refine import (
        _outer_refine_loop_ff,
        _padded_hi_operator,
    )
    from iterative_solvers_tpu.solvers.stopping import StopConfig

    dom = Domain2D(nx=48, ny=48, shape="rect")  # non-pow2 coeffs
    prob = PoissonProblem.manufactured(dom)
    pop = PallasStencilOperator.from_domain(dom)
    A_hi = _padded_hi_operator(pop)
    b = pop.pad(prob.rhs_field(jnp.float64))
    stop = StopConfig(
        eps_precision=-1, eps_residual=-1, eps_relative=1e-8,
        max_iterations=100000,
    )

    def inner_solve(r_pair):
        # fixed 120 plain-CG iterations on the f32 residual — deterministic
        # and identical across both runs
        r32 = r_pair[0] + r_pair[1]
        x = jnp.zeros_like(r32)
        z = r32
        rz = jnp.sum(r32 * z)
        r = r32
        for _ in range(120):
            Az = A_hi(z.astype(jnp.float32))
            alpha = rz / jnp.sum(Az * z)
            x = x + alpha * z
            r = r - alpha * Az
            rz_new = jnp.sum(r * r)
            z = r + (rz_new / rz) * z
            rz = rz_new
        return x, jnp.asarray(120, jnp.int32)

    fn = ff_residual_fn(pop, pop.padded_shape)
    assert fn is not None
    x_k, r_k, st_k = _outer_refine_loop_ff(
        A_hi, stop, 8, b, None, inner_solve, residual_fn=fn
    )
    x_j, r_j, st_j = _outer_refine_loop_ff(
        A_hi, stop, 8, b, None, inner_solve, residual_fn=None
    )
    st_k, st_j = np.asarray(st_k), np.asarray(st_j)
    assert st_k[0] == st_j[0]  # outer count
    assert st_k[1] == st_j[1]  # total inner iterations
    assert st_k[2] == st_j[2] == 1.0  # done
    sol_k = np.asarray(x_k[0], np.float64) + np.asarray(x_k[1], np.float64)
    sol_j = np.asarray(x_j[0], np.float64) + np.asarray(x_j[1], np.float64)
    scale = np.abs(sol_j).max()
    np.testing.assert_allclose(sol_k, sol_j, atol=1e-9 * scale)


def test_resid_ff_3d_chunked_matches_per_plane():
    """The opt-in z-chunked ff-residual (ISTPU_RESID_FF_BLOCK_Z; bz=4 on
    the ragged D=33) must match the per-plane kernel bit-for-bit up to FMA
    reassociation and the jnp chain to pair-ulps."""
    from iterative_solvers_tpu.kernels.resid_ff import (
        pallas_residual_ff_3d,
        pallas_residual_ff_3d_chunked,
    )
    from iterative_solvers_tpu.kernels.stencil3d_pallas import (
        Pallas3DStencilOperator,
    )
    from iterative_solvers_tpu.solvers.refine import _padded_hi_operator

    dom = Domain3D(nx=32, ny=32, nz=32)
    pop = Pallas3DStencilOperator.from_domain(dom)
    A_hi = _padded_hi_operator(pop)
    rng = np.random.default_rng(13)
    b_pair, _ = _pair_fields(rng, pop, scale=1e4)
    x_pair, _ = _pair_fields(rng, pop)
    cd, cx, cy, cz = pop.coeffs
    got_h, got_l = pallas_residual_ff_3d_chunked(
        x_pair[0], x_pair[1], b_pair[0], b_pair[1],
        nx=pop.nx, ny=pop.ny, nz=pop.nz, cd=cd, cx=cx, cy=cy, cz=cz,
        block_z=4, block_rows=pop.block_rows, interpret=pop.interpret,
    )
    pp_h, pp_l = pallas_residual_ff_3d(
        x_pair[0], x_pair[1], b_pair[0], b_pair[1],
        nx=pop.nx, ny=pop.ny, nz=pop.nz, cd=cd, cx=cx, cy=cy, cz=cz,
        block_rows=pop.block_rows, interpret=pop.interpret,
    )
    scale = float(jnp.max(jnp.abs(b_pair[0])))
    np.testing.assert_allclose(
        np.asarray(got_h), np.asarray(pp_h), atol=32 * scale * 2.0**-48
    )
    np.testing.assert_allclose(
        np.asarray(got_l), np.asarray(pp_l), atol=32 * scale * 2.0**-48
    )
    want_h, want_l = residual_ff(A_hi.interior, A_hi.coeffs, b_pair, x_pair)
    got = np.asarray(got_h, np.float64) + np.asarray(got_l, np.float64)
    want = np.asarray(want_h, np.float64) + np.asarray(want_l, np.float64)
    np.testing.assert_allclose(got, want, atol=64 * scale * 2.0**-48)
