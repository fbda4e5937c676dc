"""Double-f32 (EFT) residual accuracy tests against true f64 (CPU).

The claim being pinned (ops/ddf32.py): r = b − A·x evaluated in pure f32
with one compensation level matches the f64 evaluation to ~eps_f32² of the
operator scale — orders of magnitude below both the naive-f32 error floor
and the 1e-6-relative stopping targets.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iterative_solvers_tpu.core.domain import Domain2D, Domain3D
from iterative_solvers_tpu.core.problem import PoissonProblem
from iterative_solvers_tpu.ops.ddf32 import (
    pair_add_f32,
    pair_to_f64,
    pair_value,
    residual_ff,
    split_f64,
    two_prod,
    two_sum,
)
from iterative_solvers_tpu.ops.stencil import StencilOperator


def test_two_sum_exact():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal(1000) * 1e4, jnp.float32)
    b = jnp.asarray(rng.standard_normal(1000) * 1e-3, jnp.float32)
    s, e = two_sum(a, b)
    exact = a.astype(jnp.float64) + b.astype(jnp.float64)
    got = s.astype(jnp.float64) + e.astype(jnp.float64)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(exact))


def test_two_prod_exact():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal(1000) * 300, jnp.float32)
    b = jnp.asarray(rng.standard_normal(1000) * 7, jnp.float32)
    p, e = two_prod(a, b)
    exact = a.astype(jnp.float64) * b.astype(jnp.float64)
    got = p.astype(jnp.float64) + e.astype(jnp.float64)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(exact))


def test_split_roundtrip():
    rng = np.random.default_rng(2)
    v = jnp.asarray(rng.standard_normal(1000) * np.exp(rng.uniform(-3, 3, 1000)))
    hi, lo = split_f64(v)
    back = hi.astype(jnp.float64) + lo.astype(jnp.float64)
    np.testing.assert_allclose(np.asarray(back), np.asarray(v), rtol=1e-14)


def _residual_err(dom, prob, scale_x=1.0):
    """Max abs deviation of the ff residual from the f64 residual, and the
    naive-f32 deviation for comparison, on a smooth iterate."""
    op = StencilOperator.from_domain(dom)
    b64 = prob.rhs_field(jnp.float64)
    # smooth iterate near the true solution (the refinement-loop regime)
    u64 = prob.true_solution_field(jnp.float64) * scale_x
    r64 = np.asarray(b64 - op(u64), np.float64)

    b_pair = split_f64(b64)
    x_pair = split_f64(u64)
    rh, rl = residual_ff(op.interior, op.coeffs, b_pair, x_pair)
    r_ff = np.asarray(pair_to_f64((rh, rl)), np.float64)

    x32 = u64.astype(jnp.float32)
    r_naive = np.asarray(
        b64.astype(jnp.float32) - op(x32).astype(jnp.float32), np.float64
    )
    return (
        np.max(np.abs(r_ff - r64)),
        np.max(np.abs(r_naive - r64)),
        np.max(np.abs(r64)),
    )


@pytest.mark.parametrize("n", [64, 256])
def test_residual_ff_2d_accuracy(n):
    dom = Domain2D(nx=n, ny=n)
    prob = PoissonProblem.manufactured(dom)
    err_ff, err_naive, scale = _residual_err(dom, prob)
    # naive f32 floor ~ eps32 * ||A|| * ||x||; the ff path must sit >=1000x
    # below it and well below 1e-7 of the residual scale budget
    assert err_ff < 1e-3 * err_naive, (err_ff, err_naive)
    # absolute bound: eps32^2-level vs the operator scale (~n^2 * u)
    assert err_ff < 5e-9 * (n * n), (err_ff, n)


def test_residual_ff_3d_accuracy():
    n = 32
    dom = Domain3D(nx=n, ny=n, nz=n)
    prob = PoissonProblem.manufactured(dom)
    err_ff, err_naive, scale = _residual_err(dom, prob)
    assert err_ff < 1e-3 * err_naive, (err_ff, err_naive)
    assert err_ff < 5e-9 * (3 * n * n), (err_ff, n)


def test_residual_ff_rect_domain_general_coeffs():
    # non-square rect domain: hx != hy, coefficients NOT powers of two ->
    # exercises the Dekker two_prod path and the diagonal fsum correction
    dom = Domain2D(nx=96, ny=64, shape="rect", x0=0.3, x1=1.7, y0=-0.2, y1=1.1)
    prob = PoissonProblem.manufactured(dom)
    err_ff, err_naive, scale = _residual_err(dom, prob)
    assert err_ff < 1e-3 * err_naive, (err_ff, err_naive)


def test_pair_add_f32():
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.standard_normal(1000) * 10)
    d = jnp.asarray(rng.standard_normal(1000).astype(np.float32) * 1e-4)
    p = split_f64(v)
    q = pair_add_f32(p, d)
    exact = np.asarray(v) + np.asarray(d, np.float64)
    got = np.asarray(pair_to_f64(q))
    np.testing.assert_allclose(got, exact, rtol=0, atol=1e-11 * np.abs(exact).max())
    # pair_value is the correctly-rounded f32 of the sum
    pv = np.asarray(pair_value(q), np.float32)
    np.testing.assert_allclose(pv, exact.astype(np.float32), rtol=1e-6)
