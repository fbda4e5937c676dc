"""Pallas stencil kernel tests (interpret mode on CPU; the same code path
compiles with Mosaic on real TPUs — verified on hardware, see NOTES_PERF.md)."""

import jax.numpy as jnp
import numpy as np
import pytest

from iterative_solvers_tpu.api import DirichletSolver
from iterative_solvers_tpu.core.domain import Domain2D
from iterative_solvers_tpu.kernels.stencil_pallas import (
    PallasStencilOperator,
    _interior_pred,
)
from iterative_solvers_tpu.ops.stencil import StencilOperator
from iterative_solvers_tpu.solvers.stopping import StopConfig


@pytest.mark.parametrize("n,shape", [(6, "gamma"), (30, "gamma"), (16, "rect"), (13, "rect")])
def test_algebraic_mask_matches_domain(n, shape):
    dom = Domain2D(nx=n, ny=n, shape=shape)
    ri, ci = np.mgrid[0 : n + 1, 0 : n + 1]
    alg = _interior_pred(shape, n, n)(ri, ci)
    np.testing.assert_array_equal(alg, dom.interior)


@pytest.mark.parametrize("n", [6, 30])
def test_pallas_matches_stencil(n):
    dom = Domain2D(nx=n, ny=n)
    ref = StencilOperator.from_domain(dom)
    pal = PallasStencilOperator.from_domain(dom, block_rows=8)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(dom.grid_shape))
    y_ref = np.asarray(ref(x))
    y_pal = np.asarray(pal.crop(pal(pal.pad(x))))
    np.testing.assert_allclose(y_pal, y_ref, rtol=1e-12, atol=1e-12)


def test_pallas_padding_roundtrip():
    dom = Domain2D(nx=30, ny=30)
    pal = PallasStencilOperator.from_domain(dom, block_rows=8)
    assert pal.padded_shape[0] % 8 == 0 and pal.padded_shape[1] % 128 == 0
    x = jnp.asarray(np.random.default_rng(1).standard_normal(dom.grid_shape))
    np.testing.assert_array_equal(np.asarray(pal.crop(pal.pad(x))), np.asarray(x))
    # padded region of the mask is never interior
    m = pal.interior_padded()
    h, w = dom.grid_shape
    assert not m[h:, :].any() and not m[:, w:].any()


def test_pallas_facade_solve():
    stop = StopConfig(max_iterations=25).disable_all_but_iterations()
    res_p = DirichletSolver(nx=16, ny=16, operator="pallas", stop=stop).solve()
    res_s = DirichletSolver(nx=16, ny=16, operator="stencil", stop=stop).solve()
    np.testing.assert_allclose(res_p.solution, res_s.solution, rtol=1e-11, atol=1e-11)
    assert res_p.iterations == res_s.iterations


def test_pallas_accepts_custom_domains():
    # round 3: custom masks get the int8 mask-operand kernel instead of a
    # ValueError (see tests/test_custom_fast_path.py for equivalence)
    dom = Domain2D(nx=8, ny=8, shape="custom", inside_fn=lambda ix, iy: ix + iy < 12)
    op = PallasStencilOperator.from_domain(dom)
    assert op.mask_mode == "custom" and op.mask8 is not None
    assert op.block_rows % 32 == 0  # int8 stream tiling
