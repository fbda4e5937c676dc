"""In-place (aliased) roofline stencil kernel — interpret-mode parity tests.

The TPU-side timing claims live in NOTES_PERF.md / tools/tpu_smoke.py; here
the kernel's masking, halo staging, and scale folding are pinned against the
reference-grade StencilOperator on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iterative_solvers_tpu.core.domain import Domain2D
from iterative_solvers_tpu.kernels.stencil_pallas import PallasStencilOperator
from iterative_solvers_tpu.kernels.stencil_pipelined import pallas_stencil_apply_inplace
from iterative_solvers_tpu.ops.stencil import StencilOperator


@pytest.mark.parametrize("shape,n,block", [("gamma", 24, 8), ("rect", 20, 8), ("gamma", 64, 16)])
def test_inplace_matches_standard(shape, n, block):
    dom = Domain2D(nx=n, ny=n, shape=shape)
    op = PallasStencilOperator.from_domain(dom, block_rows=block)
    hp, wp = op.padded_shape
    cd, cx, cy = op.coeffs
    x = jax.random.normal(jax.random.PRNGKey(0), (hp, wp)).astype(jnp.float32)
    y_std = np.asarray(op(x))
    y_ip = np.asarray(
        pallas_stencil_apply_inplace(
            jnp.copy(x), nx=op.nx, ny=op.ny, cd=cd, cx=cx, cy=cy,
            block_rows=block, mask_mode=op.mask_mode, interpret=True,
        )
    )
    np.testing.assert_array_equal(y_std, y_ip)


def test_inplace_scale_folded():
    dom = Domain2D(nx=16, ny=16)
    op = PallasStencilOperator.from_domain(dom, block_rows=8)
    cd, cx, cy = op.coeffs
    x = jnp.ones(op.padded_shape, jnp.float32)
    y1 = pallas_stencil_apply_inplace(
        jnp.copy(x), nx=op.nx, ny=op.ny, cd=cd, cx=cx, cy=cy,
        block_rows=8, mask_mode=op.mask_mode, interpret=True,
    )
    y2 = pallas_stencil_apply_inplace(
        jnp.copy(x), nx=op.nx, ny=op.ny, cd=cd, cx=cx, cy=cy,
        block_rows=8, mask_mode=op.mask_mode, scale=0.5, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(y1) * 0.5, np.asarray(y2), rtol=1e-6)


def test_inplace_agrees_with_unpadded_operator():
    # Full path: pad -> kernel -> crop equals the jnp masked-field operator.
    dom = Domain2D(nx=32, ny=32)
    pal = PallasStencilOperator.from_domain(dom, block_rows=8)
    std = StencilOperator.from_domain(dom)
    cd, cx, cy = pal.coeffs
    f = jax.random.normal(jax.random.PRNGKey(2), dom.grid_shape).astype(jnp.float32)
    f = std.mask(f)
    y_ref = np.asarray(std(f))
    y = pallas_stencil_apply_inplace(
        pal.pad(f), nx=pal.nx, ny=pal.ny, cd=cd, cx=cx, cy=cy,
        block_rows=8, mask_mode=pal.mask_mode, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(pal.crop(y)), y_ref, rtol=1e-5, atol=1e-4)
