"""Roofline stencil-SpMV kernels (the BASELINE nnz/s-per-chip target).

Mosaic's stock BlockSpec pipeline caps at ~330-350 GB/s on this chip when
input and output are distinct HBM buffers, but runs at ~650-716 GB/s when the
output is ALIASED onto the input (measured, NOTES_PERF.md). Two kernels here,
both measured at 8192² on v5e:

1. :func:`pallas_stencil_apply_inplace` — **the winner, 0.87 ms/apply
   (575 Gnnz/s ≈ 1.2× the 0.7-roofline target; the stock out-of-place kernel
   does 1.79 ms)**. Auto-pipelined, output aliased onto the donated input.
   In-place is race-free for a stencil the same way the fused CG K2 kernel
   is: every cross-panel read (the two halo rows of each panel) is staged
   out of the aliased buffer beforehand by one tiny XLA strided-row gather
   (~0.1% of the field), so the main pass reads only block-locally and may
   overwrite its own panel — panel fetches only ever target panels not yet
   written.

2. :func:`pallas_stencil_apply_pipelined` — a manual-DMA experiment
   (``make_async_copy`` ring with configurable lookahead, the playbook's
   double-buffering pattern). Measured 1.67-1.70 ms/apply at any ring depth,
   in-place or not: manual staging does NOT unlock the aliased-mode
   bandwidth, which appears to require the automatic pipeline's fetch/write
   interleaving. Kept as the non-destructive fallback (≈5% faster than the
   stock pipeline) and as documentation of the negative result.

Masking matches kernels/stencil_pallas.py exactly: input is re-masked with
the algebraic interior predicate per panel; halo rows beyond the grid only
ever contribute to non-interior output rows, which the output mask nulls.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from iterative_solvers_tpu.kernels.stencil_pallas import _interior_pred

def _make_pipelined_kernel(nx, ny, cd, cx, cy, by, wp, g, mask_mode,
                           lookahead, n_out):
    pred = _interior_pred(mask_mode, nx, ny)
    n_in = lookahead + 2  # resident i-1..i+1 plus in-flight i+2..i+lookahead

    def mask_at(row0, shape):
        ri = lax.broadcasted_iota(jnp.int32, shape, 0) + row0
        ci = lax.broadcasted_iota(jnp.int32, shape, 1)
        return pred(ri, ci)

    def kernel(x_hbm, o_hbm):
        def body(in_buf, out_buf, in_sem, out_sem):
            def in_dma(i):
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(i * by, by), :],
                    in_buf.at[lax.rem(i, n_in)],
                    in_sem.at[lax.rem(i, n_in)],
                )

            def out_dma(i):
                return pltpu.make_async_copy(
                    out_buf.at[lax.rem(i, n_out)],
                    o_hbm.at[pl.ds(i * by, by), :],
                    out_sem.at[lax.rem(i, n_out)],
                )

            # Warm-up: `lookahead` fetches in flight before the first compute.
            for j in range(lookahead):
                @pl.when(jnp.asarray(j < g))
                def _(j=j):
                    in_dma(j).start()

            def loop(i, _):
                @pl.when(i + lookahead < g)
                def _():
                    in_dma(i + lookahead).start()

                @pl.when(i == 0)
                def _():
                    in_dma(0).wait()

                @pl.when(i + 1 < g)
                def _():
                    in_dma(i + 1).wait()

                # Reclaim the out slot written n_out panels ago.
                @pl.when(i >= n_out)
                def _():
                    out_dma(i - n_out).wait()

                row0 = i * by
                m = mask_at(row0, (by, wp))
                x = jnp.where(m, in_buf[lax.rem(i, n_in)], 0.0)
                up_row = jnp.where(
                    mask_at(row0 - 1, (1, wp)),
                    in_buf[lax.rem(i + (n_in - 1), n_in)][-1:, :],
                    0.0,
                )
                dn_row = jnp.where(
                    mask_at(row0 + by, (1, wp)),
                    in_buf[lax.rem(i + 1, n_in)][:1, :],
                    0.0,
                )
                up = jnp.concatenate([up_row, x[:-1, :]], axis=0)
                dn = jnp.concatenate([x[1:, :], dn_row], axis=0)
                lf = pltpu.roll(x, np.int32(1), 1)
                rt = pltpu.roll(x, np.int32(wp - 1), 1)
                y = cd * x + cx * (lf + rt) + cy * (up + dn)
                out_buf[lax.rem(i, n_out)] = jnp.where(m, y, 0.0)
                out_dma(i).start()
                return 0

            lax.fori_loop(0, g, loop, 0)
            # Drain the last n_out write-backs.
            for j in range(1, n_out + 1):
                @pl.when(jnp.asarray(g - j >= 0) & jnp.asarray(j <= n_out))
                def _(j=j):
                    out_dma(g - j).wait()

        pl.run_scoped(
            body,
            in_buf=pltpu.VMEM((n_in, by, wp), jnp.float32),
            out_buf=pltpu.VMEM((n_out, by, wp), jnp.float32),
            in_sem=pltpu.SemaphoreType.DMA((n_in,)),
            out_sem=pltpu.SemaphoreType.DMA((n_out,)),
        )

    return kernel


def _make_inplace_kernel(nx, ny, cd, cx, cy, by, wp, mask_mode, scale):
    pred = _interior_pred(mask_mode, nx, ny)

    def mask_at(row0, shape):
        ri = lax.broadcasted_iota(jnp.int32, shape, 0) + row0
        ci = lax.broadcasted_iota(jnp.int32, shape, 1)
        return pred(ri, ci)

    def kernel(x_ref, side_ref, o_ref):
        i = pl.program_id(0)
        row0 = i * by
        m = mask_at(row0, (by, wp))
        x = jnp.where(m, x_ref[...], 0.0)
        up_row = jnp.where(mask_at(row0 - 1, (1, wp)), side_ref[0, 0:1, :], 0.0)
        dn_row = jnp.where(mask_at(row0 + by, (1, wp)), side_ref[0, 1:2, :], 0.0)
        up = jnp.concatenate([up_row, x[:-1, :]], axis=0)
        dn = jnp.concatenate([x[1:, :], dn_row], axis=0)
        lf = pltpu.roll(x, np.int32(1), 1)
        rt = pltpu.roll(x, np.int32(wp - 1), 1)
        y = cd * x + cx * (lf + rt) + cy * (up + dn)
        if scale != 1.0:
            y = y * scale
        o_ref[...] = jnp.where(m, y, 0.0)

    return kernel


@partial(
    jax.jit,
    static_argnames=(
        "nx", "ny", "cd", "cx", "cy", "block_rows", "mask_mode", "scale", "interpret"
    ),
    donate_argnums=(0,),
)
def pallas_stencil_apply_inplace(
    x: jnp.ndarray,
    *,
    nx: int,
    ny: int,
    cd: float,
    cx: float,
    cy: float,
    block_rows: int = 256,
    mask_mode: str = "gamma",
    scale: float = 1.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = scale·(A @ x), writing over the donated input — the roofline path.

    This is the measured 2x-bandwidth mode of this chip's HBM pipeline
    (NOTES_PERF.md: ~716 GB/s aliased vs ~350 GB/s distinct-buffer), made
    race-free for a stencil the same way the fused CG K2 kernel is: every
    cross-panel read (the two halo rows of each panel) is staged OUT of the
    aliased buffer beforehand — one tiny XLA strided-row gather (~0.1% of the
    field) — so the main pass reads only block-locally and can overwrite its
    own panel. ``scale`` folds a per-apply normalization into the kernel
    epilogue (used by the bench chain to keep iterated values finite).
    """
    hp, wp = x.shape
    by = block_rows
    assert hp % by == 0 and wp % 128 == 0, (hp, wp, by)
    g = hp // by
    # Halo rows of every panel, staged OUT of the aliased buffer first (the
    # only cross-panel reads): side[i] = [x[i*by-1], x[(i+1)*by], 0…] in an
    # (g, 8, wp) layout (8-row groups satisfy the Mosaic sublane tiling; same
    # layout the fused CG K1→K2 side buffer uses). Garbage rows at the grid
    # edges are re-masked in-kernel.
    up_rows = jnp.concatenate([x[:1, :], x[by - 1 :: by, :][: g - 1]], axis=0)
    dn_rows = jnp.concatenate([x[by::by, :], x[:1, :]], axis=0)[:g]
    side = jnp.pad(
        jnp.stack([up_rows, dn_rows], axis=1), ((0, 0), (0, 6), (0, 0))
    )
    kernel = _make_inplace_kernel(nx, ny, cd, cx, cy, by, wp, mask_mode, scale)
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            grid=(g,),
            in_specs=[
                pl.BlockSpec((by, wp), lambda i: (i, 0)),
                pl.BlockSpec((1, 8, wp), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((by, wp), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((hp, wp), x.dtype),
            input_output_aliases={0: 0},
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
            interpret=interpret,
        )(x, side)


@partial(
    jax.jit,
    static_argnames=(
        "nx", "ny", "cd", "cx", "cy", "block_rows", "mask_mode", "in_place",
        "lookahead", "n_out",
    ),
    donate_argnums=(0,),
)
def pallas_stencil_apply_pipelined(
    x: jnp.ndarray,
    *,
    nx: int,
    ny: int,
    cd: float,
    cx: float,
    cy: float,
    block_rows: int = 128,
    mask_mode: str = "gamma",
    in_place: bool = True,
    lookahead: int = 2,
    n_out: int = 2,
) -> jnp.ndarray:
    """y = A @ x on a padded (Hp, Wp) f32 field; Hp % block_rows == 0,
    Wp % 128 == 0. TPU only (manual DMA — no interpret path); fall back to
    :func:`~iterative_solvers_tpu.kernels.stencil_pallas.pallas_stencil_apply`
    on CPU.

    ``in_place=True`` aliases the output onto the (donated) input buffer —
    the measured 2x-bandwidth mode of this HBM (NOTES_PERF.md: 716 vs ~350
    GB/s). The manual schedule makes this race-free where the automatic
    pipeline could not: panel i's write-back only ever coexists with fetches
    of panels >= i+2, which are disjoint rows; panels i-1..i+1 are already
    resident in the VMEM ring before the write starts."""
    hp, wp = x.shape
    by = block_rows
    assert hp % by == 0 and wp % 128 == 0, (hp, wp, by)
    g = hp // by
    kernel = _make_pipelined_kernel(
        nx, ny, cd, cx, cy, by, wp, g, mask_mode, lookahead, n_out
    )
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((hp, wp), x.dtype),
            input_output_aliases={0: 0} if in_place else {},
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        )(x)
