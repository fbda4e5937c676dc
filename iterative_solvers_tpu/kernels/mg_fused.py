"""Fused Pallas kernels for the multigrid V-cycle's fine levels.

The V-cycle's cost at large grids is dominated by its fine-level legs, and
the jnp formulation pays ~4x the necessary HBM traffic there (measured at
8192²: 2.7 ms/stencil but 11 ms for a restrict+prolong round trip —
stride-2/interleave ops lower poorly in XLA, NOTES_PERF.md). These kernels
fuse each leg into one HBM sweep each way:

- **K_down** (pre-smooth + residual + row-restriction): reads the level RHS
  ``b`` once and writes (a) the pre-smoothed iterate ``x = (ω/d)·b`` and
  (b) the residual rows already restricted along the row axis — ~2.5 sweeps
  for what takes ~7 unfused. The lane-axis restriction runs in XLA on the
  half-height intermediate (4x smaller).
- **K_up** (row-prolongation + correction + post-smooth): reads ``x``, ``b``
  and the lane-prolonged coarse correction, reconstructs the corrected
  iterate's halo rows in registers, and writes the post-smoothed iterate —
  ~3.5 sweeps for ~8 unfused.

Mosaic notes: stride-2 row selection is a reshape-split (``R[:by].reshape
(by//2, 2, wp)``) because strided sublane slicing does not lower; row
interleave is ``stack+reshape``; x±1 neighbors are masked lane rolls — all
patterns probed on real v5e hardware. Interior masks are algebraic
(broadcasted-iota predicates, zero HBM traffic), identical to
kernels/stencil_pallas.py.

The fused levels compute the SAME arithmetic as solvers/multigrid.py's jnp
path (same smoother, same transfers, R = Pᵀ/4), so the V-cycle stays
symmetric and PCG-safe; equivalence is tested to f32 round-off.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from iterative_solvers_tpu.kernels.stencil_pallas import _interior_pred, _round_up


def _mask_at(pred, row0, shape):
    ri = lax.broadcasted_iota(jnp.int32, shape, 0) + row0
    ci = lax.broadcasted_iota(jnp.int32, shape, 1)
    return pred(ri, ci)


def _stencil_rows(xe, be, mr, cd, cx, cy, wp):
    """Masked residual rows: ``r = b − A x`` for the row band ``xe[1:-1]``
    given one extra x-row above and below; all inputs pre-masked."""
    xc = xe[1:-1]
    xu = xe[:-2]
    xd = xe[2:]
    ax = cd * xc + cx * (
        pltpu.roll(xc, np.int32(1), 1) + pltpu.roll(xc, np.int32(wp - 1), 1)
    ) + cy * (xu + xd)
    return jnp.where(mr, be - ax, 0.0)


def _make_k_down(nx, ny, cd, cx, cy, cs, by, wp, mask_mode):
    pred = _interior_pred(mask_mode, nx, ny)

    def kernel(b_ref, up_ref, dn_ref, rr_ref):
        # The pre-smoothed iterate x = (ω/d)·b is NOT written: K_up
        # reconstructs it from b in registers, saving 8 B/node of HBM traffic
        # (a write here + a read there) per fused level.
        i = pl.program_id(0)
        row0 = i * by
        m = _mask_at(pred, row0, (by, wp))
        bm = jnp.where(m, b_ref[...], 0.0)
        up2 = jnp.where(_mask_at(pred, row0 - 2, (2, wp)), up_ref[-2:, :], 0.0)
        dn1 = jnp.where(_mask_at(pred, row0 + by, (1, wp)), dn_ref[:1, :], 0.0)
        ext_b = jnp.concatenate([up2, bm, dn1], axis=0)  # rows row0-2 .. row0+by
        x_ext = cs * ext_b  # pre-smooth from zero: x = (ω/d)·b, already masked
        # residual rows row0-1 .. row0+by-1 (what row-restriction consumes)
        mr = _mask_at(pred, row0 - 1, (by + 1, wp))
        R = _stencil_rows(x_ext, ext_b[1 : by + 2], mr, cd, cx, cy, wp)
        # row-restriction: coarse row j <- fine rows (2j-1, 2j, 2j+1) relative
        # to row0 == R rows (2j, 2j+1, 2j+2). Stride-2 via reshape-split.
        A = R[:by].reshape(by // 2, 2, wp)
        below = A[:, 0, :]
        center = A[:, 1, :]
        upper = jnp.concatenate([A[1:, 0, :], R[by : by + 1]], axis=0)
        rr_ref[...] = 0.25 * below + 0.5 * center + 0.25 * upper

    return kernel


LANES = 128


def _stencil_rows_fmask(xe, be, mr_f, cd, cx, cy, wp):
    """:func:`_stencil_rows` with a FLOAT {0,1} mask (multiplicative) — the
    custom-mask kernels avoid narrow i1 vectors entirely."""
    xc = xe[1:-1]
    xu = xe[:-2]
    xd = xe[2:]
    ax = cd * xc + cx * (
        pltpu.roll(xc, np.int32(1), 1) + pltpu.roll(xc, np.int32(wp - 1), 1)
    ) + cy * (xu + xd)
    return (be - ax) * mr_f


def _make_k_down_custom(cd, cx, cy, cs, by, wp, nb):
    """Custom-domain K_down: the interior mask arrives as an int8 operand
    (plus its 32-row halo group for the R row above the panel). The level
    RHS is pre-masked (it is a masked restriction), so halo b rows need only
    panel-id validity; grid-edge rows are never interior."""

    def kernel(b_ref, up_ref, dn_ref, m_ref, mup_ref, rr_ref):
        i = pl.program_id(0)
        # Masks as f32 multiplies: Mosaic cannot relayout 1-row i1 slices of
        # a (32, w) i8 tile ("Invalid relayout ... vector<1xWxi1>", measured
        # on v5e) — convert the whole block to f32 in registers, slice after.
        m_f = m_ref[...].astype(b_ref.dtype)
        bm = b_ref[...] * m_f
        up2 = jnp.where(i > 0, up_ref[-2:, :], 0.0)
        dn1 = jnp.where(i < nb - 1, dn_ref[:1, :], 0.0)
        ext_b = jnp.concatenate([up2, bm, dn1], axis=0)
        x_ext = cs * ext_b
        mrow_above = jnp.where(
            i > 0, mup_ref[...].astype(b_ref.dtype)[-1:, :], 0.0
        )
        mr_f = jnp.concatenate([mrow_above, m_f], axis=0)
        R = _stencil_rows_fmask(x_ext, ext_b[1 : by + 2], mr_f, cd, cx, cy, wp)
        A = R[:by].reshape(by // 2, 2, wp)
        below = A[:, 0, :]
        center = A[:, 1, :]
        upper = jnp.concatenate([A[1:, 0, :], R[by : by + 1]], axis=0)
        rr_ref[...] = 0.25 * below + 0.5 * center + 0.25 * upper

    return kernel


def _make_k_up_custom(cd, cx, cy, cs, by, wp, ch, nb, with_dot=False):
    """Custom-domain K_up: int8 mask operand + 32-row halo groups for the
    corrected iterate's halo rows; coarse-row validity stays structural."""

    def rows_valid(g0, rows):
        ri = lax.broadcasted_iota(jnp.int32, (rows, wp), 0) + g0
        return (ri >= 0) & (ri < ch)

    def kernel(b_ref, bup_ref, bdn_ref, ec_ref, ecup_ref, ecdn_ref,
               m_ref, mup_ref, mdn_ref, o_ref, *dot_refs):
        i = pl.program_id(0)
        half = by // 2
        g0 = i * half
        # f32 multiplicative masks throughout (1-row i1 slices of i8 tiles
        # do not relayout on v5e — see _make_k_down_custom)
        m_f = m_ref[...].astype(b_ref.dtype)
        bm = b_ref[...] * m_f
        x = cs * bm
        ec_m = jnp.where(rows_valid(g0, half), ec_ref[...], 0.0)
        ec_a = jnp.where(rows_valid(g0 - 1, 1), ecup_ref[-1:, :], 0.0)
        ec_b = jnp.where(rows_valid(g0 + half, 1), ecdn_ref[:1, :], 0.0)
        ec_nxt = jnp.concatenate([ec_m[1:], ec_b], axis=0)
        odd = 0.5 * (ec_m + ec_nxt)
        p = jnp.stack([ec_m, odd], axis=1).reshape(by, wp)
        p_above = 0.5 * (ec_a + ec_m[:1])
        p_below = ec_b
        xc = x + p * m_f
        ma_f = jnp.where(i > 0, mup_ref[...].astype(b_ref.dtype)[-1:, :], 0.0)
        mb_f = jnp.where(
            i < nb - 1, mdn_ref[...].astype(b_ref.dtype)[:1, :], 0.0
        )
        xa = (cs * bup_ref[-1:, :] + p_above) * ma_f
        xb = (cs * bdn_ref[:1, :] + p_below) * mb_f
        xc_ext = jnp.concatenate([xa, xc, xb], axis=0)
        R = _stencil_rows_fmask(xc_ext, bm, m_f, cd, cx, cy, wp)
        out = (xc + cs * R) * m_f
        o_ref[...] = out
        if with_dot:
            dot_refs[0][...] = jnp.full((1, 8, LANES), jnp.sum(bm * out), out.dtype)

    return kernel


def _make_k_up(nx, ny, cd, cx, cy, cs, by, wp, mask_mode, ch, with_dot=False):
    pred = _interior_pred(mask_mode, nx, ny)

    def rows_valid(g0, rows):
        # ``ec_lanes`` columns are FINE-indexed (already lane-prolonged), so
        # only coarse-ROW validity is masked here: clamped halo fetches must
        # not leak rows from outside the coarse grid [0, ch). Interior
        # masking of the correction itself happened on the coarse level.
        ri = lax.broadcasted_iota(jnp.int32, (rows, wp), 0) + g0
        return (ri >= 0) & (ri < ch)

    def kernel(b_ref, bup_ref, bdn_ref, ec_ref, ecup_ref, ecdn_ref, o_ref,
               *dot_refs):
        # The pre-smoothed iterate is reconstructed as x = (ω/d)·b in
        # registers (K_down no longer writes it), including its halo rows
        # from the b halo groups.
        i = pl.program_id(0)
        row0 = i * by
        half = by // 2
        g0 = i * half  # first coarse row of this panel
        m = _mask_at(pred, row0, (by, wp))
        bm = jnp.where(m, b_ref[...], 0.0)
        x = cs * bm
        # coarse correction rows g0-1 .. g0+half
        ec_m = jnp.where(rows_valid(g0, half), ec_ref[...], 0.0)
        ec_a = jnp.where(rows_valid(g0 - 1, 1), ecup_ref[-1:, :], 0.0)
        ec_b = jnp.where(rows_valid(g0 + half, 1), ecdn_ref[:1, :], 0.0)
        ec_nxt = jnp.concatenate([ec_m[1:], ec_b], axis=0)  # rows g0+1 .. g0+half
        # row-prolongation inside the panel: even fine rows copy, odd average
        odd = 0.5 * (ec_m + ec_nxt)
        p = jnp.stack([ec_m, odd], axis=1).reshape(by, wp)
        # halo rows of the corrected iterate
        p_above = 0.5 * (ec_a + ec_m[:1])  # fine row row0-1 (odd)
        p_below = ec_b  # fine row row0+by (even)
        xc = x + jnp.where(m, p, 0.0)
        xa = jnp.where(
            _mask_at(pred, row0 - 1, (1, wp)), cs * bup_ref[-1:, :] + p_above, 0.0
        )
        xb = jnp.where(
            _mask_at(pred, row0 + by, (1, wp)), cs * bdn_ref[:1, :] + p_below, 0.0
        )
        xc_ext = jnp.concatenate([xa, xc, xb], axis=0)
        # post-smooth: x + (ω/d)·(b − A x_corrected)
        R = _stencil_rows(xc_ext, bm, m, cd, cx, cy, wp)
        out = jnp.where(m, xc + cs * R, 0.0)
        o_ref[...] = out
        if with_dot:
            # per-panel partial of (b, out): when this level's b is the PCG
            # residual and out is M r, the sum of these partials IS the PCG's
            # rz — the separate two-field reduction sweep disappears
            dot_refs[0][...] = jnp.full((1, 8, LANES), jnp.sum(bm * out), out.dtype)

    return kernel


def _make_k_jacobi(nx, ny, cd, cx, cy, cs, by, wp, mask_mode):
    """One weighted-Jacobi sweep ``out = x + (ω/d)·(b − A x)`` as a single
    HBM pass (reads x with a 1-row halo each side + b, writes out — 12 B/node
    vs ~24 B/node for the jnp apply + axpy pair). Used by the FMG warm
    start's fine-level polish (multigrid._fmg_rung): above the V-cycle
    polish cutoff each level runs ``smooth_sweeps`` of these."""
    pred = _interior_pred(mask_mode, nx, ny)

    def kernel(x_ref, xup_ref, xdn_ref, b_ref, o_ref):
        i = pl.program_id(0)
        row0 = i * by
        m = _mask_at(pred, row0, (by, wp))
        xm = jnp.where(m, x_ref[...], 0.0)
        bm = jnp.where(m, b_ref[...], 0.0)
        xa = jnp.where(_mask_at(pred, row0 - 1, (1, wp)), xup_ref[-1:, :], 0.0)
        xb = jnp.where(_mask_at(pred, row0 + by, (1, wp)), xdn_ref[:1, :], 0.0)
        x_ext = jnp.concatenate([xa, xm, xb], axis=0)
        R = _stencil_rows(x_ext, bm, m, cd, cx, cy, wp)
        o_ref[...] = jnp.where(m, xm + cs * R, 0.0)

    return kernel


@dataclass(frozen=True, eq=False)
class FusedLevelKernels:
    """Compiled down/up legs of one V-cycle level on its padded layout."""

    nx: int
    ny: int
    coeffs: Tuple[float, float, float]
    cs: float  # ω / diag
    mask_mode: str
    padded_shape: Tuple[int, int]  # (hp, wp), hp % by == 0, wp % 128 == 0
    block_rows: int  # multiple of 16 (32 for custom: int8 mask tiling)
    interpret: bool
    mask8: Optional[jnp.ndarray] = None  # custom domains: padded int8 interior

    def down(self, b: jnp.ndarray) -> jnp.ndarray:
        """Rows-restricted residual of the pre-smoothed iterate, from the
        level RHS. (The iterate itself, x = (ω/d)·b, is never materialised —
        :meth:`up` reconstructs it from ``b`` in registers.)"""
        # Mosaic rejects i64 BlockSpec index-map values; trace the call with
        # x64 locally off (the kernels are f32-only), cf. cg_fused.py.
        with jax.enable_x64(False):
            return self._down(b)

    def _down(self, b: jnp.ndarray) -> jnp.ndarray:
        hp, wp = self.padded_shape
        by = self.block_rows
        cd, cx, cy = self.coeffs
        g = hp // by
        gy = hp // 8
        in_specs = [
            pl.BlockSpec((by, wp), lambda i: (i, 0)),
            pl.BlockSpec((8, wp), lambda i: (jnp.maximum(i * (by // 8) - 1, 0), 0)),
            pl.BlockSpec(
                (8, wp), lambda i: (jnp.minimum(i * (by // 8) + by // 8, gy - 1), 0)
            ),
        ]
        args = [b, b, b]
        if self.mask8 is not None:
            kernel = _make_k_down_custom(cd, cx, cy, self.cs, by, wp, g)
            g32 = hp // 32
            in_specs += [
                pl.BlockSpec((by, wp), lambda i: (i, 0)),
                pl.BlockSpec(
                    (32, wp), lambda i: (jnp.maximum(i * (by // 32) - 1, 0), 0)
                ),
            ]
            args += [self.mask8, self.mask8]
        else:
            kernel = _make_k_down(
                self.nx, self.ny, cd, cx, cy, self.cs, by, wp, self.mask_mode
            )
        return pl.pallas_call(
            kernel,
            grid=(g,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((by // 2, wp), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((hp // 2, wp), b.dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
            interpret=self.interpret,
        )(*args)

    def up(self, b: jnp.ndarray, ec_lanes: jnp.ndarray, with_dot: bool = False):
        """Post-smoothed corrected iterate; ``ec_lanes`` is the lane-prolonged
        coarse correction on this level's (hp/2, wp) row layout. With
        ``with_dot`` also returns (b, out) — the PCG's rz when this level's
        b is the residual — as a fused epilogue reduction."""
        with jax.enable_x64(False):
            return self._up(b, ec_lanes, with_dot)

    def _up(self, b: jnp.ndarray, ec_lanes: jnp.ndarray, with_dot: bool = False):
        hp, wp = self.padded_shape
        by = self.block_rows
        cd, cx, cy = self.coeffs
        ch = self.ny // 2 + 1  # coarse row count
        g = hp // by
        gy = hp // 8
        gc = (hp // 2) // 8
        half8 = (by // 2) // 8
        in_specs = [
            pl.BlockSpec((by, wp), lambda i: (i, 0)),
            pl.BlockSpec((8, wp), lambda i: (jnp.maximum(i * (by // 8) - 1, 0), 0)),
            pl.BlockSpec(
                (8, wp), lambda i: (jnp.minimum(i * (by // 8) + by // 8, gy - 1), 0)
            ),
            pl.BlockSpec((by // 2, wp), lambda i: (i, 0)),
            pl.BlockSpec((8, wp), lambda i: (jnp.maximum(i * half8 - 1, 0), 0)),
            pl.BlockSpec(
                (8, wp), lambda i: (jnp.minimum((i + 1) * half8, gc - 1), 0)
            ),
        ]
        args = [b, b, b, ec_lanes, ec_lanes, ec_lanes]
        if self.mask8 is not None:
            kernel = _make_k_up_custom(cd, cx, cy, self.cs, by, wp, ch, g, with_dot)
            g32 = hp // 32
            in_specs += [
                pl.BlockSpec((by, wp), lambda i: (i, 0)),
                pl.BlockSpec(
                    (32, wp), lambda i: (jnp.maximum(i * (by // 32) - 1, 0), 0)
                ),
                pl.BlockSpec(
                    (32, wp),
                    lambda i: (jnp.minimum(i * (by // 32) + by // 32, g32 - 1), 0),
                ),
            ]
            args += [self.mask8, self.mask8, self.mask8]
        else:
            kernel = _make_k_up(
                self.nx, self.ny, cd, cx, cy, self.cs, by, wp, self.mask_mode,
                ch, with_dot,
            )
        out_specs = [pl.BlockSpec((by, wp), lambda i: (i, 0))]
        out_shape = [jax.ShapeDtypeStruct((hp, wp), b.dtype)]
        if with_dot:
            out_specs.append(pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0)))
            out_shape.append(jax.ShapeDtypeStruct((g, 8, LANES), b.dtype))
        res = pl.pallas_call(
            kernel,
            grid=(g,),
            in_specs=in_specs,
            out_specs=tuple(out_specs) if with_dot else out_specs[0],
            out_shape=tuple(out_shape) if with_dot else out_shape[0],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
            interpret=self.interpret,
        )(*args)
        if with_dot:
            out, dot_p = res
            return out, jnp.sum(dot_p[:, 0, 0])
        return res

    def jacobi(self, x: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """One weighted-Jacobi sweep on the padded layout (algebraic masks
        only — custom domains keep the jnp polish path)."""
        if self.mask8 is not None:
            raise NotImplementedError("jacobi kernel: algebraic masks only")
        with jax.enable_x64(False):
            return self._jacobi(x, b)

    def _jacobi(self, x: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        hp, wp = self.padded_shape
        by = self.block_rows
        cd, cx, cy = self.coeffs
        g = hp // by
        gy = hp // 8
        kernel = _make_k_jacobi(
            self.nx, self.ny, cd, cx, cy, self.cs, by, wp, self.mask_mode
        )
        in_specs = [
            pl.BlockSpec((by, wp), lambda i: (i, 0)),
            pl.BlockSpec((8, wp), lambda i: (jnp.maximum(i * (by // 8) - 1, 0), 0)),
            pl.BlockSpec(
                (8, wp), lambda i: (jnp.minimum(i * (by // 8) + by // 8, gy - 1), 0)
            ),
            pl.BlockSpec((by, wp), lambda i: (i, 0)),
        ]
        return pl.pallas_call(
            kernel,
            grid=(g,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((by, wp), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((hp, wp), x.dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
            interpret=self.interpret,
        )(x, x, x, b)


import functools


@functools.lru_cache(maxsize=None)
def _lane_restrict_mats() -> Tuple[np.ndarray, np.ndarray]:
    """(128, 64) tile-diagonal + previous-tile lane-restriction operators.

    Fine lane i of tile t feeds coarse lane j of the co-indexed 64-wide
    coarse tile when i == 2j + {-1, 0, +1} (weights [1,2,1]/4) — the
    relation is tile-independent, so ONE (128, 64) matrix contracts every
    tile on the MXU; the single cross-tile coupling (coarse j=0 needs the
    previous tile's lane 127) is a second matrix with one nonzero."""
    W1 = np.zeros((128, 64), np.float32)
    for j in range(64):
        for off, wgt in ((-1, 0.25), (0, 0.5), (1, 0.25)):
            i = 2 * j + off
            if 0 <= i < 128:
                W1[i, j] = wgt
    W2 = np.zeros((128, 64), np.float32)
    W2[127, 0] = 0.25
    return W1, W2


@functools.lru_cache(maxsize=None)
def _lane_prolong_mats() -> Tuple[np.ndarray, np.ndarray]:
    """(64, 128) tile-diagonal + next-tile lane-prolongation operators
    (P = 2 Rᵀ, the adjoint pair the symmetric V-cycle requires)."""
    W1, W2 = _lane_restrict_mats()
    return (
        np.ascontiguousarray(2.0 * W1.T),
        np.ascontiguousarray(2.0 * W2.T),
    )


def lane_restrict_mm(rr: jnp.ndarray, nx: int, wc_pad: int) -> jnp.ndarray:
    """:func:`lane_restrict` as a tile-banded MXU contraction.

    The strided-slice form lowers ~6x off roofline on TPU (measured 2.71 ms
    on the 4097x8320 intermediate at 8192² — NOTES_PERF round 5); viewing
    the lanes as (nt, 128) tiles turns the restriction into one batched
    (128, 64) matmul plus a one-nonzero cross-tile term — O(1) extra
    arithmetic per node on the MXU. Requires lanes >= ``nx+1`` masked to
    zero (true for the fused kernels' outputs) — the active-width crop of
    the strided form is subsumed by those zeros. Single-device layouts
    only; the sharded per-block path keeps :func:`lane_restrict`."""
    hr, wp = rr.shape
    W1, W2 = _lane_restrict_mats()
    T = rr.reshape(hr, wp // 128, 128)
    prev = jnp.concatenate([jnp.zeros_like(T[:, :1]), T[:, :-1]], axis=1)
    hi = jax.lax.Precision.HIGH
    out = (
        jnp.einsum("rti,ij->rtj", T, jnp.asarray(W1), precision=hi)
        + jnp.einsum("rti,ij->rtj", prev, jnp.asarray(W2), precision=hi)
    ).reshape(hr, wp // 2)
    if wp // 2 >= wc_pad:
        return out[:, :wc_pad]
    return jnp.pad(out, ((0, 0), (0, wc_pad - wp // 2)))


def lane_prolong_mm(ec: jnp.ndarray, cnx: int, w_pad: int) -> jnp.ndarray:
    """:func:`lane_prolong` as the adjoint tile-banded MXU contraction
    (see :func:`lane_restrict_mm`); coarse lanes >= ``cnx+1`` must be
    zero (the child V-cycle's masked output)."""
    hr = ec.shape[0]
    wc_half = w_pad // 2
    if ec.shape[1] < wc_half:
        ec = jnp.pad(ec, ((0, 0), (0, wc_half - ec.shape[1])))
    C = ec[:, :wc_half].reshape(hr, w_pad // 128, 64)
    nxt = jnp.concatenate([C[:, 1:], jnp.zeros_like(C[:, :1])], axis=1)
    P1, P2 = _lane_prolong_mats()
    hi = jax.lax.Precision.HIGH
    return (
        jnp.einsum("rtj,ji->rti", C, jnp.asarray(P1), precision=hi)
        + jnp.einsum("rtj,ji->rti", nxt, jnp.asarray(P2), precision=hi)
    ).reshape(hr, w_pad)


def lane_restrict(rr: jnp.ndarray, nx: int, wc_pad: int) -> jnp.ndarray:
    """Lane-axis full weighting on the rows-restricted intermediate:
    coarse col c <- fine cols (2c-1, 2c, 2c+1); output padded to wc_pad."""
    w = nx + 1
    wc = nx // 2 + 1
    p = jnp.pad(rr[:, :w], ((0, 0), (1, 1)))
    lo = p[:, 0 : 2 * wc - 1 : 2]
    mid = p[:, 1 : 2 * wc : 2]
    hi = p[:, 2 : 2 * wc + 1 : 2]
    out = 0.25 * (lo + hi) + 0.5 * mid
    return jnp.pad(out, ((0, 0), (0, wc_pad - wc)))


def lane_prolong(ec: jnp.ndarray, cnx: int, w_pad: int) -> jnp.ndarray:
    """Lane-axis linear interpolation: coarse width cnx+1 -> fine nx+1 = 2cnx+1,
    padded to w_pad; rows untouched."""
    wc = cnx + 1
    a = ec[:, :wc]
    left, right = a[:, :-1], a[:, 1:]
    mid = 0.5 * (left + right)
    inter = jnp.stack([left, mid], axis=-1).reshape(a.shape[0], 2 * (wc - 1))
    out = jnp.concatenate([inter, a[:, wc - 1 : wc]], axis=1)
    return jnp.pad(out, ((0, 0), (0, w_pad - out.shape[1])))
