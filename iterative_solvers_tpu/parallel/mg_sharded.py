"""Mesh-sharded fused multigrid V-cycle (the round-3 sharded fast path).

Runs the fused Pallas V-cycle legs of kernels/mg_fused.py *per block inside
`shard_map`*, so mesh-sharded MG-PCG gets the same ~2.5x-less-HBM-traffic
fine levels as the single-chip engine (round-2 VERDICT: mesh solves fell
back to jnp operators everywhere).

Decomposition of one fused level under a (my, mx) block mesh:

- **K_down** (pre-smooth + residual + row-restrict) per block needs a 2-row
  upper / 1-row lower halo of the level RHS ``b`` (the pre-smoothed iterate
  is ``(ω/d)·b`` pointwise, so its halo IS the b halo scaled) — two
  ppermutes. Lane (x±1) neighbor contributions touch only the block's first
  and last columns of the *restricted residual*; they are applied as two
  O(Hb) edge-strip corrections at the jit level from a corner-carrying
  column exchange (rows are exchanged first, then the row-extended edge
  columns, so the one diagonal value each block needs rides along).
- **K_up** (row-prolong + correct + post-smooth) per block needs 1-row b
  halos and 1-row coarse-correction halos (two+two ppermutes), plus the
  corrected iterate's edge columns from the column neighbors — each block
  reconstructs its own edge columns ``xc = (ω/d)·b + P(ec)`` as O(Hb)
  column expressions and ppermutes those, again followed by jit-level
  edge-strip corrections.
- Lane-axis restriction/prolongation and the child-interior masking stay at
  the jit level on global sharded arrays (pure slicing/interleaving — GSPMD
  partitions them; they run on the half-height intermediate).
- The coarse remainder of the hierarchy (extents below the fuse threshold)
  is the plain jnp V-cycle of solvers/multigrid.py on cropped global arrays
  under GSPMD, exactly like ShardedMultigridPreconditioner.

All arithmetic is identical to the single-chip fused level (same smoother,
same transfers, R = Pᵀ/4) modulo float reassociation at block edges, so the
V-cycle stays symmetric and PCG-safe; equivalence vs the jnp sharded path is
tested to f32 round-off on the virtual 8-device mesh.

The kernels are f32-only (like all Mosaic kernels here); f64 fields (the
escalated refinement polish) take the jnp inner V-cycle on cropped global
arrays instead.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh

from iterative_solvers_tpu.kernels.stencil_pallas import _interior_pred, _round_up
from iterative_solvers_tpu.kernels.mg_fused import lane_prolong, lane_restrict
from iterative_solvers_tpu.parallel import mesh as mesh_lib
from iterative_solvers_tpu.parallel.halo import _bwd, _fwd
from iterative_solvers_tpu.parallel.halo_pallas import _embed_row
from iterative_solvers_tpu.solvers.multigrid import (
    MultigridPreconditioner,
    _coarsen_domain,
)


def _stencil_rows_block(xe, be, mr, cd, cx, cy, w):
    """Masked residual rows r = b − A x for the band ``xe[1:-1]`` with one
    extra x-row above/below; lane rolls ZERO the wrapped lane (on a block the
    wrapped value is a live far-edge cell, not a masked global edge — the
    true neighbor-column terms are jit-level edge corrections)."""
    xc = xe[1:-1]
    xu = xe[:-2]
    xd = xe[2:]
    lane = lax.broadcasted_iota(jnp.int32, xc.shape, 1)
    lf = jnp.where(lane == 0, 0.0, pltpu.roll(xc, np.int32(1), 1))
    rt = jnp.where(lane == w - 1, 0.0, pltpu.roll(xc, np.int32(w - 1), 1))
    ax = cd * xc + cx * (lf + rt) + cy * (xu + xd)
    return jnp.where(mr, be - ax, 0.0)


def _make_k_down_block(nx, ny, cd, cx, cy, cs, by, w, mask_mode, nb):
    pred = _interior_pred(mask_mode, nx, ny)

    def kernel(offs_ref, b_ref, up_ref, dn_ref, hup_ref, hdn_ref, rr_ref):
        i = pl.program_id(0)
        roff = offs_ref[0]
        coff = offs_ref[1]
        row0 = i * by

        def mask_at(r0, shape):
            ri = lax.broadcasted_iota(jnp.int32, shape, 0) + (r0 + roff)
            ci = lax.broadcasted_iota(jnp.int32, shape, 1) + coff
            return pred(ri, ci)

        m = mask_at(row0, (by, w))
        bm = jnp.where(m, b_ref[...], 0.0)
        # block-edge panels read the ppermuted neighbor rows instead of the
        # clamped in-block group (which would hold live garbage there)
        up_src = jnp.where(i == 0, hup_ref[6:8, :], up_ref[-2:, :])
        dn_src = jnp.where(i == nb - 1, hdn_ref[:1, :], dn_ref[:1, :])
        up2 = jnp.where(mask_at(row0 - 2, (2, w)), up_src, 0.0)
        dn1 = jnp.where(mask_at(row0 + by, (1, w)), dn_src, 0.0)
        ext_b = jnp.concatenate([up2, bm, dn1], axis=0)  # rows row0-2..row0+by
        x_ext = cs * ext_b  # pre-smooth from zero
        mr = mask_at(row0 - 1, (by + 1, w))
        R = _stencil_rows_block(x_ext, ext_b[1 : by + 2], mr, cd, cx, cy, w)
        A = R[:by].reshape(by // 2, 2, w)
        below = A[:, 0, :]
        center = A[:, 1, :]
        upper = jnp.concatenate([A[1:, 0, :], R[by : by + 1]], axis=0)
        rr_ref[...] = 0.25 * below + 0.5 * center + 0.25 * upper

    return kernel


def _make_k_up_block(nx, ny, cd, cx, cy, cs, by, w, mask_mode, ch, nb,
                     with_dot=False):
    pred = _interior_pred(mask_mode, nx, ny)

    def kernel(offs_ref, b_ref, bup_ref, bdn_ref, hbup_ref, hbdn_ref,
               ec_ref, ecup_ref, ecdn_ref, hecup_ref, hecdn_ref, o_ref,
               *dot_ref):
        i = pl.program_id(0)
        roff = offs_ref[0]
        coff = offs_ref[1]
        goff = offs_ref[2]  # block's global coarse-row origin (= roff // 2)
        row0 = i * by
        half = by // 2
        g0 = i * half

        def mask_at(r0, shape):
            ri = lax.broadcasted_iota(jnp.int32, shape, 0) + (r0 + roff)
            ci = lax.broadcasted_iota(jnp.int32, shape, 1) + coff
            return pred(ri, ci)

        def rows_valid(gc0, rows):
            ri = lax.broadcasted_iota(jnp.int32, (rows, w), 0) + (gc0 + goff)
            return (ri >= 0) & (ri < ch)

        m = mask_at(row0, (by, w))
        bm = jnp.where(m, b_ref[...], 0.0)
        x = cs * bm
        ec_m = jnp.where(rows_valid(g0, half), ec_ref[...], 0.0)
        ec_a_src = jnp.where(i == 0, hecup_ref[7:8, :], ecup_ref[-1:, :])
        ec_b_src = jnp.where(i == nb - 1, hecdn_ref[:1, :], ecdn_ref[:1, :])
        ec_a = jnp.where(rows_valid(g0 - 1, 1), ec_a_src, 0.0)
        ec_b = jnp.where(rows_valid(g0 + half, 1), ec_b_src, 0.0)
        ec_nxt = jnp.concatenate([ec_m[1:], ec_b], axis=0)
        odd = 0.5 * (ec_m + ec_nxt)
        p = jnp.stack([ec_m, odd], axis=1).reshape(by, w)
        p_above = 0.5 * (ec_a + ec_m[:1])  # fine row row0-1 (odd: Hb, by even)
        p_below = ec_b  # fine row row0+by (even)
        xc = x + jnp.where(m, p, 0.0)
        bup_src = jnp.where(i == 0, hbup_ref[7:8, :], bup_ref[-1:, :])
        bdn_src = jnp.where(i == nb - 1, hbdn_ref[:1, :], bdn_ref[:1, :])
        xa = jnp.where(mask_at(row0 - 1, (1, w)), cs * bup_src + p_above, 0.0)
        xb = jnp.where(mask_at(row0 + by, (1, w)), cs * bdn_src + p_below, 0.0)
        xc_ext = jnp.concatenate([xa, xc, xb], axis=0)
        R = _stencil_rows_block(xc_ext, bm, m, cd, cx, cy, w)
        o = jnp.where(m, xc + cs * R, 0.0)
        o_ref[...] = o
        if with_dot:
            # (b, out) partial for the PCG rz epilogue; the edge lanes are
            # excluded (their out rows get jit-level corrections) and added
            # back from the corrected columns outside the kernel
            lane = lax.broadcasted_iota(jnp.int32, (by, w), 1)
            inner = (lane > 0) & (lane < w - 1)
            dot_ref[0][...] = jnp.full(
                (1, 8, 128), jnp.sum(jnp.where(inner, bm * o, 0.0)), o.dtype
            )

    return kernel


@partial(
    jax.jit,
    static_argnames=("nx", "ny", "cd", "cx", "cy", "cs", "by", "mask_mode",
                     "nb", "interpret"),
)
def _k_down_call(offs, b, hup, hdn, *, nx, ny, cd, cx, cy, cs, by, mask_mode,
                 nb, interpret):
    hb, wb = b.shape
    gy = hb // 8
    kernel = _make_k_down_block(nx, ny, cd, cx, cy, cs, by, wb, mask_mode, nb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((by, wb), lambda i, o: (i, 0)),
            pl.BlockSpec(
                (8, wb), lambda i, o: (jnp.maximum(i * (by // 8) - 1, 0), 0)
            ),
            pl.BlockSpec(
                (8, wb),
                lambda i, o: (jnp.minimum(i * (by // 8) + by // 8, gy - 1), 0),
            ),
            pl.BlockSpec((8, wb), lambda i, o: (0, 0)),
            pl.BlockSpec((8, wb), lambda i, o: (0, 0)),
        ],
        out_specs=pl.BlockSpec((by // 2, wb), lambda i, o: (i, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((hb // 2, wb), b.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
        interpret=interpret,
    )(offs, b, b, b, hup, hdn)


@partial(
    jax.jit,
    static_argnames=("nx", "ny", "cd", "cx", "cy", "cs", "by", "mask_mode",
                     "ch", "nb", "interpret", "with_dot"),
)
def _k_up_call(offs, b, hbup, hbdn, ec, hecup, hecdn, *, nx, ny, cd, cx, cy,
               cs, by, mask_mode, ch, nb, interpret, with_dot=False):
    hb, wb = b.shape
    gy = hb // 8
    gc = (hb // 2) // 8
    half8 = (by // 2) // 8
    kernel = _make_k_up_block(nx, ny, cd, cx, cy, cs, by, wb, mask_mode, ch,
                              nb, with_dot)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((by, wb), lambda i, o: (i, 0)),
            pl.BlockSpec(
                (8, wb), lambda i, o: (jnp.maximum(i * (by // 8) - 1, 0), 0)
            ),
            pl.BlockSpec(
                (8, wb),
                lambda i, o: (jnp.minimum(i * (by // 8) + by // 8, gy - 1), 0),
            ),
            pl.BlockSpec((8, wb), lambda i, o: (0, 0)),
            pl.BlockSpec((8, wb), lambda i, o: (0, 0)),
            pl.BlockSpec((by // 2, wb), lambda i, o: (i, 0)),
            pl.BlockSpec((8, wb), lambda i, o: (jnp.maximum(i * half8 - 1, 0), 0)),
            pl.BlockSpec(
                (8, wb), lambda i, o: (jnp.minimum((i + 1) * half8, gc - 1), 0)
            ),
            pl.BlockSpec((8, wb), lambda i, o: (0, 0)),
            pl.BlockSpec((8, wb), lambda i, o: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((by, wb), lambda i, o: (i, 0)),
            pl.BlockSpec((1, 8, 128), lambda i, o: (i, 0, 0)),
        )
        if with_dot
        else pl.BlockSpec((by, wb), lambda i, o: (i, 0)),
    )
    out_shape = jax.ShapeDtypeStruct((hb, wb), b.dtype)
    if with_dot:
        out_shape = (out_shape, jax.ShapeDtypeStruct((nb, 8, 128), b.dtype))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
        interpret=interpret,
    )(offs, b, b, b, hbup, hbdn, ec, ec, ec, hecup, hecdn)




@dataclass(frozen=True, eq=False)
class _ShardedFusedLevel:
    """One shard-fused V-cycle level: per-block kernels + halo plumbing."""

    nx: int
    ny: int
    coeffs: Tuple[float, float, float]  # (cd, cx, cy)
    cs: float  # ω / diag
    mask_mode: str
    padded_shape: Tuple[int, int]  # (hp, wp) global
    block_shape: Tuple[int, int]  # (Hb, Wb) per device
    by: int
    cw_pad: int  # child level's padded column count
    interpret: bool

    @property
    def ch(self) -> int:
        return self.ny // 2 + 1

    # --- per-block bodies (inside shard_map) -------------------------------

    def _down_block(self, b, ay, ax):
        cd, cx, cy = self.coeffs
        cs = self.cs
        hb, wb = self.block_shape
        pred = _interior_pred(self.mask_mode, self.nx, self.ny)
        i32 = jnp.int32
        roff = (lax.axis_index(ay) * hb).astype(i32)
        coff = (lax.axis_index(ax) * wb).astype(i32)
        rows = lax.broadcasted_iota(i32, (hb, 1), 0) + roff
        cols = lax.broadcasted_iota(i32, (1, wb), 1) + coff

        last2 = jnp.where(pred(rows[-2:], cols), b[-2:, :], 0.0)
        first1 = jnp.where(pred(rows[:1], cols), b[:1, :], 0.0)
        hup2 = lax.ppermute(last2, ay, perm=_fwd(ay))  # rows -2, -1
        hdn1 = lax.ppermute(first1, ay, perm=_bwd(ay))  # row Hb
        # corner-carrying column exchange: edge columns extended by the
        # already-received row halo, so x(-1, ∓1) rides along
        bcol_l = jnp.where(pred(rows, coff + wb - 1), b[:, -1:], 0.0)
        bcol_f = jnp.where(pred(rows, coff), b[:, :1], 0.0)
        lsend = jnp.concatenate([hup2[-1:, -1:], bcol_l], axis=0)  # rows -1..Hb-1
        rsend = jnp.concatenate([hup2[-1:, :1], bcol_f], axis=0)
        lcol = lax.ppermute(lsend, ax, perm=_fwd(ax))  # b(m,-1), m=-1..Hb-1
        rcol = lax.ppermute(rsend, ax, perm=_bwd(ax))  # b(m,Wb)

        offs = jnp.stack([roff, coff])
        rr = _k_down_call(
            offs,
            b,
            _embed_row(hup2, wb, 6),
            _embed_row(hdn1, wb, 0),
            nx=self.nx, ny=self.ny, cd=cd, cx=cx, cy=cy, cs=cs, by=self.by,
            mask_mode=self.mask_mode, nb=hb // self.by,
            interpret=self.interpret,
        )
        # Lane-neighbor terms of the restricted residual: the kernel zeroed
        # the wrapped lane, so R_true(m, 0) = R_kernel(m, 0) - cx·(ω/d)·b(m,-1)
        # wherever the R row is interior; restricted onto coarse rows.
        rowsm1 = lax.broadcasted_iota(i32, (hb + 1, 1), 0) + roff - 1
        cl = jnp.where(pred(rowsm1, coff), -cx * cs * lcol, 0.0)
        cr = jnp.where(pred(rowsm1, coff + wb - 1), -cx * cs * rcol, 0.0)
        dl = 0.25 * cl[0 : hb - 1 : 2] + 0.5 * cl[1:hb:2] + 0.25 * cl[2 : hb + 1 : 2]
        dr = 0.25 * cr[0 : hb - 1 : 2] + 0.5 * cr[1:hb:2] + 0.25 * cr[2 : hb + 1 : 2]
        rr = rr.at[:, :1].add(dl)
        rr = rr.at[:, -1:].add(dr)
        return rr

    def _xc_edge_col(self, bcol, eccol, hecdn_col, predcol):
        """Corrected-iterate edge column xc = (ω/d)·b + P(ec) as an O(Hb)
        column expression (what the lane neighbor needs for its corrections)."""
        nxt = jnp.concatenate([eccol[1:], hecdn_col], axis=0)
        odd = 0.5 * (eccol + nxt)
        p = jnp.stack([eccol, odd], axis=2).reshape(bcol.shape[0], 1)
        return jnp.where(predcol, self.cs * bcol + p, 0.0)

    def _up_block(self, b, ec, ay, ax, with_dot=False):
        cd, cx, cy = self.coeffs
        cs = self.cs
        hb, wb = self.block_shape
        pred = _interior_pred(self.mask_mode, self.nx, self.ny)
        i32 = jnp.int32
        roff = (lax.axis_index(ay) * hb).astype(i32)
        coff = (lax.axis_index(ax) * wb).astype(i32)
        goff = roff // 2
        rows = lax.broadcasted_iota(i32, (hb, 1), 0) + roff
        cols = lax.broadcasted_iota(i32, (1, wb), 1) + coff
        grows = lax.broadcasted_iota(i32, (hb // 2, 1), 0) + goff

        b_last = jnp.where(pred(rows[-1:], cols), b[-1:, :], 0.0)
        b_first = jnp.where(pred(rows[:1], cols), b[:1, :], 0.0)
        hbup = lax.ppermute(b_last, ay, perm=_fwd(ay))  # b(-1)
        hbdn = lax.ppermute(b_first, ay, perm=_bwd(ay))  # b(Hb)
        hecup = lax.ppermute(ec[-1:, :], ay, perm=_fwd(ay))  # ec(goff-1)
        hecdn = lax.ppermute(ec[:1, :], ay, perm=_bwd(ay))  # ec(goff+Hb/2)

        # edge columns of the corrected iterate, for the lane neighbors;
        # coarse validity of the received hecdn row is masked here (the
        # kernel's rows_valid does the same on its own operands)
        hecdn_ok = jnp.where(
            (goff + hb // 2 >= 0) & (goff + hb // 2 < self.ch), hecdn, 0.0
        )
        ec_ok = jnp.where((grows >= 0) & (grows < self.ch), ec, 0.0)
        xcol_l = self._xc_edge_col(
            b[:, -1:], ec_ok[:, -1:], hecdn_ok[:, -1:],
            pred(rows, coff + wb - 1),
        )
        xcol_f = self._xc_edge_col(
            b[:, :1], ec_ok[:, :1], hecdn_ok[:, :1], pred(rows, coff)
        )
        lcolx = lax.ppermute(xcol_l, ax, perm=_fwd(ax))  # xc(m, -1)
        rcolx = lax.ppermute(xcol_f, ax, perm=_bwd(ax))  # xc(m, Wb)

        offs = jnp.stack([roff, coff, goff])
        outs = _k_up_call(
            offs,
            b,
            _embed_row(hbup, wb, 7),
            _embed_row(hbdn, wb, 0),
            ec,
            _embed_row(hecup, wb, 7),
            _embed_row(hecdn, wb, 0),
            nx=self.nx, ny=self.ny, cd=cd, cx=cx, cy=cy, cs=cs, by=self.by,
            mask_mode=self.mask_mode, ch=self.ch, nb=hb // self.by,
            interpret=self.interpret, with_dot=with_dot,
        )
        out, dot_p = outs if with_dot else (outs, None)
        # post-smooth lane-neighbor terms: out_true = out_kernel − (ω/d)·cx·xc(m,∓1)
        dl = jnp.where(pred(rows, coff), -cs * cx * lcolx, 0.0)
        dr = jnp.where(pred(rows, coff + wb - 1), -cs * cx * rcolx, 0.0)
        out = out.at[:, :1].add(dl)
        out = out.at[:, -1:].add(dr)
        if with_dot:
            # (b, out) with the kernel's excluded edge lanes re-added from
            # the corrected columns, psum-replicated: the PCG rz for free on
            # the finest K_up (cf. single-chip FusedLevelKernels.up with_dot)
            axes_all = (ay if isinstance(ay, tuple) else (ay,)) + (ax,)
            local = (
                jnp.sum(dot_p[:, 0, 0])
                + jnp.sum(b[:, :1] * out[:, :1])
                + jnp.sum(b[:, -1:] * out[:, -1:])
            )
            return out, lax.psum(local, axes_all)
        return out

    # --- global entry points ------------------------------------------------

    def _axes(self, mesh):
        return mesh_lib.row_col_axes(mesh)

    def down(self, mesh, b):
        ay, ax = self._axes(mesh)
        spec = mesh_lib.field_spec(mesh, 2)
        return jax.shard_map(
            lambda bb: self._down_block(bb, ay, ax),
            mesh=mesh, in_specs=(spec,), out_specs=spec, check_vma=False,
        )(b)

    def up(self, mesh, b, ec_lanes, with_dot=False):
        from jax.sharding import PartitionSpec as P

        ay, ax = self._axes(mesh)
        spec = mesh_lib.field_spec(mesh, 2)
        return jax.shard_map(
            lambda bb, ee: self._up_block(bb, ee, ay, ax, with_dot),
            mesh=mesh, in_specs=(spec, spec),
            out_specs=(spec, P()) if with_dot else spec, check_vma=False,
        )(b, ec_lanes)


@dataclass(frozen=True, eq=False)
class ShardedFusedMultigrid:
    """V(1,1) multigrid preconditioner over mesh-sharded padded fields with
    shard-fused Pallas fine levels and a jnp GSPMD coarse remainder.

    Construct with :meth:`from_operator` on a
    :class:`~iterative_solvers_tpu.parallel.halo_pallas.
    ShardedPallasStencilOperator` — the fine level adopts the operator's
    padded layout, so PCG/IR loops run with zero pad/crop copies. f32 fields
    take the fused path; anything else (the escalated f64 polish) falls back
    to the jnp inner V-cycle on cropped global arrays.
    """

    mesh: Mesh
    levels: Tuple[_ShardedFusedLevel, ...]
    inner: MultigridPreconditioner  # full jnp hierarchy (fuse=False)
    grid_shape: Tuple[int, int]
    child_dims: Tuple[Tuple[int, int], ...]  # (nx, ny) of each level's child

    nu_pre: int = 1
    nu_post: int = 1

    @staticmethod
    def from_operator(
        op, domain, *, omega: float = 0.8, nu_pre: int = 1, nu_post: int = 1,
        fuse_min_extent: int = 512, interpret: Optional[bool] = None, **kwargs
    ) -> "ShardedFusedMultigrid":
        if nu_pre != nu_post:
            raise ValueError("nu_pre must equal nu_post (symmetric V-cycle)")
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        mesh = op.mesh
        my = int(np.prod(mesh.devices.shape[:-1]))
        mx = int(mesh.devices.shape[-1])
        inner = MultigridPreconditioner.from_domain(
            domain, omega=omega, nu_pre=nu_pre, nu_post=nu_post, fuse=False,
            **kwargs
        )
        # chain of domains mirroring the inner hierarchy
        domains = [domain]
        for _ in range(len(inner.levels) - 1):
            domains.append(_coarsen_domain(domains[-1]))

        levels = []
        child_dims = []
        hp, wp = op.padded_shape
        by = min(op.block_rows, 128)
        for li, d in enumerate(domains):
            hb = hp // my
            if not (
                nu_pre == 1
                and li < len(domains) - 1
                and d.ny + 1 >= fuse_min_extent
                and by >= 16
                and hb % by == 0
                and (wp // mx) % 128 == 0
                and hb % 2 == 0
            ):
                break
            c = domains[li + 1]
            cw_pad = _round_up(c.nx + 1, mx * 128)
            levels.append(
                _ShardedFusedLevel(
                    nx=d.nx,
                    ny=d.ny,
                    coeffs=(d.coeff_diag, d.coeff_x, d.coeff_y),
                    cs=omega / d.coeff_diag,
                    mask_mode=d.shape,
                    padded_shape=(hp, wp),
                    block_shape=(hb, wp // mx),
                    by=by,
                    cw_pad=cw_pad,
                    interpret=interpret,
                )
            )
            child_dims.append((c.nx, c.ny))
            hp, wp = hp // 2, cw_pad
            by = by // 2
        return ShardedFusedMultigrid(
            mesh=mesh,
            levels=tuple(levels),
            inner=inner,
            grid_shape=domain.grid_shape,
            child_dims=tuple(child_dims),
            nu_pre=nu_pre,
            nu_post=nu_post,
        )

    @property
    def num_levels(self) -> int:
        return self.inner.num_levels

    def accepts_padded(self, shape) -> bool:
        return bool(self.levels) and tuple(shape) == self.levels[0].padded_shape

    def _remainder(self, li: int, b: jnp.ndarray) -> jnp.ndarray:
        """jnp GSPMD V-cycle from inner level ``li`` on exact grid shapes."""
        lev = self.inner.levels[li]
        h, w = lev.interior.shape
        z = self.inner._vcycle(li, b[:h, :w])
        return jnp.pad(z, ((0, b.shape[0] - h), (0, b.shape[1] - w)))

    def _vc(self, li: int, b: jnp.ndarray, with_dot: bool = False):
        if li == len(self.levels):
            return self._remainder(li, b)
        lev = self.levels[li]
        cnx, cny = self.child_dims[li]
        rr = lev.down(self.mesh, b)  # (hp/2, wp) rows-restricted residual
        rc = lane_restrict(rr, lev.nx, lev.cw_pad)  # jnp, GSPMD-sharded
        # child-interior masking via iota predicate (no host constant)
        i32 = jnp.int32
        ri = lax.broadcasted_iota(i32, rc.shape, 0)
        ci = lax.broadcasted_iota(i32, rc.shape, 1)
        rc = jnp.where(_interior_pred(lev.mask_mode, cnx, cny)(ri, ci), rc, 0.0)
        ec = self._vc(li + 1, rc)
        ecl = lane_prolong(ec, lev.nx // 2, lev.padded_shape[1])
        return lev.up(self.mesh, b, ecl, with_dot=with_dot)

    def __call__(self, r: jnp.ndarray) -> jnp.ndarray:
        if not self.levels:
            # grid/mesh too small to shard-fuse any level: plain jnp GSPMD
            return self._remainder(0, r)
        if tuple(r.shape) != self.levels[0].padded_shape:
            raise ValueError(
                f"field shape {r.shape} != fine padded layout "
                f"{self.levels[0].padded_shape}"
            )
        if r.dtype == jnp.float32:
            with jax.enable_x64(False):
                return self._vc(0, r)
        # non-f32 (escalated f64 polish): jnp inner V-cycle on the cropped grid
        return self._remainder(0, r)

    def with_fmg(self, problem, dtype=jnp.float32) -> "ShardedFusedMultigrid":
        """A copy whose jnp inner hierarchy carries the FMG payload
        (multigrid.with_fmg) — enables the FMG warm start of the mesh
        engine-IR ladder (solvers/refine.py fmg=True)."""
        return dataclasses.replace(
            self, inner=self.inner.with_fmg(problem, dtype)
        )

    def fmg(self, r: jnp.ndarray, n_vcycles: int = 1) -> jnp.ndarray:
        """FMG warm start on the mesh-padded layout. A one-off setup pass, so
        it runs the jnp GSPMD hierarchy on the cropped global array (like
        ``_remainder``) rather than the shard-fused kernels."""
        h, w = self.grid_shape
        x = self.inner.fmg(r[:h, :w], n_vcycles)
        return jnp.pad(x, ((0, r.shape[0] - h), (0, r.shape[1] - w)))

    def fmg_stepwise(self, r: jnp.ndarray, n_vcycles: int = 1, **kw) -> jnp.ndarray:
        """Per-level-program FMG on the mesh-padded layout (see
        multigrid.fmg_stepwise — one GSPMD program per level instead of the
        O(levels²) monolith; the refine ladders route here). ``combine`` is
        dropped: a single GSPMD chain program was never build-time-validated
        over a mesh, so the mesh path keeps per-level programs."""
        kw.pop("combine", None)
        h, w = self.grid_shape
        x = self.inner.fmg_stepwise(r[:h, :w], n_vcycles, **kw)
        return jnp.pad(x, ((0, r.shape[0] - h), (0, r.shape[1] - w)))

    def call_with_dot(self, r: jnp.ndarray):
        """``(M r, (r, M r))`` with the dot fused into the finest K_up's
        epilogue — the sharded counterpart of the single-chip
        PaddedPreconditioner.call_with_dot: the PCG's (r, w) reduction rides
        the post-smooth write instead of re-reading two fields from HBM."""
        if (
            not self.levels
            or tuple(r.shape) != self.levels[0].padded_shape
            or r.dtype != jnp.float32
        ):
            w = self(r)
            return w, jnp.sum(r * w)
        with jax.enable_x64(False):
            return self._vc(0, r, with_dot=True)
