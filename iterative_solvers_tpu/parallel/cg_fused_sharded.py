"""Mesh-sharded fused CG/PCG engine: the two-kernel iteration per block.

Round-3 closes the last per-chip gap of mesh solves: with the sharded Pallas
stencil (halo_pallas.py) and shard-fused V-cycle (mg_sharded.py) in place,
the remaining difference vs the single-chip fused engine was the CG vector
recurrence — the jnp PCG inner loop pays ~3 extra HBM sweeps/iteration over
kernels/cg_fused.py's K1/K2 design (measured 17.3 vs 11.5 ms/iter at 8192²).
This module runs THAT design per block inside one `shard_map` per iteration:

- **K1** streams (w|r, z) once, forms the direction ``z_k`` and ``A z_k`` in
  registers, emits per-panel partials for (r,z)/(Az,z)/‖z‖∞ and the z_k halo
  side rows. Block-boundary halo rows arrive via two ppermutes (same panel-id
  select trick as halo_pallas.py); the lane-neighbor terms of (Az, z) touch
  only the block's edge columns and are added at the jit level from ppermuted
  z_k edge columns before the `psum`.
- **K2** recomputes ``z_k``/``A z_k`` from the side rows and writes
  ``x+αz_k``, ``r−αAz_k``, ``z_k`` in place (same input_output_aliases as the
  single-chip K2). Its ‖r‖²/‖r‖∞ partials EXCLUDE the block's edge lanes
  (in-kernel lane-iota mask) — the corrected edge strips contribute at the
  jit level, so the reductions are exact despite the post-kernel fix-up.
- Scalar recurrences (α, β, stop-criterion norms) run replicated via
  ``lax.psum``/``pmax`` inside the shard_map — the TPU-native replacement
  for the reference's host-side dot products (solver/msg_solver.cpp:215-258).

f32 only (Mosaic), gamma/rect masks (algebraic, offset by scalar-prefetch
block origins). The preconditioner (e.g. ShardedFusedMultigrid) applies
between iterations at the global-array level, outside the shard_map.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from iterative_solvers_tpu.kernels.stencil_pallas import _interior_pred
from iterative_solvers_tpu.parallel import mesh as mesh_lib
from iterative_solvers_tpu.parallel.halo import _bwd, _fwd
from iterative_solvers_tpu.parallel.halo_pallas import (
    ShardedPallasStencilOperator,
    _embed_row,
)
from iterative_solvers_tpu.solvers.cg import CGState

LANES = 128


def _az_regs_block(zk, up_row, dn_row, cd, cx, cy, w, mask):
    """A·z_k in registers; the wrapped lane is zeroed (live far-edge cell on
    a block — the true neighbor-column terms are jit-level edge corrections)."""
    up = jnp.concatenate([up_row, zk[:-1, :]], axis=0)
    dn = jnp.concatenate([zk[1:, :], dn_row], axis=0)
    lane = lax.broadcasted_iota(jnp.int32, zk.shape, 1)
    lf = jnp.where(lane == 0, 0.0, pltpu.roll(zk, np.int32(1), 1))
    rt = jnp.where(lane == w - 1, 0.0, pltpu.roll(zk, np.int32(w - 1), 1))
    y = cd * zk + cx * (lf + rt) + cy * (up + dn)
    return jnp.where(mask, y, 0.0)


def _make_k1_block(nx, ny, cd, cx, cy, by, w, mask_mode, nb):
    """(offs, d, dup, ddn, hdup, hddn, z, zup, zdn, hzup, hzdn, beta)
    -> (side, dz_part, azz_part, zmax_part). ``d`` is the field the direction
    is built from (r for MSG, w for PCG)."""
    pred = _interior_pred(mask_mode, nx, ny)

    def kernel(offs_ref, d_ref, dup_ref, ddn_ref, hdup_ref, hddn_ref,
               z_ref, zup_ref, zdn_ref, hzup_ref, hzdn_ref, s_ref,
               side_ref, dz_ref, azz_ref, zmax_ref):
        i = pl.program_id(0)
        roff = offs_ref[0]
        coff = offs_ref[1]
        row0 = i * by
        beta = s_ref[0, 0]

        def mask_at(r0, shape):
            ri = lax.broadcasted_iota(jnp.int32, shape, 0) + (r0 + roff)
            ci = lax.broadcasted_iota(jnp.int32, shape, 1) + coff
            return pred(ri, ci)

        d = d_ref[...]
        zk = d + beta * z_ref[...]
        dup = jnp.where(i == 0, hdup_ref[-1:, :], dup_ref[-1:, :])
        ddn = jnp.where(i == nb - 1, hddn_ref[:1, :], ddn_ref[:1, :])
        zup = jnp.where(i == 0, hzup_ref[-1:, :], zup_ref[-1:, :])
        zdn = jnp.where(i == nb - 1, hzdn_ref[:1, :], zdn_ref[:1, :])
        up_row = jnp.where(mask_at(row0 - 1, (1, w)), dup + beta * zup, 0.0)
        dn_row = jnp.where(mask_at(row0 + by, (1, w)), ddn + beta * zdn, 0.0)
        m = mask_at(row0, (by, w))
        az = _az_regs_block(zk, up_row, dn_row, cd, cx, cy, w, m)
        side_ref[...] = jnp.concatenate(
            [up_row, dn_row, jnp.zeros((6, w), az.dtype)], axis=0
        )[None]
        dz_ref[...] = jnp.full((1, 8, LANES), jnp.sum(d * zk), az.dtype)
        azz_ref[...] = jnp.full((1, 8, LANES), jnp.sum(az * zk), az.dtype)
        zmax_ref[...] = jnp.full((1, 8, LANES), jnp.max(jnp.abs(zk)), az.dtype)

    return kernel


def _make_k2_block(nx, ny, cd, cx, cy, by, w, mask_mode, has_u, pcg):
    """(offs, x, r, z, [w,] side[, u], scalars)
    -> (x', r', z_k, r2_part, rmax_part[, err_part]); x/r/z in place.
    The r2/rmax partials exclude the edge lanes (corrected at jit level)."""
    pred = _interior_pred(mask_mode, nx, ny)

    def kernel(offs_ref, x_ref, r_ref, z_ref, *rest):
        if pcg:
            w_ref, rest = rest[0], rest[1:]
        side_ref, rest = rest[0], rest[1:]
        if has_u:
            u_ref, s_ref, xo_ref, ro_ref, zo_ref, r2_ref, rmax_ref, err_ref = rest
        else:
            s_ref, xo_ref, ro_ref, zo_ref, r2_ref, rmax_ref = rest
        i = pl.program_id(0)
        roff = offs_ref[0]
        coff = offs_ref[1]
        row0 = i * by
        alpha = s_ref[0, 0]
        beta = s_ref[0, 1]

        ri = lax.broadcasted_iota(jnp.int32, (by, w), 0) + (row0 + roff)
        ci = lax.broadcasted_iota(jnp.int32, (by, w), 1) + coff
        m = pred(ri, ci)
        r = r_ref[...]
        zk = (w_ref[...] if pcg else r) + beta * z_ref[...]
        az = _az_regs_block(
            zk, side_ref[0, 0:1, :], side_ref[0, 1:2, :], cd, cx, cy, w, m
        )
        xn = x_ref[...] + alpha * zk
        rn = r - alpha * az
        xo_ref[...] = xn
        ro_ref[...] = rn
        zo_ref[...] = zk
        # edge lanes of rn are fixed up at the jit level (az misses the
        # neighbor-column terms there): exclude them from the partials
        lane = lax.broadcasted_iota(jnp.int32, (by, w), 1)
        inner = (lane > 0) & (lane < w - 1)
        rni = jnp.where(inner, rn, 0.0)
        r2_ref[...] = jnp.full((1, 8, LANES), jnp.sum(rni * rni), rn.dtype)
        rmax_ref[...] = jnp.full((1, 8, LANES), jnp.max(jnp.abs(rni)), rn.dtype)
        if has_u:
            err_ref[...] = jnp.full(
                (1, 8, LANES), jnp.max(jnp.abs(xn - u_ref[...])), rn.dtype
            )

    return kernel


def _specs_block(by, w, hb):
    main = pl.BlockSpec((by, w), lambda i, o: (i, 0))
    up = pl.BlockSpec((8, w), lambda i, o: (jnp.maximum(i * (by // 8) - 1, 0), 0))
    dn = pl.BlockSpec(
        (8, w), lambda i, o: (jnp.minimum(i * (by // 8) + by // 8, hb // 8 - 1), 0)
    )
    const8 = pl.BlockSpec((8, w), lambda i, o: (0, 0))
    scal = pl.BlockSpec((1, LANES), lambda i, o: (0, 0), memory_space=pltpu.SMEM)
    part = pl.BlockSpec((1, 8, LANES), lambda i, o: (i, 0, 0))
    side = pl.BlockSpec((1, 8, w), lambda i, o: (i, 0, 0))
    return main, up, dn, const8, scal, part, side


@partial(jax.jit, static_argnames=("nx", "ny", "cd", "cx", "cy", "by",
                                   "mask_mode", "interpret"))
def _k1_call(offs, d, hdup, hddn, z, hzup, hzdn, beta, *, nx, ny, cd, cx, cy,
             by, mask_mode, interpret):
    hb, w = d.shape
    nb = hb // by
    kernel = _make_k1_block(nx, ny, cd, cx, cy, by, w, mask_mode, nb)
    main, up, dn, const8, scal, part, side = _specs_block(by, w, hb)
    scal_in = jnp.full((1, LANES), beta, d.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[main, up, dn, const8, const8, main, up, dn, const8, const8,
                  scal],
        out_specs=(side, part, part, part),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nb, 8, w), d.dtype),
            jax.ShapeDtypeStruct((nb, 8, LANES), d.dtype),
            jax.ShapeDtypeStruct((nb, 8, LANES), d.dtype),
            jax.ShapeDtypeStruct((nb, 8, LANES), d.dtype),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
        interpret=interpret,
    )(offs, d, d, d, hdup, hddn, z, z, z, hzup, hzdn, scal_in)


@partial(jax.jit, static_argnames=("nx", "ny", "cd", "cx", "cy", "by",
                                   "mask_mode", "interpret", "pcg", "has_u"))
def _k2_call(offs, x, r, z, w_field, side, u, alpha, beta, *, nx, ny, cd, cx,
             cy, by, mask_mode, interpret, pcg, has_u):
    hb, w = r.shape
    nb = hb // by
    kernel = _make_k2_block(nx, ny, cd, cx, cy, by, w, mask_mode, has_u, pcg)
    main, up, dn, const8, scal, part, side_spec = _specs_block(by, w, hb)
    scal_in = jnp.zeros((1, LANES), r.dtype).at[0, 0].set(alpha).at[0, 1].set(beta)
    in_specs = [main, main, main]
    args = [x, r, z]
    if pcg:
        in_specs.append(main)
        args.append(w_field)
    in_specs.append(side_spec)
    args.append(side)
    out_specs = [main, main, main, part, part]
    out_shape = [
        jax.ShapeDtypeStruct((hb, w), r.dtype),
        jax.ShapeDtypeStruct((hb, w), r.dtype),
        jax.ShapeDtypeStruct((hb, w), r.dtype),
        jax.ShapeDtypeStruct((nb, 8, LANES), r.dtype),
        jax.ShapeDtypeStruct((nb, 8, LANES), r.dtype),
    ]
    if has_u:
        in_specs.append(main)
        args.append(u)
        out_specs.append(part)
        out_shape.append(jax.ShapeDtypeStruct((nb, 8, LANES), r.dtype))
    in_specs.append(scal)
    args.append(scal_in)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        # aliases are offset by the scalar-prefetch operand: input 0 is offs
        input_output_aliases={1: 0, 2: 1, 3: 2},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
        interpret=interpret,
    )(offs, *args)


@dataclass(frozen=True, eq=False)
class ShardedFusedCGEngine:
    """Drop-in for kernels/cg_fused.py's FusedCGEngine over a device mesh.

    ``op`` fixes the mesh + padded block layout; ``M`` (optional) is a
    preconditioner on the same global padded layout (ShardedFusedMultigrid).
    ``iteration(state, u_true)`` has the single-chip engine's contract, so
    the device-IR loop (solvers/refine.py `_device_ir`) and the chunked
    driver both work unchanged over the mesh.
    """

    op: ShardedPallasStencilOperator
    M: Optional[object] = None

    def _axes(self):
        return mesh_lib.row_col_axes(self.op.mesh)

    # --- per-block iteration body (inside shard_map) ------------------------

    def _iter_block(self, x, r, z, w_field, u, beta, rz, ay, ax):
        op = self.op
        cd, cx, cy = op.coeffs
        hb, wb = op.block_shape
        by = op.block_rows
        pred = _interior_pred(op.mask_mode, op.nx, op.ny)
        i32 = jnp.int32
        roff = (lax.axis_index(ay) * hb).astype(i32)
        coff = (lax.axis_index(ax) * wb).astype(i32)
        rows = lax.broadcasted_iota(i32, (hb, 1), 0) + roff
        cols = lax.broadcasted_iota(i32, (1, wb), 1) + coff
        offs = jnp.stack([roff, coff])
        axes_all = mesh_lib.row_col_axes_flat(op.mesh)
        d = w_field if self.M is not None else r

        # halo rows of the direction's ingredients (masked edge rows out)
        m_last = pred(rows[-1:], cols)
        m_first = pred(rows[:1], cols)
        hdup = lax.ppermute(jnp.where(m_last, d[-1:, :], 0.0), ay, perm=_fwd(ay))
        hddn = lax.ppermute(jnp.where(m_first, d[:1, :], 0.0), ay, perm=_bwd(ay))
        hzup = lax.ppermute(jnp.where(m_last, z[-1:, :], 0.0), ay, perm=_fwd(ay))
        hzdn = lax.ppermute(jnp.where(m_first, z[:1, :], 0.0), ay, perm=_bwd(ay))

        side, dz_p, azz_p, zmax_p = _k1_call(
            offs, d,
            _embed_row(hdup, wb, 7), _embed_row(hddn, wb, 0),
            z,
            _embed_row(hzup, wb, 7), _embed_row(hzdn, wb, 0),
            beta,
            nx=op.nx, ny=op.ny, cd=cd, cx=cx, cy=cy, by=by,
            mask_mode=op.mask_mode, interpret=op.interpret,
        )
        # z_k edge columns (own + neighbors') for the lane terms of (Az, z)
        mcol0 = pred(rows, coff)
        mcolW = pred(rows, coff + wb - 1)
        zk_c0 = jnp.where(mcol0, d[:, :1] + beta * z[:, :1], 0.0)
        zk_cW = jnp.where(mcolW, d[:, -1:] + beta * z[:, -1:], 0.0)
        zkL = lax.ppermute(zk_cW, ax, perm=_fwd(ax))  # z_k(m, -1)
        zkR = lax.ppermute(zk_c0, ax, perm=_bwd(ax))  # z_k(m, Wb)
        azz_local = jnp.sum(azz_p[:, 0, 0]) + cx * jnp.sum(
            zkL * zk_c0 + zkR * zk_cW
        )
        azz = lax.psum(azz_local, axes_all)
        zmax = lax.pmax(jnp.max(zmax_p[:, 0, 0]), axes_all)
        if self.M is None:
            rz = lax.psum(jnp.sum(dz_p[:, 0, 0]), axes_all)
        alpha = rz / azz

        outs = _k2_call(
            offs, x, r, z, w_field, side, u, alpha, beta,
            nx=op.nx, ny=op.ny, cd=cd, cx=cx, cy=cy, by=by,
            mask_mode=op.mask_mode, interpret=op.interpret,
            pcg=self.M is not None, has_u=u is not None,
        )
        if u is not None:
            xn, rn, zk, r2_p, rmax_p, err_p = outs
            err_max = lax.pmax(jnp.max(err_p[:, 0, 0]), axes_all)
        else:
            xn, rn, zk, r2_p, rmax_p = outs
            err_max = jnp.asarray(jnp.inf, rn.dtype)
        # edge-lane fix-up: az missed cx·z_k(m, ∓1) there
        dl = jnp.where(mcol0, -alpha * cx * zkL, 0.0)
        dr = jnp.where(mcolW, -alpha * cx * zkR, 0.0)
        rn = rn.at[:, :1].add(dl)
        rn = rn.at[:, -1:].add(dr)
        e0 = rn[:, :1]
        eW = rn[:, -1:]
        r2 = lax.psum(
            jnp.sum(r2_p[:, 0, 0]) + jnp.sum(e0 * e0) + jnp.sum(eW * eW),
            axes_all,
        )
        r_max = lax.pmax(
            jnp.maximum(
                jnp.max(rmax_p[:, 0, 0]),
                jnp.maximum(jnp.max(jnp.abs(e0)), jnp.max(jnp.abs(eW))),
            ),
            axes_all,
        )
        prec = jnp.abs(alpha) * zmax
        return xn, rn, zk, rz, r2, prec, r_max, err_max

    # --- public iteration ----------------------------------------------------

    def iteration(self, state: CGState, u_true):
        op = self.op
        ay, ax = self._axes()
        spec = mesh_lib.field_spec(op.mesh, 2)
        rep = P()
        pcg = self.M is not None
        if pcg:
            beta = jnp.where(state.k == 0, 0.0, state.rz / state.rz_prev)
        else:
            beta = jnp.where(state.k == 0, 0.0, state.r_norm2 / state.rz)
        beta = beta.astype(state.r.dtype)

        fields_in = (state.x, state.r, state.z)
        w_in = state.w if pcg else state.r  # placeholder stream when MSG
        u_in = u_true
        in_specs = (spec, spec, spec, spec, rep, rep) + (
            (spec,) if u_in is not None else ()
        )
        out_specs = (spec, spec, spec, rep, rep, rep, rep, rep)

        def body(x, r, z, w_field, beta_s, rz_s, *maybe_u):
            u = maybe_u[0] if maybe_u else None
            return self._iter_block(x, r, z, w_field, u, beta_s, rz_s, ay, ax)

        args = fields_in + (w_in, beta, state.rz) + (
            (u_in,) if u_in is not None else ()
        )
        with jax.enable_x64(False):
            xn, rn, zk, rz, r2, prec, r_max, err_max = jax.shard_map(
                body, mesh=op.mesh, in_specs=in_specs, out_specs=out_specs,
                check_vma=False,
            )(*args)

        if pcg:
            fn = getattr(self.M, "call_with_dot", None)
            if fn is not None:
                wn, rz_new = fn(rn)
            else:
                wn = self.M(rn)
                rz_new = jnp.sum(rn * wn)
            return state._replace(
                x=xn, r=rn, z=zk, w=wn, k=state.k + 1,
                rz=rz_new, rz_prev=state.rz,
                r_norm2=r2, prec_max=prec, r_max=r_max, err_max=err_max,
            )
        return CGState(
            x=xn, r=rn, z=zk, k=state.k + 1,
            done=state.done, reason=state.reason,
            rz=rz, r_norm2=r2, prec_max=prec, r_max=r_max, err_max=err_max,
            r0_norm=state.r0_norm,
        )


def sharded_fused_cg_solve(
    op: ShardedPallasStencilOperator,
    b: jnp.ndarray,
    *,
    u_true=None,
    options=None,
):
    """Solve over the mesh with the sharded fused engine (cf.
    kernels/cg_fused.py fused_cg_solve). ``b``/``u_true`` are *unpadded*
    full-grid host/global fields; the returned ``CGResult.x`` is cropped.
    f32 only."""
    from iterative_solvers_tpu.kernels.cg_fused import _run_fused_solve
    from iterative_solvers_tpu.solvers.cg import CGOptions

    opts = options or CGOptions()
    return _run_fused_solve(
        op, b, u_true, opts,
        lay=op.shard,
        engine=_sharded_engine_for(op, opts.preconditioner),
    )


@lru_cache(maxsize=64)
def _sharded_engine_for(op, M) -> "ShardedFusedCGEngine":
    """Memoised like kernels/cg_fused._engine_for: the engine is an
    id-hashed jit static downstream; a fresh object per solve would
    recompile the chunk program every call."""
    return ShardedFusedCGEngine(op, M)
