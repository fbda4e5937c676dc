"""Fully fused Pallas MSG-CG engine — two kernels per iteration.

This is the BASELINE.json target "msg_solver CG loop → fused Pallas
SpMV+axpy+dot pipeline". The classic iteration (reference
solver/msg_solver.cpp:80-184) touches each vector many times per iteration;
here the whole iteration is exactly two HBM sweeps:

- **K1 (direction + SpMV + dots, read-only)**: streams r and z_prev once,
  forms the new direction ``z_k = r + β·z_prev`` *in registers* (deferred
  from the previous iteration, when β was not yet known), applies the masked
  5-point stencil to it in registers, and emits only the per-panel partial
  reductions for (r,z), (Az,z), ‖z‖∞ plus the two z_k halo edge rows of each
  panel into a small side buffer. Az is never written to HBM.
  Traffic ≈ 8 B/node (pure read streams).
- **K2 (recompute + updates + dots, in-place)**: streams x, r, z_prev once;
  recomputes z_k AND the stencil ``A z_k`` in registers (panel halo rows come
  from K1's side buffer, so no overlapping halo reads), then writes
  ``x+αz``, ``r−αAz`` and ``z_k`` **in place** over x, r, z_prev via
  matched-index ``input_output_aliases`` (measured ~1.9× faster than fresh
  buffers on v5e, NOTES_PERF.md — and legal exactly because every read is
  block-local). Emits partials for ‖r‖², ‖r‖∞ (and ‖x−u‖∞ when a true
  solution is given). Traffic ≈ 24 B/node at in-place bandwidth.

The stencil is evaluated twice per iteration (VPU flops are free here — the
iteration is bandwidth-bound), buying a 40→32 B/node/iteration traffic
reduction over the store-Az variant.

All stop-criterion norms are produced on the way — the multi-criterion stop
bundle runs on scalars inside the same `lax.while_loop`, so the engine plugs
into the standard chunked driver (callbacks, interrupt, checkpointing)
through ``CGOptions.chunk_fn``. f32 only (Mosaic has no f64); per-panel
partial sums keep reduction error at the f32 tree-reduction level.
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

from iterative_solvers_tpu.kernels.stencil_pallas import (
    PallasStencilOperator,
    _interior_pred,
)
from iterative_solvers_tpu.solvers.cg import CGOptions, CGResult, CGState, cg_solve
from iterative_solvers_tpu.solvers.stopping import StopConfig, StopReason

LANES = 128


def _specs(by: int, wp: int, hp: int):
    main = pl.BlockSpec((by, wp), lambda i: (i, 0))
    up = pl.BlockSpec((8, wp), lambda i: (jnp.maximum(i * (by // 8) - 1, 0), 0))
    dn = pl.BlockSpec(
        (8, wp), lambda i: (jnp.minimum(i * (by // 8) + by // 8, hp // 8 - 1), 0)
    )
    scal = pl.BlockSpec((1, LANES), lambda i: (0, 0), memory_space=pltpu.SMEM)
    # per-panel partial reductions: (1, 8, LANES) blocks satisfy the (8, 128)
    # tiling rule with a leading grid dimension
    part = pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0))
    return main, up, dn, scal, part


def _mask_at(pred, row0, shape):
    ri = lax.broadcasted_iota(jnp.int32, shape, 0) + row0
    ci = lax.broadcasted_iota(jnp.int32, shape, 1)
    return pred(ri, ci)


def _stencil_regs(zk, up_row, dn_row, cd, cx, cy, wp, mask):
    """A·z_k entirely in registers, given the two masked halo rows."""
    up = jnp.concatenate([up_row, zk[:-1, :]], axis=0)
    dn = jnp.concatenate([zk[1:, :], dn_row], axis=0)
    # np.int32 shifts: under jax_enable_x64 a Python int would trace as i64,
    # which tpu.dynamic_rotate rejects
    y = cd * zk + cx * (
        pltpu.roll(zk, np.int32(1), 1) + pltpu.roll(zk, np.int32(wp - 1), 1)
    ) + cy * (up + dn)
    return jnp.where(mask, y, 0.0)


def _make_k1(nx, ny, cd, cx, cy, by, wp, hp, mask_mode, custom=False):
    """(r, r_up, r_dn, z, z_up, z_dn[, mask8], beta)
    -> (zk_halo_side, rz_part, azz_part, zmax_part). Read-only on fields.
    ``custom``: the interior mask is an int8 operand instead of an algebraic
    predicate; fields are pre-masked (solver invariants), so halo rows need
    only panel-id validity."""
    pred = None if custom else _interior_pred(mask_mode, nx, ny)
    nb = hp // by

    def kernel(r_ref, rup_ref, rdn_ref, z_ref, zup_ref, zdn_ref, *rest):
        if custom:
            m_ref, s_ref, side_ref, rz_ref, azz_ref, zmax_ref = rest
        else:
            s_ref, side_ref, rz_ref, azz_ref, zmax_ref = rest
        i = pl.program_id(0)
        row0 = i * by
        beta = s_ref[0, 0]
        r = r_ref[...]
        zk = r + beta * z_ref[...]
        # Halo rows of z_k, reconstructed from the r/z halo groups and
        # re-masked with the *virtual* row's interior mask (handles the
        # clamped garbage rows at the grid edges).
        up_row = rup_ref[-1:, :] + beta * zup_ref[-1:, :]
        dn_row = rdn_ref[:1, :] + beta * zdn_ref[:1, :]
        if custom:
            up_row = jnp.where(i > 0, up_row, 0.0)
            dn_row = jnp.where(i < nb - 1, dn_row, 0.0)
            mask = m_ref[...] != 0
        else:
            up_row = jnp.where(_mask_at(pred, row0 - 1, (1, wp)), up_row, 0.0)
            dn_row = jnp.where(_mask_at(pred, row0 + by, (1, wp)), dn_row, 0.0)
            mask = _mask_at(pred, row0, (by, wp))
        az = _stencil_regs(zk, up_row, dn_row, cd, cx, cy, wp, mask)
        # Stash this panel's z_k halo rows for K2 (rows 0/1 of an 8-row tile).
        side_ref[...] = jnp.concatenate(
            [up_row, dn_row, jnp.zeros((6, wp), az.dtype)], axis=0
        )[None]
        rz_ref[...] = jnp.full((1, 8, LANES), jnp.sum(r * zk), az.dtype)
        azz_ref[...] = jnp.full((1, 8, LANES), jnp.sum(az * zk), az.dtype)
        zmax_ref[...] = jnp.full((1, 8, LANES), jnp.max(jnp.abs(zk)), az.dtype)

    return kernel


def _make_k2(nx, ny, cd, cx, cy, by, wp, mask_mode, has_u, custom=False):
    """(x, r, z_prev, side[, mask8][, u], scalars)
    -> (x', r', z_k, r2_p, rmax_p[, err_p])
    with x/r/z written in place (aliases {0:0, 1:1, 2:2}); Az recomputed in
    registers from z_k and the side halo rows — every field read is
    block-local, which is what makes the in-place aliasing race-free."""
    pred = None if custom else _interior_pred(mask_mode, nx, ny)

    def kernel(x_ref, r_ref, z_ref, side_ref, *rest):
        if custom:
            m_ref, rest = rest[0], rest[1:]
        if has_u:
            u_ref, s_ref, xo_ref, ro_ref, zo_ref, r2_ref, rmax_ref, err_ref = rest
        else:
            s_ref, xo_ref, ro_ref, zo_ref, r2_ref, rmax_ref = rest
        i = pl.program_id(0)
        row0 = i * by
        alpha = s_ref[0, 0]
        beta = s_ref[0, 1]
        r = r_ref[...]
        zk = r + beta * z_ref[...]
        mask = (m_ref[...] != 0) if custom else _mask_at(pred, row0, (by, wp))
        az = _stencil_regs(
            zk,
            side_ref[0, 0:1, :],
            side_ref[0, 1:2, :],
            cd, cx, cy, wp,
            mask,
        )
        xn = x_ref[...] + alpha * zk
        rn = r - alpha * az
        xo_ref[...] = xn
        ro_ref[...] = rn
        zo_ref[...] = zk
        r2_ref[...] = jnp.full((1, 8, LANES), jnp.sum(rn * rn), rn.dtype)
        rmax_ref[...] = jnp.full((1, 8, LANES), jnp.max(jnp.abs(rn)), rn.dtype)
        if has_u:
            err_ref[...] = jnp.full(
                (1, 8, LANES), jnp.max(jnp.abs(xn - u_ref[...])), rn.dtype
            )

    return kernel


def _make_k2_pcg(nx, ny, cd, cx, cy, by, wp, mask_mode, has_u, custom=False):
    """(x, r, z_prev, w, side[, mask8][, u], scalars)
    -> (x', r', z_k, r2_p, rmax_p[, err_p])
    — the PCG variant of K2: the direction is ``z_k = w + β·z_prev`` where
    ``w = M r`` was staged at the jit level (the V-cycle runs between K2 and
    the next K1). x/r/z still write in place (aliases {0:0, 1:1, 2:2}); w is
    a read-only fourth stream."""
    pred = None if custom else _interior_pred(mask_mode, nx, ny)

    def kernel(x_ref, r_ref, z_ref, w_ref, side_ref, *rest):
        if custom:
            m_ref, rest = rest[0], rest[1:]
        if has_u:
            u_ref, s_ref, xo_ref, ro_ref, zo_ref, r2_ref, rmax_ref, err_ref = rest
        else:
            s_ref, xo_ref, ro_ref, zo_ref, r2_ref, rmax_ref = rest
        i = pl.program_id(0)
        row0 = i * by
        alpha = s_ref[0, 0]
        beta = s_ref[0, 1]
        zk = w_ref[...] + beta * z_ref[...]
        mask = (m_ref[...] != 0) if custom else _mask_at(pred, row0, (by, wp))
        az = _stencil_regs(
            zk,
            side_ref[0, 0:1, :],
            side_ref[0, 1:2, :],
            cd, cx, cy, wp,
            mask,
        )
        xn = x_ref[...] + alpha * zk
        rn = r_ref[...] - alpha * az
        xo_ref[...] = xn
        ro_ref[...] = rn
        zo_ref[...] = zk
        r2_ref[...] = jnp.full((1, 8, LANES), jnp.sum(rn * rn), rn.dtype)
        rmax_ref[...] = jnp.full((1, 8, LANES), jnp.max(jnp.abs(rn)), rn.dtype)
        if has_u:
            err_ref[...] = jnp.full(
                (1, 8, LANES), jnp.max(jnp.abs(xn - u_ref[...])), rn.dtype
            )

    return kernel


@dataclass(frozen=True, eq=False)
class FusedCGEngine:
    """Compiled fused-iteration runner for one padded grid geometry.

    With ``M`` set, runs the fused *PCG* iteration: the same two HBM-sweep
    kernels (K1 forms the direction from w/z_prev; K2 applies the updates
    in place with w as a fourth read stream) wrapped around one
    preconditioner application per iteration at the jit level — the fused
    V-cycle (kernels/mg_fused.py) slots in directly. The (r, w) dot rides a
    separate fused XLA reduction; beta is deferred exactly as in the plain
    engine (β_k = (r_k, w_k)/(r_{k−1}, w_{k−1}), alias rz/rz_prev)."""

    op: PallasStencilOperator
    M: Optional[object] = None  # hashable callable on padded fields

    def _call_k1(self, r, z, beta):
        # Self-scoped x64-off trace: the engine may be embedded in an f64
        # outer program (solvers/refine.py device-side IR loop), where the
        # global x64 flag would make BlockSpec index maps i64 (Mosaic rejects
        # them). All values here are f32/i32 with explicit dtypes.
        with jax.enable_x64(False):
            return self._call_k1_x32(r, z, beta)

    def _call_k1_x32(self, r, z, beta):
        op = self.op
        hp, wp = op.padded_shape
        by = op.block_rows
        cd, cx, cy = op.coeffs
        main, up, dn, scal, part = _specs(by, wp, hp)
        g = hp // by
        dtype = r.dtype
        custom = op.mask8 is not None
        kernel = _make_k1(
            op.nx, op.ny, cd, cx, cy, by, wp, hp, op.mask_mode, custom
        )
        scal_in = jnp.full((1, LANES), beta, dtype)
        side_spec = pl.BlockSpec((1, 8, wp), lambda i: (i, 0, 0))
        in_specs = [main, up, dn, main, up, dn]
        args = [r, r, r, z, z, z]
        if custom:
            in_specs.append(main)
            args.append(op.mask8)
        in_specs.append(scal)
        args.append(scal_in)
        return pl.pallas_call(
            kernel,
            grid=(g,),
            in_specs=in_specs,
            out_specs=(side_spec, part, part, part),
            out_shape=(
                jax.ShapeDtypeStruct((g, 8, wp), dtype),
                jax.ShapeDtypeStruct((g, 8, LANES), dtype),
                jax.ShapeDtypeStruct((g, 8, LANES), dtype),
                jax.ShapeDtypeStruct((g, 8, LANES), dtype),
            ),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
            interpret=op.interpret,
        )(*args)

    def _call_k2(self, x, r, z, side, u, alpha, beta):
        with jax.enable_x64(False):
            return self._call_k2_x32(x, r, z, side, u, alpha, beta)

    def _call_k2_x32(self, x, r, z, side, u, alpha, beta):
        op = self.op
        hp, wp = op.padded_shape
        by = op.block_rows
        cd, cx, cy = op.coeffs
        main, up, dn, scal, part = _specs(by, wp, hp)
        g = hp // by
        dtype = r.dtype
        has_u = u is not None
        custom = op.mask8 is not None
        kernel = _make_k2(
            op.nx, op.ny, cd, cx, cy, by, wp, op.mask_mode, has_u, custom
        )
        scal_in = jnp.zeros((1, LANES), dtype).at[0, 0].set(alpha).at[0, 1].set(beta)
        side_spec = pl.BlockSpec((1, 8, wp), lambda i: (i, 0, 0))
        out_shape = [
            jax.ShapeDtypeStruct((hp, wp), dtype),
            jax.ShapeDtypeStruct((hp, wp), dtype),
            jax.ShapeDtypeStruct((hp, wp), dtype),
            jax.ShapeDtypeStruct((g, 8, LANES), dtype),
            jax.ShapeDtypeStruct((g, 8, LANES), dtype),
        ]
        out_specs = [main, main, main, part, part]
        in_specs = [main, main, main, side_spec]
        args = [x, r, z, side]
        if custom:
            in_specs.append(main)
            args.append(op.mask8)
        if has_u:
            in_specs.append(main)
            args.append(u)
            out_shape.append(jax.ShapeDtypeStruct((g, 8, LANES), dtype))
            out_specs.append(part)
        in_specs.append(scal)
        args.append(scal_in)
        return pl.pallas_call(
            kernel,
            grid=(g,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            input_output_aliases={0: 0, 1: 1, 2: 2},
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
            interpret=op.interpret,
        )(*args)

    def _call_k2_pcg(self, x, r, z, w, side, u, alpha, beta):
        with jax.enable_x64(False):
            return self._call_k2_pcg_x32(x, r, z, w, side, u, alpha, beta)

    def _call_k2_pcg_x32(self, x, r, z, w, side, u, alpha, beta):
        op = self.op
        hp, wp = op.padded_shape
        by = op.block_rows
        cd, cx, cy = op.coeffs
        main, up, dn, scal, part = _specs(by, wp, hp)
        g = hp // by
        dtype = r.dtype
        has_u = u is not None
        custom = op.mask8 is not None
        kernel = _make_k2_pcg(
            op.nx, op.ny, cd, cx, cy, by, wp, op.mask_mode, has_u, custom
        )
        scal_in = jnp.zeros((1, LANES), dtype).at[0, 0].set(alpha).at[0, 1].set(beta)
        side_spec = pl.BlockSpec((1, 8, wp), lambda i: (i, 0, 0))
        out_shape = [
            jax.ShapeDtypeStruct((hp, wp), dtype),
            jax.ShapeDtypeStruct((hp, wp), dtype),
            jax.ShapeDtypeStruct((hp, wp), dtype),
            jax.ShapeDtypeStruct((g, 8, LANES), dtype),
            jax.ShapeDtypeStruct((g, 8, LANES), dtype),
        ]
        out_specs = [main, main, main, part, part]
        in_specs = [main, main, main, main, side_spec]
        args = [x, r, z, w, side]
        if custom:
            in_specs.append(main)
            args.append(op.mask8)
        if has_u:
            in_specs.append(main)
            args.append(u)
            out_shape.append(jax.ShapeDtypeStruct((g, 8, LANES), dtype))
            out_specs.append(part)
        in_specs.append(scal)
        args.append(scal_in)
        return pl.pallas_call(
            kernel,
            grid=(g,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            input_output_aliases={0: 0, 1: 1, 2: 2},
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
            interpret=op.interpret,
        )(*args)

    def _pcg_iteration(self, state: CGState, u_true):
        """One fused PCG iteration. Carries: state.w = M r (current),
        state.rz = (r, w) current, state.rz_prev = previous (r, w)."""
        beta = jnp.where(state.k == 0, 0.0, state.rz / state.rz_prev).astype(
            state.r.dtype
        )
        # K1 forms z_k = w + β z_prev and A z_k in registers; its first
        # operand is generic (the field the direction is built from), so the
        # plain kernel is reused with w in r's slot. Its (w, z_k) dot output
        # is not the PCG rz and is ignored.
        side, _, azz_p, zmax_p = self._call_k1(state.w, state.z, beta)
        azz = jnp.sum(azz_p[:, 0, 0])
        zmax = jnp.max(zmax_p[:, 0, 0])
        alpha = state.rz / azz
        outs = self._call_k2_pcg(
            state.x, state.r, state.z, state.w, side, u_true, alpha, beta
        )
        if u_true is not None:
            xn, rn, zk, r2_p, rmax_p, err_p = outs
            err_max = jnp.max(err_p[:, 0, 0])
        else:
            xn, rn, zk, r2_p, rmax_p = outs
            err_max = jnp.asarray(jnp.inf, rn.dtype)
        r2 = jnp.sum(r2_p[:, 0, 0])
        r_max = jnp.max(rmax_p[:, 0, 0])
        prec_max = jnp.abs(alpha) * zmax
        fn = getattr(self.M, "call_with_dot", None)
        if fn is not None:
            # (r, w) rides the V-cycle's finest K_up as a fused epilogue —
            # no separate two-field reduction sweep
            wn, rz_new = fn(rn)
        else:
            wn = self.M(rn)
            rz_new = jnp.sum(rn * wn)
        return state._replace(
            x=xn,
            r=rn,
            z=zk,
            w=wn,
            k=state.k + 1,
            rz=rz_new,
            rz_prev=state.rz,
            r_norm2=r2,
            prec_max=prec_max,
            r_max=r_max,
            err_max=err_max,
        )

    def iteration(self, state: CGState, u_true):
        """One fused MSG iteration. ``state.z`` holds z_{k-1} (the direction
        update is deferred into K1/K2, where β is finally known)."""
        if self.M is not None:
            return self._pcg_iteration(state, u_true)
        beta = jnp.where(state.k == 0, 0.0, state.r_norm2 / state.rz).astype(
            state.r.dtype
        )
        side, rz_p, azz_p, zmax_p = self._call_k1(state.r, state.z, beta)
        rz = jnp.sum(rz_p[:, 0, 0])
        azz = jnp.sum(azz_p[:, 0, 0])
        zmax = jnp.max(zmax_p[:, 0, 0])
        alpha = rz / azz
        outs = self._call_k2(state.x, state.r, state.z, side, u_true, alpha, beta)
        if u_true is not None:
            xn, rn, zk, r2_p, rmax_p, err_p = outs
            err_max = jnp.max(err_p[:, 0, 0])
        else:
            xn, rn, zk, r2_p, rmax_p = outs
            err_max = jnp.asarray(jnp.inf, rn.dtype)
        r2 = jnp.sum(r2_p[:, 0, 0])
        r_max = jnp.max(rmax_p[:, 0, 0])
        prec_max = jnp.abs(alpha) * zmax
        return CGState(
            x=xn,
            r=rn,
            z=zk,
            k=state.k + 1,
            done=state.done,
            reason=state.reason,
            rz=rz,
            r_norm2=r2,
            prec_max=prec_max,
            r_max=r_max,
            err_max=err_max,
            r0_norm=state.r0_norm,
        )


@partial(jax.jit, static_argnums=(0,))
def _pcg_init(M, r):
    """w_0 = M r_0 and (r_0, w_0) as ONE compiled program (the V-cycle would
    otherwise dispatch op-by-op over a tunneled TPU)."""
    fn = getattr(M, "call_with_dot", None)
    if fn is not None:
        return fn(r)
    w = M(r)
    return w, jnp.sum(r * w)


@lru_cache(maxsize=64)
def _engine_for(op: PallasStencilOperator, M) -> "FusedCGEngine":
    """Engines hash by identity (frozen, eq=False), so a fresh engine per
    solve would miss the _fused_chunk jit cache and recompile the whole
    iteration (~20-40 s over a TPU tunnel). Memoise per (op, M) pair; the
    cache's strong references keep the keys' ids stable."""
    return FusedCGEngine(op, M)


@partial(jax.jit, static_argnums=(0, 1))
def _fused_chunk(engine: FusedCGEngine, stop: StopConfig, state: CGState, u_true, k_stop):
    false = jnp.asarray(False)

    def body(s: CGState) -> CGState:
        s = engine.iteration(s, u_true)
        done_p = (s.prec_max < stop.eps_precision) if stop.eps_precision > 0 else false
        done_r = (s.r_max < stop.eps_residual) if stop.eps_residual > 0 else false
        done_e = (
            (s.err_max < stop.eps_exact_error)
            if (stop.eps_exact_error > 0 and u_true is not None)
            else false
        )
        done_rel = (
            (jnp.sqrt(s.r_norm2) < stop.eps_relative * s.r0_norm)
            if stop.eps_relative > 0
            else false
        )
        # Failure detection, mirroring the standard chunk (solvers/cg.py): a
        # non-finite ‖r‖² must report DIVERGED, not fall out of the loop via
        # the r_norm2 > 0 guard with reason still ITERATIONS.
        done_div = ~jnp.isfinite(s.r_norm2)
        reason = jnp.where(
            done_div,
            int(StopReason.DIVERGED),
            jnp.where(
                done_p,
                int(StopReason.PRECISION),
                jnp.where(
                    done_r,
                    int(StopReason.RESIDUAL),
                    jnp.where(
                        done_e,
                        int(StopReason.EXACT_ERROR),
                        jnp.where(
                            done_rel,
                            int(StopReason.RELATIVE_RESIDUAL),
                            int(StopReason.ITERATIONS),
                        ),
                    ),
                ),
            ),
        ).astype(jnp.int32)
        return s._replace(
            done=done_p | done_r | done_e | done_rel | done_div, reason=reason
        )

    def cond(s: CGState):
        # r_norm2 == 0 guard mirrors solvers/cg.py: an exact iterate must not
        # iterate into 0/0 (the driver converts the no-progress chunk into a
        # RESIDUAL stop)
        return (~s.done) & (s.k < k_stop) & (s.r_norm2 > 0)

    return lax.while_loop(cond, body, state)


def _run_fused_solve(op, b, u_true, opts: CGOptions, *, lay, engine) -> CGResult:
    """Shared driver of the single-chip and mesh-sharded fused solves
    (fused_cg_solve here, parallel/cg_fused_sharded.sharded_fused_cg_solve):
    the donated CGState init (z_prev convention, PCG carries), the CGOptions
    rebuild around the engine's chunk_fn, and the x64-off trace scope live in
    ONE place so the state contract cannot drift between the twins.

    ``lay`` maps an unpadded full-grid field onto the engine's working layout
    (``op.pad`` single-chip, ``op.shard`` over a mesh); ``engine`` is the
    caller-memoised fused engine (id-hashed jit static downstream)."""
    M = opts.preconditioner
    if opts.beta_kind != "msg":
        raise ValueError("fused engine implements the MSG recurrence only")

    dtype = jnp.float32
    bp = lay(jnp.asarray(b, dtype))
    up_true = lay(jnp.asarray(u_true, dtype)) if u_true is not None else None

    with jax.enable_x64(False):
        r2_0 = jnp.sum(bp * bp)
        if M is not None:
            # PCG carries: z_0 = w_0 = M r_0 (beta forced to 0 folds w into
            # the direction), rz = (r_0, w_0).
            w0, rz0 = _pcg_init(M, bp)
        else:
            w0 = rz0 = None
    state = CGState(
        x=jnp.zeros_like(bp),
        r=bp,
        z=jnp.zeros_like(bp),  # z_prev convention: z_0 = (r|w) + 0*z_prev
        k=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
        reason=jnp.asarray(int(StopReason.ITERATIONS), jnp.int32),
        rz=rz0 if rz0 is not None else jnp.asarray(1.0, dtype),
        r_norm2=r2_0,
        prec_max=jnp.asarray(jnp.inf, dtype),
        r_max=jnp.max(jnp.abs(bp)),
        err_max=(
            jnp.max(jnp.abs(up_true)) if up_true is not None else jnp.asarray(jnp.inf, dtype)
        ),
        r0_norm=jnp.sqrt(r2_0),
        w=w0,
        rz_prev=jnp.asarray(1.0, dtype) if M is not None else None,
    )

    fused_opts = CGOptions(
        stop=opts.stop,
        beta_kind="msg",
        callback=opts.callback,
        callback_every=opts.callback_every,
        chunk_size=opts.chunk_size,
        stop_requested=opts.stop_requested,
        record_history=opts.record_history,
        state_callback=opts.state_callback,
        chunk_fn=lambda state, u, k_stop: _fused_chunk(engine, opts.stop, state, u, k_stop),
    )
    # The engine is f32-only; under jax_enable_x64 the Mosaic lowering would
    # see i64 index-map/return values and fail to legalize, so trace the whole
    # solve in a local x64-disabled scope (arrays above are f32 already).
    with jax.enable_x64(False):
        res = cg_solve(lambda v: v, bp, u_true=up_true, options=fused_opts, init_state=state)
    res.x = op.crop(res.x)
    return res


def fused_cg_solve(
    op: PallasStencilOperator,
    b: jnp.ndarray,
    *,
    u_true: Optional[jnp.ndarray] = None,
    options: Optional[CGOptions] = None,
) -> CGResult:
    """Solve with the fused engine. ``b``/``u_true`` are *unpadded* full-grid
    fields; the returned ``CGResult.x`` is cropped back to the grid shape.
    f32 only (use the standard engine for f64 runs on CPU)."""
    opts = options or CGOptions()
    return _run_fused_solve(
        op, b, u_true, opts, lay=op.pad, engine=_engine_for(op, opts.preconditioner)
    )
