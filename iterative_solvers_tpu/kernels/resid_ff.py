"""Fused Pallas kernels for the double-f32 (ff) true residual.

The device-IR outer loop's ONLY high-precision work is the compensated
residual r = (bh+bl) − A·(xh+xl) (ops/ddf32.residual_ff — the TPU-native
replacement for the reference's all-double residual check,
solver/dirichlet_solver.cpp:147-161). The jnp formulation is a long chain
of elementwise EFT ops over pad/shift views that XLA schedules as many HBM
passes: measured ~29.9 ms per eval at 8192² (tools/profile_ff.py micro
section, 2026-08-20) where the plain stencil kernel does its one pass in
~0.9 ms — and every outer iteration pays two evals.

These kernels run the IDENTICAL EFT arithmetic (exact first differences +
TwoSum compensation per axis, static power-of-two coefficient scaling, a
plain-f32 A·xl correction, the −2Σc-vs-cd rounding gap folded in) inside
one streaming pass per node: reads xh/xl (with 1-row y halos and z-plane
neighbors in 3D) + bh/bl, writes rh/rl. Masks are algebraic (iota
predicates — zero HBM traffic), so these cover gamma/rect 2D domains and
the 3D box; custom-mask domains keep the jnp path.

Parity is pinned by tests/test_resid_ff.py against ops/ddf32.residual_ff
bit-for-bit-to-f32-rounding on both layouts.
"""

from __future__ import annotations

from functools import partial
from math import frexp, fsum
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from iterative_solvers_tpu.kernels.stencil_pallas import _interior_pred

Pair = Tuple[jnp.ndarray, jnp.ndarray]


def _two_sum(a, b):
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _is_pow2(v: float) -> bool:
    m, _ = frexp(abs(v))
    return m == 0.5 and v != 0.0


def _scaled_term(t, e_sum, c: float):
    """(main, err) of c·(t + e_sum); c static. Power-of-two c (all bench
    domains): both products exact. General c: Dekker TwoProd on the f32
    head + the f64 residue folded into the error channel (mirrors
    ops/ddf32._scaled_term)."""
    cf = jnp.float32(c)
    if _is_pow2(float(c)):
        return cf * t, cf * e_sum
    c_lo = jnp.float32(c - float(np.float32(c)))
    # inline TwoProd (f32 split at 12 bits)
    p = cf * t
    k = jnp.float32(4097.0) * t
    t_hi = k - (k - t)
    t_lo = t - t_hi
    cf_hi = np.float32(4097.0) * np.float32(c)
    cf_hi = np.float32(cf_hi - (cf_hi - np.float32(c)))
    cf_lo = np.float32(np.float32(c) - cf_hi)
    pe = ((cf_hi * t_hi - p) + cf_hi * t_lo + cf_lo * t_hi) + cf_lo * t_lo
    return p, (pe + c_lo * t) + cf * e_sum


def _axis_diff2(xm, lo, hi, c: float):
    """(main, err) of c·(x_lo − 2x + x_hi) via exact first differences —
    every intermediate is O(h²·u''·c) = O(result), no f32 cancellation."""
    d1, e1 = _two_sum(lo, -xm)
    d2, e2 = _two_sum(hi, -xm)
    t, e3 = _two_sum(d1, d2)
    return _scaled_term(t, (e1 + e2) + e3, c)


def _coeff_delta(coeffs) -> float:
    """cd + 2Σ axis-c: the f64 rounding gap between the operator's stored
    diagonal and the exact −2Σc the difference form implies."""
    return fsum([coeffs[0]] + [2.0 * c for c in coeffs[1:]])


def _finish_pair(bh_m, bl_m, mains, corr, m):
    """Shared tail: exact-sum the axis mains, fold the correction channel,
    and renormalize to an (rh, rl) pair, masked to the interior. ``corr``
    must already hold (Σ axis errs) + A·xl (+ δ·xh) in exactly that order —
    bit-parity with ops/ddf32.residual_ff."""
    S, es = _two_sum(mains[0], mains[1])
    for mn in mains[2:]:
        S, e = _two_sum(S, mn)
        es = es + e
    t1, e_t1 = _two_sum(bh_m, -S)
    rl = ((bl_m - es) - corr) + e_t1
    rh, rl = _two_sum(t1, rl)
    z = jnp.zeros_like(rh)
    return jnp.where(m, rh, z), jnp.where(m, rl, z)


# --------------------------------------------------------------------------
# 2D
# --------------------------------------------------------------------------


def _make_k_resid_ff_2d(nx, ny, cd, cx, cy, by, wp, mask_mode):
    pred = _interior_pred(mask_mode, nx, ny)
    delta = _coeff_delta((cd, cx, cy))

    def mask_at(row0, shape):
        ri = lax.broadcasted_iota(jnp.int32, shape, 0) + row0
        ci = lax.broadcasted_iota(jnp.int32, shape, 1)
        return pred(ri, ci)

    def kernel(xh_ref, xhu_ref, xhd_ref, xl_ref, xlu_ref, xld_ref,
               bh_ref, bl_ref, rh_ref, rl_ref):
        i = pl.program_id(0)
        row0 = i * by
        m = mask_at(row0, (by, wp))
        mu = mask_at(row0 - 1, (1, wp))
        md = mask_at(row0 + by, (1, wp))
        xh = jnp.where(m, xh_ref[...], 0.0)
        xl = jnp.where(m, xl_ref[...], 0.0)
        bh = jnp.where(m, bh_ref[...], 0.0)
        bl = jnp.where(m, bl_ref[...], 0.0)

        def neighbors(x, up_row, dn_row):
            up = jnp.concatenate([up_row, x[:-1, :]], axis=0)  # value at iy-1
            dn = jnp.concatenate([x[1:, :], dn_row], axis=0)  # value at iy+1
            lf = pltpu.roll(x, np.int32(1), 1)  # value at ix-1 (wrap masked)
            rt = pltpu.roll(x, np.int32(wp - 1), 1)  # value at ix+1
            return lf, rt, up, dn

        h_lf, h_rt, h_up, h_dn = neighbors(
            xh,
            jnp.where(mu, xhu_ref[-1:, :], 0.0),
            jnp.where(md, xhd_ref[:1, :], 0.0),
        )
        mx, ex = _axis_diff2(xh, h_lf, h_rt, cx)
        my, ey = _axis_diff2(xh, h_up, h_dn, cy)

        # plain-f32 A·xl (the low part is rounding residue — no cancellation
        # to protect) + the −2Σc/cd rounding-gap fold
        l_lf, l_rt, l_up, l_dn = neighbors(
            xl,
            jnp.where(mu, xlu_ref[-1:, :], 0.0),
            jnp.where(md, xld_ref[:1, :], 0.0),
        )
        axl = cd * xl + cx * (l_lf + l_rt) + cy * (l_up + l_dn)
        corr = (ex + ey) + jnp.where(m, axl, 0.0)
        if delta != 0.0:
            corr = corr + jnp.float32(delta) * xh
        rh, rl = _finish_pair(bh, bl, (mx, my), corr, m)
        rh_ref[...] = rh
        rl_ref[...] = rl

    return kernel


@partial(
    jax.jit,
    static_argnames=(
        "nx", "ny", "cd", "cx", "cy", "block_rows", "mask_mode", "interpret"
    ),
)
def pallas_residual_ff_2d(
    xh, xl, bh, bl, *, nx, ny, cd, cx, cy, block_rows, mask_mode, interpret
):
    """(rh, rl) = (bh+bl) − A·(xh+xl) on padded (Hp, Wp) f32 fields."""
    hp, wp = xh.shape
    by = block_rows
    assert hp % by == 0 and wp % 128 == 0, (hp, wp, by)
    kernel = _make_k_resid_ff_2d(nx, ny, cd, cx, cy, by, wp, mask_mode)
    main = pl.BlockSpec((by, wp), lambda i: (i, 0))
    up = pl.BlockSpec((8, wp), lambda i: (jnp.maximum(i * (by // 8) - 1, 0), 0))
    dn = pl.BlockSpec(
        (8, wp), lambda i: (jnp.minimum(i * (by // 8) + by // 8, hp // 8 - 1), 0)
    )
    out = jax.ShapeDtypeStruct((hp, wp), xh.dtype)
    return pl.pallas_call(
        kernel,
        grid=(hp // by,),
        in_specs=[main, up, dn, main, up, dn, main, main],
        out_specs=(main, main),
        out_shape=(out, out),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
        interpret=interpret,
    )(xh, xh, xh, xl, xl, xl, bh, bl)


# --------------------------------------------------------------------------
# 3D (box domain)
# --------------------------------------------------------------------------


def _mask3_at(nx, ny, nz, zi, row0, shape):
    ri = lax.broadcasted_iota(jnp.int32, shape, 0) + row0
    ci = lax.broadcasted_iota(jnp.int32, shape, 1)
    return (zi > 0) & (zi < nz) & (ri > 0) & (ri < ny) & (ci > 0) & (ci < nx)


def _make_k_resid_ff_3d(nx, ny, nz, cd, cx, cy, cz, by, wp):
    delta = _coeff_delta((cd, cx, cy, cz))

    def kernel(xhm_ref, xh_ref, xhp_ref, xhu_ref, xhd_ref,
               xlm_ref, xl_ref, xlp_ref, xlu_ref, xld_ref,
               bh_ref, bl_ref, rh_ref, rl_ref):
        t = pl.program_id(0)
        j = pl.program_id(1)
        row0 = j * by
        m = _mask3_at(nx, ny, nz, t, row0, (by, wp))
        mzm = _mask3_at(nx, ny, nz, t - 1, row0, (by, wp))
        mzp = _mask3_at(nx, ny, nz, t + 1, row0, (by, wp))
        mu = _mask3_at(nx, ny, nz, t, row0 - 1, (1, wp))
        md = _mask3_at(nx, ny, nz, t, row0 + by, (1, wp))

        def neighbors(x, up_row, dn_row):
            up = jnp.concatenate([up_row, x[:-1, :]], axis=0)
            dn = jnp.concatenate([x[1:, :], dn_row], axis=0)
            lf = pltpu.roll(x, np.int32(1), 1)
            rt = pltpu.roll(x, np.int32(wp - 1), 1)
            return lf, rt, up, dn

        xh = jnp.where(m, xh_ref[0], 0.0)
        bh = jnp.where(m, bh_ref[0], 0.0)
        bl = jnp.where(m, bl_ref[0], 0.0)
        h_lf, h_rt, h_up, h_dn = neighbors(
            xh,
            jnp.where(mu, xhu_ref[0, -1:, :], 0.0),
            jnp.where(md, xhd_ref[0, :1, :], 0.0),
        )
        h_zm = jnp.where(mzm, xhm_ref[0], 0.0)
        h_zp = jnp.where(mzp, xhp_ref[0], 0.0)
        mx, ex = _axis_diff2(xh, h_lf, h_rt, cx)
        my, ey = _axis_diff2(xh, h_up, h_dn, cy)
        mz, ez = _axis_diff2(xh, h_zm, h_zp, cz)

        xl = jnp.where(m, xl_ref[0], 0.0)
        l_lf, l_rt, l_up, l_dn = neighbors(
            xl,
            jnp.where(mu, xlu_ref[0, -1:, :], 0.0),
            jnp.where(md, xld_ref[0, :1, :], 0.0),
        )
        l_zm = jnp.where(mzm, xlm_ref[0], 0.0)
        l_zp = jnp.where(mzp, xlp_ref[0], 0.0)
        axl = (
            cd * xl + cx * (l_lf + l_rt) + cy * (l_up + l_dn)
            + cz * (l_zm + l_zp)
        )
        corr = ((ex + ey) + ez) + jnp.where(m, axl, 0.0)
        if delta != 0.0:
            corr = corr + jnp.float32(delta) * xh
        rh, rl = _finish_pair(bh, bl, (mx, my, mz), corr, m)
        rh_ref[0] = rh
        rl_ref[0] = rl

    return kernel


@partial(
    jax.jit,
    static_argnames=(
        "nx", "ny", "nz", "cd", "cx", "cy", "cz", "block_rows", "interpret"
    ),
)
def pallas_residual_ff_3d(
    xh, xl, bh, bl, *, nx, ny, nz, cd, cx, cy, cz, block_rows, interpret
):
    """(rh, rl) = (bh+bl) − A·(xh+xl) on padded (D, Hp, Wp) f32 volumes.

    3-plane form like mg_fused3d's K_resid/K_jacobi (the 5-plane Mosaic
    compile blowup documented there does not apply)."""
    d, hp, wp = xh.shape
    by = block_rows
    assert hp % by == 0 and wp % 128 == 0, (d, hp, wp, by)
    kernel = _make_k_resid_ff_3d(nx, ny, nz, cd, cx, cy, cz, by, wp)
    gy8 = hp // 8

    def plane(off):
        return pl.BlockSpec(
            (1, by, wp), lambda t, j, off=off: (jnp.clip(t + off, 0, d - 1), j, 0)
        )

    halo_up = pl.BlockSpec(
        (1, 8, wp), lambda t, j: (t, jnp.maximum(j * (by // 8) - 1, 0), 0)
    )
    halo_dn = pl.BlockSpec(
        (1, 8, wp), lambda t, j: (t, jnp.minimum(j * (by // 8) + by // 8, gy8 - 1), 0)
    )
    main = pl.BlockSpec((1, by, wp), lambda t, j: (t, j, 0))
    out = jax.ShapeDtypeStruct((d, hp, wp), xh.dtype)
    return pl.pallas_call(
        kernel,
        grid=(d, hp // by),
        in_specs=[
            plane(-1), plane(0), plane(1), halo_up, halo_dn,
            plane(-1), plane(0), plane(1), halo_up, halo_dn,
            main, main,
        ],
        out_specs=(main, main),
        out_shape=(out, out),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
        interpret=interpret,
    )(xh, xh, xh, xh, xh, xl, xl, xl, xl, xl, bh, bl)


def _make_k_resid_ff_chunked_3d(nx, ny, nz, cd, cx, cy, cz, bz, by, wp):
    """z-chunked variant: each program emits ``bz`` planes of (rh, rl),
    reading each xh/xl plane once (+ the two z-edge planes) instead of ~3
    reads/plane. Ragged depth handled like mg_fused3d's chunked legs."""
    delta = _coeff_delta((cd, cx, cy, cz))

    def kernel(xhc_ref, xhu_ref, xhd_ref, hup_h_ref, hdn_h_ref,
               xlc_ref, xlu_ref, xld_ref, hup_l_ref, hdn_l_ref,
               bh_ref, bl_ref, rh_ref, rl_ref):
        k = pl.program_id(0)
        j = pl.program_id(1)
        z0 = k * bz
        row0 = j * by

        def masked_planes(c_ref, u_ref, d_ref):
            def raw(off):
                if off == -1:
                    return u_ref[0]
                if off == bz:
                    return d_ref[0]
                return c_ref[off]

            return {
                off: jnp.where(
                    _mask3_at(nx, ny, nz, z0 + off, row0, (by, wp)),
                    raw(off), 0.0,
                )
                for off in range(-1, bz + 1)
            }

        xh = masked_planes(xhc_ref, xhu_ref, xhd_ref)
        xl = masked_planes(xlc_ref, xlu_ref, xld_ref)

        for s in range(bz):
            m = _mask3_at(nx, ny, nz, z0 + s, row0, (by, wp))
            mu = _mask3_at(nx, ny, nz, z0 + s, row0 - 1, (1, wp))
            md = _mask3_at(nx, ny, nz, z0 + s, row0 + by, (1, wp))
            bh = jnp.where(m, bh_ref[s], 0.0)
            bl = jnp.where(m, bl_ref[s], 0.0)

            def neighbors(x, up_row, dn_row):
                up = jnp.concatenate([up_row, x[:-1, :]], axis=0)
                dn = jnp.concatenate([x[1:, :], dn_row], axis=0)
                lf = pltpu.roll(x, np.int32(1), 1)
                rt = pltpu.roll(x, np.int32(wp - 1), 1)
                return lf, rt, up, dn

            h_lf, h_rt, h_up, h_dn = neighbors(
                xh[s],
                jnp.where(mu, hup_h_ref[s, -1:, :], 0.0),
                jnp.where(md, hdn_h_ref[s, :1, :], 0.0),
            )
            mx, ex = _axis_diff2(xh[s], h_lf, h_rt, cx)
            my, ey = _axis_diff2(xh[s], h_up, h_dn, cy)
            mz, ez = _axis_diff2(xh[s], xh[s - 1], xh[s + 1], cz)

            l_lf, l_rt, l_up, l_dn = neighbors(
                xl[s],
                jnp.where(mu, hup_l_ref[s, -1:, :], 0.0),
                jnp.where(md, hdn_l_ref[s, :1, :], 0.0),
            )
            axl = (
                cd * xl[s] + cx * (l_lf + l_rt) + cy * (l_up + l_dn)
                + cz * (xl[s - 1] + xl[s + 1])
            )
            corr = ((ex + ey) + ez) + jnp.where(m, axl, 0.0)
            if delta != 0.0:
                corr = corr + jnp.float32(delta) * xh[s]
            rh, rl = _finish_pair(bh, bl, (mx, my, mz), corr, m)
            rh_ref[s] = rh
            rl_ref[s] = rl

    return kernel


@partial(
    jax.jit,
    static_argnames=(
        "nx", "ny", "nz", "cd", "cx", "cy", "cz", "block_z", "block_rows",
        "interpret",
    ),
)
def pallas_residual_ff_3d_chunked(
    xh, xl, bh, bl, *, nx, ny, nz, cd, cx, cy, cz, block_z, block_rows,
    interpret
):
    """z-chunked :func:`pallas_residual_ff_3d` (each xh/xl plane read once)."""
    d, hp, wp = xh.shape
    bz, by = block_z, block_rows
    assert hp % by == 0 and wp % 128 == 0, (d, hp, wp, by)
    kernel = _make_k_resid_ff_chunked_3d(nx, ny, nz, cd, cx, cy, cz, bz, by, wp)
    gy8 = hp // 8
    gsz = by // 8
    nk = -(-d // bz)  # ragged tail: garbage reads masked, stores clipped
    chunk = pl.BlockSpec((bz, by, wp), lambda k, j: (k, j, 0))
    zup = pl.BlockSpec((1, by, wp), lambda k, j: (jnp.maximum(k * bz - 1, 0), j, 0))
    zdn = pl.BlockSpec(
        (1, by, wp), lambda k, j: (jnp.minimum(k * bz + bz, d - 1), j, 0)
    )
    hup = pl.BlockSpec((bz, 8, wp), lambda k, j: (k, jnp.maximum(j * gsz - 1, 0), 0))
    hdn = pl.BlockSpec(
        (bz, 8, wp), lambda k, j: (k, jnp.minimum(j * gsz + gsz, gy8 - 1), 0)
    )
    out = jax.ShapeDtypeStruct((d, hp, wp), xh.dtype)
    return pl.pallas_call(
        kernel,
        grid=(nk, hp // by),
        in_specs=[chunk, zup, zdn, hup, hdn,
                  chunk, zup, zdn, hup, hdn,
                  chunk, chunk],
        out_specs=(chunk, chunk),
        out_shape=(out, out),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
        interpret=interpret,
    )(xh, xh, xh, xh, xh, xl, xl, xl, xl, xl, bh, bl)


# --------------------------------------------------------------------------
# operator-keyed dispatch for the device-IR loop
# --------------------------------------------------------------------------


def ff_residual_fn(op, field_shape):
    """A fused-kernel ``(b_pair, x_pair) -> (rh, rl)`` for ``op``, or None.

    ``op`` must be a single-chip Pallas stencil operator with an ALGEBRAIC
    interior mask (gamma/rect 2D, 3D box) and ``field_shape`` must be its
    padded layout — i.e. the caller's fields are already kernel-ready.
    Custom masks, jnp operators, and sharded twins return None (the loop
    keeps the jnp ``residual_ff``)."""
    from iterative_solvers_tpu.kernels.stencil3d_pallas import (
        Pallas3DStencilOperator,
    )
    from iterative_solvers_tpu.kernels.stencil_pallas import (
        PallasStencilOperator,
    )

    if (
        isinstance(op, PallasStencilOperator)
        and op.mask8 is None
        and tuple(field_shape) == tuple(op.padded_shape)
    ):
        cd, cx, cy = op.coeffs

        def fn2(b_pair: Pair, x_pair: Pair) -> Pair:
            with jax.enable_x64(False):
                return pallas_residual_ff_2d(
                    x_pair[0], x_pair[1], b_pair[0], b_pair[1],
                    nx=op.nx, ny=op.ny, cd=cd, cx=cx, cy=cy,
                    block_rows=op.block_rows, mask_mode=op.mask_mode,
                    interpret=op.interpret,
                )

        return fn2
    if isinstance(op, Pallas3DStencilOperator) and tuple(field_shape) == tuple(
        op.padded_shape
    ):
        cd, cx, cy, cz = op.coeffs
        # z-chunked variant (each xh/xl plane read once vs ~3x) on deep
        # volumes, with a SMALL panel: the chunk's live set is ~2(bz+2)
        # masked planes of (by, Wp); by <= 48 keeps it ~1 MB. Measured
        # 31.4 ms vs 32.9 per-plane at 512³ standalone (compile 1.3 s), and
        # the full 512³ ff solve with this + the chunked Jacobi polish hit
        # 295.6 ms vs 311.5 (2026-08-20, NOTES_PERF round 5).
        d_pad, hp, _ = op.padded_shape
        by_c = max((b for b in range(8, 49, 8) if hp % b == 0), default=8)
        bz = 4 if (d_pad >= 32 and by_c >= 24) else 1

        def fn3(b_pair: Pair, x_pair: Pair) -> Pair:
            with jax.enable_x64(False):
                if bz > 1:
                    return pallas_residual_ff_3d_chunked(
                        x_pair[0], x_pair[1], b_pair[0], b_pair[1],
                        nx=op.nx, ny=op.ny, nz=op.nz, cd=cd, cx=cx, cy=cy,
                        cz=cz, block_z=bz, block_rows=by_c,
                        interpret=op.interpret,
                    )
                return pallas_residual_ff_3d(
                    x_pair[0], x_pair[1], b_pair[0], b_pair[1],
                    nx=op.nx, ny=op.ny, nz=op.nz, cd=cd, cx=cx, cy=cy, cz=cz,
                    block_rows=op.block_rows, interpret=op.interpret,
                )

        return fn3
    return None
