"""Fused Pallas kernels for the 3D V-cycle's fine levels (7-point box).

The 3D analogue of kernels/mg_fused.py: at 512³ the jnp V(1,1) cycle costs
~60 ms on v5e — ~10 full-volume sweeps, each at XLA's ~100-150 GB/s for
513-extent volumes — while the arithmetic needs ~3 sweeps per leg. Each leg
becomes one Pallas pass over the volume:

- **K_down** (pre-smooth + residual + z-restriction): grid over COARSE
  z-planes × y-panels. Each program reads the five fine b-planes
  2zc−2 … 2zc+2 of its panel (plus 8-row y-halo groups of the middle
  three), reconstructs the pre-smoothed iterate x = (ω/d)·b in registers,
  evaluates the residual at fine planes 2zc−1, 2zc, 2zc+1, and emits the
  z-restricted residual plane ¼R[2zc−1] + ½R[2zc] + ¼R[2zc+1]. The y/x
  restriction runs in XLA on the half-depth intermediate (4× less data).
- **K_up** (z-prolongation + correction + post-smooth): grid over FINE
  z-planes × y-panels. Each program reads its three fine b-planes (+ y-halo
  groups), the two-or-three coarse correction planes its z-neighborhood
  interpolates from (already y/x-prolonged in XLA, + their y-halo groups),
  rebuilds the corrected iterate x̃ = (ω/d)·b + Pz(ec) for planes t−1, t,
  t+1 in registers, and writes the post-smoothed plane
  x̃[t] + (ω/d)(b[t] − A x̃[t]).

The pre-smoothed iterate is never materialized (reconstructed from b, as in
the 2D kernels). Interior masks are algebraic box predicates — zero HBM
traffic. Same arithmetic as solvers/multigrid.py's jnp path (separable
transfers, R = Pᵀ/8), so the cycle stays symmetric and PCG-safe;
equivalence is pinned by interpret-mode tests.

z-prolongation parity note: fine plane t even takes ec[t/2]; t odd averages
ec[(t−1)/2] and ec[(t+1)/2] — matching _prolong1d's stack+reshape on axis 0.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mask_at(nx, ny, nz, zi, row0, shape):
    ri = lax.broadcasted_iota(jnp.int32, shape, 0) + row0
    ci = lax.broadcasted_iota(jnp.int32, shape, 1)
    return (zi > 0) & (zi < nz) & (ri > 0) & (ri < ny) & (ci > 0) & (ci < nx)


def _residual_plane(xm, xup_row, xdn_row, xzm, xzp, bm, m, cd, cx, cy, cz, wp):
    """r = b − A x at one plane, given the plane's masked x, its two y-halo
    rows, its two z-neighbor planes (masked), and the masked b."""
    yup = jnp.concatenate([xup_row, xm[:-1, :]], axis=0)
    ydn = jnp.concatenate([xm[1:, :], xdn_row], axis=0)
    ax = (
        cd * xm
        + cx * (pltpu.roll(xm, np.int32(1), 1) + pltpu.roll(xm, np.int32(wp - 1), 1))
        + cy * (yup + ydn)
        + cz * (xzm + xzp)
    )
    return jnp.where(m, bm - ax, 0.0)


def _make_k_resid_3d(nx, ny, nz, cd, cx, cy, cz, cs, by, wp):
    """Residual of the pre-smoothed iterate at ONE fine plane (grid over
    fine z × y-panels): reads three b planes + the center plane's two y-halo
    groups, keeps x = (ω/d)·b in registers.

    This replaces the old 5-plane K_down (which also z-restricted in-kernel):
    at the 512³ finest level Mosaic's compile time blew up superlinearly with
    live values × panel height — measured 457 s at by=104 / 616 s at by=40 vs
    ~2 s for the 3-plane K_up at the same geometry (NOTES_PERF round 3). With
    3 planes live this kernel compiles in seconds; the z-restriction moves to
    XLA on the z-major axis (plane-contiguous strided reads — cheap, unlike
    lane/sublane stride-2), costing ~2 ms of the 34 ms cycle for a ~450 s
    compile saving."""

    def kernel(bzm_ref, b_ref, bzp_ref, hup_ref, hdn_ref, r_ref):
        t = pl.program_id(0)
        j = pl.program_id(1)
        row0 = j * by

        m = _mask_at(nx, ny, nz, t, row0, (by, wp))
        bm = jnp.where(m, b_ref[0], 0.0)
        xm = cs * bm
        mzm = _mask_at(nx, ny, nz, t - 1, row0, (by, wp))
        mzp = _mask_at(nx, ny, nz, t + 1, row0, (by, wp))
        xzm = cs * jnp.where(mzm, bzm_ref[0], 0.0)
        xzp = cs * jnp.where(mzp, bzp_ref[0], 0.0)
        mu = _mask_at(nx, ny, nz, t, row0 - 1, (1, wp))
        md = _mask_at(nx, ny, nz, t, row0 + by, (1, wp))
        xup = cs * jnp.where(mu, hup_ref[0, -1:, :], 0.0)
        xdn = cs * jnp.where(md, hdn_ref[0, :1, :], 0.0)
        r_ref[0] = _residual_plane(
            xm, xup, xdn, xzm, xzp, bm, m, cd, cx, cy, cz, wp
        )

    return kernel


def _make_k_zrestrict(by, wp, d):
    """Coarse plane zc <- 0.25 r[2zc-1] + 0.5 r[2zc] + 0.25 r[2zc+1].
    Trivial 3-plane kernel: XLA's major-axis stride-2 gather ran ~5x off
    bandwidth here (measured +8 ms on the 512³ V-cycle); this runs at HBM
    speed and compiles in seconds."""

    def kernel(rm_ref, r_ref, rp_ref, rr_ref):
        zc = pl.program_id(0)
        lo = jnp.where(2 * zc - 1 >= 0, rm_ref[0], 0.0)
        hi = jnp.where(2 * zc + 1 <= d - 1, rp_ref[0], 0.0)
        rr_ref[0] = 0.25 * lo + 0.5 * r_ref[0] + 0.25 * hi

    return kernel


def _make_k_jacobi_3d(nx, ny, nz, cd, cx, cy, cz, cs, by, wp):
    """One weighted-Jacobi sweep ``out = x + (ω/d)·(b − A x)`` at one fine
    plane (grid over fine z × y-panels): reads the three x planes t−1,t,t+1
    (+ the center plane's y-halo groups) and the b plane, writes the swept
    plane. Single HBM pass for what the jnp path does in apply + axpy
    sweeps; 3-plane like K_resid, so it compiles in seconds (the 5-plane
    Mosaic blowup documented at _make_k_resid_3d does not apply)."""

    def kernel(xzm_ref, x_ref, xzp_ref, hup_ref, hdn_ref, b_ref, o_ref):
        t = pl.program_id(0)
        j = pl.program_id(1)
        row0 = j * by

        m = _mask_at(nx, ny, nz, t, row0, (by, wp))
        xm = jnp.where(m, x_ref[0], 0.0)
        bm = jnp.where(m, b_ref[0], 0.0)
        mzm = _mask_at(nx, ny, nz, t - 1, row0, (by, wp))
        mzp = _mask_at(nx, ny, nz, t + 1, row0, (by, wp))
        xzm = jnp.where(mzm, xzm_ref[0], 0.0)
        xzp = jnp.where(mzp, xzp_ref[0], 0.0)
        mu = _mask_at(nx, ny, nz, t, row0 - 1, (1, wp))
        md = _mask_at(nx, ny, nz, t, row0 + by, (1, wp))
        xup = jnp.where(mu, hup_ref[0, -1:, :], 0.0)
        xdn = jnp.where(md, hdn_ref[0, :1, :], 0.0)
        r = _residual_plane(xm, xup, xdn, xzm, xzp, bm, m, cd, cx, cy, cz, wp)
        o_ref[0] = xm + cs * r

    return kernel


def _make_k_jacobi_chunked_3d(nx, ny, nz, cd, cx, cy, cz, cs, bz, by, wp):
    """z-chunked weighted-Jacobi sweep: each program sweeps ``bz`` fine
    planes, reading each x-plane once (+ the two z-edge planes) instead of
    the per-plane kernel's ~3 reads/plane. Ragged depth handled exactly like
    the chunked down leg (garbage tail planes are mask-zeroed on read and
    clipped on store)."""

    def kernel(xc_ref, xzu_ref, xzd_ref, hup_ref, hdn_ref, b_ref, o_ref):
        k = pl.program_id(0)
        j = pl.program_id(1)
        z0 = k * bz
        row0 = j * by

        def xraw(off):  # raw x at fine plane z0+off, off in [-1, bz]
            if off == -1:
                return xzu_ref[0]
            if off == bz:
                return xzd_ref[0]
            return xc_ref[off]

        xs = {
            off: jnp.where(
                _mask_at(nx, ny, nz, z0 + off, row0, (by, wp)), xraw(off), 0.0
            )
            for off in range(-1, bz + 1)
        }
        for s in range(bz):
            m = _mask_at(nx, ny, nz, z0 + s, row0, (by, wp))
            bm = jnp.where(m, b_ref[s], 0.0)
            xup = jnp.where(
                _mask_at(nx, ny, nz, z0 + s, row0 - 1, (1, wp)),
                hup_ref[s, -1:, :], 0.0,
            )
            xdn = jnp.where(
                _mask_at(nx, ny, nz, z0 + s, row0 + by, (1, wp)),
                hdn_ref[s, :1, :], 0.0,
            )
            r = _residual_plane(
                xs[s], xup, xdn, xs[s - 1], xs[s + 1], bm, m, cd, cx, cy, cz, wp
            )
            o_ref[s] = xs[s] + cs * r

    return kernel


def _make_k_up_3d(nx, ny, nz, cd, cx, cy, cz, cs, by, wp, dc):
    def kernel(*refs):
        # inputs: b planes t-1,t,t+1 (3) + their y-halo groups (6),
        # ec coarse planes floor((t-1)/2), ceil(t/2)? -> we fetch the three
        # coarse planes (t-1)//2, t//2, (t+1+1)//2 clamped (3) + their y-halo
        # groups (6); output ref last
        b_refs = refs[0:3]
        bup = refs[3:6]
        bdn = refs[6:9]
        ec_refs = refs[9:12]
        ecup = refs[12:15]
        ecdn = refs[15:18]
        o_ref = refs[18]
        t = pl.program_id(0)
        j = pl.program_id(1)
        row0 = j * by

        def cvalid(zc, rows, r0):
            ri = lax.broadcasted_iota(jnp.int32, (rows, wp), 0) + r0
            return (zc >= 0) & (zc < dc) & (ri >= 0)

        # masked coarse planes (and their halo rows) for indices
        # c0=(t-1)//2? The three fetched coarse planes are (t//2)-1, t//2,
        # (t//2)+1 clamped; z-prolongation of fine plane s needs:
        #   s even: ec[s//2]; s odd: (ec[(s-1)//2] + ec[(s+1)//2]) / 2
        def ec_plane(i3, zc):
            ok = cvalid(zc, by, row0)
            return jnp.where(ok, ec_refs[i3][0], 0.0)

        def ec_row_up(i3, zc, r0):
            ok = cvalid(zc, 1, r0)
            return jnp.where(ok, ecup[i3][0, -1:, :], 0.0)

        def ec_row_dn(i3, zc, r0):
            ok = cvalid(zc, 1, r0)
            return jnp.where(ok, ecdn[i3][0, :1, :], 0.0)

        c_mid = t // 2  # the middle fetched coarse plane

        def pz(s, part):
            """z-prolonged correction at fine plane s for this panel.
            part: 'main' (by rows), 'up' (1 row above), 'dn' (1 row below).
            s ∈ {t-1, t, t+1}; the needed coarse planes are within
            c_mid-1..c_mid+1 (fetched)."""
            def get(zc, which):
                i3 = zc - (c_mid - 1)
                # i3 in {0,1,2} by construction (trace-time Python ints are
                # not available: zc is traced) — select via lax.switch-free
                # arithmetic: build all three and pick with where
                sel0 = zc == c_mid - 1
                sel1 = zc == c_mid
                if which == "main":
                    v0, v1, v2 = (ec_plane(0, c_mid - 1), ec_plane(1, c_mid),
                                  ec_plane(2, c_mid + 1))
                elif which == "up":
                    v0, v1, v2 = (
                        ec_row_up(0, c_mid - 1, row0 - 1),
                        ec_row_up(1, c_mid, row0 - 1),
                        ec_row_up(2, c_mid + 1, row0 - 1),
                    )
                else:
                    v0, v1, v2 = (
                        ec_row_dn(0, c_mid - 1, row0 + by),
                        ec_row_dn(1, c_mid, row0 + by),
                        ec_row_dn(2, c_mid + 1, row0 + by),
                    )
                return jnp.where(sel0, v0, jnp.where(sel1, v1, v2))

            even = (s % 2) == 0
            lo = get(jnp.where(even, s // 2, (s - 1) // 2), part)
            hi = get(jnp.where(even, s // 2, (s + 1) // 2), part)
            return jnp.where(even, lo, 0.5 * (lo + hi))

        def xcorr(i3, s, part):
            """corrected iterate x̃ = cs·b + Pz(ec) at fine plane s."""
            if part == "main":
                m = _mask_at(nx, ny, nz, s, row0, (by, wp))
                return jnp.where(m, cs * jnp.where(m, b_refs[i3][0], 0.0) + pz(s, part), 0.0), m
            if part == "up":
                m = _mask_at(nx, ny, nz, s, row0 - 1, (1, wp))
                return jnp.where(m, cs * bup[i3][0, -1:, :] + pz(s, part), 0.0), m
            m = _mask_at(nx, ny, nz, s, row0 + by, (1, wp))
            return jnp.where(m, cs * bdn[i3][0, :1, :] + pz(s, part), 0.0), m

        xm, m = xcorr(1, t, "main")
        xup_row, _ = xcorr(1, t, "up")
        xdn_row, _ = xcorr(1, t, "dn")
        xzm, _ = xcorr(0, t - 1, "main")
        xzp, _ = xcorr(2, t + 1, "main")
        bm = jnp.where(m, b_refs[1][0], 0.0)
        R = _residual_plane(xm, xup_row, xdn_row, xzm, xzp, bm, m, cd, cx, cy, cz, wp)
        o_ref[0] = jnp.where(m, xm + cs * R, 0.0)

    return kernel


def _make_k_down_chunked_3d(nx, ny, nz, cd, cx, cy, cz, cs, bz, by, wp):
    """Fused residual + z-restriction over a chunk of ``bz`` fine planes
    (``bz`` even): each program emits ``bz/2`` coarse planes and reads each
    fine b-plane once (vs 3 reads/plane + a separate 1.5-read restrict pass
    in the per-plane pipeline). Static in-chunk offsets also make the
    restriction stencil's plane indices compile-time constants."""
    bzc = bz // 2

    def kernel(bc_ref, bzu_ref, bzd_ref, hup_ref, hupz_ref, hdn_ref, hdnz_ref,
               rr_ref):
        k = pl.program_id(0)
        j = pl.program_id(1)
        z0 = k * bz
        row0 = j * by

        def braw(off):  # raw b at fine plane z0+off, off in [-2, bz]
            if off == -2:
                return bzu_ref[0]
            if off == -1:
                return bzu_ref[1]
            if off == bz:
                return bzd_ref[0]
            return bc_ref[off]

        bms = {
            off: jnp.where(_mask_at(nx, ny, nz, z0 + off, row0, (by, wp)),
                           braw(off), 0.0)
            for off in range(-2, bz + 1)
        }
        xs = {off: cs * bm for off, bm in bms.items()}

        def resid(s):  # masked residual at fine plane z0+s, s in [-1, bz-1]
            m = _mask_at(nx, ny, nz, z0 + s, row0, (by, wp))
            hu = hupz_ref[0, -1:, :] if s == -1 else hup_ref[s, -1:, :]
            hd = hdnz_ref[0, :1, :] if s == -1 else hdn_ref[s, :1, :]
            xup = cs * jnp.where(
                _mask_at(nx, ny, nz, z0 + s, row0 - 1, (1, wp)), hu, 0.0
            )
            xdn = cs * jnp.where(
                _mask_at(nx, ny, nz, z0 + s, row0 + by, (1, wp)), hd, 0.0
            )
            return _residual_plane(
                xs[s], xup, xdn, xs[s - 1], xs[s + 1], bms[s], m,
                cd, cx, cy, cz, wp,
            )

        rs = {s: resid(s) for s in range(-1, bz)}
        for c in range(bzc):
            rr_ref[c] = 0.25 * rs[2 * c - 1] + 0.5 * rs[2 * c] + 0.25 * rs[2 * c + 1]

    return kernel


def _make_k_up_chunked_3d(nx, ny, nz, cd, cx, cy, cz, cs, bz, by, wp, dc):
    """Chunked K_up: ``bz`` fine planes per program (``bz`` even). The
    z-prolongation plane parity is static inside the chunk, so the coarse
    operand selection is compile-time (the per-plane kernel pays a traced
    3-way where per element); b is read ~(1+2/bz)x instead of 3x."""
    bzc = bz // 2

    def kernel(bc_ref, bzu_ref, bzd_ref, bhu_ref, bhd_ref,
               ec_ref, eczu_ref, eczd_ref, echu_ref, echd_ref,
               echuz_ref, echdz_ref, o_ref):
        k = pl.program_id(0)
        j = pl.program_id(1)
        z0 = k * bz
        c0 = k * bzc
        row0 = j * by

        def braw(off):  # off in [-1, bz]
            if off == -1:
                return bzu_ref[0]
            if off == bz:
                return bzd_ref[0]
            return bc_ref[off]

        def cvalid(zc_off, rows, r0):
            zc = c0 + zc_off
            ri = lax.broadcasted_iota(jnp.int32, (rows, wp), 0) + r0
            return (zc >= 0) & (zc < dc) & (ri >= 0)

        def ec_get(c, part):  # coarse offset c in [-1, bzc]
            if part == "main":
                if c == -1:
                    raw = eczu_ref[0]
                elif c == bzc:
                    raw = eczd_ref[0]
                else:
                    raw = ec_ref[c]
                return jnp.where(cvalid(c, by, row0), raw, 0.0)
            if part == "up":
                raw = (echuz_ref[0, -1:, :] if c == bzc
                       else echu_ref[c, -1:, :])
                return jnp.where(cvalid(c, 1, row0 - 1), raw, 0.0)
            raw = echdz_ref[0, :1, :] if c == bzc else echd_ref[c, :1, :]
            return jnp.where(cvalid(c, 1, row0 + by), raw, 0.0)

        def pz(s, part):  # z-prolonged correction at fine offset s
            if s % 2 == 0:
                return ec_get(s // 2, part)
            return 0.5 * (ec_get((s - 1) // 2, part) + ec_get((s + 1) // 2, part))

        xms, bms, ms = {}, {}, {}
        for s in range(-1, bz + 1):
            m = _mask_at(nx, ny, nz, z0 + s, row0, (by, wp))
            bm = jnp.where(m, braw(s), 0.0)
            xms[s] = jnp.where(m, cs * bm + pz(s, "main"), 0.0)
            bms[s], ms[s] = bm, m

        for s in range(bz):
            mu = _mask_at(nx, ny, nz, z0 + s, row0 - 1, (1, wp))
            md = _mask_at(nx, ny, nz, z0 + s, row0 + by, (1, wp))
            xup = jnp.where(mu, cs * bhu_ref[s, -1:, :] + pz(s, "up"), 0.0)
            xdn = jnp.where(md, cs * bhd_ref[s, :1, :] + pz(s, "dn"), 0.0)
            R = _residual_plane(
                xms[s], xup, xdn, xms[s - 1], xms[s + 1], bms[s], ms[s],
                cd, cx, cy, cz, wp,
            )
            o_ref[s] = jnp.where(ms[s], xms[s] + cs * R, 0.0)

    return kernel


@dataclass(frozen=True, eq=False)
class FusedLevelKernels3D:
    """Compiled down/up legs of one 3D V-cycle level on its padded layout."""

    nx: int
    ny: int
    nz: int
    coeffs: Tuple[float, float, float, float]
    cs: float  # ω / diag
    padded_shape: Tuple[int, int, int]  # (D, Hp, Wp); D = nz+1 exact
    block_rows: int
    interpret: bool
    block_z: int = 1  # even and >1: z-chunked legs (each plane read once)

    def down(self, b: jnp.ndarray) -> jnp.ndarray:
        """z-restricted residual (Dc, Hp, Wp) of the pre-smoothed iterate."""
        with jax.enable_x64(False):
            if self.block_z > 1:
                return self._down_chunked(b)
            return self._down(b)

    def _down_chunked(self, b: jnp.ndarray) -> jnp.ndarray:
        d, hp, wp = self.padded_shape
        bz, by = self.block_z, self.block_rows
        bzc = bz // 2
        cd, cx, cy, cz = self.coeffs
        dc = self.nz // 2 + 1
        kernel = _make_k_down_chunked_3d(
            self.nx, self.ny, self.nz, cd, cx, cy, cz, self.cs, bz, by, wp
        )
        gy8 = hp // 8
        gsz = by // 8
        nk = -(-dc // bzc)  # ragged: the tail block's stores are masked
        return pl.pallas_call(
            kernel,
            grid=(nk, hp // by),
            in_specs=[
                pl.BlockSpec((bz, by, wp), lambda k, j: (k, j, 0)),
                # planes z0-2, z0-1 as one 2-plane block (index in 2-plane units)
                pl.BlockSpec(
                    (2, by, wp),
                    lambda k, j: (jnp.maximum(k * bzc - 1, 0), j, 0),
                ),
                # plane z0+bz
                pl.BlockSpec(
                    (1, by, wp),
                    lambda k, j: (jnp.minimum(k * bz + bz, d - 1), j, 0),
                ),
                # y-halo groups for the chunk planes and for plane z0-1
                pl.BlockSpec(
                    (bz, 8, wp),
                    lambda k, j: (k, jnp.maximum(j * gsz - 1, 0), 0),
                ),
                pl.BlockSpec(
                    (1, 8, wp),
                    lambda k, j: (
                        jnp.maximum(k * bz - 1, 0),
                        jnp.maximum(j * gsz - 1, 0),
                        0,
                    ),
                ),
                pl.BlockSpec(
                    (bz, 8, wp),
                    lambda k, j: (k, jnp.minimum(j * gsz + gsz, gy8 - 1), 0),
                ),
                pl.BlockSpec(
                    (1, 8, wp),
                    lambda k, j: (
                        jnp.maximum(k * bz - 1, 0),
                        jnp.minimum(j * gsz + gsz, gy8 - 1),
                        0,
                    ),
                ),
            ],
            out_specs=pl.BlockSpec((bzc, by, wp), lambda k, j: (k, j, 0)),
            out_shape=jax.ShapeDtypeStruct((dc, hp, wp), b.dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
            interpret=self.interpret,
        )(b, b, b, b, b, b, b)

    def _down(self, b: jnp.ndarray) -> jnp.ndarray:
        d, hp, wp = self.padded_shape
        by = self.block_rows
        cd, cx, cy, cz = self.coeffs
        dc = self.nz // 2 + 1
        kernel = _make_k_resid_3d(self.nx, self.ny, self.nz, cd, cx, cy, cz,
                                  self.cs, by, wp)
        gy8 = hp // 8

        def plane(off):
            return pl.BlockSpec(
                (1, by, wp),
                lambda t, j, off=off: (jnp.clip(t + off, 0, d - 1), j, 0),
            )

        halo_up = pl.BlockSpec(
            (1, 8, wp),
            lambda t, j: (t, jnp.maximum(j * (by // 8) - 1, 0), 0),
        )
        halo_dn = pl.BlockSpec(
            (1, 8, wp),
            lambda t, j: (t, jnp.minimum(j * (by // 8) + by // 8, gy8 - 1), 0),
        )
        r = pl.pallas_call(
            kernel,
            grid=(d, hp // by),
            in_specs=[plane(-1), plane(0), plane(1), halo_up, halo_dn],
            out_specs=pl.BlockSpec((1, by, wp), lambda t, j: (t, j, 0)),
            out_shape=jax.ShapeDtypeStruct((d, hp, wp), b.dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
            interpret=self.interpret,
        )(b, b, b, b, b)
        # z-restriction as a second trivial Pallas pass (see _make_k_zrestrict)
        kz = _make_k_zrestrict(by, wp, d)

        def zplane(off):
            return pl.BlockSpec(
                (1, by, wp),
                lambda zc, j, off=off: (jnp.clip(2 * zc + off, 0, d - 1), j, 0),
            )

        return pl.pallas_call(
            kz,
            grid=(dc, hp // by),
            in_specs=[zplane(-1), zplane(0), zplane(1)],
            out_specs=pl.BlockSpec((1, by, wp), lambda zc, j: (zc, j, 0)),
            out_shape=jax.ShapeDtypeStruct((dc, hp, wp), r.dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
            interpret=self.interpret,
        )(r, r, r)

    def _jacobi_block_rows(self) -> int:
        """Panel height for the CHUNKED Jacobi sweep: the largest
        multiple-of-8 divisor of Hp <= 48. The live set is ~(bz+2) x-planes
        of (by, Wp); by <= 48 keeps it ~1 MB (leg-sized by=104 would be
        ~26 MB). End-to-end validated: the 512³ ff solve with this sweep in
        the FMG polish measured 295.6 ms (NOTES_PERF round 5). NB eager
        per-call timings of this kernel are retrace-dominated (~1 s to
        rebuild/lower the unrolled chunk body on the 1-core host) — only
        jitted in-program use reflects kernel runtime."""
        hp = self.padded_shape[1]
        best = 8
        for by in range(8, 49, 8):
            if hp % by == 0:
                best = by
        return best

    def jacobi(self, x: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """One weighted-Jacobi sweep on the padded (D, Hp, Wp) layout."""
        with jax.enable_x64(False):
            if self.block_z > 1 and self._jacobi_block_rows() >= 24:
                return self._jacobi_chunked(x, b)
            return self._jacobi(x, b)

    def _jacobi_chunked(self, x: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        d, hp, wp = self.padded_shape
        bz, by = self.block_z, self._jacobi_block_rows()
        cd, cx, cy, cz = self.coeffs
        kernel = _make_k_jacobi_chunked_3d(
            self.nx, self.ny, self.nz, cd, cx, cy, cz, self.cs, bz, by, wp
        )
        gy8 = hp // 8
        gsz = by // 8
        nk = -(-d // bz)  # ragged tail: garbage reads masked, stores clipped
        in_specs = [
            pl.BlockSpec((bz, by, wp), lambda k, j: (k, j, 0)),
            pl.BlockSpec(
                (1, by, wp), lambda k, j: (jnp.maximum(k * bz - 1, 0), j, 0)
            ),
            pl.BlockSpec(
                (1, by, wp),
                lambda k, j: (jnp.minimum(k * bz + bz, d - 1), j, 0),
            ),
            pl.BlockSpec(
                (bz, 8, wp), lambda k, j: (k, jnp.maximum(j * gsz - 1, 0), 0)
            ),
            pl.BlockSpec(
                (bz, 8, wp),
                lambda k, j: (k, jnp.minimum(j * gsz + gsz, gy8 - 1), 0),
            ),
            pl.BlockSpec((bz, by, wp), lambda k, j: (k, j, 0)),
        ]
        return pl.pallas_call(
            kernel,
            grid=(nk, hp // by),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bz, by, wp), lambda k, j: (k, j, 0)),
            out_shape=jax.ShapeDtypeStruct((d, hp, wp), x.dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
            interpret=self.interpret,
        )(x, x, x, x, x, b)

    def _jacobi(self, x: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        d, hp, wp = self.padded_shape
        by = self.block_rows
        cd, cx, cy, cz = self.coeffs
        kernel = _make_k_jacobi_3d(
            self.nx, self.ny, self.nz, cd, cx, cy, cz, self.cs, by, wp
        )
        gy8 = hp // 8

        def plane(off):
            return pl.BlockSpec(
                (1, by, wp),
                lambda t, j, off=off: (jnp.clip(t + off, 0, d - 1), j, 0),
            )

        halo_up = pl.BlockSpec(
            (1, 8, wp),
            lambda t, j: (t, jnp.maximum(j * (by // 8) - 1, 0), 0),
        )
        halo_dn = pl.BlockSpec(
            (1, 8, wp),
            lambda t, j: (t, jnp.minimum(j * (by // 8) + by // 8, gy8 - 1), 0),
        )
        return pl.pallas_call(
            kernel,
            grid=(d, hp // by),
            in_specs=[plane(-1), plane(0), plane(1), halo_up, halo_dn,
                      pl.BlockSpec((1, by, wp), lambda t, j: (t, j, 0))],
            out_specs=pl.BlockSpec((1, by, wp), lambda t, j: (t, j, 0)),
            out_shape=jax.ShapeDtypeStruct((d, hp, wp), x.dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
            interpret=self.interpret,
        )(x, x, x, x, x, b)

    def up(self, b: jnp.ndarray, ec_yx: jnp.ndarray) -> jnp.ndarray:
        """Post-smoothed corrected iterate; ``ec_yx`` is the y/x-prolonged
        coarse correction, shape (Dc, Hp, Wp) on this level's panel layout."""
        with jax.enable_x64(False):
            if self.block_z > 1:
                return self._up_chunked(b, ec_yx)
            return self._up(b, ec_yx)

    def _up_chunked(self, b: jnp.ndarray, ec_yx: jnp.ndarray) -> jnp.ndarray:
        d, hp, wp = self.padded_shape
        bz, by = self.block_z, self.block_rows
        bzc = bz // 2
        cd, cx, cy, cz = self.coeffs
        dc = self.nz // 2 + 1
        kernel = _make_k_up_chunked_3d(
            self.nx, self.ny, self.nz, cd, cx, cy, cz, self.cs, bz, by, wp, dc
        )
        gy8 = hp // 8
        gsz = by // 8
        nk = -(-d // bz)  # ragged tail handled by masked stores
        in_specs = [
            pl.BlockSpec((bz, by, wp), lambda k, j: (k, j, 0)),
            pl.BlockSpec(
                (1, by, wp), lambda k, j: (jnp.maximum(k * bz - 1, 0), j, 0)
            ),
            pl.BlockSpec(
                (1, by, wp),
                lambda k, j: (jnp.minimum(k * bz + bz, d - 1), j, 0),
            ),
            pl.BlockSpec(
                (bz, 8, wp), lambda k, j: (k, jnp.maximum(j * gsz - 1, 0), 0)
            ),
            pl.BlockSpec(
                (bz, 8, wp),
                lambda k, j: (k, jnp.minimum(j * gsz + gsz, gy8 - 1), 0),
            ),
            pl.BlockSpec((bzc, by, wp), lambda k, j: (k, j, 0)),
            pl.BlockSpec(
                (1, by, wp), lambda k, j: (jnp.maximum(k * bzc - 1, 0), j, 0)
            ),
            pl.BlockSpec(
                (1, by, wp),
                lambda k, j: (jnp.minimum(k * bzc + bzc, dc - 1), j, 0),
            ),
            pl.BlockSpec(
                (bzc, 8, wp), lambda k, j: (k, jnp.maximum(j * gsz - 1, 0), 0)
            ),
            pl.BlockSpec(
                (bzc, 8, wp),
                lambda k, j: (k, jnp.minimum(j * gsz + gsz, gy8 - 1), 0),
            ),
            pl.BlockSpec(
                (1, 8, wp),
                lambda k, j: (
                    jnp.minimum(k * bzc + bzc, dc - 1),
                    jnp.maximum(j * gsz - 1, 0),
                    0,
                ),
            ),
            pl.BlockSpec(
                (1, 8, wp),
                lambda k, j: (
                    jnp.minimum(k * bzc + bzc, dc - 1),
                    jnp.minimum(j * gsz + gsz, gy8 - 1),
                    0,
                ),
            ),
        ]
        return pl.pallas_call(
            kernel,
            grid=(nk, hp // by),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bz, by, wp), lambda k, j: (k, j, 0)),
            out_shape=jax.ShapeDtypeStruct((d, hp, wp), b.dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
            interpret=self.interpret,
        )(b, b, b, b, b, ec_yx, ec_yx, ec_yx, ec_yx, ec_yx, ec_yx, ec_yx)

    def _up(self, b: jnp.ndarray, ec_yx: jnp.ndarray) -> jnp.ndarray:
        d, hp, wp = self.padded_shape
        by = self.block_rows
        cd, cx, cy, cz = self.coeffs
        dc = self.nz // 2 + 1
        kernel = _make_k_up_3d(self.nx, self.ny, self.nz, cd, cx, cy, cz,
                               self.cs, by, wp, dc)
        gy8 = hp // 8

        def bplane(off):
            return pl.BlockSpec(
                (1, by, wp),
                lambda t, j, off=off: (jnp.clip(t + off, 0, d - 1), j, 0),
            )

        def bhalo(off, up):
            if up:
                return pl.BlockSpec(
                    (1, 8, wp),
                    lambda t, j, off=off: (
                        jnp.clip(t + off, 0, d - 1),
                        jnp.maximum(j * (by // 8) - 1, 0),
                        0,
                    ),
                )
            return pl.BlockSpec(
                (1, 8, wp),
                lambda t, j, off=off: (
                    jnp.clip(t + off, 0, d - 1),
                    jnp.minimum(j * (by // 8) + by // 8, gy8 - 1),
                    0,
                ),
            )

        def cplane(off):
            return pl.BlockSpec(
                (1, by, wp),
                lambda t, j, off=off: (jnp.clip(t // 2 + off, 0, dc - 1), j, 0),
            )

        def chalo(off, up):
            if up:
                return pl.BlockSpec(
                    (1, 8, wp),
                    lambda t, j, off=off: (
                        jnp.clip(t // 2 + off, 0, dc - 1),
                        jnp.maximum(j * (by // 8) - 1, 0),
                        0,
                    ),
                )
            return pl.BlockSpec(
                (1, 8, wp),
                lambda t, j, off=off: (
                    jnp.clip(t // 2 + off, 0, dc - 1),
                    jnp.minimum(j * (by // 8) + by // 8, gy8 - 1),
                    0,
                ),
            )

        in_specs = (
            [bplane(o) for o in (-1, 0, 1)]
            + [bhalo(o, True) for o in (-1, 0, 1)]
            + [bhalo(o, False) for o in (-1, 0, 1)]
            + [cplane(o) for o in (-1, 0, 1)]
            + [chalo(o, True) for o in (-1, 0, 1)]
            + [chalo(o, False) for o in (-1, 0, 1)]
        )
        return pl.pallas_call(
            kernel,
            grid=(d, hp // by),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, by, wp), lambda t, j: (t, j, 0)),
            out_shape=jax.ShapeDtypeStruct((d, hp, wp), b.dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
            interpret=self.interpret,
        )(*([b] * 9 + [ec_yx] * 9))
