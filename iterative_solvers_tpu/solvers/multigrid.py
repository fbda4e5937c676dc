"""Geometric multigrid V-cycle preconditioner (extension beyond the reference).

The reference solves its Poisson systems with plain CG whose iteration count
grows like O(n) with grid resolution (reference solver/msg_solver.cpp:80-184
runs up to 10000 iterations at 30x30 already). A multigrid V-cycle makes the
preconditioned system's condition number O(1), so MG-PCG converges in a
resolution-independent ~10-20 iterations — the dominant speedup lever for the
8192² headline benchmark (BASELINE.md).

TPU-native design decisions:

- **Everything is full-grid masked fields** (core/domain.py layout): each
  level is just a coarser `Domain2D`/`Domain3D` with its own interior mask and
  rediscretized 5/7-point stencil — no sparse matrices, no indirection.
- **Separable transfer operators**: prolongation is per-axis linear
  interpolation (bilinear in 2D, trilinear in 3D) built from stack+reshape
  interleaving — contiguous relayouts XLA handles well, no strided scatters.
  Restriction is the exact adjoint (full-weighting, R = Pᵀ/2^ndim per the
  per-axis [1,2,1]/4 kernel), which is what makes the V-cycle a *symmetric*
  linear operator — a hard requirement for use inside PCG.
- **Weighted-Jacobi smoothing** (ω=0.8, the 2D 5-point optimum): pure
  stencil-apply + axpy, bandwidth-bound VPU work, identical cost profile to
  the CG iteration itself; symmetric, and with nu_pre == nu_post the whole
  V-cycle stays symmetric.
- **Coarsest solve is linear and exact**: a precomputed dense inverse of the
  coarsest-level operator applied via gather → matmul → scatter (static index
  sets). CG would NOT be legal here (it is nonlinear in b and would silently
  break PCG); when the grid cannot be coarsened far enough for a dense
  inverse, a fixed-degree Chebyshev polynomial (also linear and symmetric)
  is used instead.

The operator is the *negative*-definite discrete Laplacian (SURVEY §0), and
the V-cycle approximates its inverse, so (r, M r) < 0 throughout — the PCG
recurrence in solvers/cg.py handles that sign convention unchanged.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from iterative_solvers_tpu.core.domain import Domain2D, Domain3D, MaskSpec


# --------------------------------------------------------------------------
# Separable transfer operators
# --------------------------------------------------------------------------


def _axslice(ndim: int, axis: int, s: slice):
    out = [slice(None)] * ndim
    out[axis] = s
    return tuple(out)


def _restrict1d(a: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Full-weighting restriction along one axis: coarse node i <- fine node 2i
    with kernel [1, 2, 1]/4. Fine extent 2*nc+1 -> coarse extent nc+1.

    Slices along the NATIVE axis (the prior ``moveaxis`` round trip read as
    two full-field transposes per axis; measured neutral on TPU — XLA had
    already fused them away — but this form says what it does)."""
    n = a.shape[axis]  # = 2*nc + 1
    nc1 = (n - 1) // 2 + 1
    pad = [(0, 0)] * a.ndim
    pad[axis] = (1, 1)
    p = jnp.pad(a, pad)
    lo = p[_axslice(a.ndim, axis, slice(0, 2 * nc1 - 1, 2))]
    mid = p[_axslice(a.ndim, axis, slice(1, 2 * nc1, 2))]
    hi = p[_axslice(a.ndim, axis, slice(2, 2 * nc1 + 1, 2))]
    return 0.25 * (lo + hi) + 0.5 * mid


def _prolong1d(a: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Linear interpolation along one axis: even fine nodes copy the coarse
    value, odd fine nodes average their two coarse neighbors. The adjoint of
    :func:`_restrict1d` up to the factor 2 (R = Pᵀ/2 per axis). Interleaves
    via stack+reshape on the native axis (no transposes)."""
    nc1 = a.shape[axis]
    left = a[_axslice(a.ndim, axis, slice(None, -1))]
    right = a[_axslice(a.ndim, axis, slice(1, None))]
    mid = 0.5 * (left + right)
    inter_shape = a.shape[:axis] + (2 * (nc1 - 1),) + a.shape[axis + 1 :]
    inter = jnp.stack([left, mid], axis=axis + 1).reshape(inter_shape)
    return jnp.concatenate(
        [inter, a[_axslice(a.ndim, axis, slice(-1, None))]], axis=axis
    )


@functools.lru_cache(maxsize=None)
def _restrict_mat_np(n_active: int, n_in: int) -> np.ndarray:
    """``(n_in, nc)`` full-weighting restriction matrix along one axis:
    coarse node c <- fine nodes (2c-1, 2c, 2c+1) with weights [1,2,1]/4,
    rows >= ``n_active`` (the padded tail of the kernel layout) all-zero —
    the crop is folded into the operator. Used by the fused-3D V-cycle's
    matmul transfers (see _FusedLevel3D.restrict_yx)."""
    nc = (n_active - 1) // 2 + 1
    R = np.zeros((n_in, nc), np.float32)
    for c in range(nc):
        for off, wgt in ((-1, 0.25), (0, 0.5), (1, 0.25)):
            f = 2 * c + off
            if 0 <= f < n_active:
                R[f, c] = wgt
    return R


@functools.lru_cache(maxsize=None)
def _prolong_mat_np(n_active: int, n_out: int) -> np.ndarray:
    """``(nc, n_out)`` linear-interpolation matrix: P = 2 Rᵀ (the exact
    adjoint relation the symmetric V-cycle requires), columns >= n_active
    zero — prolongation writes the padded layout directly."""
    return np.ascontiguousarray(2.0 * _restrict_mat_np(n_active, n_out).T)


# Above this per-axis extent the O(extent) matmul-transfer arithmetic
# exceeds the MXU:HBM balance point (~240 flops/byte on v5e) and the
# stride-2 XLA path wins again; 512³-class grids sit far below it.
_MATMUL_TRANSFER_MAX_EXTENT = 1024


def restrict_full_weighting(r: jnp.ndarray) -> jnp.ndarray:
    """ndim-separable full-weighting restriction (all axes halved)."""
    for ax in range(r.ndim):
        r = _restrict1d(r, ax)
    return r


def prolong_linear(e: jnp.ndarray) -> jnp.ndarray:
    """ndim-separable bilinear/trilinear prolongation (all axes doubled)."""
    for ax in range(e.ndim):
        e = _prolong1d(e, ax)
    return e


# --------------------------------------------------------------------------
# Level hierarchy
# --------------------------------------------------------------------------


def _coarsen_domain(d):
    """The next-coarser domain (all interval counts halved), or None if the
    domain cannot be rediscretized at half resolution."""
    if isinstance(d, Domain3D):
        if d.nx % 2 or d.ny % 2 or d.nz % 2 or min(d.nx, d.ny, d.nz) < 4:
            return None
        return dataclasses.replace(d, nx=d.nx // 2, ny=d.ny // 2, nz=d.nz // 2)
    if d.nx % 2 or d.ny % 2 or min(d.nx, d.ny) < 4:
        return None
    cnx, cny = d.nx // 2, d.ny // 2
    if d.shape == "gamma" and (cnx % 2 or cny % 2):
        return None  # the Г-mask needs even interval counts
    c = d.with_resolution(cnx, cny)
    return c if c.num_unknowns > 0 else None


def _neighbor_coeffs(d) -> Tuple[Tuple[int, float], ...]:
    """(axis, coefficient) per stencil direction, axes in field order."""
    if isinstance(d, Domain3D):
        return ((0, d.coeff_z), (1, d.coeff_y), (2, d.coeff_x))
    return ((0, d.coeff_y), (1, d.coeff_x))


def _assemble_dense(d) -> Tuple[np.ndarray, np.ndarray]:
    """(interior flat indices, dense packed matrix) of the level operator.
    Only ever used on the coarsest level, where the unknown count is tiny."""
    interior = np.asarray(d.interior)
    flat = np.arange(interior.size).reshape(interior.shape)
    idx = np.flatnonzero(interior.ravel())
    P = idx.size
    pos = np.full(interior.size, -1, dtype=np.int64)
    pos[idx] = np.arange(P)
    A = np.zeros((P, P), dtype=np.float64)
    A[np.arange(P), np.arange(P)] = d.coeff_diag
    for axis, c in _neighbor_coeffs(d):
        sl_lo = [slice(None)] * interior.ndim
        sl_hi = [slice(None)] * interior.ndim
        sl_lo[axis] = slice(None, -1)
        sl_hi[axis] = slice(1, None)
        both = interior[tuple(sl_lo)] & interior[tuple(sl_hi)]
        f_lo = flat[tuple(sl_lo)][both]
        f_hi = flat[tuple(sl_hi)][both]
        A[pos[f_lo], pos[f_hi]] = c
        A[pos[f_hi], pos[f_lo]] = c
    return idx, A


@dataclass(frozen=True, eq=False)
class _Level:
    # Custom masks keep a concrete array; gamma/rect/box levels carry a
    # MaskSpec and rebuild the mask in-trace from iota — a captured bool
    # array becomes a multi-MB HLO constant in every program closing over
    # the hierarchy, and serializing those constants dominated program
    # build time at 8192² (291 s lower vs 40 s XLA, NOTES_PERF 2026-08-19).
    interior_arr: Optional[jnp.ndarray]  # bool mask, or None with mask_spec
    coeffs: Tuple[float, ...]  # (cd, c_axis0, c_axis1[, c_axis2]) in axis order
    omega_over_diag: float  # ω / diag(A) — one Jacobi sweep scaling
    mask_spec: Optional["MaskSpec"] = None

    @property
    def interior(self) -> jnp.ndarray:
        if self.interior_arr is not None:
            return self.interior_arr
        return self.mask_spec.build()

    @property
    def grid_shape(self) -> Tuple[int, ...]:
        if self.interior_arr is not None:
            return tuple(self.interior_arr.shape)
        return tuple(self.mask_spec.shape)

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        """Masked stencil apply, inlined per-level (levels differ in shape)."""
        interior = self.interior
        xm = jnp.where(interior, x, 0)
        p = jnp.pad(xm, 1)
        y = self.coeffs[0] * xm
        for ax in range(x.ndim):
            sl_lo = tuple(
                slice(0, -2) if a == ax else slice(1, -1) for a in range(x.ndim)
            )
            sl_hi = tuple(
                slice(2, None) if a == ax else slice(1, -1) for a in range(x.ndim)
            )
            y = y + self.coeffs[1 + ax] * (p[sl_lo] + p[sl_hi])
        return jnp.where(interior, y, 0)

    def mask(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.where(self.interior, x, 0)


@dataclass(frozen=True, eq=False)
class _CoarseSolveDense:
    """e = A⁻¹ b on the coarsest level via a precomputed dense inverse,
    applied gather → matmul → scatter with static index sets.

    ``idx``/``a_inv`` are HOST (numpy) arrays on purpose: a device-resident
    jnp array captured in a jit closure must be fetched back to the host at
    lowering time to be embedded as a constant, and over the tunneled TPU
    that blocking fetch is slow and wildly variable (it rode behind queued
    device work for minutes in the worst measured case, NOTES_PERF
    2026-08-19). A numpy constant embeds with no device round-trip."""

    idx: np.ndarray  # int32 flat indices of interior nodes
    a_inv: np.ndarray  # (P, P) dense inverse

    def __call__(self, b: jnp.ndarray) -> jnp.ndarray:
        bp = b.ravel()[self.idx]
        ep = (self.a_inv @ bp.astype(self.a_inv.dtype)).astype(b.dtype)
        return jnp.zeros(b.size, b.dtype).at[self.idx].set(ep).reshape(b.shape)


@dataclass(frozen=True, eq=False)
class _CoarseSolveChebyshev:
    """Fixed-degree Chebyshev approximation of A⁻¹ — linear and symmetric,
    the legal fallback when the coarsest level is too big to invert densely."""

    level: _Level
    lam_lo: float
    lam_hi: float
    degree: int

    def __call__(self, b: jnp.ndarray) -> jnp.ndarray:
        theta = 0.5 * (self.lam_hi + self.lam_lo)
        delta = 0.5 * (self.lam_hi - self.lam_lo)
        sigma1 = theta / delta
        z = b / theta
        d = z
        rho_prev = 1.0 / sigma1
        for _ in range(self.degree):
            rho = 1.0 / (2.0 * sigma1 - rho_prev)
            resid = b - self.level.apply(z)
            d = (rho * rho_prev) * d + (2.0 * rho / delta) * resid
            z = z + d
            rho_prev = rho
        return self.level.mask(z)


@dataclass(frozen=True, eq=False)
class _FusedLevel:
    """Fine V-cycle level running the fused Pallas down/up kernels
    (kernels/mg_fused.py) on its own padded layout; interfaces stay unpadded."""

    kernels: object  # FusedLevelKernels
    h: int  # unpadded row extent (ny+1)
    w: int  # unpadded col extent (nx+1)
    ch: int  # child rows (ny/2+1)
    cw: int  # child cols (nx/2+1)
    nx: int
    child_interior_arr: Optional[jnp.ndarray]  # bool (ch, cw), custom masks
    jnp_level: _Level  # fallback for non-f32 fields (the kernels are f32-only)
    child_mask_spec: Optional["MaskSpec"] = None  # in-trace child mask

    @property
    def child_interior(self) -> jnp.ndarray:
        if self.child_interior_arr is not None:
            return self.child_interior_arr
        return self.child_mask_spec.build()

    def pad_in(self, f: jnp.ndarray) -> jnp.ndarray:
        hp, wp = self.kernels.padded_shape
        return jnp.pad(f, ((0, hp - self.h), (0, wp - self.w)))

    def mask(self, x: jnp.ndarray) -> jnp.ndarray:
        # The jnp fallback path (non-f32 fields, e.g. the escalated f64
        # polish) masks through the CHILD level object, which may be fused.
        return self.jnp_level.mask(x)


@dataclass(frozen=True, eq=False)
class _FusedLevel3D:
    """Fine 3D V-cycle level running the fused Pallas z-leg kernels
    (kernels/mg_fused3d.py); y/x transfers stay in XLA on the half-depth
    intermediate."""

    kernels: object  # FusedLevelKernels3D
    h: int  # unpadded y extent (ny+1)
    w: int  # unpadded x extent (nx+1)
    child_interior_arr: Optional[jnp.ndarray]  # bool, child grid shape
    jnp_level: _Level  # fallback for non-f32 fields
    child_mask_spec: Optional["MaskSpec"] = None

    @property
    def child_interior(self) -> jnp.ndarray:
        if self.child_interior_arr is not None:
            return self.child_interior_arr
        return self.child_mask_spec.build()

    def pad_in(self, f: jnp.ndarray) -> jnp.ndarray:
        d, hp, wp = self.kernels.padded_shape
        return jnp.pad(f, ((0, 0), (0, hp - self.h), (0, wp - self.w)))

    def mask(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.jnp_level.mask(x)

    @property
    def _matmul_transfers(self) -> bool:
        """Run the y/x V-cycle transfers as banded-matrix MXU matmuls.

        The stride-2 XLA forms (_restrict1d/_prolong1d) lower ~10x off
        roofline on TPU (measured at 512³: 13.8 ms of the 24.8 ms finest
        V-cycle — NOTES_PERF round 5); as (hp, hc)/(wp, wc) banded
        constants contracted on the MXU the same transfers are O(extent)
        flops/node, cheap below the MXU:HBM balance point, and the crop
        (zero rows) and pad (zero columns) copies fold into the operator."""
        d, hp, wp = self.kernels.padded_shape
        return max(hp, wp) <= _MATMUL_TRANSFER_MAX_EXTENT

    def restrict_yx(self, rr: jnp.ndarray) -> jnp.ndarray:
        """(dc, hp, wp) z-restricted residual -> (dc, hc, wc) child field:
        full-weighting along y and x, crop folded in. Precision.HIGH keeps
        the R = Pᵀ/2 adjoint pair f32-faithful (bf16x3 passes) so the
        V-cycle stays symmetric for PCG."""
        d, hp, wp = self.kernels.padded_shape
        Ry = jnp.asarray(_restrict_mat_np(self.h, hp))
        Rx = jnp.asarray(_restrict_mat_np(self.w, wp))
        t = jnp.einsum("zyx,xc->zyc", rr, Rx, precision=jax.lax.Precision.HIGH)
        return jnp.einsum("zyc,yd->zdc", t, Ry, precision=jax.lax.Precision.HIGH)

    def prolong_yx(self, ec: jnp.ndarray) -> jnp.ndarray:
        """(dc, hc, wc) child correction -> (dc, hp, wp) fine padded layout:
        linear interpolation along y and x (P = 2 Rᵀ), pad folded in."""
        d, hp, wp = self.kernels.padded_shape
        Py = jnp.asarray(_prolong_mat_np(self.h, hp))
        Px = jnp.asarray(_prolong_mat_np(self.w, wp))
        t = jnp.einsum("zyx,yY->zYx", ec, Py, precision=jax.lax.Precision.HIGH)
        return jnp.einsum("zYx,xX->zYX", t, Px, precision=jax.lax.Precision.HIGH)


@dataclass(frozen=True, eq=False)
class MultigridPreconditioner:
    """Hashable callable ``z = M r`` ≈ ``A⁻¹ r``: one V(nu_pre, nu_post)
    cycle of rediscretized geometric multigrid. Plug into
    ``CGOptions.preconditioner`` (or ``DirichletSolver(preconditioner='mg')``).
    Symmetric by construction (see module docstring), hence PCG-safe.

    On TPU, fine levels of V(1,1) cycles run fused Pallas down/up kernels
    (kernels/mg_fused.py) — same arithmetic, ~2.5x less HBM traffic per leg
    (``fuse`` parameter: None = auto on TPU for 2D gamma/rect)."""

    levels: Tuple[_Level, ...]
    coarse_solve: Callable
    nu_pre: int = 1
    nu_post: int = 1
    domains: Tuple = ()  # per-level Domain2D/3D (FMG rediscretization)
    # FMG payload (see with_fmg): per level (rhs_l | None, boundary_field_l).
    # The finest rhs is the caller's b; coarse rhs are REdiscretized (not
    # restricted — restriction smears the O(1/h²) Dirichlet-elimination rows),
    # and prolongation adds the level's Dirichlet values first so boundary-
    # adjacent fine nodes interpolate g, not 0.
    fmg_data: Optional[Tuple] = None

    @staticmethod
    def from_domain(
        domain,
        *,
        omega: float = 0.8,
        nu_pre: int = 1,
        nu_post: int = 1,
        dense_coarse_limit: int = 2048,
        coarse_chebyshev_degree: int = 48,
        dtype=None,
        fuse: Optional[bool] = None,
        fuse_min_extent: int = 512,
        interpret: Optional[bool] = None,
        # 3D z-chunking of the fused legs: None = auto (8 on levels with
        # D >= 32, per-plane below), 1 = per-plane, even >1 = that chunk
        fuse_block_z: Optional[int] = None,
    ) -> "MultigridPreconditioner":
        if nu_pre != nu_post:
            raise ValueError(
                "nu_pre must equal nu_post: an asymmetric V-cycle is not a "
                "symmetric operator and silently breaks PCG"
            )
        domains = [domain]
        while True:
            c = _coarsen_domain(domains[-1])
            if c is None:
                break
            domains.append(c)
            if c.num_unknowns <= dense_coarse_limit:
                break

        def make_level(d):
            if isinstance(d, Domain3D):
                coeffs = (d.coeff_diag, d.coeff_z, d.coeff_y, d.coeff_x)
            else:
                coeffs = (d.coeff_diag, d.coeff_y, d.coeff_x)
            spec = d.mask_spec
            return _Level(
                interior_arr=(
                    None if spec is not None else jnp.asarray(np.asarray(d.interior))
                ),
                coeffs=coeffs,
                omega_over_diag=omega / d.coeff_diag,
                mask_spec=spec,
            )

        if fuse is None:
            fuse = jax.default_backend() != "cpu"
        if interpret is None:
            interpret = jax.default_backend() == "cpu"

        def can_fuse(idx: int) -> bool:
            d = domains[idx]
            if not (
                fuse
                and nu_pre == 1  # the fused legs implement exactly V(1,1)
                and idx < len(domains) - 1  # the coarsest level has no child
            ):
                return False
            if isinstance(d, Domain3D):
                # 3D z-leg kernels: worth it once a volume sweep dominates
                return d.ny + 1 >= fuse_min_extent // 4
            # custom masks fuse too (int8 mask-operand kernels)
            return d.ny + 1 >= fuse_min_extent

        def make_fused(idx: int) -> "_FusedLevel":
            from iterative_solvers_tpu.kernels.mg_fused import FusedLevelKernels

            d, c = domains[idx], domains[idx + 1]
            h, w = d.grid_shape
            custom = d.shape == "custom"
            by_floor = 32 if custom else 16  # int8 mask stream: (32,128) tiles
            by = 64 if h >= 1024 else (32 if h >= 256 else by_floor)
            wp = -(-w // 128) * 128
            # the fused kernels hold ~8 (by, wp) f32 buffers live in VMEM
            # (pipeline double-buffers + register temporaries)
            while by > by_floor and 32 * by * wp > 24 * 2**20:
                by //= 2
            hp = -(-h // by) * by
            mask8 = None
            if custom:
                m8 = np.zeros((hp, wp), np.int8)
                m8[:h, :w] = np.asarray(d.interior, np.int8)
                mask8 = jnp.asarray(m8)
            k = FusedLevelKernels(
                nx=d.nx,
                ny=d.ny,
                coeffs=(d.coeff_diag, d.coeff_x, d.coeff_y),
                cs=omega / d.coeff_diag,
                mask_mode=d.shape,
                padded_shape=(hp, wp),
                block_rows=by,
                interpret=interpret,
                mask8=mask8,
            )
            cspec = c.mask_spec
            return _FusedLevel(
                kernels=k,
                h=h,
                w=w,
                ch=c.grid_shape[0],
                cw=c.grid_shape[1],
                nx=d.nx,
                child_interior_arr=(
                    None if cspec is not None else jnp.asarray(np.asarray(c.interior))
                ),
                jnp_level=make_level(d),
                child_mask_spec=cspec,
            )

        def make_fused_3d(idx: int) -> "_FusedLevel3D":
            from iterative_solvers_tpu.kernels.mg_fused3d import FusedLevelKernels3D

            d, c = domains[idx], domains[idx + 1]
            dz, h, w = d.grid_shape
            wp = -(-w // 128) * 128
            hp = -(-h // 8) * 8
            # largest multiple-of-8 panel height dividing hp, VMEM-capped
            by = 8
            for cand in range(8, min(hp, 129) + 1, 8):
                if hp % cand == 0 and 24 * cand * wp * 4 <= 24 * 2**20:
                    by = cand
            if fuse_block_z is None:
                # z-chunked legs by default on deep levels: each plane read
                # once per leg instead of ~3x (read amplification 1 + 2/bz).
                # Measured at 512³ on v5e: V-cycle 47.7->45.7 ms for bz 4->8,
                # full ff solve 359.3 (per-plane) -> 311.5 ms (bz=8), same
                # trajectory (NOTES_PERF round 5). Shallow levels keep the
                # per-plane kernels (chunk masking overhead, nothing to save).
                bzk = 8 if dz >= 32 else 1
            elif fuse_block_z > 1:
                if fuse_block_z % 2:
                    raise ValueError("fuse_block_z must be even (z-restrict pairs)")
                bzk = fuse_block_z
            else:
                bzk = 1
            k = FusedLevelKernels3D(
                nx=d.nx,
                ny=d.ny,
                nz=d.nz,
                coeffs=(d.coeff_diag, d.coeff_x, d.coeff_y, d.coeff_z),
                cs=omega / d.coeff_diag,
                padded_shape=(dz, hp, wp),
                block_rows=by,
                interpret=interpret,
                block_z=bzk,
            )
            return _FusedLevel3D(
                kernels=k,
                h=h,
                w=w,
                child_interior_arr=None,  # 3D is always a box — spec below
                jnp_level=make_level(d),
                child_mask_spec=c.mask_spec,
            )

        def build_level(i, d):
            if not can_fuse(i):
                return make_level(d)
            return make_fused_3d(i) if isinstance(d, Domain3D) else make_fused(i)

        levels = tuple(build_level(i, d) for i, d in enumerate(domains))
        coarsest = domains[-1]
        if coarsest.num_unknowns <= dense_coarse_limit:
            idx, A = _assemble_dense(coarsest)
            a_inv = np.linalg.inv(A)
            coarse = _CoarseSolveDense(
                idx=np.asarray(idx, np.int32),
                a_inv=np.asarray(
                    a_inv, np.dtype(dtype) if dtype else jnp.zeros(0).dtype
                ),
            )
        else:
            from iterative_solvers_tpu.solvers.precond import spectral_bounds

            lo, hi = spectral_bounds(coarsest)
            coarse = _CoarseSolveChebyshev(
                level=levels[-1],
                lam_lo=lo,
                lam_hi=hi,
                degree=coarse_chebyshev_degree,
            )
        return MultigridPreconditioner(
            levels=levels, coarse_solve=coarse, nu_pre=nu_pre, nu_post=nu_post,
            domains=tuple(domains),
        )

    # --- V-cycle (Python recursion unrolls at trace time) -----------------

    def _vcycle(self, li: int, b: jnp.ndarray) -> jnp.ndarray:
        if li == len(self.levels) - 1:
            return self.coarse_solve(b)
        lev = self.levels[li]
        if isinstance(lev, _FusedLevel3D):
            if b.dtype == jnp.float32:
                dz, hp, wp = lev.kernels.padded_shape
                padded_in = b.shape == (dz, hp, wp)
                bp = b if padded_in else lev.pad_in(b)
                rr = lev.kernels.down(bp)  # z-restricted residual (Dc, hp, wp)
                if lev._matmul_transfers:
                    rc = lev.restrict_yx(rr)  # y, x on the MXU, crop folded
                else:
                    rc = rr[:, : lev.h, : lev.w]
                    rc = _restrict1d(_restrict1d(rc, 1), 2)  # y, x in XLA
                rc = jnp.where(lev.child_interior, rc, 0.0)
                ec = self._vcycle(li + 1, rc)
                if lev._matmul_transfers:
                    ecl = lev.prolong_yx(ec)  # y, x on the MXU, pad folded
                else:
                    ecl = _prolong1d(_prolong1d(ec, 1), 2)  # y, x back up
                    ecl = jnp.pad(
                        ecl, ((0, 0), (0, hp - lev.h), (0, wp - lev.w))
                    )
                out = lev.kernels.up(bp, ecl)
                return out if padded_in else out[:, : lev.h, : lev.w]
            lev = lev.jnp_level
        elif isinstance(lev, _FusedLevel):
            if b.dtype == jnp.float32:
                from iterative_solvers_tpu.kernels.mg_fused import (
                    lane_prolong_mm,
                    lane_restrict_mm,
                )

                hp, wp = lev.kernels.padded_shape
                # Layout pass-through: a field already in this level's padded
                # layout (e.g. from the padded Pallas CG engine) skips the
                # full-field pad and crop copies — two HBM sweeps per level
                # entry that pure layout shuffling does not deserve.
                padded_in = b.shape == (hp, wp)
                bp = b if padded_in else lev.pad_in(b)
                rr = lev.kernels.down(bp)
                rc = lane_restrict_mm(rr[: lev.ch], lev.nx, lev.cw)
                rc = jnp.where(lev.child_interior, rc, 0.0)
                ec = self._vcycle(li + 1, rc)
                ecl = lane_prolong_mm(ec, lev.nx // 2, wp)
                ecl = jnp.pad(ecl, ((0, hp // 2 - lev.ch), (0, 0)))
                out = lev.kernels.up(bp, ecl)
                return out if padded_in else out[: lev.h, : lev.w]
            # non-f32 field (e.g. the escalated f64 inner solve of
            # solvers/refine.py): the Pallas kernels are f32-only — take the
            # jnp leg of this level instead
            lev = lev.jnp_level
        # Pre-smooth from x=0: the first weighted-Jacobi sweep collapses to a
        # pure scaling of b.
        x = lev.omega_over_diag * b
        for _ in range(self.nu_pre - 1):
            x = x + lev.omega_over_diag * (b - lev.apply(x))
        r = b - lev.apply(x)
        rc = self.levels[li + 1].mask(restrict_full_weighting(r))
        ec = self._vcycle(li + 1, rc)
        x = x + lev.mask(prolong_linear(ec))
        for _ in range(self.nu_post):
            x = x + lev.omega_over_diag * (b - lev.apply(x))
        return x

    def _apply_at(self, li: int, x: jnp.ndarray) -> jnp.ndarray:
        """Level-li stencil apply (jnp; the fused legs fuse apply into their
        down/up sweeps and expose no standalone apply)."""
        lev = self.levels[li]
        if isinstance(lev, (_FusedLevel, _FusedLevel3D)):
            lev = lev.jnp_level
        return lev.apply(x)

    def with_fmg(self, problem, dtype=jnp.float32) -> "MultigridPreconditioner":
        """A copy carrying the FMG payload for ``problem``: per-level
        REdiscretized RHS (each level's own BC elimination — restricting the
        fine RHS instead smears its O(1/h²) boundary-adjacent rows and costs
        FMG two orders of accuracy, measured at 64²) and per-level Dirichlet
        boundary fields (so prolongation interpolates g at the boundary, not
        the masked 0).

        The payload entries are LAZY recipes (the rediscretized problem's
        traced assembly, ``rhs_field_traced``/``boundary_field_traced``),
        evaluated inside the FMG programs: concrete arrays would be embedded
        as multi-MB HLO constants (the program-build bottleneck, see
        MaskSpec) and cost a host transcendental sweep per level here."""
        import dataclasses as dc
        import functools as ft

        if not self.domains:
            raise ValueError("preconditioner built without level domains")
        data = []
        for li, d in enumerate(self.domains):
            p = dc.replace(problem, domain=d)
            # finest level: b comes from the caller and its boundary field is
            # never interpolated FROM (only coarse levels are prolongated)
            rhs = None if li == 0 else ft.partial(p.rhs_field_traced, dtype)
            g = None if li == 0 else ft.partial(p.boundary_field_traced, dtype)
            data.append((rhs, g))
        return dc.replace(self, fmg_data=tuple(data))

    def fmg(self, b: jnp.ndarray, n_vcycles: int = 1) -> jnp.ndarray:
        """Full-multigrid (nested-iteration) solve: an O(N) direct pass
        landing the algebraic error at the discretization-error level —
        the optimal route to the reference's EXACT_ERROR criterion class
        (solver/msg_solver.cpp:157-162).

        Solves the coarsest level's rediscretized problem exactly, then walks
        up: BC-aware prolongation of the level solution + ``n_vcycles``
        V-cycle(s) of polish per level. Cost ≈ (4/3)·n_vcycles V-cycle
        equivalents + one stencil apply per level. Requires the payload from
        :meth:`with_fmg`; without it, falls back to a purely algebraic
        variant (restricted RHS, zero-BC prolongation) that is only good for
        ~1 decade of residual as a warm start.

        NOT a preconditioner — FMG is linear but not symmetric (the one-sided
        per-level polish has no adjoint leg), so it never goes inside PCG;
        the symmetric V-cycle remains the PCG operator.
        """
        if self.fmg_data is None:
            bs = [b]
            for li in range(len(self.levels) - 1):
                bs.append(
                    self.levels[li + 1].mask(restrict_full_weighting(bs[-1]))
                )
            gs = [None] * len(self.levels)
        else:
            bs = [b] + [
                jnp.asarray(rhs(), b.dtype) for rhs, _ in self.fmg_data[1:]
            ]
            gs = [
                None if g is None else jnp.asarray(g(), b.dtype)
                for _, g in self.fmg_data
            ]
        x = self.coarse_solve(bs[-1])
        for li in range(len(self.levels) - 2, -1, -1):
            if gs[li + 1] is not None:
                x = x + gs[li + 1]  # carry Dirichlet values into interpolation
            x = self.levels[li].mask(prolong_linear(x))
            for _ in range(n_vcycles):
                r = bs[li] - self._apply_at(li, x)
                x = x + self._vcycle(li, r)
        return x

    def fmg_stepwise(
        self,
        b: jnp.ndarray,
        n_vcycles: int = 1,
        polish_max_extent: Optional[int] = None,
        smooth_sweeps: int = 4,
        combine: bool = False,
    ) -> jnp.ndarray:
        """:meth:`fmg` as one compiled program PER LEVEL (async dispatches),
        or — with ``combine=True`` — the whole ladder as ONE program.

        The monolithic FMG program inlines a full V-cycle at every level —
        O(levels²) level instances in one XLA program whose build time
        dominated the official bench (it timed round 3 out). Per-level
        programs cap each build at one V-cycle's size; JAX dispatches are
        async, so the L extra dispatches add no host round-trips.

        ``polish_max_extent`` bounds the build cost further: levels whose
        grid extent exceeds it replace the V-cycle polish with
        ``smooth_sweeps`` weighted-Jacobi sweeps — compile-trivial programs
        that still kill the high-frequency interpolation error prolongation
        introduces (the low-frequency error is already at coarse-solve
        quality). Measured at 1024²: full polish lands rel 7.3e-6,
        cutoff-513 + 2 sweeps 9.7e-6, no-V-cycles + 4 sweeps 1.2e-5 —
        versus 1.4e-4 for cutoff-513 with NO smoothing. Default None keeps
        :meth:`fmg` numerics exactly (V-cycle polish everywhere).

        ``combine=True`` fuses the per-level rungs into a single compiled
        chain — identical arithmetic, one dispatch instead of L+1. With the
        polish cutoff active the fine rungs are compile-trivial sweep
        programs and the V-cycle instances below the cutoff are the same
        small kernels the per-level path compiles anyway, so the round-3
        O(levels²) build-time hazard does not apply; per-rung dispatch
        overhead (~2 ms each over a tunneled TPU, NOTES_PERF round 5) does.
        Single-device path only — the mesh adapters keep per-level GSPMD
        programs.

        Requires the :meth:`with_fmg` payload.
        """
        if self.fmg_data is None:
            raise ValueError("fmg_stepwise requires the with_fmg payload")
        if combine:
            return _fmg_chain(
                self,
                int(n_vcycles),
                int(smooth_sweeps),
                None if polish_max_extent is None else int(polish_max_extent),
                b,
            )
        x = _fmg_rung_coarsest(self, b)
        for li in range(len(self.levels) - 2, -1, -1):
            nv = int(n_vcycles)
            if (
                polish_max_extent is not None
                and max(self.domains[li].grid_shape) > polish_max_extent
            ):
                nv = 0
            x = _fmg_rung(self, li, nv, int(smooth_sweeps), x, b)
        return x

    def accepts_padded(self, shape) -> bool:
        """True when fields of ``shape`` are this preconditioner's fine
        padded layout (the fused kernels' own) — such fields pass through
        the V-cycle with no pad/crop copies and a padded result."""
        lev0 = self.levels[0]
        return isinstance(lev0, (_FusedLevel, _FusedLevel3D)) and tuple(
            shape
        ) == tuple(lev0.kernels.padded_shape)

    def __call__(self, r: jnp.ndarray) -> jnp.ndarray:
        lev0 = self.levels[0]
        if isinstance(lev0, _FusedLevel):
            shape0 = (lev0.h, lev0.w)
        elif isinstance(lev0, _FusedLevel3D):
            shape0 = (lev0.kernels.padded_shape[0], lev0.h, lev0.w)
        else:
            shape0 = lev0.grid_shape
        if r.shape != shape0 and not (
            r.dtype == jnp.float32 and self.accepts_padded(r.shape)
        ):
            raise ValueError(f"field shape {r.shape} != fine-level grid {shape0}")
        return self._vcycle(0, r)

    def call_with_dot(self, r: jnp.ndarray):
        """(z, (r, z)) — with a fused 2D padded-pass-through fine level, the
        dot rides the finest K_up as a per-panel epilogue reduction (one
        full-field sweep saved per PCG iteration); generic fallback computes
        it separately."""
        lev = self.levels[0]
        if (
            isinstance(lev, _FusedLevel)
            and r.dtype == jnp.float32
            and tuple(r.shape) == tuple(lev.kernels.padded_shape)
        ):
            from iterative_solvers_tpu.kernels.mg_fused import (
                lane_prolong_mm,
                lane_restrict_mm,
            )

            hp, wp = lev.kernels.padded_shape
            rr = lev.kernels.down(r)
            rc = lane_restrict_mm(rr[: lev.ch], lev.nx, lev.cw)
            rc = jnp.where(lev.child_interior, rc, 0.0)
            ec = self._vcycle(1, rc)
            ecl = lane_prolong_mm(ec, lev.nx // 2, wp)
            ecl = jnp.pad(ecl, ((0, hp // 2 - lev.ch), (0, 0)))
            return lev.kernels.up(r, ecl, with_dot=True)
        z = self(r)
        return z, jnp.sum(r * z)

    @property
    def num_levels(self) -> int:
        return len(self.levels)


def _fmg_rung_coarsest_body(M: MultigridPreconditioner, b) -> jnp.ndarray:
    """Coarsest FMG rung: exact solve of the REdiscretized coarsest problem.
    The RHS is a ``with_fmg`` closure constant — except when the hierarchy
    has a single level, where the coarsest IS the finest and the caller's
    ``b`` is the RHS (the payload stores None for the finest level)."""
    rhs = M.fmg_data[-1][0]
    bc = b.astype(jnp.float32) if rhs is None else jnp.asarray(rhs(), jnp.float32)
    return M.coarse_solve(bc)


_fmg_rung_coarsest = functools.partial(jax.jit, static_argnums=(0,))(
    _fmg_rung_coarsest_body
)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _fmg_chain(
    M: MultigridPreconditioner,
    n_vcycles: int,
    n_smooth: int,
    polish_max_extent: Optional[int],
    b,
) -> jnp.ndarray:
    """The entire stepwise-FMG ladder as ONE compiled program (same
    arithmetic as the per-level rung dispatches — see
    :meth:`MultigridPreconditioner.fmg_stepwise` ``combine=True``)."""
    x = _fmg_rung_coarsest_body(M, b)
    for li in range(len(M.levels) - 2, -1, -1):
        nv = int(n_vcycles)
        if (
            polish_max_extent is not None
            and max(M.domains[li].grid_shape) > polish_max_extent
        ):
            nv = 0
        x = _fmg_rung_body(M, li, nv, int(n_smooth), x, b)
    return x


def _fmg_rung_body(
    M: MultigridPreconditioner,
    li: int,
    n_vcycles: int,
    n_smooth: int,
    x: jnp.ndarray,
    b,
) -> jnp.ndarray:
    """One FMG rung: BC-aware prolongation of the level-``li+1`` solution to
    level ``li`` plus polish — ``n_vcycles`` V-cycles (the same op sequence
    as the matching slice of :meth:`MultigridPreconditioner.fmg`), or, when
    ``n_vcycles == 0``, ``n_smooth`` weighted-Jacobi sweeps (the
    compile-cheap fine-level polish of ``fmg_stepwise``). ``b`` (the
    caller's finest RHS) is only read at ``li == 0``; coarse RHS are lazy
    with_fmg recipes evaluated in-trace."""
    g = M.fmg_data[li + 1][1]
    if g is not None:
        x = x + jnp.asarray(g(), x.dtype)
    bl = (
        b.astype(jnp.float32)
        if li == 0
        else jnp.asarray(M.fmg_data[li][0](), jnp.float32)
    )
    lev0 = M.levels[li]
    if (
        n_vcycles == 0
        and n_smooth >= 1
        and isinstance(lev0, _FusedLevel)
        and x.dtype == jnp.float32
        and lev0.kernels.mask8 is None
    ):
        # Padded-flow sweep polish: lane-prolong as the tile-banded MXU
        # contraction straight into the level's padded width (the strided
        # x-prolong measured 4.0 ms at 8192² vs ~0.7 on the MXU), rows via
        # the stack+reshape interleave (lowers fine). The explicit mask and
        # the pad_in(x) copy both drop: the Jacobi kernel masks its reads
        # (boundary-interpolated values are discarded exactly as
        # mask(prolong_linear(...)) would) and writes masked output.
        from iterative_solvers_tpu.kernels.mg_fused import lane_prolong_mm

        hp, wp = lev0.kernels.padded_shape
        xf = _prolong1d(x, 0)
        xp = lane_prolong_mm(xf, (lev0.w - 1) // 2, wp)
        xp = jnp.pad(xp, ((0, hp - xp.shape[0]), (0, 0)))
        bp = lev0.pad_in(bl)
        for _ in range(n_smooth):
            xp = lev0.kernels.jacobi(xp, bp)
        return xp[: lev0.h, : lev0.w]
    x = M.levels[li].mask(prolong_linear(x))
    if n_vcycles > 0:
        for _ in range(n_vcycles):
            r = bl - M._apply_at(li, x)
            x = x + M._vcycle(li, r)
    else:
        lev = M.levels[li]
        use_pallas = (
            x.dtype == jnp.float32
            and (
                (isinstance(lev, _FusedLevel) and lev.kernels.mask8 is None)
                or isinstance(lev, _FusedLevel3D)
            )
        )
        if use_pallas:
            # fused sweep kernel: 1 HBM pass per sweep vs the jnp apply +
            # axpy passes (~2x the polish cost at the finest levels, which
            # is where this branch runs — NOTES_PERF round 5). The pad/crop
            # pair costs ~1 apply-equivalent total, amortized over n_smooth.
            xp = lev.pad_in(x)
            bp = lev.pad_in(bl)
            for _ in range(n_smooth):
                xp = lev.kernels.jacobi(xp, bp)
            x = xp[..., : lev.h, : lev.w]
        else:
            jl = getattr(lev, "jnp_level", lev)
            for _ in range(n_smooth):
                x = x + jl.omega_over_diag * (bl - M._apply_at(li, x))
    return x


_fmg_rung = functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))(_fmg_rung_body)


@dataclass(frozen=True, eq=False)
class ShardedMultigridPreconditioner:
    """Multigrid V-cycle over mesh-sharded fields (parallel/mesh.py layout).

    Sharded fields are padded at the high end to mesh-divisible shapes; the
    V-cycle's transfer arithmetic needs the exact ``2^k·n + 1`` node extents,
    so this adapter crops to the logical grid, runs the cycle, and zero-pads
    back — all inside the jit trace, on global sharded arrays. XLA/GSPMD
    propagates the block sharding through the strided slices and inserts the
    (coarse-level, tiny) collectives automatically; the reference has no
    distributed anything to compare against (SURVEY §2.4).
    """

    inner: MultigridPreconditioner
    grid_shape: Tuple[int, ...]

    @staticmethod
    def from_domain(domain, mesh=None, **kwargs) -> "ShardedMultigridPreconditioner":
        # fused Pallas levels are single-device kernels; under GSPMD global
        # arrays they would force a gather — the jnp V-cycle path shards
        # transparently instead
        kwargs.setdefault("fuse", False)
        return ShardedMultigridPreconditioner(
            inner=MultigridPreconditioner.from_domain(domain, **kwargs),
            grid_shape=domain.grid_shape,
        )

    def __call__(self, r: jnp.ndarray) -> jnp.ndarray:
        sl = tuple(slice(0, s) for s in self.grid_shape)
        z = self.inner(r[sl])
        pads = [(0, p - g) for p, g in zip(r.shape, self.grid_shape)]
        return jnp.pad(z, pads)

    def fmg(self, r: jnp.ndarray, n_vcycles: int = 1) -> jnp.ndarray:
        """FMG initial guess on the mesh-padded layout (crop → fmg → pad;
        GSPMD shards the transfer chains like the V-cycle itself)."""
        sl = tuple(slice(0, s) for s in self.grid_shape)
        x = self.inner.fmg(r[sl], n_vcycles)
        pads = [(0, p - g) for p, g in zip(r.shape, self.grid_shape)]
        return jnp.pad(x, pads)

    def fmg_stepwise(self, r: jnp.ndarray, n_vcycles: int = 1, **kw) -> jnp.ndarray:
        """Per-level-program FMG on the mesh-padded layout — the rung
        programs run GSPMD on the global sharded arrays (iota masks and
        traced payload recipes shard like any other op). ``combine`` is
        dropped: the mesh path keeps per-level programs (a single GSPMD
        chain was never build-time-validated over a mesh)."""
        kw.pop("combine", None)
        sl = tuple(slice(0, s) for s in self.grid_shape)
        x = self.inner.fmg_stepwise(r[sl], n_vcycles, **kw)
        pads = [(0, p - g) for p, g in zip(r.shape, self.grid_shape)]
        return jnp.pad(x, pads)


@dataclass(frozen=True, eq=False)
class PaddedPreconditioner:
    """Adapter running an unpadded-field preconditioner under a padded-layout
    operator (kernels/stencil_pallas.py pads grids to tile multiples)."""

    inner: Callable
    padded_op: object  # needs .crop(x) and .pad(x)

    def __call__(self, r: jnp.ndarray) -> jnp.ndarray:
        # When the operator's padded layout IS the V-cycle's own (default
        # block sizes make them agree), skip the four full-field copies.
        accepts = getattr(self.inner, "accepts_padded", None)
        if accepts is not None and r.dtype == jnp.float32 and accepts(r.shape):
            return self.inner(r)
        return self.padded_op.pad(self.inner(self.padded_op.crop(r)))

    def fmg(self, r: jnp.ndarray, n_vcycles: int = 1) -> jnp.ndarray:
        """FMG initial guess on the operator's padded layout."""
        return self.padded_op.pad(
            self.inner.fmg(self.padded_op.crop(r), n_vcycles)
        )

    def fmg_stepwise(self, r: jnp.ndarray, n_vcycles: int = 1, **kw) -> jnp.ndarray:
        """Per-level-program FMG on the padded layout (crop and pad run as
        eager slice/pad dispatches around the inner rung programs)."""
        x = self.inner.fmg_stepwise(self.padded_op.crop(r), n_vcycles, **kw)
        return self.padded_op.pad(x)

    def call_with_dot(self, r: jnp.ndarray):
        """(z, (r, z)); forwards to the inner V-cycle's fused-dot path when
        the padded layouts agree."""
        fn = getattr(self.inner, "call_with_dot", None)
        accepts = getattr(self.inner, "accepts_padded", None)
        if (
            fn is not None
            and accepts is not None
            and r.dtype == jnp.float32
            and accepts(r.shape)
        ):
            return fn(r)
        z = self(r)
        return z, jnp.sum(r * z)
