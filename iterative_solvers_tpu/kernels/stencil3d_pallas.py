"""Pallas TPU kernel for the masked 7-point stencil (3D box domains).

The jnp formulation (ops/stencil.py stencil_apply_3d) pads and slices the
whole volume seven times; at 512³ XLA schedules that at ~25x off the
bandwidth roofline (measured 39 ms/apply on v5e, NOTES_PERF.md), mostly
because the 513-extent minor dims mis-tile the (8, 128) register grid.

This kernel streams (1, by, wp) y-panels of each z-plane through VMEM:

- x±1 neighbors are in-register lane rolls (wraparound lanes are masked-zero,
  as in the 2D kernel — a wrapped value always comes from a non-interior
  global edge column);
- y±1 neighbors come from one 8-row halo group above/below the panel;
- z±1 neighbors are the same panel of the neighboring planes, fetched as two
  extra block inputs whose z index map clamps at the volume edge (the clamped
  plane is re-masked with the *virtual* plane's all-false mask);
- the interior mask is algebraic (box: 0<z<nz ∧ 0<y<ny ∧ 0<x<nx), costing
  zero HBM traffic.

Net HBM traffic ≈ 3 reads + 1 write per node (the z-neighbor planes are
re-read once each); ~16 B/node ≈ 3 ms at 512³ on v5e — ~13x over the jnp
path. H is padded to a multiple of the panel height, W to a lane multiple;
padded nodes are never interior so zero padding is semantically inert.

Reference parity: this is the 7-point analogue of the reference's (dormant)
matrix-free apply (solver/matrix_free_system.cpp:203-340); the reference has
no 3D support at all (extension per BASELINE.md's 512³ config).
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


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel_3d(nx: int, ny: int, nz: int, cd: float, cx: float, cy: float,
                    cz: float, by: int, wp: int):
    def mask_at(zi, row0, shape):
        ri = lax.broadcasted_iota(jnp.int32, shape, 0) + row0
        ci = lax.broadcasted_iota(jnp.int32, shape, 1)
        ok_z = (zi > 0) & (zi < nz)
        return ok_z & (ri > 0) & (ri < ny) & (ci > 0) & (ci < nx)

    def kernel(x_ref, zup_ref, zdn_ref, yup_ref, ydn_ref, o_ref):
        z = pl.program_id(0)
        j = pl.program_id(1)
        row0 = j * by
        m = mask_at(z, row0, (by, wp))
        x = jnp.where(m, x_ref[0], 0.0)
        # z neighbors: same panel of plane z-1 / z+1 (clamped + re-masked)
        zup = jnp.where(mask_at(z - 1, row0, (by, wp)), zup_ref[0], 0.0)
        zdn = jnp.where(mask_at(z + 1, row0, (by, wp)), zdn_ref[0], 0.0)
        # y neighbors: one halo row above/below from 8-row edge groups
        yup_row = jnp.where(mask_at(z, row0 - 1, (1, wp)), yup_ref[0, -1:, :], 0.0)
        ydn_row = jnp.where(mask_at(z, row0 + by, (1, wp)), ydn_ref[0, :1, :], 0.0)
        yup = jnp.concatenate([yup_row, x[:-1, :]], axis=0)
        ydn = jnp.concatenate([x[1:, :], ydn_row], axis=0)
        # x neighbors: in-register lane rolls (np.int32: under jax_enable_x64
        # a Python int would trace as i64, which tpu.dynamic_rotate rejects)
        lf = pltpu.roll(x, np.int32(1), 1)
        rt = pltpu.roll(x, np.int32(wp - 1), 1)
        y = cd * x + cx * (lf + rt) + cy * (yup + ydn) + cz * (zup + zdn)
        o_ref[0] = jnp.where(m, y, 0.0)

    return kernel


@partial(
    jax.jit,
    static_argnames=("nx", "ny", "nz", "cd", "cx", "cy", "cz", "block_rows", "interpret"),
)
def pallas_stencil_apply_3d(
    x: jnp.ndarray,
    *,
    nx: int,
    ny: int,
    nz: int,
    cd: float,
    cx: float,
    cy: float,
    cz: float,
    block_rows: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = A @ x on a padded volume of shape (D, Hp, Wp), D = nz+1,
    Hp % block_rows == 0, Wp % 128 == 0."""
    d, hp, wp = x.shape
    by = block_rows
    assert hp % by == 0 and wp % 128 == 0, (d, hp, wp, by)
    grid = (d, hp // by)
    kernel = _make_kernel_3d(nx, ny, nz, cd, cx, cy, cz, by, wp)
    gy = hp // 8  # 8-row group count per plane
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, by, wp), lambda z, j: (z, j, 0)),
            pl.BlockSpec((1, by, wp), lambda z, j: (jnp.maximum(z - 1, 0), j, 0)),
            pl.BlockSpec((1, by, wp), lambda z, j: (jnp.minimum(z + 1, d - 1), j, 0)),
            # 8-row groups just above / below the panel (in 8-row units)
            pl.BlockSpec(
                (1, 8, wp),
                lambda z, j: (z, jnp.maximum(j * (by // 8) - 1, 0), 0),
            ),
            pl.BlockSpec(
                (1, 8, wp),
                lambda z, j: (z, jnp.minimum(j * (by // 8) + by // 8, gy - 1), 0),
            ),
        ],
        out_specs=pl.BlockSpec((1, by, wp), lambda z, j: (z, j, 0)),
        out_shape=jax.ShapeDtypeStruct((d, hp, wp), x.dtype),
        interpret=interpret,
    )(x, x, x, x, x)


def _make_kernel_3d_chunked(nx: int, ny: int, nz: int, cd: float, cx: float,
                            cy: float, cz: float, bz: int, by: int, wp: int):
    """z-chunked kernel body: each program owns ``bz`` consecutive z-planes
    and reads each interior plane ONCE (the per-plane kernel reads every
    plane three times as its own z-up/z-dn neighbor). HBM traffic drops from
    ~3 reads + 1 write to ~(1 + 2/bz) reads + 1 write per node."""

    def mask_at(zi, row0, shape):
        ri = lax.broadcasted_iota(jnp.int32, shape, 0) + row0
        ci = lax.broadcasted_iota(jnp.int32, shape, 1)
        ok_z = (zi > 0) & (zi < nz)
        return ok_z & (ri > 0) & (ri < ny) & (ci > 0) & (ci < nx)

    def kernel(xc_ref, zup_ref, zdn_ref, yup_ref, ydn_ref, o_ref):
        k = pl.program_id(0)
        j = pl.program_id(1)
        z0 = k * bz
        row0 = j * by

        def masked_plane(i):
            # plane z0+i of the chunk, with the chunk-edge z halos
            if i < 0:
                raw = zup_ref[0]
            elif i >= bz:
                raw = zdn_ref[0]
            else:
                raw = xc_ref[i]
            return jnp.where(mask_at(z0 + i, row0, (by, wp)), raw, 0.0)

        planes = [masked_plane(i) for i in range(-1, bz + 1)]
        for i in range(bz):
            x = planes[i + 1]
            zup, zdn = planes[i], planes[i + 2]
            yup_row = jnp.where(
                mask_at(z0 + i, row0 - 1, (1, wp)), yup_ref[i, -1:, :], 0.0
            )
            ydn_row = jnp.where(
                mask_at(z0 + i, row0 + by, (1, wp)), ydn_ref[i, :1, :], 0.0
            )
            yup = jnp.concatenate([yup_row, x[:-1, :]], axis=0)
            ydn = jnp.concatenate([x[1:, :], ydn_row], axis=0)
            lf = pltpu.roll(x, np.int32(1), 1)
            rt = pltpu.roll(x, np.int32(wp - 1), 1)
            y = cd * x + cx * (lf + rt) + cy * (yup + ydn) + cz * (zup + zdn)
            o_ref[i] = jnp.where(mask_at(z0 + i, row0, (by, wp)), y, 0.0)

    return kernel


@partial(
    jax.jit,
    static_argnames=(
        "nx", "ny", "nz", "cd", "cx", "cy", "cz", "block_z", "block_rows",
        "interpret",
    ),
)
def pallas_stencil_apply_3d_chunked(
    x: jnp.ndarray,
    *,
    nx: int,
    ny: int,
    nz: int,
    cd: float,
    cx: float,
    cy: float,
    cz: float,
    block_z: int,
    block_rows: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = A @ x on a padded volume (D, Hp, Wp) with D % block_z == 0,
    Hp % block_rows == 0, Wp % 128 == 0. Same result as
    :func:`pallas_stencil_apply_3d`, ~1.8x less HBM traffic."""
    d, hp, wp = x.shape
    bz, by = block_z, block_rows
    assert d % bz == 0 and hp % by == 0 and wp % 128 == 0, (d, hp, wp, bz, by)
    grid = (d // bz, hp // by)
    kernel = _make_kernel_3d_chunked(nx, ny, nz, cd, cx, cy, cz, bz, by, wp)
    gy = hp // 8
    nbz = d // bz
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bz, by, wp), lambda k, j: (k, j, 0)),
            # one plane below / above the chunk (plane-unit block indices)
            pl.BlockSpec(
                (1, by, wp), lambda k, j: (jnp.maximum(k * bz - 1, 0), j, 0)
            ),
            pl.BlockSpec(
                (1, by, wp),
                lambda k, j: (jnp.minimum(k * bz + bz, d - 1), j, 0),
            ),
            # 8-row y-halo groups above / below the panel, for ALL bz planes
            pl.BlockSpec(
                (bz, 8, wp),
                lambda k, j: (k, jnp.maximum(j * (by // 8) - 1, 0), 0),
            ),
            pl.BlockSpec(
                (bz, 8, wp),
                lambda k, j: (k, jnp.minimum(j * (by // 8) + by // 8, gy - 1), 0),
            ),
        ],
        out_specs=pl.BlockSpec((bz, by, wp), lambda k, j: (k, j, 0)),
        out_shape=jax.ShapeDtypeStruct((d, hp, wp), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
        interpret=interpret,
    )(x, x, x, x, x)


def _auto_block_rows_3d(h: int) -> int:
    """Panel height: a multiple of 8 dividing round_up(h, 8) with small
    padding waste, capped so VMEM stays comfortable."""
    hp = _round_up(h, 8)
    # prefer the largest divisor of hp that is a multiple of 8 and <= 128
    best = 8
    for by in range(8, 129, 8):
        if hp % by == 0:
            best = by
    return best


def _auto_block_z(d: int) -> int:
    """z-chunk depth: the largest divisor of D in [2, 16] (read-amplification
    1 + 2/bz, so bz >= 8 is within 25% of the single-read floor). 1 when D
    has no such divisor (prime-ish D falls back to the per-plane kernel)."""
    best = 1
    for bz in range(2, 17):
        if d % bz == 0:
            best = bz
    return best


@dataclass(frozen=True, eq=False)
class Pallas3DStencilOperator:
    """Drop-in 3D box operator on padded volumes (pad/crop helpers included);
    hashable and jit-compatible, plugs straight into ``cg_solve``."""

    nx: int
    ny: int
    nz: int
    coeffs: Tuple[float, float, float, float]  # (cd, cx, cy, cz)
    grid_shape: Tuple[int, int, int]  # unpadded (D, H, W)
    padded_shape: Tuple[int, int, int]
    block_rows: int
    interpret: bool
    block_z: int = 1  # >1: z-chunked kernel (each plane read once per apply)

    @staticmethod
    def from_domain(domain, dtype=None, block_rows: Optional[int] = None,
                    interpret: Optional[bool] = None,
                    block_z: Optional[int] = None) -> "Pallas3DStencilOperator":
        d, h, w = domain.grid_shape
        wp = _round_up(w, 128)
        by = block_rows or _auto_block_rows_3d(h)
        hp = _round_up(h, by)
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        bz = block_z if block_z is not None else _auto_block_z(d)
        return Pallas3DStencilOperator(
            nx=domain.nx,
            ny=domain.ny,
            nz=domain.nz,
            coeffs=(domain.coeff_diag, domain.coeff_x, domain.coeff_y, domain.coeff_z),
            grid_shape=(d, h, w),
            padded_shape=(d, hp, wp),
            block_rows=by,
            interpret=interpret,
            block_z=bz,
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # Mosaic rejects i64 BlockSpec index maps, so f32 fields under a
        # global jax_enable_x64 trace with x64 locally off; f64 fields (CPU
        # interpret mode) keep their dtype.
        if x.dtype == jnp.float32:
            with jax.enable_x64(False):
                return self._apply(x)
        return self._apply(x)

    def _apply(self, x: jnp.ndarray) -> jnp.ndarray:
        cd, cx, cy, cz = self.coeffs
        if self.block_z > 1 and x.shape[0] % self.block_z == 0:
            return pallas_stencil_apply_3d_chunked(
                x,
                nx=self.nx,
                ny=self.ny,
                nz=self.nz,
                cd=cd,
                cx=cx,
                cy=cy,
                cz=cz,
                block_z=self.block_z,
                block_rows=self.block_rows,
                interpret=self.interpret,
            )
        return pallas_stencil_apply_3d(
            x,
            nx=self.nx,
            ny=self.ny,
            nz=self.nz,
            cd=cd,
            cx=cx,
            cy=cy,
            cz=cz,
            block_rows=self.block_rows,
            interpret=self.interpret,
        )

    # --- layout helpers -----------------------------------------------------

    def pad(self, field: jnp.ndarray) -> jnp.ndarray:
        d, h, w = self.grid_shape
        _, hp, wp = self.padded_shape
        return jnp.pad(jnp.asarray(field), ((0, 0), (0, hp - h), (0, wp - w)))

    def crop(self, field: jnp.ndarray) -> jnp.ndarray:
        d, h, w = self.grid_shape
        return field[:, :h, :w]

    @property
    def shape(self):
        return self.padded_shape

    def interior_padded(self) -> np.ndarray:
        zi, ri, ci = np.mgrid[
            0 : self.padded_shape[0], 0 : self.padded_shape[1], 0 : self.padded_shape[2]
        ]
        return (
            (zi > 0) & (zi < self.nz) & (ri > 0) & (ri < self.ny)
            & (ci > 0) & (ci < self.nx)
        )

    def _interior_traced(self) -> jnp.ndarray:
        """Padded interior mask built in-trace (box closed form) — a captured
        513³ bool would embed ~135 MB of HLO constant (core.domain.MaskSpec)."""
        from iterative_solvers_tpu.core.domain import MaskSpec

        return MaskSpec(
            "box", self.nx, self.ny, tuple(self.padded_shape), nz=self.nz
        ).build()

    def mask(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.where(self._interior_traced(), x, 0)

    def diagonal(self) -> jnp.ndarray:
        return jnp.where(self._interior_traced(), self.coeffs[0], 0.0)

    def nnz(self) -> int:
        from iterative_solvers_tpu.ops.stencil import StencilOperator

        return StencilOperator(
            jnp.asarray(self.interior_padded()), self.coeffs, ndim=3
        ).nnz()
