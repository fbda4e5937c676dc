"""Pallas TPU kernel for the masked 5-point stencil — the speed-of-light path.

Why a kernel at all: XLA's fusion of the shifted-adds formulation reaches only
~30% of copy bandwidth on TPU (measured ~200 GB/s vs ~650 GB/s achievable on
v5e) because of how it schedules the ±1-lane shifted reads. This kernel
streams row panels through VMEM and:

- computes the interior mask *algebraically* from broadcasted iotas (the
  Г-geometry is three comparisons — reference predicates
  solver/grid_system.cpp:17-43 reduce to ``0<ix<nx ∧ 0<iy<ny ∧
  ¬(ix≤nx/2 ∧ iy≤ny/2)``), so the mask costs zero HBM traffic;
- realizes x±1 neighbors as in-register lane rolls. Wraparound lanes need no
  fixup: the wrapped value always comes from a global edge column, which is
  never interior, hence already zeroed by the input mask;
- gets y±1 neighbors from one extra halo row above/below the panel, fetched
  as separate 1-row block inputs whose index maps clamp at the grid edge
  (the clamped garbage row is re-masked with the *virtual* row's mask, which
  is all-false off-grid);
- lets Mosaic's grid pipeline double-buffer all inputs/outputs automatically
  — no manual DMA or semaphores needed.

Net HBM traffic: (1 + 2/block_rows)·4 B read + 4 B write per node ≈ 8 B/node,
the same as a plain copy — i.e. the stencil runs at memory speed-of-light.

Fields must be padded to (block_rows, 128) multiples; the operator carries
``pad``/``crop`` helpers and zero padding is semantically inert (padded nodes
are never interior).
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


def _interior_pred(mask_mode: str, nx: int, ny: int):
    """Algebraic interior predicate over global (row, col) index grids."""

    def pred(ri, ci):
        inside = (ri > 0) & (ri < ny) & (ci > 0) & (ci < nx)
        if mask_mode == "gamma":
            inside &= ~((ci <= nx // 2) & (ri <= ny // 2))
        return inside

    return pred


def _make_kernel_custom(cd: float, cx: float, cy: float, by: int, w: int,
                        nb: int):
    """Custom-domain variant: the interior mask is not algebraic, so it
    arrives as one packed int8 operand (~1 B/node extra read — the VERDICT
    r2 item 4 'bitmask operand' design). Contract: the INPUT field is
    already masked (all solver fields are — they are linear combinations of
    masked fields), so only the OUTPUT needs masking and the in-block halo
    rows need no mask at all; the off-grid halo rows of the first/last panel
    are zeroed by panel-id checks (grid edge rows are never interior for any
    domain — Domain2D.boundary includes the rectangle edge)."""

    def kernel(x_ref, up_ref, dn_ref, m_ref, o_ref):
        i = pl.program_id(0)
        m = m_ref[...] != 0
        x = jnp.where(m, x_ref[...], 0.0)  # panel masked; halo rows trusted
        up_row = jnp.where(i > 0, up_ref[-1:, :], 0.0)
        dn_row = jnp.where(i < nb - 1, dn_ref[:1, :], 0.0)
        up = jnp.concatenate([up_row, x[:-1, :]], axis=0)
        dn = jnp.concatenate([x[1:, :], dn_row], axis=0)
        lf = pltpu.roll(x, np.int32(1), 1)  # wrap lane = masked grid edge col
        rt = pltpu.roll(x, np.int32(w - 1), 1)
        y = cd * x + cx * (lf + rt) + cy * (up + dn)
        o_ref[...] = jnp.where(m, y, 0.0)

    return kernel


@partial(jax.jit, static_argnames=("cd", "cx", "cy", "block_rows", "interpret"))
def pallas_stencil_apply_custom(
    x: jnp.ndarray,
    mask8: jnp.ndarray,  # int8 {0,1}, same padded shape
    *,
    cd: float,
    cx: float,
    cy: float,
    block_rows: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = A @ x for custom-mask domains; ``x`` must be pre-masked."""
    hp, wp = x.shape
    by = block_rows
    assert hp % by == 0 and wp % 128 == 0 and by % 32 == 0, (hp, wp, by)
    grid = (hp // by,)
    kernel = _make_kernel_custom(cd, cx, cy, by, wp, hp // by)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((by, wp), lambda i: (i, 0)),
            pl.BlockSpec((8, wp), lambda i: (jnp.maximum(i * (by // 8) - 1, 0), 0)),
            pl.BlockSpec(
                (8, wp),
                lambda i: (jnp.minimum(i * (by // 8) + by // 8, hp // 8 - 1), 0),
            ),
            # int8 stream: (32, 128) tiling => by % 32 == 0
            pl.BlockSpec((by, wp), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((by, wp), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((hp, wp), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
        interpret=interpret,
    )(x, x, x, mask8)


def _make_kernel(nx: int, ny: int, cd: float, cx: float, cy: float,
                 by: int, w: int, mask_mode: str):
    pred = _interior_pred(mask_mode, nx, ny)

    def mask_at(row0, shape):
        ri = lax.broadcasted_iota(jnp.int32, shape, 0) + row0
        ci = lax.broadcasted_iota(jnp.int32, shape, 1)
        return pred(ri, ci)

    def kernel(x_ref, up_ref, dn_ref, o_ref):
        # up_ref/dn_ref are 8-row groups (Mosaic's minimum sublane block);
        # only their edge row is used — re-masked with the *virtual* halo
        # row's mask, which handles the clamped-at-edge garbage case.
        i = pl.program_id(0)
        row0 = i * by
        m = mask_at(row0, (by, w))
        x = jnp.where(m, x_ref[...], 0.0)
        up_row = jnp.where(mask_at(row0 - 1, (1, w)), up_ref[-1:, :], 0.0)
        dn_row = jnp.where(mask_at(row0 + by, (1, w)), dn_ref[:1, :], 0.0)
        up = jnp.concatenate([up_row, x[:-1, :]], axis=0)  # value at iy-1
        dn = jnp.concatenate([x[1:, :], dn_row], axis=0)  # value at iy+1
        lf = pltpu.roll(x, 1, 1)  # value at ix-1 (wrap lane is masked-zero)
        rt = pltpu.roll(x, w - 1, 1)  # value at ix+1 (roll requires shift >= 0)
        y = cd * x + cx * (lf + rt) + cy * (up + dn)
        o_ref[...] = jnp.where(m, y, 0.0)

    return kernel


@partial(
    jax.jit,
    static_argnames=("nx", "ny", "cd", "cx", "cy", "block_rows", "mask_mode", "interpret"),
)
def pallas_stencil_apply(
    x: jnp.ndarray,
    *,
    nx: int,
    ny: int,
    cd: float,
    cx: float,
    cy: float,
    block_rows: int,
    mask_mode: str = "gamma",
    interpret: bool = False,
) -> jnp.ndarray:
    """y = A @ x on a padded full-grid field of shape (Hp, Wp), where
    Hp % block_rows == 0 and Wp % 128 == 0."""
    hp, wp = x.shape
    by = block_rows
    assert hp % by == 0 and wp % 128 == 0, (hp, wp, by)
    grid = (hp // by,)
    kernel = _make_kernel(nx, ny, cd, cx, cy, by, wp, mask_mode)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((by, wp), lambda i: (i, 0)),
            # 8-row groups just above / below the panel (block idx in 8-row units)
            pl.BlockSpec((8, wp), lambda i: (jnp.maximum(i * (by // 8) - 1, 0), 0)),
            pl.BlockSpec(
                (8, wp),
                lambda i: (jnp.minimum(i * (by // 8) + by // 8, hp // 8 - 1), 0),
            ),
        ],
        out_specs=pl.BlockSpec((by, wp), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((hp, wp), x.dtype),
        interpret=interpret,
    )(x, x, x)


def _auto_block_rows(wp: int, dtype_bytes: int = 4, budget: int = 12 * 2**20) -> int:
    """Largest power-of-two panel height whose double-buffered in+out blocks
    fit the VMEM budget."""
    by = 256
    while by > 8 and 4 * by * wp * dtype_bytes > budget:
        by //= 2
    return by


@dataclass(frozen=True, eq=False)
class PallasStencilOperator:
    """Drop-in replacement for StencilOperator operating on padded fields.

    Use :meth:`pad` / :meth:`crop` to move between the domain's grid shape
    and the kernel's padded layout. The callable itself is jit-compatible and
    hashable, so it plugs straight into ``cg_solve``.
    """

    nx: int
    ny: int
    coeffs: Tuple[float, float, float]
    grid_shape: Tuple[int, int]  # unpadded
    padded_shape: Tuple[int, int]
    block_rows: int
    mask_mode: str
    interpret: bool
    # custom domains only: padded int8 interior mask streamed as a kernel
    # operand (gamma/rect masks are algebraic and cost zero HBM traffic)
    mask8: Optional[jnp.ndarray] = None

    @staticmethod
    def from_domain(domain, dtype=None, block_rows: Optional[int] = None,
                    interpret: Optional[bool] = None) -> "PallasStencilOperator":
        if isinstance(getattr(domain, "grid_shape", ()), tuple) and len(
            domain.grid_shape
        ) != 2:
            raise ValueError(
                "PallasStencilOperator is 2D; use Pallas3DStencilOperator for 3D"
            )
        custom = getattr(domain, "shape", None) not in ("gamma", "rect")
        h, w = domain.grid_shape
        wp = _round_up(w, 128)
        by = block_rows or _auto_block_rows(wp)
        if custom:
            by = max(by, 32)  # int8 mask stream: (32, 128) tiling
        hp = _round_up(h, by)
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        mask8 = None
        if custom:
            m = np.zeros((hp, wp), np.int8)
            m[:h, :w] = np.asarray(domain.interior, np.int8)
            mask8 = jnp.asarray(m)
        return PallasStencilOperator(
            nx=domain.nx,
            ny=domain.ny,
            coeffs=(domain.coeff_diag, domain.coeff_x, domain.coeff_y),
            grid_shape=(h, w),
            padded_shape=(hp, wp),
            block_rows=by,
            mask_mode="custom" if custom else domain.shape,
            interpret=interpret,
            mask8=mask8,
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
        cd, cx, cy = self.coeffs
        if self.mask8 is not None:
            return pallas_stencil_apply_custom(
                x,
                self.mask8,
                cd=cd,
                cx=cx,
                cy=cy,
                block_rows=self.block_rows,
                interpret=self.interpret,
            )
        return pallas_stencil_apply(
            x,
            nx=self.nx,
            ny=self.ny,
            cd=cd,
            cx=cx,
            cy=cy,
            block_rows=self.block_rows,
            mask_mode=self.mask_mode,
            interpret=self.interpret,
        )

    # --- layout helpers -----------------------------------------------------

    def pad(self, field: jnp.ndarray) -> jnp.ndarray:
        h, w = self.grid_shape
        hp, wp = self.padded_shape
        return jnp.pad(jnp.asarray(field), ((0, hp - h), (0, wp - w)))

    def crop(self, field: jnp.ndarray) -> jnp.ndarray:
        h, w = self.grid_shape
        return field[:h, :w]

    @property
    def shape(self):
        return self.padded_shape

    def interior_padded(self) -> np.ndarray:
        if self.mask8 is not None:
            return np.asarray(self.mask8, bool)
        ri, ci = np.mgrid[0 : self.padded_shape[0], 0 : self.padded_shape[1]]
        return np.asarray(_interior_pred(self.mask_mode, self.nx, self.ny)(ri, ci))

    def _interior_traced(self) -> jnp.ndarray:
        """Padded interior mask, built in-trace for gamma/rect (a captured
        full-grid bool would embed as a multi-MB HLO constant — see
        core.domain.MaskSpec); custom masks keep the mask8 array."""
        if self.mask_mode in ("gamma", "rect"):
            from iterative_solvers_tpu.core.domain import MaskSpec

            return MaskSpec(
                self.mask_mode, self.nx, self.ny, tuple(self.padded_shape)
            ).build()
        return jnp.asarray(self.interior_padded())

    def mask(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.where(self._interior_traced(), x, 0)

    def diagonal(self) -> jnp.ndarray:
        return jnp.where(self._interior_traced(), self.coeffs[0], 0.0)

    def nnz(self) -> int:
        from iterative_solvers_tpu.ops.stencil import StencilOperator

        return StencilOperator(jnp.asarray(self.interior_padded()), self.coeffs).nnz()
