"""Halo-exchanging stencil operator under `shard_map`.

TPU-native distributed SpMV (nothing like it exists in the reference — SURVEY
§2.4 maps its serial stencil loops here): each device owns a contiguous
(rows x cols) block of the full node grid; one row/column of halo is
exchanged with mesh neighbors via `lax.ppermute` (XLA lowers these to ICI
collective-permutes), then the 5-point update runs locally on the VPU.

Edge wraparound needs no special-casing: halos arriving across the global
grid edge only ever influence output nodes on that edge, which the interior
mask zeroes — boundary rows of the grid are never unknowns, and mesh padding
rows (parallel/mesh.py) are exterior. Inputs are masked *before* the
exchange, so neighbor blocks' boundary/padding values contribute nothing.

This operator plugs directly into `cg_solve`: the CG loop itself stays at the
jit/GSPMD level, where dot products over block-sharded fields compile to
all-reduces over the mesh — the TPU equivalent of the reference's host-side
scalar reductions (reference solver/msg_solver.cpp:215-258).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from iterative_solvers_tpu.core.domain import Domain2D
from iterative_solvers_tpu.parallel import mesh as mesh_lib


def _fwd(axis: str):  # halo travels toward higher index: i -> i+1
    n = lax.axis_size(axis)
    return [(i, (i + 1) % n) for i in range(n)]


def _bwd(axis: str):
    n = lax.axis_size(axis)
    return [(i, (i - 1) % n) for i in range(n)]


def _halo_apply_2d(x, interior, cd: float, cx: float, cy: float, ay: str, ax: str):
    """Per-block 5-point update with 1-deep halo exchange on both mesh axes.

    Structured for communication/compute overlap (BASELINE config: "halo
    exchange overlapped with interior stencil"): the bulk update is computed
    from block-local shifts only (zero rows/cols at the block edges), so it
    has NO data dependency on the four ppermutes — XLA's scheduler is free to
    run the ICI transfers concurrently with the interior compute. The halo
    contributions touch exactly one edge row/column each and are added last.
    """
    xm = jnp.where(interior, x, 0)

    # Kick off the four edge transfers first (no dependency on the compute).
    row_above = lax.ppermute(xm[-1:, :], ay, perm=_fwd(ay))  # -> our row 0's iy-1
    row_below = lax.ppermute(xm[:1, :], ay, perm=_bwd(ay))  # -> our last row's iy+1
    col_left = lax.ppermute(xm[:, -1:], ax, perm=_fwd(ax))  # -> our col 0's ix-1
    col_right = lax.ppermute(xm[:, :1], ax, perm=_bwd(ax))  # -> our last col's ix+1

    # Bulk update from local data only.
    z1 = jnp.zeros_like(xm[:1, :])
    up = jnp.concatenate([z1, xm[:-1, :]], axis=0)  # value at iy-1, 0 at edge
    dn = jnp.concatenate([xm[1:, :], z1], axis=0)
    zc = jnp.zeros_like(xm[:, :1])
    lf = jnp.concatenate([zc, xm[:, :-1]], axis=1)
    rt = jnp.concatenate([xm[:, 1:], zc], axis=1)
    y = cd * xm + cx * (lf + rt) + cy * (up + dn)

    # Edge corrections once the halos arrive.
    y = y.at[:1, :].add(cy * row_above)
    y = y.at[-1:, :].add(cy * row_below)
    y = y.at[:, :1].add(cx * col_left)
    y = y.at[:, -1:].add(cx * col_right)
    return jnp.where(interior, y, 0)


def _halo_apply_3d(x, interior, cd: float, cx: float, cy: float, cz: float,
                   az: str, ax: str):
    """Per-block 7-point update; z-planes exchanged over mesh axis ``az``,
    x-columns over ``ax``; the y dimension is unsharded (local). Structured
    like :func:`_halo_apply_2d`: the bulk update depends only on local data,
    so the ICI transfers overlap with the interior compute."""
    xm = jnp.where(interior, x, 0)

    plane_above = lax.ppermute(xm[-1:, :, :], az, perm=_fwd(az))
    plane_below = lax.ppermute(xm[:1, :, :], az, perm=_bwd(az))
    col_left = lax.ppermute(xm[:, :, -1:], ax, perm=_fwd(ax))
    col_right = lax.ppermute(xm[:, :, :1], ax, perm=_bwd(ax))

    zp = jnp.zeros_like(xm[:1, :, :])
    up = jnp.concatenate([zp, xm[:-1, :, :]], axis=0)  # value at iz-1, 0 at edge
    dn = jnp.concatenate([xm[1:, :, :], zp], axis=0)
    zc = jnp.zeros_like(xm[:, :, :1])
    lf = jnp.concatenate([zc, xm[:, :, :-1]], axis=2)
    rt = jnp.concatenate([xm[:, :, 1:], zc], axis=2)
    # y-neighbors are local (zero-padded at block edges == global boundary)
    zeros_y = jnp.zeros_like(xm[:, :1, :])
    yl = jnp.concatenate([zeros_y, xm[:, :-1, :]], axis=1)
    yr = jnp.concatenate([xm[:, 1:, :], zeros_y], axis=1)
    y = cd * xm + cx * (lf + rt) + cy * (yl + yr) + cz * (up + dn)

    y = y.at[:1, :, :].add(cz * plane_above)
    y = y.at[-1:, :, :].add(cz * plane_below)
    y = y.at[:, :, :1].add(cx * col_left)
    y = y.at[:, :, -1:].add(cx * col_right)
    return jnp.where(interior, y, 0)


@dataclass(frozen=True, eq=False)
class ShardedStencilOperator:
    """Matrix-free masked 5-point operator over a block-sharded field.

    Construct with :meth:`from_domain`; call on fields produced by
    :func:`iterative_solvers_tpu.parallel.mesh.shard_field`.

    The interior mask is never stored on device: for the standard shapes it
    is recomputed per block from ``axis_index`` offsets + iota comparisons
    (free on the VPU, fuses into the stencil, zero HBM traffic) — which also
    makes the operator safe under multi-controller jit, where closing over a
    process-spanning array is an error. Custom masks fall back to a host
    constant embedded at trace time.
    """

    mesh: Mesh
    coeffs: Tuple[float, ...]  # (cd, cx, cy[, cz])
    grid_shape: Tuple[int, ...]  # unpadded shape, for cropping
    padded_shape: Tuple[int, ...]  # mesh-divisible
    mask_kind: str  # 'gamma' | 'rect' | 'box3' | 'custom'
    dims: Tuple[int, ...]  # (nx, ny) or (nx, ny, nz) interval counts
    interior_host: Optional[np.ndarray] = None  # padded; custom masks only

    @staticmethod
    def from_domain(domain, mesh: Mesh, dtype=None) -> "ShardedStencilOperator":
        padded = mesh_lib.padded_grid_shape(domain.grid_shape, mesh)
        coeffs = (domain.coeff_diag, domain.coeff_x, domain.coeff_y)
        host = None
        if hasattr(domain, "coeff_z"):
            coeffs = coeffs + (domain.coeff_z,)
            kind, dims = "box3", (domain.nx, domain.ny, domain.nz)
        elif getattr(domain, "shape", "custom") in ("gamma", "rect"):
            kind, dims = domain.shape, (domain.nx, domain.ny)
        else:
            kind, dims = "custom", (domain.nx, domain.ny)
            host = np.asarray(
                mesh_lib.pad_field(np.asarray(domain.interior), mesh)
            )
        return ShardedStencilOperator(
            mesh, coeffs, domain.grid_shape, padded, kind, dims, host
        )

    # --- interior mask ------------------------------------------------------

    def _mask_pred(self):
        """(index grids…) -> bool predicate over GLOBAL node indices; padded
        indices beyond the grid test False automatically."""
        if self.mask_kind == "box3":
            nx, ny, nz = self.dims

            def pred3(zi, yi, xi):
                return (
                    (zi > 0) & (zi < nz) & (yi > 0) & (yi < ny) & (xi > 0) & (xi < nx)
                )

            return pred3
        from iterative_solvers_tpu.kernels.stencil_pallas import _interior_pred

        nx, ny = self.dims
        return _interior_pred(self.mask_kind, nx, ny)

    def _block_mask(self, block_shape, ay, ax):
        """Interior mask of THIS block (inside shard_map): block-local iotas
        offset by the block's global position."""
        if self.mask_kind == "custom":
            raise AssertionError("custom masks use the operand path")
        pred = self._mask_pred()
        i32 = jnp.int32
        if len(block_shape) == 3:
            zi = lax.broadcasted_iota(i32, block_shape, 0) + lax.axis_index(ay) * block_shape[0]
            yi = lax.broadcasted_iota(i32, block_shape, 1)
            xi = lax.broadcasted_iota(i32, block_shape, 2) + lax.axis_index(ax) * block_shape[2]
            return pred(zi, yi, xi)
        ri = lax.broadcasted_iota(i32, block_shape, 0) + lax.axis_index(ay) * block_shape[0]
        ci = lax.broadcasted_iota(i32, block_shape, 1) + lax.axis_index(ax) * block_shape[1]
        return pred(ri, ci)

    def _interior_global(self) -> np.ndarray:
        """Padded interior mask as a host array (IO/debug/nnz; never device).
        Built from open (broadcast) index grids — materialising full int
        index arrays would cost ~1 GB at 8192²."""
        if self.mask_kind == "custom":
            return self.interior_host
        grids = np.ogrid[tuple(slice(0, s) for s in self.padded_shape)]
        return np.broadcast_to(
            self._mask_pred()(*grids), self.padded_shape
        ).copy()

    @property
    def interior(self) -> np.ndarray:
        return self._interior_global()

    def _interior_device(self) -> jnp.ndarray:
        """Interior mask as a trace-level iota expression (GSPMD shards it;
        nothing is captured or replicated from the host)."""
        if self.mask_kind == "custom":
            return jnp.asarray(self.interior_host)
        pred = self._mask_pred()
        i32 = jnp.int32
        shape = self.padded_shape
        grids = [
            lax.broadcasted_iota(i32, shape, d) for d in range(len(shape))
        ]
        return pred(*grids)

    # --- apply --------------------------------------------------------------

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # On a hybrid DCN×ICI mesh the row dim shards over every axis but the
        # last (('slice', 'y') combined): the ppermutes then carry intra-slice
        # halo rows over ICI and the one slice-boundary row over DCN — lax
        # collectives take axis-name tuples and GSPMD places each pair.
        ay, ax = mesh_lib.row_col_axes(self.mesh)
        spec = mesh_lib.field_spec(self.mesh, x.ndim)
        if len(self.coeffs) == 4:
            body = partial(_halo_apply_3d, cd=self.coeffs[0], cx=self.coeffs[1],
                           cy=self.coeffs[2], cz=self.coeffs[3], az=ay, ax=ax)
        else:
            body = partial(_halo_apply_2d, cd=self.coeffs[0], cx=self.coeffs[1],
                           cy=self.coeffs[2], ay=ay, ax=ax)
        if self.mask_kind == "custom":
            interior = jnp.asarray(self.interior_host)
            return jax.shard_map(
                body, mesh=self.mesh, in_specs=(spec, spec), out_specs=spec
            )(x, interior)

        def fn(xb):
            return body(xb, self._block_mask(xb.shape, ay, ax))

        return jax.shard_map(
            fn, mesh=self.mesh, in_specs=(spec,), out_specs=spec
        )(x)

    @property
    def shape(self):
        return self.padded_shape

    def mask(self, x: jnp.ndarray) -> jnp.ndarray:
        # iota-built mask: works inside multi-controller jit and shards with
        # x under GSPMD instead of replicating an O(n²) host constant
        return jnp.where(self._interior_device(), x, 0)

    def diagonal(self) -> jnp.ndarray:
        return jnp.where(self._interior_device(), self.coeffs[0], 0.0)

    def nnz(self) -> int:
        from iterative_solvers_tpu.ops.stencil import StencilOperator

        return StencilOperator(
            jnp.asarray(self._interior_global()), self.coeffs, ndim=len(self.grid_shape)
        ).nnz()
