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
    """

    mesh: Mesh
    interior: jnp.ndarray  # padded + sharded bool mask
    coeffs: Tuple[float, ...]  # (cd, cx, cy[, cz])
    grid_shape: Tuple[int, ...]  # unpadded shape, for cropping

    @staticmethod
    def from_domain(domain, mesh: Mesh, dtype=None) -> "ShardedStencilOperator":
        interior = mesh_lib.shard_field(jnp.asarray(domain.interior), mesh)
        coeffs = (domain.coeff_diag, domain.coeff_x, domain.coeff_y)
        if hasattr(domain, "coeff_z"):
            coeffs = coeffs + (domain.coeff_z,)
        return ShardedStencilOperator(mesh, interior, coeffs, domain.grid_shape)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ay, ax = self.mesh.axis_names[0], self.mesh.axis_names[-1]
        spec = mesh_lib.field_spec(self.mesh, x.ndim)
        if len(self.coeffs) == 4:
            fn = partial(_halo_apply_3d, cd=self.coeffs[0], cx=self.coeffs[1],
                         cy=self.coeffs[2], cz=self.coeffs[3], az=ay, ax=ax)
        else:
            fn = partial(_halo_apply_2d, cd=self.coeffs[0], cx=self.coeffs[1],
                         cy=self.coeffs[2], ay=ay, ax=ax)
        return jax.shard_map(
            fn,
            mesh=self.mesh,
            in_specs=(spec, spec),
            out_specs=spec,
        )(x, self.interior)

    @property
    def shape(self):
        return self.interior.shape

    def mask(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.where(self.interior, x, 0)

    def diagonal(self) -> jnp.ndarray:
        return jnp.where(self.interior, self.coeffs[0], 0.0)

    def nnz(self) -> int:
        from iterative_solvers_tpu.ops.stencil import StencilOperator

        return StencilOperator(
            jnp.asarray(self.interior), self.coeffs, ndim=len(self.grid_shape)
        ).nnz()
