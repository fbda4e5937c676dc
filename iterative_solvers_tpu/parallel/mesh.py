"""Device meshes and spatial grid partitioning.

The reference has no distributed layer at all (single process, Kokkos host
threads — SURVEY §2.4); this module is the framework's scaling centerpiece:
block-partition the full rectangular node grid over a 2D ``jax.sharding.Mesh``
(rows over axis ``'y'``, columns over ``'x'``), let XLA place collectives on
ICI, and keep CG scalars replicated via all-reduce.

Grids rarely divide the mesh evenly, so fields are padded at the high end of
each partitioned dimension with *exterior* rows/columns (interior mask False
there). Padding is semantically free: padded entries are identically zero
through the whole solve, dot products and max-norms are unaffected, and the
stencil never propagates values across the mask.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _near_square_factors(n: int) -> Tuple[int, int]:
    a = int(math.isqrt(n))
    while n % a:
        a -= 1
    return (n // a, a)  # rows >= cols


def make_solver_mesh(
    n_devices: Optional[int] = None,
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Tuple[str, str] = ("y", "x"),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """A 2D (rows, cols) mesh over the available devices.

    Defaults to a near-square factorization — the right layout for a 2D
    stencil because halo bytes scale with the block perimeter.
    """
    devs = list(devices) if devices is not None else jax.devices()
    n = n_devices or len(devs)
    if shape is None:
        shape = _near_square_factors(n)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    arr = np.asarray(devs[:n]).reshape(shape)
    return Mesh(arr, axis_names)


def padded_grid_shape(grid_shape: Tuple[int, ...], mesh: Mesh) -> Tuple[int, ...]:
    """Grid shape rounded up so each mesh axis divides its dimension.
    The row dim shards over every mesh axis but the last (on a hybrid
    DCN×ICI mesh that is ('slice', 'y') combined), the column dim over the
    last axis."""
    if len(mesh.axis_names) < 2:
        raise ValueError(
            "solver meshes need >= 2 axes (rows, cols) — "
            "use make_solver_mesh/make_hybrid_mesh"
        )
    my = math.prod(mesh.devices.shape[:-1])
    mx = mesh.devices.shape[-1]
    out = list(grid_shape)
    out[0] = -(-out[0] // my) * my
    out[-1] = -(-out[-1] // mx) * mx
    return tuple(out)


def pad_field(field, mesh: Mesh, fill=0):
    """Pad a full-grid field at the high end to a mesh-divisible shape."""
    target = padded_grid_shape(field.shape, mesh)
    pads = [(0, t - s) for s, t in zip(field.shape, target)]
    if all(p == (0, 0) for p in pads):
        return field
    if isinstance(field, np.ndarray):
        return np.pad(field, pads, constant_values=fill)
    return jnp.pad(field, pads, constant_values=fill)


def crop_field(field, grid_shape: Tuple[int, ...]):
    """Undo :func:`pad_field`."""
    sl = tuple(slice(0, s) for s in grid_shape)
    return field[sl]


def row_col_axes(mesh: Mesh):
    """Mesh axis names pairing with the field's (row, column) dims.

    The single source of the hybrid-mesh convention (shared with
    :func:`field_spec`): rows shard over every axis but the last — a tuple
    like ``('slice', 'y')`` on a DCN×ICI mesh, collapsed to the bare name on
    a flat 2-axis mesh so halo ppermutes stay single-axis — columns over the
    last axis."""
    names = mesh.axis_names
    ay = names[0] if len(names) == 2 else tuple(names[:-1])
    return ay, names[-1]


def row_col_axes_flat(mesh: Mesh) -> Tuple[str, ...]:
    """All mesh axis names as a flat tuple (for psum/pmax over the mesh)."""
    ay, ax = row_col_axes(mesh)
    return (ay if isinstance(ay, tuple) else (ay,)) + (ax,)


def field_spec(mesh: Mesh, ndim: int = 2) -> P:
    """Partition the leading and trailing field dims over the mesh axes
    (2D: rows/cols; 3D: z-planes/x-columns with y unsharded). On a hybrid
    mesh the row dim shards over the combined ('slice', …, 'y') axes —
    slice-boundary halo rows then ride DCN, everything else ICI."""
    axes = mesh.axis_names
    if len(axes) < 2:
        return P(axes[0])
    middle = (None,) * (ndim - 2)
    row = axes[0] if len(axes) == 2 else tuple(axes[:-1])
    return P(row, *middle, axes[-1])


def shard_field(field, mesh: Mesh, spec: Optional[P] = None):
    """Pad + place a full-grid field onto the mesh, block-partitioned.

    Works in multi-controller runs too: when the mesh spans processes, each
    process materialises only its addressable shards from the (host-global)
    field via ``make_array_from_callback``."""
    spec = spec or field_spec(mesh, np.ndim(field))
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() > 1:
        f = pad_field(np.asarray(field), mesh)
        return jax.make_array_from_callback(f.shape, sharding, lambda idx: f[idx])
    return jax.device_put(pad_field(jnp.asarray(field), mesh), sharding)


def make_sharded_problem(problem, mesh: Mesh, dtype=None):
    """(operator, b, u_true) ready for :func:`cg_solve` on a mesh.

    ``operator`` is a halo-exchanging sharded stencil; ``b``/``u_true`` are
    padded, block-sharded full-grid fields. The solution comes back padded —
    ``crop_field(x, problem.domain.grid_shape)`` restores the original grid.
    """
    from iterative_solvers_tpu.parallel.halo import ShardedStencilOperator

    op = ShardedStencilOperator.from_domain(problem.domain, mesh, dtype)
    b = shard_field(problem.rhs_field(dtype), mesh)
    u = (
        shard_field(problem.true_solution_field(dtype), mesh)
        if problem.u_exact is not None
        else None
    )
    return op, b, u
