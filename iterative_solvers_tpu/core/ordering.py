"""Conversions between full-grid fields and compacted unknown vectors.

The reference stores unknowns in a compacted vector: the Г-domain's bottom
strip rows first (``y=1..m/2``, ``x=n/2+1..n-1``), then the upper block rows
(``y=m/2+1..m-1``, ``x=1..n-1``), x-innermost (reference
solver/grid_system.cpp:84-111). Because both regions are enumerated by rows
with x innermost, this is exactly **row-major order over the interior mask**
— so packing is a single gather and the ordering generalizes to any masked
domain (the reference itself is square-grid-only due to the ``n/2``-for-
``m/2`` quirk at grid_system.cpp:103-106, which is benign when n == m).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from iterative_solvers_tpu.core.domain import Domain2D, Domain3D


def interior_indices(domain) -> np.ndarray:
    """Linear full-grid indices of interior nodes, in compacted (row-major)
    order — the reference's unknown numbering for square Г-grids."""
    return np.flatnonzero(domain.interior.ravel())


def pack(field, domain) -> jnp.ndarray:
    """Gather a full-grid field into the compacted unknown vector."""
    idx = jnp.asarray(interior_indices(domain))
    return jnp.ravel(field)[idx]


def unpack(vec, domain, fill=0.0) -> jnp.ndarray:
    """Scatter a compacted unknown vector back onto the full grid."""
    idx = jnp.asarray(interior_indices(domain))
    flat = jnp.full(domain.interior.size, fill, dtype=vec.dtype)
    flat = flat.at[idx].set(vec)
    return flat.reshape(domain.grid_shape)


def node_coordinates(domain) -> Tuple[np.ndarray, np.ndarray]:
    """Physical (x, y) coordinates of each unknown, compacted order.

    Reference analogue: per-node coordinate bookkeeping in GridSystem
    (solver/grid_system.cpp:332-397 ``get_node_coordinates`` — which is an
    O(N) search per query there; here it is one vectorized gather).
    """
    if isinstance(domain, Domain3D):
        X, Y, Z = domain.coords()
        idx = interior_indices(domain)
        return X.ravel()[idx], Y.ravel()[idx], Z.ravel()[idx]
    X, Y = domain.coords()
    idx = interior_indices(domain)
    return X.ravel()[idx], Y.ravel()[idx]


def reference_position(domain: Domain2D, ix: int, iy: int) -> int:
    """The reference's ``calculate_position_in_template``
    (solver/grid_system.cpp:84-111), for parity tests. Square Г-grids only."""
    n, m = domain.nx, domain.ny
    if domain.shape != "gamma" or n != m:
        raise ValueError("reference numbering defined only for square Г-grids")
    if (ix < n // 2 and iy < m // 2) or ix in (0, n) or iy in (0, m):
        raise ValueError("not an interior node")
    if not domain.interior[iy, ix]:
        raise ValueError("not an interior node")
    def bottom(x, y):
        return (n // 2 - 1) * (y - 1) + x - n // 2 - 1
    if iy <= m // 2:
        return bottom(ix, iy)
    upper = (iy - n // 2 - 1) * (n - 1) + ix - 1
    return upper + bottom(n - 1, m // 2) + 1
