"""Explicit sparse (CSR/BCOO) assembly and SpMV — the parity/generality path.

TPU-native equivalent of the reference's GridSystem CSR assembly
(reference solver/grid_system.cpp:157-274: two region loops, incremental
``add_matrix_entry`` + prefix-sum ``finalize_matrix``). Here assembly is a
vectorized construction over the interior mask: rank interior nodes by a
cumulative sum, emit one entry block per stencil offset, and prune
non-interior neighbors. The result is exposed both as raw CSR arrays
(for reference-format dumps, cf. solver/dirichlet_solver.cpp:407-457) and as
a ``jax.experimental.sparse.BCOO`` operator for on-device SpMV.

The matrix-free :class:`~iterative_solvers_tpu.ops.stencil.StencilOperator`
is the performance path; this one exists for parity with the reference's
explicit matrix, for dumping, and for operators that are not pure stencils.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp
import numpy as np
from jax.experimental import sparse as jsparse

from iterative_solvers_tpu.core.domain import Domain2D, Domain3D
from iterative_solvers_tpu.core.ordering import interior_indices


def _offsets(domain):
    """Stencil offsets as (shift tuple, coefficient) pairs, diagonal first."""
    if isinstance(domain, Domain3D):
        return [
            ((0, 0, 0), domain.coeff_diag),
            ((0, 0, -1), domain.coeff_x),
            ((0, 0, 1), domain.coeff_x),
            ((0, -1, 0), domain.coeff_y),
            ((0, 1, 0), domain.coeff_y),
            ((-1, 0, 0), domain.coeff_z),
            ((1, 0, 0), domain.coeff_z),
        ]
    return [
        ((0, 0), domain.coeff_diag),
        ((0, -1), domain.coeff_x),
        ((0, 1), domain.coeff_x),
        ((-1, 0), domain.coeff_y),
        ((1, 0), domain.coeff_y),
    ]


def assemble_coo(domain, dtype=np.float64):
    """(rows, cols, vals) of the compacted system matrix, row-major sorted,
    diagonal-first within each row's unordered construction then sorted by
    (row, col). Ordering of unknowns is compacted row-major (= reference
    ordering on square Г-grids, see core/ordering.py)."""
    interior = domain.interior
    shape = interior.shape
    rank = -np.ones(interior.size, dtype=np.int64)
    idx = interior_indices(domain)
    rank[idx] = np.arange(idx.size)
    rank = rank.reshape(shape)

    rows_list, cols_list, vals_list = [], [], []
    grids = np.indices(shape)
    for offset, coeff in _offsets(domain):
        nb_ok = np.ones(shape, dtype=bool)
        nb_index = []
        for ax, d in enumerate(offset):
            pos = grids[ax] + d
            nb_ok &= (pos >= 0) & (pos < shape[ax])
            nb_index.append(np.clip(pos, 0, shape[ax] - 1))
        nb_interior = interior[tuple(nb_index)] & nb_ok
        sel = interior & nb_interior
        rows_list.append(rank[sel])
        cols_list.append(rank[tuple(nb_index)][sel])
        vals_list.append(np.full(int(sel.sum()), coeff, dtype=dtype))

    rows = np.concatenate(rows_list)
    cols = np.concatenate(cols_list)
    vals = np.concatenate(vals_list)
    order = np.lexsort((cols, rows))
    return rows[order], cols[order], vals[order]


def assemble_csr(domain, dtype=np.float64, backend: str = "auto") -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """CSR (row_map, entries, values) of the compacted system matrix —
    byte-compatible content with the reference's finalize_matrix output
    (solver/grid_system.cpp:122-155) up to within-row entry order.

    ``backend='auto'`` uses the native C++ engine (native/assembly.cpp) for
    rect/gamma 2D domains and 3D boxes, falling back to the vectorized NumPy
    builder for custom masks; 'native' requires the engine, 'numpy' skips it."""
    if backend in ("auto", "native"):
        from iterative_solvers_tpu.native import assemble_csr_native

        out = assemble_csr_native(domain)
        if out is not None:
            row_map, entries, values = out
            return row_map, entries, values.astype(dtype, copy=False)
        if backend == "native":
            raise RuntimeError("native assembly unavailable for this domain")
    rows, cols, vals = assemble_coo(domain, dtype)
    n = domain.num_unknowns
    row_map = np.zeros(n + 1, dtype=np.int64)
    np.add.at(row_map, rows + 1, 1)
    row_map = np.cumsum(row_map)
    return row_map, cols.astype(np.int64), vals


def assemble_dense(domain, dtype=np.float64) -> np.ndarray:
    """Dense system matrix (small grids / parity tests only)."""
    rows, cols, vals = assemble_coo(domain, dtype)
    n = domain.num_unknowns
    A = np.zeros((n, n), dtype=dtype)
    A[rows, cols] = vals
    return A


@dataclass(frozen=True, eq=False)
class SparseOperator:
    """On-device BCOO SpMV over compacted unknown vectors."""

    mat: jsparse.BCOO

    @staticmethod
    def from_domain(domain, dtype=None) -> "SparseOperator":
        dtype = dtype or jnp.asarray(0.0).dtype
        rows, cols, vals = assemble_coo(domain, np.float64)
        n = domain.num_unknowns
        mat = jsparse.BCOO(
            (jnp.asarray(vals, dtype=dtype), jnp.asarray(np.stack([rows, cols], axis=1))),
            shape=(n, n),
        )
        return SparseOperator(mat)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.mat @ x

    @property
    def shape(self):
        return (self.mat.shape[0],)

    def mask(self, x: jnp.ndarray) -> jnp.ndarray:
        return x

    def diagonal(self) -> jnp.ndarray:
        rows, cols = self.mat.indices[:, 0], self.mat.indices[:, 1]
        diag = jnp.zeros(self.mat.shape[0], self.mat.data.dtype)
        return diag.at[rows].add(jnp.where(rows == cols, self.mat.data, 0))

    def nnz(self) -> int:
        return int(self.mat.nse)
