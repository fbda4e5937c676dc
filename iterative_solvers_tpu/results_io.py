"""Results persistence.

Text formats follow the reference's ResultsIO section layout
(reference solver/dirichlet_solver.cpp:255-313 saveResults sections
PARAMETERS/CONVERGENCE/SOLUTION/TRUE_SOLUTION/RESIDUAL/ERROR/X_COORDS/
Y_COORDS; :407-457 saveMatrixAndRhs MATRIX_INFO/MATRIX/RHS; and the gnuplot
``x y z`` 3D export of dirichlet_solver.hpp:44-76). Our loader is robust to
the actual vector length (the reference's own loader wrongly resizes to
``n*m``, dirichlet_solver.cpp:354 — not replicated). An ``.npz`` format is
added for lossless round-trips.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from iterative_solvers_tpu.solvers.stopping import StopReason

_SECTIONS = [
    "SOLUTION",
    "TRUE_SOLUTION",
    "RESIDUAL",
    "ERROR",
    "X_COORDS",
    "Y_COORDS",
]


def save_results(path: str, results, solver_name: str = "MSG (conjugate gradient, TPU)") -> None:
    with open(path, "w") as f:
        f.write("PARAMETERS\n")
        dims = f"{results.nx} {results.ny}"
        if getattr(results, "nz", 0):
            dims += f" {results.nz}"
        f.write(dims + "\n")
        f.write(" ".join(str(v) for v in results.bounds) + "\n")
        f.write(f"{solver_name}\n")
        f.write("CONVERGENCE\n")
        f.write(f"{results.iterations}\n")
        f.write(f"{1 if results.converged else 0}\n")
        f.write(f"{results.stop_reason.name}\n")
        f.write(f"{results.residual_norm:.17e} {results.error_norm:.17e}\n")
        vectors = [
            results.solution,
            results.true_solution,
            results.residual,
            results.error,
            results.x_coords,
            results.y_coords,
        ]
        names = list(_SECTIONS)
        if getattr(results, "z_coords", None) is not None:
            names.append("Z_COORDS")
            vectors.append(results.z_coords)
        for name, vec in zip(names, vectors):
            f.write(f"{name}\n")
            for v in np.asarray(vec).ravel():
                f.write(f"{v:.17e}\n")


def load_results(path: str):
    """Load a sectioned-text results file back into a SolverResults."""
    from iterative_solvers_tpu.api import SolverResults

    with open(path) as f:
        lines = [ln.rstrip("\n") for ln in f]
    it = iter(range(len(lines)))

    def expect(i, name):
        if lines[i] != name:
            raise ValueError(f"{path}:{i + 1}: expected section {name!r}, got {lines[i]!r}")

    expect(0, "PARAMETERS")
    dims = [int(v) for v in lines[1].split()]
    nx, ny = dims[0], dims[1]
    nz = dims[2] if len(dims) > 2 else 0
    bounds = tuple(float(v) for v in lines[2].split())
    solver_name = lines[3]
    expect(4, "CONVERGENCE")
    iterations = int(lines[5])
    converged = lines[6].strip() == "1"
    reason_txt = lines[7].strip()
    try:
        reason = StopReason[reason_txt]
    except KeyError:
        reason = StopReason.ITERATIONS
    residual_norm, error_norm = (float(v) for v in lines[8].split())

    all_sections = _SECTIONS + ["Z_COORDS"]
    vecs = {}
    i = 9
    current: Optional[str] = None
    buf: List[float] = []
    while i <= len(lines):
        line = lines[i] if i < len(lines) else None
        if line is None or line in all_sections:
            if current is not None:
                vecs[current] = np.asarray(buf)
            if line is None:
                break
            current, buf = line, []
        elif line.strip():
            buf.append(float(line))
        i += 1

    def get(name):
        return vecs.get(name, np.zeros(0))

    return SolverResults(
        solution=get("SOLUTION"),
        true_solution=get("TRUE_SOLUTION"),
        residual=get("RESIDUAL"),
        error=get("ERROR"),
        x_coords=get("X_COORDS"),
        y_coords=get("Y_COORDS"),
        iterations=iterations,
        converged=converged,
        stop_reason=reason,
        residual_norm=residual_norm,
        error_norm=error_norm,
        precision_norm=float("nan"),
        elapsed_s=0.0,
        nx=nx,
        ny=ny,
        nz=nz,
        bounds=bounds,
        z_coords=vecs.get("Z_COORDS"),
    ), solver_name


def save_results_npz(path: str, results) -> None:
    np.savez_compressed(
        path,
        solution=results.solution,
        true_solution=results.true_solution,
        residual=results.residual,
        error=results.error,
        x_coords=results.x_coords,
        y_coords=results.y_coords,
        iterations=results.iterations,
        converged=results.converged,
        stop_reason=int(results.stop_reason),
        residual_norm=results.residual_norm,
        error_norm=results.error_norm,
        precision_norm=results.precision_norm,
        elapsed_s=results.elapsed_s,
        nx=results.nx,
        ny=results.ny,
        bounds=np.asarray(results.bounds),
        history=results.history if results.history is not None else np.zeros((0, 5)),
    )


def load_results_npz(path: str):
    from iterative_solvers_tpu.api import SolverResults

    z = np.load(path)
    hist = z["history"]
    return SolverResults(
        solution=z["solution"],
        true_solution=z["true_solution"],
        residual=z["residual"],
        error=z["error"],
        x_coords=z["x_coords"],
        y_coords=z["y_coords"],
        iterations=int(z["iterations"]),
        converged=bool(z["converged"]),
        stop_reason=StopReason(int(z["stop_reason"])),
        residual_norm=float(z["residual_norm"]),
        error_norm=float(z["error_norm"]),
        precision_norm=float(z["precision_norm"]),
        elapsed_s=float(z["elapsed_s"]),
        nx=int(z["nx"]),
        ny=int(z["ny"]),
        bounds=tuple(z["bounds"]),
        history=hist if hist.size else None,
    )


def save_matrix_and_rhs(path: str, domain, rhs_compact: np.ndarray) -> None:
    """CSR + RHS dump in the reference's MATRIX_INFO/MATRIX/RHS layout
    (reference solver/dirichlet_solver.cpp:407-457)."""
    from iterative_solvers_tpu.ops.sparse import assemble_csr

    row_map, entries, values = assemble_csr(domain)
    n_rows = len(row_map) - 1
    with open(path, "w") as f:
        f.write("MATRIX_INFO\n")
        f.write(f"{domain.nx} {domain.ny}\n")
        f.write(f"{n_rows} {len(entries)}\n")
        f.write("MATRIX\n")
        for v in row_map:
            f.write(f"{v}\n")
        for v in entries:
            f.write(f"{v}\n")
        for v in values:
            f.write(f"{v:.17e}\n")
        f.write("RHS\n")
        for v in np.asarray(rhs_compact).ravel():
            f.write(f"{v:.17e}\n")


def load_matrix_and_rhs(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(row_map, entries, values, rhs) from a MATRIX_INFO dump."""
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    assert lines[0] == "MATRIX_INFO", path
    n_rows, nnz = (int(v) for v in lines[2].split())
    assert lines[3] == "MATRIX"
    i = 4
    row_map = np.asarray([int(v) for v in lines[i : i + n_rows + 1]])
    i += n_rows + 1
    entries = np.asarray([int(v) for v in lines[i : i + nnz]])
    i += nnz
    values = np.asarray([float(v) for v in lines[i : i + nnz]])
    i += nnz
    assert lines[i] == "RHS"
    rhs = np.asarray([float(v) for v in lines[i + 1 : i + 1 + n_rows]])
    return row_map, entries, values, rhs


def save_solution_3d(path: str, results) -> None:
    """gnuplot/pm3d ``x y z`` export (reference dirichlet_solver.hpp:44-76)."""
    with open(path, "w") as f:
        f.write("# X Y Z (numeric solution on the Dirichlet domain)\n")
        for x, y, z in zip(results.x_coords, results.y_coords, results.solution):
            f.write(f"{x:.17e} {y:.17e} {z:.17e}\n")
