"""Custom-shaped domains + the interactive HTML explorer.

The reference hard-codes the Г-shape (solver/grid_system.cpp:86-89); this
framework generalizes the geometry to any node mask (``shape='custom'`` with
an ``inside_fn``) and — since round 3 — keeps the Pallas/fused fast path for
such masks by streaming the interior mask as one packed int8 kernel operand.

This example solves the Poisson problem on a plus/cross-shaped domain and
writes the standalone interactive explorer (rotatable 3D surface, hover
heatmap, convergence chart) to /tmp/ist_custom_explorer.html — the round-3
equivalent of the reference GUI's interactive result views
(qt_gui/src/mainwindow.cpp:796-917).

Run:  python examples/06_custom_domain_explorer.py
(CPU-friendly; forces the CPU backend so it runs anywhere.)
"""

import os

os.environ["JAX_PLATFORMS"] = os.environ.get("ISTPU_PLATFORM", "cpu")
import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

import iterative_solvers_tpu as ist
from iterative_solvers_tpu.viz_html import export_html


def main() -> None:
    n = 64

    def plus_shape(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
        """A plus/cross: the union of a horizontal and a vertical bar."""
        horizontal = (iy >= n // 4) & (iy <= 3 * n // 4)
        vertical = (ix >= n // 4) & (ix <= 3 * n // 4)
        return horizontal | vertical

    dom = ist.Domain2D(nx=n, ny=n, shape="custom", inside_fn=plus_shape)
    solver = ist.DirichletSolver(domain=dom)
    results = solver.solve()
    print(results.report())
    assert results.converged

    out = export_html(
        results, dom, "/tmp/ist_custom_explorer.html",
        title=f"plus-shaped domain, {n}x{n}",
    )
    print(f"\ninteractive explorer written to {out}")
    print("open it in any browser (file://, no dependencies) — drag to")
    print("rotate the surface, hover the heatmap, toggle convergence series")


if __name__ == "__main__":
    main()
