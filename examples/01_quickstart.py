"""Quickstart: solve the reference's default workload and inspect results.

Reproduces the reference GUI's default configuration (30x30 Г-domain on
[1,2]², eps 1e-6 — qt_gui/src/mainwindow.cpp:112-125) through the facade,
with live progress, a text report, and a results file.

Run:  python examples/01_quickstart.py
(CPU-friendly; forces the CPU backend so it runs anywhere.)
"""

import os

# Force CPU by default: an ambient JAX_PLATFORMS (e.g. a TPU-tunnel
# sitecustomize setting it to its own platform) must not silently move
# a demo onto shared hardware. Override with ISTPU_PLATFORM=tpu.
os.environ["JAX_PLATFORMS"] = os.environ.get("ISTPU_PLATFORM", "cpu")
import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import iterative_solvers_tpu as ist


def main() -> None:
    solver = ist.DirichletSolver(nx=30, ny=30)

    def on_progress(k, dx, r, err):
        print(f"  iter {k:>4}: |dx|={dx:.3e} |r|={r:.3e} |err|={err:.3e}")

    results = solver.solve(callback=on_progress, callback_every=20)
    print()
    print(results.report())

    results.save("/tmp/ist_quickstart_results.txt")
    print("\nresults saved to /tmp/ist_quickstart_results.txt "
          "(reference-compatible sectioned text)")

    # round-trip
    from iterative_solvers_tpu.results_io import load_results

    loaded, solver_name = load_results("/tmp/ist_quickstart_results.txt")
    assert loaded.iterations == results.iterations
    print(f"round-trip OK ({solver_name})")


if __name__ == "__main__":
    main()
