"""3D Poisson: the 7-point-stencil extension of the solver stack.

The reference project is 2D-only; this framework extends every layer to 3D
boxes (``Domain3D``, 7-point Pallas kernels, a 3D fused V-cycle, sharded
3D operators) — the 512³ configuration from BASELINE.md solves to a true
relative residual of 1e-6 in ~0.46 s on one TPU v5e chip (~40x plain CG at
13.9 ms/iteration, see NOTES_PERF.md). This example defaults to 24³ so it also runs in seconds
on CPU; pass a size to scale up.

Run:  python examples/07_3d.py [n]
      ISTPU_PLATFORM=tpu python examples/07_3d.py 256
"""

import os
import sys
import time

# Force CPU by default: an ambient JAX_PLATFORMS (e.g. a TPU-tunnel
# sitecustomize) must not silently move a demo onto shared hardware.
os.environ["JAX_PLATFORMS"] = os.environ.get("ISTPU_PLATFORM", "cpu")

import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import iterative_solvers_tpu as ist
from iterative_solvers_tpu.core.domain import Domain3D
from iterative_solvers_tpu.core.problem import PoissonProblem
from iterative_solvers_tpu.solvers.stopping import StopConfig


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    dom = Domain3D(nx=n, ny=n, nz=n)  # [0,1]³ box, u = exp(xyz)
    solver = ist.DirichletSolver(
        domain=dom,
        problem=PoissonProblem.manufactured(dom),
        preconditioner="mg",  # rediscretized 3D V-cycle
        stop=StopConfig(eps_precision=-1, eps_residual=-1, eps_relative=1e-8),
    )

    t0 = time.perf_counter()
    results = solver.solve()
    dt = time.perf_counter() - t0

    print(results.report())
    print(f"\n{n}³ solve: {dt:.3f} s, {results.iterations} iterations, "
          f"error |x-u|_inf = {results.error_norm:.3e} "
          f"(discretization-bound ~O(h²))")

    # gnuplot/pm3d export — the same x y z format as the reference's
    # saveSolutionFor3D (dirichlet_solver.hpp:44-76); here each z-slice of
    # the box is a pm3d block
    out = "/tmp/ist_3d_solution.dat"
    from iterative_solvers_tpu.results_io import save_solution_3d

    save_solution_3d(out, results)
    print(f"gnuplot export written to {out} (splot '{out}' with pm3d)")


if __name__ == "__main__":
    main()
