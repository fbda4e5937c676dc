"""The fast path: multigrid-preconditioned CG inside mixed-precision
iterative refinement.

This is the configuration behind the headline benchmark (8192² to a TRUE
relative residual of 1e-6 in ~0.17 s on a TPU v5e — ~300x faster than plain
CG, which at this scale cannot even reach the target in f32). The example
defaults to 512² so it also runs quickly on CPU; pass a size to scale up.

Run:  python examples/02_fast_large_scale.py [n]
      ISTPU_PLATFORM=tpu python examples/02_fast_large_scale.py 8192
"""

import os
import sys
import time

# Force CPU by default: an ambient JAX_PLATFORMS (e.g. a TPU-tunnel
# sitecustomize) must not silently move a demo onto shared hardware.
os.environ["JAX_PLATFORMS"] = os.environ.get("ISTPU_PLATFORM", "cpu")

import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)  # the f64 outer refinement loop

import iterative_solvers_tpu as ist
from iterative_solvers_tpu.profiling import Profiler
from iterative_solvers_tpu.solvers.stopping import StopConfig


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    solver = ist.DirichletSolver(
        nx=n,
        ny=n,
        preconditioner="mg",  # geometric multigrid V-cycle
        precision="mixed",  # f64 outer refinement over f32 inner MG-PCG
        stop=StopConfig(eps_precision=-1, eps_residual=-1,
                        eps_relative=1e-6, max_iterations=100000),
    )
    prof = Profiler()
    t0 = time.perf_counter()
    results = solver.solve(record_history=False, profiler=prof)
    wall = time.perf_counter() - t0

    print(results.report())
    print()
    print(prof.report())
    print(f"\n{n}x{n} unknowns={results.solution.size:,} wall={wall:.2f}s "
          f"(includes one-time compilation)")


if __name__ == "__main__":
    main()
