"""Solver-state checkpoint/resume for long runs.

The reference persists only final results (solver/dirichlet_solver.cpp:
255-405); this framework also checkpoints the live CG state (x, r, z,
iteration counter) at chunk boundaries, so a long solve survives preemption
— the standard long-job pattern on shared TPU pools.

Run:  python examples/04_checkpoint_resume.py
"""

import os

# Force CPU by default: an ambient JAX_PLATFORMS (e.g. a TPU-tunnel
# sitecustomize setting it to its own platform) must not silently move
# a demo onto shared hardware. Override with ISTPU_PLATFORM=tpu.
os.environ["JAX_PLATFORMS"] = os.environ.get("ISTPU_PLATFORM", "cpu")
import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import iterative_solvers_tpu as ist
from iterative_solvers_tpu.core.problem import PoissonProblem
from iterative_solvers_tpu.core.domain import Domain2D
from iterative_solvers_tpu.ops.stencil import StencilOperator
from iterative_solvers_tpu.solvers.cg import CGOptions, cg_solve
from iterative_solvers_tpu.solvers.checkpoint import load_cg_state, save_cg_state
from iterative_solvers_tpu.solvers.stopping import StopConfig

PATH = "/tmp/ist_cg_checkpoint.npz"


def main() -> None:
    dom = Domain2D(nx=128, ny=128)
    prob = PoissonProblem.manufactured(dom)
    op = StencilOperator.from_domain(dom)
    b = prob.rhs_field()
    stop = StopConfig(eps_precision=-1, eps_residual=1e-6, max_iterations=5000)

    # Phase 1: run, checkpointing every chunk, then "crash" after 100 iters.
    def checkpoint(state):
        save_cg_state(PATH, state)

    first = cg_solve(
        op, b,
        options=CGOptions(
            stop=StopConfig(eps_precision=-1, eps_residual=1e-6, max_iterations=100),
            state_callback=checkpoint, chunk_size=50,
        ),
    )
    print(f"phase 1 stopped at iteration {first.iterations} "
          f"(|r|={first.residual_max:.2e}) — checkpoint on disk")

    # Phase 2: resume from the checkpoint and finish.
    state = load_cg_state(PATH)
    done = cg_solve(op, b, options=CGOptions(stop=stop), init_state=state)
    print(f"resumed and converged at iteration {done.iterations} "
          f"(|r|={done.residual_max:.2e}, reason: {done.reason.text()})")


if __name__ == "__main__":
    main()
