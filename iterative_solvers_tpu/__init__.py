"""tpu-iterative-solvers: a TPU-native sparse iterative-solver framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
C++ project Ruslan361/iterative_solvers (finite-difference Dirichlet-Poisson
assembly on masked grids, matrix-free / explicit-sparse operators, a
conjugate-gradient solver with multi-criterion stopping, live callbacks,
results IO and visualization) — built TPU-first:

- fields live on the full rectangular grid with interior/boundary masks
  (instead of the reference's compacted Г-numbering, cf.
  reference solver/grid_system.cpp:84-111), so the 5-point stencil is a
  dense, vectorizable, trivially shardable operation;
- the CG loop is a `lax.while_loop` compiled once and driven in chunks so
  host callbacks / user interrupts keep the reference's semantics
  (reference solver/msg_solver.cpp:80-184) without leaving the device;
- multi-chip scaling uses `jax.sharding` meshes with XLA collectives, plus
  `shard_map`/Pallas halo-exchange kernels on the hot path.
"""

from iterative_solvers_tpu.core.domain import Domain2D, Domain3D
from iterative_solvers_tpu.core.problem import PoissonProblem
from iterative_solvers_tpu.ops.stencil import StencilOperator, stencil_apply
from iterative_solvers_tpu.solvers.stopping import StopReason, StopConfig
from iterative_solvers_tpu.solvers.cg import CGOptions, CGResult, cg_solve
from iterative_solvers_tpu.solvers.multigrid import MultigridPreconditioner
from iterative_solvers_tpu.solvers.refine import RefinedResult, refined_solve
from iterative_solvers_tpu.api import DirichletSolver, SolverResults
from iterative_solvers_tpu.async_driver import AsyncSolver
from iterative_solvers_tpu.config import SolveConfig
from iterative_solvers_tpu.profiling import Profiler

__version__ = "0.1.0"

__all__ = [
    "Domain2D",
    "Domain3D",
    "PoissonProblem",
    "StencilOperator",
    "stencil_apply",
    "StopReason",
    "StopConfig",
    "CGOptions",
    "CGResult",
    "cg_solve",
    "MultigridPreconditioner",
    "RefinedResult",
    "refined_solve",
    "DirichletSolver",
    "SolverResults",
    "AsyncSolver",
    "SolveConfig",
    "Profiler",
    "__version__",
]
