from iterative_solvers_tpu.solvers.stopping import StopReason, StopConfig
from iterative_solvers_tpu.solvers.cg import CGOptions, CGResult, cg_solve
from iterative_solvers_tpu.solvers.multigrid import MultigridPreconditioner

__all__ = [
    "StopReason",
    "StopConfig",
    "CGOptions",
    "CGResult",
    "cg_solve",
    "MultigridPreconditioner",
]
