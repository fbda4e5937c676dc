from iterative_solvers_tpu.solvers.stopping import StopReason, StopConfig
from iterative_solvers_tpu.solvers.cg import CGOptions, CGResult, cg_solve

__all__ = ["StopReason", "StopConfig", "CGOptions", "CGResult", "cg_solve"]
