from iterative_solvers_tpu.core.domain import Domain2D, Domain3D
from iterative_solvers_tpu.core.problem import PoissonProblem
from iterative_solvers_tpu.core import ordering

__all__ = ["Domain2D", "Domain3D", "PoissonProblem", "ordering"]
