from iterative_solvers_tpu.kernels.stencil_pallas import PallasStencilOperator

__all__ = ["PallasStencilOperator"]
