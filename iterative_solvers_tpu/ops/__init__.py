from iterative_solvers_tpu.ops.stencil import StencilOperator, stencil_apply
from iterative_solvers_tpu.ops.sparse import SparseOperator, assemble_csr

__all__ = ["StencilOperator", "stencil_apply", "SparseOperator", "assemble_csr"]
