from iterative_solvers_tpu.parallel.mesh import (
    make_solver_mesh,
    pad_field,
    crop_field,
    padded_grid_shape,
    shard_field,
    make_sharded_problem,
)
from iterative_solvers_tpu.parallel.halo import ShardedStencilOperator
from iterative_solvers_tpu.parallel.halo_pallas import ShardedPallasStencilOperator
from iterative_solvers_tpu.parallel.multihost import (
    initialize_distributed,
    make_hybrid_mesh,
)

__all__ = [
    "make_solver_mesh",
    "make_hybrid_mesh",
    "initialize_distributed",
    "pad_field",
    "crop_field",
    "padded_grid_shape",
    "shard_field",
    "make_sharded_problem",
    "ShardedStencilOperator",
    "ShardedPallasStencilOperator",
]
