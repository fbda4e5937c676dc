"""Multi-controller worker for tests/test_multihost.py (not a pytest module).

Each process joins a 2-process CPU run (4 virtual devices per process), builds
the hybrid ('slice','y','x') mesh from the process topology, runs the sharded
MG-PCG solve, and prints one machine-readable line. The parent asserts both
processes converge identically and match the single-process reference.

Usage: python _multihost_worker.py <coordinator> <num_processes> <process_id>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=4").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main() -> int:
    coordinator, nprocs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from iterative_solvers_tpu.parallel import initialize_distributed

    initialize_distributed(coordinator, nprocs, pid)
    assert jax.process_count() == nprocs, jax.process_count()
    assert len(jax.devices()) == 4 * nprocs

    from iterative_solvers_tpu.core.domain import Domain2D
    from iterative_solvers_tpu.core.problem import PoissonProblem
    from iterative_solvers_tpu.parallel import make_hybrid_mesh, make_sharded_problem
    from iterative_solvers_tpu.solvers.cg import CGOptions, cg_solve
    from iterative_solvers_tpu.solvers.multigrid import ShardedMultigridPreconditioner
    from iterative_solvers_tpu.solvers.stopping import StopConfig

    mesh = make_hybrid_mesh()  # slices == processes here
    assert mesh.devices.shape == (nprocs, 2, 2), mesh.devices.shape

    dom = Domain2D(nx=32, ny=32)
    prob = PoissonProblem.manufactured(dom)
    op, b, u = make_sharded_problem(prob, mesh)
    M = ShardedMultigridPreconditioner.from_domain(dom, mesh)
    res = cg_solve(
        op,
        b,
        u_true=u,
        options=CGOptions(
            stop=StopConfig(eps_precision=1e-8, eps_residual=1e-8, max_iterations=100),
            preconditioner=M,
        ),
    )
    print(
        f"MHW pid={pid} converged={res.converged} iters={res.iterations} "
        f"rmax={res.residual_max:.6e} emax={res.error_max:.6e}",
        flush=True,
    )
    return 0 if res.converged else 1


if __name__ == "__main__":
    raise SystemExit(main())
