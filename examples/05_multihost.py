"""Multi-host / multi-slice scaling: hybrid DCN×ICI meshes.

The grid is block-partitioned over a 3-axis ('slice', 'y', 'x') mesh with the
slice/host axis OUTERMOST: each slice owns a contiguous band of rows, so one
halo row per slice boundary per stencil apply is the only DCN traffic; the
rest rides ICI. CG scalars all-reduce hierarchically under GSPMD.

Run (single process, 8 virtual devices standing in for 2 slices x 4 chips):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/05_multihost.py

On a real multi-host pod, each worker instead starts with:

    from iterative_solvers_tpu.parallel import initialize_distributed
    initialize_distributed()          # reads the standard JAX env / TPU pod
    mesh = make_hybrid_mesh()         # slices from the hardware topology

and the rest of this file runs unchanged (see tests/_multihost_worker.py for
a complete 2-process gRPC-coordinated version, exercised by the test suite).
"""

import os

# Force CPU by default: an ambient JAX_PLATFORMS (e.g. a TPU-tunnel
# sitecustomize setting it to its own platform) must not silently move
# a demo onto shared hardware. Override with ISTPU_PLATFORM=tpu.
os.environ["JAX_PLATFORMS"] = os.environ.get("ISTPU_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from iterative_solvers_tpu.core.domain import Domain2D
from iterative_solvers_tpu.core.problem import PoissonProblem
from iterative_solvers_tpu.parallel import make_hybrid_mesh, make_sharded_problem
from iterative_solvers_tpu.parallel.mesh import crop_field
from iterative_solvers_tpu.solvers.multigrid import ShardedMultigridPreconditioner
from iterative_solvers_tpu.solvers.refine import device_refined_solve
from iterative_solvers_tpu.solvers.stopping import StopConfig


def main() -> None:
    # synthetic slices on the virtual mesh; a site-customized interpreter may
    # have initialized the backend before this script could set XLA_FLAGS, in
    # which case fall back to however many devices exist
    ndev = len(jax.devices())
    n_slices = 2 if ndev >= 2 and ndev % 2 == 0 else 1
    mesh = make_hybrid_mesh(n_slices=n_slices)
    print(f"mesh axes {mesh.axis_names}, shape {mesh.devices.shape}")

    dom = Domain2D(nx=128, ny=128)
    prob = PoissonProblem.manufactured(dom)
    op, b, u = make_sharded_problem(prob, mesh, jnp.float64)
    M = ShardedMultigridPreconditioner.from_domain(dom, mesh)

    # the whole mixed-precision refinement is ONE dispatch over the mesh
    res = device_refined_solve(
        op,
        op,
        b,
        u_true=u,
        stop=StopConfig(eps_precision=-1, eps_residual=-1, eps_relative=1e-10,
                        max_iterations=10000),
        preconditioner=M,
    )
    x = crop_field(res.x, dom.grid_shape)
    rel = res.residual_norm / res.initial_residual_norm
    print(
        f"converged={res.converged} ({res.reason.name}) "
        f"outers={res.outer_iterations} inner={res.iterations} "
        f"true rel residual={rel:.2e} err_inf={res.error_max:.2e}"
    )
    assert res.converged and x.shape == dom.grid_shape


if __name__ == "__main__":
    main()
