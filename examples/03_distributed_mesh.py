"""Distributed solve over a device mesh.

Block-partitions the grid over a 2D jax.sharding.Mesh: the stencil runs
under shard_map with ppermute halo exchange, CG scalars all-reduce, and the
multigrid V-cycle shards through GSPMD. On a machine without multiple
accelerators this demonstrates the identical code path on a virtual CPU
mesh (which is also how the test suite validates partition invariance).

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
          python examples/03_distributed_mesh.py
"""

import os

# Force CPU by default: an ambient JAX_PLATFORMS (e.g. a TPU-tunnel
# sitecustomize setting it to its own platform) must not silently move
# a demo onto shared hardware. Override with ISTPU_PLATFORM=tpu.
os.environ["JAX_PLATFORMS"] = os.environ.get("ISTPU_PLATFORM", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

import iterative_solvers_tpu as ist
from iterative_solvers_tpu.parallel import make_solver_mesh
from iterative_solvers_tpu.solvers.stopping import StopConfig


def main() -> None:
    mesh = make_solver_mesh()  # near-square factorization of all devices
    print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))} "
          f"over {mesh.devices.size} devices")

    stop = StopConfig(eps_precision=-1, eps_residual=1e-4, max_iterations=200)
    dist = ist.DirichletSolver(nx=256, ny=256, preconditioner="mg",
                               mesh=mesh, stop=stop)
    res = dist.solve(record_history=False)
    print(f"distributed: {res.iterations} iterations, converged={res.converged}")

    single = ist.DirichletSolver(nx=256, ny=256, preconditioner="mg", stop=stop)
    res1 = single.solve(record_history=False)
    dev = np.abs(res.solution - res1.solution).max()
    print(f"single-device: {res1.iterations} iterations; max |Δx| = {dev:.2e} "
          "(partition-invariant)")

    # The sharded FAST path (round 3): operator='pallas' runs the Pallas
    # stencil per block inside shard_map, and preconditioner='mg' becomes the
    # shard-fused V-cycle — measured at single-chip per-device throughput on
    # real hardware (NOTES_PERF.md round 3). Same answer, fastest per chip.
    fast = ist.DirichletSolver(nx=256, ny=256, operator="pallas",
                               preconditioner="mg", mesh=mesh, stop=stop)
    res2 = fast.solve(record_history=False)
    dev2 = np.abs(res2.solution - res1.solution).max()
    print(f"sharded fast path: {res2.iterations} iterations; "
          f"max |Δx| = {dev2:.2e}")


if __name__ == "__main__":
    main()
