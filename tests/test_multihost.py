"""Multi-host layer tests: hybrid DCN×ICI meshes and true multi-process runs.

The reference has nothing distributed (SURVEY §2.4); BASELINE.md's multi-host
configs ("8192² row-partitioned multi-host", "512³ N≥2 hosts") are exercised
structurally here: the hybrid ('slice','y','x') mesh on the virtual 8-device
CPU mesh in-process, and a REAL 2-process multi-controller CPU run (gRPC
coordinator, 4 virtual devices per process) via subprocess workers.
"""

import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from iterative_solvers_tpu.core.domain import Domain2D
from iterative_solvers_tpu.core.problem import PoissonProblem
from iterative_solvers_tpu.parallel import make_hybrid_mesh, make_sharded_problem
from iterative_solvers_tpu.parallel.mesh import crop_field, field_spec
from iterative_solvers_tpu.solvers.cg import CGOptions, cg_solve
from iterative_solvers_tpu.solvers.multigrid import ShardedMultigridPreconditioner
from iterative_solvers_tpu.solvers.stopping import StopConfig
from iterative_solvers_tpu.ops.stencil import StencilOperator

STOP = StopConfig(eps_precision=1e-8, eps_residual=1e-8, max_iterations=100)


def test_hybrid_mesh_construction():
    mesh = make_hybrid_mesh(n_slices=2)
    assert mesh.axis_names == ("slice", "y", "x")
    assert mesh.devices.shape == (2, 2, 2)
    mesh4 = make_hybrid_mesh(n_slices=4)
    assert mesh4.devices.shape == (4, 2, 1)
    with pytest.raises(ValueError):
        make_hybrid_mesh(n_slices=3)  # 8 devices don't split into 3
    with pytest.raises(ValueError):
        make_hybrid_mesh(n_slices=2, ici_shape=(3, 1))


def test_hybrid_field_spec():
    mesh = make_hybrid_mesh(n_slices=2)
    assert field_spec(mesh, 2) == P(("slice", "y"), "x")
    assert field_spec(mesh, 3) == P(("slice", "y"), None, "x")


def test_hybrid_mesh_solve_matches_single_device():
    # The full sharded MG-PCG solve over the hybrid mesh must be partition-
    # invariant: same iteration count and solution as one device.
    dom = Domain2D(nx=32, ny=32)
    prob = PoissonProblem.manufactured(dom)

    ref = cg_solve(
        StencilOperator.from_domain(dom),
        prob.rhs_field(None),
        options=CGOptions(
            stop=STOP,
            preconditioner=__import__(
                "iterative_solvers_tpu.solvers.multigrid", fromlist=["M"]
            ).MultigridPreconditioner.from_domain(dom, fuse=False),
        ),
    )

    mesh = make_hybrid_mesh(n_slices=2)
    op, b, u = make_sharded_problem(prob, mesh)
    M = ShardedMultigridPreconditioner.from_domain(dom, mesh)
    res = cg_solve(op, b, u_true=u, options=CGOptions(stop=STOP, preconditioner=M))
    assert res.converged
    assert res.iterations == ref.iterations
    x = np.asarray(crop_field(res.x, dom.grid_shape))
    np.testing.assert_allclose(x, np.asarray(ref.x), rtol=1e-10, atol=1e-12)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_cpu_run():
    # Real multi-controller: 2 OS processes x 4 virtual CPU devices, gRPC
    # coordinator, hybrid mesh with slice == process, sharded MG-PCG solve.
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    coordinator = f"localhost:{_free_port()}"
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process workers timed out")
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(next(ln for ln in out.splitlines() if ln.startswith("MHW")))
    # both controllers observed the identical replicated solve stats
    stats = [o.split(" ", 2)[2] for o in outs]
    assert stats[0] == stats[1], outs
    assert "converged=True" in outs[0]


def test_device_refined_solve_on_hybrid_mesh():
    # The one-dispatch refinement loop compiles and runs under GSPMD over the
    # hybrid mesh: halo-exchange SpMV + sharded V-cycle + all-reduced scalars
    # inside nested while_loops, one host fetch total.
    import jax.numpy as jnp

    from iterative_solvers_tpu.solvers.refine import device_refined_solve

    dom = Domain2D(nx=32, ny=32)
    prob = PoissonProblem.manufactured(dom)
    mesh = make_hybrid_mesh(n_slices=2)
    op, b, u = make_sharded_problem(prob, mesh, jnp.float64)
    M = ShardedMultigridPreconditioner.from_domain(dom, mesh)
    stop = StopConfig(
        eps_precision=-1, eps_residual=-1, eps_relative=1e-9, max_iterations=10000
    )
    res = device_refined_solve(op, op, b, u_true=u, stop=stop, preconditioner=M)
    assert res.converged
    assert res.residual_norm / res.initial_residual_norm < 1e-9
    # solution matches the unsharded reference path
    ref = device_refined_solve(
        StencilOperator.from_domain(dom),
        StencilOperator.from_domain(dom),
        prob.rhs_field(jnp.float64),
        stop=stop,
        preconditioner=__import__(
            "iterative_solvers_tpu.solvers.multigrid", fromlist=["M"]
        ).MultigridPreconditioner.from_domain(dom, fuse=False),
    )
    x = np.asarray(crop_field(res.x, dom.grid_shape))
    np.testing.assert_allclose(x, np.asarray(ref.x), rtol=1e-8, atol=1e-10)
