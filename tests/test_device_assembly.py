"""Device-side field assembly (problem.rhs_field(device=True) & friends)
must match the host numpy path bit-for-bit at f64 resolution.

The device path exists because the host path is a full-grid single-core
f64 transcendental sweep (55-200 s at 8192² on the build VM) plus a ~0.5 GB
transfer; it routes automatically for grids >= 2^22 nodes on accelerators
(NOTES_PERF.md 2026-08-19). On CPU-backed tests we force device=True to
exercise the traced path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from iterative_solvers_tpu.core.domain import Domain2D, Domain3D
from iterative_solvers_tpu.core.problem import PoissonProblem

DOMS = [
    Domain2D(nx=64, ny=64),
    Domain2D(nx=30, ny=48, shape="rect"),
    Domain2D(nx=16, ny=16, x0=1.0, x1=2.0, y0=1.0, y1=2.0),
    Domain3D(16, 12, 10),
    Domain3D(8, 8, 8, x0=1, x1=2, y0=1, y1=2, z0=1, z1=2),
]


@pytest.mark.parametrize("dom", DOMS, ids=lambda d: repr(d)[:30])
@pytest.mark.parametrize("dtype", [jnp.float64, jnp.float32])
def test_device_assembly_matches_host(dom, dtype):
    p = PoissonProblem.manufactured(dom)
    tol = 1e-14 if dtype == jnp.float64 else 1e-6
    h = np.asarray(p.rhs_field(dtype, device=False))
    d = np.asarray(p.rhs_field(dtype, device=True))
    scale = np.max(np.abs(h)) or 1.0
    assert np.max(np.abs(h - d)) / scale < tol
    hg = np.asarray(p.boundary_field(dtype, device=False))
    dg = np.asarray(p.boundary_field(dtype, device=True))
    assert np.max(np.abs(hg - dg)) <= tol * max(1.0, np.max(np.abs(hg)))
    hu = np.asarray(p.true_solution_field(dtype, device=False))
    du = np.asarray(p.true_solution_field(dtype, device=True))
    assert np.max(np.abs(hu - du)) <= tol * max(1.0, np.max(np.abs(hu)))


def test_device_assembly_custom_shape_falls_back_to_array_masks():
    dom = Domain2D(
        nx=32, ny=32, shape="custom",
        inside_fn=lambda ix, iy: (ix - 16) ** 2 + (iy - 16) ** 2 <= 15**2,
    )
    p = PoissonProblem.manufactured(dom)
    h = np.asarray(p.rhs_field(jnp.float64, device=False))
    d = np.asarray(p.rhs_field(jnp.float64, device=True))
    scale = np.max(np.abs(h)) or 1.0
    assert np.max(np.abs(h - d)) / scale < 1e-14


def test_unmasked_true_solution_device():
    dom = Domain2D(nx=32, ny=32)
    p = PoissonProblem.manufactured(dom)
    h = np.asarray(p.true_solution_field(jnp.float64, masked=False, device=False))
    d = np.asarray(p.true_solution_field(jnp.float64, masked=False, device=True))
    assert np.max(np.abs(h - d)) < 1e-13 * np.max(np.abs(h))
