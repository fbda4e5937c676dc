"""Poisson problem definition and RHS assembly (full-grid, masked).

The linear system is the discrete Laplacian itself: ``A u = f`` with Dirichlet
values eliminated into the RHS — NOT ``-Δu = -f``. The assembled operator is
therefore symmetric *negative*-definite, matching the reference
(diag ``-2(1/hx²+1/hy²)``, off-diag ``+1/h²``; reference
solver/grid_system.cpp:314-318) and its CG sign conventions
(reference check.py:28-41).

BC elimination (reference solver/grid_system.cpp:45-67): for an interior node
whose neighbor lies on the Dirichlet boundary,
``rhs -= coeff * g(neighbor)``. On the full grid this is a single fused
expression: shift the boundary-masked Dirichlet field in the four stencil
directions.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass, field
from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from iterative_solvers_tpu.core.domain import Domain2D, Domain3D

# Assemble on the accelerator once the grid is this big: at 8192² the host
# path is a full-grid f64 transcendental sweep on one core (measured
# 55-200 s on this VM, load-dependent) plus a ~0.5 GB tunnel transfer; the
# same assembly is a handful of bandwidth-bound element-wise programs on
# device. TPU f64 is float-float (~49-bit) — relative error ~1e-14, eight
# decades below the 1e-6 solve criterion (NOTES_PERF.md 2026-08-19).
_DEVICE_ASSEMBLY_MIN_NODES = 1 << 22


def _coords_traced(dom, cdtype):
    """Full-grid coordinate arrays built in-trace from iota/arange (no host
    meshgrid, no HLO constants)."""
    if isinstance(dom, Domain3D):
        x = dom.x0 + jnp.arange(dom.nx + 1, dtype=cdtype) * jnp.asarray(dom.hx, cdtype)
        y = dom.y0 + jnp.arange(dom.ny + 1, dtype=cdtype) * jnp.asarray(dom.hy, cdtype)
        z = dom.z0 + jnp.arange(dom.nz + 1, dtype=cdtype) * jnp.asarray(dom.hz, cdtype)
        shape = dom.grid_shape
        return (
            jnp.broadcast_to(x[None, None, :], shape),
            jnp.broadcast_to(y[None, :, None], shape),
            jnp.broadcast_to(z[:, None, None], shape),
        )
    x = dom.x0 + jnp.arange(dom.nx + 1, dtype=cdtype) * jnp.asarray(dom.hx, cdtype)
    y = dom.y0 + jnp.arange(dom.ny + 1, dtype=cdtype) * jnp.asarray(dom.hy, cdtype)
    shape = dom.grid_shape
    return (
        jnp.broadcast_to(x[None, :], shape),
        jnp.broadcast_to(y[:, None], shape),
    )

ScalarField2D = Callable[[np.ndarray, np.ndarray], np.ndarray]
ScalarField3D = Callable[[np.ndarray, np.ndarray, np.ndarray], np.ndarray]

Domain = Union[Domain2D, Domain3D]


def _reference_f(x, y):
    """Manufactured source f = 4(x²+y²)·exp(x²−y²) (reference grid_system.cpp:8-10)."""
    xp = jnp if isinstance(x, jnp.ndarray) else np
    return 4.0 * (x * x + y * y) * xp.exp(x * x - y * y)


def _reference_u(x, y):
    """Manufactured exact solution u = exp(x²−y²) (reference grid_system.cpp:12-15)."""
    xp = jnp if isinstance(x, jnp.ndarray) else np
    return xp.exp(x * x - y * y)


def _reference_f3(x, y, z):
    """3D manufactured source for u = exp(xyz): Δu = ((yz)²+(xz)²+(xy)²)·u.

    Deliberately NOT an eigenfunction of the discrete Laplacian (a sin-product
    would make CG converge in one iteration — a trivial Krylov space that
    masks solver bugs) and has nonzero Dirichlet data, exercising BC
    elimination."""
    u = _reference_u3(x, y, z)
    return ((y * z) ** 2 + (x * z) ** 2 + (x * y) ** 2) * u


def _reference_u3(x, y, z):
    xp = jnp if isinstance(x, jnp.ndarray) else np
    return xp.exp(x * y * z)


@dataclass(frozen=True)
class PoissonProblem:
    """``Δu = f`` on ``domain`` with Dirichlet data ``g`` on the boundary.

    ``u_exact`` (optional) enables the exact-error stop criterion and error
    reporting, mirroring the reference's manufactured-solution machinery
    (reference solver/grid_system.cpp:276-299).
    """

    domain: Domain
    f: Callable = _reference_f
    g: Optional[Callable] = None  # defaults to u_exact (manufactured BC)
    u_exact: Optional[Callable] = _reference_u

    @staticmethod
    def manufactured(domain: Domain) -> "PoissonProblem":
        """The reference's canonical problem: u = exp(x²−y²) on the Г-domain
        (2D); in 3D (an extension — the reference is 2D-only) u = exp(xyz) on
        a box, chosen deliberately non-eigen with nonzero Dirichlet data (see
        :func:`_reference_f3`)."""
        if isinstance(domain, Domain3D):
            return PoissonProblem(domain, f=_reference_f3, u_exact=_reference_u3)
        return PoissonProblem(domain)

    @property
    def dirichlet(self) -> Callable:
        if self.g is not None:
            return self.g
        if self.u_exact is None:
            raise ValueError("no Dirichlet data: provide g or u_exact")
        return self.u_exact

    # --- assembly -----------------------------------------------------------

    def _use_device(self, device: Optional[bool]) -> bool:
        if device is not None:
            return device
        return (
            jax.default_backend() != "cpu"
            and int(np.prod(self.domain.grid_shape)) >= _DEVICE_ASSEMBLY_MIN_NODES
        )

    def rhs_field_traced(self, dtype=None) -> jnp.ndarray:
        """RHS assembled with jnp ops and in-trace masks/coords — safe inside
        jit with no full-grid constants and no host sweep. The FMG payload
        evaluates this per level inside the rung programs; ``rhs_field``
        routes large grids here on accelerators (``device=True`` path)."""
        dom = self.domain
        dtype = dtype or _default_dtype()
        cdtype = jax.dtypes.canonicalize_dtype(np.float64)
        coords = _coords_traced(dom, cdtype)
        F = jnp.asarray(self.f(*coords), cdtype)
        G = jnp.where(
            dom.boundary_traced(), jnp.asarray(self.dirichlet(*coords), cdtype), 0.0
        )
        pad = jnp.pad(G, 1)
        nd = G.ndim
        axis_coeffs = (
            (dom.coeff_z, dom.coeff_y, dom.coeff_x)
            if nd == 3
            else (dom.coeff_y, dom.coeff_x)
        )
        rhs = F
        for ax, c in enumerate(axis_coeffs):
            lo = tuple(slice(0, -2) if a == ax else slice(1, -1) for a in range(nd))
            hi = tuple(slice(2, None) if a == ax else slice(1, -1) for a in range(nd))
            rhs = rhs - c * (pad[lo] + pad[hi])
        return jnp.where(dom.interior_traced(), rhs, 0.0).astype(dtype)

    def rhs_field(self, dtype=None, device: Optional[bool] = None) -> jnp.ndarray:
        """Full-grid RHS with BC eliminated, zero outside the interior mask.

        Equivalent to the reference's per-node ``calculate_value``
        (solver/grid_system.cpp:45-67) vectorized over the whole grid.
        ``device`` (default: auto) assembles on the accelerator for large
        grids — see ``_DEVICE_ASSEMBLY_MIN_NODES``.
        """
        dom = self.domain
        dtype = dtype or _default_dtype()
        if self._use_device(device):
            # one jitted program (eager jnp would compile ~15 one-op programs,
            # each a tunnel round-trip)
            return _assemble_jit(self, "rhs", dtype)
        if isinstance(dom, Domain3D):
            return self._rhs_field_3d(dtype)
        X, Y = dom.coords(np.float64)
        F = np.asarray(self.f(X, Y), dtype=np.float64)
        G = np.where(dom.boundary, np.asarray(self.dirichlet(X, Y), np.float64), 0.0)
        pad = np.pad(G, 1)
        rhs = (
            F
            - dom.coeff_x * (pad[1:-1, :-2] + pad[1:-1, 2:])
            - dom.coeff_y * (pad[:-2, 1:-1] + pad[2:, 1:-1])
        )
        rhs = np.where(dom.interior, rhs, 0.0)
        return jnp.asarray(rhs, dtype=dtype)

    def _rhs_field_3d(self, dtype) -> jnp.ndarray:
        dom = self.domain
        X, Y, Z = dom.coords(np.float64)
        F = np.asarray(self.f(X, Y, Z), dtype=np.float64)
        G = np.where(dom.boundary, np.asarray(self.dirichlet(X, Y, Z), np.float64), 0.0)
        pad = np.pad(G, 1)
        rhs = (
            F
            - dom.coeff_x * (pad[1:-1, 1:-1, :-2] + pad[1:-1, 1:-1, 2:])
            - dom.coeff_y * (pad[1:-1, :-2, 1:-1] + pad[1:-1, 2:, 1:-1])
            - dom.coeff_z * (pad[:-2, 1:-1, 1:-1] + pad[2:, 1:-1, 1:-1])
        )
        rhs = np.where(dom.interior, rhs, 0.0)
        return jnp.asarray(rhs, dtype=dtype)

    def true_solution_field(
        self, dtype=None, masked: bool = True, device: Optional[bool] = None
    ) -> jnp.ndarray:
        """u_exact sampled on the grid; interior-masked by default so it is
        directly comparable with solver iterates (which are zero off-interior).

        Reference analogue: ``get_true_solution_vector``
        (solver/grid_system.cpp:276-299).
        """
        if self.u_exact is None:
            raise ValueError("problem has no exact solution")
        dom = self.domain
        dtype = dtype or _default_dtype()
        if self._use_device(device):
            return _assemble_jit(self, "u_masked" if masked else "u", dtype)
        coords = dom.coords(np.float64)
        U = np.asarray(self.u_exact(*coords), dtype=np.float64)
        if masked:
            U = np.where(dom.interior, U, 0.0)
        return jnp.asarray(U, dtype=dtype)

    def boundary_field_traced(self, dtype=None) -> jnp.ndarray:
        """Dirichlet boundary data assembled in-trace (see rhs_field_traced)."""
        dom = self.domain
        dtype = dtype or _default_dtype()
        cdtype = jax.dtypes.canonicalize_dtype(np.float64)
        coords = _coords_traced(dom, cdtype)
        G = jnp.where(
            dom.boundary_traced(), jnp.asarray(self.dirichlet(*coords), cdtype), 0.0
        )
        return G.astype(dtype)

    def boundary_field(self, dtype=None, device: Optional[bool] = None) -> jnp.ndarray:
        """Dirichlet data on boundary nodes, zero elsewhere (for plotting and
        for reconstructing the full solution surface)."""
        dom = self.domain
        dtype = dtype or _default_dtype()
        if self._use_device(device):
            return _assemble_jit(self, "g", dtype)
        coords = dom.coords(np.float64)
        G = np.where(
            dom.boundary, np.asarray(self.dirichlet(*coords), np.float64), 0.0
        )
        return jnp.asarray(G, dtype=dtype)


def _default_dtype():
    """float64 when jax x64 is enabled, else float32."""
    return jnp.asarray(0.0).dtype


def _assemble_jit(problem, which: str, dtype):
    """Device assembly as ONE compiled program per (problem, which, dtype)."""
    return _assemble_dispatch(problem, which, np.dtype(dtype).name)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _assemble_dispatch(problem, which: str, dtype_name: str):
    dtype = jnp.dtype(dtype_name)
    if which == "rhs":
        return problem.rhs_field_traced(dtype)
    if which == "g":
        return problem.boundary_field_traced(dtype)
    dom = problem.domain
    cdtype = jax.dtypes.canonicalize_dtype(np.float64)
    U = jnp.asarray(problem.u_exact(*_coords_traced(dom, cdtype)), cdtype)
    if which == "u_masked":
        U = jnp.where(dom.interior_traced(), U, 0.0)
    return U.astype(dtype)
