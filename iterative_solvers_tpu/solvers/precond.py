"""Preconditioners for CG (extension beyond the reference, per BASELINE.md
config "Jacobi/Chebyshev-preconditioned CG").

All preconditioners are hashable callables (usable as jit statics) mapping a
residual field to a preconditioned field, matrix-free:

- **Jacobi**: ``z = r / diag(A)``. For this constant-coefficient Laplacian the
  diagonal is constant, so Jacobi is an exact scalar scaling — it leaves the
  CG iterate sequence unchanged (a useful invariance test) but matters for
  generality (variable-coefficient operators).
- **Chebyshev(m)**: ``z = p_m(A) r`` where ``p_m`` is the degree-m Chebyshev
  approximation of ``1/λ`` on a spectral interval ``[lam_lo, lam_hi]``
  (both negative here — the assembled operator is the negative-definite
  discrete Laplacian, SURVEY §0). Spectral bounds come from Gershgorin
  (most-negative: ``2·diag``) and domain-monotonicity of Dirichlet
  eigenvalues (closest-to-zero: the enclosing rectangle's fundamental mode
  ``−π²(1/Lx² + 1/Ly²)``). Each PCG iteration then costs m+1 operator
  applies but converges ~m× faster in iterations — fewer global reductions
  and host syncs, which is the win on a TPU mesh.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from iterative_solvers_tpu.core.domain import Domain2D, Domain3D


@dataclass(frozen=True, eq=False)
class JacobiPreconditioner:
    A: Callable
    inv_diag: float  # constant-diagonal fast path

    @staticmethod
    def from_operator(A, domain=None) -> "JacobiPreconditioner":
        return JacobiPreconditioner(A, 1.0 / domain.coeff_diag if domain is not None else None)

    def __call__(self, r):
        if self.inv_diag is not None:
            return r * self.inv_diag
        d = self.A.diagonal()
        return jnp.where(d != 0, r / jnp.where(d != 0, d, 1.0), 0.0)


def spectral_bounds(domain) -> Tuple[float, float]:
    """Safe enclosing interval [lam_lo, lam_hi] (negative) for the assembled
    operator's spectrum.

    lam_lo: Gershgorin (2·diag). lam_hi: the continuous fundamental Dirichlet
    eigenvalue of the domain (a magnitude *lower* bound on every discrete
    eigenvalue, so the interval always encloses the spectrum): the enclosing
    box's ``π²·Σ 1/L²`` in general; for the square Г-shape the L-shaped
    domain's known fundamental eigenvalue 9.6397/(L/2)² (×0.98 safety) — about
    1.95× tighter, which matters directly for Chebyshev effectiveness."""
    lam_lo = 2.0 * domain.coeff_diag  # Gershgorin
    if isinstance(domain, Domain3D):
        lx = domain.x1 - domain.x0
        ly = domain.y1 - domain.y0
        lz = domain.z1 - domain.z0
        lam_hi = -(math.pi**2) * (1 / lx**2 + 1 / ly**2 + 1 / lz**2)
        return lam_lo, lam_hi
    lx = domain.x1 - domain.x0
    ly = domain.y1 - domain.y0
    if getattr(domain, "shape", "rect") == "gamma" and abs(lx - ly) < 1e-12:
        # L-shape of three (L/2)-squares: lambda_1 ≈ 9.6397 on the unit-half-
        # width L-shape, scaled by 1/(L/2)².
        lam_hi = -0.98 * 9.6397 / (lx / 2.0) ** 2
    else:
        lam_hi = -(math.pi**2) * (1 / lx**2 + 1 / ly**2)
    return lam_lo, lam_hi


@dataclass(frozen=True, eq=False)
class ChebyshevPreconditioner:
    """z = p_m(A) r via m steps of Chebyshev iteration on ``A z = r`` from
    z = 0 (a fixed polynomial in A, hence symmetric — valid for PCG)."""

    A: Callable
    lam_lo: float
    lam_hi: float
    degree: int = 4

    @staticmethod
    def from_domain(A, domain, degree: int = 4) -> "ChebyshevPreconditioner":
        lo, hi = spectral_bounds(domain)
        return ChebyshevPreconditioner(A, lo, hi, degree)

    def __call__(self, r):
        theta = 0.5 * (self.lam_hi + self.lam_lo)  # interval center
        delta = 0.5 * (self.lam_hi - self.lam_lo)  # half-width
        sigma1 = theta / delta

        z = r / theta
        d = z
        rho_prev = 1.0 / sigma1
        # Fixed degree -> unrolled at trace time; each step is one fused
        # stencil apply + axpys.
        for _ in range(self.degree):
            rho = 1.0 / (2.0 * sigma1 - rho_prev)
            resid = r - self.A(z)
            d = (rho * rho_prev) * d + (2.0 * rho / delta) * resid
            z = z + d
            rho_prev = rho
        return z


def parse_preconditioner(name: str) -> Tuple[str, int]:
    """Validate a preconditioner spec string and return (kind, param).

    kind ∈ {'jacobi', 'chebyshev', 'mg'}; param is the degree (chebyshev) or
    nu (mg), 0 meaning default. Raises ValueError on anything malformed so the
    facade can reject bad configs at construction time."""
    base, _, arg = name.partition(":")
    try:
        param = int(arg) if arg else 0
    except ValueError:
        raise ValueError(f"non-integer parameter in preconditioner spec {name!r}")
    if param < 0:
        raise ValueError(f"negative parameter in preconditioner spec {name!r}")
    if base in ("jacobi", "diag"):
        if arg:
            raise ValueError(f"'jacobi' takes no parameter (got {name!r})")
        return "jacobi", 0
    if base == "chebyshev":
        return "chebyshev", param
    if base in ("mg", "multigrid"):
        return "mg", param
    raise ValueError(
        f"unknown preconditioner {name!r} (use 'jacobi', 'chebyshev[:m]' or 'mg[:nu]')"
    )


def make_preconditioner(name: str, A, domain, **kwargs):
    """Dispatcher used by the DirichletSolver facade."""
    kind, param = parse_preconditioner(name)
    if kind == "jacobi":
        return JacobiPreconditioner.from_operator(A, domain)
    if kind == "chebyshev":
        degree = kwargs.get("degree") or param
        return ChebyshevPreconditioner.from_domain(A, domain, degree or 4)
    from iterative_solvers_tpu.solvers.multigrid import MultigridPreconditioner

    nu = kwargs.get("nu") or param or 1
    return MultigridPreconditioner.from_domain(domain, nu_pre=nu, nu_post=nu)
