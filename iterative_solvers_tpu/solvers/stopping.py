"""Stop criteria for iterative solvers.

Reproduces the reference's multi-criterion stopping semantics
(reference solver/msg_solver.hpp:9-15 StopCriterion enum;
solver/msg_solver.cpp:144-162 check order: precision, then residual, then
exact error, all on max-norms, each disabled when its eps <= 0) plus the
matrix-free solver's relative 2-norm criterion
(reference solver/matrix_free_system.cpp:409 ``‖r‖₂ > eps·‖r₀‖₂``) as one
configuration object.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from enum import IntEnum


class StopReason(IntEnum):
    """Why the solver stopped. Values/order match the reference enum
    (solver/msg_solver.hpp:9-15); RELATIVE_RESIDUAL is the matrix-free
    solver's criterion, appended."""

    ITERATIONS = 0
    PRECISION = 1
    RESIDUAL = 2
    EXACT_ERROR = 3
    INTERRUPTED = 4
    RELATIVE_RESIDUAL = 5
    DIVERGED = 6  # non-finite residual — failure detection (absent in reference)

    @property
    def converged(self) -> bool:
        """Reference semantics: only criterion-met stops count as converged
        (msg_solver.cpp:144-162 set converged=true; ITERATIONS and
        INTERRUPTED leave it false)."""
        return self in (
            StopReason.PRECISION,
            StopReason.RESIDUAL,
            StopReason.EXACT_ERROR,
            StopReason.RELATIVE_RESIDUAL,
        )

    def text(self) -> str:
        """Human-readable stop reason (English equivalents of the reference's
        Russian strings, solver/msg_solver.hpp:85-100)."""
        return {
            StopReason.ITERATIONS: "iteration limit reached",
            StopReason.PRECISION: "step precision ||x(n)-x(n-1)||_inf below eps",
            StopReason.RESIDUAL: "residual ||Ax-b||_inf below eps",
            StopReason.EXACT_ERROR: "exact error ||x-u||_inf below eps",
            StopReason.INTERRUPTED: "interrupted by user",
            StopReason.RELATIVE_RESIDUAL: "relative residual ||r||_2/||r0||_2 below eps",
            StopReason.DIVERGED: "diverged: residual became non-finite",
        }[self]


@dataclass(frozen=True)
class StopConfig:
    """Epsilons <= 0 disable a criterion (reference msg_solver.hpp:61-67).

    Defaults mirror DirichletSolver's: eps 1e-6 on precision + residual,
    exact-error off, 10000 iterations
    (reference solver/dirichlet_solver.cpp:14-16).
    """

    eps_precision: float = 1e-6
    eps_residual: float = 1e-6
    eps_exact_error: float = -1.0
    eps_relative: float = -1.0
    max_iterations: int = 10000

    def __post_init__(self) -> None:
        if self.max_iterations < 1:
            raise ValueError("max_iterations must be >= 1")

    @property
    def any_enabled(self) -> bool:
        return (
            self.eps_precision > 0
            or self.eps_residual > 0
            or self.eps_exact_error > 0
            or self.eps_relative > 0
        )

    def disable_all_but_iterations(self) -> "StopConfig":
        return replace(
            self,
            eps_precision=-1.0,
            eps_residual=-1.0,
            eps_exact_error=-1.0,
            eps_relative=-1.0,
        )
