"""Matrix-free masked stencil operators (the framework's primary operator).

The reference keeps a dormant matrix-free path (MatrixFreeSystem::apply,
reference solver/matrix_free_system.cpp:203-340 — per-node index arithmetic
with try/catch control flow, never even compiled into the build, cf.
solver/CMakeLists.txt:51-62). Here the matrix-free path is the *default*:
on the full rectangular grid the 5-point (2D) / 7-point (3D) operator is a
handful of shifted adds — pure VPU work that XLA fuses into a single
bandwidth-bound kernel, and that shards over a device mesh with nothing but
halo exchanges.

Masking semantics: the operator acts on interior nodes only. Contributions
from boundary neighbors are *excluded* (they were eliminated into the RHS at
assembly, reference solver/grid_system.cpp:45-67), so ``A @ x`` here equals
the reference's compacted CSR matrix applied to the packed vector — verified
entry-for-entry against the golden 16x16 system in tests.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from iterative_solvers_tpu.core.domain import Domain2D, Domain3D, MaskSpec


@partial(jax.jit, static_argnames=("cd", "cx", "cy"))
def stencil_apply(x: jnp.ndarray, interior: jnp.ndarray, cd: float, cx: float, cy: float) -> jnp.ndarray:
    """y = A @ x for the masked 5-point stencil on a full 2D grid.

    ``x``/result: (ny+1, nx+1); ``interior``: bool mask of unknowns.
    ``cd`` = -2(1/hx²+1/hy²), ``cx`` = 1/hx², ``cy`` = 1/hy²
    (reference solver/grid_system.cpp:314-318).
    """
    xm = jnp.where(interior, x, 0)
    p = jnp.pad(xm, 1)
    y = (
        cd * xm
        + cx * (p[1:-1, :-2] + p[1:-1, 2:])
        + cy * (p[:-2, 1:-1] + p[2:, 1:-1])
    )
    return jnp.where(interior, y, 0)


@partial(jax.jit, static_argnames=("cd", "cx", "cy", "cz"))
def stencil_apply_3d(x, interior, cd: float, cx: float, cy: float, cz: float):
    """y = A @ x for the masked 7-point stencil on a full 3D grid."""
    xm = jnp.where(interior, x, 0)
    p = jnp.pad(xm, 1)
    y = (
        cd * xm
        + cx * (p[1:-1, 1:-1, :-2] + p[1:-1, 1:-1, 2:])
        + cy * (p[1:-1, :-2, 1:-1] + p[1:-1, 2:, 1:-1])
        + cz * (p[:-2, 1:-1, 1:-1] + p[2:, 1:-1, 1:-1])
    )
    return jnp.where(interior, y, 0)


@dataclass(frozen=True, eq=False)
class StencilOperator:
    """Callable matrix-free operator ``y = A @ x`` over full-grid fields.

    TPU-native replacement for both the reference's explicit CSR GridSystem
    (solver/grid_system.cpp:157-274) and its MatrixFreeSystem
    (solver/matrix_free_system.cpp:203-340) — one object, zero stored matrix.
    """

    interior_arr: Optional[jnp.ndarray]  # bool, full grid shape (custom masks)
    coeffs: Tuple[float, ...]  # (cd, cx, cy[, cz])
    ndim: int = 2
    # Closed-form mask recipe (gamma/rect/box): the mask is rebuilt in-trace
    # from iota instead of being captured — a captured full-grid bool becomes
    # a multi-MB constant in every program that closes over this operator
    # (e.g. the device-IR ladder), and serializing those constants dominated
    # program build time at 8192² (NOTES_PERF.md 2026-08-19).
    mask_spec: Optional[MaskSpec] = None

    @staticmethod
    def from_domain(domain, dtype=None) -> "StencilOperator":
        spec = domain.mask_spec
        arr = None if spec is not None else jnp.asarray(domain.interior)
        if isinstance(domain, Domain3D):
            coeffs = (domain.coeff_diag, domain.coeff_x, domain.coeff_y, domain.coeff_z)
            return StencilOperator(arr, coeffs, ndim=3, mask_spec=spec)
        coeffs = (domain.coeff_diag, domain.coeff_x, domain.coeff_y)
        return StencilOperator(arr, coeffs, ndim=2, mask_spec=spec)

    @property
    def interior(self) -> jnp.ndarray:
        """Interior mask — traced (constant-free) when a closed form exists."""
        if self.interior_arr is not None:
            return self.interior_arr
        return self.mask_spec.build()

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.ndim == 3:
            return stencil_apply_3d(x, self.interior, *self.coeffs)
        return stencil_apply(x, self.interior, *self.coeffs)

    @property
    def shape(self):
        if self.interior_arr is not None:
            return self.interior_arr.shape
        return self.mask_spec.shape

    def mask(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.where(self.interior, x, 0)

    def diagonal(self) -> jnp.ndarray:
        """Full-grid field holding the operator diagonal on interior nodes
        (constant here, but kept as a field for preconditioner generality)."""
        return jnp.where(self.interior, self.coeffs[0], 0.0)

    def nnz(self) -> int:
        """Stored-matrix-equivalent nonzero count (diagonal + interior-interior
        neighbor links), i.e. the nnz of the reference's CSR assembly — used
        for the nnz/s throughput metric in BASELINE.md."""
        if self.interior_arr is not None:
            m = np.asarray(self.interior_arr)
        else:  # rebuild on host — no device round-trip for a pure count
            m = self.mask_spec.build_host()
        total = int(m.sum())  # diagonal entries
        for ax in range(m.ndim):
            sl_lo = [slice(None)] * m.ndim
            sl_hi = [slice(None)] * m.ndim
            sl_lo[ax] = slice(None, -1)
            sl_hi[ax] = slice(1, None)
            links = int((m[tuple(sl_lo)] & m[tuple(sl_hi)]).sum())
            total += 2 * links  # each link is two off-diagonal entries
        return total
