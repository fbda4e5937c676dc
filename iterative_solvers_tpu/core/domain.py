"""Grid domains with node masks.

TPU-first representation: a field is a dense array over the FULL rectangular
node grid, shape ``(ny + 1, nx + 1)`` indexed ``[iy, ix]`` with
``x = x0 + ix*hx``, ``y = y0 + iy*hy``. Three disjoint boolean masks classify
every node:

- ``interior``  — unknowns of the linear system,
- ``boundary``  — Dirichlet nodes (values eliminated into the RHS),
- ``exterior``  — nodes outside the domain (e.g. the removed quadrant of the
  Г-shape); fields are identically zero there.

This replaces the reference's compacted unknown numbering
(reference solver/grid_system.cpp:84-111, which is also restricted to square
grids by the n/2-for-m/2 quirk at grid_system.cpp:103-106) with a layout that
XLA can tile, fuse, and shard. Conversions to/from the reference ordering live
in :mod:`iterative_solvers_tpu.core.ordering`.

Geometry of the Г (L-shaped) domain matches the reference exactly:

- excluded quadrant: ``ix < nx/2 and iy < ny/2``
  (reference solver/grid_system.cpp:86-89),
- left boundary in two segments: ``ix == 0`` for ``iy ∈ [ny/2, ny]`` and the
  re-entrant edge ``ix == nx/2`` for ``iy ∈ [0, ny/2]``
  (reference solver/grid_system.cpp:17-22),
- right ``ix == nx`` (:24-29), top ``iy == ny`` (:31-36),
- bottom in two segments: ``iy == 0`` for ``ix ∈ [nx/2, nx]`` and
  ``iy == ny/2`` for ``ix ∈ [0, nx/2]`` (:38-43).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import cached_property
from typing import Callable, Optional, Tuple

import numpy as np

MaskFn = Callable[[np.ndarray, np.ndarray], np.ndarray]
# Signature: (IX, IY) integer index grids -> bool array, True where the node
# is *inside or on the closure* of the domain (exterior = ~inside).


def _gamma_inside(nx: int, ny: int) -> MaskFn:
    """Closure of the Г-shape: full rectangle minus the open bottom-left quadrant."""

    def inside(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
        return ~((ix < nx // 2) & (iy < ny // 2))

    return inside


@dataclass(frozen=True)
class MaskSpec:
    """Closed-form recipe for a gamma/rect/box interior mask, evaluated
    IN-TRACE from ``lax.broadcasted_iota`` comparisons.

    Why this exists: a concrete ``(ny+1, nx+1)`` bool mask captured in a jit
    closure is embedded into the lowered program as a constant. At 8192² the
    multigrid hierarchy's masks plus the FMG payload added up to ~165 MB of
    HLO text, and *serializing those constants* — not XLA itself — dominated
    program build time on a single-core host (lower 291 s vs XLA compile
    40 s, NOTES_PERF.md 2026-08-19). A mask built from iota is a handful of
    fused compare instructions: zero constants, zero HBM traffic (it fuses
    into its consumer instead of being read from memory).

    ``shape`` is the canvas the mask is evaluated on — it may be LARGER than
    the logical ``(ny+1, nx+1)`` node grid (the Pallas operators' padded
    layouts); padding rows/cols are outside the strict inequalities, hence
    False, exactly matching a zero-padded host mask.

    ``kind``: ``'gamma'`` (reference Г-domain, grid_system.cpp:86-89),
    ``'rect'``, or ``'box'`` (3D). Custom domains have no closed form and
    keep their array masks.
    """

    kind: str  # 'gamma' | 'rect' | 'box'
    nx: int
    ny: int
    shape: Tuple[int, ...]  # canvas shape, >= logical node-grid shape
    nz: int = 0

    def build(self):
        """The interior (unknowns) mask as a traced bool array."""
        import jax.numpy as jnp
        from jax import lax

        if self.kind == "box":
            iz = lax.broadcasted_iota(jnp.int32, self.shape, 0)
            iy = lax.broadcasted_iota(jnp.int32, self.shape, 1)
            ix = lax.broadcasted_iota(jnp.int32, self.shape, 2)
            return (
                (0 < ix) & (ix < self.nx)
                & (0 < iy) & (iy < self.ny)
                & (0 < iz) & (iz < self.nz)
            )
        iy = lax.broadcasted_iota(jnp.int32, self.shape, 0)
        ix = lax.broadcasted_iota(jnp.int32, self.shape, 1)
        m = (0 < ix) & (ix < self.nx) & (0 < iy) & (iy < self.ny)
        if self.kind == "gamma":
            # The quadrant edge nodes (ix == nx/2 for iy <= ny/2 and
            # iy == ny/2 for ix <= nx/2) are Dirichlet boundary, not
            # unknowns — closed form of Domain2D.interior for the Г-shape.
            m = m & ~((ix <= self.nx // 2) & (iy <= self.ny // 2))
        return m

    def build_inside(self):
        """The domain-closure mask (interior + boundary) as a traced array."""
        import jax.numpy as jnp
        from jax import lax

        if self.kind == "box":
            return jnp.ones(self.shape, bool) if self.shape == (
                self.nz + 1, self.ny + 1, self.nx + 1
            ) else self._within_logical()
        if self.kind == "rect":
            return self._within_logical()
        iy = lax.broadcasted_iota(jnp.int32, self.shape, 0)
        ix = lax.broadcasted_iota(jnp.int32, self.shape, 1)
        return self._within_logical() & ~(
            (ix < self.nx // 2) & (iy < self.ny // 2)
        )

    def _within_logical(self):
        import jax.numpy as jnp
        from jax import lax

        logical = (
            (self.nz + 1, self.ny + 1, self.nx + 1)
            if self.kind == "box"
            else (self.ny + 1, self.nx + 1)
        )
        m = None
        for d, n1 in enumerate(logical):
            c = lax.broadcasted_iota(jnp.int32, self.shape, d) < n1
            m = c if m is None else (m & c)
        return m

    def build_host(self) -> np.ndarray:
        """:meth:`build` evaluated with numpy, for host-side consumers
        (nnz counts, golden tests) that shouldn't pay a device round-trip."""
        grids = np.ogrid[tuple(slice(0, s) for s in self.shape)]
        if self.kind == "box":
            iz, iy, ix = grids
            m = (
                (0 < ix) & (ix < self.nx)
                & (0 < iy) & (iy < self.ny)
                & (0 < iz) & (iz < self.nz)
            )
        else:
            iy, ix = grids
            m = (0 < ix) & (ix < self.nx) & (0 < iy) & (iy < self.ny)
            if self.kind == "gamma":
                m = m & ~((ix <= self.nx // 2) & (iy <= self.ny // 2))
        return np.broadcast_to(m, self.shape).copy()


@dataclass(frozen=True)
class Domain2D:
    """A 2D finite-difference node grid over ``[x0, x1] x [y0, y1]``.

    ``nx``/``ny`` are interval counts (reference's ``n``/``m``); the node grid
    has ``(nx+1) x (ny+1)`` nodes. ``shape`` selects the geometry:
    ``"gamma"`` (reference Г-domain), ``"rect"`` (full rectangle), or
    ``"custom"`` with an ``inside_fn``.
    """

    nx: int
    ny: int
    x0: float = 1.0
    x1: float = 2.0
    y0: float = 1.0
    y1: float = 2.0
    shape: str = "gamma"
    inside_fn: Optional[MaskFn] = None

    def __post_init__(self) -> None:
        if self.nx < 2 or self.ny < 2:
            raise ValueError(f"grid too small: nx={self.nx}, ny={self.ny}")
        if self.shape == "gamma" and (self.nx % 2 or self.ny % 2):
            raise ValueError("gamma domain requires even nx and ny")
        if self.shape not in ("gamma", "rect", "custom"):
            raise ValueError(f"unknown shape {self.shape!r}")
        if self.shape == "custom" and self.inside_fn is None:
            raise ValueError("shape='custom' requires inside_fn")

    # --- steps & coefficients (reference solver/grid_system.cpp:314-318) ---

    @property
    def hx(self) -> float:
        return (self.x1 - self.x0) / self.nx

    @property
    def hy(self) -> float:
        return (self.y1 - self.y0) / self.ny

    @property
    def coeff_diag(self) -> float:
        """Stencil diagonal A = -2(1/hx² + 1/hy²)."""
        return -2.0 * (1.0 / self.hx**2 + 1.0 / self.hy**2)

    @property
    def coeff_x(self) -> float:
        """x-neighbor coefficient x_k = 1/hx²."""
        return 1.0 / self.hx**2

    @property
    def coeff_y(self) -> float:
        """y-neighbor coefficient y_k = 1/hy²."""
        return 1.0 / self.hy**2

    @property
    def grid_shape(self) -> Tuple[int, int]:
        """Full node-grid shape ``(ny+1, nx+1)``."""
        return (self.ny + 1, self.nx + 1)

    # --- node coordinates -------------------------------------------------

    def coords(self, dtype=np.float64) -> Tuple[np.ndarray, np.ndarray]:
        """Full-grid coordinate arrays ``(X, Y)``, each ``(ny+1, nx+1)``."""
        x = self.x0 + np.arange(self.nx + 1, dtype=dtype) * np.asarray(self.hx, dtype)
        y = self.y0 + np.arange(self.ny + 1, dtype=dtype) * np.asarray(self.hy, dtype)
        return np.broadcast_to(x[None, :], self.grid_shape).copy(), np.broadcast_to(
            y[:, None], self.grid_shape
        ).copy()

    # --- masks --------------------------------------------------------------

    @cached_property
    def _index_grids(self) -> Tuple[np.ndarray, np.ndarray]:
        iy, ix = np.mgrid[0 : self.ny + 1, 0 : self.nx + 1]
        return ix, iy

    @cached_property
    def inside(self) -> np.ndarray:
        """Nodes inside or on the closure of the domain."""
        ix, iy = self._index_grids
        if self.shape == "rect":
            return np.ones(self.grid_shape, dtype=bool)
        if self.shape == "gamma":
            return _gamma_inside(self.nx, self.ny)(ix, iy)
        return np.asarray(self.inside_fn(ix, iy), dtype=bool)

    @cached_property
    def boundary(self) -> np.ndarray:
        """Dirichlet nodes: inside nodes on the rectangle edge, or adjacent
        (8-neighborhood) to an exterior node. The 8-neighborhood is what makes
        the re-entrant corner ``(nx/2, ny/2)`` a boundary node, reproducing the
        reference's segment predicates (grid_system.cpp:17-43) exactly on the
        Г-shape (where that corner belongs to both the ``x==n/2`` left segment
        and the ``y==m/2`` bottom segment)."""
        inside = self.inside
        ix, iy = self._index_grids
        on_edge = (ix == 0) | (ix == self.nx) | (iy == 0) | (iy == self.ny)
        ext = ~inside
        pad = np.pad(ext, 1, constant_values=False)
        has_ext_neighbor = np.zeros(self.grid_shape, dtype=bool)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                has_ext_neighbor |= pad[1 + dy : pad.shape[0] - 1 + dy,
                                        1 + dx : pad.shape[1] - 1 + dx]
        return inside & (on_edge | has_ext_neighbor)

    @cached_property
    def interior(self) -> np.ndarray:
        """Unknown nodes of the linear system."""
        return self.inside & ~self.boundary

    @cached_property
    def exterior(self) -> np.ndarray:
        return ~self.inside

    @property
    def num_unknowns(self) -> int:
        return int(self.interior.sum())

    # --- traced masks (see MaskSpec: no multi-MB jit constants) -------------

    @property
    def mask_spec(self) -> Optional[MaskSpec]:
        """Closed-form mask recipe, or None for shape='custom'."""
        if self.shape in ("gamma", "rect"):
            return MaskSpec(self.shape, self.nx, self.ny, self.grid_shape)
        return None

    def interior_traced(self):
        """``interior`` as a traced (jit-safe, constant-free) array; custom
        shapes fall back to embedding the host mask."""
        spec = self.mask_spec
        if spec is not None:
            return spec.build()
        import jax.numpy as jnp

        return jnp.asarray(self.interior)

    def boundary_traced(self):
        spec = self.mask_spec
        if spec is not None:
            return spec.build_inside() & ~spec.build()
        import jax.numpy as jnp

        return jnp.asarray(self.boundary)

    # --- convenience --------------------------------------------------------

    def with_resolution(self, nx: int, ny: int) -> "Domain2D":
        return dataclasses.replace(self, nx=nx, ny=ny)

    def __repr__(self) -> str:  # keep frozen-dataclass default short
        return (
            f"Domain2D(nx={self.nx}, ny={self.ny}, "
            f"[{self.x0},{self.x1}]x[{self.y0},{self.y1}], shape={self.shape!r}, "
            f"unknowns={self.num_unknowns})"
        )


@dataclass(frozen=True)
class Domain3D:
    """A 3D box node grid over ``[x0,x1]x[y0,y1]x[z0,z1]`` (7-point stencil).

    Extension beyond the reference (which is 2D only); needed for the
    512³ 7-point benchmark config in BASELINE.md.
    Fields have shape ``(nz+1, ny+1, nx+1)`` indexed ``[iz, iy, ix]``.
    """

    nx: int
    ny: int
    nz: int
    x0: float = 0.0
    x1: float = 1.0
    y0: float = 0.0
    y1: float = 1.0
    z0: float = 0.0
    z1: float = 1.0

    def __post_init__(self) -> None:
        if min(self.nx, self.ny, self.nz) < 2:
            raise ValueError("grid too small")

    @property
    def hx(self) -> float:
        return (self.x1 - self.x0) / self.nx

    @property
    def hy(self) -> float:
        return (self.y1 - self.y0) / self.ny

    @property
    def hz(self) -> float:
        return (self.z1 - self.z0) / self.nz

    @property
    def coeff_diag(self) -> float:
        return -2.0 * (1.0 / self.hx**2 + 1.0 / self.hy**2 + 1.0 / self.hz**2)

    @property
    def coeff_x(self) -> float:
        return 1.0 / self.hx**2

    @property
    def coeff_y(self) -> float:
        return 1.0 / self.hy**2

    @property
    def coeff_z(self) -> float:
        return 1.0 / self.hz**2

    @property
    def grid_shape(self) -> Tuple[int, int, int]:
        return (self.nz + 1, self.ny + 1, self.nx + 1)

    def coords(self, dtype=np.float64):
        x = self.x0 + np.arange(self.nx + 1, dtype=dtype) * np.asarray(self.hx, dtype)
        y = self.y0 + np.arange(self.ny + 1, dtype=dtype) * np.asarray(self.hy, dtype)
        z = self.z0 + np.arange(self.nz + 1, dtype=dtype) * np.asarray(self.hz, dtype)
        Z, Y, X = np.meshgrid(z, y, x, indexing="ij")
        return X, Y, Z

    @cached_property
    def interior(self) -> np.ndarray:
        m = np.zeros(self.grid_shape, dtype=bool)
        m[1:-1, 1:-1, 1:-1] = True
        return m

    @cached_property
    def boundary(self) -> np.ndarray:
        return ~self.interior

    @cached_property
    def exterior(self) -> np.ndarray:
        return np.zeros(self.grid_shape, dtype=bool)

    @property
    def num_unknowns(self) -> int:
        return (self.nx - 1) * (self.ny - 1) * (self.nz - 1)

    @property
    def mask_spec(self) -> MaskSpec:
        return MaskSpec("box", self.nx, self.ny, self.grid_shape, nz=self.nz)

    def interior_traced(self):
        return self.mask_spec.build()

    def boundary_traced(self):
        return self.mask_spec.build_inside() & ~self.mask_spec.build()
