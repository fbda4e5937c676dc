"""Native (C++) runtime components, loaded via ctypes.

The library is compiled on first use with the system toolchain and cached
next to the source; every entry point has a pure-NumPy fallback so the
framework works without a compiler. See assembly.cpp for the CSR engine."""

from iterative_solvers_tpu.native.loader import (
    available,
    assemble_csr_native,
    node_coords_native,
    num_unknowns_native,
)

__all__ = [
    "available",
    "assemble_csr_native",
    "node_coords_native",
    "num_unknowns_native",
]
