"""Build-on-demand ctypes loader for the native assembly engine.

Compiles ``assembly.cpp`` with the system C++ compiler into a shared library
cached alongside the package (rebuilt when the source changes, detected by
mtime+size key). No pybind11 dependency — plain C ABI + ctypes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "assembly.cpp")
_SRC_TEXTIO = os.path.join(_HERE, "textio.cpp")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False

_SHAPE_CODES = {"rect": 0, "gamma": 1}


def _cache_path(src: str = _SRC) -> str:
    st = os.stat(src)
    base = os.path.splitext(os.path.basename(src))[0]
    key = f"{int(st.st_mtime)}_{st.st_size}"
    cache_dir = os.environ.get(
        "ISTPU_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "iterative_solvers_tpu"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    return os.path.join(cache_dir, f"lib{base}_{key}.so")


def _build(so_path: str, src: str = _SRC) -> None:
    cxx = os.environ.get("CXX", "g++")
    cmd = [cxx, "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", so_path + ".tmp"]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    os.replace(so_path + ".tmp", so_path)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            so = _cache_path()
            if not os.path.exists(so):
                _build(so)
            lib = ctypes.CDLL(so)
            i64 = ctypes.c_int64
            i32 = ctypes.c_int
            f64 = ctypes.c_double
            pi64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
            pf64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
            lib.ist_num_unknowns.restype = i64
            lib.ist_num_unknowns.argtypes = [i32, i32, i32]
            lib.ist_ranks.restype = None
            lib.ist_ranks.argtypes = [i32, i32, i32, pi64]
            lib.ist_assemble_csr.restype = i64
            lib.ist_assemble_csr.argtypes = [i32, i32, i32, f64, f64, f64, i64, pi64, pi64, pf64]
            lib.ist_assemble_csr3d.restype = i64
            lib.ist_assemble_csr3d.argtypes = [
                i32, i32, i32, f64, f64, f64, f64, i64, pi64, pi64, pf64
            ]
            lib.ist_node_coords.restype = None
            lib.ist_node_coords.argtypes = [i32, i32, i32, f64, f64, f64, f64, pf64, pf64]
            _lib = lib
        except Exception as e:  # no compiler / build error: fall back silently
            print(f"iterative_solvers_tpu: native assembly unavailable ({e}); "
                  "using NumPy fallback", file=sys.stderr)
            _load_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def _shape_code(domain) -> Optional[int]:
    return _SHAPE_CODES.get(getattr(domain, "shape", None))


def num_unknowns_native(domain) -> Optional[int]:
    lib = _load()
    code = _shape_code(domain)
    if lib is None or code is None:
        return None
    return int(lib.ist_num_unknowns(domain.nx, domain.ny, code))


def assemble_csr_native(domain) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """(row_map, entries, values) or None when unsupported (custom masks,
    no compiler). 3D box domains route to the 7-point engine."""
    lib = _load()
    if lib is None or not hasattr(domain, "nx"):
        return None
    if hasattr(domain, "nz"):
        n = (domain.nx - 1) * (domain.ny - 1) * (domain.nz - 1)
        cap = 7 * n
        row_map = np.zeros(n + 1, dtype=np.int64)
        entries = np.zeros(cap, dtype=np.int64)
        values = np.zeros(cap, dtype=np.float64)
        nnz = int(
            lib.ist_assemble_csr3d(
                domain.nx, domain.ny, domain.nz,
                float(domain.coeff_diag), float(domain.coeff_x),
                float(domain.coeff_y), float(domain.coeff_z),
                cap, row_map, entries, values,
            )
        )
        if nnz < 0:
            return None
        return row_map, entries[:nnz], values[:nnz]
    code = _shape_code(domain)
    if code is None:
        return None
    n = int(lib.ist_num_unknowns(domain.nx, domain.ny, code))
    cap = 5 * n
    row_map = np.zeros(n + 1, dtype=np.int64)
    entries = np.zeros(cap, dtype=np.int64)
    values = np.zeros(cap, dtype=np.float64)
    nnz = int(
        lib.ist_assemble_csr(
            domain.nx,
            domain.ny,
            code,
            float(domain.coeff_diag),
            float(domain.coeff_x),
            float(domain.coeff_y),
            cap,
            row_map,
            entries,
            values,
        )
    )
    if nnz < 0:
        return None
    return row_map, entries[:nnz], values[:nnz]


def node_coords_native(domain) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = _load()
    code = _shape_code(domain)
    if lib is None or code is None or hasattr(domain, "nz"):
        return None
    n = int(lib.ist_num_unknowns(domain.nx, domain.ny, code))
    xs = np.zeros(n, dtype=np.float64)
    ys = np.zeros(n, dtype=np.float64)
    lib.ist_node_coords(
        domain.nx, domain.ny, code,
        float(domain.x0), float(domain.x1), float(domain.y0), float(domain.y1),
        xs, ys,
    )
    return xs, ys


# --- bulk text IO engine (textio.cpp) ----------------------------------------

_textio_lock = threading.Lock()
_textio_lib: Optional[ctypes.CDLL] = None
_textio_failed = False


def _load_textio() -> Optional[ctypes.CDLL]:
    global _textio_lib, _textio_failed
    if _textio_lib is not None or _textio_failed:
        return _textio_lib
    with _textio_lock:
        if _textio_lib is not None or _textio_failed:
            return _textio_lib
        try:
            so = _cache_path(_SRC_TEXTIO)
            if not os.path.exists(so):
                _build(so, _SRC_TEXTIO)
            lib = ctypes.CDLL(so)
            i64 = ctypes.c_int64
            pf64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
            pc = ctypes.c_char_p
            lib.ist_format_doubles.restype = i64
            lib.ist_format_doubles.argtypes = [pf64, i64, ctypes.c_void_p, i64]
            lib.ist_format_xyz.restype = i64
            lib.ist_format_xyz.argtypes = [pf64, pf64, pf64, i64, ctypes.c_void_p, i64]
            lib.ist_parse_doubles.restype = i64
            lib.ist_parse_doubles.argtypes = [
                pc, i64, pf64, i64, ctypes.POINTER(i64)
            ]
            _textio_lib = lib
        except Exception as e:
            print(f"iterative_solvers_tpu: native textio unavailable ({e}); "
                  "using NumPy fallback", file=sys.stderr)
            _textio_failed = True
    return _textio_lib


def format_doubles(values: np.ndarray) -> Optional[bytes]:
    """One '%.17e\\n' line per value, or None when the engine is unavailable."""
    lib = _load_textio()
    if lib is None:
        return None
    v = np.ascontiguousarray(np.asarray(values, dtype=np.float64).ravel())
    cap = 32 * max(len(v), 1)
    buf = ctypes.create_string_buffer(cap)
    n = int(lib.ist_format_doubles(v, len(v), buf, cap))
    if n < 0:
        return None
    return buf.raw[:n]


def format_xyz(x: np.ndarray, y: np.ndarray, z: np.ndarray) -> Optional[bytes]:
    lib = _load_textio()
    if lib is None:
        return None
    xs = np.ascontiguousarray(np.asarray(x, np.float64).ravel())
    ys = np.ascontiguousarray(np.asarray(y, np.float64).ravel())
    zs = np.ascontiguousarray(np.asarray(z, np.float64).ravel())
    n = min(len(xs), len(ys), len(zs))
    cap = 96 * max(n, 1)
    buf = ctypes.create_string_buffer(cap)
    w = int(lib.ist_format_xyz(xs, ys, zs, n, buf, cap))
    if w < 0:
        return None
    return buf.raw[:w]


def parse_doubles(text: bytes, cap: int) -> Optional[Tuple[np.ndarray, int]]:
    """(values, bytes_consumed) parsed from the head of ``text`` — stops at
    the first non-numeric token. None when the engine is unavailable."""
    lib = _load_textio()
    if lib is None:
        return None
    out = np.zeros(max(cap, 1), dtype=np.float64)
    consumed = ctypes.c_int64(0)
    n = int(lib.ist_parse_doubles(text, len(text), out, cap, ctypes.byref(consumed)))
    return out[:n], int(consumed.value)
