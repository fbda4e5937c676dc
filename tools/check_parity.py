"""Golden-value parity harness — the framework's counterpart of the
reference's NumPy checkers (reference check.py / check_debug.py, which replay
two MSG-CG iterations on the hard-coded 16x16 system of the 6x6 Г-grid and
write py_debug.txt for manual diffing).

This script does the same replay three ways and diffs them automatically:

1. the hard-coded golden 16x16 system, pure NumPy f64 (reference semantics,
   including the h0 = -b negative-definite direction convention of
   check.py:28-41);
2. this framework's matrix-free stencil operator + cg_solve on the 6x6
   Г-domain (full-grid masked fields, packed back to the compacted ordering);
3. this framework's explicit CSR path (native C++ assembly when available).

Exit code 0 iff all three agree to f64 round-off. Run:
    JAX_PLATFORMS=cpu python tools/check_parity.py
"""

from __future__ import annotations

import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)

import numpy as np


def golden_system():
    """The reference's 16x16 system (check_debug.py:13-39): the 6x6 Г-grid on
    [1,2]² — diag −144 = −2(36+36), off-diag 36 = 1/h², h = 1/6."""
    n = 16
    A = np.zeros((n, n))
    np.fill_diagonal(A, -144.0)
    links = [
        (0, 1), (0, 2), (1, 3), (2, 3), (2, 4), (3, 5), (4, 5), (4, 9),
        (5, 10), (6, 7), (6, 11), (7, 8), (7, 12), (8, 9), (8, 13), (9, 10),
        (9, 14), (10, 15), (11, 12), (12, 13), (13, 14), (14, 15),
    ]
    for i, j in links:
        A[i, j] = A[j, i] = 36.0
    b = np.array([
        -232.30388600, -746.04217916, -8.19479728, -232.07179336, -1.90842686,
        -138.98549422, -16.86945069, -15.74655606, -24.13616525, 22.22222222,
        -78.20643435, -3.41088194, 0.31859413, 1.13269176, 3.09816920,
        -60.31223634,
    ])
    return A, b


def numpy_msg_trace(A, b, iters=2):
    """Reference MSG recurrence in the check.py sign convention: x0 = 0,
    direction h0 = −b (negative-definite A), alpha = −(r·h)/((Ah)·h)."""
    x = np.zeros_like(b)
    r = -b  # r = Ax - b at x=0
    h = -b.copy()
    xs = []
    for _ in range(iters):
        Ah = A @ h
        alpha = -(r @ h) / (Ah @ h)
        x = x + alpha * h
        r = r + alpha * Ah
        beta = (Ah @ r) / (Ah @ h)
        h = -r + beta * h
        xs.append(x.copy())
    return xs


def framework_trace(operator: str, iters=2):
    import jax.numpy as jnp

    from iterative_solvers_tpu.core import ordering
    from iterative_solvers_tpu.core.domain import Domain2D
    from iterative_solvers_tpu.ops.sparse import SparseOperator
    from iterative_solvers_tpu.ops.stencil import StencilOperator
    from iterative_solvers_tpu.solvers.cg import CGOptions, cg_solve
    from iterative_solvers_tpu.solvers.stopping import StopConfig

    _, b_ref = golden_system()
    dom = Domain2D(nx=6, ny=6)
    xs = []
    for k in range(1, iters + 1):
        opts = CGOptions(stop=StopConfig(max_iterations=k).disable_all_but_iterations())
        if operator == "stencil":
            op = StencilOperator.from_domain(dom)
            b = ordering.unpack(jnp.asarray(b_ref), dom)
            res = cg_solve(op, b, options=opts)
            xs.append(np.asarray(ordering.pack(res.x, dom)))
        else:
            op = SparseOperator.from_domain(dom)
            res = cg_solve(op, jnp.asarray(b_ref), options=opts)
            xs.append(np.asarray(res.x))
    return xs


def main() -> int:
    A, b = golden_system()
    ref = numpy_msg_trace(A, b)
    print("reference NumPy MSG trace (check.py convention):")
    print(f"  x1[:4] = {ref[0][:4]}")
    print(f"  x2[:4] = {ref[1][:4]}")

    ok = True
    for operator in ("stencil", "sparse"):
        xs = framework_trace(operator)
        for k, (x_fw, x_np) in enumerate(zip(xs, ref), 1):
            dev = float(np.max(np.abs(x_fw - x_np)))
            status = "OK" if dev < 1e-11 else "MISMATCH"
            ok &= dev < 1e-11
            print(f"  {operator:>8} iteration {k}: max|Δx| = {dev:.3e}  {status}")

    from iterative_solvers_tpu.native.loader import available

    print(f"native C++ assembly engine: {'active' if available() else 'NumPy fallback'}")
    print("PARITY OK" if ok else "PARITY FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
