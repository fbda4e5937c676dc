"""Assembly parity: our operators must reproduce the reference's golden
16x16 system (reference check.py:2-26) and agree with each other."""

import jax.numpy as jnp
import numpy as np
import pytest

from iterative_solvers_tpu.core.domain import Domain2D, Domain3D
from iterative_solvers_tpu.core.problem import PoissonProblem
from iterative_solvers_tpu.core import ordering
from iterative_solvers_tpu.ops.sparse import (
    SparseOperator,
    assemble_csr,
    assemble_dense,
)
from iterative_solvers_tpu.ops.stencil import StencilOperator


@pytest.fixture
def dom6():
    return Domain2D(nx=6, ny=6)  # [1,2]² by default


def test_dense_assembly_matches_golden(dom6, golden_16x16):
    A_ref, _ = golden_16x16
    A = assemble_dense(dom6)
    np.testing.assert_allclose(A, A_ref, atol=1e-12)


def test_rhs_matches_golden(dom6, golden_16x16):
    _, b_ref = golden_16x16
    prob = PoissonProblem.manufactured(dom6)
    b = np.asarray(ordering.pack(prob.rhs_field(), dom6))
    # golden b printed to 8 decimals in the reference harness
    np.testing.assert_allclose(b, b_ref, atol=1e-7)


def test_stencil_equals_dense(dom6, golden_16x16):
    A_ref, _ = golden_16x16
    op = StencilOperator.from_domain(dom6)
    rng = np.random.default_rng(1)
    for _ in range(3):
        xc = rng.standard_normal(16)
        field = ordering.unpack(jnp.asarray(xc), dom6)
        y = np.asarray(ordering.pack(op(field), dom6))
        np.testing.assert_allclose(y, A_ref @ xc, rtol=1e-12, atol=1e-9)


def test_sparse_equals_dense(dom6, golden_16x16):
    A_ref, _ = golden_16x16
    op = SparseOperator.from_domain(dom6)
    assert op.nnz() == np.count_nonzero(A_ref)
    rng = np.random.default_rng(2)
    xc = rng.standard_normal(16)
    y = np.asarray(op(jnp.asarray(xc)))
    np.testing.assert_allclose(y, A_ref @ xc, rtol=1e-12, atol=1e-9)


def test_csr_structure(dom6, golden_16x16):
    A_ref, _ = golden_16x16
    row_map, entries, values = assemble_csr(dom6)
    assert row_map[0] == 0 and row_map[-1] == len(entries) == len(values)
    A = np.zeros((16, 16))
    for i in range(16):
        for k in range(row_map[i], row_map[i + 1]):
            A[i, entries[k]] = values[k]
    np.testing.assert_allclose(A, A_ref, atol=1e-12)


def test_stencil_nnz_matches_csr(dom6):
    op = StencilOperator.from_domain(dom6)
    _, entries, _ = assemble_csr(dom6)
    assert op.nnz() == len(entries)


@pytest.mark.parametrize("kind", ["stencil", "sparse"])
def test_operator_is_symmetric(kind, dom6):
    """The system matrix is symmetric (negative-definite)."""
    if kind == "stencil":
        op = StencilOperator.from_domain(dom6)
        apply = lambda v: np.asarray(
            ordering.pack(op(ordering.unpack(jnp.asarray(v), dom6)), dom6)
        )
    else:
        op = SparseOperator.from_domain(dom6)
        apply = lambda v: np.asarray(op(jnp.asarray(v)))
    n = dom6.num_unknowns
    M = np.stack([apply(np.eye(n)[i]) for i in range(n)])
    np.testing.assert_allclose(M, M.T, atol=1e-12)
    eigs = np.linalg.eigvalsh(M)
    assert np.all(eigs < 0)


def test_stencil_3d_equals_kron_laplacian():
    """7-point operator on a unit box equals the Kronecker-sum Laplacian."""
    dom = Domain3D(nx=4, ny=4, nz=4)
    op = StencilOperator.from_domain(dom)
    n1 = 3  # interior per axis
    h2 = 16.0
    T = (np.diag(-2.0 * np.ones(n1)) + np.diag(np.ones(n1 - 1), 1) + np.diag(np.ones(n1 - 1), -1)) * h2
    I = np.eye(n1)
    L = np.kron(np.kron(T, I), I) + np.kron(np.kron(I, T), I) + np.kron(np.kron(I, I), T)
    rng = np.random.default_rng(3)
    xc = rng.standard_normal(27)
    field = ordering.unpack(jnp.asarray(xc), dom)
    y = np.asarray(ordering.pack(op(field), dom))
    np.testing.assert_allclose(y, L @ xc, rtol=1e-12, atol=1e-9)


def test_rhs_3d_manufactured():
    """BC-eliminated RHS equals A @ u_exact at interior for the 3D problem up
    to discretization error (sin product: O(h²))."""
    dom = Domain3D(nx=8, ny=8, nz=8)
    prob = PoissonProblem.manufactured(dom)
    op = StencilOperator.from_domain(dom)
    u = prob.true_solution_field()
    rhs = prob.rhs_field()
    Au = op(u)
    err = np.max(np.abs(np.asarray(Au - rhs)))
    assert err < 3.0  # f ~ 30·u, h=1/8 ⇒ O(h²)·|u⁗| scale
