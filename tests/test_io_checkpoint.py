"""Results IO round-trips (reference-format text + npz), matrix dumps,
3D export, and CG checkpoint/resume."""

import numpy as np
import pytest

from iterative_solvers_tpu.api import DirichletSolver
from iterative_solvers_tpu.core.domain import Domain2D
from iterative_solvers_tpu.core.problem import PoissonProblem
from iterative_solvers_tpu.core import ordering
from iterative_solvers_tpu.ops.stencil import StencilOperator
from iterative_solvers_tpu.ops.sparse import assemble_dense
from iterative_solvers_tpu import results_io
from iterative_solvers_tpu.solvers.cg import CGOptions, cg_solve
from iterative_solvers_tpu.solvers.checkpoint import (
    load_cg_state,
    periodic_checkpointer,
    save_cg_state,
)
from iterative_solvers_tpu.solvers.stopping import StopConfig, StopReason


@pytest.fixture(scope="module")
def solved():
    s = DirichletSolver(nx=12, ny=12, stop=StopConfig(eps_precision=-1, eps_residual=1e-7))
    return s, s.solve()


def test_text_roundtrip(tmp_path, solved):
    _, res = solved
    p = str(tmp_path / "results.txt")
    results_io.save_results(p, res)
    loaded, name = results_io.load_results(p)
    assert "MSG" in name
    np.testing.assert_allclose(loaded.solution, res.solution, rtol=1e-15)
    np.testing.assert_allclose(loaded.true_solution, res.true_solution, rtol=1e-15)
    np.testing.assert_allclose(loaded.residual, res.residual, rtol=1e-15)
    np.testing.assert_allclose(loaded.x_coords, res.x_coords, rtol=1e-15)
    assert loaded.iterations == res.iterations
    assert loaded.converged == res.converged
    assert loaded.stop_reason == res.stop_reason
    assert loaded.nx == res.nx and loaded.bounds == res.bounds


def test_text_format_sections(tmp_path, solved):
    """File layout matches the reference section schema
    (dirichlet_solver.cpp:264-312)."""
    _, res = solved
    p = str(tmp_path / "results.txt")
    results_io.save_results(p, res)
    lines = open(p).read().splitlines()
    assert lines[0] == "PARAMETERS"
    # gamma files must stay byte-compatible with the reference loader
    # (CONVERGENCE right after the solver name); only non-gamma geometries
    # get the optional SHAPE extension line
    assert res.shape == "gamma"
    assert lines[4] == "CONVERGENCE"
    assert not any(ln.startswith("SHAPE") for ln in lines)
    for sec in ("SOLUTION", "TRUE_SOLUTION", "RESIDUAL", "ERROR", "X_COORDS", "Y_COORDS"):
        assert sec in lines


def test_npz_roundtrip(tmp_path, solved):
    _, res = solved
    p = str(tmp_path / "results.npz")
    results_io.save_results_npz(p, res)
    loaded = results_io.load_results_npz(p)
    np.testing.assert_array_equal(loaded.solution, res.solution)
    assert loaded.stop_reason == res.stop_reason
    assert loaded.elapsed_s == res.elapsed_s
    if res.history is not None:
        np.testing.assert_array_equal(loaded.history, res.history)


def test_matrix_dump_roundtrip(tmp_path):
    dom = Domain2D(nx=6, ny=6)
    prob = PoissonProblem.manufactured(dom)
    b = np.asarray(ordering.pack(prob.rhs_field(), dom))
    p = str(tmp_path / "matrix.txt")
    results_io.save_matrix_and_rhs(p, dom, b)
    row_map, entries, values, rhs = results_io.load_matrix_and_rhs(p)
    A = np.zeros((16, 16))
    for i in range(16):
        for k in range(row_map[i], row_map[i + 1]):
            A[i, entries[k]] = values[k]
    np.testing.assert_allclose(A, assemble_dense(dom), atol=1e-12)
    np.testing.assert_allclose(rhs, b, rtol=1e-15)


def test_solution_3d_export(tmp_path, solved):
    _, res = solved
    p = str(tmp_path / "surface.dat")
    results_io.save_solution_3d(p, res)
    rows = np.loadtxt(p)
    assert rows.shape == (res.solution.size, 3)
    np.testing.assert_allclose(rows[:, 2], res.solution, rtol=1e-15)


def test_checkpoint_resume_exact(tmp_path):
    """Interrupt a solve, checkpoint, resume — identical result to an
    uninterrupted run (same iterate sequence)."""
    dom = Domain2D(nx=24, ny=24)
    prob = PoissonProblem.manufactured(dom)
    op = StencilOperator.from_domain(dom)
    b = prob.rhs_field()
    stop = StopConfig(eps_precision=-1, eps_residual=1e-8, max_iterations=5000)

    full = cg_solve(op, b, options=CGOptions(stop=stop))

    # run 1: stop after ~40 iterations, checkpointing every chunk
    ckpt = str(tmp_path / "cg.npz")
    states = []
    res1 = cg_solve(
        op,
        b,
        options=CGOptions(
            stop=stop,
            callback=lambda *a: None,
            callback_every=20,
            stop_requested=lambda: len(states) >= 2,
            state_callback=lambda s: (states.append(1), save_cg_state(ckpt, s)),
        ),
    )
    assert res1.reason == StopReason.INTERRUPTED
    assert res1.iterations < full.iterations

    # run 2: resume from the checkpoint
    state = load_cg_state(ckpt)
    assert int(state.k) == res1.iterations
    res2 = cg_solve(op, b, options=CGOptions(stop=stop), init_state=state)
    assert res2.converged
    assert res2.iterations == full.iterations  # exact continuation
    np.testing.assert_allclose(np.asarray(res2.x), np.asarray(full.x), rtol=1e-12, atol=1e-12)


def test_periodic_checkpointer(tmp_path):
    dom = Domain2D(nx=16, ny=16)
    op = StencilOperator.from_domain(dom)
    b = PoissonProblem.manufactured(dom).rhs_field()
    ckpt = str(tmp_path / "p.npz")
    cg_solve(
        op,
        b,
        options=CGOptions(
            stop=StopConfig(max_iterations=60).disable_all_but_iterations(),
            callback=lambda *a: None,
            callback_every=10,
            state_callback=periodic_checkpointer(ckpt, every_s=0.0),
        ),
    )
    state = load_cg_state(ckpt)
    assert int(state.k) > 0


def test_load_matrix_and_rhs_malformed(tmp_path):
    """Loader validation raises ValueError, not assert (VERDICT r2 item 9)."""
    import pytest
    from iterative_solvers_tpu import results_io

    p = tmp_path / "bad.txt"
    p.write_text("NOT_A_DUMP\n")
    with pytest.raises(ValueError, match="bad header"):
        results_io.load_matrix_and_rhs(str(p))

    p.write_text("MATRIX_INFO\n6 6\nxx yy\nMATRIX\n")
    with pytest.raises(ValueError, match="size line"):
        results_io.load_matrix_and_rhs(str(p))

    p.write_text("MATRIX_INFO\n6 6\n2 3\nMATRIX\n0\n1\n3\n")
    with pytest.raises(ValueError, match="truncated"):
        results_io.load_matrix_and_rhs(str(p))

    # row_map consistency: row_map[-1] != nnz
    body = "MATRIX_INFO\n6 6\n2 2\nMATRIX\n" + "\n".join(
        ["0", "1", "3", "0", "1", "1.0", "2.0", "RHS", "1.0", "2.0"]
    ) + "\n"
    p.write_text(body)
    with pytest.raises(ValueError, match="row_map"):
        results_io.load_matrix_and_rhs(str(p))
