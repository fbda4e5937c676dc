"""CLI and visualization tests (CLI drives everything end-to-end)."""

import os

import numpy as np
import pytest

from iterative_solvers_tpu.cli import main


def test_cli_solve_full(tmp_path, capsys):
    plots = str(tmp_path / "plots")
    rc = main([
        "solve",
        "--nx", "16", "--ny", "16",
        "--save", str(tmp_path / "r.txt"),
        "--save-npz", str(tmp_path / "r.npz"),
        "--save-matrix", str(tmp_path / "m.txt"),
        "--save-3d", str(tmp_path / "s.dat"),
        "--plots", plots,
        "--progress-every", "10",
    ])
    assert rc == 0
    out = capsys.readouterr()
    assert "Converged:               yes" in out.out
    assert "iter     10" in out.err  # progress cadence plumbed through
    for f in ("r.txt", "r.npz", "m.txt", "s.dat"):
        assert (tmp_path / f).exists()
    for f in (
        "convergence.png",
        "scatter_solution.png",
        "scatter_error.png",
        "scatter_residual.png",
        "heatmap_error.png",
        "surface.png",
    ):
        assert os.path.getsize(os.path.join(plots, f)) > 1000


def test_cli_nonconverged_exit_code(capsys):
    rc = main(["solve", "--nx", "16", "--ny", "16", "--max-iter", "3",
               "--eps-residual", "1e-300", "--eps-precision", "-1", "--quiet"])
    assert rc == 2


def test_cli_rect_precond_sparse(capsys):
    rc = main(["solve", "--nx", "20", "--ny", "14", "--shape", "rect",
               "--operator", "sparse", "--precond", "chebyshev:4", "--quiet"])
    assert rc == 0


def test_cli_version(capsys):
    assert main(["version"]) == 0
    assert capsys.readouterr().out.strip().count(".") == 2


def test_cli_no_command(capsys):
    assert main([]) == 1


def test_viz_rejects_missing_quantity(tmp_path):
    from iterative_solvers_tpu import viz
    from iterative_solvers_tpu.api import DirichletSolver, SolverResults
    from iterative_solvers_tpu.solvers.stopping import StopConfig

    s = DirichletSolver(nx=8, ny=8, stop=StopConfig(max_iterations=5).disable_all_but_iterations())
    res = s.solve()
    with pytest.raises(ValueError):
        viz.scatter_plot(res, str(tmp_path / "x.png"), "nonsense")


def test_heatmap_stats(tmp_path):
    from iterative_solvers_tpu import viz
    from iterative_solvers_tpu.api import DirichletSolver
    from iterative_solvers_tpu.solvers.stopping import StopConfig

    s = DirichletSolver(nx=12, ny=12, stop=StopConfig(eps_precision=-1, eps_residual=1e-7))
    res = s.solve()
    dom = s.domain
    stats = viz.heatmap(res, dom, str(tmp_path / "h.png"), "error")
    assert 0 <= stats["min"] <= stats["avg"] <= stats["max"]
    assert stats["max"] == pytest.approx(res.error_norm, rel=1e-9)


def test_cli_view_round_trip(tmp_path, capsys):
    """solve -> save -> view -> same plot set + report (VERDICT r2 item 8:
    the reference GUI's load-and-inspect, dirichlet_solver.cpp:315-405)."""
    saved = str(tmp_path / "r.txt")
    assert main(["solve", "--nx", "16", "--ny", "16", "--save", saved,
                 "--quiet", "--progress-every", "0"]) == 0
    capsys.readouterr()

    plots = str(tmp_path / "view_plots")
    rc = main(["view", saved, "--plots", plots, "--report"])
    assert rc == 0
    out = capsys.readouterr()
    assert "Dirichlet-Poisson solve report" in out.out
    for f in (
        "scatter_solution.png",
        "scatter_error.png",
        "scatter_residual.png",
        "heatmap_error.png",
        "surface.png",
    ):
        assert os.path.getsize(os.path.join(plots, f)) > 1000

    # npz round trip through view
    npz = str(tmp_path / "again.npz")
    assert main(["view", saved, "--save-npz", npz]) == 0
    capsys.readouterr()
    assert main(["view", npz, "--print-vectors", "solution", "--limit", "5"]) == 0
    out = capsys.readouterr()
    assert "... (" in out.out  # truncation marker
    assert "solution" in out.out


def test_cli_view_uses_recorded_shape(tmp_path, capsys):
    """view must rebuild the domain the results were SOLVED on: an odd-sized
    rect grid would be rejected outright by the old gamma default, and a
    gamma mask would silently mis-plot rect fields."""
    saved = str(tmp_path / "rect.txt")
    assert main(["solve", "--nx", "7", "--ny", "7", "--shape", "rect",
                 "--save", saved, "--quiet", "--progress-every", "0"]) == 0
    capsys.readouterr()
    plots = str(tmp_path / "plots")
    assert main(["view", saved, "--plots", plots]) == 0
    capsys.readouterr()
    assert os.path.getsize(os.path.join(plots, "heatmap_error.png")) > 1000
    # an explicit --shape override still wins over the recorded one
    assert main(["view", saved, "--shape", "rect", "--plots",
                 str(tmp_path / "p2")]) == 0
    capsys.readouterr()


def test_cli_fmg_cycles_flag(tmp_path, capsys):
    """--fmg-cycles reaches the facade (0 = cold start still converges) and
    round-trips through the config file."""
    rc = main(["solve", "--nx", "32", "--ny", "32", "--precond", "mg",
               "--precision", "mixed", "--fmg-cycles", "0",
               "--save-config", str(tmp_path / "c.json"),
               "--quiet", "--progress-every", "0"])
    assert rc == 0
    capsys.readouterr()
    from iterative_solvers_tpu.config import SolveConfig

    cfg = SolveConfig.load(str(tmp_path / "c.json"))
    assert cfg.fmg_cycles == 0
    assert cfg.make_solver().fmg_cycles == 0


def test_cli_solve_mask_file(tmp_path, capsys):
    """--mask FILE makes custom domains reachable from the CLI; the saved
    results then view correctly through the coordinate reconstruction."""
    ny = nx = 10
    iy, ix = np.mgrid[0 : ny + 1, 0 : nx + 1]
    inside = ~((ix > 6) & (iy > 6))  # notched rectangle
    mfile = str(tmp_path / "mask.npy")
    np.save(mfile, inside)

    saved = str(tmp_path / "m.txt")
    rc = main(["solve", "--nx", str(nx), "--ny", str(ny), "--mask", mfile,
               "--save", saved, "--quiet", "--progress-every", "0"])
    assert rc == 0
    capsys.readouterr()
    assert "SHAPE custom" in open(saved).read()
    assert main(["view", saved, "--plots", str(tmp_path / "p")]) == 0
    capsys.readouterr()
    assert os.path.getsize(os.path.join(str(tmp_path / "p"),
                                        "heatmap_error.png")) > 1000

    # wrong grid size fails loudly
    rc = main(["solve", "--nx", "8", "--ny", "8", "--mask", mfile, "--quiet",
               "--progress-every", "0"])
    assert rc != 0
    assert "shape" in capsys.readouterr().err


def test_cli_view_custom_domain(tmp_path, capsys):
    """Custom-mask results round-trip through view: exact mask via npz,
    coordinate-based reconstruction via the text format."""
    from iterative_solvers_tpu.api import DirichletSolver
    from iterative_solvers_tpu.cli import _view_domain_2d
    from iterative_solvers_tpu.core.domain import Domain2D
    from iterative_solvers_tpu.results_io import (
        load_results,
        load_results_npz,
        save_results_npz,
    )

    # notched rectangle: a genuinely non-gamma/rect mask
    dom = Domain2D(nx=12, ny=12, shape="custom",
                   inside_fn=lambda ix, iy: ~((ix > 8) & (iy > 8)))
    s = DirichletSolver(domain=dom)
    res = s.solve(record_history=False)
    assert res.shape == "custom" and res.interior_mask is not None

    npz = str(tmp_path / "c.npz")
    save_results_npz(npz, res)
    r2 = load_results_npz(npz)
    d2 = _view_domain_2d(r2, None)
    assert (np.asarray(d2.interior) == np.asarray(dom.interior)).all()

    txt = str(tmp_path / "c.txt")
    res.save(txt)
    r3, _name = load_results(txt)
    assert r3.shape == "custom" and r3.interior_mask is None
    d3 = _view_domain_2d(r3, None)  # reconstructed from coords
    assert (np.asarray(d3.interior) == np.asarray(dom.interior)).all()

    plots = str(tmp_path / "cplots")
    assert main(["view", txt, "--plots", plots]) == 0
    capsys.readouterr()
    assert os.path.getsize(os.path.join(plots, "surface.png")) > 1000


def test_cli_view_default_prints_report(tmp_path, capsys):
    saved = str(tmp_path / "r.txt")
    main(["solve", "--nx", "8", "--ny", "8", "--save", saved, "--quiet",
          "--progress-every", "0"])
    capsys.readouterr()
    assert main(["view", saved]) == 0
    assert "Outcome:" in capsys.readouterr().out


def test_cli_console_printers(capsys):
    """Console pretty-printers (reference main.cpp:468-594)."""
    rc = main(["solve", "--nx", "6", "--ny", "6", "--quiet",
               "--progress-every", "0", "--print-matrix", "--print-rhs",
               "--print-vectors", "solution", "--print-vectors", "residual"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "System matrix (16 x 16" in out
    assert "-144" in out  # golden 6x6 diagonal
    assert "Right-hand side (16 unknowns)" in out
    assert "solution" in out and "residual" in out


def test_print_matrix_refuses_huge(capsys):
    rc = main(["solve", "--nx", "64", "--ny", "64", "--quiet",
               "--progress-every", "0", "--print-matrix"])
    assert rc == 0
    assert "too large for a console table" in capsys.readouterr().out


def test_cli_outer_flag(tmp_path, capsys):
    """--outer reaches the facade and round-trips through the config file;
    'ff' converges end-to-end through the CLI (forces the device-IR ladder
    even on CPU)."""
    rc = main(["solve", "--nx", "16", "--ny", "16", "--precond", "mg",
               "--precision", "mixed", "--outer", "ff",
               "--save-config", str(tmp_path / "c.json"),
               "--quiet", "--progress-every", "0"])
    assert rc == 0
    capsys.readouterr()
    from iterative_solvers_tpu.config import SolveConfig

    cfg = SolveConfig.load(str(tmp_path / "c.json"))
    assert cfg.outer == "ff"
    assert cfg.make_solver().outer == "ff"
