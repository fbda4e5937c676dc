"""Interactive HTML explorer (viz_html) — the reference GUI's interactive
3D-surface/heatmap exploration capability (qt_gui/src/mainwindow.cpp:796-917,
1139-1298) as a standalone single-file export."""

import json
import re

import numpy as np
import pytest

from iterative_solvers_tpu import DirichletSolver
from iterative_solvers_tpu.cli import main
from iterative_solvers_tpu.viz_html import export_html


def _extract_payload(path):
    doc = open(path, encoding="utf-8").read()
    m = re.search(
        r'<script type="application/json" id="data">(.*?)</script>', doc, re.S
    )
    assert m, "embedded JSON payload missing"
    return doc, json.loads(m.group(1))


@pytest.fixture(scope="module")
def small_solve():
    s = DirichletSolver(nx=16, ny=16)
    res = s.solve()
    return s, res


def test_export_payload_structure(tmp_path, small_solve):
    s, res = small_solve
    out = str(tmp_path / "exp.html")
    assert export_html(res, s.domain, out, title="t16") == out
    doc, d = _extract_payload(out)
    assert set(d) == {"meta", "x", "y", "fields", "stats", "history"}
    assert set(d["fields"]) == {"solution", "true_solution", "error", "residual"}
    m = d["meta"]
    assert (m["nx"], m["ny"]) == (16, 16)
    assert m["converged"] is True
    assert m["iterations"] == res.iterations
    assert m["full"] == [17, 17] and m["sampled"] == [17, 17]
    # standalone: no external scripts/styles/images
    assert "http://" not in doc and "https://" not in doc
    assert "<title>t16</title>" in doc
    # valid JSON floats end-to-end (allow_nan=False was honored)
    assert "NaN" not in doc.split('id="data">')[1].split("</script>")[0]


def test_export_masks_match_domain(tmp_path, small_solve):
    s, res = small_solve
    out = str(tmp_path / "exp.html")
    export_html(res, s.domain, out)
    _, d = _extract_payload(out)
    interior = np.asarray(s.domain.interior)
    sol = d["fields"]["solution"]
    for j in range(len(sol)):
        for i in range(len(sol[j])):
            assert (sol[j][i] is not None) == bool(interior[j, i])


def test_export_stats_are_full_field(tmp_path, small_solve):
    s, res = small_solve
    out = str(tmp_path / "exp.html")
    export_html(res, s.domain, out, max_cells=7)  # heavy down-sampling
    _, d = _extract_payload(out)
    assert d["meta"]["sampled"] == [7, 7]
    # ends preserved by the sampler
    assert d["x"][0] == pytest.approx(s.domain.x0)
    assert d["x"][-1] == pytest.approx(s.domain.x1)
    # stats still reflect the FULL field, not the 7x7 sample
    assert d["stats"]["error"]["max"] == pytest.approx(
        float(np.max(np.abs(res.error))), rel=1e-6
    )


def test_export_history_rows(tmp_path, small_solve):
    s, res = small_solve
    out = str(tmp_path / "exp.html")
    export_html(res, s.domain, out)
    _, d = _extract_payload(out)
    assert len(d["history"]) == len(res.history)
    # row layout: iter, |dx|inf, |r|inf, |err|inf, |r|2
    last = d["history"][-1]
    assert last[0] == res.iterations


def test_export_title_escaping(tmp_path, small_solve):
    s, res = small_solve
    out = str(tmp_path / "exp.html")
    export_html(res, s.domain, out, title='<script>"x"</script>')
    doc = open(out, encoding="utf-8").read()
    assert "<title>&lt;script&gt;" in doc


def test_export_rejects_empty_results(tmp_path, small_solve):
    s, res = small_solve
    import dataclasses

    hollow = dataclasses.replace(
        res,
        solution=np.empty(0),
        true_solution=np.empty(0),
        error=np.empty(0),
        residual=np.empty(0),
    )
    with pytest.raises(ValueError, match="no per-node vectors"):
        export_html(hollow, s.domain, str(tmp_path / "x.html"))


def test_cli_solve_html(tmp_path):
    out = str(tmp_path / "solve.html")
    rc = main(["solve", "--nx", "12", "--ny", "12", "--html", out, "--quiet"])
    assert rc == 0
    _, d = _extract_payload(out)
    assert d["meta"]["nx"] == 12


def test_cli_view_html_round_trip(tmp_path):
    saved = str(tmp_path / "r.txt")
    rc = main(["solve", "--nx", "12", "--ny", "12", "--save", saved, "--quiet"])
    assert rc == 0
    out = str(tmp_path / "view.html")
    assert main(["view", saved, "--html", out]) == 0
    _, d = _extract_payload(out)
    assert d["meta"]["nx"] == 12
    assert set(d["fields"]) >= {"solution", "residual"}


def test_export_3d_mid_slice(tmp_path):
    from iterative_solvers_tpu import Domain3D

    dom = Domain3D(nx=8, ny=8, nz=8, x0=1, x1=2, y0=1, y1=2, z0=1, z1=2)
    s = DirichletSolver(domain=dom)
    res = s.solve()
    out = str(tmp_path / "exp3d.html")
    export_html(res, s.domain, out)
    _, d = _extract_payload(out)
    assert d["meta"]["nz"] == 8
    assert d["meta"]["slice_z"] == pytest.approx(1.5)
    # the embedded field is one z-slice of the 9^3 grid
    assert d["meta"]["full"] == [9, 9]
