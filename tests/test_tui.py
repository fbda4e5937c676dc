"""Live TUI tests (iterative_solvers_tpu/tui.py).

The TUI is the headless-testable equivalent of the reference GUI's live view
(reference qt_gui/src/mainwindow.cpp:316-379) — panel rendering is a pure
function, and the event loop runs against any file object, so the whole
feature is exercised on a pipe without a terminal.
"""

import io

from iterative_solvers_tpu.api import DirichletSolver
from iterative_solvers_tpu.async_driver import ProgressEvent
from iterative_solvers_tpu.solvers.stopping import StopConfig, StopReason
from iterative_solvers_tpu.tui import LiveView, live_solve, render_frame, sparkline


def test_render_frame_contents():
    ev = ProgressEvent(iteration=1200, precision=1.2e-4, residual=3.4e-3, error=5.6e-3)
    lines = render_frame(ev, 10000, [3.0e4, 1.0, 3.4e-3], elapsed_s=12.4)
    joined = "\n".join(lines)
    assert "1200/10000" in joined and "12%" in joined
    assert "3.400e-03" in joined and "1.200e-04" in joined
    assert "log10|r|" in joined and "[q] cancel" in joined


def test_render_frame_inf_norms():
    ev = ProgressEvent(iteration=0, precision=float("inf"), residual=3e4,
                       error=float("inf"))
    joined = "\n".join(render_frame(ev, 100, [3e4], elapsed_s=0.0,
                                    interactive=False))
    # infinite norms render as a dash placeholder, never as 'inf'
    assert joined.count("   -    ") == 2
    assert "[q] cancel" not in joined


def test_sparkline_monotone():
    s = sparkline([10.0 ** -k for k in range(20)], width=10)
    assert len(s) == 10
    # strictly decaying residual → non-increasing glyph levels
    levels = ["▁▂▃▄▅▆▇█".index(c) for c in s]
    assert levels == sorted(levels, reverse=True)
    assert sparkline([]) == ""
    assert sparkline([0.0, -1.0]) == ""


def test_live_solve_pipe():
    # Non-TTY output: one line per event + a final done line; result intact.
    solver = DirichletSolver(nx=16, ny=16)
    out = io.StringIO()
    res = live_solve(solver, callback_every=5, out=out, key_poll=lambda: None)
    assert res.converged
    text = out.getvalue()
    assert "done: converged=True" in text
    assert text.count("iter ") >= 2


def test_live_cancel_via_q():
    # The injected key poller presses q at the second frame; the solve must
    # finish INTERRUPTED through the cooperative-cancellation path.
    stop = StopConfig(eps_precision=-1, eps_residual=1e-300, max_iterations=100000)
    solver = DirichletSolver(nx=32, ny=32, stop=stop)
    presses = iter([None, "q"])
    out = io.StringIO()
    res = live_solve(
        solver,
        callback_every=3,
        out=out,
        key_poll=lambda: next(presses, "q"),
    )
    assert res.stop_reason == StopReason.INTERRUPTED
    assert not res.converged
    assert "cancelling" in out.getvalue() or "interrupted" in out.getvalue()


def test_cli_live_flag():
    from iterative_solvers_tpu.cli import main

    rc = main([
        "solve", "--nx", "12", "--ny", "12", "--live", "--quiet",
        "--progress-every", "10",
    ])
    assert rc == 0
