"""Auxiliary-subsystem tests: profiling, config, async driver (SURVEY §5)."""

import json
import math
import os
import time

import numpy as np
import pytest

from iterative_solvers_tpu.api import DirichletSolver
from iterative_solvers_tpu.async_driver import (
    AsyncSolver,
    CompletionEvent,
    ProgressEvent,
)
from iterative_solvers_tpu.config import SolveConfig
from iterative_solvers_tpu.profiling import Profiler
from iterative_solvers_tpu.solvers.stopping import StopConfig


# --- profiling --------------------------------------------------------------


def test_profiler_phases_and_counters():
    p = Profiler()
    with p.phase("a"):
        time.sleep(0.01)
    with p.phase("a"):
        pass
    p.count("iterations", 50)
    p.count("iterations", 25)
    assert p.phases["a"].calls == 2
    assert p.phases["a"].total_s >= 0.01
    assert p.counters["iterations"] == 75
    rep = p.report()
    assert "a" in rep and "iterations" in rep and "iterations_per_s" in rep


def test_profiler_through_solve():
    p = Profiler()
    s = DirichletSolver(nx=24, ny=24)
    res = s.solve(record_history=False, profiler=p)
    assert res.converged
    assert p.counters["iterations"] == res.iterations
    assert p.phases["cg_chunk"].calls >= 1
    assert "effective_nnz_per_s" in p.throughput()


def test_profiler_through_mixed_solve():
    p = Profiler()
    s = DirichletSolver(
        nx=32,
        ny=32,
        preconditioner="mg",
        precision="mixed",
        stop=StopConfig(eps_precision=-1, eps_residual=1e-6, max_iterations=1000),
    )
    res = s.solve(record_history=False, profiler=p)
    assert res.converged
    assert p.phases["inner_solve"].calls >= 1
    assert p.phases["outer_residual"].calls >= 1


# --- config -------------------------------------------------------------------


def test_config_roundtrip(tmp_path):
    cfg = SolveConfig(nx=48, ny=48, precond="mg", eps_residual=1e-4)
    path = str(tmp_path / "cfg.json")
    cfg.save(path)
    cfg2 = SolveConfig.load(path)
    assert cfg2 == cfg


def test_config_toml(tmp_path):
    path = str(tmp_path / "cfg.toml")
    with open(path, "w") as f:
        f.write('nx = 16\nny = 16\nprecond = "jacobi"\nmax_iter = 500\n')
    cfg = SolveConfig.load(path)
    assert cfg.nx == 16 and cfg.precond == "jacobi" and cfg.max_iter == 500
    assert cfg.eps_residual == 1e-6  # untouched default


def test_config_unknown_key_rejected(tmp_path):
    path = str(tmp_path / "bad.json")
    with open(path, "w") as f:
        json.dump({"nx": 16, "epsilon": 1e-6}, f)
    with pytest.raises(ValueError, match="unknown config keys"):
        SolveConfig.load(path)


def test_config_make_solver_solves():
    cfg = SolveConfig(
        nx=24, ny=24, precond="mg", eps_precision=-1, eps_residual=1e-3, max_iter=100
    )
    res = cfg.make_solver().solve(record_history=False)
    assert res.converged and res.iterations <= 15


def test_config_3d_domain():
    from iterative_solvers_tpu.core.domain import Domain3D

    cfg = SolveConfig(nx=8, ny=8, nz=8)
    assert isinstance(cfg.make_domain(), Domain3D)


def test_cli_config_file(tmp_path, capsys):
    from iterative_solvers_tpu.cli import main

    path = str(tmp_path / "cfg.json")
    SolveConfig(nx=20, ny=20, eps_precision=-1, eps_residual=1e-3).save(path)
    rc = main(["solve", "--config", path, "--quiet", "--report"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "20 x 20" in out


def test_cli_flag_overrides_config(tmp_path, capsys):
    from iterative_solvers_tpu.cli import main

    path = str(tmp_path / "cfg.json")
    SolveConfig(nx=20, ny=20, eps_precision=-1, eps_residual=1e-3).save(path)
    rc = main(["solve", "--config", path, "--nx", "24", "--ny", "24", "--quiet", "--report"])
    assert rc == 0
    assert "24 x 24" in capsys.readouterr().out


def test_cli_save_config(tmp_path):
    from iterative_solvers_tpu.cli import main

    path = str(tmp_path / "out.json")
    rc = main([
        "solve", "--nx", "16", "--ny", "16", "--eps-precision", "-1",
        "--eps-residual", "1e-3", "--save-config", path, "--quiet",
    ])
    assert rc == 0
    assert SolveConfig.load(path).nx == 16


# --- async driver ---------------------------------------------------------------


def test_async_solver_event_stream():
    s = DirichletSolver(
        nx=32,
        ny=32,
        stop=StopConfig(eps_precision=-1, eps_residual=1e-4, max_iterations=2000),
    )
    runner = AsyncSolver(s, callback_every=20).start()
    events = list(runner)
    assert isinstance(events[-1], CompletionEvent) and events[-1].converged
    progress = [e for e in events if isinstance(e, ProgressEvent)]
    assert progress[0].iteration == 0 and math.isinf(progress[0].precision)
    ks = [e.iteration for e in progress]
    assert ks == sorted(ks)
    res = runner.result(timeout=30)
    assert res.converged and ks[-1] == res.iterations


def test_async_solver_cancellation():
    s = DirichletSolver(
        nx=64,
        ny=64,
        stop=StopConfig(eps_precision=-1, eps_residual=1e-12, max_iterations=10**6),
    )
    runner = AsyncSolver(s, callback_every=1).start()
    seen = 0
    for ev in runner:
        seen += 1
        if seen == 3:
            runner.stop()  # reference Stop-button path
        if isinstance(ev, CompletionEvent):
            assert not ev.converged and "interrupt" in ev.reason
    res = runner.result(timeout=30)
    assert res.stop_reason.name == "INTERRUPTED"


def test_async_solver_usage_errors():
    s = DirichletSolver(nx=16, ny=16)
    runner = AsyncSolver(s)
    with pytest.raises(RuntimeError, match="start"):
        next(iter(runner))
    with pytest.raises(RuntimeError, match="start"):
        runner.result()
    runner.start()
    runner.result(timeout=60)
    with pytest.raises(RuntimeError, match="already started"):
        runner.start()


def test_concurrent_solvers_thread_safety():
    # SURVEY §5 thread-safety surface: two independent facades solving
    # concurrently from worker threads (the reference's worker-thread model)
    # must not interfere — results identical to serial runs.
    import threading

    import numpy as np

    from iterative_solvers_tpu.api import DirichletSolver
    from iterative_solvers_tpu.solvers.stopping import StopConfig

    stop = StopConfig(eps_precision=-1, eps_residual=1e-6, max_iterations=5000)

    def solve(n):
        return DirichletSolver(nx=n, ny=n, stop=stop).solve(record_history=False)

    serial = {n: solve(n) for n in (16, 24)}
    results = {}
    errs = []

    def worker(n):
        try:
            results[n] = solve(n)
        except BaseException as e:  # surfaced to the main thread
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(n,)) for n in (16, 24)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errs, errs
    for n in (16, 24):
        assert results[n].converged
        assert results[n].iterations == serial[n].iterations
        np.testing.assert_allclose(results[n].solution, serial[n].solution,
                                   rtol=1e-12, atol=1e-12)
