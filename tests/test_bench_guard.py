"""bench.py solve-mode watchdog: the official artifact must be ONE parseable
JSON line even on a pathological compile day (round 3's artifact was killed
by the driver's timeout — rc=124, nothing recorded)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run_bench(extra_env, timeout=600):
    env = dict(os.environ, JAX_PLATFORMS="cpu", BENCH_N="64", **extra_env)
    # the virtual-mesh conftest exports XLA_FLAGS for THIS process; the bench
    # child should see a plain single-device CPU
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, BENCH],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
        cwd=REPO,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 1, (out.stdout, out.stderr[-2000:])
    return out, json.loads(lines[0])


def test_guard_passes_solve_metric_through():
    out, parsed = _run_bench({})
    assert parsed["metric"].startswith("cg_time_to_true_rel_1e-6_64x64")
    assert parsed["unit"] == "s" and parsed["value"] > 0
    assert out.returncode == 0


def test_guard_falls_back_to_cg_metric_on_budget():
    out, parsed = _run_bench({"BENCH_SOLVE_BUDGET_S": "2"})
    assert parsed["metric"].startswith("fused_cg_iteration_ms_64x64")
    assert parsed["unit"] == "ms/iteration" and parsed["value"] > 0
    assert "falling back" in out.stderr
    assert out.returncode == 0
