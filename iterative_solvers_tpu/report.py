"""Text report generation.

English equivalents of the reference's report templates
(reference solver/msg_solver.cpp:261-304 ``generateReport`` and the GUI
template at qt_gui/src/mainwindow.cpp:751-793).
"""

from __future__ import annotations


def cg_report(res) -> str:
    """Report for a raw CG solve (reference msg_solver.cpp:261-304)."""
    lines = [
        "=== Conjugate Gradient (MSG) solver report ===",
        f"Iterations performed:      {res.iterations}",
        f"Wall time:                 {res.elapsed_s * 1e3:.3f} ms",
        f"Initial residual |r0|_2:   {res.initial_residual_norm:.6e}",
        f"Final residual |r|_2:      {res.residual_norm:.6e}",
        f"Final residual |r|_inf:    {res.residual_max:.6e}",
        f"Final step |dx|_inf:       {res.precision_max:.6e}",
        f"Final error |x-u|_inf:     {res.error_max:.6e}",
        f"Converged:                 {'yes' if res.converged else 'no'}",
        f"Stop reason:               {res.reason.text()}",
    ]
    return "\n".join(lines)


def results_report(results) -> str:
    """Report for a full DirichletSolver run (reference
    qt_gui/src/mainwindow.cpp:751-793 content)."""
    b = results.bounds
    domain_str = " x ".join(f"[{b[i]}, {b[i + 1]}]" for i in range(0, len(b), 2))
    grid_str = f"{results.nx} x {results.ny}" + (
        f" x {results.nz}" if getattr(results, "nz", 0) else ""
    )
    lines = [
        "=== Dirichlet-Poisson solve report ===",
        "",
        "Problem:",
        f"  Grid:                    {grid_str} intervals",
        f"  Domain:                  {domain_str}",
        f"  Unknowns:                {results.solution.size}",
        "",
        "Solver:",
        f"  Epsilon:                 {results.eps:.3e}",
        f"  Max iterations:          {results.max_iterations}",
        "",
        "Outcome:",
        f"  Iterations:              {results.iterations}",
        f"  Converged:               {'yes' if results.converged else 'no'}",
        f"  Stop reason:             {results.stop_reason.text()}",
        f"  Residual |Ax-b|_inf:     {results.residual_norm:.6e}",
        f"  Error |x-u|_inf:         {results.error_norm:.6e}",
        f"  Step |dx|_inf:           {results.precision_norm:.6e}",
        f"  Wall time:               {results.elapsed_s * 1e3:.3f} ms",
    ]
    return "\n".join(lines)
