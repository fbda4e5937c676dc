"""Compile + execute every Pallas kernel on the real chip, x64 off AND on.

Round-1 lesson: the test suite runs Pallas only in interpret mode on CPU, so
the whole Mosaic-lowering bug class (i64 BlockSpec index maps / roll shifts
under jax_enable_x64 — NOTES_PERF.md) was invisible until a bench run died.
This tool is the pre-bench gate: one tiny iteration of each kernel family,
non-interpret, under both x64 settings, finite-result checked; prints ONE
JSON line. Run it once per round on the TPU and commit the output
(SMOKE_r{N}.json).

Kernels covered:
  stencil2d   — kernels/stencil_pallas.py masked 5-point apply
  stencil3d   — kernels/stencil3d_pallas.py 7-point apply
  cg_fused    — kernels/cg_fused.py K1+K2 (one fused MSG iteration)
  pcg_fused   — kernels/cg_fused.py K1+K2-PCG around the fused V-cycle
  mg_fused    — kernels/mg_fused.py K_down/K_up fused V-cycle legs
"""

from __future__ import annotations

import json
import sys
import time
import traceback


def _check(label: str, fn, results: dict) -> None:
    t0 = time.perf_counter()
    try:
        v = float(fn())
        ok = v == v and abs(v) != float("inf")  # finite
        results[label] = {"ok": bool(ok), "value": v, "s": round(time.perf_counter() - t0, 2)}
        if not ok:
            results[label]["error"] = f"non-finite result {v}"
    except Exception as e:  # noqa: BLE001 — record and continue
        results[label] = {
            "ok": False,
            "error": f"{type(e).__name__}: {e}"[:300],
            "s": round(time.perf_counter() - t0, 2),
        }
        traceback.print_exc()
    state = "ok" if results[label]["ok"] else "FAIL"
    print(f"smoke {label}: {state} ({results[label]['s']}s)", file=sys.stderr, flush=True)


def run_suite(x64: bool, results: dict) -> None:
    import jax

    jax.config.update("jax_enable_x64", x64)
    import jax.numpy as jnp

    from iterative_solvers_tpu.core.domain import Domain2D, Domain3D
    from iterative_solvers_tpu.core.problem import PoissonProblem
    from iterative_solvers_tpu.kernels.cg_fused import fused_cg_solve
    from iterative_solvers_tpu.kernels.stencil_pallas import PallasStencilOperator
    from iterative_solvers_tpu.kernels.stencil3d_pallas import Pallas3DStencilOperator
    from iterative_solvers_tpu.solvers.cg import CGOptions
    from iterative_solvers_tpu.solvers.multigrid import (
        MultigridPreconditioner,
        PaddedPreconditioner,
    )
    from iterative_solvers_tpu.solvers.stopping import StopConfig

    tag = f"x64={int(x64)}"
    # 1024² so the fused V-cycle has real fused levels (ny+1 >= 512)
    dom = Domain2D(nx=1024, ny=1024)
    prob = PoissonProblem.manufactured(dom)
    op = PallasStencilOperator.from_domain(dom, interpret=False)
    b = prob.rhs_field(jnp.float32)
    stop1 = StopConfig(max_iterations=1).disable_all_but_iterations()

    _check(f"stencil2d[{tag}]", lambda: jnp.sum(op(op.pad(b))), results)

    dom3 = Domain3D(nx=128, ny=128, nz=128)
    op3 = Pallas3DStencilOperator.from_domain(dom3, interpret=False)
    b3 = PoissonProblem.manufactured(dom3).rhs_field(jnp.float32)
    _check(f"stencil3d[{tag}]", lambda: jnp.sum(op3(op3.pad(b3))), results)

    _check(
        f"cg_fused[{tag}]",
        lambda: fused_cg_solve(op, b, options=CGOptions(stop=stop1)).residual_norm,
        results,
    )

    M = MultigridPreconditioner.from_domain(dom)  # fused legs on TPU
    Mp = PaddedPreconditioner(inner=M, padded_op=op)
    _check(
        f"pcg_fused[{tag}]",
        lambda: fused_cg_solve(
            op, b, options=CGOptions(stop=stop1, preconditioner=Mp)
        ).residual_norm,
        results,
    )

    _check(f"mg_fused[{tag}]", lambda: jnp.sum(jax.jit(M)(b)), results)

    # fused Jacobi-sweep kernel (FMG polish fast path, round 5)
    lev0 = M.levels[0]
    _check(
        f"mg_jacobi[{tag}]",
        lambda: jnp.sum(
            lev0.kernels.jacobi(lev0.pad_in(b), lev0.pad_in(b))
        ),
        results,
    )

    # fused ff-residual kernel (double-f32 outer fast path, round 5)
    from iterative_solvers_tpu.kernels.resid_ff import ff_residual_fn
    from iterative_solvers_tpu.ops.ddf32 import split_f64

    rf2 = ff_residual_fn(op, op.padded_shape)
    bp_pair = (
        split_f64(op.pad(b).astype(jnp.float64))
        if x64
        else (op.pad(b), jnp.zeros(op.padded_shape, jnp.float32))
    )
    _check(
        f"resid_ff2d[{tag}]",
        lambda: jnp.sum(sum(rf2(bp_pair, bp_pair))),
        results,
    )

    # 3D fused V-cycle legs (threshold ny+1 >= 128 at default fuse_min_extent)
    M3 = MultigridPreconditioner.from_domain(dom3)
    _check(f"mg_fused3d[{tag}]", lambda: jnp.sum(jax.jit(M3)(b3)), results)
    lev30 = M3.levels[0]
    _check(
        f"mg_jacobi3d[{tag}]",
        lambda: jnp.sum(
            lev30.kernels.jacobi(lev30.pad_in(b3), lev30.pad_in(b3))
        ),
        results,
    )

    rf3 = ff_residual_fn(op3, op3.padded_shape)
    b3p_pair = (
        split_f64(op3.pad(b3).astype(jnp.float64))
        if x64
        else (op3.pad(b3), jnp.zeros(op3.padded_shape, jnp.float32))
    )
    _check(
        f"resid_ff3d[{tag}]",
        lambda: jnp.sum(sum(rf3(b3p_pair, b3p_pair))),
        results,
    )

    # z-chunked variants: the chunked fused legs (block_z=4, ragged tail at
    # D=129) and the per-plane apply fallback (the auto stencil3d above is
    # already chunked at D=129 -> block_z=3)
    M3c = MultigridPreconditioner.from_domain(dom3, fuse_block_z=4)
    _check(f"mg_fused3d_chunked[{tag}]", lambda: jnp.sum(jax.jit(M3c)(b3)), results)
    op3p = Pallas3DStencilOperator.from_domain(dom3, interpret=False, block_z=1)
    _check(
        f"stencil3d_perplane[{tag}]", lambda: jnp.sum(op3p(op3p.pad(b3))), results
    )

    # custom-mask (int8 mask-operand) kernels: stencil, fused engine, V-cycle
    import numpy as np

    def _disk(ix, iy):
        n = 1024
        return (ix - n / 2) ** 2 + (iy - n / 2) ** 2 <= (0.45 * n) ** 2

    domc = Domain2D(nx=1024, ny=1024, shape="custom", inside_fn=_disk)
    probc = PoissonProblem.manufactured(domc)
    opc = PallasStencilOperator.from_domain(domc, interpret=False)
    bc = probc.rhs_field(jnp.float32)
    _check(f"stencil2d_custom[{tag}]", lambda: jnp.sum(opc(opc.pad(bc))), results)
    Mc = MultigridPreconditioner.from_domain(domc, fuse=True, interpret=False)
    _check(f"mg_fused_custom[{tag}]", lambda: jnp.sum(jax.jit(Mc)(bc)), results)
    Mcp = PaddedPreconditioner(inner=Mc, padded_op=opc)
    _check(
        f"pcg_fused_custom[{tag}]",
        lambda: fused_cg_solve(
            opc, bc, options=CGOptions(stop=stop1, preconditioner=Mcp)
        ).residual_norm,
        results,
    )

    # sharded fast path on a 1x1 mesh (real Mosaic lowering of the block
    # kernels + ppermute plumbing, single chip)
    from iterative_solvers_tpu.parallel import make_solver_mesh
    from iterative_solvers_tpu.parallel.halo_pallas import (
        ShardedPallasStencilOperator,
    )
    from iterative_solvers_tpu.parallel.mg_sharded import ShardedFusedMultigrid

    mesh1 = make_solver_mesh(1, (1, 1), devices=jax.devices()[:1])
    ops = ShardedPallasStencilOperator.from_domain(dom, mesh1, interpret=False)
    _check(f"sharded_stencil[{tag}]", lambda: jnp.sum(ops(ops.shard(b))), results)
    Ms = ShardedFusedMultigrid.from_operator(ops, dom, interpret=False)
    _check(
        f"sharded_mg_fused[{tag}]",
        lambda: jnp.sum(jax.jit(Ms)(ops.shard(b))),
        results,
    )
    # V-cycle with the fused (r, w) dot epilogue on the finest K_up
    _check(
        f"sharded_mg_dot[{tag}]",
        lambda: jax.jit(Ms.call_with_dot)(ops.shard(b))[1],
        results,
    )
    # sharded fused K1/K2 engine: two MSG iterations + two PCG iterations
    from iterative_solvers_tpu.parallel.cg_fused_sharded import (
        sharded_fused_cg_solve,
    )
    from iterative_solvers_tpu.solvers.stopping import StopConfig

    stop2 = StopConfig(eps_precision=-1, eps_residual=-1, max_iterations=2)
    _check(
        f"sharded_cg_engine[{tag}]",
        lambda: sharded_fused_cg_solve(
            ops, b, options=CGOptions(stop=stop2)
        ).residual_norm,
        results,
    )
    _check(
        f"sharded_pcg_engine[{tag}]",
        lambda: sharded_fused_cg_solve(
            ops, b, options=CGOptions(stop=stop2, preconditioner=Ms)
        ).residual_norm,
        results,
    )


def main() -> int:
    import jax

    dev = jax.devices()[0]
    results: dict = {}
    for x64 in (False, True):
        run_suite(x64, results)
    n_ok = sum(1 for r in results.values() if r["ok"])
    n = len(results)
    print(
        json.dumps(
            {
                "metric": "tpu_smoke_kernels_ok",
                "value": n_ok,
                "unit": f"kernels (of {n})",
                "vs_baseline": 1.0 if n_ok == n else 0.0,
                "device": getattr(dev, "device_kind", dev.platform),
                "detail": results,
            }
        )
    )
    return 0 if n_ok == n else 1


if __name__ == "__main__":
    raise SystemExit(main())
