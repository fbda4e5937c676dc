"""Headline benchmark: matrix-free stencil-SpMV throughput (nnz/s) per chip.

BASELINE.md north-star metric ("stencil-SpMV nnz/s per chip") on the 8192²
Г-domain Dirichlet-Poisson operator, using the Pallas stencil kernel.
Prints exactly ONE JSON line:
{"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

vs_baseline = measured / (70% of the chip's bandwidth roofline); the
BASELINE.json target is ">= 70% of roofline stencil-SpMV bandwidth", so
vs_baseline >= 1.0 means the target is met. Roofline model: one 4 B read +
one 4 B write + one mask byte per grid node.

Timing methodology (see NOTES_PERF.md): the apply is chained inside an
on-device fori_loop with a *traced* trip count (static counts let XLA fuse
the chain), and completion is forced by fetching a scalar — block_until_ready
is a no-op over the axon tunnel.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _hbm_bandwidth_bytes(device_kind: str) -> float:
    k = device_kind.lower()
    if "v5 lite" in k or "v5e" in k or "v5lite" in k:
        return 819e9
    if "v5p" in k or "v5" in k:
        return 2765e9
    if "v6 lite" in k or "v6e" in k:
        return 1638e9
    if "v4" in k:
        return 1228e9
    if "v3" in k:
        return 900e9
    return 819e9  # conservative default


def _bench_cg_fused(n: int) -> None:
    """Alternative metric (BENCH_MODE=cg): fused-CG iteration rate. Reported
    as effective nnz/s of the two stencil evaluations per iteration."""
    import jax
    import jax.numpy as jnp

    from iterative_solvers_tpu.core.domain import Domain2D
    from iterative_solvers_tpu.core.problem import PoissonProblem
    from iterative_solvers_tpu.kernels.cg_fused import FusedCGEngine, _fused_chunk
    from iterative_solvers_tpu.kernels.stencil_pallas import PallasStencilOperator
    from iterative_solvers_tpu.ops.stencil import StencilOperator
    from iterative_solvers_tpu.solvers.cg import CGState
    from iterative_solvers_tpu.solvers.stopping import StopConfig, StopReason

    dom = Domain2D(nx=n, ny=n)
    op = PallasStencilOperator.from_domain(dom)
    b = op.pad(PoissonProblem.manufactured(dom).rhs_field(jnp.float32))
    engine = FusedCGEngine(op)
    stop = StopConfig(max_iterations=10**9).disable_all_but_iterations()
    r2_0 = jnp.sum(b * b)
    state = CGState(
        x=jnp.zeros_like(b), r=b, z=jnp.zeros_like(b),
        k=jnp.asarray(0, jnp.int32), done=jnp.asarray(False),
        reason=jnp.asarray(int(StopReason.ITERATIONS), jnp.int32),
        rz=jnp.asarray(1.0, jnp.float32), r_norm2=r2_0,
        prec_max=jnp.asarray(jnp.inf, jnp.float32), r_max=jnp.max(jnp.abs(b)),
        err_max=jnp.asarray(jnp.inf, jnp.float32), r0_norm=jnp.sqrt(r2_0),
    )

    def run(k):
        s = _fused_chunk(engine, stop, state, None, jnp.asarray(k, jnp.int32))
        return float(s.r_norm2)

    run(2)
    t = {}
    for K in (5, 25):
        t0 = time.perf_counter()
        run(K)
        t[K] = time.perf_counter() - t0
    per = (t[25] - t[5]) / 20
    nnz = StencilOperator.from_domain(dom).nnz()
    print(
        json.dumps(
            {
                "metric": f"fused_cg_iteration_ms_{n}x{n}",
                "value": per * 1e3,
                "unit": "ms/iteration",
                "vs_baseline": 6.90 / (per * 1e3),  # vs the XLA-fused jnp path
            }
        )
    )


def main() -> None:
    import jax
    import jax.numpy as jnp

    from iterative_solvers_tpu.core.domain import Domain2D
    from iterative_solvers_tpu.ops.stencil import StencilOperator
    from iterative_solvers_tpu.kernels.stencil_pallas import PallasStencilOperator

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    n = int(os.environ.get("BENCH_N", "8192" if on_tpu else "256"))
    if os.environ.get("BENCH_MODE") == "cg":
        _bench_cg_fused(n)
        return

    dom = Domain2D(nx=n, ny=n)
    op = PallasStencilOperator.from_domain(dom)
    nnz = StencilOperator.from_domain(dom).nnz()
    n_grid = (n + 1) * (n + 1)

    @jax.jit
    def chain(a, k):
        # scale each apply so values stay finite across iterations; the
        # multiply fuses into the kernel epilogue
        y = jax.lax.fori_loop(0, k, lambda _, v: op(v) * 7e-6, a)
        return jnp.sum(y)

    x = jnp.ones(op.padded_shape, jnp.float32)
    float(chain(x, jnp.asarray(2)))  # compile + warm

    def run(k: int) -> float:
        t0 = time.perf_counter()
        float(chain(x, jnp.asarray(k)))
        return time.perf_counter() - t0

    # Calibrate so each measurement is long enough that the two-point
    # difference beats dispatch/tunnel noise, even on tiny grids.
    per_est = max(run(8) / 8, 1e-7)
    k_lo = max(8, int(0.15 / per_est))
    k_hi = 4 * k_lo
    per_apply = -1.0
    for _ in range(4):  # retry with more reps if noise still wins
        t_lo = min(run(k_lo) for _ in range(3))
        t_hi = min(run(k_hi) for _ in range(3))
        per_apply = (t_hi - t_lo) / (k_hi - k_lo)
        if per_apply > 0:
            break
        k_lo, k_hi = k_hi, 4 * k_hi

    nnz_per_s = nnz / per_apply
    bw = _hbm_bandwidth_bytes(getattr(dev, "device_kind", ""))
    roofline_nnz_per_s = nnz * bw / (9.0 * n_grid)
    baseline = 0.7 * roofline_nnz_per_s

    print(
        f"bench: {getattr(dev, 'device_kind', dev.platform)} n={n} "
        f"block_rows={op.block_rows} t={per_apply*1e3:.3f} ms/apply, "
        f"{nnz_per_s/1e9:.1f} Gnnz/s, 0.7*roofline {baseline/1e9:.1f} Gnnz/s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"stencil_spmv_nnz_per_s_{n}x{n}",
                "value": nnz_per_s,
                "unit": "nnz/s",
                "vs_baseline": nnz_per_s / baseline,
            }
        )
    )


if __name__ == "__main__":
    main()
