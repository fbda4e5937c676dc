"""Conjugate-gradient solver, compiled as a chunked `lax.while_loop`.

TPU-native re-design of the reference's MSGSolver hot loop
(reference solver/msg_solver.cpp:80-184):

- The whole CG iteration — operator apply, dots, axpys, all stop-criterion
  norms — is one `lax.while_loop` body compiled once by XLA. The reference's
  per-call host mirror copies in dot/norm (msg_solver.cpp:215-258, its
  dominant overhead) have no analogue here: everything stays on device.
- Host interaction (iteration callbacks, cooperative interrupt, reference
  msg_solver.cpp:82-87 and :172-183) happens *between chunks*: the driver
  runs the compiled loop up to the next callback boundary, syncs a few
  scalars, fires callbacks, checks the stop flag, and re-enters. One compile
  serves every chunk because the chunk boundary is a traced argument.
- Works on any array shape: full-grid masked fields (matrix-free stencil
  path) or compacted vectors (explicit sparse path). Dot products contract
  over everything; masked entries are identically zero so both views agree
  with the reference's compacted arithmetic exactly.

Recurrence parity: with ``beta_kind='msg'`` this is the reference recurrence
x0=0, r=b, z=r, alpha=(r,z)/(Az,z), beta=‖r_new‖²/(r,z)
(msg_solver.cpp:33-39,96-102,165-169), which the golden tests match against
py_debug.txt to f64 round-off. ``beta_kind='fr'`` is the textbook
Fletcher–Reeves form used by the reference's matrix-free solver
(matrix_free_system.cpp:431-438). With a preconditioner, standard PCG.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field as dataclass_field
from functools import partial
from typing import Any, Callable, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from iterative_solvers_tpu.solvers.stopping import StopConfig, StopReason

Array = jnp.ndarray
Operator = Callable[[Array], Array]


class CGState(NamedTuple):
    x: Array
    r: Array
    z: Array  # descent direction (preconditioned direction p for PCG)
    k: Array  # int32 iterations done
    done: Array  # bool: a stop criterion fired
    reason: Array  # int32 StopReason value
    rz: Array  # (r, z) of the *current* residual/direction pair (PCG carry)
    r_norm2: Array  # ‖r‖² after the last update (fr beta, relative criterion)
    prec_max: Array  # ‖x_k − x_{k−1}‖∞
    r_max: Array  # ‖r‖∞
    err_max: Array  # ‖x − u_true‖∞ (inf when no true solution given)
    r0_norm: Array  # ‖r₀‖₂, for the relative criterion
    # Fused-PCG carries (kernels/cg_fused.py): w = M(r) for the current
    # residual, and the previous (r, w) for the deferred beta. None (empty
    # pytree leaves) on every other path.
    w: Optional[Array] = None
    rz_prev: Optional[Array] = None


def _dot(a: Array, b: Array) -> Array:
    return jnp.sum(a * b)


def _maxabs(a: Array) -> Array:
    return jnp.max(jnp.abs(a))


@jax.jit
def _pack_stats(state: "CGState") -> Array:
    """Pack the per-chunk progress scalars into ONE device array so the host
    pays a single transfer per chunk. Over a tunneled TPU each separate
    scalar fetch is a full round-trip (~100 ms); the reference's host-side
    per-iteration copies (msg_solver.cpp:215-258) are the same disease."""
    f = jnp.promote_types(state.r_max.dtype, jnp.float32)
    return jnp.stack(
        [
            state.k.astype(f),  # exact to 2^24 (f32) / 2^53 (f64) iterations
            state.done.astype(f),
            state.reason.astype(f),
            state.prec_max.astype(f),
            state.r_max.astype(f),
            state.err_max.astype(f),
            state.r_norm2.astype(f),
            state.r0_norm.astype(f),
        ]
    )


def _sync_stats(state: "CGState"):
    v = np.asarray(_pack_stats(state))
    return (
        int(v[0]),
        bool(v[1]),
        int(v[2]),
        float(v[3]),
        float(v[4]),
        float(v[5]),
        float(v[6]),
        float(v[7]),
    )


@partial(jax.jit, static_argnums=(0, 1))
def _cg_init(A, M, b, x0, u_true) -> CGState:
    """Initial CG state as ONE compiled program. Eager construction would
    dispatch every init op (including a whole preconditioner application)
    individually — hundreds of tunnel round-trips on a remote TPU."""
    if x0 is None:
        x = jnp.zeros_like(b)
        r = b  # reference: x0 = 0 ⇒ r = b (msg_solver.cpp:33-39)
    else:
        x = x0
        r = b - A(x0)
    z = M(r) if M is not None else jnp.copy(r)
    rz0 = _dot(r, z)
    r2_0 = _dot(r, r)
    err0 = _maxabs(x - u_true) if u_true is not None else jnp.asarray(jnp.inf, b.dtype)
    # jit outputs are fresh buffers, so the r/z/b aliasing above is safe under
    # the chunk's donation (no two state leaves share a buffer, and the
    # caller's b/x0 stay alive)
    return CGState(
        x=x,
        r=r,
        z=z,
        k=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
        reason=jnp.asarray(int(StopReason.ITERATIONS), jnp.int32),
        rz=rz0,
        r_norm2=r2_0,
        prec_max=jnp.asarray(jnp.inf, b.dtype),
        r_max=_maxabs(r),
        err_max=err0,
        r0_norm=jnp.sqrt(r2_0),
    )


@partial(jax.jit, static_argnums=(0, 1, 2, 3), donate_argnums=(4,))
def _cg_chunk(A, M, stop: StopConfig, beta_kind: str, state: CGState, u_true, k_stop):
    """Run CG iterations until a stop criterion fires or k reaches k_stop.

    The state is donated: x/r/z buffers are reused in place across chunks,
    which matters at scale (three 0.5-1 GB fields at 8192²/512³). The driver
    (cg_solve) rebinds its only reference on return; a user-held init_state
    is defensively copied there."""

    big = jnp.asarray(jnp.inf, state.r.dtype)

    def body(s: CGState) -> CGState:
        Az = A(s.z)
        Azz = _dot(Az, s.z)
        if M is None:
            rz = _dot(s.r, s.z)
        else:
            rz = s.rz
        alpha = rz / Azz
        x = s.x + alpha * s.z
        r = s.r - alpha * Az

        r2 = _dot(r, r)
        r_max = _maxabs(r)
        prec_max = jnp.abs(alpha) * _maxabs(s.z)
        if u_true is not None:
            err_max = _maxabs(x - u_true)
        else:
            err_max = big

        # Stop checks, reference priority order (msg_solver.cpp:144-162).
        false = jnp.asarray(False)
        done_p = (prec_max < stop.eps_precision) if stop.eps_precision > 0 else false
        done_r = (r_max < stop.eps_residual) if stop.eps_residual > 0 else false
        done_e = (
            (err_max < stop.eps_exact_error)
            if (stop.eps_exact_error > 0 and u_true is not None)
            else false
        )
        done_rel = (
            (jnp.sqrt(r2) < stop.eps_relative * s.r0_norm)
            if stop.eps_relative > 0
            else false
        )
        # Failure detection (no analogue in the reference): a non-finite
        # residual norm means the recurrence blew up (indefinite operator,
        # overflow) — stop immediately instead of iterating on NaNs.
        done_div = ~jnp.isfinite(r2)
        reason = jnp.where(
            done_div,
            int(StopReason.DIVERGED),
            jnp.where(
                done_p,
                int(StopReason.PRECISION),
                jnp.where(
                    done_r,
                    int(StopReason.RESIDUAL),
                    jnp.where(
                        done_e,
                        int(StopReason.EXACT_ERROR),
                        jnp.where(
                            done_rel,
                            int(StopReason.RELATIVE_RESIDUAL),
                            int(StopReason.ITERATIONS),
                        ),
                    ),
                ),
            ),
        ).astype(jnp.int32)
        done = done_p | done_r | done_e | done_rel | done_div

        # Direction update.
        if M is None:
            if beta_kind == "msg":
                beta = r2 / rz  # reference msg_solver.cpp:165
            elif beta_kind == "fr":
                beta = r2 / s.r_norm2  # reference matrix_free_system.cpp:431
            else:
                raise ValueError(f"unknown beta_kind {beta_kind!r}")
            z = r + beta * s.z
            rz_new = r2  # informational
        else:
            w = M(r)
            rz_new = _dot(r, w)
            beta = rz_new / rz
            z = w + beta * s.z

        return CGState(
            x=x,
            r=r,
            z=z,
            k=s.k + 1,
            done=done,
            reason=reason,
            rz=rz_new,
            r_norm2=r2,
            prec_max=prec_max,
            r_max=r_max,
            err_max=err_max,
            r0_norm=s.r0_norm,
        )

    def cond(s: CGState):
        # r_norm2 == 0 means x is already exact — iterating would divide 0/0.
        # The driver detects the resulting no-progress chunk and stops.
        return (~s.done) & (s.k < k_stop) & (s.r_norm2 > 0)

    return jax.lax.while_loop(cond, body, state)


@partial(jax.jit, static_argnums=(0, 2))
def cg_run(A, b, n_iters: int):
    """Fixed-iteration MSG-CG (x0 = 0), fully fused: no stop criteria, no
    host sync — the pure compute core, for benchmarking and compile checks.
    Returns (x, ‖r‖²)."""

    def body(_, carry):
        x, r, z = carry
        Az = A(z)
        rz = _dot(r, z)
        alpha = rz / _dot(Az, z)
        x = x + alpha * z
        r = r - alpha * Az
        beta = _dot(r, r) / rz
        z = r + beta * z
        return (x, r, z)

    x, r, z = jax.lax.fori_loop(0, n_iters, body, (jnp.zeros_like(b), b, b))
    return x, _dot(r, r)


@dataclass
class CGOptions:
    """Solver options; defaults mirror the reference DirichletSolver
    (solver/dirichlet_solver.cpp:14-16)."""

    stop: StopConfig = dataclass_field(default_factory=StopConfig)
    beta_kind: str = "msg"  # 'msg' | 'fr'
    preconditioner: Optional[Operator] = None
    callback: Optional[Callable[[int, float, float, float], None]] = None
    callback_every: int = 100  # reference trace cadence (msg_solver.cpp:172)
    chunk_size: Optional[int] = None  # iterations per device round-trip
    stop_requested: Optional[Callable[[], bool]] = None  # cooperative interrupt
    record_history: bool = False
    # Fired at every chunk sync with the full device state — checkpointing
    # hook (the reference has no solver-state checkpointing, SURVEY §5; this
    # is the long-run resume capability built on top of the chunked driver).
    state_callback: Optional[Callable[["CGState"], None]] = None
    # Alternative compiled chunk runner (state, u_true, k_stop) -> state,
    # e.g. the fused Pallas engine (kernels/cg_fused.py). When set, the
    # driver's host protocol (callbacks, interrupt, checkpointing, result
    # assembly) is reused around it unchanged.
    chunk_fn: Optional[Callable] = None
    # Observability (profiling.py): per-phase timings + iteration counters.
    profiler: Optional[Any] = None


@dataclass
class CGResult:
    """Converged-state summary, the reference's report fields
    (msg_solver.cpp:186-195, 261-304) as data."""

    x: Array
    iterations: int
    converged: bool
    reason: StopReason
    precision_max: float
    residual_max: float
    error_max: float
    residual_norm: float  # ‖r‖₂
    initial_residual_norm: float
    elapsed_s: float
    history: Optional[np.ndarray] = None  # rows: (iter, prec∞, r∞, err∞, ‖r‖₂)

    def report(self) -> str:
        from iterative_solvers_tpu.report import cg_report

        return cg_report(self)


def cg_solve(
    A: Operator,
    b: Array,
    *,
    x0: Optional[Array] = None,
    u_true: Optional[Array] = None,
    options: Optional[CGOptions] = None,
    init_state: Optional[CGState] = None,
) -> CGResult:
    """Solve ``A x = b`` by (preconditioned) conjugate gradients.

    ``A`` must be a hashable callable (the framework's operator dataclasses
    are); ``b``, ``x0``, ``u_true`` share one shape — full-grid fields or
    compacted vectors. Pass ``init_state`` (e.g. from
    :func:`iterative_solvers_tpu.solvers.checkpoint.load_cg_state`) to resume
    a previous run. Returns a :class:`CGResult`.
    """
    import contextlib

    opts = options or CGOptions()
    stop = opts.stop
    M = opts.preconditioner
    prof = opts.profiler
    phase = prof.phase if prof is not None else (lambda name: contextlib.nullcontext())
    if prof is not None and "nnz_per_apply" not in prof.counters and hasattr(A, "nnz"):
        # guard, don't setdefault: nnz() pulls the interior mask to the host
        # (tens of MB over a TPU tunnel) and must run at most once
        prof.counters["nnz_per_apply"] = float(A.nnz())

    t0 = time.perf_counter()
    if init_state is not None:
        # _cg_chunk donates the state; keep the caller's arrays alive
        state = jax.tree.map(jnp.copy, init_state)
    else:
        with phase("setup"):
            state = _cg_init(A, M, b, x0, u_true)

    history: List[Tuple[float, ...]] = []

    def fire(k: int, prec: float, rmax: float, emax: float, rn: float) -> None:
        if opts.callback is not None:
            opts.callback(k, prec, rmax, emax)
        if opts.record_history:
            history.append((k, prec, rmax, emax, rn))

    interactive = opts.callback is not None or opts.record_history
    if interactive or init_state is not None:
        # ONE host sync for the whole iteration-0 protocol (reference
        # msg_solver.cpp:75-77) + the zero-residual early-out check.
        k, _, _, prec, rmax, emax, r2, r0n = _sync_stats(state)
        if k == 0:
            prec = math.inf
        fire(k, prec, rmax, emax, r0n if k == 0 else math.sqrt(max(r2, 0.0)))

        if r2 == 0.0:  # x0 already exact; avoid 0/0 in the loop
            return _make_result(
                state, k, StopReason.RESIDUAL, True, prec, rmax, emax, r2, r0n,
                t0, history, opts,
            )
    else:
        # Nobody listens: skip the init round-trip entirely (it costs a full
        # tunnel RTT + the init program's completion wait per solve — the
        # dominant overhead of short preconditioned inner solves). The
        # zero-residual case is caught below as a no-progress chunk.
        # Stats stay unsynced until the first chunk; seed them so an interrupt
        # before any chunk still yields a well-formed INTERRUPTED result.
        k = 0
        prec = rmax = emax = math.inf
        r2 = r0n = float("nan")

    max_iter = stop.max_iterations
    cb_every = max(1, opts.callback_every)
    chunk = opts.chunk_size or (cb_every if opts.callback else min(max_iter, 500))

    interrupted = False
    reason = StopReason.ITERATIONS
    while k < max_iter:
        if opts.stop_requested is not None and opts.stop_requested():
            # reference msg_solver.cpp:82-87: checked at iteration top
            interrupted = True
            reason = StopReason.INTERRUPTED
            break
        if opts.callback is not None:
            # Boundaries at 1, cb_every, 2*cb_every, … (reference cadence
            # `iterationsDone % 100 == 0 || iterationsDone == 1`).
            k_stop = 1 if k == 0 else min((k // cb_every + 1) * cb_every, max_iter)
        else:
            k_stop = min(k + chunk, max_iter)
        k_prev = k
        with phase("cg_chunk"):
            if opts.chunk_fn is not None:
                state = opts.chunk_fn(state, u_true, jnp.asarray(k_stop, jnp.int32))
            else:
                state = _cg_chunk(
                    A, M, stop, opts.beta_kind, state, u_true, jnp.asarray(k_stop, jnp.int32)
                )
            # One packed transfer per chunk — never per-scalar round-trips.
            # (The fetch also forces chunk completion, so the phase timing is
            # the real device time, not async-dispatch time.)
            k, done, reason_code, prec, rmax, emax, r2, r0n = _sync_stats(state)
        if prof is not None:
            prof.count("iterations", k - k_prev)
            prof.count("operator_applies", k - k_prev)
        if opts.state_callback is not None:
            opts.state_callback(state)
        if done:
            reason = StopReason(reason_code)
            break
        if k == k_prev:
            # no progress without a stop flag: the r == 0 guard fired — the
            # iterate is already exact
            reason = StopReason.RESIDUAL
            fire(k, prec, rmax, emax, math.sqrt(max(r2, 0.0)))
            return _make_result(
                state, k, reason, True, prec, rmax, emax, r2, r0n, t0, history, opts
            )
        if opts.callback is not None or opts.record_history:
            fire(k, prec, rmax, emax, math.sqrt(max(r2, 0.0)))

    converged = reason.converged and not interrupted
    # Final callback (reference msg_solver.cpp:192-195, unconditional).
    fire(k, prec, rmax, emax, math.sqrt(max(r2, 0.0)))
    return _make_result(
        state, k, reason, converged, prec, rmax, emax, r2, r0n, t0, history, opts
    )


def _make_result(
    state, k, reason, converged, prec, rmax, emax, r2, r0n, t0, history, opts
) -> CGResult:
    return CGResult(
        x=state.x,
        iterations=k,
        converged=bool(converged),
        reason=reason,
        precision_max=prec,
        residual_max=rmax,
        error_max=emax,
        residual_norm=math.sqrt(max(r2, 0.0)),
        initial_residual_norm=r0n,
        elapsed_s=time.perf_counter() - t0,
        history=np.asarray(history) if opts.record_history else None,
    )
