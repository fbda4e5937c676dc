"""CG solver-state checkpoint / resume.

The reference persists only *results* (SURVEY §5: "no solver-state
checkpointing"); this module adds real mid-solve checkpointing for long runs:
the full :class:`~iterative_solvers_tpu.solvers.cg.CGState` (x, r, z,
iteration counter, norms) round-trips through an ``.npz`` file, and
``cg_solve(..., init_state=...)`` continues exactly where the saved run
stopped — the CG recurrence is self-contained in (x, r, z, rz, r_norm2).

Typical wiring::

    opts = CGOptions(state_callback=periodic_checkpointer("ckpt.npz", every_s=60))
    cg_solve(A, b, options=opts)
    # later / elsewhere:
    state = load_cg_state("ckpt.npz")
    cg_solve(A, b, options=opts2, init_state=state)
"""

from __future__ import annotations

import os
import time
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from iterative_solvers_tpu.solvers.cg import CGState

_ARRAY_FIELDS = ("x", "r", "z")
_SCALAR_FIELDS = (
    "k",
    "done",
    "reason",
    "rz",
    "r_norm2",
    "prec_max",
    "r_max",
    "err_max",
    "r0_norm",
)


def save_cg_state(path: str, state: CGState) -> None:
    data = {f: np.asarray(getattr(state, f)) for f in _ARRAY_FIELDS + _SCALAR_FIELDS}
    tmp = f"{path}.tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **data)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint


def load_cg_state(path: str, dtype=None) -> CGState:
    z = np.load(path)
    dt = dtype or z["x"].dtype

    def arr(f):
        return jnp.asarray(z[f], dtype=dt)

    return CGState(
        x=arr("x"),
        r=arr("r"),
        z=arr("z"),
        k=jnp.asarray(int(z["k"]), jnp.int32),
        done=jnp.asarray(bool(z["done"])),
        reason=jnp.asarray(int(z["reason"]), jnp.int32),
        rz=arr("rz"),
        r_norm2=arr("r_norm2"),
        prec_max=arr("prec_max"),
        r_max=arr("r_max"),
        err_max=arr("err_max"),
        r0_norm=arr("r0_norm"),
    )


def periodic_checkpointer(path: str, every_s: float = 60.0,
                          every_iters: Optional[int] = None) -> Callable[[CGState], None]:
    """A ``CGOptions.state_callback`` that writes atomically every
    ``every_s`` seconds (or every ``every_iters`` iterations)."""
    last = {"t": time.monotonic(), "k": 0}

    def cb(state: CGState) -> None:
        k = int(state.k)
        due = (
            time.monotonic() - last["t"] >= every_s
            if every_iters is None
            else k - last["k"] >= every_iters
        )
        if due:
            save_cg_state(path, state)
            last["t"] = time.monotonic()
            last["k"] = k

    return cb
