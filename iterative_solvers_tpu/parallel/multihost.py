"""Multi-host / multi-slice support: jax.distributed entry + hybrid DCN×ICI
meshes.

The reference is strictly single-process (SURVEY §2.4: "no distributed
parallelism of any kind"); scaling past one host is a new capability with no
counterpart to port. The TPU-native design (BASELINE config "8192²
row-partitioned multi-host"):

- every participating process calls :func:`initialize_distributed` once at
  startup (standard JAX multi-controller: one coordinator, N processes, each
  owning its local chips);
- :func:`make_hybrid_mesh` builds a 3-axis ``('slice', 'y', 'x')`` mesh with
  the slice/host axis OUTERMOST: fields shard their row dim over the combined
  ``('slice', 'y')`` axes and their column dim over ``'x'``, so each slice
  owns a contiguous band of grid rows. A stencil apply then needs exactly one
  halo row across each slice boundary per step — the only DCN traffic in the
  whole solve (CG scalars all-reduce hierarchically; XLA routes the intra-
  slice phase over ICI).

The halo operator (parallel/halo.py) is unchanged: its ppermutes simply run
over the combined row axis — `lax` collectives accept axis-name tuples, and
GSPMD partitions the per-boundary pairs onto ICI or DCN by device placement.
Everything here also runs single-process on a virtual CPU mesh (tests,
dryrun) by splitting the device list into even synthetic "slices".
"""

from __future__ import annotations

import math
import os
from typing import Optional, Sequence, Tuple

import numpy as np
from jax.sharding import Mesh


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Join (or skip joining) a multi-controller JAX run.

    Thin wrapper over ``jax.distributed.initialize``: arguments default to
    the standard environment (JAX_COORDINATOR_ADDRESS / NUM_PROCESSES /
    PROCESS_ID, or the TPU pod metadata on Cloud TPU). A no-op when already
    initialized or when nothing indicates a multi-process run — safe to call
    unconditionally at CLI/bench startup.
    """
    import jax
    from jax._src import distributed as _dist

    # NB: must not touch jax.devices()/process_count() here — any backend
    # query initializes XLA and makes distributed.initialize impossible.
    if getattr(_dist.global_state, "client", None) is not None:
        return  # already joined a multi-controller run
    env = os.environ
    coordinator_address = coordinator_address or env.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and env.get("JAX_NUM_PROCESSES"):
        num_processes = int(env["JAX_NUM_PROCESSES"])
    if process_id is None and env.get("JAX_PROCESS_ID"):
        process_id = int(env["JAX_PROCESS_ID"])
    explicit = coordinator_address is not None and num_processes is not None
    on_tpu_pod = env.get("TPU_WORKER_HOSTNAMES") or env.get("MEGASCALE_COORDINATOR_ADDRESS")
    if not explicit and not on_tpu_pod:
        return  # single-process run
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def _slice_groups(devices) -> dict:
    """Group devices by slice: TPU ``slice_index`` when it distinguishes
    anything, else the owning process — the boundaries across which traffic
    is DCN, not ICI. (CPU devices report slice_index 0 across all processes,
    so a degenerate slice grouping falls back to processes.)"""

    def group_by(key_fn):
        groups: dict = {}
        for d in devices:
            groups.setdefault(key_fn(d), []).append(d)
        return dict(sorted(groups.items()))

    groups = group_by(lambda d: getattr(d, "slice_index", None))
    if len(groups) == 1:
        by_proc = group_by(lambda d: d.process_index)
        if len(by_proc) > 1:
            return by_proc
    return groups


def _near_square(n: int) -> Tuple[int, int]:
    a = int(math.isqrt(n))
    while n % a:
        a -= 1
    return (n // a, a)


def make_hybrid_mesh(
    n_slices: Optional[int] = None,
    ici_shape: Optional[Tuple[int, int]] = None,
    axis_names: Tuple[str, str, str] = ("slice", "y", "x"),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """A ``(slice, y, x)`` hybrid mesh, slice axis outermost.

    Slices come from the hardware topology (``slice_index`` / process); on a
    single-process virtual mesh pass ``n_slices`` to split the device list
    into even synthetic slices so the hybrid program structure — combined-axis
    halo ppermutes, hierarchical reductions — compiles and runs anywhere.
    ``ici_shape`` defaults to a near-square factorization of the per-slice
    device count (halo bytes scale with block perimeter).
    """
    import jax

    devs = list(devices) if devices is not None else jax.devices()
    groups = _slice_groups(devs)
    if len(groups) == 1 and n_slices and n_slices > 1:
        if len(devs) % n_slices:
            raise ValueError(f"{len(devs)} devices do not split into {n_slices} slices")
        per = len(devs) // n_slices
        groups = {s: devs[s * per : (s + 1) * per] for s in range(n_slices)}
    if n_slices is not None and len(groups) != n_slices:
        raise ValueError(f"asked for {n_slices} slices, topology has {len(groups)}")
    sizes = {len(g) for g in groups.values()}
    if len(sizes) != 1:
        raise ValueError(f"uneven slices: {sorted(sizes)} devices per slice")
    per = sizes.pop()
    ici_shape = ici_shape or _near_square(per)
    if ici_shape[0] * ici_shape[1] != per:
        raise ValueError(f"ici_shape {ici_shape} != {per} devices per slice")
    arr = np.empty((len(groups),) + tuple(ici_shape), dtype=object)
    for i, g in enumerate(groups.values()):
        arr[i] = np.asarray(g, dtype=object).reshape(ici_shape)
    return Mesh(arr, axis_names)
