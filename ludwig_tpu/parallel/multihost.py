"""Multi-host (pod-scale) bootstrap: the reference's MPI process model
mapped onto JAX's multi-process runtime.

The reference launches one MPI rank per node/GPU and wires them into a
3-D Cartesian communicator (ref: src/pe.c:26-80 pe_create,
src/coords.c:151-257 decomposition).  The TPU-native equivalent is one
JAX *process* per host, joined through ``jax.distributed.initialize``;
after that, ``jax.devices()`` spans every chip of the slice/pod and a
single ``Mesh`` over those devices replaces the Cartesian communicator.
All halo traffic then rides ICI within a slice (collective-permutes
emitted by GSPMD or the explicit ppermutes of the fused kernel's pad
exchange, ops/fused.py:417) and DCN between slices, with no hand-written
pack/unpack (ref counterpart: src/halo_swap.c:709).

Usage (one call near the top of the driver, before any array creation)::

    from ludwig_tpu.parallel import multihost
    multihost.init()                 # no-op on one host / one process
    mesh = multihost.pod_mesh()      # 3-D mesh over the whole job

On Cloud TPU pods, ``jax.distributed.initialize()`` auto-discovers the
coordinator and process ids from the TPU metadata; on other clusters the
standard env vars (COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID) or
explicit arguments are honoured.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from ludwig_tpu.parallel.mesh import LATTICE_AXES

_initialized = False


def init(coordinator_address: Optional[str] = None,
         num_processes: Optional[int] = None,
         process_id: Optional[int] = None) -> bool:
    """Join the multi-process JAX runtime.  Returns True if a
    multi-process group was formed, False for the single-process case.

    Mirrors pe_create (ref: src/pe.c:26): afterwards, rank-0-only
    logging should consult :func:`is_rank0`.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1

    if coordinator_address is None:
        coordinator_address = os.environ.get("COORDINATOR_ADDRESS")
    if num_processes is None:
        n = os.environ.get("NUM_PROCESSES")
        num_processes = int(n) if n else None
    if process_id is None:
        p = os.environ.get("PROCESS_ID")
        process_id = int(p) if p else None

    multi = (coordinator_address is not None
             or (num_processes or 0) > 1
             or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS") is not None)
    if multi:
        from jax._src import xla_bridge
        if xla_bridge.backends_are_initialized():
            raise RuntimeError(
                "ludwig_tpu.parallel.multihost.init() must run before "
                "any other JAX call (like the reference's pe_create "
                "before MPI use, ref: main.c:30)")
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    _initialized = True
    return jax.process_count() > 1


def is_rank0() -> bool:
    """True on the process that should write the log (ref: pe_info)."""
    return jax.process_index() == 0


def _factor3(n: int) -> tuple:
    """Near-cubic 3-way factorisation of n, largest factor first (the
    reference's default decomposition heuristic, ref: coords.c
    cs_cart_default)."""
    best = (n, 1, 1)
    for px in range(1, n + 1):
        if n % px:
            continue
        m = n // px
        for py in range(1, m + 1):
            if m % py:
                continue
            pz = m // py
            cand = tuple(sorted((px, py, pz), reverse=True))
            if max(cand) - min(cand) < max(best) - min(best):
                best = cand
    return best


def pod_mesh(grid: Optional[Sequence[int]] = None,
             devices=None) -> Mesh:
    """A 3-D lattice mesh over every device of the (multi-host) job.

    grid=None picks a near-cubic factorisation with the slowest mesh
    axis ('x') spanning hosts, so that the x-halo — one face slab per
    step — is the only traffic that may cross DCN, while the denser y/z
    exchanges stay on intra-host ICI.  This mirrors the reference's
    guidance of putting the largest decomposition factor on the
    outermost axis (ref: coords.c default decomposition).
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if grid is None:
        grid = _factor3(n)
    grid = tuple(int(g) for g in grid)
    if int(np.prod(grid)) != n:
        raise ValueError(f"grid {grid} != {n} devices")
    # jax.devices() orders devices process-major: reshaping puts the
    # leading ('x') axis across processes/hosts as intended.
    dev_array = np.asarray(devices).reshape(grid)
    return Mesh(dev_array, LATTICE_AXES)
