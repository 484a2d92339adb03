"""Device mesh and lattice sharding (the MPI Cartesian decomposition,
re-done the TPU way).

TPU-native equivalent of the reference's 3-D MPI domain decomposition +
halo machinery (ref: src/coords.c:151-257, src/halo_swap.c, model.c halo).
Instead of explicit pack/Isend/Irecv halos, lattice arrays carry a
``NamedSharding`` P(None, 'x', 'y', 'z') over a 3-D ``jax.sharding.Mesh``;
the per-velocity rolls in streaming and the stencil shifts in the
finite-difference modules compile to XLA collective-permutes of face slabs
over ICI.  Global reductions for statistics become cross-replica sums the
compiler emits from ordinary ``jnp.sum`` on sharded arrays.

The user-facing knob mirrors the reference input: ``grid Px_Py_Pz``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

LATTICE_AXES = ("x", "y", "z")


def default_devices():
    """Devices of the platform actually computing: when a default device
    is configured (tests pin CPU while a TPU platform is registered),
    the mesh must be built from THAT platform's devices, not the
    highest-priority backend's."""
    dd = jax.config.jax_default_device
    if dd is not None:
        return jax.devices(dd.platform)
    return jax.devices()


def make_mesh(grid: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    """Build a 3-D device mesh with shape grid = (Px, Py, Pz).

    With grid=None, all available devices are laid along x (slab
    decomposition), which keeps each shard's trailing (Y, Z) plane large
    and TPU-tile friendly.
    """
    devices = devices if devices is not None else default_devices()
    n = len(devices)
    if grid is None:
        grid = (n, 1, 1)
    grid = tuple(int(g) for g in grid)
    if int(np.prod(grid)) != n:
        raise ValueError(f"grid {grid} does not match {n} devices")
    dev_array = np.asarray(devices).reshape(grid)
    return Mesh(dev_array, LATTICE_AXES)


def lattice_spec(ncomp_axes: int = 1) -> P:
    """PartitionSpec for arrays with ncomp_axes leading component axes
    followed by (X, Y, Z): components replicated, space sharded."""
    return P(*((None,) * ncomp_axes), "x", "y", "z")


def lattice_sharding(mesh: Mesh, ncomp_axes: int = 1) -> NamedSharding:
    return NamedSharding(mesh, lattice_spec(ncomp_axes))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully-replicated placement (colloid state, global scalars)."""
    return NamedSharding(mesh, P())


def shard_lattice(x, mesh: Optional[Mesh], ncomp_axes: int = 1):
    """Place a (comp..., X, Y, Z) array with the canonical lattice sharding."""
    if mesh is None:
        return x
    return jax.device_put(x, lattice_sharding(mesh, ncomp_axes))


def check_divisible(size: Sequence[int], grid: Sequence[int]):
    for L, g, ax in zip(size, grid, LATTICE_AXES):
        if L % g:
            raise ValueError(
                f"lattice extent {L} along {ax} not divisible by mesh {g}")
