"""Sharded (parallel) field IO: one subfile per I/O-grid block.

TPU-native equivalent of the reference's parallel I/O stack — MPI-IO
collective subarray writes (ref: src/io_impl_mpio.c:179-199), the
``iogrid`` block decomposition of the lattice into subfiles (ref:
src/io_subfile.c:49-95), and per-file JSON metadata (ref:
src/io_metadata.c:159,244).  Where the reference groups MPI ranks into
iogrid blocks and writes one file per block collectively, here every
lattice shard of a sharded ``jax.Array`` is one subfile written directly
by the process that holds it — no host gather, no cross-device traffic —
and reads reassemble a sharded array with
``jax.make_array_from_callback`` so each device reads only its own
slice.  The on-disk record layout (site-major, z-fastest, ncomp values
per site, little-endian) and the subfile naming/metadata match
``io/ref_format.py``, so reference tools recombine these sets too.

A host ``numpy`` array writes/reads through the same functions with an
explicit ``grid`` (the serial ``io_grid X_Y_Z`` input-key path).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

try:  # keep the module importable for pure-host tooling
    import jax
except Exception:  # pragma: no cover
    jax = None


def subfile_name(name: str, step: int, index: int, nfile: int) -> str:
    """<name>-%8.8d.%3.3d-%3.3d (ref: io_subfile naming, 1-based index)."""
    return f"{name}-{step:08d}.{index + 1:03d}-{nfile:03d}"


def _meta_name(name: str, index: int, nfile: int) -> str:
    return f"{name}-metadata.{index + 1:03d}-{nfile:03d}"


def _block_starts(shape3, grid3) -> Tuple[Tuple[int, ...], ...]:
    """Per-axis block start offsets for a near-uniform iogrid split
    (reference semantics: iogrid must divide the decomposition; here it
    must divide the lattice extent)."""
    starts = []
    for ext, g in zip(shape3, grid3):
        if ext % g:
            raise ValueError(f"io grid {grid3} does not divide {shape3}")
        b = ext // g
        starts.append(tuple(i * b for i in range(g)))
    return tuple(starts)


def _file_index(coords3, grid3) -> int:
    """Reference file ordering: x fastest (ref: io_subfile.c:86-89)."""
    return (coords3[0] + coords3[1] * grid3[0]
            + coords3[2] * grid3[0] * grid3[1])


def _site_major(block: np.ndarray) -> np.ndarray:
    """(ncomp, bx, by, bz) or (bx, by, bz) -> site-major records
    (bx, by, bz[, ncomp]) as written by the reference."""
    if block.ndim == 4:
        return np.moveaxis(block, 0, -1)
    return block


def _from_site_major(raw: np.ndarray, bshape3, ncomp: int) -> np.ndarray:
    if ncomp == 1:
        return raw.reshape(bshape3)
    return np.moveaxis(raw.reshape(tuple(bshape3) + (ncomp,)), -1, 0)


def _grid_from_sharding(arr) -> Tuple[int, int, int]:
    """Derive the subfile grid from a jax.Array's sharding: one block per
    distinct lattice shard.  The component axis (if any) must be
    unsharded — reference subfiles hold all components per site."""
    imap = arr.sharding.devices_indices_map(arr.shape)
    la = arr.ndim - 3  # first lattice axis
    starts = [set(), set(), set()]
    for idx in imap.values():
        for a in range(la):
            sl = idx[a]
            if (sl.start or 0) != 0 or (sl.stop is not None
                                        and sl.stop != arr.shape[a]):
                raise ValueError("component axis must not be sharded")
        for a in range(3):
            sl = idx[la + a]
            starts[a].add(sl.start or 0)
    return tuple(len(s) for s in starts)


def write_sharded(directory: str, name: str, step: int, arr,
                  grid: Optional[Sequence[int]] = None,
                  periodic=(1, 1, 1), lmin=(0.5, 0.5, 0.5),
                  le=None) -> int:
    """Write `arr` as an iogrid set of subfiles; returns nfile.

    `arr` is (X, Y, Z) or (ncomp, X, Y, Z).  For a sharded jax.Array
    with grid=None, the grid is the array's own lattice-shard grid and
    each process writes exactly its addressable shards (replica 0 only),
    device buffer -> file, with no gather.  For host arrays (or an
    explicit coarser/finer grid) blocks are sliced out locally.
    """
    os.makedirs(directory, exist_ok=True)
    shape3 = tuple(int(v) for v in arr.shape[-3:])
    ncomp = 1 if arr.ndim == 3 else int(arr.shape[0])

    is_jax = jax is not None and isinstance(arr, jax.Array)
    if grid is None:
        grid = _grid_from_sharding(arr) if is_jax else (1, 1, 1)
    grid = tuple(int(g) for g in grid)
    starts = _block_starts(shape3, grid)
    nfile = grid[0] * grid[1] * grid[2]
    bshape = tuple(e // g for e, g in zip(shape3, grid))

    def meta(index, coords):
        return {
            "coords": {
                "options": {
                    "System size (total)": list(shape3),
                    "Periodic boundaries": [int(v) for v in periodic],
                    "Left-end limit Lmin": [float(v) for v in lmin],
                },
                "lees_edwards": (
                    {"Number of planes": 0} if le is None else
                    {"Number of planes": int(le[0]),
                     "Plane speed": float(le[1])}),
            },
            "io_options": {
                "Mode": "mpiio", "Record format": "binary",
                "Metadata version": 2, "Report": False,
                "Asynchronous": False, "Compression level": 0,
                "I/O grid": list(grid),
            },
            "io_element": {
                "MPI_Datatype": "MPI_DOUBLE", "Size (bytes)": 8,
                "Count": ncomp, "Endianness": "LITTLE_ENDIAN",
            },
            "io_subfile": {
                "Number of files": nfile, "File index": index,
                "Topology": list(grid), "Coordinate": list(coords),
                "Data ndims": 3,
                "File size (sites)": list(bshape),
                "File offset (sites)": [starts[a][coords[a]]
                                        for a in range(3)],
            },
        }

    def emit(coords, block):
        index = _file_index(coords, grid)
        path = os.path.join(directory, subfile_name(name, step, index,
                                                    nfile))
        _site_major(np.asarray(block, np.float64)).astype(
            "<f8").tofile(path)
        with open(os.path.join(directory,
                               _meta_name(name, index, nfile)), "w") as fh:
            json.dump(meta(index, coords), fh, indent=1)

    if is_jax and grid == _grid_from_sharding(arr):
        la = arr.ndim - 3
        for shard in arr.addressable_shards:
            if shard.replica_id != 0:
                continue
            idx = shard.index
            coords = tuple(starts[a].index(idx[la + a].start or 0)
                           for a in range(3))
            emit(coords, shard.data)
        return nfile

    host = np.asarray(jax.device_get(arr) if is_jax else arr)
    for cz in range(grid[2]):
        for cy in range(grid[1]):
            for cx in range(grid[0]):
                coords = (cx, cy, cz)
                sl = tuple(slice(starts[a][coords[a]],
                                 starts[a][coords[a]] + bshape[a])
                           for a in range(3))
                emit(coords, host[(...,) + sl])
    return nfile


def _set_layout(directory: str, name: str, step: int):
    """(grid, shape3, ncomp, nfile) of a subfile set from its metadata."""
    files = sorted(f for f in os.listdir(directory)
                   if f.startswith(f"{name}-metadata."))
    if not files:
        raise FileNotFoundError(f"no metadata for {name} in {directory}")
    with open(os.path.join(directory, files[0])) as fh:
        meta = json.load(fh)
    grid = tuple(meta["io_subfile"]["Topology"])
    shape3 = tuple(meta["coords"]["options"]["System size (total)"])
    ncomp = int(meta["io_element"]["Count"])
    return grid, shape3, ncomp, int(meta["io_subfile"]["Number of files"])


def read_subfile_set(directory: str, name: str, step: int) -> np.ndarray:
    """Recombine a whole subfile set into one host array
    ((ncomp, X, Y, Z) or (X, Y, Z)) — the extract-utility path."""
    grid, shape3, ncomp, nfile = _set_layout(directory, name, step)
    starts = _block_starts(shape3, grid)
    bshape = tuple(e // g for e, g in zip(shape3, grid))
    out = np.empty(((ncomp,) if ncomp > 1 else ()) + shape3, np.float64)
    for cz in range(grid[2]):
        for cy in range(grid[1]):
            for cx in range(grid[0]):
                coords = (cx, cy, cz)
                index = _file_index(coords, grid)
                path = os.path.join(
                    directory, subfile_name(name, step, index, nfile))
                raw = np.fromfile(path, "<f8")
                sl = tuple(slice(starts[a][coords[a]],
                                 starts[a][coords[a]] + bshape[a])
                           for a in range(3))
                out[(...,) + sl] = _from_site_major(raw, bshape, ncomp)
    return out


def read_sharded(directory: str, name: str, step: int, sharding,
                 dtype="float64"):
    """Reassemble a subfile set as a sharded jax.Array: each device's
    slice is read straight from the overlapping subfiles (memmap'd, so
    only the needed bytes move) — the parallel restart path.  The read
    sharding need not match the grid the set was written with."""
    grid, shape3, ncomp, nfile = _set_layout(directory, name, step)
    starts = _block_starts(shape3, grid)
    bshape = tuple(e // g for e, g in zip(shape3, grid))
    shape = ((ncomp,) if ncomp > 1 else ()) + shape3
    la = len(shape) - 3

    mmaps: Dict[int, np.ndarray] = {}

    def block(coords):
        index = _file_index(coords, grid)
        mm = mmaps.get(index)
        if mm is None:
            path = os.path.join(
                directory, subfile_name(name, step, index, nfile))
            mm = np.memmap(path, "<f8", "r",
                           shape=tuple(bshape) + ((ncomp,) if ncomp > 1
                                                  else ()))
            mmaps[index] = mm
        return mm

    def cb(index):
        # global slice for one device -> gather from overlapping blocks
        sl3 = [index[la + a] if la + a < len(index) else slice(None)
               for a in range(3)]
        lo = [s.start or 0 for s in sl3]
        hi = [s.stop if s.stop is not None else shape3[a]
              for a, s in enumerate(sl3)]
        oshape = tuple(h - l for l, h in zip(lo, hi))
        out = np.empty(((ncomp,) if ncomp > 1 else ()) + oshape,
                       np.float64)
        for cz in range(grid[2]):
            for cy in range(grid[1]):
                for cx in range(grid[0]):
                    coords = (cx, cy, cz)
                    blo = [starts[a][coords[a]] for a in range(3)]
                    bhi = [blo[a] + bshape[a] for a in range(3)]
                    ilo = [max(lo[a], blo[a]) for a in range(3)]
                    ihi = [min(hi[a], bhi[a]) for a in range(3)]
                    if any(ilo[a] >= ihi[a] for a in range(3)):
                        continue
                    src = block(coords)[tuple(
                        slice(ilo[a] - blo[a], ihi[a] - blo[a])
                        for a in range(3))]
                    if ncomp > 1:
                        src = np.moveaxis(src, -1, 0)
                    out[(...,) + tuple(
                        slice(ilo[a] - lo[a], ihi[a] - lo[a])
                        for a in range(3))] = src
        csl = index[:la]
        return out[csl].astype(dtype) if csl else out.astype(dtype)

    return jax.make_array_from_callback(shape, sharding, cb)
