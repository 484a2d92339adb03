#!/usr/bin/env python
"""Post-process field dumps: combine, convert to .npy/VTK, LC director.

TPU-native equivalent of the reference extract utility (ref:
util/extract.c: recombination is unnecessary here - dumps are already
global arrays - remaining duties are format conversion and the liquid
crystal director/biaxiality diagnostics via Q diagonalisation).

Usage:
  python util/extract.py --dir . --step 1000 --field phi [--vtk out.vtk]
  python util/extract.py --dir . --step 1000 --field q --director
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load(directory, field, step):
    from ludwig_tpu.io import read_state
    try:
        return read_state(directory, step, [field])[field]
    except FileNotFoundError:
        # reference-format subfile set (possibly iogrid-decomposed):
        # recombine as the reference extract does (ref: util/extract.c)
        from ludwig_tpu.io import read_subfile_set
        return read_subfile_set(directory, field, step)


def director(q5):
    """Largest-eigenvalue eigenvector of Q + scalar order parameter
    (ref: extract.c LC director diagonalisation)."""
    qxx, qxy, qxz, qyy, qyz = q5
    qzz = -qxx - qyy
    Q = np.stack([
        np.stack([qxx, qxy, qxz], -1),
        np.stack([qxy, qyy, qyz], -1),
        np.stack([qxz, qyz, qzz], -1)], -2)
    w, v = np.linalg.eigh(Q)
    # eigh sorts ascending; director = eigenvector of the largest
    n = v[..., :, 2]
    s = 1.5 * w[..., 2]          # scalar order parameter convention
    return n, s


def write_vtk(path, name, arr):
    """Minimal legacy-VTK structured-points writer (scalars or vectors)."""
    arr = np.asarray(arr)
    if arr.ndim == 3:
        nx, ny, nz = arr.shape
        kind = "SCALARS"
    else:
        _, nx, ny, nz = arr.shape
        kind = "VECTORS"
    with open(path, "w") as fh:
        fh.write("# vtk DataFile Version 2.0\n")
        fh.write(f"ludwig_tpu {name}\nASCII\nDATASET STRUCTURED_POINTS\n")
        fh.write(f"DIMENSIONS {nx} {ny} {nz}\n")
        fh.write("ORIGIN 0 0 0\nSPACING 1 1 1\n")
        fh.write(f"POINT_DATA {nx * ny * nz}\n")
        if kind == "SCALARS":
            fh.write(f"SCALARS {name} float 1\nLOOKUP_TABLE default\n")
            for k in range(nz):
                for j in range(ny):
                    for i in range(nx):
                        fh.write(f"{arr[i, j, k]:.6e}\n")
        else:
            fh.write(f"VECTORS {name} float\n")
            for k in range(nz):
                for j in range(ny):
                    for i in range(nx):
                        fh.write(f"{arr[0, i, j, k]:.6e} "
                                 f"{arr[1, i, j, k]:.6e} "
                                 f"{arr[2, i, j, k]:.6e}\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=".")
    ap.add_argument("--step", type=int, required=True)
    ap.add_argument("--field", default="phi")
    ap.add_argument("--vtk", default=None)
    ap.add_argument("--npy", default=None)
    ap.add_argument("--director", action="store_true")
    args = ap.parse_args()

    arr = load(args.dir, args.field, args.step)
    if args.director:
        n, s = director(arr)
        np.save(f"{args.field}-director-{args.step:08d}.npy", n)
        np.save(f"{args.field}-order-{args.step:08d}.npy", s)
        print(f"director -> {args.field}-director-{args.step:08d}.npy; "
              f"mean order {s.mean():.6f}")
        return
    if args.npy:
        np.save(args.npy, arr)
        print(f"wrote {args.npy} shape {arr.shape}")
    if args.vtk:
        write_vtk(args.vtk, args.field, arr)
        print(f"wrote {args.vtk}")
    if not (args.npy or args.vtk):
        print(f"{args.field} step {args.step}: shape {arr.shape} "
              f"min {arr.min():.6e} max {arr.max():.6e} "
              f"mean {arr.mean():.6e}")


if __name__ == "__main__":
    main()
