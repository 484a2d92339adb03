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


def le_displacement_table(nx, nplanes, displace, speed):
    """Per-x-column y displacement / u_y correction, relative to the
    system centre (ref: util/extract.c:914-956 le_set_displacements)."""
    dy = np.zeros(nx)
    duy = np.zeros(nx)
    di = nx // nplanes
    d0 = -(nplanes / 2.0) * displace
    u0 = -(nplanes / 2.0) * speed
    dy[:di // 2] = d0
    duy[:di // 2] = u0
    d, u = d0 + displace, u0 + speed
    for ic in range(di // 2 + 1, nx - di // 2 + 1):   # 1-based loop
        dy[ic - 1] = d
        duy[ic - 1] = u
        if (ic - di // 2) % di == 0:
            d += displace
            u += speed
    dy[nx - di // 2:] = d
    duy[nx - di // 2:] = u
    return dy, duy


def le_unroll(arr, nplanes, speed, ntime, t0=0, is_velocity=False):
    """Unroll Lees-Edwards plane displacements (cubic interpolation in
    y about the system centre; ref: util/extract.c:977-1056 le_unroll).

    arr: (X,Y,Z) or (ncomp,X,Y,Z); the velocity field also gets the
    per-block u_y frame correction.  Returns the unrolled array.
    """
    arr = np.asarray(arr, np.float64)
    squeeze = arr.ndim == 3
    if squeeze:
        arr = arr[None]
    ncomp, nx, ny, nz = arr.shape
    displace = speed * (ntime - t0)
    dy, duy = le_displacement_table(nx, nplanes, displace, speed)
    out = np.empty_like(arr)
    jc = np.arange(1, ny + 1)                      # 1-based y index
    for ic in range(nx):
        jdy = int(np.floor(dy[ic]))
        fr = 1.0 - (dy[ic] - jdy)
        j0 = 1 + (jc - jdy - 3 + 1000 * ny) % ny   # 1-based
        j1 = 1 + j0 % ny
        j2 = 1 + j1 % ny
        j3 = 1 + j2 % ny
        plane = arr[:, ic]                         # (ncomp, Y, Z)
        out[:, ic] = (
            - (1.0 / 6.0) * fr * (fr - 1.0) * (fr - 2.0)
            * plane[:, j0 - 1]
            + 0.5 * (fr * fr - 1.0) * (fr - 2.0) * plane[:, j1 - 1]
            - 0.5 * fr * (fr + 1.0) * (fr - 2.0) * plane[:, j2 - 1]
            + (1.0 / 6.0) * fr * (fr * fr - 1.0) * plane[:, j3 - 1])
        if is_velocity:
            out[1, ic] += duy[ic]
    return out[0] if squeeze else out


def le_meta(directory, field):
    """(nplanes, speed) from the metadata sidecars (JSON vintage first,
    then the legacy .meta; ref: extract.c:682-690)."""
    jpath = os.path.join(directory, f"{field}-metadata.001-001")
    if os.path.exists(jpath):
        with open(jpath) as fh:
            le = json.load(fh)["coords"].get("lees_edwards", {})
        return (int(le.get("Number of planes", 0)),
                float(le.get("Plane speed", 0.0)))
    mpath = os.path.join(directory, f"{field}.001-001.meta")
    npl, uy = 0, 0.0
    if os.path.exists(mpath):
        for line in open(mpath):
            if line.startswith("Lees-Edwards planes:"):
                npl = int(line.split()[-1])
            elif line.startswith("Lees-Edwards plane speed"):
                uy = float(line.split()[-1])
    return npl, uy


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
    ap.add_argument("--le-unroll", action="store_true",
                    help="unroll Lees-Edwards plane displacements "
                    "(plane count/speed from the metadata sidecars)")
    ap.add_argument("--le-t0", type=int, default=0,
                    help="time offset for the accumulated displacement")
    args = ap.parse_args()

    arr = load(args.dir, args.field, args.step)
    if args.le_unroll:
        npl, uy = le_meta(args.dir, args.field)
        if npl > 0:
            print(f"Unrolling LE planes from centre "
                  f"(displacement {uy * (args.step - args.le_t0):f})")
            arr = le_unroll(arr, npl, uy, args.step, t0=args.le_t0,
                            is_velocity=args.field == "vel")
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
