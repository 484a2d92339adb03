#!/usr/bin/env python
"""Capillary-in-a-bath structure generator.

TPU-native equivalent of the reference bath utility (ref: util/bath.c):
builds a capillary section (circular or square cross-section, spanning
z1..z2 inclusive with fluid above and below, i.e. immersed in a bath)
and writes the solid mask as .npy for the porous_media_file input.
Also reports the wetting contact angle for the chosen (kappa, B, H)
like the reference (ref: bath.c:118-130 h = H sqrt(1/kappa B),
cos(theta) = (-(1-h)^1.5 + (1+h)^1.5)/2).

Usage:
  python util/bath.py --size 20_20_20 --diameter 14 --z1 10 --z2 12 \
      --xsection circle --kappa 0.04 --B 0.0625 --H 0.016 --out bath.npy
"""

import argparse
import math

import numpy as np


def build(size, diameter, z1, z2, xsection):
    nx, ny, nz = size
    solid = np.zeros(size, bool)
    rc = 0.5 * diameter
    if xsection == "circle":
        # ring of boundary sites rc < r <= rc + sqrt(2) over z1..z2
        # (ref: bath.c:147-160)
        x = 1.0 + np.arange(nx) - (0.5 * nx + 0.5)
        y = 1.0 + np.arange(ny) - (0.5 * ny + 0.5)
        r = np.sqrt(x[:, None] ** 2 + y[None, :] ** 2)
        ring = (r > rc) & (r <= rc + math.sqrt(2.0))
        solid[:, :, z1:z2 + 1] = ring[:, :, None]
    else:
        # square duct walls (ref: bath.c:163-183)
        i0 = (nx - diameter - 2) // 2
        j0 = (ny - diameter - 2) // 2
        i1, j1 = i0 + diameter + 1, j0 + diameter + 1
        solid[i0, j0:j1 + 1, z1:z2 + 1] = True
        solid[i1, j0:j1 + 1, z1:z2 + 1] = True
        solid[i0:i1 + 1, j0, z1:z2 + 1] = True
        solid[i0:i1 + 1, j1, z1:z2 + 1] = True
    return solid


def contact_angle(kappa, b, h_wet):
    h = h_wet * math.sqrt(1.0 / (kappa * b))
    h1 = 0.5 * (-((1.0 - h) ** 1.5) + (1.0 + h) ** 1.5)
    return h, math.acos(h1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", required=True)
    ap.add_argument("--diameter", type=int, default=14)
    ap.add_argument("--z1", type=int, default=10)
    ap.add_argument("--z2", type=int, default=12)
    ap.add_argument("--xsection", default="circle",
                    choices=["circle", "square"])
    ap.add_argument("--kappa", type=float, default=0.04)
    ap.add_argument("--B", type=float, default=0.0625)
    ap.add_argument("--H", type=float, default=0.016)
    ap.add_argument("--out", default="bath.npy")
    args = ap.parse_args()
    size = tuple(int(v) for v in args.size.split("_"))
    h, theta = contact_angle(args.kappa, args.B, args.H)
    print(f"dimensionless parameter h   = {h:f}")
    print(f"contact angle theta         = {theta:f} radians")
    print(f"                            = {math.degrees(theta):f} degrees")
    solid = build(size, args.diameter, args.z1, args.z2, args.xsection)
    np.save(args.out, solid)
    print(f"n solid = {int(solid.sum())} -> {args.out}")


if __name__ == "__main__":
    main()
