#!/usr/bin/env python
"""Generate porous-media / capillary site maps.

TPU-native equivalent of the reference capillary utility (ref:
util/capillary.c): writes a solid-mask .npy usable as the porous map
input (porous_media_file key).

Geometries: circle (xy cylinder along z), square duct, parallel plates.

Usage: python util/capillary.py --size 32_32_32 --geometry circle_xy --out cap.npy
"""

import argparse

import numpy as np


def build(size, geometry):
    nx, ny, nz = size
    solid = np.zeros(size, bool)
    if geometry == "circle_xy":
        # walls outside an inscribed cylinder along z (ref: CAPILLARY_CIRCLE)
        x = np.arange(nx) + 0.5 - nx / 2.0
        y = np.arange(ny) + 0.5 - ny / 2.0
        r = np.sqrt(x[:, None] ** 2 + y[None, :] ** 2)
        solid[r[:, :, None] * np.ones((1, 1, nz)) > (min(nx, ny) / 2.0 - 1.0)] = True
    elif geometry == "square_xy":
        solid[0, :, :] = solid[-1, :, :] = True
        solid[:, 0, :] = solid[:, -1, :] = True
    elif geometry == "plates_x":
        solid[0, :, :] = solid[-1, :, :] = True
    else:
        raise SystemExit(f"unknown geometry {geometry}")
    return solid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", required=True)
    ap.add_argument("--geometry", default="circle_xy",
                    choices=["circle_xy", "square_xy", "plates_x"])
    ap.add_argument("--out", default="capillary.npy")
    args = ap.parse_args()
    size = tuple(int(v) for v in args.size.split("_"))
    solid = build(size, args.geometry)
    np.save(args.out, solid)
    print(f"wrote {args.out}: {solid.sum()} solid / {solid.size} sites")


if __name__ == "__main__":
    main()
