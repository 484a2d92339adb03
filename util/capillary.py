#!/usr/bin/env python
"""Generate porous-media / capillary site maps.

TPU-native equivalent of the reference capillary utility (ref:
util/capillary.c): writes either a solid-mask .npy or a
reference-format map file ("capillary.001-001": status byte + ndata
wetting doubles per site, ref: src/map.c:480-585) usable as the
porous map input (porous_media_file key).

Geometries: the reference map_init set (circle_xy, square_xy,
wall_x/y/z, simple/body/face-centred cubic crystals) plus plates_x.
Uniform wetting (C, H) can be stamped onto the solid sites with
--wetting C_H (ndata = 2, as capillary.c does for status_with_c_h).

Usage:
  python util/capillary.py --size 32_32_32 --geometry circle_xy --out cap.npy
  python util/capillary.py --size 32_32_32 --geometry circle_xy \
      --format binary --wetting 0.0_0.002 --out capillary.001-001
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ludwig_tpu.io.map_file import (GEOMETRIES, MAP_BOUNDARY,  # noqa: E402
                                    write_map)


def build(size, geometry, acell=0):
    nx, ny, nz = size
    if geometry in GEOMETRIES:
        return GEOMETRIES[geometry](size, acell) != 0
    solid = np.zeros(size, bool)
    if geometry == "plates_x":
        solid[0, :, :] = solid[-1, :, :] = True
    else:
        raise SystemExit(f"unknown geometry {geometry}")
    return solid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", required=True)
    ap.add_argument("--geometry", default="circle_xy",
                    choices=sorted(GEOMETRIES) + ["plates_x"])
    ap.add_argument("--acell", type=int, default=0,
                    help="cubic lattice constant (crystal geometries)")
    ap.add_argument("--wetting", default=None,
                    help="uniform C_H wetting data at solid sites "
                    "(writes ndata = 2 reference records)")
    ap.add_argument("--format", default="npy",
                    choices=["npy", "binary", "ascii"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    size = tuple(int(v) for v in args.size.split("_"))
    solid = build(size, args.geometry, args.acell)
    if args.format == "npy":
        out = args.out or "capillary.npy"
        np.save(out, solid)
    else:
        out = args.out or "capillary.001-001"
        status = np.where(solid, MAP_BOUNDARY, 0).astype(np.int8)
        data = None
        if args.wetting is not None:
            cw, hw = (float(v) for v in args.wetting.split("_"))
            data = np.zeros((2,) + size)
            data[0][solid] = cw
            data[1][solid] = hw
        write_map(out, status, data, binary=(args.format == "binary"))
    print(f"wrote {out}: {int(solid.sum())} solid / {solid.size} sites")


if __name__ == "__main__":
    main()
