#!/usr/bin/env python
"""Porous-media data set -> simulation input map.

TPU-native equivalent of the reference utility (ref: util/process.c):
take an ASCII tomography-style data set (0 = fluid, 1 = solid, one
value per site, z fastest), optionally seal the non-periodic faces,
remove isolated fluid sites (no fluid neighbour in the 6-point
stencil -> solid), and write the solid mask as .npy for the
porous_media_file input key.

Usage:
  python util/process.py --inp rock.dat --size 64_64_64 \
      [--seal 1_1_0] --out rock.npy
"""

import argparse

import numpy as np


def clean(solid, seal):
    # seal requested faces (ref: process.c boundary treatment)
    for ax in range(3):
        if seal[ax]:
            sl = [slice(None)] * 3
            sl[ax] = 0
            solid[tuple(sl)] = True
            sl[ax] = solid.shape[ax] - 1
            solid[tuple(sl)] = True
    # remove isolated fluid: a fluid site with no 6-point fluid
    # neighbour cannot participate in the dynamics (ref: process.c
    # isolated-site sweep)
    while True:
        fluid = ~solid
        nb = np.zeros(solid.shape, int)
        for ax in range(3):
            nb += np.roll(fluid, 1, axis=ax) + np.roll(fluid, -1, axis=ax)
        isolated = fluid & (nb == 0)
        if not isolated.any():
            return solid
        solid = solid | isolated


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--inp", required=True)
    ap.add_argument("--size", required=True)
    ap.add_argument("--seal", default="0_0_0")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    size = tuple(int(v) for v in args.size.split("_"))
    seal = tuple(int(v) for v in args.seal.split("_"))
    vals = np.loadtxt(args.inp).astype(int).reshape(size)
    solid = clean(vals != 0, seal)
    np.save(args.out, solid)
    nfl = int((~solid).sum())
    print(f"fluid {nfl} / {solid.size} "
          f"(porosity {nfl / solid.size:.4f}) -> {args.out}")


if __name__ == "__main__":
    main()
