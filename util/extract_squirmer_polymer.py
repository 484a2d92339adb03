#!/usr/bin/env python
"""Squirmer + polymer output -> Paraview csv files.

TPU-native equivalent of the reference utility (ref:
util/extract_squirmer_polymer.c): split a colloid configuration dump
into one csv of squirmers and one of polymer monomers (subgrid type),
each with the reference's three extent-marker particles at
(xmax,0,0), (0,ymax,0), (0,0,zmax).

Usage:
  python util/extract_squirmer_polymer.py --inp config.cds00001000.001-001 \
      --size 32_32_32 --out-squirmer squ.csv --out-polymer poly.csv
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ludwig_tpu.io.colloid_io import (read_colloid_file,
                                      read_colloid_file_binary)


def write_csv(path, recs, size):
    with open(path, "w") as fh:
        fh.write("x, y, z, a\n")
        for s in recs:
            r = s["r"]
            fh.write(f"{r[0]:13.6e}, {r[1]:13.6e}, {r[2]:13.6e}, "
                     f"{s['a0']:13.6e}\n")
        # extent markers (ref: extract_colloids.c csv trailer)
        fh.write(f"{float(size[0]):13.6e}, 0.0, 0.0, 0.01\n")
        fh.write(f"0.0, {float(size[1]):13.6e}, 0.0, 0.01\n")
        fh.write(f"0.0, 0.0, {float(size[2]):13.6e}, 0.01\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--inp", required=True)
    ap.add_argument("--size", required=True)
    ap.add_argument("--out-squirmer", default="squirmer.csv")
    ap.add_argument("--out-polymer", default="polymer.csv")
    args = ap.parse_args()
    size = tuple(int(v) for v in args.size.split("_"))
    try:
        recs = read_colloid_file(args.inp)
    except (ValueError, UnicodeDecodeError):
        recs = read_colloid_file_binary(args.inp)
    squ = [s for s in recs if s["type"] != 2]
    poly = [s for s in recs if s["type"] == 2]
    write_csv(args.out_squirmer, squ, size)
    write_csv(args.out_polymer, poly, size)
    print(f"{len(squ)} squirmers -> {args.out_squirmer}; "
          f"{len(poly)} monomers -> {args.out_polymer}")


if __name__ == "__main__":
    main()
