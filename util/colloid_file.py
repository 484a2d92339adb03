#!/usr/bin/env python
"""Hand-build a colloid configuration file.

TPU-native equivalent of the reference utility (ref:
util/colloid_file.c): write an arbitrary list of colloids (positions,
radii, velocities, type, squirmer parameters, charges) as a
reference-format colloid file (ascii or binary) for colloid_init
from_file.  Also converts between the ascii and binary record formats.

Usage (build):
  python util/colloid_file.py build --out config.cds.init.001-001 \
      --colloid a0=2.3,ah=2.3,r=16.0_16.0_16.0,v=0.0_0.0_0.01 \
      --colloid a0=2.3,ah=2.3,r=8.0_8.0_8.0,type=active,b1=0.05
Usage (convert):
  python util/colloid_file.py convert --inp config.cds00001000.001-001 \
      --out config.ascii --to ascii
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ludwig_tpu.io.colloid_io import (default_state, read_colloid_file,
                                      read_colloid_file_binary,
                                      write_colloid_file,
                                      write_colloid_file_binary)

TYPES = {"default": 0, "active": 1, "subgrid": 2}


def parse_colloid(spec: str) -> dict:
    s = default_state()
    for kv in spec.split(","):
        k, v = kv.split("=", 1)
        if k == "type":
            s["type"] = TYPES[v]
        elif "_" in v:
            s[k] = [float(c) for c in v.split("_")]
        else:
            s[k] = float(v)
    return s


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    b = sub.add_parser("build")
    b.add_argument("--colloid", action="append", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--binary", action="store_true")
    c = sub.add_parser("convert")
    c.add_argument("--inp", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--to", choices=["ascii", "binary"], required=True)
    args = ap.parse_args()
    if args.cmd == "build":
        recs = []
        for i, spec in enumerate(args.colloid):
            s = parse_colloid(spec)
            s["index"] = i + 1
            s["rng"] = i + 1
            recs.append(s)
        (write_colloid_file_binary if args.binary
         else write_colloid_file)(args.out, recs)
        print(f"{len(recs)} colloids -> {args.out}")
    else:
        try:
            recs = read_colloid_file(args.inp)
        except (ValueError, UnicodeDecodeError):
            recs = read_colloid_file_binary(args.inp)
        (write_colloid_file if args.to == "ascii"
         else write_colloid_file_binary)(args.out, recs)
        print(f"{len(recs)} colloids -> {args.out} ({args.to})")


if __name__ == "__main__":
    main()
