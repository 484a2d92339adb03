#!/usr/bin/env python
"""Extract colloid state files to csv.

Port of the reference utility (ref: util/extract_colloids.c): reads
config.cds%8.8d.%3.3d-%3.3d records and writes a csv row per particle
(position, and optionally id / orientation / velocity).

Usage: python util/extract_colloids.py <config.cds00001000.001-001>
           [--id] [--m] [--v] [-o out.csv]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ludwig_tpu.io.colloid_io import read_colloid_file


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--id", action="store_true", help="prepend index")
    ap.add_argument("--m", action="store_true",
                    help="append orientation s")
    ap.add_argument("--v", action="store_true",
                    help="append velocity and |v|")
    ap.add_argument("-o", "--out", default=None)
    args = ap.parse_args()

    recs = read_colloid_file(args.path)
    out = open(args.out, "w") if args.out else sys.stdout
    for rec in recs:
        row = []
        if args.id:
            row.append(f"{rec['index']:4d}")
        row += [f"{v:14.6e}" for v in rec["r"]]
        if args.m:
            row += [f"{v:14.6e}" for v in rec["s"]]
        if args.v:
            vv = rec["v"]
            normv = sum(c * c for c in vv) ** 0.5
            row += [f"{v:14.6e}" for v in vv] + [f"{normv:14.6e}"]
        out.write(", ".join(row) + "\n")
    if args.out:
        out.close()
        print(f"Wrote {len(recs)} colloids to {args.out}")


if __name__ == "__main__":
    main()
