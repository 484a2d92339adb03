#!/usr/bin/env python
"""Random squirmers + subgrid polymers configuration generator.

TPU-native equivalent of the reference utility (ref:
util/multi_squ_poly_init.c): place N squirmers and M bead-spring
polymers (each a chain of subgrid monomers with FENE bonds recorded in
the colloid state's bond table) at random in a dilute suspension, and
write a reference-format colloid file for colloid_init from_file.

Usage:
  python util/multi_squ_poly_init.py --size 32_32_32 --nsquirmer 1 \
      --a0 2.3 --ah 2.3 --b1 0.05 --b2 0.0 \
      --npoly 2 --nmonomer 10 --monomer-a0 0.178 --bond-length 1.0 \
      [--seed 12345] --out config.cds.init.001-001
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ludwig_tpu.io.colloid_io import default_state, write_colloid_file


def random_unit(rng):
    v = rng.normal(size=3)
    return v / np.sqrt((v * v).sum())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", required=True)
    ap.add_argument("--nsquirmer", type=int, default=1)
    ap.add_argument("--a0", type=float, default=2.3)
    ap.add_argument("--ah", type=float, default=2.3)
    ap.add_argument("--b1", type=float, default=0.05)
    ap.add_argument("--b2", type=float, default=0.0)
    ap.add_argument("--npoly", type=int, default=1)
    ap.add_argument("--nmonomer", type=int, default=10)
    ap.add_argument("--monomer-a0", type=float, default=0.178)
    ap.add_argument("--monomer-ah", type=float, default=0.2)
    ap.add_argument("--bond-length", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=12345)
    ap.add_argument("--out", default="config.cds.init.001-001")
    args = ap.parse_args()
    size = tuple(int(v) for v in args.size.split("_"))
    L = np.array(size, float)
    rng = np.random.default_rng(args.seed)
    recs = []

    def add(r, a0, ah, typ, m=(1.0, 0.0, 0.0), b1=0.0, b2=0.0):
        s = default_state()
        s["index"] = len(recs) + 1
        s["a0"], s["ah"] = a0, ah
        s["r"] = [float(np.mod(c, L[i])) + 1.0 for i, c in enumerate(r)]
        s["m"] = [float(c) for c in m]
        s["b1"], s["b2"] = b1, b2
        s["type"] = typ
        s["rng"] = len(recs) + 1
        recs.append(s)
        return s

    # squirmers: random positions, random swimming directions
    for _ in range(args.nsquirmer):
        r = np.array([rng.uniform(args.ah, L[a] - args.ah)
                      for a in range(3)])
        add(r, args.a0, args.ah, 1, m=tuple(random_unit(rng)),
            b1=args.b1, b2=args.b2)

    # polymers: random walk chains of subgrid monomers with FENE bonds
    # recorded both ways in the bond table (ref: multi_squ_poly_init.c
    # chain growth with fixed bond length)
    for _ in range(args.npoly):
        r = np.array([rng.uniform(0.0, L[a]) for a in range(3)])
        prev = None
        for _k in range(args.nmonomer):
            s = add(r, args.monomer_a0, args.monomer_ah, 2)
            if prev is not None:
                s["nbonds"] = 1
                s["bond"][0] = prev["index"]
                prev["nbonds"] += 1
                prev["bond"][1 if prev["bond"][0] else 0] = s["index"]
            prev = s
            r = r + args.bond_length * random_unit(rng)
    write_colloid_file(args.out, recs)
    print(f"{args.nsquirmer} squirmers + {args.npoly}x{args.nmonomer} "
          f"monomers -> {args.out}")


if __name__ == "__main__":
    main()
