#!/usr/bin/env python
"""Electrokinetic initial-condition file generator.

TPU-native equivalent of the reference utility (ref: util/psi_init.c):
build psi (reduced potential) and per-species charge density fields for
reading at t = 0, with the standard initialisations (uniform,
gouy_chapman wall charge, liquid_junction) plus a point-charge option,
and write them in this package's state-file format (state files are
read back by N_start restarts).

Usage:
  python util/psi_init.py --size 64_4_4 --mode gouy_chapman \
      --rho-el 0.001 --sigma 0.03125 --step 0 --dir .
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ludwig_tpu.electro_sim import (init_gouy_chapman,
                                    init_liquid_junction, init_uniform)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", required=True)
    ap.add_argument("--mode", default="uniform",
                    choices=["uniform", "gouy_chapman", "liquid_junction",
                             "point_charge"])
    ap.add_argument("--rho-el", type=float, default=0.0)
    ap.add_argument("--sigma", type=float, default=0.0)
    ap.add_argument("--delta-el", type=float, default=0.0)
    ap.add_argument("--step", type=int, default=0)
    ap.add_argument("--dir", default=".")
    args = ap.parse_args()
    size = tuple(int(v) for v in args.size.split("_"))
    if args.mode == "uniform":
        psi, rho = init_uniform(size, args.rho_el)
    elif args.mode == "gouy_chapman":
        psi, rho, _ = init_gouy_chapman(size, args.rho_el, args.sigma)
    elif args.mode == "liquid_junction":
        psi, rho = init_liquid_junction(size, args.rho_el, args.delta_el)
    else:
        # single unit point charge at the centre, neutralised uniformly
        # (ref: psi_init.c point-charge case)
        psi = np.zeros(size)
        rho = np.full((2,) + size, args.rho_el)
        c = tuple(s // 2 for s in size)
        rho[0][c] += 1.0
        rho[1] += 1.0 / float(np.prod(size))
    from ludwig_tpu.io import write_state
    write_state(args.dir, args.step,
                {"state01": psi, "state02": rho})
    print(f"psi/rho ({args.mode}) -> {args.dir}/state0*-{args.step:08d}")


if __name__ == "__main__":
    main()
