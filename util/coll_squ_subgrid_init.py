#!/usr/bin/env python
"""Random colloid / squirmer / subgrid particle configurations.

TPU-native equivalent of the reference utility (ref:
util/coll_squ_subgrid_init.c): place N particles (or a target solid
volume fraction) at random with a 'grace' distance dh between surfaces
and from any flat walls, then write a reference-format colloid file
(config.cds.init.001-001) readable by colloid_init from_file.

Usage:
  python util/coll_squ_subgrid_init.py --size 64_64_64 --vf 0.015 \
      --a0 0.178 --ah 0.2 --dh 0.03 --type subgrid [--b1 0.05 --b2 0.0] \
      [--walls 0_0_1] [--seed 12345] --out config.cds.init.001-001
"""

import argparse
import math
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ludwig_tpu.io.colloid_io import default_state, write_colloid_file


def n_from_vf(size, ah, vf):
    """Particle count for a requested solid volume fraction
    (ref: colloid_init_vf_n)."""
    vol = size[0] * size[1] * size[2]
    vp = (4.0 / 3.0) * math.pi * ah ** 3
    return int(vf * vol / vp)


def place(size, n, ah, dh, walls, rng):
    """Random sequential insertion with grace distance dh (surface to
    surface, and surface to wall; ref: coll_squ_subgrid_init.c random
    placement loop)."""
    L = np.array(size, float)
    pos = []
    tries = 0
    while len(pos) < n and tries < 200000:
        tries += 1
        r = np.array([rng.uniform(0.0, L[a]) for a in range(3)])
        ok = True
        for a in range(3):
            if walls[a] and not (ah + dh < r[a] < L[a] - ah - dh):
                ok = False
        if not ok:
            continue
        for q in pos:
            d = r - q
            d -= L * np.round(d / L)
            if np.sqrt((d * d).sum()) < 2.0 * ah + dh:
                ok = False
                break
        if ok:
            pos.append(r)
    if len(pos) < n:
        raise SystemExit(f"placed only {len(pos)}/{n} particles")
    return np.array(pos)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", required=True)
    ap.add_argument("--n", type=int, default=0)
    ap.add_argument("--vf", type=float, default=0.015)
    ap.add_argument("--a0", type=float, default=0.178)
    ap.add_argument("--ah", type=float, default=0.2)
    ap.add_argument("--dh", type=float, default=0.03)
    ap.add_argument("--type", default="subgrid",
                    choices=["default", "active", "subgrid"])
    ap.add_argument("--b1", type=float, default=0.0)
    ap.add_argument("--b2", type=float, default=0.0)
    ap.add_argument("--al", type=float, default=0.0)
    ap.add_argument("--walls", default="0_0_0")
    ap.add_argument("--seed", type=int, default=12345)
    ap.add_argument("--out", default="config.cds.init.001-001")
    args = ap.parse_args()
    size = tuple(int(v) for v in args.size.split("_"))
    walls = tuple(int(v) for v in args.walls.split("_"))
    n = args.n or n_from_vf(size, args.ah, args.vf)
    rng = np.random.default_rng(args.seed)
    pos = place(size, n, args.ah, args.dh, walls, rng)
    recs = []
    for i, r in enumerate(pos):
        s = default_state()
        s["index"] = i + 1
        s["a0"], s["ah"], s["al"] = args.a0, args.ah, args.al
        s["r"] = [float(c) + 1.0 for c in r]     # file is 1-based
        # random swimming direction for active particles
        m = rng.normal(size=3)
        m /= np.sqrt((m * m).sum())
        s["m"] = [float(c) for c in m]
        s["b1"], s["b2"] = args.b1, args.b2
        s["type"] = {"default": 0, "active": 1, "subgrid": 2}[args.type]
        s["rng"] = i + 1
        recs.append(s)
    write_colloid_file(args.out, recs)
    print(f"{n} particles (vf = {args.vf}) -> {args.out}")


if __name__ == "__main__":
    main()
