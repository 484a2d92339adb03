#!/usr/bin/env python
"""Generate random colloid initial configurations.

TPU-native equivalent of the reference colloid_init utility (ref:
util/colloid_init.c): random non-overlapping sphere placement written
as a .npz consumable by the colloid runtime.

Usage: python util/colloid_init.py --size 64_64_64 --n 10 --a0 2.3 --out colloids.npz
"""

import argparse

import numpy as np


def place_random(size, n, a0, ah, dh=0.5, seed=13, max_tries=100000):
    rng = np.random.default_rng(seed)
    L = np.asarray(size, float)
    R = []
    tries = 0
    while len(R) < n and tries < max_tries:
        tries += 1
        r = rng.random(3) * L
        ok = True
        for q in R:
            d = r - q
            d -= L * np.round(d / L)
            if np.linalg.norm(d) < 2.0 * ah + dh:
                ok = False
                break
        if ok:
            R.append(r)
    if len(R) < n:
        raise SystemExit(f"placed only {len(R)}/{n} after {tries} tries")
    return np.asarray(R)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", required=True)
    ap.add_argument("--n", type=int, required=True)
    ap.add_argument("--a0", type=float, default=2.3)
    ap.add_argument("--ah", type=float, default=None)
    ap.add_argument("--dh", type=float, default=0.5)
    ap.add_argument("--seed", type=int, default=13)
    ap.add_argument("--out", default="colloids.npz")
    args = ap.parse_args()
    size = tuple(int(v) for v in args.size.split("_"))
    ah = args.ah if args.ah is not None else args.a0
    R = place_random(size, args.n, args.a0, ah, args.dh, args.seed)
    np.savez(args.out, r=R, v=np.zeros_like(R), w=np.zeros_like(R),
             a0=np.full(args.n, args.a0), ah=np.full(args.n, ah))
    print(f"wrote {args.out}: {args.n} colloids in {size}")


if __name__ == "__main__":
    main()
