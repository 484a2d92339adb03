#!/usr/bin/env python
"""Generate the polymer initial colloid file for serial-poly-st1.

Exact port of the reference utility (ref: util/multi_poly_init.c): one
30-monomer subgrid polymer grown with the serial LCG random stream
(util.c util_ranlcg_reap_uniform, a = 1389796, m = 2^31 - 1, seed
12345) and Marsaglia unit vectors; writes config.cds.init.001-001 in
the reference ascii record format.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ludwig_tpu.io.colloid_io import default_state, write_colloid_file

RANLCG_A = 1389796
RANLCG_M = 2147483647

NTOTAL = (18, 18, 18)
PERIODIC = (1, 1, 1)
A0, AH, AL = 0.178, 0.2, 1.58
DH = 0.50
NPOLY, LPOLY = 1, 30
LBOND = 1.0
TYPE_SUBGRID = 2


class Lcg:
    def __init__(self, seed=12345):
        self.s = seed

    def uniform(self):
        self.s = (RANLCG_A * self.s) % RANLCG_M
        return self.s * (1.0 / RANLCG_M)


def unit_vector(rng):
    """ref: util.c util_random_unit_vector (Marsaglia 1972)."""
    while True:
        z1 = 1.0 - 2.0 * rng.uniform()
        z2 = 1.0 - 2.0 * rng.uniform()
        zsq = z1 * z1 + z2 * z2
        if zsq <= 1.0:
            break
    root = math.sqrt(1.0 - zsq)
    return [2.0 * z1 * root, 2.0 * z2 * root, 1.0 - 2.0 * zsq]


def min_image(a, b):
    out = []
    for ia in range(3):
        d = a[ia] - b[ia]
        if PERIODIC[ia]:
            L = float(NTOTAL[ia])
            if d > 0.5 * L:
                d -= L
            if d < -0.5 * L:
                d += L
        out.append(d)
    return out


def trial(rng, dh):
    """ref: colloid_init_trial (lmin = 0.5)."""
    r = []
    for ia in range(3):
        lmin, lmax = 0.5, 0.5 + NTOTAL[ia]
        if not PERIODIC[ia]:
            lmin += dh
            lmax -= dh
        r.append(lmin + (lmax - lmin) * rng.uniform())
    return r


def grow_one(rng, r1, dh, lbond):
    """ref: grow_one_monomer."""
    while True:
        v = unit_vector(rng)
        r2 = [r1[ia] + lbond * v[ia] for ia in range(3)]
        ok = True
        for ia in range(3):
            lmin, lmax = 0.5, 0.5 + NTOTAL[ia]
            if not PERIODIC[ia]:
                lmin += dh
                lmax -= dh
            if r2[ia] <= lmin or r2[ia] >= lmax:
                ok = False
                break
        if ok:
            return r2


def main():
    rng = Lcg()
    n = NPOLY * LPOLY
    states = []
    for i in range(n):
        s = default_state()
        s["index"] = 1 + i
        s["rebuild"] = 1
        s["a0"], s["ah"], s["al"] = A0, AH, AL
        s["m"] = [1.0, 0.0, 0.0]
        s["type"] = TYPE_SUBGRID
        s["rng"] = 1 + i
        states.append(s)

    placed = []
    for pl in range(NPOLY):
        mon1 = pl * LPOLY
        while True:
            rt = trial(rng, states[mon1]["ah"] + DH)
            if not any(
                    math.sqrt(sum(d * d for d in min_image(rt, p))) <=
                    states[mon1]["ah"] + AH + DH for p in placed):
                break
        states[mon1]["r"] = rt
        states[mon1]["nbonds"] = 1
        states[mon1]["bond"] = [mon1 + 2, 0]
        placed.append(rt)
        for monl in range(1, LPOLY):
            mon2 = pl * LPOLY + monl
            prev = states[mon2 - 1]["r"]
            while True:
                rt = grow_one(rng, prev, states[mon2]["ah"] + DH, LBOND)
                if not any(
                        math.sqrt(sum(d * d
                                      for d in min_image(rt, p))) <=
                        states[mon2]["ah"] + AH + DH for p in placed):
                    break
            states[mon2]["r"] = rt
            if monl < LPOLY - 1:
                states[mon2]["nbonds"] = 2
                states[mon2]["bond"] = [mon2, mon2 + 2]
            else:
                states[mon2]["nbonds"] = 1
                states[mon2]["bond"] = [mon2, 0]
            placed.append(rt)

    write_colloid_file("config.cds.init.001-001", states)


if __name__ == "__main__":
    main()
