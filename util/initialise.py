#!/usr/bin/env python
"""Create t = 0 input state files for arbitrary fields.

TPU-native equivalent of the reference toolkit (ref: util/initialise.c,
which assembled row-major parallel input files of the order parameter
and LB distributions): build an initial distribution (equilibrium at a
given rho/u) and/or order-parameter field and write them in this
package's state-file format, so a run can start from them with
N_start > 0.

Usage:
  python util/initialise.py --size 32_32_32 --nvel 19 --rho 1.0 \
      --u 0.01_0.0_0.0 [--phi-npy phi.npy] --step 0 --dir .
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", required=True)
    ap.add_argument("--nvel", type=int, default=19)
    ap.add_argument("--rho", type=float, default=1.0)
    ap.add_argument("--u", default="0.0_0.0_0.0")
    ap.add_argument("--phi-npy")
    ap.add_argument("--step", type=int, default=0)
    ap.add_argument("--dir", default=".")
    args = ap.parse_args()
    import jax.numpy as jnp

    from ludwig_tpu.io import write_state
    from ludwig_tpu.lb import LBConfig
    from ludwig_tpu.ops.collide import equilibrium
    size = tuple(int(v) for v in args.size.split("_"))
    u0 = [float(v) for v in args.u.split("_")]
    cfg = LBConfig(size=size, nvel=args.nvel, eta_shear=0.1,
                   dtype="float64")
    rho = jnp.full(size, args.rho)
    u = jnp.stack([jnp.full(size, c) for c in u0])
    f = equilibrium(cfg.model, rho, u)
    fields = {"dist": np.asarray(f)}
    if args.phi_npy:
        fields["phi"] = np.load(args.phi_npy)
    write_state(args.dir, args.step, fields)
    print(f"dist{' + phi' if args.phi_npy else ''} -> "
          f"{args.dir}/*-{args.step:08d}")


if __name__ == "__main__":
    main()
