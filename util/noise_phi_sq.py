#!/usr/bin/env python
"""Structure factor S(k) of the order parameter field.

TPU-native equivalent of the reference utility (ref:
util/noise_phi_sq.c, which used FFTW): Fourier transform phi, bin
|phi(k)|^2 on a regular |k| grid, and print k, S(k) pairs.  Useful for
validating fluctuating binary runs against capillary-wave theory.

Usage:
  python util/noise_phi_sq.py --dir . --step 1000 [--field phi]
  python util/noise_phi_sq.py --npy phi.npy
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def structure_factor(phi, nbins=None):
    phi = np.asarray(phi, np.float64)
    ft = np.fft.fftn(phi)
    s = (ft * np.conj(ft)).real / phi.size
    k = [np.fft.fftfreq(n) * 2.0 * np.pi for n in phi.shape]
    kk = np.sqrt(sum(np.meshgrid(*k, indexing="ij")[a] ** 2
                     for a in range(phi.ndim)))
    nbins = nbins or max(phi.shape) // 2
    kmax = np.pi
    edges = np.linspace(0.0, kmax, nbins + 1)
    which = np.digitize(kk.reshape(-1), edges) - 1
    sk = np.zeros(nbins)
    cnt = np.zeros(nbins)
    np.add.at(sk, np.clip(which, 0, nbins - 1), s.reshape(-1))
    np.add.at(cnt, np.clip(which, 0, nbins - 1), 1.0)
    mid = 0.5 * (edges[:-1] + edges[1:])
    ok = cnt > 0
    return mid[ok], sk[ok] / cnt[ok]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=".")
    ap.add_argument("--step", type=int)
    ap.add_argument("--field", default="phi")
    ap.add_argument("--npy")
    ap.add_argument("--nbins", type=int, default=0)
    args = ap.parse_args()
    if args.npy:
        phi = np.load(args.npy)
    else:
        from ludwig_tpu.io import read_state
        phi = read_state(args.dir, args.step, [args.field])[args.field]
    kk, sk = structure_factor(phi, args.nbins or None)
    for k, s in zip(kk, sk):
        print(f"{k:14.7e} {s:14.7e}")


if __name__ == "__main__":
    main()
