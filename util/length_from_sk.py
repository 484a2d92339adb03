#!/usr/bin/env python
"""Characteristic domain length from the structure factor S(k).

Port of the reference utility (ref: util/length_from_sk.c): FFT the
composition field, bin |phi_k|^2 into spherical shells over
k in (0, pi], and report  L = 2 pi <1/k>  with
<1/k> = sum_k S(k) dk / sum_k k S(k) dk.

Usage: python util/length_from_sk.py <phi-file> [X Y Z]
       phi-file is a raw float64 (X, Y, Z) field as written by the
       checkpoint layer (phi-<step> + .meta.json sidecar), or any
       .npy file.
"""

from __future__ import annotations

import json
import math
import os
import sys

import numpy as np

NBIN = 64


def read_phi(path, shape=None):
    if path.endswith(".npy"):
        return np.load(path)
    meta = path + ".meta.json"
    if os.path.exists(meta):
        with open(meta) as fh:
            shape = json.load(fh)["shape"]
    if shape is None:
        raise SystemExit("need X Y Z for a raw file without sidecar")
    return np.fromfile(path, dtype="<f8").reshape(shape)


def length_from_sk(phi: np.ndarray) -> float:
    nx, ny, nz = phi.shape
    ft = np.fft.fftn(phi)
    s = (ft * np.conj(ft)).real

    kx = np.fft.fftfreq(nx) * 2.0 * math.pi
    ky = np.fft.fftfreq(ny) * 2.0 * math.pi
    kz = np.fft.fftfreq(nz) * 2.0 * math.pi
    kmod = np.sqrt(kx[:, None, None] ** 2 + ky[None, :, None] ** 2
                   + kz[None, None, :] ** 2)

    dk = math.pi / NBIN
    nbin = np.minimum((kmod / dk).astype(int), NBIN - 1)
    sk = np.zeros(NBIN)
    nk = np.zeros(NBIN, int)
    sel = kmod <= math.pi
    np.add.at(sk, nbin[sel], s[sel])
    np.add.at(nk, nbin[sel], 1)

    sum1 = sum2 = 0.0
    for k in range(NBIN):
        if nk[k] == 0:
            continue
        smean = sk[k] / nk[k]
        kc = (k + 0.5) * dk
        sum1 += dk * smean
        sum2 += kc * dk * smean
    return 2.0 * math.pi * sum1 / sum2


def main():
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    shape = (tuple(int(v) for v in sys.argv[2:5])
             if len(sys.argv) >= 5 else None)
    phi = read_phi(sys.argv[1], shape)
    print(f"L = {sys.argv[1]} {length_from_sk(phi):g}")


if __name__ == "__main__":
    main()
