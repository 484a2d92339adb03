#!/usr/bin/env python
"""Simulated crossed-polarizer micrograph from a Q-tensor field.

Port of the reference utility (ref: util/polarizer.c): per site the
director n and scalar order parameter s are taken from the principal
eigenpair of Q; each site acts as a Mueller retarder with phase

    delta = 2 pi s n_o (n_e / sqrt(n_o^2 + (n_e^2 - n_o^2) cos^2 a) - 1)
            / lambda

(a the angle between n and the ray, beta the azimuthal angle); the
Stokes vector of the incident beam is propagated through polarizer,
the per-site retarder chain along the ray, and the analyzer, and the
intensity image (first Stokes component) written as a (A, B) text
array.

Usage: python util/polarizer.py <q-file or .npy (5,X,Y,Z)> [options]
"""

from __future__ import annotations

import argparse
import json
import math
import os

import numpy as np


def director_from_q5(q5):
    """(n (3, ...), s (...)): principal eigenpair per site."""
    X, Y, Z = q5.shape[1:]
    q = np.empty((X, Y, Z, 3, 3))
    q[..., 0, 0] = q5[0]
    q[..., 0, 1] = q[..., 1, 0] = q5[1]
    q[..., 0, 2] = q[..., 2, 0] = q5[2]
    q[..., 1, 1] = q5[3]
    q[..., 1, 2] = q[..., 2, 1] = q5[4]
    q[..., 2, 2] = -q5[0] - q5[3]
    w, v = np.linalg.eigh(q)
    s = 1.5 * w[..., -1]                  # amplitude convention
    n = np.moveaxis(v[..., :, -1], -1, 0)
    return n, s


def mueller(delta, beta):
    sd, cd = np.sin(delta), np.cos(delta)
    sb, cb = np.sin(2.0 * beta), np.cos(2.0 * beta)
    m = np.zeros(delta.shape + (4, 4))
    m[..., 0, 0] = 1.0
    m[..., 1, 1] = cb * cb + sb * sb * cd
    m[..., 1, 2] = sb * cb * (1.0 - cd)
    m[..., 1, 3] = -sb * sd
    m[..., 2, 1] = sb * cb * (1.0 - cd)
    m[..., 2, 2] = sb * sb + cb * cb * cd
    m[..., 2, 3] = cb * sd
    m[..., 3, 1] = sb * sd
    m[..., 3, 2] = -cb * sd
    m[..., 3, 3] = cd
    return m


def polariser_matrix(angle):
    """Ideal linear polarizer Mueller matrix at `angle`
    (ref: polariser_matrix)."""
    c, s = np.cos(2.0 * angle), np.sin(2.0 * angle)
    return 0.5 * np.array([[1.0, c, s, 0.0],
                           [c, c * c, s * c, 0.0],
                           [s, s * c, s * s, 0.0],
                           [0.0, 0.0, 0.0, 0.0]])


def simulate(q5, raydir=2, n_o=1.5, n_e=1.6, wavelength=18.0,
             xi_polarizer=0.0, xi_analyzer=0.5 * math.pi):
    n, sop = director_from_q5(q5)
    axes = [0, 1, 2]
    axes.remove(raydir)
    a1, a2 = axes

    cosa = n[raydir]
    rej = np.sqrt(n_o * n_o + (n_e * n_e - n_o * n_o) * cosa * cosa)
    delta = 2.0 * math.pi * sop * n_o * (n_e / rej - 1.0) / wavelength
    beta = np.arctan2(n[a2], n[a1])
    m = mueller(delta, beta)

    p1 = polariser_matrix(xi_polarizer)
    p2 = polariser_matrix(xi_analyzer)
    s_in = np.array([1.0, 0.0, 0.0, 0.0])

    # propagate along the ray for every transverse pixel
    m_ray = np.moveaxis(m, raydir, 0)       # (L_ray, A, B, 4, 4)
    stokes = np.broadcast_to(p1 @ s_in,
                             m_ray.shape[1:3] + (4,)).copy()
    for sl in m_ray:
        stokes = np.einsum("abij,abj->abi", sl, stokes)
    stokes = np.einsum("ij,abj->abi", p2, stokes)
    return stokes[..., 0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--raydir", type=int, default=2)
    ap.add_argument("--n_o", type=float, default=1.5)
    ap.add_argument("--n_e", type=float, default=1.6)
    ap.add_argument("--wavelength", type=float, default=18.0)
    ap.add_argument("-o", "--out", default="polar-out.dat")
    args = ap.parse_args()

    if args.path.endswith(".npy"):
        q5 = np.load(args.path)
    else:
        with open(args.path + ".meta.json") as fh:
            shape = json.load(fh)["shape"]
        q5 = np.fromfile(args.path, dtype="<f8").reshape(shape)
    img = simulate(q5, raydir=args.raydir, n_o=args.n_o, n_e=args.n_e,
                   wavelength=args.wavelength)
    np.savetxt(args.out, img, fmt="%14.7e")
    print(f"Wrote {img.shape} intensity image to {args.out}")


if __name__ == "__main__":
    main()
