"""Ewald sums for dipolar colloid suspensions.

TPU-native equivalent of the reference module (ref: src/ewald.c:
ewald_real_space_sum :503, ewald_fourier_space_sum :638,
ewald_self_energy :450; kappa = 5/(2 rc), nk = ceil(kappa^2 rc Lx/pi),
kmax = (2 pi nk / Lx)^2).

Dipoles are mu * s_n with |s_n| = 1 (s is the colloid state 's'
vector).  Forces/torques are fully vectorised: the real-space part is
an all-pairs (N, N) computation with the minimum image (the reference's
cell-list double loop visits exactly these pairs for rc <= L/2); the
Fourier part evaluates every retained wavevector for all particles at
once.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax.scipy.special import erfc


def ewald_params(mu: float, rc: float, size):
    kappa = 5.0 / (2.0 * rc)
    nk = int(np.ceil(kappa * kappa * rc * size[0] / np.pi))
    kmax = (2.0 * np.pi * nk / size[0]) ** 2
    return kappa, nk, kmax


def self_energy(mu: float, rc: float, n: int) -> float:
    """Constant self-interaction term (ref: ewald_self_energy)."""
    kappa = 5.0 / (2.0 * rc)
    return -n * (2.0 / 3.0) * mu * mu * kappa ** 3 / np.sqrt(np.pi)


def real_space(R, S, mu, rc, size):
    """(energy, F (N, 3), T (N, 3)): erfc-screened dipole pairs."""
    N = R.shape[0]
    kappa = 5.0 / (2.0 * rc)
    rpi = 1.0 / np.sqrt(np.pi)
    L = jnp.asarray(np.array(size, np.float64), R.dtype)
    r12 = R[:, None, :] - R[None, :, :]            # R_i - R_j
    r12 = r12 - L * jnp.round(r12 / L)
    r2 = jnp.sum(r12 * r12, axis=-1)
    iu = ~jnp.eye(N, dtype=bool)
    r = jnp.sqrt(jnp.where(iu, r2, 1.0))
    pair = jnp.logical_and(iu, r < rc)
    rr = 1.0 / r
    b1 = mu * mu * erfc(kappa * r) * rr ** 3
    b2 = (mu * mu * (2.0 * kappa * rpi)
          * jnp.exp(-kappa * kappa * r * r) * rr * rr)
    b = b1 + b2
    c = 3.0 * b1 * rr * rr + (2.0 * kappa * kappa + 3.0 * rr * rr) * b2
    d = 5.0 * c / (r * r) + 4.0 * kappa ** 4 * b2

    udotu = jnp.einsum("ia,ja->ij", S, S)
    u1dotr = jnp.einsum("ia,ija->ij", S, r12)      # s_i . r12
    u2dotr = jnp.einsum("ja,ija->ij", S, r12)      # s_j . r12

    pm = pair.astype(R.dtype)
    energy = 0.5 * jnp.sum(pm * (udotu * b - u1dotr * u2dotr * c))

    f = ((udotu * c - u1dotr * u2dotr * d)[..., None] * r12
         + c[..., None] * (u2dotr[..., None] * S[:, None, :]
                           + u1dotr[..., None] * S[None, :, :]))
    F = jnp.sum(pm[..., None] * f, axis=1)

    g = b[..., None] * S[None, :, :] - (c * u2dotr)[..., None] * r12
    g = jnp.sum(pm[..., None] * g, axis=1)         # (N, 3)
    T = -jnp.cross(S, g)
    return energy, F, T


def fourier_space(R, S, mu, rc, size):
    """(energy, F (N, 3), T (N, 3)): reciprocal sum
    (ref: ewald_fourier_space_sum; kz >= 0 half-space with doubling)."""
    kappa, nk, kmax = ewald_params(mu, rc, size)
    L = np.array(size, np.float64)
    fk = 2.0 * np.pi / L
    b0 = (4.0 * np.pi / (L[0] * L[1] * L[2])) * mu * mu
    r4k = 1.0 / (4.0 * kappa * kappa)

    ks = []
    wt = []
    for kz in range(0, nk + 1):
        for ky in range(-nk, nk + 1):
            for kx in range(-nk, nk + 1):
                k = (fk[0] * kx, fk[1] * ky, fk[2] * kz)
                ksq = k[0] ** 2 + k[1] ** 2 + k[2] ** 2
                if ksq <= 0.0 or ksq > kmax:
                    continue
                ks.append(k)
                wt.append(2.0 if kz > 0 else 1.0)
    k = jnp.asarray(np.array(ks), R.dtype)         # (K, 3)
    wt = jnp.asarray(np.array(wt), R.dtype)
    ksq = jnp.sum(k * k, axis=1)
    b = b0 * jnp.exp(-r4k * ksq) / ksq * wt        # (K,)

    kr = jnp.einsum("ka,na->kn", k, R)             # (K, N)
    udotk = jnp.einsum("ka,na->kn", k, S)
    sinx = jnp.sum(udotk * jnp.sin(kr), axis=1)    # S(k)
    cosx = jnp.sum(udotk * jnp.cos(kr), axis=1)

    energy = 0.5 * jnp.sum(b * (sinx * sinx + cosx * cosx))

    fampl = b[:, None] * (cosx[:, None] * jnp.sin(kr)
                          - sinx[:, None] * jnp.cos(kr)) * udotk
    F = jnp.einsum("kn,ka->na", fampl, k)
    gampl = b[:, None] * (cosx[:, None] * jnp.cos(kr)
                          + sinx[:, None] * jnp.sin(kr))
    g = jnp.einsum("kn,ka->na", gampl, k)
    T = -jnp.cross(S, g)
    return energy, F, T


def ewald_sum(R, S, mu, rc, size):
    """(F, T): total real + Fourier dipolar interactions."""
    _, Fr, Tr = real_space(R, S, mu, rc, size)
    _, Fk, Tk = fourier_space(R, S, mu, rc, size)
    return Fr + Fk, Tr + Tk
