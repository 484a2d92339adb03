"""Colloid-colloid interactions: pair potentials, lubrication, bonds.

TPU-native equivalent of the reference interaction layer (ref:
src/interaction.c:182 interact_compute, src/pair_ss_cut.c:176-245,
src/pair_lj_cut.c, src/pair_yukawa.c, src/lubrication.c:246-315,
src/bond_fene.c, src/angle_cosine.c).

The reference walks cell lists; particle counts here are small
fixed-capacity arrays, so all pairs are evaluated as dense (N, N)
tensors with periodic minimum-image separations - no lists, no halos.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def pair_separations(R: jnp.ndarray, box) -> jnp.ndarray:
    """r12[i, j] = R_j - R_i with minimum image; (N, N, 3)."""
    L = jnp.asarray(np.array(box, np.float64), R.dtype)
    d = R[None, :, :] - R[:, None, :]
    return d - L * jnp.round(d / L)


def _pair_mask(n, dtype=bool):
    return jnp.asarray(~np.eye(n, dtype=bool))


def soft_sphere_forces(R: jnp.ndarray, ah: jnp.ndarray, box,
                       epsilon: float, sigma: float, nu: float,
                       hc: float):
    """Cut-and-shifted soft-sphere forces (ref: pair_ss_cut.c:195-245).

    V(h) = eps (sigma/h)^nu - V(hc) - (h - hc) V'(hc),  h = r - ah_i - ah_j
    Returns (forces (N,3), total potential)."""
    n = R.shape[0]
    r12 = pair_separations(R, box)
    r = jnp.sqrt(jnp.sum(r12 * r12, axis=-1))
    r = jnp.where(_pair_mask(n), r, 1.0)
    h = r - ah[:, None] - ah[None, :]
    h = jnp.maximum(h, 1e-12)

    vcut = epsilon * (sigma / hc) ** nu
    dvcut = -epsilon * nu / sigma * (sigma / hc) ** (nu + 1.0)

    act = jnp.logical_and(_pair_mask(n), h < hc)
    v = epsilon * (sigma / h) ** nu - vcut - (h - hc) * dvcut
    fmod = -(-epsilon * nu / sigma * (sigma / h) ** (nu + 1.0) - dvcut)
    # force on i is -fmod * rhat(i->j)  (ref: pc1->force -= f r12/r)
    fvec = jnp.where(act[..., None], -fmod[..., None] * r12 / r[..., None],
                     0.0)
    vtotal = 0.5 * jnp.sum(jnp.where(act, v, 0.0))
    return jnp.sum(fvec, axis=1), vtotal


def soft_sphere_ij_forces(R: jnp.ndarray, ah: jnp.ndarray, box,
                          eps_pp: np.ndarray, sig_pp: np.ndarray,
                          nu_pp: np.ndarray, hc_pp: np.ndarray):
    """Per-pair-type cut-and-shifted soft-sphere forces (ref:
    pair_ss_cut_ij.c).  *_pp are static (N, N) per-particle-pair
    parameter matrices built from the type table."""
    n = R.shape[0]
    r12 = pair_separations(R, box)
    r = jnp.sqrt(jnp.sum(r12 * r12, axis=-1))
    r = jnp.where(_pair_mask(n), r, 1.0)
    h = jnp.maximum(r - ah[:, None] - ah[None, :], 1e-12)
    eps = jnp.asarray(eps_pp)
    sig = jnp.asarray(sig_pp)
    nu = jnp.asarray(nu_pp)
    hc = jnp.asarray(hc_pp)
    vcut = eps * (sig / hc) ** nu
    dvcut = -eps * nu / sig * (sig / hc) ** (nu + 1.0)
    act = jnp.logical_and(jnp.logical_and(_pair_mask(n), h < hc), eps > 0.0)
    fmod = -(-eps * nu / sig * (sig / h) ** (nu + 1.0) - dvcut)
    fvec = jnp.where(act[..., None], -fmod[..., None] * r12 / r[..., None],
                     0.0)
    v = eps * (sig / h) ** nu - vcut - (h - hc) * dvcut
    vtotal = 0.5 * jnp.sum(jnp.where(act, v, 0.0))
    return jnp.sum(fvec, axis=1), vtotal


def yukawa_forces(R, box, epsilon: float, kappa: float, rc: float):
    """V = eps exp(-kappa r)/r, cut-and-FORCE-shifted so both V and
    dV/dr vanish at rc (ref: pair_yukawa.c:207-215: the pair force is
    f = -(dV/dr - dV/dr|_rc))."""
    import math
    n = R.shape[0]
    r12 = pair_separations(R, box)
    r = jnp.sqrt(jnp.sum(r12 * r12, axis=-1))
    r = jnp.where(_pair_mask(n), r, 1.0)
    act = jnp.logical_and(_pair_mask(n), r < rc)
    # -dV/dr = eps e^{-kr} (1/r)(1/r + k); dvcut = dV/dr at rc
    fmod = epsilon * jnp.exp(-kappa * r) * (1.0 / r) * (1.0 / r + kappa)
    dvcut = -epsilon * math.exp(-kappa * rc) * (1.0 / rc) * (1.0 / rc
                                                             + kappa)
    f = fmod + dvcut
    fvec = jnp.where(act[..., None], -f[..., None] * r12 / r[..., None],
                     0.0)
    return jnp.sum(fvec, axis=1)


def lj_cut_forces(R, box, epsilon: float, sigma: float, rc: float):
    """Lennard-Jones, cut-and-force-shifted (ref: pair_lj_cut.c:
    f = -(dV/dr - dvcut), dV/dr = -24 eps (2 rs^2 - rs)/r with
    rs = (sigma/r)^6)."""
    n = R.shape[0]
    r12 = pair_separations(R, box)
    r = jnp.sqrt(jnp.sum(r12 * r12, axis=-1))
    r = jnp.where(_pair_mask(n), r, 1.0)
    act = jnp.logical_and(_pair_mask(n), r <= rc)
    rs = (sigma / r) ** 6
    rsc = (sigma / rc) ** 6
    dvcut = -24.0 * (1.0 / rc) * epsilon * (2.0 * rsc * rsc - rsc)
    f = -(-24.0 * (1.0 / r) * epsilon * (2.0 * rs * rs - rs) - dvcut)
    fvec = jnp.where(act[..., None], -f[..., None] * r12 / r[..., None],
                     0.0)
    return jnp.sum(fvec, axis=1)


def lubrication_normal(R, V, ah, box, eta: float, rch: float):
    """Normal lubrication correction between near-contact spheres
    (ref: lubrication.c:263-290):

      F = -6 pi eta (a1 a2)^2/(a1+a2)^2 (1/h - 1/rch) (rhat.du) rhat
    """
    n = R.shape[0]
    r12 = pair_separations(R, box)          # R_j - R_i
    r = jnp.sqrt(jnp.sum(r12 * r12, axis=-1))
    r = jnp.where(_pair_mask(n), r, 1.0)
    a1 = ah[:, None]
    a2 = ah[None, :]
    h = r - a1 - a2
    act = jnp.logical_and(_pair_mask(n),
                          jnp.logical_and(h < rch, h > 1e-12))
    hsafe = jnp.maximum(h, 1e-6)
    fmod = -6.0 * np.pi * eta * (a1 * a1 * a2 * a2) * (
        1.0 / hsafe - 1.0 / rch) / ((a1 + a1) * (a2 + a2))
    rhat = r12 / r[..., None]
    du = V[:, None, :] - V[None, :, :]
    rdotdu = jnp.sum(rhat * du, axis=-1)
    fvec = jnp.where(act[..., None], (fmod * rdotdu)[..., None] * rhat, 0.0)
    return jnp.sum(fvec, axis=1)


def lubrication_tangential(R, V, ah, box, eta: float, rch: float):
    """Tangential lubrication correction (ref: lubrication.c:293-315):

      fmod = -(24/15) pi eta a1 a2 (2 a1^2 + a1 a2 + 2 a2^2)
             [ln((a1+a2)/2h) - ln((a1+a2)/2rch)] / (a1+a2)^3
      F = fmod (du - (rhat.du) rhat)
    """
    n = R.shape[0]
    r12 = pair_separations(R, box)
    r = jnp.sqrt(jnp.sum(r12 * r12, axis=-1))
    r = jnp.where(_pair_mask(n), r, 1.0)
    a1 = ah[:, None]
    a2 = ah[None, :]
    h = r - a1 - a2
    act = jnp.logical_and(_pair_mask(n),
                          jnp.logical_and(h < rch, h > 1e-12))
    hsafe = jnp.maximum(h, 1e-6)
    asum = a1 + a2
    fmod = -(24.0 / 15.0) * np.pi * eta * a1 * a2 * (
        2.0 * a1 * a1 + a1 * a2 + 2.0 * a2 * a2) * (
        jnp.log(0.5 * asum / hsafe) - np.log(1.0)
        - jnp.log(0.5 * asum / rch)) / (asum * asum * asum)
    rhat = r12 / r[..., None]
    du = V[:, None, :] - V[None, :, :]
    rdotdu = jnp.sum(rhat * du, axis=-1)
    fvec = jnp.where(act[..., None],
                     fmod[..., None] * (du - rdotdu[..., None] * rhat),
                     0.0)
    return jnp.sum(fvec, axis=1)


def fene_bond_forces(R, box, bonds: np.ndarray, kappa: float, r0: float):
    """FENE bonds: F = -k r / (1 - (r/r0)^2) (ref: bond_fene.c).
    bonds: (nb, 2) int array of particle index pairs."""
    if len(bonds) == 0:
        return jnp.zeros_like(R)
    L = jnp.asarray(np.array(box, np.float64), R.dtype)
    i = jnp.asarray(bonds[:, 0])
    j = jnp.asarray(bonds[:, 1])
    d = R[j] - R[i]
    d = d - L * jnp.round(d / L)
    r2 = jnp.sum(d * d, axis=-1)
    fmod = kappa / (1.0 - r2 / (r0 * r0))
    fb = fmod[:, None] * d          # force on i toward j
    out = jnp.zeros_like(R)
    out = out.at[i].add(fb)
    out = out.at[j].add(-fb)
    return out


def angle_cosine_forces(R, box, angles: np.ndarray, kappa: float):
    """Cosine angle potential V = kappa (1 + cos theta)
    (ref: angle_cosine.c); angles: (na, 3) int (i - centre j - k)."""
    if len(angles) == 0:
        return jnp.zeros_like(R)
    L = jnp.asarray(np.array(box, np.float64), R.dtype)
    i = jnp.asarray(angles[:, 0])
    j = jnp.asarray(angles[:, 1])
    k = jnp.asarray(angles[:, 2])
    r_ij = R[i] - R[j]
    r_kj = R[k] - R[j]
    r_ij = r_ij - L * jnp.round(r_ij / L)
    r_kj = r_kj - L * jnp.round(r_kj / L)
    rij = jnp.sqrt(jnp.sum(r_ij ** 2, -1))
    rkj = jnp.sqrt(jnp.sum(r_kj ** 2, -1))
    cosq = jnp.sum(r_ij * r_kj, -1) / (rij * rkj)
    fi = -(kappa / (rij * rkj))[:, None] * r_kj \
        + (kappa * cosq / (rij * rij))[:, None] * r_ij
    fk = -(kappa / (rij * rkj))[:, None] * r_ij \
        + (kappa * cosq / (rkj * rkj))[:, None] * r_kj
    out = jnp.zeros_like(R)
    out = out.at[i].add(fi)
    out = out.at[k].add(fk)
    out = out.at[j].add(-(fi + fk))
    return out
