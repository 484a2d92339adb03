"""Cahn-Hilliard finite-difference solver for the binary order parameter.

TPU-native equivalent of the reference CH update (ref:
src/phi_cahn_hilliard.c: phi_ch_flux_mu1 :295 two-point diffusive flux,
phi_ch_ufs_kernel :1017 forward-Euler divergence update), in flux form
for exact conservation:

  flux(face) = advective (order-n upwind) + diffusive -M (mu_j - mu_i)
  phi'       = phi - div(flux)

Fluxes normal to solid faces are masked (ref: src/advection_bcs.c), and
an optional fluctuating flux supports the symmetric_noise free energy.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from ludwig_tpu.ops.advect import (advective_fluxes, flux_divergence,
                                   no_flux_at_solid, _up)


@dataclasses.dataclass(frozen=True)
class CahnHilliardParams:
    mobility: float
    advection_order: int = 1


def cahn_hilliard_update(phi: jnp.ndarray,
                         mu: jnp.ndarray,
                         u: Optional[jnp.ndarray],
                         params: CahnHilliardParams,
                         solid: Optional[jnp.ndarray] = None,
                         random_flux: Optional[list] = None,
                         wallspec=None,
                         noise_stencil: bool = False,
                         gradmu_ex=(0.0, 0.0, 0.0)) -> jnp.ndarray:
    """One forward-Euler CH step; returns updated phi.

    Args:
      phi:  (X, Y, Z) order parameter.
      mu:   (X, Y, Z) chemical potential (from the free energy).
      u:    (3, X, Y, Z) fluid velocity or None (diffusion only,
            `hydrodynamics off`).
      solid: (X, Y, Z) bool mask - no-flux condition at solid faces.
      random_flux: optional [fx, fy, fz] fluctuating face fluxes.
      noise_stencil: with flux noise the reference switches the
        diffusive flux to the expanded Sumesh et al. form
          fe(i -> i+1) = -0.25 M (mu(i+2) + mu(i+1) - mu(i) - mu(i-1))
        whose Nyquist damping vanishes (ref: phi_cahn_hilliard.c
        phi_ch_dif_flux_kernel).
    """
    if u is not None:
        fluxes = advective_fluxes(u, phi, params.advection_order)
    else:
        fluxes = [jnp.zeros_like(phi) for _ in range(3)]

    m = params.mobility
    if noise_stencil:
        def up2(x, ax):
            return _up(_up(x, ax), ax)

        def down(x, ax):
            s = [0, 0, 0]
            s[ax] = 1
            return jnp.roll(x, tuple(s), axis=(0, 1, 2))

        fluxes = [fluxes[ax] - 0.25 * m * (up2(mu, ax) + _up(mu, ax)
                                           - mu - down(mu, ax))
                  for ax in range(3)]
    else:
        fluxes = [fluxes[ax] - m * (_up(mu, ax) - mu) for ax in range(3)]

    if any(g != 0.0 for g in gradmu_ex):
        # constant flux from the external chemical-potential gradient
        # (ref: phi_ch_flux_mu_ext_kernel)
        fluxes = [fluxes[ax] - m * gradmu_ex[ax] for ax in range(3)]

    if random_flux is not None:
        fluxes = [fluxes[ax] + random_flux[ax] for ax in range(3)]

    if solid is not None:
        fluxes = no_flux_at_solid(fluxes, solid)
    if wallspec is not None:
        from ludwig_tpu.ops.walls import no_flux_at_walls
        fluxes = no_flux_at_walls(fluxes, wallspec)

    return phi - flux_divergence(fluxes)
