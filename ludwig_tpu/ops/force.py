"""Momentum coupling: thermodynamic force on the fluid.

TPU-native equivalent of the reference force-calculation layer (ref:
src/phi_force.c:274-470 stress-divergence method, src/phi_grad_mu.c
phi-grad-mu method).  The stress is interpolated to cell faces and the
force is its (conservative) divergence, so global momentum is conserved
to round-off:

  F_a(i) = -[Fx_a(i+1/2) - Fx_a(i-1/2) + ...],
  Fx_a(i+1/2) = 1/2 (P_xa(i) + P_xa(i+1))
"""

from __future__ import annotations

import jax.numpy as jnp

from ludwig_tpu.ops.stencil import roll3


def _up(x, ax):
    s = [0, 0, 0]
    s[ax] = -1
    return roll3(x, tuple(s), first_axis=x.ndim - 3)


def _down(x, ax):
    s = [0, 0, 0]
    s[ax] = 1
    return roll3(x, tuple(s), first_axis=x.ndim - 3)


def stress_divergence_force(pth: jnp.ndarray) -> jnp.ndarray:
    """Force (3, X, Y, Z) from stress tensor pth (3, 3, X, Y, Z)."""
    comps = []
    for a in range(3):
        acc = None
        for ax in range(3):
            # flux of a-momentum through the ax-face: P[a][ax]
            # (ref: phi_force.c:384 fluxw[ia] = 0.5(pth1[ia][X]+pth0[ia][X]))
            face = 0.5 * (pth[a, ax] + _up(pth[a, ax], ax))
            d = face - _down(face, ax)
            acc = d if acc is None else acc + d
        comps.append(-acc)
    return jnp.stack(comps)


def grad_mu_force(phi: jnp.ndarray, grad_mu: jnp.ndarray) -> jnp.ndarray:
    """F = -phi grad(mu)  (ref: src/phi_grad_mu.c fd method)."""
    return -phi[None] * grad_mu
