"""Leslie-Ericksen dynamics for the polar order parameter P.

TPU-native equivalent of the reference (ref: src/leslie_ericksen.c:
leslie_update_kernel :154-225, self-advection :282):

  dP_a/dt + div((u + swim P) P_a) =
      lambda D_ab P_b - Omega'_ab P_b + Gamma h_a

where the Leslie convention w_ab = d_a u_b is the transpose of the
hydro gradient tensor, giving the extra minus sign on Omega.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from ludwig_tpu.dynamics.beris_edwards import velocity_gradient_tensor
from ludwig_tpu.ops.advect import advective_fluxes, flux_divergence


@dataclasses.dataclass(frozen=True)
class LeslieEricksenParams:
    gamma: float           # rotational mobility Gamma
    lambda_: float = 0.0   # flow alignment
    swim: float = 0.0      # self-advection speed
    advection_order: int = 1


def leslie_ericksen_update(p: jnp.ndarray,
                           h,
                           u: Optional[jnp.ndarray],
                           params: LeslieEricksenParams) -> jnp.ndarray:
    """One forward-Euler step; p (3, X, Y, Z), h list of 3 arrays.

    The reference kernel updates p[ia] IN PLACE inside the component
    loop, so the lambda D.P - Omega.P terms for the y and z components
    see the already-updated earlier components (ref:
    leslie_update_kernel: 'sum' is computed from p[] after
    p[0..ia-1] += ...).  This deliberately sequential update breaks
    the x<->z lattice mirror symmetry at O(omega * dP) per step and is
    reproduced here for bitwise parity (fluxes and the molecular field
    are computed from the OLD field, as the reference precomputes
    them)."""
    if u is None:
        return p + jnp.stack([params.gamma * h[a] for a in range(3)])

    ueff = u + params.swim * p if params.swim else u
    # velocity_gradient_tensor returns w[a][b] = d_b u_a; Leslie
    # uses the transpose convention, hence omega gets a minus.
    w = velocity_gradient_tensor(u)
    d = [[0.5 * (w[a][b] + w[b][a]) for b in range(3)] for a in range(3)]
    om = [[-0.5 * (w[a][b] - w[b][a]) for b in range(3)]
          for a in range(3)]
    pl = [p[0], p[1], p[2]]
    for a in range(3):
        s = 0.0
        for b in range(3):
            s = s + (params.lambda_ * d[a][b] * pl[b]
                     - om[a][b] * pl[b])
        fx, fy, fz = advective_fluxes(ueff, p[a],
                                      params.advection_order)
        pl[a] = p[a] + (- fx + jnp.roll(fx, 1, 0)
                        - fy + jnp.roll(fy, 1, 1)
                        - fz + jnp.roll(fz, 1, 2)
                        + s + params.gamma * h[a])
    return jnp.stack(pl)
