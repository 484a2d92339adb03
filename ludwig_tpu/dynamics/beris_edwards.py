"""Beris-Edwards Q-tensor dynamics.

TPU-native equivalent of the reference update (ref:
src/blue_phase_beris_edwards.c:304-470 beris_edw_update_host):

  dQ/dt + div(u Q) = Gamma H + S(W, Q) (+ noise)

  S = (xi D + Omega)(Q + I/3) + (Q + I/3)(xi D - Omega)
      - 2 xi (Q + I/3) Tr(Q W)

with W_ab = d_b u_a (central differences, trace removed,
ref: src/hydro.c hydro_u_gradient_tensor), D/Omega its symmetric and
antisymmetric parts, and the advective term in conservative face-flux
form (same upwind schemes as the scalar order parameter).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from ludwig_tpu.fe.blue_phase import q33_to_q5, q5_to_q33
from ludwig_tpu.ops.advect import advective_fluxes, flux_divergence
from ludwig_tpu.ops.stencil import roll3


@dataclasses.dataclass(frozen=True)
class BerisEdwardsParams:
    gamma: float              # rotational mobility (input key lc_Gamma)
    xi: float                 # flow-alignment (shared with the FE)
    advection_order: int = 1


def velocity_gradient_tensor(u: jnp.ndarray, wallspec=None):
    """w[a][b] = d_b u_a, central differences, traceless
    (ref: hydro.c hydro_u_gradient_tensor).  With walls the off-edge
    neighbour velocity is the wall velocity."""
    def d(comp, ax):
        s_up = [0, 0, 0]
        s_up[ax] = -1
        s_dn = [0, 0, 0]
        s_dn[ax] = 1
        return 0.5 * (roll3(u[comp], tuple(s_up)) -
                      roll3(u[comp], tuple(s_dn)))

    w = [[d(a, b) for b in range(3)] for a in range(3)]
    if wallspec is not None and wallspec.any:
        from ludwig_tpu.ops.walls import wall_velocity_gradient_fix
        w = wall_velocity_gradient_fix(w, u, wallspec)
    tr = (w[0][0] + w[1][1] + w[2][2]) / 3.0
    for a in range(3):
        w[a][a] = w[a][a] - tr
    return w


def corotation_term(q33, u: jnp.ndarray, xi: float, wallspec=None):
    """S(W, Q) as a 3x3 list of arrays."""
    w = velocity_gradient_tensor(u, wallspec)
    r3 = 1.0 / 3.0

    trace_qw = sum(q33[a][b] * w[b][a] for a in range(3) for b in range(3))
    d = [[0.5 * (w[a][b] + w[b][a]) for b in range(3)] for a in range(3)]
    om = [[0.5 * (w[a][b] - w[b][a]) for b in range(3)] for a in range(3)]

    s = [[None] * 3 for _ in range(3)]
    for a in range(3):
        for b in range(3):
            val = -2.0 * xi * (q33[a][b] + (r3 if a == b else 0.0)) * trace_qw
            for c in range(3):
                val = val + (xi * d[a][c] + om[a][c]) * (
                    q33[c][b] + (r3 if c == b else 0.0))
                val = val + (q33[a][c] + (r3 if a == c else 0.0)) * (
                    xi * d[c][b] - om[c][b])
            s[a][b] = val
    return s


def beris_edwards_update(q5: jnp.ndarray,
                         h33,
                         u: Optional[jnp.ndarray],
                         params: BerisEdwardsParams,
                         fluid_mask: Optional[jnp.ndarray] = None,
                         noise5: Optional[jnp.ndarray] = None,
                         wallspec=None,
                         solid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """One forward-Euler BE step; returns updated q5 (5, X, Y, Z).

    h33 is the molecular field as a 3x3 list (from the free energy).
    """
    g = params.gamma
    rhs5 = [g * h33[0][0], g * h33[0][1], g * h33[0][2],
            g * h33[1][1], g * h33[1][2]]

    if u is not None:
        q33 = q5_to_q33(q5)
        s = corotation_term(q33, u, params.xi, wallspec)
        s5 = [s[0][0], s[0][1], s[0][2], s[1][1], s[1][2]]
        rhs5 = [r + si for r, si in zip(rhs5, s5)]
        # conservative advection of each component
        for n in range(5):
            fluxes = advective_fluxes(u, q5[n], params.advection_order)
            if wallspec is not None and wallspec.any:
                from ludwig_tpu.ops.walls import no_flux_at_walls
                fluxes = no_flux_at_walls(fluxes, wallspec)
            if solid is not None:
                from ludwig_tpu.ops.advect import no_flux_at_solid
                fluxes = no_flux_at_solid(fluxes, solid)
            rhs5[n] = rhs5[n] - flux_divergence(fluxes)

    if noise5 is not None:
        rhs5 = [r + noise5[n] for n, r in enumerate(rhs5)]

    dq = jnp.stack(rhs5)
    if fluid_mask is not None:
        dq = jnp.where(fluid_mask[None], dq, 0.0)
    return q5 + dq
