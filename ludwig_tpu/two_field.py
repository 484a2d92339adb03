"""Two-order-parameter simulations: surfactant and ternary fluids.

TPU-native equivalent of the reference's generic two-field
Cahn-Hilliard wiring (ref: src/cahn_hilliard.c ch_solver :174 - the
(phi, psi) solver used by surfactant and ternary free energies, with
per-field mobilities; force coupling via the FE stress divergence as in
ludwig.c).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ludwig_tpu.dynamics.cahn_hilliard import (CahnHilliardParams,
                                               cahn_hilliard_update)
from ludwig_tpu.lb import LBConfig, initial_rest
from ludwig_tpu.ops.collide import collide
from ludwig_tpu.ops.force import stress_divergence_force
from ludwig_tpu.ops.stencil import gradient_ops
from ludwig_tpu.ops.stream import stream_bounce_back


@dataclasses.dataclass(frozen=True)
class TwoFieldConfig:
    lb: LBConfig
    fe: object                       # SurfactantFE or TernaryFE
    mobilities: Tuple[float, float] = (1.0, 1.0)
    advection_order: int = 1
    gradient: str = "3d_7pt_fluid"
    hydrodynamics: bool = True
    # ternary defaults to phi_gradmu (ref: ludwig.c fe ternary block
    # 'Default method for ternary free energy: phi_gradmu'); the
    # surfactant keeps the global default stress_divergence
    force_method: str = "stress_divergence"


def two_fields(phi, psi, gradient: str, solid_ops=None):
    """Field+gradient dict.  solid_ops: ((grad,delsq) for phi,
    (grad,delsq) for psi) wetting-aware stencil pairs overriding the
    named fluid stencil (ref: gradient_*_ternary_solid.c)."""
    if solid_ops is not None:
        (gp, dp), (gs, ds) = solid_ops
    else:
        gp, dp = gradient_ops(gradient)
        gs, ds = gp, dp
    return {"phi": phi, "psi": psi,
            "grad_phi": gp(phi), "grad_psi": gs(psi),
            "delsq_phi": dp(phi), "delsq_psi": ds(psi)}


def make_two_field_step(cfg: TwoFieldConfig, solid=None, wallspec=None,
                        solid_ops=None):
    """Jitted step: (f, phi, psi, u[, gwall]) -> (state, rho).

    With wallspec (halo plane walls, ref: wall.c) the CH fluxes vanish
    at walled faces, the LB gets half-way bounce-back there, and the
    state carries a gwall momentum accumulator.
    """
    params = cfg.lb.collision_params()
    model = cfg.lb.model
    ch0 = CahnHilliardParams(mobility=cfg.mobilities[0],
                             advection_order=cfg.advection_order)
    ch1 = CahnHilliardParams(mobility=cfg.mobilities[1],
                             advection_order=cfg.advection_order)
    fluid = None if solid is None else jnp.logical_not(solid)
    walls = wallspec.walls if wallspec is not None else (False,) * 3

    def _force(f, fields, phi, psi):
        if cfg.force_method == "phi_gradmu":
            from ludwig_tpu.ops.force import phi_grad_mu_force
            mu_phi, mu_psi = cfg.fe.mu(fields)
            force = phi_grad_mu_force((phi, psi), (mu_phi, mu_psi),
                                      walls=walls,
                                      solid=solid).astype(f.dtype)
            # the ternary gradmu force needs the global momentum
            # correction: subtract the net force per site (ref:
            # ludwig.c:723-727, hydro.c hydro_correct_momentum)
            if type(cfg.fe).__name__ == "TernaryFE":
                rv = 1.0 / float(np.prod(force.shape[1:]))
                fnet = -jnp.sum(force, axis=(1, 2, 3)) * rv
                force = force + fnet[:, None, None, None]
            return force, None
        if wallspec is not None:
            from ludwig_tpu.ops.walls import stress_divergence_force_walls
            force, fwall = stress_divergence_force_walls(
                cfg.fe.stress(fields), wallspec)
            return force.astype(f.dtype), fwall
        return stress_divergence_force(
            cfg.fe.stress(fields)).astype(f.dtype), None

    @partial(jax.jit, donate_argnums=0)
    def step(state, t=0):
        f, phi, psi, u = state[0], state[1], state[2], state[3]
        fields = two_fields(phi, psi, cfg.gradient, solid_ops=solid_ops)
        mu_phi, mu_psi = cfg.fe.mu(fields)

        if cfg.hydrodynamics:
            force, fwall = _force(f, fields, phi, psi)
            phi = cahn_hilliard_update(phi, mu_phi, u, ch0, solid=solid,
                                       wallspec=wallspec)
            psi = cahn_hilliard_update(psi, mu_psi, u, ch1, solid=solid,
                                       wallspec=wallspec)
            f_post, rho, u_new = collide(f, params, force=force,
                                         fluid_mask=fluid)
            if wallspec is not None:
                from ludwig_tpu.ops.stream import stream
                from ludwig_tpu.ops.walls import wall_bounce_back
                gwall = state[4]
                f = stream(f_post, model)
                f, _, gw = wall_bounce_back(f, f_post, model, wallspec,
                                            rho0=cfg.lb.rho0)
                gwall = gwall + gw
                if fwall is not None:
                    gwall = gwall + fwall
                return (f, phi, psi, u_new, gwall), rho
            f = stream_bounce_back(f_post, model, solid=solid,
                                   rho0=cfg.lb.rho0)
        else:
            phi = cahn_hilliard_update(phi, mu_phi, None, ch0, solid=solid,
                                       wallspec=wallspec)
            psi = cahn_hilliard_update(psi, mu_psi, None, ch1, solid=solid,
                                       wallspec=wallspec)
            rho = jnp.ones_like(phi)
            u_new = u
            if wallspec is not None:
                return (f, phi, psi, u_new, state[4]), rho

        return (f, phi, psi, u_new), rho

    return step


def make_two_field_nstep(cfg: TwoFieldConfig, solid=None):
    step = make_two_field_step(cfg, solid)

    @partial(jax.jit, static_argnums=1, donate_argnums=0)
    def nstep(state, n, t0=0):
        def body(s, t):
            s, _ = step(s, t)
            return s, ()
        state, _ = jax.lax.scan(body, state, t0 + jnp.arange(n))
        return state

    return nstep


def initial_two_field(cfg: TwoFieldConfig, phi0: np.ndarray,
                      psi0: np.ndarray):
    f = initial_rest(cfg.lb)
    phi = jnp.asarray(phi0, cfg.lb.jdtype)
    psi = jnp.asarray(psi0, cfg.lb.jdtype)
    u = jnp.zeros((3,) + tuple(cfg.lb.size), cfg.lb.jdtype)
    return (f, phi, psi, u)
