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


def two_fields(phi, psi, gradient: str):
    grad, delsq = gradient_ops(gradient)
    return {"phi": phi, "psi": psi,
            "grad_phi": grad(phi), "grad_psi": grad(psi),
            "delsq_phi": delsq(phi), "delsq_psi": delsq(psi)}


def make_two_field_step(cfg: TwoFieldConfig, solid=None):
    """Jitted step: (f, phi, psi, u) -> ((f, phi, psi, u), rho)."""
    params = cfg.lb.collision_params()
    model = cfg.lb.model
    ch0 = CahnHilliardParams(mobility=cfg.mobilities[0],
                             advection_order=cfg.advection_order)
    ch1 = CahnHilliardParams(mobility=cfg.mobilities[1],
                             advection_order=cfg.advection_order)
    fluid = None if solid is None else jnp.logical_not(solid)

    @partial(jax.jit, donate_argnums=0)
    def step(state, t=0):
        f, phi, psi, u = state
        fields = two_fields(phi, psi, cfg.gradient)
        mu_phi, mu_psi = cfg.fe.mu(fields)

        if cfg.hydrodynamics:
            force = stress_divergence_force(
                cfg.fe.stress(fields)).astype(f.dtype)
            phi = cahn_hilliard_update(phi, mu_phi, u, ch0, solid=solid)
            psi = cahn_hilliard_update(psi, mu_psi, u, ch1, solid=solid)
            f, rho, u_new = collide(f, params, force=force,
                                    fluid_mask=fluid)
            f = stream_bounce_back(f, model, solid=solid, rho0=cfg.lb.rho0)
        else:
            phi = cahn_hilliard_update(phi, mu_phi, None, ch0, solid=solid)
            psi = cahn_hilliard_update(psi, mu_psi, None, ch1, solid=solid)
            rho = jnp.ones_like(phi)
            u_new = u

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
