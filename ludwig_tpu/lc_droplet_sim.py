"""LC-droplet simulation: coupled (phi, Q) + LB.

TPU-native equivalent of the reference LC-droplet wiring (ref:
src/ludwig.c:693-742: body force + momentum correction, then stress
divergence of the qh stress; phi via Cahn-Hilliard, Q via
Beris-Edwards, both with the coupled free energy).  This is the
"LC droplet (phi + Q)" benchmark configuration.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ludwig_tpu.dynamics.beris_edwards import (BerisEdwardsParams,
                                               beris_edwards_update)
from ludwig_tpu.dynamics.cahn_hilliard import (CahnHilliardParams,
                                               cahn_hilliard_update)
from ludwig_tpu.fe.lc_droplet import LCDropletFE
from ludwig_tpu.lb import LBConfig, initial_rest
from ludwig_tpu.ops.collide import collide
from ludwig_tpu.ops.force import stress_divergence_force
from ludwig_tpu.ops.stencil import dab_7pt, gradient_ops
from ludwig_tpu.ops.stream import stream_bounce_back


@dataclasses.dataclass(frozen=True)
class LCDropletConfig:
    lb: LBConfig
    fe: LCDropletFE
    mobility: float = 0.05        # phi mobility
    gamma: float = 0.5            # Q rotational mobility (lc_Gamma)
    advection_order: int = 1
    gradient: str = "3d_7pt_fluid"
    force_method: str = "stress_divergence"


def droplet_fields(phi, q5, gradient: str):
    grad, delsq = gradient_ops(gradient)
    return {"phi": phi, "grad_phi": grad(phi), "delsq_phi": delsq(phi),
            "dab_phi": dab_7pt(phi),
            "q": q5, "grad_q": grad(q5), "delsq_q": delsq(q5)}


def make_droplet_step(cfg: LCDropletConfig, solid=None):
    params = cfg.lb.collision_params()
    model = cfg.lb.model
    ch = CahnHilliardParams(mobility=cfg.mobility,
                            advection_order=cfg.advection_order)
    be = BerisEdwardsParams(gamma=cfg.gamma, xi=cfg.fe.lc.xi,
                            advection_order=cfg.advection_order)
    fluid = None if solid is None else jnp.logical_not(solid)

    @partial(jax.jit, donate_argnums=0)
    def step(state, t=0):
        f, phi, q5, u = state
        fields = droplet_fields(phi, q5, cfg.gradient)
        mu = cfg.fe.mu(fields)
        h = cfg.fe.molecular_field(fields)

        # force: corrected body force + divergence of the qh stress.
        # With fe_force_method relaxation_antisymmetric only the
        # antisymmetric stress is divergence-forced; the symmetric part
        # relaxes inside the collision (ref: phi_force.c:101,
        # collision.c:413 use_stress_relaxation).
        force = cfg.fe.body_force(fields, mu, h)
        relax_anti = cfg.force_method == "relaxation_antisymmetric"
        if relax_anti:
            force = force + stress_divergence_force(
                cfg.fe.stress_anti(fields, h))
        else:
            force = force + stress_divergence_force(
                cfg.fe.stress_qh(fields, h))
        force = force.astype(f.dtype)

        phi = cahn_hilliard_update(phi, mu, u, ch, solid=solid)

        # The reference updates phi first; the Beris-Edwards molecular
        # field then sees gamma(phi_new) with the (stale) gradients of
        # the pre-update fields (ref: ludwig.c order phi_cahn_hilliard
        # -> beris_edw_update; field_grad recomputed only next step).
        fields_be = dict(fields)
        fields_be["phi"] = phi
        h_be = cfg.fe.molecular_field(fields_be)
        q5 = beris_edwards_update(q5, h_be, u, be, fluid_mask=fluid)

        seq_extra = None
        if relax_anti:
            # the collision evaluates the symmetric stress AFTER the
            # order-parameter updates: fresh phi/Q, stale gradients
            # (ref: collision.c:417 str_symm_v reads current fields;
            # field_grad only recomputed at the next loop top)
            fields_c = dict(fields)
            fields_c["phi"] = phi
            fields_c["q"] = q5
            seq_extra = cfg.fe.stress_symm(fields_c)
        f, rho, u_new = collide(f, params, force=force, fluid_mask=fluid,
                                seq_extra=seq_extra)
        f = stream_bounce_back(f, model, solid=solid, rho0=cfg.lb.rho0)
        return (f, phi, q5, u_new), rho

    return step


def make_droplet_nstep(cfg: LCDropletConfig, solid=None):
    step = make_droplet_step(cfg, solid)

    @partial(jax.jit, static_argnums=1, donate_argnums=0)
    def nstep(state, n, t0=0):
        def body(s, t):
            s, _ = step(s, t)
            return s, ()
        state, _ = jax.lax.scan(body, state, t0 + jnp.arange(n))
        return state

    return nstep


def initial_droplet(cfg: LCDropletConfig, phi0: np.ndarray,
                    q0: np.ndarray):
    f = initial_rest(cfg.lb)
    phi = jnp.asarray(phi0, cfg.lb.jdtype)
    q5 = jnp.asarray(q0, cfg.lb.jdtype)
    u = jnp.zeros((3,) + tuple(cfg.lb.size), cfg.lb.jdtype)
    return (f, phi, q5, u)
