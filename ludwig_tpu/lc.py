"""Liquid-crystal (Q-tensor) simulation: blue phase + Beris-Edwards + LB.

TPU-native equivalent of the reference's LC wiring (ref: src/ludwig.c
q-tensor branch: field_grad(q) -> redshift -> force via stress
divergence (+ active stress) -> beris_edwards -> collide -> stream).
This is the reference's headline benchmark configuration.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ludwig_tpu.dynamics.beris_edwards import (BerisEdwardsParams,
                                               beris_edwards_update)
from ludwig_tpu.fe.blue_phase import BluePhaseFE
from ludwig_tpu.lb import LBConfig, initial_rest
from ludwig_tpu.ops.collide import collide
from ludwig_tpu.ops.force import stress_divergence_force
from ludwig_tpu.ops.stencil import gradient_ops
from ludwig_tpu.ops.stream import stream_bounce_back


@dataclasses.dataclass(frozen=True)
class LCConfig:
    lb: LBConfig
    fe: BluePhaseFE
    gamma: float = 0.1            # rotational mobility (lc_Gamma)
    advection_order: int = 1
    gradient: str = "3d_7pt_fluid"
    hydrodynamics: bool = True


def lc_fields(q5, gradient: str):
    grad, delsq = gradient_ops(gradient)
    return {"q": q5, "grad_q": grad(q5), "delsq_q": delsq(q5)}


def make_lc_step(cfg: LCConfig, solid=None):
    """Jitted step: (f, q5, u) -> ((f, q5, u), rho)."""
    params = cfg.lb.collision_params()
    model = cfg.lb.model
    be = BerisEdwardsParams(gamma=cfg.gamma, xi=cfg.fe.xi,
                            advection_order=cfg.advection_order)
    fluid = None if solid is None else jnp.logical_not(solid)

    @partial(jax.jit, donate_argnums=0)
    def step(state, t=0):
        f, q5, u = state
        fields = lc_fields(q5, cfg.gradient)
        h = cfg.fe.molecular_field(fields)

        if cfg.hydrodynamics:
            pth = cfg.fe.stress(fields, h=h)
            sa = cfg.fe.active_stress(fields)
            if sa is not None:
                pth = pth + sa
            force = stress_divergence_force(pth).astype(f.dtype)
            q5 = beris_edwards_update(q5, h, u, be, fluid_mask=fluid)
            f, rho, u_new = collide(f, params, force=force,
                                    fluid_mask=fluid)
            f = stream_bounce_back(f, model, solid=solid,
                                   rho0=cfg.lb.rho0)
        else:
            q5 = beris_edwards_update(q5, h, None, be, fluid_mask=fluid)
            rho = jnp.ones_like(q5[0])
            u_new = u

        return (f, q5, u_new), rho

    return step


def make_lc_nstep(cfg: LCConfig, solid=None):
    step = make_lc_step(cfg, solid)

    @partial(jax.jit, static_argnums=1, donate_argnums=0)
    def nstep(state, n, t0=0):
        def body(s, t):
            s, _rho = step(s, t)
            return s, ()
        state, _ = jax.lax.scan(body, state, t0 + jnp.arange(n))
        return state

    return nstep


def initial_lc(cfg: LCConfig, q0_field: np.ndarray):
    f = initial_rest(cfg.lb)
    q5 = jnp.asarray(q0_field, cfg.lb.jdtype)
    u = jnp.zeros((3,) + tuple(cfg.lb.size), cfg.lb.jdtype)
    return (f, q5, u)


def total_free_energy(cfg: LCConfig, q5) -> float:
    fields = lc_fields(q5, cfg.gradient)
    return float(jnp.sum(cfg.fe.fed(fields)))
