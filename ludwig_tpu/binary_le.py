"""Sheared binary fluid: symmetric FE + Cahn-Hilliard under Lees-Edwards.

TPU-native equivalent of the reference's LE-aware order-parameter
machinery (ref: src/leesedwards.c buffer columns, src/advection.c LE
variants, src/phi_cahn_hilliard.c:618-860 phi_ch_le_fix_fluxes):
x-neighbour accesses that cross a sliding plane are sampled with the
time-dependent y displacement (ops.lees_edwards.le_xneighbor); since a
single face-flux array feeds the divergence on both sides, conservation
is automatic (the reference's explicit flux fix is re-establishing the
same single-valued flux across its buffer copies).

This is the "sheared binary fluid with Lees-Edwards" benchmark
configuration.  LE advection currently supports orders 1 and 2.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ludwig_tpu.binary import BinaryConfig, initial_binary
from ludwig_tpu.lb import LBConfig
from ludwig_tpu.ops.collide import collide
from ludwig_tpu.ops.force import stress_divergence_force
from ludwig_tpu.ops.lees_edwards import (LeesEdwardsConfig, apply_lb_le,
                                         le_xneighbor)
from ludwig_tpu.ops.stencil import roll3
from ludwig_tpu.ops.stream import stream


def _shift_y(x, s):
    return roll3(x, (0, s, 0), first_axis=x.ndim - 3)


def _shift_z(x, s):
    return roll3(x, (0, 0, s), first_axis=x.ndim - 3)


def le_fe_fields(phi, le: LeesEdwardsConfig, t):
    """phi gradients with LE-aware x neighbours."""
    xp = le_xneighbor(phi, le, t, +1)
    xm = le_xneighbor(phi, le, t, -1)
    gx = 0.5 * (xp - xm)
    gy = 0.5 * (_shift_y(phi, -1) - _shift_y(phi, 1))
    gz = 0.5 * (_shift_z(phi, -1) - _shift_z(phi, 1))
    delsq = (xp + xm + _shift_y(phi, 1) + _shift_y(phi, -1)
             + _shift_z(phi, 1) + _shift_z(phi, -1) - 6.0 * phi)
    return {"phi": phi, "grad_phi": jnp.stack([gx, gy, gz]),
            "delsq_phi": delsq}


def le_ch_update(phi, mu, u, le: LeesEdwardsConfig, t, mobility: float,
                 order: int = 1):
    """Cahn-Hilliard step with LE-aware x fluxes (orders 1-2)."""
    # x faces: between i and i+1, with the cross-plane neighbour sampled
    # in this block's frame
    ux_p = le_xneighbor(u[0], le, t, +1)
    phi_p = le_xneighbor(phi, le, t, +1)
    mu_p = le_xneighbor(mu, le, t, +1)
    uf = 0.5 * (u[0] + ux_p)
    if order == 1:
        fx = uf * jnp.where(uf > 0.0, phi, phi_p)
    else:
        fx = uf * 0.5 * (phi + phi_p)
    fx = fx - mobility * (mu_p - mu)

    fluxes_yz = []
    for ax, shift in ((1, _shift_y), (2, _shift_z)):
        uf = 0.5 * (u[ax] + shift(u[ax], -1))
        phi_n = shift(phi, -1)
        if order == 1:
            fl = uf * jnp.where(uf > 0.0, phi, phi_n)
        else:
            fl = uf * 0.5 * (phi + phi_n)
        fluxes_yz.append(fl - mobility * (shift(mu, -1) - mu))

    div = (fx - le_xneighbor(fx, le, t, -1)
           + fluxes_yz[0] - _shift_y(fluxes_yz[0], 1)
           + fluxes_yz[1] - _shift_z(fluxes_yz[1], 1))
    return phi - div


@dataclasses.dataclass(frozen=True)
class BinaryLEConfig:
    binary: BinaryConfig
    le: LeesEdwardsConfig


def make_binary_le_step(cfg: BinaryLEConfig):
    """Jitted sheared-binary step (periodic, planes interior)."""
    bcfg = cfg.binary
    params = bcfg.lb.collision_params()
    model = bcfg.lb.model
    le = cfg.le

    @partial(jax.jit, donate_argnums=0)
    def step(state, t=0):
        f, phi, u = state
        fields = le_fe_fields(phi, le, t)
        mu = bcfg.fe.mu(fields)
        force = stress_divergence_force(
            bcfg.fe.stress(fields)).astype(f.dtype)
        phi = le_ch_update(phi, mu, u, le, t, bcfg.mobility,
                           order=min(bcfg.advection_order, 2))
        f, rho, u_new = collide(f, params, force=force)
        f = apply_lb_le(f, model, le, t)
        f = stream(f, model)
        return (f, phi, u_new), rho

    return step


def make_binary_le_nstep(cfg: BinaryLEConfig):
    step = make_binary_le_step(cfg)

    @partial(jax.jit, static_argnums=1, donate_argnums=0)
    def nstep(state, n, t0=0):
        def body(s, t):
            s, _ = step(s, t)
            return s, ()
        state, _ = jax.lax.scan(body, state, t0 + jnp.arange(n))
        return state

    return nstep
