"""Subgrid (unresolved) particles: Peskin delta-function coupling.

TPU-native equivalent of the reference subgrid module (ref:
src/subgrid.c:84 force spreading, :215 interpolation, d_peskin delta;
method of Nash et al.).  Particle forces are spread onto nearby fluid
nodes with the 4-point Peskin kernel; fluid velocity is interpolated
back with the same kernel, and particles advance with an added local
drag correction  (1/ah - 1/al)/(6 pi eta).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ludwig_tpu.colloids import site_coords, _min_image


def d_peskin(r):
    """4-point Peskin interpolation kernel (ref: subgrid.c:d_peskin)."""
    rmod = jnp.abs(r)
    inner = 0.125 * (3.0 - 2.0 * rmod
                     + jnp.sqrt(jnp.maximum(
                         1.0 + 4.0 * rmod - 4.0 * rmod * rmod, 0.0)))
    outer = 0.125 * (5.0 - 2.0 * rmod
                     - jnp.sqrt(jnp.maximum(
                         -7.0 + 12.0 * rmod - 4.0 * rmod * rmod, 0.0)))
    return jnp.where(rmod <= 1.0, inner,
                     jnp.where(rmod <= 2.0, outer, 0.0))


def _weights(R: jnp.ndarray, size, coords):
    """(N, X, Y, Z) Peskin weights around each particle."""
    L = jnp.asarray(np.array(size, np.float64), R.dtype)
    ws = []
    for n in range(R.shape[0]):
        d = _min_image(coords - R[n][:, None, None, None],
                       L[:, None, None, None])
        ws.append(d_peskin(d[0]) * d_peskin(d[1]) * d_peskin(d[2]))
    return jnp.stack(ws)


def spread_forces(F: jnp.ndarray, R: jnp.ndarray, size,
                  coords=None) -> jnp.ndarray:
    """Particle forces -> fluid force density (3, X, Y, Z)
    (ref: subgrid_force_from_particles)."""
    if coords is None:
        coords = site_coords(size, R.dtype)
    w = _weights(R, size, coords)         # (N, X, Y, Z)
    return jnp.einsum("na,nxyz->axyz", F, w)


def interpolate_velocity(u: jnp.ndarray, R: jnp.ndarray, size,
                         coords=None) -> jnp.ndarray:
    """Fluid velocity at particle positions (N, 3)
    (ref: subgrid_interpolation)."""
    if coords is None:
        coords = site_coords(size, u.dtype)
    w = _weights(R, size, coords)
    return jnp.einsum("nxyz,axyz->na", w, u)


def make_subgrid_step(cfg, params, al, force_fn=None):
    """Jitted step for unresolved (subgrid) particles.

    State: (f, R, V).  Per reference time step: deferred position move
    (colloids.c:1028, dr == v from the previous subgrid_update), spread
    particle forces onto the fluid (subgrid_force_from_particles,
    ludwig.c:2149), collide with that force (+ uniform gravity
    compensation), set v = u(R) + drag*F (subgrid.c subgrid_update),
    propagate.  No map / BBL - the fluid sees the particle only through
    the Peskin-spread force.
    """
    import dataclasses as _dc
    from functools import partial

    import jax

    from ludwig_tpu.ops.collide import collide
    from ludwig_tpu.ops.stream import stream

    model = cfg.model
    cparams = cfg.collision_params()
    size = cfg.size
    nsites = float(np.prod(size))
    grav = jnp.asarray(np.array(params.gravity, np.float64), cfg.jdtype)
    ah = np.array(params.ah if params.ah else params.a0, np.float64)
    al = np.array(al, np.float64)
    eta = cfg.eta_shear

    @partial(jax.jit, donate_argnums=0)
    def step(state, t=0):
        f, R, V = state[0], state[1], state[2]
        L = jnp.asarray(np.array(size, np.float64), R.dtype)
        R = jnp.mod(R + V, L)
        F = jnp.tile(grav[None], (params.n, 1))
        if force_fn is not None:
            F = F + force_fn(R, V).astype(F.dtype)
        coords = site_coords(size, f.dtype)
        force = spread_forces(F.astype(f.dtype), R.astype(f.dtype),
                              size, coords)
        if any(v != 0.0 for v in params.gravity):
            fb = (-grav) * (1.0 / nsites) * float(params.n)
            force = force + fb[:, None, None, None].astype(f.dtype)
        f, rho, u = collide(f, cparams, force=force)
        _, V = subgrid_update(R, F, u, size, ah, al, eta)
        f = stream(f, model)
        return (f, R, V), (rho, u)

    return step


def subgrid_update(R: jnp.ndarray, F: jnp.ndarray, u: jnp.ndarray, size,
                   ah, al, eta: float):
    """New positions: dr = u(R) + drag F  with the local drag correction
    zeta^-1 = (1/ah - 1/al) / (6 pi eta) (ref: subgrid.c:257)."""
    us = interpolate_velocity(u, R, size)
    ah = jnp.asarray(ah, R.dtype)
    al = jnp.asarray(al, R.dtype)
    drag = (1.0 / ah - 1.0 / al) / (6.0 * np.pi * eta)
    v = us + drag[:, None] * F
    L = jnp.asarray(np.array(size, np.float64), R.dtype)
    return jnp.mod(R + v, L), v
