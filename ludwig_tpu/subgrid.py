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


RANLCG_A = 1389796
RANLCG_M = 2147483647


def _lcg_uniform(s):
    """One LCG draw (ref: util.c util_ranlcg_reap_uniform); s int64."""
    s = (RANLCG_A * s) % RANLCG_M
    return s, s.astype(jnp.float64) * (1.0 / RANLCG_M)


def _reap_gaussian(s):
    """Marsaglia polar pair with rejection (ref:
    util_ranlcg_reap_gaussian)."""
    import jax

    def cond(c):
        s, r0, r1, rsq = c
        return jnp.logical_or(rsq >= 1.0, rsq <= 0.0)

    def body(c):
        s = c[0]
        s, u0 = _lcg_uniform(s)
        s, u1 = _lcg_uniform(s)
        z0 = 2.0 * u0 - 1.0
        z1 = 2.0 * u1 - 1.0
        return (s, z0, z1, z0 * z0 + z1 * z1)

    s, z0, z1, rsq = jax.lax.while_loop(
        cond, body, (s, jnp.float64(0.0), jnp.float64(0.0),
                     jnp.float64(2.0)))
    f = jnp.sqrt(-2.0 * jnp.log(rsq) / rsq)
    return s, f * z0, f * z1


def _frand_component(s, amp):
    """One random-force component with the 3-sigma rejection
    (ref: subgrid.c:259-281)."""
    import jax

    def cond(c):
        s, val, done = c
        return jnp.logical_not(done)

    def body(c):
        s = c[0]
        s, g0, g1 = _reap_gaussian(s)
        take0 = jnp.abs(g0) < 3.0
        take1 = jnp.logical_and(jnp.logical_not(take0),
                                jnp.abs(g1) < 3.0)
        val = jnp.where(take0, amp * g0,
                        jnp.where(take1, amp * g1, 0.0))
        return (s, val, jnp.logical_or(take0, take1))

    s, val, _ = jax.lax.while_loop(
        cond, body, (s, jnp.float64(0.0), jnp.asarray(False)))
    return s, val


def make_subgrid_step(cfg, params, al, force_fn=None, rng0=None):
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
    kiss_rho = (cfg.noise is not None and cfg.noise.kiss
                and cfg.noise.rho)
    noise_on = (cfg.noise is not None and cfg.noise.rho
                and rng0 is not None)

    @partial(jax.jit, donate_argnums=0)
    def step(state, t=0, rebuild=None):
        # rebuild accepted for chain-call uniformity (subgrid particles
        # have no map/link rebuild); del: unused
        del rebuild
        from ludwig_tpu.lb import _noise_terms
        f, R, V = state[0], state[1], state[2]
        if kiss_rho:
            shat, ghat, nstate = _noise_terms(cfg, cparams, t,
                                              nstate=state[3])
        else:
            shat, ghat = _noise_terms(cfg, cparams, t)
            nstate = None
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
        f, rho, u = collide(f, cparams, force=force, shat=shat,
                            ghat=ghat)
        _, V = subgrid_update(R, F, u, size, ah, al, eta)
        if noise_on:
            # particle Langevin kick, per-particle serial LCG stream
            # (ref: subgrid.c:259-287)
            rngs = state[-1]
            kt = cfg.noise.kt
            drag = (1.0 / ah - 1.0 / al) / (6.0 * np.pi * eta)
            new_rngs = []
            kicks = []
            for n in range(params.n):
                sN = rngs[n]
                amp = jnp.sqrt(2.0 * kt * float(drag[n]))
                row = []
                for ia in range(3):
                    sN, v = _frand_component(sN, amp)
                    row.append(v)
                new_rngs.append(sN)
                kicks.append(jnp.stack(row))
            V = V + jnp.stack(kicks).astype(V.dtype)
            f = stream(f, model)
            out = (f, R, V)
            if kiss_rho:
                out = out + (nstate,)
            return out + (jnp.stack(new_rngs),), (rho, u)
        f = stream(f, model)
        out = (f, R, V) + ((nstate,) if kiss_rho else ())
        return out, (rho, u)

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
