"""Single-fluid lattice Boltzmann driver: state, step, initialisation.

TPU-native equivalent of the reference lb_data / time-step wiring for the
plain-fluid path (ref: src/model.c, src/ludwig.c:530-970).  The state is
one distribution array f (nvel, NX, NY, NZ) plus derived hydro fields; a
step is collide -> stream(+bounce-back), jitted as one XLA program.  No
double buffer is needed: XLA manages the dataflow, and with donated
arguments the update is in-place in HBM.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ludwig_tpu.lattice import LatticeModel, lb_model
from ludwig_tpu.ops.collide import (CollisionParams, RelaxationScheme,
                                    collide, equilibrium)
from ludwig_tpu.ops.stream import stream_bounce_back, wall_solid_mask


@dataclasses.dataclass(frozen=True)
class LBConfig:
    """Static configuration for a plain-fluid run (hashable, jit-static)."""

    size: Tuple[int, int, int]
    nvel: int = 19
    eta_shear: float = 1.0 / 6.0
    eta_bulk: Optional[float] = None
    rho0: float = 1.0
    scheme: RelaxationScheme = RelaxationScheme.M10
    ghost_modes_on: bool = True
    force_global: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    walls: Tuple[bool, bool, bool] = (False, False, False)
    wall_u: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    dtype: str = "float32"
    noise: Optional[object] = None   # NoiseConfig (isothermal fluctuations)

    @property
    def model(self) -> LatticeModel:
        return lb_model(self.nvel)

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    def collision_params(self) -> CollisionParams:
        eta_b = self.eta_bulk if self.eta_bulk is not None else self.eta_shear
        return CollisionParams(
            model=self.model, eta_shear=self.eta_shear, eta_bulk=eta_b,
            rho0=self.rho0, scheme=self.scheme,
            ghost_modes_on=self.ghost_modes_on,
            force_global=self.force_global)


def initial_rest(cfg: LBConfig) -> jnp.ndarray:
    """Fluid uniformly at rest: f = wv * rho0 (ref: model.c lb_init_rest_f)."""
    model = cfg.model
    f = np.asarray(model.wv, np.float64)[:, None, None, None] * cfg.rho0
    return jnp.asarray(np.broadcast_to(f, (model.nvel,) + tuple(cfg.size)),
                       cfg.jdtype)


def initial_from_hydro(cfg: LBConfig, rho, u) -> jnp.ndarray:
    """Equilibrium distributions from prescribed (rho, u) fields."""
    return equilibrium(cfg.model, jnp.asarray(rho, cfg.jdtype),
                       jnp.asarray(u, cfg.jdtype)).astype(cfg.jdtype)


def solid_mask(cfg: LBConfig, porous: Optional[np.ndarray] = None):
    """Combined solid mask from plane walls and an optional porous map."""
    if not any(cfg.walls) and porous is None:
        return None
    m = wall_solid_mask(cfg.size, cfg.walls)
    if porous is not None:
        m = np.logical_or(m, porous)
    return jnp.asarray(m)


def _noise_terms(cfg: LBConfig, params, t, nstate=None, fluid=None):
    """(shat, ghat[, nstate']) fluctuation terms for timestep t.

    With nstate (a per-site KISS state array, interior-shaped), draws
    the reference-exact stream and returns the advanced state as a
    third element; callers not carrying a state keep the stateless
    2-tuple form.  fluid: bool mask - the reference reaps only at
    MAP_FLUID sites ('mask ... to maintain results in regression
    tests', ref: collision.c noise branch), so the state at solid
    sites must NOT advance and their deviates are zero."""
    from ludwig_tpu import noise as noise_mod
    nz = cfg.noise
    if nz is None or not nz.rho:
        return (None, None) if nstate is None else (None, None, nstate)
    ve = noise_mod.var_eta(1.0 / params.rtau_shear, nz.kt)
    vb = noise_mod.var_bulk(1.0 / params.rtau_bulk, nz.kt)
    if nstate is not None:
        from ludwig_tpu import noise_kiss

        def reap(st, n):
            st2, r = noise_kiss.reap(st, n, cfg.jdtype)
            if fluid is not None:
                st2 = jnp.where(fluid[None], st2, st)
                r = jnp.where(fluid[None], r, 0.0)
            return st2, r

        nstate, r6 = reap(nstate, 6)
        shat = noise_mod.stress_from_deviates(r6, ve, vb, cfg.model.ndim)
        ghat = None
        if cfg.ghost_modes_on:
            vg = noise_mod.var_ghost(cfg.model, params.rtau_ghost, nz.kt)
            nstate, rg = reap(nstate, cfg.model.nvel - cfg.model.nhydro)
            ghat = noise_mod.ghost_from_deviates(rg, cfg.model, vg)
        return shat, ghat, nstate
    shat = noise_mod.fluctuating_stress(nz.seed, t, cfg.size, ve, vb,
                                        ndim=cfg.model.ndim,
                                        dtype=cfg.jdtype)
    ghat = None
    if cfg.ghost_modes_on:
        vg = noise_mod.var_ghost(cfg.model, params.rtau_ghost, nz.kt)
        ghat = noise_mod.ghost_noise(nz.seed + 7919, t, cfg.size,
                                     cfg.model, vg, dtype=cfg.jdtype)
    return shat, ghat


def make_step(cfg: LBConfig, solid=None,
              force_field=None, le=None, open_bc=None):
    """Build the jitted single-fluid step: (f, t) -> (f', rho, u).

    The returned function donates f, so the update happens in place in
    device memory (matching the reference's two-buffer swap at zero cost).
    t is the timestep counter, consumed by the fluctuation RNG and the
    Lees-Edwards displacement.  le is a LeesEdwardsConfig or None
    (order per ref ludwig.c: collide -> LE -> propagation).
    """
    params = cfg.collision_params()
    model = cfg.model
    fluid = None if solid is None else jnp.logical_not(solid)
    wall_u = cfg.wall_u if any(v != 0.0 for v in cfg.wall_u) else None
    kiss_rho = (cfg.noise is not None and cfg.noise.kiss
                and cfg.noise.rho)

    @partial(jax.jit, donate_argnums=0)
    def step(state, t=0, force=force_field):
        if kiss_rho:
            # reference-exact per-site KISS stream: state = (f, nstate)
            f = state[0]
            shat, ghat, nstate = _noise_terms(cfg, params, t,
                                              nstate=state[1],
                                              fluid=fluid)
        else:
            f = state
            shat, ghat = _noise_terms(cfg, params, t)
        f_post, rho, u = collide(f, params, force=force, fluid_mask=fluid,
                                 shat=shat, ghat=ghat)
        if le is not None:
            from ludwig_tpu.ops.lees_edwards import apply_lb_le
            f_post = apply_lb_le(f_post, model, le, t)
        f_new = stream_bounce_back(f_post, model, solid=solid,
                                   wall_u=wall_u, rho0=cfg.rho0)
        if open_bc is not None:
            from ludwig_tpu.ops.open_bc import apply_open_bc_x
            f_new = apply_open_bc_x(f_new, f_post, model, open_bc)
        if kiss_rho:
            return (f_new, nstate), rho, u
        return f_new, rho, u

    return step


def make_wall_step(cfg: LBConfig, wallspec, force_field=None,
                   open_bc=None, open_axis=0):
    """Single-fluid step with halo plane walls (ref: wall.c wall_bbl):
    ((f, gwall), t) -> ((f', gwall'), rho, u).  gwall accumulates the
    bounce-back momentum transfer for the [walls] statistics row."""
    from ludwig_tpu.ops.stream import stream
    from ludwig_tpu.ops.walls import (wall_bounce_back,
                                      wall_bounce_back_slip)
    from ludwig_tpu.stats import momentum_total
    params = cfg.collision_params()
    model = cfg.model

    kiss_rho = (cfg.noise is not None and cfg.noise.kiss
                and cfg.noise.rho)

    @partial(jax.jit, donate_argnums=0)
    def step(state, t=0, force=force_field):
        f, gwall = state[0], state[1]
        if kiss_rho:
            shat, ghat, nstate = _noise_terms(cfg, params, t,
                                              nstate=state[-1])
        else:
            shat, ghat = _noise_terms(cfg, params, t)
        f_post, rho, u = collide(f, params, force=force,
                                 shat=shat, ghat=ghat)
        f_new = stream(f_post, model)
        g_pre = momentum_total(f_new, model)
        if wallspec.slip_active:
            f_new = wall_bounce_back_slip(f_new, f_post, model, wallspec,
                                          rho0=cfg.rho0)
        else:
            f_new, _, _ = wall_bounce_back(f_new, f_post, model, wallspec,
                                           rho0=cfg.rho0)
        gwall = gwall + (g_pre - momentum_total(f_new, model))
        if open_bc is not None:
            # the impose uses THIS step's collide hydro: the update at
            # the top of the reference loop is overwritten by a second
            # update after collision (ref: ludwig.c:599 vs :824)
            from ludwig_tpu.ops.open_bc import apply_open_bc
            f_new = apply_open_bc(f_new, f_post, model, open_bc,
                                  axis=open_axis)
        out = (f_new, gwall)
        if kiss_rho:
            out = out + (nstate,)
        return out, rho, u

    return step


def make_nstep(cfg: LBConfig, solid=None, force_field=None, le=None,
               open_bc=None):
    """n fused steps via lax.scan inside one jit (for benchmarking: no
    host round-trip per step)."""
    params = cfg.collision_params()
    model = cfg.model
    fluid = None if solid is None else jnp.logical_not(solid)
    wall_u = cfg.wall_u if any(v != 0.0 for v in cfg.wall_u) else None

    @partial(jax.jit, static_argnums=1, donate_argnums=0)
    def nstep(f, n, t0=0):
        def body(f, t):
            shat, ghat = _noise_terms(cfg, params, t)
            f_post, _, _ = collide(f, params, force=force_field,
                                   fluid_mask=fluid, shat=shat, ghat=ghat)
            if le is not None:
                from ludwig_tpu.ops.lees_edwards import apply_lb_le
                f_post = apply_lb_le(f_post, model, le, t)
            f_new = stream_bounce_back(f_post, model, solid=solid,
                                       wall_u=wall_u, rho0=cfg.rho0)
            if open_bc is not None:
                from ludwig_tpu.ops.open_bc import apply_open_bc_x
                f_new = apply_open_bc_x(f_new, f_post, model, open_bc)
            return f_new, ()
        f, _ = jax.lax.scan(body, f, t0 + jnp.arange(n))
        return f

    return nstep


def hydro_fields(f: jnp.ndarray, model: LatticeModel):
    """(rho, momentum-density g) straight from distributions."""
    from ludwig_tpu.ops.collide import unrolled_matvec
    fl = [f[p] for p in range(model.nvel)]
    rho = sum(fl)
    g = jnp.stack(unrolled_matvec(model.cv.T.astype(np.float64), fl))
    return rho, g
