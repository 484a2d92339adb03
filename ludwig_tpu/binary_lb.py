"""Binary fluid via two LB distributions (symmetric_lb).

TPU-native equivalent of the reference's 2-distribution binary path
(ref: src/collision.c: lb_collision_mrt2_site :714-1015, rtau2 =
2/(1 + 2M) :1973; Swift et al. equilibrium stress for f, order
parameter carried by the second distribution g):

  f: MRT collision with the symmetric-FE stress in the equilibrium
     second moment (the 'relaxation' force-coupling method)
  g: phi = sum g, jphi = sum c g; relax jphi toward phi u at rtau2;
     reproject with sphi = phi u u + mu I; phi rides the rest
     distribution (g_p = w_p (3 jphi.c + 4.5 sphi:Q) + phi delta_p0)
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ludwig_tpu.binary import fe_fields
from ludwig_tpu.fe.symmetric import SymmetricFE
from ludwig_tpu.lattice import CS2, LatticeModel
from ludwig_tpu.lb import LBConfig, initial_rest
from ludwig_tpu.ops.collide import collide, unrolled_matvec
from ludwig_tpu.ops.stream import stream


@dataclasses.dataclass(frozen=True)
class BinaryLBConfig:
    lb: LBConfig
    fe: SymmetricFE
    mobility: float = 0.15
    gradient: str = "3d_7pt_fluid"

    @property
    def rtau2(self) -> float:
        return 2.0 / (1.0 + 2.0 * self.mobility)


def g_moments(g: jnp.ndarray, model: LatticeModel):
    """(phi, jphi) from the order-parameter distribution."""
    gl = [g[p] for p in range(model.nvel)]
    phi = sum(gl)
    jphi = unrolled_matvec(model.cv.T.astype(np.float64), gl)
    return phi, jphi


def g_collide(g: jnp.ndarray, phi, u, mu, cfg: BinaryLBConfig):
    """Order-parameter distribution collision (ref: collision.c:955-1015)."""
    model = cfg.lb.model
    rtau2 = cfg.rtau2
    _, jphi = g_moments(g, model)
    jphi = [jphi[a] - rtau2 * (jphi[a] - phi * u[a]) for a in range(3)]
    # sphi = phi u u + mu I
    rows = []
    for p in range(model.nvel):
        c = model.cv[p]
        w = float(model.wv[p])
        jdotc = sum(float(c[a]) * jphi[a] for a in range(3) if c[a])
        sdotq = 0.0
        for a in range(3):
            for b in range(3):
                q = float(c[a] * c[b]) - (CS2 if a == b else 0.0)
                if q == 0.0:
                    continue
                sphi_ab = phi * u[a] * u[b] + (mu if a == b else 0.0)
                sdotq = sdotq + sphi_ab * q
        gp = w * (3.0 * jdotc + 4.5 * sdotq)
        if p == 0:
            gp = gp + phi
        rows.append(gp)
    return jnp.stack(rows)


def make_binary_lb_step(cfg: BinaryLBConfig, wallspec=None, le=None):
    """Jitted step for (f, g): full symmetric_lb update.

    With fluctuations on, the f-collision takes the same stress/ghost
    noise as the single-fluid MRT (ref: lb_collision_mrt2_site noise
    branch); the KISS state rides after u.  With halo plane walls
    (wallspec) both distributions get half-way bounce-back (ref: wall.c
    wall_bbl_kernel ndist > 1 branch) and the state carries the
    accumulated wall momentum.  With Lees-Edwards planes (`le`) the
    gradients use the LE-aware stencil and BOTH distributions are
    reprojected/displaced at the planes after collision (ref:
    model_le.c le_reproject n-loop over ndist); the state then carries
    (grad, delsq) at the tail for the statistics convention.
    """
    params = dataclasses.replace(cfg.lb).collision_params()
    model = cfg.lb.model
    nz = cfg.lb.noise
    kiss_rho = nz is not None and nz.kiss and nz.rho
    has_walls = wallspec is not None and wallspec.any
    solid_ops = None
    if has_walls and cfg.gradient.endswith("_solid"):
        from ludwig_tpu.ops.solid_stencil import solid27_scalar_ops
        solid_ops = solid27_scalar_ops(
            cfg.lb.size, fluid=None, walls=wallspec.walls,
            rkappa=1.0 / cfg.fe.kappa, c=0.0, h=0.0)

    @partial(jax.jit, donate_argnums=0)
    def step(state, t=0):
        from ludwig_tpu.lb import _noise_terms
        if le is not None:
            state = state[:-2]
        f, g = state[0], state[1]
        gwall = state[3] if has_walls else None
        phi, _ = g_moments(g, model)
        if le is not None:
            from ludwig_tpu.ops.le_ref import le_gradient
            grad_le, delsq_le = le_gradient(phi, le, t, cfg.gradient)
            fields = {"phi": phi, "grad_phi": grad_le,
                      "delsq_phi": delsq_le}
        else:
            fields = fe_fields(phi, cfg.gradient, solid_ops=solid_ops)
        mu = cfg.fe.mu(fields)
        sth = cfg.fe.stress(fields)

        if kiss_rho:
            shat, ghat, nstate = _noise_terms(cfg.lb, params, t,
                                              nstate=state[-1])
        else:
            shat, ghat = _noise_terms(cfg.lb, params, t)

        # f-collision with the thermodynamic stress in the equilibrium
        # (the FE_FORCE_METHOD_RELAXATION path)
        f, rho, u = collide(f, params, seq_extra=sth,
                            shat=shat, ghat=ghat)
        g = g_collide(g, phi, u, mu, cfg)

        if le is not None:
            from ludwig_tpu.ops.lees_edwards import apply_lb_le
            f = apply_lb_le(f, model, le, t)
            g = apply_lb_le(g, model, le, t)

        if has_walls:
            from ludwig_tpu.ops.walls import wall_bounce_back
            from ludwig_tpu.stats import momentum_total
            f_post, g_post = f, g
            f = stream(f, model)
            g = stream(g, model)
            g_pre = momentum_total(f, model)
            f, g, _ = wall_bounce_back(f, f_post, model, wallspec,
                                       rho0=cfg.lb.rho0,
                                       g_post=g_post, g_new=g)
            gwall = gwall + (g_pre - momentum_total(f, model))
        else:
            f = stream(f, model)
            g = stream(g, model)
        out = (f, g, u)
        if has_walls:
            out = out + (gwall,)
        if kiss_rho:
            out = out + (nstate,)
        if le is not None:
            out = out + (grad_le, delsq_le)
        return out, (rho, phi)

    return step


def make_binary_lb_nstep(cfg: BinaryLBConfig):
    step = make_binary_lb_step(cfg)

    @partial(jax.jit, static_argnums=1, donate_argnums=0)
    def nstep(state, n, t0=0):
        def body(s, t):
            s, _ = step(s, t)
            return s, ()
        state, _ = jax.lax.scan(body, state, t0 + jnp.arange(n))
        return state

    return nstep


def initial_binary_lb(cfg: BinaryLBConfig, phi0: np.ndarray):
    """(f at rest, g carrying phi in the rest distribution, u = 0
    [, noise state])."""
    f = initial_rest(cfg.lb)
    model = cfg.lb.model
    phi = jnp.asarray(phi0, cfg.lb.jdtype)
    rows = [phi if p == 0 else jnp.zeros_like(phi)
            for p in range(model.nvel)]
    u = jnp.zeros((3,) + tuple(cfg.lb.size), cfg.lb.jdtype)
    state = (f, jnp.stack(rows), u)
    nz = cfg.lb.noise
    if nz is not None and nz.kiss and nz.rho:
        from ludwig_tpu.noise_kiss import kiss_init
        state = state + (kiss_init(0, cfg.lb.size),)
    return state


def make_binary_lb_colloid_step(cfg: BinaryLBConfig, params,
                                rebuild_freq: int = 1, force_fn=None,
                                phi_ref: float = 0.0,
                                wetting=(0.0, 0.0), wallspec=None):
    """Full-LB binary fluid with resolved colloids.

    State: (f, R, V, W, dr, Rmap, Msw, g, u, dphi) with dphi the
    per-particle order-parameter deficit (ref: colloid state deltaphi).

    Per reference step (ref: ludwig.c:543-560 colloid update then
    phi_lb_to_field; the force/order-parameter-dynamics section is
    skipped for ndist == 2, ludwig.c:680-684 - the free-energy coupling
    is entirely inside the mrt2 collision): position update -> rebuild
    (remove/replace f with momentum corrections and g with deltaphi
    bookkeeping, ref: build.c:796-832, :1022-1160) -> interior f
    refresh (bbl pass0) -> solid-aware phi gradients -> f collision
    with the thermodynamic stress in the equilibrium + g collision
    (fluid sites only) -> BBL for f (implicit velocity solve) and for g
    with the deficit spread (ref: bbl.c:683-691) -> propagation."""
    from ludwig_tpu.colloids import bbl_step, position_update, refresh_inside, \
        remove_replace
    from ludwig_tpu.colloids_fast import (bbl_step_fast, build_map_fast,
                                          g_bbl_fast,
                                          g_remove_replace_fast,
                                          remove_replace_fast,
                                          solid_body_u)
    from ludwig_tpu.ops.solid_stencil import solid27_scalar_ops
    from ludwig_tpu.ops.stream import stream

    lb = cfg.lb
    model = lb.model
    cparams = lb.collision_params()
    size = lb.size
    grav = jnp.asarray(np.array(params.gravity, np.float64), lb.jdtype)
    has_walls = wallspec is not None and wallspec.any
    walls = wallspec.walls if has_walls else (False,) * 3

    @partial(jax.jit, static_argnums=2, donate_argnums=0)
    def _step(state, t, rebuild):
        if has_walls:
            f, R, V, W, dr, Rmap, Msw, g, u, dphi, _sg, _sd, gwall = state
        else:
            f, R, V, W, dr, Rmap, Msw, g, u, dphi, _sg, _sd = state
            gwall = None
        L = jnp.asarray(np.array(size, np.float64), R.dtype)
        fxm = params.fixedr_mask(R.dtype)
        R = position_update(R, (dr if fxm is None else fxm * dr), size)
        if rebuild:
            pid_old, inside_old = build_map_fast(Rmap, params, size)
            Rmap = R
            pid, inside = build_map_fast(R, params, size)
            if has_walls:
                f, deltam, f0c, t0c = remove_replace(
                    f, R, V, W, inside_old, pid_old, inside, pid, model,
                    params, size, rho0=lb.rho0, walls=walls)
            else:
                f, deltam, f0c, t0c = remove_replace_fast(
                    f, R, V, W, inside_old, pid_old, inside, pid, model,
                    params, size, rho0=lb.rho0)
            g, dd = g_remove_replace_fast(
                g, inside_old, inside, pid_old, pid, model, params.n,
                phi0=phi_ref, walls=walls)
            dphi = dphi + dd
        else:
            pid, inside = build_map_fast(Rmap, params, size)
            deltam = f0c = t0c = None
        fluid = jnp.logical_not(inside)

        # interior sites track the solid-body velocity (bbl pass0)
        ub = solid_body_u(R, V, W, pid, inside, size, f.dtype)
        f = refresh_inside(f, model, inside, ub, lb.rho0)

        # phi from the g distribution; solid-aware gradients with
        # (uniform) colloid wetting
        phi, _ = g_moments(g, model)
        grad, delsq = solid27_scalar_ops(
            size, fluid=fluid, rkappa=1.0 / cfg.fe.kappa,
            c=wetting[0], h=wetting[1], walls=walls)
        fields = {"phi": phi, "grad_phi": grad(phi),
                  "delsq_phi": delsq(phi)}
        sg, sd = fields["grad_phi"], fields["delsq_phi"]
        mu = cfg.fe.mu(fields)
        sth = cfg.fe.stress(fields)

        force = None
        if any(v != 0.0 for v in params.gravity):
            # fluid gravity compensation (ref: interaction.c
            # colloids_update_forces_fluid_gravity)
            nfluid = jnp.sum(fluid.astype(f.dtype))
            fb = (-grav) * (1.0 / nfluid) * float(params.n)
            force = jnp.where(fluid[None], fb[:, None, None, None],
                              0.0).astype(f.dtype)

        f, rho, u_new = collide(f, cparams, seq_extra=sth, force=force,
                                fluid_mask=fluid)
        g = jnp.where(fluid[None], g_collide(g, phi, u_new, mu, cfg), g)

        ext = jnp.tile(grav[None], (params.n, 1))
        if force_fn is not None:
            ext = ext + force_fn(R, V).astype(ext.dtype)
        Vold = V
        if has_walls:
            f, V, W, Msw, gwbb = bbl_step(
                f, Rmap, V, W, model, params, size, ext_force=ext,
                rho0=lb.rho0, deltam=deltam, f0_corr=f0c, t0_corr=t0c,
                M=Msw, walls=walls)
            gwall = gwall + gwbb
        else:
            f, V, W, Msw, _ = bbl_step_fast(
                f, Rmap, V, W, model, params, size, ext_force=ext,
                rho0=lb.rho0, deltam=deltam,
                f0_corr=f0c, t0_corr=t0c, M=Msw)
        # g bounce-back with the post-collision phi and the NEW
        # velocities (ref: bbl.c pass2, lb_0th_moment at site i)
        phi_post, _ = g_moments(g, model)
        g, dphi = g_bbl_fast(g, phi_post, Rmap, V, W, model, params,
                             size, dphi, walls=walls)
        dr = 0.5 * (Vold + V)

        if has_walls:
            from ludwig_tpu.ops.walls import wall_bounce_back
            f_post, g_post = f, g
            f = stream(f, model)
            g = stream(g, model)
            f, g, gwb = wall_bounce_back(f, f_post, model, wallspec,
                                         rho0=lb.rho0, g_post=g_post,
                                         g_new=g, fluid=fluid)
            gwall = gwall + gwb
            return (f, R, V, W, dr, Rmap, Msw, g, u_new, dphi,
                    sg, sd, gwall), (rho, u_new)
        f = stream(f, model)
        g = stream(g, model)
        return (f, R, V, W, dr, Rmap, Msw, g, u_new, dphi,
                sg, sd), (rho, u_new)

    def step(state, t=0, rebuild=None):
        return _step(state, t, int(t) % rebuild_freq == 0 if rebuild is None
                     else rebuild)

    return step


def initial_binary_lb_colloid(cfg: BinaryLBConfig, params, phi0, R0,
                              V0=None, W0=None, dr0=None):
    lb = cfg.lb
    nc = params.n
    jd = lb.jdtype
    f = initial_rest(lb)
    model = lb.model
    phi = jnp.asarray(phi0, jd)
    g = jnp.stack([phi if p == 0 else jnp.zeros_like(phi)
                   for p in range(model.nvel)])
    R = jnp.asarray(np.array(R0), jd)
    V = (jnp.asarray(np.array(V0), jd) if V0 is not None
         else jnp.zeros((nc, 3), jd))
    W = (jnp.asarray(np.array(W0), jd) if W0 is not None
         else jnp.zeros((nc, 3), jd))
    dr = (jnp.asarray(np.array(dr0), jd) if dr0 is not None
          else jnp.zeros((nc, 3), jd))
    mm = (np.array(params.m, np.float64) if params.m
          else np.tile([1.0, 0.0, 0.0], (nc, 1)))
    return (f, R, V, W, dr,
            jnp.array(R), jnp.asarray(mm, jd), g,
            jnp.zeros((3,) + tuple(lb.size), jd),
            jnp.zeros((nc,), jd),
            jnp.zeros((3,) + tuple(lb.size), jd),
            jnp.zeros(tuple(lb.size), jd))
