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


def make_binary_lb_step(cfg: BinaryLBConfig, wallspec=None):
    """Jitted step for (f, g): full symmetric_lb update.

    With fluctuations on, the f-collision takes the same stress/ghost
    noise as the single-fluid MRT (ref: lb_collision_mrt2_site noise
    branch); the KISS state rides as the last state element.  With halo
    plane walls (wallspec) both distributions get half-way bounce-back
    (ref: wall.c wall_bbl_kernel ndist > 1 branch) and the state
    carries the accumulated wall momentum.
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
        f, g = state[0], state[1]
        gwall = state[3] if has_walls else None
        phi, _ = g_moments(g, model)
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
