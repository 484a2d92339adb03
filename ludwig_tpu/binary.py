"""Binary-fluid simulation: symmetric free energy + Cahn-Hilliard + LB.

TPU-native equivalent of the reference's binary-fluid wiring (ref:
src/ludwig.c:551-860 time step: gradients -> force -> order-parameter
dynamics -> collide -> stream).  State is a pytree (f, phi, u); the whole
step jits into one XLA program.

The velocity used by the CH advection is the force-shifted velocity from
the previous collision, exactly as the reference stores hydro->u during
collide and uses it in the following step's advection.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ludwig_tpu.fe.symmetric import SymmetricFE
from ludwig_tpu.dynamics.cahn_hilliard import (CahnHilliardParams,
                                               cahn_hilliard_update)
from ludwig_tpu.ops.advect import (advective_fluxes, flux_divergence,
                                   _up)
from ludwig_tpu.lb import LBConfig, initial_rest
from ludwig_tpu.ops.collide import collide
from ludwig_tpu.ops.force import stress_divergence_force
from ludwig_tpu.ops.stencil import gradient_ops
from ludwig_tpu.ops.stream import stream, stream_bounce_back


@dataclasses.dataclass(frozen=True)
class BinaryConfig:
    """Static configuration for a symmetric binary-fluid run."""

    lb: LBConfig
    fe: object                # SymmetricFE or BrazovskiiFE (fed/mu/stress)
    mobility: float = 1.0
    advection_order: int = 1
    gradient: str = "3d_7pt_fluid"
    hydrodynamics: bool = True
    visc_model: object = None      # e.g. ViscArrhenius (eta(phi))
    wetting: Tuple[float, float] = (0.0, 0.0)   # (C, H) for solid stencils
    force_method: str = "stress_divergence"     # or "phi_gradmu"
    # external chemical potential gradient (ref: physics grad_mu key):
    # adds F = -phi grad_mu to the fluid and -M grad_mu to the CH flux
    gradmu_ex: Tuple[float, float, float] = (0.0, 0.0, 0.0)

    @property
    def fourth_order(self) -> bool:
        from ludwig_tpu.fe.brazovskii import BrazovskiiFE
        return isinstance(self.fe, BrazovskiiFE)


def fe_fields(phi, gradient: str, fourth_order: bool = False,
              solid_ops=None):
    """Order parameter + gradients dict shared by mu/stress/stats.

    fourth_order adds grad(del^2 phi) and del^4 phi (Brazovskii; the
    reference's ngrad = 4 path, ref: field_grad.h:24-34).  solid_ops
    overrides the stencils with wetting-aware variants
    (ops.stencil.solid_gradient_ops)."""
    # the symmetric/Brazovskii phi field is created WITH the LE object
    # (ludwig.c:1185,1268) -> LE-parameterised tomita delsq
    grad, delsq = solid_ops if solid_ops is not None \
        else gradient_ops(gradient, le_field=True)
    out = {"phi": phi, "grad_phi": grad(phi), "delsq_phi": delsq(phi)}
    if fourth_order:
        out["grad_delsq_phi"] = grad(out["delsq_phi"])
        out["delsq_delsq_phi"] = delsq(out["delsq_phi"])
    return out


def binary_solid_ops(cfg: BinaryConfig, solid=None, wallspec=None):
    """Wetting-aware (grad, delsq) stencil pair for a *_solid gradient
    selection, or None for fluid stencils (shared by the step and the
    statistics program)."""
    fluid = None if solid is None else jnp.logical_not(solid)
    if cfg.gradient == "3d_27pt_solid" and (solid is not None
                                            or wallspec is not None):
        from ludwig_tpu.ops.solid_stencil import solid27_scalar_ops
        return solid27_scalar_ops(
            cfg.lb.size, fluid=fluid,
            walls=wallspec.walls if wallspec is not None else (False,) * 3,
            rkappa=1.0 / cfg.fe.kappa, c=cfg.wetting[0], h=cfg.wetting[1])
    if solid is not None and cfg.gradient.endswith("_solid"):
        from ludwig_tpu.ops.stencil import solid_gradient_ops
        return solid_gradient_ops(solid, cfg.fe.kappa,
                                  cfg.wetting[0], cfg.wetting[1])
    return None


def make_binary_step(cfg: BinaryConfig, solid=None, wallspec=None):
    """Jitted step: (f, phi, u[, gwall]) -> state, rho.

    Order per reference time step (ludwig.c:551-860):
      1. gradients of phi
      2. thermodynamic force (stress divergence)
      3. Cahn-Hilliard update of phi (advected by previous-step u)
      4. LB collide with the force; 5. stream + bounce-back.

    With wallspec (halo plane walls, ref: wall.c): all stored sites
    stay fluid, the stress-divergence force switches to one-sided wall
    fluxes, CH fluxes vanish at the walls, and streaming is followed by
    half-way bounce-back at the wall planes; the state gains a gwall
    momentum accumulator for the [walls] statistics row.
    """
    params = cfg.lb.collision_params()
    model = cfg.lb.model
    ch = CahnHilliardParams(mobility=cfg.mobility,
                            advection_order=cfg.advection_order)
    fluid = None if solid is None else jnp.logical_not(solid)
    wall_u = (cfg.lb.wall_u if any(v != 0.0 for v in cfg.lb.wall_u)
              else None)

    nz = cfg.lb.noise
    solid_ops = binary_solid_ops(cfg, solid=solid, wallspec=wallspec)

    # Reference-exact noise: the reference keeps TWO independent
    # per-site KISS generators - noise_phi for the CH flux noise
    # (extended by a 1-halo ring for mid-point fluxes) and noise_rho
    # for the LB fluctuations - both seeded with the DEFAULT master
    # seed (noise_init(obj, 0), ref: ludwig.c:243,1215).  They ride at
    # the end of the state tuple: (..., nstate_phi?, nstate_rho?).
    kiss_phi = nz is not None and nz.kiss and nz.phi
    kiss_rho = nz is not None and nz.kiss and nz.rho
    has_kiss = kiss_phi or kiss_rho

    @partial(jax.jit, donate_argnums=0)
    def step(state, t=0):
        from ludwig_tpu.lb import _noise_terms
        from ludwig_tpu import noise as noise_mod
        f, phi, u = state[0], state[1], state[2]
        fields = fe_fields(phi, cfg.gradient, cfg.fourth_order,
                           solid_ops=solid_ops)
        mu = cfg.fe.mu(fields)

        nstate_rho = state[-1] if kiss_rho else None
        nstate_phi = state[-2 if kiss_rho else -1] if kiss_phi else None
        rflux = None
        if nz is not None and nz.phi:
            if kiss_phi:
                from ludwig_tpu import noise_kiss
                nstate_phi, r3 = noise_kiss.reap(nstate_phi, 3,
                                                 cfg.lb.jdtype)
                rflux = noise_mod.ch_flux_from_deviates(r3, nz.kt,
                                                        cfg.mobility)
            else:
                rflux = noise_mod.ch_random_flux(nz.seed, t, cfg.lb.size,
                                                 nz.kt, cfg.mobility,
                                                 dtype=cfg.lb.jdtype)

        def lb_noise(t):
            if not kiss_rho:
                return _noise_terms(cfg.lb, params, t) + (nstate_rho,)
            return _noise_terms(cfg.lb, params, t, nstate=nstate_rho)

        def pack(*core):
            out = core
            if kiss_phi:
                out = out + (nstate_phi,)
            if kiss_rho:
                out = out + (nstate_rho,)
            return out

        if cfg.hydrodynamics:
            if wallspec is not None:
                from ludwig_tpu.ops.walls import (
                    no_flux_at_walls, stress_divergence_force_walls,
                    wall_bounce_back)
                from ludwig_tpu.stats import momentum_total
                gwall = state[3]
                force, fwall = stress_divergence_force_walls(
                    cfg.fe.stress(fields), wallspec)
                force = force.astype(f.dtype)
                phi = cahn_hilliard_update(phi, mu, u, ch,
                                           random_flux=rflux,
                                           wallspec=wallspec)
                shat, ghat, nstate_rho = lb_noise(t)
                eta_loc = (cfg.visc_model.eta(phi)
                           if cfg.visc_model is not None else None)
                f_post, rho, u_new = collide(f, params, force=force,
                                             shat=shat, ghat=ghat,
                                             eta_local=eta_loc)
                f = stream(f_post, model)
                f, _, gw = wall_bounce_back(f, f_post, model, wallspec,
                                            rho0=cfg.lb.rho0)
                gwall = gwall + gw + fwall
                return pack(f, phi, u_new, gwall), rho
            if cfg.force_method == "phi_gradmu":
                from ludwig_tpu.ops.force import phi_grad_mu_force
                force = phi_grad_mu_force((phi,), (mu,), solid=solid)
            else:
                force = stress_divergence_force(cfg.fe.stress(fields))
            if any(g != 0.0 for g in cfg.gradmu_ex):
                # F = -phi grad_mu (ref: phi_grad_mu_external_kernel)
                gm = jnp.asarray(np.array(cfg.gradmu_ex, np.float64),
                                 phi.dtype)
                force = force - phi[None] * gm[:, None, None, None]
            force = force.astype(f.dtype)
            phi = cahn_hilliard_update(phi, mu, u, ch, solid=solid,
                                       random_flux=rflux,
                                       noise_stencil=rflux is not None,
                                       gradmu_ex=cfg.gradmu_ex)
            shat, ghat, nstate_rho = lb_noise(t)
            eta_loc = (cfg.visc_model.eta(phi)
                       if cfg.visc_model is not None else None)
            f, rho, u_new = collide(f, params, force=force,
                                    fluid_mask=fluid, shat=shat, ghat=ghat,
                                    eta_local=eta_loc)
            f = stream_bounce_back(f, model, solid=solid, wall_u=wall_u,
                                   rho0=cfg.lb.rho0)
        else:
            phi = cahn_hilliard_update(phi, mu, None, ch, solid=solid,
                                       random_flux=rflux,
                                       noise_stencil=rflux is not None)
            rho = jnp.ones_like(phi)
            u_new = jnp.zeros_like(u)

        return pack(f, phi, u_new), rho

    return step


def open_x_ext(phi, wallspec, phib, nh=2):
    """Extended phi with the reference's open-x halo semantics.

    The serial host halo swap is ALWAYS periodic - halo_swap.c:475
    tests mpicartsz == 1, not the periodicity flags - so every halo
    (including the wall directions) first receives the periodic wrap.
    The phi BCs then overwrite the x halos: the inflow (low-x) region
    uniformly phib incl. transverse halos (ref:
    phi_bc_inflow_fixed.c:108-120), the outflow (high-x) region copies
    the last domain plane (ref: phi_bc_outflow_free.c:110-121)."""
    pad = [(nh, nh), (0, 0), (0, 0)]
    for ax in (1, 2):
        if wallspec is not None and wallspec.walls[ax]:
            pad[ax] = (1, 1)
    p = jnp.pad(phi, pad, mode="wrap")
    p = p.at[:nh].set(phib)
    p = p.at[-nh:].set(p[-nh - 1])
    return p


def open_x_scalar_ops(cfg: BinaryConfig, wallspec, phib):
    """(grad, delsq) stencils honoring the open-x / wall halo values
    (interior sites only; used by the statistics fed integral)."""
    g_op, d_op = gradient_ops(cfg.gradient, le_field=True)
    ty = 1 if (wallspec is not None and wallspec.walls[1]) else 0
    tz = 1 if (wallspec is not None and wallspec.walls[2]) else 0

    def _slice(x):
        sl = (slice(2, -2), slice(ty, -ty or None), slice(tz, -tz or None))
        return x[(Ellipsis,) + sl]

    def grad(phi):
        return _slice(g_op(open_x_ext(phi, wallspec, phib)))

    def delsq(phi):
        return _slice(d_op(open_x_ext(phi, wallspec, phib)))

    return grad, delsq


def make_binary_open_step(cfg: BinaryConfig, wallspec, obc, phib: float):
    """Binary fluid with an open (inflow/outflow) x boundary and halo
    plane walls in the transverse directions (ref: serial-open-phi:
    lb_bc_inflow/outflow_rhou + phi_bc_inflow_fixed/outflow_free).

    State (f, phi, u, gwall) -> state', rho.  Per step: BC-aware phi
    gradients / mu / stress on an extended-x array, stress-divergence
    force (one-sided at walls, halo-stress faces at the open ends), CH
    update with open-x face fluxes (halo u = 0), collide, stream, wall
    bounce-back, then the rhou open BC on the distributions."""
    from ludwig_tpu.ops.open_bc import apply_open_bc
    from ludwig_tpu.ops.walls import no_flux_at_walls, wall_bounce_back
    from ludwig_tpu.stats import momentum_total

    params = cfg.lb.collision_params()
    model = cfg.lb.model
    m = cfg.mobility
    g_op, d_op = gradient_ops(cfg.gradient, le_field=True)
    ty = 1 if wallspec.walls[1] else 0
    tz = 1 if wallspec.walls[2] else 0

    def tsl(x):
        # drop transverse halos, keep ONE x halo plane each side
        return x[(Ellipsis, slice(1, -1), slice(ty, -ty or None),
                  slice(tz, -tz or None))]

    @partial(jax.jit, donate_argnums=0)
    def step(state, t=0):
        f, phi, u, gwall = state

        pext = open_x_ext(phi, wallspec, phib)
        fields1 = {"phi": tsl(pext), "grad_phi": tsl(g_op(pext)),
                   "delsq_phi": tsl(d_op(pext))}
        mu1 = cfg.fe.mu(fields1)          # (X+2, Y, Z) incl. x halos
        pth1 = cfg.fe.stress(fields1)     # (3, 3, X+2, Y, Z)

        # force = -div(pth): halo faces in x, one-sided at wall planes
        shape = phi.shape
        comps = []
        fwall = []
        for a in range(3):
            pax = pth1[a, 0]
            face_e = 0.5 * (pax[1:-1] + pax[2:])      # east faces
            face_w0 = 0.5 * (pax[0] + pax[1])         # west face, site 0
            acc = face_e - jnp.concatenate(
                [face_w0[None], face_e[:-1]], axis=0)
            fw = [0.0, 0.0, 0.0]
            for ax in (1, 2):
                pax = pth1[a, ax][1:-1]
                up = jnp.roll(pax, -1, axis=ax)
                face = 0.5 * (pax + up)
                if wallspec.walls[ax]:
                    hi = [slice(None)] * 3
                    hi[ax] = shape[ax] - 1
                    lo = [slice(None)] * 3
                    lo[ax] = 0
                    face = face.at[tuple(hi)].set(pax[tuple(hi)])
                    d = face - jnp.roll(face, 1, axis=ax)
                    d = d.at[tuple(lo)].set(face[tuple(lo)]
                                            - pax[tuple(lo)])
                    # wall momentum: the wall takes the NEGATIVE of the
                    # fluid's net wall-face force (ref:
                    # pth_force_wall_kernel accumulates the surface
                    # divergence terms and adds -sum to wall->fnet)
                    fw[ax] = (jnp.sum(pax[tuple(hi)])
                              - jnp.sum(pax[tuple(lo)]))
                else:
                    d = face - jnp.roll(face, 1, axis=ax)
                acc = acc + d
            comps.append(-acc)
            fwall.append(sum(fw[ax] for ax in (1, 2)))
        force = jnp.stack(comps).astype(f.dtype)
        fwall = jnp.stack([jnp.asarray(v, f.dtype) for v in fwall])

        # Cahn-Hilliard with open-x faces (halo u = 0)
        mu = mu1[1:-1]
        fluxes = advective_fluxes(u, phi, cfg.advection_order)
        fluxes = [fluxes[ax] - m * (_up(mu, ax) - mu) for ax in range(3)]
        # phi_cahn_hilliard calls hydro_u_halo FIRST (ref:
        # phi_cahn_hilliard.c:225), and the serial halo swap is always
        # periodic (halo_swap.c:846 tests mpicartsz==1) - so it
        # overwrites the lb_bc u halos set at ludwig.c:599 with the
        # periodic wrap: u(0)=u(N), u(N+1)=u(1).  Both end faces thus
        # share u_face = 0.5*(u(1)+u(N)); only the upwind phi differs
        # (phib at the west face, the copied edge plane at the east).
        uf = 0.5 * (u[0, 0] + u[0, -1])
        fluxes[0] = fluxes[0].at[-1].set(
            uf * phi[-1] - m * (mu1[-1] - mu[-1]))
        fw0 = (uf * jnp.where(uf > 0.0, jnp.full_like(phi[0], phib),
                              phi[0]) - m * (mu[0] - mu1[0]))
        fluxes = no_flux_at_walls(fluxes, wallspec)
        div = flux_divergence(fluxes)
        div = div.at[0].add(fluxes[0][-1] - fw0)
        phi = phi - div

        f_post, rho, u_new = collide(f, params, force=force)
        f_new = stream(f_post, model)
        g_pre = momentum_total(f_new, model)
        f_new, _, _ = wall_bounce_back(f_new, f_post, model, wallspec,
                                       rho0=cfg.lb.rho0)
        gwall = gwall + (g_pre - momentum_total(f_new, model)) + fwall
        # the impose uses the collision-time hydro (rho = pre-collide
        # sum, u incl. the half-force correction), not bare post-collide
        # moments (ref: lb_collide stores hydro rho/u; impose reads them)
        f_new = apply_open_bc(f_new, f_post, model, obc, axis=0,
                              edge_hydro=(rho[0], u_new[:, -1]))
        return (f_new, phi, u_new, gwall), rho

    return step


def make_binary_nstep(cfg: BinaryConfig, solid=None):
    step = make_binary_step(cfg, solid)

    @partial(jax.jit, static_argnums=1, donate_argnums=0)
    def nstep(state, n, t0=0):
        def body(s, t):
            s, _rho = step(s, t)
            return s, ()
        state, _ = jax.lax.scan(body, state, t0 + jnp.arange(n))
        return state

    return nstep


def initial_binary(cfg: BinaryConfig, phi0: np.ndarray):
    """(f at rest, phi0, u=0[, nstate_phi][, nstate_rho]) state pytree.

    The KISS noise states ride at the end when fluctuations are on,
    both default-seeded like the reference's two noise objects
    (noise_init(obj, 0); ref: ludwig.c:243,1215)."""
    f = initial_rest(cfg.lb)
    phi = jnp.asarray(phi0, cfg.lb.jdtype)
    u = jnp.zeros((3,) + tuple(cfg.lb.size), cfg.lb.jdtype)
    state = (f, phi, u)
    nz = cfg.lb.noise
    if nz is not None and nz.kiss:
        from ludwig_tpu.noise_kiss import kiss_init
        if nz.phi:
            state = state + (kiss_init(0, cfg.lb.size, extended=True),)
        if nz.rho:
            state = state + (kiss_init(0, cfg.lb.size),)
    return state


def spinodal_phi(size, amplitude=0.05, mean=0.0, seed=13):
    """Random initial phi for spinodal decomposition
    (ref: phi_init_spinodal, field_phi_init.c)."""
    rng = np.random.default_rng(seed)
    return mean + amplitude * (rng.random(size) - 0.5) * 2.0
