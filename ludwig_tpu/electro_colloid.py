"""Electrokinetics with resolved colloids.

TPU-native equivalent of the reference's psi+colloid coupling
(ref: src/psi_colloid.c psi_colloid_rho_set / remove / replace /
zetapotential; src/build.c build_conservation_psi charge conservation
on shape change; src/psi_force.c psi_force_gradmu_e colloid/fluid force
split with momentum correction; src/ludwig.c psi branch of the loop).

Per step: colloid update (move + rebuild + charge remove/replace +
conservation put-back) -> colloid charge density set -> Poisson solve ->
grad-mu force (colloid reaction + corrected fluid force) -> Nernst-
Planck sub-cycles (fluid only) -> psi zero-mean -> collide -> BBL ->
propagation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ludwig_tpu.colloids import (position_update, ColloidParams, _min_image, bbl_step,
                                 build_map, refresh_inside, remove_replace,
                                 site_coords)
from ludwig_tpu.electro import rho_elec
from ludwig_tpu.electro_sim import (ElectroSimConfig, make_psi_neighbours,
                                    np_step, poisson_sor_ref)
from ludwig_tpu.ops.collide import collide
from ludwig_tpu.ops.stencil import roll3
from ludwig_tpu.ops.stream import stream


def colloid_charge_remove_replace(rho, inside_old, inside_new, pid_old,
                                  pid_new, deltaq, nk):
    """Charge bookkeeping over a change of discrete shape
    (ref: psi_colloid.c psi_colloid_remove_charge/_replace_charge).

    Newly-solid sites: their charge is accumulated onto the particle.
    Newly-fluid sites: charge is replaced by the 6-point average over
    neighbours that were fluid before the update, and the particle
    account debited.  Returns (rho, deltaq_increment)."""
    newly_solid = jnp.logical_and(jnp.logical_not(inside_old), inside_new)
    newly_fluid = jnp.logical_and(inside_old, jnp.logical_not(inside_new))
    was_fluid = jnp.logical_not(inside_old).astype(rho.dtype)

    n_part = deltaq.shape[0]
    dq = jnp.zeros_like(deltaq)

    # removal
    for n in range(n_part):
        m = jnp.logical_and(newly_solid, pid_new == n).astype(rho.dtype)
        for k in range(nk):
            dq = dq.at[n, k].add(jnp.sum(m * rho[k]))

    # replacement: 6-neighbour average over previously-fluid sites
    num = jnp.zeros_like(rho)
    den = jnp.zeros_like(rho[0])
    for ax in range(3):
        for sgn in (+1, -1):
            sh = [0, 0, 0]
            sh[ax] = -sgn
            wf = roll3(was_fluid, tuple(sh))
            den = den + wf
            for k in range(nk):
                num = num.at[k].add(wf * roll3(rho[k], tuple(sh)))
    avg = num / jnp.where(den > 0.0, den, 1.0)[None]
    for n in range(n_part):
        # the newly-fluid site belonged to the OLD map's owner
        m = jnp.logical_and(newly_fluid, pid_old == n)
        md = m.astype(rho.dtype)
        for k in range(nk):
            dq = dq.at[n, k].add(-jnp.sum(md * avg[k]))
    rho = jnp.where(newly_fluid[None], avg, rho)
    return rho, dq


def charge_conservation_putback(rho, fluid, inside, pid, dq, nk, nvel_faces=6):
    """Distribute accumulated particle charge back onto the boundary
    fluid sites (ref: build.c build_conservation_psi).  Each |c|=1 fluid
    link site receives dq/saf unless that would drive the density
    negative; any shortfall is carried forward in deltaq."""
    n_part = dq.shape[0]
    masks = []      # (n, 6) site masks: fluid site with colloid n at +-e
    for ax in range(3):
        for sgn in (+1, -1):
            sh = [0, 0, 0]
            sh[ax] = -sgn
            nb_in = roll3(inside, tuple(sh))
            pid_n = roll3(pid, tuple(sh))
            masks.append((jnp.logical_and(fluid, nb_in), pid_n))
    for n in range(n_part):
        mlist = [jnp.logical_and(m, p == n) for (m, p) in masks]
        saf = sum(jnp.sum(m.astype(rho.dtype)) for m in mlist)
        safe = jnp.where(saf > 0.0, saf, 1.0)
        for k in range(nk):
            share = jnp.where(saf > 0.0, dq[n, k] / safe, 0.0)
            nacc = jnp.zeros((), jnp.int32)
            rk = rho[k]
            for m in mlist:
                cand = rk + share
                accept = jnp.logical_and(m, cand >= 0.0)
                rk = jnp.where(accept, cand, rk)
                nacc = nacc + jnp.sum(accept.astype(jnp.int32))
            rho = rho.at[k].set(rk)
            # the reference decrements dq link by link; reproduce the
            # sequential rounding (ref: build.c:1563-1568)
            left = jax.lax.fori_loop(
                0, nacc, lambda i, s: s - share, dq[n, k])
            dq = dq.at[n, k].set(left)
    return rho, dq


def colloid_rho_set(rho, inside, pid, q_coll, deltaq, nk):
    """Distribute each particle's total charge over its current discrete
    volume (ref: psi_colloid.c psi_colloid_rho_set)."""
    n_part = deltaq.shape[0]
    for n in range(n_part):
        m = (pid == n) & inside
        vol = jnp.sum(m.astype(rho.dtype))
        volsafe = jnp.where(vol > 0.0, vol, 1.0)
        for k in range(nk):
            rk = jnp.maximum(0.0, q_coll[n, k] + deltaq[n, k]) / volsafe
            rho = rho.at[k].set(jnp.where(m, rk, rho[k]))
    return rho


def gradmu_force_colloid(psi, rho, cfg: ElectroSimConfig, psi_up, psi_dn,
                         fluid, inside, pid, n_part):
    """(fluid force field, per-particle force) for the grad-mu method
    with particles (ref: psi_force.c psi_force_gradmu_e): every site
    contributes rho_elec E; colloid-site contributions go to the owning
    particle; the mean over ALL sites (divided by the fluid count) is
    subtracted from fluid sites only."""
    ek = cfg.ek
    kt = 1.0 / ek.beta
    re = rho_elec(rho, ek)
    force = []
    for ax in range(3):
        e_ax = -0.5 * (psi_up(psi, ax) - psi_dn(psi, ax)) * (kt / ek.e)
        force.append(re * e_ax)
    force = jnp.stack(force)
    fsum = jnp.sum(force, axis=(1, 2, 3))
    nfluid = jnp.sum(fluid.astype(force.dtype))
    corr = fsum / nfluid
    fcoll = []
    for n in range(n_part):
        m = ((pid == n) & inside).astype(force.dtype)
        fcoll.append(jnp.stack([jnp.sum(m * force[a]) for a in range(3)]))
    ffluid = jnp.where(fluid[None], force - corr[:, None, None, None], 0.0)
    return ffluid, jnp.stack(fcoll)


def divstress_force_colloid(psi, rho, cfg: ElectroSimConfig, psi_up,
                            psi_dn, fluid, inside, pid, n_part):
    """(fluid force field, per-particle force) for the stress-divergence
    method (ref: psi_force.c psi_force_divstress): pure Maxwell stress
    S_ab = -eps (E_a E_b - d_ab E^2/2), no momentum correction;
    colloid-site forces accumulate on the owning particle.

    The v0.20 fe_electro_stress adds an ideal-gas d_ab kT sum_k rho_k
    term, but the v0.2.19-era behaviour that serial-elec-ep1 was logged
    with does NOT include it (verified against the committed log: with
    the term the electrophoretic velocity is off by 4.5e-5 relative,
    without it the case matches to print precision)."""
    ek = cfg.ek
    kt = 1.0 / ek.beta
    e = []
    for ax in range(3):
        e.append(-0.5 * (psi_up(psi, ax) - psi_dn(psi, ax)) * (kt / ek.e))
    e2 = e[0] * e[0] + e[1] * e[1] + e[2] * e[2]
    force = []
    for a in range(3):
        acc = 0.0
        for b in range(3):
            s_ab = -ek.epsilon * (e[a] * e[b] - (0.5 * e2 if a == b
                                                 else 0.0))
            acc = acc + 0.5 * (jnp.roll(s_ab, -1, axis=b)
                               - jnp.roll(s_ab, 1, axis=b))
        force.append(-acc)
    force = jnp.stack(force)
    fcoll = []
    for n in range(n_part):
        m = ((pid == n) & inside).astype(force.dtype)
        fcoll.append(jnp.stack([jnp.sum(m * force[a]) for a in range(3)]))
    ffluid = jnp.where(fluid[None], force, 0.0)
    return ffluid, jnp.stack(fcoll)


def zeta_potential(psi, fluid, inside):
    """Mean of the link-midpoint potential over the colloid surface
    (ref: psi_colloid.c psi_colloid_zetapotential; one colloid only)."""
    tot = jnp.zeros((), psi.dtype)
    cnt = jnp.zeros((), psi.dtype)
    for ax in range(3):
        for sgn in (+1, -1):
            sh = [0, 0, 0]
            sh[ax] = -sgn
            nb_in = roll3(inside, tuple(sh))
            psi1 = roll3(psi, tuple(sh))
            m = jnp.logical_and(fluid, nb_in).astype(psi.dtype)
            tot = tot + jnp.sum(m * 0.5 * (psi + psi1))
            cnt = cnt + jnp.sum(m)
    return jnp.where(cnt > 0.0, tot / jnp.where(cnt > 0.0, cnt, 1.0), 0.0)


def make_electro_colloid_step(cfg: ElectroSimConfig, params: ColloidParams,
                              q_coll, rebuild_freq: int = 1,
                              force_fn=None,
                              force_method="phi_gradmu_correction"):
    """Jitted step for (f, R, V, W, dr, Rmap, Msw, psi, rho, u, deltaq).

    q_coll: (N, 2) input charges (colloid_one_q0 / q1)."""
    lb = cfg.lb
    model = lb.model
    cparams = lb.collision_params()
    size = lb.size
    nk = cfg.ek.nk
    qc = jnp.asarray(np.array(q_coll, np.float64), lb.jdtype)
    psi_up, psi_dn = make_psi_neighbours(size, cfg.e0, lb.dtype)
    grav = jnp.asarray(np.array(params.gravity, np.float64), lb.jdtype)
    m_sub = cfg.ek.multisteps
    dt = 1.0 / m_sub

    @partial(jax.jit, static_argnums=2, donate_argnums=0)
    def _step(state, t, rebuild):
        f, R, V, W, dr, Rmap, Msw, psi, rho, u, deltaq = state
        L = jnp.asarray(np.array(size, np.float64), R.dtype)
        fxm = params.fixedr_mask(R.dtype)
        R = position_update(R, (dr if fxm is None else fxm * dr), size)
        if rebuild:
            pid_old, inside_old = build_map(Rmap, params, size)
            Rmap = R
            pid, inside = build_map(R, params, size)
            f, deltam, f0c, t0c = remove_replace(
                f, R, V, W, inside_old, pid_old, inside, pid, model,
                params, size, rho0=lb.rho0)
            rho, dq = colloid_charge_remove_replace(
                rho, inside_old, inside, pid_old, pid, deltaq, nk)
            fluid = jnp.logical_not(inside)
            rho, deltaq = charge_conservation_putback(
                rho, fluid, inside, pid, dq + deltaq, nk)
        else:
            pid, inside = build_map(Rmap, params, size)
            deltam = f0c = t0c = None
            fluid = jnp.logical_not(inside)

        # interior tracks solid-body velocity
        coords = site_coords(size, f.dtype)
        ub = jnp.zeros((3,) + size, f.dtype)
        for n in range(params.n):
            d = _min_image(coords - R[n][:, None, None, None],
                           L[:, None, None, None])
            # (v + w_b rb_c) - w_c rb_b per component - the
            # reference's association (ref: bbl.c pass0 ub[X])
            ubn = jnp.stack([
                (V[n][0] + W[n][1] * d[2]) - W[n][2] * d[1],
                (V[n][1] + W[n][2] * d[0]) - W[n][0] * d[2],
                (V[n][2] + W[n][0] * d[1]) - W[n][1] * d[0]])
            mask = (pid == n)[None]
            ub = jnp.where(mask, ubn, ub)
        f = refresh_inside(f, model, inside, ub, lb.rho0)

        rho = colloid_rho_set(rho, inside, pid, qc, deltaq, nk)

        psi, s_n, s_r, s_w = poisson_sor_ref(
            psi, rho_elec(rho, cfg.ek), cfg.ek, psi_up, psi_dn,
            return_iters=True)

        if force_method == "stress_divergence":
            force, fcoll = divstress_force_colloid(
                psi, rho, cfg, psi_up, psi_dn, fluid, inside, pid,
                params.n)
        else:
            force, fcoll = gradmu_force_colloid(psi, rho, cfg, psi_up,
                                                psi_dn, fluid, inside,
                                                pid, params.n)
        for _ in range(m_sub):
            rho = np_step(rho, psi, u if cfg.hydrodynamics else None,
                          fluid, cfg, psi_up, psi_dn, dt)
        # site-order scan in f64, tree sum in f32 production
        # (ref: psi.c psi_zero_mean)
        from ludwig_tpu.stats import site_sum
        psi = psi - site_sum(psi) / float(np.prod(size))

        fb_force = force.astype(f.dtype)
        if any(v != 0.0 for v in params.gravity):
            # fluid gravity compensation (ref: interaction.c)
            nfluid = jnp.sum(fluid.astype(f.dtype))
            fb = (-grav) * (1.0 / nfluid) * float(params.n)
            fb_force = fb_force + jnp.where(
                fluid[None], fb[:, None, None, None], 0.0).astype(f.dtype)
        f, rho_lb, u_new = collide(f, cparams, force=fb_force,
                                   fluid_mask=fluid)

        ext = jnp.tile(grav[None], (params.n, 1)) + fcoll
        if force_fn is not None:
            ext = ext + force_fn(R, V).astype(ext.dtype)
        Vold = V
        f, V, W, Msw, _ = bbl_step(f, Rmap, V, W, model, params, size,
                                   ext_force=ext, rho0=lb.rho0,
                                   deltam=deltam, f0_corr=f0c,
                                   t0_corr=t0c, M=Msw)
        dr = 0.5 * (Vold + V)

        f = stream(f, model)
        return (f, R, V, W, dr, Rmap, Msw, psi, rho, u_new,
                deltaq), (rho_lb, u_new, (s_n, s_r, s_w))

    def step(state, t=0, rebuild=None):
        return _step(state, t, int(t) % rebuild_freq == 0 if rebuild is None
                     else rebuild)

    return step


def initial_electro_colloid(cfg: ElectroSimConfig, params: ColloidParams,
                            psi0, rho0, R0, V0=None):
    lb = cfg.lb
    from ludwig_tpu.lb import initial_rest
    nc = params.n
    jd = lb.jdtype
    f = initial_rest(lb)
    R = jnp.asarray(np.array(R0), jd)
    V = (jnp.asarray(np.array(V0), jd) if V0 is not None
         else jnp.zeros((nc, 3), jd))
    mm = (np.array(params.m, np.float64) if params.m
          else np.tile([1.0, 0.0, 0.0], (nc, 1)))
    return (f, R, V, jnp.zeros((nc, 3), jd), jnp.zeros((nc, 3), jd),
            jnp.array(R), jnp.asarray(mm, jd),
            jnp.asarray(psi0, jd), jnp.asarray(rho0, jd),
            jnp.zeros((3,) + tuple(lb.size), jd),
            jnp.zeros((nc, cfg.ek.nk), jd))
