"""Liquid crystal (Q-tensor) with resolved colloids.

TPU-native equivalent of the reference's LC+colloid coupling
(ref: src/ludwig.c ncolloid > 0 branch: colloids_update ->
anchoring gradients with the colloid map (gradient_3d_7pt_solid.c /
gradient_s7_anchoring.c) -> pth_force_colloid (map-aware stress
divergence + particle reaction force, src/phi_force_colloid.c) ->
beris_edw_update with fix_swd velocity and no-normal-flux advection
(src/blue_phase_beris_edwards.c:257-285) -> collide (fluid) -> BBL ->
propagation.  Surface free-energy statistics follow
src/fe_lc_stats.c fe_lc_colloid / blue_phase_fs).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ludwig_tpu.binary_colloid import colloid_fe_force
from ludwig_tpu.colloids import (position_update, ColloidParams, _min_image, bbl_step,
                                 build_map, refresh_inside, remove_replace,
                                 site_coords)
from ludwig_tpu.dynamics.beris_edwards import (BerisEdwardsParams,
                                               beris_edwards_update)
from ludwig_tpu.lc import LCConfig
from ludwig_tpu.ops.collide import collide
from ludwig_tpu.ops.force import stress_divergence_force_map
from ludwig_tpu.ops.lc_anchor import MAP_COLLOID, anchoring_gradient
from ludwig_tpu.ops.stencil import roll3
from ludwig_tpu.ops.stream import stream


def lc_colloid_fields(q5, anchoring, pid, inside, R,
                      walls=(False, False, False)):
    """Anchoring-aware gradients with the colloid status map (+ halo
    plane walls)."""
    status = inside.astype(jnp.int32) * MAP_COLLOID
    grad, delsq = anchoring_gradient(q5, anchoring, status, pid=pid, R=R,
                                     walls=walls)
    return {"q": q5, "grad_q": grad, "delsq_q": delsq}


def q_replace_newly_fluid(q5, inside_old, inside_new, model):
    """Set Q at sites that have just become fluid to the wv-weighted
    average over neighbours that were fluid before the position update
    (ref: build.c build_replace_order_parameter, FD branch)."""
    newly = jnp.logical_and(inside_old, jnp.logical_not(inside_new))
    was_fluid = jnp.logical_not(inside_old).astype(q5.dtype)
    num = jnp.zeros_like(q5)
    den = jnp.zeros_like(q5[0])
    for p in range(1, model.nvel):
        sh = tuple(-int(v) for v in model.cv[p])   # value at i + c_p
        wf = roll3(was_fluid, sh)
        qn = jnp.stack([roll3(q5[n], sh) for n in range(q5.shape[0])])
        w = float(model.wv[p])
        num = num + w * wf[None] * qn
        den = den + w * wf
    repl = num / jnp.where(den > 0.0, den, 1.0)[None]
    use = jnp.logical_and(newly, den > 0.0)
    return jnp.where(use[None], repl, q5)


def lc_colloid_surface_fe(fe, anchoring, q5, pid, inside, R, size):
    """(f_s, area): anchoring surface free energy and discrete area
    over fluid sites with a +-1 colloid neighbour, the true outward
    normal taken from the colloid centre (ref: fe_lc_stats.c
    fe_lc_colloid, colloids.c colloids_q_boundary_normal)."""
    from ludwig_tpu.fe.blue_phase import q5_to_q33
    fluid = jnp.logical_not(inside)
    qs = q5_to_q33(q5)
    coords = site_coords(size, q5.dtype)
    L = jnp.asarray(np.array(size, np.float64), q5.dtype)
    fs = jnp.zeros((), q5.dtype)
    area = jnp.zeros((), q5.dtype)
    for ax in range(3):
        for sgn in (+1, -1):
            sh = [0, 0, 0]
            sh[ax] = -sgn
            nb_in = roll3(inside, tuple(sh))        # colloid at i+sgn*e_ax
            pid_n = roll3(pid, tuple(sh))
            m = jnp.logical_and(fluid, nb_in)
            # true outward normal: from colloid centre to the fluid site
            Rn = jnp.moveaxis(R[jnp.clip(pid_n, 0, R.shape[0] - 1)],
                              -1, 0)                # (3, X, Y, Z)
            d = _min_image(coords - Rn, L[:, None, None, None])
            rd = jnp.sqrt(d[0] ** 2 + d[1] ** 2 + d[2] ** 2)
            dn = d / jnp.where(rd > 0.0, rd, 1.0)[None]
            fes = fe.surface_fs(qs, dn, anchoring.coll,
                                anchoring.coll_w1, anchoring.coll_w2)
            md = m.astype(q5.dtype)
            fs = fs + jnp.sum(md * fes)
            area = area + jnp.sum(md)
    return fs, area


def make_lc_colloid_step(lcfg: LCConfig, params: ColloidParams,
                         rebuild_freq: int = 1, force_fn=None):
    """Jitted step for (f, R, V, W, dr, Rmap, Msw, q5, u, grad, delsq)."""
    cfg = lcfg.lb
    model = cfg.model
    cparams = cfg.collision_params()
    size = cfg.size
    be = BerisEdwardsParams(gamma=lcfg.gamma, xi=lcfg.fe.xi,
                            advection_order=lcfg.advection_order)
    grav = jnp.asarray(np.array(params.gravity, np.float64), cfg.jdtype)

    has_walls = lcfg.has_walls
    walls3 = lcfg.wallspec.walls if has_walls else (False,) * 3

    @partial(jax.jit, static_argnums=2, donate_argnums=0)
    def _step(state, t, rebuild):
        if has_walls:
            f, R, V, W, dr, Rmap, Msw, q5, u, _g, _d, gwall = state
        else:
            f, R, V, W, dr, Rmap, Msw, q5, u, _g, _d = state
            gwall = None
        L = jnp.asarray(np.array(size, np.float64), R.dtype)
        fxm = params.fixedr_mask(R.dtype)
        R = position_update(R, (dr if fxm is None else fxm * dr), size)
        if rebuild:
            pid_old, inside_old = build_map(Rmap, params, size)
            Rmap = R
            pid, inside = build_map(R, params, size)
            f, deltam, f0c, t0c = remove_replace(
                f, R, V, W, inside_old, pid_old, inside, pid, model,
                params, size, rho0=cfg.rho0)
            q5 = q_replace_newly_fluid(q5, inside_old, inside, model)
        else:
            pid, inside = build_map(Rmap, params, size)
            deltam = f0c = t0c = None
        fluid = jnp.logical_not(inside)

        # interior sites track the solid-body velocity (bbl pass0 /
        # beris_edw_fix_swd)
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
        f = refresh_inside(f, model, inside, ub, cfg.rho0)

        # anchoring gradients with the colloid map
        fields = lc_colloid_fields(q5, lcfg.anchoring, pid, inside, Rmap,
                                   walls=walls3)
        h = lcfg.fe.molecular_field(fields)
        if not lcfg.hydrodynamics:
            # relaxational dynamics only (ref: beris_edw_update with
            # hydro == NULL; no force, no collision, no BBL)
            q5 = beris_edwards_update(q5, h, None, be, fluid_mask=fluid)
            rho = jnp.sum(f, axis=0)
            out = (f, R, V, W, dr, Rmap, Msw, q5, u,
                   fields["grad_q"], fields["delsq_q"])
            if has_walls:
                out = out + (gwall,)
            return out, (rho, u)
        pth = lcfg.fe.stress(fields, h=h)
        sa = lcfg.fe.active_stress(fields)
        if sa is not None:
            pth = pth + sa

        force = stress_divergence_force_map(
            pth, fluid,
            wallspec=lcfg.wallspec if has_walls else None).astype(f.dtype)
        fe_part = colloid_fe_force(pth, pid, inside, model, params.n,
                                   walls=walls3)
        if has_walls:
            # the walls absorb what the stress injects into fluid and
            # particles (ref: pth_force_wall_kernel -> wall fnet)
            finj = jnp.stack([jnp.sum(jnp.where(fluid, force[a], 0.0))
                              for a in range(3)])
            gwall = gwall - (finj + jnp.sum(fe_part, axis=0))

        # fluid gravity compensation (ref: interaction.c
        # colloids_update_forces_fluid_gravity)
        if any(v != 0.0 for v in params.gravity):
            nfluid = jnp.sum(fluid.astype(f.dtype))
            fb = (-grav) * (1.0 / nfluid) * float(params.n)
            force = force + jnp.where(
                fluid[None], fb[:, None, None, None], 0.0).astype(f.dtype)

        # BE update with solid-body velocity inside particles
        # (beris_edw_fix_swd) and no flux through the solid surface
        u_fix = jnp.where(fluid[None], u, ub)
        q5 = beris_edwards_update(q5, h, u_fix, be, fluid_mask=fluid,
                                  solid=inside,
                                  wallspec=lcfg.wallspec if has_walls
                                  else None)

        f, rho, u_new = collide(f, cparams, force=force, fluid_mask=fluid)

        ext = jnp.tile(grav[None], (params.n, 1)) + fe_part
        if force_fn is not None:
            ext = ext + force_fn(R, V).astype(ext.dtype)
        Vold = V
        f, V, W, Msw, gwbb = bbl_step(f, Rmap, V, W, model, params, size,
                                      ext_force=ext, rho0=cfg.rho0,
                                      deltam=deltam, f0_corr=f0c,
                                      t0_corr=t0c, M=Msw,
                                      walls=walls3)
        if has_walls:
            gwall = gwall + gwbb
        dr = 0.5 * (Vold + V)

        if has_walls:
            # per-link wall account with the colloid map: covered wall
            # sites do not bounce (the halo's w rho0 streams in); their
            # anomaly rides in gwbb (ref: wall.c wall_bbl_kernel)
            from ludwig_tpu.ops.walls import wall_bounce_back
            f_post = f
            f = stream(f, model)
            f, _, gwb2 = wall_bounce_back(f, f_post, model,
                                          lcfg.wallspec, rho0=cfg.rho0,
                                          fluid=fluid)
            gwall = gwall + gwb2
        else:
            f = stream(f, model)
        out = (f, R, V, W, dr, Rmap, Msw, q5, u_new,
               fields["grad_q"], fields["delsq_q"])
        if has_walls:
            out = out + (gwall,)
        return out, (rho, u_new)

    def step(state, t=0, rebuild=None):
        return _step(state, t, int(t) % rebuild_freq == 0 if rebuild is None
                     else rebuild)

    return step


def initial_lc_colloid(lcfg: LCConfig, params: ColloidParams, q0_field,
                       R0, V0=None):
    cfg = lcfg.lb
    from ludwig_tpu.lb import initial_rest
    nc = params.n
    jd = cfg.jdtype
    f = initial_rest(cfg)
    R = jnp.asarray(np.array(R0), jd)
    V = (jnp.asarray(np.array(V0), jd) if V0 is not None
         else jnp.zeros((nc, 3), jd))
    mm = (np.array(params.m, np.float64) if params.m
          else np.tile([1.0, 0.0, 0.0], (nc, 1)))
    q5 = jnp.asarray(q0_field, jd)
    pid, inside = build_map(R, params, cfg.size)
    walls3 = lcfg.wallspec.walls if lcfg.has_walls else (False,) * 3
    fields = lc_colloid_fields(q5, lcfg.anchoring, pid, inside, R,
                               walls=walls3)
    out = (f, R, V, jnp.zeros((nc, 3), jd), jnp.zeros((nc, 3), jd),
           jnp.array(R), jnp.asarray(mm, jd), q5,
           jnp.zeros((3,) + tuple(cfg.size), jd),
           fields["grad_q"], fields["delsq_q"])
    if lcfg.has_walls:
        out = out + (jnp.zeros((3,), jd),)
    return out
