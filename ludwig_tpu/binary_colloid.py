"""Binary fluid (finite-difference Cahn-Hilliard) with resolved
colloids.

TPU-native equivalent of the reference's colloid+free-energy coupling
(ref: src/ludwig.c ncolloid > 0 branch of the force calculation;
src/phi_force_colloid.c pth_force_colloid - map-aware stress divergence
with one-sided fluxes at solid faces plus the particle reaction force;
src/advection_bcs.c no-flux at solid faces for the CH update;
src/gradient_3d_27pt_solid.c wetting gradients around particles).

Per reference time step: colloid update (move + rebuild) -> solid-aware
phi gradients -> pth stress -> map force on fluid + FE reaction force on
particles -> CH update (no flux into solid) -> collide (fluid only) ->
BBL (implicit velocity update, gravity + FE force as external force) ->
propagate.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ludwig_tpu.binary import BinaryConfig
from ludwig_tpu.colloids import (position_update, ColloidParams, ColloidState, _min_image,
                                 bbl_step, build_map, refresh_inside,
                                 remove_replace, site_coords)
from ludwig_tpu.dynamics.cahn_hilliard import (CahnHilliardParams,
                                               cahn_hilliard_update)
from ludwig_tpu.ops.collide import collide
from ludwig_tpu.ops.force import stress_divergence_force_map
from ludwig_tpu.ops.solid_stencil import solid27_scalar_ops
from ludwig_tpu.ops.stencil import roll3
from ludwig_tpu.ops.stream import stream


def colloid_fe_force(pth, pid, inside, model, n_part,
                     walls=(False, False, False)):
    """(N, 3) reaction force on each particle from the thermodynamic
    stress: for every FLUID link with |c| == 1, force += c_id *
    pth(i)[:, id] evaluated at the outside (fluid) site (ref:
    phi_force_colloid.c pth_force_driver 'COLLOID KERNEL').

    With plane walls, a link whose outside end wraps a walled axis has
    its outside site in the wall halo (MAP_BOUNDARY) - no such link
    exists in the reference's map, so it is excluded here."""
    fluid = jnp.logical_not(inside)
    shape = inside.shape
    out = []
    per_axis = []
    for q in range(1, model.nvel):
        c = model.cv[q]
        if int(np.sum(np.abs(c))) != 1:
            continue
        ax = int(np.argmax(np.abs(c)))
        sgn = float(c[ax])
        # link: outside site i with i + c inside particle n
        ins_n = roll3(inside, tuple(-int(v) for v in c))
        pid_n = roll3(pid, tuple(-int(v) for v in c))
        m = jnp.logical_and(fluid, ins_n)
        if walls[ax]:
            keep = np.ones(shape, bool)
            sel = [slice(None)] * 3
            sel[ax] = (shape[ax] - 1) if sgn > 0 else 0
            keep[tuple(sel)] = False
            m = jnp.logical_and(m, jnp.asarray(keep))
        per_axis.append((ax, sgn, m, pid_n))
    for n in range(n_part):
        fn = [0.0, 0.0, 0.0]
        for (ax, sgn, m, pid_n) in per_axis:
            msk = jnp.logical_and(m, pid_n == n).astype(pth.dtype)
            for ia in range(3):
                fn[ia] = fn[ia] + sgn * jnp.sum(msk * pth[ia, ax])
        out.append(jnp.stack(fn))
    return jnp.stack(out)


def phi_remove_replace_conserve(phi, inside_old, inside_new, pid_old,
                                pid_new, model, n_part, phi0=0.0,
                                conserve=True,
                                walls=(False, False, False)):
    """Order-parameter bookkeeping over a change of discrete shape
    (ref: build.c build_remove_order_parameter / _replace_order_parameter
    FD branch / build_conservation_phi).

    Newly-solid sites: deltaphi += (phi - phi0).  Newly-fluid sites:
    phi <- wv-weighted average over previously-fluid neighbours,
    deltaphi -= (phi_new - phi0).  The accumulated deltaphi is then put
    back in equal shares onto every |c|=1 fluid link site."""
    from ludwig_tpu.ops.stencil import roll3
    newly_solid = jnp.logical_and(jnp.logical_not(inside_old), inside_new)
    newly_fluid = jnp.logical_and(inside_old, jnp.logical_not(inside_new))
    was_fluid = jnp.logical_not(inside_old).astype(phi.dtype)

    dphi = [jnp.zeros((), phi.dtype) for _ in range(n_part)]
    for n in range(n_part):
        m = jnp.logical_and(newly_solid, pid_new == n).astype(phi.dtype)
        dphi[n] = dphi[n] + jnp.sum(m * (phi - phi0))

    # replacement average (wv-weighted over all neighbours fluid in the
    # old map; ref: build_replace_order_parameter)
    num = jnp.zeros_like(phi)
    den = jnp.zeros_like(phi)
    size = phi.shape
    for p in range(1, model.nvel):
        sh = tuple(-int(v) for v in model.cv[p])
        wf = roll3(was_fluid, sh)
        if any(walls):
            # wall-crossing neighbours are MAP_BOUNDARY: excluded
            # (ref: build_replace_order_parameter status check)
            keep = np.ones(size, bool)
            for ax in range(3):
                cax = int(model.cv[p][ax])
                if walls[ax] and cax != 0:
                    sel = [slice(None)] * 3
                    sel[ax] = size[ax] - 1 if cax > 0 else 0
                    keep[tuple(sel)] = False
            wf = wf * jnp.asarray(keep, phi.dtype)
        w = float(model.wv[p])
        num = num + w * wf * roll3(phi, sh)
        den = den + w * wf
    avg = num / jnp.where(den > 0.0, den, 1.0)
    use = jnp.logical_and(newly_fluid, den > 0.0)
    phi = jnp.where(use, avg, phi)
    for n in range(n_part):
        m = jnp.logical_and(newly_fluid, pid_old == n).astype(phi.dtype)
        dphi[n] = dphi[n] - jnp.sum(m * (phi - phi0))

    if not conserve:
        # pre-v0.12 reference: no build_conservation_phi - removed and
        # interpolated order parameter is NOT put back (serial-coll-rfd,
        # v0.8.14 log)
        return phi
    # conservation put-back on |c|=1 fluid links of the NEW map
    fluid = jnp.logical_not(inside_new)
    masks = []
    for ax in range(3):
        for sgn in (+1, -1):
            sh = [0, 0, 0]
            sh[ax] = -sgn
            nb_in = roll3(inside_new, tuple(sh))
            pid_n = roll3(pid_new, tuple(sh))
            masks.append((jnp.logical_and(fluid, nb_in), pid_n))
    for n in range(n_part):
        mlist = [jnp.logical_and(m, p == n) for (m, p) in masks]
        saf = sum(jnp.sum(m.astype(phi.dtype)) for m in mlist)
        share = jnp.where(saf > 0.0, dphi[n] / jnp.where(saf > 0.0, saf,
                                                         1.0), 0.0)
        for m in mlist:
            phi = phi + jnp.where(m, share, 0.0)
    return phi


def make_binary_colloid_step(bcfg: BinaryConfig, params: ColloidParams,
                             rebuild_freq: int = 1, force_fn=None,
                             phi_ref: float = 0.0, wallspec=None,
                             conserve_phi: bool = True):
    """Jitted step for (ColloidState..., phi, u[, gwall]).

    wallspec: halo plane walls around the suspension (ref: wall.c +
    phi_force_colloid.c pth_force_wall_kernel; serial-coll-rfd).  The
    state gains a gwall wall-momentum accumulator."""
    cfg = bcfg.lb
    model = cfg.model
    cparams = cfg.collision_params()
    size = cfg.size
    ch = CahnHilliardParams(mobility=bcfg.mobility,
                            advection_order=bcfg.advection_order)
    grav = jnp.asarray(np.array(params.gravity, np.float64), cfg.jdtype)
    # segment-sum formulation for suspensions (ref: VERDICT 'rescale
    # colloids'); the small-N unrolled path is kept as the oracle
    fast = params.n > 4 and not any(
        params.is_active(n) for n in range(params.n))
    if fast:
        from ludwig_tpu.colloids_fast import (
            bbl_step_fast, build_map_fast, colloid_fe_force_fast,
            phi_remove_replace_conserve_fast, remove_replace_fast,
            solid_body_u)

    has_walls = wallspec is not None and wallspec.any

    @partial(jax.jit, static_argnums=2, donate_argnums=0)
    def _step(state, t, rebuild):
        # state carries the step's stale gradients (sg, sd) for the
        # statistics fed, like the LC state does (the reference stats
        # read field_grad computed at the top of the step)
        if has_walls:
            f, R, V, W, dr, Rmap, Msw, phi, u, _sg, _sd, gwall = state
        else:
            f, R, V, W, dr, Rmap, Msw, phi, u, _sg, _sd = state
            gwall = None
        L = jnp.asarray(np.array(size, np.float64), R.dtype)
        fxm = params.fixedr_mask(R.dtype)
        R = position_update(R, (dr if fxm is None else fxm * dr), size)
        bmap = build_map_fast if fast else build_map
        rr_fn = remove_replace_fast if fast else remove_replace
        prc_fn = (phi_remove_replace_conserve_fast if fast
                  else phi_remove_replace_conserve)
        if rebuild:
            pid_old, inside_old = bmap(Rmap, params, size)
            Rmap = R
            pid, inside = bmap(R, params, size)
            wkw = ({"walls": wallspec.walls} if has_walls and not fast
                   else {})
            f, deltam, f0c, t0c = rr_fn(
                f, R, V, W, inside_old, pid_old, inside, pid, model,
                params, size, rho0=cfg.rho0, **wkw)
            phi = prc_fn(
                phi, inside_old, inside, pid_old, pid, model, params.n,
                phi0=phi_ref, conserve=conserve_phi, **wkw)
        else:
            pid, inside = bmap(Rmap, params, size)
            deltam = f0c = t0c = None
        fluid = jnp.logical_not(inside)

        # interior sites track the solid-body velocity (bbl pass0)
        if fast:
            ub = solid_body_u(R, V, W, pid, inside, size, f.dtype)
        else:
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

        # solid-aware gradients with (uniform) colloid wetting
        grad, delsq = solid27_scalar_ops(
            size, fluid=fluid, rkappa=1.0 / bcfg.fe.kappa,
            c=bcfg.wetting[0], h=bcfg.wetting[1],
            walls=(wallspec.walls if has_walls else (False,) * 3))
        fields = {"phi": phi, "grad_phi": grad(phi),
                  "delsq_phi": delsq(phi)}
        sg, sd = fields["grad_phi"], fields["delsq_phi"]
        mu = bcfg.fe.mu(fields)
        pth = bcfg.fe.stress(fields)

        force = stress_divergence_force_map(
            pth, fluid, wallspec=wallspec).astype(f.dtype)
        fe_part = (colloid_fe_force_fast(pth, pid, inside, model,
                                         params.n) if fast else
                   colloid_fe_force(
                       pth, pid, inside, model, params.n,
                       walls=(wallspec.walls if has_walls
                              else (False,) * 3)))
        if has_walls:
            # what fluid + particles gain, the walls lose (ref:
            # pth_force_wall_kernel -> wall->fnet)
            fsum = jnp.sum(jnp.where(fluid[None], force, 0.0),
                           axis=(1, 2, 3))
            gwall = gwall - (fsum.astype(gwall.dtype)
                             + jnp.sum(fe_part, axis=0))

        phi = cahn_hilliard_update(phi, mu, u, ch, solid=inside,
                                   wallspec=wallspec)

        # fluid gravity compensation (ref: interaction.c
        # colloids_update_forces_fluid_gravity)
        if any(v != 0.0 for v in params.gravity):
            nfluid = jnp.sum(fluid.astype(f.dtype))
            fb = (-grav) * (1.0 / nfluid) * float(params.n)
            force = force + jnp.where(
                fluid[None], fb[:, None, None, None], 0.0).astype(f.dtype)

        f, rho, u_new = collide(f, cparams, force=force, fluid_mask=fluid)

        ext = jnp.tile(grav[None], (params.n, 1)) + fe_part
        if force_fn is not None:
            ext = ext + force_fn(R, V).astype(ext.dtype)
        Vold = V
        bblf = bbl_step_fast if fast else bbl_step
        if fast:
            f, V, W, Msw, gwbb = bblf(f, Rmap, V, W, model, params, size,
                                      ext_force=ext, rho0=cfg.rho0,
                                      deltam=deltam, f0_corr=f0c,
                                      t0_corr=t0c, M=Msw)
        else:
            f, V, W, Msw, gwbb = bblf(
                f, Rmap, V, W, model, params, size,
                ext_force=ext, rho0=cfg.rho0,
                deltam=deltam, f0_corr=f0c, t0_corr=t0c, M=Msw,
                walls=(wallspec.walls if has_walls else (False,) * 3))
        dr = 0.5 * (Vold + V)

        if has_walls:
            from ludwig_tpu.ops.walls import wall_bounce_back
            gwall = gwall + gwbb
            f_post = f
            f = stream(f, model)
            f, _, gwb = wall_bounce_back(f, f_post, model, wallspec,
                                         rho0=cfg.rho0, fluid=fluid)
            gwall = gwall + gwb
            return (f, R, V, W, dr, Rmap, Msw, phi, u_new, sg, sd,
                    gwall), (rho, u_new)
        f = stream(f, model)
        return (f, R, V, W, dr, Rmap, Msw, phi, u_new,
                sg, sd), (rho, u_new)

    def step(state, t=0, rebuild=None):
        return _step(state, t, int(t) % rebuild_freq == 0 if rebuild is None
                     else rebuild)

    return step


def initial_binary_colloid(bcfg: BinaryConfig, params: ColloidParams,
                           phi0, R0, V0=None, W0=None, dr0=None):
    cfg = bcfg.lb
    from ludwig_tpu.lb import initial_rest
    nc = params.n
    jd = cfg.jdtype
    f = initial_rest(cfg)
    R = jnp.asarray(np.array(R0), jd)
    V = (jnp.asarray(np.array(V0), jd) if V0 is not None
         else jnp.zeros((nc, 3), jd))
    W = (jnp.asarray(np.array(W0), jd) if W0 is not None
         else jnp.zeros((nc, 3), jd))
    dr = (jnp.asarray(np.array(dr0), jd) if dr0 is not None
          else jnp.zeros((nc, 3), jd))
    mm = (np.array(params.m, np.float64) if params.m
          else np.tile([1.0, 0.0, 0.0], (nc, 1)))
    phi_j = jnp.asarray(phi0, jd)
    return (f, R, V, W, dr,
            jnp.array(R), jnp.asarray(mm, jd),
            phi_j, jnp.zeros((3,) + size_of(cfg), jd),
            jnp.zeros((3,) + size_of(cfg), jd), jnp.zeros_like(phi_j))


def size_of(cfg):
    return tuple(cfg.size)
