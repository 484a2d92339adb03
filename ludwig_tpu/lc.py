"""Liquid-crystal (Q-tensor) simulation: blue phase + Beris-Edwards + LB.

TPU-native equivalent of the reference's LC wiring (ref: src/ludwig.c
q-tensor branch: field_grad(q) -> redshift -> force via stress
divergence (+ active stress) -> beris_edwards -> collide -> stream).
This is the reference's headline benchmark configuration.

Walls (halo plane walls, ref: src/wall.c) and anchoring gradients
(ref: src/gradient_3d_7pt_solid.c, src/gradient_s7_anchoring.c) are
supported; with walls the state carries the accumulated wall momentum
for the statistics block.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ludwig_tpu.dynamics.beris_edwards import (BerisEdwardsParams,
                                               beris_edwards_update)
from ludwig_tpu.fe.blue_phase import BluePhaseFE
from ludwig_tpu.lb import LBConfig, initial_rest
from ludwig_tpu.ops.collide import collide
from ludwig_tpu.ops.force import stress_divergence_force
from ludwig_tpu.ops.lc_anchor import AnchoringParams, anchoring_gradient
from ludwig_tpu.ops.stencil import gradient_ops
from ludwig_tpu.ops.stream import stream, stream_bounce_back
from ludwig_tpu.ops.walls import (WallSpec, stress_divergence_force_walls,
                                  wall_bounce_back)

_SOLID_GRADIENTS = ("3d_7pt_solid", "s7_anchoring")


@dataclasses.dataclass(frozen=True)
class LCConfig:
    lb: LBConfig
    fe: BluePhaseFE
    gamma: float = 0.1            # rotational mobility (lc_Gamma)
    advection_order: int = 1
    gradient: str = "3d_7pt_fluid"
    hydrodynamics: bool = True
    wallspec: Optional[WallSpec] = None
    anchoring: Optional[AnchoringParams] = None
    # dynamic redshift recompute each step (ref: blue_phase.c:1443
    # fe_lc_redshift_compute, input key lc_redshift_update)
    redshift_update: bool = False
    # fluctuating Q dynamics (ref: blue_phase_beris_edwards.c noise
    # branch; input keys lc_noise + temperature); 0 = off
    noise_kt: float = 0.0
    noise_seed: int = 8361235
    # carry the start-of-step gradients in the state: the reference
    # computes statistics with the gradients of the PREVIOUS q (the
    # field_grad is refreshed at the top of the loop, before the BE
    # update; ref: ludwig.c:586-592 vs stats at :950+)
    keep_grads: bool = False

    @property
    def has_walls(self) -> bool:
        return self.wallspec is not None and self.wallspec.any


def lc_fields(q5, gradient: str, anchoring=None, walls=(False,) * 3,
              status=None, pid=None, R=None, phi=None):
    if gradient in _SOLID_GRADIENTS:
        if status is None:
            status = jnp.zeros(q5.shape[1:], jnp.int32)
        grad, delsq = anchoring_gradient(q5, anchoring, status,
                                         walls=walls, pid=pid, R=R,
                                         phi=phi)
    else:
        g, d = gradient_ops(gradient)
        grad, delsq = g(q5), d(q5)
    return {"q": q5, "grad_q": grad, "delsq_q": delsq}


def _lc_force(cfg: LCConfig, fields, h, dtype):
    pth = cfg.fe.stress(fields, h=h)
    sa = cfg.fe.active_stress(fields)
    if sa is not None:
        pth = pth + sa
    if cfg.has_walls:
        force, fwall = stress_divergence_force_walls(pth, cfg.wallspec)
        return force.astype(dtype), fwall
    return stress_divergence_force(pth).astype(dtype), None


def _s5_corotation(q33, w, xi):
    """Corotation source S(W,Q) in 5-component form, from the velocity
    gradient tensor w[a][b] (ref: blue_phase_beris_edwards.c S(W,Q)
    construction).  Shape-polymorphic: used on full lattices
    (make_lc_le_step) and on plane-column slabs (the fused LE fix)."""
    tr = (w[0][0] + w[1][1] + w[2][2]) / 3.0
    w = [[w[a][b] - (tr if a == b else 0.0) for b in range(3)]
         for a in range(3)]
    trace_qw = sum(q33[a][b] * w[b][a]
                   for a in range(3) for b in range(3))
    d = [[0.5 * (w[a][b] + w[b][a]) for b in range(3)]
         for a in range(3)]
    om = [[0.5 * (w[a][b] - w[b][a]) for b in range(3)]
          for a in range(3)]
    r3 = 1.0 / 3.0
    s33 = [[None] * 3 for _ in range(3)]
    for a in range(3):
        for b in range(3):
            val = -2.0 * xi * (q33[a][b]
                               + (r3 if a == b else 0.0)) * trace_qw
            for cc in range(3):
                val = val + (xi * d[a][cc] + om[a][cc]) * (
                    q33[cc][b] + (r3 if cc == b else 0.0))
                val = val + (q33[a][cc]
                             + (r3 if a == cc else 0.0)) * (
                    xi * d[cc][b] - om[cc][b])
            s33[a][b] = val
    return [s33[0][0], s33[0][1], s33[0][2], s33[1][1], s33[1][2]]


def make_lc_step(cfg: LCConfig, solid=None):
    """Jitted step: (f, q5, u[, gwall]) -> ((f, q5, u[, gwall]), rho).

    With walls the state carries gwall, the accumulated momentum given
    to the walls (stress one-sided fluxes + bounce-back transfer)."""
    params = cfg.lb.collision_params()
    model = cfg.lb.model
    be = BerisEdwardsParams(gamma=cfg.gamma, xi=cfg.fe.xi,
                            advection_order=cfg.advection_order)
    fluid = None if solid is None else jnp.logical_not(solid)
    walls3 = cfg.wallspec.walls if cfg.has_walls else (False,) * 3

    @partial(jax.jit, donate_argnums=0)
    def step(state, t=0):
        import dataclasses as _dc
        if cfg.keep_grads:
            state = state[:-2]
        rs = None
        if cfg.redshift_update:
            rs = state[-1]
            state = state[:-1]
        if cfg.has_walls:
            f, q5, u, gwall = state
        else:
            f, q5, u = state
            gwall = None
        fields = lc_fields(q5, cfg.gradient, anchoring=cfg.anchoring,
                           walls=walls3)
        lcfg = cfg
        if cfg.redshift_update:
            from ludwig_tpu.fe.blue_phase import redshift_compute
            rs = redshift_compute(cfg.fe, fields, rs)
            lcfg = _dc.replace(cfg, fe=_dc.replace(cfg.fe, redshift=rs))
        h = lcfg.fe.molecular_field(fields)

        noise5 = None
        if cfg.noise_kt > 0.0:
            from ludwig_tpu.noise import qab_noise5
            noise5 = qab_noise5(cfg.noise_seed, t, cfg.lb.size,
                                cfg.noise_kt, cfg.gamma,
                                dtype=cfg.lb.jdtype)
        if cfg.hydrodynamics:
            force, fwall = _lc_force(lcfg, fields, h, f.dtype)
            q5 = beris_edwards_update(q5, h, u, be, fluid_mask=fluid,
                                      wallspec=cfg.wallspec,
                                      noise5=noise5)
            f, rho, u_new = collide(f, params, force=force,
                                    fluid_mask=fluid)
            if cfg.has_walls:
                from ludwig_tpu.stats import momentum_total
                f_new = stream(f, model)
                g_pre = momentum_total(f_new, model)
                f_new, _, _ = wall_bounce_back(f_new, f, model,
                                               cfg.wallspec,
                                               rho0=cfg.lb.rho0)
                # wall gains exactly what the fluid lost in the
                # bounce-back (the reference's kahan fnet is the true
                # per-link sum, identical to this difference)
                gbb = g_pre - momentum_total(f_new, model)
                gwall = gwall + fwall + gbb
                f = f_new
            else:
                f = stream_bounce_back(f, model, solid=solid,
                                       rho0=cfg.lb.rho0)
        else:
            q5 = beris_edwards_update(q5, h, None, be, fluid_mask=fluid,
                                      noise5=noise5)
            rho = jnp.ones_like(q5[0])
            u_new = u

        out = (f, q5, u_new, gwall) if cfg.has_walls else (f, q5, u_new)
        if cfg.redshift_update:
            out = out + (rs,)
        if cfg.keep_grads:
            out = out + (fields["grad_q"], fields["delsq_q"])
        return out, rho

    return step


def make_lc_le_step(cfg: LCConfig, le, keep_grads: bool = False):
    """Jitted LC step under Lees-Edwards shear (ref: the q-tensor branch
    of ludwig.c with lees_edw planes: LE-aware gradients, two-sided
    stress fluxes with mean fix, Q advection with separate plane west
    fluxes (no averaging fix, cf. beris_edw_update), LE-aware velocity
    gradient tensor, LB reproject+displace)."""
    from ludwig_tpu.dynamics.beris_edwards import corotation_term
    from ludwig_tpu.fe.blue_phase import q5_to_q33
    from ludwig_tpu.ops.le_ref import (LEContext, le_advective_fluxes,
                                       le_buffer_fields,
                                       le_flux_divergence, le_gradient,
                                       le_stress_force)
    from ludwig_tpu.ops.lees_edwards import apply_lb_le
    params = cfg.lb.collision_params()
    model = cfg.lb.model
    fe = cfg.fe
    gamma = cfg.gamma
    xi = fe.xi
    order = cfg.advection_order
    nx = le.nx

    def h_pth_of(q5c, gradc, dsqc):
        flds = {"q": q5c, "grad_q": gradc, "delsq_q": dsqc}
        h = fe.molecular_field(flds)
        pth = fe.stress(flds, h=h)
        sa = fe.active_stress(flds)
        if sa is not None:
            pth = pth + sa
        return h, pth

    @partial(jax.jit, donate_argnums=0)
    def step(state, t=0):
        if keep_grads:
            state = state[:-2]
        f, q5, u = state
        ctx = LEContext(le, t, q5.dtype)

        grad, delsq = le_gradient(q5, le, t, cfg.gradient)
        h, pth = h_pth_of(q5, grad, delsq)

        plane_bufs = {}
        for c in ctx.cols:
            qb1, gb1, db1 = le_buffer_fields(q5, ctx, c, True,
                                             cfg.gradient)
            _, pth_b1 = h_pth_of(qb1, gb1, db1)
            qd0, gd0, dd0 = le_buffer_fields(q5, ctx, c, False,
                                             cfg.gradient)
            _, pth_d0 = h_pth_of(qd0, gd0, dd0)
            plane_bufs[c] = (pth_b1, pth_d0)
        area = float(np.prod(q5.shape[2:]))
        force = le_stress_force(pth, plane_bufs, ctx, area).astype(f.dtype)

        # Beris-Edwards with LE advection and LE velocity gradients
        fe_x, fw_p, fy, fz = le_advective_fluxes(q5, u, ctx, order)
        div = le_flux_divergence(fe_x, fw_p, fy, fz, ctx)
        w = [[None] * 3 for _ in range(3)]
        for a in range(3):
            w[a][0] = 0.5 * (jnp.roll(u[a], -1, 0) - jnp.roll(u[a], 1, 0))
            w[a][1] = 0.5 * (jnp.roll(u[a], -1, 1) - jnp.roll(u[a], 1, 1))
            w[a][2] = 0.5 * (jnp.roll(u[a], -1, 2) - jnp.roll(u[a], 1, 2))
        for c in ctx.cols:
            cu = (c + 1) % nx
            ub1 = ctx.col_u(u, c + 1, True, c)
            ud0 = ctx.col_u(u, c, False, c)
            for a in range(3):
                w[a][0] = w[a][0].at[c].set(
                    0.5 * (ub1[a] - u[a][(c - 1) % nx]))
                w[a][0] = w[a][0].at[cu].set(
                    0.5 * (u[a][(c + 2) % nx] - ud0[a]))
        q33 = q5_to_q33(q5)
        s5 = _s5_corotation(q33, w, xi)
        rhs = jnp.stack([gamma * h[0][0] + s5[0], gamma * h[0][1] + s5[1],
                         gamma * h[0][2] + s5[2], gamma * h[1][1] + s5[3],
                         gamma * h[1][2] + s5[4]]) - div
        q5_new = q5 + rhs

        f, rho, u_new = collide(f, params, force=force)
        f = apply_lb_le(f, model, le, t)
        f = stream(f, model)

        out = (f, q5_new, u_new)
        if keep_grads:
            out = out + (grad, delsq)
        return out, rho

    return step


def make_lc_le_column_fix(cfg: LCConfig, le):
    """Column corrections turning the PLAIN-periodic fused LC outputs
    into the Lees-Edwards-aware ones.

    The fused Pallas kernels (ops/fused_lc.py) treat x as plain
    periodic; under LE shear only plane-adjacent columns differ: q5'
    at {c, c+1} and force at {c-1 .. c+2} per plane (order-1 advection,
    7-pt gradients).  This recomputes exactly those columns with the
    make_lc_le_step formulas (ref: gradient_3d_7pt_fluid _le
    correction, advection.c LE kernels, phi_force_flux + fix,
    beris_edwards LE velocity gradients) as O(nplanes * Y * Z) slab
    work around the unmodified O(volume) kernels.

    Returns fix(q5, u, t) -> (qcols, fcols): dicts of corrected
    columns {col: (5, Y, Z)} / {col: (3, Y, Z)} to overwrite in the
    fused K1 outputs.  q5/u are the step INPUTS.
    """
    from ludwig_tpu.fe.blue_phase import q5_to_q33
    from ludwig_tpu.ops.le_ref import LEContext, le_buffer_fields

    if cfg.advection_order != 1 or cfg.gradient != "3d_7pt_fluid":
        raise ValueError("fused LE fix needs order-1 advection and "
                         "3d_7pt_fluid gradients")
    if le.nx < 6 * le.nplanes:
        # the per-plane column slabs (c-3 .. c+4) must not overlap the
        # next plane's fix set
        raise ValueError("fused LE fix needs plane separation >= 6")
    fe = cfg.fe
    gamma = cfg.gamma
    xi = fe.xi
    nx = le.nx

    def h_pth_of(q5c, gradc, dsqc):
        flds = {"q": q5c, "grad_q": gradc, "delsq_q": dsqc}
        h = fe.molecular_field(flds)
        pth = fe.stress(flds, h=h)
        sa = fe.active_stress(flds)
        if sa is not None:
            pth = pth + sa
        return h, pth

    def col_grad7(pm1, p0, pp1):
        yp, ym = jnp.roll(p0, -1, -2), jnp.roll(p0, 1, -2)
        zp, zm = jnp.roll(p0, -1, -1), jnp.roll(p0, 1, -1)
        grad = jnp.stack([0.5 * (pp1 - pm1), 0.5 * (yp - ym),
                          0.5 * (zp - zm)])
        d2 = pp1 + pm1 + yp + ym + zp + zm - 6.0 * p0
        return grad, d2

    def upw(ph0, ph1, uf):
        return uf * jnp.where(uf > 0.0, ph0, ph1)

    def fix(q5, u, t):
        ctx = LEContext(le, t, q5.dtype)
        area = float(np.prod(q5.shape[2:]))
        qcols, fcols = {}, {}

        def cq(j):
            return q5[:, j % nx]

        for c in ctx.cols:
            cup = (c + 1) % nx
            pb1 = ctx.col_field(q5, c + 1, True, c)
            pd0 = ctx.col_field(q5, c, False, c)
            # LE-aware gradients at the plane-adjacent columns
            g_c, d_c = col_grad7(cq(c - 1), cq(c), pb1)
            g_u, d_u = col_grad7(pd0, cq(cup), cq(c + 2))
            h_c, pth_c = h_pth_of(cq(c), g_c, d_c)
            h_u, pth_u = h_pth_of(cq(cup), g_u, d_u)
            # buffer-column stresses (two-sided plane flux)
            qb1, gb1, db1 = le_buffer_fields(q5, ctx, c, True,
                                             cfg.gradient)
            _, pth_b1 = h_pth_of(qb1, gb1, db1)
            qd0, gd0, dd0 = le_buffer_fields(q5, ctx, c, False,
                                             cfg.gradient)
            _, pth_d0 = h_pth_of(qd0, gd0, dd0)
            # plain stresses at the flanking columns
            pth_p = {}
            for x in (c - 2, c - 1, c + 2, c + 3):
                g_x, d_x = col_grad7(cq(x - 1), cq(x), cq(x + 1))
                _, pth_p[x] = h_pth_of(cq(x), g_x, d_x)

            # ---- force at {c-1, c, c+1, c+2} (ref: le_stress_force) --
            newf = {x: [] for x in (c - 1, c, c + 1, c + 2)}
            for a in range(3):

                def yz(p):
                    fya = 0.5 * (p[a, 1] + jnp.roll(p[a, 1], -1, 0))
                    fza = 0.5 * (p[a, 2] + jnp.roll(p[a, 2], -1, 1))
                    return (fya - jnp.roll(fya, 1, 0)
                            + fza - jnp.roll(fza, 1, 1))

                fe_c = 0.5 * (pth_c[a, 0] + pth_b1[a, 0])
                fw_c = 0.5 * (pth_d0[a, 0] + pth_u[a, 0])
                corr = jnp.sum(-fe_c + fw_c) * (0.5 / area)
                fea = {
                    c - 2: 0.5 * (pth_p[c - 2][a, 0]
                                  + pth_p[c - 1][a, 0]),
                    c - 1: 0.5 * (pth_p[c - 1][a, 0] + pth_c[a, 0]),
                    c: fe_c + corr,
                    c + 1: 0.5 * (pth_u[a, 0] + pth_p[c + 2][a, 0]),
                    c + 2: 0.5 * (pth_p[c + 2][a, 0]
                                  + pth_p[c + 3][a, 0]),
                }
                fw_fix = fw_c - corr
                newf[c - 1].append(-(fea[c - 1] - fea[c - 2]
                                     + yz(pth_p[c - 1])))
                newf[c].append(-(fea[c] - fea[c - 1] + yz(pth_c)))
                newf[c + 1].append(-(fea[c + 1] - fw_fix + yz(pth_u)))
                newf[c + 2].append(-(fea[c + 2] - fea[c + 1]
                                     + yz(pth_p[c + 2])))
            for x, rows in newf.items():
                fcols[x % nx] = jnp.stack(rows)

            # ---- Beris-Edwards update at {c, c+1} --------------------
            ub1 = ctx.col_u(u, c + 1, True, c)
            ud0 = ctx.col_u(u, c, False, c)

            def col_w(um1x, u0, up1x):
                # w[a][b] = du_a/dx_b at the column; x-derivative from
                # the given (possibly LE-sampled) neighbour columns
                return [[0.5 * (up1x[a] - um1x[a]),
                         0.5 * (jnp.roll(u0[a], -1, -2)
                                - jnp.roll(u0[a], 1, -2)),
                         0.5 * (jnp.roll(u0[a], -1, -1)
                                - jnp.roll(u0[a], 1, -1))]
                        for a in range(3)]

            w_c = col_w(u[:, (c - 1) % nx], u[:, c % nx], ub1)
            w_u = col_w(ud0, u[:, cup], u[:, (c + 2) % nx])

            for col, qc, h, w in ((c, cq(c), h_c, w_c),
                                  (cup, cq(cup), h_u, w_u)):
                q33 = q5_to_q33(qc)
                s5 = _s5_corotation(q33, w, xi)

                # order-1 advective flux divergence with LE faces
                u0c = u[0, col]
                if col == c:
                    fe_hi = upw(qc, pb1, 0.5 * (u0c + ub1[0]))
                    fe_lo = upw(cq(c - 1), qc,
                                0.5 * (u[0, (c - 1) % nx] + u0c))
                else:
                    fe_hi = upw(qc, cq(c + 2),
                                0.5 * (u0c + u[0, (c + 2) % nx]))
                    fe_lo = upw(pd0, qc, 0.5 * (ud0[0] + u0c))
                ufy = 0.5 * (u[1, col] + jnp.roll(u[1, col], -1, -2))
                fy = upw(qc, jnp.roll(qc, -1, -2), ufy)
                ufz = 0.5 * (u[2, col] + jnp.roll(u[2, col], -1, -1))
                fz = upw(qc, jnp.roll(qc, -1, -1), ufz)
                div = (fe_hi - fe_lo + fy - jnp.roll(fy, 1, -2)
                       + fz - jnp.roll(fz, 1, -1))

                h5 = [h[0][0], h[0][1], h[0][2], h[1][1], h[1][2]]
                rhs = jnp.stack([gamma * h5[n] + s5[n]
                                 for n in range(5)]) - div
                qcols[col] = qc + rhs
        return qcols, fcols

    return fix


def make_lc_nstep(cfg: LCConfig, solid=None):
    step = make_lc_step(cfg, solid)

    @partial(jax.jit, static_argnums=1, donate_argnums=0)
    def nstep(state, n, t0=0):
        def body(s, t):
            s, _rho = step(s, t)
            return s, ()
        state, _ = jax.lax.scan(body, state, t0 + jnp.arange(n))
        return state

    return nstep


def initial_lc(cfg: LCConfig, q0_field: np.ndarray):
    f = initial_rest(cfg.lb)
    q5 = jnp.asarray(q0_field, cfg.lb.jdtype)
    u = jnp.zeros((3,) + tuple(cfg.lb.size), cfg.lb.jdtype)
    state = (f, q5, u)
    if cfg.has_walls:
        state = state + (jnp.zeros((3,), cfg.lb.jdtype),)
    if cfg.redshift_update:
        state = state + (jnp.asarray(cfg.fe.redshift, cfg.lb.jdtype),)
    if cfg.keep_grads:
        fields = lc_fields(q5, cfg.gradient, anchoring=cfg.anchoring,
                           walls=cfg.wallspec.walls if cfg.has_walls
                           else (False,) * 3)
        state = state + (fields["grad_q"], fields["delsq_q"])
    return state


def total_free_energy(cfg: LCConfig, q5) -> float:
    fields = lc_fields(q5, cfg.gradient, anchoring=cfg.anchoring,
                       walls=cfg.wallspec.walls if cfg.has_walls
                       else (False,) * 3)
    return float(jnp.sum(cfg.fe.fed(fields)))


def lc_surface_fe(cfg: LCConfig, q5):
    """(f_s1, f_s2): anchoring surface free energies summed over the
    lower/upper wall faces (ref: fe_lc_stats.c fe_lc_wallx/y/z)."""
    from ludwig_tpu.fe.blue_phase import q5_to_q33
    anch = cfg.anchoring
    fs1 = jnp.zeros((), q5.dtype)
    fs2 = jnp.zeros((), q5.dtype)
    for ax in range(3):
        if not cfg.wallspec.walls[ax]:
            continue
        # the reference RESETS fs[0]/fs[1] inside each of
        # fe_lc_wallx/y/z, so with walls in several directions only the
        # last direction's surface term survives (ref: fe_lc_stats.c
        # fe_lc_wall{x,y,z}:fs[0]=fs[1]=0.0 at entry)
        fs1 = jnp.zeros((), q5.dtype)
        fs2 = jnp.zeros((), q5.dtype)
        for side in (0, 1):
            plane = 0 if side == 0 else q5.shape[1 + ax] - 1
            sl = [slice(None)] * 3
            sl[ax] = plane
            qs5 = q5[(slice(None),) + tuple(sl)]
            qs = q5_to_q33(qs5)
            dn = [0.0, 0.0, 0.0]
            dn[ax] = 1.0 if side == 0 else -1.0
            fes = cfg.fe.surface_fs(qs, dn, anch.wall, anch.wall_w1,
                                    anch.wall_w2, nfix=anch.wall_nfix)
            if side == 0:
                fs1 = fs1 + jnp.sum(fes)
            else:
                fs2 = fs2 + jnp.sum(fes)
    return fs1, fs2
