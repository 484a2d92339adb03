"""LC-droplet simulation: coupled (phi, Q) + LB.

TPU-native equivalent of the reference LC-droplet wiring (ref:
src/ludwig.c:693-742: body force + momentum correction, then stress
divergence of the qh stress; phi via Cahn-Hilliard, Q via
Beris-Edwards, both with the coupled free energy).  This is the
"LC droplet (phi + Q)" benchmark configuration.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ludwig_tpu.dynamics.beris_edwards import (BerisEdwardsParams,
                                               beris_edwards_update)
from ludwig_tpu.dynamics.cahn_hilliard import (CahnHilliardParams,
                                               cahn_hilliard_update)
from ludwig_tpu.fe.lc_droplet import LCDropletFE
from ludwig_tpu.lb import LBConfig, initial_rest
from ludwig_tpu.ops.collide import collide
from ludwig_tpu.ops.force import stress_divergence_force
from ludwig_tpu.ops.stencil import dab_7pt, gradient_ops
from ludwig_tpu.ops.stream import stream, stream_bounce_back


@dataclasses.dataclass(frozen=True)
class LCDropletConfig:
    lb: LBConfig
    fe: LCDropletFE
    mobility: float = 0.05        # phi mobility
    gamma: float = 0.5            # Q rotational mobility (lc_Gamma)
    advection_order: int = 1
    gradient: str = "3d_7pt_fluid"
    force_method: str = "stress_divergence"


def droplet_fields(phi, q5, gradient: str):
    grad, delsq = gradient_ops(gradient)
    return {"phi": phi, "grad_phi": grad(phi), "delsq_phi": delsq(phi),
            "dab_phi": dab_7pt(phi),
            "q": q5, "grad_q": grad(q5), "delsq_q": delsq(q5)}


def make_droplet_step(cfg: LCDropletConfig, solid=None):
    params = cfg.lb.collision_params()
    model = cfg.lb.model
    ch = CahnHilliardParams(mobility=cfg.mobility,
                            advection_order=cfg.advection_order)
    be = BerisEdwardsParams(gamma=cfg.gamma, xi=cfg.fe.lc.xi,
                            advection_order=cfg.advection_order)
    fluid = None if solid is None else jnp.logical_not(solid)

    @partial(jax.jit, donate_argnums=0)
    def step(state, t=0):
        f, phi, q5, u = state
        fields = droplet_fields(phi, q5, cfg.gradient)
        mu = cfg.fe.mu(fields)
        h = cfg.fe.molecular_field(fields)

        # force: corrected body force + divergence of the qh stress.
        # With fe_force_method relaxation_antisymmetric only the
        # antisymmetric stress is divergence-forced; the symmetric part
        # relaxes inside the collision (ref: phi_force.c:101,
        # collision.c:413 use_stress_relaxation).
        force = cfg.fe.body_force(fields, mu, h)
        relax_anti = cfg.force_method == "relaxation_antisymmetric"
        if relax_anti:
            force = force + stress_divergence_force(
                cfg.fe.stress_anti(fields, h))
        else:
            force = force + stress_divergence_force(
                cfg.fe.stress_qh(fields, h))
        force = force.astype(f.dtype)

        phi = cahn_hilliard_update(phi, mu, u, ch, solid=solid)

        # The reference updates phi first; the Beris-Edwards molecular
        # field then sees gamma(phi_new) with the (stale) gradients of
        # the pre-update fields (ref: ludwig.c order phi_cahn_hilliard
        # -> beris_edw_update; field_grad recomputed only next step).
        fields_be = dict(fields)
        fields_be["phi"] = phi
        h_be = cfg.fe.molecular_field(fields_be)
        q5 = beris_edwards_update(q5, h_be, u, be, fluid_mask=fluid)

        seq_extra = None
        if relax_anti:
            # the collision evaluates the symmetric stress AFTER the
            # order-parameter updates: fresh phi/Q, stale gradients
            # (ref: collision.c:417 str_symm_v reads current fields;
            # field_grad only recomputed at the next loop top)
            fields_c = dict(fields)
            fields_c["phi"] = phi
            fields_c["q"] = q5
            seq_extra = cfg.fe.stress_symm(fields_c)
        f, rho, u_new = collide(f, params, force=force, fluid_mask=fluid,
                                seq_extra=seq_extra)
        f = stream_bounce_back(f, model, solid=solid, rho0=cfg.lb.rho0)
        return (f, phi, q5, u_new), rho

    return step


def make_droplet_nstep(cfg: LCDropletConfig, solid=None):
    step = make_droplet_step(cfg, solid)

    @partial(jax.jit, static_argnums=1, donate_argnums=0)
    def nstep(state, n, t0=0):
        def body(s, t):
            s, _ = step(s, t)
            return s, ()
        state, _ = jax.lax.scan(body, state, t0 + jnp.arange(n))
        return state

    return nstep


def initial_droplet(cfg: LCDropletConfig, phi0: np.ndarray,
                    q0: np.ndarray):
    f = initial_rest(cfg.lb)
    phi = jnp.asarray(phi0, cfg.lb.jdtype)
    q5 = jnp.asarray(q0, cfg.lb.jdtype)
    u = jnp.zeros((3,) + tuple(cfg.lb.size), cfg.lb.jdtype)
    return (f, phi, q5, u)


def make_droplet_le_step(cfg: LCDropletConfig, le, keep_grads=False):
    """Jitted LC-droplet step under Lees-Edwards shear:
    (f, phi, q5, u) -> (state, rho).

    The reference's sheared-droplet wiring (ref: ludwig.c:693-742 with
    lees_edw planes): droplet body force (-phi grad mu - h dq, PLAIN
    stencils even under LE, lc_droplet.c:826 kernel_coords_index) with
    momentum correction, then the flux-route force from the total
    droplet stress (phi_force.c:91 'Must use the flux method for LE
    planes', stress = str_symm + str_anti), phi via Cahn-Hilliard with
    LE advection + plane flux averaging (phi_ch_le_fix_fluxes), Q via
    Beris-Edwards with LE advection and LE velocity gradients, and the
    LB reproject+displace (model_le.c).

    All plane work is O(nplanes * Y * Z) column corrections around the
    plain-periodic bulk passes (the same construction as
    binary_le.make_binary_le_step and lc.make_lc_le_step, with the
    droplet free energy's coupled mu/h/stress)."""
    from ludwig_tpu.binary_le import _STENCIL, _upwind_face
    from ludwig_tpu.fe.blue_phase import q5_to_q33
    from ludwig_tpu.lc import _s5_corotation
    from ludwig_tpu.ops.le_ref import (LEContext, le_advective_fluxes,
                                       le_buffer_dab, le_buffer_fields,
                                       le_dab_7pt, le_flux_divergence,
                                       le_gradient, sample_linear)
    from ludwig_tpu.ops.lees_edwards import apply_lb_le

    params = cfg.lb.collision_params()
    model = cfg.lb.model
    fe = cfg.fe
    M = cfg.mobility
    gamma = cfg.gamma
    xi = fe.lc.xi
    order = cfg.advection_order
    nx = le.nx

    def flds_of(phi0, gp, dp, dab, q0, gq, dq):
        return {"phi": phi0, "grad_phi": gp, "delsq_phi": dp,
                "dab_phi": dab, "q": q0, "grad_q": gq, "delsq_q": dq}

    @partial(jax.jit, donate_argnums=0)
    def step(state, t=0):
        if keep_grads:
            state = state[:-2]
        f, phi, q5, u = state
        ctx = LEContext(le, t, phi.dtype)

        grad_p, delsq_p = le_gradient(phi, le, t, cfg.gradient)
        dab_p = le_dab_7pt(phi, le, t)
        grad_q, delsq_q = le_gradient(q5, le, t, cfg.gradient)
        fields = flds_of(phi, grad_p, delsq_p, dab_p, q5, grad_q,
                         delsq_q)
        mu = fe.mu(fields)
        h = fe.molecular_field(fields)

        # droplet partial body force + momentum correction (plain
        # stencils; fe.body_force subtracts the mean)
        force = fe.body_force(fields, mu, h)

        # total droplet stress for the LE flux route
        pth = fe.stress_qh(fields, h)

        # -- per-plane buffer-frame columns ----------------------------
        buf = []
        for c in ctx.cols:
            cu = (c + 1) % nx
            pb1, gp_b1, dp_b1 = le_buffer_fields(phi, ctx, c, True,
                                                 cfg.gradient)
            dab_b1 = le_buffer_dab(phi, ctx, c, True)
            qb1, gq_b1, dq_b1 = le_buffer_fields(q5, ctx, c, True,
                                                 cfg.gradient)
            fb1 = flds_of(pb1, gp_b1, dp_b1, dab_b1, qb1, gq_b1, dq_b1)
            mu_b1 = fe.mu(fb1)
            pth_b1 = fe.stress_qh(fb1)
            pd0, gp_d0, dp_d0 = le_buffer_fields(phi, ctx, c, False,
                                                 cfg.gradient)
            dab_d0 = le_buffer_dab(phi, ctx, c, False)
            qd0, gq_d0, dq_d0 = le_buffer_fields(q5, ctx, c, False,
                                                 cfg.gradient)
            fd0 = flds_of(pd0, gp_d0, dp_d0, dab_d0, qd0, gq_d0, dq_d0)
            mu_d0 = fe.mu(fd0)
            pth_d0 = fe.stress_qh(fd0)
            buf.append(dict(c=c, cu=cu, mu_b1=mu_b1, pth_b1=pth_b1,
                            mu_d0=mu_d0, pth_d0=pth_d0))

        # -- Cahn-Hilliard with LE advection (phi_ch_le_fix_fluxes) ----
        def xs(x, d):
            return jnp.roll(x, -d, axis=0)

        ufx = 0.5 * (u[0] + xs(u[0], 1))
        pcols = {d: xs(phi, d) for d in _STENCIL[order]}
        fe_x = _upwind_face(pcols, ufx, order) - M * (xs(mu, 1) - mu)

        def col_stack(j, lo, c):
            return {d: ctx.col_field(phi, j + d, lo, c)
                    for d in _STENCIL[order]}

        for b in buf:
            c, cu = b["c"], b["cu"]
            span = max(_STENCIL[order])
            for x in range(c - span + 1, c + 1):
                cols = col_stack(x, True, c)
                uu = 0.5 * (ctx.col_u(u, x, True, c)[0]
                            + ctx.col_u(u, x + 1, True, c)[0])
                mu0 = mu[x % nx] if x <= c else b["mu_b1"]
                mu1 = b["mu_b1"] if x + 1 == c + 1 else mu[(x + 1) % nx]
                fx = _upwind_face(cols, uu, order) - M * (mu1 - mu0)
                fe_x = fe_x.at[x % nx].set(fx)
            for x in range(c + 1, c + span):
                cols = col_stack(x, False, c)
                uu = 0.5 * (ctx.col_u(u, x, False, c)[0]
                            + ctx.col_u(u, x + 1, False, c)[0])
                fx = _upwind_face(cols, uu, order) \
                    - M * (mu[(x + 1) % nx] - mu[x % nx])
                fe_x = fe_x.at[x % nx].set(fx)
            cols = col_stack(c, False, c)
            uu = 0.5 * (ctx.col_u(u, c, False, c)[0]
                        + ctx.col_u(u, c + 1, False, c)[0])
            fw = _upwind_face(cols, uu, order) - M * (mu[cu] - b["mu_d0"])
            fe_c = fe_x[c]
            fe_fix = 0.5 * (fe_c + sample_linear(fw, ctx.dy_field))
            fw_fix = 0.5 * (fw + sample_linear(fe_c, -ctx.dy_field))
            b["fw_fix"] = fw_fix
            fe_x = fe_x.at[c].set(fe_fix)

        ufy = 0.5 * (u[1] + jnp.roll(u[1], -1, 1))
        ufz = 0.5 * (u[2] + jnp.roll(u[2], -1, 2))
        ycols = {d: jnp.roll(phi, -d, 1) for d in _STENCIL[order]}
        zcols = {d: jnp.roll(phi, -d, 2) for d in _STENCIL[order]}
        fy = _upwind_face(ycols, ufy, order) \
            - M * (jnp.roll(mu, -1, 1) - mu)
        fz = _upwind_face(zcols, ufz, order) \
            - M * (jnp.roll(mu, -1, 2) - mu)
        div = (fe_x - jnp.roll(fe_x, 1, 0) + fy - jnp.roll(fy, 1, 1)
               + fz - jnp.roll(fz, 1, 2))
        for b in buf:
            cu = b["cu"]
            div = div.at[cu].set(fe_x[cu] - b["fw_fix"]
                                 + (fy - jnp.roll(fy, 1, 1))[cu]
                                 + (fz - jnp.roll(fz, 1, 2))[cu])
        phi_new = phi - div

        # -- force: two-sided stress fluxes (phi_force_flux) -----------
        area = float(np.prod(phi.shape[1:]))
        comps = []
        for a in range(3):
            fea = 0.5 * (pth[a, 0] + xs(pth[a, 0], 1))
            for b in buf:
                c, cu = b["c"], b["cu"]
                fe_c = 0.5 * (pth[a, 0][c] + b["pth_b1"][a, 0])
                fw_c = 0.5 * (b["pth_d0"][a, 0] + pth[a, 0][cu])
                corr = jnp.sum(-fe_c + fw_c) * (0.5 / area)
                b[f"fe{a}"] = fe_c + corr
                b[f"fw{a}"] = fw_c - corr
                fea = fea.at[c].set(b[f"fe{a}"])
            fya = 0.5 * (pth[a, 1] + jnp.roll(pth[a, 1], -1, 1))
            fza = 0.5 * (pth[a, 2] + jnp.roll(pth[a, 2], -1, 2))
            d = (fea - jnp.roll(fea, 1, 0)
                 + fya - jnp.roll(fya, 1, 1) + fza - jnp.roll(fza, 1, 2))
            for b in buf:
                cu = b["cu"]
                d = d.at[cu].set(fea[cu] - b[f"fw{a}"]
                                 + (fya - jnp.roll(fya, 1, 1))[cu]
                                 + (fza - jnp.roll(fza, 1, 2))[cu])
            comps.append(-d)
        force = (force + jnp.stack(comps)).astype(f.dtype)

        # -- Beris-Edwards with LE advection + LE velocity gradients ---
        # gamma(phi_new) with stale gradients (ref: ludwig.c order)
        fields_be = dict(fields)
        fields_be["phi"] = phi_new
        h_be = fe.molecular_field(fields_be)
        fe_xq, fw_pq, fyq, fzq = le_advective_fluxes(q5, u, ctx, order)
        divq = le_flux_divergence(fe_xq, fw_pq, fyq, fzq, ctx)
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
        rhs = jnp.stack(
            [gamma * h_be[0][0] + s5[0], gamma * h_be[0][1] + s5[1],
             gamma * h_be[0][2] + s5[2], gamma * h_be[1][1] + s5[3],
             gamma * h_be[1][2] + s5[4]]) - divq
        q5_new = q5 + rhs

        f, rho, u_new = collide(f, params, force=force)
        f = apply_lb_le(f, model, le, t)
        f = stream(f, model)

        out = (f, phi_new, q5_new, u_new)
        if keep_grads:
            out = out + ((grad_p, grad_q), (delsq_p, delsq_q))
        return out, rho

    return step


def make_droplet_le_column_fix(cfg: LCDropletConfig, le):
    """Column corrections turning the PLAIN-periodic fused droplet
    outputs into the Lees-Edwards-aware ones.

    The droplet analogue of lc.make_lc_le_column_fix: under LE shear
    the coupled phi/Q updates differ from the plain kernel only near
    the planes.  The LE-corrected chemical potential at columns
    {c, c+1} feeds the CH diffusive flux of faces (c-1,c) and
    (c+1,c+2), so phi', q5' (via gamma(phi')) and force all need
    rewriting at {c-1, c, c+1, c+2}; the plane-crossing face (c,c+1)
    additionally takes the frame-displaced advection + flux-averaging
    fix (ref: phi_ch_le_fix_fluxes, phi_force_flux_fix_local,
    lc_droplet.c bodyforce with plain kernel_coords stencils).

    Returns fix(phi, q5, u, t) -> (pcols, qcols, fcols) keyed by
    column: {col: (Y, Z)} / {col: (5, Y, Z)} / {col: (3, Y, Z)}.
    phi/q5/u are the step INPUTS."""
    from ludwig_tpu.fe.blue_phase import q5_to_q33
    from ludwig_tpu.fe.lc_droplet import dq_tensor
    from ludwig_tpu.lc import _s5_corotation
    from ludwig_tpu.ops.le_ref import (LEContext, _dab_from_cols,
                                       le_buffer_dab, le_buffer_fields,
                                       sample_linear)

    if cfg.advection_order != 1 or cfg.gradient != "3d_7pt_fluid":
        raise ValueError("fused droplet LE fix needs order-1 advection "
                         "and 3d_7pt_fluid gradients")
    if le.nx < 8 * le.nplanes:
        raise ValueError("fused droplet LE fix needs plane "
                         "separation >= 8")
    fe = cfg.fe
    M = cfg.mobility
    gamma = cfg.gamma
    xi = fe.lc.xi
    nx = le.nx

    def col_grad7(m1, p0, p1):
        yp, ym = jnp.roll(p0, -1, -2), jnp.roll(p0, 1, -2)
        zp, zm = jnp.roll(p0, -1, -1), jnp.roll(p0, 1, -1)
        grad = jnp.stack([0.5 * (p1 - m1), 0.5 * (yp - ym),
                          0.5 * (zp - zm)])
        d2 = p1 + m1 + yp + ym + zp + zm - 6.0 * p0
        return grad, d2

    def upw(a, b, uf):
        return uf * jnp.where(uf > 0.0, a, b)

    def fix(phi, q5, u, t):
        ctx = LEContext(le, t, phi.dtype)
        area = float(np.prod(phi.shape[1:]))
        pcols, qcols, fcols = {}, {}, {}

        def cp(j):
            return phi[j % nx]

        def cq(j):
            return q5[:, j % nx]

        for c in ctx.cols:
            cu = (c + 1) % nx
            cols_fix = [(c - 1) % nx, c, cu, (c + 2) % nx]
            # -- buffer and corrected column fields --------------------
            pb1, gp_b1, dp_b1 = le_buffer_fields(phi, ctx, c, True,
                                                 cfg.gradient)
            dab_b1 = le_buffer_dab(phi, ctx, c, True)
            qb1, gq_b1, dq_b1 = le_buffer_fields(q5, ctx, c, True,
                                                 cfg.gradient)
            pd0, gp_d0, dp_d0 = le_buffer_fields(phi, ctx, c, False,
                                                 cfg.gradient)
            dab_d0 = le_buffer_dab(phi, ctx, c, False)
            qd0, gq_d0, dq_d0 = le_buffer_fields(q5, ctx, c, False,
                                                 cfg.gradient)
            pcol_b1 = ctx.col_field(phi, c + 1, True, c)
            pcol_d0 = ctx.col_field(phi, c, False, c)
            qcol_b1 = ctx.col_field(q5, c + 1, True, c)
            qcol_d0 = ctx.col_field(q5, c, False, c)

            # per-column fields: LE-corrected at c/cu, plain elsewhere
            flds = {}
            for x in range(c - 3, c + 5):
                xm = x % nx
                if x == c:
                    pm1, pp1 = cp(c - 1), pcol_b1
                    qm1, qp1 = cq(c - 1), qcol_b1
                elif x == c + 1:
                    pm1, pp1 = pcol_d0, cp(c + 2)
                    qm1, qp1 = qcol_d0, cq(c + 2)
                else:
                    pm1, pp1 = cp(x - 1), cp(x + 1)
                    qm1, qp1 = cq(x - 1), cq(x + 1)
                gp, dp = col_grad7(pm1, cp(x), pp1)
                gq, dq_ = col_grad7(qm1, cq(x), qp1)
                dab = _dab_from_cols({-1: pm1, 0: cp(x), 1: pp1})
                flds[xm] = {"phi": cp(x), "grad_phi": gp,
                            "delsq_phi": dp, "dab_phi": dab,
                            "q": cq(x), "grad_q": gq, "delsq_q": dq_}
            mu = {x: fe.mu(f_) for x, f_ in flds.items()}
            h = {x: fe.molecular_field(f_) for x, f_ in flds.items()}
            pth = {x: fe.stress_qh(f_, h[x]) for x, f_ in flds.items()}
            fb1 = {"phi": pb1, "grad_phi": gp_b1, "delsq_phi": dp_b1,
                   "dab_phi": dab_b1, "q": qb1, "grad_q": gq_b1,
                   "delsq_q": dq_b1}
            fd0 = {"phi": pd0, "grad_phi": gp_d0, "delsq_phi": dp_d0,
                   "dab_phi": dab_d0, "q": qd0, "grad_q": gq_d0,
                   "delsq_q": dq_d0}
            mu_b1, mu_d0 = fe.mu(fb1), fe.mu(fd0)
            pth_b1 = fe.stress_qh(fb1)
            pth_d0 = fe.stress_qh(fd0)

            # -- Cahn-Hilliard: faces (c-2..c+2) -> div at cols_fix ----
            def ux(j):
                return u[0, j % nx]

            fe_x = {}
            for x in (c - 2, c - 1, c + 1, c + 2):
                uu = 0.5 * (ux(x) + ux(x + 1))
                adv = upw(cp(x), cp(x + 1), uu)
                fe_x[x] = adv - M * (mu[(x + 1) % nx] - mu[x % nx])
            # plane face, both frames + averaging fix
            ub1 = ctx.col_u(u, c + 1, True, c)
            ud0 = ctx.col_u(u, c, False, c)
            fe_c = (upw(cp(c), pcol_b1, 0.5 * (ux(c) + ub1[0]))
                    - M * (mu_b1 - mu[c]))
            fw_c = (upw(pcol_d0, cp(c + 1), 0.5 * (ud0[0] + ux(c + 1)))
                    - M * (mu[cu] - mu_d0))
            fe_fix = 0.5 * (fe_c + sample_linear(fw_c, ctx.dy_field))
            fw_fix = 0.5 * (fw_c + sample_linear(fe_c, -ctx.dy_field))
            fe_x[c] = fe_fix

            phin = {}
            for x in cols_fix:
                p0 = cp(x)
                ufy = 0.5 * (u[1, x] + jnp.roll(u[1, x], -1, -2))
                fy = (upw(p0, jnp.roll(p0, -1, -2), ufy)
                      - M * (jnp.roll(mu[x], -1, -2) - mu[x]))
                ufz = 0.5 * (u[2, x] + jnp.roll(u[2, x], -1, -1))
                fz = (upw(p0, jnp.roll(p0, -1, -1), ufz)
                      - M * (jnp.roll(mu[x], -1, -1) - mu[x]))
                if x == cu:
                    dx = fe_x[c + 1] - fw_fix
                else:
                    xi_ = c - 1 if x == (c - 1) % nx else \
                        (c if x == c else c + 2)
                    dx = fe_x[xi_] - fe_x[xi_ - 1]
                div = (dx + fy - jnp.roll(fy, 1, -2)
                       + fz - jnp.roll(fz, 1, -1))
                phin[x] = p0 - div
                pcols[x] = phin[x]

            # -- force: body part + two-sided stress fluxes ------------
            for x in cols_fix:
                # body force with plain mu stencils (ref:
                # lc_droplet.c:826 kernel_coords_index)
                if x == c:
                    mum, mup = mu[(c - 1) % nx], mu[cu]
                elif x == cu:
                    mum, mup = mu[c], mu[(c + 2) % nx]
                elif x == (c - 1) % nx:
                    mum, mup = mu[(c - 2) % nx], mu[c]
                else:
                    mum, mup = mu[cu], mu[(c + 3) % nx]
                f_ = flds[x]
                dq = dq_tensor(f_["grad_q"])
                hx = h[x]
                comps = []
                gmu = [0.5 * (mup - mum),
                       0.5 * (jnp.roll(mu[x], -1, -2)
                              - jnp.roll(mu[x], 1, -2)),
                       0.5 * (jnp.roll(mu[x], -1, -1)
                              - jnp.roll(mu[x], 1, -1))]
                for a in range(3):
                    v = -f_["phi"] * gmu[a]
                    for b in range(3):
                        for cc in range(3):
                            v = v - hx[b][cc] * dq[a][b][cc]
                    comps.append(v)
                fcols[x] = jnp.stack(comps)

            def yz(p):
                fya = 0.5 * (p[a, 1] + jnp.roll(p[a, 1], -1, -2))
                fza = 0.5 * (p[a, 2] + jnp.roll(p[a, 2], -1, -1))
                return (fya - jnp.roll(fya, 1, -2)
                        + fza - jnp.roll(fza, 1, -1))

            for a in range(3):
                fe_s = {}
                for x in (c - 2, c - 1, c + 1, c + 2):
                    fe_s[x] = 0.5 * (pth[x % nx][a, 0]
                                     + pth[(x + 1) % nx][a, 0])
                fe_cs = 0.5 * (pth[c][a, 0] + pth_b1[a, 0])
                fw_cs = 0.5 * (pth_d0[a, 0] + pth[cu][a, 0])
                corr = jnp.sum(-fe_cs + fw_cs) * (0.5 / area)
                fe_s[c] = fe_cs + corr
                fw_s = fw_cs - corr
                for x in cols_fix:
                    if x == cu:
                        dx = fe_s[c + 1] - fw_s
                    else:
                        xi_ = c - 1 if x == (c - 1) % nx else \
                            (c if x == c else c + 2)
                        dx = fe_s[xi_] - fe_s[xi_ - 1]
                    fcols[x] = fcols[x].at[a].add(
                        -(dx + yz(pth[x])))

            # -- Beris-Edwards at cols_fix -----------------------------
            def col_w(um1x, u0, up1x):
                return [[0.5 * (up1x[a_] - um1x[a_]),
                         0.5 * (jnp.roll(u0[a_], -1, -2)
                                - jnp.roll(u0[a_], 1, -2)),
                         0.5 * (jnp.roll(u0[a_], -1, -1)
                                - jnp.roll(u0[a_], 1, -1))]
                        for a_ in range(3)]

            for x in cols_fix:
                if x == c:
                    w = col_w(u[:, (c - 1) % nx], u[:, c], ub1)
                    fe_hi = upw(cq(c), qcol_b1,
                                0.5 * (ux(c) + ub1[0]))
                    fe_lo = upw(cq(c - 1), cq(c),
                                0.5 * (ux(c - 1) + ux(c)))
                elif x == cu:
                    w = col_w(ud0, u[:, cu], u[:, (c + 2) % nx])
                    fe_hi = upw(cq(c + 1), cq(c + 2),
                                0.5 * (ux(c + 1) + ux(c + 2)))
                    fe_lo = upw(qcol_d0, cq(c + 1),
                                0.5 * (ud0[0] + ux(c + 1)))
                else:
                    w = col_w(u[:, (x - 1) % nx], u[:, x],
                              u[:, (x + 1) % nx])
                    fe_hi = upw(cq(x), cq(x + 1),
                                0.5 * (ux(x) + ux(x + 1)))
                    fe_lo = upw(cq(x - 1), cq(x),
                                0.5 * (ux(x - 1) + ux(x)))
                qc = cq(x)
                ufy = 0.5 * (u[1, x] + jnp.roll(u[1, x], -1, -2))
                fy = upw(qc, jnp.roll(qc, -1, -2), ufy)
                ufz = 0.5 * (u[2, x] + jnp.roll(u[2, x], -1, -1))
                fz = upw(qc, jnp.roll(qc, -1, -1), ufz)
                div = (fe_hi - fe_lo + fy - jnp.roll(fy, 1, -2)
                       + fz - jnp.roll(fz, 1, -1))
                # gamma(phi_new), stale gradients (ref: ludwig.c order)
                fbe = dict(flds[x])
                fbe["phi"] = phin[x]
                hbe = fe.molecular_field(fbe)
                q33 = q5_to_q33(qc)
                s5 = _s5_corotation(q33, w, xi)
                h5 = [hbe[0][0], hbe[0][1], hbe[0][2], hbe[1][1],
                      hbe[1][2]]
                rhs = jnp.stack([gamma * h5[n] + s5[n]
                                 for n in range(5)]) - div
                qcols[x] = qc + rhs
        return pcols, qcols, fcols

    return fix
