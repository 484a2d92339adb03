"""Sheared binary fluid: symmetric FE + Cahn-Hilliard under Lees-Edwards.

TPU-native equivalent of the reference's LE-aware order-parameter
machinery, reproduced at reference precision (ref:
src/field.c:490-596 4-pt Lagrange buffer columns,
src/gradient_3d_7pt_fluid.c grad_3d_7pt_fluid_le buffer gradients,
src/advection.c LE kernels, src/phi_cahn_hilliard.c phi_ch_flux_mu1 and
phi_ch_le_fix_fluxes (plane-face flux averaging),
src/phi_force.c phi_force_flux + phi_force_flux_fix_local (two-sided
stress fluxes with a per-plane mean correction),
src/model_le.c reproject + displace for the distributions).

The cross-plane neighbour values are produced by sampling the real
columns at the time-dependent displacement; the chemical potential and
stress at 'buffer' columns are evaluated from the displaced fields,
exactly as the reference computes them on its buffer region.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ludwig_tpu.binary import BinaryConfig, initial_binary
from ludwig_tpu.ops.collide import collide
from ludwig_tpu.ops.le_ref import (LEContext, le_buffer_fields,
                                   le_gradient, sample_linear)
from ludwig_tpu.ops.lees_edwards import LeesEdwardsConfig, apply_lb_le
from ludwig_tpu.ops.stream import stream


def _yzlap(col):
    """y/z neighbour sum of a (Y, Z) column (for the buffer delsq)."""
    return (jnp.roll(col, -1, 0) + jnp.roll(col, 1, 0)
            + jnp.roll(col, -1, 1) + jnp.roll(col, 1, 1))


def _upwind_face(phi_cols, uf, order):
    """Advective flux through the face between columns 0 and +1, given
    a dict of phi columns by offset (ref: advection.c LE kernels)."""
    if order == 1:
        return uf * jnp.where(uf > 0.0, phi_cols[0], phi_cols[1])
    if order == 2:
        return uf * 0.5 * (phi_cols[0] + phi_cols[1])
    if order == 3:
        a1, a2, a3 = -0.213933, 0.927865, 0.286067
        pos = a1 * phi_cols[-1] + a2 * phi_cols[0] + a3 * phi_cols[1]
        neg = a1 * phi_cols[2] + a2 * phi_cols[1] + a3 * phi_cols[0]
        return uf * jnp.where(uf > 0.0, pos, neg)
    if order == 4:
        a1, a2 = 1.0 / 16.0, 9.0 / 16.0
        return uf * (-a1 * phi_cols[-1] + a2 * phi_cols[0]
                     + a2 * phi_cols[1] - a1 * phi_cols[2])
    if order == 5:
        a = (0.055453, -0.305147, 0.916054, 0.361520, -0.027880)
        pos = (a[0] * phi_cols[-2] + a[1] * phi_cols[-1] + a[2] * phi_cols[0]
               + a[3] * phi_cols[1] + a[4] * phi_cols[2])
        neg = (a[0] * phi_cols[3] + a[1] * phi_cols[2] + a[2] * phi_cols[1]
               + a[3] * phi_cols[0] + a[4] * phi_cols[-1])
        return uf * jnp.where(uf >= 0.0, pos, neg)
    raise ValueError(order)


_STENCIL = {1: (0, 1), 2: (0, 1), 3: (-1, 0, 1, 2), 4: (-1, 0, 1, 2),
            5: (-2, -1, 0, 1, 2, 3)}


@dataclasses.dataclass(frozen=True)
class BinaryLEConfig:
    binary: BinaryConfig
    le: LeesEdwardsConfig


def make_binary_le_step(cfg: BinaryLEConfig, keep_grads: bool = False):
    """Jitted sheared-binary step: (f, phi, u[, noise][, grad, delsq])
    -> (state, rho).  keep_grads stores the start-of-step gradients for
    the statistics (the reference's stale-gradient convention).

    Works for the symmetric FE (level-2 gradients) and Brazovskii
    (level-4: the chemical potential and stress also need delsq_delsq
    and grad_delsq, computed with the reference's two-pass LE scheme,
    le_ref.le_fields_2d5pt_d4).  With isothermal fluctuations on, the
    f-collision takes the KISS stress/ghost noise (ref: collision.c
    noise branch) and the state carries the per-site noise state."""
    bcfg = cfg.binary
    params = bcfg.lb.collision_params()
    model = bcfg.lb.model
    le = cfg.le
    fe = bcfg.fe
    M = bcfg.mobility
    order = bcfg.advection_order
    nx = le.nx
    braz = type(fe).__name__ == "BrazovskiiFE"
    nz = bcfg.lb.noise
    kiss_rho = nz is not None and nz.kiss and nz.rho

    def mu_of(phi0, delsq0, d4=None):
        fl = {"phi": phi0, "delsq_phi": delsq0}
        if braz:
            fl["delsq_delsq_phi"] = d4
        return fe.mu(fl)

    def pth_of(phi0, grad0, delsq0, gd2=None, d4=None):
        fl = {"phi": phi0, "grad_phi": grad0, "delsq_phi": delsq0}
        if braz:
            fl["grad_delsq_phi"] = gd2
            fl["delsq_delsq_phi"] = d4
        return fe.stress(fl)

    @partial(jax.jit, donate_argnums=0)
    def step(state, t=0):
        if keep_grads:
            state = state[:-2]
        nstate = state[3] if kiss_rho else None
        f, phi, u = state[:3]
        ctx = LEContext(le, t, phi.dtype)

        if braz:
            from ludwig_tpu.ops.le_ref import (le_fields_27pt_d4,
                                               le_fields_2d5pt_d4)
            d4_fields = (le_fields_27pt_d4
                         if bcfg.gradient == "3d_27pt_fluid"
                         else le_fields_2d5pt_d4)
            grad, delsq, gd2, d4, bufs4 = d4_fields(phi, le, t)
            mu = mu_of(phi, delsq, d4)
            pth = pth_of(phi, grad, delsq, gd2, d4)
        else:
            grad, delsq = le_gradient(phi, le, t, bcfg.gradient)
            mu = mu_of(phi, delsq)
            pth = pth_of(phi, grad, delsq)

        # -- per-plane buffer-frame columns --------------------------------
        buf = []
        for c in ctx.cols:
            cu = (c + 1) % nx
            if braz:
                pb1, grad_b1, dsq_b1, gd2_b1, d4_b1 = bufs4[c]["b1"]
                pd0, grad_d0, dsq_d0, gd2_d0, d4_d0 = bufs4[c]["d0"]
                mu_b1 = mu_of(pb1, dsq_b1, d4_b1)
                pth_b1 = pth_of(pb1, grad_b1, dsq_b1, gd2_b1, d4_b1)
                mu_d0 = mu_of(pd0, dsq_d0, d4_d0)
                pth_d0 = pth_of(pd0, grad_d0, dsq_d0, gd2_d0, d4_d0)
            else:
                # looking up (lower frame): buffer column c+1
                pb1, grad_b1, dsq_b1 = le_buffer_fields(phi, ctx, c, True,
                                                        bcfg.gradient)
                mu_b1 = mu_of(pb1, dsq_b1)
                pth_b1 = pth_of(pb1, grad_b1, dsq_b1)
                # looking down (upper frame): buffer column c
                pd0, grad_d0, dsq_d0 = le_buffer_fields(phi, ctx, c,
                                                        False,
                                                        bcfg.gradient)
                mu_d0 = mu_of(pd0, dsq_d0)
                pth_d0 = pth_of(pd0, grad_d0, dsq_d0)
            u_b1 = ctx.col_u(u, c + 1, True, c)
            u_d0 = ctx.col_u(u, c, False, c)
            buf.append(dict(c=c, cu=cu, mu_b1=mu_b1,
                            pth_b1=pth_b1, u_b1=u_b1,
                            mu_d0=mu_d0, pth_d0=pth_d0, u_d0=u_d0))

        # -- Cahn-Hilliard fluxes -------------------------------------------
        # periodic east fluxes everywhere, then fix plane neighbourhoods
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
            # lower-frame faces x -> x+1 for x in [c-span+1, c]
            for x in range(c - span + 1, c + 1):
                cols = col_stack(x, True, c)
                uu = 0.5 * (ctx.col_u(u, x, True, c)[0]
                            + ctx.col_u(u, x + 1, True, c)[0])
                mu0 = mu[x % nx] if x <= c else b["mu_b1"]
                mu1 = b["mu_b1"] if x + 1 == c + 1 else mu[(x + 1) % nx]
                fx = _upwind_face(cols, uu, order) - M * (mu1 - mu0)
                fe_x = fe_x.at[x % nx].set(fx)
            # upper-frame faces x -> x+1 for x in [c+1, c+span-1]
            # (the face at x = c is the plane face, handled as fw below)
            for x in range(c + 1, c + span):
                cols = col_stack(x, False, c)
                uu = 0.5 * (ctx.col_u(u, x, False, c)[0]
                            + ctx.col_u(u, x + 1, False, c)[0])
                mu0 = mu[x % nx]
                mu1 = mu[(x + 1) % nx]
                fx = _upwind_face(cols, uu, order) - M * (mu1 - mu0)
                fe_x = fe_x.at[x % nx].set(fx)
            # the plane face from the upper side (fw of column c+1)
            cols = col_stack(c, False, c)
            uu = 0.5 * (b["u_d0"][0] + ctx.col_u(u, c + 1, False, c)[0])
            fw = _upwind_face(cols, uu, order) - M * (mu[cu] - b["mu_d0"])
            # average fix (ref: phi_ch_le_fix_fluxes)
            fe_c = fe_x[c]
            fe_fix = 0.5 * (fe_c + sample_linear(fw, ctx.dy_field))
            fw_fix = 0.5 * (fw + sample_linear(fe_c, -ctx.dy_field))
            b["fe_fix"] = fe_fix
            b["fw_fix"] = fw_fix
            fe_x = fe_x.at[c].set(fe_fix)

        ufy = 0.5 * (u[1] + jnp.roll(u[1], -1, 1))
        ufz = 0.5 * (u[2] + jnp.roll(u[2], -1, 2))
        ycols = {d: jnp.roll(phi, -d, 1) for d in _STENCIL[order]}
        zcols = {d: jnp.roll(phi, -d, 2) for d in _STENCIL[order]}
        fy = _upwind_face(ycols, ufy, order) - M * (jnp.roll(mu, -1, 1) - mu)
        fz = _upwind_face(zcols, ufz, order) - M * (jnp.roll(mu, -1, 2) - mu)

        div = (fe_x - jnp.roll(fe_x, 1, 0) + fy - jnp.roll(fy, 1, 1)
               + fz - jnp.roll(fz, 1, 2))
        for b in buf:
            cu = b["cu"]
            div = div.at[cu].set(fe_x[cu] - b["fw_fix"]
                                 + (fy - jnp.roll(fy, 1, 1))[cu]
                                 + (fz - jnp.roll(fz, 1, 2))[cu])
        phi_new = phi - div

        # -- force: two-sided stress fluxes (ref: phi_force_flux) ------------
        area = float(np.prod(phi.shape[1:]))
        comps = []
        fluxe = {}
        for a in range(3):
            fea = 0.5 * (pth[a, 0] + xs(pth[a, 0], 1))
            fluxe[a] = fea
        # plane-face values + mean fix
        for b in buf:
            c, cu = b["c"], b["cu"]
            for a in range(3):
                fe_c = 0.5 * (pth[a, 0][c] + b["pth_b1"][a, 0])
                fw_c = 0.5 * (b["pth_d0"][a, 0] + pth[a, 0][cu])
                corr = jnp.sum(-fe_c + fw_c) * (0.5 / area)
                b[f"fe{a}"] = fe_c + corr
                b[f"fw{a}"] = fw_c - corr
                fluxe[a] = fluxe[a].at[c].set(b[f"fe{a}"])
        for a in range(3):
            fya = 0.5 * (pth[a, 1] + jnp.roll(pth[a, 1], -1, 1))
            fza = 0.5 * (pth[a, 2] + jnp.roll(pth[a, 2], -1, 2))
            d = (fluxe[a] - jnp.roll(fluxe[a], 1, 0)
                 + fya - jnp.roll(fya, 1, 1) + fza - jnp.roll(fza, 1, 2))
            for b in buf:
                cu = b["cu"]
                d = d.at[cu].set(fluxe[a][cu] - b[f"fw{a}"]
                                 + (fya - jnp.roll(fya, 1, 1))[cu]
                                 + (fza - jnp.roll(fza, 1, 2))[cu])
            comps.append(-d)
        force = jnp.stack(comps).astype(f.dtype)

        # -- LB update --------------------------------------------------------
        if kiss_rho:
            from ludwig_tpu.lb import _noise_terms
            shat, ghat, nstate2 = _noise_terms(bcfg.lb, params, t,
                                               nstate=nstate)
        else:
            shat = ghat = nstate2 = None
        f, rho, u_new = collide(f, params, force=force,
                                shat=shat, ghat=ghat)
        f = apply_lb_le(f, model, le, t)
        f = stream(f, model)

        out = (f, phi_new, u_new)
        if kiss_rho:
            out = out + (nstate2,)
        if keep_grads:
            out = out + (grad, delsq)
        return out, rho

    return step


def make_binary_le_nstep(cfg: BinaryLEConfig):
    step = make_binary_le_step(cfg)

    @partial(jax.jit, static_argnums=1, donate_argnums=0)
    def nstep(state, n, t0=0):
        def body(s, t):
            s, _ = step(s, t)
            return s, ()
        state, _ = jax.lax.scan(body, state, t0 + jnp.arange(n))
        return state

    return nstep


def make_binary_le_column_fix(cfg: BinaryLEConfig):
    """Column corrections turning the PLAIN-periodic fused binary
    outputs into the Lees-Edwards-aware ones.

    The fused kernels (ops/fused_binary.py) treat x as plain periodic;
    under LE shear only plane-adjacent columns differ.  Because the CH
    flux carries -M grad(mu) and mu is LE-aware at {c, c+1}, both
    phi' and force differ at {c-1, c, c+1, c+2} per plane (order 1-2
    advection, 7-pt gradients).  This recomputes exactly those columns
    with the make_binary_le_step formulas (ref: phi_ch_flux_mu1 +
    phi_ch_le_fix_fluxes averaging, phi_force_flux + fix_local,
    gradient_3d_7pt_fluid _le) as O(nplanes * Y * Z) slab work.

    Returns fix(phi, u, t) -> (pcols, fcols): dicts of corrected
    columns {col: (Y, Z)} / {col: (3, Y, Z)}.  phi/u are step INPUTS.
    """
    bcfg = cfg.binary
    le = cfg.le
    fe = bcfg.fe
    M = bcfg.mobility
    order = bcfg.advection_order
    nx = le.nx
    if order not in (1, 2) or bcfg.gradient != "3d_7pt_fluid":
        raise ValueError("fused LE fix needs order 1-2 advection and "
                         "3d_7pt_fluid gradients")
    if nx < 6 * le.nplanes:
        raise ValueError("fused LE fix needs plane separation >= 6")

    def mu_of(phi0, delsq0):
        return fe.mu({"phi": phi0, "delsq_phi": delsq0})

    def pth_of(phi0, grad0, delsq0):
        return fe.stress({"phi": phi0, "grad_phi": grad0,
                          "delsq_phi": delsq0})

    def col_grad7(pm1, p0, pp1):
        yp, ym = jnp.roll(p0, -1, -2), jnp.roll(p0, 1, -2)
        zp, zm = jnp.roll(p0, -1, -1), jnp.roll(p0, 1, -1)
        grad = jnp.stack([0.5 * (pp1 - pm1), 0.5 * (yp - ym),
                          0.5 * (zp - zm)])
        d2 = pp1 + pm1 + yp + ym + zp + zm - 6.0 * p0
        return grad, d2

    def fix(phi, u, t):
        ctx = LEContext(le, t, phi.dtype)
        area = float(np.prod(phi.shape[1:]))
        pcols, fcols = {}, {}

        def cp(j):
            return phi[j % nx]

        def cu0(j):
            return u[0, j % nx]

        for c in ctx.cols:
            cup = (c + 1) % nx
            pb1, grad_b1, dsq_b1 = le_buffer_fields(phi, ctx, c, True,
                                                    bcfg.gradient)
            pd0, grad_d0, dsq_d0 = le_buffer_fields(phi, ctx, c, False,
                                                    bcfg.gradient)
            mu_b1 = mu_of(pb1, dsq_b1)
            pth_b1 = pth_of(pb1, grad_b1, dsq_b1)
            mu_d0 = mu_of(pd0, dsq_d0)
            pth_d0 = pth_of(pd0, grad_d0, dsq_d0)
            u_b1 = ctx.col_u(u, c + 1, True, c)
            u_d0 = ctx.col_u(u, c, False, c)

            # mu / pth at the LE columns and the plain flanks
            g_c, d_c = col_grad7(cp(c - 1), cp(c), pb1)
            g_u, d_u = col_grad7(pd0, cp(cup), cp(c + 2))
            mu_le = {c: mu_of(cp(c), d_c), c + 1: mu_of(cp(cup), d_u)}
            pth_le = {c: pth_of(cp(c), g_c, d_c),
                      c + 1: pth_of(cp(cup), g_u, d_u)}
            mu_p, pth_p = {}, {}
            for x in (c - 2, c - 1, c + 2, c + 3):
                g_x, d_x = col_grad7(cp(x - 1), cp(x), cp(x + 1))
                mu_p[x] = mu_of(cp(x), d_x)
                pth_p[x] = pth_of(cp(x), g_x, d_x)

            def mu_at(x):
                return mu_le[x] if x in mu_le else mu_p[x]

            # ---- CH x-faces c-2 .. c+2 -------------------------------
            def plain_face(x):
                uf = 0.5 * (cu0(x) + cu0(x + 1))
                return (_upwind_face({0: cp(x), 1: cp(x + 1)}, uf, order)
                        - M * (mu_at(x + 1) - mu_at(x)))

            fe_cm2 = plain_face(c - 2)
            fe_cm1 = plain_face(c - 1)
            # plane face, lower frame
            uu = 0.5 * (cu0(c) + u_b1[0])
            fe_c = (_upwind_face({0: cp(c), 1: pb1}, uu, order)
                    - M * (mu_b1 - mu_le[c]))
            # plane face, upper frame
            uu = 0.5 * (u_d0[0] + cu0(c + 1))
            fw = (_upwind_face({0: pd0, 1: cp(cup)}, uu, order)
                  - M * (mu_le[c + 1] - mu_d0))
            fe_fix = 0.5 * (fe_c + sample_linear(fw, ctx.dy_field))
            fw_fix = 0.5 * (fw + sample_linear(fe_c, -ctx.dy_field))
            fe_cp1 = plain_face(c + 1)
            fe_cp2 = plain_face(c + 2)

            # y/z fluxes at the four fix columns
            def yzdiv(x):
                pc, mc = cp(x), mu_at(x)
                uy = 0.5 * (u[1, x % nx] + jnp.roll(u[1, x % nx], -1, -2))
                uz = 0.5 * (u[2, x % nx] + jnp.roll(u[2, x % nx], -1, -1))
                fy = (_upwind_face({0: pc, 1: jnp.roll(pc, -1, -2)},
                                   uy, order)
                      - M * (jnp.roll(mc, -1, -2) - mc))
                fz = (_upwind_face({0: pc, 1: jnp.roll(pc, -1, -1)},
                                   uz, order)
                      - M * (jnp.roll(mc, -1, -1) - mc))
                return (fy - jnp.roll(fy, 1, -2)
                        + fz - jnp.roll(fz, 1, -1))

            pcols[(c - 1) % nx] = cp(c - 1) - (fe_cm1 - fe_cm2
                                               + yzdiv(c - 1))
            pcols[c % nx] = cp(c) - (fe_fix - fe_cm1 + yzdiv(c))
            pcols[cup] = cp(cup) - (fe_cp1 - fw_fix + yzdiv(c + 1))
            pcols[(c + 2) % nx] = cp(c + 2) - (fe_cp2 - fe_cp1
                                               + yzdiv(c + 2))

            # ---- force at {c-1, c, c+1, c+2} (ref: phi_force_flux) ---
            def pth_at(x):
                return pth_le[x] if x in pth_le else pth_p[x]

            rows = {x: [] for x in (c - 1, c, c + 1, c + 2)}
            for a in range(3):

                def yz(p):
                    fya = 0.5 * (p[a, 1] + jnp.roll(p[a, 1], -1, 0))
                    fza = 0.5 * (p[a, 2] + jnp.roll(p[a, 2], -1, 1))
                    return (fya - jnp.roll(fya, 1, 0)
                            + fza - jnp.roll(fza, 1, 1))

                fe_ca = 0.5 * (pth_le[c][a, 0] + pth_b1[a, 0])
                fw_ca = 0.5 * (pth_d0[a, 0] + pth_le[c + 1][a, 0])
                corr = jnp.sum(-fe_ca + fw_ca) * (0.5 / area)
                fea = {
                    c - 2: 0.5 * (pth_p[c - 2][a, 0]
                                  + pth_p[c - 1][a, 0]),
                    c - 1: 0.5 * (pth_p[c - 1][a, 0] + pth_le[c][a, 0]),
                    c: fe_ca + corr,
                    c + 1: 0.5 * (pth_le[c + 1][a, 0]
                                  + pth_p[c + 2][a, 0]),
                    c + 2: 0.5 * (pth_p[c + 2][a, 0]
                                  + pth_p[c + 3][a, 0]),
                }
                fw_fa = fw_ca - corr
                rows[c - 1].append(-(fea[c - 1] - fea[c - 2]
                                     + yz(pth_p[c - 1])))
                rows[c].append(-(fea[c] - fea[c - 1] + yz(pth_le[c])))
                rows[c + 1].append(-(fea[c + 1] - fw_fa
                                     + yz(pth_le[c + 1])))
                rows[c + 2].append(-(fea[c + 2] - fea[c + 1]
                                     + yz(pth_p[c + 2])))
            for x, rr in rows.items():
                fcols[x % nx] = jnp.stack(rr)
        return pcols, fcols

    return fix
