"""Reference-exact Lees-Edwards machinery for finite-difference fields.

TPU-native equivalent of the reference LE buffer system (ref:
src/leesedwards.c buffer tables, src/field.c:490-596 field_leesedwards
4-point Lagrange interpolation, src/hydro.c hydro_lees_edwards linear
interpolation with +/-uy frame jump, src/gradient_3d_7pt_fluid.c
grad_3d_7pt_fluid_le buffer-column chains, src/phi_cahn_hilliard.c
phi_ch_le_fix_fluxes plane-face flux averaging, src/phi_force.c
phi_force_flux + phi_force_flux_fix_local).

Instead of materialising buffer columns, cross-plane x-neighbour values
are produced on demand by sampling the real column with the appropriate
time-dependent y displacement:

  field values : 4-pt Lagrange at dy = +/- uy (t-1)   (t0 = 0)
  hydro u      : linear at dy = +/- uy t, +/- uy jump on u_y (t0 = 1)
  fluxes (fix) : linear at dy = +/- uy (t-1)
  distributions: linear at dy = +/- uy t  (ops.lees_edwards.apply_lb_le)

All time conventions follow physics_control_time = t-1 /
physics_control_timestep = t for step t.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ludwig_tpu.ops.lees_edwards import LeesEdwardsConfig


def sample_cubic(col: jnp.ndarray, dy) -> jnp.ndarray:
    """4-point Lagrange sample of a (..., Y, Z) column at displacement
    dy in the reference's convention (ref: field.c:552-586)."""
    ny = col.shape[-2]
    dy = jnp.mod(dy, ny)
    jdy = jnp.floor(dy)
    fr = 1.0 - (dy - jdy)
    j = jdy.astype(jnp.int32)
    f0 = jnp.roll(col, j + 2, axis=-2)   # col[y - jdy - 2]
    f1 = jnp.roll(col, j + 1, axis=-2)
    f2 = jnp.roll(col, j, axis=-2)
    f3 = jnp.roll(col, j - 1, axis=-2)
    r6 = 1.0 / 6.0
    return (-r6 * fr * (fr - 1.0) * (fr - 2.0) * f0
            + 0.5 * (fr * fr - 1.0) * (fr - 2.0) * f1
            - 0.5 * fr * (fr + 1.0) * (fr - 2.0) * f2
            + r6 * fr * (fr * fr - 1.0) * f3)


def sample_linear(col: jnp.ndarray, dy) -> jnp.ndarray:
    """Linear sample at displacement dy (ref: hydro.c:545-556,
    phi_cahn_hilliard.c flux fix): fr*col[y-jdy-1] + (1-fr)*col[y-jdy]."""
    ny = col.shape[-2]
    dy = jnp.mod(dy, ny)
    jdy = jnp.floor(dy)
    fr = dy - jdy
    j = jdy.astype(jnp.int32)
    f1 = jnp.roll(col, j + 1, axis=-2)
    f2 = jnp.roll(col, j, axis=-2)
    return fr * f1 + (1.0 - fr) * f2


class LEContext:
    """Per-timestep Lees-Edwards sampling helper (all planes share the
    same displacement since all planes move at uy)."""

    def __init__(self, cfg: LeesEdwardsConfig, t, dtype=jnp.float64):
        self.cfg = cfg
        tt = jnp.asarray(t, dtype)
        # the reference clamps negative times to zero (initialisation;
        # ref: lees_edw_buffer_displacement "if (t < 0.0) t = 0.0")
        self.dy_field = cfg.displacement(jnp.maximum(tt - 1.0, 0.0))
        self.dy_hydro = cfg.displacement(tt)
        self.uy_now = cfg.uy_now(tt)
        self.uy_jump = cfg.uy        # steady frame jump (buffer_du)
        self.cols = cfg.plane_cols   # column just below each plane
        self.nx = cfg.nx

    # -- frame-aware column fetch ---------------------------------------

    def col_field(self, field, j: int, frame_lo: bool, c: int):
        """Column j (0-based, may wrap) of `field` as seen from the
        lower (frame_lo) or upper side of the plane after column c."""
        jj = j % self.nx
        ax = field.ndim - 3
        col = jnp.take(field, jj, axis=ax)
        if frame_lo and j > c:
            return sample_cubic(col, self.dy_field)
        if (not frame_lo) and j <= c:
            return sample_cubic(col, -self.dy_field)
        return col

    def col_u(self, u, j: int, frame_lo: bool, c: int):
        """Velocity column with the +/-uy frame jump on u_y
        (ref: hydro_lees_edwards, ule)."""
        jj = j % self.nx
        col = u[:, jj]
        if frame_lo and j > c:
            col = sample_linear(col, self.dy_hydro)
            return col.at[1].add(self.uy_jump)
        if (not frame_lo) and j <= c:
            col = sample_linear(col, -self.dy_hydro)
            return col.at[1].add(-self.uy_jump)
        return col


def _colroll(col, dy_, dz_):
    """Neighbour fetch within a (Y, Z) column."""
    out = col
    if dy_:
        out = jnp.roll(out, -dy_, axis=-2)
    if dz_:
        out = jnp.roll(out, -dz_, axis=-1)
    return out


def le_gradient_27pt(phi, cfg: LeesEdwardsConfig, t):
    """27-point gradient/Laplacian with LE-aware plane columns
    (ref: gradient_3d_27pt_fluid.c + its _le correction)."""
    from ludwig_tpu.ops.stencil import _grad27_terms, roll3
    ctx = LEContext(cfg, t, phi.dtype)
    nx = ctx.nx

    def v_full(dx, dy_, dz_):
        return roll3(phi, (-dx, -dy_, -dz_), first_axis=phi.ndim - 3)

    gx, gy, gz, d2 = _grad27_terms(v_full, phi)
    grad = jnp.stack([gx, gy, gz])
    for c in ctx.cols:
        cu = (c + 1) % nx
        pb1 = ctx.col_field(phi, c + 1, True, c)
        pd0 = ctx.col_field(phi, c, False, c)
        colm = {(-1): jnp.take(phi, (c - 1) % nx, axis=phi.ndim - 3),
                0: jnp.take(phi, c, axis=phi.ndim - 3), 1: pb1}

        def v_lo(dx, dy_, dz_):
            return _colroll(colm[dx], dy_, dz_)

        gxc, gyc, gzc, d2c = _grad27_terms(v_lo, colm[0])
        ax = phi.ndim - 3
        grad = _set_col(grad, 1 + ax, c, jnp.stack([gxc, gyc, gzc]))
        d2 = _set_col(d2, ax, c, d2c)
        colp = {(-1): pd0,
                0: jnp.take(phi, cu, axis=phi.ndim - 3),
                1: jnp.take(phi, (c + 2) % nx, axis=phi.ndim - 3)}

        def v_hi(dx, dy_, dz_):
            return _colroll(colp[dx], dy_, dz_)

        gxc, gyc, gzc, d2c = _grad27_terms(v_hi, colp[0])
        grad = _set_col(grad, 1 + ax, cu, jnp.stack([gxc, gyc, gzc]))
        d2 = _set_col(d2, ax, cu, d2c)
    return grad, d2


def _set_col(arr, xaxis, c, val):
    """arr[..., c(x-axis), :, :] = val."""
    m = jnp.moveaxis(arr, xaxis, 0)
    m = m.at[c].set(val)
    return jnp.moveaxis(m, 0, xaxis)


def le_gradient(phi, cfg: LeesEdwardsConfig, t, gradient="3d_7pt_fluid"):
    if gradient == "3d_27pt_fluid":
        return le_gradient_27pt(phi, cfg, t)
    return le_gradient_7pt(phi, cfg, t)


def le_buffer_fields(phi, ctx: LEContext, c: int, up: bool,
                     gradient="3d_7pt_fluid"):
    """(phi_b, grad_b, delsq_b) at the buffer column adjacent to the
    plane after column c: the displaced column with gradients computed
    through the buffer chain (ref: grad_3d_*_fluid_le, nh=1)."""
    nx = ctx.nx
    if up:
        colm = {(-1): jnp.take(phi, c, axis=phi.ndim - 3),
                0: ctx.col_field(phi, c + 1, True, c),
                1: ctx.col_field(phi, c + 2, True, c)}
    else:
        colm = {(-1): ctx.col_field(phi, c - 1, False, c),
                0: ctx.col_field(phi, c, False, c),
                1: jnp.take(phi, (c + 1) % nx, axis=phi.ndim - 3)}
    if gradient == "3d_27pt_fluid":
        from ludwig_tpu.ops.stencil import _grad27_terms

        def v(dx, dy_, dz_):
            return _colroll(colm[dx], dy_, dz_)

        gx, gy, gz, d2 = _grad27_terms(v, colm[0])
        return colm[0], jnp.stack([gx, gy, gz]), d2
    p0 = colm[0]
    yp, ym = _colroll(p0, 1, 0), _colroll(p0, -1, 0)
    zp, zm = _colroll(p0, 0, 1), _colroll(p0, 0, -1)
    grad = jnp.stack([0.5 * (colm[1] - colm[-1]),
                      0.5 * (yp - ym), 0.5 * (zp - zm)])
    d2 = colm[1] + colm[-1] + yp + ym + zp + zm - 6.0 * p0
    return p0, grad, d2


def _dab_from_cols(colm):
    """d_a d_b tensor (3, 3, Y, Z) of the column colm[0] from its
    x-neighbour columns colm[-1], colm[1] (7-pt dab stencil: central
    second differences on the diagonal, cross differences off it;
    same arithmetic as ops.stencil.dab_7pt)."""

    def v(dx, dy_, dz_):
        return _colroll(colm[dx], dy_, dz_)

    p0 = colm[0]
    offs = ((1, 0, 0), (0, 1, 0), (0, 0, 1))
    rows = [[None] * 3 for _ in range(3)]
    for a in range(3):
        oa = offs[a]
        rows[a][a] = v(*oa) - 2.0 * p0 + v(*[-x for x in oa])
        for b in range(a + 1, 3):
            ob = offs[b]
            pp = v(*[oa[i] + ob[i] for i in range(3)])
            pm = v(*[oa[i] - ob[i] for i in range(3)])
            mp = v(*[ob[i] - oa[i] for i in range(3)])
            mm = v(*[-(oa[i] + ob[i]) for i in range(3)])
            rows[a][b] = 0.25 * (pp - pm - mp + mm)
            rows[b][a] = rows[a][b]
    return jnp.stack([jnp.stack(r) for r in rows])


def le_dab_7pt(phi, cfg: LeesEdwardsConfig, t):
    """Second-derivative tensor d_a d_b phi with LE-aware x neighbours
    at the plane columns (ref: grad_3d_7pt_dab_compute +
    grad_3d_7pt_dab_le_correct)."""
    from ludwig_tpu.ops.stencil import dab_7pt
    ctx = LEContext(cfg, t, phi.dtype)
    nx = ctx.nx
    dab = dab_7pt(phi)
    for c in ctx.cols:
        cu = (c + 1) % nx
        # column c sees its x+1 neighbour through the lower-frame
        # buffer; column c+1 sees x-1 through the upper-frame buffer
        colm_lo = {-1: jnp.take(phi, (c - 1) % nx, axis=phi.ndim - 3),
                   0: jnp.take(phi, c, axis=phi.ndim - 3),
                   1: ctx.col_field(phi, c + 1, True, c)}
        dab = _set_col(dab, 2 + (phi.ndim - 3), c,
                       _dab_from_cols(colm_lo))
        colm_hi = {-1: ctx.col_field(phi, c, False, c),
                   0: jnp.take(phi, cu, axis=phi.ndim - 3),
                   1: jnp.take(phi, (c + 2) % nx, axis=phi.ndim - 3)}
        dab = _set_col(dab, 2 + (phi.ndim - 3), cu,
                       _dab_from_cols(colm_hi))
    return dab


def le_buffer_dab(phi, ctx: LEContext, c: int, up: bool):
    """dab at the buffer column adjacent to the plane after column c
    (the dab analogue of le_buffer_fields' gradient chain)."""
    nx = ctx.nx
    if up:
        colm = {-1: jnp.take(phi, c, axis=phi.ndim - 3),
                0: ctx.col_field(phi, c + 1, True, c),
                1: ctx.col_field(phi, c + 2, True, c)}
    else:
        colm = {-1: ctx.col_field(phi, c - 1, False, c),
                0: ctx.col_field(phi, c, False, c),
                1: jnp.take(phi, (c + 1) % nx, axis=phi.ndim - 3)}
    return _dab_from_cols(colm)


_ADV_STENCIL = {1: (0, 1), 2: (0, 1), 3: (-1, 0, 1, 2), 4: (-1, 0, 1, 2),
                5: (-2, -1, 0, 1, 2, 3)}


def upwind_face(phi_cols, uf, order):
    """Advective flux through the face between columns 0 and +1, given
    a dict of field columns by offset (ref: advection.c kernels; the
    coefficient/branch structure matches each order exactly)."""
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
        pos = (a[0] * phi_cols[-2] + a[1] * phi_cols[-1]
               + a[2] * phi_cols[0] + a[3] * phi_cols[1]
               + a[4] * phi_cols[2])
        neg = (a[0] * phi_cols[3] + a[1] * phi_cols[2] + a[2] * phi_cols[1]
               + a[3] * phi_cols[0] + a[4] * phi_cols[-1])
        return uf * jnp.where(uf >= 0.0, pos, neg)
    raise ValueError(order)


def le_advective_fluxes(field, u, ctx: LEContext, order: int):
    """(fe_x, fw_planes, fy, fz): LE-aware advective face fluxes of a
    (..., X, Y, Z) field (ref: advection.c LE kernels).  fe_x holds the
    east fluxes with the plane faces evaluated from the lower frame;
    fw_planes[c] is the plane face evaluated from the upper frame (the
    advflux fw of column c+1)."""
    ax = field.ndim - 3
    nx = ctx.nx

    def xs(x, d):
        return jnp.roll(x, -d, axis=x.ndim - 3)

    ufx = 0.5 * (u[0] + jnp.roll(u[0], -1, 0))
    cols = {d: xs(field, d) for d in _ADV_STENCIL[order]}
    fe_x = upwind_face(cols, ufx, order)
    span = max(_ADV_STENCIL[order])
    fw_planes = {}

    def fcol(j, lo, c):
        return {d: ctx.col_field(field, j + d, lo, c)
                for d in _ADV_STENCIL[order]}

    fe_m = jnp.moveaxis(fe_x, ax, 0)
    for c in ctx.cols:
        for x in range(c - span + 1, c + 1):      # lower frame faces
            cstack = fcol(x, True, c)
            uu = 0.5 * (ctx.col_u(u, x, True, c)[0]
                        + ctx.col_u(u, x + 1, True, c)[0])
            fe_m = fe_m.at[x % nx].set(upwind_face(cstack, uu, order))
        for x in range(c + 1, c + span):          # upper frame faces
            cstack = fcol(x, False, c)
            uu = 0.5 * (ctx.col_u(u, x, False, c)[0]
                        + ctx.col_u(u, x + 1, False, c)[0])
            fe_m = fe_m.at[x % nx].set(upwind_face(cstack, uu, order))
        cstack = fcol(c, False, c)                # plane face, upper frame
        uu = 0.5 * (ctx.col_u(u, c, False, c)[0]
                    + ctx.col_u(u, c + 1, False, c)[0])
        fw_planes[c] = upwind_face(cstack, uu, order)
    fe_x = jnp.moveaxis(fe_m, 0, ax)

    ufy = 0.5 * (u[1] + jnp.roll(u[1], -1, 1))
    ufz = 0.5 * (u[2] + jnp.roll(u[2], -1, 2))
    ycols = {d: jnp.roll(field, -d, ax + 1) for d in _ADV_STENCIL[order]}
    zcols = {d: jnp.roll(field, -d, ax + 2) for d in _ADV_STENCIL[order]}
    fy = upwind_face(ycols, ufy, order)
    fz = upwind_face(zcols, ufz, order)
    return fe_x, fw_planes, fy, fz


def le_flux_divergence(fe_x, fw_planes, fy, fz, ctx: LEContext):
    """div at each site with the separate west flux at plane+1 columns
    (no averaging fix; ref: beris_edwards update divergence)."""
    ax = fe_x.ndim - 3
    div = (fe_x - jnp.roll(fe_x, 1, ax) + fy - jnp.roll(fy, 1, ax + 1)
           + fz - jnp.roll(fz, 1, ax + 2))
    for c, fw in fw_planes.items():
        cu = (c + 1) % ctx.nx
        dm = jnp.moveaxis(div, ax, 0)
        fe_m = jnp.moveaxis(fe_x, ax, 0)
        rest = (jnp.moveaxis(fy - jnp.roll(fy, 1, ax + 1), ax, 0)[cu]
                + jnp.moveaxis(fz - jnp.roll(fz, 1, ax + 2), ax, 0)[cu])
        dm = dm.at[cu].set(fe_m[cu] - fw + rest)
        div = jnp.moveaxis(dm, 0, ax)
    return div


def le_stress_force(pth, plane_bufs, ctx: LEContext, area: float):
    """Force = -div(pth) with two-sided plane fluxes and the per-plane
    mean correction (ref: phi_force_flux + phi_force_flux_fix_local).

    plane_bufs: {c: (pth_b1, pth_d0)} column stress tensors (3,3,Y,Z)
    evaluated at the up/down buffer columns."""
    comps = []
    for a in range(3):
        fea = 0.5 * (pth[a, 0] + jnp.roll(pth[a, 0], -1, 0))
        fixes = {}
        for c, (pth_b1, pth_d0) in plane_bufs.items():
            cu = (c + 1) % ctx.nx
            fe_c = 0.5 * (pth[a, 0][c] + pth_b1[a, 0])
            fw_c = 0.5 * (pth_d0[a, 0] + pth[a, 0][cu])
            corr = jnp.sum(-fe_c + fw_c) * (0.5 / area)
            fea = fea.at[c].set(fe_c + corr)
            fixes[c] = fw_c - corr
        fya = 0.5 * (pth[a, 1] + jnp.roll(pth[a, 1], -1, 1))
        fza = 0.5 * (pth[a, 2] + jnp.roll(pth[a, 2], -1, 2))
        d = (fea - jnp.roll(fea, 1, 0) + fya - jnp.roll(fya, 1, 1)
             + fza - jnp.roll(fza, 1, 2))
        for c, fw_fix in fixes.items():
            cu = (c + 1) % ctx.nx
            d = d.at[cu].set(fea[cu] - fw_fix
                             + (fya - jnp.roll(fya, 1, 1))[cu]
                             + (fza - jnp.roll(fza, 1, 2))[cu])
        comps.append(-d)
    return jnp.stack(comps)


def le_gradient_7pt(phi, cfg: LeesEdwardsConfig, t):
    """grad (3,...,X,Y,Z) and delsq with LE-aware x neighbours at the
    plane columns (ref: grad_3d_7pt_fluid_operator + _le)."""
    ctx = LEContext(cfg, t, phi.dtype)
    ax = phi.ndim - 3

    def sh(x, d, a):
        return jnp.roll(x, -d, axis=ax + a)

    xp, xm = sh(phi, 1, 0), sh(phi, -1, 0)
    yp, ym = sh(phi, 1, 1), sh(phi, -1, 1)
    zp, zm = sh(phi, 1, 2), sh(phi, -1, 2)
    # plane-column corrections
    for c in ctx.cols:
        cu = (c + 1) % ctx.nx
        up = ctx.col_field(phi, c + 1, True, c)
        dn = ctx.col_field(phi, c, False, c)
        xp = jnp.moveaxis(jnp.moveaxis(xp, ax, 0).at[c].set(up), 0, ax)
        xm = jnp.moveaxis(jnp.moveaxis(xm, ax, 0).at[cu].set(dn), 0, ax)
    grad = jnp.stack([0.5 * (xp - xm), 0.5 * (yp - ym), 0.5 * (zp - zm)],
                     axis=0)
    delsq = xp + xm + yp + ym + zp + zm - 6.0 * phi
    return grad, delsq


def _op5(pm1, p0, pp1):
    """5-point gradient/Laplacian of one column from its x neighbours
    (ref: gradient_2d_5pt_fluid.c operator body; z absent)."""
    yp, ym = _colroll(p0, 1, 0), _colroll(p0, -1, 0)
    gx = 0.5 * (pp1 - pm1)
    gy = 0.5 * (yp - ym)
    d2 = pp1 + pm1 + yp + ym - 4.0 * p0
    return jnp.stack([gx, gy, jnp.zeros_like(p0)]), d2


def _op27(pm1, p0, pp1):
    """27-point gradient/Laplacian of one column from its x-neighbour
    columns (ref: gradient_3d_27pt_fluid.c stencil body applied to a
    single ic with icm1/icp1 resolved to explicit columns)."""
    from ludwig_tpu.ops.stencil import _grad27_terms
    cols = {-1: pm1, 0: p0, 1: pp1}

    def v(dx, dy_, dz_):
        return _colroll(cols[dx], dy_, dz_)

    gx, gy, gz, d2 = _grad27_terms(v, p0)
    return jnp.stack([gx, gy, gz]), d2


def le_fields_27pt_d4(phi, cfg: LeesEdwardsConfig, t):
    """Level-4 LE gradients for the 3d_27pt stencil (Brazovskii in 3-D).

    Two passes of the 27-point operator exactly as the reference
    (ref: gradient_3d_27pt_fluid.c grad_3d_27pt_fluid_d2 — the main
    kernel is already LE-aware at plane-adjacent columns via
    lees_edw_ic_to_buff — plus grad_3d_27pt_fluid_le which fills the
    buffer columns; then grad_3d_27pt_fluid_d4 applies the same
    operator to delsq, reading the buffer-column delsq computed by the
    first pass).  The buffer chain is anchored at the real column:
    lees_edw_ic_to_buff(le, ic, 0) == ic, so the -x neighbour of the
    first buffer column above a plane is the undisplaced plane column.

    Returns (grad, delsq, grad_delsq, delsq_delsq, bufs) with the same
    layout as le_fields_2d5pt_d4.
    """
    from ludwig_tpu.ops.stencil import _grad27_terms, roll3
    ctx = LEContext(cfg, t, phi.dtype)
    nx = ctx.nx
    ax = phi.ndim - 3

    def col(x, j):
        return jnp.take(x, j % nx, axis=ax)

    def v_full(dx, dy_, dz_):
        return roll3(phi, (-dx, -dy_, -dz_), first_axis=ax)

    gx, gy, gz, d2 = _grad27_terms(v_full, phi)
    grad = jnp.stack([gx, gy, gz])

    bufs = {}
    for c in ctx.cols:
        cu = (c + 1) % nx
        b1 = ctx.col_field(phi, c + 1, True, c)
        b2 = ctx.col_field(phi, c + 2, True, c)
        b3 = ctx.col_field(phi, c + 3, True, c)
        d0 = ctx.col_field(phi, c, False, c)
        dm1 = ctx.col_field(phi, c - 1, False, c)
        dm2 = ctx.col_field(phi, c - 2, False, c)

        g_c, d2_c = _op27(col(phi, c - 1), col(phi, c), b1)
        g_b1, d2_b1 = _op27(col(phi, c), b1, b2)
        _, d2_b2 = _op27(b1, b2, b3)
        g_cu, d2_cu = _op27(d0, col(phi, cu), col(phi, cu + 1))
        g_d0, d2_d0 = _op27(dm1, d0, col(phi, cu))
        _, d2_dm1 = _op27(dm2, dm1, d0)

        grad = _set_col(grad, 1 + ax, c, g_c)
        grad = _set_col(grad, 1 + ax, cu, g_cu)
        d2 = _set_col(d2, ax, c, d2_c)
        d2 = _set_col(d2, ax, cu, d2_cu)
        bufs[c] = {"b1": [b1, g_b1, d2_b1], "d0": [d0, g_d0, d2_d0],
                   "d2_b2": d2_b2, "d2_dm1": d2_dm1}

    def v2(dx, dy_, dz_):
        return roll3(d2, (-dx, -dy_, -dz_), first_axis=ax)

    g4x, g4y, g4z, d4 = _grad27_terms(v2, d2)
    gd2 = jnp.stack([g4x, g4y, g4z])

    for c in ctx.cols:
        cu = (c + 1) % nx
        b = bufs[c]
        d2_b1, d2_d0 = b["b1"][2], b["d0"][2]
        g4_c, d4_c = _op27(col(d2, c - 1), col(d2, c), d2_b1)
        g4_b1, d4_b1 = _op27(col(d2, c), d2_b1, b["d2_b2"])
        g4_cu, d4_cu = _op27(d2_d0, col(d2, cu), col(d2, cu + 1))
        g4_d0, d4_d0 = _op27(b["d2_dm1"], d2_d0, col(d2, cu))
        gd2 = _set_col(gd2, 1 + ax, c, g4_c)
        gd2 = _set_col(gd2, 1 + ax, cu, g4_cu)
        d4 = _set_col(d4, ax, c, d4_c)
        d4 = _set_col(d4, ax, cu, d4_cu)
        b["b1"] += [g4_b1, d4_b1]
        b["d0"] += [g4_d0, d4_d0]
    return grad, d2, gd2, d4, bufs


def le_fields_2d5pt_d4(phi, cfg: LeesEdwardsConfig, t):
    """Level-4 LE gradients for the 2d_5pt stencil (Brazovskii).

    Two passes of the 5-point operator exactly as the reference
    (ref: gradient_2d_5pt_fluid.c grad_2d_5pt_fluid_d2 at nextra = 2
    then _d4 at nextra = 1, each with the _le buffer-column pass): the
    first pass also fills delsq at the nh = 1, 2 buffer columns of each
    plane so the second pass can read them through lees_edw_ic_to_buff.

    Returns (grad, delsq, grad_delsq, delsq_delsq, bufs); bufs[c] maps
    'b1' / 'd0' to the (phi, grad, delsq, grad_delsq, delsq_delsq)
    tuple at the first buffer column above / below the plane after
    column c (what the plane-face chemical potential and stress need).
    """
    ctx = LEContext(cfg, t, phi.dtype)
    nx = ctx.nx
    ax = phi.ndim - 3

    def col(j):
        return jnp.take(phi, j % nx, axis=ax)

    xp, xm = jnp.roll(phi, -1, ax), jnp.roll(phi, 1, ax)
    yp, ym = jnp.roll(phi, -1, ax + 1), jnp.roll(phi, 1, ax + 1)
    grad = jnp.stack([0.5 * (xp - xm), 0.5 * (yp - ym),
                      jnp.zeros_like(phi)])
    d2 = xp + xm + yp + ym - 4.0 * phi

    bufs = {}
    for c in ctx.cols:
        cu = (c + 1) % nx
        b1 = ctx.col_field(phi, c + 1, True, c)
        b2 = ctx.col_field(phi, c + 2, True, c)
        b3 = ctx.col_field(phi, c + 3, True, c)
        d0 = ctx.col_field(phi, c, False, c)
        dm1 = ctx.col_field(phi, c - 1, False, c)
        dm2 = ctx.col_field(phi, c - 2, False, c)

        g_c, d2_c = _op5(col(c - 1), col(c), b1)
        g_b1, d2_b1 = _op5(col(c), b1, b2)
        _, d2_b2 = _op5(b1, b2, b3)
        g_cu, d2_cu = _op5(d0, col(cu), col(cu + 1))
        g_d0, d2_d0 = _op5(dm1, d0, col(cu))
        _, d2_dm1 = _op5(dm2, dm1, d0)

        grad = _set_col(grad, 1 + ax, c, g_c)
        grad = _set_col(grad, 1 + ax, cu, g_cu)
        d2 = _set_col(d2, ax, c, d2_c)
        d2 = _set_col(d2, ax, cu, d2_cu)
        bufs[c] = {"b1": [b1, g_b1, d2_b1], "d0": [d0, g_d0, d2_d0],
                   "d2_b2": d2_b2, "d2_dm1": d2_dm1}

    def cold2(j):
        return jnp.take(d2, j % nx, axis=ax)

    xp2, xm2 = jnp.roll(d2, -1, ax), jnp.roll(d2, 1, ax)
    yp2, ym2 = jnp.roll(d2, -1, ax + 1), jnp.roll(d2, 1, ax + 1)
    gd2 = jnp.stack([0.5 * (xp2 - xm2), 0.5 * (yp2 - ym2),
                     jnp.zeros_like(d2)])
    d4 = xp2 + xm2 + yp2 + ym2 - 4.0 * d2

    for c in ctx.cols:
        cu = (c + 1) % nx
        b = bufs[c]
        d2_b1, d2_d0 = b["b1"][2], b["d0"][2]
        g4_c, d4_c = _op5(cold2(c - 1), cold2(c), d2_b1)
        g4_b1, d4_b1 = _op5(cold2(c), d2_b1, b["d2_b2"])
        g4_cu, d4_cu = _op5(d2_d0, cold2(cu), cold2(cu + 1))
        g4_d0, d4_d0 = _op5(b["d2_dm1"], d2_d0, cold2(cu))
        gd2 = _set_col(gd2, 1 + ax, c, g4_c)
        gd2 = _set_col(gd2, 1 + ax, cu, g4_cu)
        d4 = _set_col(d4, ax, c, d4_c)
        d4 = _set_col(d4, ax, cu, d4_cu)
        b["b1"] += [g4_b1, d4_b1]
        b["d0"] += [g4_d0, d4_d0]
    return grad, d2, gd2, d4, bufs
