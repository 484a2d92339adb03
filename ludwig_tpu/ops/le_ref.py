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
