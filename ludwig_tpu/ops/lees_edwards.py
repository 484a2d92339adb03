"""Lees-Edwards sliding periodic boundaries for the LB distributions.

TPU-native equivalent of the reference LE machinery (ref:
src/leesedwards.c geometry :240-241 dx_sep = Lx/nplanes, dx_min =
dx_sep/2; src/model_le.c: le_reproject :111-205, le_displace_and_
interpolate :219-300).  nplanes equally-spaced planes normal to x, each
with sliding velocity uy; the block above each plane moves at +uy
relative to the block below.

Two stages applied to post-collision distributions, before streaming:

1. reprojection: for the column just below a plane, distributions with
   c_x = +1 are Galilean-boosted by du = -uy (and +uy for c_x = -1 just
   above):  f_p += w_p (rho du.c_p / cs^2 + ds:Q_p / (2 cs^4)),
   ds_ab = g_a du_b + du_a g_b + rho du_a du_b.

2. displacement: the same crossing distributions are shifted along y by
   the accumulated slide dy = uy t with linear interpolation.

The reference stages these columns through host MPI buffers
(model_le.c:399 parallel variant); here they are column slabs updated
in place, and on a sharded lattice the dynamic y-roll lowers to XLA
collective-permutes - no host staging.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ludwig_tpu.lattice import CS2, LatticeModel


@dataclasses.dataclass(frozen=True)
class LeesEdwardsConfig:
    nplanes: int
    uy: float
    nx: int                      # total lattice extent along x
    omega: float = 0.0           # oscillatory shear frequency (0 = steady)

    @property
    def plane_cols(self) -> Tuple[int, ...]:
        """0-based column index just below each plane (the plane sits
        between col and col+1).  Ref ic (1-based) = dx_min + p dx_sep."""
        dx_sep = self.nx / self.nplanes
        dx_min = 0.5 * dx_sep
        return tuple(int(dx_min + p * dx_sep) - 1
                     for p in range(self.nplanes))

    def uy_now(self, t):
        """Instantaneous plane speed (ref: lees_edw_plane_uy_now;
        oscillatory: uy cos(omega t))."""
        if self.omega == 0.0:
            return self.uy
        return self.uy * jnp.cos(self.omega * t)

    def displacement(self, t):
        """Accumulated slide (ref: lees_edw_buffer_displacement;
        oscillatory: uy sin(omega t)/omega)."""
        if self.omega == 0.0:
            return self.uy * t
        return self.uy * jnp.sin(self.omega * t) / self.omega


def _boost_column(fcol: jnp.ndarray, model: LatticeModel, cx: int,
                  duy: float) -> jnp.ndarray:
    """Reproject one column slab (nvel, Y, Z) for crossing velocities."""
    rcs2 = 1.0 / CS2
    rho = sum(fcol[p] for p in range(model.nvel))
    g = [None, None, None]
    for a in range(3):
        acc = 0.0
        for p in range(model.nvel):
            c = float(model.cv[p][a])
            if c:
                acc = acc + c * fcol[p] if not isinstance(acc, float) \
                    else c * fcol[p] + acc
        g[a] = acc if not isinstance(acc, float) else jnp.zeros_like(rho)

    du = [0.0, duy, 0.0]   # duy may be traced (oscillatory shear)
    ds = [[g[a] * du[b] + du[a] * g[b] + rho * du[a] * du[b]
           for b in range(3)] for a in range(3)]

    rows = []
    for p in range(model.nvel):
        if int(model.cv[p][0]) != cx:
            rows.append(fcol[p])
            continue
        udotc = du[1] * float(model.cv[p][1])
        sdotq = 0.0
        for a in range(3):
            for b in range(3):
                q = (float(model.cv[p][a] * model.cv[p][b])
                     - (CS2 if a == b else 0.0))
                if isinstance(ds[a][b], float):
                    continue
                sdotq = sdotq + ds[a][b] * q
        fnew = fcol[p] + float(model.wv[p]) * (
            rho * udotc * rcs2 + 0.5 * sdotq * rcs2 * rcs2)
        rows.append(fnew)
    return jnp.stack(rows)


def _displace_column(fcol: jnp.ndarray, model: LatticeModel, cx: int,
                     dy) -> jnp.ndarray:
    """Shift crossing distributions along y by dy (linear interpolation,
    dynamic: dy is traced).  fcol (nvel, Y, Z)."""
    ny = fcol.shape[1]
    dy = jnp.mod(dy, ny)
    jdy = jnp.floor(dy).astype(jnp.int32)
    fr = dy - jdy
    cross = np.array([int(model.cv[p][0]) == cx
                      for p in range(model.nvel)])
    sel = jnp.asarray(cross)[:, None, None]
    # sample at y + jdy and y + jdy + 1 (ref: j1 = jc + jdy, j2 = j1 + 1)
    f1 = jnp.roll(fcol, -jdy, axis=1)
    f2 = jnp.roll(fcol, -(jdy + 1), axis=1)
    interp = (1.0 - fr) * f1 + fr * f2
    return jnp.where(sel, interp, fcol)


def apply_lb_le(f: jnp.ndarray, model: LatticeModel,
                cfg: LeesEdwardsConfig, t) -> jnp.ndarray:
    """Apply LE boundary conditions to post-collision distributions
    (both stages), returning the updated f (nvel, X, Y, Z)."""
    tt = jnp.asarray(t, f.dtype)
    uy = cfg.uy_now(tt)
    dy = cfg.displacement(tt)
    for col in cfg.plane_cols:
        cup = (col + 1) % cfg.nx
        # side below the plane: crossing up (cx = +1), boost du = -uy,
        # arrive in the upper frame displaced by +dy
        slab = _boost_column(f[:, col], model, +1, -uy)
        slab = _displace_column(slab, model, +1, dy)
        f = f.at[:, col].set(slab)
        # side above: crossing down (cx = -1), boost du = +uy
        slab = _boost_column(f[:, cup], model, -1, +uy)
        slab = _displace_column(slab, model, -1, -dy)
        f = f.at[:, cup].set(slab)
    return f


def apply_le_fused(fpad: jnp.ndarray, model: LatticeModel,
                   cfg: LeesEdwardsConfig, t,
                   pad: Tuple[int, int] = (1, 8),
                   z: int = None) -> jnp.ndarray:
    """LE boundary conditions conjugated through streaming, for the
    fused collide+stream kernel's PADDED output.

    The fused kernel applies stream@collide in one pass; the reference
    order is stream@LE@collide (ref: model_le.c:57 runs before
    propagation, ludwig.c:811).  Streaming is an exact per-velocity
    shift, so LE commutes to a post-pass stream@LE@stream^-1: the
    post-collision plane-adjacent columns are reassembled by un-shifting
    each velocity from the fused output, the reprojection + displacement
    applied, and the crossing rows re-shifted back.  O(nplanes nvel Y Z)
    column work around the unmodified O(volume) kernel.  Pads are left
    stale (caller refreshes).
    """
    HX, HY = pad
    nvel = model.nvel
    X = fpad.shape[1] - 2 * HX
    Y = fpad.shape[2] - 2 * HY
    Z = fpad.shape[3] if z is None else z   # live z of lane-padded state
    tt = jnp.asarray(t, fpad.dtype)
    uy = cfg.uy_now(tt)
    dy = cfg.displacement(tt)

    def col_live(c, q):
        return fpad[q, HX + (c % X), HY:HY + Y, :Z]

    def gather_post(c):
        """Post-collision column c: un-stream every velocity from the
        fused output (f_out_q(x) = fpost_q(x - c_q))."""
        rows = []
        for q in range(nvel):
            cx, cy, cz = (int(model.cv[q][a]) for a in range(3))
            src = col_live(c + cx, q)
            if cy:
                src = jnp.roll(src, -cy, axis=0)
            if cz:
                src = jnp.roll(src, -cz, axis=1)
            rows.append(src)
        return jnp.stack(rows)

    fixes = []   # (q, live column, value): written after ALL gathers
    for col in cfg.plane_cols:
        cup = (col + 1) % cfg.nx
        for c, cx, du, dd in ((col, +1, -uy, dy), (cup, -1, uy, -dy)):
            slab = _boost_column(gather_post(c), model, cx, du)
            slab = _displace_column(slab, model, cx, dd)
            for q in range(nvel):
                if int(model.cv[q][0]) != cx:
                    continue
                cy, cz = int(model.cv[q][1]), int(model.cv[q][2])
                v = slab[q]
                if cy:
                    v = jnp.roll(v, cy, axis=0)
                if cz:
                    v = jnp.roll(v, cz, axis=1)
                fixes.append((q, (c + cx) % X, v))
    for q, c, v in fixes:
        fpad = fpad.at[q, HX + c, HY:HY + Y, :Z].set(v)
    return fpad


def _interp_y(col: jnp.ndarray, dy) -> jnp.ndarray:
    """Sample a (.., Y, Z) column at y + dy (linear, periodic, dynamic)."""
    ny = col.shape[-2]
    dy = jnp.mod(dy, ny)
    jdy = jnp.floor(dy).astype(jnp.int32)
    fr = dy - jdy
    c1 = jnp.roll(col, -jdy, axis=-2)
    c2 = jnp.roll(col, -(jdy + 1), axis=-2)
    return (1.0 - fr) * c1 + fr * c2


def le_xneighbor(field: jnp.ndarray, cfg: LeesEdwardsConfig, t, sign: int,
                 uy_component: bool = False) -> jnp.ndarray:
    """Value of `field` at the x+sign neighbour, Lees-Edwards aware.

    Standard periodic roll everywhere, except columns adjacent to a
    plane, whose cross-plane neighbour is sampled y-displaced by the
    accumulated slide (the reference's LE buffer columns,
    ref: leesedwards.c:367-474 interpolation tables).  For the y
    velocity component (uy_component=True) the frame jump +-uy is added
    so the physical field is continuous across the plane
    (ref: hydro buffer frame correction).

    field: (..., X, Y, Z); sign = +1 gives field(x+1), -1 field(x-1).
    """
    ax = field.ndim - 3
    base = jnp.moveaxis(jnp.roll(field, -sign, axis=ax), ax, 0)
    src = jnp.moveaxis(field, ax, 0)
    tt = jnp.asarray(t, field.dtype)
    dy = cfg.displacement(tt)
    uy = cfg.uy_now(tt)
    for col in cfg.plane_cols:
        cup = (col + 1) % cfg.nx
        if sign == +1:
            # sites at x = col look up across the plane to col+1
            val = _interp_y(src[cup], dy)
            if uy_component:
                val = val + uy
            base = base.at[col].set(val)
        else:
            # sites at x = col+1 look down across the plane to col
            val = _interp_y(src[col], -dy)
            if uy_component:
                val = val - uy
            base = base.at[cup].set(val)
    return jnp.moveaxis(base, 0, ax)


def le_steady_profile(cfg: LeesEdwardsConfig, x: np.ndarray) -> np.ndarray:
    """Analytic steady sawtooth u_y(x) in the stored (per-block) frame:
    with the reference's sign conventions the blocks carry slope
    +nplanes uy / X and each plane a -uy jump (the apparent velocity of
    the block above, seen from below, is -uy)."""
    slope = cfg.nplanes * cfg.uy / cfg.nx
    u = slope * (x + 0.5)
    for col in cfg.plane_cols:
        u = u - cfg.uy * (x > col)
    return u - u.mean()


def le_init_shear_profile(lb_cfg, cfg: LeesEdwardsConfig):
    """Initial distributions with the steady sawtooth shear profile and
    the matching off-equilibrium stress (ref: model_le.c:639-700
    lb_le_init_shear_profile; input key LE_init_profile)."""
    model = lb_cfg.model
    rho0 = lb_cfg.rho0
    eta = lb_cfg.eta_shear
    gammadot = cfg.nplanes * cfg.uy / cfg.nx
    dx_sep = cfg.nx / cfg.nplanes
    dx_min = 0.5 * dx_sep
    xglobal = np.arange(1, cfg.nx + 1, dtype=np.float64) - 0.5
    nplane = np.floor((dx_min + xglobal) / dx_sep)
    uy = xglobal * gammadot - cfg.uy * nplane          # (NX,)

    size = lb_cfg.size
    f = np.zeros((model.nvel,) + tuple(size))
    cs2 = 1.0 / 3.0
    rcs2 = 3.0
    for p in range(model.nvel):
        cy = float(model.cv[p][1])
        cdotu = cy * uy                                 # (NX,)
        sdotq = 0.0
        for i in range(3):
            for j in range(3):
                qij = (float(model.cv[p][i] * model.cv[p][j])
                       - cs2 * (i == j))
                uij = (uy * uy if (i == 1 and j == 1) else 0.0)
                gij = gammadot if (i == 0 and j == 1) else 0.0
                sdotq = sdotq + (rho0 * uij - eta * gij) * qij
        fp = model.wv[p] * (rho0 + rcs2 * rho0 * cdotu
                            + 0.5 * rcs2 * rcs2 * sdotq)
        f[p] = np.broadcast_to(np.asarray(fp).reshape(-1, 1, 1), size)
    import jax.numpy as jnp
    return jnp.asarray(f, lb_cfg.jdtype)


def apply_le_fused_sharded(fpad: jnp.ndarray, model: LatticeModel,
                           cfg: LeesEdwardsConfig, t, xl: int, yl: int,
                           pad: Tuple[int, int] = (1, 8),
                           ax: str = "x", ay: str = "y") -> jnp.ndarray:
    """Sharded-lattice variant of apply_le_fused, for use INSIDE a
    shard_map over an ('x', 'y') device mesh.

    The reference's parallel LE comms (ref: model_le.c:399
    le_displace_and_interpolate parallel path, leesedwards.c:700
    y-shifted rank lookup) become: the x-shard owning a plane's column
    pair un-streams the two adjacent columns from its local fused
    output (x/y halo pads supply the off-shard neighbours), and the
    y-displaced interpolation runs on the full-Y column assembled by an
    all-gather along the y mesh axis - the TPU-native y-shifted
    exchange, riding ICI.  Every shard executes the same SPMD program;
    non-owners mask their writes.

    Requires each plane's column pair inside one x-shard (col % xl
    != xl - 1) - the analogue of the reference's "uniform number of
    planes per process" constraint (ref: leesedwards.c:450-452).
    fpad: the LOCAL padded block (nvel, xl+2, yl+2*HY, Z) with FRESH
    pads.  Returns fpad with live columns fixed (pads stale).
    """
    import jax

    HX, HY = pad
    nvel = model.nvel
    Z = fpad.shape[3]
    tt = jnp.asarray(t, fpad.dtype)
    uy = cfg.uy_now(tt)
    dy = cfg.displacement(tt)
    xi = jax.lax.axis_index(ax).astype(jnp.int32)
    yi = jax.lax.axis_index(ay).astype(jnp.int32)
    x0 = xi * jnp.int32(xl)
    y0 = yi * jnp.int32(yl)

    cvs = [(int(model.cv[q][0]), int(model.cv[q][1]), int(model.cv[q][2]))
           for q in range(nvel)]

    for col in cfg.plane_cols:
        if col % xl == xl - 1:
            raise ValueError(
                f"LE plane column {col} straddles an x-shard boundary "
                f"(local extent {xl}); choose a grid with the plane "
                "pair inside one shard (ref: leesedwards.c:450)")
        owner = jnp.logical_and(col >= x0, col < x0 + xl)
        lc = jnp.clip(jnp.int32(col) - x0, 0, xl - 2)
        zero = jnp.int32(0)
        # padded-x window [lc-1 .. lc+2] covering both entries' reads
        win = jax.lax.dynamic_slice(
            fpad, (zero, lc, zero, zero), (nvel, 4, fpad.shape[2], Z))
        for woff, cx, du, dd in ((1, +1, -uy, dy), (2, -1, uy, -dy)):
            # un-stream the post-collision column c = col + (woff - 1)
            rows = []
            for q in range(nvel):
                cqx, cqy, cqz = cvs[q]
                src = win[q, woff + cqx, HY + cqy:HY + cqy + yl, :]
                if cqz:
                    src = jnp.roll(src, -cqz, axis=1)
                rows.append(src)
            slab = jnp.stack(rows)                      # (nvel, yl, Z)
            slab = _boost_column(slab, model, cx, du)
            # full-Y column via all-gather along the y mesh axis
            full = jax.lax.all_gather(slab, ay, axis=1, tiled=True)
            full = _displace_column(full, model, cx, dd)
            # re-stream the crossing velocities back and write the
            # column on the other side of the plane
            lwc = lc + (woff - 1) + cx                  # local write col
            for q in range(nvel):
                cqx, cqy, cqz = cvs[q]
                if cqx != cx:
                    continue
                v = full[q]
                if cqy:
                    v = jnp.roll(v, cqy, axis=0)        # global y shift
                if cqz:
                    v = jnp.roll(v, cqz, axis=1)
                v = jax.lax.dynamic_slice(v, (y0, zero), (yl, Z))
                idx = (jnp.int32(q), jnp.int32(HX) + lwc,
                       jnp.int32(HY), zero)
                cur = jax.lax.dynamic_slice(fpad, idx, (1, 1, yl, Z))
                v = jnp.where(owner, v[None, None], cur)
                fpad = jax.lax.dynamic_update_slice(fpad, v, idx)
    return fpad
