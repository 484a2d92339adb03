"""Plane walls living in the halo beyond the lattice edges.

TPU-native equivalent of the reference wall object (ref: src/wall.c:
wall_init_map:1225 places MAP_BOUNDARY on the global halo planes, so all
L sites along a walled axis stay fluid; wall_bbl_kernel:860-980 does
half-way bounce-back on the links crossing the wall face and accumulates
the momentum transfer in wall->fnet).

Here the wall never occupies storage: streaming stays pure jnp.roll and
the wrap planes of each walled axis are overwritten with the bounce-back
values afterwards - a handful of static plane-slice updates XLA fuses
into the streaming program.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ludwig_tpu.lattice import CS2, LatticeModel


@dataclasses.dataclass(frozen=True)
class WallSpec:
    """Which axes have walls, the wall velocities (moving walls, input
    keys boundary_walls, boundary_speed_bottom/top), and per-face slip
    fractions (boundary_walls_slip_fraction_bot/top; ref: wall.c:475-707
    wall_init_boundaries_slip, wall_slip)."""
    walls: Tuple[bool, bool, bool]
    ubot: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    utop: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    slip_bot: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    slip_top: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    slip_active: bool = False

    @property
    def any(self) -> bool:
        return any(self.walls)

    def slip_value(self, sides) -> float:
        """Slip fraction for a link whose wall normal involves the given
        (axis, is_top) faces: face value, edge average, corner no-slip
        (ref: wall.c wall_slip, wall_link_slip)."""
        if len(sides) >= 3:
            return 0.0
        vals = [(self.slip_top if top else self.slip_bot)[ax]
                for ax, top in sides]
        return float(sum(vals) / len(vals))


def wall_bounce_back(f_new: jnp.ndarray, f_post: jnp.ndarray,
                     model: LatticeModel, spec: WallSpec,
                     rho0: float = 1.0, g_post: Optional[jnp.ndarray] = None,
                     g_new: Optional[jnp.ndarray] = None, fluid=None):
    """Overwrite wrapped-in distributions at wall planes with half-way
    bounce-back, and return the momentum transferred to the walls.

    f_new: streamed distributions (rolled, so wall planes currently hold
    wrapped values); f_post: post-collision distributions.
    g_post/g_new: optional second (order-parameter) distribution for
    ndist=2 models (ref: wall_bbl_kernel LB_PHI branch).

    Returns (f_new, g_new, gwall_inc) with
      gwall_inc = sum_links (2 f*_q - 2 w_q rho0 (c_q.u_w)/cs2 - 2 w_q) c_q
    accumulated per link with the small-constant subtraction exactly as
    the reference does (anti-roundoff; ref: wall.c:941-949).
    """
    cv = model.cv
    wv = model.wv
    rev = model.reverse
    dtype = f_post.dtype
    gw = jnp.zeros((3,), dtype)

    for ax in range(3):
        if not spec.walls[ax]:
            continue
        for side, uw in ((0, spec.ubot), (1, spec.utop)):
            # side 0: wall below plane i=0; into-wall dirs have cv[ax]<0
            plane = 0 if side == 0 else f_post.shape[1 + ax] - 1
            into = -1 if side == 0 else 1
            sl = [slice(None)] * 3
            sl[ax] = plane
            sl = tuple(sl)
            for q in range(model.nvel):
                if cv[q][ax] != int(into):
                    continue
                p = int(rev[q])
                cdotu = float(np.dot(cv[q], uw))
                corr = 2.0 * wv[q] * rho0 * cdotu / CS2
                fq = f_post[(q,) + sl]
                if fluid is None:
                    f_new = f_new.at[(p,) + sl].set(fq - corr)
                else:
                    # colloid-covered wall sites do NOT bounce: the
                    # incoming population is the halo's rest value
                    # w rho0 written by wall_set_wall_distributions
                    # (ref: wall.c MAP_COLLOID branch writes nothing;
                    # wall.c:944 setu value streams in).  Their
                    # momentum anomaly is accounted on the colloid
                    # side (bbl_step link_wall).
                    flq = fluid[sl]
                    f_new = f_new.at[(p,) + sl].set(
                        jnp.where(flq, fq - corr, wv[q] * rho0))
                if g_post is not None:
                    gq = g_post[(q,) + sl]
                    g_new = g_new.at[(p,) + sl].set(gq - corr)
                # one link per (site, q): a diagonal crossing several
                # walled faces was already counted by an earlier axis'
                # plane pass - mask out that overlap (the reference's
                # link list holds each boundary<->fluid link once)
                nsl = float(np.prod(fq.shape))
                ov = np.zeros(fq.shape, bool)
                for ax2 in range(ax):
                    if not spec.walls[ax2] or cv[q][ax2] == 0:
                        continue
                    # position of ax2 within the sliced shape: axes
                    # before `ax` keep their index
                    p2 = (0 if cv[q][ax2] < 0
                          else f_post.shape[1 + ax2] - 1)
                    sel = [slice(None)] * ov.ndim
                    sel[ax2] = p2
                    ov[tuple(sel)] = True
                if fluid is None:
                    if ov.any():
                        keep = jnp.asarray(~ov)
                        link = (jnp.sum(jnp.where(keep, 2.0 * fq, 0.0))
                                - (corr + 2.0 * wv[q])
                                * float((~ov).sum()))
                    else:
                        link = (jnp.sum(2.0 * fq)
                                - (corr + 2.0 * wv[q]) * nsl)
                else:
                    # small-per-link accumulation as the reference's
                    # fnet (anti-roundoff; ref: wall.c:1066-1076)
                    keep = (jnp.asarray(~ov) if ov.any()
                            else jnp.ones(fq.shape, bool))
                    keep = jnp.logical_and(keep, fluid[sl])
                    link = jnp.sum(jnp.where(
                        keep, 2.0 * fq - (corr + 2.0 * wv[q]), 0.0))
                gw = gw + link * jnp.asarray(np.array(cv[q], np.float64),
                                             dtype)
    return f_new, g_new, gw


def wall_bounce_back_fused(fpad: jnp.ndarray, fpost2: dict,
                           model: LatticeModel, spec: WallSpec,
                           rho0: float = 1.0,
                           pad: Tuple[int, int, int] = (1, 8, 0),
                           z: int = None):
    """Wall fix for the fused collide+stream kernel's PADDED output.

    The fused kernel streams fully periodically; here the contaminated
    (wrapped-in) populations on each walled boundary plane are
    overwritten with half-way bounce-back, using ``fpost2[ax]`` =
    post-collision distributions on the two boundary planes of axis
    ``ax`` (extent 2 along that axis, computed by a plane collide of the
    pre-step state - O(surface), not O(volume)).

    Returns (fpad, gwall_inc).  The momentum transfer uses the per-link
    sum (2 f*_q - corr - 2 w_q) c_q (ref: wall.c:941-949 fnet); with
    whole-plane walls this equals the jnp path's global pre/post-fix
    momentum difference in exact arithmetic (the wrapped-in values it
    removes are exactly the into-wall populations of the opposite
    plane).
    """
    cv = model.cv
    wv = model.wv
    rev = model.reverse
    dtype = fpad.dtype
    ext = [fpad.shape[1 + a] - 2 * pad[a] for a in range(3)]
    if z is not None:
        ext[2] = z          # live z extent of a lane-padded state
    ext = tuple(ext)
    gw = jnp.zeros((3,), dtype)

    for ax in range(3):
        if not spec.walls[ax]:
            continue
        rem = [a for a in range(3) if a != ax]   # axes kept in a plane
        for side, uw in ((0, spec.ubot), (1, spec.utop)):
            # live-region slice of the boundary plane on the padded array
            sl_pad = [slice(pad[a], pad[a] + ext[a]) for a in range(3)]
            sl_pad[ax] = pad[ax] + (0 if side == 0 else ext[ax] - 1)
            sl_pad = tuple(sl_pad)
            # matching slice on the 2-plane post-collision array
            sl_p = [slice(None)] * 3
            sl_p[ax] = side
            sl_p = tuple(sl_p)
            into = -1 if side == 0 else 1
            for q in range(model.nvel):
                if cv[q][ax] != int(into):
                    continue
                p = int(rev[q])
                cdotu = float(np.dot(cv[q], uw))
                corr = 2.0 * wv[q] * rho0 * cdotu / CS2
                fq = fpost2[ax][(q,) + sl_p]
                fpad = fpad.at[(p,) + sl_pad].set(fq - corr)
                # one link per (site, q): overlap with an earlier walled
                # axis' plane pass masked as in wall_bounce_back
                ov = np.zeros(fq.shape, bool)
                for ax2 in range(ax):
                    if not spec.walls[ax2] or cv[q][ax2] == 0:
                        continue
                    p2 = 0 if cv[q][ax2] < 0 else ext[ax2] - 1
                    sel = [slice(None)] * ov.ndim
                    sel[rem.index(ax2)] = p2
                    ov[tuple(sel)] = True
                nsl = float(np.prod(fq.shape))
                if ov.any():
                    keep = jnp.asarray(~ov)
                    link = (jnp.sum(jnp.where(keep, 2.0 * fq, 0.0))
                            - (corr + 2.0 * wv[q]) * float((~ov).sum()))
                else:
                    link = jnp.sum(2.0 * fq) - (corr + 2.0 * wv[q]) * nsl
                gw = gw + link * jnp.asarray(np.array(cv[q], np.float64),
                                             dtype)
    return fpad, gw


def wall_bounce_back_slip(f_new: jnp.ndarray, f_post: jnp.ndarray,
                          model: LatticeModel, spec: WallSpec,
                          rho0: float = 1.0):
    """Bounce-back with partial slip: the incoming distribution is the
    mix (1-s) f_noslip + s f_specular, where the specular partner comes
    from the tangentially adjacent site (ref: wall.c:475-707
    wall_init_boundaries_slip + wall_bbl_slip_kernel).

    Handles faces, edges (slip = face average) and corners (no slip)
    as static plane/edge/corner slice updates, processed in order of
    increasing normal rank so overlaps resolve to the most solid case.
    """
    cv = model.cv
    wv = model.wv
    rev = model.reverse
    shape = f_post.shape[1:]

    def cvidx(vec):
        for qq in range(model.nvel):
            if all(int(cv[qq][a]) == int(vec[a]) for a in range(3)):
                return qq
        raise ValueError(vec)

    from itertools import combinations
    for q in range(1, model.nvel):
        wall_axes = [ax for ax in range(3)
                     if spec.walls[ax] and cv[q][ax] != 0]
        if not wall_axes:
            continue
        p = int(rev[q])
        for nsz in range(1, len(wall_axes) + 1):
            for S in combinations(wall_axes, nsz):
                sl = [slice(None)] * 3
                sides = []
                for ax in S:
                    into = int(cv[q][ax])
                    plane = shape[ax] - 1 if into > 0 else 0
                    sl[ax] = plane
                    sides.append((ax, into > 0))   # top if stepping up
                sl = tuple(sl)
                # the reference slip kernel has no moving-wall term
                wn = [-int(cv[q][ax]) if ax in S else 0 for ax in range(3)]
                wt = [int(cv[q][a]) + wn[a] for a in range(3)]
                s = spec.slip_value(sides)
                if all(t == 0 for t in wt) or s == 0.0:
                    val = f_post[(q,) + sl]
                else:
                    cq = [-2 * wn[a] - int(cv[q][a]) for a in range(3)]
                    qs = cvidx(cq)
                    fk = f_post[qs]
                    for a in range(3):
                        if wt[a]:
                            fk = jnp.roll(fk, -wt[a], axis=a)
                    val = (1.0 - s) * f_post[(q,) + sl] + s * fk[sl]
                f_new = f_new.at[(p,) + sl].set(val)
    return f_new


def no_flux_at_walls(fluxes, spec: WallSpec):
    """Zero the face fluxes crossing a wall: the wrap face (between site
    N-1 and site 0) of each walled axis (ref: advection_bcs.c
    advection_bcs_no_normal_flux with the halo-wall map)."""
    if not spec.any:
        return fluxes
    out = []
    for ax in range(3):
        fl = fluxes[ax]
        if spec.walls[ax]:
            sl = [slice(None)] * 3
            sl[ax] = fl.shape[fl.ndim - 3 + ax] - 1
            nlead = fl.ndim - 3
            fl = fl.at[(slice(None),) * nlead + tuple(sl)].set(0.0)
        out.append(fl)
    return out


def stress_divergence_force_walls(pth: jnp.ndarray, spec: WallSpec):
    """Force = -div(pth) with one-sided fluxes at the wall faces, plus
    the momentum flowing into the walls (ref: phi_force_colloid.c
    pth_force_map_kernel / pth_force_wall_kernel).

    Face flux between fluid sites: 0.5 (pth(i) + pth(i+1)); at a wall
    face the one-sided value pth(i) of the adjacent fluid site is used.
    Wall momentum: each wall-adjacent site contributes -/+ pth(i)[a][ax].
    Returns (force (3,XYZ), fwall (3,)).
    """
    shape = pth.shape[2:]
    comps = []
    for a in range(3):
        acc = None
        for ax in range(3):
            pax = pth[a, ax]
            up = jnp.roll(pax, -1, axis=ax)
            face = 0.5 * (pax + up)
            if spec.walls[ax]:
                hi = [slice(None)] * 3
                hi[ax] = shape[ax] - 1
                lo = [slice(None)] * 3
                lo[ax] = 0
                # one-sided at both wall faces (the wrap face belongs to
                # the high plane's up-neighbour and the low plane's down)
                face = face.at[tuple(hi)].set(pax[tuple(hi)])
            d = face - jnp.roll(face, 1, axis=ax)
            if spec.walls[ax]:
                lo = [slice(None)] * 3
                lo[ax] = 0
                # down-face of plane 0 is the wall: one-sided pth(0)
                d = d.at[tuple(lo)].set(face[tuple(lo)] - pax[tuple(lo)])
            acc = d if acc is None else acc + d
        comps.append(-acc)
    force = jnp.stack(comps)
    # Momentum absorbed by the walls: minus everything injected into the
    # fluid (the interior faces telescope; only the one-sided wall-face
    # fluxes survive, cf. pth_force_wall_kernel feeding wall->fnet, with
    # the accounting sense of ludwig.c:1076 [total] = g + gwall).
    fwall = -jnp.sum(force, axis=(1, 2, 3))
    return force, fwall


def wall_velocity_gradient_fix(w, u: jnp.ndarray, spec: WallSpec):
    """Patch the central-difference velocity gradient tensor at wall
    planes, where the off-edge neighbour velocity is the wall velocity
    (ref: wall.c wall_set_wall_velocities; halo u = uw)."""
    if not spec.any:
        return w
    for ax in range(3):
        if not spec.walls[ax]:
            continue
        n = u.shape[1 + ax]
        lo = [slice(None)] * 3
        lo[ax] = 0
        hi = [slice(None)] * 3
        hi[ax] = n - 1
        lo, hi = tuple(lo), tuple(hi)
        lo2 = [slice(None)] * 3
        lo2[ax] = 1
        hi2 = [slice(None)] * 3
        hi2[ax] = n - 2
        for a in range(3):
            ub = float(spec.ubot[a])
            ut = float(spec.utop[a])
            w[a][ax] = w[a][ax].at[lo].set(
                0.5 * (u[a][tuple(lo2)] - ub))
            w[a][ax] = w[a][ax].at[hi].set(
                0.5 * (ut - u[a][tuple(hi2)]))
    return w
