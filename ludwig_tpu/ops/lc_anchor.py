"""Solid-aware Q-tensor gradients with liquid-crystal anchoring.

TPU-native re-design of the reference's anchoring gradient solvers
(ref: src/gradient_3d_7pt_solid.c:280-640 gradient_6x6_kernel,
src/gradient_s7_anchoring.c, src/lc_anchoring.c matrices,
src/lc_anchoring_impl.h coefficient/constant-term algebra).

At a fluid site with solid neighbours, the one-sided ("half") gradients
into the solid are unknowns fixed by the anchoring boundary condition

    kappa grad Q . n  +  c(Q_s, n; anchoring) = 0

which couples the six symmetric components through the two elastic
constants.  The reference solves a per-site 6/12/18 system by
multiplying with a precomputed inverse; here the same inverses are
baked in at trace time (numpy) and the per-site solve becomes three
dense einsums over masked right-hand sides - every lattice site is
processed in one fused XLA program, no gather/scatter or per-site
branching.

Component order throughout: (XX, XY, XZ, YY, YZ) with ZZ = -XX-YY
appended internally (NSYMM = 6).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

XX, XY, XZ, YY, YZ, ZZ = range(6)
NQAB, NSYMM = 5, 6
_FAC6 = np.array([1.0, 2.0, 2.0, 1.0, 2.0, 1.0])   # c -> b18 factors
# (row a, col b) of the 3x3 c tensor feeding each of the 6 equations
_C_AB = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]

MAP_FLUID, MAP_BOUNDARY, MAP_COLLOID = 0, 1, 2


# -- constant matrices (trace time, numpy) -----------------------------------

def bc_coefficients(kappa0: float, kappa1: float, dn) -> np.ndarray:
    """bc[n1][n2][ia]: coefficient of d_ia Q_n2 in boundary equation n1
    (ref: lc_anchoring_impl.h:290-434 lc_anchoring_coefficients)."""
    k0, k1 = kappa0, kappa1
    k2 = k0 + k1
    dx, dy, dz = (float(d) for d in dn)
    bc = np.zeros((6, 6, 3))
    bc[XX, :, 0] = [k0 * dx, -k1 * dy, -k1 * dz, 0, 0, 0]
    bc[XX, :, 1] = [k1 * dy, k0 * dx, 0, 0, 0, 0]
    bc[XX, :, 2] = [k1 * dz, 0, k0 * dx, 0, 0, 0]
    bc[XY, :, 0] = [k0 * dy, k2 * dx, 0, -k1 * dy, -k1 * dz, 0]
    bc[XY, :, 1] = [-k1 * dx, k2 * dy, -k1 * dz, k0 * dx, 0, 0]
    bc[XY, :, 2] = [0, 2.0 * k1 * dz, k0 * dy, 0, k0 * dx, 0]
    bc[XZ, :, 0] = [k0 * dz, 0, k2 * dx, 0, -k1 * dy, -k1 * dz]
    bc[XZ, :, 1] = [0, k0 * dz, 2.0 * k1 * dy, 0, k0 * dx, 0]
    bc[XZ, :, 2] = [-k1 * dx, -k1 * dy, k2 * dz, 0, 0, k0 * dx]
    bc[YY, :, 0] = [0, k0 * dy, 0, k1 * dx, 0, 0]
    bc[YY, :, 1] = [0, -k1 * dx, 0, k0 * dy, -k1 * dz, 0]
    bc[YY, :, 2] = [0, 0, 0, k1 * dz, k0 * dy, 0]
    bc[YZ, :, 0] = [0, k0 * dz, k0 * dy, 0, 2.0 * k1 * dx, 0]
    bc[YZ, :, 1] = [0, 0, -k1 * dx, k0 * dz, k2 * dy, -k1 * dz]
    bc[YZ, :, 2] = [0, -k1 * dx, 0, -k1 * dy, k2 * dz, k0 * dy]
    bc[ZZ, :, 0] = [0, 0, k0 * dz, 0, 0, k1 * dx]
    bc[ZZ, :, 1] = [0, 0, 0, 0, k0 * dz, k1 * dy]
    bc[ZZ, :, 2] = [0, 0, -k1 * dx, 0, -k1 * dy, k0 * dz]
    return bc


def anchoring_matrices(kappa0: float, kappa1: float):
    """(BC, a6inv, a12inv, a18inv): the positive-normal coefficient
    tensors and the precomputed case inverses (ref: lc_anchoring.c:84-262
    lc_anchoring_matrix1/2/3)."""
    BC = np.stack([bc_coefficients(kappa0, kappa1, np.eye(3)[a])
                   for a in range(3)])                      # (3,6,6,3)
    a6inv = np.stack([1.0 / np.diag(BC[a][:, :, a]) for a in range(3)])

    a18 = np.zeros((18, 18))
    for ia in range(3):
        for ib in range(3):
            w = 0.5 * (1.0 + (ia == ib))
            a18[ia * 6:ia * 6 + 6, ib * 6:ib * 6 + 6] = w * BC[ia][:, :, ib]

    idx = {0: [*range(0, 12)],            # xy
           1: [*range(0, 6), *range(12, 18)],   # xz
           2: [*range(6, 18)]}            # yz
    a12inv = np.stack([np.linalg.inv(a18[np.ix_(idx[k], idx[k])])
                       for k in range(3)])
    a18inv = np.linalg.inv(a18)
    return BC, a6inv, a12inv, a18inv


# -- anchoring parameter bundle ----------------------------------------------

@dataclasses.dataclass(frozen=True)
class AnchoringParams:
    """Anchoring configuration (ref: fe_lc_param_t wall/coll members;
    input keys lc_wall_anchoring, lc_coll_anchoring,
    lc_anchoring_strength[_2], lc_anchoring_strength_colloid)."""
    kappa0: float
    kappa1: float
    q0: float                 # pitch wavevector (raw, not redshifted)
    amplitude: float          # equilibrium amplitude A
    wall: str = "none"        # none | normal | planar | fixed
    wall_w1: float = 0.0
    wall_w2: float = 0.0
    wall_nfix: Tuple[float, float, float] = (0.0, 1.0, 0.0)
    coll: str = "none"
    coll_w1: float = 0.0
    coll_w2: float = 0.0
    method: str = "two"       # 'two' (3d_7pt_solid) | 's7' (s7_anchoring)


# -- tensor helpers (vectorised over the lattice) ----------------------------

def _q33(q6):
    """3x3 symmetric tensor view [ [..] rows ] from 6-component stack."""
    return [[q6[XX], q6[XY], q6[XZ]],
            [q6[XY], q6[YY], q6[YZ]],
            [q6[XZ], q6[YZ], q6[ZZ]]]


def _kappa1_ct(kappa1, q0, nhat, qs):
    """c_ab = -kappa1 q0 nhat_g (e_agh Q_hb + e_bgh Q_ha)
    (ref: lc_anchoring_impl.h:52-90)."""
    kq = -kappa1 * q0
    e = np.zeros((3, 3, 3))
    e[0, 1, 2] = e[1, 2, 0] = e[2, 0, 1] = 1.0
    e[0, 2, 1] = e[1, 0, 2] = e[2, 1, 0] = -1.0
    c = [[0.0] * 3 for _ in range(3)]
    for a in range(3):
        for b in range(3):
            t = 0.0
            for g in range(3):
                for h in range(3):
                    if e[a, g, h]:
                        t = t + e[a, g, h] * nhat[g] * qs[h][b]
                    if e[b, g, h]:
                        t = t + e[b, g, h] * nhat[g] * qs[h][a]
            c[a][b] = kq * t
    return c


def _fixed_q0(nhat, amp):
    """Q0_ab = amp/2 (3 n_a n_b - d_ab)."""
    return [[0.5 * amp * (3.0 * nhat[a] * nhat[b] - (a == b))
             for b in range(3)] for a in range(3)]


def _anchor_ct(kind, w1, w2, qs, nhat_lat, nhat_pref, kappa1, q0, amp,
               nfix=None):
    """Constant term c for one anchoring type.  nhat_lat is used in the
    kappa1 (pitch) term, nhat_pref in the preferred-Q construction
    (ref: gradient_3d_7pt_solid.c:716-775 grad_3d_7pt_bc; for the 's7'
    method both are the true normal, gradient_s7_anchoring.c:674-760)."""
    c = _kappa1_ct(kappa1, q0, nhat_lat, qs)
    if kind == "none":
        return c
    if kind in ("normal", "fixed"):
        nf = nfix if kind == "fixed" else nhat_pref
        qpref = _fixed_q0(nf, amp)
        return [[c[a][b] - w1 * (qs[a][b] - qpref[a][b]) for b in range(3)]
                for a in range(3)]
    if kind == "planar":
        qt = [[qs[a][b] + (0.5 * amp if a == b else 0.0) for b in range(3)]
              for a in range(3)]
        q2 = sum(qt[a][b] * qt[a][b] for a in range(3) for b in range(3))
        # q0_ab = P qtilde P - amp/2 d_ab with P = 1 - n n
        qpref = [[None] * 3 for _ in range(3)]
        for a in range(3):
            for b in range(3):
                acc = 0.0
                for g in range(3):
                    for h in range(3):
                        pag = (1.0 if a == g else 0.0) \
                            - nhat_pref[a] * nhat_pref[g]
                        phb = (1.0 if h == b else 0.0) \
                            - nhat_pref[h] * nhat_pref[b]
                        acc = acc + pag * qt[g][h] * phb
                qpref[a][b] = acc - (0.5 * amp if a == b else 0.0)
        return [[c[a][b] - w1 * (qs[a][b] - qpref[a][b])
                 - w2 * (2.0 * q2 - 4.5 * amp * amp) * qt[a][b]
                 for b in range(3)] for a in range(3)]
    raise ValueError(kind)


# -- the solid-aware gradient -------------------------------------------------

def anchoring_gradient(q5, params: AnchoringParams, status,
                       walls: Tuple[bool, bool, bool] = (False,) * 3,
                       pid=None, R=None, phi=None):
    """(grad (3,5,X,Y,Z), delsq (5,X,Y,Z)) with anchoring boundary
    conditions at solid neighbours.

    status: (X,Y,Z) int array - 0 fluid, 1 boundary/wall, 2 colloid.
    walls:  per-axis plane walls sitting in the halo beyond the edges
            (ref: wall.c:1225-1266 wall_init_map).
    pid, R: colloid owner map / centres (0-based), for colloid normals.
    phi:    optional composition field; anchoring scales by (1+phi)/2
            (LC droplet wetting, ref: gradient_3d_7pt_solid.c:776-795).
    """
    dtype = q5.dtype
    shape = q5.shape[1:]
    q6 = jnp.concatenate([q5, -(q5[0:1] + q5[3:4])])
    BC, a6inv, a12inv, a18inv = anchoring_matrices(params.kappa0,
                                                   params.kappa1)
    BCj = jnp.asarray(BC, dtype)

    solid = status != MAP_FLUID

    # neighbour status with wall planes beyond the edges
    st_up, st_dn = [], []
    for ax in range(3):
        su = jnp.roll(status, -1, axis=ax)
        sd = jnp.roll(status, 1, axis=ax)
        if walls[ax]:
            top = [slice(None)] * 3
            top[ax] = shape[ax] - 1
            bot = [slice(None)] * 3
            bot[ax] = 0
            su = su.at[tuple(top)].set(MAP_BOUNDARY)
            sd = sd.at[tuple(bot)].set(MAP_BOUNDARY)
        st_up.append(su)
        st_dn.append(sd)

    # half gradients, unknown bookkeeping
    gup = jnp.stack([jnp.roll(q6, -1, axis=1 + ax) - q6 for ax in range(3)],
                    axis=1)                                  # (6,3,XYZ)
    gdn = jnp.stack([q6 - jnp.roll(q6, 1, axis=1 + ax) for ax in range(3)],
                    axis=1)
    up_solid = jnp.stack([s != MAP_FLUID for s in st_up])    # (3,XYZ)
    dn_solid = jnp.stack([s != MAP_FLUID for s in st_dn])
    both = jnp.logical_and(up_solid, dn_solid)
    unknown = jnp.logical_xor(up_solid, dn_solid)
    ih = dn_solid                                             # unknown side
    sgn = jnp.where(ih, 1.0, -1.0).astype(dtype)              # nhat sign

    gup = jnp.where(both[None], 0.0, gup)
    gdn = jnp.where(both[None], 0.0, gdn)

    # dq with the unknown half filled by the known one
    filled_up = jnp.where((unknown & ~ih)[None], gdn, gup)
    filled_dn = jnp.where((unknown & ih)[None], gup, gdn)
    dq = 0.5 * (filled_up + filled_dn)                        # (6,3,XYZ)

    # constant terms c per axis
    qs = _q33(q6)
    amp = params.amplitude
    wphi = None if phi is None else 0.5 * (1.0 + phi)
    ctile = []
    for ax in range(3):
        nhat_lat = [sgn[ax] if a == ax else jnp.zeros(shape, dtype)
                    for a in range(3)]
        st_solid = jnp.where(ih[ax], st_dn[ax], st_up[ax])
        is_coll = st_solid == MAP_COLLOID
        if pid is not None and R is not None:
            pid_solid = jnp.where(ih[ax], jnp.roll(pid, 1, axis=ax),
                                  jnp.roll(pid, -1, axis=ax))
            coords = _site_coords(shape, dtype)
            L = jnp.asarray(np.array(shape, np.float64), dtype)
            Rsel = R[jnp.clip(pid_solid, 0, R.shape[0] - 1)]  # (XYZ..,3)
            d = coords - jnp.moveaxis(Rsel, -1, 0)
            d = d - L[:, None, None, None] * jnp.round(
                d / L[:, None, None, None])
            rnorm = jnp.sqrt(jnp.sum(d * d, axis=0))
            rnorm = jnp.where(rnorm > 0.0, rnorm, 1.0)
            dnhat = [d[a] / rnorm for a in range(3)]
            nhat_pref = [jnp.where(is_coll, dnhat[a], nhat_lat[a])
                         for a in range(3)]
        else:
            is_coll = jnp.zeros(shape, bool)
            nhat_pref = nhat_lat
        nhat_kap = nhat_pref if params.method == "s7" else nhat_lat

        cw = _anchor_ct(params.wall, params.wall_w1, params.wall_w2, qs,
                        nhat_kap, nhat_pref, params.kappa1, params.q0,
                        amp, nfix=params.wall_nfix)
        if params.coll != "none" and pid is not None:
            cc = _anchor_ct(params.coll, params.coll_w1, params.coll_w2,
                            qs, nhat_kap, nhat_pref, params.kappa1,
                            params.q0, amp)
            c = [[jnp.where(is_coll, cc[a][b], cw[a][b]) for b in range(3)]
                 for a in range(3)]
        else:
            c = cw
        if wphi is not None:
            c = [[wphi * c[a][b] for b in range(3)] for a in range(3)]
        ctile.append(c)

    nunk = (unknown[0].astype(jnp.int32) + unknown[1].astype(jnp.int32)
            + unknown[2].astype(jnp.int32))

    # Edge/corner sites (nunknown > 1): the reference combines the
    # outward normals into ONE unit normal and evaluates a single c
    # term entering every unknown equation (ref:
    # gradient_s7_anchoring.c:417-500 bcse; the status defaults to
    # MAP_BOUNDARY unless all solid neighbours are colloids).  With a
    # nhat-independent c (fixed anchoring, or q0 = 0 chiral term) this
    # coincides with the per-axis c, which is why only normal/planar
    # anchoring see the difference.
    nn_e = [jnp.where(unknown[a], sgn[a], 0.0) for a in range(3)]
    rn_e = jnp.sqrt(nn_e[0] * nn_e[0] + nn_e[1] * nn_e[1]
                    + nn_e[2] * nn_e[2])
    rn_e = jnp.where(rn_e > 0.0, rn_e, 1.0)
    nhat_e = [nn_e[a] / rn_e for a in range(3)]
    ce = _anchor_ct(params.wall, params.wall_w1, params.wall_w2, qs,
                    nhat_e, nhat_e, params.kappa1, params.q0, amp,
                    nfix=params.wall_nfix)
    if wphi is not None:
        ce = [[wphi * ce[a][b] for b in range(3)] for a in range(3)]
    # colloid-only edges keep the per-axis colloid-centre normals
    edge_coll = jnp.ones(shape, bool)
    for ax in range(3):
        st_solid_ax = jnp.where(ih[ax], st_dn[ax], st_up[ax])
        edge_coll = jnp.logical_and(
            edge_coll, jnp.where(unknown[ax],
                                 st_solid_ax == MAP_COLLOID, True))
    use_ce = jnp.logical_and(nunk >= 2, jnp.logical_not(edge_coll))

    # right-hand sides b~_a (sign-absorbed, ref kernel cases 1-3)
    wib = jnp.where(unknown, 0.5, 1.0).astype(dtype)          # (3,XYZ)
    btil = []
    for ax in range(3):
        rows = []
        for n1 in range(6):
            a_, b_ = _C_AB[n1]
            c_ab = jnp.where(use_ce, ce[a_][b_], ctile[ax][a_][b_])
            acc = -sgn[ax] * _FAC6[n1] * c_ab
            for ib in range(3):
                if ib == ax:
                    continue
                for n2 in range(6):
                    coef = BC[ax][n1][n2][ib]
                    if coef != 0.0:
                        acc = acc - coef * (wib[ib] * dq[n2, ib])
            rows.append(acc)
        btil.append(jnp.stack(rows))                          # (6,XYZ)

    # case solves
    x1 = [jnp.asarray(a6inv[a], dtype)[:, None, None, None] * btil[a]
          for a in range(3)]
    pairs = [(0, 1), (0, 2), (1, 2)]
    x2 = []
    for k, (a, b) in enumerate(pairs):
        b12 = jnp.concatenate([btil[a], btil[b]])             # (12,XYZ)
        x2.append(jnp.einsum("ij,j...->i...",
                             jnp.asarray(a12inv[k], dtype), b12))
    b18v = jnp.concatenate(btil)                               # (18,XYZ)
    x3 = jnp.einsum("ij,j...->i...", jnp.asarray(a18inv, dtype), b18v)

    def pick(ax):
        # 1 unknown
        xa = x1[ax]
        # 2 unknowns: the pair is (ax, other-unknown)
        if ax == 0:
            two = jnp.where(unknown[1][None], x2[0][:6], x2[1][:6])
        elif ax == 1:
            two = jnp.where(unknown[0][None], x2[0][6:], x2[2][:6])
        else:
            two = jnp.where(unknown[0][None], x2[1][6:], x2[2][6:])
        x = jnp.where((nunk == 2)[None], two, xa)
        x = jnp.where((nunk == 3)[None], x3[6 * ax:6 * ax + 6], x)
        # trace fix (ref: gradient_3d_7pt_solid.c:609-618)
        tr = (x[XX] + x[YY] + x[ZZ]) / 3.0
        return x - tr[None] * jnp.asarray(
            [1.0, 0, 0, 1.0, 0, 1.0], dtype)[:, None, None, None]

    for ax in range(3):
        xax = pick(ax)[:NQAB]
        rep_up = (unknown[ax] & ~ih[ax])[None]
        rep_dn = (unknown[ax] & ih[ax])[None]
        gup = gup.at[:NQAB, ax].set(
            jnp.where(rep_up, xax, gup[:NQAB, ax]))
        gdn = gdn.at[:NQAB, ax].set(
            jnp.where(rep_dn, xax, gdn[:NQAB, ax]))

    grad = jnp.stack([0.5 * (gup[:NQAB, ax] + gdn[:NQAB, ax])
                      for ax in range(3)])                    # (3,5,XYZ)
    delsq = jnp.sum(gup[:NQAB] - gdn[:NQAB], axis=1)          # (5,XYZ)
    return grad, delsq


def _site_coords(shape, dtype):
    x = np.arange(shape[0], dtype=np.float64)
    y = np.arange(shape[1], dtype=np.float64)
    z = np.arange(shape[2], dtype=np.float64)
    g = np.stack(np.meshgrid(x, y, z, indexing="ij"))
    return jnp.asarray(g, dtype)
