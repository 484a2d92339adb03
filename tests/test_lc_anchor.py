"""Anchoring gradient vs a direct per-site oracle of the reference
algorithm (ref: gradient_3d_7pt_solid.c:280-640), plus consistency
with the plain 7-point gradient when no solid is present."""

import numpy as np
import pytest

from ludwig_tpu.ops.lc_anchor import (AnchoringParams, anchoring_gradient,
                                      anchoring_matrices, bc_coefficients,
                                      MAP_BOUNDARY, MAP_COLLOID, MAP_FLUID)

NSYMM = 6
FAC = [1.0, 2.0, 2.0, 1.0, 2.0, 1.0]
CAB = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]


def test_matrices_invert():
    BC, a6inv, a12inv, a18inv = anchoring_matrices(0.01, 0.02)
    a18 = np.zeros((18, 18))
    for ia in range(3):
        for ib in range(3):
            w = 0.5 * (1.0 + (ia == ib))
            a18[ia*6:ia*6+6, ib*6:ib*6+6] = w * BC[ia][:, :, ib]
    assert np.allclose(a18inv @ a18, np.eye(18), atol=1e-10)
    idx = {0: list(range(12)), 1: list(range(6)) + list(range(12, 18)),
           2: list(range(6, 18))}
    for k in range(3):
        sub = a18[np.ix_(idx[k], idx[k])]
        assert np.allclose(a12inv[k] @ sub, np.eye(12), atol=1e-10)
    for a in range(3):
        assert np.allclose(a6inv[a] * np.diag(BC[a][:, :, a]), 1.0)


# ---- per-site oracle --------------------------------------------------------

def kappa1_ct(kappa1, q0, nhat, qs):
    e = np.zeros((3, 3, 3))
    e[0, 1, 2] = e[1, 2, 0] = e[2, 0, 1] = 1.0
    e[0, 2, 1] = e[1, 0, 2] = e[2, 1, 0] = -1.0
    c = np.zeros((3, 3))
    for a in range(3):
        for b in range(3):
            t = 0.0
            for g in range(3):
                for h in range(3):
                    t += e[a, g, h] * nhat[g] * qs[h, b]
                    t += e[b, g, h] * nhat[g] * qs[h, a]
            c[a, b] = -kappa1 * q0 * t
    return c


def anchor_ct(kind, w1, w2, qs, nlat, npref, kappa1, q0, amp, nfix=None):
    c = kappa1_ct(kappa1, q0, nlat, qs)
    if kind == "none":
        return c
    if kind in ("normal", "fixed"):
        nf = np.asarray(nfix if kind == "fixed" else npref, float)
        q0m = 0.5 * amp * (3.0 * np.outer(nf, nf) - np.eye(3))
        return c - w1 * (qs - q0m)
    if kind == "planar":
        qt = qs + 0.5 * amp * np.eye(3)
        q2 = np.sum(qt * qt)
        P = np.eye(3) - np.outer(npref, npref)
        q0m = P @ qt @ P - 0.5 * amp * np.eye(3)
        return (c - w1 * (qs - q0m)
                - w2 * (2.0 * q2 - 4.5 * amp * amp) * qt)
    raise ValueError(kind)


def oracle(q5, p, status, walls, pid=None, R=None, phi=None):
    """Site-loop transliteration of gradient_6x6_kernel."""
    shape = q5.shape[1:]
    nx, ny, nz = shape
    q6 = np.concatenate([q5, -(q5[0:1] + q5[3:4])])
    BC, a6inv, a12inv, a18inv = anchoring_matrices(p.kappa0, p.kappa1)
    grad = np.zeros((3, 5) + shape)
    delsq = np.zeros((5,) + shape)

    def stat(i, j, k, ax, d):
        c = [i, j, k]
        c[ax] += d
        if walls[ax] and (c[ax] < 0 or c[ax] >= shape[ax]):
            return MAP_BOUNDARY, None
        c = [c[0] % nx, c[1] % ny, c[2] % nz]
        return status[c[0], c[1], c[2]], tuple(c)

    def qat(i, j, k, ax, d):
        c = [i, j, k]
        c[ax] += d
        return q6[:, c[0] % nx, c[1] % ny, c[2] % nz]

    for i in range(nx):
        for j in range(ny):
            for k in range(nz):
                if status[i, j, k] != MAP_FLUID:
                    continue
                gr = np.zeros((6, 3, 2))
                unknowns = []   # (axis, ih, solid_status, solid_site)
                for ax in range(3):
                    su, cu = stat(i, j, k, ax, +1)
                    sd, cd = stat(i, j, k, ax, -1)
                    gr[:, ax, 0] = qat(i, j, k, ax, +1) - q6[:, i, j, k]
                    gr[:, ax, 1] = q6[:, i, j, k] - qat(i, j, k, ax, -1)
                    ig, ihs = su != MAP_FLUID, sd != MAP_FLUID
                    if ig and ihs:
                        gr[:, ax, :] = 0.0
                    elif ig or ihs:
                        ih = int(ihs)
                        unknowns.append((ax, ih, sd if ihs else su,
                                         cd if ihs else cu))
                nunk = len(unknowns)
                if nunk:
                    qs = np.array(
                        [[q6[0, i, j, k], q6[1, i, j, k], q6[2, i, j, k]],
                         [q6[1, i, j, k], q6[3, i, j, k], q6[4, i, j, k]],
                         [q6[2, i, j, k], q6[4, i, j, k], q6[5, i, j, k]]])
                    # Edge/corner sites: unless every solid neighbour is
                    # a colloid, ONE combined unit normal and a single c
                    # (wall anchoring) enter every unknown equation
                    # (ref: s7_anchoring.c bcse combined normal).
                    c_edge = None
                    if (nunk >= 2 and
                            any(u[2] != MAP_COLLOID for u in unknowns)):
                        ne = np.zeros(3)
                        for (ax, ih, _, _) in unknowns:
                            ne[ax] = 1.0 if ih else -1.0
                        ne /= np.linalg.norm(ne)
                        c_edge = anchor_ct(p.wall, p.wall_w1, p.wall_w2,
                                           qs, ne, ne, p.kappa1, p.q0,
                                           p.amplitude, p.wall_nfix)
                        if phi is not None:
                            c_edge = c_edge * (0.5 * (1.0 + phi[i, j, k]))
                    b18 = np.zeros(3 * NSYMM)
                    for n, (ax, ih, sst, ssite) in enumerate(unknowns):
                        s = 1.0 if ih else -1.0
                        nlat = np.zeros(3)
                        nlat[ax] = s
                        if sst == MAP_COLLOID:
                            d = (np.array([i, j, k], float) - R[pid[ssite]])
                            L = np.array(shape, float)
                            d -= L * np.round(d / L)
                            npref = d / np.linalg.norm(d)
                            kind, w1, w2 = p.coll, p.coll_w1, p.coll_w2
                        else:
                            npref = nlat
                            kind, w1, w2 = p.wall, p.wall_w1, p.wall_w2
                        nkap = npref if p.method == "s7" else nlat
                        c = anchor_ct(kind, w1, w2, qs, nkap, npref,
                                      p.kappa1, p.q0, p.amplitude,
                                      p.wall_nfix)
                        if phi is not None:
                            c = c * (0.5 * (1.0 + phi[i, j, k]))
                        if c_edge is not None:
                            c = c_edge
                        for n1 in range(6):
                            a_, b_ = CAB[n1]
                            b18[n*6 + n1] = -FAC[n1] * c[a_, b_]
                        gr[:, ax, ih] = gr[:, ax, 1 - ih]

                    unk_ax = [u[0] for u in unknowns]
                    sgns = [1.0 if u[1] else -1.0 for u in unknowns]
                    for n, (ax, ih, _, _) in enumerate(unknowns):
                        bc = np.zeros((6, 6, 3))
                        for ib in range(3):
                            bc[:, :, ib] = sgns[n] * BC[ax][:, :, ib]
                        for n1 in range(6):
                            for n2 in range(6):
                                for ib in range(3):
                                    if ib == ax:
                                        continue
                                    w = 0.5 if ib in unk_ax else 1.0
                                    dq = 0.5 * (gr[n2, ib, 0] + gr[n2, ib, 1])
                                    b18[n*6 + n1] -= w * bc[n1, n2, ib] * dq
                        b18[n*6:n*6+6] *= sgns[n]

                    if nunk == 1:
                        ax = unk_ax[0]
                        x = a6inv[ax] * b18[:6]
                    elif nunk == 2:
                        kpair = unk_ax[0] + unk_ax[1] - 1
                        x = a12inv[kpair] @ b18[:12]
                    else:
                        x = a18inv @ b18

                    for n, (ax, ih, _, _) in enumerate(unknowns):
                        xs = x[n*6:n*6+6].copy()
                        tr = (xs[0] + xs[3] + xs[5]) / 3.0
                        xs[0] -= tr
                        xs[3] -= tr
                        gr[:5, ax, ih] = xs[:5]

                grad[:, :, i, j, k] = (0.5 * (gr[:5, :, 0] + gr[:5, :, 1])).T
                delsq[:, i, j, k] = np.sum(gr[:5, :, 0] - gr[:5, :, 1],
                                           axis=1)
    return grad, delsq


def _random_q5(rng, shape):
    return 0.1 * rng.standard_normal((5,) + shape)


@pytest.mark.parametrize("wall,coll,method", [
    ("normal", "none", "two"),
    ("planar", "none", "two"),
    ("fixed", "none", "two"),
    ("normal", "normal", "two"),
    ("planar", "planar", "two"),
    ("normal", "normal", "s7"),
])
def test_oracle_match(wall, coll, method):
    rng = np.random.default_rng(42)
    shape = (8, 6, 4)
    p = AnchoringParams(kappa0=6.5e-4, kappa1=8.1e-4, q0=0.19,
                        amplitude=0.333, wall=wall, wall_w1=2e-3,
                        wall_w2=1.5e-3, wall_nfix=(0.0, 0.6, 0.8),
                        coll=coll, coll_w1=1e-3, coll_w2=7e-4,
                        method=method)
    q5 = _random_q5(rng, shape)
    status = np.zeros(shape, int)
    # a solid blob (boundary) and a colloid blob
    status[2:4, 1:3, 1:3] = MAP_BOUNDARY
    R = np.array([[6.0, 4.0, 2.0]])
    pid = -np.ones(shape, int)
    if coll != "none":
        for idx in np.ndindex(shape):
            if np.linalg.norm(np.array(idx, float) - R[0]) < 1.6:
                status[idx] = MAP_COLLOID
                pid[idx] = 0
    walls = (True, False, False)

    g_ref, d_ref = oracle(q5, p, status, walls,
                          pid=pid, R=R)
    g_jax, d_jax = anchoring_gradient(
        np.asarray(q5), p, np.asarray(status), walls,
        pid=np.asarray(pid) if coll != "none" else None,
        R=np.asarray(R, float) if coll != "none" else None)
    g_jax, d_jax = np.asarray(g_jax), np.asarray(d_jax)
    fl = status == MAP_FLUID
    assert np.allclose(g_jax[:, :, fl], g_ref[:, :, fl], atol=1e-12)
    assert np.allclose(d_jax[:, fl], d_ref[:, fl], atol=1e-12)


def test_no_solid_matches_plain():
    from ludwig_tpu.ops.stencil import gradient_ops
    rng = np.random.default_rng(1)
    shape = (6, 5, 4)
    q5 = _random_q5(rng, shape)
    p = AnchoringParams(kappa0=1e-3, kappa1=1e-3, q0=0.1, amplitude=0.33,
                        wall="normal", wall_w1=1e-2)
    status = np.zeros(shape, int)
    g, d = anchoring_gradient(np.asarray(q5), p, np.asarray(status))
    grad, delsq = gradient_ops("3d_7pt_fluid")
    assert np.allclose(np.asarray(g), np.asarray(grad(np.asarray(q5))),
                       atol=1e-13)
    assert np.allclose(np.asarray(d), np.asarray(delsq(np.asarray(q5))),
                       atol=1e-13)
