"""Suspension-scale colloid BBL: segment-sum formulation.

The per-particle path in colloids.py unrolls N x nvel masked
whole-lattice reductions - exact, but O(N) lattice passes and an O(N)
trace blow-up (fine for the 1-3 particle regression geometries, not for
suspensions).  This module computes every per-particle link sum with
gathers (R[pid], cbar[pid]) and `jax.ops.segment_sum` over the lattice,
so the cost is O(nvel) lattice passes independent of N (ref: the same
pass0/1/2 algorithm, bbl.c bbl_pass1/bbl_update_colloids/bbl_pass2;
VERDICT round-1 'rescale colloids to suspensions').

Scope: the MXU flavour (bbl_step_mxu) covers passive AND active
(squirmer) particles and wall-bounded suspensions (colloid-wall
virtual links, lubrication drag diagonal); the plain segment-sum
flavour (bbl_step_fast) covers passive periodic.  Same corrections
interface as colloids.bbl_step.  The slow path remains the
reference-bitwise oracle for small N; equivalence is tested against
it (tests/test_colloids_fast.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ludwig_tpu.colloids import (ColloidParams, _min_image, _xyz_tree,
                                 gauss_solve6_ref, rotate_vector,
                                 rr_moments, rr_replacement_field,
                                 site_coords, solve6)
from ludwig_tpu.lattice import LatticeModel
from ludwig_tpu.ops.collide import CS2
from ludwig_tpu.ops.stencil import roll3


def build_map_fast(R: jnp.ndarray, params: ColloidParams, size,
                   coords=None):
    """Vectorised build_map via per-particle windows + scatter-min.

    Each particle only covers sites within its radius, so the distance
    test runs on a static w^3 window around each centre (w from the
    largest input radius) and scatters into the global map - O(N w^3)
    work and O(XYZ) memory, instead of the dense (N, XYZ) pass whose
    (N, 3, X, Y, Z) temporary is ~6 GB for a 1000-particle 64^3
    suspension.  Nearest-centre tie-breaking picks the lowest particle
    index, like the dense argmin."""
    del coords  # windows generate their own local coordinates
    N = R.shape[0]
    nsite = int(np.prod(size))
    L = jnp.asarray(np.array(size, np.int32))
    rmax = int(np.ceil(float(np.max(params.a0))))
    w = 2 * (rmax + 1) + 1
    a2 = jnp.asarray(np.array(params.a0, np.float64) ** 2, R.dtype)

    ox, oy, oz = [g.reshape(-1) for g in np.meshgrid(
        np.arange(w), np.arange(w), np.arange(w), indexing="ij")]
    off = jnp.asarray(np.stack([ox, oy, oz], axis=1))     # (w^3, 3)

    def window(n):
        corner = jnp.floor(R[n]).astype(jnp.int32) - (rmax + 1)
        g = corner[None, :] + off                         # (w^3, 3)
        d = g.astype(R.dtype) - R[n][None, :]
        r2 = jnp.sum(d * d, axis=1)
        r2 = jnp.where(r2 < a2[n], r2, jnp.inf)
        gm = jnp.mod(g, L[None, :])
        idx = (gm[:, 0] * size[1] + gm[:, 1]) * size[2] + gm[:, 2]
        return idx, r2

    idxs, r2s = jax.vmap(window)(jnp.arange(N))           # (N, w^3)
    best_r2 = jnp.full((nsite,), jnp.inf, R.dtype)
    best_r2 = best_r2.at[idxs.reshape(-1)].min(r2s.reshape(-1))
    pids = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None],
                            idxs.shape)
    cand = jnp.where(jnp.logical_and(jnp.isfinite(r2s),
                                     r2s <= best_r2[idxs]),
                     pids, jnp.int32(N))
    best_pid = jnp.full((nsite,), jnp.int32(N))
    best_pid = best_pid.at[idxs.reshape(-1)].min(cand.reshape(-1))
    inside = (best_pid < N).reshape(size)
    pid = jnp.where(inside, best_pid.reshape(size), -1).astype(jnp.int32)
    return pid, inside


def solid_body_u(R, V, W, pid, inside, size, dtype, coords=None):
    """ub (3, X, Y, Z): the owner's solid-body velocity at interior
    sites (gather formulation of the refresh/fix_swd loop)."""
    if coords is None:
        coords = site_coords(size, dtype)
    L = jnp.asarray(np.array(size, np.float64), dtype)
    own = jnp.clip(pid, 0, R.shape[0] - 1)
    Ro = jnp.moveaxis(R[own], -1, 0)                      # (3,XYZ)
    Vo = jnp.moveaxis(V[own], -1, 0)
    Wo = jnp.moveaxis(W[own], -1, 0)
    d = _min_image(coords - Ro, L[:, None, None, None])
    # (v + w_b rb_c) - w_c rb_b per component - the reference's
    # association (ref: bbl.c pass0 ub[X]); bitwise vs the slow path
    ub = jnp.stack([(Vo[0] + Wo[1] * d[2]) - Wo[2] * d[1],
                    (Vo[1] + Wo[2] * d[0]) - Wo[0] * d[2],
                    (Vo[2] + Wo[0] * d[1]) - Wo[1] * d[0]])
    return jnp.where(inside[None], ub, 0.0)


def bbl_step_fast(f: jnp.ndarray, R, V, W, model: LatticeModel,
                  params: ColloidParams, size,
                  ext_force=None, ext_torque=None, rho0: float = 1.0,
                  deltam=None, f0_corr=None, t0_corr=None, M=None,
                  pid_inside=None):
    """Same contract as colloids.bbl_step (passive, periodic).

    pid_inside: optional precomputed (pid, inside) map for R, so the
    caller's map is reused instead of rebuilt."""
    N = params.n
    rcs2 = 1.0 / CS2
    nvel = model.nvel
    if pid_inside is None:
        pid, inside = build_map_fast(R, params, size)
    else:
        pid, inside = pid_inside
    fluid = jnp.logical_not(inside)
    coords = site_coords(size, f.dtype)
    L = jnp.asarray(np.array(size, np.float64), f.dtype)

    def seg(values, ids):
        return jax.ops.segment_sum(values.reshape(-1), ids,
                                   num_segments=N + 1)[:N]

    # per-q link data (masks + owner ids), reused in both passes
    links = []
    for q in range(1, nvel):
        c = model.cv[q]
        sh = tuple(-int(v) for v in c)
        inside_n = roll3(inside, sh)
        pid_n = roll3(pid, sh)
        m = jnp.logical_and(fluid, inside_n)
        ids = jnp.where(m, pid_n, N).reshape(-1)
        mcc = jnp.logical_and(jnp.logical_and(inside, pid != pid_n),
                              inside_n)
        ids_cc = jnp.where(mcc, pid_n, N).reshape(-1)
        links.append((q, c, float(model.wv[q]), m, ids, pid_n,
                      mcc, ids_cc))

    def rb_of(q, c, pid_n):
        """rb for the OWNER of the link at every site."""
        own = jnp.clip(pid_n, 0, N - 1)
        Ro = jnp.moveaxis(R[own], -1, 0)
        d = _min_image(coords - Ro, L[:, None, None, None])
        return [d[a] + 0.5 * float(c[a]) for a in range(3)]

    # pass A: sumw, cbar, rxcbar
    sumw = jnp.zeros((N,), f.dtype)
    cbar = [jnp.zeros((N,), f.dtype) for _ in range(3)]
    rxcbar = [jnp.zeros((N,), f.dtype) for _ in range(3)]
    for (q, c, w, m, ids, pid_n, mcc, ids_cc) in links:
        md = m.astype(f.dtype)
        cnt = seg(md, ids)
        sumw = sumw + w * cnt
        rb = rb_of(q, c, pid_n)
        rbxc = [rb[1] * c[2] - rb[2] * c[1],
                rb[2] * c[0] - rb[0] * c[2],
                rb[0] * c[1] - rb[1] * c[0]]
        for a in range(3):
            cbar[a] = cbar[a] + w * float(c[a]) * cnt
            rxcbar[a] = rxcbar[a] + w * seg(md * rbxc[a], ids)
    sumw = jnp.maximum(sumw, 1e-30)
    rsumw = 1.0 / sumw
    cbarn = [cb * rsumw for cb in cbar]
    rxcbarn = [rx * rsumw for rx in rxcbar]
    dmn = (deltam * rsumw if deltam is not None
           else jnp.zeros((N,), f.dtype))

    # pass B: f0, t0, zeta
    f0 = [jnp.zeros((N,), f.dtype) for _ in range(3)]
    t0 = [jnp.zeros((N,), f.dtype) for _ in range(3)]
    zeta = jnp.zeros((N, 6, 6), f.dtype)
    dmn_pad = jnp.concatenate([dmn, jnp.zeros((1,), f.dtype)])
    cbarn_pad = jnp.stack(
        [jnp.concatenate([cb, jnp.zeros((1,), f.dtype)])
         for cb in cbarn])                                 # (3, N+1)
    rxcbarn_pad = jnp.stack(
        [jnp.concatenate([rx, jnp.zeros((1,), f.dtype)])
         for rx in rxcbarn])
    for (q, c, w, m, ids, pid_n, mcc, ids_cc) in links:
        md = m.astype(f.dtype)
        ownp = jnp.where(m, pid_n, N)                      # (XYZ)
        rb = rb_of(q, c, pid_n)
        rbxc = [rb[1] * c[2] - rb[2] * c[1],
                rb[2] * c[0] - rb[0] * c[2],
                rb[0] * c[1] - rb[1] * c[0]]
        dm = 2.0 * f[q] - w * dmn_pad[ownp]
        delta = 2.0 * rcs2 * w * rho0
        sdm = seg(md * dm, ids)
        for a in range(3):
            f0[a] = f0[a] + float(c[a]) * sdm
            t0[a] = t0[a] + seg(md * dm * rbxc[a], ids)
        six = ([float(c[a]) - cbarn_pad[a][ownp] for a in range(3)]
               + [rbxc[a] - rxcbarn_pad[a][ownp] for a in range(3)])
        for ia in range(6):
            for ib in range(ia, 6):
                zeta = zeta.at[:, ia, ib].add(
                    delta * seg(md * (six[ia] * six[ib]), ids))
        # solid-solid virtual links
        mskc = mcc.astype(f.dtype)
        dmcc = f[q] + roll3(f[int(model.reverse[q])],
                            tuple(-int(v) for v in model.cv[q]))
        scc = seg(mskc * dmcc, ids_cc)
        for a in range(3):
            f0[a] = f0[a] + float(c[a]) * scc
            t0[a] = t0[a] + seg(mskc * dmcc * rbxc[a], ids_cc)
    zeta = zeta + jnp.transpose(jnp.triu(zeta, 1), (0, 2, 1))

    mass = jnp.asarray([(4.0 / 3.0) * np.pi * params.rho0 * a ** 3
                        for a in params.a0], f.dtype)
    moment = jnp.asarray([(2.0 / 5.0) * (4.0 / 3.0) * np.pi * params.rho0
                          * a ** 5 for a in params.a0], f.dtype)
    A = zeta + jax.vmap(jnp.diag)(
        jnp.concatenate([jnp.tile(mass[:, None], (1, 3)),
                         jnp.tile(moment[:, None], (1, 3))], axis=1))
    fe = (jnp.zeros((N, 3), f.dtype) if ext_force is None else ext_force)
    te = (jnp.zeros((N, 3), f.dtype) if ext_torque is None
          else ext_torque)
    if f0_corr is not None:
        fe = fe + f0_corr
    if t0_corr is not None:
        te = te + t0_corr
    b = jnp.concatenate(
        [mass[:, None] * V + jnp.stack(f0, axis=1) + fe,
         moment[:, None] * W + jnp.stack(t0, axis=1) + te], axis=1)
    x = jax.vmap(solve6)(A, b)
    Vn, Wn = x[:, :3], x[:, 3:]
    Mn = (jax.vmap(rotate_vector)(M, Wn) if M is not None else None)

    # pass 2
    dms = 2.0 * rcs2 * rho0 * (
        jnp.sum(Vn * jnp.stack(cbarn, axis=1), axis=1)
        + jnp.sum(Wn * jnp.stack(rxcbarn, axis=1), axis=1))
    dms_pad = jnp.concatenate([dms, jnp.zeros((1,), f.dtype)])
    dmn2_pad = jnp.concatenate([dmn, jnp.zeros((1,), f.dtype)])
    Vp = jnp.concatenate([Vn, jnp.zeros((1, 3), f.dtype)])
    Wp = jnp.concatenate([Wn, jnp.zeros((1, 3), f.dtype)])
    fout = f
    for (q, c, w, m, ids, pid_n, mcc, ids_cc) in links:
        ownp = jnp.where(m, pid_n, N)
        rb = rb_of(q, c, pid_n)
        Vo = jnp.moveaxis(Vp[ownp], -1, 0)
        Wo = jnp.moveaxis(Wp[ownp], -1, 0)
        wxrb = [Wo[1] * rb[2] - Wo[2] * rb[1],
                Wo[2] * rb[0] - Wo[0] * rb[2],
                Wo[0] * rb[1] - Wo[1] * rb[0]]
        vdotc = sum((Vo[a] + wxrb[a]) * float(c[a]) for a in range(3))
        vdotc = 2.0 * rcs2 * w * vdotc
        df = (rho0 * vdotc + w * dmn2_pad[ownp] - w * dms_pad[ownp])
        qr = int(model.reverse[q])
        shift = tuple(int(v) for v in model.cv[q])
        val_at_j = roll3(jnp.where(m, f[q] - df, 0.0), shift)
        mask_at_j = roll3(m, shift)
        fout = fout.at[qr].set(jnp.where(mask_at_j, val_at_j, fout[qr]))

    return fout, Vn, Wn, Mn, jnp.zeros((3,), f.dtype)


def colloid_fe_force_fast(pth, pid, inside, model, n_part):
    """Segment-sum version of binary_colloid.colloid_fe_force."""
    fluid = jnp.logical_not(inside)
    out = jnp.zeros((n_part, 3), pth.dtype)

    def seg(values, ids):
        return jax.ops.segment_sum(values.reshape(-1), ids,
                                   num_segments=n_part + 1)[:n_part]

    for q in range(1, model.nvel):
        c = model.cv[q]
        if int(np.sum(np.abs(c))) != 1:
            continue
        ax = int(np.argmax(np.abs(c)))
        sgn = float(c[ax])
        sh = tuple(-int(v) for v in c)
        ins_n = roll3(inside, sh)
        pid_n = roll3(pid, sh)
        m = jnp.logical_and(fluid, ins_n)
        ids = jnp.where(m, pid_n, n_part).reshape(-1)
        md = m.astype(pth.dtype)
        for a in range(3):
            out = out.at[:, a].add(sgn * seg(md * pth[a, ax], ids))
    return out


def remove_replace_fast(f, R, V, W, inside_old, pid_old, inside_new,
                        pid_new, model, params, size, rho0=1.0):
    """Segment-sum version of colloids.remove_replace."""
    N = params.n
    coords = site_coords(size, f.dtype)
    L = jnp.asarray(np.array(size, np.float64), f.dtype)
    covered = jnp.logical_and(inside_new, jnp.logical_not(inside_old))
    uncovered = jnp.logical_and(inside_old, jnp.logical_not(inside_new))

    fluid_old = jnp.logical_not(inside_old)
    wsum = 0.0
    newf = jnp.zeros_like(f)
    for p in range(1, model.nvel):
        shift = tuple(-int(v) for v in model.cv[p])
        w = float(model.wv[p])
        m = roll3(fluid_old, shift).astype(f.dtype)
        wsum = wsum + w * m
        newf = newf + w * m[None] * roll3(f, shift, first_axis=1)
    newf = newf / jnp.maximum(wsum, 1e-30)[None]

    from ludwig_tpu.ops.collide import unrolled_matvec
    rho_f = sum(f[q] for q in range(model.nvel))
    g_f = unrolled_matvec(model.cv.T.astype(np.float64),
                          [f[q] for q in range(model.nvel)])
    rho_n = sum(newf[q] for q in range(model.nvel))
    g_n = unrolled_matvec(model.cv.T.astype(np.float64),
                          [newf[q] for q in range(model.nvel)])

    ids_cov = jnp.where(covered, pid_new, N).reshape(-1)
    ids_unc = jnp.where(uncovered, pid_old, N).reshape(-1)
    cov = covered.astype(f.dtype)
    unc = uncovered.astype(f.dtype)

    # torque arm relative to the (new) owner position
    own_new = jnp.clip(pid_new, 0, N - 1)
    own_old = jnp.clip(pid_old, 0, N - 1)
    d_cov = _min_image(coords - jnp.moveaxis(R[own_new], -1, 0),
                       L[:, None, None, None])
    d_unc = _min_image(coords - jnp.moveaxis(R[own_old], -1, 0),
                       L[:, None, None, None])

    def cross(d, ga):
        return [d[1] * ga[2] - d[2] * ga[1],
                d[2] * ga[0] - d[0] * ga[2],
                d[0] * ga[1] - d[1] * ga[0]]

    # one (7, nsite) reduction per id set: [dm, g(3), torque(3)]; MXU
    # matmul in f32 production, serialized scatters otherwise
    def seg7(w8, rho_s, g_s, d, ids):
        cols = jnp.stack([w8 * (rho_s - rho0)]
                         + [w8 * g_s[a] for a in range(3)]
                         + [w8 * t for t in cross(d, g_s)])
        if f.dtype == jnp.float32:
            return seg_cols_mxu(cols, ids, N + 1)[:, :N]
        return jax.vmap(lambda v: jax.ops.segment_sum(
            v.reshape(-1), ids, num_segments=N + 1)[:N])(cols)

    rc = seg7(cov, rho_f, g_f, d_cov, ids_cov)
    ru = seg7(unc, rho_n, g_n, d_unc, ids_unc)
    deltam = -rc[0] + ru[0]
    f0c = (rc[1:4] - ru[1:4]).T
    t0c = (rc[4:7] - ru[4:7]).T

    f = jnp.where(uncovered[None], newf, f)
    return f, deltam, f0c, t0c


def phi_remove_replace_conserve_fast(phi, inside_old, inside_new,
                                     pid_old, pid_new, model, n_part,
                                     phi0=0.0, conserve=True):
    """Segment-sum version of
    binary_colloid.phi_remove_replace_conserve."""
    newly_solid = jnp.logical_and(jnp.logical_not(inside_old), inside_new)
    newly_fluid = jnp.logical_and(inside_old, jnp.logical_not(inside_new))
    was_fluid = jnp.logical_not(inside_old).astype(phi.dtype)

    def seg(values, ids):
        return jax.ops.segment_sum(values.reshape(-1), ids,
                                   num_segments=n_part + 1)[:n_part]

    ids_ns = jnp.where(newly_solid, pid_new, n_part).reshape(-1)
    dphi = seg(newly_solid.astype(phi.dtype) * (phi - phi0), ids_ns)

    num = jnp.zeros_like(phi)
    den = jnp.zeros_like(phi)
    for p in range(1, model.nvel):
        sh = tuple(-int(v) for v in model.cv[p])
        wf = roll3(was_fluid, sh)
        w = float(model.wv[p])
        num = num + w * wf * roll3(phi, sh)
        den = den + w * wf
    avg = num / jnp.where(den > 0.0, den, 1.0)
    use = jnp.logical_and(newly_fluid, den > 0.0)
    phi = jnp.where(use, avg, phi)
    ids_nf = jnp.where(newly_fluid, pid_old, n_part).reshape(-1)
    dphi = dphi - seg(newly_fluid.astype(phi.dtype) * (phi - phi0),
                      ids_nf)

    if not conserve:
        # pre-v0.12 reference: no build_conservation_phi
        return phi
    # put-back over |c|=1 fluid links of the new map
    fluid = jnp.logical_not(inside_new)
    masks = []
    for ax in range(3):
        for sgn in (+1, -1):
            sh = [0, 0, 0]
            sh[ax] = -sgn
            nb_in = roll3(inside_new, tuple(sh))
            pid_n = roll3(pid_new, tuple(sh))
            m = jnp.logical_and(fluid, nb_in)
            masks.append((m, jnp.where(m, pid_n, n_part)))
    saf = jnp.zeros((n_part,), phi.dtype)
    for (m, ids2) in masks:
        saf = saf + seg(m.astype(phi.dtype), ids2.reshape(-1))
    share = jnp.where(saf > 0.0,
                      dphi / jnp.where(saf > 0.0, saf, 1.0), 0.0)
    share_pad = jnp.concatenate([share, jnp.zeros((1,), phi.dtype)])
    for (m, ids2) in masks:
        phi = phi + jnp.where(m, share_pad[ids2], 0.0)
    return phi


def _nowall_keep(size, c, walls, dtype=bool):
    """Static mask: False at sites whose neighbour along c crosses a
    wall plane (the roll wraps, but no such link exists in the
    reference's map)."""
    keep = np.ones(size, bool)
    for ax in range(3):
        cax = int(c[ax])
        if walls[ax] and cax != 0:
            sel = [slice(None)] * 3
            sel[ax] = size[ax] - 1 if cax > 0 else 0
            keep[tuple(sel)] = False
    return keep


def g_bbl_fast(g, phi, R, Vn, Wn, model, params, size, deltaphi,
               sumw=None, walls=(False, False, False)):
    """Order-parameter (ndist == 2) bounce-back on links.

    Per fluid link: dg = phi(i) vdotc; the particle's deficit
    accumulates dg and the bounced value is corrected by the spread of
    the stored deficit (ref: bbl.c pass2 ndist > 1 branch; pass1
    preamble normalises s.deltaphi by the link weight sum).

    Returns (g', deltaphi'): deltaphi entering carries any shape-change
    contributions; on exit it holds the accumulated deficit to be
    ADDED to the statistics total (ref: bbl->deltag)."""
    N = params.n
    rcs2 = 3.0
    nvel = model.nvel
    pid, inside = build_map_fast(R, params, size)
    fluid = jnp.logical_not(inside)
    coords = site_coords(size, g.dtype)
    L = jnp.asarray(np.array(size, np.float64), g.dtype)

    def seg(values, ids):
        return jax.ops.segment_sum(values.reshape(-1), ids,
                                   num_segments=N + 1)[:N]

    # link weight sums (for the deficit normalisation)
    if sumw is None:
        sumw = jnp.zeros((N,), g.dtype)
        for q in range(1, nvel):
            sh = tuple(-int(v) for v in model.cv[q])
            m = jnp.logical_and(fluid, roll3(inside, sh))
            if any(walls):
                m = jnp.logical_and(
                    m, jnp.asarray(_nowall_keep(size, model.cv[q],
                                                walls)))
            ids = jnp.where(m, roll3(pid, sh), N).reshape(-1)
            sumw = sumw + float(model.wv[q]) * seg(
                m.astype(g.dtype), ids)
    dgtm1 = deltaphi / jnp.maximum(sumw, 1e-30)
    dgtm1_pad = jnp.concatenate([dgtm1, jnp.zeros((1,), g.dtype)])
    Vp = jnp.concatenate([Vn, jnp.zeros((1, 3), g.dtype)])
    Wp = jnp.concatenate([Wn, jnp.zeros((1, 3), g.dtype)])

    new_deficit = jnp.zeros((N,), g.dtype)
    gout = g
    for q in range(1, nvel):
        c = model.cv[q]
        sh = tuple(-int(v) for v in c)
        m = jnp.logical_and(fluid, roll3(inside, sh))
        if any(walls):
            m = jnp.logical_and(
                m, jnp.asarray(_nowall_keep(size, c, walls)))
        pid_n = roll3(pid, sh)
        ids = jnp.where(m, pid_n, N).reshape(-1)
        ownp = jnp.where(m, pid_n, N)
        w = float(model.wv[q])
        own = jnp.clip(pid_n, 0, N - 1)
        Ro = jnp.moveaxis(R[own], -1, 0)
        d = _min_image(coords - Ro, L[:, None, None, None])
        rb = [d[a] + 0.5 * float(c[a]) for a in range(3)]
        Vo = jnp.moveaxis(Vp[ownp], -1, 0)
        Wo = jnp.moveaxis(Wp[ownp], -1, 0)
        wxrb = [Wo[1] * rb[2] - Wo[2] * rb[1],
                Wo[2] * rb[0] - Wo[0] * rb[2],
                Wo[0] * rb[1] - Wo[1] * rb[0]]
        vdotc = sum((Vo[a] + wxrb[a]) * float(c[a]) for a in range(3))
        vdotc = 2.0 * rcs2 * w * vdotc
        dg = phi * vdotc
        new_deficit = new_deficit + seg(m.astype(g.dtype) * dg, ids)
        qr = int(model.reverse[q])
        shift = tuple(int(v) for v in model.cv[q])
        val = roll3(jnp.where(m, g[q] - (dg - w * dgtm1_pad[ownp]), 0.0),
                    shift)
        mask_at_j = roll3(m, shift)
        gout = gout.at[qr].set(jnp.where(mask_at_j, val, gout[qr]))

    # s.deltaphi is reset before the link loop: only the fresh link
    # flux survives into the next step (ref: bbl.c:623-624, :686)
    return gout, new_deficit


def g_remove_replace_fast(g, inside_old, inside_new, pid_old, pid_new,
                          model, n_part, phi0=0.0,
                          walls=(False, False, False)):
    """ndist == 2 shape-change bookkeeping: the g distribution at a
    newly fluid site is replaced by the wv-weighted neighbour average
    (sites fluid before the update), and the particle deficit accounts
    the removed/created order parameter (ref: build.c
    build_remove_order_parameter / build_replace_order_parameter
    ndist == 2 branches).  Returns (g', ddeficit (N,))."""
    newly_solid = jnp.logical_and(jnp.logical_not(inside_old), inside_new)
    newly_fluid = jnp.logical_and(inside_old, jnp.logical_not(inside_new))
    was_fluid = jnp.logical_not(inside_old).astype(g.dtype)

    def seg(values, ids):
        return jax.ops.segment_sum(values.reshape(-1), ids,
                                   num_segments=n_part + 1)[:n_part]

    # sequential p-order sum as lb_0th_moment (bitwise contract)
    phi_g = sum(g[p] for p in range(model.nvel))
    ids_ns = jnp.where(newly_solid, pid_new, n_part).reshape(-1)
    dd = seg(newly_solid.astype(g.dtype) * (phi_g - phi0), ids_ns)

    wsum = 0.0
    newg = jnp.zeros_like(g)
    size = inside_old.shape
    for p in range(1, model.nvel):
        sh = tuple(-int(v) for v in model.cv[p])
        w = float(model.wv[p])
        m = roll3(was_fluid, sh)
        if any(walls):
            # wall-crossing neighbours are MAP_BOUNDARY: excluded
            keep = np.ones(size, bool)
            for ax in range(3):
                cax = int(model.cv[p][ax])
                if walls[ax] and cax != 0:
                    sel = [slice(None)] * 3
                    sel[ax] = size[ax] - 1 if cax > 0 else 0
                    keep[tuple(sel)] = False
            m = m * jnp.asarray(keep, g.dtype)
        wsum = wsum + w * m
        newg = newg + w * m[None] * roll3(g, sh, first_axis=1)
    newg = newg / jnp.maximum(wsum, 1e-30)[None]
    # no previously-fluid neighbour: keep the stored distribution
    # (ref: build.c:1087-1095 weight == 0 fallback)
    use = jnp.logical_and(newly_fluid, wsum > 0.0)
    g = jnp.where(use[None], newg, g)
    phi_new = sum(g[p] for p in range(model.nvel))
    ids_nf = jnp.where(newly_fluid, pid_old, n_part).reshape(-1)
    dd = dd - seg(newly_fluid.astype(g.dtype) * (phi_new - phi0), ids_nf)
    return g, dd


# ---------------------------------------------------------------------------
# Reference-order (bitwise) link sums for suspensions.
#
# The segment-sum path above is print-precision but not bitwise: the
# reference accumulates each particle's link sums per periodic COPY in
# site-major / velocity-minor order over the copy's clipped bounding
# cube, then consolidates the copies with the X-Y-Z pairwise tree of
# colloid_sums_halo (ref: build.c:362-470, bbl.c pass1,
# colloid_sums.c:164-166; transcribed per-particle in
# colloids._ordered_image_reduce).  Near-zero conserved momentum totals
# in the logs are pure roundoff of exactly that order, so golden parity
# for suspensions (e.g. serial-lubr-tf1, 1000 particles) needs it too.
#
# Here the same reduction runs BATCHED: the term fields are sliced from
# whole-lattice stacks per particle bounding cube (O(nvel) lattice
# passes to build, independent of N) and the per-cube sequential scans
# are vmapped over particle chunks (jax.lax.map batch_size), giving the
# reference's bitwise sums at O(N * cube) cost with bounded memory.

def _static_cube(size, a0max):
    import math
    return tuple(min(int(2 * math.ceil(float(a0max)) + 5), int(size[a]))
                 for a in range(3))


def ordered_reduce_batched(R, a0, size, Ds, nt, make_terms, seeds, dtype,
                           batch_size=16, consolidate=True):
    """Reference-order per-particle link sums, batched over particles.

    make_terms(n, Rn, corner, ccoords) -> (nt, C, Dx, Dy, Dz) in-cube
    term values, already masked to particle n's links (exact zeros
    elsewhere: a sequential FP sum is invariant under interleaved
    zeros).  seeds: None, (N, nt) applied to the real copy, or
    (N, 8, nt) per periodic image (scan initial values, ref: bbl.c:410
    build contributions pre-seed the pass1 accumulators).

    Returns (N, nt) consolidated through the X-Y-Z tree, or (N, 8, nt)
    per-image partials with consolidate=False (the layout the
    remove/replace build seeds need).
    """
    N = R.shape[0]
    L = jnp.asarray(np.array(size, np.float64), dtype)
    a0v = jnp.asarray(np.asarray(a0, np.float64), dtype)
    if seeds is None:
        seeds_arr = jnp.zeros((N, 8, nt), dtype)
    elif seeds.ndim == 2:
        seeds_arr = jnp.zeros((N, 8, nt), dtype).at[:, 0].set(seeds)
    else:
        seeds_arr = seeds

    def one(args):
        n, Rn, a0n, seed = args
        sgn = jnp.where(Rn < 0.5 * L, 1.0, -1.0)
        partials = []
        for img in range(8):
            bvec = np.array([(img >> 2) & 1, (img >> 1) & 1, img & 1],
                            np.float64)
            rpos = Rn + sgn * L * jnp.asarray(bvec, dtype)
            cs = []
            for a in range(3):
                c0 = jnp.floor(rpos[a] - a0n) - 1.0
                c0 = jnp.clip(c0, 0.0, float(size[a] - Ds[a]))
                cs.append(c0.astype(jnp.int32))
            corner = jnp.stack(cs)
            axes = [jnp.arange(Ds[a], dtype=dtype)
                    + corner[a].astype(dtype) for a in range(3)]
            cc = jnp.stack(jnp.meshgrid(*axes, indexing="ij"))
            rnd = jnp.round((cc - Rn[:, None, None, None])
                            / L[:, None, None, None])
            want = sgn * jnp.asarray(bvec, dtype)
            member = jnp.logical_and(
                jnp.logical_and(rnd[0] == want[0], rnd[1] == want[1]),
                rnd[2] == want[2])
            terms = make_terms(n, Rn, corner, cc)
            vals = terms * member[None, None].astype(dtype)
            flat = jnp.transpose(vals, (2, 3, 4, 1, 0)).reshape(
                -1, nt).astype(dtype)

            def body(s, v):
                return s + v, ()

            out, _ = jax.lax.scan(body, seed[img], flat)
            partials.append(out)
        stacked = jnp.stack(partials)
        if not consolidate:
            return stacked
        return _xyz_tree(stacked.reshape(2, 2, 2, nt))

    idx = jnp.arange(N, dtype=jnp.int32)
    return jax.lax.map(one, (idx, R, a0v, seeds_arr),
                       batch_size=min(batch_size, N))


def _cube_slice(x, corner, Ds, comp_axes=0):
    start = [jnp.zeros((), jnp.int32)] * comp_axes \
        + [corner[a] for a in range(3)]
    sizes = tuple(x.shape[:comp_axes]) + tuple(Ds)
    return jax.lax.dynamic_slice(x, start, sizes)


def remove_replace_seeds_fast(f, R, inside_old, pid_old, inside_new,
                              pid_new, model, params, size, rho0=1.0,
                              batch_size=16):
    """Batched per-periodic-image remove/replace build seeds: the
    (N, 8, 7) rows [deltam, f0 x3, t0 x3] that pre-seed the bbl pass1
    accumulators (bitwise equal to colloids.remove_replace
    per_image=True; ref: build_remove_fluid/build_replace_fluid).

    Returns (f with uncovered sites replaced, seeds)."""
    N = params.n
    dtype = f.dtype
    L = jnp.asarray(np.array(size, np.float64), dtype)
    covered = jnp.logical_and(inside_new, jnp.logical_not(inside_old))
    uncovered = jnp.logical_and(inside_old, jnp.logical_not(inside_new))

    newf, _wsum = rr_replacement_field(f, inside_old, model, size)
    rho_f, g_f, rho_n, gneg = rr_moments(f, newf, model)
    g_f = jnp.stack(g_f)
    gneg = jnp.stack(gneg)

    Ds = _static_cube(size, np.max(params.a0))

    def termsS(n, Rn, corner, cc):
        cov_n = jnp.logical_and(_cube_slice(covered, corner, Ds),
                                _cube_slice(pid_new, corner, Ds) == n)
        unc_n = jnp.logical_and(_cube_slice(uncovered, corner, Ds),
                                _cube_slice(pid_old, corner, Ds) == n)
        d = _min_image(cc - Rn[:, None, None, None],
                       L[:, None, None, None])
        rho_fc = _cube_slice(rho_f, corner, Ds)
        rho_nc = _cube_slice(rho_n, corner, Ds)
        g_fc = _cube_slice(g_f, corner, Ds, 1)
        gnc = _cube_slice(gneg, corner, Ds, 1)

        def site_terms(mask, rho_s, g_s):
            dmass = jnp.where(mask, rho_s - rho0, 0.0)
            gm = [jnp.where(mask, g_s[a], 0.0) for a in range(3)]
            t = [jnp.where(mask, d[1] * g_s[2] - d[2] * g_s[1], 0.0),
                 jnp.where(mask, d[2] * g_s[0] - d[0] * g_s[2], 0.0),
                 jnp.where(mask, d[0] * g_s[1] - d[1] * g_s[0], 0.0)]
            return dmass, gm, t

        dmc, gc, tc = site_terms(cov_n, rho_fc, g_fc)
        dmu, gu, tu = site_terms(unc_n, rho_nc, gnc)
        rows = [(-dmc) + dmu]
        for a in range(3):
            rows.append(gc[a] + gu[a])
        for a in range(3):
            rows.append(tc[a] + tu[a])
        return jnp.stack(rows)[:, None]          # (7, 1, Dx, Dy, Dz)

    seeds = ordered_reduce_batched(R, params.a0, size, Ds, 7, termsS,
                                   None, dtype, batch_size,
                                   consolidate=False)
    f = jnp.where(uncovered[None], newf, f)
    return f, seeds


def bbl_link_sums_exact(f, R, model: LatticeModel, params: ColloidParams,
                        size, rho0=1.0, rr_seeds=None, deltam=None,
                        f0_corr=None, t0_corr=None, pid_inside=None,
                        batch_size=16):
    """(sumw, cbarn, rxcbarn, dmn, f0, t0, zeta21) for every particle,
    in the reference's bitwise accumulation order (pass1 of bbl.c,
    build-time STRUCTURE sums; transcribed from colloids.bbl_step's
    per-particle phases A/B, batched over particles).

    Passive particles, periodic boundaries."""
    N = params.n
    dtype = f.dtype
    nvel = model.nvel
    if pid_inside is None:
        pid, inside = build_map_fast(R, params, size)
    else:
        pid, inside = pid_inside
    fluid = jnp.logical_not(inside)
    L = jnp.asarray(np.array(size, np.float64), dtype)
    rcs2 = 1.0 / CS2

    # whole-lattice link stacks (owner at the inside end of each link)
    MF, MCC, PIDN = [], [], []
    for q in range(1, nvel):
        sh = tuple(-int(v) for v in model.cv[q])
        inside_n = roll3(inside, sh)
        pid_n = roll3(pid, sh)
        MF.append(jnp.logical_and(fluid, inside_n))
        MCC.append(jnp.logical_and(jnp.logical_and(inside, pid != pid_n),
                                   inside_n))
        PIDN.append(pid_n)
    MF = jnp.stack(MF)
    MCC = jnp.stack(MCC)
    PIDN = jnp.stack(PIDN)
    F1 = f[1:]
    FR = jnp.stack([roll3(f[int(model.reverse[q])],
                          tuple(-int(v) for v in model.cv[q]))
                    for q in range(1, nvel)])

    cq = jnp.asarray(np.asarray(model.cv[1:], np.float64), dtype)
    wq = jnp.asarray(np.asarray(model.wv[1:], np.float64), dtype)
    wq4 = wq[:, None, None, None]
    Ds = _static_cube(size, np.max(params.a0))

    def _geom(Rn, cc):
        d = _min_image(cc - Rn[:, None, None, None],
                       L[:, None, None, None])
        rb = [d[a][None] + (0.5 * cq[:, a])[:, None, None, None]
              for a in range(3)]
        rbxc = [rb[1] * cq[:, 2][:, None, None, None]
                - rb[2] * cq[:, 1][:, None, None, None],
                rb[2] * cq[:, 0][:, None, None, None]
                - rb[0] * cq[:, 2][:, None, None, None],
                rb[0] * cq[:, 1][:, None, None, None]
                - rb[1] * cq[:, 0][:, None, None, None]]
        return rb, rbxc

    # Phase A: STRUCTURE sums (sumw, cbar, r x cbar)
    def termsA(n, Rn, corner, cc):
        _, rbxc = _geom(Rn, cc)
        mfc = jnp.logical_and(
            _cube_slice(MF, corner, Ds, 1),
            _cube_slice(PIDN, corner, Ds, 1) == n).astype(dtype)
        t = [wq4 * mfc]
        for a in range(3):
            t.append((wq * cq[:, a])[:, None, None, None] * mfc)
        for a in range(3):
            t.append((wq4 * rbxc[a]) * mfc)
        return jnp.stack(t)

    redA = ordered_reduce_batched(R, params.a0, size, Ds, 7, termsA,
                                  None, dtype, batch_size)
    sumw = redA[:, 0]
    rsumw = 1.0 / sumw
    cbarn = redA[:, 1:4] * rsumw[:, None]
    rxcbarn = redA[:, 4:7] * rsumw[:, None]
    if rr_seeds is not None:
        dmn = jax.vmap(
            lambda s: _xyz_tree(s.reshape(2, 2, 2, 1))[0])(
                rr_seeds[:, :, 0]) * rsumw
    elif deltam is not None:
        dmn = deltam * rsumw
    else:
        dmn = jnp.zeros((N,), dtype)

    # Phase B: pass1 sums (f0, t0, zeta), seeded with the build
    # contributions
    delta_q = ((2.0 * rcs2) * wq * rho0)[:, None, None, None]
    ztri = [(ia, ib) for ia in range(6) for ib in range(ia, 6)]

    def termsB(n, Rn, corner, cc):
        _, rbxc = _geom(Rn, cc)
        pidc = _cube_slice(PIDN, corner, Ds, 1)
        mfc = jnp.logical_and(_cube_slice(MF, corner, Ds, 1), pidc == n)
        mccc = jnp.logical_and(_cube_slice(MCC, corner, Ds, 1),
                               pidc == n)
        mf_f = mfc.astype(dtype)
        fc = _cube_slice(F1, corner, Ds, 1)
        frc = _cube_slice(FR, corner, Ds, 1)
        dmf = 2.0 * fc - wq4 * dmn[n]
        dm_all = jnp.where(mfc, dmf, 0.0)
        dm_all = dm_all + jnp.where(mccc, fc + frc, 0.0)
        t = []
        for a in range(3):
            t.append(dm_all * cq[:, a][:, None, None, None])
        for a in range(3):
            t.append(dm_all * rbxc[a])
        rr = [rbxc[a] - rxcbarn[n, a] for a in range(3)]
        six = [(cq[:, a] - cbarn[n, a])[:, None, None, None]
               for a in range(3)] + rr
        for (ia, ib) in ztri:
            t.append(((delta_q * six[ia]) * six[ib]) * mf_f)
        t.append(jnp.zeros_like(dm_all))          # sump row (passive)
        return jnp.stack(t)

    if rr_seeds is not None:
        seedB = jnp.zeros((N, 8, 28), dtype)
        seedB = seedB.at[:, :, 0:3].set(rr_seeds[:, :, 1:4])
        seedB = seedB.at[:, :, 3:6].set(rr_seeds[:, :, 4:7])
    else:
        seedB = jnp.zeros((N, 28), dtype)
        if f0_corr is not None:
            seedB = seedB.at[:, 0:3].set(f0_corr)
        if t0_corr is not None:
            seedB = seedB.at[:, 3:6].set(t0_corr)
    redB = ordered_reduce_batched(R, params.a0, size, Ds, 28, termsB,
                                  seedB, dtype, batch_size)
    f0 = redB[:, 0:3]
    t0 = redB[:, 3:6]
    zeta21 = redB[:, 6:27]
    return sumw, cbarn, rxcbarn, dmn, f0, t0, zeta21


def bbl_step_exact(f: jnp.ndarray, R, V, W, model: LatticeModel,
                   params: ColloidParams, size,
                   ext_force=None, ext_torque=None, rho0: float = 1.0,
                   rr_seeds=None, deltam=None, f0_corr=None,
                   t0_corr=None, M=None, pid_inside=None,
                   batch_size=16):
    """Batched reference-bitwise BBL for passive periodic suspensions.

    Same contract as colloids.bbl_step (which it matches bitwise, see
    test_colloids_fast), but the per-particle link sums run through the
    batched reference-order reductions of bbl_link_sums_exact instead
    of a Python loop over N - O(N * cube) cost with bounded memory, so
    1000-particle suspensions (serial-lubr-tf1 class) get the same
    near-zero [total] momentum cancellation as the reference
    (ref: bbl.c pass1/pass2, bbl_update_colloids:750-880)."""
    N = params.n
    rcs2 = 1.0 / CS2
    nvel = model.nvel
    if pid_inside is None:
        pid, inside = build_map_fast(R, params, size)
    else:
        pid, inside = pid_inside
    fluid = jnp.logical_not(inside)
    sumw, cbarn, rxcbarn, dmn, f0, t0, zeta21 = bbl_link_sums_exact(
        f, R, model, params, size, rho0=rho0, rr_seeds=rr_seeds,
        deltam=deltam, f0_corr=f0_corr, t0_corr=t0_corr,
        pid_inside=(pid, inside), batch_size=batch_size)

    # mass/moment with the reference's rounding: moment is computed
    # FROM the rounded mass (ref: bbl.c:786-787)
    _mass_vals = [(4.0 / 3.0) * float(np.pi) * params.rho0 * a ** 3
                  for a in params.a0]
    mass = jnp.asarray(_mass_vals, f.dtype)
    moment = jnp.asarray([(2.0 / 5.0) * mv_ * a ** 2
                          for mv_, a in zip(_mass_vals, params.a0)],
                         f.dtype)

    ztri = [(ia, ib) for ia in range(6) for ib in range(ia, 6)]
    A = jnp.zeros((N, 6, 6), f.dtype)
    for k, (ia, ib) in enumerate(ztri):
        A = A.at[:, ia, ib].set(zeta21[:, k])
        if ia != ib:
            A = A.at[:, ib, ia].set(zeta21[:, k])
    A = A + jax.vmap(jnp.diag)(
        jnp.concatenate([jnp.tile(mass[:, None], (1, 3)),
                         jnp.tile(moment[:, None], (1, 3))], axis=1))
    fe = (jnp.zeros((N, 3), f.dtype) if ext_force is None else ext_force)
    te = (jnp.zeros((N, 3), f.dtype) if ext_torque is None
          else ext_torque)
    b = jnp.concatenate([mass[:, None] * V + f0 + fe,
                         moment[:, None] * W + t0 + te], axis=1)
    x = jax.vmap(gauss_solve6_ref)(A, b)
    Vn, Wn = x[:, :3], x[:, 3:]
    Mn = (jax.vmap(rotate_vector)(M, Wn) if M is not None else None)

    # pass 2 (ref: bbl.c pass2).  dms accumulates INTERLEAVED like the
    # reference: v0 cb0 + w0 rx0 + v1 cb1 + ... (per-term order matters
    # for the last-ulp of near-zero cancellations)
    dms = None
    for a in range(3):
        t1 = Vn[:, a] * cbarn[:, a]
        dms = t1 if dms is None else dms + t1
        dms = dms + Wn[:, a] * rxcbarn[:, a]
    dms = 2.0 * rcs2 * rho0 * dms
    dms_pad = jnp.concatenate([dms, jnp.zeros((1,), f.dtype)])
    dmn_pad = jnp.concatenate([dmn, jnp.zeros((1,), f.dtype)])
    Vp = jnp.concatenate([Vn, jnp.zeros((1, 3), f.dtype)])
    Wp = jnp.concatenate([Wn, jnp.zeros((1, 3), f.dtype)])
    coords = site_coords(size, f.dtype)
    L = jnp.asarray(np.array(size, np.float64), f.dtype)
    fout = f
    for q in range(1, nvel):
        c = model.cv[q]
        sh = tuple(-int(v) for v in c)
        inside_n = roll3(inside, sh)
        pid_n = roll3(pid, sh)
        m = jnp.logical_and(fluid, inside_n)
        w = float(model.wv[q])
        ownp = jnp.where(m, pid_n, N)
        own = jnp.clip(pid_n, 0, N - 1)
        Ro = jnp.moveaxis(R[own], -1, 0)
        d = _min_image(coords - Ro, L[:, None, None, None])
        rb = [d[a] + 0.5 * float(c[a]) for a in range(3)]
        Vo = jnp.moveaxis(Vp[ownp], -1, 0)
        Wo = jnp.moveaxis(Wp[ownp], -1, 0)
        wxrb = [Wo[1] * rb[2] - Wo[2] * rb[1],
                Wo[2] * rb[0] - Wo[0] * rb[2],
                Wo[0] * rb[1] - Wo[1] * rb[0]]
        vdotc = sum((Vo[a] + wxrb[a]) * float(c[a]) for a in range(3))
        vdotc = 2.0 * rcs2 * w * vdotc
        df = (rho0 * vdotc + w * dmn_pad[ownp]) - w * dms_pad[ownp]
        qr = int(model.reverse[q])
        shift = tuple(int(v) for v in model.cv[q])
        val_at_j = roll3(jnp.where(m, f[q] - df, 0.0), shift)
        mask_at_j = roll3(m, shift)
        fout = fout.at[qr].set(jnp.where(mask_at_j, val_at_j, fout[qr]))

    return fout, Vn, Wn, Mn, jnp.zeros((3,), f.dtype)


# ---------------------------------------------------------------------------
# MXU-native link sums: segment reduction as one-hot matmul

def seg_cols_mxu(cols: jnp.ndarray, ids: jnp.ndarray, nseg: int):
    """Segment-sum of a (C, nsite) column stack via one-hot matmul.

    TPU scatters serialize (~3 ms per segment_sum at 64^3/1000 bins on
    v5); the MXU does the same reduction as (C, nsite) @ (nsite, nseg)
    in ~1 ms for 30 columns.  The one-hot factor is exactly 0/1, so
    with precision=HIGHEST every product is exact and the result
    matches segment_sum to f32 accumulation order."""
    oh = jax.nn.one_hot(ids.reshape(-1), nseg, dtype=cols.dtype)
    return jax.lax.dot_general(cols.reshape(cols.shape[0], -1), oh,
                               (((1,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST)


def bbl_step_mxu(f: jnp.ndarray, R, V, W, model: LatticeModel,
                 params: ColloidParams, size,
                 ext_force=None, ext_torque=None, rho0: float = 1.0,
                 deltam=None, f0_corr=None, t0_corr=None, M=None,
                 pid_inside=None, walls=(False, False, False),
                 wall_drag=None, cands=None, cube=None):
    """bbl_step_fast restructured for the MXU (same contract/values to
    f32 rounding; ref: bbl.c pass1/pass2, bbl_update_colloids:750-880).

    Two structural changes vs the segment-sum version:
    1. every link value is rolled to the link's INSIDE site j = s + c,
       so all velocities share ONE segmentation (pid at inside sites)
       and the whole pass-A/B reduction is a single one-hot matmul;
    2. the owner geometry d = min_image(x_j - R[pid_j]) is gathered
       once and reused for every velocity (rb at the fluid site equals
       d_j - c/2), replacing nvel per-velocity gathers.
    The zeta quadratic form is assembled from raw moments:
      sum m (w6_a - B_a)(w6_b - B_b)
        = S2_ab - B_a S1_b - B_b S1_a + B_a B_b S0
    with B = (cbarn, rxcbarn) constant within a segment."""
    N = params.n
    rcs2 = 1.0 / CS2
    nvel = model.nvel
    dtype = f.dtype
    if pid_inside is None:
        pid, inside = build_map_fast(R, params, size)
    else:
        pid, inside = pid_inside
    fluid = jnp.logical_not(inside)
    coords = site_coords(size, dtype)
    L = jnp.asarray(np.array(size, np.float64), dtype)

    ids0 = jnp.where(inside, pid, N)
    own = jnp.clip(pid, 0, N - 1)
    d = _min_image(coords - jnp.moveaxis(R[own], -1, 0),
                   L[:, None, None, None])

    # squirmer (active) slip terms (ref: bbl.c pass1 squirmer section,
    # bbl_active_conservation): per-site owner gathers of the swim
    # direction and b1/b2 make the slip dm_a elementwise at the inside
    # site, so activity costs 4 extra reduction columns per velocity
    any_active = any(params.is_active(n) for n in range(N))
    if any_active:
        b1_np = np.zeros(N)
        b1_np[:len(params.b1)] = np.asarray(params.b1, np.float64)
        b2_np = np.zeros(N)
        b2_np[:len(params.b2)] = np.asarray(params.b2, np.float64)
        if M is None:
            m_np = np.asarray(params.m, np.float64)
            m_np = m_np / np.linalg.norm(m_np, axis=1, keepdims=True)
            Muse = jnp.asarray(m_np, dtype)
        else:
            Muse = M
        mvj = jnp.moveaxis(Muse[own], -1, 0)              # (3, size)
        b1j = jnp.asarray(b1_np, dtype)[own]
        b2j = jnp.asarray(b2_np, dtype)[own]

        def squirm_dma(rbj, c, delta):
            """Slip dm_a at the inside site (same arithmetic as the
            per-particle _squirm_dma in colloids.py)."""
            rbmod = jnp.sqrt(rbj[0] ** 2 + rbj[1] ** 2 + rbj[2] ** 2)
            mmod = jnp.sqrt(mvj[0] ** 2 + mvj[1] ** 2 + mvj[2] ** 2)
            mod = rbmod * mmod
            rmod = jnp.where(mod == 0.0, 0.0,
                             1.0 / jnp.where(mod == 0.0, 1.0, mod))
            rdotm = (rbj[0] * mvj[0] + rbj[1] * mvj[1]
                     + rbj[2] * mvj[2])
            cost = rmod * rdotm
            cost = jnp.where(cost * cost > 1.0, 1.0, cost)
            sint = jnp.sqrt(1.0 - cost * cost)
            v1 = [rbj[1] * mvj[2] - rbj[2] * mvj[1],
                  rbj[2] * mvj[0] - rbj[0] * mvj[2],
                  rbj[0] * mvj[1] - rbj[1] * mvj[0]]
            tans = [v1[1] * rbj[2] - v1[2] * rbj[1],
                    v1[2] * rbj[0] - v1[0] * rbj[2],
                    v1[0] * rbj[1] - v1[1] * rbj[0]]
            tmod = jnp.sqrt(tans[0] ** 2 + tans[1] ** 2
                            + tans[2] ** 2)
            rtmod = jnp.where(tmod == 0.0, 0.0,
                              1.0 / jnp.where(tmod == 0.0, 1.0, tmod))
            pleg = -sint * (b2j * cost + b1j)
            dma = 0.0
            for a in range(3):
                if c[a]:
                    dma = dma + ((-delta) * pleg * rtmod * tans[a]
                                 * float(c[a]))
            return dma if not isinstance(dma, float) \
                else jnp.zeros_like(b1j)

    # per-q columns at the inside site j (value of the link whose
    # fluid end is at j - c):  [S0, Sr(3), Sf, Sfr(3), Srr(6),
    # Scc, Sccr(3)] -> 18 columns
    # colloid-wall links (LINK_BOUNDARY): a link whose fluid end sits
    # on a walled face and wraps is a virtual momentum transfer with
    # dm = w rho0 + f(j, ji) and no pass-2 write (ref: build.c:547,
    # bbl.c pass1 'else'; same construction as colloids.build_links)
    has_walls = any(walls)
    crossq = {}
    if has_walls:
        for q in range(1, nvel):
            c = model.cv[q]
            crossnp = np.zeros(tuple(size), bool)
            for a in range(3):
                if walls[a] and int(c[a]) != 0:
                    sel = [slice(None)] * 3
                    sel[a] = (size[a] - 1) if int(c[a]) > 0 else 0
                    crossnp[tuple(sel)] = True
            crossq[q] = (jnp.asarray(crossnp) if crossnp.any()
                         else None)

    cols = []
    percol = []          # bookkeeping: (q, kind) per column block
    rbxcs = []
    masks = []
    dmas = []
    gw_acc = [jnp.zeros((), dtype) for _ in range(3)]
    for q in range(1, nvel):
        c = model.cv[q]
        shift = tuple(int(v) for v in c)
        fl_ok = fluid
        if has_walls and crossq[q] is not None:
            fl_ok = jnp.logical_and(fluid, jnp.logical_not(crossq[q]))
        mj = jnp.logical_and(inside, roll3(fl_ok, shift)).astype(dtype)
        rbj = [d[a] - 0.5 * float(c[a]) for a in range(3)]
        rbxc = [rbj[1] * float(c[2]) - rbj[2] * float(c[1]),
                rbj[2] * float(c[0]) - rbj[0] * float(c[2]),
                rbj[0] * float(c[1]) - rbj[1] * float(c[0])]
        fqr = roll3(f[q], shift)
        mcc = jnp.logical_and(
            jnp.logical_and(inside, roll3(inside, shift)),
            roll3(pid, shift) != pid).astype(dtype)
        dmcc = fqr + f[int(model.reverse[q])]
        if has_walls and crossq[q] is not None:
            # fold the colloid-wall virtual links into the cc columns
            # (same downstream treatment: f0/t0 only, no zeta)
            w_ = float(model.wv[q])
            mw = jnp.logical_and(inside,
                                 roll3(crossq[q], shift)).astype(dtype)
            dmw = w_ * rho0 + f[int(model.reverse[q])]
            mcc = mcc + mw
            dmcc = jnp.where(mw > 0.0, dmw, dmcc)
            for a in range(3):
                ca = float(model.cv[q][a])
                if ca:
                    gw_acc[a] = gw_acc[a] - ca * jnp.sum(
                        mw * (dmw - 2.0 * w_))
        qc = [mj]
        qc += [mj * rbxc[a] for a in range(3)]
        qc.append(mj * fqr)
        qc += [mj * fqr * rbxc[a] for a in range(3)]
        qc += [mj * rbxc[ia] * rbxc[ib]
               for ia in range(3) for ib in range(ia, 3)]
        qc.append(mcc * dmcc)
        qc += [mcc * dmcc * rbxc[a] for a in range(3)]
        if any_active:
            w = float(model.wv[q])
            dma = squirm_dma(rbj, c, 2.0 * rcs2 * w * rho0) * mj
            qc.append(dma)
            qc += [dma * rbxc[a] for a in range(3)]
            dmas.append(dma)
        cols.append(jnp.stack(qc))
        rbxcs.append(rbxc)
        masks.append(mj)
    NC = cols[0].shape[0]                      # 18
    if cands is not None:
        # pillar-local reduction over the build's candidate lists
        # (nseg/cap-fold fewer one-hot matmul FLOPs than the global
        # one-hot; per-q folds keep the copies Z-minor)
        red = seg_cols_cubes(cols, ids0, cands, size, cube, N + 1)
    else:
        red = seg_cols_mxu(jnp.concatenate(cols, axis=0), ids0, N + 1)
    red = red[:, :N].reshape(nvel - 1, NC, N)  # (q, col, particle)

    S0 = red[:, 0]                             # (q, N) link count
    Sr = red[:, 1:4]                           # (q, 3, N)
    Sf = red[:, 4]
    Sfr = red[:, 5:8]
    Srr = red[:, 8:14]                         # sym pairs 00,01,02,11,12,22
    Scc = red[:, 14]
    Sccr = red[:, 15:18]
    if any_active:
        Sdma = red[:, 18]                      # (q, N) slip sums
        Sdmar = red[:, 19:22]                  # (q, 3, N)

    cq = np.asarray(model.cv[1:], np.float64)  # (q, 3)
    wq = np.asarray(model.wv[1:], np.float64)
    cqj = jnp.asarray(cq, dtype)
    wqj = jnp.asarray(wq, dtype)

    # pass A totals
    sumw = jnp.einsum("q,qn->n", wqj, S0)
    sumw = jnp.maximum(sumw, 1e-30)
    rsumw = 1.0 / sumw
    cbar = jnp.einsum("q,qa,qn->an", wqj, cqj, S0)
    rxcbar = jnp.einsum("q,qan->an", wqj, Sr)
    cbarn = cbar * rsumw[None]                 # (3, N)
    rxcbarn = rxcbar * rsumw[None]
    dmn = (deltam * rsumw if deltam is not None
           else jnp.zeros((N,), dtype))

    # pass B: f0/t0 from raw moments (dm = 2 f[q] - w dmn[own])
    sdm = 2.0 * Sf - wqj[:, None] * dmn[None] * S0          # (q, N)
    f0 = jnp.einsum("qa,qn->na", cqj, sdm)
    t0 = jnp.moveaxis(2.0 * Sfr
                      - wqj[:, None, None] * dmn[None, None] * Sr,
                      -1, 0).sum(axis=1)                     # (N, 3)
    # solid-solid virtual links
    f0 = f0 + jnp.einsum("qa,qn->na", cqj, Scc)
    t0 = t0 + jnp.moveaxis(Sccr, -1, 0).sum(axis=1)
    if any_active:
        # squirmer slip contributions + active mass conservation
        # (ref: bbl.c pass1 active terms; bbl_active_conservation:
        # fc0 = -sump_n sum w c, tc0 = -sump_n sum w rb x c)
        f0 = f0 + jnp.einsum("qa,qn->na", cqj, Sdma)
        t0 = t0 + jnp.moveaxis(Sdmar, -1, 0).sum(axis=1)
        sump_n = jnp.sum(Sdma, axis=0) * rsumw             # (N,)
        fc0 = -(sump_n[None] * cbar).T                     # (N, 3)
        tc0 = -(sump_n[None] * rxcbar).T

    # zeta from raw moments; w6 = (c0, c1, c2, rbxc0, rbxc1, rbxc2),
    # B = (cbarn, rxcbarn)
    delta = (2.0 * rcs2 * rho0) * wqj                        # (q,)
    _sympair = {(0, 0): 0, (0, 1): 1, (0, 2): 2,
                (1, 1): 3, (1, 2): 4, (2, 2): 5}
    zeta = jnp.zeros((N, 6, 6), dtype)
    for ia in range(6):
        for ib in range(ia, 6):
            if ia < 3 and ib < 3:
                s2 = (cqj[:, ia] * cqj[:, ib])[:, None] * S0
                s1a = cqj[:, ia][:, None] * S0
                s1b = cqj[:, ib][:, None] * S0
            elif ia < 3:
                s2 = cqj[:, ia][:, None] * Sr[:, ib - 3]
                s1a = cqj[:, ia][:, None] * S0
                s1b = Sr[:, ib - 3]
            else:
                s2 = Srr[:, _sympair[(ia - 3, ib - 3)]]
                s1a = Sr[:, ia - 3]
                s1b = Sr[:, ib - 3]
            Ba = cbarn[ia] if ia < 3 else rxcbarn[ia - 3]     # (N,)
            Bb = cbarn[ib] if ib < 3 else rxcbarn[ib - 3]
            val = jnp.einsum("q,qn->n",
                             delta, s2) \
                - Ba * jnp.einsum("q,qn->n", delta, s1b) \
                - Bb * jnp.einsum("q,qn->n", delta, s1a) \
                + Ba * Bb * jnp.einsum("q,qn->n", delta, S0)
            zeta = zeta.at[:, ia, ib].set(val)
    zeta = zeta + jnp.transpose(jnp.triu(zeta, 1), (0, 2, 1))

    mass = jnp.asarray([(4.0 / 3.0) * np.pi * params.rho0 * a ** 3
                        for a in params.a0], dtype)
    moment = jnp.asarray([(2.0 / 5.0) * (4.0 / 3.0) * np.pi
                          * params.rho0 * a ** 5 for a in params.a0],
                         dtype)
    A = zeta + jax.vmap(jnp.diag)(
        jnp.concatenate([jnp.tile(mass[:, None], (1, 3)),
                         jnp.tile(moment[:, None], (1, 3))], axis=1))
    if wall_drag is not None:
        # wall lubrication correction on the translational diagonal
        # (ref: bbl.c:789-805 a[i][i] = mass + zeta - dwall)
        A = A - jax.vmap(jnp.diag)(
            jnp.concatenate([wall_drag,
                             jnp.zeros((N, 3), dtype)], axis=1))
    fe = (jnp.zeros((N, 3), dtype) if ext_force is None else ext_force)
    te = (jnp.zeros((N, 3), dtype) if ext_torque is None
          else ext_torque)
    if f0_corr is not None:
        fe = fe + f0_corr
    if t0_corr is not None:
        te = te + t0_corr
    if any_active:
        fe = fe + fc0
        te = te + tc0
    b = jnp.concatenate(
        [mass[:, None] * V + f0 + fe,
         moment[:, None] * W + t0 + te], axis=1)
    x = jax.vmap(solve6)(A, b)
    Vn, Wn = x[:, :3], x[:, 3:]
    Mn = (jax.vmap(rotate_vector)(M, Wn) if M is not None else None)

    # pass 2, elementwise at the inside site with shared gathers
    dms = 2.0 * rcs2 * rho0 * (
        jnp.sum(Vn * cbarn.T, axis=1) + jnp.sum(Wn * rxcbarn.T, axis=1))
    Vj = jnp.moveaxis(Vn[own], -1, 0)          # (3, size)
    Wj = jnp.moveaxis(Wn[own], -1, 0)
    dmn_j = dmn[own]
    dms_j = dms[own]
    sump_j = sump_n[own] if any_active else None
    fout = f
    for iq, q in enumerate(range(1, nvel)):
        c = model.cv[q]
        shift = tuple(int(v) for v in c)
        mj = masks[iq] > 0.0
        rbxc = rbxcs[iq]
        rbj = [d[a] - 0.5 * float(c[a]) for a in range(3)]
        wxrb = [Wj[1] * rbj[2] - Wj[2] * rbj[1],
                Wj[2] * rbj[0] - Wj[0] * rbj[2],
                Wj[0] * rbj[1] - Wj[1] * rbj[0]]
        vdotc = sum((Vj[a] + wxrb[a]) * float(c[a]) for a in range(3))
        w = float(model.wv[q])
        df = (rho0 * 2.0 * rcs2 * w * vdotc + w * dmn_j - w * dms_j)
        if any_active:
            # slip applied to the outgoing distribution
            # (ref: pass1 fdist += dm_a) and the pass2 mass term
            # (ref: pass2 df += wv sump)
            df = df + w * sump_j
        qr = int(model.reverse[q])
        val_at_j = roll3(f[q], shift) - df
        if any_active:
            val_at_j = val_at_j + dmas[iq]
            inv = tuple(-int(v) for v in c)
            fout = fout.at[q].add(roll3(dmas[iq], inv))
        fout = fout.at[qr].set(jnp.where(mj, val_at_j, fout[qr]))

    return fout, Vn, Wn, Mn, jnp.stack(gw_acc)


def cubes_supported(params: ColloidParams, size, cube=None):
    """The pillar edge build_map_cubes can use for this suspension, or
    None if none fits (callers then fall back to build_map_fast).

    Blocks are (cube, cube, Z) pillars - full z extent, so the folded
    layout keeps Z as the (TPU-tiling-friendly) minor dimension.  A
    particle window must overlap at most 2 pillars per horizontal
    axis, so the pillar edge must be >= w-1 = 2*(rmax+1) sites and
    divide the x and y extents."""
    rmax = int(np.ceil(float(np.max(params.a0))))
    wm1 = 2 * (rmax + 1)
    if cube is not None:
        ok = (cube >= wm1 and int(size[0]) % cube == 0
              and int(size[1]) % cube == 0)
        return cube if ok else None
    for c in (8, 16, 32, 64):
        if c >= wm1 and int(size[0]) % c == 0 and int(size[1]) % c == 0:
            return c
    return None


def cube_fold(arr: jnp.ndarray, size, cube: int):
    """(..., X, Y, Z) -> (..., npillars, cube*cube*Z) in
    build_map_cubes' pillar order (S runs (ox, oy, z) row-major; the
    minor dimension stays Z, so the fold transposes cleanly under the
    TPU's (8, 128) tiling - a (cube^3) block order would put an
    8-element axis minor and pad every copy 16x)."""
    X, Y, Z = (int(s) for s in size)
    ncx, ncy = X // cube, Y // cube
    lead = arr.shape[:-3]
    nl = len(lead)
    a = arr.reshape(lead + (ncx, cube, ncy, cube, Z))
    perm = tuple(range(nl)) + tuple(nl + p for p in (0, 2, 1, 3, 4))
    a = jnp.transpose(a, perm)
    return a.reshape(lead + (ncx * ncy, cube * cube * Z))


def seg_cols_cubes(cols: jnp.ndarray, ids: jnp.ndarray,
                   cand: jnp.ndarray, size, cube: int, nseg: int):
    """Segment-sum of (C, X, Y, Z) columns via pillar-local one-hot
    matmuls + a tiny scatter over the candidate lists.

    The global one-hot of seg_cols_mxu is (nsite, nseg) ~ 1 GB at
    64^3/N=1000 and the reduction pays ~6 bf16 passes over it at
    HIGHEST precision.  With the pillar decomposition every segment id
    present in a block is on that block's candidate list, so the same
    reduction is a batched (C, S) @ (S, cap) per pillar (one-hot
    (npil, S, cap), nseg/cap-fold smaller) followed by a segment-sum
    of npil*cap partials."""
    if isinstance(cols, (list, tuple)):
        # pre-folded per-q stacks: folding BEFORE the concatenate keeps
        # every copy in a Z-minor layout (a single post-concat fold
        # tempts XLA into a transposed concat layout whose minor dim is
        # the 8-wide pillar axis - every operand copy then pads 128x)
        colsq = jnp.concatenate(
            [cube_fold(c_, size, cube) for c_ in cols], axis=0)
    else:
        colsq = cube_fold(cols, size, cube)              # (C, np, S)
    C = colsq.shape[0]
    npil = cand.shape[0]
    cap = cand.shape[1]
    idsq = cube_fold(ids, size, cube)                    # (np, S)
    oh = (idsq[:, :, None] == cand[:, None, :]).astype(colsq.dtype)
    part = jax.lax.dot_general(
        jnp.moveaxis(colsq, 1, 0), oh,
        (((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST)             # (np, C, cap)
    gids = jnp.where(cand < nseg, cand, nseg - 1).reshape(-1)
    out = jax.ops.segment_sum(
        jnp.moveaxis(part, 1, 0).reshape(C, npil * cap).T, gids,
        num_segments=nseg)                               # (nseg, C)
    return out.T


def cubes_count_max(R, params: ColloidParams, size, cube: int) -> int:
    """Eager (host) max candidate count over pillars for this
    configuration - the cell-occupancy probe callers use to size
    build_map_cubes' `cap` with headroom instead of silently dropping
    candidates on overflow (the analogue of the reference's
    cell-capacity sizing, colloids_rt.c:600)."""
    R = np.asarray(R)
    N = R.shape[0]
    X, Y, Z = (int(s) for s in size)
    ncx, ncy = X // cube, Y // cube
    npil = ncx * ncy
    rmax = int(np.ceil(float(np.max(params.a0))))
    w = 2 * (rmax + 1) + 1
    corner = np.floor(R).astype(np.int64) - (rmax + 1)
    c0 = corner // cube
    c1 = (corner + (w - 1)) // cube
    cx0, cx1 = c0[:, 0] % ncx, c1[:, 0] % ncx
    cy0, cy1 = c0[:, 1] % ncy, c1[:, 1] % ncy
    counts = np.zeros(npil + 1, np.int64)
    for dx in (0, 1):
        for dy in (0, 1):
            cx = cx1 if dx else cx0
            cy = cy1 if dy else cy0
            pil = cx * ncy + cy
            drop = np.zeros(N, bool)
            if dx:
                drop |= cx1 == cx0
            if dy:
                drop |= cy1 == cy0
            np.add.at(counts, np.where(drop, npil, pil), 1)
    return int(counts[:npil].max()) if npil else 0


def build_map_cubes(R: jnp.ndarray, params: ColloidParams, size,
                    cube: int = 8, cap: int = 256,
                    return_cands: bool = False):
    """Scatter-free build_map: pillar-decomposed candidate lists +
    dense per-pillar distance evaluation.

    TPU scatters serialize, so build_map_fast's two O(N w^3)
    scatter-min passes dominate the suspension rebuild.  This is the
    cell-list formulation (ref: colloids.h:95-122 cell lists,
    build.c:75 build_update_map) recast for the VPU: the lattice is
    partitioned into (cube, cube, Z) pillars, each particle's window
    is binned into the <= 4 pillars it can overlap (one sort of 4N
    keys), and every pillar evaluates its <= `cap` candidates densely
    - (npillars, cap, cube^2 Z) elementwise work, no scatters or big
    gathers.  Results (pid, inside) match build_map_fast exactly
    (same nearest-centre, lowest-index tie-break).

    With return_cands, also returns the (npillars, cap) candidate
    lists (pid or N padding) for seg_cols_cubes reductions.

    `cap` bounds candidates per pillar: a pillar's catchment is the
    (cube + 2 rmax)^2 * Z box, so for a0 ~ 2.3 suspensions at 20%
    volume fraction the mean is ~70; overflow would silently drop the
    highest particle ids in a block, so callers keep the default
    generous (the analogue of the reference's cell-capacity sizing,
    colloids_rt.c:600).
    """
    N = R.shape[0]
    X, Y, Z = (int(s) for s in size)
    ncx, ncy = X // cube, Y // cube
    assert X % cube == 0 and Y % cube == 0
    npil = ncx * ncy
    cap = min(cap, N)
    rmax = int(np.ceil(float(np.max(params.a0))))
    w = 2 * (rmax + 1) + 1
    # the 4-corner binning below assumes a window overlaps at most 2
    # pillars per axis; larger radii need a larger pillar edge
    # (cubes_supported)
    assert w - 1 <= cube, (w, cube)
    a2 = jnp.asarray(np.array(params.a0, np.float64) ** 2, R.dtype)

    corner = jnp.floor(R).astype(jnp.int32) - (rmax + 1)      # (N, 3)
    c0 = jnp.floor_divide(corner, cube)
    c1 = jnp.floor_divide(corner + (w - 1), cube)
    # Dedup the 4 window corners per particle BEFORE binning: when the
    # window does not straddle a pillar boundary on an axis (cube >
    # w-1), or when it wraps onto the same pillar (ncx or ncy == 1),
    # two corners land on one pillar and the particle would appear
    # TWICE on that pillar's candidate list - seg_cols_cubes would then
    # double-count its whole BBL reduction.  Compare WRAPPED pillar
    # coords so both cases are caught; dropped corners get the npil
    # sentinel, which sorts past every real pillar range.
    cx0 = jnp.mod(c0[:, 0], ncx)
    cx1 = jnp.mod(c1[:, 0], ncx)
    cy0 = jnp.mod(c0[:, 1], ncy)
    cy1 = jnp.mod(c1[:, 1], ncy)
    dupx = cx1 == cx0
    dupy = cy1 == cy0
    pillar_ids = []
    for dx in (0, 1):
        for dy in (0, 1):
            cx = cx1 if dx else cx0
            cy = cy1 if dy else cy0
            pil = cx * ncy + cy
            drop = False
            if dx:
                drop = dupx
            if dy:
                drop = jnp.logical_or(drop, dupy) if dx else dupy
            if dx or dy:
                pil = jnp.where(drop, jnp.int32(npil), pil)
            pillar_ids.append(pil)
    cid = jnp.concatenate(pillar_ids)                         # (4N,)
    pid4 = jnp.tile(jnp.arange(N, dtype=jnp.int32), 4)
    order = jnp.argsort(cid)
    scid = cid[order]
    spid = pid4[order]
    starts = jnp.searchsorted(scid, jnp.arange(npil,
                                               dtype=scid.dtype))
    ends = jnp.searchsorted(scid, jnp.arange(npil,
                                             dtype=scid.dtype),
                            side="right")
    idx = starts[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
    valid = idx < ends[:, None]
    cand = jnp.where(valid, spid[jnp.clip(idx, 0, 4 * N - 1)],
                     jnp.int32(N))                            # (np, cap)

    # dense per-pillar distances (min-image via periodic wrap)
    cown = jnp.clip(cand, 0, N - 1)
    Rc = R[cown]                                              # (np,cap,3)
    a2c = jnp.where(cand < N, a2[cown], -1.0)
    qx, qy = np.meshgrid(np.arange(ncx), np.arange(ncy),
                         indexing="ij")
    origin = np.stack([qx.reshape(-1) * cube,
                       qy.reshape(-1) * cube], 1)             # (np, 2)
    ox, oy, oz = np.meshgrid(np.arange(cube), np.arange(cube),
                             np.arange(Z), indexing="ij")
    offs = np.stack([ox.reshape(-1), oy.reshape(-1),
                     oz.reshape(-1)], 1)                      # (S, 3)
    S = cube * cube * Z
    r2 = jnp.zeros((npil, cap, S), R.dtype)
    for a in range(3):
        if a < 2:
            site_a = jnp.asarray(origin[:, a:a + 1]
                                 + offs[None, :, a], R.dtype)
        else:
            site_a = jnp.asarray(
                np.broadcast_to(offs[None, :, 2], (npil, S)), R.dtype)
        da = site_a[:, None, :] - Rc[:, :, a:a + 1]           # (np,cap,S)
        La = float(size[a])
        da = da - La * jnp.round(da / La)
        r2 = r2 + da * da
    hit = r2 < a2c[:, :, None]
    r2m = jnp.where(hit, r2, jnp.inf)
    best = jnp.min(r2m, axis=1)                               # (np, S)
    pcand = jnp.where(jnp.logical_and(hit, r2m <= best[:, None, :]),
                      cand[:, :, None], jnp.int32(N))
    bestpid = jnp.min(pcand, axis=1)                          # (np, S)
    lat = bestpid.reshape(ncx, ncy, cube, cube, Z)
    lat = jnp.transpose(lat, (0, 2, 1, 3, 4)).reshape(size)
    inside = lat < N
    pid = jnp.where(inside, lat, -1).astype(jnp.int32)
    if return_cands:
        return pid, inside, cand
    return pid, inside
