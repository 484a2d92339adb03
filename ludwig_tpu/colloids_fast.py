"""Suspension-scale colloid BBL: segment-sum formulation.

The per-particle path in colloids.py unrolls N x nvel masked
whole-lattice reductions - exact, but O(N) lattice passes and an O(N)
trace blow-up (fine for the 1-3 particle regression geometries, not for
suspensions).  This module computes every per-particle link sum with
gathers (R[pid], cbar[pid]) and `jax.ops.segment_sum` over the lattice,
so the cost is O(nvel) lattice passes independent of N (ref: the same
pass0/1/2 algorithm, bbl.c bbl_pass1/bbl_update_colloids/bbl_pass2;
VERDICT round-1 'rescale colloids to suspensions').

Scope: passive (non-squirmer) particles, periodic boundaries (no wall
links), same corrections interface as colloids.bbl_step.  The slow path
remains the reference-bitwise oracle for small N; equivalence is tested
against it (tests/test_colloids_fast.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ludwig_tpu.colloids import (ColloidParams, _min_image, rotate_vector,
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
    wxr = jnp.stack([Wo[1] * d[2] - Wo[2] * d[1],
                     Wo[2] * d[0] - Wo[0] * d[2],
                     Wo[0] * d[1] - Wo[1] * d[0]])
    ub = Vo + wxr
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

    def seg(values, ids):
        return jax.ops.segment_sum(values.reshape(-1), ids,
                                   num_segments=N + 1)[:N]

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

    deltam = (-seg(cov * (rho_f - rho0), ids_cov)
              + seg(unc * (rho_n - rho0), ids_unc))
    f0c = jnp.stack([seg(cov * g_f[a], ids_cov)
                     - seg(unc * g_n[a], ids_unc)
                     for a in range(3)], axis=1)

    def rbx(ga, d, w8, ids):
        return [seg(w8 * (d[1] * ga[2] - d[2] * ga[1]), ids),
                seg(w8 * (d[2] * ga[0] - d[0] * ga[2]), ids),
                seg(w8 * (d[0] * ga[1] - d[1] * ga[0]), ids)]

    tcov = rbx(g_f, d_cov, cov, ids_cov)
    tunc = rbx(g_n, d_unc, unc, ids_unc)
    t0c = jnp.stack([tcov[a] - tunc[a] for a in range(3)], axis=1)

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
