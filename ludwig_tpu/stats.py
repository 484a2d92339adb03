"""Statistics / observables layer: the reference's log contract.

TPU-native equivalent of the reference statistics modules (ref:
src/stats_distribution.c:113 [rho] line, src/phi_stats.c:336 [phi] line,
src/stats_free_energy.c:130 [fed] block, src/stats_velocity.c:116
velocity block, src/ludwig.c:1039-1087 momentum block).  The rank-0 log
IS the regression interface - formats are reproduced exactly so
reference-style floating-point diffs can be applied to our output.

All reductions are single jitted programs; on a sharded lattice XLA
emits the cross-device sums (the psum analogue of the reference's
MPI_Reduce with compensated sums).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ludwig_tpu.lattice import LatticeModel
from ludwig_tpu.lb import hydro_fields


def _compensated_stats(x: jnp.ndarray,
                       fluid_mask: Optional[jnp.ndarray] = None):
    """(total, mean, var, min, max) via the shifted two-pass algorithm.

    Naive sum + E[x^2]-E[x]^2 loses ~n*eps through sequential
    accumulation and catastrophic cancellation; the reference solves this
    with Kahan/Klein compensated MPI reductions (ref: util_sum.h:22-42).
    Here: a provisional mean, then exact-to-eps sums of (x - mean0) and
    (x - mean0)^2 - same log precision, fully vectorisable.
    """
    if fluid_mask is None:
        n = jnp.asarray(float(x.size), x.dtype)
        mean0 = jnp.mean(x)
        d = x - mean0
        corr = jnp.sum(d)
        sq = jnp.sum(d * d)
        xmin, xmax = jnp.min(x), jnp.max(x)
    else:
        n = jnp.sum(fluid_mask).astype(x.dtype)
        xm = jnp.where(fluid_mask, x, 0.0)
        mean0 = jnp.sum(xm) / n
        d = jnp.where(fluid_mask, x - mean0, 0.0)
        corr = jnp.sum(d)
        sq = jnp.sum(d * d)
        xmin = jnp.min(jnp.where(fluid_mask, x, jnp.inf))
        xmax = jnp.max(jnp.where(fluid_mask, x, -jnp.inf))
    total = mean0 * n + corr
    mean = total / n
    var = jnp.abs(sq / n - (corr / n) ** 2)
    return total, mean, var, xmin, xmax


def seq_sum(x: jnp.ndarray, fluid_mask: Optional[jnp.ndarray] = None):
    """Sequential (site-order) sum, reproducing the reference's running
    accumulation bitwise (masked sites add an exact 0.0)."""
    flat = x.reshape(-1)
    if fluid_mask is not None:
        flat = jnp.where(fluid_mask.reshape(-1), flat, 0.0)

    def body(s, v):
        return s + v, ()

    total, _ = jax.lax.scan(body, jnp.zeros((), flat.dtype), flat)
    return total


def site_sum(x: jnp.ndarray, fluid_mask: Optional[jnp.ndarray] = None):
    """Global sum for in-step physics: bitwise site-order scan in f64
    (the golden-log contract), tree reduction in f32 production (the
    scan is a serial chain - ~200 ms for a 64^3 field on TPU)."""
    if x.dtype == jnp.float64:
        return seq_sum(x, fluid_mask)
    if fluid_mask is not None:
        x = jnp.where(fluid_mask, x, 0.0)
    return jnp.sum(x)


def field_stats_ref(x: jnp.ndarray,
                    fluid_mask: Optional[jnp.ndarray] = None,
                    klein="klein"):
    """(total, mean, var, min, max) with the reference's accumulation:
    a site-order Klein doubly-compensated sum for the total (ref:
    util_sum.c klein_add_double, used by stats_field_info) and a naive
    site-order sum for the second moment; var = E[x^2] - E[x]^2.

    klein=False gives plain site-order naive sums for both (the older
    stats_field_reduce path, ref: phi_stats.c:346)."""
    flat = x.reshape(-1)
    if fluid_mask is None:
        w = jnp.ones_like(flat)
        n = jnp.asarray(float(flat.size), flat.dtype)
        xmin, xmax = jnp.min(x), jnp.max(x)
    else:
        w = fluid_mask.reshape(-1).astype(flat.dtype)
        n = jnp.sum(w)
        xmin = jnp.min(jnp.where(fluid_mask, x, jnp.inf))
        xmax = jnp.max(jnp.where(fluid_mask, x, -jnp.inf))
    xm = w * flat

    if klein is True or klein == "klein":
        def body(c, v):
            s, cs, ccs, var = c
            t = s + v
            cc1 = jnp.where(jnp.abs(s) >= jnp.abs(v),
                            (s - t) + v, (v - t) + s)
            s = t
            t2 = cs + cc1
            cc2 = jnp.where(jnp.abs(cs) >= jnp.abs(cc1),
                            (cs - t2) + cc1, (cc1 - t2) + cs)
            return (s, t2, ccs + cc2, var + v * v), ()

        z = jnp.zeros((), flat.dtype)
        (s, cs, ccs, var), _ = jax.lax.scan(body, (z, z, z, z), xm)
        total = s + cs + ccs
    elif klein == "kahan":
        # single-compensation in site order with a true skip of masked
        # sites (ref: cahn_hilliard_stats.c cahn_stats_kahan_sum_kernel)
        keep = (jnp.ones_like(flat, dtype=bool) if fluid_mask is None
                else fluid_mask.reshape(-1))

        def body(c, xv):
            v, k = xv
            s, cs, var = c
            y = v + cs
            t = s + y
            cs2 = y - (t - s)
            return (jnp.where(k, t, s), jnp.where(k, cs2, cs),
                    var + v * v), ()

        z = jnp.zeros((), flat.dtype)
        (total, _, var), _ = jax.lax.scan(body, (z, z, z), (xm, keep))
    else:
        def body(c, v):
            s, var = c
            return (s + v, var + v * v), ()

        z = jnp.zeros((), flat.dtype)
        (total, var), _ = jax.lax.scan(body, (z, z), xm)
    mean = total / n
    return total, mean, var / n - mean * mean, xmin, xmax


def rho_stats(f: jnp.ndarray, model: LatticeModel,
              fluid_mask: Optional[jnp.ndarray] = None):
    """(total, mean, var, min, max) of density over fluid sites."""
    return _compensated_stats(jnp.sum(f, axis=0), fluid_mask)


def rho_stats_ref(f: jnp.ndarray, model: LatticeModel,
                  fluid_mask: Optional[jnp.ndarray] = None,
                  blocks=None):
    """Reference-exact density stats: sequential (site-order) naive sums
    and var = E[rho^2] - E[rho]^2 (ref: stats_distribution.c:62-115).

    The variance there suffers catastrophic cancellation (rho ~ 1), so
    its last digits are determined by the exact summation ORDER; a
    pairwise/compensated sum differs by more than the regression diff
    tolerance.  A lax.scan reproduces the reference's running sums
    bit-for-bit (adding a masked 0.0 is exact, so masking == skipping).

    blocks: optional MPI decomposition (gx, gy, gz) of the committed
    log's run - each rank sums its own subdomain in local site order,
    and the partials combine in cart-rank (row-major) order, exactly
    like the MPI_Reduce of the parallel reference run (the variance
    roundoff is decomposition-dependent; ref: pmpi08-chol-s01)."""
    rho = jnp.sum(f, axis=0)
    if blocks is not None and tuple(blocks) != (1, 1, 1):
        gx, gy, gz = blocks
        X, Y, Z = rho.shape
        bx, by, bz = X // gx, Y // gy, Z // gz
        # (gx,bx,gy,by,gz,bz) -> rank-major, local-site-minor order
        r5 = rho.reshape(gx, bx, gy, by, gz, bz)
        rho_flat = jnp.transpose(r5, (0, 2, 4, 1, 3, 5)).reshape(-1)
        if fluid_mask is not None:
            m5 = fluid_mask.reshape(gx, bx, gy, by, gz, bz)
            fluid_mask = jnp.transpose(m5, (0, 2, 4, 1, 3, 5)).reshape(-1)
        flat = rho_flat
    else:
        flat = rho.reshape(-1)
    if fluid_mask is None:
        w = jnp.ones_like(flat)
        n = jnp.asarray(float(flat.size), flat.dtype)
        rmin, rmax = jnp.min(rho), jnp.max(rho)
    else:
        w = fluid_mask.reshape(-1).astype(flat.dtype)
        n = jnp.sum(w)
        rmin = jnp.min(jnp.where(fluid_mask, rho, jnp.inf))
        rmax = jnp.max(jnp.where(fluid_mask, rho, -jnp.inf))

    def body(c, xw):
        s, s2 = c
        x, wi = xw
        xm = wi * x
        return (s + xm, s2 + xm * x), ()

    z = jnp.zeros((), flat.dtype)
    if blocks is not None and tuple(blocks) != (1, 1, 1):
        # independent per-rank partials, then a sequential rank-order
        # combine (MPI_SUM of the local accumulators)
        nb = int(np.prod(blocks))
        fb = flat.reshape(nb, -1)
        wb = w.reshape(nb, -1)

        def rank_sums(xr, wr):
            (s, s2), _ = jax.lax.scan(body, (z, z), (xr, wr))
            return s, s2

        ss, ss2 = jax.vmap(rank_sums)(fb, wb)

        def comb(c, v):
            return (c[0] + v[0], c[1] + v[1]), ()

        (total, sumsq), _ = jax.lax.scan(comb, (z, z), (ss, ss2))
    else:
        (total, sumsq), _ = jax.lax.scan(body, (z, z), (flat, w))
    mean = total / n
    var = (sumsq / n) - mean * mean
    return total, mean, var, rmin, rmax


def field_stats(phi: jnp.ndarray, fluid_mask: Optional[jnp.ndarray] = None):
    """(total, mean, var, min, max) of a scalar order parameter."""
    return _compensated_stats(phi, fluid_mask)


def _two_sum(a, b):
    """Knuth branch-free exact addition: a + b = s + err."""
    s = a + b
    bp = s - a
    return s, (a - (s - bp)) + (b - bp)


def momentum_total_ref(f: jnp.ndarray, model: LatticeModel,
                       fluid_mask: Optional[jnp.ndarray] = None):
    """(3,) total momentum, reproducing the reference accumulation
    bitwise: per site a sequential p-order fold of f_p c_pa, then a
    site-order Kahan compensated sum (ref: stats_distribution.c
    distribution_gm_kernel, util_sum.c kahan_add_double)."""
    import numpy as np
    nvel = model.nvel
    cv = np.asarray(model.cv, np.float64)          # (nvel, 3)
    # terms in the reference's accumulation order: site-major, p-minor.
    # Every f_p c_pa term gets its own kahan update (zero c included);
    # solid sites are SKIPPED entirely - a kahan add of 0.0 is not a
    # no-op once the compensation is non-zero, so masking needs a real
    # skip, not a zero contribution.
    fsite = jnp.moveaxis(f[1:], 0, -1).reshape(-1, nvel - 1)
    cvj = jnp.asarray(cv[1:], f.dtype)                     # (nv-1, 3)
    terms = fsite[:, :, None] * cvj[None]                  # (nsite,nv-1,3)
    flat = terms.reshape(-1, 3)

    if fluid_mask is None:
        def body(c, v):
            s, cs = c
            y = v + cs
            t = s + y
            cs = y - (t - s)
            return (t, cs), ()

        xs = flat
    else:
        keepm = jnp.repeat(fluid_mask.reshape(-1), nvel - 1)

        def body(c, xv):
            v, keep = xv
            s, cs = c
            y = v + cs
            t = s + y
            cs2 = y - (t - s)
            return (jnp.where(keep, t, s), jnp.where(keep, cs2, cs)), ()

        xs = (flat, keepm)

    z = jnp.zeros((3,), f.dtype)
    (tot, _), _ = jax.lax.scan(body, (z, z), xs)
    return tot


def momentum_total_plain(f: jnp.ndarray, model: LatticeModel,
                         fluid_mask: Optional[jnp.ndarray] = None,
                         blocks=None):
    """(3,) total momentum via a PLAIN (uncompensated) site-major,
    p-minor sequential sum - the pre-v0.12 reference accumulation
    (stats_distribution.c before the kahan_t rewrite).  Used for golden
    parity against old logs whose near-zero totals carry the plain-sum
    roundoff (e.g. pmpi08-spin-fd1's 3.6379788e-12 at t = 0).

    blocks: optional MPI decomposition (gx, gy, gz) of the committed
    log's run: each rank sums its own subdomain sites in local order,
    and the partials combine in cart-rank order like the MPI_Reduce of
    the parallel reference run (the near-zero totals are decomposition-
    dependent roundoff; ref: long08-chol-n01's 3.6161213e-12)."""
    import numpy as np
    nvel = model.nvel
    cv = np.asarray(model.cv, np.float64)
    # per-site momentum first (sequential p-fold), THEN a plain
    # site-order sum of the per-site values
    g = [None, None, None]
    for a in range(3):
        acc = None
        for p in range(nvel):
            cpa = float(cv[p][a])
            if cpa == 0.0:
                continue
            t = cpa * f[p]
            acc = t if acc is None else acc + t
        g[a] = acc if acc is not None else jnp.zeros_like(f[0])
    gsite = jnp.stack(g, axis=-1)                    # (X, Y, Z, 3)
    if fluid_mask is not None:
        gsite = jnp.where(fluid_mask[..., None], gsite, 0.0)

    def body(s, v):
        return s + v, ()

    z3 = jnp.zeros((3,), f.dtype)
    if blocks is not None and tuple(blocks) != (1, 1, 1):
        gx, gy, gz = blocks
        X, Y, Z = gsite.shape[:3]
        bx, by, bz = X // gx, Y // gy, Z // gz
        r7 = gsite.reshape(gx, bx, gy, by, gz, bz, 3)
        persite = jnp.transpose(r7, (0, 2, 4, 1, 3, 5, 6)).reshape(
            gx * gy * gz, -1, 3)

        def rank_sum(rows):
            s, _ = jax.lax.scan(body, z3, rows)
            return s

        partials = jax.vmap(rank_sum)(persite)
        tot, _ = jax.lax.scan(body, z3, partials)
        return tot
    tot, _ = jax.lax.scan(body, z3, gsite.reshape(-1, 3))
    return tot


def momentum_total(f: jnp.ndarray, model: LatticeModel,
                   fluid_mask: Optional[jnp.ndarray] = None):
    """Total momentum with a compensated per-site fold over velocities.

    The reference accumulates f_p c_p into a Kahan compensated sum
    (ref: stats_distribution.c distribution_gm_kernel, util_sum.h), so
    the printed total is the TRUE sum to ~2 ulps even though the
    per-site partial sums each round (at rest the +w/-w fold leaves
    ~1e-17 per site, which would otherwise accumulate coherently to
    ~1e-11 over a 64^3 lattice - above the regression tolerance).
    Here: Neumaier over the velocity fold per site, then a pairwise
    lattice sum of (sum, correction)."""
    comps = []
    for a in range(3):
        s = None
        c = None
        for p in range(model.nvel):
            cpa = float(model.cv[p][a])
            if cpa == 0.0:
                continue
            t = cpa * f[p]
            if s is None:
                s = t
                c = jnp.zeros_like(t)
            else:
                s, e = _two_sum(s, t)
                c = c + e
        if s is None:   # 2-D models: no z links
            comps.append(jnp.zeros((), f.dtype))
            continue
        if fluid_mask is not None:
            s = jnp.where(fluid_mask, s, 0.0)
            c = jnp.where(fluid_mask, c, 0.0)
        comps.append(jnp.sum(s) + jnp.sum(c))
    return jnp.stack(comps)


def velocity_minmax(u: jnp.ndarray,
                    fluid_mask: Optional[jnp.ndarray] = None):
    if fluid_mask is not None:
        u = jnp.where(fluid_mask[None], u, 0.0)
    # the reference seeds the max accumulator with FLT_MIN (not
    # -FLT_MAX), so an all-non-positive component reports +1.1754944e-38
    # (ref: stats_velocity.c:76)
    flt_min = float(np.finfo(np.float32).tiny)
    return (jnp.min(u, axis=(1, 2, 3)),
            jnp.maximum(jnp.max(u, axis=(1, 2, 3)), flt_min))


# -- formatting (exact reference formats) ---------------------------------

def format_rho_block(total, mean, var, rmin, rmax) -> str:
    # ref: stats_distribution.c:112-114
    return ("\nScalars - total mean variance min max\n"
            f"[rho] {float(total):14.2f} {float(mean):14.11f} "
            f"{float(var):14.7e} {float(rmin):14.11f} {float(rmax):14.11f}\n")


def format_phi_line(name, total, mean, var, fmin, fmax) -> str:
    # ref: phi_stats.c:336 (note the glued '%14.7e%14.7e' pairs)
    return (f"[{name}] {float(total):14.7e} {float(mean):14.7e}"
            f"{float(var):14.7e} {float(fmin):14.7e}{float(fmax):14.7e}\n")


def format_fed_block(tstep, fed_mean, fed_fluid) -> str:
    # ref: stats_free_energy.c:130-132
    return ("\nFree energy density - timestep total fluid\n"
            f"[fed] {int(tstep):14d} {float(fed_mean):17.10e} "
            f"{float(fed_fluid):17.10e}\n")


def format_momentum_block(gtotal, gfluid, gwall=None) -> str:
    # ref: ludwig.c:1079-1087
    s = ("\nMomentum - x y z\n"
         f"[total   ] {float(gtotal[0]):14.7e} {float(gtotal[1]):14.7e} "
         f"{float(gtotal[2]):14.7e}\n"
         f"[fluid   ] {float(gfluid[0]):14.7e} {float(gfluid[1]):14.7e} "
         f"{float(gfluid[2]):14.7e}\n")
    if gwall is not None:
        s += (f"[walls   ] {float(gwall[0]):14.7e} {float(gwall[1]):14.7e} "
              f"{float(gwall[2]):14.7e}\n")
    return s


def format_velocity_block(umin, umax) -> str:
    # ref: stats_velocity.c:116-118
    return ("\nVelocity - x y z\n"
            f"[minimum ] {float(umin[0]):14.7e} {float(umin[1]):14.7e} "
            f"{float(umin[2]):14.7e}\n"
            f"[maximum ] {float(umax[0]):14.7e} {float(umax[1]):14.7e} "
            f"{float(umax[2]):14.7e}\n")
