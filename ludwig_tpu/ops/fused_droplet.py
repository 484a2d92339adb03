"""Fused LC-droplet (phi + Q coupled) update kernels for TPU.

The reference's second headline benchmark is the coupled droplet loop
(ref: tests/performance/cray-archer2-drop): phi gradients + dab, Q
gradients, the gamma(phi) molecular field, body force + qh stress
divergence, Cahn-Hilliard and Beris-Edwards updates, then the LB step
(ref: src/ludwig.c:693-742, src/lc_droplet.c).  The jnp path runs it in
~14 HBM passes; here the whole order-parameter side is ONE Pallas pass:

  K1 (this file): phi, q5, u  ->  phi', q5', force
  K2 (ops.fused with force coupling): f, force -> f', u

The body-force momentum correction (hydro_correct_momentum subtracts
the mean body force) needs a global reduction, so K1 emits the RAW
force field and the wrapper subtracts its global mean outside the
kernel - same correction intent, the divergence part contributes only
its exact-telescoping fp residue to the mean.

Same windowing as ops.fused_lc: x untiled-major halo 2, y pads
8-aligned, z in-register lane rolls (periodic).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ludwig_tpu.ops.fused_lc import HX, HY, _refresh, _zroll, pad_q
from ludwig_tpu.ops.fused_binary import pad_phi, unpad_phi, _refresh1

E = ((1, 0, 0), (0, 1, 0), (0, 0, 1))


def _droplet_kernel(fe, be_gamma, mobility, order, X, Y, Z, BX, BY,
                    ppad_hbm, qpad_hbm, upad_hbm,
                    pout_hbm, qout_hbm, fout_hbm,
                    pbuf, qbuf, ubuf, poutbuf, qoutbuf, foutbuf,
                    psem, qsem, usem, posem, qosem, fosem):
    """grid=() kernel over (X/BX, Y/BY) blocks, double-buffered DMA."""
    nbx, nby = X // BX, Y // BY
    nblocks = nbx * nby
    W1X, W1Y = BX + 2, BY + 2

    def in_dma(slot, k):
        i, j = k // nby, k % nby
        return (pltpu.make_async_copy(
            ppad_hbm.at[pl.ds(i * BX, BX + 4), pl.ds(j * BY, BY + 16), :],
            pbuf.at[slot], psem.at[slot]),
            pltpu.make_async_copy(
            qpad_hbm.at[:, pl.ds(i * BX, BX + 4), pl.ds(j * BY, BY + 16), :],
            qbuf.at[slot], qsem.at[slot]),
            pltpu.make_async_copy(
            upad_hbm.at[:, pl.ds(i * BX, BX + 4), pl.ds(j * BY, BY + 16), :],
            ubuf.at[slot], usem.at[slot]))

    def out_dma(slot, k):
        i, j = k // nby, k % nby
        return (pltpu.make_async_copy(
            poutbuf.at[slot],
            pout_hbm.at[pl.ds(HX + i * BX, BX),
                        pl.ds(HY + j * BY, BY), :], posem.at[slot]),
            pltpu.make_async_copy(
            qoutbuf.at[slot],
            qout_hbm.at[:, pl.ds(HX + i * BX, BX),
                        pl.ds(HY + j * BY, BY), :], qosem.at[slot]),
            pltpu.make_async_copy(
            foutbuf.at[slot],
            fout_hbm.at[:, pl.ds(i * BX, BX), pl.ds(j * BY, BY), :],
            fosem.at[slot]))

    for d in in_dma(0, 0):
        d.start()

    def body(k, _):
        slot = k % 2
        nslot = (k + 1) % 2

        @pl.when(k + 1 < nblocks)
        def _():
            for d in in_dma(nslot, k + 1):
                d.start()

        for d in in_dma(slot, k):
            d.wait()

        pw = pbuf[slot, :, HY - 2:HY + BY + 2, :]
        qw = [qbuf[slot, n, :, HY - 2:HY + BY + 2, :] for n in range(5)]
        uw = [ubuf[slot, a, :, HY - 2:HY + BY + 2, :] for a in range(3)]

        def lv1(arr, dx=0, dy=0, dz=0):
            blk = arr[1 + dx:1 + dx + W1X, 1 + dy:1 + dy + W1Y, :]
            return _zroll(blk, dz, Z)

        def lv2(arr1, dx=0, dy=0, dz=0):
            blk = arr1[1 + dx:1 + dx + BX, 1 + dy:1 + dy + BY, :]
            return _zroll(blk, dz, Z)

        # ---- level-1 fields: phi, q and their 7-pt gradients ----------
        phi1 = lv1(pw)
        gphi1 = [0.5 * (lv1(pw, *e) - lv1(pw, *(-v for v in e)))
                 for e in E]
        dsqp1 = sum(lv1(pw, *e) + lv1(pw, *(-v for v in e))
                    for e in E) - 6.0 * phi1
        # d_a d_b phi (ref: field_grad_scalar_dab; ops/stencil.dab_7pt)
        dab1 = [[None] * 3 for _ in range(3)]
        for a in range(3):
            oa = E[a]
            dab1[a][a] = (lv1(pw, *(-v for v in oa)) - 2.0 * phi1
                          + lv1(pw, *oa))
            for b in range(a + 1, 3):
                ob = E[b]
                pp = lv1(pw, *[-(oa[i] + ob[i]) for i in range(3)])
                pm = lv1(pw, *[-(oa[i] - ob[i]) for i in range(3)])
                mp = lv1(pw, *[(oa[i] - ob[i]) for i in range(3)])
                mm = lv1(pw, *[(oa[i] + ob[i]) for i in range(3)])
                dab1[a][b] = 0.25 * (pp - pm - mp + mm)
                dab1[b][a] = dab1[a][b]

        q1 = [lv1(qw[n]) for n in range(5)]
        gq1 = [[0.5 * (lv1(qw[n], *e) - lv1(qw[n], *(-v for v in e)))
                for n in range(5)] for e in E]
        dsqq1 = [sum(lv1(qw[n], *e) + lv1(qw[n], *(-v for v in e))
                     for e in E) - 6.0 * q1[n] for n in range(5)]

        fields1 = {"phi": phi1, "grad_phi": jnp.stack(gphi1),
                   "delsq_phi": dsqp1,
                   "dab_phi": jnp.stack([jnp.stack(r) for r in dab1]),
                   "q": jnp.stack(q1),
                   "grad_q": jnp.stack([jnp.stack(g) for g in gq1]),
                   "delsq_q": jnp.stack(dsqq1)}
        mu1 = fe.mu(fields1)
        h1 = fe.molecular_field(fields1)
        pth1 = fe.stress_qh(fields1, h=h1)

        # ---- force at the interior: raw body force + div(qh stress) ---
        # (ref: lc_droplet.c bf_kernel; mean subtraction by the wrapper)
        force2 = []
        for a in range(3):
            gmu_a = 0.5 * (lv2(mu1, *E[a]) - lv2(mu1, *(-v for v in E[a])))
            v = -lv2(phi1) * gmu_a
            for b in range(3):
                for c in range(3):
                    # dq[a][b][c] = d_a Q_bc at the interior
                    qi = {(0, 0): 0, (0, 1): 1, (0, 2): 2, (1, 0): 1,
                          (1, 1): 3, (1, 2): 4, (2, 0): 2, (2, 1): 4}
                    if (b, c) in qi:
                        dq_abc = lv2(gq1[a][qi[(b, c)]])
                    else:  # Q_zz = -Q_xx - Q_yy
                        dq_abc = -(lv2(gq1[a][0]) + lv2(gq1[a][3]))
                    v = v - lv2(h1[b][c]) * dq_abc
            acc = None
            for ax, e in enumerate(E):
                d = 0.5 * (lv2(pth1[a, ax], *e)
                           - lv2(pth1[a, ax], *(-v for v in e)))
                acc = d if acc is None else acc + d
            force2.append(v - acc)

        # ---- Cahn-Hilliard flux-form update (order-1/2 advection) -----
        u1 = [lv1(uw[a]) for a in range(3)]
        div = None
        for ax, e in enumerate(E):
            me = tuple(-v for v in e)
            uf_i = 0.5 * (lv2(u1[ax]) + lv2(u1[ax], *e))
            uf_im = 0.5 * (lv2(u1[ax], *me) + lv2(u1[ax]))
            if order == 1:
                adv_i = uf_i * jnp.where(uf_i > 0.0, lv2(phi1),
                                         lv2(phi1, *e))
                adv_im = uf_im * jnp.where(uf_im > 0.0, lv2(phi1, *me),
                                           lv2(phi1))
            else:
                adv_i = uf_i * (0.5 * (lv2(phi1) + lv2(phi1, *e)))
                adv_im = uf_im * (0.5 * (lv2(phi1, *me) + lv2(phi1)))
            flux_i = adv_i - mobility * (lv2(mu1, *e) - lv2(mu1))
            flux_im = adv_im - mobility * (lv2(mu1) - lv2(mu1, *me))
            d = flux_i - flux_im
            div = d if div is None else div + d
        phinew = lv2(phi1) - div

        # ---- Beris-Edwards with gamma(phi_new), stale gradients -------
        # (ref: ludwig.c order phi_cahn_hilliard -> beris_edw_update;
        #  the molecular field is re-evaluated with the NEW phi but the
        #  pre-update gradients, exactly as lc_droplet_sim.py)
        fields2 = {"phi": phinew,
                   "grad_phi": jnp.stack([lv2(g) for g in gphi1]),
                   "delsq_phi": lv2(dsqp1),
                   "dab_phi": jnp.stack(
                       [jnp.stack([lv2(dab1[a][b]) for b in range(3)])
                        for a in range(3)]),
                   "q": jnp.stack([lv2(qn) for qn in q1]),
                   "grad_q": jnp.stack(
                       [jnp.stack([lv2(g) for g in gq1[c]])
                        for c in range(3)]),
                   "delsq_q": jnp.stack([lv2(d) for d in dsqq1])}
        hbe = fe.molecular_field(fields2)
        h5 = [hbe[0][0], hbe[0][1], hbe[0][2], hbe[1][1], hbe[1][2]]

        # corotation S(W, Q) (ref: beris_edwards.corotation_term)
        xi = fe.lc.xi
        w = [[0.5 * (lv2(u1[a], *e) - lv2(u1[a], *(-v for v in e)))
              for e in E] for a in range(3)]
        tr = (w[0][0] + w[1][1] + w[2][2]) / 3.0
        for a in range(3):
            w[a][a] = w[a][a] - tr
        q2_5 = [lv2(qn) for qn in q1]
        q33 = [[q2_5[0], q2_5[1], q2_5[2]],
               [q2_5[1], q2_5[3], q2_5[4]],
               [q2_5[2], q2_5[4], -q2_5[0] - q2_5[3]]]
        r3 = 1.0 / 3.0
        trace_qw = sum(q33[a][b] * w[b][a]
                       for a in range(3) for b in range(3))
        dsym = [[0.5 * (w[a][b] + w[b][a]) for b in range(3)]
                for a in range(3)]
        om = [[0.5 * (w[a][b] - w[b][a]) for b in range(3)]
              for a in range(3)]
        s33 = [[None] * 3 for _ in range(3)]
        for a in range(3):
            for b in range(3):
                val = -2.0 * xi * (q33[a][b]
                                   + (r3 if a == b else 0.0)) * trace_qw
                for c in range(3):
                    val = val + (xi * dsym[a][c] + om[a][c]) * (
                        q33[c][b] + (r3 if c == b else 0.0))
                    val = val + (q33[a][c]
                                 + (r3 if a == c else 0.0)) * (
                        xi * dsym[c][b] - om[c][b])
                s33[a][b] = val
        s5 = [s33[0][0], s33[0][1], s33[0][2], s33[1][1], s33[1][2]]

        qnew = []
        for n in range(5):
            dv = None
            for ax, e in enumerate(E):
                me = tuple(-v for v in e)
                uf_hi = 0.5 * (lv2(u1[ax]) + lv2(u1[ax], *e))
                uf_lo = 0.5 * (lv2(u1[ax], *me) + lv2(u1[ax]))
                phi0 = lv2(q1[n])
                if order == 1:
                    f_hi = uf_hi * jnp.where(uf_hi > 0.0, phi0,
                                             lv2(q1[n], *e))
                    f_lo = uf_lo * jnp.where(uf_lo > 0.0,
                                             lv2(q1[n], *me), phi0)
                else:
                    f_hi = uf_hi * (0.5 * (phi0 + lv2(q1[n], *e)))
                    f_lo = uf_lo * (0.5 * (lv2(q1[n], *me) + phi0))
                d = f_hi - f_lo
                dv = d if dv is None else dv + d
            qnew.append(lv2(q1[n])
                        + ((be_gamma * h5[n] + s5[n]) - dv))

        @pl.when(k >= 2)
        def _():
            for d in out_dma(slot, k - 2):
                d.wait()

        poutbuf[slot] = phinew
        for n in range(5):
            qoutbuf[slot, n] = qnew[n]
        for a in range(3):
            foutbuf[slot, a] = force2[a]

        for d in out_dma(slot, k):
            d.start()
        return 0

    jax.lax.fori_loop(0, nblocks, body, 0)
    for d in out_dma((nblocks - 1) % 2, nblocks - 1):
        d.wait()

    @pl.when(nblocks >= 2)
    def _():
        for d in out_dma(nblocks % 2, nblocks - 2):
            d.wait()


@dataclasses.dataclass(frozen=True)
class DropletPlan:
    BX: int = 8
    BY: int = 32


def droplet_phi_q_force_step(ppad, qpad, upad, fe, be_gamma, mobility,
                             order, plan: DropletPlan = DropletPlan(),
                             interpret: bool = False, refresh_fn=None):
    """(ppad', qpad', force_raw): one fused order-parameter update.

    force_raw is the uncorrected body force + stress divergence; the
    caller subtracts the global mean (hydro_correct_momentum).
    refresh_fn = (phi_refresh, q_refresh) overrides the single-shard
    periodic pad refreshes (the sharded path substitutes ppermute
    face exchanges)."""
    Xp, Yp, Z = ppad.shape
    X, Y = Xp - 2 * HX, Yp - 2 * HY
    BX, BY = min(plan.BX, X), min(plan.BY, Y)
    if X % BX or Y % BY or BY % 8:
        raise ValueError(f"blocks ({BX},{BY}) must divide ({X},{Y})")

    kernel = partial(_droplet_kernel, fe, be_gamma, mobility, order,
                     X, Y, Z, BX, BY)
    pout, qout, force = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct(ppad.shape, ppad.dtype),
                   jax.ShapeDtypeStruct(qpad.shape, qpad.dtype),
                   jax.ShapeDtypeStruct((3, X, Y, Z), ppad.dtype)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),) * 3,
        scratch_shapes=[
            pltpu.VMEM((2, BX + 4, BY + 16, Z), ppad.dtype),
            pltpu.VMEM((2, 5, BX + 4, BY + 16, Z), ppad.dtype),
            pltpu.VMEM((2, 3, BX + 4, BY + 16, Z), ppad.dtype),
            pltpu.VMEM((2, BX, BY, Z), ppad.dtype),
            pltpu.VMEM((2, 5, BX, BY, Z), ppad.dtype),
            pltpu.VMEM((2, 3, BX, BY, Z), ppad.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(ppad, qpad, upad)
    if refresh_fn is not None:
        return refresh_fn[0](pout), refresh_fn[1](qout), force
    return _refresh1(pout), _refresh(qout), force


def make_fused_droplet_step(dcfg, plan: DropletPlan = DropletPlan(),
                            lb_plan=None, interpret: bool = False):
    """Jitted fused droplet step: state (fpad, ppad, qpad, u) -> state.

    Two Pallas passes per step (phi+Q+force kernel, then the
    force-coupled collide/stream) vs ~14 HBM passes on the jnp path.
    Periodic fluid, stress_divergence force method."""
    from ludwig_tpu.ops.fused import FusedPlan, fused_force_step

    if lb_plan is None:
        lb_plan = FusedPlan()
    model = dcfg.lb.model
    params = dcfg.lb.collision_params()
    nsites = 1.0
    for v in dcfg.lb.size:
        nsites *= v

    @partial(jax.jit, donate_argnums=0)
    def step(state, t=0):
        fpad, ppad, qpad, u = state
        upad = pad_q(u)
        ppad, qpad, force = droplet_phi_q_force_step(
            ppad, qpad, upad, dcfg.fe, dcfg.gamma, dcfg.mobility,
            dcfg.advection_order, plan, interpret=interpret)
        # hydro_correct_momentum (ref: lc_droplet bf_kernel): remove the
        # net force; the stress-divergence part telescopes to its fp
        # residue so subtracting the full mean matches the jnp path's
        # body-force-only mean to round-off
        force = force - jnp.mean(force, axis=(1, 2, 3), keepdims=True)
        fpad, u_new = fused_force_step(fpad, force, model, params,
                                       lb_plan, interpret=interpret)
        return (fpad, ppad, qpad, u_new)

    return step


def make_fused_droplet_sharded_step(dcfg, mesh,
                                    plan: DropletPlan = DropletPlan(),
                                    lb_plan=None,
                                    interpret: bool = False):
    """Multi-chip fused LC-droplet step: shard_map over a 2-D
    ('x', 'y') device mesh (the droplet analogue of fused_lc.
    make_fused_lc_sharded_step).  The hydro_correct_momentum mean
    becomes a cross-device pmean.

    Takes and returns UNPADDED (f, phi, q5, u) global arrays sharded
    P(None, 'x', 'y', None) (phi: P('x', 'y', None))."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ludwig_tpu.ops.fused import (FusedPlan, fused_force_step,
                                      _pad_exchange)
    from ludwig_tpu.ops.fused import HX as FHX, HY as FHY
    from ludwig_tpu.ops.fused_lc import _pad_exchange_q, unpad_q

    if lb_plan is None:
        lb_plan = FusedPlan()
    model = dcfg.lb.model
    params = dcfg.lb.collision_params()
    nx = int(mesh.shape.get("x", 1))
    ny = int(mesh.shape.get("y", 1))
    spec = P(None, "x", "y", None)
    spec_phi = P("x", "y", None)

    def exq(xp):
        return _pad_exchange_q(xp, nx, ny)

    def exf(xp):
        return _pad_exchange(xp, nx, ny)

    def padf(x):
        return jnp.pad(x, ((0, 0), (FHX, FHX), (FHY, FHY), (0, 0)))

    def local_step(f, phi, q5, u):
        from ludwig_tpu.ops.fused import unpad_state
        ppad = exq(pad_phi(phi)[None])[0]
        qpad = exq(pad_q(q5))
        upad = exq(pad_q(u))
        fpad = exf(padf(f))
        ppad, qpad, force = droplet_phi_q_force_step(
            ppad, qpad, upad, dcfg.fe, dcfg.gamma, dcfg.mobility,
            dcfg.advection_order, plan, interpret=interpret,
            refresh_fn=(lambda x: x, lambda x: x))
        mean = jnp.mean(force, axis=(1, 2, 3), keepdims=True)
        mean = jax.lax.pmean(jax.lax.pmean(mean, "x"), "y")
        force = force - mean
        fpad, u_new = fused_force_step(
            fpad, force, model, params, lb_plan, interpret=interpret,
            pad_force_fn=lambda x: exf(padf(x)),
            refresh_fn=lambda x: x)
        return (unpad_state(fpad), unpad_phi(ppad), unpad_q(qpad),
                u_new)

    @partial(jax.jit, donate_argnums=0)
    def step(state, t=0):
        f, phi, q5, u = state
        return shard_map(local_step, mesh=mesh,
                         in_specs=(spec, spec_phi, spec, spec),
                         out_specs=(spec, spec_phi, spec, spec),
                         check_vma=False)(f, phi, q5, u)

    return step


def initial_fused_droplet(dcfg, phi0, q0_field):
    from ludwig_tpu.lb import initial_rest
    from ludwig_tpu.ops.fused import pad_state
    f = initial_rest(dcfg.lb)
    phi = jnp.asarray(phi0, dcfg.lb.jdtype)
    q5 = jnp.asarray(q0_field, dcfg.lb.jdtype)
    u = jnp.zeros((3,) + tuple(dcfg.lb.size), dcfg.lb.jdtype)
    return (pad_state(f, zpad=False), pad_phi(phi), pad_q(q5), u)


def make_fused_droplet_le_step(dcfg, le, plan: DropletPlan = DropletPlan(),
                               lb_plan=None, interpret: bool = False):
    """Fused LC-droplet step under Lees-Edwards shear:
    (fpad, ppad, qpad, u) -> state.

    The sheared LC droplet is the reference's coupled production
    configuration (ref: lc_droplet.c + model_le.c:57).  The Pallas
    phi+Q kernel runs unmodified with plain-periodic x; LE enters as
    O(surface) column work: lc_droplet_sim.make_droplet_le_column_fix
    rewrites the plane-adjacent columns of phi', q5' and force with
    the LE-aware formulas, and the f-side reprojection/displacement
    runs as the streaming-conjugated column post-pass
    (ops/lees_edwards.apply_le_fused) - the droplet analogue of
    fused_lc.make_fused_lc_le_step."""
    from ludwig_tpu.lc_droplet_sim import make_droplet_le_column_fix
    from ludwig_tpu.ops.fused import (FusedPlan, fused_force_step,
                                      _pad_refresh)
    from ludwig_tpu.ops.fused import HX as FHX, HY as FHY
    from ludwig_tpu.ops.fused_lc import unpad_q
    from ludwig_tpu.ops.lees_edwards import apply_le_fused

    if lb_plan is None:
        lb_plan = FusedPlan()
    model = dcfg.lb.model
    params = dcfg.lb.collision_params()
    fix = make_droplet_le_column_fix(dcfg, le)

    @partial(jax.jit, donate_argnums=0)
    def step(state, t=0):
        fpad, ppad, qpad, u = state
        phi = unpad_phi(ppad)
        q5 = unpad_q(qpad)
        upad = pad_q(u)
        ppad_new, qpad_new, force = droplet_phi_q_force_step(
            ppad, qpad, upad, dcfg.fe, dcfg.gamma, dcfg.mobility,
            dcfg.advection_order, plan, interpret=interpret)
        Y = qpad.shape[2] - 2 * HY
        pcols, qcols, fcols = fix(phi, q5, u, t)
        for col, v in pcols.items():
            ppad_new = ppad_new.at[HX + col, HY:HY + Y, :].set(
                v.astype(ppad_new.dtype))
        for col, v in qcols.items():
            qpad_new = qpad_new.at[:, HX + col, HY:HY + Y, :].set(
                v.astype(qpad_new.dtype))
        for col, v in fcols.items():
            force = force.at[:, col].set(v.astype(force.dtype))
        ppad_new = _refresh1(ppad_new)
        qpad_new = _refresh(qpad_new)
        # hydro_correct_momentum: remove the net force (the LE flux
        # divergence sums to its fp residue after the per-plane mean
        # fix, so subtracting the full mean matches the body-force-only
        # mean to round-off, as in the plain fused step)
        force = force - jnp.mean(force, axis=(1, 2, 3), keepdims=True)
        fpad, u_new = fused_force_step(fpad, force, model, params,
                                       lb_plan, interpret=interpret)
        fpad = apply_le_fused(fpad, model, le, t, pad=(FHX, FHY))
        return (_pad_refresh(fpad), ppad_new, qpad_new, u_new)

    return step
