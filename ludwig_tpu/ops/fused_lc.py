"""Fused liquid-crystal (blue phase) update kernels for TPU.

The reference's headline benchmark is the coupled Q-tensor + LB loop
(ref: tests/performance/cray-titan-sc16-k20x).  The jnp/XLA path runs it
in ~12 HBM passes per step (gradients, molecular field, stress, force,
Beris-Edwards, collide, stream are separate materialisations); these
Pallas kernels collapse the whole step into TWO passes:

  K1 (this file): q5, u  ->  q5', force
      gradients, LdG molecular field, stress (+ active), stress
      divergence and the Beris-Edwards update (order-1 upwind advection
      + corotation) computed per block entirely in VMEM.
  K2 (ops.fused with force coupling): f, force -> f', u
      the existing fused collide+stream with the Guo force terms.

Same windowing discipline as ops.fused: x is the untiled major dim
(free halo width), y pads are 8-aligned for Mosaic DMA, z is handled
with in-register lane rolls (periodic).  Halo width is 2 (stress
divergence of gradient-bearing stress).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HX = 2    # x halo width (radius 2: div of stress of gradients)
HY = 8    # y pad width (tile aligned); inner 2 rows used


def pad_q(x: jnp.ndarray) -> jnp.ndarray:
    """(C, X, Y, Z) -> (C, X+4, Y+16, Z) periodic pads."""
    return jnp.pad(x, ((0, 0), (HX, HX), (HY, HY), (0, 0)), mode="wrap")


def unpad_q(xp: jnp.ndarray) -> jnp.ndarray:
    return xp[:, HX:-HX, HY:-HY, :]


def _refresh(xp: jnp.ndarray) -> jnp.ndarray:
    """Re-derive the periodic pads from the live region (single shard)."""
    X = xp.shape[1] - 2 * HX
    Y = xp.shape[2] - 2 * HY
    xp = xp.at[:, :, HY - 2:HY, :].set(xp[:, :, Y + HY - 2:Y + HY, :])
    xp = xp.at[:, :, Y + HY:Y + HY + 2, :].set(xp[:, :, HY:HY + 2, :])
    xp = xp.at[:, 0:HX, :, :].set(xp[:, X:X + HX, :, :])
    xp = xp.at[:, X + HX:, :, :].set(xp[:, HX:2 * HX, :, :])
    return xp


def _zroll(a, dz, Z):
    if dz == 0:
        return a
    return pltpu.roll(a, (-dz) % Z, 2)


def _lc_kernel(fe, be_gamma, xi, X, Y, Z, BX, BY,
               qpad_hbm, upad_hbm, qout_hbm, fout_hbm,
               qbuf, ubuf, qoutbuf, foutbuf, qsem, usem, qosem, fosem):
    """grid=() kernel over (X/BX, Y/BY) blocks, double-buffered DMA.

    Per block: DMA in q5/u windows, compute gradients -> h -> stress ->
    force and the BE update in VMEM, DMA out q5' and force blocks."""
    nbx, nby = X // BX, Y // BY
    nblocks = nbx * nby
    W1X, W1Y = BX + 2, BY + 2          # level-1 region (radius-1 ops)

    def in_dma(slot, k):
        i, j = k // nby, k % nby
        return (pltpu.make_async_copy(
            qpad_hbm.at[:, pl.ds(i * BX, BX + 4), pl.ds(j * BY, BY + 16), :],
            qbuf.at[slot], qsem.at[slot]),
            pltpu.make_async_copy(
            upad_hbm.at[:, pl.ds(i * BX, BX + 4), pl.ds(j * BY, BY + 16), :],
            ubuf.at[slot], usem.at[slot]))

    def out_dma(slot, k):
        i, j = k // nby, k % nby
        return (pltpu.make_async_copy(
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

        # (BX+4, BY+4, Z) halo windows
        qw = [qbuf[slot, n, :, HY - 2:HY + BY + 2, :] for n in range(5)]
        uw = [ubuf[slot, a, :, HY - 2:HY + BY + 2, :] for a in range(3)]

        def lv1(arr, dx=0, dy=0, dz=0):
            # value at offset (dx,dy,dz), on the (W1X, W1Y, Z) region
            blk = arr[1 + dx:1 + dx + W1X, 1 + dy:1 + dy + W1Y, :]
            return _zroll(blk, dz, Z)

        def lv2(arr1, dx=0, dy=0, dz=0):
            # from a level-1 array to the (BX, BY, Z) interior
            blk = arr1[1 + dx:1 + dx + BX, 1 + dy:1 + dy + BY, :]
            return _zroll(blk, dz, Z)

        E = ((1, 0, 0), (0, 1, 0), (0, 0, 1))

        # gradients and laplacian at level 1 (7-point)
        q1 = [lv1(qw[n]) for n in range(5)]
        grad1 = [[0.5 * (lv1(qw[n], *e) - lv1(qw[n], *(-v for v in e)))
                  for n in range(5)] for e in E]
        dsq1 = [sum(lv1(qw[n], *e) + lv1(qw[n], *(-v for v in e))
                    for e in E) - 6.0 * q1[n] for n in range(5)]

        fields1 = {"q": jnp.stack(q1),
                   "grad_q": jnp.stack([jnp.stack(g) for g in grad1]),
                   "delsq_q": jnp.stack(dsq1)}
        h1 = fe.molecular_field(fields1)            # 3x3 list
        pth1 = fe.stress(fields1, h=h1)             # (3, 3, ...)
        sa = fe.active_stress(fields1)
        if sa is not None:
            pth1 = pth1 + sa

        # force = -div pth at the interior (ref: ops/force.py:32-44)
        force2 = []
        for a in range(3):
            acc = None
            for ax, e in enumerate(E):
                up = lv2(pth1[a, ax], *e)
                dn = lv2(pth1[a, ax], *(-v for v in e))
                d = 0.5 * (up - dn)
                acc = d if acc is None else acc + d
            force2.append(-acc)

        # Beris-Edwards at the interior: dQ = Gamma H + S(W,Q) - div flux
        u1 = [lv1(uw[a]) for a in range(3)]
        w = [[0.5 * (lv2(u1[a], *e) - lv2(u1[a], *(-v for v in e)))
              for e in E] for a in range(3)]
        tr = (w[0][0] + w[1][1] + w[2][2]) / 3.0
        for a in range(3):
            w[a][a] = w[a][a] - tr
        q2_5 = [lv2(q1[n]) for n in range(5)]
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
        h5 = [h1[0][0], h1[0][1], h1[0][2], h1[1][1], h1[1][2]]

        # order-1 upwind advection: flux through the +ax face of site i
        # (ref: ops/advect.py advective_fluxes order 1)
        qnew = []
        for n in range(5):
            div = None
            for ax, e in enumerate(E):
                uf_hi = 0.5 * (lv2(u1[ax]) + lv2(u1[ax], *e))
                uf_lo = 0.5 * (lv2(u1[ax], *(-v for v in e))
                               + lv2(u1[ax]))
                phi0 = lv2(q1[n])
                f_hi = uf_hi * jnp.where(uf_hi > 0.0, phi0,
                                         lv2(q1[n], *e))
                f_lo = uf_lo * jnp.where(uf_lo > 0.0,
                                         lv2(q1[n], *(-v for v in e)),
                                         phi0)
                d = f_hi - f_lo
                div = d if div is None else div + d
            qnew.append(lv2(q1[n]) + be_gamma * lv2(h5[n]) + s5[n] - div)

        @pl.when(k >= 2)
        def _():
            for d in out_dma(slot, k - 2):
                d.wait()

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
class LCPlan:
    BX: int = 8
    BY: int = 32


def lc_q_force_step(qpad, upad, fe, be_gamma, xi,
                    plan: LCPlan = LCPlan(), interpret: bool = False,
                    refresh_fn=None):
    """(qpad', force): one fused Q-side update.

    qpad (5, X+4, Y+16, Z), upad (3, X+4, Y+16, Z) with current pads;
    returns the refreshed-padded new q and the (3, X, Y, Z) force.
    refresh_fn overrides the single-shard periodic pad refresh (the
    sharded path substitutes a ppermute face exchange)."""
    _, Xp, Yp, Z = qpad.shape
    X, Y = Xp - 2 * HX, Yp - 2 * HY
    BX, BY = min(plan.BX, X), min(plan.BY, Y)
    if X % BX or Y % BY or BY % 8:
        raise ValueError(f"blocks ({BX},{BY}) must divide ({X},{Y})")

    kernel = partial(_lc_kernel, fe, be_gamma, xi, X, Y, Z, BX, BY)
    qout, force = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct(qpad.shape, qpad.dtype),
                   jax.ShapeDtypeStruct((3, X, Y, Z), qpad.dtype)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[
            pltpu.VMEM((2, 5, BX + 4, BY + 16, Z), qpad.dtype),
            pltpu.VMEM((2, 3, BX + 4, BY + 16, Z), qpad.dtype),
            pltpu.VMEM((2, 5, BX, BY, Z), qpad.dtype),
            pltpu.VMEM((2, 3, BX, BY, Z), qpad.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(qpad, upad)
    return (_refresh if refresh_fn is None else refresh_fn)(qout), force


def make_fused_lc_step(lcfg, plan: LCPlan = LCPlan(), lb_plan=None,
                       interpret: bool = False):
    """Jitted fused LC step: state (fpad, qpad, u) -> state.

    Two Pallas passes per step (Q-side kernel + force-coupled
    collide/stream) vs ~12 HBM passes on the jnp path.  fpad uses
    ops.fused padding (x halo 1), qpad this module's (x halo 2)."""
    from ludwig_tpu.ops.fused import FusedPlan, fused_force_step

    if lb_plan is None:
        lb_plan = FusedPlan()
    model = lcfg.lb.model
    params = lcfg.lb.collision_params()
    fe = lcfg.fe

    @partial(jax.jit, donate_argnums=0)
    def step(state, t=0):
        fpad, qpad, u = state
        upad = pad_q(u)
        qpad, force = lc_q_force_step(qpad, upad, fe, lcfg.gamma,
                                      fe.xi, plan, interpret=interpret)
        fpad, u_new = fused_force_step(fpad, force, model, params,
                                       lb_plan, interpret=interpret)
        return (fpad, qpad, u_new)

    return step


def _pad_exchange_q(xp: jnp.ndarray, nx: int, ny: int,
                    ax: str = "x", ay: str = "y") -> jnp.ndarray:
    """Refresh the radius-2 halo pads of a LOCAL padded block by
    ppermute face exchange over the device mesh (the q/u analogue of
    ops.fused._pad_exchange; ref: src/halo_swap.c:709).

    y rows first (full padded-x extent), then x planes (full padded-y
    extent) so corner pads relay the diagonal neighbour's values.  With
    a 1-device axis the permutation is the identity = periodic wrap."""
    X = xp.shape[1] - 2 * HX
    Y = xp.shape[2] - 2 * HY
    fwd_y = [(i, (i + 1) % ny) for i in range(ny)]
    bwd_y = [(i, (i - 1) % ny) for i in range(ny)]
    lo = jax.lax.ppermute(xp[:, :, Y + HY - 2:Y + HY, :], ay, fwd_y)
    hi = jax.lax.ppermute(xp[:, :, HY:HY + 2, :], ay, bwd_y)
    xp = xp.at[:, :, HY - 2:HY, :].set(lo)
    xp = xp.at[:, :, Y + HY:Y + HY + 2, :].set(hi)
    fwd_x = [(i, (i + 1) % nx) for i in range(nx)]
    bwd_x = [(i, (i - 1) % nx) for i in range(nx)]
    lo = jax.lax.ppermute(xp[:, X:X + HX, :, :], ax, fwd_x)
    hi = jax.lax.ppermute(xp[:, HX:2 * HX, :, :], ax, bwd_x)
    xp = xp.at[:, 0:HX, :, :].set(lo)
    xp = xp.at[:, X + HX:, :, :].set(hi)
    return xp


def make_fused_lc_sharded_step(lcfg, mesh, plan: LCPlan = LCPlan(),
                               lb_plan=None, interpret: bool = False):
    """Multi-chip fused LC step: shard_map over a 2-D ('x', 'y') device
    mesh, each device running the two single-shard Pallas kernels on
    its local block with pads refreshed by ppermute face exchanges
    (q/u radius-2 via `_pad_exchange_q`, f/force radius-1 via
    ops.fused._pad_exchange); z stays whole per device (in-register
    lane rolls remain globally periodic).

    Takes and returns UNPADDED (f, q5, u) global arrays sharded
    P(None, 'x', 'y', None); pads are rebuilt locally each step (one
    extra copy per array — the correctness-first v1 of the multi-chip
    LC path; face-only exchange on carried padded state is the known
    optimisation)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ludwig_tpu.ops.fused import (FusedPlan, fused_force_step,
                                      _pad_exchange)
    from ludwig_tpu.ops.fused import HX as FHX, HY as FHY

    if lb_plan is None:
        lb_plan = FusedPlan()
    model = lcfg.lb.model
    params = lcfg.lb.collision_params()
    fe = lcfg.fe
    nx = int(mesh.shape.get("x", 1))
    ny = int(mesh.shape.get("y", 1))
    spec = P(None, "x", "y", None)

    def exq(xp):
        return _pad_exchange_q(xp, nx, ny)

    def exf(xp):
        return _pad_exchange(xp, nx, ny)

    def padf(x):
        return jnp.pad(x, ((0, 0), (FHX, FHX), (FHY, FHY), (0, 0)))

    def local_step(f, q5, u):
        from ludwig_tpu.ops.fused import unpad_state
        qpad = exq(pad_q(q5))
        upad = exq(pad_q(u))
        fpad = exf(padf(f))
        qpad, force = lc_q_force_step(qpad, upad, fe, lcfg.gamma,
                                      fe.xi, plan, interpret=interpret,
                                      refresh_fn=lambda x: x)
        fpad, u_new = fused_force_step(
            fpad, force, model, params, lb_plan, interpret=interpret,
            pad_force_fn=lambda x: exf(padf(x)),
            refresh_fn=lambda x: x)
        return unpad_state(fpad), unpad_q(qpad), u_new

    @partial(jax.jit, donate_argnums=0)
    def step(state, t=0):
        f, q5, u = state
        return shard_map(local_step, mesh=mesh,
                         in_specs=(spec, spec, spec),
                         out_specs=(spec, spec, spec),
                         check_vma=False)(f, q5, u)

    return step


def make_fused_lc_le_step(lcfg, le, plan: LCPlan = LCPlan(),
                          lb_plan=None, interpret: bool = False):
    """Fused LC step under Lees-Edwards shear: (fpad, qpad, u) -> state.

    The sheared blue phase is the reference's production configuration
    (ref: model_le.c:57 with the q-tensor branch of ludwig.c).  The two
    Pallas kernels run unmodified with plain-periodic x; LE enters as
    O(surface) column work: (1) lc.make_lc_le_column_fix rewrites the
    plane-adjacent columns of q5' and force with the LE-aware formulas,
    (2) the f-side reprojection/displacement runs as the streaming-
    conjugated column post-pass (ops/lees_edwards.apply_le_fused)."""
    from ludwig_tpu.lc import make_lc_le_column_fix
    from ludwig_tpu.ops.fused import (FusedPlan, fused_force_step,
                                      _pad_refresh)
    from ludwig_tpu.ops.fused import HX as FHX, HY as FHY
    from ludwig_tpu.ops.lees_edwards import apply_le_fused

    if lb_plan is None:
        lb_plan = FusedPlan()
    model = lcfg.lb.model
    params = lcfg.lb.collision_params()
    fe = lcfg.fe
    fix = make_lc_le_column_fix(lcfg, le)

    @partial(jax.jit, donate_argnums=0)
    def step(state, t=0):
        fpad, qpad, u = state
        q5 = unpad_q(qpad)
        upad = pad_q(u)
        qpad_new, force = lc_q_force_step(qpad, upad, fe, lcfg.gamma,
                                          fe.xi, plan,
                                          interpret=interpret)
        Y = qpad.shape[2] - 2 * HY
        qcols, fcols = fix(q5, u, t)
        for col, v in qcols.items():
            qpad_new = qpad_new.at[:, HX + col, HY:HY + Y, :].set(
                v.astype(qpad_new.dtype))
        for col, v in fcols.items():
            force = force.at[:, col].set(v.astype(force.dtype))
        qpad_new = _refresh(qpad_new)
        fpad, u_new = fused_force_step(fpad, force, model, params,
                                       lb_plan, interpret=interpret)
        fpad = apply_le_fused(fpad, model, le, t, pad=(FHX, FHY))
        return (_pad_refresh(fpad), qpad_new, u_new)

    return step


def initial_fused_lc(lcfg, q0_field):
    from ludwig_tpu.lb import initial_rest
    from ludwig_tpu.ops.fused import pad_state
    f = initial_rest(lcfg.lb)
    q5 = jnp.asarray(q0_field, lcfg.lb.jdtype)
    u = jnp.zeros((3,) + tuple(lcfg.lb.size), lcfg.lb.jdtype)
    return (pad_state(f, zpad=False), pad_q(q5), u)
