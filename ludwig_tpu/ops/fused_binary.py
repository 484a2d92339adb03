"""Fused binary-fluid (symmetric + Cahn-Hilliard) update kernels for TPU.

The jnp/XLA binary step materialises ~8 HBM passes (gradients, mu,
stress, force, advective fluxes, CH update, collide, stream); at small
and mid sizes it is dispatch/HBM-latency bound (PERF.md: 30.9 ms/step at
64^3).  Same two-pass structure as ops.fused_lc:

  K1 (this file): phi, u  ->  phi', force
      7-point gradients, mu = A phi + B phi^3 - kappa del^2 phi, the
      symmetric stress and its divergence, and the flux-form CH update
      (order-1 upwind or order-2 centred advection + two-point
      diffusive flux), all per block in VMEM
      (ref: src/phi_cahn_hilliard.c:295 flux_mu1, :1017 ufs update;
       src/phi_force.c:274-470 stress divergence; src/symmetric.c).
  K2 (ops.fused with force coupling): f, force -> f', u.

Windowing matches ops.fused_lc: x untiled-major with halo 2, y pads
8-aligned (inner 2 rows used), z in-register lane rolls (periodic).
Halo width 2 = divergence (1) of flux/stress built from mu/gradients (1).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ludwig_tpu.ops.fused_lc import HX, HY, _refresh, _zroll


def pad_phi(x: jnp.ndarray) -> jnp.ndarray:
    """(X, Y, Z) -> (X+4, Y+16, Z) periodic pads."""
    return jnp.pad(x, ((HX, HX), (HY, HY), (0, 0)), mode="wrap")


def unpad_phi(xp: jnp.ndarray) -> jnp.ndarray:
    return xp[HX:-HX, HY:-HY, :]


def _refresh1(xp: jnp.ndarray) -> jnp.ndarray:
    """Scalar-field version of fused_lc._refresh."""
    return _refresh(xp[None])[0]


def _binary_kernel(fe, mobility, order, X, Y, Z, BX, BY,
                   ppad_hbm, upad_hbm, pout_hbm, fout_hbm,
                   pbuf, ubuf, poutbuf, foutbuf, psem, usem, posem, fosem):
    """grid=() kernel over (X/BX, Y/BY) blocks, double-buffered DMA."""
    nbx, nby = X // BX, Y // BY
    nblocks = nbx * nby
    W1X, W1Y = BX + 2, BY + 2          # level-1 region (radius-1 ops)

    def in_dma(slot, k):
        i, j = k // nby, k % nby
        return (pltpu.make_async_copy(
            ppad_hbm.at[pl.ds(i * BX, BX + 4), pl.ds(j * BY, BY + 16), :],
            pbuf.at[slot], psem.at[slot]),
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
        pw = pbuf[slot, :, HY - 2:HY + BY + 2, :]
        uw = [ubuf[slot, a, :, HY - 2:HY + BY + 2, :] for a in range(3)]

        def lv1(arr, dx=0, dy=0, dz=0):
            blk = arr[1 + dx:1 + dx + W1X, 1 + dy:1 + dy + W1Y, :]
            return _zroll(blk, dz, Z)

        def lv2(arr1, dx=0, dy=0, dz=0):
            blk = arr1[1 + dx:1 + dx + BX, 1 + dy:1 + dy + BY, :]
            return _zroll(blk, dz, Z)

        E = ((1, 0, 0), (0, 1, 0), (0, 0, 1))

        # gradients / laplacian / mu / stress at level 1 (7-point)
        phi1 = lv1(pw)
        grad1 = [0.5 * (lv1(pw, *e) - lv1(pw, *(-v for v in e)))
                 for e in E]
        dsq1 = sum(lv1(pw, *e) + lv1(pw, *(-v for v in e))
                   for e in E) - 6.0 * phi1
        # mu and stress componentwise (fe.stress's jnp.eye broadcast is
        # not Mosaic-lowerable; same arithmetic as fe/symmetric.py)
        A, B, kappa = fe.a, fe.b, fe.kappa
        mu1 = A * phi1 + B * phi1 * phi1 * phi1 - kappa * dsq1
        g2 = (grad1[0] * grad1[0] + grad1[1] * grad1[1]
              + grad1[2] * grad1[2])
        p0 = (0.5 * A * phi1 * phi1 + 0.75 * B * phi1 ** 4
              - kappa * phi1 * dsq1 - 0.5 * kappa * g2)
        pth1 = [[(p0 if a == b else 0.0) + kappa * grad1[a] * grad1[b]
                 for b in range(3)] for a in range(3)]

        # force = -div pth at the interior, faces telescoped to the
        # central difference (ref: ops/force.py stress_divergence_force)
        force2 = []
        for a in range(3):
            acc = None
            for ax, e in enumerate(E):
                d = 0.5 * (lv2(pth1[a][ax], *e)
                           - lv2(pth1[a][ax], *(-v for v in e)))
                acc = d if acc is None else acc + d
            force2.append(-acc)

        # CH flux-form update at the interior: for each axis the east
        # flux at i and at i-e (advective + two-point diffusive), with
        # the jnp path's exact term composition (ops/advect.py +
        # dynamics/cahn_hilliard.py)
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
            elif order == 2:
                adv_i = uf_i * (0.5 * (lv2(phi1) + lv2(phi1, *e)))
                adv_im = uf_im * (0.5 * (lv2(phi1, *me) + lv2(phi1)))
            else:
                raise ValueError(f"fused binary: order {order} (use 1/2)")
            flux_i = adv_i - mobility * (lv2(mu1, *e) - lv2(mu1))
            flux_im = adv_im - mobility * (lv2(mu1) - lv2(mu1, *me))
            d = flux_i - flux_im
            div = d if div is None else div + d
        phinew = lv2(phi1) - div

        @pl.when(k >= 2)
        def _():
            for d in out_dma(slot, k - 2):
                d.wait()

        poutbuf[slot] = phinew
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
class BinaryPlan:
    BX: int = 8
    BY: int = 32


def binary_phi_force_step(ppad, upad, fe, mobility, order,
                          plan: BinaryPlan = BinaryPlan(),
                          interpret: bool = False, refresh_fn=None):
    """(ppad', force): one fused phi-side update.

    ppad (X+4, Y+16, Z), upad (3, X+4, Y+16, Z) with current pads;
    returns the refreshed-padded new phi and the (3, X, Y, Z) force.
    refresh_fn overrides the single-shard periodic pad refresh (the
    sharded path substitutes a ppermute face exchange)."""
    Xp, Yp, Z = ppad.shape
    X, Y = Xp - 2 * HX, Yp - 2 * HY
    BX, BY = min(plan.BX, X), min(plan.BY, Y)
    if X % BX or Y % BY or BY % 8:
        raise ValueError(f"blocks ({BX},{BY}) must divide ({X},{Y})")

    kernel = partial(_binary_kernel, fe, mobility, order, X, Y, Z, BX, BY)
    pout, force = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct(ppad.shape, ppad.dtype),
                   jax.ShapeDtypeStruct((3, X, Y, Z), ppad.dtype)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[
            pltpu.VMEM((2, BX + 4, BY + 16, Z), ppad.dtype),
            pltpu.VMEM((2, 3, BX + 4, BY + 16, Z), ppad.dtype),
            pltpu.VMEM((2, BX, BY, Z), ppad.dtype),
            pltpu.VMEM((2, 3, BX, BY, Z), ppad.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(ppad, upad)
    return (_refresh1 if refresh_fn is None else refresh_fn)(pout), force


def make_fused_binary_step(bcfg, plan: BinaryPlan = BinaryPlan(),
                           lb_plan=None, interpret: bool = False):
    """Jitted fused binary step: state (fpad, ppad, u) -> state.

    Two Pallas passes per step (phi-side kernel + force-coupled
    collide/stream) vs ~8 HBM passes on the jnp path.  Periodic fluid
    (no walls/solid), stress-divergence force, advection order 1 or 2 —
    the flagship spinodal configuration."""
    from ludwig_tpu.ops.fused import FusedPlan, fused_force_step
    from ludwig_tpu.ops.fused_lc import pad_q

    if lb_plan is None:
        lb_plan = FusedPlan()
    model = bcfg.lb.model
    params = bcfg.lb.collision_params()

    @partial(jax.jit, donate_argnums=0)
    def step(state, t=0):
        fpad, ppad, u = state
        upad = pad_q(u)
        ppad, force = binary_phi_force_step(
            ppad, upad, bcfg.fe, bcfg.mobility, bcfg.advection_order,
            plan, interpret=interpret)
        fpad, u_new = fused_force_step(fpad, force, model, params,
                                       lb_plan, interpret=interpret)
        return (fpad, ppad, u_new)

    return step


def make_fused_binary_sharded_step(bcfg, mesh,
                                   plan: BinaryPlan = BinaryPlan(),
                                   lb_plan=None, interpret: bool = False):
    """Multi-chip fused binary step: shard_map over a 2-D ('x', 'y')
    device mesh (the binary analogue of fused_lc.
    make_fused_lc_sharded_step; ref: src/halo_swap.c:709).

    Takes and returns UNPADDED (f, phi, u) global arrays sharded
    P(None, 'x', 'y', None) / P('x', 'y', None) for phi."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ludwig_tpu.ops.fused import (FusedPlan, fused_force_step,
                                      _pad_exchange)
    from ludwig_tpu.ops.fused import HX as FHX, HY as FHY
    from ludwig_tpu.ops.fused_lc import _pad_exchange_q, pad_q

    if lb_plan is None:
        lb_plan = FusedPlan()
    model = bcfg.lb.model
    params = bcfg.lb.collision_params()
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

    def local_step(f, phi, u):
        from ludwig_tpu.ops.fused import unpad_state
        ppad = exq(pad_phi(phi)[None])[0]
        upad = exq(pad_q(u))
        fpad = exf(padf(f))
        ppad, force = binary_phi_force_step(
            ppad, upad, bcfg.fe, bcfg.mobility, bcfg.advection_order,
            plan, interpret=interpret, refresh_fn=lambda x: x)
        fpad, u_new = fused_force_step(
            fpad, force, model, params, lb_plan, interpret=interpret,
            pad_force_fn=lambda x: exf(padf(x)),
            refresh_fn=lambda x: x)
        return unpad_state(fpad), unpad_phi(ppad), u_new

    @partial(jax.jit, donate_argnums=0)
    def step(state, t=0):
        f, phi, u = state
        return shard_map(local_step, mesh=mesh,
                         in_specs=(spec, spec_phi, spec),
                         out_specs=(spec, spec_phi, spec),
                         check_vma=False)(f, phi, u)

    return step


def make_fused_binary_le_step(lecfg, plan: BinaryPlan = BinaryPlan(),
                              lb_plan=None, interpret: bool = False):
    """Fused binary step under Lees-Edwards shear:
    (fpad, ppad, u) -> state.

    Same pattern as the sheared LC path (ops/fused_lc.py
    make_fused_lc_le_step): the two Pallas kernels run plain-periodic;
    LE enters as O(surface) column work — binary_le.
    make_binary_le_column_fix rewrites the plane-adjacent columns of
    phi' and force, then the f-side reprojection/displacement runs as
    the streaming-conjugated column post-pass (ref: model_le.c:57 +
    phi_ch_le_fix_fluxes)."""
    from ludwig_tpu.binary_le import make_binary_le_column_fix
    from ludwig_tpu.ops.fused import (FusedPlan, fused_force_step,
                                      _pad_refresh)
    from ludwig_tpu.ops.fused import HX as FHX, HY as FHY
    from ludwig_tpu.ops.fused_lc import pad_q
    from ludwig_tpu.ops.lees_edwards import apply_le_fused

    if lb_plan is None:
        lb_plan = FusedPlan()
    bcfg = lecfg.binary
    le = lecfg.le
    model = bcfg.lb.model
    params = bcfg.lb.collision_params()
    fix = make_binary_le_column_fix(lecfg)

    @partial(jax.jit, donate_argnums=0)
    def step(state, t=0):
        fpad, ppad, u = state
        phi = unpad_phi(ppad)
        upad = pad_q(u)
        ppad_new, force = binary_phi_force_step(
            ppad, upad, bcfg.fe, bcfg.mobility, bcfg.advection_order,
            plan, interpret=interpret)
        Y = ppad.shape[1] - 2 * HY
        pcols, fcols = fix(phi, u, t)
        for col, v in pcols.items():
            ppad_new = ppad_new.at[HX + col, HY:HY + Y, :].set(
                v.astype(ppad_new.dtype))
        for col, v in fcols.items():
            force = force.at[:, col].set(v.astype(force.dtype))
        ppad_new = _refresh1(ppad_new)
        fpad, u_new = fused_force_step(fpad, force, model, params,
                                       lb_plan, interpret=interpret)
        fpad = apply_le_fused(fpad, model, le, t, pad=(FHX, FHY))
        return (_pad_refresh(fpad), ppad_new, u_new)

    return step


def initial_fused_binary(bcfg, phi0):
    from ludwig_tpu.lb import initial_rest
    from ludwig_tpu.ops.fused import pad_state
    f = initial_rest(bcfg.lb)
    phi = jnp.asarray(phi0, bcfg.lb.jdtype)
    u = jnp.zeros((3,) + tuple(bcfg.lb.size), bcfg.lb.jdtype)
    return (pad_state(f, zpad=False), pad_phi(phi), u)
