"""Fused electrokinetics Pallas TPU kernels.

The jnp electro pipeline is launch/roll-bound: every neighbour access
is a jnp.roll that XLA materialises as its own HBM pass, so one
Gouy-Chapman step at 128^3 costs ~150 small kernels / ~8.5 ms (PERF.md
round-3 row).  Two kernels replace the hot phases (ref hot loops:
src/psi_sor.c:55-346 psi_solver_sor_solve, src/nernst_planck.c:108-520
nernst_planck_driver + psi_force_gradmu):

* ``sor_solve_fused`` - the red/black Chebyshev SOR solve with the
  WHOLE field resident in VMEM: one HBM read of (psi, rho_el) and one
  write of psi' instead of ~24 HBM passes per sweep.  Iteration
  semantics (omega recurrence, residual accumulation during the
  sweeps, ncheck=5 cadence, f32 stall guard) mirror
  electro_sim.poisson_sor_ref exactly; the kernel also folds in the
  zero-mean shift (stats.site_sum is exact in f64 goldens only - the
  production f32 path uses a tree sum either way).

* ``np_gradmu_fused`` - one blocked pass producing the grad-mu force
  (raw, plus its global sum for the caller's mean subtraction) AND the
  Nernst-Planck d3q7 face-flux update for every species.  x is blocked
  into (BX+2)-slabs (double-buffered DMA like ops/fused.py); y and z
  stay whole per window so their periodic neighbour shifts are
  in-register rolls.

Both kernels are f32-production only (gates: e0 == 0, no mu_ex,
Z % 128 == 0, Y % 8 == 0); the f64 golden tier keeps the jnp
reference-bitwise path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roll(arr, shift, axis):
    """Periodic roll usable inside a Mosaic kernel: lane rolls use the
    native pltpu.roll; other axes use the two-slice concat (measured
    faster than pltpu.roll on the major/sublane dims here)."""
    if shift == 0:
        return arr
    ax = axis % arr.ndim
    if ax == arr.ndim - 1:
        return pltpu.roll(arr, shift % arr.shape[ax], ax)
    s = shift % arr.shape[ax]
    if s == 0:
        return arr
    lo = [slice(None)] * arr.ndim
    hi = [slice(None)] * arr.ndim
    lo[ax] = slice(arr.shape[ax] - s, None)
    hi[ax] = slice(0, arr.shape[ax] - s)
    return jnp.concatenate([arr[tuple(lo)], arr[tuple(hi)]], axis=ax)


# -- whole-field SOR ----------------------------------------------------------

def _sor_kernel(X, Y, Z, eps, rel_tol, abs_tol, max_its,
                zero_mean, f32_stall, dt_,
                psi_hbm, rhs_hbm, om_tab, out_hbm, stats_hbm,
                pbuf, rbuf, sem_in, sem_rhs, sem_out):

    pin = pltpu.make_async_copy(psi_hbm, pbuf, sem_in)
    rin = pltpu.make_async_copy(rhs_hbm, rbuf, sem_rhs)
    pin.start()
    rin.start()
    pin.wait()
    rin.wait()

    ii = jax.lax.broadcasted_iota(jnp.int32, (X, Y, Z), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (X, Y, Z), 1)
    kk = jax.lax.broadcasted_iota(jnp.int32, (X, Y, Z), 2)
    red = ((ii + jj + kk) % 2) == 0
    rhs = rbuf[...]
    rnorm0 = jnp.sqrt(jnp.sum(rhs * rhs))
    denom = dt_(6.0 * eps)

    def neigh_sum(p):
        s = _roll(p, 1, 0) + _roll(p, -1, 0)
        s = s + _roll(p, 1, 1) + _roll(p, -1, 1)
        s = s + _roll(p, 1, 2) + _roll(p, -1, 2)
        return s

    def half(p, mask, omega):
        # op order matches poisson_sor_ref exactly: (omega*res)/(6 eps)
        res = dt_(eps) * (neigh_sum(p) - 6.0 * p) + rhs
        pn = jnp.where(mask, p + omega * res / denom, p)
        return pn, jnp.sum(jnp.where(mask, res * res, 0.0))

    def body(n, carry):
        prev, rn, stop, nstop, which = carry

        def live(_):
            # omega sequence precomputed in f64 on the host (the jnp
            # path's recurrence runs as weak-f64 scalars), f32 at use
            p = pbuf[...]
            nt = jnp.minimum(n, om_tab.shape[0] - 1)
            p, s_red = half(p, red, om_tab[nt, 0])
            p, s_blk = half(p, jnp.logical_not(red), om_tab[nt, 1])
            pbuf[...] = p
            rnorm1 = jnp.sqrt(s_red + s_blk)
            conv = jnp.logical_or(rnorm1 < dt_(abs_tol),
                                  rnorm1 < dt_(rel_tol) * rnorm0)
            check = n % 5 == 0
            if f32_stall:
                stall = jnp.logical_and(n > 0,
                                        rnorm1 >= dt_(0.995) * prev)
                conv = jnp.logical_or(conv, stall)
            prev1 = jnp.where(check, rnorm1, prev)
            stop1 = jnp.logical_and(check, conv)
            which1 = jnp.where(rnorm1 < dt_(abs_tol),
                               jnp.int32(0), jnp.int32(1))
            return (prev1, rnorm1, stop1,
                    jnp.where(stop1, jnp.int32(n), nstop), which1)

        return jax.lax.cond(stop, lambda _: carry, live, 0)

    init = (dt_(np.inf), dt_(np.inf),
            jnp.bool_(False), jnp.int32(max_its - 1), jnp.int32(1))
    prev, rn, stop, nstop, which = jax.lax.fori_loop(
        0, max_its, body, init)

    p = pbuf[...]
    if zero_mean:
        p = p - jnp.sum(p) / dt_(X * Y * Z)
        pbuf[...] = p
    stats_hbm[0, 0] = nstop.astype(dt_)
    stats_hbm[0, 1] = rn
    stats_hbm[0, 2] = which.astype(dt_)

    pout = pltpu.make_async_copy(pbuf, out_hbm, sem_out)
    pout.start()
    pout.wait()


def sor_supported(shape, e0=(0.0, 0.0, 0.0)) -> bool:
    """Whole-field VMEM SOR fits when psi+rhs+temporaries stay inside
    ~100 MB and the tile alignment holds."""
    X, Y, Z = (int(s) for s in shape)
    bytes_ = X * Y * Z * 4
    return (Z % 128 == 0 and Y % 8 == 0 and 6 * bytes_ <= 100 * 2 ** 20
            and not any(float(v) for v in e0))


def sor_solve_fused(psi, rho_el, cfg, zero_mean=True,
                    interpret=False):
    """Fused SOR solve: (psi', n_printed, rnorm, which).

    Same convergence semantics as electro_sim.poisson_sor_ref with the
    f32 stall guard; `zero_mean` also applies the post-solve mean
    shift in-kernel (one fewer HBM pass)."""
    X, Y, Z = psi.shape
    rhs = (cfg.e * cfg.beta) * rho_el
    radius = 1.0 - 0.5 * (np.pi / max(X, Z)) ** 2
    f32 = psi.dtype == jnp.float32
    # Chebyshev omega sequence in f64 (the jnp path's weak-f64 scalar
    # recurrence), cast f32 at use inside the kernel
    r2 = radius * radius
    om = 1.0
    # omega converges to its Chebyshev fixed point well inside 1024
    # iterations (within f32 resolution in tens); cap the SMEM table
    # and clamp the in-kernel index
    T = min(int(cfg.max_its), 1024)
    seq = np.empty((T, 2), np.float64)
    for n in range(T):
        seq[n, 0] = om
        om = (1.0 / (1.0 - 0.5 * r2) if n == 0
              else 1.0 / (1.0 - 0.25 * r2 * om))
        seq[n, 1] = om
        om = 1.0 / (1.0 - 0.25 * r2 * om)
    om_tab = jnp.asarray(seq, psi.dtype)
    kernel = partial(_sor_kernel, X, Y, Z, float(cfg.epsilon),
                     float(cfg.rel_tol), float(cfg.abs_tol),
                     int(cfg.max_its), zero_mean, f32, psi.dtype.type)
    out, st = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct(psi.shape, psi.dtype),
                   jax.ShapeDtypeStruct((1, 3), psi.dtype)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        scratch_shapes=[
            pltpu.VMEM((X, Y, Z), psi.dtype),
            pltpu.VMEM((X, Y, Z), psi.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(psi, rhs.astype(psi.dtype), om_tab)
    n = st[0, 0].astype(jnp.int32)
    which = st[0, 2].astype(jnp.int32)
    return out, n, st[0, 1], which


# -- blocked NP + grad-mu force ----------------------------------------------

def _np_kernel(nk, valency, diffusivity, e, beta, dt, hydro,
               X, Y, Z, BX,
               psi_hbm, rho_hbm, u_hbm, fluid_hbm,
               rho_out, force_out, fsum_out,
               pbuf, rbuf, ubuf, flbuf, robuf, fobuf, facc,
               sems, osems):
    """One pass over x-slabs: for each (BX+2, Y, Z) window compute the
    grad-mu force (raw) and the d3q7 NP face-flux divergence update.
    y/z neighbour access is an in-window periodic roll; x comes from
    the slab halo."""
    nbx = X // BX
    dt_ = jnp.float32

    def in_dma(slot, i):
        x0 = i * BX
        return (
            pltpu.make_async_copy(psi_hbm.at[pl.ds(x0, BX + 2)],
                                  pbuf.at[slot], sems.at[0, slot]),
            pltpu.make_async_copy(rho_hbm.at[:, pl.ds(x0, BX + 2)],
                                  rbuf.at[slot], sems.at[1, slot]),
            pltpu.make_async_copy(u_hbm.at[:, pl.ds(x0, BX + 2)],
                                  ubuf.at[slot], sems.at[2, slot]),
            pltpu.make_async_copy(fluid_hbm.at[pl.ds(x0, BX + 2)],
                                  flbuf.at[slot], sems.at[3, slot]),
        )

    def out_dma(slot, i):
        x0 = i * BX
        return (
            pltpu.make_async_copy(robuf.at[slot],
                                  rho_out.at[:, pl.ds(x0, BX)],
                                  osems.at[0, slot]),
            pltpu.make_async_copy(fobuf.at[slot],
                                  force_out.at[:, pl.ds(x0, BX)],
                                  osems.at[1, slot]),
        )

    for d in in_dma(0, 0):
        d.start()
    for a in range(3):
        facc[0, a] = jnp.float32(0.0)

    def body(i, _):
        slot = i % 2
        nslot = (i + 1) % 2

        @pl.when(i + 1 < nbx)
        def _():
            for d in in_dma(nslot, i + 1):
                d.start()

        for d in in_dma(slot, i):
            d.wait()

        psi = pbuf[slot]                       # (BX+2, Y, Z)
        fl = flbuf[slot]
        kt_e = dt_(1.0 / (beta * e))

        # grad-mu force on the interior BX sites (needs psi +-1 on all
        # axes; x neighbours from the halo, y/z in-window rolls)
        re = jnp.zeros((BX + 2, Y, Z), dt_)
        for k in range(nk):
            re = re + dt_(e * valency[k]) * rbuf[slot, k]
        exf = -0.5 * (psi[2:, :, :] - psi[:-2, :, :]) * kt_e
        eyf = -0.5 * (_roll(psi, -1, 1) - _roll(psi, 1, 1)) * kt_e
        ezf = -0.5 * (_roll(psi, -1, 2) - _roll(psi, 1, 2)) * kt_e
        fobuf[slot, 0] = re[1:-1] * exf
        fobuf[slot, 1] = (re * eyf)[1:-1]
        fobuf[slot, 2] = (re * ezf)[1:-1]
        facc[0, 0] += jnp.sum(fobuf[slot, 0])
        facc[0, 1] += jnp.sum(fobuf[slot, 1])
        facc[0, 2] += jnp.sum(fobuf[slot, 2])

        # face masks: face +x at w (w, w+1 fluid), +y/+z in-window
        fm_x = fl[:-1] * fl[1:]                # (BX+1, Y, Z)
        fm_y = fl * _roll(fl, -1, 1)
        fm_z = fl * _roll(fl, -1, 2)

        for k in range(nk):
            z = dt_(valency[k])
            d0 = dt_(diffusivity[k])
            nkf = rbuf[slot, k]                # (BX+2, Y, Z)

            # x faces: between w and w+1 for w in [0, BX+1)
            dmu = z * (psi[1:] - psi[:-1])     # (BX+1, Y, Z)
            b1 = jnp.exp(dmu)
            flx = -d0 * 0.5 * (1.0 + 1.0 / b1) * (
                nkf[1:] * b1 - nkf[:-1])
            if hydro:
                ua = 0.5 * (ubuf[slot, 0, 1:] + ubuf[slot, 0, :-1])
                flx = flx + ua * 0.5 * (nkf[:-1] + nkf[1:])
            flx = flx * fm_x
            div = flx[1:] - flx[:-1]           # (BX, Y, Z)

            for ax, fm in ((1, fm_y), (2, fm_z)):
                dmu = z * (_roll(psi, -1, ax) - psi)
                b1 = jnp.exp(dmu)
                flx = -d0 * 0.5 * (1.0 + 1.0 / b1) * (
                    _roll(nkf, -1, ax) * b1 - nkf)
                if hydro:
                    ua = 0.5 * (ubuf[slot, ax]
                                + _roll(ubuf[slot, ax], -1, ax))
                    flx = flx + ua * 0.5 * (nkf + _roll(nkf, -1, ax))
                flx = flx * fm
                div = div + (flx - _roll(flx, 1, ax))[1:-1]

            upd = nkf[1:-1] - dt_(dt) * div
            robuf[slot, k] = jnp.where(fl[1:-1] > 0, upd, nkf[1:-1])

        @pl.when(i >= 2)
        def _():
            for d in out_dma(slot, i - 2):
                d.wait()

        for d in out_dma(slot, i):
            d.start()
        return 0

    jax.lax.fori_loop(0, nbx, body, 0)
    for d in out_dma((nbx - 1) % 2, nbx - 1):
        d.wait()

    @pl.when(nbx >= 2)
    def _():
        for d in out_dma(nbx % 2, nbx - 2):
            d.wait()

    fsum_out[0, 0] = facc[0, 0]
    fsum_out[0, 1] = facc[0, 1]
    fsum_out[0, 2] = facc[0, 2]


def np_supported(size, cfg, e0=(0.0, 0.0, 0.0), mu_ex=None) -> bool:
    X, Y, Z = (int(s) for s in size)
    return (Z % 128 == 0 and Y % 8 == 0 and mu_ex is None
            and not any(float(v) for v in e0)
            and X % _np_bx(size) == 0)


def _np_bx(size) -> int:
    X = int(size[0])
    for bx in (8, 4, 2, 1):
        if X % bx == 0:
            return bx
    return 1


def np_gradmu_fused(psi, rho, u, fluid, cfg, dt, interpret=False):
    """(rho', force_raw, fsum): NP d3q7 sub-step + raw grad-mu force +
    its global sum (caller subtracts fsum / nsites; the reference's
    psi_force_gradmu mean correction)."""
    ek = cfg.ek
    X, Y, Z = psi.shape
    BX = _np_bx(psi.shape)
    nk = ek.nk
    # x halo of 1 wrapped site each side, built once per call
    def padx(a):
        return jnp.concatenate([a[..., -1:, :, :], a,
                                a[..., :1, :, :]], axis=-3)
    dtype = psi.dtype
    fl = fluid.astype(dtype)
    hydro = u is not None and cfg.hydrodynamics
    u3 = (u if hydro
          else jnp.zeros((3,) + tuple(psi.shape), dtype))
    kernel = partial(_np_kernel, nk, tuple(float(v) for v in ek.valency),
                     tuple(float(d) for d in ek.diffusivity),
                     float(ek.e), float(ek.beta), float(dt), hydro,
                     X, Y, Z, BX)
    W = BX + 2
    rho2, force, fsum = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((nk, X, Y, Z), dtype),
                   jax.ShapeDtypeStruct((3, X, Y, Z), dtype),
                   jax.ShapeDtypeStruct((1, 3), dtype)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        scratch_shapes=[
            pltpu.VMEM((2, W, Y, Z), dtype),
            pltpu.VMEM((2, nk, W, Y, Z), dtype),
            pltpu.VMEM((2, 3, W, Y, Z), dtype),
            pltpu.VMEM((2, W, Y, Z), dtype),
            pltpu.VMEM((2, nk, BX, Y, Z), dtype),
            pltpu.VMEM((2, 3, BX, Y, Z), dtype),
            pltpu.SMEM((1, 3), dtype),
            pltpu.SemaphoreType.DMA((4, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(padx(psi), padx(rho), padx(u3), padx(fl))
    return rho2, force, fsum[0]
