"""Fused collide + stream Pallas TPU kernel over a halo-padded lattice.

This is the performance core of the framework - the TPU-native answer to
the reference's two hottest kernels, collision (ref: src/collision.c:259-600)
and propagation (ref: src/propagation.c:43-96), plus the halo update
(ref: src/halo_swap.c), all in ONE pass over HBM.

Design:

* State is a padded array ``fpad (nvel, X+2, Y+16, Z)``: live sites at
  x in [1, X+1), y in [8, Y+8).  The x pad planes (width 1) and the
  innermost y pad rows (7 and Y+8) hold periodic - or, on a device mesh,
  neighbour-shard - copies.  y pads are 8 wide because Mosaic requires
  HBM DMA slices to be tile-aligned (offset and shape multiples of 8 in
  the sublane dim); x is an untiled major dim so its windows are free.
  z is unpadded: the kernel handles z-periodicity with an in-register
  lane roll, keeping the minor dim a multiple of 128.

* A single grid-free kernel loops over (BX, BY) column blocks with
  double-buffered manual DMA: while block k computes, block k+1 streams
  in and block k-1 streams out.  Each block DMAs an aligned
  (BX+2, BY+16, Z) window, value-slices it to the (BX+2, BY+2, Z) halo
  window, computes the full moment-space collision, then assembles the
  pull-streamed output  f'_q(x) = collide_q(f(x - c_q))  from static
  window slices (x/y shifts) and lane rolls (z shifts).

* The mode transforms are unrolled with compile-time constants (zeros
  skipped, +/-1 folded) - pure VPU work, no MXU, exact in f32 - and
  factorised over +/-c velocity pairs: every mode has definite parity
  under c -> -c, so the forward transform acts on even/odd half-sums
  and the back transform shares one even and one odd accumulation per
  pair (f'_q = E + O, f'_-q = E - O), ~halving the multiply-add terms
  of both hot loops (217 -> ~127 per transform for D3Q19).

Traffic per step: ~((BX+2)(BY+16)/(BX BY) + 1) HBM passes of f, vs ~12
for the unfused XLA pipeline.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ludwig_tpu.lattice import LatticeModel
from ludwig_tpu.ops.collide import CollisionParams, _triu_pairs

HX = 1   # x halo width (untiled dim: free alignment)
HY = 8   # y pad width (sublane tile alignment); only the inner row is used


def zpad_len(Z: int, radius: int = 1) -> int:
    """Lane-padded z extent: the kernel's z-periodic lane rolls need the
    minor dim to be a multiple of 128 on hardware.  Lifts the
    reference's any-extent support (ref: coords.c:639) onto the fused
    path; sub-128 z extents pay a lane-occupancy cost instead of
    falling back to the unfused pipeline.  Two schemes:

    * 128 % Z == 0 ("tile"): the state holds 128/Z full copies of the
      live z range.  A z-periodic array replicated k times is periodic
      with period Z under every kernel operation (pointwise collide,
      x/y window shifts, z lane rolls), so NO per-step refresh is
      needed - the replication is an invariant of the step.
    * otherwise ("ghost"): append ghost lane columns carrying the wrap
      values (cols [Z, Z+r) = live [0, r), cols [Zp-r, Zp) = live
      [Z-r, Z)), so rolls by up to `radius` stay periodic over the
      live extent; the ghosts are rewritten each step.  Needs
      Zp >= Z + 2r.
    """
    if Z % 128 == 0:
        return Z
    if 128 % Z == 0:
        return 128
    zp = ((Z + 127) // 128) * 128
    if zp - Z < 2 * radius:
        zp += 128
    return zp


def _z_ghost_refresh(fpad: jnp.ndarray, Z: int,
                     radius: int = 1) -> jnp.ndarray:
    """(Re)write the z ghost lane columns from the live columns
    (no-op in tile mode: replication is a step invariant)."""
    Zp = fpad.shape[-1]
    if Zp == Z or 128 % Z == 0:     # unpadded, or tile mode
        return fpad
    r = radius
    fpad = fpad.at[..., Z:Z + r].set(fpad[..., 0:r])
    fpad = fpad.at[..., Zp - r:].set(fpad[..., Z - r:Z])
    return fpad


def _z_resync(fpad: jnp.ndarray, Z: int, radius: int = 1) -> jnp.ndarray:
    """Restore the z lane padding after an O(surface) post-pass wrote
    the live columns only (wall/LE fixes): re-tile the copies (tile
    mode) or rewrite the ghost columns (ghost mode)."""
    Zp = fpad.shape[-1]
    if Zp == Z:
        return fpad
    if 128 % Z == 0:
        live = fpad[..., :Z]
        return jnp.concatenate([live] * (Zp // Z), axis=-1)
    return _z_ghost_refresh(fpad, Z, radius)


def pad_state(f: jnp.ndarray, zpad: bool = True) -> jnp.ndarray:
    """(nvel, X, Y, Z) -> padded (nvel, X+2, Y+16, Zp), periodic pads.

    Zp > Z (z lane padding, tiled or ghost) when Z is not a lane
    multiple; see zpad_len.  zpad=False keeps z unpadded (callers whose
    downstream kernels do not yet accept a lane-padded state).
    """
    fpad = jnp.pad(f, ((0, 0), (HX, HX), (HY, HY), (0, 0)), mode="wrap")
    Z = f.shape[-1]
    Zp = zpad_len(Z) if zpad else Z
    if Zp == Z:
        return fpad
    if 128 % Z == 0:
        return jnp.concatenate([fpad] * (Zp // Z), axis=-1)
    ghost = jnp.broadcast_to(fpad[..., :1], fpad.shape[:-1] + (Zp - Z,))
    return _z_ghost_refresh(jnp.concatenate([fpad, ghost], axis=-1), Z)


def unpad_state(fpad: jnp.ndarray, z: int = None) -> jnp.ndarray:
    """Strip pads; pass the live z extent `z` when it may be
    lane-padded (callers that know the lattice size always should)."""
    out = fpad[:, HX:-HX, HY:-HY, :]
    if z is not None and z != out.shape[-1]:
        out = out[..., :z]
    return out


def _pad_refresh(fpad: jnp.ndarray, z: int = None) -> jnp.ndarray:
    """Re-derive periodic pads from the live region (single-shard case).

    On a device mesh this is replaced by a ppermute of face slabs.  Only
    the inner pad row/plane is written; in-place dynamic-update-slices
    keep the cost at face traffic.  y rows first, then x columns, so the
    corners pick up the correct doubly-periodic values; z ghost lanes
    last so every row/plane carries valid wrap columns.
    """
    X = fpad.shape[1] - 2 * HX
    Y = fpad.shape[2] - 2 * HY
    fpad = fpad.at[:, :, HY - 1, :].set(fpad[:, :, Y + HY - 1, :])
    fpad = fpad.at[:, :, Y + HY, :].set(fpad[:, :, HY, :])
    fpad = fpad.at[:, 0, :, :].set(fpad[:, X, :, :])
    fpad = fpad.at[:, X + 1, :, :].set(fpad[:, 1, :, :])
    if z is not None:
        fpad = _z_ghost_refresh(fpad, z)
    return fpad


_EO_CACHE = {}


def _eo_tables(model: LatticeModel):
    """(anti, par): antipode index per velocity, +/-1 parity per mode.

    Every mode row of `ma` is a polynomial of definite parity in c
    (ma[m, anti[q]] == par[m] * ma[m, q]), hence mi[anti[q], m] ==
    par[m] * mi[q, m]: both transforms factorise over +/-c velocity
    pairs into even/odd half-sums, roughly halving the VPU terms of the
    fused kernels' hottest loops (verified exactly for D2Q9/D3Q15/
    D3Q19/D3Q27 at table-build time below)."""
    key = model.nvel
    hit = _EO_CACHE.get(key)
    if hit is not None:
        return hit
    n = model.nvel
    cv, ma = model.cv, model.ma
    idx = {tuple(int(c) for c in cv[q]): q for q in range(n)}
    anti = tuple(idx[tuple(-int(c) for c in cv[q])] for q in range(n))
    par = []
    for m in range(n):
        even = all(float(ma[m, anti[q]]) == float(ma[m, q])
                   for q in range(n))
        odd = all(float(ma[m, anti[q]]) == -float(ma[m, q])
                  for q in range(n))
        if even == odd:
            raise ValueError(f"mode {m} has no definite c-parity")
        par.append(1 if even else -1)
    mi = model.mi
    for q in range(n):
        for m in range(n):
            if float(mi[anti[q], m]) != par[m] * float(mi[q, m]):
                raise ValueError("mi rows are not +/-c symmetric")
    _EO_CACHE[key] = (anti, tuple(par))
    return _EO_CACHE[key]


def _eo_matvec(model: LatticeModel, fl):
    """modes = ma @ fl, factorised over +/-c pairs: even modes act on
    e_q = f_q + f_{-q}, odd modes on o_q = f_q - f_{-q}.  Trace-time
    unrolled (zeros skipped, +/-1 folded) like ops.collide's
    unrolled_matvec but with ~half the multiply-add terms."""
    anti, par = _eo_tables(model)
    n = model.nvel
    ma = model.ma
    e, o = {}, {}
    for q in range(n):
        if anti[q] > q:
            e[q] = fl[q] + fl[anti[q]]
            o[q] = fl[q] - fl[anti[q]]
    out = []
    for m in range(n):
        acc = None
        for q in range(n):
            qb = anti[q]
            if qb < q:
                continue
            coef = float(ma[m, q])
            if coef == 0.0:
                continue
            src = fl[q] if qb == q else (e[q] if par[m] > 0 else o[q])
            term = src if coef == 1.0 else (
                -src if coef == -1.0 else coef * src)
            acc = term if acc is None else acc + term
        out.append(acc)
    return out


def _assemble_eo(model: LatticeModel, modes, emit):
    """Back transform f'_q = sum_m mi[q, m] modes[m] for ALL velocities,
    factorised over +/-c pairs: one even-mode sum E and one odd-mode
    sum O per pair, then emit(E + O, q) and emit(E - O, -q).  All fused
    kernels share this exact expression tree, so they stay bitwise
    equal to each other."""
    anti, par = _eo_tables(model)
    mi = model.mi
    for q in range(model.nvel):
        qb = anti[q]
        if qb < q:
            continue
        E = O = None
        for m in range(model.nvel):
            coef = float(mi[q, m])
            if coef == 0.0 or isinstance(modes[m], float):
                continue
            term = modes[m] if coef == 1.0 else (
                -modes[m] if coef == -1.0 else coef * modes[m])
            if par[m] > 0:
                E = term if E is None else E + term
            else:
                O = term if O is None else O + term
        if qb == q:
            emit(E, q)  # rest velocity: odd-mode coefficients are 0
        else:
            emit(E + O, q)
            emit(E - O, qb)


def _make_stream_emit(model: LatticeModel, Z, nx_out, ny_out, sink):
    """emit closure for _assemble_eo doing the pull-streamed slice
    (x/y shifts are static window slices, z a periodic lane roll) and
    handing the (nx_out, ny_out, Z) block to sink(q, blk)."""
    cvs = [(int(model.cv[q][0]), int(model.cv[q][1]), int(model.cv[q][2]))
           for q in range(model.nvel)]

    def emit(acc, q):
        cx, cy, cz = cvs[q]
        blk = acc[1 - cx:1 - cx + nx_out, 1 - cy:1 - cy + ny_out, :]
        if cz:
            blk = pltpu.roll(blk, cz % Z, 2)  # roll wants shift >= 0
        sink(q, blk)

    return emit


def _collide_modes(model: LatticeModel, params: CollisionParams, fl,
                   force=None, noise_sg=None):
    """Post-collision modes from a list of per-velocity arrays.

    Single-fluid hot path; algebra identical to ops.collide.collide.
    `force` is an optional [fx, fy, fz] per-site body force at the same
    window level (the LC coupling); it adds the Guo half-force velocity
    shift, the momentum-mode increment and the (2 - rtau) stress
    correction.  `noise_sg` is an optional (shat_by_pair, ghat_list)
    from _noise_modes: isothermal fluctuations INSIDE the fused kernel
    (ref: collision.c:53 applies them inside the collision kernel).

    Returns (modes, u).
    """
    ndim = model.ndim
    m = _eo_matvec(model, fl)
    rho = m[0]
    rrho = 1.0 / rho
    fg = [float(v) for v in params.force_global[:ndim]]
    if force is None:
        ftot = fg
        has_f = [bool(v) for v in fg]
    else:
        ftot = [force[a] + fg[a] if fg[a] else force[a]
                for a in range(ndim)]
        has_f = [True] * ndim
    u = [rrho * (m[1 + a] + 0.5 * ftot[a]) for a in range(ndim)]

    pairs = _triu_pairs(ndim)
    s = {p: m[1 + ndim + i] for i, p in enumerate(pairs)}
    seq = {p: rho * u[p[0]] * u[p[1]] for p in pairs}
    tr_s = sum(s[(a, a)] for a in range(ndim))
    tr_seq = sum(seq[(a, a)] for a in range(ndim))
    rdim = 1.0 / ndim
    rt = params.rtau_shear
    rtb = params.rtau_bulk
    tr_post = tr_s - rtb * (tr_s - tr_seq)

    shat, ghat = noise_sg if noise_sg is not None else (None, None)
    out = [rho] + [m[1 + a] + ftot[a] if has_f[a] else m[1 + a]
                   for a in range(ndim)]
    for (a, b) in pairs:
        dev = s[(a, b)] - (tr_s * rdim if a == b else 0.0)
        dev_eq = seq[(a, b)] - (tr_seq * rdim if a == b else 0.0)
        v = dev - rt * (dev - dev_eq)
        if a == b:
            v = v + rdim * tr_post
        if has_f[a] or has_f[b]:
            v = v + (2.0 - rt) * (u[a] * ftot[b] + ftot[a] * u[b])
        if shat is not None:
            v = v + shat[(a, b)]
        out.append(v)
    rtau_g = params.rtau_ghost
    for gi, g in enumerate(range(model.nhydro, model.nvel)):
        coef = 1.0 - float(rtau_g[g])
        val = m[g] * coef if coef != 0.0 else None
        if ghat is not None and ghat[gi] is not None:
            val = ghat[gi] if val is None else val + ghat[gi]
        out.append(val if val is not None else 0.0)
    return out, u


def _collide_mode_deltas(model: LatticeModel, params: CollisionParams,
                         fl, force=None, noise_sg=None):
    """Post-collision mode INCREMENTS delta_m = m'_m - m_m, plus u.

    Same algebra as _collide_modes, rearranged so the conserved modes
    have delta EXACTLY zero (density) or the bare force (momentum).
    Assembling f'_q = f_q + sum_m mi[q, m] delta_m then leaves the
    conserved content of f untouched by the back-transform rounding:
    the f32 per-site conservation error scales with the O(relaxation)
    update instead of with |f|, which is what keeps the global
    momentum/mass totals from random-walking over long production
    runs (ACCURACY.md f32 conservation study)."""
    ndim = model.ndim
    m = _eo_matvec(model, fl)
    rho = m[0]
    rrho = 1.0 / rho
    fg = [float(v) for v in params.force_global[:ndim]]
    if force is None:
        ftot = fg
        has_f = [bool(v) for v in fg]
    else:
        ftot = [force[a] + fg[a] if fg[a] else force[a]
                for a in range(ndim)]
        has_f = [True] * ndim
    u = [rrho * (m[1 + a] + 0.5 * ftot[a]) for a in range(ndim)]

    pairs = _triu_pairs(ndim)
    s = {p: m[1 + ndim + i] for i, p in enumerate(pairs)}
    seq = {p: rho * u[p[0]] * u[p[1]] for p in pairs}
    tr_s = sum(s[(a, a)] for a in range(ndim))
    tr_seq = sum(seq[(a, a)] for a in range(ndim))
    rdim = 1.0 / ndim
    rt = params.rtau_shear
    rtb = params.rtau_bulk

    shat, ghat = noise_sg if noise_sg is not None else (None, None)
    out = [0.0] + [ftot[a] if has_f[a] else 0.0 for a in range(ndim)]
    for (a, b) in pairs:
        dev = s[(a, b)] - (tr_s * rdim if a == b else 0.0)
        dev_eq = seq[(a, b)] - (tr_seq * rdim if a == b else 0.0)
        v = -rt * (dev - dev_eq)
        if a == b:
            v = v - rdim * rtb * (tr_s - tr_seq)
        if has_f[a] or has_f[b]:
            v = v + (2.0 - rt) * (u[a] * ftot[b] + ftot[a] * u[b])
        if shat is not None:
            v = v + shat[(a, b)]
        out.append(v)
    rtau_g = params.rtau_ghost
    for gi, g in enumerate(range(model.nhydro, model.nvel)):
        coef = -float(rtau_g[g])
        val = m[g] * coef if coef != 0.0 else None
        if ghat is not None and ghat[gi] is not None:
            val = ghat[gi] if val is None else val + ghat[gi]
        out.append(val if val is not None else 0.0)
    return out, u


def _assemble_eo_deltas(model: LatticeModel, fl, deltas, emit):
    """Back transform in increment form: f'_q = f_q + sum_m mi[q, m]
    delta_m, factorised over +/-c pairs like _assemble_eo.  Constant
    (python float) nonzero deltas - the global body force - are folded
    as scalars."""
    anti, par = _eo_tables(model)
    mi = model.mi
    for q in range(model.nvel):
        qb = anti[q]
        if qb < q:
            continue
        E = O = None
        for m in range(model.nvel):
            coef = float(mi[q, m])
            if coef == 0.0 or (isinstance(deltas[m], float)
                               and deltas[m] == 0.0):
                continue
            term = deltas[m] if coef == 1.0 else (
                -deltas[m] if coef == -1.0 else coef * deltas[m])
            if par[m] > 0:
                E = term if E is None else E + term
            else:
                O = term if O is None else O + term
        if qb == q:
            emit(fl[q] if E is None else fl[q] + E, q)
        else:
            hi = fl[q] if E is None and O is None else (
                fl[q] + (E if O is None else (O if E is None else E + O)))
            lo = fl[qb] if E is None and O is None else (
                fl[qb] + ((E if O is None else (-O if E is None
                                                else E - O))))
            emit(hi, q)
            emit(lo, qb)


def _fused_kernel(model: LatticeModel, params: CollisionParams,
                  X, Y, Z, BX, BY,
                  fpad_hbm, out_hbm, inbuf, outbuf, insem, outsem,
                  noise=None, zlive=None, step_smem=None, delta=True):
    """grid=() kernel: fori_loop over (nbx * nby) blocks, double-buffered.

    With `noise` (FusedNoise), per-site counter-keyed fluctuations are
    generated in VMEM and applied inside the collision (ref:
    collision.c:53); `step_smem` carries the timestep counter."""
    nvel = model.nvel
    nbx, nby = X // BX, Y // BY
    nblocks = nbx * nby

    def in_dma(slot, k):
        i = k // nby
        j = k % nby
        return pltpu.make_async_copy(
            fpad_hbm.at[:, pl.ds(i * BX, BX + 2), pl.ds(j * BY, BY + 16), :],
            inbuf.at[slot],
            insem.at[slot])

    def out_dma(slot, k):
        i = k // nby
        j = k % nby
        return pltpu.make_async_copy(
            outbuf.at[slot],
            out_hbm.at[:, pl.ds(HX + i * BX, BX),
                       pl.ds(HY + j * BY, BY), :],
            outsem.at[slot])

    in_dma(0, 0).start()

    def body(k, _):
        slot = k % 2
        nslot = (k + 1) % 2

        @pl.when(k + 1 < nblocks)
        def _():
            in_dma(nslot, k + 1).start()

        in_dma(slot, k).wait()

        # Halo window (BX+2, BY+2, Z): value-slice the aligned DMA window.
        window = inbuf[slot]
        fl = [window[p, :, HY - 1:HY + BY + 1, :] for p in range(nvel)]
        noise_sg = None
        if noise is not None:
            i = k // nby
            j = k % nby
            wshape = (BX + 2, BY + 2, Z)
            dt_ = fl[0].dtype.type
            gx = jax.lax.broadcasted_iota(jnp.int32, wshape, 0) \
                + i * np.int32(BX) - np.int32(1)
            gx = jax.lax.rem(gx + np.int32(X), np.int32(X))
            gy = jax.lax.broadcasted_iota(jnp.int32, wshape, 1) \
                + j * np.int32(BY) - np.int32(1)
            gy = jax.lax.rem(gy + np.int32(Y), np.int32(Y))
            gz = jax.lax.broadcasted_iota(jnp.int32, wshape, 2)
            zl = Z if zlive is None else int(zlive)
            if zl != Z:
                # lane padding: duplicated/ghost columns must draw the
                # SAME noise as the live column they mirror
                wrap = jax.lax.rem(gz, np.int32(zl))
                if 128 % zl == 0:
                    gz = wrap
                else:
                    gz = jnp.where(gz == np.int32(Z - 1),
                                   np.int32(zl - 1), wrap)
            noise_sg = _noise_modes(model, noise, wshape, gx, gy, gz,
                                    step_smem[0], dt_)
        if delta:
            modes, _u = _collide_mode_deltas(model, params, fl,
                                             noise_sg=noise_sg)
        else:
            modes, _u = _collide_modes(model, params, fl,
                                       noise_sg=noise_sg)

        # Make sure this staging slot's previous output DMA completed.
        @pl.when(k >= 2)
        def _():
            out_dma(slot, k - 2).wait()

        # Pull-streamed assembly: f'_q = collide_q shifted by c_q,
        # factorised over +/-c pairs (even/odd mode half-sums).
        def store(q, blk):
            outbuf[slot, q] = blk
        emit = _make_stream_emit(model, Z, BX, BY, store)
        if delta:
            _assemble_eo_deltas(model, fl, modes, emit)
        else:
            _assemble_eo(model, modes, emit)

        out_dma(slot, k).start()
        return 0

    jax.lax.fori_loop(0, nblocks, body, 0)
    out_dma((nblocks - 1) % 2, nblocks - 1).wait()

    @pl.when(nblocks >= 2)
    def _():
        out_dma(nblocks % 2, nblocks - 2).wait()


@dataclasses.dataclass(frozen=True)
class FusedPlan:
    """Block-size plan for the fused kernel.

    (16, 32) balances VMEM (~70 MB) against halo read amplification
    (18/16 * 48/32 = 1.69x on reads) at 256^3.
    """
    BX: int = 16
    BY: int = 32


def fused_step(fpad: jnp.ndarray, model: LatticeModel,
               params: CollisionParams, plan: FusedPlan = FusedPlan(),
               interpret: bool = False, z: int = None,
               noise=None, t=0, delta: bool = True) -> jnp.ndarray:
    """One fused collide+stream step on a padded state; returns new padded
    state (pads refreshed, single-shard periodic).  `z` is the live z
    extent when the state is lane-padded (zpad_len); `noise` an optional
    FusedNoise (isothermal fluctuations in-kernel, keyed on step t).
    `delta` (default True on this production path) selects the
    conservation-hardened increment-form back transform; see
    _fusedn_kernel for the form trade-off."""
    return _pad_refresh(_fused_call(fpad, model, params, plan, interpret,
                                    noise=noise, z=z, t=t, delta=delta),
                        z=z)


def _fused_call(fpad: jnp.ndarray, model: LatticeModel,
                params: CollisionParams, plan: FusedPlan = FusedPlan(),
                interpret: bool = False, noise=None, z: int = None,
                t=0, delta: bool = True) -> jnp.ndarray:
    """The raw kernel launch: new padded state with STALE pads (the
    caller refreshes them - locally, or by ppermute on a mesh)."""
    nvel, Xp, Yp, Z = fpad.shape
    X, Y = Xp - 2 * HX, Yp - 2 * HY
    BX = min(plan.BX, X)
    BY = min(plan.BY, Y)
    if X % BX or Y % BY or BY % 8:
        raise ValueError(
            f"blocks ({BX},{BY}) must divide lattice ({X},{Y}), BY%8==0")
    if not interpret and Z % 128:
        raise ValueError(
            f"fused kernel state must be z lane-padded to a multiple of "
            f"128 on hardware (got {Z}); pad with pad_state/zpad_len")

    scratch = [
        pltpu.VMEM((2, nvel, BX + 2, BY + 16, Z), fpad.dtype),
        pltpu.VMEM((2, nvel, BX, BY, Z), fpad.dtype),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    cp = pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024)
    if noise is None:
        kernel = partial(_fused_kernel, model, params, X, Y, Z, BX, BY,
                         delta=delta)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(fpad.shape, fpad.dtype),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=scratch, compiler_params=cp,
            interpret=interpret,
        )(fpad)

    def kernel(fpad_hbm, step_ref, out_hbm, inbuf, outbuf, insem,
               outsem):
        _fused_kernel(model, params, X, Y, Z, BX, BY, fpad_hbm,
                      out_hbm, inbuf, outbuf, insem, outsem,
                      noise=noise, zlive=z, step_smem=step_ref,
                      delta=delta)

    step_arr = jnp.full((1,), t, jnp.int32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(fpad.shape, fpad.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=scratch, compiler_params=cp,
        interpret=interpret,
    )(fpad, step_arr)


def make_fused_wall_step(cfg, spec, plan: FusedPlan = FusedPlan(),
                         interpret: bool = False):
    """Fused collide+stream with halo plane walls: ((fpad, gwall), t) ->
    (fpad', gwall').

    The Pallas kernel streams fully periodically; the contaminated
    boundary-plane populations are then overwritten with half-way
    bounce-back (incl. moving walls) computed from a collide of ONLY the
    boundary planes of the pre-step state - O(surface) work around the
    unmodified O(volume) kernel (ref: wall.c:860-980 wall_bbl_kernel;
    step order ludwig.c collide -> halo -> wall -> propagation).
    gwall accumulates the momentum transferred to the walls for the
    [walls] statistics row (ref: wall.c fnet, wall_momentum).
    """
    from ludwig_tpu.ops.collide import collide
    from ludwig_tpu.ops.walls import wall_bounce_back_fused
    model = cfg.model
    params = cfg.collision_params()

    def plane2(f, ax):
        sl_lo = [slice(None)] * 4
        sl_lo[1 + ax] = slice(0, 1)
        sl_hi = [slice(None)] * 4
        sl_hi[1 + ax] = slice(f.shape[1 + ax] - 1, f.shape[1 + ax])
        return jnp.concatenate([f[tuple(sl_lo)], f[tuple(sl_hi)]],
                               axis=1 + ax)

    zlive = cfg.size[2]

    @partial(jax.jit, donate_argnums=0)
    def step(state, t=0):
        fpad, gwall = state
        f = unpad_state(fpad, z=zlive)
        fpost2 = {ax: collide(plane2(f, ax), params)[0]
                  for ax in range(3) if spec.walls[ax]}
        fpad = _fused_call(fpad, model, params, plan, interpret)
        fpad, gw = wall_bounce_back_fused(fpad, fpost2, model, spec,
                                          rho0=cfg.rho0, z=zlive)
        # the surface fix wrote live z columns only: restore the lane
        # padding first, then the x/y pads (which copy whole rows)
        fpad = _z_resync(fpad, zlive)
        return (_pad_refresh(fpad), gwall + gw)

    return step


def make_fused_le_step(cfg, le, plan: FusedPlan = FusedPlan(),
                       interpret: bool = False):
    """Fused collide+stream with Lees-Edwards sliding boundaries:
    ((fpad,), t) -> (fpad',).

    The LE reprojection + y-displacement runs as a column post-pass
    conjugated through streaming (ops/lees_edwards.apply_le_fused) -
    exactly the reference's collide -> LE -> propagate order
    (ref: model_le.c:57, ludwig.c:811) at O(surface) cost."""
    from ludwig_tpu.ops.lees_edwards import apply_le_fused
    model = cfg.model
    params = cfg.collision_params()

    zlive = cfg.size[2]

    @partial(jax.jit, donate_argnums=0)
    def step(state, t=0):
        fpad = _fused_call(state[0], model, params, plan, interpret)
        fpad = apply_le_fused(fpad, model, le, t, pad=(HX, HY), z=zlive)
        fpad = _z_resync(fpad, zlive)
        return (_pad_refresh(fpad),)

    return step


def make_fused_nstep(model: LatticeModel, params: CollisionParams,
                     plan: FusedPlan = FusedPlan(), interpret: bool = False,
                     z: int = None, noise=None, delta: bool = True):
    """Jitted n-step driver on padded state (donated, scanned).  `z` is
    the live z extent for lane-padded states (zpad_len); with `noise`
    the steps are numbered t0 + k for the counter stream."""

    @partial(jax.jit, static_argnums=1, donate_argnums=0)
    def nstep(fpad, n, t0=0):
        def body(fp, k):
            return fused_step(fp, model, params, plan,
                              interpret=interpret, z=z, noise=noise,
                              t=t0 + k, delta=delta), ()
        fpad, _ = jax.lax.scan(body, fpad, jnp.arange(n))
        return fpad

    return nstep


HX2 = 2  # x halo width of the temporally-blocked (2-step) kernel


def pad_state2(f: jnp.ndarray) -> jnp.ndarray:
    """(nvel, X, Y, Z) -> padded (nvel, X+4, Y+16, Z) for the 2-step
    kernel (x halo 2; the two innermost y pad rows are live)."""
    return jnp.pad(f, ((0, 0), (HX2, HX2), (HY, HY), (0, 0)), mode="wrap")


def unpad_state2(fpad: jnp.ndarray) -> jnp.ndarray:
    return fpad[:, HX2:-HX2, HY:-HY, :]


def _pad_refresh2(fpad: jnp.ndarray) -> jnp.ndarray:
    """Periodic pad refresh for the 2-step kernel: two rows/planes per
    side (y first, then x, so corners pick up doubly-periodic values)."""
    X = fpad.shape[1] - 2 * HX2
    Y = fpad.shape[2] - 2 * HY
    fpad = fpad.at[:, :, HY - 2:HY, :].set(fpad[:, :, Y + HY - 2:Y + HY, :])
    fpad = fpad.at[:, :, Y + HY:Y + HY + 2, :].set(fpad[:, :, HY:HY + 2, :])
    fpad = fpad.at[:, 0:2, :, :].set(fpad[:, X:X + 2, :, :])
    fpad = fpad.at[:, X + 2:X + 4, :, :].set(fpad[:, 2:4, :, :])
    return fpad


def _fused2_kernel(model: LatticeModel, params: CollisionParams,
                   X, Y, Z, BX, BY,
                   fpad_hbm, out_hbm, inbuf, outbuf, insem, outsem,
                   delta=False):
    """Temporally-blocked kernel: TWO collide+stream steps per HBM pass.

    Per (BX, BY) block the DMA window is (BX+4, BY+16); step 1 produces
    the intermediate state on the (BX+2, BY+2) halo window entirely in
    VMEM, step 2 consumes it to emit the final (BX, BY) block.  HBM
    traffic per two steps is ~((BX+4)(BY+16)/(BX BY) + 1) passes of f -
    at (16, 32) that is 2.88 vs 5.38 for two single-step passes.  The
    arithmetic per site is identical to the single-step kernel's, so
    the result is bitwise equal to two fused_step calls.
    """
    nvel = model.nvel
    nbx, nby = X // BX, Y // BY
    nblocks = nbx * nby

    def in_dma(slot, k):
        i = k // nby
        j = k % nby
        return pltpu.make_async_copy(
            fpad_hbm.at[:, pl.ds(i * BX, BX + 4), pl.ds(j * BY, BY + 16), :],
            inbuf.at[slot],
            insem.at[slot])

    def out_dma(slot, k):
        i = k // nby
        j = k % nby
        return pltpu.make_async_copy(
            outbuf.at[slot],
            out_hbm.at[:, pl.ds(HX2 + i * BX, BX),
                       pl.ds(HY + j * BY, BY), :],
            outsem.at[slot])

    in_dma(0, 0).start()

    collide_fn = _collide_mode_deltas if delta else _collide_modes

    def assemble_all(fl_src, modes, nx_out, ny_out):
        out = [None] * nvel
        def sink(q, blk):
            out[q] = blk
        emit = _make_stream_emit(model, Z, nx_out, ny_out, sink)
        if delta:
            _assemble_eo_deltas(model, fl_src, modes, emit)
        else:
            _assemble_eo(model, modes, emit)
        return out

    def body(k, _):
        slot = k % 2
        nslot = (k + 1) % 2

        @pl.when(k + 1 < nblocks)
        def _():
            in_dma(nslot, k + 1).start()

        in_dma(slot, k).wait()

        window = inbuf[slot]
        # step 1 over the (BX+2, BY+2) halo window: sources span
        # (BX+4, BY+4) = window y rows [HY-2, HY+BY+2)
        fl0 = [window[p, :, HY - 2:HY + BY + 2, :] for p in range(nvel)]
        modes0, _u0 = collide_fn(model, params, fl0)
        f1 = assemble_all(fl0, modes0, BX + 2, BY + 2)

        # step 2 on the intermediate state
        modes1, _u1 = collide_fn(model, params, f1)

        @pl.when(k >= 2)
        def _():
            out_dma(slot, k - 2).wait()

        def store(q, blk):
            outbuf[slot, q] = blk
        emit2 = _make_stream_emit(model, Z, BX, BY, store)
        if delta:
            _assemble_eo_deltas(model, f1, modes1, emit2)
        else:
            _assemble_eo(model, modes1, emit2)

        out_dma(slot, k).start()
        return 0

    jax.lax.fori_loop(0, nblocks, body, 0)
    out_dma((nblocks - 1) % 2, nblocks - 1).wait()

    @pl.when(nblocks >= 2)
    def _():
        out_dma(nblocks % 2, nblocks - 2).wait()


def fused2_step(fpad: jnp.ndarray, model: LatticeModel,
                params: CollisionParams, plan: FusedPlan = FusedPlan(),
                interpret: bool = False,
                delta: bool = False) -> jnp.ndarray:
    """TWO fused collide+stream steps on a pad_state2-padded state."""
    nvel, Xp, Yp, Z = fpad.shape
    X, Y = Xp - 2 * HX2, Yp - 2 * HY
    BX = min(plan.BX, X)
    BY = min(plan.BY, Y)
    if X % BX or Y % BY or BY % 8:
        raise ValueError(
            f"blocks ({BX},{BY}) must divide lattice ({X},{Y}), BY%8==0")
    if not interpret and Z % 128:
        raise ValueError(
            f"fused kernel needs Z % 128 == 0 on hardware (got {Z})")

    kernel = partial(_fused2_kernel, model, params, X, Y, Z, BX, BY,
                     delta=delta)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(fpad.shape, fpad.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, nvel, BX + 4, BY + 16, Z), fpad.dtype),
            pltpu.VMEM((2, nvel, BX, BY, Z), fpad.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(fpad)
    return _pad_refresh2(out)


def make_fused2_nstep(model: LatticeModel, params: CollisionParams,
                      plan: FusedPlan = FusedPlan(),
                      interpret: bool = False):
    """Jitted n-step driver on a pad_state2 state; n must be even."""

    @partial(jax.jit, static_argnums=1, donate_argnums=0)
    def nstep(fpad, n):
        if n % 2:
            raise ValueError("fused2 nstep needs an even step count")
        def body(fp, _):
            return fused2_step(fp, model, params, plan,
                               interpret=interpret), ()
        fpad, _ = jax.lax.scan(body, fpad, None, length=n // 2)
        return fpad

    return nstep


def pad_staten(f: jnp.ndarray, nsteps: int) -> jnp.ndarray:
    """(nvel, X, Y, Z) -> (nvel, X+2n, Y+16, Z) for the n-step
    temporally-blocked kernel (x halo n; the n innermost y pad rows are
    live).  n <= HY(=8) by construction."""
    return jnp.pad(f, ((0, 0), (nsteps, nsteps), (HY, HY), (0, 0)),
                   mode="wrap")


def unpad_staten(fpad: jnp.ndarray, nsteps: int) -> jnp.ndarray:
    return fpad[:, nsteps:-nsteps, HY:-HY, :]


def _pad_refreshn(fpad: jnp.ndarray, nsteps: int) -> jnp.ndarray:
    """Periodic pad refresh for the n-step kernel: n rows/planes per
    side (y first, then x, so corners pick up doubly-periodic values)."""
    H = nsteps
    X = fpad.shape[1] - 2 * H
    Y = fpad.shape[2] - 2 * HY
    fpad = fpad.at[:, :, HY - H:HY, :].set(fpad[:, :, Y + HY - H:Y + HY, :])
    fpad = fpad.at[:, :, Y + HY:Y + HY + H, :].set(fpad[:, :, HY:HY + H, :])
    fpad = fpad.at[:, 0:H, :, :].set(fpad[:, X:X + H, :, :])
    fpad = fpad.at[:, X + H:X + 2 * H, :, :].set(fpad[:, H:2 * H, :, :])
    return fpad


def _fusedn_kernel(model: LatticeModel, params: CollisionParams,
                   nsteps, X, Y, Z, BX, BY,
                   fpad_hbm, out_hbm, inbuf, outbuf, insem, outsem,
                   delta=False):
    """Temporally-blocked kernel generalised to n collide+stream steps
    per HBM pass.

    Per (BX, BY) block the DMA window is (BX+2n, BY+16); step s produces
    an intermediate state on a (BX+2(n-1-s), BY+2(n-1-s)) halo window
    entirely in VMEM, the last step emits the final (BX, BY) block.  The
    y window is (BY+16) regardless of n (Mosaic tile alignment pads y by
    8 each side anyway), so for n <= 8 the extra temporal depth only
    widens x: HBM traffic per n steps is (BX+2n)(BY+16)/(BX BY) + 1
    passes of f - at (16, 32) and n=3 that is 3.06 vs 2.88/2 steps for
    the 2-step kernel and 2.69/1 for the single-step kernel, i.e. 1.02
    HBM passes per step.

    `delta` selects the collision arithmetic: False (default) uses the
    absolute back transform f' = mi @ m', whose live set per stage is
    ~19 mode arrays; True uses the increment form f' = f + mi @ dm of
    the single-step production kernel (conservation-hardened), whose
    live set is ~34 arrays (fl stays live through the back transform) -
    at n >= 5 that spills past the 128 MB vmem on real chips and at
    n = 4 the spill traffic costs ~25% throughput (round-4 regression:
    139.89M vmem needed, 71M register-allocator spill).  With matching
    `delta` the result is bitwise equal to n fused_step calls.
    """
    nvel = model.nvel
    nbx, nby = X // BX, Y // BY
    nblocks = nbx * nby
    H = nsteps

    def in_dma(slot, k):
        i = k // nby
        j = k % nby
        return pltpu.make_async_copy(
            fpad_hbm.at[:, pl.ds(i * BX, BX + 2 * H),
                        pl.ds(j * BY, BY + 16), :],
            inbuf.at[slot],
            insem.at[slot])

    def out_dma(slot, k):
        i = k // nby
        j = k % nby
        return pltpu.make_async_copy(
            outbuf.at[slot],
            out_hbm.at[:, pl.ds(H + i * BX, BX),
                       pl.ds(HY + j * BY, BY), :],
            outsem.at[slot])

    in_dma(0, 0).start()

    def assemble_all(fl_src, modes, nx_out, ny_out):
        out = [None] * nvel
        def sink(q, blk):
            out[q] = blk
        emit = _make_stream_emit(model, Z, nx_out, ny_out, sink)
        if delta:
            _assemble_eo_deltas(model, fl_src, modes, emit)
        else:
            _assemble_eo(model, modes, emit)
        return out

    collide_fn = _collide_mode_deltas if delta else _collide_modes

    def body(k, _):
        slot = k % 2
        nslot = (k + 1) % 2

        @pl.when(k + 1 < nblocks)
        def _():
            in_dma(nslot, k + 1).start()

        in_dma(slot, k).wait()

        window = inbuf[slot]
        # step 0 sources span (BX+2n, BY+2n) = y rows [HY-n, HY+BY+n)
        fl = [window[p, :, HY - H:HY + BY + H, :] for p in range(nvel)]
        for s in range(H - 1):
            modes, _u = collide_fn(model, params, fl)
            m = H - 1 - s   # halo width remaining after this step
            fl = assemble_all(fl, modes, BX + 2 * m, BY + 2 * m)
        modes, _u = collide_fn(model, params, fl)

        @pl.when(k >= 2)
        def _():
            out_dma(slot, k - 2).wait()

        def store(q, blk):
            outbuf[slot, q] = blk
        emit = _make_stream_emit(model, Z, BX, BY, store)
        if delta:
            _assemble_eo_deltas(model, fl, modes, emit)
        else:
            _assemble_eo(model, modes, emit)

        out_dma(slot, k).start()
        return 0

    jax.lax.fori_loop(0, nblocks, body, 0)
    out_dma((nblocks - 1) % 2, nblocks - 1).wait()

    @pl.when(nblocks >= 2)
    def _():
        out_dma(nblocks % 2, nblocks - 2).wait()


def fusedn_step(fpad: jnp.ndarray, model: LatticeModel,
                params: CollisionParams, nsteps: int,
                plan: FusedPlan = FusedPlan(),
                interpret: bool = False,
                delta: bool = False) -> jnp.ndarray:
    """n fused collide+stream steps on a pad_staten-padded state."""
    if not 1 <= nsteps <= HY:
        raise ValueError(f"nsteps must be in [1, {HY}] (got {nsteps})")
    nvel, Xp, Yp, Z = fpad.shape
    X, Y = Xp - 2 * nsteps, Yp - 2 * HY
    BX = min(plan.BX, X)
    BY = min(plan.BY, Y)
    if X % BX or Y % BY or BY % 8:
        raise ValueError(
            f"blocks ({BX},{BY}) must divide lattice ({X},{Y}), BY%8==0")
    if 2 * nsteps > BY + 2:
        raise ValueError(f"BY={BY} too small for {nsteps} temporal steps")
    if not interpret and Z % 128:
        raise ValueError(
            f"fused kernel needs Z % 128 == 0 on hardware (got {Z})")

    kernel = partial(_fusedn_kernel, model, params, nsteps, X, Y, Z,
                     BX, BY, delta=delta)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(fpad.shape, fpad.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, nvel, BX + 2 * nsteps, BY + 16, Z), fpad.dtype),
            pltpu.VMEM((2, nvel, BX, BY, Z), fpad.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(fpad)
    return _pad_refreshn(out, nsteps)


def make_fusedn_nstep(model: LatticeModel, params: CollisionParams,
                      nsteps: int, plan: FusedPlan = FusedPlan(),
                      interpret: bool = False, delta: bool = False):
    """Jitted n-step driver on a pad_staten state; n must be a multiple
    of `nsteps`."""

    @partial(jax.jit, static_argnums=1, donate_argnums=0)
    def nstep(fpad, n):
        if n % nsteps:
            raise ValueError(f"fusedn nstep needs n % {nsteps} == 0")
        def body(fp, _):
            return fusedn_step(fp, model, params, nsteps, plan,
                               interpret=interpret, delta=delta), ()
        fpad, _ = jax.lax.scan(body, fpad, None, length=n // nsteps)
        return fpad

    return nstep


def _fused_force_kernel(model: LatticeModel, params: CollisionParams,
                        X, Y, Z, BX, BY, with_solid,
                        *refs):
    """Force-coupled collide+stream: extra per-site force input (padded
    like f: (3, X+2, Y+16, Z)) and a hydro-velocity output (the next
    Q-kernel's advection input).

    With `with_solid`, an extra 0/1 mask input (padded (X+2, Y+16, Z))
    selects in-lattice solid sites: streaming applies half-way
    bounce-back exactly like ops.stream.stream_bounce_back - a link
    whose source site is solid receives the receiver's own
    post-collision antipode population, and solid sites keep their
    PRE-collision values (the masked-collide semantics of the jnp
    path).  This is the reference's porous/plate geometry
    (ref: map.c status, propagation.c + bounce-back in lb_bbl)."""
    if with_solid:
        (fpad_hbm, force_hbm, solid_hbm, out_hbm, u_hbm, gw_out,
         inbuf, fbuf, sbuf, outbuf, ubuf, wacc,
         insem, fsem, ssem, outsem, usem) = refs
    else:
        (fpad_hbm, force_hbm, out_hbm, u_hbm,
         inbuf, fbuf, outbuf, ubuf,
         insem, fsem, outsem, usem) = refs
    nvel = model.nvel
    nbx, nby = X // BX, Y // BY
    nblocks = nbx * nby
    anti, _par = _eo_tables(model)

    def in_dma(slot, k):
        i, j = k // nby, k % nby
        dmas = [pltpu.make_async_copy(
            fpad_hbm.at[:, pl.ds(i * BX, BX + 2), pl.ds(j * BY, BY + 16), :],
            inbuf.at[slot], insem.at[slot]),
            pltpu.make_async_copy(
            force_hbm.at[:, pl.ds(i * BX, BX + 2),
                         pl.ds(j * BY, BY + 16), :],
            fbuf.at[slot], fsem.at[slot])]
        if with_solid:
            dmas.append(pltpu.make_async_copy(
                solid_hbm.at[pl.ds(i * BX, BX + 2),
                             pl.ds(j * BY, BY + 16), :],
                sbuf.at[slot], ssem.at[slot]))
        return dmas

    def out_dma(slot, k):
        i, j = k // nby, k % nby
        return (pltpu.make_async_copy(
            outbuf.at[slot],
            out_hbm.at[:, pl.ds(HX + i * BX, BX),
                       pl.ds(HY + j * BY, BY), :], outsem.at[slot]),
            pltpu.make_async_copy(
            ubuf.at[slot],
            u_hbm.at[:, pl.ds(i * BX, BX), pl.ds(j * BY, BY), :],
            usem.at[slot]))

    for d in in_dma(0, 0):
        d.start()

    if with_solid:
        wacc[...] = jnp.zeros_like(wacc)

    cvs = [(int(model.cv[q][0]), int(model.cv[q][1]), int(model.cv[q][2]))
           for q in range(nvel)]

    def body(k, _):
        slot = k % 2
        nslot = (k + 1) % 2

        @pl.when(k + 1 < nblocks)
        def _():
            for d in in_dma(nslot, k + 1):
                d.start()

        for d in in_dma(slot, k):
            d.wait()

        window = inbuf[slot]
        fl = [window[p, :, HY - 1:HY + BY + 1, :] for p in range(nvel)]
        fw = [fbuf[slot, a, :, HY - 1:HY + BY + 1, :] for a in range(3)]
        modes, u = _collide_mode_deltas(model, params, fl, force=fw)

        @pl.when(k >= 2)
        def _():
            for d in out_dma(slot, k - 2):
                d.wait()

        if not with_solid:
            def store(q, blk):
                outbuf[slot, q] = blk
            _assemble_eo_deltas(model, fl, modes,
                                _make_stream_emit(model, Z, BX, BY,
                                                  store))
        else:
            sol = sbuf[slot][:, HY - 1:HY + BY + 1, :]  # (BX+2,BY+2,Z)
            solc = sol[1:1 + BX, 1:1 + BY, :]
            # centre post-collision values (for the bounce-back
            # replacement and the solid-keeps-pre rule)
            post = [None] * nvel

            def sinkc(acc, q):
                post[q] = acc
            _assemble_eo_deltas(model, fl, modes, sinkc)

            def store(q, blk):
                cx, cy, cz = cvs[q]
                ss = sol[1 - cx:1 - cx + BX, 1 - cy:1 - cy + BY, :]
                if cz:
                    ss = pltpu.roll(ss, cz % Z, 2)
                bb = post[anti[q]][1:1 + BX, 1:1 + BY, :]
                live = jnp.logical_and(ss > 0.5, solc <= 0.5)
                out = jnp.where(ss > 0.5, bb, blk)
                outbuf[slot, q] = jnp.where(
                    solc > 0.5, fl[q][1:1 + BX, 1:1 + BY, :], out)
                if cx or cy or cz:
                    # momentum handed to the wall by this link,
                    # accumulated into per-component VMEM fields (one
                    # scalar reduce at the very end; per-link scalar
                    # sums would serialise the whole pipeline)
                    # (ref: wall.c:1279-1299; -2 sum f*_qbar c_q)
                    lv = jnp.where(live, bb, jnp.zeros((), bb.dtype))
                    for a, c in enumerate((cx, cy, cz)):
                        if c == 1:
                            wacc[a] = wacc[a] + lv
                        elif c == -1:
                            wacc[a] = wacc[a] - lv
            _assemble_eo_deltas(model, fl, modes,
                                _make_stream_emit(model, Z, BX, BY,
                                                  store))
        for a in range(3):
            ubuf[slot, a] = u[a][1:1 + BX, 1:1 + BY, :]

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

    if with_solid:
        for a in range(3):
            gw_out[0, a] = -2.0 * jnp.sum(wacc[a])


def fused_force_step(fpad: jnp.ndarray, force: jnp.ndarray,
                     model: LatticeModel, params: CollisionParams,
                     plan: FusedPlan = FusedPlan(),
                     interpret: bool = False, pad_force_fn=None,
                     refresh_fn=None, solid=None):
    """(fpad', u): fused collide+stream with a per-site body force.

    force is unpadded (3, X, Y, Z); u returned at (3, X, Y, Z) is the
    post-collision hydrodynamic velocity (half-force corrected).
    pad_force_fn/refresh_fn override the single-shard periodic force
    padding / output pad refresh (the sharded path substitutes
    ppermute face exchanges).  `solid` is an optional unpadded bool
    mask of in-lattice solid sites: streaming then applies half-way
    bounce-back and solid sites keep their pre-collision values,
    matching collide(fluid_mask) + ops.stream.stream_bounce_back."""
    nvel, Xp, Yp, Z = fpad.shape
    X, Y = Xp - 2 * HX, Yp - 2 * HY
    BX = min(plan.BX, X)
    BY = min(plan.BY, Y)
    if X % BX or Y % BY or BY % 8:
        raise ValueError(
            f"blocks ({BX},{BY}) must divide lattice ({X},{Y}), BY%8==0")
    if pad_force_fn is None:
        fpad_force = jnp.pad(force, ((0, 0), (HX, HX), (HY, HY), (0, 0)),
                             mode="wrap")
    else:
        fpad_force = pad_force_fn(force)

    with_solid = solid is not None
    kernel = partial(_fused_force_kernel, model, params, X, Y, Z,
                     BX, BY, with_solid)
    scratch = [
        pltpu.VMEM((2, nvel, BX + 2, BY + 16, Z), fpad.dtype),
        pltpu.VMEM((2, 3, BX + 2, BY + 16, Z), fpad.dtype),
    ]
    sems = [pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,))]
    inputs = [fpad, fpad_force]
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 2
    out_shape = [jax.ShapeDtypeStruct(fpad.shape, fpad.dtype),
                 jax.ShapeDtypeStruct((3, X, Y, Z), fpad.dtype)]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY),
                 pl.BlockSpec(memory_space=pl.ANY)]
    if with_solid:
        spad = jnp.pad(solid.astype(fpad.dtype),
                       ((HX, HX), (HY, HY), (0, 0)), mode="wrap")
        inputs.append(spad)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch.append(pltpu.VMEM((2, BX + 2, BY + 16, Z), fpad.dtype))
        sems.append(pltpu.SemaphoreType.DMA((2,)))
        out_shape.append(jax.ShapeDtypeStruct((1, 3), fpad.dtype))
        out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    scratch += [
        pltpu.VMEM((2, nvel, BX, BY, Z), fpad.dtype),
        pltpu.VMEM((2, 3, BX, BY, Z), fpad.dtype),
    ]
    if with_solid:
        scratch.append(pltpu.VMEM((3, BX, BY, Z), fpad.dtype))
    sems += [pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,))]
    res = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch + sems,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)
    refresh = _pad_refresh if refresh_fn is None else refresh_fn
    if with_solid:
        out, u, gw = res
        return refresh(out), u, gw[0]
    out, u = res
    return refresh(out), u


def _pad_exchange(fpad: jnp.ndarray, nx: int, ny: int,
                  ax: str = "x", ay: str = "y") -> jnp.ndarray:
    """Refresh the halo pads of a LOCAL padded block by ppermute face
    exchange over the device mesh (the TPU-native halo swap, ref:
    src/halo_swap.c:709 halo_swap_packed).

    y rows first (full padded-x extent), then x planes (full padded-y
    extent), so corner pads pick up the diagonal neighbour's values by
    the same two-hop relay as the single-shard `_pad_refresh`.  With a
    1-device axis the permutation is the identity (0, 0), which IS the
    periodic wrap - no special case needed."""
    X = fpad.shape[1] - 2 * HX
    Y = fpad.shape[2] - 2 * HY
    fwd_y = [(i, (i + 1) % ny) for i in range(ny)]
    bwd_y = [(i, (i - 1) % ny) for i in range(ny)]
    lo = jax.lax.ppermute(fpad[:, :, Y + HY - 1, :], ay, fwd_y)
    hi = jax.lax.ppermute(fpad[:, :, HY, :], ay, bwd_y)
    fpad = fpad.at[:, :, HY - 1, :].set(lo)
    fpad = fpad.at[:, :, Y + HY, :].set(hi)
    fwd_x = [(i, (i + 1) % nx) for i in range(nx)]
    bwd_x = [(i, (i - 1) % nx) for i in range(nx)]
    lo = jax.lax.ppermute(fpad[:, X, :, :], ax, fwd_x)
    hi = jax.lax.ppermute(fpad[:, 1, :, :], ax, bwd_x)
    fpad = fpad.at[:, 0, :, :].set(lo)
    fpad = fpad.at[:, X + 1, :, :].set(hi)
    return fpad


def make_fused_sharded_nstep(model: LatticeModel, params: CollisionParams,
                             mesh, plan: FusedPlan = FusedPlan(),
                             interpret: bool = False):
    """Multi-chip fused collide+stream: shard_map over a 2-D ('x', 'y')
    device mesh, each device running the single-shard Pallas kernel on
    its local block with pads refreshed by `_pad_exchange` ppermutes
    (face slabs ride the ICI links of the mesh).

    The lattice is sharded over x and y only; z stays whole on every
    device so the kernel's in-register z lane rolls remain globally
    periodic (z is the 128-lane minor dim - sharding it would fragment
    lanes anyway).  Takes and returns an UNPADDED (nvel, X, Y, Z) array
    sharded P(None, 'x', 'y', None); padding is local to each shard.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    nx = int(mesh.shape.get("x", 1))
    ny = int(mesh.shape.get("y", 1))
    spec = P(None, "x", "y", None)

    def local_nstep(f, n):
        fp = jnp.pad(f, ((0, 0), (HX, HX), (HY, HY), (0, 0)))
        fp = _pad_exchange(fp, nx, ny)

        def body(fp, _):
            fp = _fused_call(fp, model, params, plan, interpret)
            return _pad_exchange(fp, nx, ny), ()

        fp, _ = jax.lax.scan(body, fp, None, length=n)
        return fp[:, HX:-HX, HY:-HY, :]

    @partial(jax.jit, static_argnums=1, donate_argnums=0)
    def nstep(f, n):
        return shard_map(partial(local_nstep, n=n), mesh=mesh,
                         in_specs=spec, out_specs=spec,
                         check_vma=False)(f)

    return nstep


def make_fused_sharded_le_nstep(model: LatticeModel,
                                params: CollisionParams, le, mesh,
                                plan: FusedPlan = FusedPlan(),
                                interpret: bool = False):
    """Multi-chip fused collide+stream with Lees-Edwards sliding
    boundaries: the sharded analogue of make_fused_le_step.

    Per step: local fused kernel -> pad exchange (fresh halos for the
    un-streaming) -> sharded LE column fix (apply_le_fused_sharded:
    owner-shard column work + all-gather y-shifted interpolation over
    ICI; ref: model_le.c:399, leesedwards.c:700) -> pad exchange.
    (f, n, t0) -> f after n steps starting at time t0.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ludwig_tpu.ops.lees_edwards import apply_le_fused_sharded

    nx = int(mesh.shape.get("x", 1))
    ny = int(mesh.shape.get("y", 1))
    spec = P(None, "x", "y", None)

    def local_nstep(f, t0, n):
        xl, yl = f.shape[1], f.shape[2]
        fp = jnp.pad(f, ((0, 0), (HX, HX), (HY, HY), (0, 0)))
        fp = _pad_exchange(fp, nx, ny)

        def body(fp, k):
            fp = _fused_call(fp, model, params, plan, interpret)
            fp = _pad_exchange(fp, nx, ny)
            fp = apply_le_fused_sharded(fp, model, le, t0 + k, xl, yl,
                                        pad=(HX, HY))
            return _pad_exchange(fp, nx, ny), ()

        fp, _ = jax.lax.scan(body, fp, jnp.arange(n))
        return fp[:, HX:-HX, HY:-HY, :]

    @partial(jax.jit, static_argnums=2, donate_argnums=0)
    def nstep(f, t0, n):
        t0 = jnp.asarray(t0, f.dtype)
        return shard_map(partial(local_nstep, n=n), mesh=mesh,
                         in_specs=(spec, P()), out_specs=spec,
                         check_vma=False)(f, t0)

    return nstep


# -- in-kernel fluctuating LB (ref: collision.c:53 lb_collision_
# fluctuations inside the collision kernel; variances collision.c:
# 108-120) -------------------------------------------------------------

_RT_A = float(np.sqrt(2.0 + np.sqrt(2.0)))
_RT_B = float(np.sqrt(2.0 - np.sqrt(2.0)))


@dataclasses.dataclass(frozen=True)
class FusedNoise:
    """Static fluctuation parameters for the fused kernel.

    The production stream is a counter-based per-GLOBAL-site hash
    (murmur3-style finalizer over (x, y, z, step, mode, seed)) mapped
    onto the reference's 8-value discrete unit-variance distribution
    (ref: noise.c:70 table; ludwig_tpu.noise._RTABLE) - deterministic,
    decomposition- and block-independent by construction, like the
    reference's site-seeded state (ref: noise.c:190-196).  The KISS99
    bitwise stream stays on the jnp path for golden parity.
    """
    seed: int
    v_eta: float
    v_bulk: float
    v_ghost: tuple       # per-mode ghost amplitudes (len nvel)


def _hash_u32(h):
    """murmur3 finalizer (int32 ops, wrap-around semantics)."""
    h = h ^ (jax.lax.shift_right_logical(h, np.int32(16)))
    h = h * np.int32(-2048144789)      # 0x85ebca6b
    h = h ^ (jax.lax.shift_right_logical(h, np.int32(13)))
    h = h * np.int32(-1028477387)      # 0xc2b2ae35
    h = h ^ (jax.lax.shift_right_logical(h, np.int32(16)))
    return h


def _deviate_from_bits(bits, dtype):
    """Map 3 uniform bits onto the 8-value discrete distribution
    {-A, -B, 0 x4, +B, +A} (zero mean, unit variance, correct 4th
    moment; ref: noise.c discrete table)."""
    idx = bits & np.int32(7)
    nonzero = jnp.logical_or(
        jnp.logical_or(idx == 0, idx == 1),
        jnp.logical_or(idx == 6, idx == 7))
    sign = jnp.where(idx >= 4, dtype(1.0), dtype(-1.0))
    mag = jnp.where(jnp.logical_or(idx == 0, idx == 7),
                    dtype(_RT_A), dtype(_RT_B))
    return jnp.where(nonzero, sign * mag, dtype(0.0))


def _window_deviates(shape, gx, gy, gz, step, seed, n, dtype):
    """n unit-variance deviate arrays over a (wx, wy, wz) window, keyed
    on GLOBAL site coordinates so halo-overlapped sites get identical
    values in every block that computes them."""
    base = (gx * np.int32(73856093)
            ^ gy * np.int32(19349663)
            ^ gz * np.int32(83492791))
    base = base ^ (step * np.int32(-1640531527))     # 2654435761
    base = base ^ np.int32(seed & 0x7fffffff)
    out = []
    for m in range(n):
        h = _hash_u32(base ^ (np.int32(m) * np.int32(40503)))
        out.append(_deviate_from_bits(h, dtype))
    return out


def _noise_modes(model: LatticeModel, noise: FusedNoise, shape,
                 gx, gy, gz, step, dtype):
    """(shat_by_pair, ghat_list): stress-mode noise per _triu_pairs
    order and per-ghost-mode noise, at window level (the construction
    of ref collision.c:1818-1906 / noise.stress_from_deviates)."""
    ndim = model.ndim
    nghost = model.nvel - model.nhydro
    r = _window_deviates(shape, gx, gy, gz, step, noise.seed,
                         6 + nghost, dtype)
    s = [[None] * 3 for _ in range(3)]
    s[0][0], s[0][1], s[0][2] = r[0], r[1], r[2]
    s[1][1], s[1][2], s[2][2] = r[3], r[4], r[5]
    s[1][0], s[2][0], s[2][1] = s[0][1], s[0][2], s[1][2]
    tr = (1.0 / ndim) * (s[0][0] + s[1][1] + (ndim - 2.0) * s[2][2])
    sq2 = float(np.sqrt(2.0))
    shat = {}
    for (a, b) in _triu_pairs(ndim):
        v = s[a][b] - (tr if a == b else 0.0)
        v = v * (noise.v_eta * sq2 if a == b else noise.v_eta)
        if a == b:
            v = v + tr * noise.v_bulk
        shat[(a, b)] = v
    ghat = []
    for i, g in enumerate(range(model.nhydro, model.nvel)):
        amp = float(noise.v_ghost[g])
        ghat.append(amp * r[6 + i] if amp != 0.0 else None)
    return shat, ghat


def fused_noise_fields(model: LatticeModel, noise: FusedNoise, size,
                       step, dtype):
    """jnp twin of the in-kernel noise: (shat (3,3,X,Y,Z), ghat
    (nvel,X,Y,Z)) with the SAME counter stream, for feeding
    ops.collide.collide on the parity path."""
    X, Y, Z = size
    gx = jnp.arange(X, dtype=jnp.int32)[:, None, None]
    gy = jnp.arange(Y, dtype=jnp.int32)[None, :, None]
    gz = jnp.arange(Z, dtype=jnp.int32)[None, None, :]
    stepi = jnp.asarray(step, jnp.int32)
    shp, ghl = _noise_modes(model, noise, (X, Y, Z), gx, gy, gz,
                            stepi, dtype)
    shat = jnp.stack([jnp.stack([
        jnp.broadcast_to(shp[tuple(sorted((a, b)))], (X, Y, Z))
        for b in range(3)]) for a in range(3)])
    zero = jnp.zeros((X, Y, Z), dtype)
    rows = [zero] * model.nhydro + [
        (zero if g is None else jnp.broadcast_to(g, (X, Y, Z)))
        for g in ghl]
    return shat, jnp.stack(rows)
