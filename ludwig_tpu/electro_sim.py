"""Electrokinetics orchestration: full fe_electro time step.

TPU-native equivalent of the reference's electrokinetic main-loop branch
(ref: src/ludwig.c:609-677): per LB step

  1. Poisson solve for the reduced potential psi (SOR or FFT)
  2. body force on the fluid via grad-mu with integrated momentum
     correction (ref: src/psi_force.c:76-183 psi_force_gradmu_e)
  3. Nernst-Planck charge transport, sub-cycled ``multisteps`` times
     with dt = 1/multisteps (ref: src/nernst_planck.c:339-560)
  4. psi_zero_mean (ref: src/psi.c psi_zero_mean)
  5. LB collide (+force) and propagate with bounce-back at boundary
     sites (the gouy-chapman walls are MAP_BOUNDARY sites).

Initial conditions mirror src/psi_init.c (gouy_chapman, liquid_junction,
uniform) and src/psi.c:880 psi_electroneutral.

The whole step is one jitted program: lattice-wide stencil ops compile
to fused XLA loops; the SOR solver runs as a lax.while_loop of red/black
half-sweeps so the Poisson iteration stays on-device.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ludwig_tpu.electro import ElectroConfig, poisson_fft, rho_elec
from ludwig_tpu.lb import LBConfig
from ludwig_tpu.ops.collide import collide
from ludwig_tpu.ops.stream import (stream_bounce_back,
                                   wall_momentum_transfer)


@dataclasses.dataclass(frozen=True)
class ElectroSimConfig:
    lb: LBConfig
    ek: ElectroConfig
    e0: Tuple[float, float, float] = (0.0, 0.0, 0.0)  # external field
    periodic: Tuple[bool, bool, bool] = (True, True, True)
    hydrodynamics: bool = True
    # NP link stencil: 7 (faces only), 19 or 27 incl. diagonal links
    # (ref: psi_rt.c:264 electrokinetics_solver_stencil)
    stencil: int = 7


# -- neighbour fetches with the external-field potential jump ---------------

def _jump_arrays(shape, e0, dtype):
    """Per-axis wrap-plane corrections for the reduced potential.

    The reference extends psi across periodic boundaries with a jump
    -e0_a * N_a (ref: src/psi.c:664-795 psi_halo_psijump), which makes
    the stored psi behave as a linear-in-x potential plus a periodic
    part.  Returns (up_corr, dn_corr) lists; None when e0_a == 0.
    """
    ups, dns = [], []
    for ax in range(3):
        if float(e0[ax]) == 0.0:
            ups.append(None)
            dns.append(None)
            continue
        n = shape[ax]
        up = np.zeros(shape, dtype)
        dn = np.zeros(shape, dtype)
        sl = [slice(None)] * 3
        sl[ax] = n - 1
        up[tuple(sl)] = -float(e0[ax]) * n
        sl[ax] = 0
        dn[tuple(sl)] = +float(e0[ax]) * n
        ups.append(jnp.asarray(up))
        dns.append(jnp.asarray(dn))
    return ups, dns


def make_psi_neighbours(shape, e0, dtype):
    """(up, dn) neighbour-fetch functions for psi honouring the e0 jump."""
    ups, dns = _jump_arrays(shape, e0, dtype)

    def up(p, ax):
        q = jnp.roll(p, -1, axis=ax)
        return q if ups[ax] is None else q + ups[ax]

    def dn(p, ax):
        q = jnp.roll(p, 1, axis=ax)
        return q if dns[ax] is None else q + dns[ax]

    return up, dn


# -- reference-exact SOR solver ----------------------------------------------

def poisson_sor_ref(psi0: jnp.ndarray, rho_el: jnp.ndarray,
                    cfg: ElectroConfig, psi_up, psi_dn,
                    return_iters: bool = False) -> jnp.ndarray:
    """Red/black SOR with Chebyshev acceleration, matching the reference
    iteration step-for-step (ref: src/psi_sor.c:132-300 psi_solver_sor_solve):

      residual = eps * del2_7pt(psi) + e * beta * rho_el
      psi     += omega * residual / (6 * eps)

    with omega(0) = 1, omega after the first half-sweep 1/(1-r^2/2) and
    thereafter 1/(1 - r^2 omega / 4); spectral radius estimate
    r = 1 - (pi/max(Lx,Lz))^2 / 2; convergence checked every 5 whole
    iterations against sqrt-sum-squared residuals.
    """
    shape = psi0.shape
    eps = cfg.epsilon
    rhs = (cfg.e * cfg.beta) * rho_el
    ii, jj, kk = np.indices(shape)
    red = jnp.asarray((ii + jj + kk) % 2 == 0)
    radius = 1.0 - 0.5 * (np.pi / max(shape[0], shape[2])) ** 2

    def neigh_sum(p):
        s = 0.0
        for ax in range(3):
            s = s + psi_up(p, ax) + psi_dn(p, ax)
        return s

    # rnorm0 is the L2 norm of the RIGHT HAND SIDE (eunit*beta*rho),
    # recomputed each solve - "This is just the L2 norm of the right
    # hand side" (ref: psi_sor.c:184-200; the heterogeneous variant
    # psi_sor.c:396-413 does the same).  A round-4 change keyed it off
    # the initial-field residual instead, which flipped mid-run solves
    # to earlier/absolute convergence and shifted the elec golden
    # trajectories (elec-ep1: 105 iterations vs the blessed 100).
    rnorm0 = jnp.sqrt(jnp.sum(rhs * rhs))

    def half_sweep(p, mask, omega):
        res = eps * (neigh_sum(p) - 6.0 * p) + rhs
        p = jnp.where(mask, p + omega * res / (6.0 * eps), p)
        return p, jnp.sum(jnp.where(mask, res * res, 0.0))

    # f32 production guard: the reference's f64 tolerances (rel 1e-8)
    # sit below the f32 residual floor, so without a stall check the
    # loop always runs max_its (measured 10000 its/step on TPU).  In
    # f32 only, stop when a convergence check shows no meaningful
    # progress over the previous one; f64 keeps the reference's exact
    # stopping behavior (golden-parity contract).
    f32 = psi0.dtype == jnp.float32

    def cond(carry):
        p, omega, n, prev, rn, stop = carry
        return jnp.logical_and(n < cfg.max_its, jnp.logical_not(stop))

    def body(carry):
        p, omega, n, prev, _, _ = carry
        p, s_red = half_sweep(p, red, omega)
        omega = jax.lax.select(
            n == 0, 1.0 / (1.0 - 0.5 * radius * radius),
            1.0 / (1.0 - 0.25 * radius * radius * omega))
        p, s_blk = half_sweep(p, jnp.logical_not(red), omega)
        omega = 1.0 / (1.0 - 0.25 * radius * radius * omega)
        rnorm1 = jnp.sqrt(s_red + s_blk)
        conv = jnp.logical_or(rnorm1 < cfg.abs_tol,
                              rnorm1 < cfg.rel_tol * rnorm0)
        check = n % 5 == 0
        if f32:
            stall = jnp.logical_and(n > 0, rnorm1 >= 0.995 * prev)
            conv = jnp.logical_or(conv, stall)
        prev = jnp.where(check, rnorm1, prev)
        stop = jnp.logical_and(check, conv)
        return (p, omega, n + 1, prev, rnorm1, stop)

    init = (psi0, 1.0, 0, jnp.asarray(jnp.inf, psi0.dtype),
            jnp.asarray(jnp.inf, psi0.dtype), jnp.asarray(False))
    p, _, n, _, rn, _ = jax.lax.while_loop(cond, body, init)
    if return_iters:
        # (solution, printed iteration index, final residual norm,
        # which criterion: 0 = absolute, 1 = relative; ref:
        # psi_sor.c:263-292 prints the 0-based loop index)
        which = jnp.where(rn < cfg.abs_tol, 0, 1)
        return p, n - 1, rn, which
    return p


# -- grad-mu force with momentum correction ----------------------------------

def gradmu_force(psi, rho, cfg: ElectroSimConfig, psi_up, psi_dn,
                 n_sites: float):
    """F = rho_elec E - <F> (ref: psi_force_gradmu_e).  The mean is taken
    over all non-colloid sites (boundary sites included), and the
    corrected force applied there too; only fluid sites feel it in the
    collision."""
    ek = cfg.ek
    kt = 1.0 / ek.beta
    re = rho_elec(rho, ek)
    force = []
    for ax in range(3):
        e_ax = -0.5 * (psi_up(psi, ax) - psi_dn(psi, ax)) * (kt / ek.e)
        force.append(re * e_ax)
    force = jnp.stack(force)
    fsum = jnp.sum(force, axis=(1, 2, 3)) / n_sites
    return force - fsum[:, None, None, None]


# -- Nernst-Planck (reference d3q7 link fluxes, face formulation) ------------

def np_step(rho, psi, u, fluid, cfg: ElectroSimConfig, psi_up, psi_dn,
            dt: float, mu_ex=None):
    """One NP sub-step, dt = 1/multisteps (ref: nernst_planck.c:349-520,
    np_advective_fluxes, np_no_flux_boundary, nernst_planck_update_d3qx).

    Fluxes live on the +axis faces: F_a(i) is the flux from site i to
    i+1 along axis a.  Both link directions of the reference collapse
    onto these faces by antisymmetry; the divergence is the face-flux
    difference.  A face is active only when both ends are fluid.

    mu_ex: optional per-species excess (solvation) chemical potential
    fields in kT units, added to the reduced link potential as
    mu = mu_ex/e + z psi (ref: nernst_planck_fluxes_d3qx with
    fe->func->mu_solv, fe_electro_symmetric.c fe_es_mu_ion_solv).
    """
    ek = cfg.ek
    new = []
    face_mask = []
    for ax in range(3):
        f_up = jnp.roll(fluid, -1, axis=ax)
        face_mask.append(jnp.logical_and(fluid, f_up))

    for k in range(ek.nk):
        z = float(ek.valency[k])
        d = float(ek.diffusivity[k])
        nk_ = rho[k]
        mu = z * psi          # reduced chemical potential (ideal part
        #                       enters through the linkwise form below)
        if mu_ex is not None:
            mu = mu + mu_ex[k] / ek.e
        div = 0.0
        for ax in range(3):
            mu1 = z * psi_up(psi, ax)
            if mu_ex is not None:
                mu1 = mu1 + jnp.roll(mu_ex[k], -1, axis=ax) / ek.e
            dmu = mu1 - mu
            b0 = jnp.exp(-dmu)
            b1 = jnp.exp(dmu)
            n1 = jnp.roll(nk_, -1, axis=ax)
            flx = -d * 0.5 * (1.0 + b0) * (n1 * b1 - nk_)
            if u is not None and cfg.hydrodynamics:
                ua = 0.5 * (u[ax] + jnp.roll(u[ax], -1, axis=ax))
                flx = flx + ua * 0.5 * (nk_ + n1)
            flx = jnp.where(face_mask[ax], flx, 0.0)
            div = div + flx - jnp.roll(flx, 1, axis=ax)
        new.append(jnp.where(fluid, nk_ - dt * div, nk_))
    return jnp.stack(new)




def np_step_d3qx(rho, psi, u, fluid, cfg: ElectroSimConfig, psi_up,
                 psi_dn, dt: float, mu_ex=None, npoints: int = 19):
    """One NP sub-step on a D3Q19/D3Q27 link stencil (ref:
    nernst_planck.c:349-520 nernst_planck_driver_d3qx /
    nernst_planck_fluxes_d3qx, np_advective_fluxes, stencil.h:43
    LB_RCS_TABLE; selected by the electrokinetics_solver_stencil key,
    psi_rt.c:264).

    Same face formulation as np_step, extended to the diagonal links:
    for each positive half-link direction c the flux from site i to
    i + c carries the linkwise-Boltzmann diffusive term scaled by
    1/|c| (the rcs table) plus the centred advective term
    0.5 ((u0 + u1) . c) 0.5 (rho0 + rho1); the reference\'s two link
    orientations collapse onto the half set by antisymmetry.  A link is
    active only when both ends are fluid.  psi neighbour fetches compose
    the per-axis psi_up/psi_dn so external-field wrap jumps (e0) apply
    per crossed boundary plane.
    """
    from ludwig_tpu.lattice import lb_model
    ek = cfg.ek
    model = lb_model(npoints)
    # positive half set: first nonzero component positive
    half = []
    for p in range(1, model.nvel):
        c = tuple(int(v) for v in model.cv[p])
        nz = next(v for v in c if v != 0)
        if nz > 0:
            half.append(c)

    def fetch_psi(p, c):
        q = p
        for ax in range(3):
            if c[ax] > 0:
                q = psi_up(q, ax)
            elif c[ax] < 0:
                q = psi_dn(q, ax)
        return q

    def roll_c(x, c):
        return jnp.roll(x, tuple(-v for v in c), axis=(0, 1, 2))

    new = []
    psi_n = {c: fetch_psi(psi, c) for c in half}
    fl_n = {c: roll_c(fluid, c) for c in half}
    for k in range(ek.nk):
        z = float(ek.valency[k])
        d = float(ek.diffusivity[k])
        nk_ = rho[k]
        mu0 = z * psi
        if mu_ex is not None:
            mu0 = mu0 + mu_ex[k] / ek.e
        div = 0.0
        for c in half:
            rcs = (float(sum(v * v for v in c))) ** -0.5
            mu1 = z * psi_n[c]
            if mu_ex is not None:
                mu1 = mu1 + roll_c(mu_ex[k], c) / ek.e
            dmu = mu1 - mu0
            b0 = jnp.exp(-dmu)
            b1 = jnp.exp(dmu)
            n1 = roll_c(nk_, c)
            flx = (-d * 0.5 * (1.0 + b0) * (n1 * b1 - nk_)) * rcs
            if u is not None and cfg.hydrodynamics:
                uc = 0.0
                for ax in range(3):
                    if c[ax]:
                        uc = uc + (u[ax] + roll_c(u[ax], c)) * float(c[ax])
                flx = flx + (0.5 * uc) * (0.5 * (nk_ + n1))
            flx = jnp.where(jnp.logical_and(fluid, fl_n[c]), flx, 0.0)
            div = div + flx - jnp.roll(flx, tuple(c), axis=(0, 1, 2))
        new.append(jnp.where(fluid, nk_ - dt * div, nk_))
    return jnp.stack(new)


# -- initial conditions (ref: src/psi_init.c) ---------------------------------

def init_uniform(size, rho_el, nk=2, dtype=np.float64):
    psi = np.zeros(size, dtype)
    rho = np.full((nk,) + tuple(size), rho_el, dtype)
    return psi, rho


def init_gouy_chapman(size, rho_el, sigma, dtype=np.float64):
    """Walls at x=1 and x=Lx (1-based), wall charge sigma on species 0,
    counter-charge on species 1 (ref: psi_init.c:80-152).
    Returns (psi, rho, boundary_mask)."""
    nx = size[0]
    psi = np.zeros(size, dtype)
    rho_i = sigma * 2.0 * size[1] * size[2] / (
        size[1] * size[2] * (nx - 2.0))
    rho = np.empty((2,) + tuple(size), dtype)
    rho[0] = rho_el
    rho[1] = rho_el + rho_i
    rho[0, 0] = sigma
    rho[1, 0] = 0.0
    rho[0, nx - 1] = sigma
    rho[1, nx - 1] = 0.0
    boundary = np.zeros(size, bool)
    boundary[0] = True
    boundary[nx - 1] = True
    return psi, rho, boundary


def init_liquid_junction(size, rho_el, delta_el, dtype=np.float64):
    """Left half rho_el + delta/2, right half rho_el - delta/2 in both
    species (ref: psi_init.c:169-210)."""
    nx = size[0]
    psi = np.zeros(size, dtype)
    prof = np.where(np.arange(1, nx + 1) <= nx // 2,
                    rho_el + 0.5 * delta_el, rho_el - 0.5 * delta_el)
    rho = np.broadcast_to(prof[None, :, None, None],
                          (2,) + tuple(size)).astype(dtype).copy()
    return psi, rho


def electroneutral(rho, valency, solid: Optional[np.ndarray]):
    """Add countercharge on fluid sites of one species so the net charge
    vanishes (ref: src/psi.c:880 psi_electroneutral)."""
    rho = np.array(rho, copy=True)
    fluid = np.ones(rho.shape[1:], bool) if solid is None \
        else np.logical_not(solid)
    vf = float(fluid.sum())
    qtot = sum(float(valency[k]) * rho[k].sum() for k in range(len(rho)))
    rhoi = abs(qtot) / vf
    nc = -1
    if qtot * valency[0] >= 0:
        nc = 1
    if qtot * valency[1] >= 0:
        nc = 0
    rho[nc] = np.where(fluid, rho[nc] + rhoi, rho[nc])
    return rho


# -- the full step ------------------------------------------------------------

def make_electro_step(cfg: ElectroSimConfig,
                      solid: Optional[jnp.ndarray] = None):
    """Jitted step: (f, psi, rho, u, gwall) -> ((f, psi, rho, u, gwall), rho_lb).

    gwall accumulates momentum transferred to boundary sites by the
    bounce-back (for the [walls] momentum statistics row).
    """
    lb = cfg.lb
    params = lb.collision_params()
    model = lb.model
    size = lb.size
    dtype = lb.jdtype
    psi_up, psi_dn = make_psi_neighbours(size, cfg.e0, lb.dtype)
    fluid = None if solid is None else jnp.logical_not(solid)
    fluid_f = (jnp.ones(size, dtype) if fluid is None
               else fluid.astype(dtype))
    n_sites = float(np.prod(size))   # all non-colloid sites
    m = cfg.ek.multisteps
    dt = 1.0 / m

    # f32 production fast paths (ops/fused_electro.py): the whole-field
    # VMEM SOR kernel and the blocked NP+grad-mu kernel replace the
    # roll-bound jnp phases; the f64 golden tier keeps the
    # reference-bitwise jnp path.  Both are mean-invariant consumers of
    # psi, so the zero-mean shift folds into the solve.
    from ludwig_tpu.ops.fused_electro import (np_gradmu_fused,
                                              np_supported,
                                              sor_solve_fused,
                                              sor_supported)
    use_fsor = (lb.dtype == "float32" and cfg.ek.solver != "fft"
                and sor_supported(size, cfg.e0))
    use_fnp = (lb.dtype == "float32" and cfg.stencil not in (19, 27)
               and np_supported(size, cfg, cfg.e0))
    # fused LB sub-step with in-kernel solid bounce-back (collide +
    # stream + momentum accounting in ONE HBM pass; the jnp pipeline
    # is ~12 roll-bound passes of f)
    def _flb_plan():
        for bx in (16, 8, 4):
            if size[0] % bx == 0:
                for by in (32, 16, 8):
                    if size[1] % by == 0:
                        from ludwig_tpu.ops.fused import FusedPlan
                        return FusedPlan(bx, by)
        return None
    _plan = _flb_plan()
    use_flb = (lb.dtype == "float32" and cfg.hydrodynamics
               and size[2] % 128 == 0 and _plan is not None)

    @partial(jax.jit, donate_argnums=0)
    def step(state, t=0):
        f, psi, rho, u, gwall = state

        # 1. Poisson solve
        if cfg.ek.solver == "fft":
            psi = poisson_fft(rho_elec(rho, cfg.ek) / cfg.ek.e, cfg.ek)
            sor = (jnp.int32(0), jnp.zeros((), dtype), jnp.int32(0))
        elif use_fsor:
            psi, s_n, s_r, s_w = sor_solve_fused(
                psi, rho_elec(rho, cfg.ek), cfg.ek, zero_mean=True)
            sor = (s_n, s_r, s_w)
        else:
            psi, s_n, s_r, s_w = poisson_sor_ref(
                psi, rho_elec(rho, cfg.ek), cfg.ek, psi_up, psi_dn,
                return_iters=True)
            sor = (s_n, s_r, s_w)

        # 2. grad-mu force (once per LB step), 3. NP sub-cycles
        fl = jnp.ones(size, bool) if fluid is None else fluid
        if use_fnp:
            u_np = u if cfg.hydrodynamics else None
            rho, force, fsum = np_gradmu_fused(psi, rho, u_np, fl,
                                               cfg, dt)
            force = force - (fsum / n_sites)[:, None, None, None]
            for _ in range(m - 1):
                rho = np_gradmu_fused(psi, rho, u_np, fl, cfg, dt)[0]
        else:
            force = gradmu_force(psi, rho, cfg, psi_up, psi_dn, n_sites)
            for _ in range(m):
                if cfg.stencil in (19, 27):
                    rho = np_step_d3qx(rho, psi,
                                       u if cfg.hydrodynamics else None,
                                       fl, cfg, psi_up, psi_dn, dt,
                                       npoints=cfg.stencil)
                else:
                    rho = np_step(rho, psi,
                                  u if cfg.hydrodynamics else None,
                                  fl, cfg, psi_up, psi_dn, dt)

        # 4. zero-mean potential (site-order scan in f64 for the
        # golden-log contract; in f32 production that scan is a
        # 262k-element serial chain - ~200 ms/step at 64^3 on TPU, the
        # whole step budget - so site_sum drops to a tree reduction).
        # The fused SOR already applied it in-kernel.
        if cfg.ek.solver == "fft" or not use_fsor:
            from ludwig_tpu.stats import site_sum
            psi = psi - site_sum(psi) / n_sites

        # 5. LB update
        if use_flb:
            from ludwig_tpu.ops.fused import (fused_force_step,
                                              pad_state, unpad_state)
            # collision-time density for the statistics row (the jnp
            # collide returns it; one cheap reduction here)
            rho_lb = jnp.sum(f, axis=0)
            fpad = pad_state(f, zpad=False)
            if solid is not None:
                fpad, u, gw = fused_force_step(
                    fpad, force.astype(f.dtype), model, params, _plan,
                    solid=solid)
                gwall = gwall + gw
            else:
                fpad, u = fused_force_step(
                    fpad, force.astype(f.dtype), model, params, _plan)
            f = unpad_state(fpad, z=size[2])
        elif cfg.hydrodynamics:
            f, rho_lb, u = collide(f, params, force=force.astype(f.dtype),
                                   fluid_mask=fluid)
            if solid is not None:
                gwall = gwall + wall_momentum_transfer(f, model, solid)
            f = stream_bounce_back(f, model, solid=solid, rho0=lb.rho0)
        else:
            rho_lb = jnp.ones(size, dtype)

        return (f, psi, rho, u, gwall), (rho_lb, sor)

    return step
