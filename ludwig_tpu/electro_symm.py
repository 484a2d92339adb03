"""Coupled binary-fluid + electrokinetics (fe_electro_symmetric) step.

TPU-native equivalent of the reference's psi + phi run (ref:
src/ludwig.c:609-677 electrokinetic section followed by the
phi_cahn_hilliard order-parameter update, with the coupled free energy
of src/fe_electro_symmetric.c).  Per LB step:

  1. phi gradients (fd_gradient_calculation stencil)
  2. Poisson solve for the reduced potential: uniform SOR when the
     dielectric contrast vanishes, else the heterogeneous
     (variable-epsilon) SOR (ref: src/psi_sor.c:346
     psi_solver_sor_var_epsilon_solve)
  3. body force = -div(coupled stress) on the d3q7 stencil (ref:
     src/psi_force.c psi_force_divstress; "Force calculation:
     stress_divergence" in the coupled banner)
  4. Nernst-Planck charge transport with the solvation chemical
     potential in the linkwise factors (ref: src/nernst_planck.c:405
     nernst_planck_fluxes_d3qx with fe->func->mu_solv)
  5. psi_zero_mean
  6. Cahn-Hilliard update of phi with mu = mu_mix + mu_solv + mu_el
     (ref: src/fe_electro_symmetric.c fe_es_mu_phi)
  7. LB collide (+force) and propagate.

The whole step jits into one XLA program; the SOR solvers run as
lax.while_loop'd red/black half sweeps on device.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ludwig_tpu.dynamics.cahn_hilliard import (CahnHilliardParams,
                                               cahn_hilliard_update)
from ludwig_tpu.electro import ElectroConfig, rho_elec
from ludwig_tpu.electro_sim import (ElectroSimConfig, make_psi_neighbours,
                                    np_step, poisson_sor_ref)
from ludwig_tpu.fe.electro_symmetric import ElectroSymmetricFE
from ludwig_tpu.lb import LBConfig
from ludwig_tpu.ops.collide import collide
from ludwig_tpu.ops.stream import stream


@dataclasses.dataclass(frozen=True)
class ElectroSymmConfig:
    lb: LBConfig
    ek: ElectroConfig
    fe: ElectroSymmetricFE
    mobility: float = 0.05
    advection_order: int = 1
    gradient: str = "3d_7pt_fluid"
    e0: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    hydrodynamics: bool = True
    force_method: str = "stress_divergence"   # or phi_gradmu_correction


def poisson_sor_var_eps_ref(psi0, rho_el, eps, cfg: ElectroConfig,
                            psi_up, psi_dn, eps_up, eps_dn,
                            return_iters: bool = False):
    """Heterogeneous-permittivity SOR, matching the reference iteration
    (ref: src/psi_sor.c:346-520 psi_solver_sor_var_epsilon_solve):

      depsi = eps(i) lap7(psi)
            + sum_ax 0.25 [eps(i+ax) - eps(i-ax)] [psi(i+ax) - psi(i-ax)]
      residual = depsi + e beta rho_el
      psi     += omega residual / (6 eps(i))

    omega starts at 1.0 and is updated ONCE PER FULL red/black iteration
    via omega = 1/(1 - r^2 omega / 4) (no first-half-sweep special case,
    unlike the uniform solver); r = 1 - (pi/max(Lx,Lz))^2 / 2;
    convergence checked EVERY iteration (ncheck = 1)."""
    shape = psi0.shape
    rhs = (cfg.e * cfg.beta) * rho_el
    ii, jj, kk = np.indices(shape)
    # pass 0 touches 1-based-odd (ic+jc+kc) sites = 0-based-even
    red = jnp.asarray((ii + jj + kk) % 2 == 0)
    radius = 1.0 - 0.5 * (np.pi / max(shape[0], shape[2])) ** 2

    def depsi(p):
        acc = 0.0
        lap = -6.0 * p
        for ax in range(3):
            pu, pd = psi_up(p, ax), psi_dn(p, ax)
            lap = lap + pu + pd
            acc = acc + 0.25 * (eps_up[ax] - eps_dn[ax]) * (pu - pd)
        return eps * lap + acc

    # rnorm0 is the L2 norm of the RIGHT HAND SIDE, recomputed each
    # solve (ref: psi_sor.c:396-413 "Compute the initial norm of the
    # right hand side"); a round-4 change used the initial-field
    # residual, flipping dr1/dr2 mid-run solves to earlier/absolute
    # convergence (131 its vs the blessed 169)
    rnorm0 = jnp.sqrt(jnp.sum(rhs * rhs))

    def half_sweep(p, mask, omega):
        res = depsi(p) + rhs
        p = jnp.where(mask, p + omega * res / (6.0 * eps), p)
        return p, jnp.sum(jnp.where(mask, res * res, 0.0))

    def cond(carry):
        p, omega, n, rn, stop = carry
        return jnp.logical_and(n < cfg.max_its, jnp.logical_not(stop))

    def body(carry):
        p, omega, n, _, _ = carry
        p, s0 = half_sweep(p, red, omega)
        p, s1 = half_sweep(p, jnp.logical_not(red), omega)
        omega = 1.0 / (1.0 - 0.25 * radius * radius * omega)
        rnorm1 = jnp.sqrt(s0 + s1)
        stop = jnp.logical_or(rnorm1 < cfg.abs_tol,
                              rnorm1 < cfg.rel_tol * rnorm0)
        return (p, omega, n + 1, rnorm1, stop)

    p, _, n, rn, _ = jax.lax.while_loop(
        cond, body, (psi0, 1.0, 0, jnp.asarray(jnp.inf, psi0.dtype),
                     jnp.asarray(False)))
    if return_iters:
        which = jnp.where(rn < cfg.abs_tol, 0, 1)
        return p, n - 1, rn, which
    return p


def divstress_7pt(pth):
    """force = -div(pth) on the d3q7 stencil (central differences; ref:
    src/psi_force.c psi_force_divstress with stencil_d3q7 wgradients
    = 1/2)."""
    comps = []
    for a in range(3):
        acc = 0.0
        for ax in range(3):
            pax = pth[a, ax]
            acc = acc + 0.5 * (jnp.roll(pax, -1, axis=ax)
                               - jnp.roll(pax, 1, axis=ax))
        comps.append(-acc)
    return jnp.stack(comps)


def es_efield(psi, cfg: ElectroSymmConfig, psi_up, psi_dn):
    """Physical total electric field E_a = -(kT/e) grad_a psi with the
    external-field potential jump folded into the wrap planes (ref:
    src/psi_gradients.c psi_electric_field + psi_halo_psijump)."""
    kt = 1.0 / cfg.ek.beta
    scale = kt / cfg.ek.e
    return jnp.stack([
        -0.5 * (psi_up(psi, ax) - psi_dn(psi, ax)) * scale
        for ax in range(3)])


def make_electro_symm_step(cfg: ElectroSymmConfig):
    """Jitted step: (f, phi, psi, rho_k, u) ->
    (state', (rho_lb, sor_info))."""
    from ludwig_tpu.binary import fe_fields

    lb = cfg.lb
    params = lb.collision_params()
    model = lb.model
    size = lb.size
    dtype = lb.jdtype
    fe = cfg.fe
    ek = cfg.ek
    psi_up, psi_dn = make_psi_neighbours(size, cfg.e0, lb.dtype)
    ch = CahnHilliardParams(mobility=cfg.mobility,
                            advection_order=cfg.advection_order)
    ek_sim = ElectroSimConfig(lb=lb, ek=ek, e0=cfg.e0,
                              hydrodynamics=cfg.hydrodynamics)
    contrast = fe.gamma != 0.0
    m = ek.multisteps
    dt = 1.0 / m

    @partial(jax.jit, donate_argnums=0)
    def step(state, t=0):
        f, phi, psi, rhok, u = state

        fields = fe_fields(phi, cfg.gradient)

        # 1. Poisson solve (uniform when the contrast vanishes)
        rel = rho_elec(rhok, ek)
        if contrast:
            eps = fe.var_epsilon(phi)
            eps_up = [jnp.roll(eps, -1, axis=ax) for ax in range(3)]
            eps_dn = [jnp.roll(eps, 1, axis=ax) for ax in range(3)]
            psi, s_n, s_r, s_w = poisson_sor_var_eps_ref(
                psi, rel, eps, ek, psi_up, psi_dn, eps_up, eps_dn,
                return_iters=True)
        else:
            psi, s_n, s_r, s_w = poisson_sor_ref(
                psi, rel, ek, psi_up, psi_dn, return_iters=True)
        sor = (s_n, s_r, s_w)

        # 2. force, with rho at multistep 0
        e = es_efield(psi, cfg, psi_up, psi_dn)
        e2 = e[0] * e[0] + e[1] * e[1] + e[2] * e[2]
        if cfg.force_method == "phi_gradmu_correction":
            # F_a = -phi d_a mu_phi - sum_k rho_k d_a mu_solv_k
            #       + rho_el E_a, mean-corrected over all fluid sites
            # (ref: psi_force.c psi_force_gradmu_es)
            mu = fe.mu_phi_coupled(fields, rhok, e2)
            ms = fe.mu_solv(phi)
            rel0 = rho_elec(rhok, ek)
            comps = []
            for a in range(3):
                fa = -phi * 0.5 * (jnp.roll(mu, -1, axis=a)
                                   - jnp.roll(mu, 1, axis=a))
                for k in range(ek.nk):
                    fa = fa - rhok[k] * 0.5 * (
                        jnp.roll(ms[k], -1, axis=a)
                        - jnp.roll(ms[k], 1, axis=a))
                fa = fa + rel0 * e[a]
                comps.append(fa)
            force = jnp.stack(comps)
            fmean = jnp.mean(force, axis=(1, 2, 3))
            force = (force - fmean[:, None, None, None]).astype(f.dtype)
        else:
            pth = fe.stress_coupled(fields, rhok, e, e2)
            force = divstress_7pt(pth).astype(f.dtype)

        # 3. Nernst-Planck sub-cycles with the solvation potential
        fl = jnp.ones(size, bool)
        mu_ex = fe.mu_solv(phi)
        for _ in range(m):
            rhok = np_step(rhok, psi, u if cfg.hydrodynamics else None,
                           fl, ek_sim, psi_up, psi_dn, dt, mu_ex=mu_ex)

        # 4. zero-mean potential (site-order scan in f64, tree sum
        # in f32 production; ref: psi.c psi_zero_mean)
        from ludwig_tpu.stats import site_sum
        psi = psi - site_sum(psi) / float(np.prod(size))

        # 5. Cahn-Hilliard with the coupled chemical potential
        mu = fe.mu_phi_coupled(fields, rhok, e2)
        phi = cahn_hilliard_update(phi, mu,
                                   u if cfg.hydrodynamics else None, ch)

        # 6. LB update
        if cfg.hydrodynamics:
            f, rho_lb, u = collide(f, params, force=force)
            f = stream(f, model)
        else:
            rho_lb = jnp.ones(size, dtype)

        return (f, phi, psi, rhok, u), (rho_lb, sor)

    return step
