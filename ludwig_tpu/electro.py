"""Electrokinetics: reduced potential psi, charge species, Poisson
solvers and Nernst-Planck transport.

TPU-native equivalent of the reference electrokinetic subsystem (ref:
src/psi.c, src/psi_sor.c:100-346, src/nernst_planck.c:83-260,
src/psi_force.c:117-127, src/fe_electro.c).

Conventions follow the reference exactly: psi is the REDUCED potential
(beta e psi_phys), the discrete Poisson equation is

  epsilon del2_7pt psi = - (e beta) rho_elec,   rho_elec = e sum_k z_k n_k

and the Nernst-Planck fluxes use the linkwise-Boltzmann form
  flux(i -> i+1) = -D 0.5 (1 + b) (n_1 b - n_0),  b = exp(mu_1 - mu_0)
with mu = z psi (+ solvation terms / e), which is exact at equilibrium
(n ~ exp(-z psi)).

Two Poisson solvers:
  * "fft"  - exact inversion of the same 7-point operator via FFT
             (periodic, uniform permittivity; one shot, TPU-native)
  * "sor"  - red/black successive over-relaxation with Chebyshev
             radius acceleration, mirroring the reference iteration
             (works with later variable-epsilon extensions)
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ludwig_tpu.ops.advect import advective_fluxes, flux_divergence, _up, _down
from ludwig_tpu.ops.stencil import delsq_7pt, grad_7pt


@dataclasses.dataclass(frozen=True)
class ElectroConfig:
    valency: Tuple[int, ...] = (1, -1)
    diffusivity: Tuple[float, ...] = (0.01, 0.01)
    e: float = 1.0               # unit charge
    beta: float = 1.0            # 1 / kT
    epsilon: float = 100.0       # permittivity
    solver: str = "fft"
    rel_tol: float = 1e-8
    abs_tol: float = 1e-15
    max_its: int = 2000
    multisteps: int = 1          # NP sub-cycles per LB step (ref:
                                 # ludwig.c:629-667 high-diffusivity path)

    @property
    def nk(self) -> int:
        return len(self.valency)

    @property
    def bjerrum_length(self) -> float:
        return self.e * self.e * self.beta / (
            4.0 * np.pi * self.epsilon)

    def debye_length(self, rho_el: float) -> float:
        """1/kappa for ionic strength sum z^2 n = rho_el
        (ref: psi_debye_length)."""
        return 1.0 / np.sqrt(4.0 * np.pi * self.bjerrum_length * rho_el)


def rho_elec(rho: jnp.ndarray, cfg: ElectroConfig) -> jnp.ndarray:
    """sum_k (e z_k) n_k, accumulated per species exactly as the
    reference does (ref: psi.c psi_rho_elec)."""
    out = 0.0
    for k, z in enumerate(cfg.valency):
        out = out + (cfg.e * float(z)) * rho[k]
    return out


# -- Poisson solvers --------------------------------------------------------

def poisson_fft(rho_el: jnp.ndarray, cfg: ElectroConfig) -> jnp.ndarray:
    """Exact solve of  epsilon del2_7pt psi = -(e beta) rho_el  with the
    discrete 7-point eigenvalues -4 sum_a sin^2(k_a/2); zero mode -> 0."""
    shape = rho_el.shape
    rhs = (cfg.e * cfg.beta / cfg.epsilon) * rho_el
    rhat = jnp.fft.fftn(rhs)
    k2 = 0.0
    for ax, n in enumerate(shape):
        k = 2.0 * np.pi * np.fft.fftfreq(n)
        kd2 = 4.0 * np.sin(k / 2.0) ** 2
        sh = [1, 1, 1]
        sh[ax] = n
        k2 = k2 + jnp.asarray(kd2.reshape(sh))
    k2 = jnp.where(k2 == 0.0, 1.0, k2)
    psi_hat = rhat / k2
    psi_hat = psi_hat.at[0, 0, 0].set(0.0)
    return jnp.real(jnp.fft.ifftn(psi_hat)).astype(rho_el.dtype)


def poisson_sor(psi0: jnp.ndarray, rho_el: jnp.ndarray,
                cfg: ElectroConfig) -> jnp.ndarray:
    """Red/black SOR with Chebyshev-accelerated omega
    (ref: psi_solver_sor_solve).  Runs under jit via lax.while_loop."""
    shape = psi0.shape
    rhs = (cfg.e * cfg.beta / cfg.epsilon) * rho_el
    ii, jj, kk = np.indices(shape)
    red = jnp.asarray((ii + jj + kk) % 2 == 0)
    radius = 1.0 - 0.5 * (np.pi / max(shape)) ** 2
    rnorm0 = jnp.sqrt(jnp.sum(rhs * rhs)) * cfg.epsilon

    def neigh_sum(p):
        return (jnp.roll(p, 1, 0) + jnp.roll(p, -1, 0)
                + jnp.roll(p, 1, 1) + jnp.roll(p, -1, 1)
                + jnp.roll(p, 1, 2) + jnp.roll(p, -1, 2))

    def half_sweep(p, mask, omega):
        dpsi = (neigh_sum(p) - 6.0 * p + rhs) / 6.0
        return jnp.where(mask, p + omega * dpsi, p)

    def cond(carry):
        p, omega, it, res = carry
        return jnp.logical_and(
            it < cfg.max_its,
            jnp.logical_and(res > cfg.abs_tol, res > cfg.rel_tol * rnorm0))

    def body(carry):
        p, omega, it, _ = carry
        p = half_sweep(p, red, omega)
        omega1 = jax.lax.select(
            it == 0, 1.0 / (1.0 - 0.5 * radius * radius),
            1.0 / (1.0 - 0.25 * radius * radius * omega))
        p = half_sweep(p, jnp.logical_not(red), omega1)
        omega2 = 1.0 / (1.0 - 0.25 * radius * radius * omega1)
        res = cfg.epsilon * jnp.sqrt(jnp.sum(
            (delsq_7pt(p) + rhs) ** 2))
        return (p, omega2, it + 1, res)

    init = (psi0, 1.0, 0, jnp.asarray(jnp.inf, psi0.dtype))
    p, _, _, _ = jax.lax.while_loop(cond, body, init)
    return p - jnp.mean(p)


def poisson_solve(psi0, rho_el, cfg: ElectroConfig):
    if cfg.solver == "fft":
        return poisson_fft(rho_el, cfg)
    return poisson_sor(psi0, rho_el, cfg)


# -- Nernst-Planck transport -------------------------------------------------

def nernst_planck_update(rho: jnp.ndarray, psi: jnp.ndarray,
                         cfg: ElectroConfig,
                         u: Optional[jnp.ndarray] = None,
                         solid: Optional[jnp.ndarray] = None,
                         mu_solv=None) -> jnp.ndarray:
    """One explicit NP step for all species; rho (nk, X, Y, Z).

    With cfg.multisteps > 1 the diffusivities are divided by the number
    of sub-cycles and the update repeats (stability for high D).
    mu_solv: optional per-species solvation potential arrays (already
    divided by e), for the electro_symmetric free energy.
    """
    if cfg.multisteps > 1:
        sub = dataclasses.replace(
            cfg, multisteps=1,
            diffusivity=tuple(d / cfg.multisteps
                              for d in cfg.diffusivity))
        for _ in range(cfg.multisteps):
            rho = nernst_planck_update(rho, psi, sub, u=u, solid=solid,
                                       mu_solv=mu_solv)
        return rho
    new = []
    for k in range(cfg.nk):
        z = float(cfg.valency[k])
        d = float(cfg.diffusivity[k])
        mu = z * psi
        if mu_solv is not None:
            mu = mu + mu_solv[k]
        nk_ = rho[k]
        fluxes = []
        for ax in range(3):
            dmu = _up(mu, ax) - mu
            b = jnp.exp(dmu)
            fluxes.append(-d * 0.5 * (1.0 + b) * (_up(nk_, ax) * b - nk_))
        if u is not None:
            adv = advective_fluxes(u, nk_, order=1)
            fluxes = [fluxes[ax] + adv[ax] for ax in range(3)]
        if solid is not None:
            from ludwig_tpu.ops.advect import no_flux_at_solid
            fluxes = no_flux_at_solid(fluxes, solid)
        new.append(nk_ - flux_divergence(fluxes))
    return jnp.stack(new)


def electric_field(psi: jnp.ndarray, cfg: ElectroConfig) -> jnp.ndarray:
    """Physical E = -grad psi * kT / e (ref: psi_force.c:126)."""
    kt = 1.0 / cfg.beta
    return -grad_7pt(psi) * (kt / cfg.e)


def electro_force(rho: jnp.ndarray, psi: jnp.ndarray,
                  cfg: ElectroConfig) -> jnp.ndarray:
    """F = rho_elec E  (grad-mu method, ref: psi_force_gradmu)."""
    return rho_elec(rho, cfg)[None] * electric_field(psi, cfg)


DBL_EPSILON = 2.220446049250313e-16


def fe_electro_fed(rho: jnp.ndarray, cfg: ElectroConfig,
                   psi=None) -> jnp.ndarray:
    """Electrolyte free energy density, exactly the reference form
    sum_k n_k [(ln(n_k + DBL_EPSILON) - 1) + 0.5 z_k psi]
    (ref: fe_electro.c fe_electro_fed; no kT factor, psi reduced)."""
    out = 0.0
    for k in range(cfg.nk):
        nk_ = rho[k]
        term = jnp.log(nk_ + DBL_EPSILON) - 1.0
        if psi is not None:
            term = term + 0.5 * float(cfg.valency[k]) * psi
        out = out + nk_ * term
    return out
