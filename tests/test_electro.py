"""Electrokinetics tests: Poisson solvers, Nernst-Planck equilibrium,
charge conservation, Debye screening (mirrors reference d3q19-elec
regression physics and tests/unit/test_psi_sor.c)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ludwig_tpu.electro import (ElectroConfig, electro_force,
                                nernst_planck_update, poisson_fft,
                                poisson_sor, rho_elec)
from ludwig_tpu.ops.stencil import delsq_7pt

CFG = ElectroConfig(valency=(1, -1), diffusivity=(0.01, 0.01),
                    e=1.0, beta=1.0, epsilon=100.0)


def _random_neutral_rho(shape, n0=0.01, amp=0.3, seed=0):
    rng = np.random.default_rng(seed)
    pert = amp * n0 * rng.standard_normal(shape)
    pert -= pert.mean()
    nplus = n0 + pert
    nminus = np.full(shape, n0)
    return jnp.asarray(np.stack([nplus, nminus]))


def test_poisson_fft_solves_discrete_equation():
    shape = (16, 16, 16)
    rho = _random_neutral_rho(shape)
    rel = rho_elec(rho, CFG)
    psi = poisson_fft(rel, CFG)
    resid = CFG.epsilon * np.asarray(delsq_7pt(psi)) + np.asarray(
        CFG.e * CFG.beta * rel)
    assert np.abs(resid).max() < 1e-12
    assert abs(float(jnp.mean(psi))) < 1e-14


def test_poisson_sor_matches_fft():
    shape = (16, 16, 16)
    rho = _random_neutral_rho(shape, seed=3)
    rel = rho_elec(rho, CFG)
    cfg = ElectroConfig(valency=(1, -1), epsilon=100.0, solver="sor",
                        rel_tol=1e-10, max_its=5000)
    psi_fft = poisson_fft(rel, cfg)
    psi_sor = poisson_sor(jnp.zeros(shape, jnp.float64), rel, cfg)
    np.testing.assert_allclose(np.asarray(psi_sor), np.asarray(psi_fft),
                               atol=1e-7)


def test_np_boltzmann_equilibrium_is_stationary():
    """With rho_k ~ exp(-z_k psi), the NP fluxes vanish identically
    (the linkwise-Boltzmann scheme's design property)."""
    shape = (16, 8, 8)
    x = np.arange(16)
    psi_np = 0.3 * np.sin(2 * np.pi * x / 16)[:, None, None] * np.ones(shape)
    psi = jnp.asarray(psi_np)
    n0 = 0.01
    rho = jnp.asarray(np.stack([n0 * np.exp(-psi_np), n0 * np.exp(psi_np)]))
    rho2 = nernst_planck_update(rho, psi, CFG)
    np.testing.assert_allclose(np.asarray(rho2), np.asarray(rho),
                               rtol=0, atol=1e-15)


def test_np_conserves_charge_and_mass():
    shape = (12, 12, 12)
    rho = _random_neutral_rho(shape, seed=5)
    rel0 = float(jnp.sum(rho_elec(rho, CFG)))
    tot0 = [float(jnp.sum(rho[k])) for k in range(2)]
    psi = poisson_fft(rho_elec(rho, CFG), CFG)
    for _ in range(20):
        rho = nernst_planck_update(rho, psi, CFG)
        psi = poisson_fft(rho_elec(rho, CFG), CFG)
    for k in range(2):
        assert abs(float(jnp.sum(rho[k])) - tot0[k]) < 1e-12
    assert abs(float(jnp.sum(rho_elec(rho, CFG))) - rel0) < 1e-12


def test_debye_screening_relaxation():
    """A charge perturbation decays toward neutrality (screening) at
    the diffusive rate D (kd^2 + kappa^2)."""
    import jax
    cfg = ElectroConfig(valency=(1, -1), diffusivity=(0.1, 0.1),
                        e=1.0, beta=1.0, epsilon=100.0)
    shape = (32, 4, 4)
    n0 = 0.01
    x = np.arange(32)
    pert = 0.2 * n0 * np.sin(2 * np.pi * x / 32)[:, None, None] * np.ones(shape)
    rho = jnp.asarray(np.stack([n0 + pert, n0 * np.ones(shape)]))
    var0 = float(jnp.var(rho_elec(rho, cfg)))

    @jax.jit
    def steps(rho):
        def body(r, _):
            psi = poisson_fft(rho_elec(r, cfg), cfg)
            return nernst_planck_update(r, psi, cfg), ()
        r, _ = jax.lax.scan(body, rho, None, length=600)
        return r

    rho = steps(rho)
    var1 = float(jnp.var(rho_elec(rho, cfg)))
    assert var1 < 0.05 * var0
    assert float(rho.min()) > 0.0


def test_electro_force_sums_to_zero_for_neutral_system():
    shape = (12, 12, 12)
    rho = _random_neutral_rho(shape, seed=9)
    psi = poisson_fft(rho_elec(rho, CFG), CFG)
    force = np.asarray(electro_force(rho, psi, CFG))
    # global momentum input ~ 0 for a periodic neutral system
    total = force.sum(axis=(1, 2, 3))
    scale = np.abs(force).sum()
    assert np.abs(total).max() < 1e-3 * scale
