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


def test_np_d3qx_stencils():
    """The D3Q19/27-link NP update (np_step_d3qx, ref:
    nernst_planck.c:349 driver + stencil.h rcs table) conserves charge
    exactly and relaxes a perturbation toward the same equilibrium as
    the 7-point path."""
    import jax.numpy as jnp
    import numpy as np
    from ludwig_tpu.electro import ElectroConfig
    from ludwig_tpu.electro_sim import (ElectroSimConfig,
                                        make_psi_neighbours, np_step,
                                        np_step_d3qx)
    from ludwig_tpu.lb import LBConfig

    size = (12, 10, 8)
    ek = ElectroConfig(valency=(1, -1), diffusivity=(0.05, 0.05),
                       e=1.0, beta=1.0, epsilon=100.0)
    cfg = ElectroSimConfig(lb=LBConfig(size=size, nvel=19,
                                       eta_shear=0.1, dtype="float64"),
                           ek=ek, hydrodynamics=False)
    rng = np.random.default_rng(5)
    rho0 = jnp.asarray(0.01 + 0.002 * rng.random((2,) + size))
    psi = jnp.asarray(0.01 * rng.standard_normal(size))
    fluid = jnp.ones(size, bool)
    up, dn = make_psi_neighbours(size, (0.0, 0.0, 0.0), "float64")

    r7 = rho0
    for _ in range(20):
        r7 = np_step(r7, psi, None, fluid, cfg, up, dn, 1.0)
    for npoints in (19, 27):
        r = rho0
        for _ in range(20):
            r = np_step_d3qx(r, psi, None, fluid, cfg, up, dn, 1.0,
                             npoints=npoints)
        # exact conservation per species (link antisymmetry)
        np.testing.assert_allclose(
            np.asarray(jnp.sum(r, axis=(1, 2, 3))),
            np.asarray(jnp.sum(rho0, axis=(1, 2, 3))), rtol=1e-13)
        # same physics: both relax toward the Boltzmann distribution
        # in psi; after 20 steps the fields agree to a few percent of
        # the perturbation scale
        assert float(jnp.max(jnp.abs(r - r7))) < 5e-4
        # the d3qx path must actually differ from 7pt (diagonal links)
        assert float(jnp.max(jnp.abs(r - r7))) > 1e-9


def test_np_d3qx_solid_no_flux():
    """Solid sites block d3qx links: charge in a closed fluid pocket
    stays in the pocket."""
    import jax.numpy as jnp
    import numpy as np
    from ludwig_tpu.electro import ElectroConfig
    from ludwig_tpu.electro_sim import (ElectroSimConfig,
                                        make_psi_neighbours,
                                        np_step_d3qx)
    from ludwig_tpu.lb import LBConfig

    size = (10, 8, 8)
    ek = ElectroConfig(valency=(1, -1), diffusivity=(0.05, 0.05),
                       e=1.0, beta=1.0, epsilon=100.0)
    cfg = ElectroSimConfig(lb=LBConfig(size=size, nvel=19,
                                       eta_shear=0.1, dtype="float64"),
                           ek=ek, hydrodynamics=False)
    fluid = np.ones(size, bool)
    fluid[4] = False              # wall plane splits x periodically...
    fluid[9] = False              # ...into two closed pockets
    fluid = jnp.asarray(fluid)
    rho = np.full((2,) + size, 0.01)
    rho[0, :4] = 0.03             # extra species-0 charge in pocket A
    rho = jnp.asarray(rho)
    psi = jnp.zeros(size)
    up, dn = make_psi_neighbours(size, (0.0, 0.0, 0.0), "float64")

    qa0 = float(jnp.sum(jnp.where(fluid[None], rho, 0.0)[0, :4]))
    r = rho
    for _ in range(10):
        r = np_step_d3qx(r, psi, None, fluid, cfg, up, dn, 1.0,
                         npoints=27)
    qa = float(jnp.sum(jnp.where(fluid[None], r, 0.0)[0, :4]))
    assert abs(qa - qa0) < 1e-14
    # solid sites untouched
    np.testing.assert_array_equal(np.asarray(r[:, 4]),
                                  np.asarray(rho[:, 4]))
