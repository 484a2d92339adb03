"""Electro-symmetric (dielectric contrast) tests."""

import jax.numpy as jnp
import numpy as np

from ludwig_tpu.electro import ElectroConfig, rho_elec
from ludwig_tpu.fe.electro_symmetric import (ElectroSymmetricFE,
                                             poisson_sor_var_epsilon)
from ludwig_tpu.fe.symmetric import SymmetricFE
from ludwig_tpu.ops.stencil import roll3

CFG = ElectroConfig(valency=(1, -1), epsilon=100.0)
FE = ElectroSymmetricFE(symm=SymmetricFE(-6.25e-3, 6.25e-3, 4e-3),
                        electro=CFG, epsilon1=300.0, epsilon2=100.0,
                        deltamu=(0.5, -0.5))


def test_epsilon_contrast():
    assert abs(FE.epsilonbar - 200.0) < 1e-12
    assert abs(FE.gamma - 0.5) < 1e-12
    assert abs(float(FE.var_epsilon(jnp.asarray(1.0))) - 100.0) < 1e-12
    assert abs(float(FE.var_epsilon(jnp.asarray(-1.0))) - 300.0) < 1e-12


def test_mu_solv_partitioning():
    phi = jnp.asarray([-1.0, 1.0])
    ms = FE.mu_solv(phi)
    np.testing.assert_allclose(np.asarray(ms[0]), [0.0, 0.5])
    np.testing.assert_allclose(np.asarray(ms[1]), [0.0, -0.5])


def test_var_epsilon_poisson_uniform_reduces_to_standard():
    """With uniform epsilon, the variable-epsilon SOR solves the same
    equation as the FFT solver."""
    from ludwig_tpu.electro import poisson_fft
    shape = (16, 16, 16)
    rng = np.random.default_rng(0)
    pert = 0.003 * rng.standard_normal(shape)
    pert -= pert.mean()
    rho = jnp.asarray(np.stack([0.01 + pert, np.full(shape, 0.01)]))
    rel = rho_elec(rho, CFG)
    eps = jnp.full(shape, CFG.epsilon, jnp.float64)
    psi1 = poisson_fft(rel, CFG)
    psi2 = poisson_sor_var_epsilon(jnp.zeros(shape, jnp.float64), rel,
                                   eps, CFG, max_its=2000)
    np.testing.assert_allclose(np.asarray(psi2), np.asarray(psi1),
                               atol=1e-7)


def test_var_epsilon_poisson_solves_discrete_equation():
    """Residual of div(eps grad psi) + e beta rho_el vanishes."""
    shape = (16, 8, 8)
    rng = np.random.default_rng(3)
    pert = 0.003 * rng.standard_normal(shape)
    pert -= pert.mean()
    rho = jnp.asarray(np.stack([0.01 + pert, np.full(shape, 0.01)]))
    rel = rho_elec(rho, CFG)
    x = np.arange(16)
    phi = np.tanh((x - 8) / 2.0)[:, None, None] * np.ones(shape)
    eps = FE.var_epsilon(jnp.asarray(phi))
    psi = poisson_sor_var_epsilon(jnp.zeros(shape, jnp.float64), rel,
                                  eps, CFG, max_its=4000)

    # build the discrete operator explicitly
    resid = np.asarray(CFG.e * CFG.beta * rel, np.float64).copy()
    for ax in range(3):
        s_up = [0, 0, 0]
        s_up[ax] = -1
        s_dn = [0, 0, 0]
        s_dn[ax] = 1
        e_up = 0.5 * (eps + roll3(eps, tuple(s_up)))
        e_dn = 0.5 * (eps + roll3(eps, tuple(s_dn)))
        resid += np.asarray(e_up * (roll3(psi, tuple(s_up)) - psi)
                            + e_dn * (roll3(psi, tuple(s_dn)) - psi))
    assert np.abs(resid).max() < 1e-8
