"""Fluctuation tests: discrete deviate statistics, conservation under
noise, equipartition order-of-magnitude (mirrors reference test_noise.c
and the isothermal-fluctuation regression physics)."""

import jax.numpy as jnp
import numpy as np

from ludwig_tpu.lb import LBConfig, initial_rest, make_nstep, make_step, hydro_fields
from ludwig_tpu.noise import (NoiseConfig, ch_random_flux, discrete_deviates,
                              fluctuating_stress, var_bulk, var_eta)


def test_discrete_deviates_moments():
    """Zero mean, unit variance, zero 3rd, Gaussian 4th moment (=3)."""
    x = np.asarray(discrete_deviates(12345, 0, 4, (64, 64, 16),
                                     dtype=jnp.float64)).ravel()
    assert abs(x.mean()) < 5e-3
    assert abs(x.var() - 1.0) < 5e-3
    assert abs((x ** 3).mean()) < 2e-2
    assert abs((x ** 4).mean() - 3.0) < 2e-2
    # exactly the 8-value discrete support
    vals = np.unique(np.round(x, 12))
    assert len(vals) <= 5


def test_deviates_depend_on_step_and_seed():
    a = np.asarray(discrete_deviates(1, 0, 1, (8, 8, 8)))
    b = np.asarray(discrete_deviates(1, 1, 1, (8, 8, 8)))
    c = np.asarray(discrete_deviates(2, 0, 1, (8, 8, 8)))
    assert not np.array_equal(a, b)
    assert not np.array_equal(a, c)
    # reproducible
    np.testing.assert_array_equal(a, np.asarray(
        discrete_deviates(1, 0, 1, (8, 8, 8))))


def test_fluctuating_stress_symmetric():
    s = np.asarray(fluctuating_stress(7, 3, (4, 4, 4), 0.1, 0.2,
                                      dtype=jnp.float64))
    np.testing.assert_allclose(s, np.swapaxes(s, 0, 1), atol=1e-15)


def test_fluctuating_lb_conserves_and_equipartitions():
    """Noise conserves mass & momentum exactly (enters only stress +
    ghost modes); site velocity variance approaches kT equipartition."""
    kt = 1e-5
    cfg = LBConfig(size=(16, 16, 16), nvel=19, eta_shear=0.05,
                   eta_bulk=0.05, dtype="float64",
                   noise=NoiseConfig(kt=kt, seed=13, rho=True))
    f = initial_rest(cfg)
    nstep = make_nstep(cfg)
    f = nstep(f, 200)
    rho, g = hydro_fields(f, cfg.model)

    # exact conservation
    np.testing.assert_allclose(float(jnp.sum(rho)), 16 ** 3, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(jnp.sum(g, (1, 2, 3))), 0.0,
                               atol=1e-10)

    # equipartition: <u_a^2> ~ kT (each component), within a factor ~2
    u2 = np.asarray(jnp.mean((g / rho) ** 2, axis=(1, 2, 3)))
    for a in range(3):
        assert 0.3 * kt < u2[a] < 3.0 * kt, (a, u2[a], kt)


def test_binary_noise_conserves_phi():
    from ludwig_tpu.binary import (BinaryConfig, initial_binary,
                                   make_binary_nstep, spinodal_phi)
    from ludwig_tpu.fe.symmetric import SymmetricFE
    kt = 1e-6
    lb = LBConfig(size=(16, 16, 16), nvel=19, eta_shear=6.25e-3,
                  dtype="float64",
                  noise=NoiseConfig(kt=kt, seed=5, rho=False, phi=True))
    cfg = BinaryConfig(lb=lb, fe=SymmetricFE(-6.25e-3, 6.25e-3, 4e-3),
                       mobility=1.25)
    state = initial_binary(cfg, spinodal_phi((16, 16, 16), seed=1))
    tot0 = float(jnp.sum(state[1]))
    state = make_binary_nstep(cfg)(state, 50)
    assert abs(float(jnp.sum(state[1])) - tot0) < 1e-9
    # the noise actually did something
    assert float(jnp.var(state[1])) > 0
