"""symmetric_lb (two-distribution binary fluid) tests."""

import jax.numpy as jnp
import numpy as np

from ludwig_tpu.binary import spinodal_phi
from ludwig_tpu.binary_lb import (BinaryLBConfig, g_moments,
                                  initial_binary_lb, make_binary_lb_nstep,
                                  make_binary_lb_step)
from ludwig_tpu.fe.symmetric import SymmetricFE
from ludwig_tpu.lb import LBConfig, hydro_fields

FE = SymmetricFE(a=-6.25e-3, b=6.25e-3, kappa=4.0e-3)


def _cfg(size=(16, 16, 16)):
    lb = LBConfig(size=size, nvel=19, eta_shear=6.25e-3, eta_bulk=6.25e-3,
                  dtype="float64")
    return BinaryLBConfig(lb=lb, fe=FE, mobility=0.15)


def test_phi_and_mass_conserved():
    cfg = _cfg()
    phi0 = spinodal_phi((16, 16, 16), seed=11)
    state = initial_binary_lb(cfg, phi0)
    tphi = float(jnp.sum(state[1]))
    nstep = make_binary_lb_nstep(cfg)
    state = nstep(state, 100)
    f, g = state[0], state[1]
    phi, _ = g_moments(g, cfg.lb.model)
    assert abs(float(jnp.sum(phi)) - tphi) < 1e-9
    np.testing.assert_allclose(float(jnp.sum(f)), 16 ** 3, rtol=1e-12)
    # momentum conserved: the stress enters via the equilibrium second
    # moment, which does not change rho or j
    _, gm = hydro_fields(f, cfg.lb.model)
    np.testing.assert_allclose(np.asarray(jnp.sum(gm, (1, 2, 3))), 0.0,
                               atol=1e-11)
    assert np.isfinite(np.asarray(phi)).all()


def test_interface_remains_bounded():
    """A block interface relaxes without blowing up and phases stay
    near +-phi*."""
    L = 16
    cfg = _cfg((L, 8, 8))
    x = np.arange(L) + 0.5
    prof = FE.phi_star * (np.tanh((x - L / 4) / FE.xi0)
                          * np.tanh(-(x - 3 * L / 4) / FE.xi0))
    phi0 = np.broadcast_to(prof[:, None, None], (L, 8, 8)).copy()
    state = initial_binary_lb(cfg, phi0)
    state = make_binary_lb_nstep(cfg)(state, 300)
    phi, _ = g_moments(state[1], cfg.lb.model)
    phin = np.asarray(phi)
    assert np.abs(phin).max() < 1.3 * FE.phi_star
    assert phin[:, 0, 0].max() > 0.7 * FE.phi_star
    assert phin[:, 0, 0].min() < -0.7 * FE.phi_star
