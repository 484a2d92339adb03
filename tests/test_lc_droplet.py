"""LC-droplet (coupled phi + Q) tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from ludwig_tpu.fe.blue_phase import BluePhaseFE
from ludwig_tpu.fe.lc_droplet import LCDropletFE
from ludwig_tpu.fe.lc_init import lc_init_nematic
from ludwig_tpu.fe.symmetric import SymmetricFE
from ludwig_tpu.lb import LBConfig, hydro_fields
from ludwig_tpu.lc_droplet_sim import (LCDropletConfig, droplet_fields,
                                       initial_droplet, make_droplet_nstep,
                                       make_droplet_step)

SYMM = SymmetricFE(a=-6.25e-4, b=6.25e-4, kappa=5.3e-4)
LC = BluePhaseFE(a0=0.1, gamma=2.586, q0=0.0, kappa0=0.01, kappa1=0.01,
                 xi=0.7)
FE = LCDropletFE(symm=SYMM, lc=LC, gamma0=2.586, delta=0.25, w=0.0)


def _cfg(size=(16, 16, 16)):
    lb = LBConfig(size=size, nvel=19, eta_shear=0.5, eta_bulk=0.5,
                  dtype="float64")
    return LCDropletConfig(lb=lb, fe=FE, mobility=0.05, gamma=0.5)


def _drop_state(cfg, size):
    L = size[0]
    x = np.arange(L) + 0.5 - L / 2
    r = np.sqrt(x[:, None, None] ** 2 + x[None, :, None] ** 2
                + x[None, None, :] ** 2)
    phi0 = np.tanh((r - L / 4) / SYMM.xi0)
    amp = 0.2
    q0 = lc_init_nematic(size, amp, (1.0, 0, 0))
    # isotropic outside the droplet (phi > 0): Q scales with (1-phi)/2
    q0 = q0 * (0.5 * (1.0 - phi0))[None]
    return initial_droplet(cfg, phi0, q0)


def test_gamma_varies_with_phi():
    assert abs(FE.gamma(-1.0) - FE.gamma0) < 1e-15
    assert FE.gamma(1.0) > FE.gamma(-1.0)


def test_mol_field_traceless_and_mu_finite():
    size = (12, 12, 12)
    cfg = _cfg(size)
    state = _drop_state(cfg, size)
    fields = droplet_fields(state[1], state[2], cfg.gradient)
    h = FE.molecular_field(fields)
    tr = np.asarray(h[0][0] + h[1][1] + h[2][2])
    np.testing.assert_allclose(tr, 0.0, atol=1e-13)
    mu = np.asarray(FE.mu(fields))
    assert np.isfinite(mu).all()


def test_droplet_run_conserves():
    size = (16, 16, 16)
    cfg = _cfg(size)
    state = _drop_state(cfg, size)
    tot_phi = float(jnp.sum(state[1]))
    nstep = make_droplet_nstep(cfg)
    state = nstep(state, 30)
    f, phi, q5, u = state
    assert abs(float(jnp.sum(phi)) - tot_phi) < 1e-9
    np.testing.assert_allclose(float(jnp.sum(f)), float(np.prod(size)),
                               rtol=1e-12)
    # body force is momentum-corrected; stress div conservative
    _, g = hydro_fields(f, cfg.lb.model)
    np.testing.assert_allclose(np.asarray(jnp.sum(g, (1, 2, 3))), 0.0,
                               atol=1e-11)
    assert np.isfinite(np.asarray(q5)).all()


def test_droplet_anchoring_coupling_acts():
    """With W != 0, the anchoring term contributes to mu and h."""
    size = (12, 12, 12)
    few = LCDropletFE(symm=SYMM, lc=LC, gamma0=2.586, delta=0.25, w=0.02)
    cfg = LCDropletConfig(lb=LBConfig(size=size, nvel=19, eta_shear=0.5,
                                      dtype="float64"),
                          fe=few, mobility=0.05, gamma=0.5)
    state = _drop_state(cfg, size)
    fields = droplet_fields(state[1], state[2], cfg.gradient)
    mu0 = np.asarray(FE.mu(fields))
    muw = np.asarray(few.mu(fields))
    assert np.abs(muw - mu0).max() > 0.0
