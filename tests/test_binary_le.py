"""Sheared binary fluid (Lees-Edwards + Cahn-Hilliard) tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ludwig_tpu.binary import BinaryConfig, initial_binary, spinodal_phi
from ludwig_tpu.binary_le import (BinaryLEConfig,
                                  make_binary_le_nstep, make_binary_le_step)
from ludwig_tpu.fe.symmetric import SymmetricFE
from ludwig_tpu.lb import LBConfig, hydro_fields
from ludwig_tpu.ops.lees_edwards import (LeesEdwardsConfig, le_steady_profile,
                                          le_xneighbor)

FE = SymmetricFE(a=-6.25e-3, b=6.25e-3, kappa=4.0e-3)


def test_le_xneighbor_interpolation():
    """Cross-plane neighbour equals the y-displaced column."""
    NX, NY, NZ = 16, 8, 4
    le = LeesEdwardsConfig(nplanes=1, uy=0.5, nx=NX)  # plane below col 8
    rng = np.random.default_rng(0)
    phi = jnp.asarray(rng.random((NX, NY, NZ)))
    t = 3.0                      # dy = 1.5 -> jdy 1, fr 0.5
    out = np.asarray(le_xneighbor(phi, le, t, +1))
    col = le.plane_cols[0]
    expect = 0.5 * (np.roll(np.asarray(phi)[col + 1], -1, axis=0)
                    + np.roll(np.asarray(phi)[col + 1], -2, axis=0))
    np.testing.assert_allclose(out[col], expect, atol=1e-14)
    # non-plane columns are the plain roll
    np.testing.assert_allclose(out[2], np.asarray(phi)[3], atol=1e-15)
    # integer displacement is exact
    out2 = np.asarray(le_xneighbor(phi, le, 2.0, +1))  # dy = 1
    np.testing.assert_allclose(out2[col],
                               np.roll(np.asarray(phi)[col + 1], -1, 0),
                               atol=1e-15)


def test_sheared_binary_conserves_and_runs():
    size = (16, 16, 8)
    lb = LBConfig(size=size, nvel=19, eta_shear=0.05, eta_bulk=0.05,
                  dtype="float64")
    bcfg = BinaryConfig(lb=lb, fe=FE, mobility=0.5, advection_order=2)
    le = LeesEdwardsConfig(nplanes=2, uy=0.005, nx=size[0])
    cfg = BinaryLEConfig(binary=bcfg, le=le)

    state = initial_binary(bcfg, spinodal_phi(size, seed=21))
    tot0 = float(jnp.sum(state[1]))
    nstep = make_binary_le_nstep(cfg)
    state = nstep(state, 400)
    f, phi, u = state

    # phi conserved through the sliding planes (interpolation is a
    # convex partition of unity)
    assert abs(float(jnp.sum(phi)) - tot0) < 1e-9
    np.testing.assert_allclose(float(jnp.sum(f)), float(np.prod(size)),
                               rtol=1e-12)
    assert np.isfinite(np.asarray(phi)).all()

    # the shear profile develops underneath the binary dynamics
    uyx = np.asarray(u[1]).mean(axis=(1, 2))
    expect = le_steady_profile(le, np.arange(size[0]))
    corr = np.corrcoef(uyx - uyx.mean(), expect)[0, 1]
    assert corr > 0.9, corr
