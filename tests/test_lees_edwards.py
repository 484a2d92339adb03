"""Lees-Edwards sliding-plane tests: shear establishment, conservation
(mirrors the physics of the reference serial-le* regressions)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ludwig_tpu.lb import LBConfig, initial_rest, make_nstep, make_step
from ludwig_tpu.ops.lees_edwards import (LeesEdwardsConfig,
                                         le_steady_profile)


def test_plane_geometry():
    le = LeesEdwardsConfig(nplanes=2, uy=0.05, nx=32)
    # ref: dx_sep = 16, dx_min = 8 -> 1-based ic = 8, 24
    assert le.plane_cols == (7, 23)
    le = LeesEdwardsConfig(nplanes=1, uy=0.05, nx=16)
    assert le.plane_cols == (7,)


def test_mass_conserved_under_le():
    cfg = LBConfig(size=(16, 16, 4), nvel=19, eta_shear=0.1,
                   eta_bulk=0.1, dtype="float64")
    le = LeesEdwardsConfig(nplanes=2, uy=0.01, nx=16)
    f = initial_rest(cfg)
    nstep = make_nstep(cfg, le=le)
    f = nstep(f, 50)
    np.testing.assert_allclose(float(jnp.sum(f)), 16 * 16 * 4, rtol=1e-12)
    assert np.isfinite(np.asarray(f)).all()


def test_le_establishes_sawtooth_shear():
    """From rest, LE planes drive the fluid to the steady profile:
    slope -nplanes uy / X in the blocks with +uy jumps at the planes
    (the stored frame is per-block)."""
    NX = 32
    uy = 0.005
    cfg = LBConfig(size=(NX, 16, 4), nvel=19, eta_shear=0.1, eta_bulk=0.1,
                   dtype="float64")
    le = LeesEdwardsConfig(nplanes=2, uy=uy, nx=NX)
    f = initial_rest(cfg)
    nstep = make_nstep(cfg, le=le)
    f = nstep(f, 3000)
    f, rho, u = make_step(cfg, le=le)(f, 3000)

    uyx = np.asarray(u[1, :, :, 2]).mean(axis=1)
    x = np.arange(NX)
    expect = le_steady_profile(le, x)
    np.testing.assert_allclose(uyx - uyx.mean(), expect, atol=0.02 * uy)
    # the shear stress is uniform: viscosity recoverable from the slope
    slope = np.polyfit(x[9:22], uyx[9:22], 1)[0]
    assert abs(slope - le.nplanes * uy / NX) < 0.05 * abs(
        le.nplanes * uy / NX)


def test_le_oscillation_free_density():
    """LE should not generate density artefacts at the planes."""
    NX = 16
    cfg = LBConfig(size=(NX, 8, 4), nvel=19, eta_shear=0.1, eta_bulk=0.1,
                   dtype="float64")
    le = LeesEdwardsConfig(nplanes=1, uy=0.01, nx=NX)
    f = initial_rest(cfg)
    nstep = make_nstep(cfg, le=le)
    f = nstep(f, 500)
    rho = np.asarray(jnp.sum(f, 0))
    assert abs(rho.mean() - 1.0) < 1e-12
    assert rho.std() < 1e-3
