"""End-to-end hydrodynamics validation: the LB step reproduces
Navier-Stokes behavior (viscous decay, Couette/Poiseuille profiles).
This is the physics contract the reference regression suite checks via
log observables."""

import jax.numpy as jnp
import numpy as np
import pytest

from ludwig_tpu.lattice import lb_model
from ludwig_tpu.lb import (LBConfig, initial_from_hydro, initial_rest,
                           hydro_fields, make_nstep, make_step, solid_mask)
from ludwig_tpu.ops.collide import RelaxationScheme


@pytest.mark.parametrize("scheme", [RelaxationScheme.M10,
                                    RelaxationScheme.BGK,
                                    RelaxationScheme.TRT])
def test_shear_wave_decay(scheme):
    """u_y(x) = u0 sin(kx) decays as exp(-nu k^2 t) with nu = eta/rho0."""
    L = 32
    eta = 0.08
    cfg = LBConfig(size=(L, 4, 4), nvel=19, eta_shear=eta, eta_bulk=eta,
                   scheme=scheme, dtype="float64")
    x = np.arange(L)
    u0 = 1e-4
    k = 2 * np.pi / L
    uy = u0 * np.sin(k * x)[:, None, None] * np.ones((L, 4, 4))
    u = np.stack([np.zeros((L, 4, 4)), uy, np.zeros((L, 4, 4))])
    rho = np.ones((L, 4, 4))
    f = initial_from_hydro(cfg, rho, u)

    nsteps = 200
    f = make_nstep(cfg)(f, nsteps - 1)
    f, rho_out, u_out = make_step(cfg)(f)

    amp = np.asarray(u_out[1]) * np.sin(k * x)[:, None, None]
    measured = 2.0 * amp.mean()  # projection onto sin(kx)
    nu = eta / 1.0
    expect = u0 * np.exp(-nu * k * k * nsteps)
    assert abs(measured / expect - 1.0) < 2e-3


def test_mass_momentum_conservation_longrun():
    cfg = LBConfig(size=(16, 16, 16), nvel=19, eta_shear=0.05,
                   dtype="float64")
    rng = np.random.default_rng(0)
    u = 1e-3 * rng.standard_normal((3, 16, 16, 16))
    u -= u.mean(axis=(1, 2, 3), keepdims=True)  # zero net momentum
    f = initial_from_hydro(cfg, np.ones((16, 16, 16)), u)
    model = cfg.model
    rho0, g0 = hydro_fields(f, model)
    mass0, mom0 = float(jnp.sum(rho0)), np.asarray(jnp.sum(g0, (1, 2, 3)))

    step = make_step(cfg)
    for _ in range(50):
        f, _, _ = step(f)

    rho1, g1 = hydro_fields(f, model)
    assert abs(float(jnp.sum(rho1)) - mass0) < 1e-9 * mass0
    np.testing.assert_allclose(np.asarray(jnp.sum(g1, (1, 2, 3))), mom0,
                               atol=1e-10)


def test_poiseuille_profile():
    """Body-force-driven channel flow between walls reaches the parabolic
    profile with the half-way bounce-back wall location (walls at the
    outermost planes; zero velocity half a lattice spacing inside)."""
    NX = 18  # 16 fluid sites + 2 wall planes
    eta = 0.1
    Fy = 1e-5
    cfg = LBConfig(size=(NX, 4, 4), nvel=19, eta_shear=eta, eta_bulk=eta,
                   walls=(True, False, False), force_global=(0.0, Fy, 0.0),
                   dtype="float64")
    solid = solid_mask(cfg)
    f = initial_rest(cfg)
    nstep = make_nstep(cfg, solid=solid)
    f = nstep(f, 3000)
    f, rho, u = make_step(cfg, solid=solid)(f)

    uy = np.asarray(u[1, :, 2, 2])
    # analytic: u(x) = F/(2 eta) * (h^2/4 - x'^2), x' from channel center,
    # wall plane at the center of the solid site => channel width h = NX-2
    h = NX - 2
    xp = np.arange(1, NX - 1) + 0.5 - NX / 2.0
    expect = Fy / (2.0 * eta) * ((h / 2.0) ** 2 - xp ** 2)
    # curvature d2u/dx2 = -F/eta exactly (viscosity check, no slip effect)
    curv = uy[2:-2][:-2] - 2 * uy[2:-2][1:-1] + uy[2:-2][2:]
    np.testing.assert_allclose(curv, -Fy / eta, rtol=1e-4)
    # profile matches with the half-way-bounce-back slip allowance (the
    # wall sits exactly halfway only at the TRT magic parameter)
    np.testing.assert_allclose(uy[1:-1], expect,
                               atol=0.1 * Fy / (2.0 * eta), rtol=1e-3)
    # wall (solid) sites carry no flow
    assert uy[0] == 0.0 and uy[-1] == 0.0


def test_couette_profile():
    """Moving wall drives a linear shear profile."""
    NX = 14
    eta = 0.1
    uw = 0.02
    cfg = LBConfig(size=(NX, 4, 4), nvel=19, eta_shear=eta, eta_bulk=eta,
                   walls=(True, False, False), wall_u=(0.0, uw, 0.0),
                   dtype="float64")
    # Both walls move with +uw here (uniform wall velocity): steady state
    # is plug flow at uw.
    solid = solid_mask(cfg)
    f = initial_rest(cfg)
    f = make_nstep(cfg, solid=solid)(f, 2000)
    f, rho, u = make_step(cfg, solid=solid)(f)
    uy = np.asarray(u[1, 1:-1, 2, 2])
    np.testing.assert_allclose(uy, uw, rtol=5e-3)


def test_d2q9_runs():
    cfg = LBConfig(size=(16, 16, 1), nvel=9, eta_shear=0.1, dtype="float64")
    f = initial_rest(cfg)
    step = make_step(cfg)
    for _ in range(5):
        f, rho, u = step(f)
    np.testing.assert_allclose(np.asarray(rho), 1.0, atol=1e-14)
