"""Solid-aware gradients with wetting (contact angles)."""

import jax.numpy as jnp
import numpy as np

from ludwig_tpu.binary import (BinaryConfig, initial_binary,
                               make_binary_nstep)
from ludwig_tpu.fe.symmetric import SymmetricFE
from ludwig_tpu.lb import LBConfig, solid_mask
from ludwig_tpu.ops.stencil import grad_7pt, delsq_7pt, solid_gradient_ops

FE = SymmetricFE(a=-6.25e-3, b=6.25e-3, kappa=4.0e-3)


def test_neutral_wetting_ignores_solid_values():
    """With C = H = 0 the solid-aware stencil sees zero normal gradient
    regardless of the junk stored at solid sites."""
    L = 8
    phi = np.full((L, L, L), 0.3)
    phi[0, :, :] = 99.0   # junk at solid plane
    solid = np.zeros((L, L, L), bool)
    solid[0, :, :] = True
    grad, delsq = solid_gradient_ops(jnp.asarray(solid), FE.kappa)
    g = np.asarray(grad(jnp.asarray(phi)))
    d2 = np.asarray(delsq(jnp.asarray(phi)))
    # at fluid sites adjacent to the solid plane: no spurious gradient
    assert np.abs(g[:, 1:, :, :]).max() < 1e-14
    assert np.abs(d2[1:, :, :]).max() < 1e-14


def test_matches_fluid_stencil_away_from_solid():
    rng = np.random.default_rng(0)
    phi = jnp.asarray(rng.random((8, 8, 8)))
    solid = np.zeros((8, 8, 8), bool)
    solid[0, :, :] = True
    grad_s, delsq_s = solid_gradient_ops(jnp.asarray(solid), FE.kappa)
    gs = np.asarray(grad_s(phi))
    gf = np.asarray(grad_7pt(phi))
    np.testing.assert_allclose(gs[:, 2:-1], gf[:, 2:-1], atol=1e-14)
    np.testing.assert_allclose(np.asarray(delsq_s(phi))[2:-1],
                               np.asarray(delsq_7pt(phi))[2:-1],
                               atol=1e-14)


def test_wetting_drives_phase_to_wall():
    """H < 0 favours phi > 0 at the wall: a mixed fluid develops a
    positive phi layer next to the walls."""
    L = 16
    lb = LBConfig(size=(L, 8, 8), nvel=19, eta_shear=6.25e-3,
                  walls=(True, False, False), dtype="float64")
    cfg = BinaryConfig(lb=lb, fe=FE, mobility=1.25,
                       gradient="3d_7pt_solid", wetting=(0.0, -2e-4),
                       hydrodynamics=False)
    solid = solid_mask(lb)
    phi0 = np.zeros((L, 8, 8))
    state = initial_binary(cfg, phi0)
    tot0 = float(jnp.sum(state[1]))
    nstep = make_binary_nstep(cfg, solid=solid)
    state = nstep(state, 400)
    phi = np.asarray(state[1])
    # conserved, and enriched next to the walls
    assert abs(float(jnp.sum(state[1])) - tot0) < 1e-9
    assert phi[1].mean() > 1e-3
    assert phi[-2].mean() > 1e-3
    assert phi[1].mean() > phi[L // 2].mean()
