"""Liquid-crystal stack tests: Landau-de Gennes free energy, molecular
field, Beris-Edwards relaxation (mirrors reference test_blue_phase.c /
test_be.c coverage and the serial-relx-bp1 regression physics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ludwig_tpu.dynamics.beris_edwards import (BerisEdwardsParams,
                                               beris_edwards_update,
                                               velocity_gradient_tensor)
from ludwig_tpu.fe.blue_phase import BluePhaseFE, q5_to_q33
from ludwig_tpu.fe.lc_init import (lc_init_nematic, lc_init_o8m,
                                   lc_init_random, lc_init_twist)
from ludwig_tpu.lb import LBConfig
from ludwig_tpu.lc import (LCConfig, initial_lc, lc_fields, make_lc_nstep,
                           make_lc_step, total_free_energy)

# BPI parameters from the reference regression serial-relx-bp1.inp
BP = BluePhaseFE(a0=0.014384711, gamma=3.1764706, q0=0.27768018,
                 kappa0=0.01, kappa1=0.01, xi=0.7, redshift=0.83)


def _cfg(size=(32, 32, 32), fe=BP, **kw):
    lb = LBConfig(size=size, nvel=19, eta_shear=1.0, eta_bulk=1.0,
                  dtype="float64")
    kw.setdefault("gamma", 0.1)
    return LCConfig(lb=lb, fe=fe, **kw)


def test_amplitude_and_uniaxial():
    a = BP.amplitude0
    assert 0 < a < 1
    q5 = lc_init_nematic((4, 4, 4), a, director=(0, 0, 1.0))
    q33 = q5_to_q33(jnp.asarray(q5))
    # traceless, uniaxial along z with eigenvalue a
    np.testing.assert_allclose(np.asarray(q33[0][0] + q33[1][1] + q33[2][2]),
                               0.0, atol=1e-15)
    np.testing.assert_allclose(np.asarray(q33[2][2]), a, atol=1e-15)


def test_nematic_is_bulk_minimum():
    """For a uniform nematic at amplitude0, h vanishes (bulk minimum)."""
    fe = BluePhaseFE(a0=0.01, gamma=3.0, q0=0.0, kappa0=0.01, kappa1=0.01)
    q5 = jnp.asarray(lc_init_nematic((4, 4, 4), fe.amplitude0,
                                     director=(0, 0, 1.0)))
    fields = lc_fields(q5, "3d_7pt_fluid")
    h = fe.molecular_field(fields)
    for a in range(3):
        for b in range(3):
            np.testing.assert_allclose(np.asarray(h[a][b]), 0.0, atol=1e-12)


def test_molecular_field_traceless():
    rng = np.random.default_rng(0)
    q5 = jnp.asarray(0.1 * rng.standard_normal((5, 8, 8, 8)))
    fields = lc_fields(q5, "3d_7pt_fluid")
    h = BP.molecular_field(fields)
    tr = np.asarray(h[0][0] + h[1][1] + h[2][2])
    np.testing.assert_allclose(tr, 0.0, atol=1e-14)


def test_cholesteric_energy_below_nematic():
    """At finite chirality the twisted state beats the uniform nematic."""
    size = (32, 4, 4)
    # pitch fits the box: q0 = 2 pi / 32 (full director turn pi periodic)
    fe = BluePhaseFE(a0=0.01, gamma=3.0, q0=2.0 * np.pi / 32, kappa0=0.01,
                     kappa1=0.01)
    cfg = _cfg(size, fe=fe)
    a = fe.amplitude0
    q_twist = jnp.asarray(lc_init_twist(size, fe.q0, a, axis=0))
    q_nem = jnp.asarray(lc_init_nematic(size, a))
    assert total_free_energy(cfg, q_twist) < total_free_energy(cfg, q_nem)


def test_be_relaxation_decreases_free_energy():
    """Pure relaxational dynamics (hydrodynamics off) is a gradient flow:
    the total free energy decreases monotonically (the serial-relx-bp1
    scenario: BPI O8M initial condition)."""
    size = (16, 16, 16)
    # q0 compatible with the box: BPI unit cell sqrt(2) pi / q0
    fe = BluePhaseFE(a0=0.014384711, gamma=3.1764706,
                     q0=np.sqrt(2.0) * np.pi / 16, kappa0=0.01, kappa1=0.01,
                     xi=0.7)
    cfg = _cfg(size, fe=fe, hydrodynamics=False)
    q5 = lc_init_o8m(size, fe.q0, -0.2)
    state = initial_lc(cfg, q5)
    nstep = make_lc_nstep(cfg)
    fe_vals = [total_free_energy(cfg, state[1])]
    for _ in range(4):
        state = nstep(state, 25)
        fe_vals.append(total_free_energy(cfg, state[1]))
    assert all(b < a for a, b in zip(fe_vals, fe_vals[1:])), fe_vals
    assert np.isfinite(np.asarray(state[1])).all()


def test_velocity_gradient_tensor():
    """w[a][b] = d_b u_a for a linear shear u_y = s * x."""
    L = 8
    s = 1e-3
    x = np.arange(L)
    uy = np.broadcast_to((s * x)[:, None, None], (L, L, L))
    u = jnp.asarray(np.stack([np.zeros((L, L, L)), uy, np.zeros((L, L, L))]))
    w = velocity_gradient_tensor(u)
    # interior: d_x u_y = s  -> w[1][0] = s
    np.testing.assert_allclose(np.asarray(w[1][0])[2:-2], s, atol=1e-12)
    np.testing.assert_allclose(np.asarray(w[0][1]), 0.0, atol=1e-15)


def test_full_lc_step_runs_and_conserves():
    """Full hydro LC step: mass/momentum conserved, Q stays traceless."""
    size = (16, 16, 16)
    fe = BluePhaseFE(a0=0.014384711, gamma=3.1764706,
                     q0=np.sqrt(2.0) * np.pi / 16, kappa0=0.01, kappa1=0.01,
                     xi=0.7)
    lb = LBConfig(size=size, nvel=19, eta_shear=0.5, eta_bulk=0.5,
                  dtype="float64")
    cfg = LCConfig(lb=lb, fe=fe, gamma=0.3, advection_order=1)
    state = initial_lc(cfg, lc_init_o8m(size, fe.q0, -0.2))
    step = make_lc_step(cfg)
    for _ in range(10):
        state, rho = step(state)
    f, q5, u = state
    # mass conserved
    np.testing.assert_allclose(float(jnp.sum(f)), float(np.prod(size)),
                               rtol=1e-12)
    # momentum conserved (stress divergence is conservative)
    from ludwig_tpu.lb import hydro_fields
    _, g = hydro_fields(f, cfg.lb.model)
    np.testing.assert_allclose(np.asarray(jnp.sum(g, (1, 2, 3))), 0.0,
                               atol=1e-12)
    assert np.isfinite(np.asarray(q5)).all()


def test_active_stress_drives_flow():
    """An active nematic with a bend perturbation generates flow."""
    size = (16, 16, 4)
    fe = BluePhaseFE(a0=0.05, gamma=3.0, q0=0.0, kappa0=0.05, kappa1=0.05,
                     xi=0.7, zeta1=0.005)
    lb = LBConfig(size=size, nvel=19, eta_shear=0.5, eta_bulk=0.5,
                  dtype="float64")
    cfg = LCConfig(lb=lb, fe=fe, gamma=0.3)
    # director with a gentle bend
    x = np.arange(size[0]) / size[0]
    theta = 0.3 * np.sin(2 * np.pi * x)[:, None, None] * np.ones(size)
    n = (np.cos(theta), np.sin(theta), np.zeros(size))
    from ludwig_tpu.fe.lc_init import q_uniaxial
    state = initial_lc(cfg, q_uniaxial(fe.amplitude0, n))
    step = make_lc_step(cfg)
    for _ in range(5):
        state, rho = step(state)
    u = np.asarray(state[2])
    assert np.abs(u).max() > 1e-8  # activity produced flow
    assert np.isfinite(u).all()
