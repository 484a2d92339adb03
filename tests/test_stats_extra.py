"""Specialised observables tests (sigma/rheology/calibration)."""

import jax.numpy as jnp
import numpy as np

from ludwig_tpu.binary import fe_fields
from ludwig_tpu.fe.symmetric import SymmetricFE
from ludwig_tpu.stats_extra import (hydrodynamic_radius, measure_sigma,
                                    rheology_profiles, shear_stress_mean)


def test_measure_sigma_matches_analytic():
    fe = SymmetricFE(a=-6.25e-3, b=6.25e-3, kappa=4.0e-2)  # wide interface
    L = 128
    x = np.arange(L) + 0.5
    phi0 = fe.phi_star * (np.tanh((x - L / 4) / fe.xi0)
                          * np.tanh(-(x - 3 * L / 4) / fe.xi0))
    phi = jnp.asarray(np.broadcast_to(phi0[:, None, None], (L, 4, 4)))
    fields = fe_fields(phi, "3d_7pt_fluid")
    sigma = measure_sigma(fe, fields, axis=0)
    assert abs(sigma / fe.sigma - 1.0) < 5e-2


def test_hydrodynamic_radius():
    eta = 0.1
    a = 2.3
    u = 1e-3
    F = 6.0 * np.pi * eta * a * u
    assert abs(hydrodynamic_radius([F, 0, 0], [u, 0, 0], eta) - a) < 1e-12


def test_rheology_profiles_shapes_and_shear_stress():
    from ludwig_tpu.lattice import lb_model
    from ludwig_tpu.lb import LBConfig, initial_from_hydro
    model = lb_model(19)
    L = 16
    # uniform shear flow: S_xy from the second moment ~ rho ux uy + ...
    x = np.arange(L)
    uy = 1e-2 * (x - L / 2)[:, None, None] / L * np.ones((L, 8, 8))
    u = np.stack([np.zeros((L, 8, 8)), uy, np.zeros((L, 8, 8))])
    cfg = LBConfig(size=(L, 8, 8), nvel=19, eta_shear=0.1, dtype="float64")
    f = initial_from_hydro(cfg, np.ones((L, 8, 8)), u)
    sxy = shear_stress_mean(f, model)
    assert np.isfinite(sxy)
    uprof, sprof = rheology_profiles(jnp.asarray(u),
                                     jnp.zeros((3, 3, L, 8, 8)), axis=0)
    assert uprof.shape == (3, L)
    assert sprof.shape == (3, 3, L)
    np.testing.assert_allclose(np.asarray(uprof[1]), uy[:, 0, 0],
                               atol=1e-14)


def test_turbulent_stats_profile(tmp_path):
    import jax.numpy as jnp

    from ludwig_tpu.stats_extra import TurbulentStats
    size = (4, 3, 5)
    ts = TurbulentStats(size)
    u = jnp.ones((3,) + size) * jnp.asarray([1.0, 2.0, 3.0])[:, None,
                                                             None, None]
    ts.accumulate(u)
    ts.accumulate(2.0 * u)
    out = tmp_path / "ubar.dat"
    ts.output(str(out))
    lines = out.read_text().splitlines()
    assert len(lines) == size[0] * size[2]
    toks = lines[0].split()
    # mean of (1x, 2x) over 2 steps = 1.5x the base profile
    assert abs(float(toks[2]) - 1.5) < 1e-12
    assert abs(float(toks[3]) - 3.0) < 1e-12
    assert abs(float(toks[4]) - 4.5) < 1e-12


def test_rheology_accumulator_rest_fluid(tmp_path):
    """Rest-state equilibrium f: measured 2nd moment is rho cs^2 I, so
    the written 'viscous' columns are viscous_factor * 1/3 on the
    diagonal, everything else zero."""
    import numpy as np
    from ludwig_tpu.lattice import lb_model
    from ludwig_tpu.stats_extra import RheologyAccumulator

    model = lb_model(19)
    size = (4, 4, 8)
    wv = np.asarray(model.wv, np.float64)
    f = np.broadcast_to(wv[:, None, None, None], (19,) + size).copy()
    acc = RheologyAccumulator(size)
    acc.accumulate(f, model)
    acc.accumulate(f, model)
    path = tmp_path / "str-00000002.dat"
    eta = 0.1
    acc.write_section(str(path), eta)
    rows = np.loadtxt(path)
    assert rows.shape == (size[0] * size[2], 22)
    viscous = -3.0 * eta * 2.0 / (1.0 + 6.0 * eta)
    # diagonal viscous slots 0, 3, 5 = viscous * cs^2 (per site average)
    np.testing.assert_allclose(rows[:, 0], viscous / 3.0, rtol=1e-12)
    np.testing.assert_allclose(rows[:, 3], viscous / 3.0, rtol=1e-12)
    np.testing.assert_allclose(rows[:, 5], viscous / 3.0, rtol=1e-12)
    np.testing.assert_allclose(rows[:, 1:3], 0.0, atol=1e-15)
    np.testing.assert_allclose(rows[:, 6:], 0.0, atol=1e-15)


def test_sigma_calibration_drop_measure():
    """measure() recovers the initialised drop geometry: radius L/4,
    best-fit xi = the initialisation width 2 xi0, sigma > 0."""
    import numpy as np
    from ludwig_tpu.fe.symmetric import SymmetricFE
    from ludwig_tpu.ops.stencil import delsq_27pt, grad_27pt
    from ludwig_tpu.stats_extra import SigmaCalibration

    fe = SymmetricFE(a=-0.0625, b=0.0625, kappa=0.04)
    size = (32, 32, 32)
    cal = SigmaCalibration(fe, size, mobility=0.15)
    phi = cal.init_phi(np.float64)
    import jax.numpy as jnp
    phj = jnp.asarray(phi)
    fields = {"phi": phj, "grad_phi": grad_27pt(phj),
              "delsq_phi": delsq_27pt(phj)}
    radius, xifit, sigma = cal.measure(phi, fields)
    assert abs(radius - 8.0) < 0.2
    assert abs(xifit - cal.XIINIT * cal.xi0) < 0.15 * cal.xi0
    assert sigma > 0.0
    # the relaxed-interface surface tension for this fe is
    # sqrt(-8 kappa a^3 / 9) / b; the fattened (2 xi0) initial profile
    # carries a larger excess - same order of magnitude
    sigma0 = np.sqrt(-8.0 * fe.kappa * fe.a ** 3 / 9.0) / fe.b
    assert 0.5 * sigma0 < sigma < 3.0 * sigma0
