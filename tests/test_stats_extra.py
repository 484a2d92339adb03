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
