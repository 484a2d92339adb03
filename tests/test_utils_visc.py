"""Utility CLIs, viscosity model, higher advection orders."""

import subprocess
import sys

import jax.numpy as jnp
import numpy as np

from ludwig_tpu.ops.advect import advective_fluxes, flux_divergence
from ludwig_tpu.visc import ViscArrhenius


def test_visc_arrhenius_limits():
    v = ViscArrhenius(eta_minus=0.1, eta_plus=0.4, phistar=1.0)
    assert abs(float(v.eta(jnp.asarray(-1.0))) - 0.1) < 1e-12
    assert abs(float(v.eta(jnp.asarray(1.0))) - 0.4) < 1e-12
    # geometric mean at phi = 0
    assert abs(float(v.eta(jnp.asarray(0.0))) - np.sqrt(0.04)) < 1e-12


def test_visc_model_in_binary_step():
    from ludwig_tpu.binary import (BinaryConfig, initial_binary,
                                   make_binary_nstep, spinodal_phi)
    from ludwig_tpu.fe.symmetric import SymmetricFE
    from ludwig_tpu.lb import LBConfig
    lb = LBConfig(size=(12, 12, 12), nvel=19, eta_shear=0.1, eta_bulk=0.1,
                  dtype="float64")
    cfg = BinaryConfig(lb=lb, fe=SymmetricFE(-6.25e-3, 6.25e-3, 4e-3),
                       mobility=1.25,
                       visc_model=ViscArrhenius(0.05, 0.2))
    state = initial_binary(cfg, spinodal_phi((12, 12, 12), seed=2))
    tot = float(jnp.sum(state[1]))
    state = make_binary_nstep(cfg)(state, 20)
    assert abs(float(jnp.sum(state[1])) - tot) < 1e-10
    assert np.isfinite(np.asarray(state[0])).all()


def test_advection_orders_conservative():
    """All advection orders conserve phi through the flux divergence."""
    rng = np.random.default_rng(0)
    phi = jnp.asarray(rng.random((8, 8, 8)))
    u = jnp.asarray(0.01 * rng.standard_normal((3, 8, 8, 8)))
    for order in (1, 2, 3, 4, 5):
        div = flux_divergence(advective_fluxes(u, phi, order))
        total = float(jnp.sum(div))
        assert abs(total) < 1e-12, (order, total)


def test_advection_constant_field_uniform_flow():
    """phi = const is advected exactly (divergence zero) at all orders."""
    phi = jnp.full((8, 8, 8), 0.7)
    u = jnp.broadcast_to(jnp.asarray([0.01, -0.02, 0.005])[:, None, None,
                                                           None],
                         (3, 8, 8, 8))
    for order in (1, 2, 3, 4, 5):
        div = flux_divergence(advective_fluxes(u, phi, order))
        np.testing.assert_allclose(np.asarray(div), 0.0, atol=1e-15)


def test_capillary_cli(tmp_path):
    out = tmp_path / "cap.npy"
    subprocess.run([sys.executable, "util/capillary.py", "--size",
                    "16_16_8", "--geometry", "circle_xy", "--out",
                    str(out)], check=True, capture_output=True)
    solid = np.load(out)
    assert solid.shape == (16, 16, 8)
    assert solid.any() and not solid.all()
    assert not solid[8, 8, 4]  # centre open


def test_colloid_init_cli(tmp_path):
    out = tmp_path / "c.npz"
    subprocess.run([sys.executable, "util/colloid_init.py", "--size",
                    "32_32_32", "--n", "4", "--a0", "2.3", "--out",
                    str(out)], check=True, capture_output=True)
    d = np.load(out)
    assert d["r"].shape == (4, 3)
    assert (d["a0"] == 2.3).all()


def test_extract_director():
    from util.extract import director
    from ludwig_tpu.fe.lc_init import lc_init_nematic
    q5 = lc_init_nematic((4, 4, 4), 0.333, director=(0, 0, 1.0))
    n, s = director(q5)
    np.testing.assert_allclose(np.abs(n[..., 2]), 1.0, atol=1e-12)
    np.testing.assert_allclose(s, 0.5 * 0.333 * 3, atol=1e-12)
