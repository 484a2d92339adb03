"""Sharded-lattice equivalence for the coupled-physics paths (binary
fluid, LC): the full steps must produce the same physics on a 3-D
device mesh as on one device (the reference's decomposition-independence
contract, now for the whole coupled update)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ludwig_tpu.binary import (BinaryConfig, initial_binary,
                               make_binary_step, spinodal_phi)
from ludwig_tpu.fe.symmetric import SymmetricFE
from ludwig_tpu.lb import LBConfig
from ludwig_tpu.parallel.mesh import lattice_sharding, make_mesh


def test_binary_step_sharded_matches():
    size = (16, 16, 16)
    lb = LBConfig(size=size, nvel=19, eta_shear=6.25e-3, dtype="float64")
    cfg = BinaryConfig(lb=lb, fe=SymmetricFE(-6.25e-3, 6.25e-3, 4e-3),
                       mobility=1.25, advection_order=2)
    state0 = initial_binary(cfg, spinodal_phi(size, seed=4))

    step = make_binary_step(cfg)
    s_ref = jax.tree.map(lambda x: x + 0, state0)
    for t in range(5):
        s_ref, _ = step(s_ref, t)

    mesh = make_mesh((2, 2, 2), devices=jax.devices("cpu"))
    sh_f = lattice_sharding(mesh, 1)
    sh_phi = lattice_sharding(mesh, 0)
    s_sh = (jax.device_put(state0[0], sh_f),
            jax.device_put(state0[1], sh_phi),
            jax.device_put(state0[2], sh_f))
    step_sh = make_binary_step(cfg)
    for t in range(5):
        s_sh, _ = step_sh(s_sh, t)

    for a, b in zip(s_ref, s_sh):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-15)


def test_lc_step_sharded_matches():
    from ludwig_tpu.fe.blue_phase import BluePhaseFE
    from ludwig_tpu.fe.lc_init import lc_init_o8m
    from ludwig_tpu.lc import LCConfig, initial_lc, make_lc_step

    size = (16, 16, 16)
    fe = BluePhaseFE(a0=0.014384711, gamma=3.1764706,
                     q0=np.sqrt(2.0) * np.pi / 16, kappa0=0.01,
                     kappa1=0.01, xi=0.7)
    lb = LBConfig(size=size, nvel=19, eta_shear=0.5, dtype="float64")
    cfg = LCConfig(lb=lb, fe=fe, gamma=0.3)
    state0 = initial_lc(cfg, lc_init_o8m(size, fe.q0, -0.2))

    step = make_lc_step(cfg)
    s_ref = jax.tree.map(lambda x: x + 0, state0)
    for t in range(3):
        s_ref, _ = step(s_ref, t)

    mesh = make_mesh((1, 2, 4), devices=jax.devices("cpu"))
    sh = lattice_sharding(mesh, 1)
    s_sh = tuple(jax.device_put(x, sh) for x in state0)
    step_sh = make_lc_step(cfg)
    for t in range(3):
        s_sh, _ = step_sh(s_sh, t)

    for a, b in zip(s_ref, s_sh):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-14)
