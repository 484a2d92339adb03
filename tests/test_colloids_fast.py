"""Segment-sum colloid BBL vs the per-particle oracle."""

import jax.numpy as jnp
import numpy as np

from ludwig_tpu.colloids import (ColloidParams, bbl_step, build_map,
                                 refresh_inside)
from ludwig_tpu.colloids_fast import (bbl_step_fast, build_map_fast,
                                      solid_body_u)
from ludwig_tpu.lattice import lb_model
from ludwig_tpu.lb import LBConfig, initial_rest


def _setup(n=3):
    size = (16, 16, 16)
    cfg = LBConfig(size=size, nvel=19, eta_shear=0.1, dtype="float64")
    rng = np.random.RandomState(5)
    R = jnp.asarray(rng.uniform(3, 13, (n, 3)))
    V = jnp.asarray(0.01 * rng.standard_normal((n, 3)))
    W = jnp.asarray(0.005 * rng.standard_normal((n, 3)))
    params = ColloidParams(a0=(2.3,) * n, ah=(2.3,) * n)
    f = initial_rest(cfg)
    # give the fluid a little structure
    f = f + 1e-3 * jnp.asarray(rng.standard_normal(f.shape))
    return cfg, params, f, R, V, W


def test_build_map_fast_matches():
    cfg, params, f, R, V, W = _setup()
    pid_a, in_a = build_map(R, params, cfg.size)
    pid_b, in_b = build_map_fast(R, params, cfg.size)
    np.testing.assert_array_equal(np.asarray(in_a), np.asarray(in_b))
    np.testing.assert_array_equal(np.asarray(pid_a), np.asarray(pid_b))


def test_bbl_fast_matches_oracle():
    cfg, params, f, R, V, W = _setup()
    model = cfg.model
    pid, inside = build_map(R, params, cfg.size)
    ub = solid_body_u(R, V, W, pid, inside, cfg.size, f.dtype)
    f = refresh_inside(f, model, inside, ub)
    ext = jnp.asarray(np.random.RandomState(7).uniform(
        -1e-3, 1e-3, (params.n, 3)))

    f1, V1, W1, _, _ = bbl_step(f, R, V, W, model, params, cfg.size,
                                ext_force=ext)
    f2, V2, W2, _, _ = bbl_step_fast(f, R, V, W, model, params,
                                     cfg.size, ext_force=ext)
    np.testing.assert_allclose(np.asarray(V2), np.asarray(V1),
                               rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(np.asarray(W2), np.asarray(W1),
                               rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1),
                               rtol=1e-12, atol=1e-15)
