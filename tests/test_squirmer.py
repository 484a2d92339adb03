"""Active (squirmer) colloid test: self-propulsion along m
(ref: serial-actv-s01 physics; swimming speed U = 2 b1 / 3)."""

import jax.numpy as jnp
import numpy as np

from ludwig_tpu.colloids import ColloidParams, make_colloid_step
from ludwig_tpu.lb import LBConfig, initial_rest


def test_squirmer_swims_along_m():
    size = (24, 24, 24)
    a = 3.1
    b1 = 0.01
    cfg = LBConfig(size=size, nvel=19, eta_shear=0.1, eta_bulk=0.1,
                   dtype="float64")
    params = ColloidParams(a0=(a,), rho0=1.0,
                           b1=(b1,), b2=(0.0,), m=((1.0, 0.0, 0.0),))
    step = make_colloid_step(cfg, params)
    state = (initial_rest(cfg), jnp.asarray([[12.0, 12.0, 12.0]]),
             jnp.zeros((1, 3)), jnp.zeros((1, 3)),
             jnp.zeros((1, 3)), jnp.asarray([[12.0, 12.0, 12.0]]))
    vx = []
    for t in range(100):
        state, _ = step(state, t)
        vx.append(float(state[2][0, 0]))

    u_theory = 2.0 * b1 / 3.0
    # swims forward along +m at a speed of order 2 b1 / 3 (finite
    # resolution and periodic images make this loose)
    assert vx[-1] > 0.3 * u_theory, (vx[-1], u_theory)
    assert vx[-1] < 2.0 * u_theory
    # transverse drift negligible
    assert abs(float(state[2][0, 1])) < 0.1 * vx[-1]
    assert abs(float(state[2][0, 2])) < 0.1 * vx[-1]
    assert np.isfinite(np.asarray(state[0])).all()
