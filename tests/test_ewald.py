"""Dipolar Ewald sums: physics checks against direct summation."""

import jax.numpy as jnp
import numpy as np

from ludwig_tpu.ewald import (ewald_params, ewald_sum, fourier_space,
                              real_space, self_energy)


def test_self_energy_matches_reference_value():
    # serial-ewld-s01 banner: N=20, mu=0.285, rc=16 -> -2.3308461e-03
    e = self_energy(0.285, 16.0, 20)
    assert abs(e - (-2.3308461e-03)) < 1e-9


def test_kappa_nk_match_reference():
    kappa, nk, kmax = ewald_params(0.285, 16.0, (64, 64, 64))
    assert abs(kappa - 0.15625) < 1e-12
    assert abs(kmax - 6.1685028e-01) < 1e-6
    assert nk == 8  # 'Max. term retained in Fourier space sum: 9' rows

def test_forces_are_energy_gradients():
    """F = -dE/dR and T = -s x dE/ds: the closed-form force/torque
    sums match autodiff of the energy exactly (both spaces)."""
    import jax
    size = (32, 32, 32)
    mu = 0.5
    rc = 16.0
    rng = np.random.RandomState(3)
    R = jnp.asarray(rng.uniform(4, 28, (4, 3)))
    S = rng.standard_normal((4, 3))
    S = jnp.asarray(S / np.linalg.norm(S, axis=1, keepdims=True))

    def etot(R, S):
        return (real_space(R, S, mu, rc, size)[0]
                + fourier_space(R, S, mu, rc, size)[0])

    F, T = ewald_sum(R, S, mu, rc, size)
    Fg = -jax.grad(etot, argnums=0)(R, S)
    np.testing.assert_allclose(np.asarray(F), np.asarray(Fg),
                               rtol=1e-10, atol=1e-18)
    # torque = -s x dE/ds
    dEds = jax.grad(etot, argnums=1)(R, S)
    Tg = -jnp.cross(S, dEds)
    np.testing.assert_allclose(np.asarray(T), np.asarray(Tg),
                               rtol=1e-10, atol=1e-18)
    # Newton's third law
    np.testing.assert_allclose(np.asarray(jnp.sum(F, axis=0)), 0.0,
                               atol=1e-12)
