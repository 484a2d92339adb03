"""Pair potential / lubrication / bond / subgrid tests (mirrors
reference tests/unit/test_pair_ss_cut.c, test_lubrication.c,
test_bond_fene.c, and the subgrid method)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ludwig_tpu.interactions import (angle_cosine_forces, fene_bond_forces,
                                     lubrication_normal,
                                     pair_separations, soft_sphere_forces,
                                     yukawa_forces)
from ludwig_tpu.subgrid import (d_peskin, interpolate_velocity,
                                spread_forces, subgrid_update)

BOX = (32, 32, 32)


def test_pair_separations_min_image():
    R = jnp.asarray([[1.0, 16.0, 16.0], [31.0, 16.0, 16.0]])
    r12 = np.asarray(pair_separations(R, BOX))
    np.testing.assert_allclose(r12[0, 1], [-2.0, 0.0, 0.0])
    np.testing.assert_allclose(r12[1, 0], [2.0, 0.0, 0.0])


def test_soft_sphere_repulsion_and_newton3():
    R = jnp.asarray([[14.0, 16.0, 16.0], [18.5, 16.0, 16.0],
                     [5.0, 5.0, 5.0]])
    ah = jnp.asarray([2.0, 2.0, 2.0])
    F, v = soft_sphere_forces(R, ah, BOX, epsilon=0.0004, sigma=0.1,
                              nu=1.0, hc=0.75)
    F = np.asarray(F)
    # pair 0-1 separated by h = 0.5 < hc: repulsive along x
    assert F[0, 0] < 0.0 and F[1, 0] > 0.0
    np.testing.assert_allclose(F[0], -F[1], atol=1e-15)
    np.testing.assert_allclose(F[2], 0.0, atol=1e-15)  # out of range
    assert float(v) > 0.0


def test_soft_sphere_vanishes_at_cut():
    R = jnp.asarray([[10.0, 16.0, 16.0], [15.0, 16.0, 16.0]])
    ah = jnp.asarray([2.0, 2.0])  # h = 1.0 > hc
    F, v = soft_sphere_forces(R, ah, BOX, epsilon=4e-4, sigma=0.1,
                              nu=1.0, hc=0.75)
    np.testing.assert_allclose(np.asarray(F), 0.0, atol=1e-18)
    assert float(v) == 0.0


def test_lubrication_opposes_approach():
    R = jnp.asarray([[14.0, 16.0, 16.0], [18.3, 16.0, 16.0]])
    V = jnp.asarray([[1e-3, 0.0, 0.0], [-1e-3, 0.0, 0.0]])  # approaching
    ah = jnp.asarray([2.0, 2.0])
    F = np.asarray(lubrication_normal(R, V, ah, BOX, eta=0.1, rch=0.5))
    assert F[0, 0] < 0.0 and F[1, 0] > 0.0  # pushed apart? no: resisted
    np.testing.assert_allclose(F[0], -F[1], atol=1e-15)


def test_yukawa_newton3():
    R = jnp.asarray([[10.0, 16.0, 16.0], [14.0, 16.0, 16.0]])
    F = np.asarray(yukawa_forces(R, BOX, epsilon=1.33e-4, kappa=0.725,
                                 rc=16.0))
    np.testing.assert_allclose(F[0], -F[1], atol=1e-18)
    assert F[0, 0] < 0.0  # repulsive


def test_fene_bond_restoring():
    R = jnp.asarray([[10.0, 16.0, 16.0], [13.0, 16.0, 16.0]])
    bonds = np.array([[0, 1]])
    F = np.asarray(fene_bond_forces(R, BOX, bonds, kappa=1e-2, r0=5.0))
    assert F[0, 0] > 0.0 and F[1, 0] < 0.0  # attractive
    np.testing.assert_allclose(F[0], -F[1], atol=1e-15)


def test_angle_cosine_straightens():
    R = jnp.asarray([[10.0, 16.0, 16.0], [12.0, 16.0, 16.0],
                     [14.0, 17.0, 16.0]])
    angles = np.array([[0, 1, 2]])
    F = np.asarray(angle_cosine_forces(R, BOX, angles, kappa=1e-2))
    np.testing.assert_allclose(F.sum(axis=0), 0.0, atol=1e-15)


def test_peskin_partition_of_unity():
    # sum over integer offsets of the kernel = 1 for any sub-lattice shift
    for frac in (0.0, 0.25, 0.5, 0.9):
        xs = jnp.asarray(np.arange(-3, 4, dtype=np.float64) + frac)
        total = float(jnp.sum(d_peskin(xs)))
        assert abs(total - 1.0) < 1e-12


def test_subgrid_spread_and_interpolate():
    size = (16, 16, 16)
    R = jnp.asarray([[8.3, 8.0, 7.6]])
    F = jnp.asarray([[1e-4, 0.0, -2e-4]])
    field = spread_forces(F, R, size)
    # total spread force equals input force
    np.testing.assert_allclose(np.asarray(jnp.sum(field, (1, 2, 3))),
                               np.asarray(F[0]), atol=1e-15)
    # interpolation of a uniform velocity returns it exactly
    u = jnp.broadcast_to(jnp.asarray([1e-3, -2e-3, 5e-4])[:, None, None,
                                                          None],
                         (3,) + size)
    us = interpolate_velocity(u, R, size)
    np.testing.assert_allclose(np.asarray(us[0]), [1e-3, -2e-3, 5e-4],
                               atol=1e-15)


def test_subgrid_update_moves_with_flow():
    size = (16, 16, 16)
    R = jnp.asarray([[8.0, 8.0, 8.0]])
    u = jnp.broadcast_to(jnp.asarray([1e-2, 0.0, 0.0])[:, None, None, None],
                         (3,) + size)
    R2, v = subgrid_update(R, jnp.zeros((1, 3)), u, size,
                           ah=[0.1], al=[0.5], eta=0.1)
    np.testing.assert_allclose(np.asarray(v[0]), [1e-2, 0.0, 0.0],
                               atol=1e-14)
    np.testing.assert_allclose(np.asarray(R2[0]), [8.01, 8.0, 8.0],
                               atol=1e-14)
