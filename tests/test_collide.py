"""Collision conservation and relaxation tests (mirrors reference
tests/unit/test_model.c / test_collision coverage)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ludwig_tpu.lattice import lb_model
from ludwig_tpu.ops.collide import (CollisionParams, RelaxationScheme,
                                    collide, equilibrium)


def _params(nvel=19, scheme=RelaxationScheme.M10, **kw):
    kw.setdefault("eta_shear", 0.1)
    kw.setdefault("eta_bulk", 0.13)
    return CollisionParams(model=lb_model(nvel), scheme=scheme, **kw)


def _random_f(nvel, shape, seed=0):
    rng = np.random.default_rng(seed)
    model = lb_model(nvel)
    base = model.wv[:, None, None, None]
    return jnp.asarray(base * (1.0 + 0.05 * rng.standard_normal((nvel,) + shape)))


@pytest.mark.parametrize("nvel", [9, 15, 19, 27])
@pytest.mark.parametrize("scheme", list(RelaxationScheme))
def test_conservation(nvel, scheme):
    if scheme is RelaxationScheme.TRT and nvel in (9, 27):
        pytest.skip("TRT defined for d3q15/d3q19 only (as in reference)")
    shape = (4, 3, 5) if nvel != 9 else (4, 5, 1)
    params = _params(nvel, scheme)
    f = _random_f(nvel, shape)
    model = params.model
    cv = jnp.asarray(model.cv[:, :3], f.dtype)

    f2, rho, u = collide(f, params)

    # mass conserved site-by-site
    np.testing.assert_allclose(np.sum(np.asarray(f2), 0),
                               np.sum(np.asarray(f), 0), rtol=0, atol=1e-12)
    # momentum conserved site-by-site (no force)
    g1 = np.einsum("p...,pa->a...", np.asarray(f), np.asarray(cv))
    g2 = np.einsum("p...,pa->a...", np.asarray(f2), np.asarray(cv))
    np.testing.assert_allclose(g2, g1, rtol=0, atol=1e-12)


def test_equilibrium_is_fixed_point():
    """Equilibrium distributions are unchanged by collision (u != 0)."""
    model = lb_model(19)
    shape = (4, 4, 4)
    rho = jnp.full(shape, 1.1)
    u = jnp.stack([jnp.full(shape, 0.01), jnp.full(shape, -0.02),
                   jnp.full(shape, 0.005)])
    f = equilibrium(model, rho, u)
    params = _params(19)
    f2, rho2, u2 = collide(f, params)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f), atol=1e-13)
    np.testing.assert_allclose(np.asarray(rho2), 1.1, atol=1e-13)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u), atol=1e-13)


def test_equilibrium_moments():
    model = lb_model(19)
    rho = jnp.asarray(np.full((2, 2, 2), 0.9))
    u = jnp.asarray(np.stack([np.full((2, 2, 2), 0.03),
                              np.full((2, 2, 2), -0.01),
                              np.full((2, 2, 2), 0.02)]))
    f = np.asarray(equilibrium(model, rho, u))
    cv = model.cv.astype(float)
    np.testing.assert_allclose(f.sum(0), 0.9, atol=1e-14)
    g = np.einsum("p...,pa->a...", f, cv)
    np.testing.assert_allclose(g, np.asarray(rho * u), atol=1e-14)
    # full second moment: rho (u u + cs2 I)
    s = np.einsum("p...,pa,pb->ab...", f, cv, cv)
    un = np.asarray(u)
    expect = 0.9 * (np.einsum("a...,b...->ab...", un, un)
                    + (1.0 / 3.0) * np.eye(3)[..., None, None, None])
    np.testing.assert_allclose(s, expect, atol=1e-14)


def test_body_force_momentum_increment():
    """With force F, total momentum increases by F per site per step and
    the reported u is the force-shifted (j + F/2)/rho."""
    params = _params(19, force_global=(1e-3, 0.0, -2e-3))
    f = _random_f(19, (3, 3, 3), seed=2)
    model = params.model
    cv = jnp.asarray(model.cv[:, :3], f.dtype)
    g1 = np.einsum("p...,pa->a...", np.asarray(f), np.asarray(cv))
    f2, rho, u = collide(f, params)
    g2 = np.einsum("p...,pa->a...", np.asarray(f2), np.asarray(cv))
    F = np.array([1e-3, 0.0, -2e-3])
    np.testing.assert_allclose(g2 - g1, np.broadcast_to(
        F[:, None, None, None], g1.shape), atol=1e-12)
    expect_u = (g1 + 0.5 * F[:, None, None, None]) / np.asarray(rho)
    np.testing.assert_allclose(np.asarray(u), expect_u, atol=1e-12)


def test_m10_projects_ghosts():
    """M10: post-collision ghost modes are exactly zero."""
    params = _params(19, scheme=RelaxationScheme.M10)
    f = _random_f(19, (2, 2, 2), seed=3)
    f2, _, _ = collide(f, params)
    model = params.model
    m2 = np.einsum("mp,p...->m...", model.ma, np.asarray(f2))
    np.testing.assert_allclose(m2[model.nhydro:], 0.0, atol=1e-13)


def test_solid_sites_untouched():
    params = _params(19)
    f = _random_f(19, (4, 4, 4), seed=4)
    mask = np.ones((4, 4, 4), bool)
    mask[1, 2, 3] = False  # one solid site
    f2, _, _ = collide(f, params, fluid_mask=jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(f2)[:, 1, 2, 3],
                                  np.asarray(f)[:, 1, 2, 3])
