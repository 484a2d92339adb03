"""Sheared binary fluid (Lees-Edwards + Cahn-Hilliard) tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ludwig_tpu.binary import BinaryConfig, initial_binary, spinodal_phi
from ludwig_tpu.binary_le import (BinaryLEConfig,
                                  make_binary_le_nstep, make_binary_le_step)
from ludwig_tpu.fe.symmetric import SymmetricFE
from ludwig_tpu.lb import LBConfig, hydro_fields
from ludwig_tpu.ops.lees_edwards import (LeesEdwardsConfig, le_steady_profile,
                                          le_xneighbor)

FE = SymmetricFE(a=-6.25e-3, b=6.25e-3, kappa=4.0e-3)


def test_le_xneighbor_interpolation():
    """Cross-plane neighbour equals the y-displaced column."""
    NX, NY, NZ = 16, 8, 4
    le = LeesEdwardsConfig(nplanes=1, uy=0.5, nx=NX)  # plane below col 8
    rng = np.random.default_rng(0)
    phi = jnp.asarray(rng.random((NX, NY, NZ)))
    t = 3.0                      # dy = 1.5 -> jdy 1, fr 0.5
    out = np.asarray(le_xneighbor(phi, le, t, +1))
    col = le.plane_cols[0]
    expect = 0.5 * (np.roll(np.asarray(phi)[col + 1], -1, axis=0)
                    + np.roll(np.asarray(phi)[col + 1], -2, axis=0))
    np.testing.assert_allclose(out[col], expect, atol=1e-14)
    # non-plane columns are the plain roll
    np.testing.assert_allclose(out[2], np.asarray(phi)[3], atol=1e-15)
    # integer displacement is exact
    out2 = np.asarray(le_xneighbor(phi, le, 2.0, +1))  # dy = 1
    np.testing.assert_allclose(out2[col],
                               np.roll(np.asarray(phi)[col + 1], -1, 0),
                               atol=1e-15)


def test_sheared_binary_conserves_and_runs():
    size = (16, 16, 8)
    lb = LBConfig(size=size, nvel=19, eta_shear=0.05, eta_bulk=0.05,
                  dtype="float64")
    bcfg = BinaryConfig(lb=lb, fe=FE, mobility=0.5, advection_order=2)
    le = LeesEdwardsConfig(nplanes=2, uy=0.005, nx=size[0])
    cfg = BinaryLEConfig(binary=bcfg, le=le)

    state = initial_binary(bcfg, spinodal_phi(size, seed=21))
    tot0 = float(jnp.sum(state[1]))
    nstep = make_binary_le_nstep(cfg)
    state = nstep(state, 400)
    f, phi, u = state

    # phi conserved through the sliding planes (interpolation is a
    # convex partition of unity)
    assert abs(float(jnp.sum(phi)) - tot0) < 1e-9
    np.testing.assert_allclose(float(jnp.sum(f)), float(np.prod(size)),
                               rtol=1e-12)
    assert np.isfinite(np.asarray(phi)).all()

    # the shear profile develops underneath the binary dynamics
    uyx = np.asarray(u[1]).mean(axis=(1, 2))
    expect = le_steady_profile(le, np.arange(size[0]))
    corr = np.corrcoef(uyx - uyx.mean(), expect)[0, 1]
    assert corr > 0.9, corr


def test_le_27pt_d4_reduces_to_plain_at_zero_shift():
    """With zero plane velocity the LE level-4 27pt gradients equal two
    plain periodic passes of the 27pt operator (buffer columns become
    the real neighbouring columns)."""
    from ludwig_tpu.ops.le_ref import le_fields_27pt_d4
    from ludwig_tpu.ops.stencil import delsq_27pt, grad_27pt

    NX, NY, NZ = 16, 8, 4
    le = LeesEdwardsConfig(nplanes=2, uy=0.0, nx=NX)
    rng = np.random.default_rng(1)
    phi = jnp.asarray(rng.random((NX, NY, NZ)))
    grad, d2, gd2, d4, bufs = le_fields_27pt_d4(phi, le, 5.0)

    g_ref, d2_ref = grad_27pt(phi), delsq_27pt(phi)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(g_ref),
                               rtol=0, atol=1e-14)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d2_ref),
                               rtol=0, atol=1e-14)
    np.testing.assert_allclose(np.asarray(gd2), np.asarray(grad_27pt(d2_ref)),
                               rtol=0, atol=1e-13)
    np.testing.assert_allclose(np.asarray(d4), np.asarray(delsq_27pt(d2_ref)),
                               rtol=0, atol=1e-13)
    # buffer columns coincide with the real columns across the plane
    for c, b in bufs.items():
        cu = (c + 1) % NX
        pb1, g_b1, d2_b1, g4_b1, d4_b1 = b["b1"]
        np.testing.assert_allclose(np.asarray(pb1),
                                   np.asarray(phi)[cu], atol=1e-15)
        np.testing.assert_allclose(np.asarray(d2_b1),
                                   np.asarray(d2_ref)[cu], atol=1e-14)
        np.testing.assert_allclose(np.asarray(d4_b1),
                                   np.asarray(delsq_27pt(d2_ref))[cu],
                                   atol=1e-13)
        pd0, g_d0, d2_d0, g4_d0, d4_d0 = b["d0"]
        np.testing.assert_allclose(np.asarray(pd0),
                                   np.asarray(phi)[c], atol=1e-15)
        np.testing.assert_allclose(np.asarray(d2_d0),
                                   np.asarray(d2_ref)[c], atol=1e-14)
