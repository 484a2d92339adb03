"""Tests for Brazovskii, surfactant, ternary and polar-active free
energies and their dynamics."""

import jax.numpy as jnp
import numpy as np
import pytest

from ludwig_tpu.binary import (BinaryConfig, fe_fields, initial_binary,
                               make_binary_nstep)
from ludwig_tpu.fe.brazovskii import BrazovskiiFE
from ludwig_tpu.fe.polar_active import PolarActiveFE
from ludwig_tpu.fe.surfactant import SurfactantFE
from ludwig_tpu.fe.ternary import TernaryFE
from ludwig_tpu.lb import LBConfig
from ludwig_tpu.ops.force import stress_divergence_force
from ludwig_tpu.two_field import (TwoFieldConfig, initial_two_field,
                                  make_two_field_nstep, two_fields)

# parameters from reference regression inputs
BRAZ = BrazovskiiFE(a=-5e-4, b=5e-4, kappa=-6e-4, c=7.6e-4)
SURF = SurfactantFE(a=-0.0208333, b=0.0208333, kappa=0.12,
                    kt=0.00056587, epsilon=0.03, beta=0.0, w=0.0)
TERN = TernaryFE(alpha=1.0, kappa1=0.01, kappa2=0.02, kappa3=0.05)


def _lb(size, **kw):
    return LBConfig(size=size, nvel=19, eta_shear=0.1, eta_bulk=0.1,
                    dtype="float64", **kw)


def test_brazovskii_mu_plane_wave():
    """For phi = eps sin(kx), the discrete mu is exactly
    (a + kappa kd^2 + c kd^4) phi + O(eps^3), with kd^2 = 4 sin^2(k/2)
    the 7-pt Laplacian eigenvalue.  (An exact discrete identity - the
    reference's mu uses the same compact stencils.)"""
    L = 16
    k = 2 * np.pi / L
    epsv = 1e-4
    x = np.arange(L)
    phi_np = epsv * np.sin(k * x)[:, None, None] * np.ones((L, 4, 4))
    fields = fe_fields(jnp.asarray(phi_np), "3d_7pt_fluid",
                       fourth_order=True)
    mu = np.asarray(BRAZ.mu(fields))
    kd2 = 4.0 * np.sin(k / 2.0) ** 2
    expect = (BRAZ.a + BRAZ.kappa * kd2 + BRAZ.c * kd2 * kd2) * phi_np
    np.testing.assert_allclose(mu, expect, atol=1e-15 + 2 * epsv ** 3)


def test_brazovskii_dynamics_stable_and_conserves():
    cfg = BinaryConfig(lb=_lb((16, 16, 16)), fe=BRAZ, mobility=0.05,
                       advection_order=2)
    rng = np.random.default_rng(3)
    phi0 = 1e-2 * rng.standard_normal((16, 16, 16))
    state = initial_binary(cfg, phi0)
    tot0 = float(jnp.sum(state[1]))
    state = make_binary_nstep(cfg)(state, 100)
    assert abs(float(jnp.sum(state[1])) - tot0) < 1e-10
    assert np.isfinite(np.asarray(state[1])).all()


def _smooth_pair(L=24, amp_phi=0.3, psi0=0.3, amp_psi=0.05):
    """Long-wavelength smooth (phi, psi) fields on an L^3-ish box."""
    x = np.arange(L)
    k = 2 * np.pi / L
    ky = 2 * np.pi / 8
    base = (np.sin(k * x)[:, None, None]
            * np.cos(ky * np.arange(8))[None, :, None]
            * np.ones((1, 1, 4)))
    phi = amp_phi * base
    psi = psi0 + amp_psi * np.roll(base, 3, 0)
    return phi.copy(), psi.copy()


def _check_mu_functional(fe, atol_rel=0.03):
    """mu ~ dF/dphi for smooth fields (the discrete formulas match the
    functional derivative only to O(h^2) - the compact-vs-wide Laplacian
    mismatch the reference shares)."""
    phi_np, psi_np = _smooth_pair()
    fields = two_fields(jnp.asarray(phi_np), jnp.asarray(psi_np),
                        "3d_7pt_fluid")
    mu_phi, mu_psi = fe.mu(fields)

    def total_fed(p, q):
        f = two_fields(jnp.asarray(p), jnp.asarray(q), "3d_7pt_fluid")
        return float(jnp.sum(fe.fed(f)))

    eps_ = 1e-6
    site = (3, 2, 1)
    scale = max(float(jnp.abs(mu_phi).max()), 1e-8)
    p1, p2 = phi_np.copy(), phi_np.copy()
    p1[site] += eps_
    p2[site] -= eps_
    dmu = (total_fed(p1, psi_np) - total_fed(p2, psi_np)) / (2 * eps_)
    assert abs(dmu - float(mu_phi[site])) < atol_rel * scale, \
        ("phi", dmu, float(mu_phi[site]))

    scale = max(float(jnp.abs(mu_psi).max()), 1e-8)
    q1, q2 = psi_np.copy(), psi_np.copy()
    q1[site] += eps_
    q2[site] -= eps_
    dmu = (total_fed(phi_np, q1) - total_fed(phi_np, q2)) / (2 * eps_)
    assert abs(dmu - float(mu_psi[site])) < atol_rel * scale, \
        ("psi", dmu, float(mu_psi[site]))


def test_surfactant_mu_functional_derivative():
    _check_mu_functional(SURF)


def test_ternary_mu_functional_derivative():
    _check_mu_functional(TERN)


def test_two_field_run_conserves():
    """Surfactant fluid: both order parameters conserved, stable."""
    cfg = TwoFieldConfig(lb=_lb((12, 12, 12)), fe=SURF,
                         mobilities=(0.15, 0.05), advection_order=2)
    L = 12
    x = np.arange(L) + 0.5
    phi0 = np.tanh((x[:, None, None] - L / 2) / SURF.xi0) * np.ones((L, L, L))
    psi0 = np.full((L, L, L), 0.01)
    state = initial_two_field(cfg, phi0, psi0)
    tphi = float(jnp.sum(state[1]))
    tpsi = float(jnp.sum(state[2]))
    state = make_two_field_nstep(cfg)(state, 50)
    assert abs(float(jnp.sum(state[1])) - tphi) < 1e-9
    assert abs(float(jnp.sum(state[2])) - tpsi) < 1e-9
    assert np.isfinite(np.asarray(state[2])).all()
    # psi stays in (0, 1)
    assert float(state[2].min()) > 0.0 and float(state[2].max()) < 1.0


def test_ternary_stress_divergence_conservative():
    rng = np.random.default_rng(5)
    phi = jnp.asarray(0.2 * rng.standard_normal((10, 10, 10)))
    psi = jnp.asarray(0.2 + 0.05 * rng.random((10, 10, 10)))
    fields = two_fields(phi, psi, "3d_7pt_fluid")
    force = np.asarray(stress_divergence_force(TERN.stress(fields)))
    np.testing.assert_allclose(force.sum(axis=(1, 2, 3)), 0.0, atol=1e-12)


def test_polar_active_mol_field_and_stress():
    from ludwig_tpu.ops.stencil import gradient_ops
    fe = PolarActiveFE(a=-0.1, b=0.1, kappa1=0.01, lambda_=0.1, zeta=0.001)
    rng = np.random.default_rng(4)
    p = jnp.asarray(0.5 * rng.standard_normal((3, 8, 8, 8)))
    grad, delsq = gradient_ops("3d_7pt_fluid")
    fields = {"p": p, "grad_p": grad(p), "delsq_p": delsq(p)}
    h = fe.molecular_field(fields)
    s = fe.stress(fields, h=h)
    assert np.isfinite(np.asarray(s)).all()
    # momentum conservation of the coupled force
    force = np.asarray(stress_divergence_force(s))
    np.testing.assert_allclose(force.sum(axis=(1, 2, 3)), 0.0, atol=1e-12)


def test_leslie_ericksen_relaxes_to_unit_p():
    """|P| relaxes toward the minimum |P| = sqrt(-a/b) without flow."""
    from ludwig_tpu.dynamics.leslie_ericksen import (LeslieEricksenParams,
                                                     leslie_ericksen_update)
    from ludwig_tpu.ops.stencil import gradient_ops
    fe = PolarActiveFE(a=-0.1, b=0.1, kappa1=0.01)
    grad, delsq = gradient_ops("3d_7pt_fluid")
    params = LeslieEricksenParams(gamma=0.3)
    rng = np.random.default_rng(6)
    p = jnp.asarray(0.3 * rng.standard_normal((3, 8, 8, 8)) +
                    np.array([0.5, 0, 0])[:, None, None, None])
    for _ in range(300):
        fields = {"p": p, "grad_p": grad(p), "delsq_p": delsq(p)}
        h = fe.molecular_field(fields)
        p = leslie_ericksen_update(p, h, None, params)
    mag = np.sqrt(np.asarray(p[0] ** 2 + p[1] ** 2 + p[2] ** 2))
    np.testing.assert_allclose(mag, 1.0, atol=5e-2)
