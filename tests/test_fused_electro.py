"""Fused electrokinetics kernels vs the jnp reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ludwig_tpu.electro import ElectroConfig, rho_elec
from ludwig_tpu.electro_sim import (ElectroSimConfig, gradmu_force,
                                    make_psi_neighbours, np_step,
                                    poisson_sor_ref)
from ludwig_tpu.lb import LBConfig
from ludwig_tpu.ops.fused_electro import (np_gradmu_fused,
                                          sor_solve_fused, sor_supported)


def _setup(L=16, dtype=jnp.float32):
    size = (L, L, 128)
    lb = LBConfig(size=size, nvel=19, eta_shear=0.1,
                  dtype="float32" if dtype == jnp.float32 else "float64")
    ek = ElectroConfig(valency=(1, -1), diffusivity=(0.01, 0.0095),
                       beta=3.0e-4, epsilon=3.3e3, rel_tol=1e-6,
                       abs_tol=1e-7, max_its=500, solver="sor")
    cfg = ElectroSimConfig(lb=lb, ek=ek)
    rng = np.random.default_rng(5)
    rho = jnp.asarray(1e-3 + 1e-4 * rng.random((2,) + size), dtype)
    psi = jnp.asarray(1e-3 * rng.standard_normal(size), dtype)
    u = jnp.asarray(1e-3 * rng.standard_normal((3,) + size), dtype)
    solid = np.zeros(size, bool)
    solid[0] = solid[-1] = True
    fluid = jnp.asarray(~solid)
    return cfg, psi, rho, u, fluid


def test_sor_fused_matches_jnp_f64():
    """In f64 (no stall guard) the kernel's convergence decision is
    deterministic and matches poisson_sor_ref exactly."""
    cfg, psi, rho, _, _ = _setup(dtype=jnp.float64)
    ek = cfg.ek
    psi = psi.astype(jnp.float64)
    rho = rho.astype(jnp.float64)
    psi_up, psi_dn = make_psi_neighbours(psi.shape, cfg.e0, psi.dtype)
    rel = rho_elec(rho, ek)
    ref, n_ref, rn_ref, wh_ref = poisson_sor_ref(
        psi, rel, ek, psi_up, psi_dn, return_iters=True)
    nsite = float(np.prod(psi.shape))
    ref = ref - jnp.sum(ref) / nsite
    got, n, rn, wh = sor_solve_fused(psi, rel, ek, interpret=True)
    assert int(n) == int(n_ref)
    assert int(wh) == int(wh_ref)
    np.testing.assert_allclose(float(rn), float(rn_ref), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-12)


def test_sor_fused_matches_jnp_f32():
    """In f32 both paths converge via the stall guard at the same
    residual floor; the stopping iteration may jitter by a few checks
    but the solutions agree to the floor."""
    cfg, psi, rho, _, _ = _setup()
    ek = cfg.ek
    psi_up, psi_dn = make_psi_neighbours(psi.shape, cfg.e0, psi.dtype)
    rel = rho_elec(rho, ek)
    ref, n_ref, rn_ref, wh_ref = poisson_sor_ref(
        psi, rel, ek, psi_up, psi_dn, return_iters=True)
    nsite = float(np.prod(psi.shape))
    ref = ref - jnp.sum(ref) / nsite
    got, n, rn, wh = sor_solve_fused(psi, rel, ek, interpret=True)
    assert abs(int(n) - int(n_ref)) <= 15
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=2e-5)


def test_sor_supported_gates():
    assert sor_supported((64, 64, 128))
    assert not sor_supported((64, 64, 100))       # lane misaligned
    assert not sor_supported((512, 512, 512))     # exceeds VMEM
    assert not sor_supported((64, 64, 128), e0=(0.1, 0, 0))


@pytest.mark.parametrize("hydro", [True, False])
def test_np_gradmu_fused_matches_jnp(hydro):
    cfg, psi, rho, u, fluid = _setup()
    ek = cfg.ek
    psi_up, psi_dn = make_psi_neighbours(psi.shape, cfg.e0, psi.dtype)
    nsite = float(np.prod(psi.shape))
    f_ref = gradmu_force(psi, rho, cfg, psi_up, psi_dn, nsite)
    r_ref = np_step(rho, psi, u if hydro else None, fluid, cfg,
                    psi_up, psi_dn, 0.5)
    rho2, force, fsum = np_gradmu_fused(
        psi, rho, u if hydro else None, fluid, cfg, 0.5,
        interpret=True)
    f_got = force - (fsum / nsite)[:, None, None, None]
    np.testing.assert_allclose(np.asarray(f_got), np.asarray(f_ref),
                               rtol=0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(rho2), np.asarray(r_ref),
                               rtol=0, atol=1e-8)


def test_fused_force_step_solid_matches_jnp():
    """fused_force_step(solid=mask) == collide(fluid_mask) +
    stream_bounce_back on an in-lattice plate geometry (the
    Gouy-Chapman LB sub-step)."""
    from ludwig_tpu.lb import LBConfig
    from ludwig_tpu.ops.collide import collide
    from ludwig_tpu.ops.fused import (FusedPlan, fused_force_step,
                                      pad_state, unpad_state)
    from ludwig_tpu.ops.stream import stream_bounce_back

    size = (16, 16, 32)
    cfg = LBConfig(size=size, nvel=19, eta_shear=0.1, dtype="float64")
    model, params = cfg.model, cfg.collision_params()
    rng = np.random.default_rng(23)
    f0 = jnp.asarray(0.05 + 0.01 * rng.random((19,) + size), jnp.float64)
    force = jnp.asarray(1e-4 * rng.standard_normal((3,) + size),
                        jnp.float64)
    solid = np.zeros(size, bool)
    solid[0] = solid[-1] = True
    solid[7, 3:6, 10:20] = True          # an interior obstacle too
    solid_j = jnp.asarray(solid)
    fluid = jnp.logical_not(solid_j)

    from ludwig_tpu.ops.stream import wall_momentum_transfer
    f_post, _rho, u_ref = collide(f0, params, force=force,
                                  fluid_mask=fluid)
    gw_ref = wall_momentum_transfer(f_post, model, solid_j)
    f_ref = stream_bounce_back(f_post, model, solid=solid_j)

    fpad, u, gw = fused_force_step(pad_state(f0, zpad=False), force,
                                   model, params, FusedPlan(4, 8),
                                   interpret=True, solid=solid_j)
    got = np.asarray(unpad_state(fpad, z=size[2]))
    np.testing.assert_allclose(got, np.asarray(f_ref), rtol=0,
                               atol=1e-13)
    fl3 = np.asarray(fluid)[None]
    np.testing.assert_allclose(np.asarray(u) * fl3,
                               np.asarray(u_ref) * fl3,
                               rtol=0, atol=1e-13)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               rtol=0, atol=1e-11)
