"""Open boundary (inflow/outflow) tests."""

import jax.numpy as jnp
import numpy as np

from ludwig_tpu.lb import LBConfig, initial_rest, make_nstep, make_step, hydro_fields
from ludwig_tpu.ops.open_bc import OpenBCConfig


def test_inflow_drives_plug_flow():
    """Prescribed inflow velocity produces a steady plug flow through a
    periodic-in-yz channel; outflow holds rho ~ rho0."""
    NX = 16
    u0 = 0.01
    cfg = LBConfig(size=(NX, 8, 8), nvel=19, eta_shear=0.1, eta_bulk=0.1,
                   dtype="float64")
    bc = OpenBCConfig(u0=(u0, 0.0, 0.0), rho0=1.0)
    f = initial_rest(cfg)
    nstep = make_nstep(cfg, open_bc=bc)
    f = nstep(f, 5000)
    f, rho, u = make_step(cfg, open_bc=bc)(f, 5000)

    ux = np.asarray(u[0, :, 4, 4])
    # plug flow at the inflow velocity through the interior
    np.testing.assert_allclose(ux[2:-2], u0, rtol=5e-2)
    # density stays near rho0 everywhere
    rr = np.asarray(rho)
    assert abs(rr.mean() - 1.0) < 5e-3
    assert np.isfinite(np.asarray(f)).all()


def test_outflow_mass_does_not_accumulate():
    NX = 24
    cfg = LBConfig(size=(NX, 8, 8), nvel=19, eta_shear=0.1, eta_bulk=0.1,
                   dtype="float64")
    bc = OpenBCConfig(u0=(0.005, 0.0, 0.0), rho0=1.0)
    f = initial_rest(cfg)
    nstep = make_nstep(cfg, open_bc=bc)
    f = nstep(f, 500)
    m1 = float(jnp.sum(f))
    f = nstep(f, 500)
    m2 = float(jnp.sum(f))
    # steady throughput: total mass stable (inflow = outflow)
    assert abs(m2 - m1) < 1e-3 * m1
