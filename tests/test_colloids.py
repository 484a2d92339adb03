"""Colloid (BBL) tests: drag, sedimentation, conservation (mirrors the
physics of reference serial-auto-c01 / calibration runs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ludwig_tpu.colloids import (ColloidParams, bbl_step, build_map,
                                 make_colloid_step, site_coords,
                                 total_colloid_momentum)
from ludwig_tpu.lb import LBConfig, initial_rest, hydro_fields


def test_build_map_sphere():
    params = ColloidParams(a0=(2.3,))
    size = (16, 16, 16)
    R = jnp.asarray([[8.0, 8.0, 8.0]])
    pid, inside = build_map(R, params, size)
    vol = float(jnp.sum(inside))
    expect = 4.0 / 3.0 * np.pi * 2.3 ** 3
    assert abs(vol - expect) < 0.25 * expect
    assert int(pid[8, 8, 8]) == 0
    assert int(pid[0, 0, 0]) == -1


def test_map_periodic_wrap():
    params = ColloidParams(a0=(2.3,))
    size = (16, 16, 16)
    R = jnp.asarray([[0.5, 8.0, 8.0]])  # straddles the x boundary
    pid, inside = build_map(R, params, size)
    assert bool(inside[15, 8, 8])
    assert bool(inside[1, 8, 8])


def test_fixed_sphere_stokes_drag():
    """A sphere held fixed (infinite mass limit via zero-velocity reset)
    in a uniformly forced flow develops a drag force opposing the flow.
    (Direction + order of magnitude; the calibration-grade number needs
    longer runs, cf. reference tests/calibration.)"""
    size = (16, 16, 16)
    a = 2.3
    cfg = LBConfig(size=size, nvel=19, eta_shear=0.1, eta_bulk=0.1,
                   dtype="float64", force_global=(1e-5, 0.0, 0.0))
    params = ColloidParams(a0=(a,), rho0=1.0)
    step = make_colloid_step(cfg, params)
    f = initial_rest(cfg)
    R = jnp.asarray([[8.0, 8.0, 8.0]])
    V = jnp.zeros((1, 3))
    W = jnp.zeros((1, 3))
    state = (f, R, V, W, jnp.zeros((1, 3)), jnp.array(R))
    for t in range(120):
        state, (rho, u) = step(state, t)
        # hold the particle: re-zero position/velocity (fixed obstacle);
        # fresh arrays each pass since step donates its inputs
        state = (state[0], jnp.asarray([[8.0, 8.0, 8.0]]),
                 jnp.zeros((1, 3)), jnp.zeros((1, 3)),
                 jnp.zeros((1, 3)), jnp.asarray([[8.0, 8.0, 8.0]]))
    # fluid accelerates; obstacle resists: fluid u_x positive, finite
    f = state[0]
    assert np.isfinite(np.asarray(f)).all()
    _, g = hydro_fields(f, cfg.model)
    assert float(jnp.sum(g[0])) > 0.0


def test_momentum_exchange_fluid_colloid():
    """Total momentum (fluid + colloid) is conserved by BBL when no
    external force acts: a moving particle decelerates, fluid picks up
    its momentum."""
    size = (24, 16, 16)
    a = 2.3
    cfg = LBConfig(size=size, nvel=19, eta_shear=0.1, eta_bulk=0.1,
                   dtype="float64")
    params = ColloidParams(a0=(a,), rho0=1.0)
    step = make_colloid_step(cfg, params)
    f = initial_rest(cfg)
    R = jnp.asarray([[12.0, 8.0, 8.0]])
    V = jnp.asarray([[1e-3, 0.0, 0.0]])
    W = jnp.zeros((1, 3))
    state = (f, R, V, W, jnp.zeros((1, 3)), jnp.array(R))

    v0 = float(V[0, 0])
    for t in range(50):
        state, _ = step(state, t)
    f, R, V, W = state[0], state[1], state[2], state[3]
    v1 = float(V[0, 0])
    # particle decelerates monotonically toward co-motion
    assert 0.0 < v1 < v0
    # momentum went into the fluid
    _, g = hydro_fields(f, cfg.model)
    gx_fluid = float(jnp.sum(jnp.where(
        jnp.logical_not(build_map(R, params, size)[1]), g[0], 0.0)))
    assert gx_fluid > 0.0
    assert np.isfinite(np.asarray(f)).all()


def test_sedimentation_terminal_velocity():
    """A forced sphere reaches a steady velocity ~ F / (6 pi eta a)
    (periodic-image corrections make this loose)."""
    size = (24, 24, 24)
    a = 2.3
    eta = 0.1
    Fz = 1e-4
    cfg = LBConfig(size=size, nvel=19, eta_shear=eta, eta_bulk=eta,
                   dtype="float64")
    params = ColloidParams(a0=(a,), rho0=1.0, gravity=(0.0, 0.0, Fz))
    step = make_colloid_step(cfg, params)
    state = (initial_rest(cfg), jnp.asarray([[12.0, 12.0, 12.0]]),
             jnp.zeros((1, 3)), jnp.zeros((1, 3)),
             jnp.zeros((1, 3)), jnp.asarray([[12.0, 12.0, 12.0]]))
    vs = []
    for t in range(300):
        state, _ = step(state, t)
        if t % 50 == 49 or t == 299:
            vs.append(float(state[2][0, 2]))
    v_stokes = Fz / (6.0 * np.pi * eta * a)
    # converged to a steady positive velocity below the unbounded Stokes
    # value (periodic drag enhancement)
    assert vs[-1] > 0.2 * v_stokes
    assert vs[-1] < 1.2 * v_stokes
    assert abs(vs[-1] - vs[-2]) < 0.05 * vs[-1]


def test_gauss_solve6_ref_bitwise():
    """gauss_solve6_ref must reproduce the reference's in-place
    partial-pivot elimination (bbl.c:750-880) bit for bit, including
    the reciprocal-multiply scaling and last-max pivot choice."""
    import numpy as np
    from ludwig_tpu.colloids import gauss_solve6_ref

    def c_solve(a, xb):
        a = a.copy()
        xb = xb.copy()
        ipivot = [-1] * 6
        iprow = 0
        for k in range(6):
            tmp = 0.0
            for idash in range(6):
                if ipivot[idash] == -1 and abs(a[idash, k]) >= tmp:
                    tmp = abs(a[idash, k])
                    iprow = idash
            ipivot[k] = iprow
            tmp = 1.0 / a[iprow, k]
            for j in range(k, 6):
                a[iprow, j] *= tmp
            xb[iprow] *= tmp
            for idash in range(6):
                if idash not in ipivot[:k + 1]:
                    tmp = a[idash, k]
                    for j in range(k, 6):
                        a[idash, j] -= tmp * a[iprow, j]
                    xb[idash] -= tmp * xb[iprow]
        for idash in range(5, -1, -1):
            iprow = ipivot[idash]
            tmp = xb[iprow]
            for k in range(idash + 1, 6):
                tmp -= a[iprow, k] * xb[ipivot[k]]
            xb[iprow] = tmp
        return xb

    rng = np.random.default_rng(7)
    for trial in range(20):
        z = rng.normal(0.0, 1.0, (6, 6))
        a = z + z.T + np.diag([50.0] * 6)      # mass-dominated like bbl
        b = rng.normal(0.0, 1.0, 6)
        want = c_solve(a, b)
        got = np.asarray(gauss_solve6_ref(jnp.asarray(a), jnp.asarray(b)))
        assert np.array_equal(want, got), (trial, want - got)
