"""Fused Pallas collide+stream kernel vs the reference jnp path.

Runs in Pallas interpret mode on CPU; the physics contract is exact
agreement (same dtype, same unrolled arithmetic) with collide() followed
by stream()."""

import jax.numpy as jnp
import numpy as np
import pytest

from ludwig_tpu.lattice import lb_model
from ludwig_tpu.ops.collide import CollisionParams, RelaxationScheme, collide
from ludwig_tpu.ops.fused import (FusedPlan, fused_step, make_fused_nstep,
                                  pad_state, unpad_state)
from ludwig_tpu.ops.stream import stream


def _rand_f(model, shape, seed=0):
    rng = np.random.default_rng(seed)
    base = model.wv.reshape(-1, 1, 1, 1)
    return jnp.asarray(
        base * (1.0 + 0.05 * rng.standard_normal((model.nvel,) + shape)),
        jnp.float32)


def _ref_step(f, params):
    f_post, _, _ = collide(f, params)
    return stream(f_post, params.model)


@pytest.mark.parametrize("nvel", [19, 15, 27])
@pytest.mark.parametrize("scheme", [RelaxationScheme.M10,
                                    RelaxationScheme.BGK])
def test_fused_matches_reference(nvel, scheme):
    model = lb_model(nvel)
    params = CollisionParams(model=model, eta_shear=0.1, eta_bulk=0.14,
                             scheme=scheme,
                             force_global=(1e-4, -2e-4, 5e-5))
    shape = (8, 16, 16)
    f = _rand_f(model, shape, seed=nvel)
    expect = np.asarray(_ref_step(f, params))

    plan = FusedPlan(BX=4, BY=8)  # multiple blocks in both axes
    out = unpad_state(fused_step(pad_state(f), model, params, plan,
                                 interpret=True, z=shape[2]),
                      z=shape[2])
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-6,
                               atol=1e-8)


def test_fused_multi_step_chains():
    """Pads are correctly refreshed so steps chain."""
    model = lb_model(19)
    params = CollisionParams(model=model, eta_shear=0.05, eta_bulk=0.05)
    shape = (8, 16, 16)
    f = _rand_f(model, shape, seed=7)
    expect = f
    for _ in range(3):
        expect = _ref_step(expect, params)

    fp = pad_state(f)
    plan = FusedPlan(BX=4, BY=8)
    for _ in range(3):
        fp = fused_step(fp, model, params, plan, interpret=True,
                        z=shape[2])
    np.testing.assert_allclose(np.asarray(unpad_state(fp, z=shape[2])),
                               np.asarray(expect), rtol=1e-6, atol=1e-8)


def test_fused_nstep_scan():
    model = lb_model(19)
    params = CollisionParams(model=model, eta_shear=0.08, eta_bulk=0.08)
    shape = (8, 16, 16)
    f = _rand_f(model, shape, seed=3)
    expect = f
    for _ in range(2):
        expect = _ref_step(expect, params)
    nstep = make_fused_nstep(model, params, FusedPlan(BX=8, BY=16),
                             z=shape[2],
                             interpret=True)
    fp = nstep(pad_state(f), 2)
    np.testing.assert_allclose(np.asarray(unpad_state(fp, z=shape[2])),
                               np.asarray(expect), rtol=1e-6, atol=1e-8)


def test_pad_roundtrip():
    model = lb_model(19)
    f = _rand_f(model, (4, 8, 8))
    np.testing.assert_array_equal(
        np.asarray(unpad_state(pad_state(f), z=8)), np.asarray(f))


def test_fused_lc_step_matches_jnp_path():
    """The two-kernel fused LC step (ops/fused_lc.py) reproduces the
    jnp blue-phase step (lc.make_lc_step) on a small lattice."""
    from ludwig_tpu.fe import lc_init
    from ludwig_tpu.fe.blue_phase import BluePhaseFE
    from ludwig_tpu.lb import LBConfig
    from ludwig_tpu.lc import LCConfig, initial_lc, make_lc_step
    from ludwig_tpu.ops.fused import FusedPlan, unpad_state as unpad_f
    from ludwig_tpu.ops.fused_lc import (LCPlan, initial_fused_lc,
                                         make_fused_lc_step, unpad_q)

    N = (8, 8, 16)
    cfg = LBConfig(size=N, nvel=19, eta_shear=0.1, dtype="float64")
    fe = BluePhaseFE(a0=0.01, gamma=3.0, q0=0.19635, kappa0=0.000648456,
                     kappa1=0.000648456, xi=0.7)
    lcfg = LCConfig(lb=cfg, fe=fe, gamma=0.5, keep_grads=False)
    q5 = lc_init.lc_init_o8m(N, fe.q0, -0.2)

    sx = initial_lc(lcfg, q5)
    stepx = make_lc_step(lcfg)
    for t in range(2):
        sx, _ = stepx(sx, t)

    sf = initial_fused_lc(lcfg, q5)
    stepf = make_fused_lc_step(lcfg, plan=LCPlan(4, 8),
                               lb_plan=FusedPlan(4, 8), interpret=True)
    for t in range(2):
        sf = stepf(sf, t)

    np.testing.assert_allclose(np.asarray(unpad_q(sf[1])),
                               np.asarray(sx[1]), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(unpad_f(sf[0])),
                               np.asarray(sx[0]), rtol=1e-10, atol=1e-12)


def test_fused_sharded_matches_single():
    """shard_map'd fused kernel over a 4x2 ('x','y') CPU mesh ==
    single-device fused result (pads via ppermute face exchange)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from ludwig_tpu.lb import LBConfig, initial_rest
    from ludwig_tpu.ops.fused import make_fused_sharded_nstep

    cfg = LBConfig(size=(16, 16, 32), nvel=19, eta_shear=0.1,
                   force_global=(1e-5, 0.0, -2e-5))
    model, params = cfg.model, cfg.collision_params()
    rng = np.random.default_rng(3)
    f = initial_rest(cfg) + 1e-3 * jnp.asarray(
        rng.standard_normal((19, 16, 16, 32)))

    plan = FusedPlan(BX=4, BY=8)
    nstep = make_fused_nstep(model, params, plan, interpret=True, z=32)
    ref = unpad_state(nstep(pad_state(f), 3), z=32)

    devs = np.array(jax.devices("cpu")[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("x", "y"))
    fs = jax.device_put(f, NamedSharding(mesh, P(None, "x", "y", None)))
    sh = make_fused_sharded_nstep(model, params, mesh, plan,
                                  interpret=True)(fs, 3)
    np.testing.assert_allclose(np.asarray(sh), np.asarray(ref),
                               rtol=0, atol=1e-13)


def test_fused_binary_step_matches_jnp_path():
    """The two-kernel fused binary step (ops/fused_binary.py)
    reproduces the jnp symmetric+CH step (binary.make_binary_step)."""
    from ludwig_tpu.binary import (BinaryConfig, initial_binary,
                                   make_binary_step, spinodal_phi)
    from ludwig_tpu.fe.symmetric import SymmetricFE
    from ludwig_tpu.lb import LBConfig
    from ludwig_tpu.ops.fused import FusedPlan, unpad_state as unpad_f
    from ludwig_tpu.ops.fused_binary import (BinaryPlan,
                                             initial_fused_binary,
                                             make_fused_binary_step,
                                             unpad_phi)

    N = (8, 8, 16)
    for order in (1, 2):
        cfg = LBConfig(size=N, nvel=19, eta_shear=6.25e-3,
                       dtype="float64")
        bcfg = BinaryConfig(lb=cfg,
                            fe=SymmetricFE(-6.25e-3, 6.25e-3, 4e-3),
                            mobility=0.45, advection_order=order)
        phi0 = spinodal_phi(N, seed=11)

        sx = initial_binary(bcfg, phi0)
        stepx = make_binary_step(bcfg)
        for t in range(3):
            sx, _ = stepx(sx, t)

        sf = initial_fused_binary(bcfg, phi0)
        stepf = make_fused_binary_step(bcfg, plan=BinaryPlan(4, 8),
                                       lb_plan=FusedPlan(4, 8),
                                       interpret=True)
        for t in range(3):
            sf = stepf(sf, t)

        np.testing.assert_allclose(np.asarray(unpad_phi(sf[1])),
                                   np.asarray(sx[1]),
                                   rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(np.asarray(unpad_f(sf[0])),
                                   np.asarray(sx[0]),
                                   rtol=1e-10, atol=1e-12)


def test_fused_droplet_step_matches_jnp_path():
    """The two-kernel fused LC-droplet step (ops/fused_droplet.py)
    reproduces the jnp coupled phi+Q step (lc_droplet_sim)."""
    from ludwig_tpu.fe.blue_phase import BluePhaseFE
    from ludwig_tpu.fe.lc_droplet import LCDropletFE
    from ludwig_tpu.fe.symmetric import SymmetricFE
    from ludwig_tpu.lb import LBConfig, initial_rest
    from ludwig_tpu.lc_droplet_sim import (LCDropletConfig,
                                           make_droplet_step)
    from ludwig_tpu.ops.fused import FusedPlan, unpad_state as unpad_f
    from ludwig_tpu.ops.fused_binary import unpad_phi
    from ludwig_tpu.ops.fused_droplet import (DropletPlan,
                                              initial_fused_droplet,
                                              make_fused_droplet_step)
    from ludwig_tpu.ops.fused_lc import unpad_q

    N = (8, 8, 16)
    cfg = LBConfig(size=N, nvel=19, eta_shear=0.5, dtype="float64")
    lc = BluePhaseFE(a0=0.1, gamma=2.586, q0=0.0, kappa0=0.01,
                     kappa1=0.01, xi=0.7)
    fe = LCDropletFE(symm=SymmetricFE(-0.0625, 0.0625, 0.053), lc=lc,
                     gamma0=2.586, delta=0.25, w=0.02)
    dcfg = LCDropletConfig(lb=cfg, fe=fe, mobility=0.05, gamma=0.5,
                           advection_order=1)
    rng = np.random.default_rng(11)
    phi0 = 0.05 * (rng.random(N) - 0.5)
    amp = 0.2
    nx = rng.normal(size=(3,) + N)
    nx /= np.linalg.norm(nx, axis=0, keepdims=True)
    q0 = np.stack([amp * (nx[0]*nx[0] - 1/3), amp*nx[0]*nx[1],
                   amp*nx[0]*nx[2], amp*(nx[1]*nx[1] - 1/3),
                   amp*nx[1]*nx[2]])

    sx = (initial_rest(cfg), jnp.asarray(phi0), jnp.asarray(q0),
          jnp.zeros((3,) + N))
    stepx = make_droplet_step(dcfg)
    for t in range(3):
        sx, _ = stepx(sx, t)

    sf = initial_fused_droplet(dcfg, phi0, q0)
    stepf = make_fused_droplet_step(dcfg, plan=DropletPlan(4, 8),
                                    lb_plan=FusedPlan(4, 8),
                                    interpret=True)
    for t in range(3):
        sf = stepf(sf, t)

    np.testing.assert_allclose(np.asarray(unpad_phi(sf[1])),
                               np.asarray(sx[1]), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(unpad_q(sf[2])),
                               np.asarray(sx[2]), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(unpad_f(sf[0])),
                               np.asarray(sx[0]), rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("delta", [False, True])
def test_fused2_matches_two_single_steps(delta):
    """The temporally-blocked kernel is bitwise two fused steps, in
    both the absolute (bench) and increment (production) forms."""
    import jax.numpy as jnp
    import numpy as np
    from ludwig_tpu.lb import LBConfig
    from ludwig_tpu.ops.fused import (FusedPlan, fused2_step, fused_step,
                                      pad_state, pad_state2, unpad_state,
                                      unpad_state2)

    cfg = LBConfig(size=(16, 16, 32), nvel=19, eta_shear=0.1,
                   dtype="float64")
    model, params = cfg.model, cfg.collision_params()
    rng = np.random.default_rng(7)
    f0 = jnp.asarray(
        0.05 + 0.01 * rng.random((19, 16, 16, 32)), jnp.float64)

    plan = FusedPlan(BX=4, BY=8)
    fa = pad_state(f0)
    for _ in range(2):
        fa = fused_step(fa, model, params, plan, interpret=True, z=32,
                        delta=delta)
    ref2 = np.asarray(unpad_state(fa, z=32))

    fb = fused2_step(pad_state2(f0), model, params, plan, interpret=True,
                     delta=delta)
    out2 = np.asarray(unpad_state2(fb))
    np.testing.assert_array_equal(out2, ref2)

    # and again (pads refreshed correctly between 2-step passes)
    for _ in range(2):
        fa = fused_step(fa, model, params, plan, interpret=True, z=32,
                        delta=delta)
    fb = fused2_step(fb, model, params, plan, interpret=True, delta=delta)
    np.testing.assert_array_equal(np.asarray(unpad_state2(fb)),
                                  np.asarray(unpad_state(fa, z=32)))


@pytest.mark.parametrize("nsteps,delta",
                         [(2, False), (3, False), (4, False), (3, True)])
def test_fusedn_matches_n_single_steps(nsteps, delta):
    """The generic n-step temporally-blocked kernel is bitwise n fused
    steps (and for n=2, bitwise the dedicated fused2 kernel by the same
    transitivity), with matching arithmetic form on both sides."""
    from ludwig_tpu.lb import LBConfig
    from ludwig_tpu.ops.fused import (FusedPlan, fused_step, fusedn_step,
                                      pad_state, pad_staten, unpad_state,
                                      unpad_staten)

    cfg = LBConfig(size=(16, 16, 32), nvel=19, eta_shear=0.1,
                   dtype="float64")
    model, params = cfg.model, cfg.collision_params()
    rng = np.random.default_rng(11)
    f0 = jnp.asarray(
        0.05 + 0.01 * rng.random((19, 16, 16, 32)), jnp.float64)

    plan = FusedPlan(BX=4, BY=8)
    fa = pad_state(f0)
    for _ in range(nsteps):
        fa = fused_step(fa, model, params, plan, interpret=True, z=32,
                        delta=delta)
    ref = np.asarray(unpad_state(fa, z=32))

    fb = fusedn_step(pad_staten(f0, nsteps), model, params, nsteps, plan,
                     interpret=True, delta=delta)
    np.testing.assert_array_equal(np.asarray(unpad_staten(fb, nsteps)), ref)

    # chain once more (pads refreshed correctly between n-step passes)
    for _ in range(nsteps):
        fa = fused_step(fa, model, params, plan, interpret=True, z=32,
                        delta=delta)
    fb = fusedn_step(fb, model, params, nsteps, plan, interpret=True,
                     delta=delta)
    np.testing.assert_array_equal(np.asarray(unpad_staten(fb, nsteps)),
                                  np.asarray(unpad_state(fa, z=32)))


def test_fused_delta_vs_absolute_form():
    """The increment-form (delta) and absolute-form back transforms are
    the same algebra to rounding: one step agrees to ~1e-14 in f64."""
    from ludwig_tpu.lb import LBConfig
    from ludwig_tpu.ops.fused import (FusedPlan, fused_step, pad_state,
                                      unpad_state)

    cfg = LBConfig(size=(16, 16, 32), nvel=19, eta_shear=0.1,
                   dtype="float64")
    model, params = cfg.model, cfg.collision_params()
    rng = np.random.default_rng(13)
    f0 = jnp.asarray(
        0.05 + 0.01 * rng.random((19, 16, 16, 32)), jnp.float64)
    plan = FusedPlan(BX=4, BY=8)
    fa = fused_step(pad_state(f0), model, params, plan, interpret=True,
                    z=32, delta=True)
    fb = fused_step(pad_state(f0), model, params, plan, interpret=True,
                    z=32, delta=False)
    np.testing.assert_allclose(np.asarray(unpad_state(fa, z=32)),
                               np.asarray(unpad_state(fb, z=32)),
                               rtol=0, atol=1e-13)


def test_fused_lc_le_step_matches_jnp_path():
    """The fused LC step with LE column fixes (ops/fused_lc.py
    make_fused_lc_le_step) reproduces the jnp sheared blue-phase step
    (lc.make_lc_le_step) -- the reference's production configuration
    (ref: model_le.c:57 + the q-tensor branch of ludwig.c)."""
    from ludwig_tpu.fe import lc_init
    from ludwig_tpu.fe.blue_phase import BluePhaseFE
    from ludwig_tpu.lb import LBConfig
    from ludwig_tpu.lc import LCConfig, make_lc_le_step
    from ludwig_tpu.ops.fused import FusedPlan, pad_state, \
        unpad_state as unpad_f
    from ludwig_tpu.ops.fused_lc import (LCPlan, make_fused_lc_le_step,
                                         pad_q, unpad_q)
    from ludwig_tpu.ops.lees_edwards import (LeesEdwardsConfig,
                                             le_init_shear_profile)

    N = (16, 8, 16)
    cfg = LBConfig(size=N, nvel=19, eta_shear=0.1, dtype="float64")
    fe = BluePhaseFE(a0=0.01, gamma=3.0, q0=0.19635, kappa0=0.000648456,
                     kappa1=0.000648456, xi=0.7)
    lcfg = LCConfig(lb=cfg, fe=fe, gamma=0.5, keep_grads=False)
    le = LeesEdwardsConfig(nplanes=2, uy=0.04, nx=N[0])
    q5 = jnp.asarray(lc_init.lc_init_o8m(N, fe.q0, -0.2), cfg.jdtype)
    f0 = le_init_shear_profile(cfg, le)
    u0 = jnp.zeros((3,) + N, cfg.jdtype)

    sf = (pad_state(f0, zpad=False), pad_q(q5), u0)

    sx = (jnp.array(f0), jnp.array(q5), jnp.array(u0))
    stepx = make_lc_le_step(lcfg, le)
    for t in range(3):
        sx, _ = stepx(sx, t)
    stepf = make_fused_lc_le_step(lcfg, le, plan=LCPlan(4, 8),
                                  lb_plan=FusedPlan(4, 8),
                                  interpret=True)
    for t in range(3):
        sf = stepf(sf, t)

    np.testing.assert_allclose(np.asarray(unpad_q(sf[1])),
                               np.asarray(sx[1]), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(unpad_f(sf[0])),
                               np.asarray(sx[0]), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(sf[2]), np.asarray(sx[2]),
                               rtol=1e-10, atol=1e-12)


def test_fused_binary_le_step_matches_jnp_path():
    """The fused binary step with LE column fixes reproduces the jnp
    sheared-binary step (binary_le.make_binary_le_step) -- ref:
    model_le.c:57 + phi_cahn_hilliard.c LE flux fixes."""
    from ludwig_tpu.binary import BinaryConfig, spinodal_phi
    from ludwig_tpu.binary_le import BinaryLEConfig, make_binary_le_step
    from ludwig_tpu.fe.symmetric import SymmetricFE
    from ludwig_tpu.lb import LBConfig
    from ludwig_tpu.ops.fused import FusedPlan, pad_state, \
        unpad_state as unpad_f
    from ludwig_tpu.ops.fused_binary import (BinaryPlan,
                                             make_fused_binary_le_step,
                                             pad_phi, unpad_phi)
    from ludwig_tpu.ops.lees_edwards import (LeesEdwardsConfig,
                                             le_init_shear_profile)

    N = (16, 8, 16)
    cfg = LBConfig(size=N, nvel=19, eta_shear=0.1, dtype="float64")
    bcfg = BinaryConfig(lb=cfg, fe=SymmetricFE(-6.25e-3, 6.25e-3, 4e-3),
                        mobility=1.25, advection_order=1)
    le = LeesEdwardsConfig(nplanes=2, uy=0.04, nx=N[0])
    lecfg = BinaryLEConfig(binary=bcfg, le=le)
    phi0 = jnp.asarray(spinodal_phi(N, seed=8361235), cfg.jdtype)
    f0 = le_init_shear_profile(cfg, le)
    u0 = jnp.zeros((3,) + N, cfg.jdtype)

    sf = (pad_state(f0, zpad=False), pad_phi(phi0), u0)

    sx = (jnp.array(f0), jnp.array(phi0), jnp.array(u0))
    stepx = make_binary_le_step(lecfg)
    for t in range(3):
        sx, _ = stepx(sx, t)

    stepf = make_fused_binary_le_step(lecfg, plan=BinaryPlan(4, 8),
                                      lb_plan=FusedPlan(4, 8),
                                      interpret=True)
    for t in range(3):
        sf = stepf(sf, t)

    np.testing.assert_allclose(np.asarray(unpad_phi(sf[1])),
                               np.asarray(sx[1]), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(unpad_f(sf[0])),
                               np.asarray(sx[0]), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(sf[2]), np.asarray(sx[2]),
                               rtol=1e-10, atol=1e-12)


def test_fused_lc_sharded_matches_single():
    """shard_map'd fused LC step over a 4x2 ('x','y') CPU mesh ==
    single-device fused LC result (q/u radius-2 pads via ppermute)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from ludwig_tpu.fe import lc_init
    from ludwig_tpu.fe.blue_phase import BluePhaseFE
    from ludwig_tpu.lb import LBConfig, initial_rest
    from ludwig_tpu.lc import LCConfig
    from ludwig_tpu.ops.fused import unpad_state as unpad_f
    from ludwig_tpu.ops.fused_lc import (LCPlan, initial_fused_lc,
                                         make_fused_lc_sharded_step,
                                         make_fused_lc_step, unpad_q)

    N = (16, 16, 32)
    cfg = LBConfig(size=N, nvel=19, eta_shear=0.1, dtype="float64")
    fe = BluePhaseFE(a0=0.01, gamma=3.0, q0=0.19635, kappa0=0.000648456,
                     kappa1=0.000648456, xi=0.7)
    lcfg = LCConfig(lb=cfg, fe=fe, gamma=0.5, keep_grads=False)
    q5 = lc_init.lc_init_o8m(N, fe.q0, -0.2)

    sf = initial_fused_lc(lcfg, q5)
    stepf = make_fused_lc_step(lcfg, plan=LCPlan(4, 8),
                               lb_plan=FusedPlan(4, 8), interpret=True)
    for t in range(3):
        sf = stepf(sf, t)
    ref = (np.asarray(unpad_f(sf[0])), np.asarray(unpad_q(sf[1])),
           np.asarray(sf[2]))

    devs = np.array(jax.devices("cpu")[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("x", "y"))
    sh = NamedSharding(mesh, P(None, "x", "y", None))
    f0 = jax.device_put(initial_rest(cfg), sh)
    q0 = jax.device_put(jnp.asarray(q5, cfg.jdtype), sh)
    u0 = jax.device_put(jnp.zeros((3,) + N, cfg.jdtype), sh)
    steps = make_fused_lc_sharded_step(lcfg, mesh, plan=LCPlan(4, 8),
                                       lb_plan=FusedPlan(4, 8),
                                       interpret=True)
    st = (f0, q0, u0)
    for t in range(3):
        st = steps(st, t)

    np.testing.assert_allclose(np.asarray(st[0]), ref[0], rtol=0,
                               atol=1e-13)
    np.testing.assert_allclose(np.asarray(st[1]), ref[1], rtol=0,
                               atol=1e-13)
    np.testing.assert_allclose(np.asarray(st[2]), ref[2], rtol=0,
                               atol=1e-13)


def test_fused_binary_sharded_matches_single():
    """shard_map'd fused binary step over a 4x2 ('x','y') CPU mesh ==
    single-device fused binary result."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from ludwig_tpu.binary import BinaryConfig, spinodal_phi
    from ludwig_tpu.fe.symmetric import SymmetricFE
    from ludwig_tpu.lb import LBConfig, initial_rest
    from ludwig_tpu.ops.fused import unpad_state as unpad_f
    from ludwig_tpu.ops.fused_binary import (
        BinaryPlan, initial_fused_binary, make_fused_binary_sharded_step,
        make_fused_binary_step, unpad_phi)

    N = (16, 16, 32)
    cfg = LBConfig(size=N, nvel=19, eta_shear=6.25e-3, dtype="float64")
    bcfg = BinaryConfig(lb=cfg, fe=SymmetricFE(-6.25e-3, 6.25e-3, 4e-3),
                        mobility=1.25, advection_order=1)
    phi0 = spinodal_phi(N, seed=11)

    sf = initial_fused_binary(bcfg, phi0)
    stepf = make_fused_binary_step(bcfg, plan=BinaryPlan(4, 8),
                                   lb_plan=FusedPlan(4, 8),
                                   interpret=True)
    for t in range(3):
        sf = stepf(sf, t)
    ref = (np.asarray(unpad_f(sf[0])), np.asarray(unpad_phi(sf[1])),
           np.asarray(sf[2]))

    devs = np.array(jax.devices("cpu")[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("x", "y"))
    shv = NamedSharding(mesh, P(None, "x", "y", None))
    shp = NamedSharding(mesh, P("x", "y", None))
    f0 = jax.device_put(initial_rest(cfg), shv)
    p0 = jax.device_put(jnp.asarray(phi0, cfg.jdtype), shp)
    u0 = jax.device_put(jnp.zeros((3,) + N, cfg.jdtype), shv)
    steps = make_fused_binary_sharded_step(bcfg, mesh,
                                           plan=BinaryPlan(4, 8),
                                           lb_plan=FusedPlan(4, 8),
                                           interpret=True)
    st = (f0, p0, u0)
    for t in range(3):
        st = steps(st, t)

    np.testing.assert_allclose(np.asarray(st[0]), ref[0], rtol=0,
                               atol=1e-13)
    np.testing.assert_allclose(np.asarray(st[1]), ref[1], rtol=0,
                               atol=1e-13)
    np.testing.assert_allclose(np.asarray(st[2]), ref[2], rtol=0,
                               atol=1e-13)


@pytest.mark.parametrize("zext,mode", [(16, "tile"), (20, "ghost")])
def test_fused_z_lane_padding(zext, mode):
    """Z extents that are not lane (128) multiples run the fused kernel
    via z lane padding (zpad_len: tiled copies when 128 % Z == 0, ghost
    wrap columns otherwise) and match the jnp path (any-extent support,
    ref: coords.c:639)."""
    from ludwig_tpu.lb import LBConfig, initial_rest, make_step
    from ludwig_tpu.ops.fused import zpad_len

    size = (8, 16, zext)
    cfg = LBConfig(size=size, nvel=19, eta_shear=0.1, eta_bulk=0.1,
                   force_global=(1e-5, 2e-6, -1e-6), dtype="float64")
    rng = np.random.default_rng(5)
    f0 = jnp.asarray(initial_rest(cfg)
                     * (1.0 + 0.01 * rng.random((19,) + size)))
    assert zpad_len(zext) == 128
    fp = pad_state(jnp.array(f0))
    assert fp.shape[-1] == 128
    step = make_step(cfg)
    fj = f0
    for t in range(4):
        fj, _, _ = step(fj, t)
    model, params = cfg.model, cfg.collision_params()
    for t in range(4):
        fp = fused_step(fp, model, params, FusedPlan(8, 16),
                        interpret=True, z=zext)
    np.testing.assert_allclose(np.asarray(unpad_state(fp, z=zext)),
                               np.asarray(fj), rtol=1e-12, atol=1e-13)


def test_fused_sharded_le_matches_single():
    """shard_map'd fused LE over a 2x4 ('x','y') CPU mesh reproduces
    the single-device fused LE step (the parallel Lees-Edwards comms,
    ref: model_le.c:399, leesedwards.c:700, as owner-shard column fixes
    + an all-gather y-shifted interpolation)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from ludwig_tpu.lb import LBConfig, initial_rest
    from ludwig_tpu.ops.fused import (make_fused_le_step,
                                      make_fused_sharded_le_nstep,
                                      pad_state, unpad_state)
    from ludwig_tpu.ops.lees_edwards import LeesEdwardsConfig

    cfg = LBConfig(size=(32, 32, 32), nvel=19, eta_shear=0.1,
                   force_global=(0.0, 1e-5, 0.0))
    le = LeesEdwardsConfig(nplanes=2, uy=0.04, nx=32)
    model, params = cfg.model, cfg.collision_params()
    rng = np.random.default_rng(9)
    f = initial_rest(cfg) + 1e-3 * jnp.asarray(
        rng.standard_normal((19, 32, 32, 32)))

    plan = FusedPlan(BX=4, BY=8)
    step = make_fused_le_step(cfg, le, plan, interpret=True)
    st = (pad_state(jnp.array(f), zpad=False),)
    for t in range(3):
        st = step(st, t)
    ref = np.asarray(unpad_state(st[0], z=32))

    devs = np.array(jax.devices("cpu")[:8]).reshape(2, 4)
    # local shards 16 x 8: LE plane columns 7 and 23 sit inside the
    # x-shards (col % 16 != 15)
    mesh = Mesh(devs, ("x", "y"))
    fs = jax.device_put(f, NamedSharding(mesh, P(None, "x", "y", None)))
    sh = make_fused_sharded_le_nstep(model, params, le, mesh, plan,
                                     interpret=True)(fs, 0, 3)
    np.testing.assert_allclose(np.asarray(sh), ref, rtol=0, atol=1e-13)


def test_fused_noise_matches_jnp_counter_stream():
    """In-kernel fluctuations (FusedNoise counter stream) == jnp
    collide+stream fed the twin noise fields (fused_noise_fields), and
    conserved modes are untouched (noise lives in stress/ghost modes
    only; ref: collision.c:53,108-120)."""
    from ludwig_tpu.noise import var_bulk, var_eta, var_ghost
    from ludwig_tpu.ops.collide import collide
    from ludwig_tpu.ops.fused import FusedNoise, fused_noise_fields
    from ludwig_tpu.ops.stream import stream

    model = lb_model(19)
    params = CollisionParams(model=model, eta_shear=0.05, eta_bulk=0.07,
                             force_global=(1e-5, 0.0, 0.0))
    shape = (8, 16, 16)
    kt = 1.0e-5
    noise = FusedNoise(
        seed=12345,
        v_eta=var_eta(1.0 / params.rtau_shear, kt),
        v_bulk=var_bulk(1.0 / params.rtau_bulk, kt),
        v_ghost=tuple(var_ghost(model, params.rtau_ghost, kt)))
    f0 = jnp.asarray(_rand_f(model, shape, seed=21), jnp.float64)

    fj = f0
    for t in range(3):
        shat, ghat = fused_noise_fields(model, noise, shape, t,
                                        np.float64)
        fj, _, _ = collide(fj, params, shat=shat, ghat=ghat)
        fj = stream(fj, model)

    fp = pad_state(jnp.array(f0))
    for t in range(3):
        fp = fused_step(fp, model, params, FusedPlan(4, 8),
                        interpret=True, z=shape[2], noise=noise, t=t)
    np.testing.assert_allclose(np.asarray(unpad_state(fp, z=shape[2])),
                               np.asarray(fj), rtol=1e-12, atol=1e-14)
    # global mass/momentum unchanged by the noise stream
    g0 = np.einsum("qxyz,qa->a", np.asarray(f0), np.asarray(model.cv))
    g1 = np.einsum("qxyz,qa->a", np.asarray(unpad_state(fp, z=shape[2])),
                   np.asarray(model.cv))
    imp = np.array([3 * 1e-5 * np.prod(shape), 0.0, 0.0])
    np.testing.assert_allclose(g1, g0 + imp, rtol=0, atol=1e-10)


def test_fused_droplet_le_step_matches_jnp_path():
    """The fused droplet step with LE column fixes reproduces the jnp
    sheared LC-droplet step (lc_droplet_sim.make_droplet_le_step) --
    the reference's coupled configuration under shear
    (ref: lc_droplet.c + model_le.c:57)."""
    from ludwig_tpu.fe import lc_init
    from ludwig_tpu.fe.blue_phase import BluePhaseFE
    from ludwig_tpu.fe.lc_droplet import LCDropletFE
    from ludwig_tpu.fe.symmetric import SymmetricFE
    from ludwig_tpu.lb import LBConfig
    from ludwig_tpu.lc_droplet_sim import (LCDropletConfig,
                                           make_droplet_le_step)
    from ludwig_tpu.ops.fused import FusedPlan, pad_state, \
        unpad_state as unpad_f
    from ludwig_tpu.ops.fused_binary import pad_phi, unpad_phi
    from ludwig_tpu.ops.fused_droplet import (DropletPlan,
                                              make_fused_droplet_le_step)
    from ludwig_tpu.ops.fused_lc import pad_q, unpad_q
    from ludwig_tpu.ops.lees_edwards import (LeesEdwardsConfig,
                                             le_init_shear_profile)

    N = (16, 8, 16)
    cfg = LBConfig(size=N, nvel=19, eta_shear=0.5, dtype="float64")
    symm = SymmetricFE(a=-0.0625, b=0.0625, kappa=0.04)
    lcfe = BluePhaseFE(a0=0.05, gamma=3.086, q0=0.19635,
                       kappa0=0.000648456, kappa1=0.000648456, xi=0.7)
    fe = LCDropletFE(symm=symm, lc=lcfe, gamma0=2.586, delta=0.25,
                     w=0.0)
    dcfg = LCDropletConfig(lb=cfg, fe=fe, mobility=0.05, gamma=0.5,
                           advection_order=1)
    le = LeesEdwardsConfig(nplanes=2, uy=0.04, nx=N[0])
    rng = np.random.RandomState(7)
    phi0 = jnp.asarray(rng.uniform(-0.1, 0.1, N), cfg.jdtype)
    q5 = jnp.asarray(0.1 * lc_init.lc_init_o8m(N, lcfe.q0, -0.2),
                     cfg.jdtype)
    f0 = le_init_shear_profile(cfg, le)
    u0 = jnp.zeros((3,) + N, cfg.jdtype)

    sx = (jnp.array(f0), jnp.array(phi0), jnp.array(q5),
          jnp.array(u0))
    stepx = make_droplet_le_step(dcfg, le)
    for t in range(3):
        sx, _ = stepx(sx, t)

    sf = (pad_state(f0, zpad=False), pad_phi(phi0), pad_q(q5), u0)
    stepf = make_fused_droplet_le_step(dcfg, le,
                                       plan=DropletPlan(4, 8),
                                       lb_plan=FusedPlan(4, 8),
                                       interpret=True)
    for t in range(3):
        sf = stepf(sf, t)

    np.testing.assert_allclose(np.asarray(unpad_phi(sf[1])),
                               np.asarray(sx[1]), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(unpad_q(sf[2])),
                               np.asarray(sx[2]), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(unpad_f(sf[0])),
                               np.asarray(sx[0]), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(sf[3]), np.asarray(sx[3]),
                               rtol=1e-9, atol=1e-12)
