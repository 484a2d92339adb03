"""Sharded-lattice tests on the virtual 8-device CPU mesh: the sharded
step must produce bitwise-identical physics to the single-device run
(the reference's decomposition-independence contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ludwig_tpu.lb import LBConfig, initial_from_hydro
from ludwig_tpu.ops.collide import collide
from ludwig_tpu.ops.stream import stream_bounce_back
from ludwig_tpu.parallel.mesh import (check_divisible, lattice_sharding,
                                      make_mesh, shard_lattice)


def _step_fn(cfg, sharding=None):
    params = cfg.collision_params()
    model = cfg.model

    @jax.jit
    def step(f):
        f_post, rho, u = collide(f, params)
        f_new = stream_bounce_back(f_post, model)
        if sharding is not None:
            f_new = jax.lax.with_sharding_constraint(f_new, sharding)
        return f_new

    return step


@pytest.mark.parametrize("grid", [(8, 1, 1), (2, 2, 2), (1, 4, 2)])
def test_sharded_matches_single_device(grid):
    assert len(jax.devices("cpu")) >= 8, "conftest must provide 8 CPU devices"
    size = (16, 16, 16)
    check_divisible(size, grid)
    cfg = LBConfig(size=size, nvel=19, eta_shear=0.08,
                   force_global=(1e-5, 0.0, 0.0), dtype="float64")
    rng = np.random.default_rng(0)
    u0 = 1e-3 * rng.standard_normal((3,) + size)
    f0 = initial_from_hydro(cfg, np.ones(size), u0)

    step_ref = _step_fn(cfg)
    f_ref = f0
    for _ in range(5):
        f_ref = step_ref(f_ref)

    mesh = make_mesh(grid, devices=jax.devices("cpu"))
    sharding = lattice_sharding(mesh)
    f_sh = shard_lattice(f0, mesh)
    step_sh = _step_fn(cfg, sharding)
    for _ in range(5):
        f_sh = step_sh(f_sh)

    # Sharded compilation may reorder the mode-transform contraction, so
    # agreement is to machine epsilon rather than bitwise; the reference's
    # decomposition-independence contract (identical stats at log print
    # precision) is comfortably met.
    np.testing.assert_allclose(np.asarray(f_ref), np.asarray(f_sh),
                               rtol=1e-13, atol=1e-16)


def test_global_reduction_on_sharded():
    mesh = make_mesh((2, 2, 2), devices=jax.devices("cpu"))
    size = (8, 8, 8)
    cfg = LBConfig(size=size, nvel=19, eta_shear=0.1, dtype="float64")
    from ludwig_tpu.lb import initial_rest
    f = shard_lattice(initial_rest(cfg), mesh)
    total = jax.jit(lambda f: jnp.sum(f))(f)
    np.testing.assert_allclose(float(total), float(np.prod(size)), rtol=1e-12)


def test_graft_dryrun():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_multihost_bootstrap_single_process():
    # Single-process: init() must be a no-op returning False, and
    # pod_mesh must span all (virtual) devices with a 3-D factorisation.
    from ludwig_tpu.parallel import multihost
    assert multihost.init() is False
    assert multihost.is_rank0()
    mesh = multihost.pod_mesh(devices=jax.devices("cpu"))
    assert mesh.devices.size == len(jax.devices("cpu"))
    assert len(mesh.axis_names) == 3
    assert multihost._factor3(8) == (2, 2, 2)
    assert multihost._factor3(12) == (3, 2, 2)
    assert multihost._factor3(7) == (7, 1, 1)


def test_multihost_pod_mesh_runs_step():
    from ludwig_tpu.parallel import multihost
    mesh = multihost.pod_mesh(grid=(2, 2, 2), devices=jax.devices("cpu"))
    size = (8, 8, 8)
    cfg = LBConfig(size=size, nvel=19, eta_shear=0.1, dtype="float64")
    from ludwig_tpu.lb import initial_rest
    f = shard_lattice(initial_rest(cfg), mesh)
    from ludwig_tpu.ops.collide import collide
    from ludwig_tpu.ops.stream import stream

    @jax.jit
    def step(f):
        f, _, _ = collide(f, cfg.collision_params())
        return stream(f, cfg.model)

    f = step(f)
    np.testing.assert_allclose(float(jnp.sum(f)), float(np.prod(size)),
                               rtol=1e-12)
