"""Real 2-process jax.distributed bootstrap (the reference's
`mpirun -np 2` tier, ref: tests/test.sh; pe_create src/pe.c:26).

Two OS processes join through ludwig_tpu.parallel.multihost.init (the
coordinator env-var protocol), form the pod mesh over 2x4 virtual CPU
devices, run a sharded LB step with GSPMD halo exchange, and must
reproduce the single-process statistics bitwise (f64, FMA disabled in
the workers like conftest)."""

import os
import socket
import subprocess
import sys

import numpy as np

WORKER = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=4 "
                           "--xla_cpu_max_isa=SSE4_2")
from ludwig_tpu.parallel import multihost
multi = multihost.init()
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

assert multi and jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8
mesh = multihost.pod_mesh()          # (2, 2, 2): x axis spans processes
assert dict(mesh.shape) == {"x": 2, "y": 2, "z": 2}

from ludwig_tpu.lb import LBConfig, hydro_fields, initial_rest, make_step

cfg = LBConfig(size=(16, 8, 8), nvel=19, eta_shear=0.1, dtype="float64")
rng = np.random.RandomState(12345)
f0 = np.asarray(initial_rest(cfg))
f0 = f0 + 1e-3 * rng.standard_normal(f0.shape)
sh = NamedSharding(mesh, P(None, "x", "y", "z"))
f = jax.device_put(jnp.asarray(f0), sh)

step = make_step(cfg)
for t in range(1, 4):
    f, rho, u = step(f, t)

@jax.jit
def observables(f):
    rho, g = hydro_fields(f, cfg.model)
    return jnp.sum(f), jnp.sum(rho * rho), g.sum(axis=(1, 2, 3))

s, r2, g = observables(f)
if multihost.is_rank0():
    print("OBS", float(s).hex(), float(r2).hex(),
          float(g[0]).hex(), float(g[1]).hex(), float(g[2]).hex())
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_matches_single():
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.update({
            "COORDINATOR_ADDRESS": f"localhost:{port}",
            "NUM_PROCESSES": "2",
            "PROCESS_ID": str(pid),
            "PYTHONPATH": repo,
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{so}\n{se}"
    obs_lines = [ln for so, _ in outs for ln in so.splitlines()
                 if ln.startswith("OBS ")]
    assert len(obs_lines) == 1   # rank-0-only logging (pe_info)
    got = [float.fromhex(tok) for tok in obs_lines[0].split()[1:]]

    # single-process reference on the same lattice (conftest: CPU, f64,
    # FMA disabled - the same arithmetic the workers run)
    import jax
    import jax.numpy as jnp
    from ludwig_tpu.lb import (LBConfig, hydro_fields, initial_rest,
                               make_step)
    cfg = LBConfig(size=(16, 8, 8), nvel=19, eta_shear=0.1,
                   dtype="float64")
    rng = np.random.RandomState(12345)
    f0 = np.asarray(initial_rest(cfg))
    f0 = f0 + 1e-3 * rng.standard_normal(f0.shape)
    f = jnp.asarray(f0)
    step = make_step(cfg)
    for t in range(1, 4):
        f, rho, u = step(f, t)
    rho, g = hydro_fields(f, cfg.model)
    want = [float(jnp.sum(f)), float(jnp.sum(rho * rho))] + \
        [float(v) for v in np.asarray(g.sum(axis=(1, 2, 3)))]
    np.testing.assert_allclose(got, want, rtol=1e-13, atol=1e-14)
