#!/usr/bin/env python
"""Benchmark: D3Q19 single-fluid MLUPS on one chip (north star >= 1000).

Prints exactly one JSON line:
  {"metric": "...", "value": N, "unit": "MLUPS", "vs_baseline": N}

Baseline: 1000 MLUPS (= 1 GLUPS/chip target from BASELINE.json; the
reference's measured K20X full blue-phase loop was ~26 MLUPS).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ludwig_tpu.lb import LBConfig
from ludwig_tpu.ops.fused import (FusedPlan, make_fused_nstep,
                                  make_fusedn_nstep, pad_state, pad_staten)


def main():
    size = (256, 256, 256)
    niter, inner = 3, 48
    if "--small" in sys.argv:  # quick sanity mode (Z must be 128-aligned)
        size, inner, niter = (64, 64, 128), 20, 2

    cfg = LBConfig(size=size, nvel=19, eta_shear=0.1, eta_bulk=0.1,
                   dtype="float32")

    def rest_padded(pad):
        # Build the ~1.3 GB initial state ON DEVICE in one jitted
        # program: an eager initial_rest() materialises it on the host
        # and ships it through the axon relay (~5 min at 256^3).
        @jax.jit
        def init():
            w = jnp.asarray(cfg.model.wv, cfg.jdtype) * cfg.rho0
            f = jnp.broadcast_to(w[:, None, None, None],
                                 (cfg.model.nvel,) + tuple(size))
            return pad(f)
        return init()

    if "--single" in sys.argv:
        f = rest_padded(pad_state)
        nstep = make_fused_nstep(cfg.model, cfg.collision_params(),
                                 FusedPlan(16, 32))
    else:
        # temporally-blocked kernel: SIX steps per HBM pass (bitwise
        # six single fused steps; tests/test_fused.py).  Measured sweep
        # at 256^3 with the even/odd-factorised transforms: n=3 3681,
        # n=4 3940, n=6 4034 MLUPS.
        nsteps = 6
        inner = inner - inner % nsteps
        f = rest_padded(lambda x: pad_staten(x, nsteps))
        nstep = make_fusedn_nstep(cfg.model, cfg.collision_params(),
                                  nsteps, FusedPlan(16, 32))

    def fence(x):
        # A scalar readback is the only reliable execution fence on every
        # backend here (block_until_ready can return early over remote
        # relays); its ~30 ms cost is amortised over `inner` steps.
        return float(x[0, 1, 8, 0])

    f = nstep(f, inner)  # compile + warm
    fence(f)

    best = float("inf")
    for _ in range(niter):
        t0 = time.perf_counter()
        f = nstep(f, inner)
        fence(f)
        best = min(best, (time.perf_counter() - t0) / inner)

    nsites = size[0] * size[1] * size[2]
    mlups = nsites / best / 1e6
    label = "x".join(str(s) for s in size)
    print(json.dumps({
        "metric": f"D3Q19 single-fluid {label} collide+stream",
        "value": round(mlups, 1),
        "unit": "MLUPS",
        "vs_baseline": round(mlups / 1000.0, 3),
    }))


if __name__ == "__main__":
    main()
