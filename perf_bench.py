#!/usr/bin/env python
"""Production-path benchmarks beyond the driver's bench.py.

Each subcommand runs one production configuration on the current device
and prints exactly one JSON line; measured results are recorded in
PERF.md.  These cover the reference's production scenarios that its own
tests/performance logs do not time (dense suspensions bbl.c:147,
electrokinetics psi_sor.c:55).

  python perf_bench.py suspension   # 1000-particle BBL suspension 64^3
  python perf_bench.py electro      # Gouy-Chapman SOR + Nernst-Planck
  python perf_bench.py wall         # fused kernel + wall fix 256^3
  python perf_bench.py le           # fused kernel + LE post-pass 256^3
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def fence(x):
    """Scalar readback: the only reliable execution fence over the axon
    relay (block_until_ready can return early)."""
    return float(jnp.ravel(x)[0])


def measure(step_once, niter=3):
    """Best per-call wall time of step_once() after a warmup call."""
    fence(step_once())
    best = float("inf")
    for _ in range(niter):
        t0 = time.perf_counter()
        fence(step_once())
        best = min(best, time.perf_counter() - t0)
    return best


def bench_suspension():
    """Dense passive suspension: 1000 particles a=2.3 in 64^3 (~19%
    volume fraction), full move/rebuild/BBL/collide/stream every step
    (ref: bbl.c:147 production use; segment-sum path colloids_fast.py)."""
    from ludwig_tpu.colloids import (ColloidParams, ColloidState,
                                     make_colloid_step)
    from ludwig_tpu.lb import LBConfig, initial_rest

    size = (64, 64, 64)
    N = 1000
    cfg = LBConfig(size=size, nvel=19, eta_shear=0.1, dtype="float32")
    params = ColloidParams(a0=(2.3,) * N, ah=(2.3,) * N)
    # jittered grid placement: 10^3 cells of 6.4, centres +- 1 so
    # particles overlap fluid but mostly not each other (dense regime)
    rng = np.random.RandomState(3)
    g = (np.indices((10, 10, 10)).reshape(3, -1).T + 0.5) * 6.4
    R = jnp.asarray(g + rng.uniform(-1.0, 1.0, g.shape), cfg.jdtype)
    z3 = jnp.zeros((N, 3), cfg.jdtype)
    state = ColloidState(initial_rest(cfg), R, z3, z3, z3, jnp.array(R),
                         jnp.asarray(np.tile([1.0, 0.0, 0.0], (N, 1)),
                                     cfg.jdtype))
    step = make_colloid_step(cfg, params, rebuild_freq=1)

    holder = {"s": state}

    def once():
        # amortise relay dispatch (~28 ms RTT) over 10 steps
        for _ in range(10):
            holder["s"], _ = step(holder["s"], 1)
        return holder["s"].f

    dt = measure(once) / 10.0
    nsites = float(np.prod(size))
    return {
        "metric": f"suspension N={N} a0=2.3 64^3 full step (move+rebuild"
                  "+BBL+collide+stream)",
        "value": round(dt * 1e3, 2), "unit": "ms/step",
        "mlups": round(nsites / dt / 1e6, 1),
    }


def bench_electro(L=64):
    """Gouy-Chapman electrokinetics: SOR Poisson + Nernst-Planck + LB
    (ref: psi_sor.c:55, nernst_planck.c; config shaped like
    tests/regression/d3q19-elec/serial-elec-gc1 scaled to L^3).  At
    L = 128 the f32 fused kernels engage (ops/fused_electro.py:
    whole-field VMEM SOR + blocked NP/grad-mu pass)."""
    from ludwig_tpu.electro import ElectroConfig, rho_elec
    from ludwig_tpu.electro_sim import (ElectroSimConfig, electroneutral,
                                        init_gouy_chapman,
                                        make_electro_step,
                                        make_psi_neighbours,
                                        poisson_sor_ref)
    size = (L, L, L)
    from ludwig_tpu.lb import LBConfig
    lb = LBConfig(size=size, nvel=19, eta_shear=0.1, dtype="float32")
    ek = ElectroConfig(valency=(1, -1), diffusivity=(0.01, 0.01),
                       e=1.0, beta=3.0e4, epsilon=3.3e3, solver="sor",
                       rel_tol=1e-8, abs_tol=1e-15, max_its=10000)
    psi0, rho_k, boundary = init_gouy_chapman(size, 1.04e-3, 3.125e-2)
    rho_k = electroneutral(rho_k, ek.valency, boundary)
    cfg = ElectroSimConfig(lb=lb, ek=ek)
    solid = jnp.asarray(boundary)
    step = make_electro_step(cfg, solid=solid)
    jd = lb.jdtype
    state = (jnp.zeros((lb.model.nvel,) + size, jd)
             + jnp.asarray(lb.model.wv, jd)[:, None, None, None],
             jnp.asarray(psi0, jd), jnp.asarray(rho_k, jd),
             jnp.zeros((3,) + size, jd), jnp.zeros((3,), jd))

    holder = {"s": state}

    def once():
        # amortise relay dispatch (~28 ms RTT) over 10 steps
        for _ in range(10):
            holder["s"], _ = step(holder["s"], 1)
        return holder["s"][1]

    dt = measure(once) / 10.0

    # SOR iteration count on the converged state (probe once).
    # poisson_sor_ref returns (psi, n, rnorm, which) with n the
    # 0-based printed iteration index (ref psi_sor.c "at %d
    # iterations"); iterations performed = n + 1.
    psi_up, psi_dn = make_psi_neighbours(size, cfg.e0, lb.dtype)
    _, it_idx, _, _ = jax.jit(lambda p, r: poisson_sor_ref(
        p, r, ek, psi_up, psi_dn, return_iters=True))(
        holder["s"][1], rho_elec(holder["s"][2], ek))
    iters = int(it_idx) + 1

    # FFT Poisson production alternative (exact, one pass)
    import dataclasses
    cfg_fft = dataclasses.replace(cfg, ek=dataclasses.replace(
        ek, solver="fft"))
    step_fft = make_electro_step(cfg_fft, solid=solid)
    holder["s"] = tuple(jnp.array(x) for x in holder["s"])
    holder2 = {"s": tuple(jnp.array(x) for x in holder["s"])}

    def once_fft():
        for _ in range(10):
            holder2["s"], _ = step_fft(holder2["s"], 1)
        return holder2["s"][1]

    dt_fft = measure(once_fft) / 10.0
    nsites = float(np.prod(size))
    return {
        "metric": f"Gouy-Chapman {L}^3 full step (SOR Poisson + "
                  "Nernst-Planck + LB)",
        "value": round(dt * 1e3, 2), "unit": "ms/step",
        "sor_iters_per_step": int(iters),
        "fft_ms_per_step": round(dt_fft * 1e3, 2),
        "mlups": round(nsites / dt / 1e6, 1),
    }


def _bench_fused_cli(mode):
    """Fused wall / LE production path at 256^3 (the CLI kernels)."""
    from ludwig_tpu.lb import LBConfig
    from ludwig_tpu.ops.fused import (FusedPlan, make_fused_le_step,
                                      make_fused_wall_step, pad_state)
    size = (256, 256, 256)
    cfg = LBConfig(size=size, nvel=19, eta_shear=0.1, dtype="float32")

    @jax.jit
    def init():
        w = jnp.asarray(cfg.model.wv, cfg.jdtype) * cfg.rho0
        f = jnp.broadcast_to(w[:, None, None, None],
                             (cfg.model.nvel,) + tuple(size))
        return pad_state(f)

    plan = FusedPlan(16, 32)
    if mode == "wall":
        from ludwig_tpu.ops.walls import WallSpec
        ws = WallSpec(walls=(True, False, False),
                      utop=(0.0, 1e-3, 0.0))
        step = make_fused_wall_step(cfg, ws, plan)
        holder = {"s": (init(), jnp.zeros((3,), cfg.jdtype))}
        label = "fused + moving-wall fix"
    else:
        from ludwig_tpu.ops.lees_edwards import LeesEdwardsConfig
        le = LeesEdwardsConfig(nplanes=4, uy=0.04, nx=size[0])
        step = make_fused_le_step(cfg, le, plan)
        holder = {"s": (init(),)}
        label = "fused + Lees-Edwards post-pass (4 planes)"

    t_holder = {"t": 1}

    def once():
        # amortise dispatch over 20 steps like the production chain
        for _ in range(20):
            holder["s"] = step(holder["s"], t_holder["t"])
            t_holder["t"] += 1
        return holder["s"][0]

    dt = measure(once) / 20.0
    nsites = float(np.prod(size))
    return {
        "metric": f"D3Q19 256^3 {label}",
        "value": round(nsites / dt / 1e6, 1), "unit": "MLUPS",
        "ms_per_step": round(dt * 1e3, 2),
    }


def bench_lc_le(n=128):
    """Sheared blue phase: fused two-kernel LC step + LE column fixes
    (the SC16 benchmark's scientific config, sheared; ref:
    model_le.c:57 + the q-tensor branch of ludwig.c)."""
    from ludwig_tpu.fe import lc_init
    from ludwig_tpu.fe.blue_phase import BluePhaseFE
    from ludwig_tpu.lb import LBConfig
    from ludwig_tpu.lc import LCConfig
    from ludwig_tpu.ops.fused import FusedPlan, pad_state
    from ludwig_tpu.ops.fused_lc import (LCPlan, make_fused_lc_le_step,
                                         pad_q)
    from ludwig_tpu.ops.lees_edwards import (LeesEdwardsConfig,
                                             le_init_shear_profile)
    N = (n, n, n)
    cfg = LBConfig(size=N, nvel=19, eta_shear=0.5, dtype="float32")
    fe = BluePhaseFE(a0=0.0069, gamma=3.0, q0=0.19635,
                     kappa0=0.02, kappa1=0.02, xi=0.7)
    lcfg = LCConfig(lb=cfg, fe=fe, gamma=0.5, advection_order=1,
                    gradient="3d_7pt_fluid")
    le = LeesEdwardsConfig(nplanes=4, uy=0.05, nx=N[0])
    q5 = jnp.asarray(lc_init.lc_init_o8m(N, 0.3, -0.2), cfg.jdtype)
    holder = {"s": (pad_state(le_init_shear_profile(cfg, le)),
                    pad_q(q5), jnp.zeros((3,) + N, cfg.jdtype))}
    step = make_fused_lc_le_step(lcfg, le, LCPlan(8, 32),
                                 lb_plan=FusedPlan(16, 32))
    tt = {"t": 1}

    def once():
        for _ in range(10):
            holder["s"] = step(holder["s"], tt["t"])
            tt["t"] += 1
        return holder["s"][2]

    dt = measure(once) / 10.0
    return {"metric": f"LC blue phase {n}^3 fused + LE (4 planes)",
            "value": round(dt * 1e3, 2), "unit": "ms/step",
            "mlups": round(float(np.prod(N)) / dt / 1e6, 1)}


def bench_squirmers():
    """Active suspension: N=1000 squirmers (b1=0.02) at 64^3, full
    step on the MXU BBL path (ref: bbl.c squirmer sections)."""
    from ludwig_tpu.colloids import (ColloidParams, ColloidState,
                                     make_colloid_step)
    from ludwig_tpu.lb import LBConfig, initial_rest
    size = (64, 64, 64)
    N = 1000
    cfg = LBConfig(size=size, nvel=19, eta_shear=0.1, dtype="float32")
    rng = np.random.RandomState(3)
    m = rng.standard_normal((N, 3))
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    params = ColloidParams(a0=(2.3,) * N, ah=(2.3,) * N,
                           b1=(0.02,) * N, b2=(0.01,) * N,
                           m=tuple(map(tuple, m)), types=("active",) * N)
    g = (np.indices((10, 10, 10)).reshape(3, -1).T + 0.5) * 6.4
    R = jnp.asarray(g + rng.uniform(-1.0, 1.0, g.shape), cfg.jdtype)
    z3 = jnp.zeros((N, 3), cfg.jdtype)
    holder = {"s": ColloidState(initial_rest(cfg), R, z3, z3, z3,
                                jnp.array(R),
                                jnp.asarray(m, cfg.jdtype))}
    step = make_colloid_step(cfg, params, rebuild_freq=1)

    def once():
        for _ in range(10):
            holder["s"], _ = step(holder["s"], 1)
        return holder["s"].f

    dt = measure(once) / 10.0
    return {"metric": "squirmer suspension N=1000 b1=0.02 64^3 "
                      "full step", "value": round(dt * 1e3, 2),
            "unit": "ms/step"}


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "suspension"
    fn = {"suspension": bench_suspension,
          "electro": bench_electro,
          "electro128": lambda: bench_electro(128),
          "squirmers": bench_squirmers,
          "lcle": bench_lc_le,
          "lcle256": lambda: bench_lc_le(256),
          "wall": lambda: _bench_fused_cli("wall"),
          "le": lambda: _bench_fused_cli("le")}[which]
    print(json.dumps(fn()))


if __name__ == "__main__":
    main()
