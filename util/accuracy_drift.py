#!/usr/bin/env python
"""f32 conservation drift study on the real chip (ACCURACY.md).

Evolves a shear-wave state (u0 sin(2 pi x / X) in y) for N steps with
the fused single-step kernel in BOTH arithmetic forms (delta=True, the
conservation-hardened increment back transform; delta=False, the
absolute form the blocked bench kernels use) and reports the f64
global mass error and momentum drift every `probe` steps.

The reference's headline invariant is machine-precision conserved
totals in f64 (ref: util_sum.h:22-42 Kahan-Klein compensated sums);
this study quantifies what our f32 production path actually drifts.

Usage: python util/accuracy_drift.py [--size 128] [--steps 5000]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--probe", type=int, default=500)
    ap.add_argument("--u0", type=float, default=0.01)
    args = ap.parse_args()

    from ludwig_tpu.lb import LBConfig
    from ludwig_tpu.ops.fused import (FusedPlan, make_fused_nstep,
                                      pad_state, unpad_state)

    L = args.size
    size = (L, L, L)
    cfg = LBConfig(size=size, nvel=19, eta_shear=0.1, eta_bulk=0.1,
                   dtype="float32")
    model = cfg.model

    @jax.jit
    def init():
        # second-order equilibrium at rho=1, u = (0, u0 sin kx, 0)
        x = jnp.arange(L, dtype=jnp.float32)
        uy = args.u0 * jnp.sin(2.0 * np.pi * x / L)[:, None, None]
        uy = jnp.broadcast_to(uy, size)
        fl = []
        for q in range(model.nvel):
            w = float(model.wv[q])
            cy = float(model.cv[q][1])
            cu = cy * uy
            fl.append(w * (1.0 + 3.0 * cu + 4.5 * cu * cu
                           - 1.5 * uy * uy))
        return pad_state(jnp.stack(fl), zpad=False)

    cv64 = np.array(model.cv, np.float64)

    def totals(fpad):
        # totals on the HOST in f64: without x64 an on-device f64
        # astype silently stays f32, whose ~1e-4 summation error would
        # swamp the 1e-6 drift this study measures
        f = np.asarray(jax.device_get(unpad_state(fpad, z=L)),
                       np.float64)
        rho = f.sum()
        g = np.einsum("qa,qxyz->a", cv64, f)
        return rho, g

    nsite = float(L) ** 3
    print(f"# {L}^3 f32 shear wave u0={args.u0}, {args.steps} steps")
    results = {}
    for delta in (True, False):
        nstep = make_fused_nstep(model, cfg.collision_params(),
                                 FusedPlan(16, 32), delta=delta)
        fpad = init()
        r0, g0 = totals(fpad)
        rows = []
        t = 0
        while t < args.steps:
            fpad = nstep(fpad, args.probe)
            t += args.probe
            r, g = totals(fpad)
            rows.append((t, float(r - r0), float(np.max(np.abs(g - g0)))))
        form = "delta" if delta else "absolute"
        results[form] = rows
        for t, dm, dg in rows:
            print(f"{form:9s} t={t:6d} mass_err={dm:+.3e} "
                  f"({dm / nsite:+.2e}/site)  mom_drift={dg:.3e}")
    return results


if __name__ == "__main__":
    main()
