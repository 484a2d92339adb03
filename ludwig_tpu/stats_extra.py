"""Specialised observables: surface tension, rheology profiles,
hydrodynamic-radius calibration.

TPU-native equivalents of the reference's specialised statistics
modules (ref: src/stats_sigma.c surface-tension calibration,
src/stats_rheology.c stress/velocity profiles,
src/stats_calibration.c hydrodynamic radius from drag).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def measure_sigma(fe, fields, axis: int = 0):
    """Surface tension from the excess free-energy density across a flat
    interface normal to `axis` (ref: stats_sigma.c method: integrate
    fed - fed_bulk through the interface; assumes two interfaces in a
    periodic box, returns the per-interface value)."""
    fed = fe.fed(fields)
    # bulk value = free energy of the pure phases (minimum of the bulk
    # potential): fed(phi*) with zero gradients
    phi_star = fe.phi_star
    fbulk = 0.5 * fe.a * phi_star ** 2 + 0.25 * fe.b * phi_star ** 4
    other = tuple(a for a in range(3) if a != axis)
    excess = jnp.mean(fed - fbulk, axis=other)
    return 0.5 * float(jnp.sum(excess))


def rheology_profiles(u: jnp.ndarray, pth: jnp.ndarray, axis: int = 0):
    """Mean velocity and stress profiles along `axis`
    (ref: stats_rheology.c: mean over the perpendicular directions)."""
    other = tuple(a + 1 for a in range(3) if a != axis)
    uprof = jnp.mean(u, axis=other)                 # (3, L)
    sprof = jnp.mean(pth, axis=tuple(a + 2 for a in range(3)
                                     if a != axis))  # (3, 3, L)
    return uprof, sprof


def hydrodynamic_radius(force, velocity, eta: float) -> float:
    """a_h = F / (6 pi eta U) - the calibration measurement
    (ref: stats_calibration.c)."""
    f = float(np.linalg.norm(np.asarray(force)))
    u = float(np.linalg.norm(np.asarray(velocity)))
    return f / (6.0 * np.pi * eta * max(u, 1e-30))


def shear_stress_mean(f: jnp.ndarray, model) -> float:
    """Volume-mean deviatoric S_xy from the distributions
    (ref: stats_rheology mean stress)."""
    cv = model.cv
    sxy = 0.0
    for p in range(model.nvel):
        cxy = float(cv[p][0] * cv[p][1])
        if cxy:
            sxy = sxy + cxy * f[p]
    return float(jnp.mean(sxy))


class TurbulentStats:
    """Time-averaged velocity profile over the y direction
    (ref: src/stats_turbulent.c: ubar accumulate / zero / output).

    ubar holds the running sum of u over every (x, z) column; output
    normalises by (time_counter * Ly) and writes the reference's ascii
    profile (one line per (x, z): ic kc ubar_x ubar_y ubar_z,
    1-based coordinates)."""

    def __init__(self, size):
        import numpy as np
        self.size = tuple(size)
        self.ubar = np.zeros((size[0], size[2], 3))
        self.time_counter = 0

    def accumulate(self, u):
        import jax
        import numpy as np
        ua = np.asarray(jax.device_get(u))      # (3, X, Y, Z)
        self.ubar += np.moveaxis(ua.sum(axis=2), 0, -1)
        self.time_counter += 1

    def zero(self):
        self.ubar[:] = 0.0
        self.time_counter = 0

    def output(self, path):
        norm = 1.0 / (max(self.time_counter, 1) * self.size[1])
        with open(path, "w") as fh:
            for ic in range(self.size[0]):
                for kc in range(self.size[2]):
                    v = self.ubar[ic, kc] * norm
                    fh.write(f"{ic + 1:4d} {kc + 1:4d} "
                             f"{v[0]:14.7e} {v[1]:14.7e} "
                             f"{v[2]:14.7e}\n")
