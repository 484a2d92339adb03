"""Fluctuations: discrete-Gaussian noise for fluctuating LB and
Cahn-Hilliard flux noise.

TPU-native equivalent of the reference noise subsystem (ref:
src/noise.c:70-80 tabulated discrete deviates, :136-200 site-seeded
state; src/collision.c:1754-1816 variances, :1818-1906 stress/ghost
construction; src/phi_cahn_hilliard.c:510 var = sqrt(2 kT M)).

The reference carries a 4-word L'Ecuyer generator per site, seeded from
global coordinates for decomposition independence.  Here the generator
is the counter-based JAX threefry PRNG keyed on (master_seed, timestep):
values depend only on the global site index and the step, so results are
independent of the device mesh by construction - same contract, no
state arrays.

The discrete distribution takes 8 values
  {-sqrt(2+sqrt2), -sqrt(2-sqrt2), 0 x4, +sqrt(2-sqrt2), +sqrt(2+sqrt2)}
selected by 3 uniform bits: zero mean, unit variance, zero 3rd moment,
correct 4th moment (as in the reference table).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ludwig_tpu.lattice import CS2, LatticeModel

_RTABLE = np.array([-math.sqrt(2.0 + math.sqrt(2.0)),
                    -math.sqrt(2.0 - math.sqrt(2.0)),
                    0.0, 0.0, 0.0, 0.0,
                    math.sqrt(2.0 - math.sqrt(2.0)),
                    math.sqrt(2.0 + math.sqrt(2.0))])


@dataclasses.dataclass(frozen=True)
class NoiseConfig:
    kt: float
    seed: int = 8361235
    rho: bool = False     # isothermal fluctuations (LB)
    phi: bool = False     # CH flux noise
    # reference-exact per-site KISS99 stream (ludwig_tpu.noise_kiss),
    # carried as a state array through the step; False = stateless
    # threefry stream (same variances, different realisation)
    kiss: bool = True


def discrete_deviates(seed: int, step, n: int, shape, dtype=jnp.float32):
    """(n, *shape) unit-variance discrete deviates for this timestep."""
    key = jax.random.fold_in(jax.random.key(seed), step)
    idx = jax.random.randint(key, (n,) + tuple(shape), 0, 8, dtype=jnp.int32)
    return jnp.asarray(_RTABLE, dtype)[idx]


def var_eta(tau: float, kt: float) -> float:
    """Shear-stress noise amplitude (ref: lb_fluctuations_var_eta)."""
    kt = kt / CS2
    return math.sqrt(kt) * math.sqrt(1.0 / 9.0) * math.sqrt(
        (2.0 * tau - 1.0) / (tau * tau))


def var_bulk(tau: float, kt: float) -> float:
    kt = kt / CS2
    return math.sqrt(kt) * math.sqrt(2.0 / 9.0) * math.sqrt(
        (2.0 * tau - 1.0) / (tau * tau))


def var_ghost(model: LatticeModel, rtau_ghost: np.ndarray,
              kt: float) -> np.ndarray:
    """Per-mode ghost noise amplitudes (ref: lb_fluctuations_var_ghost);
    rna[m] = 1/na[m]."""
    kt = kt / CS2
    out = np.zeros(model.nvel)
    rna = 1.0 / model.na
    for m in range(model.nhydro, model.nvel):
        tau = 1.0 / rtau_ghost[m]
        out[m] = math.sqrt(kt * rna[m]) * math.sqrt(
            (2.0 * tau - 1.0) / (tau * tau))
    return out


def stress_from_deviates(r, v_eta: float, v_bulk: float, ndim: int = 3):
    """shat (3, 3, ...) from 6 unit-variance deviates (the construction
    shared by both RNG streams; ref: lb_collision_fluctuations)."""
    s = [[None] * 3 for _ in range(3)]
    s[0][0], s[0][1], s[0][2] = r[0], r[1], r[2]
    s[1][1], s[1][2], s[2][2] = r[3], r[4], r[5]
    s[1][0], s[2][0], s[2][1] = s[0][1], s[0][2], s[1][2]

    tr = (1.0 / ndim) * (s[0][0] + s[1][1] + (ndim - 2.0) * s[2][2])
    sq2 = math.sqrt(2.0)
    out = [[None] * 3 for _ in range(3)]
    for a in range(3):
        for b in range(3):
            v = s[a][b] - (tr if a == b else 0.0)
            v = v * (v_eta * sq2 if a == b else v_eta)
            if a == b:
                v = v + tr * v_bulk
            out[a][b] = v
    return jnp.stack([jnp.stack(row) for row in out])


def ghost_from_deviates(r, model: LatticeModel, v_ghost: np.ndarray):
    """ghat (nvel, ...) from (nvel - nhydro) unit-variance deviates."""
    shape = r.shape[1:]
    rows = [jnp.zeros(shape, r.dtype)] * model.nhydro
    for i, m in enumerate(range(model.nhydro, model.nvel)):
        rows.append(float(v_ghost[m]) * r[i])
    return jnp.stack(rows)


def ch_flux_from_deviates(r_ext, kt: float, mobility: float):
    """Face random fluxes [fe_x, fe_y, fe_z] (east faces) from 3
    deviates on the EXTENDED (1-halo) lattice: mid-point average of
    site-centred var*r (ref: phi_ch_random_flux mid-point accumulate).
    """
    var = math.sqrt(2.0 * kt * mobility)
    out = []
    for ax in range(3):
        r = var * r_ext[ax]
        int_sl = [slice(1, -1)] * 3
        up_sl = [slice(1, -1)] * 3
        up_sl[ax] = slice(2, None)
        out.append(0.5 * (r[tuple(int_sl)] + r[tuple(up_sl)]))
    return out


def fluctuating_stress(seed: int, step, shape, v_eta: float, v_bulk: float,
                       ndim: int = 3, dtype=jnp.float32):
    """shat (3, 3, *shape) (ref: lb_fluctuations_stress)."""
    r = discrete_deviates(seed, step, 6, shape, dtype)
    s = [[None] * 3 for _ in range(3)]
    s[0][0], s[0][1], s[0][2] = r[0], r[1], r[2]
    s[1][1], s[1][2], s[2][2] = r[3], r[4], r[5]
    s[1][0], s[2][0], s[2][1] = s[0][1], s[0][2], s[1][2]

    tr = (1.0 / ndim) * (s[0][0] + s[1][1] + (ndim - 2.0) * s[2][2])
    sq2 = math.sqrt(2.0)
    out = [[None] * 3 for _ in range(3)]
    for a in range(3):
        for b in range(3):
            v = s[a][b] - (tr if a == b else 0.0)
            v = v * (v_eta * sq2 if a == b else v_eta)
            if a == b:
                v = v + tr * v_bulk
            out[a][b] = v
    return jnp.stack([jnp.stack(row) for row in out])


def ghost_noise(seed: int, step, shape, model: LatticeModel,
                v_ghost: np.ndarray, dtype=jnp.float32):
    """ghat (nvel, *shape): noise on each ghost mode
    (ref: lb_fluctuations_ghosts - assigned in mode order)."""
    nghost = model.nvel - model.nhydro
    r = discrete_deviates(seed, step, nghost, shape, dtype)
    rows = [jnp.zeros(shape, dtype)] * model.nhydro
    for i, m in enumerate(range(model.nhydro, model.nvel)):
        rows.append(float(v_ghost[m]) * r[i])
    return jnp.stack(rows)


def ch_random_flux(seed: int, step, shape, kt: float, mobility: float,
                   dtype=jnp.float32):
    """[fx, fy, fz] fluctuating face fluxes, var = sqrt(2 kT M)
    (ref: phi_ch_random_flux).  Distinct sub-key from the LB noise."""
    var = math.sqrt(2.0 * kt * mobility)
    r = discrete_deviates(seed + 104729, step, 3, shape, dtype)
    return [var * r[0], var * r[1], var * r[2]]

def qab_noise5(seed, step, size, kt: float, gamma: float,
               dtype=jnp.float64):
    """Fluctuating Q-tensor noise in the 5-component representation
    (ref: blue_phase_beris_edwards.c:403-417 + beris_edw_tmatrix):
    five unit-variance discrete deviates per site, scaled by
    var = sqrt(2 kT Gamma) and projected through the traceless
    symmetric basis T^d_ab.  (The reference marks this path as
    untested - assert(0) at :355 - so the deviates here come from the
    stateless counter-based stream rather than the per-site KISS
    state.)"""
    import math
    var = math.sqrt(2.0 * kt * gamma)
    c = discrete_deviates(seed, step, 5, size, dtype) * var
    s32 = math.sqrt(1.5) / 3.0
    s12 = math.sqrt(0.5)
    s2h = math.sqrt(2.0) / 2.0
    return jnp.stack([
        -s32 * c[0] + s12 * c[1],   # chi_xx
        s2h * c[2],                 # chi_xy
        s2h * c[3],                 # chi_xz
        -s32 * c[0] - s12 * c[1],   # chi_yy
        s2h * c[4],                 # chi_yz
    ])

