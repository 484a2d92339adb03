"""Reference-exact fluctuation RNG: per-site KISS99 + Ladd discrete
table.

The reference noise subsystem (ref: src/noise.c) keeps a 4-word
Marsaglia KISS99 state per lattice site, seeded from the GLOBAL site
coordinates so the stream is decomposition independent, and draws
discrete +-sqrt(2 +- sqrt 2)/0 deviates with unit variance from 3-bit
fields of one uniform draw (Ladd, Comp. Phys. Comm. 180 (2009) 2140).

This module reproduces that stream bit-exactly, vectorised over the
whole lattice as jnp uint32 arrays:

* state array: (4, X, Y, Z) uint32, one KISS state per site, carried
  through the simulation state (it advances every reap);
* ``kiss_init`` seeds exactly as noise_init (ref: noise.c:136-211):
  state0 = (master_seed, 12953, 712357, 22383979) plus the 1-based
  periodically-wrapped global coordinates, then four warm-up uniforms
  become the working state;
* ``reap`` = one uniform per site -> up to 10 table deviates (ref:
  noise.c noise_reap_n), advancing the state;
* an optional 1-site halo ring (``extended=True``) mirrors the
  reference's nextra = 1 seeding so the Cahn-Hilliard mid-point flux
  noise (ref: phi_cahn_hilliard.c:510 phi_ch_random_flux) sees the
  same halo values; halo states advance independently of their
  periodic-image interior sites, exactly as in the reference.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np

RTABLE = np.array([-math.sqrt(2.0 + math.sqrt(2.0)),
                   -math.sqrt(2.0 - math.sqrt(2.0)),
                   0.0, 0.0, 0.0, 0.0,
                   math.sqrt(2.0 - math.sqrt(2.0)),
                   math.sqrt(2.0 + math.sqrt(2.0))])

_STATE0 = (13, 12953, 712357, 22383979)


def _uniform(s):
    """One KISS99 step on a 4-word uint32 state stack (4, ...); returns
    (state', uniform) (ref: noise.c noise_uniform)."""
    s0 = s[0] * jnp.uint32(69069) + jnp.uint32(1234567)
    b = s[1] ^ (s[1] << 17)
    b = b ^ (b >> 13)
    s1 = b ^ (b << 5)
    s2 = jnp.uint32(36969) * (s[2] & jnp.uint32(0xffff)) + (s[2] >> 16)
    s3 = jnp.uint32(18000) * (s[3] & jnp.uint32(0xffff)) + (s[3] >> 16)
    b = (s2 << 16) + s3
    return jnp.stack([s0, s1, s2, s3]), s1 + (s0 ^ b)


def kiss_init(master_seed: int, size: Tuple[int, int, int],
              extended: bool = False) -> jnp.ndarray:
    """Seed the per-site state array.

    size is the interior extent; with extended=True the array covers
    (X+2, Y+2, Z+2) — a one-site halo ring whose global coordinates
    wrap periodically (ref: noise.c:172-188).
    """
    seed0 = master_seed if master_seed > 0 else _STATE0[0]
    ex = 1 if extended else 0
    gs = []
    for ax in range(3):
        n = size[ax]
        g = np.arange(1 - ex, n + ex + 1)          # 1-based global coords
        g = np.where(g < 1, g + n, g)
        g = np.where(g > n, g - n, g)
        gs.append(g)
    ig, jg, kg = np.meshgrid(*gs, indexing="ij")
    shape = ig.shape
    state = jnp.stack([
        jnp.asarray(np.uint32(seed0) + ig.astype(np.uint32)),
        jnp.asarray(np.uint32(_STATE0[1]) + jg.astype(np.uint32)),
        jnp.asarray(np.uint32(_STATE0[2]) + kg.astype(np.uint32)),
        jnp.broadcast_to(jnp.uint32(_STATE0[3]), shape)])
    # warm-up: four uniforms become the working state (ref: noise.c:202)
    outs = []
    for _ in range(4):
        state, u = _uniform(state)
        outs.append(u)
    return jnp.stack(outs)


def reap(state: jnp.ndarray, n: int, dtype=jnp.float64):
    """(state', deviates (n, ...)): one uniform per site, 3 bits per
    deviate from bit 2 upward (ref: noise.c noise_reap_n)."""
    state, u = _uniform(state)
    u = u >> 2
    table = jnp.asarray(RTABLE, dtype)
    vals = []
    for i in range(n):
        vals.append(table[(u >> (3 * i)) & jnp.uint32(7)])
    return state, jnp.stack(vals)


def interior(x: jnp.ndarray) -> jnp.ndarray:
    """Interior view of an extended (1-halo) per-site array (works for
    (..., X+2, Y+2, Z+2) stacks)."""
    return x[..., 1:-1, 1:-1, 1:-1]
