"""Open (inflow/outflow) boundary conditions along x.

TPU-native equivalent of the reference open BCs (ref:
src/lb_bc_inflow_rhou.c:472-540: incoming links get the polynomial
equilibrium at (rho from the adjacent domain site, prescribed u0);
src/lb_bc_outflow_rhou.c: prescribed rho0 with u from the adjacent
site).  The reference keeps these links in halo sites; here the
periodic wrap values produced by the roll-streaming are overwritten on
the boundary columns after streaming, using pre-stream hydro fields.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ludwig_tpu.lattice import CS2, LatticeModel


@dataclasses.dataclass(frozen=True)
class OpenBCConfig:
    u0: Tuple[float, float, float] = (0.0, 0.0, 0.0)  # inflow velocity
    rho0: float = 1.0                                 # outflow density


def _feq_col(model: LatticeModel, p: int, rho, u):
    """Polynomial equilibrium for one velocity on a column slab."""
    c = model.cv[p]
    w = float(model.wv[p])
    rcs2 = 1.0 / CS2
    udotc = sum(float(c[a]) * u[a] for a in range(3))
    sdotq = 0.0
    for a in range(3):
        for b in range(3):
            s_ab = float(c[a] * c[b]) - (CS2 if a == b else 0.0)
            sdotq = sdotq + s_ab * u[a] * u[b]
    return rho * w * (1.0 + rcs2 * udotc + 0.5 * rcs2 * rcs2 * sdotq)


def apply_open_bc(f_new: jnp.ndarray, f_pre: jnp.ndarray,
                  model: LatticeModel, bc: OpenBCConfig, axis: int = 0):
    """Fix the boundary slabs normal to `axis` after streaming.

    f_pre is the pre-stream (post-collision) state used for the local
    hydro values, f_new the streamed state with wrapped values to be
    replaced.  Inflow at the low face (rho from the adjacent domain
    slab, prescribed u0); outflow at the high face (prescribed rho0, u
    from the adjacent slab).
    """
    nvel = model.nvel

    def sl(idx):
        s = [slice(None)] * 3
        s[axis] = idx
        return tuple(s)

    rho_in = sum(f_pre[(p,) + sl(1)] for p in range(nvel))
    u_in = [jnp.full_like(rho_in, float(bc.u0[a])) for a in range(3)]

    rho_out_loc = sum(f_pre[(p,) + sl(-2)] for p in range(nvel))
    g_out = [sum(float(model.cv[p][a]) * f_pre[(p,) + sl(-2)]
                 for p in range(nvel) if model.cv[p][a] != 0)
             for a in range(3)]
    u_out = [g / rho_out_loc for g in g_out]
    rho_out = jnp.full_like(rho_out_loc, float(bc.rho0))

    for p in range(1, nvel):
        ca = int(model.cv[p][axis])
        if ca == 1:
            f_new = f_new.at[(p,) + sl(0)].set(
                _feq_col(model, p, rho_in, u_in).astype(f_new.dtype))
        elif ca == -1:
            f_new = f_new.at[(p,) + sl(-1)].set(
                _feq_col(model, p, rho_out, u_out).astype(f_new.dtype))
    return f_new


def apply_open_bc_x(f_new: jnp.ndarray, f_pre: jnp.ndarray,
                    model: LatticeModel, bc: OpenBCConfig):
    return apply_open_bc(f_new, f_pre, model, bc, axis=0)
