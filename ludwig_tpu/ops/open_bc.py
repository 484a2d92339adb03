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


def open_bc_edge_hydro(f_pre, model: LatticeModel, axis: int = 0):
    """(rho_in_slab, u_out_slabs): the edge hydro values the NEXT step's
    boundary condition will use (the reference imposes feq with the
    hydro fields of the PREVIOUS collision; ref: ludwig.c:599 update
    before collision vs :823 impose after)."""
    nvel = model.nvel

    def sl(idx):
        s = [slice(None)] * 3
        s[axis] = idx
        return tuple(s)

    rho_in = sum(f_pre[(p,) + sl(0)] for p in range(nvel))
    rho_out = sum(f_pre[(p,) + sl(-1)] for p in range(nvel))
    g_out = [sum(float(model.cv[p][a]) * f_pre[(p,) + sl(-1)]
                 for p in range(nvel) if model.cv[p][a] != 0)
             for a in range(3)]
    u_out = jnp.stack([g / rho_out for g in g_out])
    return rho_in, u_out


def apply_open_bc(f_new: jnp.ndarray, f_pre: jnp.ndarray,
                  model: LatticeModel, bc: OpenBCConfig, axis: int = 0,
                  edge_hydro=None):
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

    # The reference keeps the BC in the halo planes: the inflow halo
    # site takes rho from the adjacent domain site and u = u0; the
    # outflow halo takes rho0 and u from the adjacent domain site; the
    # halo is then corner-shifted so diagonal propagation sees the
    # right transverse neighbour (ref: lb_bc_inflow_rhou.c update /
    # halo_update, lb_bc_outflow_rhou.c).  Equivalently: the incoming
    # populations at the EDGE planes are feq evaluated with the edge
    # hydro values rolled by the transverse velocity components.
    taxes = [a for a in range(3) if a != axis]

    if edge_hydro is not None:
        rho_in, u_out_s = edge_hydro
        u_out = [u_out_s[a] for a in range(3)]
    else:
        rho_in = sum(f_pre[(p,) + sl(0)] for p in range(nvel))
        rho_out_loc = sum(f_pre[(p,) + sl(-1)] for p in range(nvel))
        g_out = [sum(float(model.cv[p][a]) * f_pre[(p,) + sl(-1)]
                     for p in range(nvel) if model.cv[p][a] != 0)
                 for a in range(3)]
        u_out = [g / rho_out_loc for g in g_out]
    rho_out = jnp.full_like(rho_in, float(bc.rho0))

    def troll(x, p):
        # shift by the transverse components: value from the halo site
        # (y - cy, z - cz) that propagates into (y, z)
        for a2, t in zip(taxes, range(2)):
            c = int(model.cv[p][a2])
            if c:
                x = jnp.roll(x, c, axis=t)
        return x

    import numpy as np
    shape2 = f_new[(0,) + sl(0)].shape

    def valid(p):
        # links whose halo site would fall outside the transverse
        # domain extent do not exist (ref: lb_bc_inflow_init_link
        # noffset+ijk bounds checks) - keep the streamed value there
        m = np.ones(shape2, bool)
        for a2, t in zip(taxes, range(2)):
            c = int(model.cv[p][a2])
            if c > 0:
                idx = [slice(None)] * 2
                idx[t] = 0
                m[tuple(idx)] = False
            elif c < 0:
                idx = [slice(None)] * 2
                idx[t] = shape2[t] - 1
                m[tuple(idx)] = False
        return None if m.all() else jnp.asarray(m)

    for p in range(1, nvel):
        ca = int(model.cv[p][axis])
        if ca == 1:
            rin = troll(rho_in, p)
            u_in = [jnp.full_like(rin, float(bc.u0[a])) for a in range(3)]
            val = _feq_col(model, p, rin, u_in).astype(f_new.dtype)
            m = valid(p)
            if m is not None:
                val = jnp.where(m, val, f_new[(p,) + sl(0)])
            f_new = f_new.at[(p,) + sl(0)].set(val)
        elif ca == -1:
            rout = troll(rho_out, p)
            uout = [troll(u, p) for u in u_out]
            val = _feq_col(model, p, rout, uout).astype(f_new.dtype)
            m = valid(p)
            if m is not None:
                val = jnp.where(m, val, f_new[(p,) + sl(-1)])
            f_new = f_new.at[(p,) + sl(-1)].set(val)
    return f_new


def apply_open_bc_x(f_new: jnp.ndarray, f_pre: jnp.ndarray,
                    model: LatticeModel, bc: OpenBCConfig):
    return apply_open_bc(f_new, f_pre, model, bc, axis=0)
