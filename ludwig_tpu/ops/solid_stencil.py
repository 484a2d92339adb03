"""Solid-aware order-parameter gradients (wetting boundary conditions).

TPU-native equivalents of the reference's solid gradient modules:

* ``solid27_scalar_ops`` — the 27-point predictor-corrector stencil of
  Desplat et al. with the wetting condition gradt = -(C phi_b + H)/kappa
  on links into solid (ref: src/gradient_3d_27pt_solid.c:286-307).
* ``ternary_solid_ops`` — the Semprebon ternary wetting variants with a
  constant prescribed gradient per component: 2-D 9-point D2Q9-weighted
  (ref: src/gradient_2d_ternary_solid.c:210-240) and 3-D 27-point
  count-normalised (ref: src/gradient_3d_ternary_solid.c:230-300).

All are whole-lattice jnp programs: each of the 26 (or 8) neighbour
fetches is a jnp.roll, solidness is a boolean mask per direction, and
the per-direction link values reduce with the reference's normalisers.
Walls live in the halo (no stored solid sites): a crossing of a walled
face is flagged through static edge masks.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ludwig_tpu.ops.stencil import roll3

# The reference link set, in bs_cv order (gradient_3d_27pt_solid.c:58)
BS_CV = [(dx, dy, dz)
         for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)
         if not (dx == 0 and dy == 0 and dz == 0)]

# 2-D 9-point set + D2Q9 weights (gradient_2d_ternary_solid.c:44-53)
BS_CV_2D = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1),
            (1, -1), (1, 0), (1, 1)]
W_2D = [1.0 / 36.0, 4.0 / 36.0, 1.0 / 36.0, 4.0 / 36.0, 4.0 / 36.0,
        1.0 / 36.0, 4.0 / 36.0, 1.0 / 36.0]


def _wall_cross_mask(size, cv, walls) -> Optional[np.ndarray]:
    """True where stepping by cv crosses a walled face (into the halo)."""
    m = None
    for ax in range(3):
        if not walls[ax] or cv[ax] == 0:
            continue
        idx = np.zeros(size, bool)
        sl = [slice(None)] * 3
        sl[ax] = size[ax] - 1 if cv[ax] > 0 else 0
        idx[tuple(sl)] = True
        m = idx if m is None else (m | idx)
    return m


def _link_masks(size, fluid, walls, dirs):
    """Per-direction boolean array: neighbour is a FLUID site."""
    masks = []
    for cv in dirs:
        cv3 = tuple(cv) + (0,) * (3 - len(cv))
        if fluid is not None:
            nb = roll3(fluid, tuple(-v for v in cv3))
        else:
            nb = jnp.ones(size, bool)
        wc = _wall_cross_mask(size, cv3, walls)
        if wc is not None:
            nb = jnp.logical_and(nb, jnp.logical_not(jnp.asarray(wc)))
        masks.append(nb)
    return masks


def solid27_scalar_ops(size, fluid=None,
                       walls: Tuple[bool, bool, bool] = (False,) * 3,
                       rkappa: float = 0.0, c=0.0, h=0.0):
    """(grad, delsq) with the 27-point wetting boundary condition.

    fluid: (X,Y,Z) bool (True = fluid), or None when only walls bound
    the domain.  c, h: wetting parameters - scalars, or (X,Y,Z) arrays
    holding per-site map data at the SOLID sites (ref: map wetting
    data; looked up at the neighbour).  rkappa = 1/kappa of the
    symmetric free energy.

    Both outputs come from one pass over the 26 link directions so XLA
    shares the neighbour fetches; site values at solid sites are
    irrelevant downstream (forces/CH are masked) but remain finite.
    """
    masks = _link_masks(size, fluid, walls, BS_CV)
    r9 = 1.0 / 9.0
    r18 = 1.0 / 18.0

    def _gradt(phi):
        nbs = [roll3(phi, tuple(-v for v in cv)) for cv in BS_CV]
        dphi = [jnp.where(masks[p], nbs[p] - phi, 0.0)
                for p in range(26)]
        gradn = []
        for a in range(3):
            num = 0.0
            cnt = 0.0
            for p, cv in enumerate(BS_CV):
                if cv[a]:
                    num = num + float(cv[a]) * dphi[p]
                    cnt = cnt + masks[p].astype(phi.dtype)
            gradn.append(jnp.where(cnt > 0.0, num / jnp.where(cnt > 0.0,
                                                              cnt, 1.0),
                                   0.0))
        out = []
        for p, cv in enumerate(BS_CV):
            phi_b = phi + 0.5 * sum(float(cv[a]) * gradn[a]
                                    for a in range(3) if cv[a])
            if isinstance(c, (int, float)) and isinstance(h, (int, float)):
                cb, hb = c, h
            else:
                cb = roll3(jnp.asarray(c), tuple(-v for v in cv)) \
                    if not isinstance(c, (int, float)) else c
                hb = roll3(jnp.asarray(h), tuple(-v for v in cv)) \
                    if not isinstance(h, (int, float)) else h
            bc = -(cb * phi_b + hb) * rkappa
            out.append(jnp.where(masks[p], dphi[p], bc))
        return out

    def grad(phi):
        gt = _gradt(phi)
        comps = []
        for a in range(3):
            acc = 0.0
            for p, cv in enumerate(BS_CV):
                if cv[a]:
                    acc = acc + gt[p] * float(cv[a])
            comps.append(r18 * acc)
        return jnp.stack(comps)

    def delsq(phi):
        gt = _gradt(phi)
        acc = 0.0
        for p in range(26):
            acc = acc + gt[p]
        return r9 * acc

    return grad, delsq


def ternary_solid_ops(size, hrk: float, fluid=None,
                      walls: Tuple[bool, bool, bool] = (False,) * 3,
                      two_d: bool = False):
    """(grad, delsq) for one ternary component with constant wetting
    gradient hrk at solid links.

    2-D: D2Q9-weighted sums, gradn = sum 3 w cv dphi, delsq = sum 6 w
    dphi (ref: gradient_2d_ternary_solid.c:214-236).  3-D: the same
    count-normalised 27-point scheme as solid27 but with dphi = hrk at
    solid links (ref: gradient_3d_ternary_solid.c:236-300).
    """
    if two_d:
        masks = _link_masks(size, fluid, walls, BS_CV_2D)

        def vals(phi):
            out = []
            for p, cv in enumerate(BS_CV_2D):
                nb = roll3(phi, (-cv[0], -cv[1], 0))
                out.append(jnp.where(masks[p], nb - phi, hrk))
            return out

        def grad(phi):
            v = vals(phi)
            gx = 0.0
            gy = 0.0
            for p, cv in enumerate(BS_CV_2D):
                if cv[0]:
                    gx = gx + 3.0 * W_2D[p] * float(cv[0]) * v[p]
                if cv[1]:
                    gy = gy + 3.0 * W_2D[p] * float(cv[1]) * v[p]
            return jnp.stack([gx, gy, jnp.zeros_like(phi)])

        def delsq(phi):
            v = vals(phi)
            acc = 0.0
            for p in range(8):
                acc = acc + 6.0 * W_2D[p] * v[p]
            return acc

        return grad, delsq

    masks = _link_masks(size, fluid, walls, BS_CV)
    r9 = 1.0 / 9.0
    r18 = 1.0 / 18.0

    def vals(phi):
        out = []
        for p, cv in enumerate(BS_CV):
            nb = roll3(phi, tuple(-v for v in cv))
            out.append(jnp.where(masks[p], nb - phi, hrk))
        return out

    def grad(phi):
        v = vals(phi)
        comps = []
        for a in range(3):
            acc = 0.0
            for p, cv in enumerate(BS_CV):
                if cv[a]:
                    acc = acc + v[p] * float(cv[a])
            comps.append(r18 * acc)
        return jnp.stack(comps)

    def delsq(phi):
        v = vals(phi)
        acc = 0.0
        for p in range(26):
            acc = acc + v[p]
        return r9 * acc

    return grad, delsq
