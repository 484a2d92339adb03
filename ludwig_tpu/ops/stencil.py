"""Finite-difference gradient stencils for order-parameter fields.

TPU-native equivalent of the reference gradient modules (ref:
src/field_grad.c:305, src/gradient_3d_7pt_fluid.c, gradient_3d_27pt_fluid.c,
gradient_2d_5pt_fluid.c).  Fields are (..., X, Y, Z) arrays; stencil
shifts are jnp.roll (periodic; on a sharded lattice XLA turns the face
transfers into collective-permutes).  A registry keyed by the reference's
``fd_gradient_calculation`` input strings selects the stencil.

Solid-aware variants (anchoring etc.) come with the colloid/LC stack.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp


def roll3(x: jnp.ndarray, shift, first_axis: int = 0) -> jnp.ndarray:
    """Roll the three trailing-spatial axes by integer (sx, sy, sz)."""
    shift = tuple(int(s) for s in shift)
    if not any(shift):
        return x
    axes = tuple(first_axis + i for i in range(3) if shift[i] != 0)
    shifts = tuple(s for s in shift if s != 0)
    return jnp.roll(x, shifts, axis=axes)


def _shift(phi, sx, sy, sz):
    # spatial axes are the last three
    nlead = phi.ndim - 3
    return roll3(phi, (sx, sy, sz), first_axis=nlead)


def grad_7pt(phi: jnp.ndarray) -> jnp.ndarray:
    """Central-difference gradient, 7-point (ref: gradient_3d_7pt_fluid.c).

    phi: (..., X, Y, Z) -> (3, ..., X, Y, Z).  Note roll(+1) brings the
    (i-1) value to site i.
    """
    gx = 0.5 * (_shift(phi, -1, 0, 0) - _shift(phi, 1, 0, 0))
    gy = 0.5 * (_shift(phi, 0, -1, 0) - _shift(phi, 0, 1, 0))
    gz = 0.5 * (_shift(phi, 0, 0, -1) - _shift(phi, 0, 0, 1))
    return jnp.stack([gx, gy, gz])


def delsq_7pt(phi: jnp.ndarray) -> jnp.ndarray:
    """7-point Laplacian: sum of 6 neighbours - 6 phi."""
    return (_shift(phi, 1, 0, 0) + _shift(phi, -1, 0, 0)
            + _shift(phi, 0, 1, 0) + _shift(phi, 0, -1, 0)
            + _shift(phi, 0, 0, 1) + _shift(phi, 0, 0, -1)
            - 6.0 * phi)


def grad_2d_5pt(phi: jnp.ndarray) -> jnp.ndarray:
    gx = 0.5 * (_shift(phi, -1, 0, 0) - _shift(phi, 1, 0, 0))
    gy = 0.5 * (_shift(phi, 0, -1, 0) - _shift(phi, 0, 1, 0))
    return jnp.stack([gx, gy, jnp.zeros_like(phi)])


def delsq_2d_5pt(phi: jnp.ndarray) -> jnp.ndarray:
    return (_shift(phi, 1, 0, 0) + _shift(phi, -1, 0, 0)
            + _shift(phi, 0, 1, 0) + _shift(phi, 0, -1, 0)
            - 4.0 * phi)


def _grad27_terms(v, phi0):
    """Reference-exact 27-point gradient + Laplacian given a neighbour
    fetch v(dx, dy, dz); the term ORDER matches the reference expression
    chains exactly (ref: gradient_3d_27pt_fluid.c grad/del2 stencils),
    so round-off agrees term for term."""
    r9 = 1.0 / 9.0
    gx = (+ v(1, -1, -1) - v(-1, -1, -1) + v(1, -1, 0) - v(-1, -1, 0)
          + v(1, -1, 1) - v(-1, -1, 1) + v(1, 0, -1) - v(-1, 0, -1)
          + v(1, 0, 0) - v(-1, 0, 0) + v(1, 0, 1) - v(-1, 0, 1)
          + v(1, 1, -1) - v(-1, 1, -1) + v(1, 1, 0) - v(-1, 1, 0)
          + v(1, 1, 1) - v(-1, 1, 1))
    gy = (+ v(-1, 1, -1) - v(-1, -1, -1) + v(-1, 1, 0) - v(-1, -1, 0)
          + v(-1, 1, 1) - v(-1, -1, 1) + v(0, 1, -1) - v(0, -1, -1)
          + v(0, 1, 0) - v(0, -1, 0) + v(0, 1, 1) - v(0, -1, 1)
          + v(1, 1, -1) - v(1, -1, -1) + v(1, 1, 0) - v(1, -1, 0)
          + v(1, 1, 1) - v(1, -1, 1))
    gz = (+ v(-1, -1, 1) - v(-1, -1, -1) + v(-1, 0, 1) - v(-1, 0, -1)
          + v(-1, 1, 1) - v(-1, 1, -1) + v(0, -1, 1) - v(0, -1, -1)
          + v(0, 0, 1) - v(0, 0, -1) + v(0, 1, 1) - v(0, 1, -1)
          + v(1, -1, 1) - v(1, -1, -1) + v(1, 0, 1) - v(1, 0, -1)
          + v(1, 1, 1) - v(1, 1, -1))
    d2 = (+ v(-1, -1, -1) + v(-1, -1, 0) + v(-1, -1, 1)
          + v(-1, 0, -1) + v(-1, 0, 0) + v(-1, 0, 1)
          + v(-1, 1, -1) + v(-1, 1, 0) + v(-1, 1, 1)
          + v(0, -1, -1) + v(0, -1, 0) + v(0, -1, 1)
          + v(0, 0, -1) + v(0, 0, 1)
          + v(0, 1, -1) + v(0, 1, 0) + v(0, 1, 1)
          + v(1, -1, -1) + v(1, -1, 0) + v(1, -1, 1)
          + v(1, 0, -1) + v(1, 0, 0) + v(1, 0, 1)
          + v(1, 1, -1) + v(1, 1, 0) + v(1, 1, 1)
          - 26.0 * phi0)
    return 0.5 * r9 * gx, 0.5 * r9 * gy, 0.5 * r9 * gz, r9 * d2


def grad_27pt(phi: jnp.ndarray) -> jnp.ndarray:
    """27-point isotropic gradient (ref: gradient_3d_27pt_fluid.c)."""
    def v(dx, dy, dz):
        return _shift(phi, -dx, -dy, -dz)
    gx, gy, gz, _ = _grad27_terms(v, phi)
    return jnp.stack([gx, gy, gz])


def delsq_27pt(phi: jnp.ndarray) -> jnp.ndarray:
    """27-point isotropic Laplacian (ref: gradient_3d_27pt_fluid.c)."""
    def v(dx, dy, dz):
        return _shift(phi, -dx, -dy, -dz)
    _, _, _, d2 = _grad27_terms(v, phi)
    return d2


def dab_7pt(phi: jnp.ndarray) -> jnp.ndarray:
    """Second-derivative tensor d_a d_b phi (3, 3, ...): standard central
    second differences on the diagonal, cross differences off-diagonal
    (ref: field_grad_scalar_dab)."""
    def sh(*s):
        return _shift(phi, *s)

    rows = [[None] * 3 for _ in range(3)]
    offs = [(1, 0, 0), (0, 1, 0), (0, 0, 1)]
    for a in range(3):
        oa = offs[a]
        rows[a][a] = (sh(*[-v for v in oa]) - 2.0 * phi + sh(*oa))
        for b in range(a + 1, 3):
            ob = offs[b]
            pp = sh(*[-(oa[i] + ob[i]) for i in range(3)])
            pm = sh(*[-(oa[i] - ob[i]) for i in range(3)])
            mp = sh(*[(oa[i] - ob[i]) for i in range(3)])
            mm = sh(*[(oa[i] + ob[i]) for i in range(3)])
            rows[a][b] = 0.25 * (pp - pm - mp + mm)
            rows[b][a] = rows[a][b]
    return jnp.stack([jnp.stack(r) for r in rows])


def _d3q27_terms(phi):
    """Weighted D3Q27 neighbour differences (ref: gradient_d3q27.c:112-124:
    grad_a = sum_p 3 w_p (phi(r+c_p) - phi) c_pa,
    delsq  = sum_p 6 w_p (phi(r+c_p) - phi))."""
    from ludwig_tpu.lattice import lb_model
    model = lb_model(27)
    gx = gy = gz = d2 = 0.0
    for p in range(1, 27):
        c = model.cv[p]
        w = float(model.wv[p])
        dphi = _shift(phi, *(-int(v) for v in c)) - phi
        if c[0]:
            gx = gx + 3.0 * w * float(c[0]) * dphi
        if c[1]:
            gy = gy + 3.0 * w * float(c[1]) * dphi
        if c[2]:
            gz = gz + 3.0 * w * float(c[2]) * dphi
        d2 = d2 + 6.0 * w * dphi
    return gx, gy, gz, d2


def grad_d3q27(phi):
    gx, gy, gz, _ = _d3q27_terms(phi)
    return jnp.stack([gx, gy, gz])


def delsq_d3q27(phi):
    return _d3q27_terms(phi)[3]


def _tomita_terms(phi, epsilon=0.25, epsilon1=0.25):
    """2-D Tomita stencil.

    The reference has TWO parameterisations, picked by whether the
    field was created with a Lees-Edwards object (always true for the
    symmetric/Brazovskii phi, ludwig.c:1185; NULL for surfactant1 and
    ternary, ludwig.c:1371,1446):
      le==NULL -> grad_cs_kernel, GRAD_EPSILON = DEL2_EPSILON = 0.25
                  (ref: gradient_2d_tomita_fluid.c:58-66,109)
      le!=NULL -> grad_2d_tomita_fluid_operator, grad epsilon1_ = 0.25
                  but delsq epsilon_ = 0.5 (same file :53-54,283-333)."""
    rf = 1.0 / (1.0 + 2.0 * epsilon)
    rf1 = 1.0 / (1.0 + 2.0 * epsilon1)

    def at(dx, dy):
        # value at (x+dx, y+dy)
        return _shift(phi, -dx, -dy, 0)

    delsq = rf * (at(1, 0) + at(-1, 0) + at(0, 1) + at(0, -1)
                  + epsilon * (at(1, 1) + at(1, -1) + at(-1, 1)
                               + at(-1, -1))
                  - 4.0 * (1.0 + epsilon) * phi)
    gx = 0.5 * rf1 * ((at(1, 0) - at(-1, 0))
                      + epsilon1 * ((at(1, 1) - at(-1, 1))
                                    + (at(1, -1) - at(-1, -1))))
    gy = 0.5 * rf1 * ((at(0, 1) - at(0, -1))
                      + epsilon1 * ((at(1, 1) - at(1, -1))
                                    + (at(-1, 1) - at(-1, -1))))
    return gx, gy, delsq


def grad_tomita(phi):
    gx, gy, _ = _tomita_terms(phi)
    return jnp.stack([gx, gy, jnp.zeros_like(phi)])


def delsq_tomita(phi):
    return _tomita_terms(phi)[2]


def delsq_tomita_le(phi):
    # the LE-object parameterisation (epsilon_ = 0.5 for delsq only)
    return _tomita_terms(phi, epsilon=0.5)[2]


_GRAD: Dict[str, Callable] = {
    "3d_7pt_fluid": grad_7pt,
    "3d_27pt_fluid": grad_27pt,
    "2d_5pt_fluid": grad_2d_5pt,
    "dm3q27": grad_d3q27,
    "2d_tomita_fluid": grad_tomita,
}
_DELSQ: Dict[str, Callable] = {
    "3d_7pt_fluid": delsq_7pt,
    "3d_27pt_fluid": delsq_27pt,
    "2d_5pt_fluid": delsq_2d_5pt,
    "dm3q27": delsq_d3q27,
    "2d_tomita_fluid": delsq_tomita,
}


def gradient_ops(name: str, le_field: bool = False):
    """(grad, delsq) pair by reference input key fd_gradient_calculation.

    le_field selects the reference's LE-object code path where the two
    differ: for 2d_tomita the delsq switches to the epsilon = 0.5
    parameterisation (see _tomita_terms)."""
    if name not in _GRAD:
        raise ValueError(f"unknown gradient stencil '{name}'; "
                         f"have {sorted(_GRAD)}")
    if le_field and name == "2d_tomita_fluid":
        return _GRAD[name], delsq_tomita_le
    return _GRAD[name], _DELSQ[name]


def solid_gradient_ops(solid, kappa: float, c=0.0, h=0.0):
    """Solid-aware 7-point (grad, delsq) with wetting boundary condition
    (ref: gradient_3d_27pt_solid.c:286 gradt = -(C phi_b + H)/kappa for
    links into solid; the 7-pt variant of the same rule).

    c = h = 0 gives neutral wetting (zero normal gradient, 90-degree
    contact angle); nonzero (c, h) set the wetting strength.  Scalars,
    or (X,Y,Z) arrays carrying per-site map wetting data at the SOLID
    sites (looked up at the neighbour, ref: map data access in
    gradient_3d_27pt_solid.c).
    """
    rk = 1.0 / kappa
    offs = [(1, 0, 0), (0, 1, 0), (0, 0, 1)]
    per_site = not (isinstance(c, (int, float))
                    and isinstance(h, (int, float)))

    def _dirs(phi):
        ups, dns = [], []
        for o in offs:
            nb_up = _shift(phi, *[-v for v in o])
            nb_dn = _shift(phi, *o)
            s_up = roll3(solid, tuple(-v for v in o))
            s_dn = roll3(solid, o)
            if per_site:
                cu = roll3(jnp.asarray(c), tuple(-v for v in o))
                hu = roll3(jnp.asarray(h), tuple(-v for v in o))
                cd = roll3(jnp.asarray(c), o)
                hd = roll3(jnp.asarray(h), o)
                bc_up = -(cu * phi + hu) * rk
                bc_dn = -(cd * phi + hd) * rk
            else:
                bc_up = bc_dn = -(c * phi + h) * rk
            ups.append(jnp.where(s_up, bc_up, nb_up - phi))
            dns.append(jnp.where(s_dn, bc_dn, nb_dn - phi))
        return ups, dns

    def grad(phi):
        ups, dns = _dirs(phi)
        return jnp.stack([0.5 * (u - d) for u, d in zip(ups, dns)])

    def delsq(phi):
        ups, dns = _dirs(phi)
        return sum(u + d for u, d in zip(ups, dns))

    return grad, delsq
