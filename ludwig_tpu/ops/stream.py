"""Propagation (streaming) and link bounce-back boundaries.

TPU-native re-design of the reference streaming + wall layer (ref:
src/propagation.c:43-96, src/wall.c:489-707).  The reference pull-streams
into a second buffer with explicit halo exchange; here the whole lattice
streams with ``jnp.roll`` per velocity, which XLA lowers to cheap slice
concatenations on one chip and to collective-permutes of face slabs when
the lattice is sharded over a device mesh (the halo exchange falls out of
GSPMD rather than hand-written MPI).

Arrays are always (nvel, NX, NY, NZ); 2-D models use NZ == 1 and have
cv[:, 2] == 0 so the z-axis roll is a no-op.

Solid boundaries (plane walls and porous media via the site map) use the
standard half-way bounce-back on links: a site pulling from a solid site
instead receives its own reflected post-collision distribution, with the
moving-wall momentum term  +2 w_p rho0 (c_p . u_w) / cs^2  when the wall
moves (ref: src/wall.c wall_bbl, src/wall.c:901 moving distributions).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ludwig_tpu.lattice import CS2, LatticeModel


def _roll3(x: jnp.ndarray, shift, first_axis: int) -> jnp.ndarray:
    """Roll the three spatial axes by an integer (sx, sy, sz) shift."""
    shift = tuple(int(s) for s in shift)
    if not any(shift):
        return x
    axes = tuple(first_axis + i for i in range(3) if shift[i] != 0)
    shifts = tuple(s for s in shift if s != 0)
    return jnp.roll(x, shifts, axis=axes)


def stream(f: jnp.ndarray, model: LatticeModel) -> jnp.ndarray:
    """Pull-streaming: f'_p(r) = f_p(r - c_p), fully periodic.

    The input is fenced with an optimization barrier: each of the nvel
    rolls is a separate consumer of f, and without the fence XLA:CPU
    duplicates the whole upstream collision fusion into every one of
    them (~3x step cost on the coupled binary/LC paths).  The barrier
    is arithmetic-neutral (results stay bitwise identical).
    """
    f = jax.lax.optimization_barrier(f)
    return jnp.stack([_roll3(f[p], model.cv[p], 0)
                      for p in range(model.nvel)])


def solid_neighbour_masks(model: LatticeModel,
                          solid: jnp.ndarray) -> jnp.ndarray:
    """For each velocity p, mask of sites whose pull-source is solid.

    solid: (NX, NY, NZ) bool, True at solid (wall/porous/colloid) sites.
    Returns (nvel, NX, NY, NZ) bool.
    """
    return jnp.stack([_roll3(solid, model.cv[p], 0)
                      for p in range(model.nvel)])


def stream_bounce_back(f_post: jnp.ndarray,
                       model: LatticeModel,
                       solid: Optional[jnp.ndarray] = None,
                       wall_u: Optional[jnp.ndarray] = None,
                       rho0: float = 1.0):
    """Stream with half-way bounce-back at solid sites.

    Args:
      f_post: (nvel, NX, NY, NZ) post-collision distributions.
      solid:  (NX, NY, NZ) bool solid mask, or None for fully periodic.
      wall_u: (3,) uniform wall velocity (moving plane walls), or None.

    Returns:
      Streamed distributions; solid sites keep their pre-stream values
      (the reference never propagates meaningfully into solid sites).
    """
    f_new = stream(f_post, model)
    if solid is None:
        return f_new

    from_solid = solid_neighbour_masks(model, solid)
    f_bb = f_post[model.reverse]
    if wall_u is not None and any(float(v) != 0.0 for v in np.asarray(wall_u)):
        cdotu = np.asarray(model.cv, np.float64) @ np.asarray(wall_u,
                                                              np.float64)
        # replaced incoming f_p = f*_{p_bar} - 2 w_{p_bar} rho (c_{p_bar}.u_w)/cs2
        #                       = f*_{p_bar} + 2 w_p rho (c_p.u_w)/cs2
        corr = (2.0 * rho0 / CS2) * model.wv * cdotu
        f_bb = f_bb + jnp.asarray(corr, f_post.dtype).reshape(-1, 1, 1, 1)
    f_new = jnp.where(from_solid, f_bb, f_new)
    return jnp.where(solid[None], f_post, f_new)


def wall_momentum_transfer(f_post: jnp.ndarray, model: LatticeModel,
                           solid: jnp.ndarray) -> jnp.ndarray:
    """Net momentum given to the walls this step (for conservation stats).

    Each bounced link p at fluid site r transfers 2 f*_p(r) c_p to the
    solid (ref: src/wall.c:1279-1299 momentum accounting).
    """
    from_solid = solid_neighbour_masks(model, solid)
    live = jnp.logical_and(from_solid, jnp.logical_not(solid)[None])
    # Link p at r pulls from solid: the outgoing f*_rev(p) hits the wall.
    f_out = f_post[model.reverse]
    contrib = jnp.where(live, f_out, 0.0)
    sums = [jnp.sum(contrib[p]) for p in range(model.nvel)]
    from ludwig_tpu.ops.collide import unrolled_matvec
    return -2.0 * jnp.stack(unrolled_matvec(
        model.cv.T.astype(np.float64), sums))


def wall_solid_mask(shape, walls, dtype=bool):
    """Plane-wall solid mask: one solid plane at each face of a walled axis.

    The reference keeps walls in the halo region outside an L-site fluid
    domain (ref: src/wall.c); here the wall occupies the outermost lattice
    plane of the stored array.
    """
    m = np.zeros(shape, dtype=dtype)
    for ax, w in enumerate(walls):
        if w:
            lo = [slice(None)] * len(shape)
            lo[ax] = 0
            hi = [slice(None)] * len(shape)
            hi[ax] = shape[ax] - 1
            m[tuple(lo)] = True
            m[tuple(hi)] = True
    return m
