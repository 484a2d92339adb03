"""Streaming and bounce-back tests (mirrors reference tests/unit/test_prop.c
and wall tests)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ludwig_tpu.lattice import lb_model
from ludwig_tpu.ops.stream import (solid_neighbour_masks, stream,
                                   stream_bounce_back, wall_solid_mask)


@pytest.mark.parametrize("nvel", [9, 15, 19, 27])
def test_stream_moves_by_cv(nvel):
    """A delta at site r ends up at r + c_p for each velocity."""
    model = lb_model(nvel)
    shape = (5, 6, 7) if nvel != 9 else (5, 6, 1)
    f = np.zeros((nvel,) + shape)
    r0 = (2, 3, 0) if nvel == 9 else (2, 3, 4)
    f[:, r0[0], r0[1], r0[2]] = 1.0
    f2 = np.asarray(stream(jnp.asarray(f), model))
    for p in range(nvel):
        dest = tuple((r0[i] + model.cv[p][i]) % shape[i] for i in range(3))
        assert f2[(p,) + dest] == 1.0
        assert f2[p].sum() == 1.0


def test_stream_conserves_everything():
    model = lb_model(19)
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.random((19, 4, 5, 6)))
    f2 = stream(f, model)
    np.testing.assert_allclose(np.asarray(f2).sum((1, 2, 3)),
                               np.asarray(f).sum((1, 2, 3)), rtol=1e-14)


def test_solid_neighbour_masks():
    model = lb_model(19)
    solid = np.zeros((4, 4, 4), bool)
    solid[0, :, :] = True
    masks = np.asarray(solid_neighbour_masks(model, jnp.asarray(solid)))
    for p in range(19):
        cx = model.cv[p][0]
        if cx == 1:
            # pulling from x-1: sites at x=1 pull from the solid plane
            assert masks[p, 1].all()
            assert not masks[p, 2].any()


def test_bounce_back_no_flow_stays_at_rest():
    """Fluid at rest between walls stays exactly at rest."""
    model = lb_model(19)
    shape = (8, 6, 6)
    solid = jnp.asarray(wall_solid_mask(shape, (True, False, False)))
    f = jnp.asarray(np.broadcast_to(model.wv[:, None, None, None],
                                    (19,) + shape)).copy()
    f2 = stream_bounce_back(f, model, solid=solid)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f), atol=1e-15)


def test_bounce_back_reflects_momentum():
    """Total fluid momentum normal to a wall reverses sign over time for a
    uniform push toward the wall (global momentum is absorbed by walls)."""
    model = lb_model(19)
    shape = (8, 4, 4)
    solid_np = wall_solid_mask(shape, (True, False, False))
    solid = jnp.asarray(solid_np)
    rng = np.random.default_rng(1)
    f = np.broadcast_to(model.wv[:, None, None, None], (19,) + shape).copy()
    # mass in fluid region before
    fluid = ~solid_np
    before = (f * fluid[None]).sum()
    f2 = np.asarray(stream_bounce_back(jnp.asarray(f), model, solid=solid))
    after = (f2 * fluid[None]).sum()
    # bounce-back conserves fluid mass
    np.testing.assert_allclose(after, before, rtol=1e-14)


def test_moving_wall_adds_momentum():
    """A moving wall drags fluid: shear couette forcing enters through the
    bounce-back correction term."""
    model = lb_model(19)
    shape = (6, 4, 4)
    solid = jnp.asarray(wall_solid_mask(shape, (True, False, False)))
    f = jnp.asarray(np.broadcast_to(model.wv[:, None, None, None],
                                    (19,) + shape)).copy()
    f2 = np.asarray(stream_bounce_back(f, model, solid=solid,
                                       wall_u=(0.0, 0.05, 0.0)))
    cv = model.cv.astype(float)
    gy = np.einsum("pxyz,p->xyz", f2, cv[:, 1])
    # sites adjacent to the wall picked up y-momentum
    assert abs(gy[1].sum()) > 0.0
    assert abs(gy[3].sum()) < 1e-12
