"""d3q27-weighted and 2d Tomita gradient stencils: consistency checks."""

import jax.numpy as jnp
import numpy as np
import pytest

from ludwig_tpu.ops.stencil import gradient_ops


@pytest.mark.parametrize("name", ["dm3q27", "2d_tomita_fluid",
                                  "3d_7pt_fluid", "3d_27pt_fluid"])
def test_gradient_consistency_plane_wave(name):
    """All stencils reproduce the gradient/Laplacian of a long-wavelength
    plane wave to O(k^2)."""
    L = 32
    k = 2 * np.pi / L
    x = np.arange(L)
    if name.startswith("2d"):
        shape = (L, 16, 1)
    else:
        shape = (L, 8, 8)
    phi = jnp.asarray(np.sin(k * x)[:, None, None] * np.ones(shape))
    grad, delsq = gradient_ops(name)
    g = np.asarray(grad(phi))
    d2 = np.asarray(delsq(phi))
    expect_g = k * np.cos(k * x)[:, None, None] * np.ones(shape)
    expect_d2 = -k * k * np.asarray(phi)
    np.testing.assert_allclose(g[0], expect_g, atol=3e-3)
    np.testing.assert_allclose(g[1], 0.0, atol=1e-14)
    np.testing.assert_allclose(d2, expect_d2, atol=3e-3)


@pytest.mark.parametrize("name", ["dm3q27", "2d_tomita_fluid"])
def test_gradient_zero_for_constant(name):
    shape = (8, 8, 1) if name.startswith("2d") else (8, 8, 8)
    phi = jnp.full(shape, 0.37)
    grad, delsq = gradient_ops(name)
    np.testing.assert_allclose(np.asarray(grad(phi)), 0.0, atol=1e-15)
    np.testing.assert_allclose(np.asarray(delsq(phi)), 0.0, atol=1e-14)
