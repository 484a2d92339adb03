"""util/extract.py Lees-Edwards unroll (ref: util/extract.c:977-1056
le_unroll, :914-956 le_set_displacements)."""
import importlib.util as ilu
import os
import sys

import numpy as np

_spec = ilu.spec_from_file_location(
    "extract", os.path.join(os.path.dirname(__file__), "..", "util",
                            "extract.py"))
extract = ilu.module_from_spec(_spec)
_spec.loader.exec_module(extract)


def test_le_unroll_uniform_invariant():
    arr = np.full((16, 8, 4), 3.25)
    out = extract.le_unroll(arr, nplanes=2, speed=0.05, ntime=100)
    np.testing.assert_allclose(out, arr, rtol=0, atol=1e-12)


def test_le_unroll_integer_displacement_is_shift():
    """Integer accumulated displacement reduces the cubic interpolation
    to an exact periodic y-shift by the per-block displacement table."""
    rng = np.random.default_rng(3)
    nx, ny, nz = 16, 8, 2
    arr = rng.random((nx, ny, nz))
    nplanes, speed, ntime = 2, 0.25, 8       # displace = 2.0 per plane
    out = extract.le_unroll(arr, nplanes, speed, ntime)
    dy, _ = extract.le_displacement_table(nx, nplanes, speed * ntime,
                                          speed)
    assert np.allclose(dy, np.round(dy))
    for ic in range(nx):
        expect = np.roll(arr[ic], int(dy[ic]), axis=0)
        np.testing.assert_allclose(out[ic], expect, rtol=0, atol=1e-12)


def test_le_unroll_velocity_frame_correction():
    arr = np.zeros((3, 16, 8, 2))
    out = extract.le_unroll(arr, nplanes=2, speed=0.05, ntime=0,
                            is_velocity=True)
    _, duy = extract.le_displacement_table(16, 2, 0.0, 0.05)
    np.testing.assert_allclose(out[1, :, 0, 0], duy, rtol=0, atol=1e-14)
    np.testing.assert_allclose(out[0], 0.0)
