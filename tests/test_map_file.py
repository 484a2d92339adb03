"""Reference-format map files + porous-media geometries + per-site
wetting (ref: src/map.c io records, src/map_rt.c, src/map_init.c)."""

import io
import os

import jax.numpy as jnp
import numpy as np
import pytest

from ludwig_tpu.io.map_file import (GEOMETRIES, read_map, status_circle_xy,
                                    status_wall, write_map)


@pytest.mark.parametrize("binary", [True, False])
@pytest.mark.parametrize("ndata", [0, 2])
def test_map_roundtrip(tmp_path, binary, ndata):
    size = (6, 5, 4)
    rng = np.random.default_rng(3)
    status = (rng.random(size) < 0.3).astype(np.int8)
    data = None
    if ndata:
        data = np.zeros((ndata,) + size)
        for n in range(ndata):
            data[n][status == 1] = rng.normal(size=int((status == 1).sum()))
    path = str(tmp_path / "capillary.001-001")
    write_map(path, status, data, binary=binary)
    st2, d2 = read_map(path, size, ndata, binary=binary)
    assert np.array_equal(st2, status)
    if ndata:
        if binary:
            assert np.array_equal(d2, data)
        else:
            # ascii "%22.15e" keeps 16 significant digits (reference
            # format, ref: map.c:552) - not bit-exact
            np.testing.assert_allclose(d2, data, rtol=1e-14, atol=1e-16)
    else:
        assert d2 is None


def test_map_record_layout(tmp_path):
    # binary record = status byte then ndata doubles, site-major with
    # z fastest (ref: map.c:488-494 write order; io site loop)
    size = (2, 1, 2)
    status = np.array([[[0, 1]], [[1, 0]]], np.int8)
    data = np.arange(8, dtype=np.float64).reshape(2, 2, 1, 2)
    path = str(tmp_path / "m.001-001")
    write_map(path, status, data, binary=True)
    raw = open(path, "rb").read()
    assert len(raw) == 4 * (1 + 16)
    # site (0,0,1): second record; status 1, data (1.0, 5.0)
    rec = raw[17:34]
    assert rec[0] == 1
    assert np.frombuffer(rec[1:], np.float64).tolist() == [1.0, 5.0]


def test_geometries_match_reference_shapes():
    # circle_xy: solid ring, fluid centre (ref: map_init.c:34-84)
    st = status_circle_xy((16, 16, 2))
    assert st[8, 8, 0] == 0 and st[0, 0, 0] == 1
    # every z-plane identical
    assert np.array_equal(st[:, :, 0], st[:, :, 1])
    # wall_y: boundary only at jc = 1 and jc = L
    st = status_wall((4, 6, 4), 1)
    assert st[:, 0, :].all() and st[:, -1, :].all()
    assert not st[:, 1:-1, :].any()
    # crystals: solid fraction close to the analytic sphere packing
    st = GEOMETRIES["simple_cubic"]((16, 16, 16), 8)
    frac = (st == 1).mean()
    assert abs(frac - np.pi / 6.0) < 0.08
    st = GEOMETRIES["face_centred_cubic"]((16, 16, 16), 8)
    assert (st == 1).mean() > frac  # fcc denser than sc


def _run(text, workdir):
    from ludwig_tpu.ludwig import run_text
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        return run_text(text, out=io.StringIO())
    finally:
        os.chdir(cwd)


BASE = """
N_cycles 4
size 12_12_12
viscosity 0.1
free_energy symmetric
A -0.0625
B 0.0625
K 0.04
mobility 1.0
phi_initialisation spinodal
noise 0.01
random_seed 13
fd_gradient_calculation 3d_27pt_solid
porous_media_file yes
porous_media_format BINARY
porous_media_ndata {ndata}
freq_statistics 4
"""


def test_porous_wetting_run(tmp_path):
    # end-to-end: binary fluid in a reference-format capillary map with
    # per-site wetting H drives phi at the walls away from the neutral
    # (H = 0) answer, and phi stays conserved
    size = (12, 12, 12)
    status = np.asarray(status_circle_xy(size))
    solid = status == 1
    for ndata, hval in ((2, 0.002), (2, 0.0)):
        data = np.zeros((2,) + size)
        data[1][solid] = hval
        write_map(str(tmp_path / "capillary.001-001"), status, data,
                  binary=True)
        sys_ = _run(BASE.format(ndata=ndata), str(tmp_path))
        phi = np.asarray(sys_.state[1])
        if hval == 0.0:
            phi_neutral = phi
        else:
            phi_wet = phi
    fl = ~solid
    assert np.isfinite(phi_wet[fl]).all()
    # the wetting BC changes the field near the boundary
    assert np.abs(phi_wet[fl] - phi_neutral[fl]).max() > 1e-6


def test_porous_media_init_key(tmp_path):
    # geometry specified in the input file (ref: map_rt.c:252-295)
    text = """
N_cycles 2
size 8_8_8
viscosity 0.1
free_energy none
porous_media_init simple_cubic
porous_media_acell 4
freq_statistics 2
"""
    sys_ = _run(text, str(tmp_path))
    assert sys_.solid is not None
    expect = GEOMETRIES["simple_cubic"]((8, 8, 8), 4) == 1
    assert np.array_equal(np.asarray(sys_.solid), expect)
