"""Parallel (sharded) field IO: per-shard subfile writes with no host
gather, parallel reassembling reads, and reference-format interop
(ref: src/io_impl_mpio.c collective writes, src/io_subfile.c iogrid)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ludwig_tpu.io.sharded import (read_sharded, read_subfile_set,
                                   subfile_name, write_sharded)


def _mesh2(nx, ny):
    devs = np.array(jax.devices("cpu")[:nx * ny]).reshape(nx, ny)
    return Mesh(devs, ("x", "y"))


def test_sharded_write_matches_host_blocks(tmp_path):
    mesh = _mesh2(4, 2)
    arr = np.arange(5 * 8 * 8 * 4, dtype=np.float64).reshape(5, 8, 8, 4)
    sh = NamedSharding(mesh, P(None, "x", "y", None))
    ja = jax.device_put(jnp.asarray(arr), sh)

    nfile = write_sharded(str(tmp_path), "q", 10, ja)
    assert nfile == 8
    # every subfile + metadata present
    for i in range(nfile):
        assert os.path.exists(tmp_path / subfile_name("q", 10, i, nfile))

    # identical to the host-sliced writer with the same grid
    write_sharded(str(tmp_path / "host"), "q", 10, arr, grid=(4, 2, 1))
    for i in range(nfile):
        a = (tmp_path / subfile_name("q", 10, i, nfile)).read_bytes()
        b = (tmp_path / "host" / subfile_name("q", 10, i, nfile)).read_bytes()
        assert a == b

    # recombine to the original
    back = read_subfile_set(str(tmp_path), "q", 10)
    np.testing.assert_array_equal(back, arr)


def test_sharded_roundtrip_different_read_sharding(tmp_path):
    # write on a (4, 2) grid, read back sharded (2, 4) and (8, 1):
    # the reader gathers each device slice from overlapping subfiles
    mesh = _mesh2(4, 2)
    rng = np.random.default_rng(3)
    arr = rng.standard_normal((16, 8, 4))
    ja = jax.device_put(jnp.asarray(arr),
                        NamedSharding(mesh, P("x", "y", None)))
    write_sharded(str(tmp_path), "phi", 7, ja)

    for nx, ny in [(2, 4), (8, 1), (1, 1)]:
        mesh2 = _mesh2(nx, ny)
        sh = NamedSharding(mesh2, P("x", "y", None))
        back = read_sharded(str(tmp_path), "phi", 7, sh)
        assert back.sharding.is_equivalent_to(sh, back.ndim)
        np.testing.assert_array_equal(np.asarray(back), arr)


def test_sharded_replicated_axis_writes_once(tmp_path):
    # z axis replicated over 'y': each block must be written exactly once
    mesh = _mesh2(4, 2)
    arr = np.arange(8 * 8 * 4, dtype=np.float64).reshape(8, 8, 4)
    ja = jax.device_put(jnp.asarray(arr),
                        NamedSharding(mesh, P("x", None, None)))
    nfile = write_sharded(str(tmp_path), "rho", 1, ja)
    assert nfile == 4
    back = read_subfile_set(str(tmp_path), "rho", 1)
    np.testing.assert_array_equal(back, arr)


def test_sharded_component_axis_must_be_replicated(tmp_path):
    mesh = _mesh2(4, 2)
    arr = jnp.zeros((4, 8, 8, 8))
    ja = jax.device_put(arr, NamedSharding(mesh, P("x", "y", None, None)))
    with pytest.raises(ValueError):
        write_sharded(str(tmp_path), "bad", 0, ja)


def test_host_iogrid_set_is_ref_format_compatible(tmp_path):
    # a (1,1,1) iogrid host write must byte-match io/ref_format.py's
    # single-file writer (the util/extract.c interop contract)
    from ludwig_tpu.io.ref_format import field_filename, write_ref_field
    rng = np.random.default_rng(11)
    arr = rng.standard_normal((3, 6, 4, 2))
    (tmp_path / "ref").mkdir()
    write_sharded(str(tmp_path), "vel", 20, arr)
    write_ref_field(str(tmp_path / "ref"), "vel", 20, arr)
    a = (tmp_path / subfile_name("vel", 20, 0, 1)).read_bytes()
    b = (tmp_path / "ref" / field_filename("vel", 20)).read_bytes()
    assert a == b
