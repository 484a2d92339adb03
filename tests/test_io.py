"""Checkpoint/restart tests: a dumped run must continue identically to
an uninterrupted one (ref: restart regression contract, serial-rest-*)."""

import io
import re

import jax.numpy as jnp
import numpy as np
import pytest

from ludwig_tpu.io import read_state, restart_filename, write_state
from ludwig_tpu.ludwig import run_text


def test_roundtrip(tmp_path):
    arrs = {"dist": np.arange(19 * 4 * 4 * 4, dtype=np.float64
                              ).reshape(19, 4, 4, 4),
            "phi": np.ones((4, 4, 4))}
    write_state(str(tmp_path), 50, arrs)
    back = read_state(str(tmp_path), 50, ["dist", "phi"])
    np.testing.assert_array_equal(back["dist"], arrs["dist"])
    np.testing.assert_array_equal(back["phi"], arrs["phi"])
    assert restart_filename("dist", 50) == "dist-00000050"


BASE = """
size 16_16_16
viscosity 0.00625
free_energy symmetric
A -0.00625
B 0.00625
K 0.004
phi_initialisation    spinodal
mobility 1.25
freq_statistics {freq}
random_seed 8361235
io_directory {dir}
"""


def _phi_line(log):
    return [ln for ln in log.splitlines() if ln.startswith("[phi]")][-1]


def test_restart_continues_identically(tmp_path):
    d = str(tmp_path)
    # straight 10-step run
    log10 = io.StringIO()
    run_text(BASE.format(freq=10, dir=d) + "N_cycles 10\n", out=log10)

    # 5 steps + dump
    log5 = io.StringIO()
    run_text(BASE.format(freq=5, dir=d) + "N_cycles 5\nconfig_at_end yes\n",
             out=log5)
    # restart for 5 more
    logr = io.StringIO()
    run_text(BASE.format(freq=10, dir=d) + "N_cycles 5\nN_start 5\n",
             out=logr)

    # final [phi] statistics identical at print precision
    assert _phi_line(log10.getvalue()) == _phi_line(logr.getvalue())
    # rho line too
    r10 = [ln for ln in log10.getvalue().splitlines()
           if ln.startswith("[rho]")][-1]
    rr = [ln for ln in logr.getvalue().splitlines()
          if ln.startswith("[rho]")][-1]
    assert r10 == rr


def test_checkpoint_preserves_run_dtype(tmp_path):
    """An f32 run's checkpoint stores f32 on disk and restores f32;
    the sidecar dtype matches the bytes (write previously forced f8
    while recording float32)."""
    import json
    import numpy as np
    from ludwig_tpu.io.checkpoint import (read_state, restart_filename,
                                          write_state)
    f32 = np.linspace(0, 1, 24, dtype=np.float32).reshape(2, 3, 4)
    f64 = np.linspace(0, 1, 24, dtype=np.float64).reshape(2, 3, 4)
    write_state(str(tmp_path), 7, {"a32": f32, "a64": f64})
    meta = json.load(open(tmp_path / (restart_filename("a32", 7)
                                      + ".meta.json")))
    nbytes = (tmp_path / restart_filename("a32", 7)).stat().st_size
    assert meta["dtype"] == "float32" and nbytes == f32.size * 4
    back = read_state(str(tmp_path), 7, ["a32", "a64"])
    assert back["a32"].dtype == np.float32
    assert back["a64"].dtype == np.float64
    np.testing.assert_array_equal(back["a32"], f32)
    np.testing.assert_array_equal(back["a64"], f64)
