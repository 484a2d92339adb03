"""End-to-end runs from reference-format input text: the application
surface (mirrors reference tests/regression harness shape)."""

import io
import re

import numpy as np
import pytest

from ludwig_tpu.ludwig import run_text
from ludwig_tpu.runtime import RunTime

SPINODAL_INPUT = """
N_cycles 10
size 16_16_16
viscosity 0.00625
ghost_modes off
free_energy symmetric
A -0.00625
B 0.00625
K 0.004
phi0 0.0
phi_initialisation    spinodal
mobility 1.25
fd_gradient_calculation 3d_27pt_fluid
fd_advection_scheme_order 1
periodicity 1_1_1
freq_statistics 10
random_seed 8361235
"""

PLAIN_INPUT = """
N_cycles 5
size 16_8_8
viscosity 0.1
force 0.00001_0.0_0.0
freq_statistics 5
"""

WALLS_INPUT = """
N_cycles 5
size 18_8_8
viscosity 0.1
boundary_walls 1_0_0
force 0.0_0.00001_0.0
freq_statistics 5
"""


def _run(text):
    out = io.StringIO()
    sysobj = run_text(text, out=out)
    return sysobj, out.getvalue()


def test_spinodal_run_log_contract():
    sysobj, log = _run(SPINODAL_INPUT)
    # reference-format stats lines present
    assert "Scalars - total mean variance min max" in log
    assert re.search(r"\[rho\]\s+4096\.00\s+1\.0000", log)
    assert re.search(r"\[phi\]\s+[-0-9.e+]+", log)
    assert "Free energy density - timestep total fluid" in log
    assert "Momentum - x y z" in log
    assert "Completed cycle 10" in log
    # conservation visible in the log: rho total identical in both blocks
    rhos = re.findall(r"\[rho\]\s+(\S+)", log)
    assert len(rhos) == 2 and rhos[0] == rhos[1]
    phis = re.findall(r"\[phi\]\s+(\S+)", log)
    assert abs(float(phis[0]) - float(phis[1])) < 1e-9


def test_plain_fluid_run():
    sysobj, log = _run(PLAIN_INPUT)
    assert "Completed cycle 5" in log
    # body force adds momentum: gx = nsites * F * t
    m = re.findall(r"\[total   \]\s+(\S+)", log)
    gx_final = float(m[-1])
    expect = 16 * 8 * 8 * 1e-5 * 5
    assert abs(gx_final - expect) < 1e-10


def test_walls_run():
    sysobj, log = _run(WALLS_INPUT)
    assert "Completed cycle 5" in log
    assert np.isfinite(float(re.findall(r"\[total   \]\s+(\S+)", log)[-1]))


def test_unused_keys_reported():
    _, log = _run(PLAIN_INPUT + "\nbogus_key_xyz 42\n")
    assert "bogus_key_xyz" in log


def test_runtime_vectors_and_switches():
    rt = RunTime("a 1_2_3\nb on\nc off\nd 1.5\n")
    assert rt.int_vector("a") == [1, 2, 3]
    assert rt.switch("b") and not rt.switch("c")
    assert rt.double("d") == 1.5
    assert rt.unused_keys() == []


PLAIN_FUSED_INPUT = """
N_cycles 6
size 16_16_32
viscosity 0.1
ghost_modes on
free_energy none
force 0.00001_0.0_0.0
periodicity 1_1_1
freq_statistics 3
colloid_init no_colloids
"""

LC_FUSED_INPUT = """
N_cycles 4
size 8_8_16
viscosity 0.1
free_energy lc_blue_phase
fd_gradient_calculation 3d_7pt_fluid
fd_advection_scheme_order 1
lc_a0 0.01
lc_gamma 3.0
lc_q0 0.19635
lc_kappa0 0.000648456
lc_kappa1 0.000648456
lc_xi 0.7
lc_Gamma 0.5
lc_q_initialisation o8m
lc_q_init_amplitude -0.2
lc_init_redshift 1.0
periodicity 1_1_1
freq_statistics 2
colloid_init no_colloids
"""


def _stat_floats(log):
    """All floats from the statistics blocks of a run log."""
    vals = []
    for line in log.splitlines():
        if line.startswith(("[rho]", "[phi]", "[Q", "[fe", "[total",
                            "[fluid", "[minimum", "[maximum")):
            vals += [float(t) for t in line.split()
                     if re.match(r"^-?\d", t)]
    return np.array(vals)


BINARY_FUSED_INPUT = """
N_cycles 4
size 8_8_16
viscosity 0.00625
free_energy symmetric
A -0.00625
B 0.00625
K 0.004
phi0 0.0
phi_initialisation spinodal
mobility 1.25
fd_gradient_calculation 3d_7pt_fluid
fd_advection_scheme_order 2
periodicity 1_1_1
freq_statistics 2
random_seed 8361235
"""

DROPLET_FUSED_INPUT = """
N_cycles 4
size 8_8_16
viscosity 0.5
free_energy lc_droplet
fd_gradient_calculation 3d_7pt_fluid
fd_advection_scheme_order 1
A -0.0625
B 0.0625
K 0.053
phi_initialisation spinodal
phi0 0.0
random_seed 8361235
mobility 0.05
lc_a0 0.1
lc_gamma 3.0
lc_q0 0.19635
lc_kappa0 0.01
lc_kappa1 0.01
lc_xi 0.7
lc_Gamma 0.5
lc_q_initialisation random
lc_q_init_amplitude 0.2
lc_droplet_gamma 2.586
lc_droplet_delta 0.25
lc_droplet_W 0.0
freq_statistics 2
"""


WALL_FUSED_INPUT = """
N_cycles 6
size 16_16_32
viscosity 0.1
boundary_walls 1_0_0
force 0.0_0.00001_0.0
periodicity 0_1_1
freq_statistics 3
"""

COUETTE_FUSED_INPUT = """
N_cycles 6
size 16_16_32
viscosity 0.1
boundary_walls 0_1_0
boundary_speed_bottom -0.001
boundary_speed_top 0.001
periodicity 1_0_1
freq_statistics 3
"""

DUCT_FUSED_INPUT = """
N_cycles 6
size 16_16_32
viscosity 0.1
boundary_walls 1_1_0
force 0.0_0.0_0.00001
periodicity 0_0_1
freq_statistics 3
"""


BINARY_LE_FUSED_INPUT = """
N_cycles 4
size 16_8_16
viscosity 0.00625
free_energy symmetric
A -0.00625
B 0.00625
K 0.004
phi0 0.0
phi_initialisation spinodal
mobility 1.25
fd_gradient_calculation 3d_7pt_fluid
fd_advection_scheme_order 1
N_LE_plane 2
LE_plane_vel 0.04
LE_init_profile 1
periodicity 1_1_1
freq_statistics 2
random_seed 8361235
"""

LC_LE_FUSED_INPUT = """
N_cycles 4
size 16_8_16
viscosity 0.1
free_energy lc_blue_phase
fd_gradient_calculation 3d_7pt_fluid
fd_advection_scheme_order 1
lc_a0 0.01
lc_gamma 3.0
lc_q0 0.19635
lc_kappa0 0.000648456
lc_kappa1 0.000648456
lc_xi 0.7
lc_Gamma 0.5
lc_q_initialisation o8m
lc_q_init_amplitude -0.2
lc_init_redshift 1.0
N_LE_plane 2
LE_plane_vel 0.04
LE_init_profile 1
periodicity 1_1_1
freq_statistics 2
colloid_init no_colloids
"""

LE_FUSED_INPUT = """
N_cycles 6
size 16_16_32
viscosity 0.1
free_energy none
N_LE_plane 2
LE_plane_vel 0.05
periodicity 1_1_1
freq_statistics 3
"""


@pytest.mark.parametrize("text", [PLAIN_FUSED_INPUT, LC_FUSED_INPUT,
                                  BINARY_FUSED_INPUT,
                                  DROPLET_FUSED_INPUT, WALL_FUSED_INPUT,
                                  COUETTE_FUSED_INPUT, DUCT_FUSED_INPUT,
                                  LE_FUSED_INPUT, LC_LE_FUSED_INPUT,
                                  BINARY_LE_FUSED_INPUT],
                         ids=["plain", "lc", "binary", "droplet",
                              "wall", "couette", "duct", "le",
                              "lc_le", "binary_le"])
def test_tpu_fused_cli_path_matches_jnp(text):
    """'tpu_fused interpret' runs the Pallas production kernels through
    the input-file surface and reproduces the jnp path's statistics."""
    out_a = io.StringIO()
    run_text(text, out=out_a)
    out_b = io.StringIO()
    sysobj = run_text("tpu_fused interpret\n" + text, out=out_b)
    assert sysobj.fused_mode is not None
    a, b = _stat_floats(out_a.getvalue()), _stat_floats(out_b.getvalue())
    assert a.size == b.size and a.size > 0
    np.testing.assert_allclose(b, a, rtol=1e-9, atol=1e-11)


def test_tpu_shard_grid_matches_unsharded():
    """`tpu_shard on` + `grid` shards the lattice state over the device
    mesh (8 virtual CPU devices in conftest); the statistics log must
    match the unsharded run (GSPMD halo exchange, SURVEY 2.11)."""
    _, log0 = _run(SPINODAL_INPUT)
    _, log1 = _run(SPINODAL_INPUT + "\ntpu_shard on\ngrid 2_2_2\n")
    assert "Decomposition:  2 2 2 (device mesh)" in log1
    s0 = re.findall(r"\[(?:rho|phi)\]\s+(\S+)\s+(\S+)", log0)
    s1 = re.findall(r"\[(?:rho|phi)\]\s+(\S+)\s+(\S+)", log1)
    assert len(s0) == len(s1) > 0
    for (a0, b0), (a1, b1) in zip(s0, s1):
        assert abs(float(a0) - float(a1)) <= 1e-9 * max(1, abs(float(a0)))
        assert abs(float(b0) - float(b1)) <= 1e-9


def test_tpu_shard_bad_grid_falls_back():
    _, log = _run(PLAIN_INPUT + "\ntpu_shard on\ngrid 3_1_1\n")
    assert "running unsharded" in log
    assert "Completed cycle 5" in log


def test_tpu_shard_default_grid_checks_divisibility():
    """tpu_shard with no grid key takes the (ndev,1,1) slab default,
    which must still be checked against the lattice extent (18 % 8)."""
    _, log = _run(WALLS_INPUT + "\ntpu_shard on\n")
    assert "running unsharded" in log
    assert "Completed cycle 5" in log


def test_tpu_timer_detail_breakdown():
    """`tpu_timer_detail on` appends measured per-phase rows to the
    timer table (the reference's TIMER_statistics per-phase sections,
    timer.h:52-100)."""
    _, log = _run("tpu_fused interpret\ntpu_timer_detail on\n"
                  + PLAIN_FUSED_INPUT)
    assert "Collide+stream" in log and "Pad refresh" in log
    _, log2 = _run("tpu_timer_detail on\n" + SPINODAL_INPUT)
    assert "Full step" in log2


def test_tpu_shard_composes_with_tpu_fused():
    """`tpu_shard on` + `tpu_fused` routes the CLI to the shard_map'd
    fused kernel (make_fused_sharded_nstep) over the 8-device virtual
    mesh and reproduces the single-device fused run's statistics."""
    _, log0 = _run("tpu_fused interpret\n" + PLAIN_FUSED_INPUT)
    sysobj, log1 = _run("tpu_fused interpret\ntpu_shard on\ngrid 4_2_1\n"
                        + PLAIN_FUSED_INPUT)
    assert sysobj.step_nfn is not None
    assert "Decomposition:  4 2 1 (device mesh)" in log1
    a, b = _stat_floats(log0), _stat_floats(log1)
    assert a.size == b.size and a.size > 0
    np.testing.assert_allclose(b, a, rtol=1e-12, atol=1e-14)


def test_tpu_shard_composes_with_fused_lc():
    """`tpu_shard on` + the fused LC kernels: the CLI routes to the
    shard_map'd two-kernel step over the 8-device virtual mesh and
    reproduces the single-device fused run's statistics."""
    text = LC_FUSED_INPUT.replace("size 8_8_16", "size 16_16_32")
    _, log0 = _run("tpu_fused interpret\n" + text)
    sysobj, log1 = _run("tpu_fused interpret\ntpu_shard on\ngrid 4_2_1\n"
                        + text)
    assert sysobj.fused_unpadded
    assert "Decomposition:  4 2 1 (device mesh)" in log1
    a, b = _stat_floats(log0), _stat_floats(log1)
    assert a.size == b.size and a.size > 0
    np.testing.assert_allclose(b, a, rtol=1e-12, atol=1e-14)


def test_tpu_shard_composes_with_fused_binary():
    """Ditto for the fused binary kernels."""
    text = BINARY_FUSED_INPUT.replace("size 8_8_16", "size 16_16_32")
    _, log0 = _run("tpu_fused interpret\n" + text)
    sysobj, log1 = _run("tpu_fused interpret\ntpu_shard on\ngrid 4_2_1\n"
                        + text)
    assert sysobj.fused_unpadded
    assert "Decomposition:  4 2 1 (device mesh)" in log1
    a, b = _stat_floats(log0), _stat_floats(log1)
    assert a.size == b.size and a.size > 0
    np.testing.assert_allclose(b, a, rtol=1e-12, atol=1e-14)


def test_tpu_shard_composes_with_fused_droplet():
    """Ditto for the fused LC-droplet kernels (hydro_correct_momentum
    becomes a cross-device pmean)."""
    text = DROPLET_FUSED_INPUT.replace("size 8_8_16", "size 16_16_32")
    _, log0 = _run("tpu_fused interpret\n" + text)
    sysobj, log1 = _run("tpu_fused interpret\ntpu_shard on\ngrid 4_2_1\n"
                        + text)
    assert sysobj.fused_unpadded
    assert "Decomposition:  4 2 1 (device mesh)" in log1
    a, b = _stat_floats(log0), _stat_floats(log1)
    assert a.size == b.size and a.size > 0
    np.testing.assert_allclose(b, a, rtol=1e-12, atol=1e-14)


def test_tpu_shard_composes_with_fused_le():
    """`tpu_shard on` + `tpu_fused` + Lees-Edwards: the CLI routes to
    the shard_map'd fused LE step (make_fused_sharded_le_nstep: owner-
    shard column fixes + all-gather y-shifted interpolation; ref:
    model_le.c:399, leesedwards.c:700) and reproduces the
    single-device fused run's statistics."""
    text = LE_FUSED_INPUT.replace("size 16_16_32", "size 32_32_32")
    _, log0 = _run("tpu_fused interpret\n" + text)
    sysobj, log1 = _run("tpu_fused interpret\ntpu_shard on\ngrid 2_4_1\n"
                        + text)
    assert sysobj.fused_unpadded
    assert "Decomposition:  2 4 1 (device mesh)" in log1
    a, b = _stat_floats(log0), _stat_floats(log1)
    assert a.size == b.size and a.size > 0
    # the sharded STATE is bit-identical (test_fused.py::
    # test_fused_sharded_le_matches_single); the report's near-zero
    # momentum cancellation sums see sharded-reduction roundoff only
    np.testing.assert_allclose(b, a, rtol=1e-12, atol=1e-12)


def test_tpu_fused_with_fluctuations_cli():
    """`tpu_fused` + isothermal fluctuations routes to the fused kernel
    with the in-kernel counter noise stream (ref: collision.c:53) and
    reports the kT statistics block."""
    text = ("tpu_fused interpret\n" + PLAIN_FUSED_INPUT
            + "\ntemperature 0.00002\nisothermal_fluctuations on\n"
            + "random_seed 8361235\n")
    sysobj, log = _run(text)
    assert sysobj.fused_mode == "plain"
    assert "Isothermal fluctuations\n" in log
    assert "[eqipart.]" in log and "[measd/kT]" in log
    # conserved totals still exact at print precision (16x16x32)
    assert re.search(r"\[rho\]\s+8192\.00\s+1\.0000", log)
