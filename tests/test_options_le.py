"""Option-surface and Lees-Edwards geometry unit tests (breadth rows
from the reference unit tier: test_le_suite, test_rt/option suites,
tests/unit/tests.c:47+)."""

import io

import jax.numpy as jnp
import numpy as np
import pytest

from ludwig_tpu.ludwig import run_text
from ludwig_tpu.ops.lees_edwards import (LeesEdwardsConfig,
                                         le_init_shear_profile,
                                         le_steady_profile)


class TestLEGeometry:
    """ref: src/leesedwards.c:240-241 (dx_sep = Lx/nplanes,
    dx_min = dx_sep/2), :633 (displacement), lees_edw_plane_uy_now."""

    @pytest.mark.parametrize("nplanes", [2, 4, 8, 16, 32])
    def test_plane_columns_equally_spaced(self, nplanes):
        cfg = LeesEdwardsConfig(nplanes=nplanes, uy=0.01, nx=64)
        cols = cfg.plane_cols
        assert len(cols) == nplanes
        dx_sep = 64 // nplanes
        # first plane at dx_min = dx_sep/2 (0-based col just below)
        assert cols[0] == dx_sep // 2 - 1
        assert all(b - a == dx_sep for a, b in zip(cols, cols[1:]))

    def test_steady_displacement_linear(self):
        cfg = LeesEdwardsConfig(nplanes=2, uy=0.01, nx=16)
        assert float(cfg.displacement(250.0)) == pytest.approx(2.5)
        assert float(cfg.uy_now(250.0)) == 0.01

    def test_oscillatory_displacement_integral_of_uy(self):
        # ref: leesedwards.c oscillation u = u0 cos(wt),
        # dy = u0 sin(wt)/w
        om = 2.0 * np.pi / 400.0
        cfg = LeesEdwardsConfig(nplanes=2, uy=0.01, nx=16, omega=om)
        t = np.linspace(0.0, 800.0, 4001)
        uy = np.array([float(cfg.uy_now(tt)) for tt in t[::100]])
        assert uy[0] == pytest.approx(0.01)
        # quarter period: velocity zero, displacement maximal
        assert float(cfg.uy_now(100.0)) == pytest.approx(0.0, abs=1e-12)
        assert float(cfg.displacement(100.0)) == pytest.approx(
            0.01 / om, rel=1e-12)
        # full period: displacement back to zero
        assert float(cfg.displacement(400.0)) == pytest.approx(
            0.0, abs=1e-12)

    def test_steady_profile_zero_mean_and_jumps(self):
        cfg = LeesEdwardsConfig(nplanes=4, uy=0.02, nx=32)
        x = np.arange(32)
        u = le_steady_profile(cfg, x)
        assert abs(u.mean()) < 1e-15
        du = np.diff(u)
        gamma = 4 * 0.02 / 32
        jumps = np.where(du < 0)[0]
        # all four plane columns are interior to the diff range
        assert list(jumps) == [c for c in cfg.plane_cols]
        np.testing.assert_allclose(du[du > 0], gamma, rtol=1e-12)

    def test_init_shear_profile_matches_steady_momentum(self):
        from ludwig_tpu.lb import LBConfig, hydro_fields
        cfg = LBConfig(size=(16, 8, 8), nvel=19, eta_shear=0.1,
                       dtype="float64")
        le = LeesEdwardsConfig(nplanes=2, uy=0.02, nx=16)
        f = le_init_shear_profile(cfg, le)
        rho, g = hydro_fields(f, cfg.model)
        np.testing.assert_allclose(np.asarray(rho), 1.0, atol=1e-12)
        uy = np.asarray(g[1]).mean(axis=(1, 2))
        prof = le_steady_profile(le, np.arange(16))
        # both are the per-block sawtooth (up to the common mean)
        np.testing.assert_allclose(uy - uy.mean(), prof, atol=1e-12)

    def test_buffer_displacement_clamped_at_t0(self):
        # ref: lees_edw_buffer_displacement clamps t < 0 to 0
        from ludwig_tpu.ops.le_ref import LEContext
        cfg = LeesEdwardsConfig(nplanes=2, uy=0.5, nx=16)
        ctx = LEContext(cfg, 0, jnp.float64)
        assert float(ctx.dy_field) == 0.0
        ctx1 = LEContext(cfg, 1, jnp.float64)
        assert float(ctx1.dy_field) == 0.0
        assert float(ctx1.dy_hydro) == pytest.approx(0.5)


class TestOptionSurface:
    """rt-adapter rows (ref: *_rt.c option parsing)."""

    def test_relaxation_scheme_keys(self):
        from ludwig_tpu.ludwig import _relaxation
        from ludwig_tpu.ops.collide import RelaxationScheme
        from ludwig_tpu.runtime import RunTime
        assert _relaxation(RunTime("")) == RelaxationScheme.M10
        assert _relaxation(
            RunTime("lb_relaxation_scheme bgk")) == RelaxationScheme.BGK
        assert _relaxation(
            RunTime("lb_relaxation_scheme trt")) == RelaxationScheme.TRT

    def test_trt_run_through_cli(self):
        out = io.StringIO()
        run_text("N_cycles 2\nsize 8_8_8\nviscosity 0.1\n"
                 "lb_relaxation_scheme trt\nghost_modes on\n"
                 "freq_statistics 2\n", out=out)
        assert "Completed cycle 2" in out.getvalue()

    def test_le_oscillation_period_key(self):
        # oscillatory shear through the input surface
        out = io.StringIO()
        sysobj = run_text(
            "N_cycles 2\nsize 16_8_8\nviscosity 0.1\n"
            "free_energy symmetric\nA -0.003125\nB 0.003125\nK 0.002\n"
            "phi_initialisation spinodal\nmobility 0.45\n"
            "N_LE_plane 2\nLE_plane_vel 0.01\n"
            "LE_oscillation_period 100\nfreq_statistics 2\n", out=out)
        assert "Completed cycle 2" in out.getvalue()
        assert sysobj.le_cfg.omega == pytest.approx(2 * np.pi / 100.0)

    def test_force_method_key_rejects_unknown(self):
        # ref: unknown fe_force_method is fatal (fe_force_method.h enum)
        with pytest.raises(ValueError):
            run_text("N_cycles 1\nsize 8_8_8\nviscosity 0.1\n"
                     "free_energy symmetric\nA -0.00625\nB 0.00625\n"
                     "K 0.004\nphi_initialisation spinodal\n"
                     "mobility 1.0\nfe_force_method bogus_method\n",
                     out=io.StringIO())

    def test_viscosity_defaults(self):
        # ref: physics defaults eta = 1/6 (relaxation time 1),
        # bulk = shear when unset
        out = io.StringIO()
        sysobj = run_text("N_cycles 1\nsize 8_8_8\nfreq_statistics 1\n",
                          out=out)
        assert sysobj.lb_cfg.eta_shear == pytest.approx(1.0 / 6.0)
        assert sysobj.lb_cfg.eta_bulk == pytest.approx(1.0 / 6.0)
        assert "Completed cycle 1" in out.getvalue()

    def test_fe_nhalo_selection(self):
        # symmetric FE needs halo 2; noise variant 3
        # (ref: ludwig.c:1168-1175) -- here halos are implicit in the
        # stencil ops; the observable contract is that both run
        for extra in ("", "fd_phi_fluctuations 1\nnoise 0.01\n"
                      "temperature 0.00001\n"):
            out = io.StringIO()
            run_text("N_cycles 1\nsize 8_8_8\nviscosity 0.1\n"
                     "free_energy symmetric\nA -0.00625\nB 0.00625\n"
                     "K 0.004\nphi_initialisation spinodal\n"
                     "mobility 1.0\nrandom_seed 8361235\n"
                     f"freq_statistics 1\n{extra}", out=out)
            assert "Completed cycle 1" in out.getvalue()
