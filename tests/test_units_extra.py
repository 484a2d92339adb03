"""Per-module edge-case unit tests.

Breadth pass mirroring the reference's unit tier (ref:
tests/unit/tests.c:47+ registers 93 suites - test_rt, test_pe,
test_coords, test_lb_model, test_map, test_io_options, ...).  The
golden suite covers the physics end-to-end; these cover the corners:
options validation, IO corner cases, stencil/advection identities,
wall slip geometry, compensated sums.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ludwig_tpu.runtime import RunTime, RunTimeError


# ---------------------------------------------------------------------------
# runtime parser (ref: src/runtime.c; unit: tests/unit/test_runtime.c)

class TestRunTime:
    def test_comments_blanks_malformed_skipped(self):
        rt = RunTime("# full comment\n"
                     "\n"
                     "loneword\n"
                     "a 1  # trailing comment\n"
                     "  b   2.5  \n")
        assert rt.nkeys == 2
        assert rt.int("a") == 1
        assert rt.double("b") == 2.5

    def test_duplicate_key_last_wins(self):
        rt = RunTime("x 1\nx 2\n")
        assert rt.int("x") == 2 and rt.nkeys == 1

    def test_vectors(self):
        rt = RunTime("size 16_32_64\ng -1.5_0_2e-3\n")
        assert rt.int_vector("size") == [16, 32, 64]
        assert rt.double_vector("g") == [-1.5, 0.0, 2e-3]
        assert rt.int_vector("missing", (1, 1, 1)) == [1, 1, 1]
        assert rt.int_vector("missing") is None

    def test_switch_semantics(self):
        rt = RunTime("a on\nb yes\nc 1\nd true\ne off\nf no\ng 0\n")
        for k in "abcd":
            assert rt.switch(k) is True
        for k in "efg":
            assert rt.switch(k) is False
        assert rt.switch("absent", True) is True

    def test_required_raises(self):
        rt = RunTime("")
        with pytest.raises(RunTimeError):
            rt.required("free_energy")
        with pytest.raises(RunTimeError):
            rt.int_required("N_cycles")

    def test_unused_key_report(self):
        rt = RunTime("used 1\nunused_one 2\nunused_two 3\n")
        rt.int("used")
        assert rt.unused_keys() == ["unused_one", "unused_two"]

    def test_from_file(self, tmp_path):
        p = tmp_path / "input"
        p.write_text("N_cycles 7\n")
        assert RunTime.from_file(str(p)).int("N_cycles") == 7


# ---------------------------------------------------------------------------
# lattice model invariants (ref: src/lb_d*.c; unit: test_lb_model.c)

@pytest.mark.parametrize("nvel", [9, 15, 19, 27])
class TestLatticeModel:
    def test_reverse_velocities(self, nvel):
        from ludwig_tpu.lattice import lb_model as model_by_nvel
        m = model_by_nvel(nvel)
        for q in range(m.nvel):
            assert np.all(m.cv[m.reverse[q]] == -m.cv[q])
            assert m.reverse[m.reverse[q]] == q

    def test_second_moment_isotropy(self, nvel):
        # sum_q w_q c_qa c_qb = cs^2 delta_ab over the model's live
        # dimensions (d2q9 has no z velocities; ref: lb_model.h cs2=1/3)
        from ludwig_tpu.lattice import lb_model as model_by_nvel
        m = model_by_nvel(nvel)
        nd = 2 if nvel == 9 else 3
        s = np.einsum("q,qa,qb->ab", m.wv, m.cv.astype(float),
                      m.cv.astype(float))
        np.testing.assert_allclose(s[:nd, :nd], np.eye(nd) / 3.0,
                                   atol=1e-14)
        np.testing.assert_allclose(s[nd:], 0.0, atol=1e-15)
        # odd moments vanish
        np.testing.assert_allclose(
            np.einsum("q,qa->a", m.wv, m.cv.astype(float)), 0.0,
            atol=1e-15)

    def test_fourth_moment_isotropy(self, nvel):
        from ludwig_tpu.lattice import lb_model as model_by_nvel
        m = model_by_nvel(nvel)
        nd = 2 if nvel == 9 else 3
        c = m.cv.astype(float)[:, :nd]
        s4 = np.einsum("q,qa,qb,qc,qd->abcd", m.wv, c, c, c, c)
        cs2 = 1.0 / 3.0
        d = np.eye(nd)
        want = cs2 * cs2 * (np.einsum("ab,cd->abcd", d, d)
                            + np.einsum("ac,bd->abcd", d, d)
                            + np.einsum("ad,bc->abcd", d, d))
        np.testing.assert_allclose(s4, want, atol=1e-14)

    def test_mode_matrix_invertible_via_normalisers(self, nvel):
        # mi = na-weighted transpose: ma @ (na * ma.T diag weights) = I
        from ludwig_tpu.lattice import lb_model as model_by_nvel
        m = model_by_nvel(nvel)
        ma = np.asarray(m.ma, float)
        mi = np.asarray(m.wv)[None, :] * ma * np.asarray(m.na)[:, None]
        np.testing.assert_allclose(ma @ mi.T, np.eye(m.nvel), atol=1e-12)


# ---------------------------------------------------------------------------
# advection schemes (ref: src/advection.c orders 1-5)

class TestAdvection:
    @pytest.mark.parametrize("order", [1, 2, 3, 4, 5])
    def test_divergence_conserves_globally(self, order):
        from ludwig_tpu.ops.advect import advective_fluxes, flux_divergence
        rng = np.random.RandomState(0)
        phi = jnp.asarray(rng.randn(8, 8, 8))
        u = jnp.asarray(rng.randn(3, 8, 8, 8))
        div = flux_divergence(advective_fluxes(u, phi, order))
        # periodic flux form: total phi change is exactly a telescope
        assert abs(float(jnp.sum(div))) < 1e-12 * float(
            jnp.sum(jnp.abs(phi)))

    @pytest.mark.parametrize("order", [1, 2, 3, 4, 5])
    def test_uniform_state_has_zero_divergence(self, order):
        from ludwig_tpu.ops.advect import advective_fluxes, flux_divergence
        # uniform u and phi: every scheme must reduce to a constant
        # face flux, so the divergence is identically zero
        phi = jnp.full((8, 8, 8), 0.7)
        u = jnp.stack([jnp.full((8, 8, 8), v)
                       for v in (0.02, -0.01, 0.005)])
        div = flux_divergence(advective_fluxes(u, phi, order))
        assert float(jnp.max(jnp.abs(div))) < 1e-15

    def test_bad_order_raises(self):
        from ludwig_tpu.ops.advect import advective_fluxes
        with pytest.raises(ValueError):
            advective_fluxes(jnp.zeros((3, 4, 4, 4)),
                             jnp.zeros((4, 4, 4)), order=7)

    def test_no_flux_at_solid_zeroes_both_faces(self):
        from ludwig_tpu.ops.advect import (advective_fluxes,
                                           no_flux_at_solid)
        rng = np.random.RandomState(2)
        phi = jnp.asarray(rng.randn(6, 6, 6))
        u = jnp.asarray(rng.randn(3, 6, 6, 6))
        solid = jnp.zeros((6, 6, 6), bool).at[3, 3, 3].set(True)
        fx = no_flux_at_solid(advective_fluxes(u, phi, 1), solid)
        # face into the solid from below and the solid's own face
        assert float(fx[0][2, 3, 3]) == 0.0
        assert float(fx[0][3, 3, 3]) == 0.0


# ---------------------------------------------------------------------------
# map file IO corners (ref: src/map.c, util/capillary.c)

class TestMapIO:
    @pytest.mark.parametrize("binary", [True, False])
    def test_roundtrip_with_wetting_data(self, tmp_path, binary):
        from ludwig_tpu.io.map_file import read_map, write_map
        rng = np.random.RandomState(3)
        size = (4, 3, 5)
        status = (rng.rand(*size) < 0.3).astype(np.int8)
        data = rng.randn(2, *size)
        p = str(tmp_path / "map")
        write_map(p, status, data, binary=binary)
        s2, d2 = read_map(p, size, 2, binary=binary)
        np.testing.assert_array_equal(status, s2)
        np.testing.assert_allclose(data, d2, rtol=0, atol=1e-14)

    def test_wrong_size_raises(self, tmp_path):
        from ludwig_tpu.io.map_file import read_map, write_map
        p = str(tmp_path / "map")
        write_map(p, np.zeros((2, 2, 2), np.int8))
        with pytest.raises(ValueError):
            read_map(p, (3, 2, 2), 0)
        with pytest.raises(ValueError):
            read_map(p, (2, 2, 2), 1)

    def test_geometry_initialisers_fluid_fraction(self):
        from ludwig_tpu.io.map_file import (status_body_centred_cubic,
                                            status_circle_xy,
                                            status_face_centred_cubic,
                                            status_simple_cubic,
                                            status_wall)
        w = status_wall((8, 8, 8), 2)
        assert w[:, :, 0].all() and w[:, :, -1].all()
        assert not w[:, :, 1:-1].any()
        c = status_circle_xy((16, 16, 4))
        # solid outside the inscribed circle, fluid at the centre
        assert not c[8, 8, 0] and c[0, 0, 0]
        for st in (status_simple_cubic((8, 8, 8), 4),
                   status_body_centred_cubic((8, 8, 8), 4),
                   status_face_centred_cubic((8, 8, 8), 4)):
            frac = st.mean()
            assert 0.0 < frac < 1.0


# ---------------------------------------------------------------------------
# reference field-file format corners (ref: util/extract.c layout)

class TestRefFormatIO:
    def test_field_filename(self):
        from ludwig_tpu.io.ref_format import field_filename
        # util/extract.c expects 8-digit step stamps (%8.8d)
        assert field_filename("phi", 20) == "phi-00000020.001-001"
        assert field_filename("dist", 7, 2, 4) == "dist-00000007.002-004"

    def test_roundtrip_multicomponent(self, tmp_path):
        from ludwig_tpu.io.ref_format import (read_ref_field,
                                              write_ref_field)
        rng = np.random.RandomState(4)
        size = (3, 4, 5)
        arr = rng.randn(5, *size)
        path = write_ref_field(str(tmp_path), "q", 12, arr)
        assert path.endswith("q-00000012.001-001")
        back = read_ref_field(path, size, 5)
        np.testing.assert_allclose(arr, back, rtol=0, atol=0)


# ---------------------------------------------------------------------------
# colloid state file corners (ref: src/colloid_io.c)

class TestColloidIO:
    def test_ascii_binary_agree(self, tmp_path):
        from ludwig_tpu.io.colloid_io import (default_state,
                                              read_colloid_file,
                                              read_colloid_file_binary,
                                              write_colloid_file,
                                              write_colloid_file_binary)
        s = default_state()
        s.update(index=1, a0=1.25, ah=1.25, r=[4.4, 5.5, 6.6],
                 v=[1e-5, -2e-5, 0.0])
        pa = str(tmp_path / "config.cds.asc")
        pb = str(tmp_path / "config.cds.bin")
        write_colloid_file(pa, [s])
        write_colloid_file_binary(pb, [s])
        ra = read_colloid_file(pa)[0]
        rb = read_colloid_file_binary(pb)[0]
        for k in ("index", "a0", "ah"):
            assert ra[k] == rb[k]
        np.testing.assert_allclose(ra["r"], rb["r"], atol=1e-13)
        np.testing.assert_allclose(ra["v"], rb["v"], atol=1e-18)


# ---------------------------------------------------------------------------
# wall slip geometry (ref: src/wall.c wall_slip / wall_link_slip)

class TestWallSlip:
    def test_slip_face_edge_corner(self):
        from ludwig_tpu.ops.walls import WallSpec
        ws = WallSpec(walls=(True, True, True),
                      slip_bot=(0.2, 0.4, 0.0),
                      slip_top=(1.0, 0.0, 0.6), slip_active=True)
        # plain faces
        assert ws.slip_value([(0, False)]) == pytest.approx(0.2)
        assert ws.slip_value([(2, True)]) == pytest.approx(0.6)
        # edge: average of the two faces
        assert ws.slip_value([(0, True), (1, False)]) == pytest.approx(
            0.7)
        # corner: no slip by construction
        assert ws.slip_value([(0, False), (1, False), (2, False)]) == 0.0

    def test_wall_bounce_back_rest_state_invariant(self):
        # rest equilibrium (f = w, rho=1 everywhere incl. boundary
        # sites): stream + wall bounce-back must return the identical
        # state with zero wall momentum (ref: wall.c wall_bbl on a
        # quiescent fluid)
        from ludwig_tpu.lattice import lb_model
        from ludwig_tpu.ops.stream import stream
        from ludwig_tpu.ops.walls import WallSpec, wall_bounce_back
        model = lb_model(19)
        size = (6, 6, 8)
        f = jnp.broadcast_to(
            jnp.asarray(model.wv)[:, None, None, None],
            (19,) + size).astype(jnp.float64)
        ws = WallSpec(walls=(False, False, True))
        f2, _, gw = wall_bounce_back(stream(f, model), f, model, ws)
        np.testing.assert_allclose(np.asarray(f2), np.asarray(f),
                                   atol=1e-15)
        np.testing.assert_allclose(np.asarray(gw), 0.0, atol=1e-15)


# ---------------------------------------------------------------------------
# compensated sums (ref: src/util_sum.c Kahan/Klein; unit test_util_sum.c)

class TestCompensatedSums:
    def test_klein_total_matches_fsum_adversarial(self):
        from ludwig_tpu.stats import field_stats
        rng = np.random.RandomState(6)
        x = np.concatenate([rng.randn(512) * 1e8,
                            rng.randn(512) * 1e-8,
                            -rng.randn(1024)]).reshape(4, 16, 32)
        want = math.fsum(x.reshape(-1))
        naive = float(jnp.sum(jnp.asarray(x)))
        got = float(field_stats(jnp.asarray(x))[0])
        # the Klein doubly-compensated site-order scan stays at
        # fsum-level accuracy despite the 1e16 dynamic range (a plain
        # site-order running sum would lose ~8 digits here)
        del naive
        assert got == pytest.approx(want, abs=1e-6)

    def test_site_sum_dtype_dispatch(self):
        from ludwig_tpu.stats import seq_sum, site_sum
        x64 = jnp.asarray(np.arange(100, dtype=np.float64))
        x32 = jnp.asarray(np.arange(100, dtype=np.float32))
        assert float(site_sum(x64)) == float(seq_sum(x64))
        assert float(site_sum(x32)) == pytest.approx(4950.0)
        mask = x32 < 50
        assert float(site_sum(x32, mask)) == pytest.approx(
            float(jnp.sum(jnp.where(mask, x32, 0.0))))


# ---------------------------------------------------------------------------
# mesh decomposition guards (ref: src/coords.c cs_decomposition)

class TestMeshGuards:
    def test_check_divisible(self):
        from ludwig_tpu.parallel.mesh import check_divisible
        check_divisible((64, 64, 64), (4, 2, 1))
        with pytest.raises(ValueError):
            check_divisible((65, 64, 64), (4, 2, 1))

    def test_make_mesh_shapes(self):
        from ludwig_tpu.parallel.mesh import (lattice_sharding, make_mesh,
                                              shard_lattice)
        mesh = make_mesh((4, 2, 1))
        assert tuple(mesh.devices.shape) == (4, 2, 1)
        x = jnp.zeros((19, 16, 16, 16))
        xs = shard_lattice(x, mesh)
        assert xs.sharding == lattice_sharding(mesh)


# ---------------------------------------------------------------------------
# 6x6 implicit BBL solve (ref: src/util.c util_gauss_solve)

class TestGaussSolve:
    def test_matches_numpy_solve(self):
        from ludwig_tpu.colloids import gauss_solve6_ref, solve6
        rng = np.random.RandomState(7)
        A = rng.randn(6, 6) + 10.0 * np.eye(6)
        b = rng.randn(6)
        want = np.linalg.solve(A, b)
        for fn in (gauss_solve6_ref, solve6):
            got = np.asarray(fn(jnp.asarray(A), jnp.asarray(b)))
            np.testing.assert_allclose(got, want, rtol=1e-10)


# ---------------------------------------------------------------------------
# electro stencil identities (ref: src/stencil_d3q*.c)

class TestPsiNeighbours:
    def test_gradient_of_linear_potential(self):
        from ludwig_tpu.electro_sim import make_psi_neighbours
        size = (8, 8, 8)
        up, dn = make_psi_neighbours(size, (0.0, 0.0, 0.0), "float64")
        z = np.arange(8, dtype=np.float64)
        psi = jnp.asarray(np.broadcast_to(z, size))
        # interior central difference of a (periodically wrapped)
        # linear ramp is exactly 1
        grad_z = 0.5 * (up(psi, 2) - dn(psi, 2))
        assert float(grad_z[0, 0, 4]) == pytest.approx(1.0)
