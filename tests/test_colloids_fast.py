"""Segment-sum colloid BBL vs the per-particle oracle."""

import jax.numpy as jnp
import numpy as np

from ludwig_tpu.colloids import (ColloidParams, bbl_step, build_map,
                                 refresh_inside)
from ludwig_tpu.colloids_fast import (bbl_step_fast, build_map_fast,
                                      solid_body_u)
from ludwig_tpu.lattice import lb_model
from ludwig_tpu.lb import LBConfig, initial_rest


def _setup(n=3):
    size = (16, 16, 16)
    cfg = LBConfig(size=size, nvel=19, eta_shear=0.1, dtype="float64")
    rng = np.random.RandomState(5)
    R = jnp.asarray(rng.uniform(3, 13, (n, 3)))
    V = jnp.asarray(0.01 * rng.standard_normal((n, 3)))
    W = jnp.asarray(0.005 * rng.standard_normal((n, 3)))
    params = ColloidParams(a0=(2.3,) * n, ah=(2.3,) * n)
    f = initial_rest(cfg)
    # give the fluid a little structure
    f = f + 1e-3 * jnp.asarray(rng.standard_normal(f.shape))
    return cfg, params, f, R, V, W


def test_build_map_fast_matches():
    cfg, params, f, R, V, W = _setup()
    pid_a, in_a = build_map(R, params, cfg.size)
    pid_b, in_b = build_map_fast(R, params, cfg.size)
    np.testing.assert_array_equal(np.asarray(in_a), np.asarray(in_b))
    np.testing.assert_array_equal(np.asarray(pid_a), np.asarray(pid_b))


def test_bbl_fast_matches_oracle():
    cfg, params, f, R, V, W = _setup()
    model = cfg.model
    pid, inside = build_map(R, params, cfg.size)
    ub = solid_body_u(R, V, W, pid, inside, cfg.size, f.dtype)
    f = refresh_inside(f, model, inside, ub)
    ext = jnp.asarray(np.random.RandomState(7).uniform(
        -1e-3, 1e-3, (params.n, 3)))

    f1, V1, W1, _, _ = bbl_step(f, R, V, W, model, params, cfg.size,
                                ext_force=ext)
    f2, V2, W2, _, _ = bbl_step_fast(f, R, V, W, model, params,
                                     cfg.size, ext_force=ext)
    np.testing.assert_allclose(np.asarray(V2), np.asarray(V1),
                               rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(np.asarray(W2), np.asarray(W1),
                               rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1),
                               rtol=1e-12, atol=1e-15)


def test_rr_seeds_fast_matches_oracle():
    """remove_replace_seeds_fast is bitwise vs remove_replace
    (per_image=True) - same per-image build seeds, same replaced f."""
    from ludwig_tpu.colloids import remove_replace
    from ludwig_tpu.colloids_fast import remove_replace_seeds_fast
    cfg, params, f, R, V, W = _setup(n=3)
    # old map at R, new map at R + small move (covers/uncovers sites)
    R2 = R + jnp.asarray([[0.4, -0.3, 0.2]] * params.n)
    pid_o, in_o = build_map(R, params, cfg.size)
    pid_n, in_n = build_map(R2, params, cfg.size)
    f1, seeds1 = remove_replace(f, R2, V, W, in_o, pid_o, in_n, pid_n,
                                cfg.model, params, cfg.size,
                                per_image=True)
    f2, seeds2 = remove_replace_seeds_fast(f, R2, in_o, pid_o, in_n,
                                           pid_n, cfg.model, params,
                                           cfg.size)
    np.testing.assert_array_equal(np.asarray(f2), np.asarray(f1))
    np.testing.assert_array_equal(np.asarray(seeds2), np.asarray(seeds1))


def test_bbl_exact_matches_oracle_bitwise():
    """bbl_step_exact (batched reference-order sums) is BITWISE equal
    to the per-particle oracle bbl_step, seeds included."""
    from ludwig_tpu.colloids import remove_replace
    from ludwig_tpu.colloids_fast import (bbl_step_exact,
                                          remove_replace_seeds_fast)
    cfg, params, f, R, V, W = _setup(n=3)
    model = cfg.model
    R2 = R + jnp.asarray([[0.4, -0.3, 0.2]] * params.n)
    pid_o, in_o = build_map(R, params, cfg.size)
    pid_n, in_n = build_map(R2, params, cfg.size)
    f1, seeds = remove_replace(f, R2, V, W, in_o, pid_o, in_n, pid_n,
                               model, params, cfg.size, per_image=True)
    ub = solid_body_u(R2, V, W, pid_n, in_n, cfg.size, f.dtype)
    f1 = refresh_inside(f1, model, in_n, ub)
    ext = jnp.asarray(np.random.RandomState(7).uniform(
        -1e-3, 1e-3, (params.n, 3)))

    fa, Va, Wa, _, _ = bbl_step(f1, R2, V, W, model, params, cfg.size,
                                ext_force=ext, rr_seeds=seeds)
    fb, Vb, Wb, _, _ = bbl_step_exact(f1, R2, V, W, model, params,
                                      cfg.size, ext_force=ext,
                                      rr_seeds=seeds)
    np.testing.assert_array_equal(np.asarray(Vb), np.asarray(Va))
    np.testing.assert_array_equal(np.asarray(Wb), np.asarray(Wa))
    np.testing.assert_array_equal(np.asarray(fb), np.asarray(fa))


def test_bbl_mxu_matches_fast():
    # the MXU (one-hot matmul) restructuring of the segment-sum BBL:
    # same values to rounding (shared-owner-gather + raw-moment zeta)
    from ludwig_tpu.colloids_fast import bbl_step_mxu
    cfg, params, f, R, V, W = _setup()
    model = cfg.model
    pid, inside = build_map(R, params, cfg.size)
    ub = solid_body_u(R, V, W, pid, inside, cfg.size, f.dtype)
    f = refresh_inside(f, model, inside, ub)
    rng = np.random.RandomState(11)
    ext = jnp.asarray(rng.uniform(-1e-3, 1e-3, (params.n, 3)))
    dm = jnp.asarray(rng.uniform(-1e-4, 1e-4, params.n))
    f0c = jnp.asarray(rng.uniform(-1e-4, 1e-4, (params.n, 3)))
    t0c = jnp.asarray(rng.uniform(-1e-4, 1e-4, (params.n, 3)))
    a = bbl_step_fast(f, R, V, W, model, params, cfg.size,
                      ext_force=ext, deltam=dm, f0_corr=f0c,
                      t0_corr=t0c)
    b = bbl_step_mxu(f, R, V, W, model, params, cfg.size,
                     ext_force=ext, deltam=dm, f0_corr=f0c,
                     t0_corr=t0c)
    for x, y in zip(a[:3], b[:3]):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=1e-11, atol=1e-14)


def test_rr_fast_consolidated_matches_seeds():
    """remove_replace_fast's consolidated (deltam, f0, t0) equal the
    per-image seeds summed over images, in both dtypes (the f32 route
    runs the MXU one-hot matmul reduction)."""
    from ludwig_tpu.colloids_fast import (remove_replace_fast,
                                          remove_replace_seeds_fast)
    cfg, params, f, R, V, W = _setup(n=3)
    R2 = R + jnp.asarray([[0.4, -0.3, 0.2]] * params.n)
    pid_o, in_o = build_map(R, params, cfg.size)
    pid_n, in_n = build_map(R2, params, cfg.size)
    fs, seeds = remove_replace_seeds_fast(f, R2, in_o, pid_o, in_n,
                                          pid_n, cfg.model, params,
                                          cfg.size)
    want = np.asarray(seeds).sum(axis=1)            # (N, 7)
    for dt in ("float64", "float32"):
        fc = f.astype(dt)
        f2, dm, f0c, t0c = remove_replace_fast(
            fc, R2.astype(dt), V.astype(dt), W.astype(dt), in_o, pid_o,
            in_n, pid_n, cfg.model, params, cfg.size)
        tol = 1e-12 if dt == "float64" else 2e-5
        np.testing.assert_allclose(np.asarray(dm), want[:, 0],
                                   rtol=tol, atol=tol)
        np.testing.assert_allclose(np.asarray(f0c), want[:, 1:4],
                                   rtol=tol, atol=tol)
        np.testing.assert_allclose(np.asarray(t0c), want[:, 4:7],
                                   rtol=tol, atol=tol)
        np.testing.assert_allclose(np.asarray(f2),
                                   np.asarray(fs).astype(dt),
                                   rtol=tol, atol=tol)


def test_bbl_mxu_squirmers_match_oracle():
    """Active (squirmer) suspensions on the MXU path: slip, active
    mass conservation (sump/fc0/tc0) and the pass-2 terms match the
    per-particle oracle (ref: bbl.c squirmer sections)."""
    from ludwig_tpu.colloids_fast import bbl_step_mxu
    size = (16, 16, 16)
    cfg = LBConfig(size=size, nvel=19, eta_shear=0.1, dtype="float64")
    rng = np.random.RandomState(5)
    n = 3
    R = jnp.asarray(rng.uniform(3, 13, (n, 3)))
    V = jnp.asarray(0.01 * rng.standard_normal((n, 3)))
    W = jnp.asarray(0.005 * rng.standard_normal((n, 3)))
    m = rng.standard_normal((n, 3))
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    params = ColloidParams(a0=(2.3,) * n, ah=(2.3,) * n,
                           b1=(0.02, 0.01, 0.0), b2=(0.01, -0.005, 0.03),
                           m=tuple(map(tuple, m)),
                           types=("active",) * n)
    model = cfg.model
    f = initial_rest(cfg)
    f = f + 1e-3 * jnp.asarray(rng.standard_normal(f.shape))
    pid, inside = build_map(R, params, cfg.size)
    from ludwig_tpu.colloids_fast import solid_body_u as sbu
    ub = sbu(R, V, W, pid, inside, cfg.size, f.dtype)
    f = refresh_inside(f, model, inside, ub)
    M = jnp.asarray(m)

    fa, Va, Wa, Ma, _ = bbl_step(f, R, V, W, model, params, cfg.size,
                                 M=M)
    fb, Vb, Wb, Mb, _ = bbl_step_mxu(f, R, V, W, model, params,
                                     cfg.size, M=M)
    np.testing.assert_allclose(np.asarray(Vb), np.asarray(Va),
                               rtol=1e-10, atol=1e-13)
    np.testing.assert_allclose(np.asarray(Wb), np.asarray(Wa),
                               rtol=1e-10, atol=1e-13)
    np.testing.assert_allclose(np.asarray(Mb), np.asarray(Ma),
                               rtol=1e-10, atol=1e-13)
    np.testing.assert_allclose(np.asarray(fb), np.asarray(fa),
                               rtol=1e-10, atol=1e-13)


def test_bbl_mxu_walls_match_oracle():
    """Wall-bounded suspensions on the MXU path: colloid-wall virtual
    links, wall momentum account and the lubrication drag diagonal
    match the per-particle oracle (ref: bbl.c pass1 'else' branch,
    :789-805 wall drag)."""
    from ludwig_tpu.colloids_fast import bbl_step_mxu
    size = (16, 16, 16)
    cfg = LBConfig(size=size, nvel=19, eta_shear=0.1, dtype="float64")
    rng = np.random.RandomState(9)
    n = 3
    # one particle close to the x wall so wall links exist
    R = jnp.asarray(np.array([[2.6, 8.0, 8.0],
                              [13.4, 5.0, 11.0],
                              [8.0, 12.0, 4.0]]))
    V = jnp.asarray(0.01 * rng.standard_normal((n, 3)))
    W = jnp.asarray(0.005 * rng.standard_normal((n, 3)))
    params = ColloidParams(a0=(2.3,) * n, ah=(2.3,) * n)
    model = cfg.model
    f = initial_rest(cfg)
    f = f + 1e-3 * jnp.asarray(rng.standard_normal(f.shape))
    pid, inside = build_map(R, params, cfg.size)
    from ludwig_tpu.colloids_fast import solid_body_u as sbu
    ub = sbu(R, V, W, pid, inside, cfg.size, f.dtype)
    f = refresh_inside(f, model, inside, ub)
    walls = (True, False, False)
    dwall = jnp.asarray(rng.uniform(-0.2, 0.0, (n, 3)))

    fa, Va, Wa, _, gwa = bbl_step(f, R, V, W, model, params, cfg.size,
                                  walls=walls, wall_drag=dwall)
    fb, Vb, Wb, _, gwb = bbl_step_mxu(f, R, V, W, model, params,
                                      cfg.size, walls=walls,
                                      wall_drag=dwall)
    np.testing.assert_allclose(np.asarray(Vb), np.asarray(Va),
                               rtol=1e-10, atol=1e-13)
    np.testing.assert_allclose(np.asarray(Wb), np.asarray(Wa),
                               rtol=1e-10, atol=1e-13)
    np.testing.assert_allclose(np.asarray(gwb), np.asarray(gwa),
                               rtol=1e-10, atol=1e-13)
    np.testing.assert_allclose(np.asarray(fb), np.asarray(fa),
                               rtol=1e-10, atol=1e-13)
