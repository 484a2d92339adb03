"""Pillar-decomposed colloid build/reduction (colloids_fast cube path).

The cube path is the f32 production BBL fast path (ref: build.c:75
build_update_map cell lists, bbl.c pass1 reductions); these tests pin
it against the scatter-based builders, over radius/extent combinations
where particle windows do and do NOT straddle pillar boundaries (the
round-4 double-count regression hit the non-straddling case: a0=1.25,
cube=8 > w-1=6, so a window can sit entirely inside one pillar and its
particle was binned twice; ADVICE r4 high finding).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ludwig_tpu.colloids import ColloidParams
from ludwig_tpu.colloids_fast import (build_map_cubes, build_map_fast,
                                      cube_fold, cubes_count_max,
                                      cubes_supported, seg_cols_cubes,
                                      seg_cols_mxu)


def _params(n, a0, size, seed=3):
    rng = np.random.default_rng(seed)
    R = rng.uniform(0, 1, (n, 3)) * np.array(size)
    return (ColloidParams(a0=(a0,) * n, ah=(a0,) * n),
            jnp.asarray(R, jnp.float32))


@pytest.mark.parametrize("a0,size", [
    (1.25, (32, 32, 32)),     # cube=8 > w-1=6: windows can sit inside
    (2.3, (32, 32, 64)),      # cube=8 == w-1: windows always straddle
    (1.25, (8, 8, 32)),       # ncx=ncy=1: every corner wraps onto one
])
def test_build_map_cubes_matches_fast(a0, size):
    n = 20
    params, R = _params(n, a0, size)
    cube = cubes_supported(params, size)
    assert cube is not None
    pid_c, inside_c, cand = build_map_cubes(R, params, size, cube=cube,
                                            return_cands=True)
    pid_f, inside_f = build_map_fast(R, params, size)
    np.testing.assert_array_equal(np.asarray(inside_c),
                                  np.asarray(inside_f))
    np.testing.assert_array_equal(np.asarray(pid_c), np.asarray(pid_f))

    # each particle id appears AT MOST ONCE per pillar candidate list
    # (duplicates double-count the BBL reduction in seg_cols_cubes)
    c = np.asarray(cand)
    for p in range(c.shape[0]):
        real = c[p][c[p] < n]
        assert len(real) == len(set(real)), (p, sorted(real))


@pytest.mark.parametrize("a0,size", [
    (1.25, (32, 32, 32)),
    (2.3, (32, 32, 64)),
    (1.25, (8, 8, 32)),
])
def test_seg_cols_cubes_matches_mxu(a0, size):
    """The pillar-local one-hot reduction == the global one-hot matmul
    on the same (cols, ids) - exactly the BBL reduction contract."""
    n = 20
    params, R = _params(n, a0, size)
    cube = cubes_supported(params, size)
    pid, inside, cand = build_map_cubes(R, params, size, cube=cube,
                                        return_cands=True)
    rng = np.random.default_rng(11)
    C = 7
    cols = jnp.asarray(rng.standard_normal((C,) + size), jnp.float32)
    # segment ids: the owning particle at inside sites, n at fluid
    ids = jnp.where(inside, pid, n).astype(jnp.int32)
    ref = seg_cols_mxu(cols.reshape(C, -1),
                       ids.reshape(-1), n + 1)
    got = seg_cols_cubes(cols, ids, cand, size, cube, n + 1)
    np.testing.assert_allclose(np.asarray(got)[:, :n],
                               np.asarray(ref)[:, :n],
                               rtol=2e-5, atol=2e-4)


def test_cubes_count_max_bounds_candidates():
    size = (32, 32, 32)
    params, R = _params(50, 1.25, size, seed=9)
    cube = cubes_supported(params, size)
    need = cubes_count_max(R, params, size, cube)
    _, _, cand = build_map_cubes(R, params, size, cube=cube,
                                 cap=min(50, need), return_cands=True)
    counts = np.asarray((cand < 50).sum(axis=1))
    assert counts.max() == need


def test_cube_fold_roundtrip_order():
    size = (16, 8, 32)
    cube = 8
    X, Y, Z = size
    arr = jnp.arange(X * Y * Z, dtype=jnp.float32).reshape(size)
    folded = cube_fold(arr, size, cube)
    ncx, ncy = X // cube, Y // cube
    assert folded.shape == (ncx * ncy, cube * cube * Z)
    # pillar (1, 0), local site (2, 3, 4) == global (10, 3, 4)
    pil = 1 * ncy + 0
    loc = (2 * cube + 3) * Z + 4
    assert float(folded[pil, loc]) == float(arr[10, 3, 4])
