"""Unit tests for the lattice model tables (mirrors reference
tests/unit/test_lb_model.c coverage: moments, orthogonality, inverses)."""

import numpy as np
import pytest

from ludwig_tpu.lattice import CS2, lb_model, model_from_name

MODELS = [9, 15, 19, 27]


@pytest.mark.parametrize("nvel", MODELS)
def test_basic_shapes(nvel):
    m = lb_model(nvel)
    assert m.cv.shape == (nvel, 3)
    assert m.wv.shape == (nvel,)
    assert m.ma.shape == (nvel, nvel)
    assert m.nhydro == 1 + m.ndim + m.ndim * (m.ndim + 1) // 2


@pytest.mark.parametrize("nvel", MODELS)
def test_weights_and_moments(nvel):
    m = lb_model(nvel)
    c = m.cv.astype(float)
    w = m.wv
    # zeroth, first and second moment identities for cs^2 = 1/3
    assert np.isclose(w.sum(), 1.0)
    assert np.allclose(w @ c, 0.0)
    second = np.einsum("p,pa,pb->ab", w, c, c)
    expect = CS2 * np.eye(3)
    if m.ndim == 2:
        expect[2, 2] = 0.0
    assert np.allclose(second, expect)
    # third moment vanishes, fourth is isotropic
    assert np.allclose(np.einsum("p,pa,pb,pc->abc", w, c, c, c), 0.0)
    fourth = np.einsum("p,pa,pb,pc,pd->abcd", w, c, c, c, c)
    d = np.eye(3)
    if m.ndim == 2:
        d[2, 2] = 0.0
    iso = CS2 * CS2 * (np.einsum("ab,cd->abcd", d, d)
                       + np.einsum("ac,bd->abcd", d, d)
                       + np.einsum("ad,bc->abcd", d, d))
    assert np.allclose(fourth, iso)


@pytest.mark.parametrize("nvel", MODELS)
def test_velocity_ordering(nvel):
    m = lb_model(nvel)
    assert (m.cv[0] == 0).all()
    # opposite pairing cv[nvel-p] = -cv[p]
    assert (m.cv[m.reverse] == -m.cv).all()
    # descending lexicographic order for the moving velocities
    lex = [tuple(v) for v in m.cv[1:]]
    assert lex == sorted(lex, reverse=True)


@pytest.mark.parametrize("nvel", MODELS)
def test_mode_matrix_orthogonality(nvel):
    m = lb_model(nvel)
    # weighted orthogonality: sum_p wv[p] ma[i][p] ma[j][p] = delta_ij / na[i]
    gram = np.einsum("p,ip,jp->ij", m.wv, m.ma, m.ma)
    assert np.allclose(gram, np.diag(1.0 / m.na), atol=1e-12)
    # mi really is the inverse
    assert np.allclose(m.mi @ m.ma, np.eye(nvel), atol=1e-12)
    assert np.allclose(m.ma @ m.mi, np.eye(nvel), atol=1e-12)


@pytest.mark.parametrize("nvel", MODELS)
def test_hydro_rows(nvel):
    m = lb_model(nvel)
    c = m.cv.astype(float)
    nd = m.ndim
    assert np.allclose(m.ma[0], 1.0)
    for a in range(nd):
        assert np.allclose(m.ma[1 + a], c[:, a])
    k = 1 + nd
    for a in range(nd):
        for b in range(a, nd):
            expect = c[:, a] * c[:, b] - (CS2 if a == b else 0.0)
            assert np.allclose(m.ma[k], expect)
            k += 1


def test_model_from_name():
    assert model_from_name("d3q19").nvel == 19
    assert model_from_name("D2Q9").nvel == 9
    with pytest.raises(ValueError):
        lb_model(7)
