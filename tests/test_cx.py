"""Split re/im (C2) representation: parity with native complex.

The TPU path stores complex fields as C2 pairs of real arrays (no
native complex on TPU).  These tests run the *same kernels* in both
representations on CPU/x64 and require bit-tolerance agreement.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from emg3d_tpu import (TensorMesh, Model, SourceField, VolumeModel, cx,
                       solve)
from emg3d_tpu.ops import smoothers, stencil, transfers


def _setup(shape=(6, 4, 4), seed=3):
    rng = np.random.default_rng(seed)
    grid = TensorMesh([rng.uniform(20, 40, n) for n in shape])
    model = Model(grid, property_x=rng.uniform(.1, 10, grid.shape_cells),
                  mu_r=rng.uniform(.5, 2, grid.shape_cells))
    sfield = SourceField.zeros(grid, frequency=0.9)
    sfield.fx[2, 2, 2] = 1 + 0.5j
    vm = VolumeModel(grid, model, sfield)
    par_n = tuple(jnp.asarray(a) for a in (
        vm.eta_x, vm.eta_y, vm.eta_z, vm.zeta,
        grid.h[0], grid.h[1], grid.h[2]))
    s_n = tuple(jnp.asarray(f) for f in (sfield.fx, sfield.fy, sfield.fz))
    par_s = tuple(cx.aspair(a) if np.iscomplexobj(np.asarray(a))
                  else jnp.asarray(a) for a in par_n)
    s_s = tuple(cx.aspair(np.asarray(f)) for f in s_n)
    return par_n, s_n, par_s, s_s


def _cmp(out_n, out_s, tol=1e-11):
    for a, b in zip(out_n, out_s):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(cx.tocomplex(b)), atol=tol,
            rtol=tol)


def test_c2_arithmetic():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(4, 5)) + 1j * rng.normal(size=(4, 5))
    b = rng.normal(size=(4, 5)) + 1j * rng.normal(size=(4, 5))
    r = rng.normal(size=(4, 5))
    A, B = cx.aspair(a), cx.aspair(b)
    np.testing.assert_allclose(np.asarray(cx.tocomplex(A * B)), a * b)
    np.testing.assert_allclose(np.asarray(cx.tocomplex(A / B)), a / b,
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(cx.tocomplex(A + B)), a + b)
    np.testing.assert_allclose(np.asarray(cx.tocomplex(A - r)), a - r)
    np.testing.assert_allclose(np.asarray(cx.tocomplex(r - A)), r - a)
    np.testing.assert_allclose(np.asarray(cx.tocomplex(1.0 / A)), 1 / a,
                               rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(cx.tocomplex(A * (2 - 3j))), a * (2 - 3j))
    # at-set with real must zero the imaginary part.
    C = A.at[0, 0].set(1.0)
    assert np.asarray(C.im)[0, 0] == 0.0


def test_stencil_split_parity():
    par_n, s_n, par_s, s_s = _setup()
    e_n = tuple(jnp.zeros_like(x) for x in s_n)
    e_s = tuple(cx.zeros_like(x) for x in s_s)
    # Nonzero field: use the source as a field.
    _cmp(stencil.residual_parts(*s_n, *s_n, *par_n),
         stencil.residual_parts(*s_s, *s_s, *par_s))
    del e_n, e_s


@pytest.mark.parametrize("kind", ['point', 'line0', 'line1', 'line2'])
def test_smoother_split_parity(kind):
    par_n, s_n, par_s, s_s = _setup()
    e_n = tuple(jnp.zeros_like(x) for x in s_n)
    e_s = tuple(cx.zeros_like(x) for x in s_s)
    if kind == 'point':
        out_n = smoothers.gauss_seidel_point(*e_n, *s_n, *par_n, nu=2)
        out_s = smoothers.gauss_seidel_point(*e_s, *s_s, *par_s, nu=2)
    else:
        ax = int(kind[-1])
        out_n = smoothers.line_relaxation(*e_n, *s_n, *par_n, nu=2,
                                          axis=ax)
        out_s = smoothers.line_relaxation(*e_s, *s_s, *par_s, nu=2,
                                          axis=ax)
    _cmp(out_n, out_s)


def test_solve_split_parity(monkeypatch):
    """Full solve in split mode matches native within tolerance."""
    monkeypatch.setenv('EMG3D_TPU_SPLIT', '1')
    rng = np.random.default_rng(11)
    grid = TensorMesh([np.full(8, 100.)] * 3)
    model = Model(grid, property_x=rng.uniform(0.5, 5, grid.shape_cells))
    sfield = SourceField.zeros(grid, frequency=1.0)
    sfield.fx[4, 4, 4] = 1.0
    es, infos = solve(grid, model, sfield, cycle='F', verb=1,
                      return_info=True)
    assert infos['exit_message'] == 'CONVERGED'
    monkeypatch.setenv('EMG3D_TPU_SPLIT', '0')
    en, infon = solve(grid, model, sfield, cycle='F', verb=1,
                      return_info=True)
    rel = (np.linalg.norm(es.field - en.field) /
           np.linalg.norm(en.field))
    assert rel < 1e-7
