"""Fused Pallas line smoother: parity with the XLA path (interpreter).

The Thomas/residual kernels are exercised in Pallas interpreter mode
here (CPU suite); hardware lowering is verified by bench runs on the
TPU.  The XLA line_relaxation path is golden-validated, so agreement
to f32 rounding transfers that validation to the kernels.
"""
import numpy as np
import pytest

from emg3d_tpu import cx
from emg3d_tpu.ops import smoothers
from emg3d_tpu.ops.pallas_lr import (line_relaxation_pallas,
                                     line_factors, supported)

from test_pallas_gs import _setup


@pytest.mark.parametrize('shape,tune', [
    ((12, 8, 8), {}),
    # _ty=16 -> to=8 owned lines: 2 aligned y tiles at ny=10.
    ((16, 10, 6), dict(_ty=16, _chx=4)),
    ((9, 7, 9), dict(_tx=3, _chx=3)),
])
def test_pallas_line_x_matches_xla(shape, tune):
    e, s, par = _setup(shape)
    ref = smoothers.line_relaxation(*e, *s, *par, nu=2, axis=0)
    out = line_relaxation_pallas(e, s, par, nu=2, shape=shape, axis=0,
                                 interpret=True, **tune)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(
            np.asarray(cx.tocomplex(b)), np.asarray(cx.tocomplex(a)),
            atol=2e-5)


@pytest.mark.parametrize('axis', [1, 2])
def test_pallas_line_rotated_axes(axis):
    shape = (10, 9, 8)
    e, s, par = _setup(shape, seed=11)
    ref = smoothers.line_relaxation(*e, *s, *par, nu=1, axis=axis)
    fs = line_factors(par, shape, axis)
    out = line_relaxation_pallas(e, s, par, nu=1, shape=shape,
                                 axis=axis, fstack=fs, interpret=True)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(
            np.asarray(cx.tocomplex(b)), np.asarray(cx.tocomplex(a)),
            atol=2e-5)


@pytest.mark.slow
def test_solver_dispatches_pallas_line(monkeypatch):
    """_level_fstacks + _smooth route lr sweeps through the kernel.

    Force-enables the Pallas gate on CPU (the kernel then runs in
    interpreter mode via line_relaxation_pallas's backend default) and
    checks the dispatched result against the XLA path.
    """
    import jax.numpy as jnp
    from emg3d_tpu import TensorMesh, Model, SourceField, VolumeModel
    from emg3d_tpu import solver
    from emg3d_tpu.ops import pallas_gs

    monkeypatch.setattr(pallas_gs, '_ENABLED', True)

    shape = (12, 8, 8)
    rng = np.random.default_rng(5)
    grid = TensorMesh([rng.uniform(50, 150, n) for n in shape])
    model = Model(grid, property_x=rng.uniform(.1, 10,
                                               grid.shape_cells))
    sfield = SourceField.zeros(grid, frequency=0.9)
    sfield.fx[6, 4, 4] = 1 + 0.5j
    vm = VolumeModel(grid, model, sfield)
    lev = solver.build_levels(grid, vm, sc_dir=0, clevel=0,
                              dtype=np.complex64, split=True)[0]
    s = tuple(cx.aspair(np.asarray(f), dtype=jnp.float32)
              for f in (sfield.fx, sfield.fy, sfield.fz))
    e = tuple(cx.zeros_like(x) for x in s)

    fst = solver._level_fstacks(lev, lr_dir=1)
    assert fst is not None and fst[0] is not None
    out = solver._smooth(e, s, lev.arrays, nu=2, lr_dir=1, shape=shape,
                         fstacks=fst)
    ref = smoothers.line_relaxation(*e, *s, *lev.arrays, nu=2, axis=0)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(
            np.asarray(cx.tocomplex(b)), np.asarray(cx.tocomplex(a)),
            atol=2e-5)
    # Factor stacks are cached on the level (keyed by axis + stream
    # dtype).
    assert (0, None) in lev.fstacks

    # Rotated axis: the cache also carries pre-rotated parameters.
    fst_y = solver._level_fstacks(lev, lr_dir=2)
    assert fst_y[1] is not None and fst_y[1][1] is not None
    out_y = solver._smooth(e, s, lev.arrays, nu=1, lr_dir=2,
                           shape=shape, fstacks=fst_y)
    ref_y = smoothers.line_relaxation(*e, *s, *lev.arrays, nu=1,
                                      axis=1)
    for a, b in zip(ref_y, out_y):
        np.testing.assert_allclose(
            np.asarray(cx.tocomplex(b)), np.asarray(cx.tocomplex(a)),
            atol=2e-5)

    # 256³-class policy: a stack over the f32 cache limit is stored
    # bfloat16 (half the streaming bytes; fixed point exact).
    monkeypatch.setattr(solver, '_FSTACK_CACHE_BYTES', 0)
    lev.fstacks.clear()
    fst_bf = solver._level_fstacks(lev, lr_dir=1)
    assert fst_bf[0][0].dtype == jnp.bfloat16
    out_bf = solver._smooth(e, s, lev.arrays, nu=2, lr_dir=1,
                            shape=shape, fstacks=fst_bf)
    for a, b in zip(out, out_bf):
        da = np.asarray(cx.tocomplex(a))
        db = np.asarray(cx.tocomplex(b))
        assert (np.linalg.norm(db - da) /
                max(np.linalg.norm(da), 1e-30)) < 2e-2

    # Over even the bf16 eviction budget: the inline sentinel () and
    # the dispatch recomputes factors in-jit (stored bf16 — the
    # sentinel only ever stands for a meter-declined big stack).
    monkeypatch.setattr(solver, '_FSTACK_EVICT_BYTES', 0)
    lev.fstacks.clear()
    fst2 = solver._level_fstacks(lev, lr_dir=1)
    assert fst2[0][0] == ()
    out2 = solver._smooth(e, s, lev.arrays, nu=2, lr_dir=1,
                          shape=shape, fstacks=fst2)
    for a, b in zip(out, out2):
        da = np.asarray(cx.tocomplex(a))
        db = np.asarray(cx.tocomplex(b))
        assert (np.linalg.norm(db - da) /
                max(np.linalg.norm(da), 1e-30)) < 2e-2


@pytest.mark.slow
def test_forced_residual_y_tiling_matches_untiled():
    """_tyr forces residual y-slabs; result must equal the untiled
    kernel exactly (same math on the same loaded values)."""
    shape = (8, 40, 8)
    e, s, par = _setup(shape, seed=3)
    ref = line_relaxation_pallas(e, s, par, nu=2, shape=shape, axis=0,
                                 interpret=True)
    out = line_relaxation_pallas(e, s, par, nu=2, shape=shape, axis=0,
                                 interpret=True, _tyr=16)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(
            np.asarray(cx.tocomplex(b)), np.asarray(cx.tocomplex(a)),
            atol=1e-6)
    xla = smoothers.line_relaxation(*e, *s, *par, nu=2, axis=0)
    for a, b in zip(xla, out):
        np.testing.assert_allclose(
            np.asarray(cx.tocomplex(b)), np.asarray(cx.tocomplex(a)),
            atol=2e-5)


@pytest.mark.slow
def test_forced_thomas_z_tiling_matches_untiled():
    """_tz forces Thomas z-slabs (the 256³-class configuration: TZ a
    multiple of 128 >= 256, toz = TZ - 128 owned lines at 128-aligned
    lane offsets); result must equal the untiled kernel."""
    shape = (8, 6, 260)                 # Zp0 = 384 > TZ = 256
    e, s, par = _setup(shape, seed=4)
    ref = line_relaxation_pallas(e, s, par, nu=2, shape=shape, axis=0,
                                 interpret=True)
    out = line_relaxation_pallas(e, s, par, nu=2, shape=shape, axis=0,
                                 interpret=True, _tz=256)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(
            np.asarray(cx.tocomplex(b)), np.asarray(cx.tocomplex(a)),
            atol=1e-6)
    xla = smoothers.line_relaxation(*e, *s, *par, nu=2, axis=0)
    for a, b in zip(xla, out):
        np.testing.assert_allclose(
            np.asarray(cx.tocomplex(b)), np.asarray(cx.tocomplex(a)),
            atol=2e-5)


def test_bf16_factor_stack_close_to_f32():
    """bfloat16-stored factors perturb the update by O(2^-8) only."""
    import jax.numpy as jnp
    shape = (12, 8, 8)
    e, s, par = _setup(shape, seed=9)
    fs32 = line_factors(par, shape, 0)
    fsbf = line_factors(par, shape, 0, fdtype=jnp.bfloat16)
    assert fsbf.dtype == jnp.bfloat16
    ref = line_relaxation_pallas(e, s, par, nu=2, shape=shape, axis=0,
                                 fstack=fs32, interpret=True)
    out = line_relaxation_pallas(e, s, par, nu=2, shape=shape, axis=0,
                                 fstack=fsbf, interpret=True)
    for a, b in zip(ref, out):
        da = np.asarray(cx.tocomplex(a))
        db = np.asarray(cx.tocomplex(b))
        rel = np.linalg.norm(db - da) / max(np.linalg.norm(da), 1e-30)
        assert rel < 2e-2, rel


def test_supported_gate():
    e, s, par = _setup((12, 8, 8))
    assert supported(e, (12, 8, 8))
    assert not supported(e, (4, 8, 8))
    assert not supported(tuple(cx.tocomplex(c) for c in e), (12, 8, 8))


@pytest.mark.slow
def test_chunked_factor_build_matches_one_shot():
    """zsplit builds the factor stack in transverse chunks (256^3-class
    HBM transient control); per-line eliminations are independent, so
    the result is exact up to XLA fusion reassociation."""
    import jax.numpy as jnp
    shape = (8, 10, 24)
    _, _, par = _setup(shape, seed=5)
    par64 = tuple(cx.C2(a.re.astype(jnp.float64),
                        a.im.astype(jnp.float64))
                  if cx.is_c2(a) else a.astype(jnp.float64)
                  for a in par)
    f1 = line_factors(par64, shape, 0, zsplit=1)
    scale = float(jnp.max(jnp.abs(f1)))
    for zs in (2, 3, 5):
        fz = line_factors(par64, shape, 0, zsplit=zs)
        assert float(jnp.max(jnp.abs(f1 - fz))) / scale < 1e-12


def test_bf16_sp_streams_line_close_to_f32():
    """bfloat16 s/params streaming through the line residual kernel."""
    import jax.numpy as jnp
    shape = (12, 8, 8)
    e, s, par = _setup(shape, seed=8)
    ref = line_relaxation_pallas(e, s, par, nu=2, shape=shape, axis=0,
                                 interpret=True)
    out = line_relaxation_pallas(e, s, par, nu=2, shape=shape, axis=0,
                                 interpret=True, _sp_dt=jnp.bfloat16)
    for a, b in zip(ref, out):
        da = np.asarray(cx.tocomplex(a))
        db = np.asarray(cx.tocomplex(b))
        rel = np.linalg.norm(db - da) / max(np.linalg.norm(da), 1e-30)
        assert rel < 2e-2, rel
