"""Fused Pallas smoother: parity with the XLA path (interpreter).

The kernel itself is exercised in Pallas interpreter mode here (CPU
suite); on TPU hardware it currently requires lane-aligned grid
extents (Mosaic restriction on unaligned vector slices) — tracked as
the next optimization step; the XLA path remains the default.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from emg3d_tpu import TensorMesh, Model, SourceField, VolumeModel, cx
from emg3d_tpu.ops import smoothers
from emg3d_tpu.ops.pallas_gs import gauss_seidel_point_pallas, supported


def _setup(shape, seed=3):
    rng = np.random.default_rng(seed)
    grid = TensorMesh([rng.uniform(50, 150, n) for n in shape])
    model = Model(grid, property_x=rng.uniform(.1, 10,
                                               grid.shape_cells))
    sfield = SourceField.zeros(grid, frequency=0.9)
    sfield.fx[shape[0]//2, shape[1]//2, shape[2]//2] = 1 + 0.5j
    vm = VolumeModel(grid, model, sfield)
    par = tuple(
        cx.aspair(np.asarray(a), dtype=jnp.float32)
        if np.iscomplexobj(np.asarray(a))
        else jnp.asarray(np.asarray(a), dtype=jnp.float32)
        for a in (vm.eta_x, vm.eta_y, vm.eta_z, vm.zeta,
                  grid.h[0], grid.h[1], grid.h[2]))
    s = tuple(cx.aspair(np.asarray(f), dtype=jnp.float32)
              for f in (sfield.fx, sfield.fy, sfield.fz))
    e = tuple(cx.zeros_like(x) for x in s)
    return e, s, par


@pytest.mark.parametrize('shape,tx,tyl', [
    ((12, 8, 8), None, None),
    ((21, 8, 8), 5, None),
    ((16, 10, 6), 4, None),
    # y-tiled slabs (the 128³-class layout): 8 owned rows per tile.
    ((12, 20, 8), 3, 16),
    ((10, 17, 6), None, 16),
])
def test_pallas_matches_xla(shape, tx, tyl):
    e, s, par = _setup(shape)
    assert supported(e)
    ref = smoothers.gauss_seidel_point(*e, *s, *par, nu=2)
    out = gauss_seidel_point_pallas(e, s, par, nu=2, shape=shape,
                                    interpret=True, _tx=tx, _tyl=tyl)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(
            np.asarray(cx.tocomplex(b)), np.asarray(cx.tocomplex(a)),
            atol=1e-5)


def test_pallas_single_color_exact():
    shape = (12, 8, 8)
    e, s, par = _setup(shape, seed=7)
    from emg3d_tpu.ops.blocksolve import ldl_factor_sparse
    from emg3d_tpu.ops.coeffs import (node_block_entries,
                                      node_coefficients)
    fact = ldl_factor_sparse(6, node_block_entries(
        node_coefficients(*par)))
    for color in (0, 3, 7):
        ref = smoothers._point_color_update(e, s, par, fact, color)
        out = gauss_seidel_point_pallas(e, s, par, nu=1, shape=shape,
                                        interpret=True, _seq=(color,))
        for a, b in zip(ref, out):
            np.testing.assert_allclose(
                np.asarray(cx.tocomplex(b)),
                np.asarray(cx.tocomplex(a)), atol=5e-6)


def test_infeasible_shape_falls_back_to_xla(monkeypatch):
    """A shape whose kernel cannot compile must degrade to the XLA
    smoother (round-2 lesson: BENCH_r02 crashed on a stale VMEM gate).

    On the CPU backend every hardware Mosaic compile fails, so forcing
    ``enabled()`` on exercises the full probe walk-down ending in a
    False verdict — and the solver dispatch must then not touch the
    Pallas kernel at all.
    """
    from emg3d_tpu.ops import pallas_gs
    from emg3d_tpu import solver

    shape = (8, 8, 8)
    e, s, par = _setup(shape)

    monkeypatch.setattr(pallas_gs, '_ENABLED', True)
    monkeypatch.setattr(pallas_gs, '_mosaic_target', lambda: True)
    monkeypatch.setattr(pallas_gs, '_POINT_OK', {})
    monkeypatch.setattr(pallas_gs, '_TILE_OVERRIDE', {})
    # The walk-down mutates the resident pattern verdict and per-shape
    # disables — isolate them so later tests see a fresh module state.
    monkeypatch.setattr(pallas_gs, '_RESIDENT_PATTERN', [None])
    monkeypatch.setattr(pallas_gs, '_RESIDENT_OFF', set())

    assert pallas_gs.point_probe(shape, risk_fraction=0.0) is False
    assert pallas_gs.supported_shape(shape) is False

    def boom(*a, **k):
        raise AssertionError("Pallas kernel dispatched for an "
                             "infeasible shape")

    monkeypatch.setattr(pallas_gs, 'gauss_seidel_point_pallas', boom)
    out = solver._smooth(e, s, par, nu=1, lr_dir=0, shape=shape)
    ref = smoothers.gauss_seidel_point(*e, *s, *par, nu=1)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(cx.tocomplex(b)),
                                   np.asarray(cx.tocomplex(a)))


def test_probe_trusts_low_risk_and_caches(monkeypatch):
    """Shapes far under the VMEM budget are trusted without compiling;
    verdicts are cached per process."""
    from emg3d_tpu.ops import pallas_gs

    monkeypatch.setattr(pallas_gs, '_ENABLED', True)
    monkeypatch.setattr(pallas_gs, '_POINT_OK', {})

    calls = []
    monkeypatch.setattr(pallas_gs, '_try_compile',
                        lambda *a: calls.append(a))
    assert pallas_gs.point_probe((8, 8, 8)) is True   # low risk
    assert calls == []
    assert pallas_gs.point_probe((8, 8, 8)) is True   # cached
    assert pallas_gs.supported_shape((8, 8, 8)) is True


def test_bf16_sp_streams_close_to_f32():
    """bfloat16 s/params streaming (correction-form smoothing only)
    perturbs the update by O(2^-8); the fixed point is untouched
    because the outer residual stays f32 (solver gating)."""
    shape = (12, 10, 8)
    e, s, par = _setup(shape, seed=6)
    ref = gauss_seidel_point_pallas(e, s, par, nu=2, shape=shape,
                                    interpret=True)
    out = gauss_seidel_point_pallas(e, s, par, nu=2, shape=shape,
                                    interpret=True,
                                    _sp_dt=jnp.bfloat16)
    for a, b in zip(ref, out):
        da = np.asarray(cx.tocomplex(a))
        db = np.asarray(cx.tocomplex(b))
        rel = np.linalg.norm(db - da) / max(np.linalg.norm(da), 1e-30)
        assert rel < 2e-2, rel


class TestResident:
    """VMEM-resident kernel variant (see pallas_gs._kernel_resident):
    the whole padded state stays in VMEM across every color step, so
    per-step HBM re-streaming disappears.  Parity with the streaming
    kernel to ULP-level tolerance — same update math, different data
    movement."""

    def _both(self, shape, seed=3, nu=2, sp_dt=None):
        from emg3d_tpu.ops import pallas_gs
        e, s, par = _setup(shape, seed=seed)
        assert pallas_gs._resident_plan(shape) is not None
        res = gauss_seidel_point_pallas(e, s, par, nu=nu, shape=shape,
                                        interpret=True, _sp_dt=sp_dt)
        try:
            pallas_gs._RESIDENT_OFF.add(tuple(shape))
            gauss_seidel_point_pallas.clear_cache()
            stream = gauss_seidel_point_pallas(
                e, s, par, nu=nu, shape=shape, interpret=True,
                _sp_dt=sp_dt)
        finally:
            pallas_gs._RESIDENT_OFF.discard(tuple(shape))
            gauss_seidel_point_pallas.clear_cache()
        return res, stream

    def _close(self, stream, res):
        # Same math, different data movement: XLA may contract FMAs
        # differently between the two lowerings, so parity is to a
        # few-ULP norm tolerance (measured rel ~1e-6 over nu=2), not
        # bitwise.
        for a, b in zip(stream, res):
            a = np.asarray(cx.tocomplex(a))
            b = np.asarray(cx.tocomplex(b))
            rel = (np.linalg.norm(b - a)
                   / max(np.linalg.norm(a), 1e-30))
            assert rel < 1e-5, rel

    @pytest.mark.parametrize('shape', [
        (12, 8, 8),
        (20, 8, 8),        # multiple x tiles (tx=16 -> 2 tiles)
        (16, 10, 6),       # padded y/z extents
        (2, 2, 2),         # coarsest-level class: tx clamps to nx-1
        (4, 4, 4),
    ])
    def test_matches_streaming_kernel(self, shape):
        res, stream = self._both(shape)
        self._close(stream, res)

    def test_matches_streaming_bf16_streams(self):
        # With bf16 s/p streams the STREAMING kernel derives its
        # coefficients from the bf16-ROUNDED param stack, while the
        # resident factor stack is computed from the f32 arrays
        # (pack_factors) — resident is the more accurate smoother, so
        # parity is at the bf16 input-rounding level, not ULP.
        res, stream = self._both((12, 10, 8), seed=6,
                                 sp_dt=jnp.bfloat16)
        for a, b in zip(stream, res):
            a = np.asarray(cx.tocomplex(a))
            b = np.asarray(cx.tocomplex(b))
            rel = (np.linalg.norm(b - a)
                   / max(np.linalg.norm(a), 1e-30))
            assert rel < 5e-3, rel

    def test_plan_rejects_oversized_state(self):
        from emg3d_tpu.ops import pallas_gs
        # 128^3-class padded state (~380 MB f32) cannot be resident.
        assert pallas_gs._resident_plan((128, 128, 128)) is None
        # 64^3 fits with bf16 streams (the production correction-form
        # mode) and bf16 factors; the all-f32 state does not.
        plan = pallas_gs._resident_plan((64, 64, 64), sp_bytes=2)
        assert plan is not None and plan[2] == 'bfloat16'
        assert pallas_gs._resident_plan((32, 32, 32))[2] is None  # f32
        assert pallas_gs._resident_plan((64, 64, 64), sp_bytes=4) \
            is None

    def test_probe_failure_disables_pattern(self, monkeypatch):
        """A failing resident compile must (a) globally disable the
        pattern and (b) leave the shape usable via the streaming
        kernel."""
        from emg3d_tpu.ops import pallas_gs

        shape = (12, 8, 8)
        monkeypatch.setattr(pallas_gs, '_ENABLED', True)
        monkeypatch.setattr(pallas_gs, '_mosaic_target', lambda: True)
        monkeypatch.setattr(pallas_gs, '_POINT_OK', {})
        monkeypatch.setattr(pallas_gs, '_RESIDENT_OFF', set())
        monkeypatch.setattr(pallas_gs, '_RESIDENT_PATTERN', [None])

        attempts = []

        def fake_compile(shp, dt, tx, tyl):
            resident = (pallas_gs._resident_plan(shp) is not None
                        and tuple(shp) not in pallas_gs._RESIDENT_OFF
                        and tx is None and tyl is None)
            attempts.append('resident' if resident else 'streaming')
            if resident:
                raise RuntimeError("mosaic reject")

        monkeypatch.setattr(pallas_gs, '_try_compile', fake_compile)
        assert pallas_gs.point_probe(shape, risk_fraction=0.0) is True
        assert attempts == ['resident', 'streaming']
        assert pallas_gs._RESIDENT_PATTERN[0] is False
        assert pallas_gs._resident_plan(shape) is None

    def test_probe_success_proves_pattern(self, monkeypatch):
        from emg3d_tpu.ops import pallas_gs

        shape = (12, 8, 8)
        monkeypatch.setattr(pallas_gs, '_ENABLED', True)
        monkeypatch.setattr(pallas_gs, '_mosaic_target', lambda: True)
        monkeypatch.setattr(pallas_gs, '_POINT_OK', {})
        monkeypatch.setattr(pallas_gs, '_RESIDENT_OFF', set())
        monkeypatch.setattr(pallas_gs, '_RESIDENT_PATTERN', [None])
        monkeypatch.setattr(pallas_gs, '_try_compile',
                            lambda *a: None)
        assert pallas_gs.point_probe(shape, risk_fraction=0.0) is True
        assert pallas_gs._RESIDENT_PATTERN[0] is True
        # Pattern proven: low-risk resident shapes are now trusted
        # without further compiles.
        monkeypatch.setattr(pallas_gs, '_try_compile',
                            lambda *a: 1/0)
        assert pallas_gs.point_probe((8, 8, 8)) is True


def test_resident_plan_tx_never_exceeds_grid():
    """tx > nx-1 makes the slab DMA out of bounds — a runtime TPU
    worker FAULT the compile-only probe cannot catch (hit on the
    (2,2,2)-class coarsest levels of real solves)."""
    from emg3d_tpu.ops import pallas_gs
    for shape in [(2, 2, 2), (3, 4, 4), (4, 4, 4), (5, 8, 8)]:
        plan = pallas_gs._resident_plan(shape)
        assert plan is not None
        assert plan[0] <= shape[0] - 1, (shape, plan)
