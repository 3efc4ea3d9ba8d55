"""Survey and Dipole tests (reference parity: tests/test_surveys.py)."""
import numpy as np
import pytest

from emg3d_tpu import Survey, Dipole, PointDipole


class TestSurvey:
    def test_basics(self):
        sources = (0, [1000, 3000, 5000], -950, 0, 0)
        receivers = (np.arange(12) * 500, 0, -1000, 0, 0)
        srv = Survey('Test', sources, receivers, (1.0, 2.0))
        assert srv.shape == (3, 12, 2)
        assert srv.size == 0  # all NaN
        assert list(srv.sources)[0] == 'Tx0'
        assert list(srv.receivers)[-1] == 'Rx11'
        assert srv.rec_coords[0][3] == 1500.0
        assert np.all(np.isnan(srv.data.observed))

    def test_unique_names(self):
        d1 = Dipole('a', (0, 0, 0, 0, 0))
        d2 = Dipole('a', (1, 0, 0, 0, 0))
        with pytest.raises(ValueError, match='duplicate'):
            Survey('T', [d1, d2], (2, 0, 0, 0, 0), 1.0)

    def test_select(self):
        srv = Survey('T', (0, [0, 100, 200], 0, 0, 0),
                     ([1000, 2000], 0, 0, 0, 0), [1.0, 2.0, 4.0],
                     noise_floor=1e-15, relative_error=0.05)
        srv.data.observed[:] = np.arange(18).reshape(3, 2, 3) + 0j
        sub = srv.select(sources=['Tx0', 'Tx2'], frequencies=[2.0])
        assert sub.shape == (2, 2, 1)
        np.testing.assert_allclose(sub.data.observed[:, :, 0],
                                   [[1, 4], [13, 16]])
        assert sub.noise_floor == 1e-15

    def test_std(self):
        srv = Survey('T', (0, 0, 0, 0, 0), (100, 0, 0, 0, 0), 1.0,
                     noise_floor=1e-3, relative_error=0.1)
        srv.data.observed[:] = 2.0 + 0j
        std = srv.standard_deviation
        np.testing.assert_allclose(std, np.sqrt(1e-6 + 0.04))
        # Direct std has priority.
        srv.standard_deviation = np.full(srv.shape, 0.5)
        np.testing.assert_allclose(srv.standard_deviation, 0.5)
        srv.standard_deviation = None
        np.testing.assert_allclose(srv.standard_deviation,
                                   np.sqrt(1e-6 + 0.04))
        with pytest.raises(ValueError, match='bigger than zero'):
            srv.standard_deviation = np.zeros(srv.shape)
        with pytest.raises(ValueError, match='bigger than zero'):
            srv.noise_floor = -1.0
        srv2 = Survey('T2', (0, 0, 0, 0, 0),
                      ([100, 200], 0, 0, 0, 0), 1.0)
        with pytest.raises(ValueError, match='broadcastable'):
            srv2.relative_error = np.ones((1, 5, 1))

    def test_roundtrip(self):
        srv = Survey('Round', (0, [0, 100], 0, 0, 0),
                     ([1000, 2000, 3000], 0, 0, 0, 0), [0.5, 2.0],
                     relative_error=0.05)
        srv.data.observed[:] = np.random.default_rng(0).normal(
            size=srv.shape) + 1j
        d = srv.to_dict()
        srv2 = Survey.from_dict(d)
        assert srv2.name == 'Round'
        assert srv2.shape == srv.shape
        np.testing.assert_allclose(srv2.data.observed, srv.data.observed)
        assert srv2.relative_error == 0.05
        # copy()
        srv3 = srv.copy()
        np.testing.assert_allclose(srv3.data.observed, srv.data.observed)

    def test_fixed_layout(self):
        # 2 sources, 4 receivers -> 2 offsets x 2 sources.
        srv = Survey('Fix', (0, [0, 1000], 0, 0, 0),
                     ([100, 1100, 200, 1200], 0, 0, 0, 0), 1.0, fixed=1)
        assert list(srv.receivers) == ['Off0', 'Off1']
        assert set(srv.receivers['Off0']) == {'Tx0', 'Tx1'}
        coords = srv.rec_coords
        assert isinstance(coords, dict)


class TestDipole:
    def test_point(self):
        d = Dipole('p', (100., 200., -300., 30., 60.))
        assert not d.is_finite
        assert d.xco == 100. and d.azm == 30. and d.dip == 60.
        assert d.electric

    def test_finite(self):
        d = Dipole('f', (0., 100., 0., 0., 0., 0.))
        assert d.is_finite
        assert d.length == 100.
        assert d.xco == 50.
        assert d.azm == 0. and d.dip == 0.

    def test_errors(self):
        with pytest.raises(ValueError, match='wrong defined'):
            Dipole('x', (0, 0, 0))
        with pytest.raises(ValueError, match='must differ'):
            Dipole('x', (0., 0., 0., 0., 0., 0.))

    def test_roundtrip(self):
        d = Dipole('rt', (0., 100., 0., 50., 0., -30.), electric=False,
                   strength=3.3)
        d2 = Dipole.from_dict(d.to_dict())
        assert d2.name == 'rt'
        assert not d2.electric
        assert d2.strength == 3.3
        np.testing.assert_allclose(d2.coordinates, d.coordinates)

    def test_pointdipole_hashable(self):
        p = PointDipole('p', 0., 0., 0., 0., 0., True)
        assert hash(p) == hash(PointDipole('p', 0., 0., 0., 0., 0., True))
