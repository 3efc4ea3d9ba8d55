"""Field/source/receiver tests (reference parity: tests/test_fields.py).
"""
import numpy as np
import pytest
from scipy.constants import mu_0

from emg3d_tpu import (TensorMesh, Model, Field, SourceField,
                       get_source_field, get_receiver,
                       get_receiver_response, get_h_field)


@pytest.fixture
def grid():
    return TensorMesh([np.full(6, 100.)] * 3, origin=(0, 0, 0))


class TestField:
    def test_layout_and_flat(self, grid):
        f = Field.zeros(grid, frequency=1.0)
        assert f.fx.shape == (6, 7, 7)
        assert f.fy.shape == (7, 6, 7)
        assert f.fz.shape == (7, 7, 6)
        assert f.field.size == grid.n_edges
        assert f.is_electric
        # flat <-> components round trip (F-order parity with reference)
        rng = np.random.default_rng(0)
        flat = rng.normal(size=grid.n_edges) + \
            1j * rng.normal(size=grid.n_edges)
        f2 = Field.from_flat(grid, flat, frequency=1.0)
        np.testing.assert_allclose(f2.field, flat)

    def test_sval_smu0(self, grid):
        f = Field.zeros(grid, frequency=2.0)
        assert f.sval == -4j * np.pi
        assert f.smu0 == -4j * np.pi * mu_0
        # Laplace.
        fl = Field.zeros(grid, frequency=-3.0)
        assert fl.sval == -3.0
        assert fl.freq == 3.0
        assert fl.fx.dtype.kind == 'f'

    def test_pec(self, grid):
        rng = np.random.default_rng(1)
        f = Field(rng.normal(size=grid.shape_edges_x),
                  rng.normal(size=grid.shape_edges_y),
                  rng.normal(size=grid.shape_edges_z), frequency=1.0)
        g = f.ensure_pec()
        assert np.all(g.fx[:, 0, :] == 0) and np.all(g.fx[:, :, -1] == 0)
        assert np.all(g.fy[0] == 0) and np.all(g.fy[:, :, 0] == 0)
        assert np.all(g.fz[-1] == 0) and np.all(g.fz[:, 0, :] == 0)
        # Interior untouched.
        np.testing.assert_allclose(g.fx[:, 1:-1, 1:-1],
                                   f.fx[:, 1:-1, 1:-1])


class TestSourceField:
    def test_point_dipole_normalized(self, grid):
        sf = get_source_field(grid, [310, 310, 310, 30, 40], 1.0)
        # Total |Js| sums to 1 per unit moment direction.
        vec = sf.field / sf.smu0
        moment = sf.moment
        np.testing.assert_allclose(np.linalg.norm(moment), 1.0)
        assert abs(vec.sum() - moment.sum()) < 1e-6

    def test_finite_vs_point(self, grid):
        sf1 = get_source_field(grid, [300, 320, 310, 310, 310, 310],
                               1.0)
        sf2 = get_source_field(grid, [310, 310, 310, 0, 0], 1.0,
                               length=20.)
        np.testing.assert_allclose(sf1.field, sf2.field, atol=1e-20)

    def test_strength(self, grid):
        sf1 = get_source_field(grid, [300, 340, 310, 310, 310, 310],
                               1.0, strength=0)
        sf2 = get_source_field(grid, [300, 340, 310, 310, 310, 310],
                               1.0, strength=1.0)
        # strength=1: moment = length * strength = 40.
        np.testing.assert_allclose(sf2.field, 40 * sf1.field,
                                   rtol=1e-10)

    def test_loop_source(self, grid):
        sf = get_source_field(grid, [310, 310, 310, 0, 0], 1.0,
                              electric=False)
        assert abs(sf.field).max() > 0

    def test_errors(self, grid):
        with pytest.raises(ValueError, match='no length'):
            get_source_field(grid, [300, 300, 310, 310, 310, 310], 1.0)
        with pytest.raises(ValueError, match='outside grid'):
            get_source_field(grid, [-100, -100, -100, 0, 0], 1.0)
        with pytest.raises(ValueError, match='wrong defined'):
            get_source_field(grid, [0, 0, 0], 1.0)


class TestReceiver:
    def test_get_receiver_nan_outside(self, grid):
        f = Field.zeros(grid, frequency=1.0)
        fx = np.asarray(f.fx)
        fx[:] = 1 + 1j
        f = Field(fx, f.fy, f.fz, frequency=1.0)
        resp = get_receiver(grid, f.fx, ([250, 5000], 250, 250))
        assert np.isfinite(resp[0])
        assert np.isnan(resp[1])

    def test_rotation_weights(self, grid):
        fx = np.zeros(grid.shape_edges_x, complex) + 2.0
        fy = np.zeros(grid.shape_edges_y, complex) + 3.0
        fz = np.zeros(grid.shape_edges_z, complex) + 5.0
        f = Field(fx, fy, fz, frequency=1.0)
        r0 = get_receiver_response(grid, f, (250, 250, 250, 0, 0))
        np.testing.assert_allclose(r0, 2.0)
        r90 = get_receiver_response(grid, f, (250, 250, 250, 90, 0))
        np.testing.assert_allclose(r90, 3.0, rtol=1e-10)
        rup = get_receiver_response(grid, f, (250, 250, 250, 0, 90))
        np.testing.assert_allclose(rup, 5.0, rtol=1e-10)

    def test_rec_errors(self, grid):
        f = Field.zeros(grid, frequency=1.0)
        with pytest.raises(ValueError, match='x, y, z, azimuth'):
            get_receiver_response(grid, f, (0, 0, 0))


class TestHField:
    def test_faraday_uniform(self, grid):
        """Curl of a linear-in-x Ey field: H_z = dEy/dx / (-smu0)."""
        model = Model(grid, 1.0)
        f = Field.zeros(grid, frequency=1.0)
        fy = np.asarray(f.fy)
        # Ey = x (gradient 0.01 per m across 100 m cells).
        xs = grid.nodes_x
        fy[:] = 0.01 * xs[:, None, None]
        f = Field(f.fx, fy, f.fz, frequency=1.0)
        h = get_h_field(grid, model, f)
        expect = -0.01 / f.smu0
        np.testing.assert_allclose(np.asarray(h.fz)[1:-1, 1:-1, :],
                                   expect, rtol=1e-12)
        assert not h.is_electric
