"""Model/VolumeModel and maps tests."""
import numpy as np
import pytest
from scipy.constants import mu_0

from emg3d_tpu import TensorMesh, Model, VolumeModel, SourceField
from emg3d_tpu import maps


@pytest.fixture
def grid():
    return TensorMesh([[1., 2.], [1., 1.], [2., 4.]])


class TestModel:
    def test_cases(self, grid):
        assert Model(grid, 1).case == 0
        assert Model(grid, 1, 2).case == 1
        assert Model(grid, 1, property_z=3).case == 2
        assert Model(grid, 1, 2, 3).case == 3
        # Aliasing for missing directions.
        m = Model(grid, 2.0)
        np.testing.assert_allclose(m.property_y, m.property_x)
        np.testing.assert_allclose(m.property_z, m.property_x)

    def test_validation(self, grid):
        with pytest.raises(ValueError, match='bigger than zero'):
            Model(grid, -1.0)
        with pytest.raises(ValueError, match='bigger than zero'):
            Model(grid, np.inf)
        with pytest.raises(ValueError, match='Shape'):
            Model(grid, np.ones((3, 3, 3)))
        with pytest.raises(ValueError, match='Unknown mapping'):
            Model(grid, 1, mapping='Nope')
        with pytest.raises(TypeError, match='kwargs'):
            Model(grid, 1, bogus=2)
        # Log mappings allow negative values.
        Model(grid, -2.0, mapping='LgResistivity')

    def test_operators(self, grid):
        m1 = Model(grid, 2.0)
        m2 = Model(grid, 3.0)
        np.testing.assert_allclose((m1 + m2).property_x, 5.0)
        np.testing.assert_allclose((m2 - m1).property_x, 1.0)
        assert m1 == Model(grid, 2.0)
        assert m1 != m2
        with pytest.raises(ValueError, match='consistent'):
            m1 + Model(grid, 1, 2)

    def test_roundtrip(self, grid):
        m = Model(grid, 2.0, property_z=np.arange(1., 9.), mu_r=1.2,
                  mapping='Conductivity')
        m2 = Model.from_dict(m.to_dict())
        assert m == m2

    def test_interpolate2grid(self, grid):
        fine = TensorMesh([[.5]*6, [.5]*4, [1.]*6])
        m = Model(grid, np.arange(1., 9.).reshape(2, 2, 2))
        m2 = m.interpolate2grid(grid, fine)
        assert m2.shape_cells == (6, 4, 6)
        # Volume-average conserves the (log) mean roughly.
        assert m2.property_x.min() >= m.property_x.min() - 1e-10
        assert m2.property_x.max() <= m.property_x.max() + 1e-10


class TestVolumeModel:
    def test_eta_zeta(self, grid):
        sfield = SourceField.zeros(grid, frequency=1.0)
        m = Model(grid, 2.0, mapping='Resistivity')  # sigma = 0.5
        vm = VolumeModel(grid, m, sfield)
        vol = np.asarray(grid.cell_volumes)
        smu0 = -2j * np.pi * 1.0 * mu_0
        np.testing.assert_allclose(vm.eta_x, smu0 * vol * 0.5)
        np.testing.assert_allclose(vm.zeta, vol)
        # VTI aliasing: eta_y is eta_x.
        assert vm.eta_y is vm.eta_x

    def test_mu_r_and_epsilon(self, grid):
        sfield = SourceField.zeros(grid, frequency=1.0)
        m = Model(grid, 1.0, mu_r=2.0, epsilon_r=1.0)
        vm = VolumeModel(grid, m, sfield)
        vol = np.asarray(grid.cell_volumes)
        np.testing.assert_allclose(vm.zeta, vol / 2.0)


class TestMaps:
    @pytest.mark.parametrize('name', list(maps.MAPLIST))
    def test_roundtrip(self, name):
        m = maps.MAPLIST[name]()
        sigma = np.array([0.01, 1.0, 3.3, 100.0])
        np.testing.assert_allclose(m.backward(m.forward(sigma)), sigma,
                                   rtol=1e-12)

    def test_derivative_chain(self):
        # d(sigma)/d(m) factors: finite-difference check.
        sigma = np.array([0.5, 2.0])
        for name, M in maps.MAPLIST.items():
            m = M()
            x = m.forward(sigma)
            eps = 1e-6
            dsig_dx = (m.backward(x + eps) - m.backward(x - eps)) / \
                (2 * eps)
            grad = np.ones_like(sigma)
            m.derivative_chain(grad, x)
            np.testing.assert_allclose(grad, dsig_dx, rtol=1e-5,
                                       err_msg=name)


class TestVolumeAverage:
    def test_conservation(self):
        rng = np.random.default_rng(0)
        src = TensorMesh([rng.uniform(1, 2, 4)] * 3)
        dst = TensorMesh([np.full(3, np.sum(src.h[0]) / 3),
                          np.full(5, np.sum(src.h[1]) / 5),
                          np.full(2, np.sum(src.h[2]) / 2)])
        vals = rng.uniform(1, 10, src.shape_cells)
        out = maps.volume_average(
            (src.nodes_x, src.nodes_y, src.nodes_z), vals,
            (dst.nodes_x, dst.nodes_y, dst.nodes_z), dst.cell_volumes)
        # Total integral conserved.
        np.testing.assert_allclose(
            np.sum(out * dst.cell_volumes),
            np.sum(vals * src.cell_volumes), rtol=1e-12)

    def test_edges2cellaverages_adjoint(self):
        """edges2cellaverages is V/4 x the adjoint of cell->edge sums."""
        rng = np.random.default_rng(1)
        grid = TensorMesh([rng.uniform(1, 2, 3)] * 3)
        ex = rng.normal(size=grid.shape_edges_x)
        ey = rng.normal(size=grid.shape_edges_y)
        ez = rng.normal(size=grid.shape_edges_z)
        gx, gy, gz = maps.edges2cellaverages(ex, ey, ez,
                                             grid.cell_volumes)
        assert gx.shape == grid.shape_cells
        # Direct check of one cell for gx.
        i, j, k = 1, 1, 1
        expect = (ex[i, j, k] + ex[i, j+1, k] + ex[i, j, k+1] +
                  ex[i, j+1, k+1]) * grid.cell_volumes[i, j, k] / 4
        np.testing.assert_allclose(gx[i, j, k], expect)
