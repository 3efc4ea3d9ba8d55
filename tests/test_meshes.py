"""Mesh tests: TensorMesh, MG-friendly numbers, automatic gridding."""
import numpy as np
import pytest

from emg3d_tpu import TensorMesh, construct_mesh, good_mg_cell_nr
from emg3d_tpu.meshes import skin_depth, wavelength, cell_width


class TestTensorMesh:
    def test_basics(self):
        hx = [1., 2., 3.]
        grid = TensorMesh([hx, hx, hx], origin=(10, 20, 30))
        assert grid.shape_cells == (3, 3, 3)
        assert grid.shape_nodes == (4, 4, 4)
        assert grid.n_cells == 27
        assert grid.n_edges == 3 * 3 * 16
        np.testing.assert_allclose(grid.nodes_x, [10, 11, 13, 16])
        np.testing.assert_allclose(grid.cell_centers_y,
                                   [20.5, 22.0, 24.5])
        np.testing.assert_allclose(grid.cell_volumes[0, 0, 0], 1.)
        np.testing.assert_allclose(grid.cell_volumes[2, 2, 2], 27.)
        # Aliases.
        assert grid.vnC == (3, 3, 3)
        assert grid.vnEx == (3, 4, 4)
        assert grid.nE == grid.n_edges

    def test_eq_and_dict(self):
        g1 = TensorMesh([[1, 2], [1, 1], [2, 2]], origin=(0, 0, 0))
        g2 = TensorMesh.from_dict(g1.to_dict())
        assert g1 == g2
        assert g1 == g1.copy()
        g3 = TensorMesh([[1, 2], [1, 1], [2, 3]], origin=(0, 0, 0))
        assert g1 != g3

    def test_validation(self):
        with pytest.raises(ValueError, match='positive'):
            TensorMesh([[1, -1], [1, 1], [1, 1]])
        with pytest.raises(ValueError, match='three'):
            TensorMesh([[1], [1]])


def test_good_mg_cell_nr():
    nrs = good_mg_cell_nr(max_nr=1024, max_prime=5, min_div=3)
    assert 16 in nrs and 48 in nrs and 1024 in nrs
    assert 7 not in nrs
    # All are p*2^n with n>=3.
    for n in nrs:
        while n % 2 == 0:
            n //= 2
        assert n in (1, 3, 5)
    with pytest.raises(ValueError, match='max_prime'):
        good_mg_cell_nr(max_prime=4)


def test_skin_depth_wavelength():
    # delta = 503.29 m at f=1 Hz, sigma=1 S/m.
    np.testing.assert_allclose(skin_depth(1.0, 1.0), 503.2921,
                               rtol=1e-5)
    np.testing.assert_allclose(wavelength(503.2921),
                               2 * np.pi * 503.2921)
    # Laplace domain (negative f).
    assert skin_depth(-2 * np.pi, 1.0) > 0
    # min width clipping.
    assert cell_width(900., pps=3, limits=[100, 200]) == 200.
    assert cell_width(900., pps=3, limits=50.) == 50.
    np.testing.assert_allclose(cell_width(900., pps=3), 300.)


class TestConstructMesh:
    def test_basic(self):
        grid = construct_mesh(
            frequency=1.0, properties=1.0, center=(0, 0, 0),
            domain=([-800, 800], [-800, 800], [-800, 800]))
        # MG-friendly cell counts.
        good = good_mg_cell_nr()
        for n in grid.shape_cells:
            assert n in good
        # Domain covered (with buffer).
        assert grid.nodes_x[0] < -800 and grid.nodes_x[-1] > 800
        assert grid.nodes_z[0] < -800 and grid.nodes_z[-1] > 800
        # Buffer ~ a wavelength (capped at max_buffer).
        lam = wavelength(skin_depth(1.0, 1.0))
        assert grid.nodes_x[0] > -800 - 1.2 * lam - 1

    def test_per_direction_properties(self):
        grid = construct_mesh(
            frequency=0.5, properties=[3.3, 1e5, 1e5, 1e5, 1e5, 1.0, 1e5],
            center=(0, 0, -600),
            domain=([-1000, 1000], [-1000, 1000], [-1200, 0]))
        # Air side (z+) computation domain limited by max_buffer; the
        # final extent may overshoot it by up to one stretched cell
        # (reference semantics: fill UNTIL covered, +1).
        assert grid.nodes_z[-1] >= 100000
        assert grid.nodes_z[-1] <= 2.5 * 100000
        good = good_mg_cell_nr()
        for n in grid.shape_cells:
            assert n in good

    def test_vector(self):
        vec = np.arange(-400., 401., 100.)
        grid = construct_mesh(frequency=1.0, properties=1.0,
                              center=(0, 0, 0),
                              vector=(vec, vec, vec))
        # The provided vector must be embedded in the node vectors
        # (up to origin-accumulation rounding).
        for name in ['nodes_x', 'nodes_y', 'nodes_z']:
            nodes = getattr(grid, name)
            for v in vec:
                assert np.min(np.abs(nodes - v)) < 1e-8

    def test_stretching_positive_widths(self):
        grid = construct_mesh(
            frequency=2.0, properties=[1.0, 100.0], center=(0, 0, -500),
            domain=([-300, 300], [-300, 300], [-900, -100]))
        for h in grid.h:
            assert np.all(h > 0)
            # Neighboring cells stretch at most ~1.6x.
            ratio = h[1:] / h[:-1]
            assert ratio.max() < 1.75 and ratio.min() > 1 / 1.75


class TestOriginWidths:
    """Pinned to the reference's own test expectations
    (/root/reference/tests/test_meshes.py:355-485): identical grids,
    info strings, and error behavior."""

    mu0 = 4e-7 * np.pi

    def test_basics(self, capsys):
        from emg3d_tpu.meshes import get_origin_widths
        x0, hx = get_origin_widths(1/np.pi, 9*self.mu0, 0.0, [-1, 1],
                                   stretching=[1, 1], verb=1)
        out, _ = capsys.readouterr()
        np.testing.assert_allclose(x0, -20)
        np.testing.assert_allclose(hx, np.ones(40))
        assert "Skin depth     [m] : 3.0  [corr." in out
        assert "Survey dom. DS [m] : -1.0 - 1.0" in out
        assert "Comp. dom. DC  [m] : -19.8 - 19.8" in out
        assert "Final extent   [m] : -20.0 - 20.0" in out
        assert "Cell widths    [m] : 1.0 / 1.0 / 1.0  [min(DS) / m" in out
        assert "Number of cells    : 40 (4 / 36 / 0)  [Total (DS/" in out
        assert "Max stretching     : 1.000 (1.000) / 1.000  [DS (" in out

        get_origin_widths(1/np.pi, [8.9*self.mu0, 9*self.mu0], 0.0,
                          [-1, 1], stretching=[1, 1], verb=1)
        out, _ = capsys.readouterr()
        assert "2.98 / 3.00  [corr. to `properties`]" in out

    def test_status_quo(self, capsys):
        from emg3d_tpu.meshes import get_origin_widths
        get_origin_widths(frequency=0.2, properties=[0.3, 1, 50],
                          center=-950, domain=[-2000, -1000], verb=1)
        out, _ = capsys.readouterr()
        assert "Skin depth     [m] : 616 / 1125 / 7958" in out
        assert "Survey dom. DS [m] : -2000 - -1000" in out
        assert "Comp. dom. DC  [m] : -9071 - 49000" in out
        assert "Final extent   [m] : -10310 - 52091" in out
        assert "Cell widths    [m] : 205 / 205 / 12083" in out
        assert "Number of cells    : 32 (7 / 25 / 0)" in out
        assert "Max stretching     : 1.000 (1.000) / 1.290" in out

    def test_domain_vector_distance(self):
        from emg3d_tpu.meshes import get_origin_widths
        x01, hx1 = get_origin_widths(1/np.pi, 9*self.mu0, 0.0, [-1, 1],
                                     stretching=[1, 1])
        x02, hx2 = get_origin_widths(1/np.pi, 9*self.mu0, 0.0,
                                     vector=np.array([-1, 0, 1]),
                                     stretching=[1, 1])
        np.testing.assert_allclose(x01, x02)
        np.testing.assert_allclose(hx1, hx2)
        x03, hx3 = get_origin_widths(1/np.pi, 9*self.mu0, 0.0,
                                     distance=[1, 1],
                                     stretching=[1, 1])
        np.testing.assert_allclose(x01, x03)
        np.testing.assert_allclose(hx1, hx3)

    def test_seasurface(self):
        from emg3d_tpu.meshes import get_origin_widths
        x01, hx1 = get_origin_widths(1/np.pi, 9*self.mu0, 0.0, [-1, 1],
                                     stretching=[1, 1])
        x02, hx2 = get_origin_widths(1/np.pi, 9*self.mu0, -0.5, [-1, 0],
                                     seasurface=0.0, stretching=[1, 1])
        np.testing.assert_allclose(x01, x02)
        np.testing.assert_allclose(hx1, hx2)

    def test_errors(self, capsys):
        from emg3d_tpu.meshes import get_origin_widths
        with pytest.raises(TypeError, match='Unexpected '):
            get_origin_widths(1, 1, 0, [-1, 1], unknown=True)
        with pytest.raises(ValueError, match="At least one of `domain"):
            get_origin_widths(1, 1, 0)
        with pytest.raises(ValueError,
                           match="Provided vector MUST at least"):
            get_origin_widths(1, 1, 0, [-1, 1], np.array([0, 1, 2]))
        with pytest.raises(ValueError,
                           match="The `seasurface` but be bigger"):
            get_origin_widths(1, 1, 0, [-1, 1], seasurface=-2)
        with pytest.raises(RuntimeError, match="No suitable grid "):
            get_origin_widths(1, 1, 0, [-100, 100], cell_numbers=[1])
        out = get_origin_widths(1, 1, 0, [-100, 100], cell_numbers=[1],
                                raise_error=False, verb=1)
        outstr, _ = capsys.readouterr()
        assert out[0] is None and out[1] is None
        assert "No suitable grid found; relax your criteria." in outstr

    def test_stretching_note(self, capsys):
        from emg3d_tpu.meshes import get_origin_widths
        get_origin_widths(1/np.pi, 9*self.mu0, -0.2, [-1, 2],
                          stretching=[1, 1], seasurface=1.2, verb=3)
        out, _ = capsys.readouterr()
        assert "Note: Stretching in DS >> 1.0.\nThe reason " in out

    def test_construct_mesh_info(self):
        grid = construct_mesh(
            frequency=1.0, properties=1.0, center=(0, 0, 0),
            domain=([-800, 800], [-800, 800], [-800, 800]))
        assert "== GRIDDING IN X ==" in grid.construct_mesh_info
        assert "== GRIDDING IN Z ==" in grid.construct_mesh_info
