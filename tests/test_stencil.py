"""Operator (curl-curl stencil) parity tests against the golden data.

The strongest check: for every solved golden field E (converged to
tol=1e-6 by the reference), applying OUR operator must reproduce the
source within that tolerance: ||s - A E|| <= ~1e-6 ||s||.  This validates
the full discretization (curls, ζ/η averaging, volumes, PEC) without
running any solver.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from emg3d_tpu import VolumeModel
from emg3d_tpu.ops import stencil

import helpers


def _residual_norm(grid, model, sfield, efield):
    vm = VolumeModel(grid, model, sfield)
    rx, ry, rz = stencil.residual_parts(
        jnp.asarray(sfield.fx), jnp.asarray(sfield.fy),
        jnp.asarray(sfield.fz),
        jnp.asarray(efield.fx), jnp.asarray(efield.fy),
        jnp.asarray(efield.fz),
        jnp.asarray(vm.eta_x), jnp.asarray(vm.eta_y),
        jnp.asarray(vm.eta_z), jnp.asarray(vm.zeta),
        jnp.asarray(grid.h[0]), jnp.asarray(grid.h[1]),
        jnp.asarray(grid.h[2]))
    rnorm = np.sqrt(sum(float(jnp.sum(jnp.abs(r)**2))
                        for r in (rx, ry, rz)))
    snorm = float(sfield.norm())
    return rnorm / snorm


@pytest.mark.parametrize("result", ['Fresult', 'Wresult', 'Vresult',
                                    'bicresult'])
def test_operator_vs_golden_vti(result):
    dat = helpers.load_regression()
    grid = helpers.get_grid(dat, 'res>grid')
    model = helpers.get_model(dat, 'res>model', grid)
    sfield = helpers.get_field(dat, 'res>sfield', grid, source=True)
    efield = helpers.get_field(dat, f'res>{result}', grid)
    rel = _residual_norm(grid, model, sfield, efield)
    # Converged to 1e-6; stencil errors would blow this up by orders.
    assert rel < 2e-6


def test_operator_vs_golden_triaxial_heterogeneous():
    dat = helpers.load_regression()
    grid = helpers.get_grid(dat, 'reg_2>grid')
    model = helpers.get_model(dat, 'reg_2>model', grid)
    sfield = helpers.get_field(dat, 'reg_2>sfield', grid, source=True)
    efield = helpers.get_field(dat, 'reg_2>result', grid)
    rel = _residual_norm(grid, model, sfield, efield)
    # This golden field was solved with tol=1e-4, maxit=4 (reference
    # tests/create_data/regression.py:100-103), so it is only loosely
    # converged; our operator residual must lie within that tolerance.
    assert rel < 1e-4


def test_operator_vs_golden_laplace():
    dat = helpers.load_regression()
    grid = helpers.get_grid(dat, 'lap>grid')
    model = helpers.get_model(dat, 'lap>model', grid)
    sfield = helpers.get_field(dat, 'lap>sfield', grid, source=True)
    efield = helpers.get_field(dat, 'lap>Fresult', grid)
    assert sfield.fx.dtype.kind == 'f'  # Laplace domain is real.
    rel = _residual_norm(grid, model, sfield, efield)
    assert rel < 2e-6


def test_pec_rows_zero():
    """Operator output must vanish on tangential boundary edges."""
    rng = np.random.default_rng(11)
    from emg3d_tpu import TensorMesh, Model, SourceField
    grid = TensorMesh([rng.uniform(1, 2, 4), rng.uniform(1, 2, 4),
                       rng.uniform(1, 2, 4)])
    model = Model(grid, property_x=rng.uniform(1, 3, grid.shape_cells))
    sfield = SourceField.zeros(grid, frequency=1.0)
    vm = VolumeModel(grid, model, sfield)
    ex = rng.normal(size=grid.shape_edges_x) \
        + 1j * rng.normal(size=grid.shape_edges_x)
    ey = rng.normal(size=grid.shape_edges_y) \
        + 1j * rng.normal(size=grid.shape_edges_y)
    ez = rng.normal(size=grid.shape_edges_z) \
        + 1j * rng.normal(size=grid.shape_edges_z)
    ax, ay, az = stencil.amat(
        jnp.asarray(ex), jnp.asarray(ey), jnp.asarray(ez),
        jnp.asarray(vm.eta_x), jnp.asarray(vm.eta_y),
        jnp.asarray(vm.eta_z), jnp.asarray(vm.zeta),
        *[jnp.asarray(h) for h in grid.h])
    ax, ay, az = np.asarray(ax), np.asarray(ay), np.asarray(az)
    assert np.all(ax[:, 0, :] == 0) and np.all(ax[:, -1, :] == 0)
    assert np.all(ax[:, :, 0] == 0) and np.all(ax[:, :, -1] == 0)
    assert np.all(ay[0] == 0) and np.all(ay[-1] == 0)
    assert np.all(ay[:, :, 0] == 0) and np.all(ay[:, :, -1] == 0)
    assert np.all(az[0] == 0) and np.all(az[-1] == 0)
    assert np.all(az[:, 0, :] == 0) and np.all(az[:, -1, :] == 0)


def test_operator_symmetry():
    """A restricted to non-PEC edges is complex-symmetric (A = A^T).

    (On the full space the PEC rows are zeroed but columns are not, so
    symmetry only holds on the interior subspace, as in the reference.)
    """
    rng = np.random.default_rng(5)
    from emg3d_tpu import TensorMesh, Model, SourceField
    grid = TensorMesh([rng.uniform(1, 3, 3), rng.uniform(1, 3, 3),
                       rng.uniform(1, 3, 3)])
    model = Model(grid, property_x=rng.uniform(.1, 3, grid.shape_cells),
                  property_y=rng.uniform(.1, 3, grid.shape_cells),
                  property_z=rng.uniform(.1, 3, grid.shape_cells),
                  mu_r=rng.uniform(.5, 2, grid.shape_cells))
    sfield = SourceField.zeros(grid, frequency=0.9)
    vm = VolumeModel(grid, model, sfield)
    A, shapes = helpers.dense_operator(grid, vm)
    m = helpers.interior_mask(shapes)
    Ai = A[np.ix_(m, m)]
    assert np.allclose(Ai, Ai.T, atol=1e-12)
