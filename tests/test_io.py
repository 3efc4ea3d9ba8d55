"""Serialization round-trips for all known classes, h5/npz/json."""
import numpy as np
import pytest

from emg3d_tpu import (TensorMesh, Model, Field, SourceField, Survey,
                       io, get_source_field)

try:
    import h5py
except ImportError:
    h5py = None

EXTS = ['npz', 'json'] + (['h5'] if h5py is not None else [])


@pytest.fixture
def objs():
    rng = np.random.default_rng(4)
    grid = TensorMesh([rng.uniform(10, 20, 4), rng.uniform(10, 20, 4),
                       rng.uniform(10, 20, 4)], origin=(1, 2, 3))
    model = Model(grid, property_x=rng.uniform(1, 10, grid.shape_cells),
                  property_z=rng.uniform(1, 10, grid.shape_cells),
                  mu_r=1.5, mapping='Resistivity')
    sfield = get_source_field(grid, [20, 40, 30, 30, 30, 30], 0.8)
    survey = Survey('io-test', (25, 25, 25, 0, 0),
                    ([30, 40], 30, 30, 0, 0), [0.8, 1.2],
                    relative_error=0.05)
    survey.data.observed[:] = rng.normal(size=survey.shape) + \
        1j * rng.normal(size=survey.shape)
    return grid, model, sfield, survey


@pytest.mark.parametrize('ext', EXTS)
def test_roundtrip(tmp_path, objs, ext):
    grid, model, sfield, survey = objs
    fname = str(tmp_path / f'data.{ext}')
    io.save(fname, mesh=grid, model=model, sfield=sfield, survey=survey,
            arr=np.arange(5.), scalar=3.14, string='hello', none=None)
    out = io.load(fname)

    assert out['mesh'] == grid
    assert out['model'] == model
    np.testing.assert_allclose(out['sfield'].field, sfield.field)
    assert out['sfield']._frequency == 0.8
    assert isinstance(out['sfield'], SourceField) or \
        isinstance(out['sfield'], Field)
    assert out['survey'].name == 'io-test'
    np.testing.assert_allclose(out['survey'].data.observed,
                               survey.data.observed)
    np.testing.assert_allclose(out['arr'], np.arange(5.))
    assert float(out['scalar']) == 3.14
    assert str(out['string']) == 'hello'
    assert out['none'] is None
    assert '_date' in out


def test_survey_to_file(tmp_path, objs):
    _, _, _, survey = objs
    fname = str(tmp_path / 'survey.npz')
    survey.to_file(fname)
    s2 = Survey.from_file(fname)
    assert s2.name == survey.name
    np.testing.assert_allclose(s2.data.observed, survey.data.observed)


def test_unknown_extension(tmp_path, objs):
    grid, *_ = objs
    fname = str(tmp_path / 'data.xyz')
    # Falls back to .h5 (or raises if h5py missing).
    if h5py is None:
        with pytest.raises(ImportError):
            io.save(fname, mesh=grid)
    else:
        io.save(fname, mesh=grid)
        out = io.load(fname + '.h5')
        assert out['mesh'] == grid
