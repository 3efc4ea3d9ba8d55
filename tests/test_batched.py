"""Batched multi-source solve: parity with per-source solves."""
import numpy as np
import pytest

from emg3d_tpu import (TensorMesh, Model, Survey, Simulation, solve,
                       get_source_field)
from emg3d_tpu.solver import solve_batched


@pytest.fixture(scope='module')
def problem():
    n = 16
    grid = TensorMesh([np.full(n, 100.)] * 3)
    rng = np.random.default_rng(2)
    model = Model(grid, property_x=rng.uniform(0.5, 5,
                                               grid.shape_cells))
    return grid, model


def test_batched_matches_single(problem):
    grid, model = problem
    sfields = [get_source_field(grid, [200 + 300*i, 800, 800, 0, 0],
                                1.0) for i in range(3)]
    es, info = solve_batched(grid, model, sfields, cycle='F', verb=1)
    assert info['exit_message'] == 'CONVERGED'
    assert info['rel_error'].shape == (3,)
    assert np.all(info['rel_error'] < 1e-6)
    for i, sf in enumerate(sfields):
        ei = solve(grid, model, sf, cycle='F', verb=1)
        rel = (np.linalg.norm(es[i].field - ei.field) /
               np.linalg.norm(ei.field))
        assert rel < 1e-5


@pytest.mark.slow
def test_batched_with_sc_lr(problem):
    grid, model = problem
    sfields = [get_source_field(grid, [300 + 200*i, 900, 700, 20, 5],
                                0.7) for i in range(2)]
    es, info = solve_batched(grid, model, sfields, cycle='V',
                             semicoarsening=True, linerelaxation=True,
                             verb=1)
    assert info['exit_message'] == 'CONVERGED'


def test_batched_validation(problem):
    grid, model = problem
    s1 = get_source_field(grid, [300, 900, 700, 0, 0], 1.0)
    with pytest.raises(NotImplementedError, match='bicgstab and cgs'):
        solve_batched(grid, model, [s1], sslsolver='gcrotmk')
    with pytest.raises(ValueError, match='at least one'):
        solve_batched(grid, model, [])


def test_batched_mixed_frequencies(problem):
    """(src × freq) lanes with per-lane η stacks == per-pair solves."""
    grid, model = problem
    lanes = [(200, 1.0), (500, 2.0), (800, 1.0), (1100, 0.5)]
    sfields = [get_source_field(grid, [x, 800, 800, 0, 0], f)
               for x, f in lanes]
    es, info = solve_batched(grid, model, sfields, cycle='F', verb=1)
    assert info['exit_message'] == 'CONVERGED'
    assert np.all(info['rel_error'] < 1e-6)
    for i, sf in enumerate(sfields):
        ei = solve(grid, model, sf, cycle='F', verb=1)
        rel = (np.linalg.norm(es[i].field - ei.field) /
               np.linalg.norm(ei.field))
        assert rel < 1e-5
        assert es[i]._frequency == sf._frequency


@pytest.mark.slow
def test_batched_mixed_frequencies_bicgstab(problem):
    grid, model = problem
    sfields = [get_source_field(grid, [300 + 200*i, 800, 800, 0, 0], f)
               for i, f in enumerate([0.7, 1.4])]
    es, info = solve_batched(grid, model, sfields, cycle='F',
                             sslsolver='bicgstab', semicoarsening=True,
                             linerelaxation=True, verb=1)
    assert info['exit_message'] == 'CONVERGED'
    assert np.all(info['rel_error'] < 1e-6)
    for i, sf in enumerate(sfields):
        ei = solve(grid, model, sf, cycle='F', sslsolver='bicgstab',
                   semicoarsening=True, linerelaxation=True, verb=1)
        rel = (np.linalg.norm(es[i].field - ei.field) /
               np.linalg.norm(ei.field))
        assert rel < 1e-5


def test_simulation_batches_across_frequencies(problem):
    """One Simulation group spans all (src, freq) pairs on one grid."""
    from emg3d_tpu import solver as S

    grid, model = problem
    survey = Survey('MultiF', ([300, 600], 800, 800, 0, 0),
                    (1200, 800, 800, 0, 0), [1.0, 2.0],
                    noise_floor=1e-15, relative_error=0.05)
    calls = []
    orig = S.solve_batched

    def spy(grid_, model_, sfields, **kw):
        calls.append(len(sfields))
        return orig(grid_, model_, sfields, **kw)

    import emg3d_tpu.solver
    emg3d_tpu.solver.solve_batched = spy
    try:
        sim = Simulation(
            'mf', survey, grid, model, gridding='same',
            solver_opts={'sslsolver': False, 'semicoarsening': False,
                         'linerelaxation': False, 'tol': 1e-5},
            verb=-1)
        sim.compute()
    finally:
        emg3d_tpu.solver.solve_batched = orig
    # All 2 srcs × 2 freqs in ONE batched call.
    assert calls == [4]
    for src in survey.sources:
        for f in (1.0, 2.0):
            info = sim.get_efield_info(src, f)
            assert info['exit_message'] == 'CONVERGED'
    assert np.all(np.isfinite(sim.data.synthetic))


@pytest.mark.slow
def test_batched_bicgstab_matches_single(problem):
    grid, model = problem
    sfields = [get_source_field(grid, [200 + 300*i, 800, 800, 0, 0],
                                1.0) for i in range(3)]
    es, info = solve_batched(grid, model, sfields, cycle='F',
                             sslsolver='bicgstab', semicoarsening=True,
                             linerelaxation=True, verb=1)
    assert info['exit_message'] == 'CONVERGED'
    assert np.all(info['rel_error'] < 1e-6)
    from emg3d_tpu import solve as _solve
    for i in (0, 2):
        ei = _solve(grid, model, sfields[i], cycle='F',
                    sslsolver='bicgstab', semicoarsening=True,
                    linerelaxation=True, verb=1)
        rel = (np.linalg.norm(es[i].field - ei.field) /
               np.linalg.norm(ei.field))
        assert rel < 1e-5


@pytest.mark.slow
def test_batched_cgs_matches_single(problem):
    """Batched CGS (the second batched Krylov family) == per-source."""
    grid, model = problem
    sfields = [get_source_field(grid, [200 + 300*i, 800, 800, 0, 0],
                                1.0) for i in range(3)]
    es, info = solve_batched(grid, model, sfields, cycle='F',
                             sslsolver='cgs', verb=1)
    assert info['exit_message'] == 'CONVERGED'
    assert np.all(info['rel_error'] < 1e-6)
    from emg3d_tpu import solve as _solve
    for i in (0, 2):
        ei = _solve(grid, model, sfields[i], cycle='F',
                    sslsolver='cgs', verb=1)
        rel = (np.linalg.norm(es[i].field - ei.field) /
               np.linalg.norm(ei.field))
        assert rel < 1e-5


@pytest.mark.slow
def test_simulation_batched_default_opts(problem):
    """The default (sslsolver) Simulation path batches sources too."""
    grid, model = problem
    survey = Survey('BatchK', ([300, 600, 900], 800, 800, 0, 0),
                    (1200, 800, 800, 0, 0), 1.0,
                    noise_floor=1e-15, relative_error=0.05)
    sim = Simulation('bk', survey, grid, model, gridding='same',
                     solver_opts={'tol': 1e-5}, verb=-1)
    sim.compute()
    for src in survey.sources:
        info = sim.get_efield_info(src, 1.0)
        assert info['exit_message'] == 'CONVERGED'
    assert np.all(np.isfinite(sim.data.synthetic))


def test_simulation_uses_batched(problem):
    grid, model = problem
    survey = Survey('Batch', ([300, 600, 900], 800, 800, 0, 0),
                    (1200, 800, 800, 0, 0), 1.0,
                    noise_floor=1e-15, relative_error=0.05)
    sim = Simulation(
        'b', survey, grid, model, gridding='same',
        solver_opts={'sslsolver': False, 'semicoarsening': False,
                     'linerelaxation': False, 'tol': 1e-5}, verb=-1)
    sim.compute()
    for src in survey.sources:
        info = sim.get_efield_info(src, 1.0)
        assert info['exit_message'] == 'CONVERGED'
        assert isinstance(info['rel_error'], float)
    assert np.all(np.isfinite(sim.data.synthetic))


def test_batched_bicgstab_small_norm_sources(problem):
    """f32 breakdown-guard regression: mu0-scaled (~1e-6) sources.

    Unit-norm lane scaling keeps the BiCGSTAB recurrence scalars inside
    float32 range; without it the squared-squared breakdown guards
    underflow and the solve aborts with nan (batched path only).
    """
    grid, model = problem
    sfields = [get_source_field(grid, [300 + 200*i, 800, 800, 0, 0],
                                1.0) for i in range(3)]
    assert all(float(sf.norm()) < 1e-3 for sf in sfields)
    es, info = solve_batched(grid, model, sfields, cycle='F',
                             sslsolver='bicgstab', verb=1)
    assert info['exit_message'] == 'CONVERGED'
    assert np.all(np.isfinite(info['rel_error']))
    assert np.all(info['rel_error'] < 5e-6)
    for e in es:
        assert np.all(np.isfinite(e.field))


def _to_c64(sf):
    from emg3d_tpu import SourceField
    return SourceField(np.asarray(sf.fx).astype(np.complex64),
                       np.asarray(sf.fy).astype(np.complex64),
                       np.asarray(sf.fz).astype(np.complex64),
                       frequency=sf._frequency)


@pytest.mark.slow
def test_batched_f32_true_1e6_mg(problem):
    """float32 batched multigrid reaches a true 1e-6 via the two-float
    correction mode (plain storage floors at ~2-4e-6)."""
    grid, model = problem
    sfields = [_to_c64(get_source_field(
        grid, [300 + 300*i, 800, 800, 0, 0], 1.0)) for i in range(2)]
    es, info = solve_batched(grid, model, sfields, cycle='F', verb=1,
                             tol=1e-6)
    assert info['exit_message'] == 'CONVERGED'
    assert np.all(info['rel_error'] < 1e-6)
    for i, sf in enumerate(sfields):
        e64 = solve(grid, model, get_source_field(
            grid, [300 + 300*i, 800, 800, 0, 0], 1.0), cycle='F',
            verb=1)
        rel = (np.linalg.norm(es[i].field - e64.field) /
               np.linalg.norm(e64.field))
        assert rel < 2e-5


@pytest.mark.slow
def test_batched_f32_true_1e6_bicgstab(problem):
    """float32 batched BiCGSTAB: per-lane two-float refinement makes
    the reported CONVERGED a true-residual statement."""
    grid, model = problem
    sfields = [_to_c64(get_source_field(
        grid, [300 + 300*i, 800, 800, 0, 0], 1.0)) for i in range(2)]
    es, info = solve_batched(grid, model, sfields, cycle='F',
                             sslsolver='bicgstab', verb=1, tol=1e-6)
    assert info['exit_message'] == 'CONVERGED'
    assert np.all(info['rel_error'] < 1e-6)
    for e in es:
        assert np.all(np.isfinite(e.field))
