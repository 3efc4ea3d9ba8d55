"""Simulation + optimize tests.

Key check (reference parity: tests/test_optimize.py): the adjoint-state
gradient must match a forward finite-difference of the misfit to < 1%
NRMSD (electric receivers) on a pseudo-random cell.
"""
import numpy as np
import pytest

from emg3d_tpu import (TensorMesh, Model, Survey, Simulation, optimize)
from emg3d_tpu.simulations import (expand_grid_model,
                                   estimate_gridding_opts)


def _sim_inp(mesh, tol=5e-5):
    survey = Survey(
        name='Gradient Test',
        sources=(850, 1600, 1600, 0, 0),
        receivers=(2350, 1600, 1600, 0, 0),
        frequencies=1.0,
        noise_floor=1e-15,
        relative_error=0.05,
    )
    solver_opts = {'sslsolver': False, 'semicoarsening': False,
                   'linerelaxation': False, 'tol': tol}
    return {
        'name': 'Testing', 'survey': survey, 'grid': mesh,
        'solver_opts': solver_opts, 'max_workers': 1,
        'gridding': 'same', 'verb': -1,
    }


class TestForward:
    def test_compute_and_observed(self):
        mesh = TensorMesh([np.ones(16) * 200] * 3, origin=(0, 0, 0))
        model = Model(mesh, np.ones(mesh.shape_cells),
                      mapping='Conductivity')
        inp = _sim_inp(mesh, tol=1e-4)
        sim = Simulation(model=model, **inp)
        sim.compute(observed=True)
        syn = sim.data.synthetic
        assert np.all(np.isfinite(syn))
        assert np.abs(syn).max() > 0
        # Observed = synthetic + noise (std-scaled).
        assert not np.any(np.isnan(sim.data.observed))
        info = sim.get_efield_info('Tx0', 1.0)
        assert info['exit_message'] == 'CONVERGED'

    def test_threaded_nonbatchable_solves(self):
        """Pairs the batched path can't group (gcrotmk) run from host
        threads; results must match a serial (max_workers=1) run."""
        mesh = TensorMesh([np.ones(16) * 200] * 3, origin=(0, 0, 0))
        model = Model(mesh, np.ones(mesh.shape_cells),
                      mapping='Conductivity')
        survey = Survey(
            name='Threads', sources=([850, 1250], 1600, 1600, 0, 0),
            receivers=(2350, 1600, 1600, 0, 0), frequencies=1.0,
            noise_floor=1e-15, relative_error=0.05)
        opts = {'sslsolver': 'gcrotmk', 'tol': 5e-5,
                'semicoarsening': False, 'linerelaxation': False}
        out = {}
        for nw in (1, 2):
            sim = Simulation('t', survey, mesh, model, gridding='same',
                             solver_opts=opts, max_workers=nw, verb=-1)
            sim.compute()
            for src in survey.sources:
                info = sim.get_efield_info(src, 1.0)
                assert info['exit_message'] == 'CONVERGED', nw
            out[nw] = np.asarray(sim.data.synthetic).copy()
        np.testing.assert_allclose(out[2], out[1], rtol=1e-10)

    def test_dict_roundtrip(self):
        mesh = TensorMesh([np.ones(8) * 400] * 3, origin=(0, 0, 0))
        model = Model(mesh, 1.0, mapping='Conductivity')
        inp = _sim_inp(mesh, tol=1e-3)
        sim = Simulation(model=model, **inp)
        d = sim.to_dict('plain')
        sim2 = Simulation.from_dict(d)
        assert sim2.name == sim.name
        assert sim2.survey.shape == sim.survey.shape
        assert sim2.gridding == 'same'

    def test_clean(self):
        mesh = TensorMesh([np.ones(8) * 400] * 3, origin=(0, 0, 0))
        model = Model(mesh, 1.0, mapping='Conductivity')
        sim = Simulation(model=model, **_sim_inp(mesh, tol=1e-3))
        sim.compute()
        assert sim._dict_efield['Tx0'][1.0] is not None
        sim.clean('computed')
        assert sim._dict_efield['Tx0'][1.0] is None
        with pytest.raises(TypeError, match='Unrecognized'):
            sim.clean('nope')


class TestGradient:
    def test_errors(self):
        mesh = TensorMesh([np.ones(8) * 400] * 3, origin=(0, 0, 0))
        inp = _sim_inp(mesh)
        sim = Simulation(model=Model(mesh, 1, 2, 3), **inp)
        with pytest.raises(NotImplementedError, match='isotropic'):
            optimize.gradient(sim)

        inp2 = _sim_inp(mesh)
        sim = Simulation(model=Model(mesh, 1, epsilon_r=3), **inp2)
        with pytest.raises(NotImplementedError, match='el. permittivity'):
            optimize.gradient(sim)

        inp3 = _sim_inp(mesh)
        inp3['survey'].noise_floor = None
        inp3['survey'].relative_error = None
        sim = Simulation(model=Model(mesh, 1), **inp3)
        with pytest.raises(ValueError, match='noise_floor'):
            optimize.misfit(sim)

    @pytest.mark.slow
    def test_fd_gradient(self):
        """Adjoint gradient vs forward finite differences (<1% NRMSD)."""
        hx = np.ones(32) * 100
        mesh = TensorMesh([hx, hx, hx], origin=(0, 0, 0))

        con_init = np.ones(mesh.shape_cells)
        con_true = np.ones(mesh.shape_cells)
        con_true[11:16, 16:21, 10:15] = 0.001

        model_init = Model(mesh, con_init, mapping='Conductivity')
        model_true = Model(mesh, con_true, mapping='Conductivity')

        # Tight solver tol: the FD quotient differences are O(eps) and
        # solver noise at 5e-5 is the same order as a 1% NRMSD — which
        # iterate the solver lands on inside the tol ball then decides
        # the test (it flipped marginally when smoother defaults were
        # recalibrated).
        inp = _sim_inp(mesh, tol=5e-6)
        sim_data = Simulation(model=model_true, **inp)
        sim_data.compute(observed=True)
        # No noise for the FD check.
        sim_data.data['observed'] = sim_data.data['synthetic'].copy()

        survey = sim_data.survey
        inp['survey'] = survey
        sim = Simulation(model=model_init, **inp)
        data_misfit = sim.misfit
        grad = sim.gradient

        # Forward-FD at pseudo-random cells between source and receiver
        # (avoiding sign-change regions).
        epsilon = 1e-4
        rng = np.random.default_rng(42)
        nrmsds = []
        for _ in range(2):
            ix = int(rng.integers(12, 20))
            iy = 16
            iz = int(rng.integers(14, 18))
            model_diff = model_init.copy()
            model_diff.property_x[ix, iy, iz] += epsilon
            inp_fd = dict(inp)
            sim_fd = Simulation(model=model_diff, **inp_fd)
            fdgrad = float((sim_fd.misfit - data_misfit) / epsilon)
            nrmsd = 200 * abs(grad[ix, iy, iz] - fdgrad) / (
                abs(grad[ix, iy, iz]) + abs(fdgrad))
            nrmsds.append(nrmsd)
        assert np.mean(nrmsds) < 1.0

    @pytest.mark.slow
    def test_fd_gradient_magnetic(self):
        """Adjoint gradient with MAGNETIC receivers vs forward FD.

        Reference accuracy contract: < 5% NRMSD for magnetic receivers
        (tests/test_optimize.py:147-210; electric is < 1%).
        """
        from emg3d_tpu import Dipole

        hx = np.ones(32) * 100
        mesh = TensorMesh([hx, hx, hx], origin=(0, 0, 0))
        con_true = np.ones(mesh.shape_cells)
        con_true[11:16, 16:21, 10:15] = 0.001
        model_init = Model(mesh, np.ones(mesh.shape_cells),
                           mapping='Conductivity')
        model_true = Model(mesh, con_true, mapping='Conductivity')

        inp = _sim_inp(mesh, tol=5e-6)
        # dip=90: an x-directed E-dipole has zero on-axis Hx by
        # symmetry, so an in-line magnetic receiver must be vertical
        # (the reference's test uses the same geometry).
        inp['survey'] = Survey(
            name='Magnetic Gradient Test',
            sources=(850, 1600, 1600, 0, 0),
            receivers=[Dipole('MRx', (2350, 1600, 1600, 0, 90),
                              electric=False)],
            frequencies=1.0, noise_floor=1e-15, relative_error=0.05)
        sim_data = Simulation(model=model_true, **inp)
        sim_data.compute(observed=True)
        sim_data.data['observed'] = sim_data.data['synthetic'].copy()

        inp['survey'] = sim_data.survey
        sim = Simulation(model=model_init, **inp)
        data_misfit = sim.misfit
        grad = sim.gradient

        epsilon = 1e-4
        nrmsds = []
        for ix, iz in ((14, 15), (18, 16)):
            model_diff = model_init.copy()
            model_diff.property_x[ix, 16, iz] += epsilon
            sim_fd = Simulation(model=model_diff, **dict(inp))
            fdgrad = float((sim_fd.misfit - data_misfit) / epsilon)
            nrmsd = 200 * abs(grad[ix, 16, iz] - fdgrad) / (
                abs(grad[ix, 16, iz]) + abs(fdgrad))
            nrmsds.append(nrmsd)
        assert np.mean(nrmsds) < 5.0


class TestHelpers:
    def test_expand_grid_model(self):
        mesh = TensorMesh([[100., 100.], [100., 100.], [100., 100.]],
                          origin=(0, 0, 0))
        model = Model(mesh, 1.0, mapping='Conductivity')
        g2, m2 = expand_grid_model(mesh, model, [3.33, 1e-8], 250.0)
        assert g2.shape_cells[2] == 4  # +fill-up +air
        assert m2.property_x[0, 0, 2] == 3.33
        assert m2.property_x[0, 0, 3] == 1e-8
        assert g2.nodes_z[-2] == 250.0
        assert g2.h[2][-1] == 100.0

    def test_estimate_gridding_opts(self):
        mesh = TensorMesh([np.ones(8) * 500] * 3,
                          origin=(-2000, -2000, -3500))
        model = Model(mesh, np.arange(1, 8**3 + 1).reshape(
            mesh.shape_cells) / 100, mapping='Resistivity')
        survey = Survey('T', (0, 0, -1000, 0, 0),
                        ([-500, 500], 100, -1100, 0, 0), [0.5, 2.0])
        gopts = estimate_gridding_opts({}, mesh, model, survey)
        assert gopts['frequency'] == 1.0  # log-mean of 0.5 and 2.0
        assert gopts['mapping'] == 'Resistivity'
        np.testing.assert_allclose(gopts['center'][:2], (0, 0))
        assert len(gopts['properties']) == 7
        assert 'domain' in gopts
