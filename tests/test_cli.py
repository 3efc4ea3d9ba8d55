"""CLI tests: parser and end-to-end forward/misfit/gradient runs."""
import os

import numpy as np
import pytest

from emg3d_tpu import TensorMesh, Model, Survey, io
from emg3d_tpu.cli import main as cli_main
from emg3d_tpu.cli import parser as cli_parser


def _default_args(config='emg3d.cfg', **over):
    args = {'config': config, 'nproc': None, 'forward': False,
            'misfit': False, 'gradient': False, 'path': None,
            'survey': None, 'model': None, 'output': None,
            'verbosity': 0, 'dry_run': False}
    args.update(over)
    return args


class TestParser:
    def test_defaults(self, tmp_path):
        args = _default_args(config='.')
        args['path'] = str(tmp_path)
        cfg, term = cli_parser.parse_config_file(args)
        assert term['function'] == 'forward'
        assert cfg['files']['survey'].endswith('survey.h5')
        assert cfg['files']['model'].endswith('model.h5')
        assert cfg['files']['output'].endswith('emg3d_out.h5')
        assert cfg['files']['log'].endswith('emg3d_out.log')
        assert cfg['simulation_options']['name'] == 'emg3d_tpu CLI run'

    def test_config_file(self, tmp_path):
        cfgfile = tmp_path / 'test.cfg'
        cfgfile.write_text(f"""
[files]
path = {tmp_path}
survey = mysurvey.npz
model = mymodel.npz
output = out.npz

[simulation]
max_workers = 2
gridding = same
name = My Test

[solver_opts]
sslsolver = False
semicoarsening = True
cycle = V
tol = 1e-5
maxit = 10

[data]
sources = Tx0
frequencies = 1.0

[gridding_opts]
frequency = 2.0
properties = 0.3, 1, 1, 1, 1, 0.3, 1e8
""")
        args = _default_args(config=str(cfgfile))
        cfg, term = cli_parser.parse_config_file(args)
        assert cfg['files']['survey'].endswith('mysurvey.npz')
        sim = cfg['simulation_options']
        assert sim['max_workers'] == 2
        assert sim['gridding'] == 'same'
        assert sim['name'] == 'My Test'
        assert sim['solver_opts']['sslsolver'] is False
        assert sim['solver_opts']['cycle'] == 'V'
        assert sim['solver_opts']['tol'] == 1e-5
        assert sim['solver_opts']['maxit'] == 10
        assert cfg['data']['sources'] == ['Tx0']
        assert cfg['data']['frequencies'] == [1.0]
        assert sim['gridding_opts']['frequency'] == 2.0
        assert len(sim['gridding_opts']['properties']) == 7

    def test_unknown_keys(self, tmp_path):
        cfgfile = tmp_path / 'bad.cfg'
        cfgfile.write_text("[solver_opts]\nbogus = 1\n")
        args = _default_args(config=str(cfgfile))
        with pytest.raises(TypeError, match='solver_opts'):
            cli_parser.parse_config_file(args)


class TestRun:
    @pytest.fixture
    def setup_files(self, tmp_path):
        grid = TensorMesh([np.ones(8) * 400] * 3, origin=(0, 0, 0))
        model = Model(grid, 1.0, mapping='Conductivity')
        survey = Survey('CLI', (850, 1600, 1600, 0, 0),
                        (2350, 1600, 1600, 0, 0), 1.0,
                        noise_floor=1e-15, relative_error=0.05)
        io.save(str(tmp_path / 'survey.npz'), survey=survey)
        io.save(str(tmp_path / 'model.npz'), model=model, mesh=grid)
        cfgfile = tmp_path / 'emg3d.cfg'
        cfgfile.write_text(f"""
[files]
path = {tmp_path}
survey = survey.npz
model = model.npz
output = out.npz

[simulation]
gridding = same

[solver_opts]
sslsolver = False
semicoarsening = False
linerelaxation = False
tol = 1e-3
""")
        return tmp_path, cfgfile

    def test_dry_run(self, setup_files):
        tmp_path, cfgfile = setup_files
        cli_main.main([str(cfgfile), '-d'])
        out = io.load(str(tmp_path / 'out.npz'))
        assert np.all(out['data'] == 0)

    def test_forward(self, setup_files):
        tmp_path, cfgfile = setup_files
        cli_main.main([str(cfgfile), '-f'])
        out = io.load(str(tmp_path / 'out.npz'))
        assert np.all(np.isfinite(np.asarray(out['data'])))
        assert np.abs(np.asarray(out['data'])).max() > 0
        assert os.path.isfile(tmp_path / 'out.log')

    def test_misfit(self, setup_files):
        tmp_path, cfgfile = setup_files
        # Need observed data: run forward first.
        cli_main.main([str(cfgfile), '-f'])
        out_fwd = io.load(str(tmp_path / 'out.npz'))
        # Store observed into survey and rerun misfit.
        sdata = io.load(str(tmp_path / 'survey.npz'))
        survey = sdata['survey']
        survey.data.observed[:] = np.asarray(out_fwd['data'])
        io.save(str(tmp_path / 'survey.npz'), survey=survey)
        cli_main.main([str(cfgfile), '-m'])
        out = io.load(str(tmp_path / 'out.npz'))
        # The forward run stored noisy observed data (std ~5%), so the
        # misfit is O(1) per datum, not zero.
        assert 0 < float(out['misfit']) < 100
        assert int(out['n_observations']) == 1

    def test_gradient(self, setup_files):
        tmp_path, cfgfile = setup_files
        cli_main.main([str(cfgfile), '-f'])
        out_fwd = io.load(str(tmp_path / 'out.npz'))
        sdata = io.load(str(tmp_path / 'survey.npz'))
        survey = sdata['survey']
        survey.data.observed[:] = 1.1 * np.asarray(out_fwd['data'])
        io.save(str(tmp_path / 'survey.npz'), survey=survey)
        cli_main.main([str(cfgfile), '-g'])
        out = io.load(str(tmp_path / 'out.npz'))
        grad = np.asarray(out['gradient'])
        assert grad.shape == (8, 8, 8)
        assert np.abs(grad).max() > 0

    def test_version_and_report(self, capsys):
        cli_main.main(['--version'])
        assert 'emg3d_tpu v' in capsys.readouterr().out
        cli_main.main(['--report'])
        assert 'jax' in capsys.readouterr().out
