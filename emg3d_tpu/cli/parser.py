"""INI config-file parsing for the CLI.

Reference parity: /root/reference/emg3d/cli/parser.py — sections
[files], [simulation], [solver_opts], [data], [gridding_opts], strict
unknown-key TypeErrors, terminal-args > config > defaults precedence.
"""
import configparser
import os
from pathlib import Path

__all__ = ['parse_config_file']


def parse_config_file(args_dict):
    """Read and parse the configuration file; merge terminal args."""
    config = args_dict.pop('config')
    configfile = os.path.abspath(config)
    cfg = configparser.ConfigParser(inline_comment_prefixes='#')

    if os.path.isfile(configfile):
        with open(configfile) as f:
            cfg.read_file(f)
    elif config == '.':
        configfile = config

    term = {'config_file': configfile}
    for key in ['verbosity', 'nproc', 'dry_run']:
        term[key] = args_dict.pop(key)
    for key in ['forward', 'misfit', 'gradient']:
        if args_dict.pop(key):
            term['function'] = key
    term.setdefault('function', 'forward')
    for key in ['path', 'survey', 'model', 'output']:
        term[key] = args_dict.pop(key)
    if args_dict:
        raise TypeError(f"Unexpected parameter in **args_dict: "
                        f"{list(args_dict.keys())}")

    term['verbosity'] = int(min(max(term['verbosity'], -1), 2))
    if term['nproc'] is not None:
        term['nproc'] = int(max(term['nproc'], 1))

    # [files]
    if 'files' not in cfg.sections():
        cfg.add_section('files')
    all_files = dict(cfg.items('files'))

    path = term.pop('path')
    if path is None:
        path = all_files.pop('path', '.')
    path = os.path.abspath(path)

    files = {'survey': 'survey', 'model': 'model',
             'output': 'emg3d_out'}
    for key, value in files.items():
        config_or_default = all_files.pop(key, value)
        fname = term.pop(key)
        if fname is None:
            fname = config_or_default
        ffile = Path(os.path.join(path, fname))
        if ffile.suffix not in ['.h5', '.json', '.npz']:
            ffile = ffile.with_suffix('.h5')
        files[key] = ffile

    for key in ['survey', 'model']:
        files[key] = str(files[key])
    files['log'] = str(files['output'].with_suffix('.log'))
    files['output'] = str(files['output'])

    files['store_simulation'] = cfg.getboolean(
        'files', 'store_simulation', fallback=False)
    all_files.pop('store_simulation', None)
    if all_files:
        raise TypeError(f"Unexpected parameter in [files]: "
                        f"{list(all_files.keys())}")

    # [simulation]
    simulation = {}
    if 'simulation' not in cfg.sections():
        cfg.add_section('simulation')
    all_sim = dict(cfg.items('simulation'))

    all_sim.pop('max_workers', None)
    if term['nproc'] is not None:
        simulation['max_workers'] = term['nproc']
    elif cfg.has_option('simulation', 'max_workers'):
        simulation['max_workers'] = cfg.getint('simulation',
                                               'max_workers')
    del term['nproc']

    for key in ['gridding', 'name']:
        if cfg.has_option('simulation', key):
            all_sim.pop(key)
            simulation[key] = cfg.get('simulation', key)
    simulation.setdefault('name', 'emg3d_tpu CLI run')
    if cfg.has_option('simulation', 'min_offset'):
        all_sim.pop('min_offset')
        simulation['min_offset'] = cfg.getfloat('simulation',
                                                'min_offset')
    if all_sim:
        raise TypeError(f"Unexpected parameter in [simulation]: "
                        f"{list(all_sim.keys())}")

    # [solver_opts]
    if 'solver_opts' in cfg.sections():
        solver = {}
        all_solver = dict(cfg.items('solver_opts'))
        for key in ['sslsolver', 'semicoarsening', 'linerelaxation']:
            if cfg.has_option('solver_opts', key):
                all_solver.pop(key)
                solver[key] = cfg.getboolean('solver_opts', key)
        for key in ['cycle']:
            if cfg.has_option('solver_opts', key):
                all_solver.pop(key)
                solver[key] = cfg.get('solver_opts', key)
        for key in ['tol']:
            if cfg.has_option('solver_opts', key):
                all_solver.pop(key)
                solver[key] = float(cfg.get('solver_opts', key))
        for key in ['verb', 'maxit', 'nu_init', 'nu_pre', 'nu_coarse',
                    'nu_post', 'clevel']:
            if cfg.has_option('solver_opts', key):
                all_solver.pop(key)
                solver[key] = cfg.getint('solver_opts', key)
        if all_solver:
            raise TypeError(f"Unexpected parameter in [solver_opts]: "
                            f"{list(all_solver.keys())}")
        if solver:
            simulation['solver_opts'] = solver

    # [data]
    data = {}
    if 'data' in cfg.sections():
        all_data = dict(cfg.items('data'))
        for key in ['sources', 'receivers', 'frequencies']:
            value = all_data.pop(key, False)
            if value:
                if key == 'frequencies':
                    data[key] = [float(v) for v in value.split(',')]
                else:
                    data[key] = [v.strip() for v in value.split(',')]
        if all_data:
            raise TypeError(f"Unexpected parameter in [data]: "
                            f"{list(all_data.keys())}")

    # [gridding_opts]
    if 'gridding_opts' in cfg.sections():
        grid = {}
        all_grid = dict(cfg.items('gridding_opts'))
        for key in ['properties', 'center', 'cell_number',
                    'min_width_pps', 'expand']:
            if cfg.has_option('gridding_opts', key):
                all_grid.pop(key)
                grid[key] = [float(v) for v in
                             cfg.get('gridding_opts', key).split(',')]
        for key in ['domain', 'distance', 'stretching',
                    'min_width_limits']:
            if cfg.has_option('gridding_opts', key):
                all_grid.pop(key)
                out = []
                for p in cfg.get('gridding_opts', key).split(';'):
                    if 'none' in p.lower():
                        out.append(None)
                    else:
                        out.append([float(v) for v in p.split(',')])
                grid[key] = out[0] if len(out) == 1 else tuple(out)
        for key in ['mapping', 'vector']:
            if cfg.has_option('gridding_opts', key):
                all_grid.pop(key)
                grid[key] = cfg.get('gridding_opts', key)
        for key in ['frequency', 'seasurface', 'max_buffer',
                    'lambda_factor']:
            if cfg.has_option('gridding_opts', key):
                all_grid.pop(key)
                grid[key] = float(cfg.get('gridding_opts', key))
        for key in ['verb']:
            if cfg.has_option('gridding_opts', key):
                all_grid.pop(key)
                grid[key] = cfg.getint('gridding_opts', key)
        for key in ['lambda_from_center']:
            if cfg.has_option('gridding_opts', key):
                all_grid.pop(key)
                grid[key] = cfg.getboolean('gridding_opts', key)
        if all_grid:
            raise TypeError(f"Unexpected parameter in [gridding_opts]: "
                            f"{list(all_grid.keys())}")
        if grid:
            simulation['gridding_opts'] = grid

    return ({'files': files, 'simulation_options': simulation,
             'data': data}, term)
