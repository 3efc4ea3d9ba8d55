"""CLI driver: load inputs, run the simulation, save outputs.

Reference parity: /root/reference/emg3d/cli/run.py — forward / misfit /
gradient branches, data selection, dry-run, dual console/file logging
with captured warnings, outputs {configuration, data, misfit,
n_observations, gradient, [simulation]}.
"""
import json
import logging
import time

import numpy as np

from .. import io, simulations, utils
from ..__init__ import __version__
from . import parser

__all__ = ['simulation']


def simulation(args_dict):
    """Run a CLI-configured simulation."""
    runtime = utils.Time()

    cfg, term = parser.parse_config_file(args_dict)
    check_files(cfg, term)
    function, verb = term['function'], term['verbosity']
    dry_run = term.get('dry_run', False)

    logger = initiate_logger(cfg, runtime, verb)

    logger.info(f":: emg3d_tpu CLI {function} START :: "
                f"{time.asctime()} :: v{__version__}")

    paramdump = json.dumps(cfg, sort_keys=True, indent=4, default=str)
    logger.debug("\n    :: CONFIGURATION ::\n")
    logger.debug(f"{term['config_file']}\n{paramdump}")

    # Load survey and model.
    logger.info("\n    :: LOAD SURVEY AND MODEL ::\n")
    sdata = io.load(cfg['files']['survey'])
    survey = sdata['survey']
    mdata = io.load(cfg['files']['model'])
    model = mdata['model']
    grid = mdata.get('mesh', mdata.get('grid',
                                       getattr(model, 'grid', None)))
    if grid is None:
        raise ValueError("Model file must contain a 'mesh'/'grid'.")
    min_offset = cfg['simulation_options'].pop('min_offset', 0.0)

    # Select data.
    data = cfg['data']
    if data:
        survey = survey.select(
            sources=data.get('sources', None),
            receivers=data.get('receivers', None),
            frequencies=data.get('frequencies', None))

    sim = simulations.Simulation(
        survey=survey, grid=grid, model=model, verb=-1,
        **cfg['simulation_options'])

    logger.info("\n    :: SIMULATION ::")
    logger.info(f"\n{sim}\n")
    logger.debug("    :: MESHES ::\n")
    logger.debug(sim.print_grid_info(return_info=True))

    output = {'configuration': {'data': cfg.get('data', {})}}

    logger.info("    :: FORWARD COMPUTATION ::\n")
    if dry_run:
        output['data'] = np.zeros(sim.survey.shape, dtype=complex)
    else:
        if function == 'forward':
            sim.compute(observed=True, min_offset=min_offset)
            output['data'] = sim.data.observed
        else:
            sim.compute()
            output['data'] = sim.data.synthetic
        logger.debug(sim.print_solver_info('efield', 1, True))

    if function in ['misfit', 'gradient']:
        output['misfit'] = 0.0 if dry_run else sim.misfit
        output['n_observations'] = sim.survey.size

    if function == 'gradient':
        logger.info("\n    :: BACKWARD COMPUTATION ::\n")
        if dry_run:
            output['gradient'] = np.zeros(sim.grid.shape_cells)
        else:
            output['gradient'] = sim.gradient
            logger.debug(sim.print_solver_info('bfield', 1, True))

    # Store output.
    logger.info("\n    :: SAVE RESULTS ::\n")
    if cfg['files']['store_simulation'] and not dry_run:
        output['simulation'] = sim.to_dict(what='computed')
    io.save(cfg['files']['output'], **output)

    logger.info(f"\n:: emg3d_tpu CLI {function} END :: {time.asctime()} "
                f":: runtime = {runtime.runtime}")


def check_files(cfg, term):
    """Ensure all input files and the output directory exist."""
    import os
    for key in ['survey', 'model']:
        if not os.path.isfile(cfg['files'][key]):
            raise FileNotFoundError(
                f"Input file not found: {cfg['files'][key]}")
    os.makedirs(os.path.dirname(cfg['files']['output']) or '.',
                exist_ok=True)


def initiate_logger(cfg, runtime, verb):
    """Dual console/file logger with captured warnings."""
    logger = logging.getLogger('emg3d_tpu')
    logger.handlers.clear()
    logger.setLevel(logging.DEBUG)

    fh = logging.FileHandler(cfg['files']['log'], mode='w')
    fh.setLevel(logging.DEBUG)
    fh.setFormatter(logging.Formatter('%(message)s'))
    logger.addHandler(fh)

    ch = logging.StreamHandler()
    ch.setLevel([logging.WARNING, logging.INFO,
                 logging.DEBUG][min(max(verb + 1, 0), 2)])
    ch.setFormatter(logging.Formatter('%(message)s'))
    logger.addHandler(ch)

    logging.captureWarnings(True)
    wlog = logging.getLogger('py.warnings')
    wlog.handlers.clear()
    wlog.addHandler(fh)
    wlog.addHandler(ch)
    return logger
