"""emg3d_tpu: TPU-native multigrid solver for 3-D EM diffusion.

A brand-new JAX/XLA/Pallas framework with the capabilities of emg3d
(https://emsig.xyz): matrix-free geometric multigrid for the diffusive
approximation of Maxwell's equations on staggered Yee grids, in the
frequency and Laplace domains, with tri-axial electrical anisotropy.

The compute path is pure JAX (jit/vmap/shard_map over TPU meshes); the
reference's numba kernels are replaced by vectorized multicolor smoothers,
batched block solves, and matmul-based grid transfers.
"""
__version__ = '0.1.0'

from .meshes import TensorMesh, construct_mesh, good_mg_cell_nr, skin_depth
from .models import Model, VolumeModel
from .fields import (Field, SourceField, get_source_field, get_receiver,
                     get_receiver_response, get_h_field)
from .maps import grid2grid, interp3d
from .solver import solve, solve_batched
from .surveys import Survey, Dipole, PointDipole
from .simulations import Simulation, expand_grid_model
from .utils import EMArray, Report
from .time import Fourier
from . import cx, diff, io, optimize, parallel, time

__all__ = [
    'TensorMesh', 'construct_mesh', 'good_mg_cell_nr', 'skin_depth',
    'Model', 'VolumeModel',
    'Field', 'SourceField', 'get_source_field', 'get_receiver',
    'get_receiver_response', 'get_h_field',
    'grid2grid', 'interp3d',
    'solve', 'solve_batched', 'Survey', 'Dipole', 'PointDipole', 'Simulation',
    'expand_grid_model', 'EMArray', 'Report', 'cx', 'diff', 'io',
    'optimize',
]
