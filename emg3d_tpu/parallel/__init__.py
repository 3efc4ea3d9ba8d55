"""Multi-device execution: meshes, sharding specs, distributed solves."""
from .sharding import (make_mesh, field_sharding, shard_solve_options,
                       distribute_field)
from . import distributed

__all__ = ['make_mesh', 'field_sharding', 'shard_solve_options',
           'distribute_field', 'distributed']
