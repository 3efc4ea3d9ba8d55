"""Multi-device execution: meshes, sharding specs, distributed solves."""
from .sharding import (make_mesh, field_sharding, shard_solve_options,
                       distribute_field)

__all__ = ['make_mesh', 'field_sharding', 'shard_solve_options',
           'distribute_field']
