"""Spatial domain decomposition over a device mesh (GSPMD).

The TPU-native analog of distribution for a stencil code (SURVEY.md
§2.6): the Yee grid is block-partitioned across chips along the grid
z-axis (and optionally y), shardings are **annotated** on the field and
model arrays inside the jitted solver pieces, and XLA/GSPMD partitions
every stencil, smoother and transfer op — inserting the one-plane
halo exchanges as ``collective-permute`` over ICI and ``all-reduce``
for norms.  This follows the standard JAX scaling recipe: pick a mesh,
annotate shardings, let the compiler place collectives.

Coarse multigrid levels shrink below the point where a shard holds
enough planes; levels with fewer than ``min_local_planes`` cells per
device along the sharded axis are left unconstrained (the compiler
gathers/replicates them) — the MG agglomeration policy.

Explicit shard_map/pallas halo pipelines (compute/communication
overlap) are the planned next optimization stage; the annotation-based
path establishes the layout, memory scaling, and correctness.
"""
import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['make_mesh', 'field_sharding', 'shard_solve_options',
           'distribute_field']


def make_mesh(n_devices=None, axes=('z',), devices=None):
    """Create a 1-D (or 2-D) device mesh for spatial decomposition.

    axes : tuple of axis names out of ('y', 'z') — the grid axes to
        partition.  Default partitions z only.
    """
    from jax.experimental import mesh_utils
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if len(axes) == 1:
        dm = mesh_utils.create_device_mesh((n_devices,), devices)
    elif len(axes) == 2:
        ny = int(np.floor(np.sqrt(n_devices)))
        while n_devices % ny:
            ny -= 1
        dm = mesh_utils.create_device_mesh((ny, n_devices // ny),
                                           devices)
    else:
        raise ValueError("axes must have 1 or 2 entries out of "
                         "('y', 'z').")
    return Mesh(dm, axes)


def _spec_for(mesh, ndim):
    """PartitionSpec for an ndim-array: grid axes (x, y, z) trailing."""
    names = {'y': 1, 'z': 2}
    spec = [None, None, None]
    for ax in mesh.axis_names:
        spec[names[ax]] = ax
    if ndim == 3:
        return P(*spec)
    if ndim == 1:
        return P(None)
    return P(*([None] * ndim))


def field_sharding(mesh, ndim=3):
    """NamedSharding for field/model arrays on ``mesh``."""
    return NamedSharding(mesh, _spec_for(mesh, ndim))


def shard_solve_options(mesh, min_local_planes=4):
    """The ``sharding`` option for :func:`emg3d_tpu.solver.solve`."""
    return {'mesh': mesh, 'min_local_planes': int(min_local_planes)}


def distribute_field(field, mesh):
    """Place a host Field's components on the mesh (z/y-partitioned).

    Works for divisible axes via device_put; pads are unnecessary since
    only cell-direction axes are even — uneven (node) axes fall back to
    replicated placement + in-jit constraints.
    """
    import jax.numpy as jnp

    def put(a):
        a = np.asarray(a)
        sh = field_sharding(mesh, a.ndim)
        try:
            return jax.device_put(a, sh)
        except ValueError:
            return jnp.asarray(a)

    from ..fields import Field
    return Field(put(field.fx), put(field.fy), put(field.fz),
                 frequency=field._frequency)


def constrain(x, mesh, enable=True):
    """Apply a sharding constraint to array/C2/pytree leaves."""
    from .. import cx as _cx

    if not enable or mesh is None:
        return x

    def one(a):
        if isinstance(a, _cx.C2):
            return _cx.C2(one(a.re), one(a.im))
        nd = getattr(a, 'ndim', None)
        if nd != 3:
            return a
        return jax.lax.with_sharding_constraint(
            a, NamedSharding(mesh, _spec_for(mesh, 3)))
    if isinstance(x, tuple):
        return tuple(one(a) for a in x)
    return one(x)
