"""Multi-host (multi-process) initialization scaffold.

One emg3d_tpu process per host; :func:`init` wires the processes into
one JAX distributed system so ``jax.devices()`` spans every host's
chips and the meshes built by :func:`emg3d_tpu.parallel.make_mesh`
(and the shard_map/GSPMD solver paths on top of them) place their
halo-exchange collectives over ICI within a host and DCN across hosts
— no solver code changes.  This is the TPU-native analog of the
reference's single-node ceiling (emg3d is one process; SURVEY §2.6
item 1 mandates the multi-host scaffold here).

Configuration is by explicit arguments or environment:

- ``EMG3D_TPU_COORD``     — coordinator address, ``host:port``.
- ``EMG3D_TPU_NPROC``     — number of processes.
- ``EMG3D_TPU_PROC_ID``   — this process's id (0-based).

On Cloud TPU pods the three are optional: ``jax.distributed`` then
auto-discovers them from the TPU metadata server.  A process that sets
none of them (the single-host case) should simply not call ``init``;
:func:`auto_init` does exactly that gate and is safe to call
unconditionally at program start.

The scaffold is validated on CPU by spawning real OS processes with a
localhost coordinator (tests/test_parallel.py::test_distributed_init);
each process sees the union of devices and a psum over a global mesh
reduces across processes.
"""
import os

import jax

__all__ = ['init', 'auto_init', 'is_initialized', 'shutdown',
           'global_mesh', 'process_count', 'process_index']

_STATE = {'initialized': False}


def is_initialized():
    return _STATE['initialized']


def init(coordinator_address=None, num_processes=None, process_id=None,
         local_device_ids=None):
    """Join this process to the distributed system (idempotent).

    Must run before any other JAX call in the process (JAX backends
    initialize lazily on first use and cannot be re-wired afterwards).
    """
    if _STATE['initialized']:
        return
    kw = {}
    if coordinator_address is not None:
        kw['coordinator_address'] = coordinator_address
    if num_processes is not None:
        kw['num_processes'] = int(num_processes)
    if process_id is not None:
        kw['process_id'] = int(process_id)
    if local_device_ids is not None:
        kw['local_device_ids'] = local_device_ids
    jax.distributed.initialize(**kw)
    _STATE['initialized'] = True


def auto_init():
    """Call :func:`init` iff the EMG3D_TPU_* environment is present.

    Safe to call unconditionally (the CLI does); a plain single-host
    run is untouched.
    """
    coord = os.environ.get('EMG3D_TPU_COORD')
    nproc = os.environ.get('EMG3D_TPU_NPROC')
    pid = os.environ.get('EMG3D_TPU_PROC_ID')
    if coord is None and nproc is None and pid is None:
        return False
    init(coordinator_address=coord, num_processes=nproc, process_id=pid)
    return True


def shutdown():
    if _STATE['initialized']:
        jax.distributed.shutdown()
        _STATE['initialized'] = False


def process_count():
    return jax.process_count()


def process_index():
    return jax.process_index()


def global_mesh(axes=('z',), n_devices=None):
    """A device mesh over the GLOBAL device set (all hosts).

    The mesh rows are ordered so the fastest-varying mesh axis stays
    within a host (``mesh_utils.create_device_mesh`` does this given
    the global devices): for a 2-D ('y', 'z') mesh the z halos — the
    per-color-step exchanges — ride ICI, and only the y halos (one
    exchange per smoothing call for the parameter slabs, one per color
    step for the fields) cross DCN.
    """
    from .sharding import make_mesh
    return make_mesh(n_devices, axes=axes, devices=jax.devices())
