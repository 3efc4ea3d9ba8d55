"""Worker for the multi-process (multi-host scaffold) CPU test.

Spawned by tests/test_parallel.py::test_distributed_init — one OS
process per fake "host", coordinated over localhost.  Validates that
init() wires the distributed system (global device view), and that a
computation over a global mesh actually reduces across processes.
"""
import sys

sys.path.insert(0, '/root/repo')


def main(coord, nproc, pid):
    from emg3d_tpu.parallel import distributed

    distributed.init(coordinator_address=coord, num_processes=nproc,
                     process_id=pid)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid, jax.process_index()
    ndev = len(jax.devices())
    nloc = len(jax.local_devices())
    assert ndev == nproc * nloc, (ndev, nproc, nloc)

    # A z-sharded global array: each process contributes its local
    # planes; the global sum must see every process's contribution.
    mesh = distributed.global_mesh(('z',))
    sh = NamedSharding(mesh, P(None, None, 'z'))
    gshape = (2, 2, 4 * ndev)

    def local_block(idx):
        lo = idx[2].start or 0
        hi = idx[2].stop if idx[2].stop is not None else gshape[2]
        blk = np.arange(gshape[2], dtype=np.float64)[lo:hi]
        return np.broadcast_to(blk, (2, 2, hi - lo))

    x = jax.make_array_from_callback(gshape, sh, local_block)
    total = jax.jit(lambda a: jnp.sum(a),
                    out_shardings=NamedSharding(mesh, P()))(x)
    expect = 4.0 * np.arange(gshape[2]).sum()
    got = float(np.asarray(total))
    assert abs(got - expect) < 1e-9, (got, expect)
    print(f"DIST_OK pid={pid} ndev={ndev} sum={got}", flush=True)


if __name__ == '__main__':
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
