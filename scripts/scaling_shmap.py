"""Weak-scaling proxy of the shard_map halo smoother (CPU mesh).

Fixed per-device block (nx × ny × base_planes z-cells per device),
global problem grows with the device count: ideal weak scaling keeps
the per-call time flat.  Efficiency(n) = T(1) / T(n).

This is a CPU-host proxy (virtual devices share physical cores, and
XLA:CPU serializes some collective work), so treat the numbers as a
lower bound for the structural overhead of the halo pipeline — the
point is that the halo exchange volume per shard is constant
(one (nx, ny) plane per color step) while compute per shard is
constant, i.e., the algorithm is weak-scalable by construction.

Run:  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/scaling_shmap.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from emg3d_tpu import TensorMesh, Model, SourceField, VolumeModel, parallel
from emg3d_tpu import solver as S
from emg3d_tpu.parallel import shmap


def bench_one(ndev, base_planes=8, nxy=64, nu=2, reps=5):
    nz = base_planes * ndev
    rng = np.random.default_rng(7)
    grid = TensorMesh([np.full(nxy, 100.), np.full(nxy, 100.),
                       np.full(nz, 100.)])
    model = Model(grid, property_x=rng.uniform(0.5, 5, grid.shape_cells))
    sfield = SourceField.zeros(grid, frequency=1.0)
    sfield.fx[nxy//2, nxy//2, nz//2] = 1.0
    vm = VolumeModel(grid, model, sfield)
    lev = S.build_levels(grid, vm, 0, 0, np.complex128)[0]
    s = tuple(jnp.asarray(f) for f in (sfield.fx, sfield.fy, sfield.fz))
    e = tuple(jnp.asarray(rng.normal(size=c.shape)
                          + 1j * rng.normal(size=c.shape)) for c in s)
    mesh = parallel.make_mesh(ndev, axes=('z',))

    def run():
        out = shmap.gauss_seidel_point_shmap(e, s, lev.arrays, nu=nu,
                                             shape=lev.shape, mesh=mesh)
        jax.block_until_ready(out)
        return out

    run()                       # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        run()
    return (time.perf_counter() - t0) / reps


def main():
    navail = len(jax.devices())
    results = {}
    for ndev in (1, 2, 4, 8):
        if ndev > navail:
            break
        t = bench_one(ndev)
        results[ndev] = t
        eff = results[1] / t
        print(f"ndev={ndev}: {t*1e3:8.2f} ms/call "
              f"(weak-scaling efficiency {eff:5.1%})", flush=True)


if __name__ == '__main__':
    main()
