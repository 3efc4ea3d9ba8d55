"""Weak-scaling proxy of the shard_map halo smoother (CPU mesh).

Fixed per-device block (nx × ny × base_planes z-cells per device),
global problem grows with the device count: ideal weak scaling keeps
the per-call time flat.

This is a CPU-host proxy with two structural caveats the raw numbers
must be corrected for:

- 8 virtual XLA:CPU devices oversubscribe the box's physical cores
  (ncores printed below): beyond ncores shards the per-call ideal is
  T(1)·ndev/ncores, so the reported efficiency is per-core
  normalized: eff(n) = T(1)·max(1, n/ncores) / T(n).
- XLA:CPU runs collectives synchronously (no async
  collective-permute-start/done pairs in its HLO), so NONE of the
  engineered halo/compute overlap (shmap._point_bulk runs with no
  collective dependence) is realizable here — the proxy bounds the
  pipeline's structural overhead from ABOVE.  The overlap guarantee
  itself is mechanical: tests/test_parallel.py::
  test_shmap_bulk_has_no_collectives executes the O(volume) bulk
  outside any mesh context.

The default per-device block (64×64×32 cells) matches the production
regime (a 256³ problem over 8 devices holds 32 planes/device); pass a
different base_planes to stress the surface/volume ratio.

Run:  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/scaling_shmap.py [base_planes]
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from emg3d_tpu import TensorMesh, Model, SourceField, VolumeModel, parallel
from emg3d_tpu import solver as S
from emg3d_tpu.parallel import shmap


def bench_one(ndev, base_planes=32, nxy=64, nu=2, reps=5,
              kind='point'):
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
        if kind == 'point':
            out = shmap.gauss_seidel_point_shmap(
                e, s, lev.arrays, nu=nu, shape=lev.shape, mesh=mesh)
        else:
            # z-lines ALONG the sharded z axis: the substructured
            # _line_body_xsh path (interior Thomas + spike solves +
            # redundant length-ndev interface solve; per color step
            # one neighbor ppermute + one all_gather of the 5-vector
            # interface rhs).
            out = shmap.line_relaxation_shmap(
                e, s, lev.arrays, nu=nu, shape=lev.shape, mesh=mesh,
                axis=2)
        jax.block_until_ready(out)
        return out

    run()                       # compile
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best


def main(base_planes=32):
    navail = len(jax.devices())
    ncores = os.cpu_count() or navail
    print(f"virtual devices: {navail}, physical cores: {ncores}, "
          f"block {64}x{64}x{base_planes} cells/device", flush=True)
    for kind in ('point', 'line-z'):
        print(f"-- {kind} smoother "
              f"({'8-color node blocks' if kind == 'point' else 'distributed z-lines along the sharded axis'})",
              flush=True)
        results = {}
        for ndev in (1, 2, 4, 8):
            if ndev > navail:
                break
            t = bench_one(ndev, base_planes=base_planes, kind=kind)
            results[ndev] = t
            raw = results[1] / t
            norm = raw * max(1.0, ndev / ncores)
            print(f"ndev={ndev}: {t*1e3:8.2f} ms/call  raw eff {raw:5.1%}"
                  f"  per-core-normalized {norm:5.1%}", flush=True)


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
