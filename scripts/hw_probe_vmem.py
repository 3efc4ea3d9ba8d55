#!/usr/bin/env python
"""Hardware probe: point-smoother kernel compile/run vs vmem limit.

For each (tx, tyl) candidate at a given grid size, AOT-compile the
fused point kernel with the module's VMEM_LIMIT (set via
EMG3D_TPU_VMEM_LIMIT) and time nu=2 sweeps jit-to-jit.  Reports one
line per config; compile failures are caught and reported, never
fatal.  Usage:

    EMG3D_TPU_VMEM_LIMIT=67108864 python scripts/hw_probe_vmem.py 64 "4,None 8,None 12,None"
"""
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    cfgs = []
    if len(sys.argv) > 2:
        for tok in sys.argv[2].split():
            a, b = tok.split(',')
            cfgs.append((None if a == 'None' else int(a),
                         None if b == 'None' else int(b)))
    else:
        cfgs = [(None, None)]

    import jax
    import jax.numpy as jnp
    from emg3d_tpu import TensorMesh, Model, SourceField, VolumeModel, cx
    from emg3d_tpu.ops import pallas_gs

    shape = (n, n, n)
    rng = np.random.default_rng(3)
    grid = TensorMesh([np.full(m, 100.) for m in shape])
    model = Model(grid, property_x=rng.uniform(.5, 2., grid.shape_cells))
    sfield = SourceField.zeros(grid, frequency=1.0)
    sfield.fx[n//2, n//2, n//2] = 1.0
    vm = VolumeModel(grid, model, sfield)
    par = tuple(
        cx.aspair(np.asarray(a), dtype=jnp.float32)
        if np.iscomplexobj(np.asarray(a))
        else jnp.asarray(np.asarray(a), dtype=jnp.float32)
        for a in (vm.eta_x, vm.eta_y, vm.eta_z, vm.zeta,
                  grid.h[0], grid.h[1], grid.h[2]))
    s = tuple(cx.aspair(np.asarray(f), dtype=jnp.float32)
              for f in (sfield.fx, sfield.fy, sfield.fz))
    e = tuple(cx.zeros_like(x) for x in s)

    print(f"backend={jax.default_backend()} "
          f"VMEM_LIMIT={pallas_gs.VMEM_LIMIT}", flush=True)

    def fetch(x):
        return float(abs(np.asarray(x[0].re[1, 1, 1])))

    for tx, tyl in cfgs:
        tag = f"tx={tx} tyl={tyl}"
        try:
            t0 = time.perf_counter()
            out = pallas_gs.gauss_seidel_point_pallas(
                e, s, par, nu=2, shape=shape, _tx=tx, _tyl=tyl)
            fetch(out)
            t_compile = time.perf_counter() - t0
        except Exception as ex:
            msg = str(ex).split('\n')[0][:160]
            print(f"FAIL {tag}: {msg}", flush=True)
            continue
        # Dispatches are async; the only reliable clock is a chained
        # sequence of K calls closed by one scalar fetch.
        t0 = time.perf_counter()
        fetch(out)
        t_fetch = time.perf_counter() - t0
        K = 10
        ts = []
        for _ in range(3):
            ee = e
            t0 = time.perf_counter()
            for _ in range(K):
                ee = pallas_gs.gauss_seidel_point_pallas(
                    ee, s, par, nu=2, shape=shape, _tx=tx, _tyl=tyl)
            fetch(ee)
            ts.append((time.perf_counter() - t0 - t_fetch) / K)
        print(f"OK   {tag}: compile+1st {t_compile:.1f}s, "
              f"per-call(ms) {' '.join(f'{t*1e3:.1f}' for t in ts)} "
              f"min={min(ts)*1e3:.1f}", flush=True)


if __name__ == '__main__':
    main()
