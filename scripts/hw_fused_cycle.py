"""Whole-cycle fusion experiment: N F-cycles per dispatch via lax.scan.

hw_cycle_breakdown measured ~2.7 ms base per-dispatch tunnel overhead
(~9 ms with solver-sized argument pytrees) — the 64³ host-driven cycle
pays 3 dispatches ≈ 20 ms wall for ~6 ms of device work.  This script
times a single jit that scans the full F-cycle body N times with
per-cycle residual norms as scan outputs (what the solver needs for
its pipelined convergence checks).

Run: python scripts/hw_fused_cycle.py [n] [N]
"""
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np


def main(n=64, N=5):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from emg3d_tpu import (TensorMesh, Model, SourceField, Field,
                           VolumeModel)
    from emg3d_tpu import solver as S

    grid = TensorMesh([np.full(n, 100.)] * 3)
    model = Model(grid, property_x=1.0, mapping='Resistivity')
    sfield = SourceField.zeros(grid, frequency=1.0)
    np.asarray(sfield.fx)[n//2, n//2, n//2] = 1.0

    vm = VolumeModel(grid, model, sfield)
    var = S.MGParameters(
        verb=1, cycle='F', sslsolver=False, linerelaxation=False,
        semicoarsening=False, shape_cells=tuple(grid.shape_cells),
        tol=1e-6)
    ctx = S._SolveContext(grid, vm, sfield,
                          Field.zeros(grid, frequency=1.0), var)
    levels = ctx.levels(0)
    conf = (var.nu_pre, var.nu_coarse, var.nu_post, 'F', 0)

    static = tuple((lv.shape, lv.coarsen, None, lv.rweights,
                    lv.pweights) for lv in levels)
    arrays = tuple(lv.arrays for lv in levels)

    # Probe the Pallas shapes the fused graph will embed.
    from emg3d_tpu.ops import pallas_gs
    for lv in levels:
        if pallas_gs.supported_shape(lv.shape):
            pallas_gs.point_probe(lv.shape)

    import functools

    @functools.partial(jax.jit, static_argnames=('nn',))
    def ncycles(e, s, nn):
        def body(e_, _):
            e_ = S._mg_rec(e_, s, arrays, static, 0, 2, 0, conf,
                           is_top=True)
            r = S._residual_e(e_, s, arrays[0])
            return e_, S._norm(*r)

        return lax.scan(body, e, None, length=nn)

    def fetch(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        return np.asarray(leaf)

    t0 = time.perf_counter()
    e_out, norms = ncycles(ctx.e, ctx.s, N)
    nm = fetch(norms)
    print(f"compile+first run ({N} cycles): "
          f"{time.perf_counter()-t0:.1f} s", flush=True)

    for rep in range(3):
        t0 = time.perf_counter()
        e_out, norms = ncycles(ctx.e, ctx.s, N)
        nm = fetch(norms)
        dt = time.perf_counter() - t0
        print(f"warm: {dt*1e3:.1f} ms total = {dt/N*1e3:.2f} ms/cycle",
              flush=True)
    l2s = np.sqrt(np.asarray(nm))
    print("per-cycle residual norms:", [f"{v:.3e}" for v in l2s],
          flush=True)

    # Reference: host-driven per-cycle path, same cycle count.
    e_h = ctx.e
    S.run_one_cycle(e_h, ctx.s, levels, conf)  # warm pieces
    t0 = time.perf_counter()
    e_h = ctx.e
    for _ in range(N):
        e_h = S.run_one_cycle(e_h, ctx.s, levels, conf)
    r = S._jit_residual(e_h, ctx.s, levels[0].arrays)
    fetch(r)
    dt = time.perf_counter() - t0
    print(f"host-driven reference: {dt/N*1e3:.2f} ms/cycle", flush=True)

    # Parity.
    df = max(float(np.max(np.abs(fetch(a) - fetch(b))))
             for a, b in zip(jax.tree_util.tree_leaves(e_out),
                             jax.tree_util.tree_leaves(e_h)))
    print(f"max|fused - host-driven| = {df:.3e}", flush=True)


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64,
         int(sys.argv[2]) if len(sys.argv) > 2 else 5)
