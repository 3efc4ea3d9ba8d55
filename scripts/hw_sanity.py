"""Self-consistent relative timings in ONE process (in-jit scans).

Tunnel/device performance drifts by large factors between sessions
(measured: bench 14.0 vs 24.2 ms/cycle on identical code), so only
same-session ratios are meaningful.  Interleaves: Pallas point
smoother (nu=2, nu=1), XLA point smoother, the full F-cycle, and a
repeat of the first measurement to bound drift within the session.

Run: python scripts/hw_sanity.py [n] [K]
"""
import functools
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np


def main(n=64, K=20):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from emg3d_tpu import (TensorMesh, Model, SourceField, Field,
                           VolumeModel)
    from emg3d_tpu import solver as S
    from emg3d_tpu import cx
    from emg3d_tpu.ops import pallas_gs, smoothers

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
    lev = levels[0]
    e, s = ctx.e, ctx.s

    def scalar_fetch(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        return float(np.asarray(jax.jit(lambda a: a.ravel()[0])(leaf)))

    def timed(tag, mk_body):
        @functools.partial(jax.jit, static_argnames=('nn',))
        def reps(e_, nn):
            def body(st, _):
                return mk_body(st), None
            return lax.scan(body, e_, None, length=nn)[0]

        scalar_fetch(reps(e, K))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            scalar_fetch(reps(e, K))
            best = min(best, (time.perf_counter() - t0) / K)
        print(f"  {tag:34s} {best*1e3:8.2f} ms (in-jit)", flush=True)
        return best

    print(f"sanity at {n}^3, K={K}:", flush=True)
    pal = lambda st: pallas_gs.gauss_seidel_point_pallas(
        tuple(st), s, tuple(lev.arrays), nu=2, shape=lev.shape)
    timed("pallas point nu=2", pal)
    timed("pallas point nu=1",
          lambda st: pallas_gs.gauss_seidel_point_pallas(
              tuple(st), s, tuple(lev.arrays), nu=1, shape=lev.shape))
    timed("XLA point nu=2",
          lambda st: smoothers.gauss_seidel_point(
              *st, *s, *lev.arrays, nu=2))

    static = tuple((lv.shape, lv.coarsen, None, lv.rweights,
                    lv.pweights) for lv in levels)
    arrays = tuple(lv.arrays for lv in levels)
    conf = (var.nu_pre, var.nu_coarse, var.nu_post, 'F', 0)
    timed("full F-cycle (mg_rec)",
          lambda st: S._mg_rec(st, s, arrays, static, 0, 2, 0, conf,
                               is_top=True))
    timed("pallas point nu=2 (repeat)", pal)


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64,
         int(sys.argv[2]) if len(sys.argv) > 2 else 20)
