"""Piecewise hardware timing of the 64³ point-smoother F-cycle.

The axon backend exposes no device trace lanes, so the breakdown is
measured directly: each piece (full cycle, L0 Pallas smoother, fused
pre-smooth+restrict, prolong+post-smooth, fused coarse tail, a trivial
dispatch) is dispatched K times back-to-back and timed by one scalar
fetch — amortizing the ~28 ms device→host round trip and exposing
per-dispatch tunnel overhead vs device compute.

Run on an OTHERWISE-IDLE box (host dispatch contends with CPU jobs):
    python scripts/hw_cycle_breakdown.py [n] [K]
Optionally with EMG3D_TPU_FUSE_CELLS=300000 to fuse the whole cycle
into one dispatch (measures the compile-time/dispatch-count trade).
"""
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np


def main(n=64, K=10):
    import jax
    import jax.numpy as jnp
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
    lev0 = levels[0]

    def fetch(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        return float(abs(np.asarray(leaf).ravel()[0]))

    def timed(tag, fn, state, reps=2):
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            st = state
            for _ in range(K):
                st = fn(st)
            fetch(st)
            best = min(best, (time.perf_counter() - t0) / K)
        print(f"  {tag:34s} {best*1e3:8.2f} ms/iter", flush=True)
        return best

    e, s = ctx.e, ctx.s

    t0 = time.perf_counter()
    ew = S.run_one_cycle(e, s, levels, conf)
    fetch(ew)
    print(f"warm-up (compiles): {time.perf_counter()-t0:.1f} s",
          flush=True)

    print(f"breakdown at {n}^3, K={K}:", flush=True)
    timed("full F-cycle",
          lambda st: S.run_one_cycle(st, s, levels, conf), ew)

    # L0 Pallas smoother alone (the production nu_pre=2 call).
    from emg3d_tpu.ops import pallas_gs
    if pallas_gs.enabled() and pallas_gs.supported(tuple(ew)):
        pp = S._level_pparams(lev0, 0)
        fn = lambda st: pallas_gs.gauss_seidel_point_pallas(
            tuple(st), tuple(s), tuple(lev0.arrays), nu=2,
            shape=lev0.shape, params=pp)
        fn(ew)
        timed("L0 pallas smoother nu=2", fn, ew)

        # pack/unpack round trip alone (the per-call XLA prologue).
        import functools
        @functools.partial(jax.jit, static_argnames=('shape', 'myp'))
        def packrt(e_, s_, shape, myp):
            est, sst = pallas_gs.pack_fields(tuple(e_), tuple(s_),
                                             shape, min_yp=myp)
            return pallas_gs.unpack_efield(
                est, tuple(c.shape for c in e_))
        myp = pallas_gs.point_layout(lev0.shape)[5]
        fn = lambda st: packrt(st, s, lev0.shape, myp)
        fn(ew)
        timed("pack+unpack round trip", fn, ew)

    # Fused L0 pieces.
    fst = S._level_fstacks(lev0, 0)
    pp0 = S._level_pparams(lev0, 0)
    fn = lambda st: S._smooth_coarse_jit(
        st, s, lev0.arrays, lev0.rweights, lev0.coarsen, var.nu_pre,
        0, lev0.shape, fstacks=fst, pparams=pp0)[0]
    fn(ew)
    timed("L0 smooth+restrict", fn, ew)

    _, rc, ec = S._smooth_coarse_jit(
        ew, s, lev0.arrays, lev0.rweights, lev0.coarsen, var.nu_pre,
        0, lev0.shape, fstacks=fst, pparams=pp0)
    fn = lambda st: S._prolong_smooth_jit(
        st, ec, lev0.pweights, lev0.coarsen, s, lev0.arrays,
        var.nu_post, 0, lev0.shape, fstacks=fst, pparams=pp0)
    fn(ew)
    timed("L0 prolong+post-smooth", fn, ew)

    # The fused coarse tail (levels >= 1 when <= FUSE_CELLS).
    lvl = next((i for i, lv in enumerate(levels)
                if i > 0 and int(np.prod(lv.shape)) <= S._FUSE_CELLS),
               None)
    if lvl is not None:
        tail = S._get_tail_fn(levels, lvl, 2, 0, conf)
        arrays = tuple(lv.arrays for lv in levels[lvl:])
        weights = tuple((lv.rweights, lv.pweights)
                        for lv in levels[lvl:])
        fn = lambda st: tail(st, rc, arrays, weights)
        st0 = fn(ec)
        timed(f"fused tail (L{lvl}+, "
              f"{levels[lvl].shape[0]}^3)", fn, st0)

    # Dispatch floor: a trivial jit on a tiny array.
    tiny = jnp.zeros((8, 128), jnp.float32)
    triv = jax.jit(lambda x: x + 1.0)
    triv(tiny)
    timed("trivial dispatch floor", triv, tiny)


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64,
         int(sys.argv[2]) if len(sys.argv) > 2 else 10)
