"""Stage-by-stage HBM accounting of a 256³ sc+lr cycle (one chip).

Builds the solve context piece by piece, printing device memory stats
after each stage, then runs cycles one at a time with the rotation
schedule — pinpoints WHERE the 16 GB chip runs out (round-4/5 256³
end-to-end attempts OOM mid-solve with no visibility).
"""
import gc
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np


def mem(tag):
    import jax
    try:
        st = jax.devices()[0].memory_stats()
        used = st.get('bytes_in_use', 0) / 1e9
        peak = st.get('peak_bytes_in_use', 0) / 1e9
        lim = st.get('bytes_limit', 0) / 1e9
        print(f"[mem] {tag}: in_use={used:.2f} GB peak={peak:.2f} "
              f"limit={lim:.2f}", flush=True)
    except Exception as exc:
        print(f"[mem] {tag}: unavailable ({type(exc).__name__})",
              flush=True)


def main(n=256, ncyc=8):
    import jax
    from emg3d_tpu import TensorMesh, Model, SourceField, Field, cx
    from emg3d_tpu import VolumeModel
    from emg3d_tpu import solver as S

    t00 = time.time()
    mem('start')

    grid = TensorMesh([np.full(n, 100.)] * 3)
    model = Model(grid, property_x=1.0, mapping='Resistivity')
    sfield = SourceField.zeros(grid, frequency=1.0)
    np.asarray(sfield.fx)[n//2, n//2, n//2] = 1.0

    vm = VolumeModel(grid, model, sfield)
    var = S.MGParameters(
        verb=1, cycle='F', sslsolver=False, linerelaxation=True,
        semicoarsening=True, shape_cells=tuple(grid.shape_cells),
        tol=1e-6)
    ctx = S._SolveContext(grid, vm, sfield,
                          Field.zeros(grid, frequency=1.0), var)
    mem('context (e+s uploaded)')

    e, s = ctx.e, ctx.s
    r = S._jit_residual(e, s, ctx.levels(int(var.sc_dir))[0].arrays)
    print('r0 =', float(S._norm(*r)), f'({time.time()-t00:.0f} s)',
          flush=True)
    mem('levels(sc_dir0) + residual')

    spdt = S._smooth_spdt(e)
    for ic in range(ncyc):
        conf = (var.nu_pre, var.nu_coarse, var.nu_post, var.cycle,
                int(var.lr_dir))
        levels = ctx.levels(int(var.sc_dir))
        t0 = time.time()
        zero = tuple(cx.zeros_like(c) for c in e)
        delta = S.run_one_cycle(zero, r, levels, conf, spdt=spdt)
        e = tuple(a + d for a, d in zip(e, delta))
        del zero, delta
        r = S._jit_residual(e, s, levels[0].arrays)
        nrm = float(S._norm(*r))
        print(f"cycle {ic} (sc={var.sc_dir} lr={var.lr_dir}): "
              f"l2={nrm:.3e}  {time.time()-t0:.1f} s", flush=True)
        mem(f'after cycle {ic}')
        if var.sc_cycle:
            var.sc_dir = next(var.sc_cycle)
        if var.lr_cycle:
            var.lr_dir = next(var.lr_cycle)
        gc.collect()
    print(f"total {time.time()-t00:.0f} s", flush=True)


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256,
         int(sys.argv[2]) if len(sys.argv) > 2 else 8)
