"""Large-grid capability check on one TPU chip (128^3 / 256^3).

Runs device-resident F-cycles (point smoother and, where it fits,
line relaxation with inline Pallas factors) on a fullspace and reports
per-cycle time + convergence trajectory.  BASELINE config #5 class
(reference RAM behavior: docs/cpu_and_ram.rst:87-119).

Run (ambient TPU env):  python scripts/hw_bigrid.py [n] [lr] [sc]
"""
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')


def main(n=128, lr=False, sc=False):
    import jax.numpy as jnp
    from emg3d_tpu import TensorMesh, Model, SourceField, Field
    from emg3d_tpu import solver as S

    grid = TensorMesh([np.full(n, 100.)] * 3)
    model = Model(grid, property_x=1.0, mapping='Resistivity')
    sfield = SourceField.zeros(grid, frequency=1.0)
    np.asarray(sfield.fx)[n//2, n//2, n//2] = 1.0

    from emg3d_tpu import VolumeModel
    vm = VolumeModel(grid, model, sfield)
    var = S.MGParameters(
        verb=1, cycle='F', sslsolver=False,
        linerelaxation=bool(lr), semicoarsening=bool(sc),
        shape_cells=tuple(grid.shape_cells), tol=1e-6)
    ctx = S._SolveContext(grid, vm, sfield,
                          Field.zeros(grid, frequency=1.0), var)
    sc_dir = int(var.sc_dir) if sc else 0
    levels = ctx.levels(sc_dir)
    conf = (var.nu_pre, var.nu_coarse, var.nu_post, 'F',
            int(var.lr_dir))
    fstacks = S._level_fstacks(levels[0], conf[4]) if lr else None
    if fstacks is None:
        fmode = False
    else:
        ent = next(x for x in fstacks if x is not None)
        fmode = 'inline' if isinstance(ent[0], tuple) else 'cached'
    print(f"n={n} lr={lr} sc={sc} levels={len(levels)} "
          f"fstacks={fmode}", flush=True)

    e, s = ctx.e, ctx.s
    t0 = time.time()
    e = S.run_one_cycle(e, s, levels, conf)
    r = S._jit_residual(e, s, levels[0].arrays)
    l2 = float(S._norm(*r))
    print(f"cycle 1 (incl compile): {time.time()-t0:.1f} s "
          f"rel={l2/float(sfield.norm()):.2e}", flush=True)
    for it in range(2, 8):
        t0 = time.time()
        e = S.run_one_cycle(e, s, levels, conf)
        r = S._jit_residual(e, s, levels[0].arrays)
        l2 = float(S._norm(*r))
        print(f"cycle {it}: {time.time()-t0:6.2f} s "
              f"rel={l2/float(sfield.norm()):.2e}", flush=True)


if __name__ == '__main__':
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    lr = len(sys.argv) > 2 and sys.argv[2] not in ('0', 'false')
    sc = len(sys.argv) > 3 and sys.argv[3] not in ('0', 'false')
    main(n, lr, sc)
