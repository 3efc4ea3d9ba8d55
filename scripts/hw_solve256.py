"""End-to-end 256³ DEFAULT-config solve on one chip.

The reference's production configuration (sslsolver + semicoarsening +
line relaxation, tol 1e-6) at BASELINE's largest size class — 50M DOF
through the full public solve() path: device Krylov scalars, bf16
factor caches under the HBM meter, two-float refinement to a TRUE
1e-6.

Run (ambient TPU env; generous timeout — compiles are remote):
    EMG3D_TPU_FSTACK_EVICT=5000000000 python scripts/hw_solve256.py
"""
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np


def main(n=256):
    from emg3d_tpu import TensorMesh, Model, SourceField, solve

    grid = TensorMesh([np.full(n, 100.)] * 3)
    model = Model(grid, property_x=1.0, mapping='Resistivity')
    sfield = SourceField.zeros(grid, frequency=1.0)
    np.asarray(sfield.fx)[n//2, n//2, n//2] = 1.0

    def run(tag, **kw):
        t0 = time.time()
        e, info = solve(grid, model, sfield, semicoarsening=True,
                        linerelaxation=True, tol=1e-6,
                        return_info=True, **kw)
        print(f"{tag}: {time.time()-t0:.1f} s {info['exit_message']} "
              f"rel={info['rel_error']:.2e} it_ssl={info['it_ssl']} "
              f"it_mg={info['it_mg']}", flush=True)

    def gc_pause():
        # Between runs: drop every dead device buffer before the next
        # solve re-uploads its hierarchy (the warm repeat of a run
        # that peaked near the HBM limit otherwise OOMs on leftover
        # fragmentation — measured round 5).
        import gc
        gc.collect()
        time.sleep(2)

    mode = sys.argv[2] if len(sys.argv) > 2 else 'ssl'
    failed = None
    if mode == 'ssl':
        try:
            run('cold sslsolver+sc+lr', sslsolver=True, verb=2)
            run('warm sslsolver+sc+lr', sslsolver=True, verb=1)
        except Exception as exc:
            failed = type(exc).__name__
    if mode == 'mg' or failed:
        # The full Krylov working set (~7 fields = 5.6 GB at 256³)
        # may not fit next to the hierarchy on a 16 GB chip — fall
        # back to the standalone MG config (same smoothers, two-float
        # refinement to a true 1e-6, no Krylov vectors) so the run
        # still records an end-to-end 256³ solve.  The fallback runs
        # OUTSIDE the except block (the live traceback would pin the
        # dead run's device arrays) after a GC pass.
        if failed:
            print(f"sslsolver failed ({failed}); standalone sc+lr "
                  f"fallback:", flush=True)
        import gc
        gc.collect()
        run('cold sc+lr F-cycles', cycle='F', sslsolver=False, verb=2)
        gc_pause()
        run('warm sc+lr F-cycles', cycle='F', sslsolver=False, verb=1)


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
