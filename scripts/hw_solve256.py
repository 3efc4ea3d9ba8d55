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

    t0 = time.time()
    e, info = solve(grid, model, sfield, sslsolver=True,
                    semicoarsening=True, linerelaxation=True,
                    tol=1e-6, verb=2, return_info=True)
    print(f"cold: {time.time()-t0:.1f} s {info['exit_message']} "
          f"rel={info['rel_error']:.2e} it_ssl={info['it_ssl']} "
          f"it_mg={info['it_mg']}", flush=True)
    t0 = time.time()
    e, info = solve(grid, model, sfield, sslsolver=True,
                    semicoarsening=True, linerelaxation=True,
                    tol=1e-6, verb=1, return_info=True)
    print(f"warm: {time.time()-t0:.1f} s {info['exit_message']} "
          f"rel={info['rel_error']:.2e} it_ssl={info['it_ssl']} "
          f"it_mg={info['it_mg']}", flush=True)


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
