"""The reference's PROFILED configuration on TPU: 64^3, sc + lr.

The reference's hot-spot analysis (docs/cpu_and_ram.rst:37-43) uses
nu=(0,2,1,2), sslsolver=False, semicoarsening=True,
linerelaxation=True at 262,144 cells.  This script times exactly that
solve end-to-end at tol=1e-6 and reports ms/cycle to compare against
the plain point-smoother bench (VERDICT round-1 item 1's target:
within ~1.5x of the point path's ms/cycle).

Run (ambient TPU env): python scripts/hw_sclr.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')


def main():
    from emg3d_tpu import TensorMesh, Model, SourceField, solve

    n = 64
    grid = TensorMesh([np.full(n, 100.)] * 3)
    model = Model(grid, property_x=1.0, mapping='Resistivity')
    sfield = SourceField.zeros(grid, frequency=1.0)
    np.asarray(sfield.fx)[n//2, n//2, n//2] = 1.0

    # Cold end-to-end (includes all remote kernel compiles).
    t0 = time.time()
    e, info = solve(grid, model, sfield, cycle='F', verb=1, tol=1e-6,
                    semicoarsening=True, linerelaxation=True,
                    nu_init=0, nu_pre=2, nu_coarse=1, nu_post=2,
                    return_info=True)
    t1 = time.time()
    print(f"cold: {info['exit_message']} rel={info['rel_error']:.2e} "
          f"it={info['it_mg']} wall={t1-t0:.1f} s", flush=True)

    # Warm repeat: per-cycle steady state.
    t0 = time.time()
    e, info = solve(grid, model, sfield, cycle='F', verb=1, tol=1e-6,
                    semicoarsening=True, linerelaxation=True,
                    nu_init=0, nu_pre=2, nu_coarse=1, nu_post=2,
                    return_info=True)
    t1 = time.time()
    per_cycle = (t1 - t0) / max(info['it_mg'], 1)
    print(f"warm: {info['exit_message']} rel={info['rel_error']:.2e} "
          f"it={info['it_mg']} wall={t1-t0:.1f} s "
          f"({per_cycle*1e3:.1f} ms/cycle incl. host loop)",
          flush=True)


if __name__ == '__main__':
    main()
