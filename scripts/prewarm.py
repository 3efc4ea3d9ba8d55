"""Pre-warm the (server-side) XLA compile cache for a solve shape.

The first process to solve a given shape/config pays the full remote
cold compile (14-27 min for the 32³ default config over the axon
tunnel — DESIGN §7).  The compile SERVER caches by computation
fingerprint, so a second process compiling the identical shapes warms
in ~90 s (measured, round 4).  Running this script once per target
shape at deploy time (e.g. from cron or a container entrypoint)

    python scripts/prewarm.py 32 &          # default production config
    python scripts/prewarm.py 64 --plain &  # standalone F-cycle config

moves the cliff out of every user-facing process.  The persistent
on-disk jax cache is NOT an alternative here: enabling
``jax_compilation_cache_dir`` hangs axon remote compiles (measured —
CLAUDE.md).

The pre-warm runs the complete default solve (not a truncated one):
the two-float refinement stages and the mode-switched chunk jits only
compile when the solve actually reaches them.
"""
import argparse
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np


def prewarm(n, plain=False, tol=1e-6):
    from emg3d_tpu import TensorMesh, Model, SourceField, solve

    grid = TensorMesh([np.full(n, 100.)] * 3)
    model = Model(grid, property_x=1.0, mapping='Resistivity')
    sfield = SourceField.zeros(grid, frequency=1.0)
    np.asarray(sfield.fx)[n // 2, n // 2, n // 2] = 1.0

    t0 = time.time()
    kw = dict(cycle='F', tol=tol, verb=1)
    if not plain:
        kw.update(sslsolver=True, semicoarsening=True,
                  linerelaxation=True)
    _, info = solve(grid, model, sfield, return_info=True, **kw)
    print(f"prewarm {n}^3 ({'plain' if plain else 'default'}): "
          f"{time.time()-t0:.0f} s, {info['exit_message']}",
          flush=True)


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('n', type=int, nargs='?', default=32)
    ap.add_argument('--plain', action='store_true',
                    help='standalone F-cycle config (no sslsolver/'
                         'sc/lr) instead of the production default')
    a = ap.parse_args()
    prewarm(a.n, plain=a.plain)
