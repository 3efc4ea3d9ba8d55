#!/usr/bin/env python
"""Benchmark: DOF/s on the reference's headline config.

Config: homogeneous isotropic fullspace (1 Ohm-m), 1 Hz x-directed
dipole at the center, 64x64x64 cells of 100 m, F-cycle multigrid to
tol=1e-6 — the configuration of the reference's published scaling
figure (docs/paper.md:74 + paper.png: 0.26M cells = 10.5 s on a single
Intel Xeon 2.50 GHz thread => 3*64^3 / 10.5 s ~= 74.9 kDOF/s).

Prints ONE json line: metric, value (DOF/s), unit, vs_baseline.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

REF_BASELINE_DOF_S = 3 * 64**3 / 10.5  # reference single-core CPU


def main():
    import jax
    from emg3d_tpu import TensorMesh, Model, SourceField, solve

    n = 64
    grid = TensorMesh([np.full(n, 100.)] * 3)
    model = Model(grid, property_x=1.0, mapping='Resistivity')
    sfield = SourceField.zeros(grid, frequency=1.0)
    np.asarray(sfield.fx)[n//2, n//2, n//2] = 1.0

    # Tolerance: 1e-6 in float64 (CPU); the float32 TPU path bottoms
    # out at its residual-evaluation floor just above 1e-6.
    import jax.numpy as jnp
    f64 = jnp.zeros(0).dtype == np.float64
    tol = 1e-6 if f64 else 5e-6

    # Warm-up (compile).
    e, info = solve(grid, model, sfield, cycle='F', verb=1, tol=tol,
                    return_info=True)
    assert info['exit_message'] == 'CONVERGED', info

    # Timed runs.
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        e, info = solve(grid, model, sfield, cycle='F', verb=1, tol=tol,
                        return_info=True)
        times.append(time.perf_counter() - t0)
    t = min(times)

    dof = 3 * n**3
    dof_s = dof / t
    print(json.dumps({
        'metric': f'DOF/s, 64^3 fullspace F-cycle to {tol:.0e} '
                  f'({info["it_mg"]} cycles, rel={info["rel_error"]:.1e},'
                  f' {jax.devices()[0].platform})',
        'value': round(dof_s, 1),
        'unit': 'DOF/s',
        'vs_baseline': round(dof_s / REF_BASELINE_DOF_S, 3),
    }))


if __name__ == '__main__':
    main()
