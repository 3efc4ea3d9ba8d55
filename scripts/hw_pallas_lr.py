"""Hardware validation of the Pallas line smoother vs the XLA path.

Run on TPU (ambient env): compares line_relaxation_pallas against
smoothers.line_relaxation on random C2 float32 inputs at 64^3 for all
three axes, and times both JITTED (the unjitted XLA path is
dispatch-bound over the remote tunnel — ~11-18 s vs its 38 ms jitted
time at 64^3 — and must never be used as the baseline).
Fetch-a-scalar timing; the tunnel's block_until_ready does not block.
"""
import functools
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np
import jax
import jax.numpy as jnp

from emg3d_tpu import TensorMesh, Model, SourceField, VolumeModel, cx
from emg3d_tpu.ops import smoothers
from emg3d_tpu.ops.pallas_lr import line_relaxation_pallas, line_factors


def setup(shape, seed=3):
    rng = np.random.default_rng(seed)
    grid = TensorMesh([rng.uniform(50, 150, n) for n in shape])
    model = Model(grid, property_x=rng.uniform(.1, 10, grid.shape_cells))
    sfield = SourceField.zeros(grid, frequency=0.9)
    sfield.fx[shape[0]//2, shape[1]//2, shape[2]//2] = 1 + 0.5j
    vm = VolumeModel(grid, model, sfield)
    par = tuple(
        cx.aspair(np.asarray(a), dtype=jnp.float32)
        if np.iscomplexobj(np.asarray(a))
        else jnp.asarray(np.asarray(a), dtype=jnp.float32)
        for a in (vm.eta_x, vm.eta_y, vm.eta_z, vm.zeta,
                  grid.h[0], grid.h[1], grid.h[2]))
    s = tuple(cx.aspair(np.asarray(f), dtype=jnp.float32)
              for f in (sfield.fx, sfield.fy, sfield.fz))
    e = tuple(cx.zeros_like(x) for x in s)
    return e, s, par


def fetch(t):
    return float(jnp.sum(t[0].re))


def main():
    shape = (64, 64, 64)
    e, s, par = setup(shape)
    for axis in (0, 1, 2):
        jline = jax.jit(functools.partial(smoothers.line_relaxation,
                                          nu=2, axis=axis))
        t0 = time.time()
        fs = line_factors(par, shape, axis)
        float(jnp.sum(fs))
        t1 = time.time()
        out = line_relaxation_pallas(e, s, par, nu=2, shape=shape,
                                     axis=axis, fstack=fs)
        fetch(out)
        t2 = time.time()
        ref = jline(*e, *s, *par)
        fetch(ref)
        t3 = time.time()
        err = max(
            float(jnp.max(jnp.abs(a.re - b.re)) +
                  jnp.max(jnp.abs(a.im - b.im)))
            for a, b in zip(ref, out))
        scale = max(float(jnp.max(jnp.abs(a.re)) + jnp.max(jnp.abs(a.im)))
                    for a in ref)
        print(f"axis={axis}: factors {t1-t0:6.2f}s "
              f"pallas(compile+run) {t2-t1:6.2f}s "
              f"xla(compile+run) {t3-t2:6.2f}s "
              f"maxerr={err:.3e} (scale {scale:.3e})", flush=True)

        # Steady-state timing: 5 repeats each; the "cached" variant
        # passes the solver's per-level pre-rotated parameters +
        # packed residual stacks (the production path).
        from emg3d_tpu.ops.pallas_lr import rotate_arrays, line_params
        rot = rotate_arrays(par, axis)
        pp = line_params(rot, shape, axis)
        float(jnp.sum(pp[0]))
        # Warm BOTH variants (first call pays the remote compile).
        fetch(line_relaxation_pallas(e, s, par, nu=2, shape=shape,
                                     axis=axis, fstack=fs,
                                     arrays_rot=rot, params=pp))
        t0 = time.time()
        for _ in range(5):
            out = line_relaxation_pallas(e, s, par, nu=2, shape=shape,
                                         axis=axis, fstack=fs)
        fetch(out)
        tp = (time.time() - t0) / 5
        t0 = time.time()
        for _ in range(5):
            out = line_relaxation_pallas(e, s, par, nu=2, shape=shape,
                                         axis=axis, fstack=fs,
                                         arrays_rot=rot, params=pp)
        fetch(out)
        tc = (time.time() - t0) / 5
        t0 = time.time()
        for _ in range(5):
            ref = jline(*e, *s, *par)
        fetch(ref)
        tx = (time.time() - t0) / 5
        print(f"         steady: pallas {tp*1e3:8.2f} ms  "
              f"cached {tc*1e3:8.2f} ms  "
              f"xla {tx*1e3:8.2f} ms  speedup {tx/tc:5.2f}x", flush=True)


if __name__ == '__main__':
    main()
