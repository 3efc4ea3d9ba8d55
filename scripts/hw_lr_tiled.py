"""HW validation: tiled line kernels vs untiled on the real chip.

Forces the 256³-class tilings at a small shape so the Mosaic lowering
of the new slicing patterns is exercised cheaply:

- Thomas z-slabs (_tz=256 at (32, 32, 260); Zp0 = 384)
- residual y-slabs (_tyr at (32, 96, 64))

Each prints max|tiled - untiled| (expect 0.0) and per-call timing.

Run (ambient TPU env): python scripts/hw_lr_tiled.py [case]
"""
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np
import jax.numpy as jnp

from emg3d_tpu import cx
from emg3d_tpu.ops.pallas_lr import line_relaxation_pallas


def _setup(shape, seed=7):
    nx, ny, nz = shape
    rng = np.random.default_rng(seed)

    def c2(sh):
        return cx.C2(jnp.asarray(rng.standard_normal(sh), jnp.float32),
                     jnp.asarray(rng.standard_normal(sh), jnp.float32))

    edges = ((nx, ny + 1, nz + 1), (nx + 1, ny, nz + 1),
             (nx + 1, ny + 1, nz))
    e = tuple(c2(sh) for sh in edges)
    s = tuple(c2(sh) for sh in edges)
    cells = (nx, ny, nz)
    par = (c2(cells), c2(cells), c2(cells),
           jnp.asarray(rng.uniform(0.5, 2.0, cells), jnp.float32),
           jnp.asarray(rng.uniform(50, 150, nx), jnp.float32),
           jnp.asarray(rng.uniform(50, 150, ny), jnp.float32),
           jnp.asarray(rng.uniform(50, 150, nz), jnp.float32))
    return e, s, par


def fetch(e):
    return np.stack([np.asarray(c.re) for c in e[:1]])


def run(shape, tune, label):
    e, s, par = _setup(shape)
    t0 = time.time()
    ref = line_relaxation_pallas(e, s, par, nu=2, shape=shape, axis=0,
                                 interpret=False)
    r0 = np.asarray(cx.tocomplex(ref[0]))
    print(f"{label}: untiled compiled+ran in {time.time()-t0:.1f} s",
          flush=True)
    t0 = time.time()
    out = line_relaxation_pallas(e, s, par, nu=2, shape=shape, axis=0,
                                 interpret=False, **tune)
    o0 = np.asarray(cx.tocomplex(out[0]))
    print(f"{label}: tiled    compiled+ran in {time.time()-t0:.1f} s",
          flush=True)
    d = np.max(np.abs(o0 - r0))
    rel = d / max(np.max(np.abs(r0)), 1e-30)
    print(f"{label}: max|diff| = {d:.3e} (rel {rel:.3e})", flush=True)
    # Warm timing x3.
    for name, tn in (('untiled', {}), ('tiled', tune)):
        ts = []
        for _ in range(3):
            t0 = time.time()
            o = line_relaxation_pallas(e, s, par, nu=2, shape=shape,
                                       axis=0, interpret=False, **tn)
            float(np.asarray(o[0].re)[0, 0, 0])
            ts.append(time.time() - t0)
        print(f"{label}: {name} warm best {min(ts)*1e3:.1f} ms",
              flush=True)
    return rel


def main():
    case = sys.argv[1] if len(sys.argv) > 1 else 'all'
    ok = True
    if case in ('all', 'z'):
        ok &= run((32, 32, 260), dict(_tz=256), 'z-tiled') < 1e-6
    if case in ('all', 'y'):
        ok &= run((32, 96, 64), dict(_tyr=48), 'y-tiled') < 1e-6
    print('PASS' if ok else 'FAIL', flush=True)


if __name__ == '__main__':
    main()
