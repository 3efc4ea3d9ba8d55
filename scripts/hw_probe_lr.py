#!/usr/bin/env python
"""Hardware probe: line-relaxation kernels vs (tx, ty, chx) tiles.

Times nu=2 x-axis line relaxation at a given grid size for tile
candidates, catching compile failures.  Correctness is spot-checked
against the jitted XLA path on the first passing config.  Usage:

    python scripts/hw_probe_lr.py 64 "16,8,8 16,16,8 16,32,8 8,8,8"
    python scripts/hw_probe_lr.py 128 "8,8,8 6,8,8"
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/scripts')


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    cfgs = []
    for tok in (sys.argv[2].split() if len(sys.argv) > 2 else ['None']):
        if tok == 'None':
            cfgs.append((None, None, None))
        else:
            cfgs.append(tuple(None if p == 'None' else int(p)
                              for p in tok.split(',')))
    bf16 = 'bf16' in sys.argv[3:]

    import jax
    import jax.numpy as jnp
    from emg3d_tpu.ops import pallas_lr, smoothers
    from hw_pallas_lr import setup, fetch

    shape = (n, n, n)
    e, s, par = setup(shape)
    print(f"backend={jax.default_backend()} "
          f"limit={pallas_lr._vmem_limit()} bf16={bf16}", flush=True)

    t0 = time.perf_counter()
    fs = pallas_lr.line_factors(
        par, shape, 0, fdtype=jnp.bfloat16 if bf16 else None)
    float(jnp.sum(fs.astype(jnp.float32)))
    print(f"factors: {time.perf_counter()-t0:.1f}s "
          f"({fs.nbytes/2**20:.0f} MB)", flush=True)

    ref = None
    if n <= 64:
        jline = jax.jit(functools.partial(smoothers.line_relaxation,
                                          nu=2, axis=0))
        t0 = time.perf_counter()
        ref = jline(*e, *s, *par)
        fetch(ref)
        t1 = time.perf_counter()
        fetch(jline(*e, *s, *par))
        print(f"XLA jitted: compile+1st {t1-t0:.1f}s, "
              f"2nd {time.perf_counter()-t1:.3f}s", flush=True)

    for tx, ty, chx in cfgs:
        tag = f"tx={tx} ty={ty} chx={chx}"
        try:
            t0 = time.perf_counter()
            out = pallas_lr.line_relaxation_pallas(
                e, s, par, nu=2, shape=shape, axis=0, fstack=fs,
                _tx=tx, _ty=ty, _chx=chx)
            fetch(out)
            t_compile = time.perf_counter() - t0
        except Exception as ex:
            print(f"FAIL {tag}: {str(ex).splitlines()[0][:140]}",
                  flush=True)
            continue
        if ref is not None:
            err = max(float(jnp.max(jnp.abs(a.re - b.re)) +
                            jnp.max(jnp.abs(a.im - b.im)))
                      for a, b in zip(out, ref))
            errtxt = f" maxdiff={err:.2e}"
        else:
            errtxt = ""
        t0 = time.perf_counter()
        fetch(out)
        t_fetch = time.perf_counter() - t0
        K = 10
        ee = e
        t0 = time.perf_counter()
        for _ in range(K):
            ee = pallas_lr.line_relaxation_pallas(
                ee, s, par, nu=2, shape=shape, axis=0, fstack=fs,
                _tx=tx, _ty=ty, _chx=chx)
        fetch(ee)
        per = (time.perf_counter() - t0 - t_fetch) / K
        print(f"OK   {tag}: compile+1st {t_compile:.1f}s, "
              f"per-call {per*1e3:.1f} ms{errtxt}", flush=True)


if __name__ == '__main__':
    main()
