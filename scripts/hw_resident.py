"""Hardware validation of the VMEM-resident point kernel.

Runs the resident variant (default dispatch) and the streaming kernel
and the jitted XLA smoother on identical random C2 inputs; compares
results and times each with in-jit scan repetitions (the only timing
pattern that is meaningful over the tunnel — CLAUDE.md).

    python scripts/hw_resident.py [n] [nu] [reps]
"""
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np


def main(n=32, nu=2, reps=20):
    import jax
    import jax.numpy as jnp
    from jax import lax
    sys.path.insert(0, '/root/repo/tests')
    from test_pallas_gs import _setup
    from emg3d_tpu.ops import pallas_gs, smoothers
    from emg3d_tpu import cx

    shape = (n, n, n)
    e, s, par = _setup(shape)
    plan = pallas_gs._resident_plan(shape)
    print(f"{shape}: resident plan = {plan}", flush=True)

    def fetch(x):
        return float(abs(np.asarray(x[0].re).ravel()[0]))

    t0 = time.time()
    out_res = pallas_gs.gauss_seidel_point_pallas(
        e, s, par, nu=nu, shape=shape)
    fetch(out_res)
    print(f"resident: compiled+ran in {time.time()-t0:.1f} s",
          flush=True)

    t0 = time.time()
    pallas_gs._RESIDENT_OFF.add(shape)
    pallas_gs.gauss_seidel_point_pallas.clear_cache()
    try:
        out_st = pallas_gs.gauss_seidel_point_pallas(
            e, s, par, nu=nu, shape=shape)
        fetch(out_st)
    finally:
        pallas_gs._RESIDENT_OFF.discard(shape)
        pallas_gs.gauss_seidel_point_pallas.clear_cache()
    print(f"streaming: compiled+ran in {time.time()-t0:.1f} s",
          flush=True)

    for a, b in zip(out_st, out_res):
        d = float(cx.abs2(a - b).sum()) ** 0.5
        r = float(cx.abs2(a).sum()) ** 0.5
        print(f"  |res-stream|/|stream| = {d / max(r, 1e-30):.3e}",
              flush=True)

    # In-jit scan timing: K applications inside one jit.
    def bench(tag, fn):
        @jax.jit
        def scan_fn(e0):
            def body(c, _):
                return fn(c), None
            out, _ = lax.scan(body, e0, None, length=reps)
            return out
        r1 = scan_fn(e)                        # compile+warm
        fetch(r1)
        t0 = time.time()
        r2 = scan_fn(e)
        fetch(r2)
        dt = time.time() - t0
        print(f"{tag}: {dt/reps*1e3:.2f} ms/call (in-jit x{reps})",
              flush=True)

    bench('resident  ', lambda e_: pallas_gs.gauss_seidel_point_pallas(
        e_, s, par, nu=nu, shape=shape))
    pallas_gs._RESIDENT_OFF.add(shape)
    pallas_gs.gauss_seidel_point_pallas.clear_cache()
    bench('streaming ', lambda e_: pallas_gs.gauss_seidel_point_pallas(
        e_, s, par, nu=nu, shape=shape))
    pallas_gs._RESIDENT_OFF.discard(shape)
    pallas_gs.gauss_seidel_point_pallas.clear_cache()
    bench('xla jit   ', lambda e_: smoothers.gauss_seidel_point(
        *e_, *s, *par, nu=nu))


def sweep(shapes=((32, 32, 32), (64, 64, 64), (64, 32, 32),
                  (32, 64, 64), (16, 16, 16), (64, 64, 16))):
    """Parity-only sweep over the shape classes a semicoarsened 256^3
    hierarchy embeds (anisotropic coarse levels included)."""
    sys.path.insert(0, '/root/repo/tests')
    from test_pallas_gs import _setup
    from emg3d_tpu.ops import pallas_gs
    from emg3d_tpu import cx

    for shape in shapes:
        e, s, par = _setup(shape)
        plan = pallas_gs._resident_plan(shape)
        if plan is None:
            print(f"{shape}: no resident plan, skip", flush=True)
            continue
        t0 = time.time()
        res = pallas_gs.gauss_seidel_point_pallas(
            e, s, par, nu=2, shape=shape)
        float(np.asarray(res[0].re).ravel()[0])
        t1 = time.time() - t0
        pallas_gs._RESIDENT_OFF.add(shape)
        pallas_gs.gauss_seidel_point_pallas.clear_cache()
        try:
            st = pallas_gs.gauss_seidel_point_pallas(
                e, s, par, nu=2, shape=shape)
            rel = max(
                float(cx.abs2(a - b).sum()) ** 0.5
                / max(float(cx.abs2(a).sum()) ** 0.5, 1e-30)
                for a, b in zip(st, res))
        finally:
            pallas_gs._RESIDENT_OFF.discard(shape)
            pallas_gs.gauss_seidel_point_pallas.clear_cache()
        print(f"{shape}: plan={plan} rel={rel:.3e} "
              f"(resident {t1:.1f} s)", flush=True)


if __name__ == '__main__':
    if len(sys.argv) > 1 and sys.argv[1] == 'sweep':
        sweep()
    else:
        main(*[int(a) for a in sys.argv[1:]])
