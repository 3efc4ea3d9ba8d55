"""Stage attribution inside the Pallas point kernel (timing-only).

The fused color update runs, per (color, tile): DMA-in, slab residual,
coefficient assembly + 6×6 LDLᵀ factor+solve, masked scatter, DMA-out.
This script times variants with individual stages stubbed out
(monkeypatched before tracing — results are WRONG, timings are real)
to see where the ~7 ms/call at 64³ goes: HBM streaming, the residual
stencil, or the per-step refactorization the XLA path hoists but the
kernel recomputes 16×.

Run: python scripts/hw_kernel_stages.py [n] [K]
"""
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np


def main(n=64, K=20):
    import jax
    import jax.numpy as jnp
    from emg3d_tpu import TensorMesh, Model, SourceField, VolumeModel
    from emg3d_tpu import solver as S
    from emg3d_tpu import cx
    from emg3d_tpu.ops import pallas_gs, blocksolve, coeffs

    grid = TensorMesh([np.full(n, 100.)] * 3)
    model = Model(grid, property_x=1.0, mapping='Resistivity')
    sfield = SourceField.zeros(grid, frequency=1.0)
    np.asarray(sfield.fx)[n//2, n//2, n//2] = 1.0
    vm = VolumeModel(grid, model, sfield)
    lev = S.build_levels(grid, vm, 0, 0, np.complex64, split=True)[0]

    rng = np.random.default_rng(1)

    def c2(sh):
        return cx.C2(jnp.asarray(rng.normal(size=sh), jnp.float32),
                     jnp.asarray(rng.normal(size=sh), jnp.float32))

    edges = ((n, n + 1, n + 1), (n + 1, n, n + 1), (n + 1, n + 1, n))
    e = tuple(c2(sh) for sh in edges)
    s = tuple(c2(sh) for sh in edges)

    grab = jax.jit(lambda a: a.ravel()[0])   # ONE fetch jit, reused
                                             # (a fresh jit per fetch
                                             # costs a ~400 ms server
                                             # lookup — measured)

    def scalar_fetch(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        return float(np.asarray(grab(leaf)))

    vcount = [0]

    def run_variant(tag, patch=None, spdt=None):
        saved = {}
        if patch:
            for mod, name, repl in patch:
                saved[(mod, name)] = getattr(mod, name)
                setattr(mod, name, repl)
        # Distinct jit cache entry per variant (monkeypatches only
        # affect tracing): rotate the color sequence — same 16 steps,
        # same work, different static key.
        k = vcount[0]
        vcount[0] += 1
        base = list(range(8)) + list(range(7, -1, -1))
        seq = tuple((c + k) % 8 for c in base)
        try:
            # K repetitions INSIDE one jit: per-dispatch host/tunnel
            # overhead (which can reach tens of ms and swamps chained
            # per-call timing) is paid once, so the per-rep time is
            # pure device time.
            from jax import lax
            import functools

            @functools.partial(jax.jit, static_argnames=('nn',))
            def reps(e_, nn):
                def body(st, _):
                    st = pallas_gs.gauss_seidel_point_pallas(
                        tuple(st), s, tuple(lev.arrays), nu=2,
                        shape=lev.shape, _sp_dt=spdt, _seq=seq)
                    return st, None
                return lax.scan(body, e_, None, length=nn)[0]

            # Two-K differencing: the timed region includes ONE fetch
            # whose round trip (30-430 ms tunnel weather) divided by K
            # floors single-K readings (measured: ~15 ms/call constant
            # across compute-stubbed variants).  The slope between the
            # per-K MINIMA (the RTT noise is additive-positive, so the
            # min approaches each K's floor) cancels the fixed cost.
            K2 = 8 * K
            scalar_fetch(reps(e, K))
            scalar_fetch(reps(e, K2))
            m1 = m2 = np.inf
            for _ in range(4):
                t0 = time.perf_counter()
                scalar_fetch(reps(e, K))
                t1 = time.perf_counter()
                scalar_fetch(reps(e, K2))
                t2 = time.perf_counter()
                m1 = min(m1, t1 - t0)
                m2 = min(m2, t2 - t1)
            best = (m2 - m1) / (K2 - K)
            print(f"  {tag:40s} {best*1e3:8.2f} ms/call (device, "
                  f"K-slope {K}->{K2}; floors "
                  f"{m1*1e3:.0f}/{m2*1e3:.0f} ms)", flush=True)
        finally:
            for (mod, name), v in saved.items():
                setattr(mod, name, v)

    print(f"pallas point kernel stages at {n}^3 (nu=2, 16 color "
          f"steps), K={K}:", flush=True)
    run_variant("full kernel (f32 streams)")
    run_variant("full kernel (bf16 s/p streams)", spdt=jnp.bfloat16)

    # no LDL solve: delta = station residuals (skips entries+factor+solve)
    run_variant("- no coeffs/entries/LDL (delta=rb)",
                patch=[(pallas_gs, 'node_block_entries',
                        lambda c: None),
                       (pallas_gs, 'ldl_solve_sparse',
                        lambda nn, ent, rb: rb)])

    # no residual: rb = field values (skips slab_residual)
    def fake_residual(e_, s_, st, w, ih):
        return e_[0], e_[1], e_[2]
    run_variant("- no residual stencil either",
                patch=[(pallas_gs, 'slab_residual', fake_residual),
                       (pallas_gs, 'node_block_entries',
                        lambda c: None),
                       (pallas_gs, 'ldl_solve_sparse',
                        lambda nn, ent, rb: rb)])

    # DMA only: identity update
    run_variant("- scatter only (delta=0)",
                patch=[(pallas_gs, 'slab_residual', fake_residual),
                       (pallas_gs, 'node_block_entries',
                        lambda c: None),
                       (pallas_gs, 'ldl_solve_sparse',
                        lambda nn, ent, rb: [cx.C2(
                            jnp.zeros_like(b.re), jnp.zeros_like(b.im))
                            for b in rb])])


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64,
         int(sys.argv[2]) if len(sys.argv) > 2 else 20)
