"""Profile the 64³ point-smoother F-cycle and break down device time.

Runs warm run_one_cycle calls under jax.profiler, then parses the
trace events to attribute device time to: the Pallas smoother kernel,
pack/unpack copies, residual/restrict/prolong XLA ops, and the rest.
Informs the padded-state-across-cycle decision (VERDICT r2 weak #2).

Run (ambient TPU env): python scripts/hw_profile_cycle.py [n]
"""
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np


def main(n=64):
    import jax
    from emg3d_tpu import TensorMesh, Model, SourceField, Field
    from emg3d_tpu import solver as S

    grid = TensorMesh([np.full(n, 100.)] * 3)
    model = Model(grid, property_x=1.0, mapping='Resistivity')
    sfield = SourceField.zeros(grid, frequency=1.0)
    np.asarray(sfield.fx)[n//2, n//2, n//2] = 1.0

    from emg3d_tpu import VolumeModel
    vm = VolumeModel(grid, model, sfield)
    var = S.MGParameters(
        verb=1, cycle='F', sslsolver=False, linerelaxation=False,
        semicoarsening=False, shape_cells=tuple(grid.shape_cells),
        tol=1e-6)
    ctx = S._SolveContext(grid, vm, sfield,
                          Field.zeros(grid, frequency=1.0), var)
    levels = ctx.levels(0)
    conf = (var.nu_pre, var.nu_coarse, var.nu_post, 'F', 0)

    def fetch(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        return float(abs(leaf.ravel()[0]))

    e = S.run_one_cycle(ctx.e, ctx.s, levels, conf)
    fetch(e)                                    # warm/compile
    t0 = time.time()
    for _ in range(3):
        e = S.run_one_cycle(e, ctx.s, levels, conf)
    fetch(e)
    print(f"warm: {(time.time()-t0)/3*1e3:.1f} ms/cycle", flush=True)

    outdir = '/tmp/emg3d_prof'
    os.system(f'rm -rf {outdir}')
    jax.profiler.start_trace(outdir)
    for _ in range(3):
        e = S.run_one_cycle(e, ctx.s, levels, conf)
    fetch(e)
    jax.profiler.stop_trace()

    paths = glob.glob(f'{outdir}/**/*.trace.json.gz', recursive=True)
    if not paths:
        print("no trace produced (remote backend may not support "
              "device tracing)", flush=True)
        return
    with gzip.open(paths[0], 'rt') as f:
        trace = json.load(f)
    events = [ev for ev in trace.get('traceEvents', [])
              if ev.get('ph') == 'X' and 'dur' in ev]
    # Keep device-lane events only (TensorFlow Op / XLA Ops lanes).
    pids = {ev['pid'] for ev in events}
    by_name = {}
    for ev in events:
        name = ev.get('name', '?')
        by_name[name] = by_name.get(name, 0) + ev['dur']
    total = sum(by_name.values())
    print(f"trace: {len(events)} events, {total/1e3:.1f} ms total "
          f"(3 cycles, all lanes)", flush=True)
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {dur/1e3:9.2f} ms  {name[:90]}", flush=True)


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
