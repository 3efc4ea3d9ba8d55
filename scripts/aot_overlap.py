"""AOT overlap evidence: compile the shard_map smoothers for an
8-device v5e TPU topology (compile-only — no hardware needed) and
inspect the optimized HLO schedule for async collective-permute
start/done pairs spanning the bulk computation.

The claim under test (DESIGN §3 / SURVEY §2.6): the collective-free
O(volume) bulk (`_point_bulk`/`_line_bulk`) lets XLA schedule every
halo ppermute UNDER the interior stencil + LDLᵀ/Thomas work, so only
the O(surface) boundary fix waits on the network.  On TPU targets XLA
lowers overlapped collectives as `collective-permute-start` /
`collective-permute-done` pairs; in the post-scheduling module the
instruction order of the entry computation IS the schedule, so
compute instructions BETWEEN a start and its done are executed while
the transfer is in flight.

Usage:  python scripts/aot_overlap.py [ny nz]    (mesh 2x4 over y,z)
Prints, per kernel: #permute pairs, and for each pair the number of
scheduled fusion/convert ops (and their total output bytes) between
start and done.
"""
import re
import sys

sys.path.insert(0, '/root/repo')

import numpy as np


def _c2_sds(shape, dt):
    import jax
    from emg3d_tpu import cx
    return cx.C2(jax.ShapeDtypeStruct(shape, dt),
                 jax.ShapeDtypeStruct(shape, dt))


def analyze(txt, tag):
    """Schedule analysis of one optimized HLO module."""
    # Entry computation: instruction order == schedule (the module is
    # scheduled at this point on TPU targets).
    lines = txt.splitlines()
    starts = {}
    pairs = []
    for i, ln in enumerate(lines):
        if ' collective-permute-start(' in ln and '=' in ln:
            name = ln.split('=')[0].strip().lstrip('%')
            starts[name] = i
        m = re.search(r'collective-permute-done\(([^)]+)\)', ln)
        if m:
            src = m.group(1).strip().lstrip('%')
            pairs.append((starts.get(src), i))
    n_sync = len(re.findall(r'= \S+ collective-permute\(', txt))
    print(f"[{tag}] collective-permute async pairs: {len(pairs)}, "
          f"sync (unoverlapped): {n_sync}")
    for j, i in pairs:
        if j is None:
            print("   done without matched start (nested computation)")
            continue
        window = lines[j + 1:i]
        fus = [w for w in window if re.search(
            r'= \S+ (fusion|convolution|dot|while)\(', w)]
        print(f"   start@{j} -> done@{i}: {i - j - 1} scheduled "
              f"instrs in flight, {len(fus)} of them "
              f"fusion/dot/while")
    return len(pairs), n_sync


def main(ny_dev=2, nz_dev=4):
    import jax
    from jax.experimental import topologies
    from jax.sharding import Mesh
    import jax.numpy as jnp
    from emg3d_tpu.parallel import shmap

    topo = topologies.get_topology_desc('v5e:2x4')
    devs = np.asarray(topo.devices).reshape(ny_dev, nz_dev)
    mesh = Mesh(devs, ('y', 'z'))

    n = 32
    shape = (n, n, n)
    dt = jnp.float32
    edges = ((n, n + 1, n + 1), (n + 1, n, n + 1), (n + 1, n + 1, n))
    e = tuple(_c2_sds(sh, dt) for sh in edges)
    s = tuple(_c2_sds(sh, dt) for sh in edges)
    cells = (n, n, n)
    arrays = (_c2_sds(cells, dt), _c2_sds(cells, dt),
              _c2_sds(cells, dt), jax.ShapeDtypeStruct(cells, dt),
              jax.ShapeDtypeStruct((n,), dt),
              jax.ShapeDtypeStruct((n,), dt),
              jax.ShapeDtypeStruct((n,), dt))

    results = {}
    comp = shmap.gauss_seidel_point_shmap.lower(
        e, s, arrays, nu=2, shape=shape, mesh=mesh).compile()
    results['point'] = analyze(comp.as_text(), 'point smoother')

    comp = shmap.line_relaxation_shmap.lower(
        e, s, arrays, nu=2, shape=shape, mesh=mesh, axis=0).compile()
    results['line-x'] = analyze(comp.as_text(), 'line smoother (x, '
                                'transverse-sharded)')

    # Line along a SHARDED axis (substructured path).
    mesh1 = Mesh(np.asarray(topo.devices).reshape(8), ('z',))
    comp = shmap.line_relaxation_shmap.lower(
        e, s, arrays, nu=2, shape=shape, mesh=mesh1, axis=2).compile()
    results['line-z-xsh'] = analyze(comp.as_text(),
                                    'line smoother (z-lines ALONG '
                                    'the sharded z axis)')
    return results


if __name__ == '__main__':
    main(*(int(a) for a in sys.argv[1:3])) if len(sys.argv) > 2 \
        else main()
