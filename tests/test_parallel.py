"""Multi-device sharding: sharded vs single-device parity + collectives.

Runs on the 8 virtual CPU devices set up in conftest.  The sharded
solve must reproduce the unsharded fields to float tolerance, and the
compiled fine-level kernels must actually contain cross-device
communication (collective-permute halo exchanges), proving the work is
distributed rather than replicated.
"""
import numpy as np
import jax
import pytest

from emg3d_tpu import TensorMesh, Model, SourceField, solve
from emg3d_tpu import parallel


@pytest.fixture(scope='module')
def problem():
    rng = np.random.default_rng(7)
    n = 16
    grid = TensorMesh([np.full(n, 100.)] * 3)
    model = Model(grid, property_x=rng.uniform(0.5, 5, grid.shape_cells))
    sfield = SourceField.zeros(grid, frequency=1.0)
    sfield.fx[n//2, n//2, n//2] = 1.0
    return grid, model, sfield


def test_make_mesh():
    mesh = parallel.make_mesh(8, axes=('z',))
    assert mesh.devices.shape == (8,)
    mesh2 = parallel.make_mesh(8, axes=('y', 'z'))
    assert int(np.prod(mesh2.devices.shape)) == 8


def test_sharded_solve_matches_single(problem):
    grid, model, sfield = problem
    e0, info0 = solve(grid, model, sfield, cycle='F', verb=1,
                      return_info=True)

    mesh = parallel.make_mesh(4, axes=('z',))
    e1, info1 = solve(grid, model, sfield, cycle='F', verb=1,
                      return_info=True,
                      sharding=parallel.shard_solve_options(mesh))
    assert info1['exit_message'] == 'CONVERGED'
    assert info1['it_mg'] == info0['it_mg']
    rel = np.linalg.norm(e1.field - e0.field) / np.linalg.norm(e0.field)
    assert rel < 1e-10


@pytest.mark.slow
def test_sharded_solve_2d_mesh(problem):
    grid, model, sfield = problem
    e0 = solve(grid, model, sfield, cycle='V', verb=1)
    mesh = parallel.make_mesh(8, axes=('y', 'z'))
    e1, info = solve(grid, model, sfield, cycle='V', verb=1,
                     return_info=True,
                     sharding=parallel.shard_solve_options(
                         mesh, min_local_planes=2))
    assert info['exit_message'] == 'CONVERGED'
    rel = np.linalg.norm(e1.field - e0.field) / np.linalg.norm(e0.field)
    assert rel < 1e-10


def test_halo_collectives_present(problem):
    """The compiled sharded smoother must contain collective-permutes
    (halo exchanges) — i.e., the stencil is actually partitioned."""
    import jax.numpy as jnp
    from emg3d_tpu import VolumeModel
    from emg3d_tpu import solver as S

    grid, model, sfield = problem
    vm = VolumeModel(grid, model, sfield)
    mesh = parallel.make_mesh(4, axes=('z',))

    levels = S.build_levels(grid, vm, 0, 1, np.complex128)
    lev = levels[0]
    s = tuple(jnp.asarray(f) for f in (sfield.fx, sfield.fy, sfield.fz))
    e = tuple(jnp.zeros_like(c) for c in s)

    lowered = S._smooth_jit.lower(e, s, lev.arrays, 2, 0, lev.shape,
                                  mesh=mesh)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    assert ('collective-permute' in hlo or 'all-to-all' in hlo or
            'all-gather' in hlo), "no cross-device communication found"


def test_distribute_field(problem):
    grid, model, sfield = problem
    mesh = parallel.make_mesh(4, axes=('z',))
    f = parallel.distribute_field(sfield, mesh)
    assert f.fx.shape == sfield.fx.shape
    np.testing.assert_allclose(np.asarray(f.fz), np.asarray(sfield.fz))


@pytest.fixture(scope='module')
def smoother_inputs(problem):
    """A level plus distributed random source AND field.

    A point source would leave the s-halo exchange untested (caught a
    real bug once — the rz residual at the first owned node reads the
    neighbor's sz plane).
    """
    import jax.numpy as jnp
    from emg3d_tpu import VolumeModel
    from emg3d_tpu import solver as S

    grid, model, sfield = problem
    vm = VolumeModel(grid, model, sfield)
    lev = S.build_levels(grid, vm, 0, 0, np.complex128)[0]
    rng = np.random.default_rng(3)
    s = tuple(jnp.asarray(rng.normal(size=np.shape(f))
                          + 1j * rng.normal(size=np.shape(f)))
              for f in (sfield.fx, sfield.fy, sfield.fz))
    e = tuple(jnp.asarray(rng.normal(size=c.shape)
                          + 1j * rng.normal(size=c.shape)) for c in s)
    return lev, e, s


def _rel(ref, out):
    return max(np.linalg.norm(np.asarray(b) - np.asarray(a)) /
               np.linalg.norm(np.asarray(a)) for a, b in zip(ref, out))


def test_shmap_smoother_matches_single(smoother_inputs):
    """Explicit shard_map halo pipeline == single-device smoother.

    The per-shard math is the identical color update, so agreement is
    to reassociation-level rounding (f64: ~1e-13 relative).  Covers
    the 1-D z and y meshes and the 2-D (y, z) mesh (corner halos).
    """
    from emg3d_tpu.ops import smoothers
    from emg3d_tpu.parallel import shmap

    lev, e, s = smoother_inputs
    ref = smoothers.gauss_seidel_point(*e, *s, *lev.arrays, nu=2)

    for axes, ndev in [(('z',), 4), (('z',), 8), (('y',), 4),
                       (('y', 'z'), 8)]:
        mesh = parallel.make_mesh(ndev, axes=axes)
        assert shmap.supported_mesh(mesh, lev.shape)
        out = shmap.gauss_seidel_point_shmap(e, s, lev.arrays, nu=2,
                                             shape=lev.shape, mesh=mesh)
        assert _rel(ref, out) < 1e-12, (axes, ndev, _rel(ref, out))


def test_shmap_bulk_has_no_collectives(smoother_inputs):
    """Overlap guarantee, mechanically: the O(volume) bulk of each
    color step executes OUTSIDE any mesh context.

    ``shmap._point_bulk`` / ``shmap._line_bulk`` are the full residual
    stencil + block solves each color step runs before its boundary
    fix.  Calling them under plain jit (no shard_map) proves they
    contain no collectives — a ppermute without an axis context would
    raise — so XLA can always schedule the halo exchange under them
    (SURVEY §2.6 item 1: exchanges overlapped with interior work).
    """
    import jax.numpy as jnp
    from emg3d_tpu.ops import smoothers
    from emg3d_tpu.ops.blocksolve import (ldl_factor_sparse,
                                          block_tridiag_factor)
    from emg3d_tpu.ops.coeffs import (node_coefficients,
                                      node_block_entries)
    from emg3d_tpu.parallel import shmap

    lev, e, s = smoother_inputs
    nx, ny, nz = lev.shape
    halo = shmap._Halo('y', 'z', 2, 2)

    # Shard-local layout: node- and cell-registered arrays share the
    # same plane count along sharded axes (the blocked split pads
    # both to c planes per shard) — crop node extents to ny/nz.
    def loc(a):
        return a[:, :ny, :nz]

    e = tuple(loc(a) for a in e)
    s = tuple(loc(a) for a in s)

    # Extension-shaped source/params built WITHOUT communication (the
    # values are arbitrary; the test checks executability + finiteness).
    def z2(a, ky, kz):
        return halo._ext_zero(halo._ext_zero(a, 2, kz), 1, ky)

    sh = (z2(s[0], 'zero', 'zero'), z2(s[1], 'cell', 'zero'),
          z2(s[2], 'zero', 'cell'))
    eta_x, eta_y, eta_z, zeta, hx, hy, hz = lev.arrays
    par_h = (*(z2(a, 'cell', 'cell')
               for a in (eta_x, eta_y, eta_z, zeta)),
             hx, jnp.concatenate([hy[-1:], hy]),
             jnp.concatenate([hz[-1:], hz]))

    c = node_coefficients(*par_h)
    fact = ldl_factor_sparse(6, node_block_entries(c))
    delta, r0 = jax.jit(shmap._point_bulk, static_argnums=4)(
        e, sh, par_h, fact, halo)
    # Interior blocks are finite; boundary blocks are garbage by
    # design (zero halo params) — exactly what the O(surface)
    # boundary fix overwrites in the real pipeline.
    assert all(np.isfinite(np.asarray(d[:, 2:-2, 2:-2])).all()
               for d in delta)

    D, B = smoothers._line_blocks_x(c, e[0], nx)
    facts = block_tridiag_factor(D, B)
    padx3 = ((0, 1), (0, 0), (0, 0))
    dl, _ = jax.jit(shmap._line_bulk, static_argnums=(5, 6))(
        e, sh, par_h, facts, B, halo, padx3)
    assert np.isfinite(np.asarray(dl[:, 2:-2, 2:-2])).all()


@pytest.mark.slow
def test_shmap_line_relaxation_matches_single(smoother_inputs):
    """Explicit shard_map line relaxation == single-device kernel.

    x-lines on 1-D and 2-D meshes; y-lines on the z mesh and z-lines
    on the y mesh (rotated frames); line axes that would need a
    distributed Thomas solve are gated off by supported_line.
    """
    from emg3d_tpu.ops import smoothers
    from emg3d_tpu.parallel import shmap

    lev, e, s = smoother_inputs
    cases = {0: [(('z',), 4), (('y',), 4), (('y', 'z'), 8)],
             1: [(('z',), 4), (('y',), 4), (('y', 'z'), 8)],
             2: [(('y',), 4), (('z',), 4), (('y', 'z'), 8)]}
    for ax, meshes in cases.items():
        ref = smoothers.line_relaxation(*e, *s, *lev.arrays, nu=2,
                                        axis=ax)
        for axes, ndev in meshes:
            mesh = parallel.make_mesh(ndev, axes=axes)
            assert shmap.supported_line(mesh, lev.shape, ax)
            out = shmap.line_relaxation_shmap(
                e, s, lev.arrays, nu=2, shape=lev.shape, mesh=mesh,
                axis=ax)
            assert _rel(ref, out) < 1e-12, (ax, axes, _rel(ref, out))
    # A sharded line axis needs >= 4 stations per shard (width-2
    # station halos + a nonempty interior).
    assert not shmap.supported_line(
        parallel.make_mesh(8, axes=('y',)), lev.shape, 1)


@pytest.mark.slow
def test_shmap_lr_solve_matches_single(problem):
    """Full sc+lr solve routed through the shard_map line smoother."""
    grid, model, sfield = problem
    e0, info0 = solve(grid, model, sfield, cycle='F', verb=1,
                      linerelaxation=True, semicoarsening=True,
                      return_info=True)
    # 1-D z mesh AND the 2-D (y, z) mesh: on the latter every lr axis
    # runs the explicit pipeline — y/z lines through the substructured
    # distributed Thomas solve (the line axis itself is sharded).
    for ndev, axes in [(4, ('z',)), (8, ('y', 'z'))]:
        mesh = parallel.make_mesh(ndev, axes=axes)
        e1, info1 = solve(grid, model, sfield, cycle='F', verb=1,
                          linerelaxation=True, semicoarsening=True,
                          return_info=True,
                          sharding=parallel.shard_solve_options(
                              mesh, min_local_planes=2))
        assert info1['exit_message'] == 'CONVERGED'
        assert info1['it_mg'] == info0['it_mg'], axes
        rel = (np.linalg.norm(e1.field - e0.field)
               / np.linalg.norm(e0.field))
        assert rel < 1e-10, (axes, rel)


def test_distributed_init():
    """Multi-host scaffold: 2 OS processes, localhost coordinator.

    Each process owns 4 virtual CPU devices; init() must produce the
    8-device global view and a z-sharded global-mesh reduction must
    see every process's planes (real cross-process collectives).
    """
    import os
    import socket
    import subprocess
    import sys

    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    coord = f'localhost:{port}'

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env['PYTHONPATH'] = ''
        env['JAX_PLATFORMS'] = 'cpu'
        env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
        procs.append(subprocess.Popen(
            [sys.executable, '/root/repo/scripts/dist_worker.py',
             coord, '2', str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
        assert 'DIST_OK' in out, out[-2000:]


def test_shmap_sharded_solve_matches_single(problem):
    """Full solve routed through the shard_map smoother == unsharded."""
    grid, model, sfield = problem
    e0, info0 = solve(grid, model, sfield, cycle='F', verb=1,
                      return_info=True)
    mesh = parallel.make_mesh(8, axes=('z',))
    e1, info1 = solve(grid, model, sfield, cycle='F', verb=1,
                      return_info=True,
                      sharding=parallel.shard_solve_options(
                          mesh, min_local_planes=2))
    assert info1['exit_message'] == 'CONVERGED'
    assert info1['it_mg'] == info0['it_mg']
    rel = np.linalg.norm(e1.field - e0.field) / np.linalg.norm(e0.field)
    assert rel < 1e-10
