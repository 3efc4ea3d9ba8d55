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


def test_shmap_smoother_matches_single(problem):
    """Explicit shard_map halo pipeline == single-device smoother.

    The per-shard math is the identical color update, so agreement is
    to reassociation-level rounding (f64: ~1e-13 relative).
    """
    import jax.numpy as jnp
    from emg3d_tpu import VolumeModel
    from emg3d_tpu import solver as S
    from emg3d_tpu.ops import smoothers
    from emg3d_tpu.parallel import shmap

    grid, model, sfield = problem
    vm = VolumeModel(grid, model, sfield)
    lev = S.build_levels(grid, vm, 0, 0, np.complex128)[0]
    # Distributed random source AND field: a point source would leave
    # the s-halo exchange untested (caught a real bug once — the rz
    # residual at the first owned node reads the neighbor's sz plane).
    rng = np.random.default_rng(3)
    s = tuple(jnp.asarray(rng.normal(size=np.shape(f))
                          + 1j * rng.normal(size=np.shape(f)))
              for f in (sfield.fx, sfield.fy, sfield.fz))
    e = tuple(jnp.asarray(rng.normal(size=c.shape)
                          + 1j * rng.normal(size=c.shape)) for c in s)

    ref = smoothers.gauss_seidel_point(*e, *s, *lev.arrays, nu=2)

    for ndev in (4, 8):
        mesh = parallel.make_mesh(ndev, axes=('z',))
        assert shmap.supported_mesh(mesh, lev.shape)
        out = shmap.gauss_seidel_point_shmap(e, s, lev.arrays, nu=2,
                                             shape=lev.shape, mesh=mesh)
        for a, b in zip(ref, out):
            num = np.linalg.norm(np.asarray(b) - np.asarray(a))
            den = np.linalg.norm(np.asarray(a))
            assert num / den < 1e-12, (ndev, num / den)


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
