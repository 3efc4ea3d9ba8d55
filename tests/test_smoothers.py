"""Smoother validation.

Strategy: the smoothers' node/line block matrices must equal the exact
principal submatrices of the dense operator A (built by probing the
validated stencil with unit vectors).  This catches any sign/indexing
error in the coefficient assembly without transcription-dependent
comparisons.  On top: damping tests (residual must shrink) and
rotation-consistency for the y/z line variants.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from emg3d_tpu import TensorMesh, Model, SourceField, VolumeModel
from emg3d_tpu.ops import smoothers, stencil
from emg3d_tpu.ops.coeffs import node_coefficients, node_block_entries
from emg3d_tpu.ops.blocksolve import (ldl_solve_sparse, ldl_factor,
                                      ldl_apply, block_tridiag_solve)

import helpers


def _random_setup(shape=(4, 4, 4), seed=7, freq=0.9, mu_r=True):
    rng = np.random.default_rng(seed)
    grid = TensorMesh([rng.uniform(20, 40, shape[0]),
                       rng.uniform(20, 40, shape[1]),
                       rng.uniform(20, 40, shape[2])])
    model = Model(grid, property_x=rng.uniform(.1, 10, grid.shape_cells),
                  property_y=rng.uniform(.1, 10, grid.shape_cells),
                  property_z=rng.uniform(.1, 10, grid.shape_cells),
                  mu_r=rng.uniform(.5, 2., grid.shape_cells) if mu_r
                  else None)
    sfield = SourceField.zeros(grid, frequency=freq)
    sfield.fx[2, 2, 2] = 1.0 + 0.5j
    vm = VolumeModel(grid, model, sfield)
    return rng, grid, model, sfield, vm


def _flat_index(shapes, comp, idx):
    """Flat index of edge ``idx`` of component ``comp`` in the concat."""
    sizes = [int(np.prod(s)) for s in shapes]
    off = sum(sizes[:comp])
    return off + int(np.ravel_multi_index(idx, shapes[comp]))


def _params(grid, vm):
    return tuple(jnp.asarray(a) for a in (
        vm.eta_x, vm.eta_y, vm.eta_z, vm.zeta,
        grid.h[0], grid.h[1], grid.h[2]))


def test_ldl_solvers():
    """Batched LDLT (sparse 6x6, dense 5x5) vs numpy.linalg.solve."""
    rng = np.random.default_rng(3)
    # Dense: random complex-symmetric well-conditioned 5x5 batch.
    M = rng.normal(size=(7, 5, 5)) + 1j * rng.normal(size=(7, 5, 5))
    A = M + np.swapaxes(M, -1, -2) + 6 * np.eye(5)
    b = rng.normal(size=(7, 5)) + 1j * rng.normal(size=(7, 5))
    fact = ldl_factor(jnp.asarray(A))
    x = np.asarray(ldl_apply(fact, jnp.asarray(b)))
    xe = np.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(x, xe, rtol=1e-10)

    # Sparse 6x6 with the node-block sparsity pattern.
    pattern = [(0, 0), (1, 1), (2, 2), (3, 3), (4, 4), (5, 5),
               (2, 0), (3, 0), (4, 0), (5, 0), (2, 1), (3, 1), (4, 1),
               (5, 1), (4, 2), (5, 2), (4, 3), (5, 3)]
    n = 6
    batch = (11,)
    entries = {}
    Afull = np.zeros(batch + (n, n), complex)
    for (i, j) in pattern:
        v = rng.normal(size=batch) + 1j * rng.normal(size=batch)
        if i == j:
            v = v + 8.0
        entries[(i, j)] = jnp.asarray(v)
        Afull[..., i, j] = v
        Afull[..., j, i] = v
    b6 = rng.normal(size=batch + (n,)) + 1j*rng.normal(size=batch + (n,))
    x6 = ldl_solve_sparse(n, entries, [jnp.asarray(b6[..., i])
                                       for i in range(n)])
    x6 = np.stack([np.asarray(c) for c in x6], axis=-1)
    xe6 = np.linalg.solve(Afull, b6[..., None])[..., 0]
    np.testing.assert_allclose(x6, xe6, rtol=1e-9)


def test_block_tridiag_solve():
    """Batched block-Thomas vs dense solve of the assembled system."""
    rng = np.random.default_rng(5)
    S, L, k = 6, 3, 5
    D = rng.normal(size=(S, L, k, k)) + 1j * rng.normal(size=(S, L, k, k))
    D = D + np.swapaxes(D, -1, -2) + 10 * np.eye(k)
    B = rng.normal(size=(S, L, k, k)) + 1j * rng.normal(size=(S, L, k, k))
    r = rng.normal(size=(S, L, k)) + 1j * rng.normal(size=(S, L, k))

    x = np.asarray(block_tridiag_solve(
        jnp.asarray(D), jnp.asarray(B), jnp.asarray(r)))

    for line in range(L):
        Afull = np.zeros((S * k, S * k), complex)
        for i in range(S):
            Afull[i*k:(i+1)*k, i*k:(i+1)*k] = D[i, line]
            if i > 0:
                Afull[i*k:(i+1)*k, (i-1)*k:i*k] = B[i, line]
                Afull[(i-1)*k:i*k, i*k:(i+1)*k] = B[i, line].T
        xe = np.linalg.solve(Afull, r[:, line].ravel())
        np.testing.assert_allclose(x[:, line].ravel(), xe, rtol=1e-8)


def test_block_tridiag_entries_matches_dense():
    """Sparse-entry Thomas engine == dense solve on the line sparsity.

    Uses the x-line station pattern (13 symmetric D entries with
    (2,1)/(4,3) structurally zero; B rows: (0,1..4) + diag) — the
    256³-enabling engine must reproduce the assembled dense solve.
    """
    from emg3d_tpu.ops.blocksolve import (block_tridiag_factor_entries,
                                          block_tridiag_solve_entries)

    rng = np.random.default_rng(9)
    S, L, k = 6, 3, 5
    dkeys = [(0, 0), (1, 1), (2, 2), (3, 3), (4, 4), (1, 0), (2, 0),
             (3, 0), (4, 0), (3, 1), (4, 1), (3, 2), (4, 2)]
    bkeys = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 1), (2, 2), (3, 3),
             (4, 4)]

    def rnd():
        return (rng.normal(size=(S, L)) + 1j * rng.normal(size=(S, L)))

    Dent = {key: jnp.asarray(rnd() + (10.0 if key[0] == key[1] else 0))
            for key in dkeys}
    Bent = {key: jnp.asarray(rnd()) for key in bkeys}
    r = [jnp.asarray(rnd()) for _ in range(k)]

    facts = block_tridiag_factor_entries(k, Dent, Bent)
    x = block_tridiag_solve_entries(k, facts, Bent, r)
    x = np.stack([np.asarray(c) for c in x], axis=-1)  # (S, L, k)

    D = np.zeros((S, L, k, k), complex)
    B = np.zeros((S, L, k, k), complex)
    for (a, b), v in Dent.items():
        D[..., a, b] += np.asarray(v)
        if a != b:
            D[..., b, a] += np.asarray(v)
    for (a, b), v in Bent.items():
        B[..., a, b] = np.asarray(v)

    for line in range(L):
        Afull = np.zeros((S * k, S * k), complex)
        rf = np.zeros(S * k, complex)
        for i in range(S):
            Afull[i*k:(i+1)*k, i*k:(i+1)*k] = D[i, line]
            rf[i*k:(i+1)*k] = [np.asarray(r[m])[i, line]
                               for m in range(k)]
            if i > 0:
                Afull[i*k:(i+1)*k, (i-1)*k:i*k] = B[i, line]
                Afull[(i-1)*k:i*k, i*k:(i+1)*k] = B[i, line].T
        xe = np.linalg.solve(Afull, rf)
        np.testing.assert_allclose(x[:, line].ravel(), xe, rtol=1e-8)


def test_node_blocks_match_dense_operator():
    """The 6×6 node blocks equal principal submatrices of dense A."""
    rng, grid, model, sfield, vm = _random_setup()
    A, shapes = helpers.dense_operator(grid, vm)
    par = _params(grid, vm)
    c = node_coefficients(*par)
    ent = node_block_entries(c)

    nx, ny, nz = grid.shape_cells
    for (ix, iy, iz) in [(1, 1, 1), (2, 2, 2), (1, 3, 2), (3, 1, 3)]:
        edges = [(0, (ix-1, iy, iz)), (0, (ix, iy, iz)),
                 (1, (ix, iy-1, iz)), (1, (ix, iy, iz)),
                 (2, (ix, iy, iz-1)), (2, (ix, iy, iz))]
        gidx = [_flat_index(shapes, c_, i_) for c_, i_ in edges]
        Ablock = A[np.ix_(gidx, gidx)]
        node = (ix-1, iy-1, iz-1)
        mine = np.zeros((6, 6), complex)
        for (i, j), arr in ent.items():
            v = np.asarray(jnp.broadcast_to(
                arr, (nx-1, ny-1, nz-1)))[node]
            mine[i, j] = v
            mine[j, i] = v
        np.testing.assert_allclose(mine, Ablock, rtol=1e-12, atol=1e-14)


def test_line_blocks_match_dense_operator():
    """Line-relaxation D/B blocks equal dense-A principal submatrices."""
    rng, grid, model, sfield, vm = _random_setup(shape=(5, 4, 4), seed=13)
    A, shapes = helpers.dense_operator(grid, vm)
    par = _params(grid, vm)
    c = node_coefficients(*par)
    D, B = smoothers._line_blocks_x(c, jnp.complex128, grid.shape_cells[0])
    D, B = np.asarray(D), np.asarray(B)
    nx = grid.shape_cells[0]

    for (iy, iz) in [(1, 1), (2, 2), (1, 2)]:
        # Unknown ordering: stations i=0..nx-1 of
        # [ex(i), ey(node i+1, iy-1), ey(node i+1, iy), ez(.., iz-1), ez].
        gidx = []
        for i in range(nx):
            gidx.append(_flat_index(shapes, 0, (i, iy, iz)))
            if i < nx - 1:
                gidx += [
                    _flat_index(shapes, 1, (i+1, iy-1, iz)),
                    _flat_index(shapes, 1, (i+1, iy, iz)),
                    _flat_index(shapes, 2, (i+1, iy, iz-1)),
                    _flat_index(shapes, 2, (i+1, iy, iz)),
                ]
            else:
                gidx += [-1] * 4  # identity padding rows
        Aline = np.zeros((5*nx, 5*nx), complex)
        for a, ga in enumerate(gidx):
            for b, gb in enumerate(gidx):
                if ga == -1 or gb == -1:
                    Aline[a, b] = 1.0 if (a == b) else 0.0
                else:
                    Aline[a, b] = A[ga, gb]

        mine = np.zeros_like(Aline)
        for i in range(nx):
            mine[5*i:5*i+5, 5*i:5*i+5] = D[i, iy-1, iz-1]
            if i > 0:
                mine[5*i:5*i+5, 5*(i-1):5*i] = B[i, iy-1, iz-1]
                mine[5*(i-1):5*i, 5*i:5*i+5] = B[i, iy-1, iz-1].T
        np.testing.assert_allclose(mine, Aline, rtol=1e-12, atol=1e-14)


def _res_norm(e, s, par):
    r = stencil.residual_parts(*s, *e, *par)
    return float(np.sqrt(sum(float(jnp.sum(jnp.abs(x)**2)) for x in r)))


@pytest.mark.parametrize("kind", ['point', 'line0', 'line1', 'line2'])
def test_smoother_reduces_residual(kind):
    rng, grid, model, sfield, vm = _random_setup(shape=(8, 8, 8), seed=23)
    par = _params(grid, vm)
    s = tuple(jnp.asarray(f) for f in (sfield.fx, sfield.fy, sfield.fz))
    e = tuple(jnp.zeros_like(x) for x in s)

    r0 = _res_norm(e, s, par)
    if kind == 'point':
        e2 = smoothers.gauss_seidel_point(*e, *s, *par, nu=4)
    else:
        e2 = smoothers.line_relaxation(*e, *s, *par, nu=4,
                                       axis=int(kind[-1]))
    r1 = _res_norm(e2, s, par)
    assert r1 < 0.35 * r0

    # PEC boundaries must remain zero.
    ex, ey, ez = [np.asarray(x) for x in e2]
    assert np.all(ex[:, 0, :] == 0) and np.all(ex[:, :, -1] == 0)
    assert np.all(ey[0] == 0) and np.all(ey[:, :, 0] == 0)
    assert np.all(ez[-1] == 0) and np.all(ez[:, 0, :] == 0)


def test_point_smoother_fixed_point():
    """The exact solution is a fixed point of the smoother."""
    rng, grid, model, sfield, vm = _random_setup(shape=(3, 3, 3), seed=31)
    A, shapes = helpers.dense_operator(grid, vm)
    m = helpers.interior_mask(shapes)
    s = tuple(jnp.asarray(f) for f in (sfield.fx, sfield.fy, sfield.fz))
    sflat = np.concatenate([np.asarray(x).ravel() for x in s])
    xint = np.linalg.solve(A[np.ix_(m, m)], sflat[m])
    xfull = np.zeros_like(sflat)
    xfull[m] = xint
    sizes = [int(np.prod(sh)) for sh in shapes]
    e = (jnp.asarray(xfull[:sizes[0]].reshape(shapes[0])),
         jnp.asarray(xfull[sizes[0]:sizes[0]+sizes[1]].reshape(shapes[1])),
         jnp.asarray(xfull[sizes[0]+sizes[1]:].reshape(shapes[2])))
    par = _params(grid, vm)
    e2 = smoothers.gauss_seidel_point(*e, *s, *par, nu=2)
    for a, b in zip(e, e2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-9, atol=1e-12)
    e3 = smoothers.line_relaxation(*e, *s, *par, nu=2, axis=1)
    for a, b in zip(e, e3):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-9, atol=1e-12)
