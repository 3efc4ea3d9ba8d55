"""Explicit shard_map halo-exchange smoother (z-partitioned).

The GSPMD path (:mod:`emg3d_tpu.parallel.sharding`) lets the compiler
place the halo exchanges of the partitioned stencil.  This module is
the explicit pipeline for the >90%-of-runtime op — the point smoother
(reference hot-spot ranking: docs/cpu_and_ram.rst:37-47) — written as
one ``jax.shard_map`` region over a 1-D z mesh:

- **Blocked layout.** Every 3-D array is z-padded to ``ndev·c`` planes
  (``c = ⌈(nz+1)/ndev⌉``) and split along z; shard ``d`` owns global
  node planes ``[d·c, (d+1)·c)``.  Cell-registered arrays (ez, η, ζ,
  hz) use the same ``c`` so node/cell slices stay aligned per shard.
- **One-plane halos via ppermute.** Per color step each shard pulls
  its neighbors' boundary planes (``lax.ppermute`` over the ICI ring;
  unpaired edges produce the zero planes of the global boundary), runs
  the IDENTICAL color update math as the single-device smoother on its
  haloed slab, and pushes back the single ez plane a boundary node
  deposits into the neighbor's domain (ghost accumulation).
- **Overlap.** All ``8·nu`` color steps live inside one compiled
  shard_map region, so XLA schedules the collective-permutes
  asynchronously against the independent interior arithmetic (the
  batched LDLᵀ solves don't depend on the pushed-back ez plane).
- The per-node 6×6 factorizations are model-dependent only: factored
  once per call on the haloed parameter slabs (each shard factors
  exactly its owned nodes), reused across all colors and sweeps.

Numerics are bit-comparable to :func:`ops.smoothers.gauss_seidel_point`
(same masks, same update order); tests assert 1e-12 relative parity on
the 8-device CPU mesh.

Reference parity: emg3d/core.py:181-474 (gauss_seidel); SURVEY §2.6
item 1 (domain decomposition + halo exchange).
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from .. import cx
from ..ops import stencil
from ..ops.blocksolve import ldl_factor_sparse, ldl_solve_factored
from ..ops.coeffs import node_coefficients, node_block_entries

__all__ = ['gauss_seidel_point_shmap', 'supported_mesh']


def supported_mesh(mesh, shape):
    """Explicit pipeline handles 1-D z meshes with ≥2 planes/shard."""
    if mesh is None or tuple(mesh.axis_names) != ('z',):
        return False
    ndev = int(np.prod(mesh.devices.shape))
    return (shape[2] + 1) >= 2 * ndev


def _tmap(f, *t):
    return jax.tree_util.tree_map(f, *t)


def _padz(a, z):
    """Zero-pad the trailing (z) axis to length ``z``."""
    def one(x):
        w = [(0, 0)] * (x.ndim - 1) + [(0, z - x.shape[-1])]
        return jnp.pad(x, w)
    return _tmap(one, a)


def _cropz(a, z):
    return _tmap(lambda x: x[..., :z], a)


@functools.partial(jax.jit, static_argnames=('nu', 'shape', 'mesh'))
def gauss_seidel_point_shmap(e, s, arrays, nu, shape, mesh):
    """nu sweeps of 8-color node-block GS with explicit z halos.

    Drop-in replacement of :func:`ops.smoothers.gauss_seidel_point`
    for fields living on a 1-D ``('z',)`` device mesh.
    """
    nx, ny, nz = shape
    ndev = int(np.prod(mesh.devices.shape))
    c = -(-(nz + 1) // ndev)
    Z = ndev * c

    eta_x, eta_y, eta_z, zeta, hx, hy, hz = arrays

    body = functools.partial(_smoother_body, nu=nu, shape=shape,
                             ndev=ndev, c=c)
    spec3 = P(None, None, 'z')
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(spec3,) * 6 + (spec3,) * 4 + (P(None), P(None),
                                                P('z')),
        out_specs=(spec3, spec3, spec3))

    args = [_padz(a, Z) for a in (*e, *s, eta_x, eta_y, eta_z, zeta)]
    out = fn(*args, hx, hy, _padz(hz, Z))
    return (_cropz(out[0], nz + 1), _cropz(out[1], nz + 1),
            _cropz(out[2], nz))


def _smoother_body(ex, ey, ez, sx, sy, sz, eta_x, eta_y, eta_z, zeta,
                   hx, hy, hz, *, nu, shape, ndev, c):
    """Per-shard body: haloed color updates (runs inside shard_map)."""
    nx, ny, nz = shape
    d = lax.axis_index('z')
    z0 = d * c                     # global node index of local kk=0

    up = [(i, i + 1) for i in range(ndev - 1)]    # send towards d+1
    dn = [(i + 1, i) for i in range(ndev - 1)]    # send towards d-1

    def lo_halo(a):
        """Neighbor d-1's last plane (zeros at the global boundary)."""
        return _tmap(lambda x: lax.ppermute(x[..., -1:], 'z', up), a)

    def hi_halo(a):
        """Neighbor d+1's first plane."""
        return _tmap(lambda x: lax.ppermute(x[..., :1], 'z', dn), a)

    def catz(*parts):
        return cx.concatenate(parts, axis=-1) \
            if any(isinstance(p, cx.C2) for p in parts) \
            else jnp.concatenate(parts, axis=-1)

    # --- once per call: haloed model parameters + local factors.
    # Cell-registered arrays need the lo halo only (cells d·c−1 …
    # d·c+c−1 are adjacent to the owned nodes).
    par_h = tuple(catz(lo_halo(a), a)
                  for a in (eta_x, eta_y, eta_z, zeta))
    hz_h = jnp.concatenate([lax.ppermute(hz[-1:], 'z', up), hz])
    par_h = (*par_h, hx, hy, hz_h)
    fact = ldl_factor_sparse(6, node_block_entries(
        node_coefficients(*par_h)))

    # sx/sy are read at owned node planes only (the rb slices drop the
    # halo planes), so zero-filled halos suffice; sz IS read at the lo
    # halo cell (rb[4] at the first owned node) — exchange it once per
    # call (s is constant across colors and sweeps).
    def zplane(a):
        return _tmap(lambda x: jnp.zeros_like(x[..., :1]), a)

    sxh = catz(zplane(sx), sx, zplane(sx))
    syh = catz(zplane(sy), sy, zplane(sy))
    szh = catz(lo_halo(sz), sz)

    # Global-coordinate masks (x/y global; z via the shard offset).
    gz = z0 + jnp.arange(c)[None, None, :]
    ii = jnp.arange(nx - 1)[:, None, None]
    jj = jnp.arange(ny - 1)[None, :, None]
    inb = (gz >= 1) & (gz <= nz - 1)

    def color_step(e_, color):
        ex_, ey_, ez_ = e_
        exh = catz(lo_halo(ex_), ex_, hi_halo(ex_))
        eyh = catz(lo_halo(ey_), ey_, hi_halo(ey_))
        ezh = catz(lo_halo(ez_), ez_)

        rx, ry, rz = stencil.residual_parts(sxh, syh, szh,
                                            exh, eyh, ezh, *par_h)
        rb = [rx[:-1, 1:-1, 1:-1], rx[1:, 1:-1, 1:-1],
              ry[1:-1, :-1, 1:-1], ry[1:-1, 1:, 1:-1],
              rz[1:-1, 1:-1, :-1], rz[1:-1, 1:-1, 1:]]
        delta = ldl_solve_factored(6, fact[0], fact[1], rb)

        px = color % 2
        py = (color // 2) % 2
        pz = color // 4
        mask = ((((ii + 1) % 2) == px) & (((jj + 1) % 2) == py) &
                ((gz % 2) == pz) & inb)
        dm = [cx.where(mask, dv, 0) for dv in delta]

        exh = exh.at[:, 1:-1, 1:-1].add(
            cx.pad(dm[0], ((0, 1), (0, 0), (0, 0))) +
            cx.pad(dm[1], ((1, 0), (0, 0), (0, 0))))
        eyh = eyh.at[1:-1, :, 1:-1].add(
            cx.pad(dm[2], ((0, 0), (0, 1), (0, 0))) +
            cx.pad(dm[3], ((0, 0), (1, 0), (0, 0))))
        # Local ez planes ll ↔ global cells z0+ll: node kk deposits
        # into cells z0+kk−1 (dm[4], local ll=kk−1) and z0+kk (dm[5],
        # local ll=kk) — dm[4][0] falls into the neighbor's domain.
        ez_new = ez_.at[1:-1, 1:-1, :].add(
            cx.pad(dm[4][..., 1:], ((0, 0), (0, 0), (0, 1))) + dm[5])

        # Ghost accumulation: the first owned node's update deposits
        # into cell z0−1, owned by shard d−1 as its LAST local plane —
        # ship exactly that deposit (dm[4] at local cell 0) downwards.
        dep = _tmap(lambda x: jnp.zeros_like(x[..., :1]), ez_) \
            .at[1:-1, 1:-1, :].add(dm[4][..., :1])
        rem = _tmap(lambda x: lax.ppermute(x, 'z', dn), dep)
        ez_new = ez_new.at[..., -1:].add(rem)
        return (exh[..., 1:-1], eyh[..., 1:-1], ez_new), None

    seq = []
    for it in range(nu):
        seq.extend(range(8) if it % 2 == 0 else range(7, -1, -1))
    e_out, _ = lax.scan(color_step, (ex, ey, ez),
                        jnp.asarray(np.array(seq, np.int32)))
    return e_out
