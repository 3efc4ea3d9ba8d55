"""Explicit shard_map halo-exchange smoothers (y/z/2-D meshes).

The GSPMD path (:mod:`emg3d_tpu.parallel.sharding`) lets the compiler
place the halo exchanges of the partitioned stencil.  This module is
the explicit pipeline for the >90%-of-runtime ops — the point smoother
and the line-relaxation smoother (reference hot-spot ranking:
docs/cpu_and_ram.rst:37-47) — written as one ``jax.shard_map`` region
per smoothing call over a ``('y',)``, ``('z',)`` or 2-D ``('y', 'z')``
device mesh:

- **Blocked layout.** Every 3-D array is padded along each sharded
  grid axis to ``ndev·c`` planes (``c = ⌈(n+1)/ndev⌉`` nodes) and
  split; shard ``d`` owns global node planes ``[d·c, (d+1)·c)``.
  Cell-registered arrays (η, ζ, h, the cell-direction field component)
  use the same ``c`` so node/cell slices stay aligned per shard.
- **One-plane halos via ppermute.** Per color step each shard pulls
  its neighbors' boundary planes (``lax.ppermute`` over the ICI ring;
  unpaired edges produce the zero planes of the global boundary), runs
  the IDENTICAL color update math as the single-device smoother on its
  haloed slab, and pushes back the single plane a boundary node
  deposits into the neighbor's domain (ghost accumulation).  On the
  2-D mesh the z halos are exchanged first and the y halos are taken
  from the z-extended slabs, so corner values ride along without a
  dedicated diagonal exchange.
- **Engineered halo/compute overlap.** Each color step computes the
  O(volume) work — the full residual stencil and the batched LDLᵀ /
  block-Thomas solves — from a ZERO-extended field (`_Halo.field_zero`,
  no communication), so it has no data dependence on the in-flight
  ppermutes and XLA's latency-hiding scheduler runs the collectives
  under it.  Only an O(surface) tail waits on the halos: per shard
  face, a 4-plane boundary stripe of `residual_parts` reproduces
  exactly the residual planes the zero-halo bulk got wrong (stencil
  reach ≤ 2 planes), and the 2 boundary block-planes are re-solved
  from the corrected residual (`_point_boundary_fix` /
  `_line_boundary_fix`).  The split is exact — parity tests pin the
  result to the single-device smoothers at 1e-12 — and the
  independence of the bulk is by construction: it is a function of
  owned data only.
- The per-node 6×6 factorizations (point) and per-line block-Thomas
  factorizations (lines) are model-dependent only: factored once per
  call on the haloed parameter slabs (each shard factors exactly its
  owned nodes/lines), reused across all colors and sweeps.

Line relaxation solves lines along an UNSHARDED axis (the Thomas
recurrence stays shard-local; lines couple only through the residual):
x-lines on any supported mesh, y-lines on a ``('z',)`` mesh and
z-lines on a ``('y',)`` mesh via the exact cyclic axis rotation of
:func:`emg3d_tpu.ops.smoothers.line_relaxation`.  Lines along a
sharded axis would need a distributed tridiagonal solve and fall back
to the GSPMD path.

Numerics are bit-comparable to the single-device smoothers (same
masks, same update order); tests assert 1e-12 relative parity on the
8-device CPU mesh.

Reference parity: emg3d/core.py:181-474 (gauss_seidel) and
core.py:477-1316 (gauss_seidel_x/y/z); SURVEY §2.6 item 1 (domain
decomposition + halo exchange).
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from .. import cx
from ..ops import stencil, smoothers
from ..ops.blocksolve import (ldl_factor_sparse, ldl_solve_factored,
                              block_tridiag_factor,
                              block_tridiag_solve_factored)
from ..ops.coeffs import node_coefficients, node_block_entries

__all__ = ['gauss_seidel_point_shmap', 'line_relaxation_shmap',
           'supported_mesh', 'supported_line']

_VALID_AXES = (('y',), ('z',), ('y', 'z'))


def _mesh_sizes(mesh):
    return dict(zip(mesh.axis_names, mesh.devices.shape))


def _enough_planes(shape, sizes):
    """Each sharded axis needs ≥2 node planes per shard."""
    ok = True
    if 'y' in sizes:
        ok &= (shape[1] + 1) >= 2 * sizes['y']
    if 'z' in sizes:
        ok &= (shape[2] + 1) >= 2 * sizes['z']
    return ok


def supported_mesh(mesh, shape):
    """Explicit point pipeline: ('y',), ('z',) or ('y','z') meshes."""
    if mesh is None or tuple(mesh.axis_names) not in _VALID_AXES:
        return False
    return _enough_planes(shape, _mesh_sizes(mesh))


def supported_line(mesh, shape, axis):
    """Explicit line pipeline for ANY axis on a supported mesh.

    Lines along an UNSHARDED axis run the shard-local block-Thomas;
    lines ALONG a sharded axis run the exact substructured
    (Schur-complement) distributed solve (:func:`_line_body_xsh`) —
    each shard needs ≥ 4 stations for its interior + the width-2
    station halos.
    """
    if mesh is None or tuple(mesh.axis_names) not in _VALID_AXES:
        return False
    sizes = _mesh_sizes(mesh)
    name = {0: None, 1: 'y', 2: 'z'}[axis]
    if name in sizes:
        cxn = -(-(shape[axis] + 1) // sizes[name])
        if cxn < 4:
            return False
    return _enough_planes(shape, sizes)


# ----------------------------------------------------------------------
# Layout helpers (host side)
# ----------------------------------------------------------------------

def _tmap(f, *t):
    return jax.tree_util.tree_map(f, *t)


def _pad_axis(a, ax, n):
    """Zero-pad axis ``ax`` to length ``n``."""
    def one(x):
        w = [(0, 0)] * x.ndim
        w[ax] = (0, n - x.shape[ax])
        return jnp.pad(x, w)
    return _tmap(one, a)


def _crop_axis(a, ax, n):
    def one(x):
        sl = [slice(None)] * x.ndim
        sl[ax] = slice(0, n)
        return x[tuple(sl)]
    return _tmap(one, a)


# ----------------------------------------------------------------------
# In-body halo helpers (run inside shard_map)
# ----------------------------------------------------------------------

def _perms(ndev, up):
    if up:                              # send towards shard d+1
        return [(i, i + 1) for i in range(ndev - 1)]
    return [(i + 1, i) for i in range(ndev - 1)]


def _edge(x, ax, last):
    sl = [slice(None)] * x.ndim
    sl[ax] = slice(-1, None) if last else slice(0, 1)
    return x[tuple(sl)]


def _lo_halo(a, ax, name, ndev):
    """Neighbor d−1's last plane along ``ax`` (zeros at the edge)."""
    return _tmap(lambda x: lax.ppermute(_edge(x, ax, True), name,
                                        _perms(ndev, True)), a)


def _hi_halo(a, ax, name, ndev):
    """Neighbor d+1's first plane along ``ax``."""
    return _tmap(lambda x: lax.ppermute(_edge(x, ax, False), name,
                                        _perms(ndev, False)), a)


def _cat(parts, ax):
    if any(isinstance(p, cx.C2) for p in parts):
        return cx.concatenate(parts, axis=ax)
    return jnp.concatenate(parts, axis=ax)


def _zplane(a, ax):
    return _tmap(lambda x: jnp.zeros_like(_edge(x, ax, False)), a)


class _Halo:
    """Halo-extension operators for one shard of a (yname, zname) mesh.

    ``yname``/``zname`` are the mesh axis names sharding local array
    axes 1 and 2 (None = that grid axis is unsharded and the global
    boundary planes play the halo role — the extension is a no-op).
    The z exchange always runs before (inside) the y exchange so 2-D
    corner values ride along on the z-extended slabs.
    """

    def __init__(self, yname, zname, ny_dev, nz_dev):
        self.yname, self.zname = yname, zname
        self.ny_dev, self.nz_dev = ny_dev, nz_dev

    def _ext(self, a, ax, kind):
        name = (self.yname, self.zname)[ax - 1]
        ndev = (self.ny_dev, self.nz_dev)[ax - 1]
        if name is None:
            return a
        if kind == 'node':              # lo + a + hi
            return _cat([_lo_halo(a, ax, name, ndev), a,
                         _hi_halo(a, ax, name, ndev)], ax)
        if kind == 'cell':              # lo + a
            return _cat([_lo_halo(a, ax, name, ndev), a], ax)
        return _cat([_zplane(a, ax), a, _zplane(a, ax)], ax)  # zeros

    def _ext_zero(self, a, ax, kind):
        """Same extension shape as :meth:`_ext` with zero halo planes
        (no communication) — the bulk update's input."""
        name = (self.yname, self.zname)[ax - 1]
        if name is None:
            return a
        if kind == 'cell':
            return _cat([_zplane(a, ax), a], ax)
        return _cat([_zplane(a, ax), a, _zplane(a, ax)], ax)

    def field(self, ex, ey, ez):
        """Extend an E-field triple (per color step)."""
        exh = self._ext(self._ext(ex, 2, 'node'), 1, 'node')
        eyh = self._ext(self._ext(ey, 2, 'node'), 1, 'cell')
        ezh = self._ext(self._ext(ez, 2, 'cell'), 1, 'node')
        return exh, eyh, ezh

    def field_zero(self, ex, ey, ez):
        """Zero-halo extension of the field (same shapes as
        :meth:`field`, no ppermutes).  The O(volume) bulk update runs
        on this, making it data-independent of the halo exchange."""
        ex0 = self._ext_zero(self._ext_zero(ex, 2, 'node'), 1, 'node')
        ey0 = self._ext_zero(self._ext_zero(ey, 2, 'node'), 1, 'cell')
        ez0 = self._ext_zero(self._ext_zero(ez, 2, 'cell'), 1, 'node')
        return ex0, ey0, ez0

    def sharded_axes(self):
        """Local array axes (1=y, 2=z) actually sharded on this mesh."""
        return [ax for ax, name in ((1, self.yname), (2, self.zname))
                if name is not None]

    def source(self, sx, sy, sz):
        """Extend the source triple (once per call; the residual reads
        s only at owned nodes except the cell-direction component at
        the lo halo cell — that one plane must be the true value)."""
        sxh = self._ext(self._ext(sx, 2, 'zero'), 1, 'zero')
        syh = self._ext(self._ext(sy, 2, 'zero'), 1, 'cell')
        szh = self._ext(self._ext(sz, 2, 'cell'), 1, 'zero')
        return sxh, syh, szh

    def params(self, eta_x, eta_y, eta_z, zeta, hx, hy, hz):
        """Extend model parameters (cell-registered on every axis)."""
        par = tuple(self._ext(self._ext(a, 2, 'cell'), 1, 'cell')
                    for a in (eta_x, eta_y, eta_z, zeta))
        if self.yname is not None:
            hy = jnp.concatenate([lax.ppermute(
                hy[-1:], self.yname, _perms(self.ny_dev, True)), hy])
        if self.zname is not None:
            hz = jnp.concatenate([lax.ppermute(
                hz[-1:], self.zname, _perms(self.nz_dev, True)), hz])
        return (*par, hx, hy, hz)

    def coords(self, shape, myn, mzn):
        """Global (interior-x, owned-y, owned-z) node coordinates and
        the in-bounds mask for the (nx−1, myn, mzn) block arrays."""
        nx, ny, nz = shape
        gy = lax.axis_index(self.yname) * myn + jnp.arange(myn) \
            if self.yname else 1 + jnp.arange(myn)
        gz = lax.axis_index(self.zname) * mzn + jnp.arange(mzn) \
            if self.zname else 1 + jnp.arange(mzn)
        gx = 1 + jnp.arange(nx - 1)
        gx = gx[:, None, None]
        gy = gy[None, :, None]
        gz = gz[None, None, :]
        inb = ((gy >= 1) & (gy <= ny - 1) & (gz >= 1) & (gz <= nz - 1))
        return gx, gy, gz, inb


def _station_residuals(rx, ry, rz):
    """Block residuals at the six edges of every local node.

    The slices are mode-independent: with halos, 1:-1 selects exactly
    the owned planes; without, it selects the global interior.
    """
    return [rx[:-1, 1:-1, 1:-1], rx[1:, 1:-1, 1:-1],
            ry[1:-1, :-1, 1:-1], ry[1:-1, 1:, 1:-1],
            rz[1:-1, 1:-1, :-1], rz[1:-1, 1:-1, 1:]]


# ----------------------------------------------------------------------
# Boundary-stripe machinery for the engineered halo/compute overlap.
#
# The bulk update per color step runs on the ZERO-extended field, so
# every residual plane whose stencil touches a halo plane (≤ 2 planes
# per shard face; reach is 1 node + 1 cell plane) is wrong, and so are
# the ≤ 2 boundary block-planes whose stations read those planes.  The
# fix recomputes exactly those from narrow crops of the TRUE
# (halo-extended) arrays: residual_parts on a boundary crop reproduces
# the full computation bit-for-bit wherever the crop carries the
# stencil support (the crop edge that coincides with the extended
# array's edge sees the identical truncation).
# ----------------------------------------------------------------------

# Extension kind per field/source component along each local axis
# (must mirror _Halo.field / _Halo.source).
_E_AX_KINDS = {1: ('node', 'cell', 'node'), 2: ('node', 'node', 'cell')}
_S_AX_KINDS = {1: ('zero', 'cell', 'zero'), 2: ('zero', 'zero', 'cell')}

# Stripe width (node planes) and corrected planes/blocks per face.
# w=3 is minimal: the 2 overwritten planes read node planes ≤ 2 and
# cell planes ≤ 1 inside the crop (stencil reach 1 node + 1 cell).
_STRIPE_W = 3
_STRIPE_NB = 2


def _crop_kind(a, ax, kind, lo, w):
    """Boundary crop of one extended array along ``ax``.

    node/zero kinds keep ``w`` planes, cell kinds ``w − 1`` — equal
    start offsets preserve the Yee node/cell staggering inside the
    stripe (cell plane j sits between node planes j and j+1 in
    extended-local coordinates exactly as in global ones).
    """
    n = w if kind != 'cell' else w - 1

    def one(x):
        L = x.shape[ax]
        m = min(n, L)
        sl = [slice(None)] * x.ndim
        sl[ax] = slice(0, m) if lo else slice(L - m, L)
        return x[tuple(sl)]

    return _tmap(one, a)


def _own_crop(a, ax, lo, n):
    """First/last ``n`` planes of an UNextended (owned) array."""
    def one(x):
        L = x.shape[ax]
        m = min(n, L)
        sl = [slice(None)] * x.ndim
        sl[ax] = slice(0, m) if lo else slice(L - m, L)
        return x[tuple(sl)]

    return _tmap(one, a)


def _stripe_e(e_, halo, ax, lo, w, true_cross=True):
    """Boundary stripes of the halo-extended field, built WITHOUT
    materializing the full extended arrays.

    Per component: ppermute the neighbor's edge plane (the identical
    plane the old full extension exchanged) and concat it with a
    2-plane crop of the owned data; then extend the *stripe* along the
    other sharded axis — the permuted stripe edge already carries the
    neighbor's halo plane, so 2-D corner values ride along exactly as
    they do in the nested full extension.
    """
    name = (halo.yname, halo.zname)[ax - 1]
    ndev = (halo.ny_dev, halo.nz_dev)[ax - 1]
    kinds = _E_AX_KINDS[ax]
    other = 3 - ax
    okinds = _E_AX_KINDS[other]
    out = []
    for a, kind, okind in zip(e_, kinds, okinds):
        if kind == 'cell' and not lo:
            st = _own_crop(a, ax, lo, w - 1)    # cell: no hi halo plane
        else:
            n_own = (w - 2) if kind == 'cell' else (w - 1)
            own = _own_crop(a, ax, lo, n_own)
            hp = (_lo_halo(a, ax, name, ndev) if lo
                  else _hi_halo(a, ax, name, ndev))
            st = _cat([hp, own] if lo else [own, hp], ax)
        # Extend the stripe along the other sharded axis (no-op when
        # that axis is unsharded); corners come from the neighbor's
        # stripe edge, which includes its halo plane.  Stripes of an
        # axis whose boundary planes are later overwritten by the
        # other axis's stripes only need the SHAPE (zero extension).
        st = (halo._ext(st, other, okind) if true_cross
              else halo._ext_zero(st, other, okind))
        out.append(st)
    return tuple(out)


def _crop_args(sh, eh_stripe, par_h, ax, lo, w):
    """residual_parts arguments for one boundary stripe: the field
    stripes are pre-built (:func:`_stripe_e`); source/parameters are
    crops of the once-per-call extended arrays."""
    s_c = tuple(_crop_kind(a, ax, k, lo, w)
                for a, k in zip(sh, _S_AX_KINDS[ax]))
    par = list(par_h)
    for i in range(4):                      # eta_x, eta_y, eta_z, zeta
        par[i] = _crop_kind(par[i], ax, 'cell', lo, w)
    par[4 + ax] = _crop_kind(par[4 + ax], 0, 'cell', lo, w)  # hy / hz
    return s_c, eh_stripe, tuple(par)


def _ovw(a, b, ax, lo, k):
    """Overwrite ``a``'s first/last ``k`` planes along ``ax`` with
    ``b``'s first/last ``k`` (static slices; shapes may differ)."""
    def one(x, y):
        L, Lb = x.shape[ax], y.shape[ax]
        m = min(k, L, Lb)
        sl = [slice(None)] * x.ndim
        slb = [slice(None)] * y.ndim
        sl[ax] = slice(0, m) if lo else slice(L - m, L)
        slb[ax] = slice(0, m) if lo else slice(Lb - m, Lb)
        return x.at[tuple(sl)].set(y[tuple(slb)])

    return _tmap(one, a, b)


def _bcrop(a, ax, lo, nb):
    """Crop ``nb`` boundary block-planes along ``ax``."""
    def one(x):
        L = x.shape[ax]
        m = min(nb, L)
        sl = [slice(None)] * x.ndim
        sl[ax] = slice(0, m) if lo else slice(L - m, L)
        return x[tuple(sl)]

    return _tmap(one, a)


def _fix_residual(r0, e_, sh, par_h, halo, axes):
    """Exact residual: overwrite the halo-adjacent planes of the bulk
    (zero-halo) residual with boundary-stripe recomputations.

    The LAST axis's stripes carry the true cross-extension (their
    values are final everywhere, corners included); earlier axes'
    boundary planes are overwritten by later stripes, so those stripes
    zero-extend (shape only) and stay independent of the other axis's
    halos.
    """
    rx, ry, rz = r0
    for ax in axes:
        true_cross = ax == axes[-1]
        for lo in (True, False):
            e_c = _stripe_e(e_, halo, ax, lo, _STRIPE_W,
                            true_cross=true_cross)
            s_c, e_c, p_c = _crop_args(sh, e_c, par_h, ax, lo, _STRIPE_W)
            rsx, rsy, rsz = stencil.residual_parts(*s_c, *e_c, *p_c)
            rx = _ovw(rx, rsx, ax, lo, _STRIPE_NB)
            ry = _ovw(ry, rsy, ax, lo, _STRIPE_NB)
            rz = _ovw(rz, rsz, ax, lo, _STRIPE_NB)
    return rx, ry, rz


def _point_bulk(e_, sh, par_h, fact, halo):
    """The O(volume) part of one point color step: zero-extended
    residual + full-grid LDLᵀ block solve.

    Contains NO collectives — it is executable outside any mesh
    context (tests prove this by calling it under plain jit; a
    ppermute would raise), which is the mechanical form of the
    overlap guarantee: XLA can always schedule the halo exchange
    under it.
    """
    e0 = halo.field_zero(*e_)
    rx, ry, rz = stencil.residual_parts(*sh, *e0, *par_h)
    delta = ldl_solve_factored(6, fact[0], fact[1],
                               _station_residuals(rx, ry, rz))
    return delta, (rx, ry, rz)


def _line_bulk(e_, sh, par_h, facts, B, halo, padx3):
    """The O(volume) part of one line color step (no collectives)."""
    e0 = halo.field_zero(*e_)
    r0 = stencil.residual_parts(*sh, *e0, *par_h)
    delta = block_tridiag_solve_factored(
        *facts, B, _line_stack(*r0, padx3))
    return delta, r0


def _apply_pend(e_, pend, yname, zname):
    """Apply the lagged remote ghost deposits (one plane per sharded
    axis, received from the previous color step's push)."""
    ex_, ey_, ez_ = e_
    i = 0
    if yname is not None:
        ey_ = ey_.at[:, -1:, :].add(pend[i])
        i += 1
    if zname is not None:
        ez_ = ez_.at[..., -1:].add(pend[i])
    return (ex_, ey_, ez_)


def _pend_zeros(e_, yname, zname):
    """Zero initial ghost-deposit planes for the color-step scan."""
    out = []
    if yname is not None:
        out.append(_tmap(lambda x: jnp.zeros_like(x[:, -1:, :]), e_[1]))
    if zname is not None:
        out.append(_tmap(lambda x: jnp.zeros_like(x[..., -1:]), e_[2]))
    return tuple(out)


def _line_stack(rx, ry, rz, padx3):
    """The 5-station residual stack of the x-line block solve."""
    return cx.stack([
        rx[:, 1:-1, 1:-1],
        cx.pad(ry[1:-1, :-1, 1:-1], padx3),
        cx.pad(ry[1:-1, 1:, 1:-1], padx3),
        cx.pad(rz[1:-1, 1:-1, :-1], padx3),
        cx.pad(rz[1:-1, 1:-1, 1:], padx3),
    ], axis=-1)


def _line_boundary_fix(delta, e_, sh, par_h, facts, B, halo, axes, r0,
                       padx3):
    """Line-relaxation analog of :func:`_point_boundary_fix`: re-solve
    the whole lines of the ≤ 2 boundary transverse block-planes per
    shard face from the corrected residual (the Thomas recurrence
    couples along x only, so transverse planes re-solve independently).
    """
    if not axes:
        return delta
    r = _line_stack(*_fix_residual(r0, e_, sh, par_h, halo, axes),
                    padx3)
    for ax in axes:
        for lo in (True, False):
            f_c = tuple(_bcrop(f, ax, lo, _STRIPE_NB) for f in facts)
            d_c = block_tridiag_solve_factored(
                *f_c, _bcrop(B, ax, lo, _STRIPE_NB),
                _bcrop(r, ax, lo, _STRIPE_NB))
            delta = _ovw(delta, d_c, ax, lo, _STRIPE_NB)
    return delta


def _point_boundary_fix(delta, e_, sh, par_h, fact, halo, axes, r0):
    """Replace the boundary block-planes of the bulk point-update
    ``delta`` with values computed from the true (halo-extended) field.

    O(surface) only: 3-plane stripes of residual + a 2-block-plane
    LDLᵀ re-solve per shard face; the O(volume) bulk never waits on
    the ppermutes.
    """
    if not axes:
        return delta
    st = _station_residuals(*_fix_residual(r0, e_, sh, par_h, halo,
                                           axes))
    for ax in axes:
        for lo in (True, False):
            st_c = [_bcrop(b, ax, lo, _STRIPE_NB) for b in st]
            d_c = ldl_solve_factored(6, _bcrop(fact[0], ax, lo, _STRIPE_NB),
                                     _bcrop(fact[1], ax, lo, _STRIPE_NB),
                                     st_c)
            delta = [_ovw(d, dc, ax, lo, _STRIPE_NB)
                     for d, dc in zip(delta, d_c)]
    return delta


# ----------------------------------------------------------------------
# Point smoother
# ----------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=('nu', 'shape', 'mesh'))
def gauss_seidel_point_shmap(e, s, arrays, nu, shape, mesh):
    """nu sweeps of 8-color node-block GS with explicit halos.

    Drop-in replacement of :func:`ops.smoothers.gauss_seidel_point`
    for fields living on a ('y',), ('z',) or ('y','z') device mesh.
    """
    nx, ny, nz = shape
    sizes = _mesh_sizes(mesh)
    yname = 'y' if 'y' in sizes else None
    zname = 'z' if 'z' in sizes else None
    ny_dev = sizes.get('y', 1)
    nz_dev = sizes.get('z', 1)
    cy = -(-(ny + 1) // ny_dev)
    cz = -(-(nz + 1) // nz_dev)

    eta_x, eta_y, eta_z, zeta, hx, hy, hz = arrays
    body = functools.partial(
        _point_body, nu=nu, shape=shape, yname=yname, zname=zname,
        ny_dev=ny_dev, nz_dev=nz_dev, cy=cy, cz=cz)

    spec3 = P(None, yname, zname)
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(spec3,) * 10 + (P(None), P(yname), P(zname)),
        out_specs=(spec3, spec3, spec3))

    def padyz(a):
        if yname is not None:
            a = _pad_axis(a, 1, ny_dev * cy)
        if zname is not None:
            a = _pad_axis(a, 2, nz_dev * cz)
        return a

    args = [padyz(a) for a in (*e, *s, eta_x, eta_y, eta_z, zeta)]
    hy_p = _pad_axis(hy, 0, ny_dev * cy) if yname else hy
    hz_p = _pad_axis(hz, 0, nz_dev * cz) if zname else hz
    out = fn(*args, hx, hy_p, hz_p)

    def crop(a, ylen, zlen):
        if yname is not None:
            a = _crop_axis(a, 1, ylen)
        if zname is not None:
            a = _crop_axis(a, 2, zlen)
        return a

    return (crop(out[0], ny + 1, nz + 1), crop(out[1], ny, nz + 1),
            crop(out[2], ny + 1, nz))


def _point_body(ex, ey, ez, sx, sy, sz, eta_x, eta_y, eta_z, zeta,
                hx, hy, hz, *, nu, shape, yname, zname, ny_dev, nz_dev,
                cy, cz):
    """Per-shard body: haloed color updates (runs inside shard_map)."""
    nx, ny, nz = shape
    halo = _Halo(yname, zname, ny_dev, nz_dev)

    # --- once per call: haloed parameters + local factors + source.
    par_h = halo.params(eta_x, eta_y, eta_z, zeta, hx, hy, hz)
    fact = ldl_factor_sparse(6, node_block_entries(
        node_coefficients(*par_h)))
    sh = halo.source(sx, sy, sz)

    myn = cy if yname else ny - 1       # local block-node extents
    mzn = cz if zname else nz - 1
    gx, gy, gz, inb = halo.coords(shape, myn, mzn)

    ysl = slice(None) if yname else slice(1, -1)   # own-layout node sel
    zsl = slice(None) if zname else slice(1, -1)

    axes = halo.sharded_axes()

    def color_step(carry, color):
        # Pipelined ghost push: the remote deposit received from the
        # PREVIOUS step's push rides in ``pend`` and is applied here —
        # so no collective ever gates the O(volume) chain (the bulk of
        # step c reads the pre-apply field of step c−1; its error is
        # confined to the same boundary planes the fix overwrites).
        e_, pend = carry
        et = _apply_pend(e_, pend, yname, zname)

        # The boundary stripes' edge-plane ppermutes (on the
        # deposit-applied field) issue first; the bulk update below is
        # a function of OWNED pre-apply data only (zero-extended
        # field), so XLA schedules all collectives under the O(volume)
        # stencil + LDLᵀ work.  Only the O(surface) fix waits on them.
        delta, r0 = _point_bulk(e_, sh, par_h, fact, halo)
        delta = _point_boundary_fix(delta, et, sh, par_h, fact, halo,
                                    axes, r0)

        px = color % 2
        py = (color // 2) % 2
        pz = color // 4
        mask = ((gx % 2 == px) & (gy % 2 == py) & (gz % 2 == pz) & inb)
        dm = [cx.where(mask, dv, 0) for dv in delta]

        # ex: node i deposits into x-edges i−1 (dm[0]) and i (dm[1]).
        ex_n = et[0].at[:, ysl, zsl].add(
            cx.pad(dm[0], ((0, 1), (0, 0), (0, 0))) +
            cx.pad(dm[1], ((1, 0), (0, 0), (0, 0))))

        pend_n = []
        # ey: node j deposits into y-cells j−1 (dm[2]) and j (dm[3]).
        if yname is None:
            ey_n = et[1].at[1:-1, :, zsl].add(
                cx.pad(dm[2], ((0, 0), (0, 1), (0, 0))) +
                cx.pad(dm[3], ((0, 0), (1, 0), (0, 0))))
        else:
            ey_n = et[1].at[1:-1, :, zsl].add(
                cx.pad(dm[2][:, 1:], ((0, 0), (0, 1), (0, 0))) + dm[3])
            dep = _tmap(lambda x: jnp.zeros_like(x[:, :1]), et[1]) \
                .at[1:-1, :, zsl].add(dm[2][:, :1])
            pend_n.append(_tmap(lambda x: lax.ppermute(
                x, yname, _perms(ny_dev, False)), dep))

        # ez: node k deposits into z-cells k−1 (dm[4]) and k (dm[5]).
        if zname is None:
            ez_n = et[2].at[1:-1, ysl, :].add(
                cx.pad(dm[4], ((0, 0), (0, 0), (0, 1))) +
                cx.pad(dm[5], ((0, 0), (0, 0), (1, 0))))
        else:
            ez_n = et[2].at[1:-1, ysl, :].add(
                cx.pad(dm[4][..., 1:], ((0, 0), (0, 0), (0, 1))) + dm[5])
            dep = _tmap(lambda x: jnp.zeros_like(x[..., :1]), et[2]) \
                .at[1:-1, ysl, :].add(dm[4][..., :1])
            pend_n.append(_tmap(lambda x: lax.ppermute(
                x, zname, _perms(nz_dev, False)), dep))
        return ((ex_n, ey_n, ez_n), tuple(pend_n)), None

    seq = []
    for it in range(nu):
        seq.extend(range(8) if it % 2 == 0 else range(7, -1, -1))
    pend0 = _pend_zeros((ex, ey, ez), yname, zname)
    (e_out, pend_out), _ = lax.scan(color_step, ((ex, ey, ez), pend0),
                                    jnp.asarray(np.array(seq, np.int32)))
    return _apply_pend(e_out, pend_out, yname, zname)


# ----------------------------------------------------------------------
# Line relaxation (x-lines; y/z via cyclic rotation of the frame)
# ----------------------------------------------------------------------

@functools.partial(jax.jit,
                   static_argnames=('nu', 'shape', 'mesh', 'axis'))
def line_relaxation_shmap(e, s, arrays, nu, shape, mesh, axis=0):
    """nu sweeps of 4-color line relaxation along ``axis`` with
    explicit halos on the transverse (sharded) axes.

    Drop-in replacement of :func:`ops.smoothers.line_relaxation` for
    fields on a device mesh; ``supported_line`` gates the legal
    (mesh, axis) combinations (the line axis must be unsharded).
    """
    ex, ey, ez = e
    sx, sy, sz = s
    eta_x, eta_y, eta_z, zeta, hx, hy, hz = arrays
    rf, rb = smoothers._rot_fwd, smoothers._rot_bwd
    names = set(mesh.axis_names)

    def nm(grid_ax):
        return {1: 'y', 2: 'z'}.get(grid_ax) \
            if {1: 'y', 2: 'z'}.get(grid_ax) in names else None

    if axis == 0:
        return _line_x_shmap(e, s, arrays, nu, shape, mesh,
                             nm(1), nm(2), None)
    if axis == 1:
        # Rotated frame (y,z,x): local axes map to grid (y, z, x), so
        # mesh 'y' shards the LINE axis and 'z' the local axis 1.
        out = _line_x_shmap(
            (rf(ey), rf(ez), rf(ex)), (rf(sy), rf(sz), rf(sx)),
            (rf(eta_y), rf(eta_z), rf(eta_x), rf(zeta), hy, hz, hx),
            nu, (shape[1], shape[2], shape[0]), mesh, nm(2), None,
            nm(1))
        return (rb(out[2]), rb(out[0]), rb(out[1]))
    if axis == 2:
        # Rotated frame (z,x,y): grid z shards the line axis, grid y
        # the local axis 2.
        out = _line_x_shmap(
            (rb(ez), rb(ex), rb(ey)), (rb(sz), rb(sx), rb(sy)),
            (rb(eta_z), rb(eta_x), rb(eta_y), rb(zeta), hz, hx, hy),
            nu, (shape[2], shape[0], shape[1]), mesh, None, nm(1),
            nm(2))
        return (rf(out[1]), rf(out[2]), rf(out[0]))
    raise ValueError(f"axis must be 0, 1, or 2; got {axis}.")


def _line_x_shmap(e, s, arrays, nu, shape, mesh, yname, zname,
                  xname=None):
    """x-line relaxation over a mesh sharding local axes 1/2 (and,
    with ``xname``, the line axis 0 itself — substructured solve)."""
    nx, ny, nz = shape
    sizes = _mesh_sizes(mesh)
    nx_dev = sizes.get(xname, 1) if xname else 1
    ny_dev = sizes.get(yname, 1) if yname else 1
    nz_dev = sizes.get(zname, 1) if zname else 1
    cxn = -(-(nx + 1) // nx_dev)
    cy = -(-(ny + 1) // ny_dev)
    cz = -(-(nz + 1) // nz_dev)

    eta_x, eta_y, eta_z, zeta, hx, hy, hz = arrays
    if xname is None:
        body = functools.partial(
            _line_body, nu=nu, shape=shape, yname=yname, zname=zname,
            ny_dev=ny_dev, nz_dev=nz_dev, cy=cy, cz=cz)
    else:
        body = functools.partial(
            _line_body_xsh, nu=nu, shape=shape, xname=xname,
            yname=yname, zname=zname, nx_dev=nx_dev, ny_dev=ny_dev,
            nz_dev=nz_dev, cxn=cxn, cy=cy, cz=cz)

    spec3 = P(xname, yname, zname)
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(spec3,) * 10 + (P(xname), P(yname), P(zname)),
        out_specs=(spec3, spec3, spec3))

    def padyz(a):
        if xname is not None:
            a = _pad_axis(a, 0, nx_dev * cxn)
        if yname is not None:
            a = _pad_axis(a, 1, ny_dev * cy)
        if zname is not None:
            a = _pad_axis(a, 2, nz_dev * cz)
        return a

    args = [padyz(a) for a in (*e, *s, eta_x, eta_y, eta_z, zeta)]
    hx_p = _pad_axis(hx, 0, nx_dev * cxn) if xname else hx
    hy_p = _pad_axis(hy, 0, ny_dev * cy) if yname else hy
    hz_p = _pad_axis(hz, 0, nz_dev * cz) if zname else hz
    out = fn(*args, hx_p, hy_p, hz_p)

    def crop(a, xlen, ylen, zlen):
        if xname is not None:
            a = _crop_axis(a, 0, xlen)
        if yname is not None:
            a = _crop_axis(a, 1, ylen)
        if zname is not None:
            a = _crop_axis(a, 2, zlen)
        return a

    return (crop(out[0], nx, ny + 1, nz + 1),
            crop(out[1], nx + 1, ny, nz + 1),
            crop(out[2], nx + 1, ny + 1, nz))


# ----------------------------------------------------------------------
# Distributed lines ALONG a sharded axis: exact substructuring.
#
# Lines along local axis 0 with axis 0 itself sharded (y-lines on a
# y-mesh, z-lines on a z-mesh, both on the 2-D mesh) — the hard part
# SURVEY §7.2 names for the DD mandate: the block-tridiagonal solve
# couples stations across shards.  Design (Schur complement on the
# interface stations; the TPU-native equivalent of the reference's
# inherently sequential per-line Thomas, core.py:477-1316):
#
# - Shard t owns stations [t·c, (t+1)·c); its FIRST station u_t is the
#   interface, stations 1..c-1 the interior.  Eliminating every
#   shard's interior (the existing batched block-Thomas, factored once
#   per call) reduces the global system to a block tridiagonal over
#   the ndev interface stations, with 5×5 blocks assembled from the
#   spike columns Φ = T̃⁻¹E₀B₁ and Ψ = T̃⁻¹E_last·B_nextᵀ (also
#   factored once per call).  The Schur complement of a
#   complex-symmetric matrix is complex symmetric, so the reduced
#   system reuses block_tridiag_factor/solve verbatim.
# - Per color step: one interior Thomas solve, one neighbor ppermute
#   (Y's last station), one all_gather of the 5-vector interface rhs,
#   a redundant (tiny, length-ndev) reduced solve on every shard, and
#   the two spike corrections.  Communication is O(interface), not
#   O(volume): weak-scalable by construction.
# - Station blocks come from _line_blocks_x evaluated on the width-2
#   x-extended slab (its own ends lie outside the owned slice, so its
#   boundary special-casing never pollutes owned stations); global
#   boundary/padding specials are re-applied with dynamic masks.
#
# Exact: parity tests pin 1e-12 against the single-device kernel, so
# sharded sc+lr solves keep unsharded cycle counts.
# ----------------------------------------------------------------------


def _lo_halo2(a, ax, name, ndev):
    """Neighbor d−1's last TWO planes along ``ax`` (zeros at edge)."""
    def two(x):
        sl = [slice(None)] * x.ndim
        sl[ax] = slice(-2, None)
        return lax.ppermute(x[tuple(sl)], name, _perms(ndev, True))
    return _tmap(two, a)


def _hi_halo2(a, ax, name, ndev):
    """Neighbor d+1's first TWO planes along ``ax``."""
    def two(x):
        sl = [slice(None)] * x.ndim
        sl[ax] = slice(0, 2)
        return lax.ppermute(x[tuple(sl)], name, _perms(ndev, False))
    return _tmap(two, a)


def _xext(a, kind, name, ndev):
    """Width-2 x-extension (axis 0): node → [2|own|2], cell → [2|own|1].

    Width 2 so the station residual at the shard's boundary NODE (the
    last station's transverse components live on the neighbor's first
    node plane) and the neighbor-coupling block B_next are computable
    locally; equal lo offsets keep the Yee staggering.
    """
    lo = _lo_halo2(a, 0, name, ndev)
    if kind == 'cell':
        return _cat([lo, a, _hi_halo(a, 0, name, ndev)], 0)
    return _cat([lo, a, _hi_halo2(a, 0, name, ndev)], 0)


def _eye_like(D):
    """Identity blocks broadcast to D's shape."""
    if cx.is_c2(D):
        re = jnp.broadcast_to(jnp.eye(D.re.shape[-1], dtype=D.re.dtype),
                              D.re.shape)
        return cx.C2(re, jnp.zeros_like(D.im))
    return jnp.broadcast_to(jnp.eye(D.shape[-1], dtype=D.dtype),
                            D.shape)


def _solve_cols(facts, B, R):
    """Block-tridiagonal solve with a 5-column rhs (spike columns)."""
    return jax.vmap(
        lambda col: block_tridiag_solve_factored(*facts, B, col),
        in_axes=-1, out_axes=-1)(R)


def _ag(x, name):
    """all_gather a pytree along mesh axis ``name`` (new leading axis)."""
    return _tmap(lambda v: lax.all_gather(v, name, axis=0), x)


def _dynidx(x, i):
    """Dynamic index into axis 0 of a pytree."""
    return _tmap(lambda v: lax.dynamic_index_in_dim(v, i, 0,
                                                    keepdims=False), x)


def _line_body_xsh(ex, ey, ez, sx, sy, sz, eta_x, eta_y, eta_z, zeta,
                   hx, hy, hz, *, nu, shape, xname, yname, zname,
                   nx_dev, ny_dev, nz_dev, cxn, cy, cz):
    """Per-shard body: 4-color x-line relaxation, x-axis SHARDED."""
    nx, ny, nz = shape
    halo = _Halo(yname, zname, ny_dev, nz_dev)
    t_idx = lax.axis_index(xname)
    a0 = t_idx * cxn                      # first owned station/node
    gst = a0 + jnp.arange(cxn)            # global station indices

    def xx(a, kind):
        return _xext(a, kind, xname, nx_dev)

    # --- once per call: x- then transverse-extended params; station
    # blocks on the extended frame; masked to global semantics.
    hx_e = jnp.concatenate([
        lax.ppermute(hx[-2:], xname, _perms(nx_dev, True)), hx,
        lax.ppermute(hx[:1], xname, _perms(nx_dev, False))])
    par_h = halo.params(*(xx(p, 'cell') for p in
                          (eta_x, eta_y, eta_z, zeta)),
                        hx_e, hy, hz)
    c = node_coefficients(*par_h)
    ent = node_block_entries(c)
    nx_ext = cxn + 3                      # extended station count
    D_ext, B_ext = smoothers._line_blocks_x(c, xx(ex, 'cell'), nx_ext)
    D_loc = D_ext[2:2 + cxn]
    B_loc = B_ext[2:2 + cxn]

    # --- global-boundary / padding masks (dynamic: a0 is per-shard).
    bdim = (cxn,) + (1,) * (D_loc.re.ndim - 1 if cx.is_c2(D_loc)
                            else D_loc.ndim - 1)
    g_b = gst.reshape(bdim)
    pad_st = g_b >= nx                    # dummy padding stations
    last_st = g_b == nx - 1               # global last station

    eye = _eye_like(D_loc)
    # g == nx-1: only the ex row lives; transverse rows identity.
    # ent_ext[j] holds the global node a0+j-1 entry → ent_global[g-1]
    # for local station i sits at j = i+1.
    ent11 = cx.broadcast_to(ent[(1, 1)],
                            ent[(0, 0)].shape)[1:1 + cxn]
    D_last = cx.zeros_like(D_loc)
    D_last = D_last.at[..., 0, 0].set(ent11)
    for _k in range(1, 5):
        D_last = D_last.at[..., _k, _k].set(1.0)
    D_loc = cx.where(last_st, D_last, D_loc)
    D_loc = cx.where(pad_st, eye, D_loc)

    tr_mask = jnp.zeros((5, 5), bool).at[1:, 1:].set(True)
    B_loc = cx.where(last_st & tr_mask, 0, B_loc)
    B_loc = cx.where(pad_st, 0, B_loc)
    B_loc = cx.where(g_b == 0, 0, B_loc)  # global first station
    Bfirst = B_loc[0]

    # Neighbor coupling B_next = B[a0+cxn] = the x-neighbor's Bfirst
    # (already carrying its global masks) — one ppermute down.
    Bn = _tmap(lambda v: lax.ppermute(v, xname,
                                      _perms(nx_dev, False)), Bfirst)

    # --- interior factorization + spikes (field-independent).
    D_int = D_loc[1:]
    B_int = B_loc[1:]
    facts = block_tridiag_factor(D_int, B_int)
    m = cxn - 1

    def t(ab):
        return cx.swapaxes(ab, -1, -2)

    mmul = cx.matmul_nt                    # plain A @ M

    R_phi = cx.zeros_like(D_int)
    R_phi = R_phi.at[0].set(B_loc[1])
    Phi = _solve_cols(facts, B_int, R_phi)
    R_psi = cx.zeros_like(D_int)
    R_psi = R_psi.at[m - 1].set(t(Bn))
    Psi = _solve_cols(facts, B_int, R_psi)

    def up1(x):
        return _tmap(lambda v: lax.ppermute(v, xname,
                                            _perms(nx_dev, True)), x)

    Phi_pl = up1(Phi[m - 1])
    Psi_pl = up1(Psi[m - 1])
    Rdiag = D_loc[0] - mmul(Bfirst, Psi_pl) - mmul(t(B_loc[1]), Phi[0])
    Rsub = -mmul(Bfirst, Phi_pl)
    Rd_all = _ag(Rdiag, xname)
    Rs_all = _ag(Rsub, xname)
    red_facts = block_tridiag_factor(Rd_all, Rs_all)

    # --- once per call: extended sources.
    sh = halo.source(xx(sx, 'cell'), xx(sy, 'node'), xx(sz, 'node'))

    myn = cy if yname else ny - 1
    mzn = cz if zname else nz - 1
    _, gy, gz, inb = halo.coords(shape, myn, mzn)
    ysl = slice(None) if yname else slice(1, -1)
    zsl = slice(None) if zname else slice(1, -1)

    # Station-component masks (global boundary/padding).
    st_sh = (cxn, 1, 1)
    g_s = gst.reshape(st_sh)
    m_rx = g_s <= nx - 1
    m_tr = g_s <= nx - 2                  # node g+1 ≤ nx-1

    def color_step(e_, sc):
        it, cidx = sc
        color = jnp.where(it % 2 == 0, cidx, 3 - cidx)
        cyp = color % 2
        czp = color // 2

        exh, eyh, ezh = halo.field(xx(e_[0], 'cell'),
                                   xx(e_[1], 'node'),
                                   xx(e_[2], 'node'))
        rx, ry, rz = stencil.residual_parts(*sh, exh, eyh, ezh, *par_h)
        r = cx.stack([
            cx.where(m_rx, rx[2:2 + cxn, 1:-1, 1:-1], 0),
            cx.where(m_tr, ry[3:3 + cxn, :-1, 1:-1], 0),
            cx.where(m_tr, ry[3:3 + cxn, 1:, 1:-1], 0),
            cx.where(m_tr, rz[3:3 + cxn, 1:-1, :-1], 0),
            cx.where(m_tr, rz[3:3 + cxn, 1:-1, 1:], 0),
        ], axis=-1)

        # Interior solve + interface Schur rhs.
        Y = block_tridiag_solve_factored(*facts, B_int, r[1:])
        Y_pl = up1(Y[m - 1])
        rhs = r[0] - cx.matvec(Bfirst, Y_pl) \
            - cx.matvec(t(B_loc[1]), Y[0])
        u_all = block_tridiag_solve_factored(
            *red_facts, Rs_all, _ag(rhs, xname))
        u_t = _dynidx(u_all, t_idx)
        nxt = jnp.minimum(t_idx + 1, nx_dev - 1)
        u_n = _dynidx(u_all, nxt)
        u_n = cx.where(t_idx + 1 >= nx_dev, 0, u_n)

        x_int = Y - cx.matvec(Phi, u_t) - cx.matvec(Psi, u_n)
        delta = cx.concatenate([u_t[None], x_int], axis=0)

        mask = (((gy - 1) % 2 == cyp) & ((gz - 1) % 2 == czp) & inb)
        dm = cx.where(mask[..., None], delta, 0)

        # ex: station g deposits into its own x-edge (cell g).
        ex_n = e_[0].at[:, ysl, zsl].add(dm[..., 0])

        # Transverse deposits land at node g+1: station cxn−1's go to
        # the x-neighbor's node 0 — push the raw station plane up and
        # treat it as a local node-0 deposit (its own y/z splitting
        # and ghost pushes then run through the SAME code below).
        rem_x = up1(dm[cxn - 1:cxn])
        dmx = cx.concatenate([rem_x, dm[:cxn - 1]], axis=0)

        if yname is None:
            ey_n = e_[1].at[:, :, zsl].add(
                cx.pad(dmx[..., 1], ((0, 0), (0, 1), (0, 0))) +
                cx.pad(dmx[..., 2], ((0, 0), (1, 0), (0, 0))))
        else:
            ey_n = e_[1].at[:, :, zsl].add(
                cx.pad(dmx[:, 1:, :, 1], ((0, 0), (0, 1), (0, 0))) +
                dmx[..., 2])
            dep = _tmap(lambda x_: jnp.zeros_like(x_[:, :1]), e_[1]) \
                .at[:, :, zsl].add(dmx[:, :1, :, 1])
            rem = _tmap(lambda x_: lax.ppermute(
                x_, yname, _perms(ny_dev, False)), dep)
            ey_n = ey_n.at[:, -1:, :].add(rem)

        if zname is None:
            ez_n = e_[2].at[:, ysl, :].add(
                cx.pad(dmx[..., 3], ((0, 0), (0, 0), (0, 1))) +
                cx.pad(dmx[..., 4], ((0, 0), (0, 0), (1, 0))))
        else:
            ez_n = e_[2].at[:, ysl, :].add(
                cx.pad(dmx[:, :, 1:, 3], ((0, 0), (0, 0), (0, 1))) +
                dmx[..., 4])
            dep = _tmap(lambda x_: jnp.zeros_like(x_[..., :1]), e_[2]) \
                .at[:, ysl, :].add(dmx[:, :, :1, 3])
            rem = _tmap(lambda x_: lax.ppermute(
                x_, zname, _perms(nz_dev, False)), dep)
            ez_n = ez_n.at[..., -1:].add(rem)
        return (ex_n, ey_n, ez_n), None

    its = jnp.repeat(jnp.arange(nu), 4)
    cols = jnp.tile(jnp.arange(4), nu)
    e_out, _ = lax.scan(color_step, (ex, ey, ez), (its, cols))
    return e_out


def _line_body(ex, ey, ez, sx, sy, sz, eta_x, eta_y, eta_z, zeta,
               hx, hy, hz, *, nu, shape, yname, zname, ny_dev, nz_dev,
               cy, cz):
    """Per-shard body: 4-color x-line block-Thomas updates.

    Every local line is solved each color step and the inactive colors
    masked out afterwards (lines are independent in the Thomas solve,
    so the extra solves are redundant work, not wrong answers) — this
    keeps the kernel free of per-shard parity bookkeeping; the Pallas
    path owns the single-device efficiency story.
    """
    nx, ny, nz = shape
    halo = _Halo(yname, zname, ny_dev, nz_dev)

    # --- once per call: haloed params, station blocks, Thomas factors.
    par_h = halo.params(eta_x, eta_y, eta_z, zeta, hx, hy, hz)
    c = node_coefficients(*par_h)
    D, B = smoothers._line_blocks_x(c, ex, nx)
    facts = block_tridiag_factor(D, B)
    sh = halo.source(sx, sy, sz)

    myn = cy if yname else ny - 1
    mzn = cz if zname else nz - 1
    _, gy, gz, inb = halo.coords(shape, myn, mzn)

    ysl = slice(None) if yname else slice(1, -1)
    zsl = slice(None) if zname else slice(1, -1)
    padx = ((0, 1), (0, 0), (0, 0), (0, 0))

    axes = halo.sharded_axes()

    def color_step(carry, sc):
        it, cidx = sc
        color = jnp.where(it % 2 == 0, cidx, 3 - cidx)
        cyp = color % 2
        czp = color // 2

        # Same pipelined split as _point_body: lagged ghost deposits
        # applied here; the O(volume) residual + Thomas solve run on
        # the pre-apply zero-extended field (no collective
        # dependence); only the boundary fix waits on the halos.
        e_, pend = carry
        et = _apply_pend(e_, pend, yname, zname)
        delta, r0 = _line_bulk(e_, sh, par_h, facts, B, halo, padx[:3])
        delta = _line_boundary_fix(delta, et, sh, par_h, facts, B,
                                   halo, axes, r0, padx[:3])

        mask = (((gy - 1) % 2 == cyp) & ((gz - 1) % 2 == czp) & inb)
        dm = cx.where(mask[..., None], delta, 0)

        ex_n = et[0].at[:, ysl, zsl].add(dm[..., 0])

        pend_n = []
        if yname is None:
            ey_n = et[1].at[1:-1, :, zsl].add(
                cx.pad(dm[:-1, ..., 1], ((0, 0), (0, 1), (0, 0))) +
                cx.pad(dm[:-1, ..., 2], ((0, 0), (1, 0), (0, 0))))
        else:
            ey_n = et[1].at[1:-1, :, zsl].add(
                cx.pad(dm[:-1, 1:, :, 1], ((0, 0), (0, 1), (0, 0))) +
                dm[:-1, ..., 2])
            dep = _tmap(lambda x: jnp.zeros_like(x[:, :1]), et[1]) \
                .at[1:-1, :, zsl].add(dm[:-1, :1, :, 1])
            pend_n.append(_tmap(lambda x: lax.ppermute(
                x, yname, _perms(ny_dev, False)), dep))

        if zname is None:
            ez_n = et[2].at[1:-1, ysl, :].add(
                cx.pad(dm[:-1, ..., 3], ((0, 0), (0, 0), (0, 1))) +
                cx.pad(dm[:-1, ..., 4], ((0, 0), (0, 0), (1, 0))))
        else:
            ez_n = et[2].at[1:-1, ysl, :].add(
                cx.pad(dm[:-1, :, 1:, 3], ((0, 0), (0, 0), (0, 1))) +
                dm[:-1, ..., 4])
            dep = _tmap(lambda x: jnp.zeros_like(x[..., :1]), et[2]) \
                .at[1:-1, ysl, :].add(dm[:-1, :, :1, 3])
            pend_n.append(_tmap(lambda x: lax.ppermute(
                x, zname, _perms(nz_dev, False)), dep))
        return ((ex_n, ey_n, ez_n), tuple(pend_n)), None

    its = jnp.repeat(jnp.arange(nu), 4)
    cols = jnp.tile(jnp.arange(4), nu)
    pend0 = _pend_zeros((ex, ey, ez), yname, zname)
    (e_out, pend_out), _ = lax.scan(color_step, ((ex, ey, ez), pend0),
                                    (its, cols))
    return _apply_pend(e_out, pend_out, yname, zname)
