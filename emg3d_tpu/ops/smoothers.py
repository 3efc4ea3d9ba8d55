"""Parallel multicolor block smoothers (the >90%-of-runtime kernels).

TPU-native replacement for the reference's *sequential lexicographic*
Gauss-Seidel (/root/reference/emg3d/core.py:181-1316), which cannot be
parallelized.  We use the mathematically equivalent-strength multicolor
formulation:

- **Point smoother**: the [ArFW00] overlapping 6-edge node blocks,
  updated in δ-form: solve ``A_block δ = r_block`` (current residual
  restricted to the block) and add δ.  This is *identical* to the
  reference's "solve the 6 edge equations with frozen neighbors" — the
  only difference is ordering: nodes are updated red/black by parity
  (blocks of equal parity are disjoint, so each color is a true
  synchronous block-GS step).  All node systems of a color are solved
  simultaneously by the batched sparse 6×6 LDLᵀ.

- **Line relaxation**: all edges attached to a grid line are solved
  together as a block-tridiagonal system of 5×5 station blocks
  (station i = [ex(i), ey∓, ey±, ez∓, ez± at node i+1]).  Lines are
  2-colored by transverse parity; each color's lines are solved
  concurrently by a batched block-Thomas scan.  The y/z variants reuse
  the x kernel through an exact cyclic axis rotation of the
  discretization (x→y→z→x).

A symmetric sweep (reference ``nu=2``: forward+backward) maps to
alternating the color order per iteration.
"""
import jax.numpy as jnp

from .. import cx
from . import stencil
from .blocksolve import (ldl_factor_sparse, ldl_solve_factored,
                         block_tridiag_factor,
                         block_tridiag_solve_factored,
                         block_tridiag_factor_entries,
                         block_tridiag_solve_entries)
from .coeffs import node_coefficients, node_block_entries

__all__ = ['gauss_seidel_point', 'line_relaxation']


def _residual(e, s, par):
    return stencil.residual_parts(s[0], s[1], s[2], e[0], e[1], e[2], *par)


def _point_color_update(e, s, par, fact, color):
    """One color of the 8-color node-block update.

    ``color`` is a parity triple (cx, cy, cz): a node (ix, iy, iz) is
    active iff (ix%2, iy%2, iz%2) == color.  Eight colors are required
    (not two): blocks of face- and edge-diagonal neighbor nodes are
    coupled through the operator, so only full-parity separation makes
    the simultaneous update a true (sequential-equivalent) block-GS
    step; with fewer colors it degrades to block-Jacobi within a color
    and the MG convergence factor suffers badly.
    """
    ex, ey, ez = e
    rx, ry, rz = _residual(e, s, par)

    # Residual at the six block edges of every interior node.
    rb = [rx[:-1, 1:-1, 1:-1], rx[1:, 1:-1, 1:-1],
          ry[1:-1, :-1, 1:-1], ry[1:-1, 1:, 1:-1],
          rz[1:-1, 1:-1, :-1], rz[1:-1, 1:-1, 1:]]

    delta = ldl_solve_factored(6, fact[0], fact[1], rb)

    # Node color mask; zero-based node (i0,j0,k0) = (ix-1, iy-1, iz-1).
    # ``color`` is a (traced) scalar 0..7 encoding (cx, cy, cz) parity.
    nsh = rb[0].shape
    px = color % 2
    py = (color // 2) % 2
    pz = color // 4
    ii = jnp.arange(nsh[0])[:, None, None]
    jj = jnp.arange(nsh[1])[None, :, None]
    kk = jnp.arange(nsh[2])[None, None, :]
    mask = ((((ii + 1) % 2) == px) & (((jj + 1) % 2) == py) &
            (((kk + 1) % 2) == pz))
    dm = [cx.where(mask, d, 0) for d in delta]

    # Scatter-add: each edge receives δ from exactly one active node.
    ex = ex.at[:, 1:-1, 1:-1].add(
        cx.pad(dm[0], ((0, 1), (0, 0), (0, 0))) +
        cx.pad(dm[1], ((1, 0), (0, 0), (0, 0))))
    ey = ey.at[1:-1, :, 1:-1].add(
        cx.pad(dm[2], ((0, 0), (0, 1), (0, 0))) +
        cx.pad(dm[3], ((0, 0), (1, 0), (0, 0))))
    ez = ez.at[1:-1, 1:-1, :].add(
        cx.pad(dm[4], ((0, 0), (0, 0), (0, 1))) +
        cx.pad(dm[5], ((0, 0), (0, 0), (1, 0))))
    return ex, ey, ez


def gauss_seidel_point(ex, ey, ez, sx, sy, sz, eta_x, eta_y, eta_z, zeta,
                       hx, hy, hz, nu):
    """nu sweeps of 8-color node-block Gauss-Seidel.

    Each sweep updates all eight colors; the color order alternates
    between sweeps (the multicolor analog of the reference's
    forward/backward alternation, core.py:282-315).  Note the default
    nu is calibrated in :class:`emg3d_tpu.solver.MGParameters`: three
    color-sweeps match two lexicographic sweeps in two-grid strength.
    """
    from jax import lax

    par = (eta_x, eta_y, eta_z, zeta, hx, hy, hz)
    c = node_coefficients(eta_x, eta_y, eta_z, zeta, hx, hy, hz)
    entries = node_block_entries(c)
    # The block factorization is field-independent: factor once here,
    # outside the color sweep (it is hoisted out of the scan as a
    # constant), instead of re-factorizing in all 8*nu color updates.
    fact = ldl_factor_sparse(6, entries)
    e = (ex, ey, ez)
    s = (sx, sy, sz)

    order = list(range(8))
    seq = []
    for it in range(nu):
        seq.extend(order if it % 2 == 0 else order[::-1])

    # scan over (sweep, color): one traced color-update body instead of
    # 8·nu unrolled copies — compile time stays flat in nu.
    def step(e, color):
        return _point_color_update(e, s, par, fact, color), None

    e, _ = lax.scan(step, e, jnp.asarray(seq))
    return e


# ----------------------------------------------------------------------
# Line relaxation
# ----------------------------------------------------------------------

def _line_blocks_x(c, proto, nx):
    """Station blocks D (nx, ny-1, nz-1, 5, 5) and B for x-lines.

    ``proto`` is a prototype array fixing the representation (native
    complex or C2 split pair) and dtype of the blocks.
    """
    ent = node_block_entries(c)
    nsh = ent[(0, 0)].shape  # (nx-1, ny-1, nz-1)

    def full(v):
        return cx.broadcast_to(v, nsh)

    # --- D for stations 0..nx-2 (node i+1 = node array index i).
    D = cx.zeros((nx,) + nsh[1:] + (5, 5), like=proto)

    def setD(a, b, val):
        # Symmetric set into stations 0..nx-2.
        nonlocal D
        D = D.at[:-1, ..., a, b].add(val)
        if a != b:
            D = D.at[:-1, ..., b, a].add(val)

    setD(0, 0, full(ent[(0, 0)]))
    setD(1, 1, full(ent[(2, 2)]))
    setD(2, 2, full(ent[(3, 3)]))
    setD(3, 3, full(ent[(4, 4)]))
    setD(4, 4, full(ent[(5, 5)]))
    setD(1, 0, full(ent[(2, 0)]))
    setD(2, 0, full(ent[(3, 0)]))
    setD(3, 0, full(ent[(4, 0)]))
    setD(4, 0, full(ent[(5, 0)]))
    setD(3, 1, full(ent[(4, 2)]))
    setD(4, 1, full(ent[(5, 2)]))
    setD(3, 2, full(ent[(4, 3)]))
    setD(4, 2, full(ent[(5, 3)]))

    # --- Last station nx-1: only ex; transverse rows are identity.
    D = D.at[-1, ..., 0, 0].set(full(ent[(1, 1)])[-1])
    for k in range(1, 5):
        D = D.at[-1, ..., k, k].set(1.0)

    # --- Sub-diagonal blocks B_i (station i -> station i-1), i=1..nx-1.
    B = cx.zeros_like(D)
    # Row 0: ex(i) ↔ transverse(node i): entries (2..5, 1) at node idx i-1.
    B = B.at[1:, ..., 0, 1].set(full(ent[(2, 1)]))
    B = B.at[1:, ..., 0, 2].set(full(ent[(3, 1)]))
    B = B.at[1:, ..., 0, 3].set(full(ent[(4, 1)]))
    B = B.at[1:, ..., 0, 4].set(full(ent[(5, 1)]))
    # Transverse ↔ transverse (x-direction couplings), node idx i,
    # for stations i=1..nx-2 (station nx-1 has no transverse rows).
    byy_m = full(-(c.mzxLym * c.ihxm))
    byy_p = full(-(c.mzxLyp * c.ihxm))
    bzz_m = full(-(c.myxLzm * c.ihxm))
    bzz_p = full(-(c.myxLzp * c.ihxm))
    B = B.at[1:-1, ..., 1, 1].set(byy_m[1:])
    B = B.at[1:-1, ..., 2, 2].set(byy_p[1:])
    B = B.at[1:-1, ..., 3, 3].set(bzz_m[1:])
    B = B.at[1:-1, ..., 4, 4].set(bzz_p[1:])
    return D, B


def _line_entries_x(c, nx):
    """Station-block ENTRIES of the x-line system, unsplit transverse
    layout (each entry one (nx, ny-1, nz-1) stack).

    The sparse-entry sibling of :func:`_line_blocks_x` — same values,
    no dense (..., 5, 5) materialization (256³: the dense build peaked
    at 22 GB of HLO temps).  Used to build the Pallas streamed-factor
    stacks (ops/pallas_lr.line_factors) and by callers that want the
    global transverse layout.
    """
    ent = node_block_entries(c)
    nsh = ent[(0, 0)].shape  # (nx-1, nyn, nzn)

    def full(v):
        return cx.broadcast_to(v, nsh)

    def padx(a, lo, hi):
        return cx.pad(a, ((lo, hi), (0, 0), (0, 0)))

    _D_MAP = {(0, 0): (0, 0), (1, 1): (2, 2), (2, 2): (3, 3),
              (3, 3): (4, 4), (4, 4): (5, 5), (1, 0): (2, 0),
              (2, 0): (3, 0), (3, 0): (4, 0), (4, 0): (5, 0),
              (3, 1): (4, 2), (4, 1): (5, 2), (3, 2): (4, 3),
              (4, 2): (5, 3)}
    Dent = {}
    for (a, b), key in _D_MAP.items():
        body = full(ent[key])
        if a == b:
            if a == 0:
                last = full(ent[(1, 1)])[-1:]
            else:
                last = cx.zeros_like(body[:1]) + 1.0
            Dent[(a, b)] = cx.concatenate([body, last], axis=0)
        else:
            Dent[(a, b)] = padx(body, 0, 1)

    byy_m = -(c.mzxLym * c.ihxm)
    byy_p = -(c.mzxLyp * c.ihxm)
    bzz_m = -(c.myxLzm * c.ihxm)
    bzz_p = -(c.myxLzp * c.ihxm)
    Bent = {(0, 1): padx(full(ent[(2, 1)]), 1, 0),
            (0, 2): padx(full(ent[(3, 1)]), 1, 0),
            (0, 3): padx(full(ent[(4, 1)]), 1, 0),
            (0, 4): padx(full(ent[(5, 1)]), 1, 0),
            (1, 1): padx(full(byy_m)[1:], 1, 1),
            (2, 2): padx(full(byy_p)[1:], 1, 1),
            (3, 3): padx(full(bzz_m)[1:], 1, 1),
            (4, 4): padx(full(bzz_p)[1:], 1, 1)}
    return Dent, Bent


def _line_entries_x_parity(c, nx, ny2, nz2):
    """Station-block ENTRIES in parity-split padded layout.

    The 5×5 station blocks of the x-line system are sparse (13 unique
    symmetric D entries, 8 B entries); this builds each entry as one
    ``(nx, 2, 2, ny2, nz2)`` stack (axes 1/2 = y/z parity) for the
    sparse-entry Thomas engine (ops/blocksolve.py:
    block_tridiag_factor_entries).  Dense ``(..., 5, 5)`` blocks never
    exist: at 256³ the old build-pad-split-factor path peaked at 22 GB
    of D-sized HLO temps and OOMed the 16 GB HBM; the entries path
    stores 15 factor stacks + 8 B stacks (≈3× smaller) and its
    construction temporaries are entry-sized.

    Padded (out-of-range) transverse nodes get identity diagonals, as
    does the ex-only last station's transverse rows — those lines'
    solutions are zero (zero rhs) and cropped.
    """
    ent = node_block_entries(c)
    nsh = ent[(0, 0)].shape  # (nx-1, nyn, nzn)
    nyn, nzn = nsh[1], nsh[2]

    def quarters(v):
        """full(ent) -> zero-padded (nx-1, 2, 2, ny2, nz2) parities."""
        rows = []
        for py in (0, 1):
            row = []
            for pz in (0, 1):
                q = cx.broadcast_to(v, nsh)[:, py::2, pz::2]
                qs = (q.re if isinstance(q, cx.C2) else q).shape
                row.append(cx.pad(q, ((0, 0), (0, ny2 - qs[1]),
                                      (0, nz2 - qs[2]))))
            rows.append(cx.stack(row, axis=1))
        return cx.stack(rows, axis=1)

    # padmask (2, 2, ny2, nz2): 1 at padded (out-of-range) nodes —
    # quarter index (q, r) at parity (py, pz) is node (2q+py, 2r+pz).
    jj = (2 * jnp.arange(ny2)[None, None, :, None]
          + jnp.arange(2)[:, None, None, None])
    kk = (2 * jnp.arange(nz2)[None, None, None, :]
          + jnp.arange(2)[None, :, None, None])
    pm = ((jj >= nyn) | (kk >= nzn)).astype(
        cx.real_dtype_of(ent[(0, 0)]))

    def padx(a, lo, hi):
        return cx.pad(a, ((lo, hi), (0, 0), (0, 0), (0, 0), (0, 0)))

    _D_MAP = {(0, 0): (0, 0), (1, 1): (2, 2), (2, 2): (3, 3),
              (3, 3): (4, 4), (4, 4): (5, 5), (1, 0): (2, 0),
              (2, 0): (3, 0), (3, 0): (4, 0), (4, 0): (5, 0),
              (3, 1): (4, 2), (4, 1): (5, 2), (3, 2): (4, 3),
              (4, 2): (5, 3)}
    Dent = {}
    for (a, b), key in _D_MAP.items():
        body = quarters(ent[key])
        if a == b:
            body = body + pm[None]
            if a == 0:
                last = quarters(ent[(1, 1)])[-1:] + pm[None]
            else:
                last = cx.zeros_like(body[:1]) + 1.0
            Dent[(a, b)] = cx.concatenate([body, last], axis=0)
        else:
            Dent[(a, b)] = padx(body, 0, 1)

    byy_m = -(c.mzxLym * c.ihxm)
    byy_p = -(c.mzxLyp * c.ihxm)
    bzz_m = -(c.myxLzm * c.ihxm)
    bzz_p = -(c.myxLzp * c.ihxm)
    Bent = {(0, 1): padx(quarters(ent[(2, 1)]), 1, 0),
            (0, 2): padx(quarters(ent[(3, 1)]), 1, 0),
            (0, 3): padx(quarters(ent[(4, 1)]), 1, 0),
            (0, 4): padx(quarters(ent[(5, 1)]), 1, 0),
            (1, 1): padx(quarters(byy_m)[1:], 1, 1),
            (2, 2): padx(quarters(byy_p)[1:], 1, 1),
            (3, 3): padx(quarters(bzz_m)[1:], 1, 1),
            (4, 4): padx(quarters(bzz_p)[1:], 1, 1)}
    return Dent, Bent


def _parity_pick(a, cy, cz, ny2, nz2):
    """(S, Ny, Nz) -> the (cy, cz)-parity quarter (S, ny2, nz2)."""
    from jax import lax, tree_util

    S = (a.re if isinstance(a, cx.C2) else a).shape[0]
    sh = (a.re if isinstance(a, cx.C2) else a).shape
    a = cx.pad(a, ((0, 0), (0, 2 * ny2 - sh[1]), (0, 2 * nz2 - sh[2])))
    a = cx.reshape(a, (S, ny2, 2, nz2, 2))
    return tree_util.tree_map(
        lambda x: lax.dynamic_index_in_dim(
            lax.dynamic_index_in_dim(x, cz, axis=4, keepdims=False),
            cy, axis=2, keepdims=False), a)


def _parity_embed(d, cy, cz, nyn, nzn):
    """Inverse of :func:`_parity_pick`: quarter -> (S, nyn, nzn) with
    zeros at the three inactive parities."""
    S, ny2, nz2 = (d.re if isinstance(d, cx.C2) else d).shape
    full = cx.zeros((S, ny2, 2, nz2, 2), like=d)
    full = full.at[:, :, cy, :, cz].set(d)
    return cx.reshape(full, (S, 2 * ny2, 2 * nz2))[:, :nyn, :nzn]


def _line_color_update_x(e, s, par, facts, Bent, color, nyz2):
    """One color of the 4-color x-line update.

    Lines need 4 colors (transverse (y, z) parity) — adjacent and
    diagonal lines are coupled through the operator, so only full
    transverse-parity separation yields a true multicolor block-GS
    step.  Only the active color's quarter of lines is solved: the
    factor entry stacks arrive parity-decomposed
    ((S, 2, 2, ny2, nz2)) and ``color`` (traced scalar, cy + 2*cz)
    dynamically indexes them.
    """
    from jax import lax, tree_util

    ex, ey, ez = e
    rx, ry, rz = _residual(e, s, par)
    ny2, nz2 = nyz2
    nyn = rx.shape[1] - 2          # interior node counts
    nzn = rx.shape[2] - 2

    cy = color % 2
    cz = color // 2

    # Station residuals: 5 component stacks (nx, ny2, nz2), parity-
    # picked (never materialized as a dense (..., 5) array).
    padx1 = ((0, 1), (0, 0), (0, 0))
    rq = [_parity_pick(a, cy, cz, ny2, nz2) for a in (
        rx[:, 1:-1, 1:-1],
        cx.pad(ry[1:-1, :-1, 1:-1], padx1),
        cx.pad(ry[1:-1, 1:, 1:-1], padx1),
        cx.pad(rz[1:-1, 1:-1, :-1], padx1),
        cx.pad(rz[1:-1, 1:-1, 1:], padx1),
    )]

    def pick(t):
        return tree_util.tree_map(
            lambda x: lax.dynamic_index_in_dim(
                lax.dynamic_index_in_dim(x, cy, axis=1, keepdims=False),
                cz, axis=1, keepdims=False), t)

    facts_q = pick(facts)
    Bent_q = {k: pick(v) for k, v in Bent.items()}
    delta = block_tridiag_solve_entries(5, facts_q, Bent_q, rq)

    # Re-embed each quarter solution at its parity slot; the other
    # parities stay zero, so the static scatter below adds nothing
    # there (no mask needed).
    dm = [_parity_embed(d, cy, cz, nyn, nzn) for d in delta]

    ex = ex.at[:, 1:-1, 1:-1].add(dm[0])
    ey = ey.at[1:-1, :-1, 1:-1].add(dm[1][:-1])
    ey = ey.at[1:-1, 1:, 1:-1].add(dm[2][:-1])
    ez = ez.at[1:-1, 1:-1, :-1].add(dm[3][:-1])
    ez = ez.at[1:-1, 1:-1, 1:].add(dm[4][:-1])
    return ex, ey, ez


def _gs_line_x(ex, ey, ez, sx, sy, sz, eta_x, eta_y, eta_z, zeta,
               hx, hy, hz, nu):
    from jax import lax

    par = (eta_x, eta_y, eta_z, zeta, hx, hy, hz)
    c = node_coefficients(eta_x, eta_y, eta_z, zeta, hx, hy, hz)
    nx = ex.shape[0]

    # Parity-decomposed stations: each color solves only its own
    # quarter of the lines (solving ALL lines every color step would
    # be 4x redundant Thomas work).  Transverse extents are padded to
    # even with identity diagonal blocks (solutions there are zero and
    # cropped).  Blocks live as sparse ENTRY stacks — see
    # _line_entries_x_parity for why (256³ HBM peak).
    nyn = ex.shape[1] - 2          # interior node counts (ny-1, nz-1)
    nzn = ex.shape[2] - 2
    ny2, nz2 = -(-nyn // 2), -(-nzn // 2)
    Dent, Bent = _line_entries_x_parity(c, nx, ny2, nz2)

    # Field-independent block-Thomas elimination: factor once per
    # smoothing call (all 4 parities batched), reuse across all 4*nu
    # color updates.
    facts = block_tridiag_factor_entries(5, Dent, Bent)
    e = (ex, ey, ez)
    s = (sx, sy, sz)

    def step(e, sc):
        it, cidx = sc
        color = jnp.where(it % 2 == 0, cidx, 3 - cidx)
        return _line_color_update_x(e, s, par, facts, Bent, color,
                                    (ny2, nz2)), None

    its = jnp.repeat(jnp.arange(nu), 4)
    cols = jnp.tile(jnp.arange(4), nu)
    e, _ = lax.scan(step, e, (its, cols))
    return e


def _proto(a):
    """Representation prototype (C2 or plain) for zeros-like creation."""
    return a


def _rot_fwd(a):
    """Cyclic axis rotation x→y→z→x (array axes (1, 2, 0))."""
    return cx.transpose(a, (1, 2, 0))


def _rot_bwd(a):
    return cx.transpose(a, (2, 0, 1))


def line_relaxation(ex, ey, ez, sx, sy, sz, eta_x, eta_y, eta_z, zeta,
                    hx, hy, hz, nu, axis):
    """nu sweeps of 2-color line relaxation along ``axis`` (0=x,1=y,2=z).

    The y/z variants run the x kernel in a cyclically rotated frame
    (exact: the Yee discretization is symmetric under x→y→z→x with
    simultaneous rotation of field components and model parameters).
    """
    if axis == 0:
        return _gs_line_x(ex, ey, ez, sx, sy, sz, eta_x, eta_y, eta_z,
                          zeta, hx, hy, hz, nu)
    if axis == 1:
        # new-x = old-y: fields (ey,ez,ex), model (eta_y,eta_z,eta_x).
        out = _gs_line_x(
            _rot_fwd(ey), _rot_fwd(ez), _rot_fwd(ex),
            _rot_fwd(sy), _rot_fwd(sz), _rot_fwd(sx),
            _rot_fwd(eta_y), _rot_fwd(eta_z), _rot_fwd(eta_x),
            _rot_fwd(zeta), hy, hz, hx, nu)
        return (_rot_bwd(out[2]), _rot_bwd(out[0]), _rot_bwd(out[1]))
    if axis == 2:
        # new-x = old-z: fields (ez,ex,ey), model (eta_z,eta_x,eta_y).
        out = _gs_line_x(
            _rot_bwd(ez), _rot_bwd(ex), _rot_bwd(ey),
            _rot_bwd(sz), _rot_bwd(sx), _rot_bwd(sy),
            _rot_bwd(eta_z), _rot_bwd(eta_x), _rot_bwd(eta_y),
            _rot_bwd(zeta), hz, hx, hy, nu)
        return (_rot_fwd(out[1]), _rot_fwd(out[2]), _rot_fwd(out[0]))
    raise ValueError(f"axis must be 0, 1, or 2; got {axis}.")
