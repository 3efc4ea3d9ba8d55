"""Fused Pallas line-relaxation smoother (the production default path).

The reference's production configuration runs line relaxation
(/root/reference/emg3d/core.py:477-1316, >90% of runtime there); the
XLA path (:mod:`emg3d_tpu.ops.smoothers`) expresses it as a batched
block-Thomas `lax.scan`, which materializes the factor pytrees and
many residual temporaries in HBM per color update.  This module is the
TPU-hardware path: per 4-color update it runs exactly two fused
kernels —

- **Residual kernel** (x-tiled): the fused curl-curl residual of
  :func:`emg3d_tpu.ops.pallas_gs.slab_residual`, written as a 6-plane
  stack (rx, ry, rz as split re/im) in the padded global-coordinate
  layout.  Each tile blends its owned x-rows into the (aliased)
  output, so the stack stays valid across tiles and colors.

- **Thomas kernel** (y-tiled, full-x): the block-tridiagonal
  substitution along x for ALL lines of the slab, with the active
  color's quarter selected by a transverse parity mask at the update
  (inactive-lane flops are free on the VPU: the 128-lane z dimension
  is processed regardless; see DESIGN.md).  The model-dependent
  elimination is NOT redone here: the per-station LDLᵀ factors of the
  eliminated diagonal blocks C_i and the sparse coupling blocks B_i
  are precomputed once per (level, axis) by :func:`line_factors` and
  *streamed* from HBM with double-buffered chunk DMAs — 46 planes per
  station instead of the 80 of a dense-W formulation, because the
  forward pass stores z_i = C_i^{-1} y_i and applies B sparsely:

      y_i = r_i - B_i z_{i-1}          (B_0 = 0)
      z_i = C_i^{-1} y_i               (LDLᵀ solve, streamed L/d)
      δ_S = z_S;  δ_i = z_i - C_i^{-1} (B_{i+1}ᵀ δ_{i+1})

  The x-scan is sequential but each station step is (TY, Zp)-wide VPU
  work, so the pipeline stays busy; B_{i+1} crosses chunk boundaries
  as a carried value.

y/z-line variants run the x kernel in a cyclically rotated frame
(exact symmetry of the Yee discretization), rotating on the XLA side.

Split re/im (C2) float32 representation only — the TPU production
path.  The XLA path remains for CPU/native-complex and batched runs.

Reference parity: emg3d/core.py:477-753 (gauss_seidel_x/y/z).
"""
import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import cx
from .blocksolve import block_tridiag_factor_entries, ldl_solve_factored
from .coeffs import node_coefficients
from .dsres import _ri
from .pallas_gs import (pack_params, pack_fields, unpack_efield,
                        padded_dims, slab_residual, _r,
                        _compiler_params)

__all__ = ['line_relaxation_pallas', 'line_factors', 'line_params',
           'rotate_arrays', 'supported', 'supported_shape',
           'factors_nbytes', 'line_probe', 'line_tiles', 'line_layout']

# Factor-stack plane order (indices into the NF=46 plane axis; each
# entry is a re/im pair).  L is the strict-lower LDLᵀ factor of the
# eliminated block C_i, d its inverse diagonal, B the sparse
# sub-diagonal coupling blocks of the station system.
_LORD = [(1, 0), (2, 0), (2, 1), (3, 0), (3, 1), (3, 2),
         (4, 0), (4, 1), (4, 2), (4, 3)]
_BORD = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 1), (2, 2), (3, 3), (4, 4)]
_NF = 2 * (len(_LORD) + 5 + len(_BORD))      # 46


def supported(e, shape):
    """Pallas line path: C2 3-D fields + x-axis shape/VMEM feasibility."""
    return (all(isinstance(c, cx.C2) for c in e)
            and e[0].re.ndim == 3
            and supported_shape(shape, 0))


# Live (XL, Yp, Zp) planes per x-row of the residual kernel: 27
# declared scratch + ~17 slab_residual temporaries (measured on v5e:
# a divisor of 28 overflowed a 16 MiB budget by 2 MB at tx=14, 64³).
_RES_PLANES = 44

# Probe verdicts / tile overrides per rotated-frame shape (see
# pallas_gs.point_probe for the pattern).
_LINE_OK = {}
_LINE_TILES = {}


def _vmem_limit():
    from .pallas_gs import VMEM_LIMIT
    return VMEM_LIMIT


# Dedicated scoped-VMEM budget of the Thomas kernel when the shared
# VMEM_LIMIT does not fit its full-x substitution storage.  Justified
# for THIS kernel only: its Mosaic vector stack is small (station
# temporaries are single (ty, tz) tiles; measured at 128³: 58.6 MB
# declared compiled with ~0 MB stack), and a probe kernel with 110 MB
# of declared scratch compiled AND ran under a 118 MB limit on v5e
# (scripts/hw_probe_ztile.py vmem).
THOMAS_VMEM_LIMIT = int(os.environ.get('EMG3D_TPU_THOMAS_VMEM_LIMIT',
                                       112 * 1024 * 1024))


def _thomas_budget():
    return max(THOMAS_VMEM_LIMIT, _vmem_limit())


def supported_shape(shape, axis):
    """Shape-only gate for lines along ``axis`` (rotated-frame dims).

    A hardware probe verdict (:func:`line_probe`) takes precedence;
    otherwise both kernels must fit their scoped-vmem budgets at
    their minimum tile sizes: the residual kernel y-tiles down to
    (XL=4, TYR=16) slabs of ~_RES_PLANES live planes, and the Thomas
    kernel's full-x substitution storage (es/rs/zs + factor chunks)
    z-tiles down to TZ=256 slabs under its dedicated budget.
    Infeasible shapes fall back to the XLA path.
    """
    rs = (shape[axis], shape[(axis + 1) % 3], shape[(axis + 2) % 3])
    if not (rs[0] >= 8 and rs[1] >= 3 and rs[2] >= 3):
        return False
    verdict = _LINE_OK.get(rs)
    if verdict is not None:
        return verdict
    Yp, Zp, NXP = padded_dims(rs)
    res_ok = _res_bytes(2, min(16, Yp), Zp) <= _vmem_limit()
    th_ok = _thomas_bytes(rs[0], NXP, 16, min(4, rs[0]),
                          min(256, Zp)) <= _thomas_budget()
    return res_ok and th_ok


def _thomas_bytes(nx, NXP, ty, chx, Zp):
    """Declared VMEM of the Thomas kernel (es+rs+zs+double fbuf),
    plus headroom for the Mosaic vector stack — small for this kernel
    (station temporaries are single (ty, Zp) tiles; measured at 128³:
    58.6 MB declared compiled under a 64 MB limit).  ``Zp`` is the
    slab z extent — the full padded Zp for one z-tile, TZ when the
    kernel tiles z (256³-class)."""
    declared = ((12 * NXP + 10 * nx) * ty * Zp
                + 2 * chx * _NF * ty * Zp) * 4
    return declared + (8 << 20)


def _res_bytes(tx, tyl, Zp):
    """Declared+stack VMEM of the residual kernel for a (XL, tyl, Zp)
    slab (see _RES_PLANES)."""
    return _RES_PLANES * (tx + 2) * tyl * Zp * 4


def line_tiles(shape):
    """Default (tx, TY, chx) for the rotated-frame ``shape``.

    A probe-installed override wins; otherwise the residual x-tile is
    sized by the _RES_PLANES model under the scoped-vmem budget
    (capped at 16 — flat beyond, like the point kernel), the Thomas
    slab TY takes the largest of 24/16 that fits (measured on v5e at
    64³: TY=16/to=14 ran 3.2 ms vs 4.1 ms at TY=8 for nu=2), and the
    factor chunk drops from 8 to 4 when the 8-chunk double buffer
    would not fit.
    """
    ov = _LINE_TILES.get(tuple(shape))
    if ov is not None:
        return ov
    nx, ny, nz = shape
    Yp, Zp, NXP = padded_dims(shape)
    budget = _vmem_limit()
    xl = budget // (_RES_PLANES * Yp * Zp * 4)
    if xl - 2 >= 4:
        tx = max(2, min(nx, xl - 2, 16))
    else:
        # Full-y slabs infeasible even at XL=6: the residual kernel
        # will y-tile (line_layout sizes TYR); balance the x overlap
        # (2/tx) against the y overlap (8/toyr).
        tx = min(10, max(2, nx))
    chx = min(8, nx)
    TY = 16
    if _thomas_bytes(nx, NXP, 24, chx, Zp) <= budget:
        TY = 24
    elif _thomas_bytes(nx, NXP, 16, chx, Zp) > budget and nx > 4:
        chx = min(4, nx)
    return int(tx), TY, chx


def line_layout(shape, _tx=None, _ty=None, _chx=None, _tz=None,
                _tyr=None):
    """(tx, TY, to, chx, ntx, nyt, min_yp, TZ, toz, ntz, min_zp,
    TYR, toyr, nyr) of the line kernels.

    Deterministic in the rotated-frame ``shape`` (plus explicit
    overrides), so factor/parameter stacks cached by the solver are
    laid out exactly as the kernel expects.  TY is the Thomas slab
    y-extent (multiple of 8, >= 16), ``to = TY - 8`` the owned lines
    per tile, ``min_yp`` the Yp padding that lets the last aligned
    slab [nyt-1·to, +TY) avoid end-clipping.

    256³-class shapes tile further: the Thomas kernel tiles z in
    aligned slabs (TZ multiple of 128, ``toz = TZ - 8`` owned lines;
    ntz = 1 and TZ = the full padded Zp when everything fits — the
    proven ≤128³ configurations are bit-identical to the untiled
    kernel), and the residual kernel tiles y (TYR slab, ``toyr =
    TYR - 8`` owned rows; nyr = 1 = untiled when the full plane
    fits).
    """
    nx, ny, nz = shape
    dtx, dTY, dchx = line_tiles(shape)
    tx = max(1, min(_tx if _tx is not None else dtx, nx))
    TY = _ty if _ty is not None else dTY
    if TY < 16 or TY % 8:
        raise ValueError("Thomas slab extent must be a multiple of 8 "
                         f">= 16; got {TY}.")
    to = TY - 8
    nyt = max(1, -(-(ny - 1) // to))
    min_yp = (nyt - 1) * to + TY
    chx = _chx if _chx is not None else dchx
    ntx = -(-nx // tx)

    budget = _vmem_limit()
    Yp0, Zp0, NXP = padded_dims(shape, min_yp)

    # --- Thomas z-tiling: full Zp when it fits, else aligned z-slabs.
    # Lane-dim (dim 3) HBM slice offsets must be 128-aligned (measured
    # on v5e, scripts/hw_probe_ztile.py: offsets of 8 or 120 crash the
    # Mosaic compiler), so slabs own toz = TZ - 128 lines at offsets
    # zt*toz with toz a multiple of 128; the z-tiled kernel gets the
    # dedicated _thomas_budget() scoped-VMEM limit.
    TZ = _tz if _tz is not None else Zp0
    if (_tz is None
            and _thomas_bytes(nx, NXP, TY, chx, Zp0) > _thomas_budget()):
        zbudget = _thomas_budget()
        TZ = 256
        while (TZ + 128 < Zp0 and
               _thomas_bytes(nx, NXP, TY, chx, TZ + 128) <= zbudget):
            TZ += 128
    if TZ >= Zp0:
        TZ, toz, ntz, min_zp = Zp0, Zp0, 1, 0
    else:
        if TZ % 128 or TZ < 256:
            raise ValueError("Thomas z-slab extent must be a multiple "
                             f"of 128 >= 256; got {TZ}.")
        toz = TZ - 128
        ntz = max(1, -(-(nz - 1) // toz))
        min_zp = (ntz - 1) * toz + TZ

    # --- residual y-tiling: full Yp when it fits, else aligned slabs.
    Zp = padded_dims(shape, min_yp, min_zp)[1]
    TYR = _tyr if _tyr is not None else Yp0
    if _tyr is None and _res_bytes(tx, Yp0, Zp) > budget:
        TYR = max(16, (budget // (_RES_PLANES * (tx + 2) * Zp * 4))
                  // 8 * 8)
    if TYR >= Yp0:
        TYR, toyr, nyr = Yp0, Yp0, 1
    else:
        if TYR < 16 or TYR % 8:
            raise ValueError("Residual y-slab extent must be a "
                             f"multiple of 8 >= 16; got {TYR}.")
        toyr = TYR - 8
        nyr = max(1, -(-ny // toyr))
        min_yp = max(min_yp, (nyr - 1) * toyr + TYR)
    return (tx, TY, to, chx, ntx, nyt, min_yp,
            TZ, toz, ntz, min_zp, TYR, toyr, nyr)


def _line_probe_args(rs, dt):
    """Abstract (e, s, arrays, fstack) for an AOT lowering at the
    rotated-frame shape ``rs``."""
    nx, ny, nz = rs

    def sds(sh):
        return jax.ShapeDtypeStruct(sh, dt)

    def c2(sh):
        return cx.C2(sds(sh), sds(sh))

    edges = ((nx, ny + 1, nz + 1), (nx + 1, ny, nz + 1),
             (nx + 1, ny + 1, nz))
    e = tuple(c2(sh) for sh in edges)
    s = tuple(c2(sh) for sh in edges)
    cells = (nx, ny, nz)
    arrays = (c2(cells), c2(cells), c2(cells), sds(cells),
              sds((nx,)), sds((ny,)), sds((nz,)))
    lay = line_layout(rs)
    Yp, Zp, _ = padded_dims(rs, lay[6], lay[10])
    fstack = sds((nx, _NF, Yp, Zp))
    return e, s, arrays, fstack


def line_probe(shape, axis, dt=jnp.float32, risk_fraction=0.25):
    """Validate (by AOT compile) both line kernels for ``axis``.

    Mirrors pallas_gs.point_probe: verdicts are cached per rotated-
    frame shape, low-risk shapes are trusted, a failing first-choice
    tx walks down and installs an override, and total failure routes
    the shape to the XLA block-Thomas path.
    """
    from .pallas_gs import enabled
    from .pallas_gs import _mosaic_target
    rs = (shape[axis], shape[(axis + 1) % 3], shape[(axis + 2) % 3])
    if rs in _LINE_OK:
        return _LINE_OK[rs]
    if not enabled() or not _mosaic_target():
        # Not a Mosaic target (e.g. force-enabled on CPU to test the
        # dispatch in interpreter mode): nothing to probe-compile.
        _LINE_OK[rs] = True
        return True

    nx, _, _ = rs
    budget = _vmem_limit()
    (tx, TY, to, chx, _, _, min_yp,
     TZ, toz, ntz, min_zp, TYR, toyr, nyr) = line_layout(rs)
    Yp, Zp, NXP = padded_dims(rs, min_yp, min_zp)
    est = max(_res_bytes(tx, TYR, Zp),
              _thomas_bytes(nx, NXP, TY, chx, TZ))
    if est <= risk_fraction * budget:
        _LINE_OK[rs] = True
        return True

    ladder = [tx]
    if tx > 4:
        ladder.append(max(2, tx // 2))
    if tx > 2:
        ladder.append(2)
    for cand in ladder:
        try:
            e, s, arrays, fstack = _line_probe_args(rs, dt)
            _gs_line_x_pallas.lower(
                e, s, arrays, fstack, nu=2, shape=rs,
                _tx=cand).compile()
        except Exception:
            continue
        if cand != tx:
            _LINE_TILES[rs] = (cand, TY, chx)
        _LINE_OK[rs] = True
        return True
    _LINE_OK[rs] = False
    return False


def factors_nbytes(shape, axis, itemsize=4):
    """HBM bytes of the factor stack for lines along ``axis``."""
    rs = (shape[axis], shape[(axis + 1) % 3], shape[(axis + 2) % 3])
    lay = line_layout(rs)
    Yp, Zp, _ = padded_dims(rs, lay[6], lay[10])
    return rs[0] * _NF * Yp * Zp * itemsize


@functools.partial(jax.jit,
                   static_argnames=('shape', 'axis', 'min_yp',
                                    'min_zp', 'fdtype', 'zsplit'))
def line_factors(arrays, shape, axis, min_yp=None, min_zp=None,
                 fdtype=None, zsplit=None):
    """Padded factor stack (S, 46, Yp, Zp) for lines along ``axis``.

    ``fdtype`` selects the STORAGE dtype of the stack (default: the
    model's real dtype).  bfloat16 halves the kernel's dominant
    streaming traffic and the HBM cache footprint; it is numerically
    safe because the factors only multiply the f32 in-kernel residual
    (δ = M̃⁻¹r with exact r → exact fixed point; the smoothing factor
    moves by O(2⁻⁸) only).  The elimination itself always runs at the
    model dtype.

    Model-dependent only: computed once per (level, axis) per solve
    and reused across all colors, sweeps and cycles.  For axis 1/2 the
    stack is built in the rotated frame that
    :func:`line_relaxation_pallas` runs the kernel in.  ``min_yp``/
    ``min_zp`` default to the kernel's own layout padding so the
    cached stack matches the slabs the Thomas kernel will DMA.

    Built on the sparse-ENTRY elimination (blocksolve.block_tridiag_
    factor_entries) — the dense (..., 5, 5) builder peaked at 22 GB of
    HLO temporaries at 256³ and OOMed the chip; the entry stacks come
    back exactly in the kernel's _LORD/dinv order.

    ``zsplit`` builds the stack in that many transverse-z chunks (the
    per-line eliminations are independent): at 256³ the one-shot build
    holds ~3 GB of coefficient/entry temporaries on top of the output
    next to a live Krylov working set — chunking divides the transient
    by the chunk count at identical results.  Defaults to 1 below
    ~2.7M lines per station (nothing changes for the proven ≤128³
    classes), then doubles with the transverse size.
    """
    from .smoothers import _line_entries_x

    arrays = rotate_arrays(tuple(arrays), axis)
    if axis == 1:
        shape = (shape[1], shape[2], shape[0])
    elif axis == 2:
        shape = (shape[2], shape[0], shape[1])

    nx, ny, nz = shape
    if min_yp is None or min_zp is None:
        lay = line_layout(shape)
        min_yp = lay[6] if min_yp is None else min_yp
        min_zp = lay[10] if min_zp is None else min_zp
    Yp, Zp, _ = padded_dims(shape, min_yp, min_zp)
    dt = cx.real_dtype_of(arrays[0]) if fdtype is None else fdtype
    if zsplit is None:
        zsplit = -(-(ny * nz) // (128 * 128))
    zsplit = max(1, min(int(zsplit), nz - 1))

    def chunk_planes(ars):
        """All 46 factor planes for a cell slab (lines = interior)."""
        cc = node_coefficients(*ars)
        Dent, Bent = _line_entries_x(cc, nx)
        L_all, d_all = block_tridiag_factor_entries(5, Dent, Bent)
        planes = []
        for v in L_all:                 # _lower_keys(5) == _LORD order
            re, im = _ri(v)
            planes += [re.astype(dt), im.astype(dt)]
        for v in d_all:
            re, im = _ri(v)
            planes += [re.astype(dt), im.astype(dt)]
        for k in sorted(Bent.keys()):   # == _BORD order
            re, im = _ri(Bent[k])
            planes += [re.astype(dt), im.astype(dt)]
        return jnp.stack(planes, axis=1)    # (nx, 46, ny-1, lines)

    if zsplit <= 1:
        out = chunk_planes(arrays)          # (nx, 46, ny-1, nz-1)
        return jnp.zeros((nx, _NF, Yp, Zp), dt).at[
            :, :, 1:ny, 1:nz].set(out)

    eta_x, eta_y, eta_z, zeta, hx, hy, hz = arrays
    out = jnp.zeros((nx, _NF, Yp, Zp), dt)
    # Global interior lines k in [1, nz) in zsplit chunks.  A line at
    # k owns ez at k-1 and k, whose stencil nodes span z in [k-1, k+1]
    # and therefore cells [k-2, k+1) -> two cells of low halo and one
    # of high halo per chunk (clipped at the domain, where the global
    # build's implicit boundary applies identically).
    bounds = np.linspace(1, nz, zsplit + 1).astype(int)
    for ci in range(zsplit):
        ka, kb = int(bounds[ci]), int(bounds[ci + 1])
        if kb <= ka:
            continue
        za = max(0, ka - 2)
        zb = min(nz, kb + 1)
        zs = slice(za, zb)
        ars = (eta_x[..., zs], eta_y[..., zs], eta_z[..., zs],
               zeta[..., zs], hx, hy, hz[zs])
        # Local line l sits between local cells l-1, l (global za+l):
        # global lines [ka, kb) live at entry indices [ka-za-1, kb-za-1).
        pl_ = chunk_planes(ars)[..., ka - za - 1:kb - za - 1]
        out = out.at[:, :, 1:ny, ka:kb].set(pl_)
    return out


# ----------------------------------------------------------------------
# Kernel 1: residual stack
# ----------------------------------------------------------------------

def _kernel_res(*refs, tx, nx, ny, tyl=None, toy=None):
    """One (x[, y])-tile of the residual stack (rx, ry, rz -> 6 planes).

    Owned output rows [own_lo, own_hi) ⊆ [0, nx) are blended into the
    loaded (aliased) stack; everything else keeps its previous value,
    so rows ≥ nx stay at their initial zeros (the Thomas kernel relies
    on that for the last station's transverse slots).

    ``tyl``/``toy`` activate y-tiling for 256³-class shapes (the full
    (Yp, Zp) plane per x-slab is 2-3× any VMEM budget there): slabs
    at provably-aligned offsets ytile·toy own rows
    [1 + ytile·toy, 1 + (ytile+1)·toy) — except tile 0, which also
    owns row 0 and therefore pre-zeros the slab's LAST row in every
    dn-rolled input (in the untiled layout row 0's down-neighbor is
    the wrap of the zero padding; in a tile it would be a real row).
    The blend writeback keeps other tiles' rows intact exactly like
    the x blend.  ``tyl=None`` keeps the proven untiled behavior.
    """
    e_hbm, s_hbm, p_hbm, ihx_hbm = refs[0], refs[1], refs[2], refs[3]
    ihy_hbm, ihz_r = refs[4], refs[5]
    r_out = refs[7]
    es, ss, ps, ihxs, ihys, rs = (refs[8], refs[9], refs[10], refs[11],
                                  refs[12], refs[13])
    sems = refs[14]

    XL = tx + 2
    NXP = nx + 2
    tile = pl.program_id(0)
    own_lo = tile * tx
    own_hi = jnp.minimum(own_lo + tx, nx)
    x0 = jnp.clip(own_lo - 1, 0, NXP - XL)
    if tyl is None:
        y0 = 0

        def slxy(ref):
            return ref.at[:, pl.ds(x0, XL)]

        def slhy(ref):
            return ref.at[:]
    else:
        ytile = pl.program_id(1)
        y0 = ytile * toy

        def slxy(ref):
            return ref.at[:, pl.ds(x0, XL), pl.ds(y0, tyl)]

        def slhy(ref):
            return ref.at[:, pl.ds(y0, tyl)]

    cps = [
        pltpu.make_async_copy(slxy(e_hbm), es, sems.at[0]),
        pltpu.make_async_copy(slxy(s_hbm), ss, sems.at[1]),
        pltpu.make_async_copy(slxy(p_hbm), ps, sems.at[2]),
        pltpu.make_async_copy(ihx_hbm.at[pl.ds(x0, XL)], ihxs,
                              sems.at[3]),
        pltpu.make_async_copy(slhy(ihy_hbm), ihys, sems.at[4]),
        pltpu.make_async_copy(slxy(r_out), rs, sems.at[5]),
    ]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    if tyl is not None:
        # Tile 0 owns row 0: its down-neighbor must be the zero wrap,
        # so zero the slab's last row in every dn-rolled input.
        @pl.when(ytile == 0)
        def _():
            nrow = es.shape[2]
            row = jax.lax.broadcasted_iota(jnp.int32, es[0].shape, 1)
            keep = row != nrow - 1
            for i in range(es.shape[0]):
                es[i] = jnp.where(keep, es[i], 0.0)
            for i in range(ps.shape[0]):
                ps[i] = jnp.where(keep, ps[i], 0.0)
            hrow = jax.lax.broadcasted_iota(jnp.int32, ihys[0].shape, 0)
            ihys[0] = jnp.where(hrow != nrow - 1, ihys[0], 0.0)

    def E(i):
        return cx.C2(es[i], es[i + 1])

    def _up(v):
        # s/p streams may be stored bfloat16 (see pallas_gs._kernel):
        # upcast at use so the residual algebra stays in the e dtype.
        return v if v.dtype == es.dtype else v.astype(es.dtype)

    def S(i):
        return cx.C2(_up(ss[i]), _up(ss[i + 1]))

    def P(i):
        return cx.C2(_up(ps[i]), _up(ps[i + 1]))

    rx, ry, rz = slab_residual(
        (E(0), E(2), E(4)), (S(0), S(2), S(4)), (P(0), P(2), P(4)),
        (_up(ps[6]), _up(ps[7]), _up(ps[8])),
        (ihxs[:], ihys[:], ihz_r[:]))

    sh = rx.re.shape
    gx = x0 + jax.lax.broadcasted_iota(jnp.int32, sh, 0)
    own = (gx >= own_lo) & (gx < own_hi)
    if tyl is not None:
        gy = y0 + jax.lax.broadcasted_iota(jnp.int32, sh, 1)
        ylo = jnp.where(ytile == 0, 0, 1 + ytile * toy)
        yhi = 1 + (ytile + 1) * toy
        own = own & (gy >= ylo) & (gy < yhi)
    for i, a in ((0, rx), (2, ry), (4, rz)):
        rs[i] = jnp.where(own, a.re, rs[i])
        rs[i + 1] = jnp.where(own, a.im, rs[i + 1])

    out_cp = pltpu.make_async_copy(rs, slxy(r_out), sems.at[0])
    out_cp.start()
    out_cp.wait()


# ----------------------------------------------------------------------
# Kernel 2: block-Thomas substitution + masked color update
# ----------------------------------------------------------------------

def _dn0(a):
    return _r(a, 1, 0)


def _up0(a):
    return _r(a, (a.re if isinstance(a, cx.C2) else a).shape[0] - 1, 0)


def _dn1(a):
    return _r(a, 1, 1)


def _up1(a):
    return _r(a, (a.re if isinstance(a, cx.C2) else a).shape[1] - 1, 1)


def _kernel_thomas(color_ref, *refs, nx, nyz, ty, to, chx, nch,
                   tz=None, toz=None):
    """One (y, z)-tile: full-x substitution per line, masked update.

    refs: HBM inputs [rstack, fstack, estack(aliased)], output estack,
    scratch [es, rs, zs, fbuf, sems, fsems].

    ``to`` (owned lines per tile) is a static multiple of 8 so the
    slab offset tile·to is PROVABLY sublane-aligned, and ``ty`` (the
    slab extent) a static multiple of 8 so the slice length is too:
    at Zp >= 256 Mosaic rejects (compiler-crashes on) dim-2 dynamic
    slices of 4-D HBM arrays with unaligned offset OR length — the
    Zp=128 leniency of round 2 does not carry (measured; see
    scripts/hw_bisect_zp256.py).  The driver pads Yp so the last
    tile's slab fits without clipping.

    ``tz``/``toz`` activate z-tiling for 256³-class shapes (full-Zp
    slabs are 2-3× any VMEM budget there): slabs own toz z-lines at
    lane-dim offsets zt·toz with ``tz − toz`` slack columns, exactly
    mirroring the y scheme.  The cyclic-roll garbage at the slab's
    first z column only feeds line z0 — never owned (lines start at
    z0+1); deposits of owned lines stay inside the slab and the
    whole-slab writeback accumulates across sequential grid steps.
    ``tz=None`` keeps the proven untiled behavior bit-identical.
    """
    ny, nz = nyz
    r_hbm, f_hbm = refs[0], refs[1]
    e_out = refs[3]
    es, rs, zs, fbuf = refs[4], refs[5], refs[6], refs[7]
    sems, fsems = refs[8], refs[9]

    TY = ty
    tile = pl.program_id(0)
    y0 = tile * to
    ly = 1 + y0                             # first owned line
    lhi = jnp.minimum(ly + to, ny)          # one past last owned line
    if tz is None:
        z0 = 0

        def slz(ref, *idx):
            return ref.at[(*idx, pl.ds(y0, TY))]
    else:
        ztile = pl.program_id(1)
        z0 = ztile * toz

        def slz(ref, *idx):
            return ref.at[(*idx, pl.ds(y0, TY), pl.ds(z0, tz))]

    cps = [
        pltpu.make_async_copy(slz(e_out, slice(None), slice(None)),
                              es, sems.at[0]),
        pltpu.make_async_copy(slz(r_hbm, slice(None), slice(None)),
                              rs, sems.at[1]),
    ]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    def get_fdma(slot, c):
        c0 = jnp.clip(c * chx, 0, nx - chx)
        return pltpu.make_async_copy(
            slz(f_hbm, pl.ds(c0, chx), slice(None)),
            fbuf.at[slot], fsems.at[slot])

    def F(slot, li, p):
        # Factor stacks may be stored bfloat16 (half the streaming
        # bytes; numerically safe — the factors only multiply the f32
        # in-kernel residual, so the smoother's fixed point is exact);
        # upcast at use so the station arithmetic stays f32.
        re = fbuf[slot, li, 2 * p]
        im = fbuf[slot, li, 2 * p + 1]
        if re.dtype != es.dtype:
            re, im = re.astype(es.dtype), im.astype(es.dtype)
        return cx.C2(re, im)

    def Ldict(slot, li):
        L = {}
        for n, (i, j) in enumerate(_LORD):
            L[(i, j)] = F(slot, li, n)
        dinv = [F(slot, li, 10 + i) for i in range(5)]
        return L, dinv

    def Bent(slot, li, n):
        return F(slot, li, 15 + n)

    def station_r(i):
        rxs = cx.C2(rs[0, i], rs[1, i])
        rys = cx.C2(rs[2, i + 1], rs[3, i + 1])
        rzs = cx.C2(rs[4, i + 1], rs[5, i + 1])
        return (rxs, _dn0(rys), rys, _dn1(rzs), rzs)

    zeros2 = jnp.zeros((TY, es.shape[3]), es.dtype)

    def c2z():
        return cx.C2(zeros2, zeros2)

    # ---------------- forward: y_i = r_i − B_i z_{i-1}; z_i = C⁻¹y.
    get_fdma(0, 0).start()

    def fwd_chunk(c, zprev):
        @pl.when(c + 1 < nch)
        def _():
            get_fdma((c + 1) % 2, c + 1).start()
        get_fdma(c % 2, c).wait()
        slot = c % 2
        c0 = jnp.clip(c * chx, 0, nx - chx)
        cnt = jnp.minimum(chx, nx - c * chx)

        def fwd_station(k, zp):
            i = c * chx + k
            li = i - c0
            r = station_r(i)
            y = [r[0] - (Bent(slot, li, 0) * zp[1] +
                         Bent(slot, li, 1) * zp[2] +
                         Bent(slot, li, 2) * zp[3] +
                         Bent(slot, li, 3) * zp[4])]
            for m in range(1, 5):
                y.append(r[m] - Bent(slot, li, 3 + m) * zp[m])
            L, dinv = Ldict(slot, li)
            z = ldl_solve_factored(5, L, dinv, y)
            for m in range(5):
                zs[2 * m, i] = z[m].re
                zs[2 * m + 1, i] = z[m].im
            return tuple(z)

        return lax.fori_loop(0, cnt, fwd_station, zprev)

    lax.fori_loop(0, nch, fwd_chunk, tuple(c2z() for _ in range(5)))

    # ---------------- masks (per-tile constants).
    color = color_ref[0]
    cy = color % 2
    cz = color // 2
    gy = y0 + jax.lax.broadcasted_iota(jnp.int32, zeros2.shape, 0)
    gz = z0 + jax.lax.broadcasted_iota(jnp.int32, zeros2.shape, 1)
    lz = 1 + z0                           # first owned z line
    lzhi = nz if tz is None else jnp.minimum(lz + toz, nz)
    # Line (iy, iz) active iff its transverse parity matches the color
    # ((iy-1) % 2 == cy etc. — the XLA path's parity-split convention)
    # and the line is interior and owned by this tile.
    mask = (((gy + 1) % 2 == cy) & ((gz + 1) % 2 == cz) &
            (gy >= ly) & (gy < lhi) & (gz >= lz) & (gz < lzhi))

    # ---------------- backward: δ_i = z_i − C⁻¹(B_{i+1}ᵀ δ_{i+1}),
    # with the e-update applied immediately per station.
    get_fdma((nch - 1) % 2, nch - 1).start()

    def bwd_chunk(cc, carry):
        c = nch - 1 - cc
        @pl.when(c - 1 >= 0)
        def _():
            get_fdma((c - 1) % 2, c - 1).start()
        get_fdma(c % 2, c).wait()
        slot = c % 2
        c0 = jnp.clip(c * chx, 0, nx - chx)
        hi = jnp.minimum(c * chx + chx, nx)
        cnt = hi - c * chx

        def bwd_station(k, carry):
            dprev, Bn = carry
            i = hi - 1 - k
            li = i - c0
            # u = B_{i+1}ᵀ δ_{i+1} (carried; zero at the last
            # station); Bᵀ row 0 is zero ((Bᵀ)_{0k} = B_{k0} = 0).
            u = [c2z(),
                 Bn[0] * dprev[0] + Bn[4] * dprev[1],
                 Bn[1] * dprev[0] + Bn[5] * dprev[2],
                 Bn[2] * dprev[0] + Bn[6] * dprev[3],
                 Bn[3] * dprev[0] + Bn[7] * dprev[4]]
            L, dinv = Ldict(slot, li)
            cu = ldl_solve_factored(5, L, dinv, u)
            z = [cx.C2(zs[2 * m, i], zs[2 * m + 1, i]) for m in range(5)]
            d = [z[m] - cu[m] for m in range(5)]

            dm = [cx.where(mask, v, 0) for v in d]
            es[0, i] = es[0, i] + dm[0].re
            es[1, i] = es[1, i] + dm[0].im
            ey_new = (cx.C2(es[2, i + 1], es[3, i + 1])
                      + _up0(dm[1]) + dm[2])
            es[2, i + 1] = ey_new.re
            es[3, i + 1] = ey_new.im
            ez_new = (cx.C2(es[4, i + 1], es[5, i + 1])
                      + _up1(dm[3]) + dm[4])
            es[4, i + 1] = ez_new.re
            es[5, i + 1] = ez_new.im

            Bnew = tuple(Bent(slot, li, n) for n in range(8))
            return tuple(d), Bnew

        return lax.fori_loop(0, cnt, bwd_station, carry)

    lax.fori_loop(0, nch, bwd_chunk,
                  (tuple(c2z() for _ in range(5)),
                   tuple(c2z() for _ in range(8))))

    out_cp = pltpu.make_async_copy(
        es, slz(e_out, slice(None), slice(None)), sems.at[0])
    out_cp.start()
    out_cp.wait()


# ----------------------------------------------------------------------
# Orchestration
# ----------------------------------------------------------------------

@functools.partial(jax.jit,
                   static_argnames=('nu', 'shape', 'interpret', '_tx',
                                    '_ty', '_chx', '_tz', '_tyr',
                                    '_fdt', '_sp_dt'))
def _gs_line_x_pallas(e, s, arrays, fstack, nu, shape, params=None,
                      interpret=False, _tx=None, _ty=None, _chx=None,
                      _tz=None, _tyr=None, _fdt=None, _sp_dt=None):
    """nu sweeps of 4-color x-line relaxation as fused Pallas steps.

    ``_sp_dt`` stores the s/params streams of the residual kernel in a
    reduced dtype (bfloat16; solver-gated to correction-form rhs —
    see pallas_gs.gauss_seidel_point_pallas).
    """
    nx, ny, nz = shape
    dt = e[0].re.dtype
    spdt = dt if _sp_dt is None else _sp_dt

    # Tile sizes: residual x-slabs like the point kernel (y-tiled too
    # for 256³-class planes); Thomas y-slabs of ``to`` owned lines
    # (multiple of 8 -> provably aligned dim-2 HBM slices; mandatory
    # at Zp >= 256) + 8 halo/slack rows, z-slabs of ``toz`` owned
    # lines (multiple of 128 — the lane-dim offset granularity) when
    # full-Zp slabs exceed even the raised Thomas budget (see
    # _RES_PLANES / _thomas_bytes; a probe-installed override wins).
    (tx, ty, to, chx, ntx, nyt, min_yp,
     TZ, toz, ntz, min_zp, TYR, toyr, nyr) = line_layout(
        shape, _tx=_tx, _ty=_ty, _chx=_chx, _tz=_tz, _tyr=_tyr)
    nch = -(-nx // chx)

    Yp, Zp, NXP = padded_dims(shape, min_yp, min_zp)
    if params is not None and params[0].shape == (9, NXP, Yp, Zp) \
            and params[0].dtype == spdt:
        pstack, ihx_p, ihy_p, ihz_p = params
    else:
        pstack, ihx_p, ihy_p, ihz_p = pack_params(
            tuple(arrays), shape, min_yp=min_yp, min_zp=min_zp,
            pdtype=_sp_dt)
    estack, sstack = pack_fields(e, s, shape, min_yp=min_yp,
                                 min_zp=min_zp, sdtype=_sp_dt)
    if fstack is None or fstack.shape != (nx, _NF, Yp, Zp):
        fstack = line_factors(arrays, shape, 0, min_yp=min_yp,
                              min_zp=min_zp, fdtype=_fdt)
    rstack = jnp.zeros((6, NXP, Yp, Zp), dt)

    seq = []
    for it in range(nu):
        seq.extend(range(4) if it % 2 == 0 else range(3, -1, -1))

    tyl = Yp if nyr == 1 else TYR
    res_call = pl.pallas_call(
        functools.partial(_kernel_res, tx=tx, nx=nx, ny=ny,
                          tyl=None if nyr == 1 else TYR, toy=toyr),
        grid=(ntx,) if nyr == 1 else (ntx, nyr),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5 +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] +
                 [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((6, NXP, Yp, Zp), dt),
        scratch_shapes=[
            pltpu.VMEM((6, tx + 2, tyl, Zp), dt),
            pltpu.VMEM((6, tx + 2, tyl, Zp), spdt),
            pltpu.VMEM((9, tx + 2, tyl, Zp), spdt),
            pltpu.VMEM((tx + 2, 1, Zp), dt),
            pltpu.VMEM((1, tyl, Zp), dt),
            pltpu.VMEM((6, tx + 2, tyl, Zp), dt),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        input_output_aliases={6: 0},
        interpret=interpret,
        compiler_params=_compiler_params(),
    )

    th_bytes = _thomas_bytes(nx, NXP, ty, chx, TZ)
    th_limit = None if th_bytes <= _vmem_limit() else _thomas_budget()
    thomas_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nyt,) if ntz == 1 else (nyt, ntz),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((6, NXP, ty, TZ), dt),
            pltpu.VMEM((6, NXP, ty, TZ), dt),
            pltpu.VMEM((10, nx, ty, TZ), dt),
            pltpu.VMEM((2, chx, _NF, ty, TZ), fstack.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    thomas_call = pl.pallas_call(
        functools.partial(_kernel_thomas, nx=nx, nyz=(ny, nz), ty=ty,
                          to=to, chx=chx, nch=nch,
                          tz=None if ntz == 1 else TZ, toz=toz),
        grid_spec=thomas_grid,
        out_shape=jax.ShapeDtypeStruct((6, NXP, Yp, Zp), dt),
        input_output_aliases={3: 0},
        interpret=interpret,
        compiler_params=_compiler_params(limit=th_limit),
    )

    def body(carry, color):
        estack, rstack = carry
        rstack = res_call(estack, sstack, pstack, ihx_p, ihy_p, ihz_p,
                          rstack)
        estack = thomas_call(color[None], rstack, fstack, estack)
        return (estack, rstack), None

    (estack, _), _ = lax.scan(body, (estack, rstack),
                              jnp.asarray(np.array(seq, np.int32)))
    return unpack_efield(estack, (e[0].shape, e[1].shape, e[2].shape))


def rotate_arrays(arrays, axis):
    """Model parameters in the rotated frame of lines along ``axis``.

    Field-independent: the solver caches this per (level, axis) so
    y/z-line smoothing calls only transpose the (changing) fields.
    """
    from .smoothers import _rot_fwd, _rot_bwd

    eta_x, eta_y, eta_z, zeta, hx, hy, hz = arrays
    if axis == 0:
        return tuple(arrays)
    if axis == 1:
        return (_rot_fwd(eta_y), _rot_fwd(eta_z), _rot_fwd(eta_x),
                _rot_fwd(zeta), hy, hz, hx)
    if axis == 2:
        return (_rot_bwd(eta_z), _rot_bwd(eta_x), _rot_bwd(eta_y),
                _rot_bwd(zeta), hz, hx, hy)
    raise ValueError(f"axis must be 0, 1, or 2; got {axis}.")


#: Module-level jit (one trace cache for all solves/levels; building
#: jits per solve would recompile on the remote backend every time).
rotate_arrays_jit = functools.partial(jax.jit, static_argnames='axis')(
    rotate_arrays)


def line_params(arrays_rot, shape, axis, pdtype=None):
    """Field-independent residual-kernel stacks in ``axis``'s rotated
    frame (cached per (level, axis) by the solver alongside the factor
    stack; ``arrays_rot`` is :func:`rotate_arrays`' result)."""
    rs = (shape[axis], shape[(axis + 1) % 3], shape[(axis + 2) % 3])
    lay = line_layout(rs)
    return pack_params(tuple(arrays_rot), rs,
                       min_yp=lay[6], min_zp=lay[10], pdtype=pdtype)


def line_relaxation_pallas(e, s, arrays, nu, shape, axis, fstack=None,
                           arrays_rot=None, params=None, interpret=None,
                           **tune):
    """nu sweeps of 4-color line relaxation along ``axis`` (0/1/2).

    The y/z variants run the x kernel in a cyclically rotated frame
    (exact Yee symmetry, like :func:`smoothers.line_relaxation`);
    ``fstack`` must then be built by :func:`line_factors` for the SAME
    axis (it is computed in the rotated frame there), ``arrays_rot``
    may supply :func:`rotate_arrays`' result to skip the per-call
    parameter transposes, and ``params`` :func:`line_params`' cached
    stacks.  ``interpret`` defaults to the Pallas interpreter off-TPU
    (CPU test coverage of the solver dispatch) and to hardware
    lowering on TPU.
    """
    from .smoothers import _rot_fwd, _rot_bwd

    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    ar = tuple(arrays_rot) if arrays_rot is not None \
        else rotate_arrays(arrays, axis)

    if axis == 0:
        return _gs_line_x_pallas(tuple(e), tuple(s), ar, fstack, nu,
                                 shape, params=params,
                                 interpret=interpret, **tune)
    if axis == 1:
        ee = (_rot_fwd(e[1]), _rot_fwd(e[2]), _rot_fwd(e[0]))
        ss = (_rot_fwd(s[1]), _rot_fwd(s[2]), _rot_fwd(s[0]))
        out = _gs_line_x_pallas(ee, ss, ar, fstack, nu,
                                (shape[1], shape[2], shape[0]),
                                params=params, interpret=interpret,
                                **tune)
        return (_rot_bwd(out[2]), _rot_bwd(out[0]), _rot_bwd(out[1]))
    if axis == 2:
        ee = (_rot_bwd(e[2]), _rot_bwd(e[0]), _rot_bwd(e[1]))
        ss = (_rot_bwd(s[2]), _rot_bwd(s[0]), _rot_bwd(s[1]))
        out = _gs_line_x_pallas(ee, ss, ar, fstack, nu,
                                (shape[2], shape[0], shape[1]),
                                params=params, interpret=interpret,
                                **tune)
        return (_rot_fwd(out[1]), _rot_fwd(out[2]), _rot_fwd(out[0]))
    raise ValueError(f"axis must be 0, 1, or 2; got {axis}.")
