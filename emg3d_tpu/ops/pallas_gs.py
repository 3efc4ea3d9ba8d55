"""Fused Pallas point-smoother kernel (the hot loop at speed-of-light).

The XLA path of :func:`emg3d_tpu.ops.smoothers.gauss_seidel_point`
materializes dozens of HBM temporaries per color update (residual,
coefficients, factor entries, deltas).  This kernel fuses the ENTIRE
color update — residual stencil, coefficient assembly, 6×6 LDLᵀ solve
and the masked scatter — into one pass over x-slabs held in VMEM:
per color update each array is read once and the field written once.

Design:

- grid = (n_color_steps, n_tiles): TPU grids iterate sequentially, so
  color updates serialize (Gauss-Seidel order) while everything inside
  a (color, tile) step is fused.  The color sequence (with per-sweep
  order reversal) is scalar-prefetched.
- Tiles are x-slabs of interior nodes with one-node halos; all arrays
  live in HBM (`pl.ANY`) and slabs are DMA'd manually (dynamic
  offsets), since halo-overlapping reads don't fit BlockSpec blocks.
  Same-color node blocks are provably non-interacting (distance-2
  parity), so the slab-sequential writes are race-free.
- The electric field is aliased in/out (``input_output_aliases``):
  updates happen in HBM across grid steps.
- The numerics REUSE the validated jnp implementations
  (stencil.residual_parts, coeffs.node_coefficients,
  blocksolve.ldl_solve_sparse) on slab values — bit-identical math to
  the XLA path, minus the HBM round trips.

Split re/im (C2) float32 representation only — the TPU production
path.  The XLA path remains for CPU/native-complex runs.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import cx
from . import stencil
from .blocksolve import ldl_solve_sparse
from .coeffs import node_coefficients, node_block_entries

__all__ = ['gauss_seidel_point_pallas', 'supported']


def supported(e):
    """Pallas path requires the split-pair representation."""
    return all(isinstance(c, cx.C2) for c in e)


def _kernel(colors_ref, *refs, tx, nx, nsh):
    """One (color-step, tile) unit of the fused smoother.

    refs layout: 19 HBM inputs [exr, exi, eyr, eyi, ezr, ezi,
    sxr, ..., szi, etxr, etxi, etyr, etyi, etzr, etzi, zeta],
    3 VMEM width inputs [hx3, hy3, hz3], 6 HBM outputs (aliased e),
    19 VMEM scratch slabs, 1 DMA semaphore array.
    """
    ny, nz = nsh
    n_in = 19
    hbm = refs[:n_in]
    hx3, hy3, hz3 = refs[n_in:n_in + 3]
    outs = refs[n_in + 3:n_in + 9]
    scratch = refs[n_in + 9:n_in + 9 + n_in]
    sems = refs[-1]

    step = pl.program_id(0)
    tile = pl.program_id(1)

    # Tile bounds: interior nodes [1, nx-1); static slab of tx nodes.
    n0 = jnp.minimum(1 + tile * tx, jnp.maximum(nx - 1 - tx, 1))
    x0 = n0 - 1                      # first slab cell

    # --- DMA all slabs in. Slab x-extents (static):
    #   cell-indexed arrays (ex, eta, zeta): tx + 2 cells from x0
    #   node-indexed arrays (ey, ez, s_y, s_z): tx + 3 nodes from x0
    # ex/sx are cell-indexed in x; ey/ez/sy/sz node-indexed.
    cell_len = tx + 2
    node_len = tx + 3
    is_cell = [True, True, False, False, False, False,   # e
               True, True, False, False, False, False,   # s
               True, True, True, True, True, True, True]  # eta, zeta

    # The electric field is read from the OUTPUT refs (they alias the
    # inputs): grid steps must see the previous steps' writes.
    def src_ref(i):
        return outs[i] if i < 6 else hbm[i]

    for i in range(n_in):
        ln = cell_len if is_cell[i] else node_len
        cp = pltpu.make_async_copy(
            src_ref(i).at[pl.ds(x0, ln)], scratch[i].at[pl.ds(0, ln)],
            sems.at[i])
        cp.start()
    for i in range(n_in):
        ln = cell_len if is_cell[i] else node_len
        pltpu.make_async_copy(
            src_ref(i).at[pl.ds(x0, ln)], scratch[i].at[pl.ds(0, ln)],
            sems.at[i]).wait()

    # --- Load slab values.
    def C(i, ln):
        return cx.C2(scratch[i][pl.ds(0, ln)],
                     scratch[i + 1][pl.ds(0, ln)])

    ex = C(0, cell_len)
    ey = C(2, node_len)
    ez = C(4, node_len)
    sx = C(6, cell_len)
    sy = C(8, node_len)
    sz = C(10, node_len)
    etx = C(12, cell_len)
    ety = C(14, cell_len)
    etz = C(16, cell_len)
    zeta = scratch[18][pl.ds(0, cell_len)]

    hx = hx3[pl.ds(x0, cell_len), 0]
    hy = hy3[:, 0]
    hz = hz3[:, 0]

    par = (etx, ety, etz, zeta, hx, hy, hz)

    # --- Residual on the slab, interior rows only (no PEC pads —
    # Mosaic-friendly; slab-local PEC rows are unused anyway).
    rxi, ryi, rzi = stencil.residual_interior(sx, sy, sz, ex, ey, ez,
                                              *par)

    # --- Node blocks + solve (slab interior nodes, tx+1 of them).
    c = node_coefficients(*par)
    entries = node_block_entries(c)
    rb = [rxi[:-1], rxi[1:],
          ryi[:, :-1, :], ryi[:, 1:, :],
          rzi[:, :, :-1], rzi[:, :, 1:]]
    delta = ldl_solve_sparse(6, entries, rb)

    # --- Mask: color parity AND tile ownership AND global interior.
    color = colors_ref[step]
    px_ = color % 2
    py_ = (color // 2) % 2
    pz_ = color // 4
    gx = n0 + jax.lax.broadcasted_iota(
        jnp.int32, (tx + 1, ny - 1, nz - 1), 0)
    jj = jax.lax.broadcasted_iota(
        jnp.int32, (tx + 1, ny - 1, nz - 1), 1) + 1
    kk = jax.lax.broadcasted_iota(
        jnp.int32, (tx + 1, ny - 1, nz - 1), 2) + 1
    own_lo = 1 + tile * tx
    own_hi = jnp.minimum(own_lo + tx, nx - 1)
    mask = ((gx % 2 == px_) & (jj % 2 == py_) & (kk % 2 == pz_) &
            (gx >= own_lo) & (gx < own_hi))
    dm = [cx.where(mask, d, 0) for d in delta]

    # --- Scatter-add via two sequential sliced ref-region updates per
    # component (each edge belongs to two node roles; the regions
    # overlap, so the second update re-reads the stored first).
    # Mosaic supports sliced loads/stores; pads/concats of offset
    # vectors it does not.
    def region_add(r_re, r_im, idx, val):
        cur = cx.C2(r_re[idx], r_im[idx]) + val
        r_re[idx] = cur.re
        r_im[idx] = cur.im

    ix0 = (slice(0, cell_len - 1), slice(1, ny), slice(1, nz))
    ix1 = (slice(1, cell_len), slice(1, ny), slice(1, nz))
    region_add(scratch[0], scratch[1], ix0, dm[0])
    region_add(scratch[0], scratch[1], ix1, dm[1])

    iy0 = (slice(1, node_len - 1), slice(0, ny - 1), slice(1, nz))
    iy1 = (slice(1, node_len - 1), slice(1, ny), slice(1, nz))
    region_add(scratch[2], scratch[3], iy0, dm[2])
    region_add(scratch[2], scratch[3], iy1, dm[3])

    iz0 = (slice(1, node_len - 1), slice(1, ny), slice(0, nz - 1))
    iz1 = (slice(1, node_len - 1), slice(1, ny), slice(1, nz))
    region_add(scratch[4], scratch[5], iz0, dm[4])
    region_add(scratch[4], scratch[5], iz1, dm[5])

    # Owned writes: ex cells [own_lo-1, own_hi), ey/ez nodes
    # [own_lo, own_hi).  Static DMA lengths with starts clamped into
    # bounds: the extra overlap positions carry unmodified values read
    # after the previous tile's writeback (masked delta), so
    # re-writing them is a no-op.
    off_cell = jnp.clip(own_lo - 1, 0, nx - (tx + 1))
    off_node = jnp.clip(own_lo, 1, (nx + 1) - tx - 1)
    loc_cell = off_cell - x0
    loc_node = off_node - x0
    plan = [(off_cell, loc_cell, tx + 1),
            (off_node, loc_node, tx),
            (off_node, loc_node, tx)]
    for i, (off_dev, off_loc, ln) in enumerate(plan):
        for ri in (2 * i, 2 * i + 1):
            pltpu.make_async_copy(
                scratch[ri].at[pl.ds(off_loc, ln)],
                outs[ri].at[pl.ds(off_dev, ln)],
                sems.at[ri]).start()
    for i, (off_dev, off_loc, ln) in enumerate(plan):
        for ri in (2 * i, 2 * i + 1):
            pltpu.make_async_copy(
                scratch[ri].at[pl.ds(off_loc, ln)],
                outs[ri].at[pl.ds(off_dev, ln)],
                sems.at[ri]).wait()


@functools.partial(jax.jit,
                   static_argnames=('nu', 'shape', 'interpret', '_seq',
                                    '_tx'))
def gauss_seidel_point_pallas(e, s, arrays, nu, shape,
                              interpret=False, _seq=None, _tx=None):
    """nu sweeps of 8-color node-block GS as one fused Pallas call.

    e, s : tuples of cx.C2 field components (split re/im, float32).
    arrays : (eta_x, eta_y, eta_z, zeta, hx, hy, hz) — eta as C2.
    shape : static cell shape (nx, ny, nz).
    """
    nx, ny, nz = shape
    eta_x, eta_y, eta_z, zeta, hx, hy, hz = arrays

    # Color sequence with per-sweep order reversal.
    if _seq is not None:
        seq = list(_seq)
    else:
        seq = []
        for it in range(nu):
            cols = (list(range(8)) if it % 2 == 0
                    else list(range(7, -1, -1)))
            seq.extend(cols)
    colors = jnp.asarray(np.array(seq, dtype=np.int32))

    # Tile size: keep the slab working set under a VMEM budget.
    plane = (ny + 1) * (nz + 1) * 4  # bytes per x-slice (f32)
    budget = 8 * 1024 * 1024         # half of VMEM for slabs
    tx = max(2, min(nx - 2, budget // (26 * plane) - 3))
    if _tx is not None:
        tx = _tx
    n_tiles = -(-(nx - 2) // tx)

    ins = [e[0].re, e[0].im, e[1].re, e[1].im, e[2].re, e[2].im,
           s[0].re, s[0].im, s[1].re, s[1].im, s[2].re, s[2].im,
           eta_x.re, eta_x.im, eta_y.re, eta_y.im, eta_z.re, eta_z.im,
           zeta]
    hx3 = hx.reshape(-1, 1)
    hy3 = hy.reshape(-1, 1)
    hz3 = hz.reshape(-1, 1)

    cell_len = tx + 2
    node_len = tx + 3
    scratch_shapes = []
    for i in range(19):
        is_cell = i in (0, 1, 6, 7, 12, 13, 14, 15, 16, 17, 18)
        xlen = cell_len if is_cell else node_len
        ysz = ins[i].shape[1]
        zsz = ins[i].shape[2]
        scratch_shapes.append(pltpu.VMEM((xlen, ysz, zsz),
                                         jnp.float32))
    scratch_shapes.append(pltpu.SemaphoreType.DMA((19,)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(len(seq), n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 19 +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 6,
        scratch_shapes=scratch_shapes,
    )

    kernel = functools.partial(_kernel, tx=tx, nx=nx, nsh=(ny, nz))

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(ins[i].shape, jnp.float32)
                   for i in range(6)],
        input_output_aliases={i + 1: i for i in range(6)},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(colors, *ins, hx3, hy3, hz3)

    return (cx.C2(out[0], out[1]), cx.C2(out[2], out[3]),
            cx.C2(out[4], out[5]))
