"""The matrix-free curl-curl + iωμσ̃ operator (vectorized XLA stencil).

This is the TPU-native equivalent of the reference's scalar-loop kernel
``amat_x`` (/root/reference/emg3d/core.py:29-177): the operator

    A e = V (iωμ0 σ̃ e − ∇ × μr⁻¹ ∇ × e)          [Muld06 Eq. 2]

evaluated matrix-free on the staggered Yee grid, with PEC rows zeroed.
Instead of a triple loop it is expressed as whole-array first-curl
(faces), ζ face-weighting, second-curl (edges) and η edge-averaging —
a handful of fused elementwise ops that XLA maps straight onto the VPU
with no gathers.

Array layout (C-order, indexed [ix, iy, iz]):
  ex (nx, ny+1, nz+1), ey (nx+1, ny, nz+1), ez (nx+1, ny+1, nz)
  eta_x/eta_y/eta_z/zeta (nx, ny, nz);  hx (nx,), hy (ny,), hz (nz,)
"""
from functools import partial

import jax
import jax.numpy as jnp

from .. import cx

__all__ = ['curl_factors', 'amat', 'residual_parts', 'pec_mask_apply',
           'apply_pec', 'zeta_face_weights', 'eta_edge_sums']


def _adjpair(a, axis):
    """Adjacent-pair sum along ``axis`` (length n -> n-1)."""
    lo = [slice(None)] * a.ndim
    hi = [slice(None)] * a.ndim
    lo[axis] = slice(None, -1)
    hi[axis] = slice(1, None)
    return a[tuple(lo)] + a[tuple(hi)]


def _edgepad_pair(a, axis):
    """Edge-replicate-pad by one on both ends, then adjacent-pair sum.

    Result has length n+1 along ``axis``: entry i = a[clip(i-1)] +
    a[clip(i)], matching the reference's clamped ixm/iym/izm indexing.
    (Concatenation instead of mode='edge' pad: Mosaic-lowerable.)
    """
    lo = [slice(None)] * a.ndim
    hi = [slice(None)] * a.ndim
    lo[axis] = slice(0, 1)
    hi[axis] = slice(-1, None)
    p = jnp.concatenate([a[tuple(lo)], a, a[tuple(hi)]], axis=axis)
    return _adjpair(p, axis)


def zeta_face_weights(zeta):
    """ζ-sums of the two cells adjacent to each face, per direction.

    Returns (wx, wy, wz):
      wx (nx+1, ny, nz) : weights on x-faces (for the curl x-component)
      wy (nx, ny+1, nz) : weights on y-faces
      wz (nx, ny, nz+1) : weights on z-faces
    Boundary faces use the clamped (doubled) single-cell value.
    """
    return (_edgepad_pair(zeta, 0), _edgepad_pair(zeta, 1),
            _edgepad_pair(zeta, 2))


def eta_edge_sums(eta_x, eta_y, eta_z):
    """4-cell η sums at interior edges (NOT divided by 4).

    Returns (stx, sty, stz):
      stx (nx, ny-1, nz-1) for x-edges at interior (iy, iz),
      sty (nx-1, ny, nz-1), stz (nx-1, ny-1, nz).
    """
    stx = _adjpair(_adjpair(eta_x, 1), 2)
    sty = _adjpair(_adjpair(eta_y, 0), 2)
    stz = _adjpair(_adjpair(eta_z, 0), 1)
    return stx, sty, stz


def curl_factors(ex, ey, ez, zeta, hx, hy, hz):
    """ζ-weighted curl on cell faces: u = (ζ_left + ζ_right) · (∇×E).

    Returns (u1, u2, u3) with shapes
      u1 (nx+1, ny, nz), u2 (nx, ny+1, nz), u3 (nx, ny, nz+1).

    (The conventional factor ½ of the ζ-average is applied later, in
    :func:`amat`, as in the reference.)
    """
    ihx = (1.0 / hx)[:, None, None]
    ihy = (1.0 / hy)[None, :, None]
    ihz = (1.0 / hz)[None, None, :]

    v1 = cx.diff(ez, axis=1) * ihy - cx.diff(ey, axis=2) * ihz
    v2 = cx.diff(ex, axis=2) * ihz - cx.diff(ez, axis=0) * ihx
    v3 = cx.diff(ey, axis=0) * ihx - cx.diff(ex, axis=1) * ihy

    wx, wy, wz = zeta_face_weights(zeta)
    return v1 * wx, v2 * wy, v3 * wz


def _zero_pad_interior(a, pads):
    """Pad with zeros so interior-only arrays regain full edge shape."""
    return cx.pad(a, pads)


def amat_interior(ex, ey, ez, eta_x, eta_y, eta_z, zeta, hx, hy, hz):
    """Interior (non-PEC) rows of A e, unpadded.

    Shapes: ax (nx, ny-1, nz-1), ay (nx-1, ny, nz-1),
    az (nx-1, ny-1, nz).
    """
    ihx = (1.0 / hx)[:, None, None]
    ihy = (1.0 / hy)[None, :, None]
    ihz = (1.0 / hz)[None, None, :]

    u1, u2, u3 = curl_factors(ex, ey, ez, zeta, hx, hy, hz)

    # Second curl, interior edges only.
    # rrx at x-edges (ix 0..nx-1, iy 1..ny-1, iz 1..nz-1):
    rrx = (cx.diff(u3[:, :, 1:-1] * ihy[:, :, :1], axis=1)
           - cx.diff(u2[:, 1:-1, :] * ihz[:, :1, :], axis=2))
    # rry at y-edges (ix 1..nx-1, iy 0..ny-1, iz 1..nz-1):
    rry = (cx.diff(u1[1:-1, :, :] * ihz[:1, :, :], axis=2)
           - cx.diff(u3[:, :, 1:-1] * ihx[:, :, :1], axis=0))
    # rrz at z-edges (ix 1..nx-1, iy 1..ny-1, iz 0..nz-1):
    rrz = (cx.diff(u2[:, 1:-1, :] * ihx[:, :1, :], axis=0)
           - cx.diff(u1[1:-1, :, :] * ihy[:1, :, :], axis=1))

    # η-terms (4-cell averages; /4 folded into the 0.25 factor).
    stx, sty, stz = eta_edge_sums(eta_x, eta_y, eta_z)

    ax = 0.5 * rrx - 0.25 * stx * ex[:, 1:-1, 1:-1]
    ay = 0.5 * rry - 0.25 * sty * ey[1:-1, :, 1:-1]
    az = 0.5 * rrz - 0.25 * stz * ez[1:-1, 1:-1, :]
    return ax, ay, az


def residual_interior(sx, sy, sz, ex, ey, ez, eta_x, eta_y, eta_z,
                      zeta, hx, hy, hz):
    """Interior rows of the residual r = s − A e, unpadded."""
    ax, ay, az = amat_interior(ex, ey, ez, eta_x, eta_y, eta_z, zeta,
                               hx, hy, hz)
    return (sx[:, 1:-1, 1:-1] - ax, sy[1:-1, :, 1:-1] - ay,
            sz[1:-1, 1:-1, :] - az)


@partial(jax.jit, donate_argnums=())
def amat(ex, ey, ez, eta_x, eta_y, eta_z, zeta, hx, hy, hz):
    """Apply the operator: returns (A e)_x, (A e)_y, (A e)_z.

    PEC rows (tangential boundary edges) are zero.  Matches the
    reference's ``core.amat_x`` with r=0 input up to sign:
    amat_x computes r -= A e, this returns A e.
    """
    ax, ay, az = amat_interior(ex, ey, ez, eta_x, eta_y, eta_z, zeta,
                               hx, hy, hz)
    # Re-pad PEC boundary rows with zeros.
    ax = _zero_pad_interior(ax, ((0, 0), (1, 1), (1, 1)))
    ay = _zero_pad_interior(ay, ((1, 1), (0, 0), (1, 1)))
    az = _zero_pad_interior(az, ((1, 1), (1, 1), (0, 0)))
    return ax, ay, az


def residual_parts(sx, sy, sz, ex, ey, ez, eta_x, eta_y, eta_z, zeta,
                   hx, hy, hz):
    """Residual r = s − A e (component arrays)."""
    ax, ay, az = amat(ex, ey, ez, eta_x, eta_y, eta_z, zeta, hx, hy, hz)
    return sx - ax, sy - ay, sz - az


def pec_mask_apply(fx, fy, fz):
    """Zero tangential boundary edges (PEC) on raw component arrays."""
    zx = jnp.zeros_like
    fx = fx.at[:, 0, :].set(0.).at[:, -1, :].set(0.) \
           .at[:, :, 0].set(0.).at[:, :, -1].set(0.)
    fy = fy.at[0, :, :].set(0.).at[-1, :, :].set(0.) \
           .at[:, :, 0].set(0.).at[:, :, -1].set(0.)
    fz = fz.at[0, :, :].set(0.).at[-1, :, :].set(0.) \
           .at[:, 0, :].set(0.).at[:, -1, :].set(0.)
    del zx
    return fx, fy, fz


def apply_pec(field):
    """Field-level PEC: returns a new Field with boundaries zeroed."""
    import numpy as np
    from ..fields import Field
    if isinstance(field.fx, jax.Array):
        fx, fy, fz = pec_mask_apply(field.fx, field.fy, field.fz)
    else:
        fx = np.array(field.fx)
        fy = np.array(field.fy)
        fz = np.array(field.fz)
        fx[:, 0, :] = 0
        fx[:, -1, :] = 0
        fx[:, :, 0] = 0
        fx[:, :, -1] = 0
        fy[0, :, :] = 0
        fy[-1, :, :] = 0
        fy[:, :, 0] = 0
        fy[:, :, -1] = 0
        fz[0, :, :] = 0
        fz[-1, :, :] = 0
        fz[:, 0, :] = 0
        fz[:, -1, :] = 0
    out = type(field).__new__(type(field))
    Field.__init__(out, fx, fy, fz, frequency=field._frequency)
    return out
