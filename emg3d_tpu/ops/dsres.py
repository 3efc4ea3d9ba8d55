"""Double-single (two-float) residual evaluation for f32 solves.

Near tol=1e-6 the plain f32 evaluation of r = s − A·e is itself the
accuracy floor: the curl-curl rows sum O(‖s‖)-magnitude terms whose
individual roundings (~2⁻²⁴·‖s‖ each) leave an absolute noise of a few
1e-7·‖s‖ in the computed residual — both the convergence check and the
correction-form multigrid source then bottom out at 1-10× the target
tolerance (measured: 64³ TPU bench plateaus at 1.2-1.8e-6, a 16³
fullspace at 2-4e-6).

This module evaluates the SAME operator (identical f32 coefficient
values: the ζ face-weights and η edge-sums are taken at their plain
f32-computed values, so A here is bit-for-bit the operator the
smoothers relax) in double-single arithmetic:

- every addition is a Knuth two-sum (exact error term, 6 flops),
- every coefficient product is a Dekker two-product (exact via 4097
  splitting, no FMA required — and still exact if XLA contracts the
  error expression into an FMA),
- the solution enters as the (hi, lo) pair carried by
  :func:`solver._ds_accumulate`, so no information is lost upstream.

The result's hi component is then a faithfully-rounded f32 residual:
evaluation noise drops from ~2⁻²⁴·‖s‖ to ~2⁻⁴⁸·‖s‖, far below any
practical tolerance.  Cost is ~15× the plain residual's flops — all
VPU elementwise, used once per two-float cycle (not in smoothing), so
it is invisible next to a cycle.

Everything is elementwise on (hi, lo) channel pairs; complex values
are processed as split re/im channels (works for both the C2 and the
native-complex representation).
"""
import jax.numpy as jnp

from .. import cx
from .stencil import zeta_face_weights, eta_edge_sums

__all__ = ['residual_ds']


# ----------------------------------------------------------------------
# Error-free transformations (elementwise, f32)
# ----------------------------------------------------------------------

def _two_sum(a, b):
    s = a + b
    bp = s - a
    return s, (a - (s - bp)) + (b - bp)


def _split(a):
    # Dekker/Veltkamp split for binary32 (p=24): factor 2^12 + 1.
    c = a * 4097.0
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    return p, ((ah * bh - p) + ah * bl + al * bh) + al * bl


# ----------------------------------------------------------------------
# Double-single pairs: x = (hi, lo) arrays
# ----------------------------------------------------------------------

def _dadd(x, y):
    s, e = _two_sum(x[0], y[0])
    e = e + (x[1] + y[1])
    return _two_sum(s, e)


def _dneg(x):
    return (-x[0], -x[1])


def _dsub(x, y):
    return _dadd(x, _dneg(y))


def _dscale(x, c):
    """x · c with plain (exact-by-definition) f32 coefficient c."""
    p, e = _two_prod(x[0], c)
    return _two_sum(p, e + x[1] * c)


def _dpow2(x, c):
    """x · c for an exact power of two (0.5, 0.25): exact channelwise."""
    return (x[0] * c, x[1] * c)


def _dslice(x, idx):
    return (x[0][idx], x[1][idx])


def _ddiff(x, axis):
    sl_hi = [slice(None)] * x[0].ndim
    sl_lo = [slice(None)] * x[0].ndim
    sl_hi[axis] = slice(1, None)
    sl_lo[axis] = slice(None, -1)
    return _dsub(_dslice(x, tuple(sl_hi)), _dslice(x, tuple(sl_lo)))


# Complex DS value: c = (re_pair, im_pair)

def _cadd(a, b):
    return (_dadd(a[0], b[0]), _dadd(a[1], b[1]))


def _csub(a, b):
    return (_dsub(a[0], b[0]), _dsub(a[1], b[1]))


def _cscale(a, c):
    return (_dscale(a[0], c), _dscale(a[1], c))


def _cpow2(a, c):
    return (_dpow2(a[0], c), _dpow2(a[1], c))


def _cmul_plain(a, wre, wim):
    """Complex DS × plain complex (wre, wim)."""
    re = _dsub(_dscale(a[0], wre), _dscale(a[1], wim))
    im = _dadd(_dscale(a[0], wim), _dscale(a[1], wre))
    return (re, im)


def _cdiff(a, axis):
    return (_ddiff(a[0], axis), _ddiff(a[1], axis))


def _cslice(a, idx):
    return (_dslice(a[0], idx), _dslice(a[1], idx))


def _ri(v):
    if isinstance(v, cx.C2):
        return v.re, v.im
    return jnp.real(v), jnp.imag(v)


def _cds(hi, lo):
    """Complex DS from (hi, lo) field components (C2 or complex)."""
    hr, hi_ = _ri(hi)
    if lo is None:
        z = jnp.zeros_like(hr)
        return ((hr, z), (hi_, z))
    lr, li = _ri(lo)
    return ((hr, lr), (hi_, li))


def _collapse(c, proto):
    """DS result -> the representation of ``proto`` (hi + lo folded).

    The explicit cast pins the result to the storage dtype: on x64
    test configs weak-typed f64 intermediates would otherwise reach
    the f32 scatter below (a JAX FutureWarning, soon an error).
    """
    re = c[0][0] + c[0][1]
    im = c[1][0] + c[1][1]
    if isinstance(proto, cx.C2):
        dt = proto.re.dtype
        return cx.C2(re.astype(dt), im.astype(dt))
    return (re + 1j * im).astype(proto.dtype)


def residual_ds(ehi, elo, s, arrays):
    """r = s − A·(ehi + elo), evaluated in double-single f32.

    ehi/elo : field component tuples (elo may be None).
    Returns components in the representation of ``s`` with the
    faithfully-rounded value (hi + lo folded per channel).
    Mirrors :func:`stencil.amat` (reference core.py:29-177) with the
    identical f32 coefficient values.
    """
    eta_x, eta_y, eta_z, zeta, hx, hy, hz = arrays
    s = tuple(c if isinstance(c, cx.C2) else jnp.asarray(c) for c in s)
    dt = cx.real_dtype_of(s[0])
    ihx = (1.0 / hx.astype(dt))[:, None, None]
    ihy = (1.0 / hy.astype(dt))[None, :, None]
    ihz = (1.0 / hz.astype(dt))[None, None, :]

    # The operator's coefficient values: plain f32, identical to the
    # smoother/stencil path.
    zt = zeta.astype(dt) if zeta.dtype != dt else zeta
    wx, wy, wz = zeta_face_weights(zt)
    stx, sty, stz = eta_edge_sums(eta_x, eta_y, eta_z)
    stxr, stxi = _ri(stx)
    styr, styi = _ri(sty)
    stzr, stzi = _ri(stz)

    ex = _cds(ehi[0], None if elo is None else elo[0])
    ey = _cds(ehi[1], None if elo is None else elo[1])
    ez = _cds(ehi[2], None if elo is None else elo[2])

    # First curl on faces, ζ-weighted (u = (ζl + ζr)·(∇×e)).
    v1 = _csub(_cscale(_cdiff(ez, 1), ihy), _cscale(_cdiff(ey, 2), ihz))
    v2 = _csub(_cscale(_cdiff(ex, 2), ihz), _cscale(_cdiff(ez, 0), ihx))
    v3 = _csub(_cscale(_cdiff(ey, 0), ihx), _cscale(_cdiff(ex, 1), ihy))
    u1 = _cscale(v1, wx)
    u2 = _cscale(v2, wy)
    u3 = _cscale(v3, wz)

    # Second curl at interior edges + η term (amat_interior layout).
    i3 = (slice(None), slice(None), slice(1, -1))
    i2 = (slice(None), slice(1, -1), slice(None))
    i1 = (slice(1, -1), slice(None), slice(None))

    rrx = _csub(_cdiff(_cscale(_cslice(u3, i3), ihy[:, :, :1]), 1),
                _cdiff(_cscale(_cslice(u2, i2), ihz[:, :1, :]), 2))
    rry = _csub(_cdiff(_cscale(_cslice(u1, i1), ihz[:1, :, :]), 2),
                _cdiff(_cscale(_cslice(u3, i3), ihx[:, :, :1]), 0))
    rrz = _csub(_cdiff(_cscale(_cslice(u2, i2), ihx[:, :1, :]), 0),
                _cdiff(_cscale(_cslice(u1, i1), ihy[:1, :, :]), 1))

    ax = _csub(_cpow2(rrx, 0.5),
               _cpow2(_cmul_plain(_cslice(ex, (slice(None),
                                               slice(1, -1),
                                               slice(1, -1))),
                                  stxr, stxi), 0.25))
    ay = _csub(_cpow2(rry, 0.5),
               _cpow2(_cmul_plain(_cslice(ey, (slice(1, -1),
                                               slice(None),
                                               slice(1, -1))),
                                  styr, styi), 0.25))
    az = _csub(_cpow2(rrz, 0.5),
               _cpow2(_cmul_plain(_cslice(ez, (slice(1, -1),
                                               slice(1, -1),
                                               slice(None))),
                                  stzr, stzi), 0.25))

    # r = s − A e at interior rows; PEC rows keep r = s (amat's rows
    # are zero there), matching the plain path exactly.
    sx = _cds(s[0], None)
    sy = _cds(s[1], None)
    sz = _cds(s[2], None)
    ix = (slice(None), slice(1, -1), slice(1, -1))
    iy = (slice(1, -1), slice(None), slice(1, -1))
    iz = (slice(1, -1), slice(1, -1), slice(None))
    rx = _csub(_cslice(sx, ix), ax)
    ry = _csub(_cslice(sy, iy), ay)
    rz = _csub(_cslice(sz, iz), az)

    return (s[0].at[ix].set(_collapse(rx, s[0])),
            s[1].at[iy].set(_collapse(ry, s[1])),
            s[2].at[iz].set(_collapse(rz, s[2])))
