"""Split real/imaginary complex arithmetic for TPU.

TPUs have no native complex types (this backend rejects complex64
outright), so the TPU execution path stores every complex field as a
:class:`C2` pair of real arrays.  ``C2`` is a registered pytree with
full operator overloading — the solver kernels are written once against
ordinary ``+ - * /`` expressions plus the ``cx.*`` free functions below,
and run unchanged in either representation:

- CPU validation path: native jnp complex64/128 arrays (x64-exact
  parity with the reference).
- TPU production path: C2 pairs of float32 arrays; complex multiplies
  become fused real FMAs on the VPU.

Only genuinely complex-touching call sites use ``cx.*``; purely real
arrays (ζ, widths, weights) stay plain jnp throughout.
"""
import jax
import jax.numpy as jnp

__all__ = ['C2', 'is_c2', 'aspair', 'tocomplex', 'diff', 'pad', 'where',
           'stack', 'concatenate', 'zeros', 'zeros_like', 'transpose',
           'swapaxes', 'repeat', 'broadcast_to', 'matmul_nt', 'matvec',
           'abs2', 'real_dtype_of']


@jax.tree_util.register_pytree_node_class
class C2:
    """A complex array as a (re, im) pair of real arrays."""

    __slots__ = ('re', 'im')

    # Make numpy defer to C2's reflected operators instead of building
    # object arrays.
    __array_ufunc__ = None
    __array_priority__ = 1000

    def __init__(self, re, im):
        self.re = re
        self.im = im

    def tree_flatten(self):
        return (self.re, self.im), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- array-like metadata --------------------------------------------

    @property
    def shape(self):
        return self.re.shape

    @property
    def ndim(self):
        return self.re.ndim

    @property
    def dtype(self):
        return self.re.dtype   # the real storage dtype

    # -- indexing -------------------------------------------------------

    def __getitem__(self, idx):
        return C2(self.re[idx], self.im[idx])

    @property
    def at(self):
        return _C2At(self)

    def reshape(self, *shape):
        return C2(self.re.reshape(*shape), self.im.reshape(*shape))

    def astype(self, dtype):
        return C2(self.re.astype(dtype), self.im.astype(dtype))

    # -- arithmetic -----------------------------------------------------
    # Complex python/numpy scalars are coerced to C2; everything else
    # non-C2 is treated as real.

    @staticmethod
    def _coerce(o):
        import numpy as _np
        if isinstance(o, C2):
            return o
        if isinstance(o, complex) or (
                isinstance(o, (_np.generic, _np.ndarray)) and
                _np.iscomplexobj(o)):
            # Host complex scalar/array: split on host — complex device
            # arrays are unsupported on TPU backends.
            return C2(jnp.asarray(_np.real(o)), jnp.asarray(_np.imag(o)))
        if hasattr(o, 'dtype') and jnp.iscomplexobj(o):
            oo = jnp.asarray(o)
            return C2(jnp.real(oo), jnp.imag(oo))
        return None  # real

    def __neg__(self):
        return C2(-self.re, -self.im)

    def __add__(self, o):
        oc = C2._coerce(o)
        if oc is not None:
            return C2(self.re + oc.re, self.im + oc.im)
        return C2(self.re + o, self.im)

    __radd__ = __add__

    def __sub__(self, o):
        oc = C2._coerce(o)
        if oc is not None:
            return C2(self.re - oc.re, self.im - oc.im)
        return C2(self.re - o, self.im)

    def __rsub__(self, o):
        oc = C2._coerce(o)
        if oc is not None:
            return C2(oc.re - self.re, oc.im - self.im)
        return C2(o - self.re, -self.im)

    def __mul__(self, o):
        oc = C2._coerce(o)
        if oc is not None:
            return C2(self.re * oc.re - self.im * oc.im,
                      self.re * oc.im + self.im * oc.re)
        return C2(self.re * o, self.im * o)

    __rmul__ = __mul__

    def __truediv__(self, o):
        oc = C2._coerce(o)
        if oc is not None:
            d = oc.re * oc.re + oc.im * oc.im
            return C2((self.re * oc.re + self.im * oc.im) / d,
                      (self.im * oc.re - self.re * oc.im) / d)
        return C2(self.re / o, self.im / o)

    def __rtruediv__(self, o):
        oc = C2._coerce(o)
        d = self.re * self.re + self.im * self.im
        if oc is not None:
            inv = C2(self.re / d, -self.im / d)
            return oc * inv
        return C2(o * self.re / d, -o * self.im / d)

    def conj(self):
        return C2(self.re, -self.im)

    def __repr__(self):
        return f"C2(shape={self.shape}, dtype={self.dtype})"


class _C2At:
    def __init__(self, c):
        self._c = c

    def __getitem__(self, idx):
        return _C2AtIdx(self._c, idx)


class _C2AtIdx:
    def __init__(self, c, idx):
        self._c = c
        self._idx = idx

    def set(self, v):
        if isinstance(v, C2):
            return C2(self._c.re.at[self._idx].set(v.re),
                      self._c.im.at[self._idx].set(v.im))
        # Real value: real part gets v, imaginary part gets zero.
        zero = jnp.zeros_like(jnp.asarray(v))
        return C2(self._c.re.at[self._idx].set(v),
                  self._c.im.at[self._idx].set(zero))

    def add(self, v):
        if isinstance(v, C2):
            return C2(self._c.re.at[self._idx].add(v.re),
                      self._c.im.at[self._idx].add(v.im))
        return C2(self._c.re.at[self._idx].add(v), self._c.im)


# ----------------------------------------------------------------------
# Free functions dispatching on representation
# ----------------------------------------------------------------------

def is_c2(a):
    return isinstance(a, C2)


def aspair(a, dtype=None):
    """Convert a complex (or real) array to a C2 pair.

    Host (numpy) inputs are split on the host — complex arrays must
    never be uploaded to backends without complex support.
    """
    import numpy as np
    if isinstance(a, C2):
        return a
    if not isinstance(a, jax.Array):
        a = np.asarray(a)
        if np.iscomplexobj(a):
            re = np.ascontiguousarray(a.real)
            im = np.ascontiguousarray(a.imag)
        else:
            re, im = a, np.zeros_like(a)
        if dtype is not None:
            re, im = re.astype(dtype), im.astype(dtype)
        return C2(jnp.asarray(re), jnp.asarray(im))
    if jnp.iscomplexobj(a):
        re, im = jnp.real(a), jnp.imag(a)
    else:
        re, im = a, jnp.zeros_like(a)
    if dtype is not None:
        re, im = re.astype(dtype), im.astype(dtype)
    return C2(re, im)


def tocomplex(a):
    """C2 -> numpy complex array (host-side; backends without complex
    support cannot form complex arrays on device)."""
    import numpy as np
    if isinstance(a, C2):
        return np.asarray(a.re) + 1j * np.asarray(a.im)
    return a


def _map2(fn, a, *args, **kw):
    if isinstance(a, C2):
        return C2(fn(a.re, *args, **kw), fn(a.im, *args, **kw))
    return fn(a, *args, **kw)


def diff(a, axis=-1):
    return _map2(jnp.diff, a, axis=axis)


def pad(a, pads, **kw):
    return _map2(jnp.pad, a, pads, **kw)


def reshape(a, shape):
    return _map2(jnp.reshape, a, shape)


def transpose(a, axes):
    return _map2(jnp.transpose, a, axes)


def swapaxes(a, a1, a2):
    return _map2(jnp.swapaxes, a, a1, a2)


def repeat(a, repeats, axis):
    return _map2(jnp.repeat, a, repeats=repeats, axis=axis)


def broadcast_to(a, shape):
    return _map2(jnp.broadcast_to, a, shape)


def where(mask, a, b):
    if isinstance(a, C2) or isinstance(b, C2):
        a = a if isinstance(a, C2) else C2(jnp.asarray(a),
                                           jnp.zeros_like(jnp.asarray(a)))
        b = b if isinstance(b, C2) else C2(
            jnp.broadcast_to(jnp.asarray(b, a.re.dtype), ()),
            jnp.broadcast_to(jnp.asarray(b, a.re.dtype), ()))
        return C2(jnp.where(mask, a.re, b.re), jnp.where(mask, a.im, b.im))
    return jnp.where(mask, a, b)


def stack(arrays, axis=0):
    if any(isinstance(a, C2) for a in arrays):
        arrays = [a if isinstance(a, C2) else
                  C2(jnp.asarray(a), jnp.zeros_like(jnp.asarray(a)))
                  for a in arrays]
        return C2(jnp.stack([a.re for a in arrays], axis=axis),
                  jnp.stack([a.im for a in arrays], axis=axis))
    return jnp.stack(arrays, axis=axis)


def concatenate(arrays, axis=0):
    if any(isinstance(a, C2) for a in arrays):
        arrays = [a if isinstance(a, C2) else
                  C2(jnp.asarray(a), jnp.zeros_like(jnp.asarray(a)))
                  for a in arrays]
        return C2(jnp.concatenate([a.re for a in arrays], axis=axis),
                  jnp.concatenate([a.im for a in arrays], axis=axis))
    return jnp.concatenate(arrays, axis=axis)


def zeros(shape, like):
    """Zeros with the representation/dtype of ``like``."""
    if isinstance(like, C2):
        return C2(jnp.zeros(shape, like.re.dtype),
                  jnp.zeros(shape, like.im.dtype))
    return jnp.zeros(shape, like.dtype)


def zeros_like(a):
    return _map2(jnp.zeros_like, a)


def real_dtype_of(a):
    import numpy as np
    if isinstance(a, C2):
        return a.re.dtype
    return jax.dtypes.canonicalize_dtype(np.zeros(0, a.dtype).real.dtype)


def _einsum(expr, a, b):
    return jnp.einsum(expr, a, b)


def matmul_nt(a, b, expr='...ij,...jk->...ik'):
    """Batched matmul supporting C2 operands (4 real einsums)."""
    if isinstance(a, C2) or isinstance(b, C2):
        a = a if isinstance(a, C2) else C2(a, jnp.zeros_like(a))
        b = b if isinstance(b, C2) else C2(b, jnp.zeros_like(b))
        return C2(_einsum(expr, a.re, b.re) - _einsum(expr, a.im, b.im),
                  _einsum(expr, a.re, b.im) + _einsum(expr, a.im, b.re))
    return _einsum(expr, a, b)


def matvec(a, b):
    return matmul_nt(a, b, expr='...ij,...j->...i')


def abs2(a):
    """|a|^2 elementwise (real result)."""
    if isinstance(a, C2):
        return a.re * a.re + a.im * a.im
    if jnp.iscomplexobj(a):
        return jnp.real(a) ** 2 + jnp.imag(a) ** 2
    return a * a
