"""Double-single residual: accuracy against an f64 reference.

The DS evaluation must agree with the f64 evaluation of the SAME
f32-coefficient operator to far better than plain-f32 rounding — that
headroom is what lets f32 solves converge to tol=1e-6.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from emg3d_tpu import TensorMesh, Model, SourceField, VolumeModel, cx
from emg3d_tpu.ops import stencil
from emg3d_tpu.ops.dsres import residual_ds


def _setup(shape, seed=3):
    rng = np.random.default_rng(seed)
    grid = TensorMesh([rng.uniform(50, 150, n) for n in shape])
    model = Model(grid, property_x=rng.uniform(.1, 10,
                                               grid.shape_cells))
    sfield = SourceField.zeros(grid, frequency=0.9)
    sfield.fx[shape[0]//2, shape[1]//2, shape[2]//2] = 1 + 0.5j
    vm = VolumeModel(grid, model, sfield)
    par32 = tuple(
        cx.aspair(np.asarray(a), dtype=jnp.float32)
        if np.iscomplexobj(np.asarray(a))
        else jnp.asarray(np.asarray(a), dtype=jnp.float32)
        for a in (vm.eta_x, vm.eta_y, vm.eta_z, vm.zeta,
                  grid.h[0], grid.h[1], grid.h[2]))
    s32 = tuple(cx.aspair(np.asarray(f), dtype=jnp.float32)
                for f in (sfield.fx, sfield.fy, sfield.fz))
    return par32, s32


def _to64(a):
    if isinstance(a, cx.C2):
        return (np.asarray(a.re, dtype=np.float64)
                + 1j * np.asarray(a.im, dtype=np.float64))
    return np.asarray(a, dtype=np.float64)


def test_residual_ds_matches_f64():
    """Near-convergence scenario: s ≈ A·e, so the residual is tiny
    against the row-term magnitudes and plain f32 evaluation noise
    dominates it.  DS must recover the f64-exact residual of the same
    f32-valued operator to output-representation accuracy."""
    shape = (12, 10, 8)
    rng = np.random.default_rng(11)
    # Exactly-representable parameters: integer η/ζ and power-of-two
    # widths make the f32 and f64 coefficient computations (ζ-sums,
    # η-sums, 1/h) bit-identical, so the comparison isolates pure
    # evaluation rounding (in the solver both paths share the
    # f32-computed coefficients, so this is the relevant quantity).
    cells = shape
    par32 = (
        cx.C2(jnp.asarray(rng.integers(-8, 8, cells), jnp.float32),
              jnp.asarray(rng.integers(-8, 8, cells), jnp.float32)),
        cx.C2(jnp.asarray(rng.integers(-8, 8, cells), jnp.float32),
              jnp.asarray(rng.integers(-8, 8, cells), jnp.float32)),
        cx.C2(jnp.asarray(rng.integers(-8, 8, cells), jnp.float32),
              jnp.asarray(rng.integers(-8, 8, cells), jnp.float32)),
        jnp.asarray(rng.integers(1, 8, cells), jnp.float32),
        jnp.full((cells[0],), 128., jnp.float32),
        jnp.full((cells[1],), 64., jnp.float32),
        jnp.full((cells[2],), 128., jnp.float32),
    )
    s32 = tuple(cx.C2(jnp.zeros(sh, jnp.float32),
                      jnp.zeros(sh, jnp.float32))
                for sh in ((cells[0], cells[1]+1, cells[2]+1),
                           (cells[0]+1, cells[1], cells[2]+1),
                           (cells[0]+1, cells[1]+1, cells[2])))

    # A two-float field: hi O(1), lo at the hi rounding level.
    def mk(c):
        hi = (rng.normal(size=c.shape)
              + 1j * rng.normal(size=c.shape)).astype(np.complex64)
        lo = (1e-7 * (rng.normal(size=c.shape)
                      + 1j * rng.normal(size=c.shape))).astype(
                          np.complex64)
        return (cx.aspair(hi, dtype=jnp.float32),
                cx.aspair(lo, dtype=jnp.float32))
    ehi, elo = zip(*(mk(c) for c in s32))

    # Manufacture s = fl32(A64·e): the residual is then pure rounding.
    par64 = tuple(jnp.asarray(_to64(a)) for a in par32)
    e64 = tuple(jnp.asarray(_to64(h) + _to64(l))
                for h, l in zip(ehi, elo))
    a64 = stencil.amat(*e64, *par64)
    s32 = tuple(cx.aspair(np.asarray(a).astype(np.complex64),
                          dtype=jnp.float32) for a in a64)

    out = residual_ds(ehi, elo, s32, par32)
    ref = stencil.residual_parts(*[jnp.asarray(_to64(c)) for c in s32],
                                 *e64, *par64)

    # Plain f32 evaluation of the same quantity.
    plain = stencil.residual_parts(*s32, *ehi, *par32)
    plain = tuple(p - a for p, a in
                  zip(plain, stencil.amat(*elo, *par32)))

    nrm = lambda t: float(np.linalg.norm(np.asarray(t)))  # noqa: E731
    for o, r, p in zip(out, ref, plain):
        rn = nrm(r)
        err_ds = nrm(_to64(o) - np.asarray(r))
        err_pl = nrm(_to64(p) - np.asarray(r))
        # The residual itself is tiny; DS recovers it to ~f32
        # output-representation accuracy while plain f32 noise is of
        # the residual's own magnitude.
        assert err_ds < 3e-7 * rn + 1e-30, (err_ds, rn)
        assert err_pl > 20 * err_ds, (err_ds, err_pl)


def test_residual_ds_native_complex():
    shape = (10, 8, 8)
    par32, s32 = _setup(shape, seed=5)
    parc = tuple(cx.tocomplex(a) if isinstance(a, cx.C2) else a
                 for a in par32)
    sc = tuple(cx.tocomplex(c) for c in s32)
    rng = np.random.default_rng(2)
    ehi = tuple(jnp.asarray((rng.normal(size=c.shape) + 1j *
                             rng.normal(size=c.shape)).astype(
                                 np.complex64)) for c in sc)
    out_c = residual_ds(ehi, None, sc, parc)
    out_2 = residual_ds(tuple(cx.aspair(np.asarray(h)) for h in ehi),
                        None, s32, par32)
    for a, b in zip(out_c, out_2):
        np.testing.assert_allclose(np.asarray(a),
                                   np.asarray(cx.tocomplex(b)),
                                   rtol=0, atol=1e-12)
