"""Native JAX AD through the multigrid solve (``jax.grad`` end-to-end).

``jax.grad`` flows through the host-driven solver via a custom VJP
whose backward pass is

1. **one adjoint multigrid solve** — the discretized operator A is
   complex-symmetric, so the adjoint system solves the SAME operator
   on the conjugated cotangent (λ = conj(A⁻¹ conj(w))), reusing every
   solver path (Pallas kernels, semicoarsening, two-float refinement);
2. **jax.vjp of the residual stencil itself** for the parameter
   pullback: with r(s, e, θ) = s − A(θ)e, the implicit-function rule
   gives ∂φ/∂θ = λᵀ ∂r/∂θ|ₑ — evaluating that as the vjp of
   :func:`emg3d_tpu.ops.stencil.residual_parts` makes the gradient
   exact for the discretization BY CONSTRUCTION, with no hand-derived
   volume-average formulas to keep in sync with the stencil.

Reference analog: the hand adjoint-state gradient of
/root/reference/emg3d/optimize.py:115-217 — here generalized: the
residual-vjp pullback differentiates through η_x/η_y/η_z AND ζ (the
reference is limited to isotropic σ without μ_r/ε_r), plus the source.

Representation: split re/im (:class:`emg3d_tpu.cx.C2`) pytrees of
real leaves — plain real calculus end-to-end, no complex-AD
conventions.  **Eager-only**: the multigrid driver is host control
flow; call :func:`jax.grad` outside ``jit`` (each inner solver piece
is jitted, so the device work is compiled regardless).
"""
import numpy as np
import jax
import jax.numpy as jnp

from scipy.constants import mu_0

from . import cx, fields, solver
from .ops import stencil

__all__ = ['make_differentiable_solve', 'eta_zeta_from_sigma',
           'sample_edges']


def _np_complex(c):
    return np.asarray(c.re) + 1j * np.asarray(c.im)


def _conj(t):
    return tuple(cx.C2(c.re, -c.im) for c in t)


class _VShim:
    """VolumeModel stand-in carrying prebuilt η/ζ numpy arrays."""

    def __init__(self, eta_x, eta_y, eta_z, zeta):
        self.eta_x = eta_x
        self.eta_y = eta_y
        self.eta_z = eta_z
        self.zeta = zeta
        self.case = 3


def eta_zeta_from_sigma(grid, sigma, frequency, mu_r=None):
    """(η, ζ) from an isotropic conductivity field, in jnp (traceable).

    Mirrors models.VolumeModel for the σ-only case:
    η = s·μ0·V·σ with s = −2πif, ζ = V/μ_r.  Returns η as a
    :class:`cx.C2` cell array and ζ real.
    """
    vol = jnp.asarray(np.asarray(grid.cell_volumes).reshape(
        tuple(grid.shape_cells), order='F'))
    smu0_re, smu0_im = 0.0, -2 * np.pi * frequency * mu_0
    eta = cx.C2(smu0_re * vol * sigma, smu0_im * vol * sigma)
    zeta = vol if mu_r is None else vol / mu_r
    return eta, zeta


def sample_edges(e, weights):
    """Differentiable linear sampling of field components.

    ``weights`` is a list of (component, w) pairs with w a real array
    shaped like that component (e.g. trilinear receiver weights);
    returns the stacked complex samples as a (n, 2) re/im array.
    """
    out = []
    for comp, w in weights:
        c = e[comp]
        out.append(jnp.stack([jnp.sum(w * c.re), jnp.sum(w * c.im)]))
    return jnp.stack(out)


def make_differentiable_solve(grid, frequency, **solver_opts):
    """A differentiable ``fsolve(arrays4, s) -> e`` for this grid.

    arrays4 : (eta_x, eta_y, eta_z, zeta) — η as cx.C2 cell arrays,
        ζ real; every real leaf receives a gradient.
    s : 3-tuple of cx.C2 source-field components; receives λ as its
        gradient (the adjoint field — free for source studies).

    The forward and adjoint solves run the full production solver
    with ``solver_opts`` (tol, cycle, sslsolver, semicoarsening,
    linerelaxation, ...).  Gradient accuracy is bounded by the solve
    tolerance; use tol <= 1e-8 for tight FD checks.
    """
    solver_opts.setdefault('verb', 0)
    h = tuple(jnp.asarray(np.asarray(hh)) for hh in grid.h)

    def _host_solve(arrays4, s):
        eta_x, eta_y, eta_z, zeta = arrays4
        vshim = _VShim(_np_complex(eta_x), _np_complex(eta_y),
                       _np_complex(eta_z), np.asarray(zeta))
        sfield = fields.SourceField(
            _np_complex(s[0]), _np_complex(s[1]), _np_complex(s[2]),
            frequency=frequency)
        e, info = solver.solve(grid, None, sfield, _vmodel=vshim,
                               return_info=True, **solver_opts)
        if info['exit_message'] == 'DIVERGED':
            raise RuntimeError(f"AD inner solve diverged: {info}")
        dt = s[0].re.dtype
        return tuple(
            cx.C2(jnp.asarray(np.ascontiguousarray(np.asarray(c).real),
                              dtype=dt),
                  jnp.asarray(np.ascontiguousarray(np.asarray(c).imag),
                              dtype=dt))
            for c in (e.fx, e.fy, e.fz))

    @jax.custom_vjp
    def fsolve(arrays4, s):
        return _host_solve(arrays4, s)

    def fwd(arrays4, s):
        e = _host_solve(arrays4, s)
        return e, (arrays4, e)

    def bwd(res, w):
        arrays4, e = res
        # Adjoint solve: A complex-symmetric => λ = conj(A⁻¹ conj(w)).
        lam = _conj(_host_solve(arrays4, _conj(w)))

        # Parameter pullback: λᵀ ∂r/∂θ at fixed e (r = s − A(θ)e).
        zeros = tuple(cx.zeros_like(c) for c in e)

        def rfun(a4):
            return stencil.residual_parts(*zeros, *e, *a4, *h)

        _, pull = jax.vjp(rfun, arrays4)
        (d_arrays,) = pull(lam)
        return d_arrays, lam

    fsolve.defvjp(fwd, bwd)
    return fsolve
