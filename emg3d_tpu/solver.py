"""Multigrid solver orchestration (the reference's solver.py, TPU-style).

Design (vs /root/reference/emg3d/solver.py):

- The complete level hierarchy (coarse η/ζ, cell widths, transfer
  weights) is built **eagerly at solve start**; every shape is static.
- One **top-level MG cycle is a single jitted function**: the V/W/F
  recursion (solver.py:478-604, including the ``cycmax−cyc`` F-cycle
  trick) is unrolled at trace time into a static schedule of smoothing,
  restriction and prolongation ops.
- The host loop only advances cycles, pulls the residual norm scalar,
  applies the reference's termination logic (CONVERGED / DIVERGED /
  STAGNATED / MAX-IT), and cycles the semicoarsening / line-relaxation
  direction schedules — exactly the reference's control flow.
- Krylov (BiCGSTAB/CGS) is implemented natively on device arrays with
  one MG cycle as preconditioner (solver.py:610-734).

Compiled cycles are cached module-wide keyed by (shapes, dirs, nus,
cycle type, dtype), so repeated solves on equal grids never recompile.
"""
import itertools
from dataclasses import dataclass, field as dfield

import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from . import cx, fields, models, utils
from .ops import smoothers, stencil, transfers

__all__ = ['solve', 'multigrid', 'krylov', 'MGParameters']


# ======================================================================
# Parameters
# ======================================================================

@dataclass
class MGParameters:
    """Multigrid solver settings (reference parity: solver.py:1043-1364).
    """

    verb: int
    cycle: str
    sslsolver: str
    linerelaxation: int
    semicoarsening: int
    shape_cells: tuple

    tol: float = 1e-6
    maxit: int = 50
    nu_init: int = 0
    nu_pre: int = -1       # -1 = auto-calibrated (see __post_init__)
    nu_coarse: int = 1
    nu_post: int = -1      # -1 = auto-calibrated
    clevel: int = -1

    return_info: bool = False
    log: int = 1
    log_message: str = ''

    def __post_init__(self):
        self._level_all = []
        self._first_cycle = True
        self.it = 0
        self._ssl_it = 0
        self.l2 = 1.0
        self.l2_refe = 1.0
        self.exit_message = ''
        self.time = utils.Time()
        self.runtime_at_cycle = np.array([0.])
        self.error_at_cycle = np.array([0.])
        self.do_return = True

        self._semicoarsening()
        self._linerelaxation()
        self._solver_and_cycle()
        self.max_level

        # Smoothing strength is calibrated per smoother family.  The
        # parallel multicolor point smoother is a true Gauss-Seidel in
        # a colored order, but that order is measurably weaker per
        # sweep than the reference's lexicographic one (two-grid
        # spectral radius 0.27 vs 0.19 at nu=2 on the stretched
        # triaxial model problem); three color-sweeps beat two
        # lexicographic sweeps (0.12 < 0.19) and restore the
        # reference's F-cycle counts (6 on the golden VTI case).
        # Line relaxation shows no such gap and keeps the reference
        # default of 2.  Explicit user values are honored as-is.
        if self.nu_pre < 0:
            self.nu_pre = 2 if self.linerelaxation else 3
        if self.nu_post < 0:
            self.nu_post = 2 if self.linerelaxation else 3

    def __repr__(self):
        return (
            f"   MG-cycle       : {self.cycle!r:17}"
            f"   sslsolver : {self.sslsolver!r}\n"
            f"   semicoarsening : {self._p_sc_dir:17}"
            f"   tol       : {self.tol}\n"
            f"   linerelaxation : {self._p_lr_dir:17}"
            f"   maxit     : {self._maxit}\n"
            f"   nu_{{i,1,c,2}}   : {self.nu_init}, {self.nu_pre}"
            f", {self.nu_coarse}, {self.nu_post}       "
            f"   verb      : {self.verb}\n"
            f"   Original grid  "
            f": {self.shape_cells[0]:3} x {self.shape_cells[1]:3} "
            f"x {self.shape_cells[2]:3}  "
            f"   => {np.prod(self.shape_cells):,} cells\n"
            f"   Coarsest grid  : {self.pclevel['vnC'][0]:3} "
            f"x {self.pclevel['vnC'][1]:3} x {self.pclevel['vnC'][2]:3}  "
            f"   => {self.pclevel['nC']:,} cells\n"
            f"   Coarsest level : {self.pclevel['clevel'][0]:3} "
            f"; {self.pclevel['clevel'][1]:3} ;{self.pclevel['clevel'][2]:4} "
            f"  {self.pclevel['message']}\n"
        )

    @property
    def max_level(self):
        """Per-axis 2-divisibility depth -> per-sc_dir coarsest level.

        Fills ``clevel`` (a 4-entry table indexed by sc_dir: which
        axes keep coarsening) and ``pclevel`` (coarsest-grid QC info,
        including the 'not optimal' warning when an axis stops early
        on an odd factor or never reaches 3 coarsenings).
        """
        nx, ny, nz = self.shape_cells
        if min(self.shape_cells) < 2:
            raise ValueError(
                "Nr. of cells must be at least two in each direction\n"
                f"Provided shape: ({nx}, {ny}, {nz}).")

        requested = None if self.clevel < 0 else int(self.clevel)

        def depth(n):
            d = 0
            while n % 2 == 0 and n > 2:
                d += 1
                n //= 2
            return d if requested is None else min(d, requested)

        dx, dy, dz = (depth(n) for n in self.shape_cells)
        # sc_dir semantics: 0 = coarsen all axes, 1 = y/z only,
        # 2 = x/z only, 3 = x/y only.
        self.clevel = np.array([max(dx, dy, dz), max(dy, dz),
                                max(dx, dz), max(dx, dy)])

        shape_coarse = tuple(n >> d for n, d
                             in zip(self.shape_cells, (dx, dy, dz)))
        limit = np.inf if requested is None else requested
        stopped_early = any(
            d < limit and n > 7
            for d, n in zip((dx, dy, dz), shape_coarse))
        too_shallow = any(d < min(limit, 3) for d in (dx, dy, dz))
        self.pclevel = {
            'nC': int(np.prod(shape_coarse)),
            'vnC': shape_coarse,
            'clevel': np.array([dx, dy, dz]),
            'message': "  :: Grid not optimal for MG solver ::"
                       if stopped_early or too_shallow else "",
        }

    def cprint(self, info, verbosity, **kwargs):
        if self.verb > verbosity:
            if self.log != 0:
                self.log_message += str(info) + '\n'
            if self.log >= 0:
                print(info, **kwargs)

    def one_liner(self, l2_last, last=False):
        info = f":: emg3d_tpu :: {l2_last/self.l2_refe:.1e}; "
        if self.sslsolver:
            info += f"{self._ssl_it}({self.it}); "
        else:
            info += f"{self.it}; "
        info += f"{self.time.runtime}"
        if last:
            self.cprint(info + f"; {self.exit_message}", -100)
        else:
            self.cprint(info, -100, end='\r')

    @staticmethod
    def _direction_schedule(value, name, rotation, hi):
        """Normalize a direction knob to its per-cycle digit schedule.

        Accepted values (behavior parity with the reference's
        semicoarsening/linerelaxation parsing, without its structure):
        ``True`` selects the standard rotation, a single integer
        ``0..hi`` a fixed direction, and any other integer is read as
        a sequence of decimal digits to rotate through (e.g. 1213).

        Returns ``(digits, cycling)``.
        """
        if value is True:
            return np.asarray(rotation), True
        digits = np.asarray([int(d) for d in str(abs(int(value)))])
        fixed = len(digits) == 1 and 0 <= int(value) <= hi
        if not fixed and digits.max(initial=0) > hi:
            raise ValueError(
                f"`{name}` must be False, True, an integer in 0..{hi}, "
                f"or a multi-digit rotation of those (e.g. 1213); got "
                f"{name}={value}.")
        return digits, not fixed

    def _semicoarsening(self):
        digits, cycling = self._direction_schedule(
            self.semicoarsening, 'semicoarsening', (1, 2, 3), 3)
        self.sc_cycle = itertools.cycle(digits) if cycling else False
        self.sc_dir = next(self.sc_cycle) if self.sc_cycle else digits[0]
        self.semicoarsening = self.sc_dir != 0
        self._p_sc_dir = f"{self.semicoarsening} {digits}"
        self._raw_sc_cycle = digits

    def _linerelaxation(self):
        digits, cycling = self._direction_schedule(
            self.linerelaxation, 'linerelaxation', (4, 5, 6), 7)
        self.lr_cycle = itertools.cycle(digits) if cycling else False
        self.lr_dir = next(self.lr_cycle) if self.lr_cycle else digits[0]
        self.linerelaxation = self.lr_dir != 0
        self._p_lr_dir = f"{self.linerelaxation} {digits}"
        self._raw_lr_cycle = digits

    _SSL_SOLVERS = ('bicgstab', 'cgs', 'gcrotmk')

    def _solver_and_cycle(self):
        if self.sslsolver is True:
            self.sslsolver = 'bicgstab'
        if self.sslsolver not in (False,) + self._SSL_SOLVERS:
            raise ValueError(
                f"`sslsolver` must be True, False, or one of "
                f"{list(self._SSL_SOLVERS)}; got "
                f"sslsolver={self.sslsolver!r}.")
        if self.cycle not in ('F', 'V', 'W', None):
            raise ValueError(
                f"`cycle` must be 'F', 'V', 'W', or None; got "
                f"cycle={self.cycle}.")
        if not self.sslsolver and not self.cycle:
            raise ValueError(
                f"At least one of `cycle` and `sslsolver` is required; "
                f"got cycle={self.cycle}, sslsolver={self.sslsolver}.")

        self.cycmax = 2 if self.cycle in ('F', 'W') else 1
        self._maxcycle = max(len(self._raw_sc_cycle),
                             len(self._raw_lr_cycle))
        self._maxit = f"{self.maxit}"
        self.ssl_maxit = 0
        if self.sslsolver:
            # With an outer Krylov solver, MG is the preconditioner:
            # maxit bounds the ssl iterations and each preconditioner
            # application runs one schedule's worth of MG cycles.
            self.ssl_maxit = self.maxit
            if self.cycle is not None:
                self.maxit = self._maxcycle
                self._maxit += f" ({self.maxit})"


# ======================================================================
# Direction helpers (reference parity: solver.py:1466-1572)
# ======================================================================

def _current_sc_dir(sc_dir, shape):
    """Adjusted semicoarsening direction for a given grid shape."""
    xsc = shape[0] % 2 != 0 or shape[0] < 3 or sc_dir == 1
    ysc = shape[1] % 2 != 0 or shape[1] < 3 or sc_dir == 2
    zsc = shape[2] % 2 != 0 or shape[2] < 3 or sc_dir == 3

    if xsc:
        if ysc:
            return 6
        elif zsc:
            return 5
        else:
            return 1
    elif ysc:
        return 4 if zsc else 2
    elif zsc:
        return 3
    return 0


def _coarsen_flags(sc_dir):
    """(coarsen_x, coarsen_y, coarsen_z) from an sc_dir code."""
    return (sc_dir not in [1, 5, 6],
            sc_dir not in [2, 4, 6],
            sc_dir not in [3, 4, 5])


def _current_lr_dir(lr_dir, shape):
    """Suppress line relaxation along 2-cell dimensions."""
    lr_dir = int(lr_dir)
    if shape[0] == 2:
        lr_dir = {1: 0, 5: 3, 6: 2, 7: 4}.get(lr_dir, lr_dir)
    if shape[1] == 2:
        lr_dir = {2: 0, 4: 3, 6: 1, 7: 5}.get(lr_dir, lr_dir)
    if shape[2] == 2:
        lr_dir = {3: 0, 4: 2, 5: 1, 7: 6}.get(lr_dir, lr_dir)
    return lr_dir


def _lr_axes(lr_dir):
    """Line-relaxation axes for an lr_dir code (in x, y, z order)."""
    axes = []
    if lr_dir in [1, 5, 6, 7]:
        axes.append(0)
    if lr_dir in [2, 4, 6, 7]:
        axes.append(1)
    if lr_dir in [3, 4, 5, 7]:
        axes.append(2)
    return tuple(axes)


# ======================================================================
# Level hierarchy
# ======================================================================

class _Level:
    """Per-level data: model parameters, widths, transfer weights."""

    __slots__ = ('shape', 'arrays', 'coarsen', 'rweights', 'pweights',
                 'nodes', 'h_np', 'fstacks', 'pparams', 'cache_meter')

    def __init__(self, shape, arrays, h_np, nodes):
        self.shape = shape          # cell shape
        self.arrays = arrays        # (eta_x, eta_y, eta_z, zeta, hx, hy, hz)
        self.h_np = h_np            # numpy widths (for weight building)
        self.nodes = nodes          # numpy node vectors
        self.coarsen = None
        self.rweights = None
        self.pweights = None
        self.fstacks = {}           # axis -> Pallas line-factor stack
        self.pparams = None         # cached Pallas point-kernel params
        self.cache_meter = None     # hierarchy-shared big-cache bytes


def use_split_complex():
    """Whether to run with split re/im float pairs (C2).

    TPU backends have no native complex support, so any non-CPU backend
    defaults to the split representation; override with
    EMG3D_TPU_SPLIT=0/1.
    """
    env = os.environ.get('EMG3D_TPU_SPLIT')
    if env is not None:
        return env not in ('0', 'false', 'False')
    return jax.default_backend() != 'cpu'


def build_levels(grid, vmodel, sc_dir, clevel, dtype, split=False):
    """Build the full level hierarchy for one top-level sc_dir.

    ``vmodel`` may be a list of VolumeModels (one per batch lane, e.g.
    per frequency): the frequency-dependent η parameters are then
    stacked on a leading lane axis (B, nx, ny, nz) and every kernel
    runs vmapped over it; ζ is frequency-independent and stays shared
    (taken from the first lane).
    """
    # Host-side dtype computation only — never instantiate complex
    # device arrays (unsupported on TPU backends).
    rdtype = jax.dtypes.canonicalize_dtype(np.zeros(0, dtype).real.dtype)

    if split:
        def as_eta(a):
            return cx.aspair(np.asarray(a), dtype=rdtype)
    else:
        def as_eta(a):
            return jnp.asarray(a, dtype=dtype)

    if isinstance(vmodel, (list, tuple)):
        vms = list(vmodel)

        def stack_eta(name):
            vals = [np.asarray(getattr(vm, name)) for vm in vms]
            return as_eta(np.stack(vals))

        eta_x = stack_eta('eta_x')
        shared_y = all(vm.eta_y is vm.eta_x for vm in vms)
        shared_z = all(vm.eta_z is vm.eta_x for vm in vms)
        eta_y = eta_x if shared_y else stack_eta('eta_y')
        eta_z = eta_x if shared_z else stack_eta('eta_z')
        vmodel = vms[0]
    else:
        eta_x = as_eta(vmodel.eta_x)
        eta_y = (eta_x if vmodel.eta_y is vmodel.eta_x
                 else as_eta(vmodel.eta_y))
        eta_z = (eta_x if vmodel.eta_z is vmodel.eta_x
                 else as_eta(vmodel.eta_z))
    zeta = jnp.asarray(vmodel.zeta, dtype=rdtype)

    h_np = [np.asarray(h, dtype=np.float64) for h in grid.h]
    nodes = [np.r_[0., np.cumsum(h)] + o
             for h, o in zip(h_np, grid.origin)]
    shape = tuple(grid.shape_cells)
    arrays = (eta_x, eta_y, eta_z, zeta,
              *[jnp.asarray(h, dtype=rdtype) for h in h_np])
    levels = [_Level(shape, arrays, h_np, nodes)]

    for lvl in range(clevel):
        cur = levels[-1]
        cdir = _current_sc_dir(sc_dir, cur.shape)
        coarsen = _coarsen_flags(cdir)
        cur.coarsen = coarsen

        # Coarse grid geometry.
        ch_np, cnodes = [], []
        for ax in range(3):
            if coarsen[ax]:
                cn = cur.nodes[ax][::2]
            else:
                cn = cur.nodes[ax]
            cnodes.append(cn)
            ch_np.append(np.diff(cn))
        cshape = tuple(len(h) for h in ch_np)

        # Restriction / prolongation weights (host).
        rw, pw = [None]*3, [None]*3
        for ax in range(3):
            if coarsen[ax]:
                centers = (cur.nodes[ax][:-1] + cur.nodes[ax][1:]) / 2
                ccenters = (cnodes[ax][:-1] + cnodes[ax][1:]) / 2
                wl, w0, wr = transfers.restrict_weights_1d(
                    cur.nodes[ax], centers, cur.h_np[ax],
                    cnodes[ax], ccenters, ch_np[ax])
                rw[ax] = tuple(jnp.asarray(w, dtype=rdtype)
                               for w in (wl, w0, wr))
                pw[ax] = jnp.asarray(transfers.prolong_weights_1d(
                    cur.nodes[ax], cnodes[ax]), dtype=rdtype)
        cur.rweights = tuple(rw)
        cur.pweights = tuple(pw)

        # Coarse model parameters by child-cell summation.
        cex = transfers.restrict_model_parameter(cur.arrays[0], coarsen)
        if cur.arrays[1] is cur.arrays[0]:
            cey = cex
        else:
            cey = transfers.restrict_model_parameter(cur.arrays[1], coarsen)
        if cur.arrays[2] is cur.arrays[0]:
            cez = cex
        else:
            cez = transfers.restrict_model_parameter(cur.arrays[2], coarsen)
        czeta = transfers.restrict_model_parameter(cur.arrays[3], coarsen)
        carrays = (cex, cey, cez, czeta,
                   *[jnp.asarray(h, dtype=rdtype) for h in ch_np])
        levels.append(_Level(cshape, carrays, ch_np, cnodes))

    # One big-cache byte meter shared across the hierarchy: big line-
    # factor stacks (256³-class) are admitted against it so the sum
    # over levels and axes stays bounded (see _level_fstacks).
    meter = {'bytes': 0}
    for lev in levels:
        lev.cache_meter = meter
    return levels


# ======================================================================
# The jitted MG cycle
# ======================================================================

def _smooth(e, s, arrays, nu, lr_dir, shape, pallas_ok=True,
            fstacks=None, mesh=None, pparams=None, spdt=None):
    """Smoothing dispatch (reference parity: solver.py:738-799).

    ``fstacks`` is an optional 3-tuple of precomputed line-factor
    stacks (one per axis, None where absent): when present for an
    axis, line relaxation along it runs the fused Pallas kernel with
    streamed factors (the factors are model-dependent only, so the
    host computes them once per (level, axis) per solve).

    ``mesh`` routes point smoothing — and line relaxation along
    unsharded axes — through the explicit shard_map halo pipeline
    (parallel/shmap.py) when the level is distributed over a ('y',),
    ('z',) or ('y', 'z') device mesh.

    ``spdt`` stores the Pallas kernels' s/params streams in a reduced
    dtype (bfloat16 halves their HBM traffic).  Callers may set it
    ONLY when the smoother works on a correction system (rhs = an
    exactly-evaluated outer residual): the O(2⁻⁸) update bias then
    cannot shift the outer fixed point.  The XLA fallbacks ignore it.
    """
    if nu <= 0:
        return e
    lr = _current_lr_dir(lr_dir, shape)
    if lr == 0:
        if mesh is not None:
            from .parallel import shmap
            if shmap.supported_mesh(mesh, shape):
                return shmap.gauss_seidel_point_shmap(
                    tuple(e), tuple(s), tuple(arrays), nu=nu,
                    shape=shape, mesh=mesh)
        from .ops import pallas_gs
        if pallas_ok and pallas_gs.enabled() and pallas_gs.supported(e):
            return pallas_gs.gauss_seidel_point_pallas(
                tuple(e), tuple(s), tuple(arrays), nu=nu, shape=shape,
                params=pparams, _sp_dt=spdt)
        return smoothers.gauss_seidel_point(*e, *s, *arrays, nu=nu)
    for ax in _lr_axes(lr):
        if mesh is not None:
            from .parallel import shmap
            if shmap.supported_line(mesh, shape, ax):
                e = shmap.line_relaxation_shmap(
                    tuple(e), tuple(s), tuple(arrays), nu=nu,
                    shape=shape, mesh=mesh, axis=ax)
                continue
        ent = fstacks[ax] if (pallas_ok and fstacks is not None) \
            else None
        if ent is not None:
            fs, rot, pp = ent
            from .ops import pallas_lr
            inline = isinstance(fs, tuple)
            # The () sentinel only ever stands for a stack too big for
            # the HBM meter -> the inline rebuild stores bf16 too
            # (half the transient and the streaming bytes).
            e = pallas_lr.line_relaxation_pallas(
                tuple(e), tuple(s), tuple(arrays), nu=nu, shape=shape,
                axis=ax, fstack=None if inline else fs,
                arrays_rot=rot, params=pp,
                _fdt=jnp.bfloat16 if inline else None, _sp_dt=spdt)
        else:
            e = smoothers.line_relaxation(*e, *s, *arrays, nu=nu,
                                          axis=ax)
    return e


def _residual_e(e, s, arrays):
    return stencil.residual_parts(*s, *e, *arrays)


def _arrays_in_axes(arrays):
    """vmap in_axes spec for a level's arrays tuple.

    Batched (4-D) η stacks — one lane per frequency in mixed-frequency
    batched solves — map over axis 0; shared ζ/h (and unbatched η)
    broadcast.  C2 entries use prefix semantics (one spec for both
    re/im leaves).
    """
    def ax(a):
        nd = a.re.ndim if cx.is_c2(a) else a.ndim
        return 0 if nd == 4 else None
    return tuple(ax(a) for a in arrays)


def _mg_rec(e, s, levels_arrays, static, lvl, cycmax, new_cycmax, conf,
            is_top=False, pallas_ok=True, spdt=None, fst_seq=None,
            pp_seq=None):
    """Recursive (trace-time unrolled) multigrid body.

    Mirrors the reference's recursion (solver.py:478-604) including the
    `new_cycmax = cycmax - cyc` F-cycle construction.  ``is_top`` marks
    the level at which the host loop iterates (one body execution per
    call); for fused sub-trees it is False even at relative level 0.

    ``fst_seq``/``pp_seq`` are optional per-level tuples of cached
    line-factor stacks / point-kernel parameter stacks (relative to
    ``levels_arrays``'s indexing), threaded into every smoothing call —
    the chunked whole-cycle jits pass them so the Pallas kernels keep
    their streamed factors inside fused graphs.
    """
    (nu_pre, nu_coarse, nu_post, cycle, lr_dir) = conf
    arrays = levels_arrays[lvl]
    shape = static[lvl][0]
    nlevels = len(levels_arrays)
    fst = fst_seq[lvl] if fst_seq is not None else None
    pp = pp_seq[lvl] if pp_seq is not None else None

    if lvl == nlevels - 1:
        # Coarsest grid: nu_coarse smoothing steps act as direct solve.
        return _smooth(e, s, arrays, nu_coarse, lr_dir, shape,
                       pallas_ok=pallas_ok, spdt=spdt, fstacks=fst,
                       pparams=pp)

    if is_top:
        cycmax_here = cycmax
    elif new_cycmax == 0 or cycle != 'F':
        cycmax_here = cycmax
    else:
        cycmax_here = new_cycmax

    it = 0
    while it < cycmax_here:
        e = _smooth(e, s, arrays, nu_pre, lr_dir, shape,
                    pallas_ok=pallas_ok, spdt=spdt, fstacks=fst,
                    pparams=pp)

        r = _residual_e(e, s, arrays)
        coarsen = static[lvl][1]
        rweights = static[lvl][3]
        pweights = static[lvl][4]
        rc = transfers.restrict(*r, rweights, coarsen)
        rc = stencil.pec_mask_apply(*rc)
        ec = tuple(cx.zeros(sh, like=e[0])
                   for sh in _edge_shapes(static[lvl + 1][0]))

        ec = _mg_rec(ec, rc, levels_arrays, static, lvl + 1,
                     2 if cycle in ['F', 'W'] else 1,
                     cycmax_here - it, conf, pallas_ok=pallas_ok,
                     spdt=spdt, fst_seq=fst_seq, pp_seq=pp_seq)

        e = transfers.prolongate(*e, *ec, pweights, coarsen)
        e = stencil.pec_mask_apply(*e)

        e = _smooth(e, s, arrays, nu_post, lr_dir, shape,
                    pallas_ok=pallas_ok, spdt=spdt, fstacks=fst,
                    pparams=pp)

        it += 1
        if is_top:
            break
    return e


def _edge_shapes(shape):
    nx, ny, nz = shape
    return ((nx, ny+1, nz+1), (nx+1, ny, nz+1), (nx+1, ny+1, nz))


# ----------------------------------------------------------------------
# Piecewise-jitted building blocks + host-driven cycle (default path).
#
# One monolithic whole-cycle jit produces a huge graph whose compile
# time is pathological on remote-compile TPU backends.  Instead the
# cycle is driven from the host over small jitted pieces — each piece
# is cached by shape and REUSED across levels, semicoarsening variants
# and solves.  Dispatch overhead is a few host calls per level visit,
# negligible against the device work.
# ----------------------------------------------------------------------

from functools import partial as _partial


def _constrain(x, mesh):
    """Sharding annotation on 3-D leaves (no-op when mesh is None)."""
    if mesh is None:
        return x
    from .parallel.sharding import constrain
    return constrain(x, mesh)


# A cached line-factor stack larger than this is stored bfloat16
# (half the kernel's streaming bytes; numerically safe — see
# pallas_lr.line_factors), its rotated-parameter/pstack companions are
# not cached at all (rebuilding them in-jit costs ~ms against a
# multi-hundred-ms smoothing call, but holding them across levels and
# axes costs GBs), and a stack that cannot be admitted against the
# hierarchy-wide _FSTACK_EVICT_BYTES meter recomputes inline in the
# smoothing jit (the elimination is one scan per smoothing call, like
# the XLA path always paid).  Measured: an unmetered 256³ sc+lr
# hierarchy accumulated ~16 GB of per-level caches and OOMed the chip.
_FSTACK_CACHE_BYTES = int(float(os.environ.get('EMG3D_TPU_FSTACK_BYTES',
                                               256_000_000)))
_FSTACK_EVICT_BYTES = int(float(os.environ.get('EMG3D_TPU_FSTACK_EVICT',
                                               8_000_000_000)))


def _level_fstacks(lev, lr_dir, mesh=None, batch=False, spdt=None):
    """Line-factor stacks for the Pallas path (None when inapplicable).

    Lazily computed once per (level, axis) and cached on the level —
    the factors are model-dependent only, so they are shared across
    all colors, sweeps, cycles and solves on this hierarchy.  An entry
    of ``()`` (empty pytree) means: run the Pallas kernel but compute
    the factors inline (stack too large to keep cached in HBM).
    """
    if mesh is not None or batch:
        return None
    from .ops import pallas_gs, pallas_lr
    if not (pallas_gs.enabled() and isinstance(lev.arrays[0], cx.C2)):
        return None
    lr = _current_lr_dir(lr_dir, lev.shape)
    if lr == 0:
        return None
    import jax.numpy as jnp
    out = [None, None, None]
    any_ax = False
    axes = [ax for ax in _lr_axes(lr)
            if (pallas_lr.supported_shape(lev.shape, ax)
                and pallas_lr.line_probe(lev.shape, ax))]
    meter = lev.cache_meter if lev.cache_meter is not None \
        else {'bytes': 0}
    for ax in axes:
        key = (ax, None if spdt is None else str(spdt))
        if key not in lev.fstacks:
            nbytes = pallas_lr.factors_nbytes(lev.shape, ax)
            if nbytes <= _FSTACK_CACHE_BYTES:
                fs = pallas_lr.line_factors(lev.arrays, lev.shape, ax)
                # Rotated-frame parameters are field-independent too:
                # cache them so y/z-line calls only transpose the
                # (changing) fields — including the packed residual-
                # kernel st/w stacks (in the smoother stream dtype).
                rot = None if ax == 0 else \
                    pallas_lr.rotate_arrays_jit(lev.arrays, axis=ax)
                pp = pallas_lr.line_params(
                    lev.arrays if rot is None else rot, lev.shape, ax,
                    pdtype=spdt)
            else:
                # Big stack (256³ class): evict axes outside this
                # cycle's pair (the (4,5,6) rotation shares one axis
                # between consecutive cycles -> at worst one rebuild
                # per cycle), store bfloat16 if the hierarchy-wide
                # meter admits it, and never cache the rot/pstack
                # companions (rebuilt in-jit, ~ms per call).
                for other in list(lev.fstacks):
                    ofs = lev.fstacks[other][0]
                    # Only big (metered) stacks are evicted: a bf16
                    # stack of a > _FSTACK_CACHE_BYTES f32 stack has
                    # nbytes > _FSTACK_CACHE_BYTES // 2.
                    if other[0] not in axes and ofs is not None and \
                            not isinstance(ofs, tuple) and \
                            ofs.nbytes > _FSTACK_CACHE_BYTES // 2:
                        meter['bytes'] -= ofs.nbytes
                        del lev.fstacks[other]
                if meter['bytes'] + nbytes // 2 <= _FSTACK_EVICT_BYTES:
                    fs = pallas_lr.line_factors(
                        lev.arrays, lev.shape, ax, fdtype=jnp.bfloat16)
                    meter['bytes'] += fs.nbytes
                else:
                    fs = ()
                rot, pp = None, None
            lev.fstacks[key] = (fs, rot, pp)
        out[ax] = lev.fstacks[key]
        any_ax = True
    return tuple(out) if any_ax else None


def _level_pparams(lev, lr_dir, mesh=None, batch=False, pdt=None):
    """Cached point-kernel parameter stacks (None when inapplicable).

    The (9,·) st/w stack + 1/h arrays of the fused point smoother are
    field-independent, so they are built once per level per solve and
    shared by every smoothing call on this hierarchy — the per-call
    XLA prologue then only pads the 6+6 e/s planes.
    """
    if mesh is not None or batch:
        return None
    from .ops import pallas_gs
    if not (pallas_gs.enabled() and isinstance(lev.arrays[0], cx.C2)):
        return None
    if _current_lr_dir(lr_dir, lev.shape) != 0:
        return None
    # Probe-compile before embedding in solver jits: a VMEM-infeasible
    # configuration must fall back to the XLA smoother, never crash
    # the solve (the probe verdict also drives supported_shape).
    if not (pallas_gs.supported_shape(lev.shape)
            and pallas_gs.point_probe(lev.shape)):
        return None
    if lev.pparams is None:
        lev.pparams = {}
    pkey = None if pdt is None else str(pdt)
    if pkey not in lev.pparams:
        lev.pparams[pkey] = pallas_gs.point_params(lev.arrays,
                                                   lev.shape, pdtype=pdt)
    return lev.pparams[pkey]


@_partial(jax.jit,
          static_argnames=('nu', 'lr_dir', 'shape', 'mesh', 'batch',
                           'spdt'))
def _smooth_jit(e, s, arrays, nu, lr_dir, shape, mesh=None,
                batch=False, fstacks=None, pparams=None, spdt=None):
    if batch:
        return jax.vmap(
            lambda e_, s_, ar: _smooth(e_, s_, ar, nu, lr_dir, shape,
                                       pallas_ok=False),
            in_axes=(0, 0, _arrays_in_axes(arrays)))(e, s, arrays)
    e = _constrain(e, mesh)
    s = _constrain(s, mesh)
    return _smooth(e, s, arrays, nu, lr_dir, shape,
                   pallas_ok=mesh is None, fstacks=fstacks, mesh=mesh,
                   pparams=pparams, spdt=spdt)


@_partial(jax.jit,
          static_argnames=('coarsen', 'nu_pre', 'lr_dir', 'shape',
                           'mesh', 'batch', 'spdt'))
def _smooth_coarse_jit(e, s, arrays, rweights, coarsen, nu_pre, lr_dir,
                       shape, mesh=None, batch=False, fstacks=None,
                       pparams=None, spdt=None):
    """Pre-smooth -> residual -> restrict -> PEC -> zero coarse field.

    Returns (e, rc, ec) in one dispatch (B.1 + B.2 of the reference's
    cycle body, solver.py:542-556).
    """
    def body(e_, s_, pallas_ok=True, mesh_=None, ar=arrays):
        e_ = _smooth(e_, s_, ar, nu_pre, lr_dir, shape,
                     pallas_ok=pallas_ok, fstacks=fstacks, mesh=mesh_,
                     pparams=pparams, spdt=spdt)
        r = _residual_e(e_, s_, ar)
        rc = transfers.restrict(*r, rweights, coarsen)
        rc = stencil.pec_mask_apply(*rc)
        ec = tuple(cx.zeros_like(c) for c in rc)
        return e_, rc, ec

    if batch:
        return jax.vmap(
            lambda e_, s_, ar: body(e_, s_, False, ar=ar),
            in_axes=(0, 0, _arrays_in_axes(arrays)))(e, s, arrays)
    e = _constrain(e, mesh)
    s = _constrain(s, mesh)
    return body(e, s, mesh is None, mesh)


@_partial(jax.jit,
          static_argnames=('coarsen', 'nu_post', 'lr_dir', 'shape',
                           'mesh', 'batch', 'spdt'))
def _prolong_smooth_jit(e, ec, pweights, coarsen, s, arrays, nu_post,
                        lr_dir, shape, mesh=None, batch=False,
                        fstacks=None, pparams=None, spdt=None):
    """Prolongate + PEC + post-smooth in one dispatch (B.4 + B.5)."""
    def body(e_, ec_, s_, pallas_ok=True, mesh_=None, ar=arrays):
        e_ = transfers.prolongate(*e_, *ec_, pweights, coarsen)
        e_ = stencil.pec_mask_apply(*e_)
        return _smooth(e_, s_, ar, nu_post, lr_dir, shape,
                       pallas_ok=pallas_ok, fstacks=fstacks, mesh=mesh_,
                       pparams=pparams, spdt=spdt)

    if batch:
        return jax.vmap(
            lambda e_, ec_, s_, ar: body(e_, ec_, s_, False, ar=ar),
            in_axes=(0, 0, 0, _arrays_in_axes(arrays)))(e, ec, s,
                                                        arrays)
    e = _constrain(e, mesh)
    s = _constrain(s, mesh)
    return body(e, ec, s, mesh is None, mesh)


# Coarse sub-trees at or below this many cells are fused into a single
# jitted graph (the tail of the recursion), trading a small one-time
# compile for the elimination of most per-cycle dispatches — decisive
# on backends with high dispatch latency.
_FUSE_CELLS = int(os.environ.get('EMG3D_TPU_FUSE_CELLS', 40000))

_TAIL_CACHE = {}


def _get_tail_fn(levels, lvl, cycmax, new_cycmax, conf, batch=False,
                 spdt=None):
    """Fused jit of the multigrid sub-tree from ``lvl`` downwards."""
    sub = levels[lvl:]
    static = tuple((lv.shape, lv.coarsen, None,
                    _freeze(lv.rweights), _freeze(lv.pweights))
                   for lv in sub)
    key = (static, cycmax, new_cycmax, conf, batch, spdt)
    if key in _TAIL_CACHE:
        return _TAIL_CACHE[key]

    def tail_fn(e, s, arrays, weights):
        st = tuple((sh, co, None, wr, wp)
                   for (sh, co, _, _, _), (wr, wp)
                   in zip(static, weights))

        def body(e_, s_, pallas_ok=True, ar=None):
            return _mg_rec(e_, s_, ar if ar is not None else arrays,
                           st, 0, cycmax, new_cycmax, conf,
                           is_top=False, pallas_ok=pallas_ok,
                           spdt=spdt)

        if batch:
            spec = tuple(_arrays_in_axes(a) for a in arrays)
            return jax.vmap(
                lambda e_, s_, ar: body(e_, s_, False, ar),
                in_axes=(0, 0, spec))(e, s, arrays)
        return body(e, s)

    fn = jax.jit(tail_fn)
    _TAIL_CACHE[key] = fn
    return fn


def _level_mesh(lev, sharding):
    """The device mesh to constrain this level to (None = replicate).

    Agglomeration policy: a level is only distributed while every
    device keeps at least ``min_local_planes`` cell-planes along each
    sharded grid axis; below that the constraint is dropped and the
    compiler gathers the (tiny) coarse problems.
    """
    if sharding is None:
        return None
    mesh = sharding['mesh']
    minp = sharding.get('min_local_planes', 4)
    axis_of = {'y': 1, 'z': 2}
    for name, size in zip(mesh.axis_names, mesh.devices.shape):
        if lev.shape[axis_of[name]] < minp * size:
            return None
    return mesh


def _gs_info(it, level, cycmax, shape, norm):
    """Debug line after a smoothing step (verb>4; reference format)."""
    nx, ny, nz = shape
    return (f"     {it:2} {level} {cycmax} [{nx:3}, {ny:3}, "
            f"{nz:3}]: {norm:.3e} ")


def _mg_rec_host(e, s, levels, lvl, cycmax, new_cycmax, conf,
                 sharding=None, batch=False, dbg=None, spdt=None):
    """Host-driven multigrid recursion over jitted pieces.

    Identical control flow to the reference's recursion
    (solver.py:478-604 incl. the F-cycle cycmax trick).  Levels at or
    below _FUSE_CELLS cells run as one fused jitted sub-tree.

    ``dbg`` is the MGParameters instance when verb>4: each smoothing
    step then fetches and logs its residual norm (debug only — the
    fetches serialize the pipeline), and sub-tree fusion is disabled
    so every step is observable.
    """
    (nu_pre, nu_coarse, nu_post, cycle, lr_dir) = conf
    lev = levels[lvl]
    nlevels = len(levels)
    mesh = _level_mesh(lev, sharding)

    def report(it_, cycmax_, tag):
        if dbg is not None:
            nrm = residual_norm(e, s, lev.arrays)
            dbg.cprint(_gs_info(it_, lvl, cycmax_, lev.shape, nrm)
                       + tag, 4)

    if lvl == nlevels - 1:
        e = _smooth_jit(e, s, lev.arrays, nu_coarse, lr_dir,
                        lev.shape, mesh=mesh, batch=batch,
                        fstacks=_level_fstacks(lev, lr_dir, mesh, batch,
                                               spdt=spdt),
                        pparams=_level_pparams(lev, lr_dir, mesh, batch,
                                               pdt=spdt),
                        spdt=spdt)
        report(0, 1, "coarsest level")
        return e

    if lvl > 0 and mesh is None and dbg is None and \
            int(np.prod(lev.shape)) <= _FUSE_CELLS:
        # Probe every shape the fused sub-tree will embed a Pallas
        # kernel for BEFORE tracing it (verdicts feed supported()).
        if not batch:
            from .ops import pallas_gs
            if pallas_gs.enabled() and isinstance(lev.arrays[0], cx.C2):
                for lv in levels[lvl:]:
                    if _current_lr_dir(conf[4], lv.shape) == 0 and \
                            pallas_gs.supported_shape(lv.shape):
                        pallas_gs.point_probe(lv.shape)
        fn = _get_tail_fn(levels, lvl, cycmax, new_cycmax, conf,
                          batch=batch, spdt=spdt)
        arrays = tuple(lv.arrays for lv in levels[lvl:])
        weights = tuple((lv.rweights, lv.pweights)
                        for lv in levels[lvl:])
        return fn(e, s, arrays, weights)

    if lvl == 0:
        cycmax_here = cycmax
    elif new_cycmax == 0 or cycle != 'F':
        cycmax_here = cycmax
    else:
        cycmax_here = new_cycmax

    it = 0
    fstacks = _level_fstacks(lev, lr_dir, mesh, batch, spdt=spdt)
    pparams = _level_pparams(lev, lr_dir, mesh, batch, pdt=spdt)
    while it < cycmax_here:
        e, rc, ec = _smooth_coarse_jit(
            e, s, lev.arrays, lev.rweights, lev.coarsen, nu_pre,
            lr_dir, lev.shape, mesh=mesh, batch=batch, fstacks=fstacks,
            pparams=pparams, spdt=spdt)
        if nu_pre > 0:
            report(it, cycmax_here, "pre-smoothing")

        ec = _mg_rec_host(ec, rc, levels, lvl + 1,
                          2 if cycle in ['F', 'W'] else 1,
                          cycmax_here - it, conf, sharding=sharding,
                          batch=batch, dbg=dbg, spdt=spdt)

        e = _prolong_smooth_jit(e, ec, lev.pweights, lev.coarsen, s,
                                lev.arrays, nu_post, lr_dir, lev.shape,
                                mesh=mesh, batch=batch, fstacks=fstacks,
                                pparams=pparams, spdt=spdt)
        if nu_post > 0:
            report(it, cycmax_here, "post-smoothing")

        it += 1
        if lvl == 0:
            break
    return e


def run_one_cycle(e, s, levels, conf, nu_init=0, sharding=None,
                  batch=False, dbg=None, spdt=None):
    """One top-level MG cycle (host-driven, piecewise-jitted).

    With ``batch=True`` the field pytrees carry a leading source-batch
    axis and every piece runs vmapped — one compiled program advances
    all sources at once (the on-device replacement of the reference's
    process-pool fan-out, simulations.py:862-867).
    """
    if nu_init > 0:
        mesh0 = _level_mesh(levels[0], sharding)
        e = _smooth_jit(e, s, levels[0].arrays, nu_init, conf[4],
                        levels[0].shape, mesh=mesh0, batch=batch,
                        fstacks=_level_fstacks(levels[0], conf[4],
                                               mesh0, batch),
                        pparams=_level_pparams(levels[0], conf[4],
                                               mesh0, batch))
        if dbg is not None:
            nrm = residual_norm(e, s, levels[0].arrays)
            dbg.cprint(_gs_info(0, 0, 1, levels[0].shape, nrm)
                       + "initial smoothing", 4)
    return _mg_rec_host(e, s, levels, 0,
                        2 if conf[3] in ['F', 'W'] else 1, 0, conf,
                        sharding=sharding, batch=batch, dbg=dbg,
                        spdt=spdt)


_CYCLE_CACHE = {}


def get_cycle_fn(levels, conf, nu_init=0):
    """Build (or fetch) the jitted one-top-level-cycle function."""
    static = tuple(
        (lv.shape, lv.coarsen,
         None,
         _freeze(lv.rweights), _freeze(lv.pweights))
        for lv in levels)
    key = (static, conf, nu_init)
    if key in _CYCLE_CACHE:
        return _CYCLE_CACHE[key]

    # Un-freeze weights back to arrays for closure capture? No:
    # weights are passed inside levels_arrays pytree.
    def cycle_fn(e, s, levels_arrays, weights):
        st = tuple(
            (lv_shape, lv_coarsen, None, w_r, w_p)
            for (lv_shape, lv_coarsen, _, _, _), (w_r, w_p)
            in zip(static, weights))
        if nu_init > 0:
            e = _smooth(e, s, levels_arrays[0], nu_init, conf[4],
                        static[0][0])
        return _mg_rec(e, s, levels_arrays, st, 0,
                       2 if conf[3] in ['F', 'W'] else 1, 0, conf,
                       is_top=True)

    fn = jax.jit(cycle_fn)
    _CYCLE_CACHE[key] = fn
    return fn


# ----------------------------------------------------------------------
# Chunked cycle dispatch: k top-level cycles per device dispatch.
#
# The host-driven cycle pays 3-6 tunnel dispatches per cycle; each
# costs milliseconds of host/RPC serialization on remote TPU backends
# (and tens of ms on a loaded tunnel — measured, hw_cycle_breakdown /
# hw_kernel_stages).  A chunk is ONE jit that scans k full cycles —
# convergence-norm per cycle computed in-graph and returned as a (k,)
# array — so the solve runs at device speed regardless of tunnel
# latency.  Used by multigrid() when the cycle configuration is
# constant across the chunk (sc/lr rotation ⇒ k=1 chunks, which still
# collapse the per-cycle dispatch count to one).
# ----------------------------------------------------------------------

_CHUNK_CYCLES = int(os.environ.get('EMG3D_TPU_CHUNK_CYCLES', 4))

# Whole-cycle chunk jits hold every level's temporaries live at once;
# above this fine-grid size the piecewise host-driven path is used
# instead (measured: the 256³ sc+lr chunk compile plans >12 GB of HLO
# temp and OOMs the chip at compile time — the default ceiling must
# therefore EXCLUDE 256³ = 16,777,216 cells).
_CHUNK_MAX_CELLS = int(float(os.environ.get('EMG3D_TPU_CHUNK_MAX_CELLS',
                                            16_000_000)))

_CHUNK_CACHE = {}


def _chunking():
    """Chunk cycles into single dispatches?  On by default on
    accelerator backends (where per-dispatch cost is milliseconds);
    off on CPU (keeps test behavior maximally reference-shaped) unless
    forced via EMG3D_TPU_CHUNK=1 (the chunked-path CPU tests do)."""
    env = os.environ.get('EMG3D_TPU_CHUNK')
    if env is not None:
        return env not in ('0', 'false', 'False')
    return jax.default_backend() != 'cpu'


def _get_chunk_fn(levels, conf, mode, k, spdt=None):
    """Jitted k-cycle executor for one of the three cycle forms.

    mode 'std':  e ← MG(e, s)                      carry: e
    mode 'corr': δ = MG(0, r); e += δ; r = s − Ae  carry: (e, r)
    mode 'ds':   δ = MG(0, rds); two-float accum   carry: (ehi, elo, rds)

    Returns ``(carry_out, norms)`` with norms[i] the cycle-i residual
    norm (squared-sum form as in :func:`_norm`), so the host's
    termination bookkeeping consumes one scalar per cycle from a
    single fetched array.
    """
    static = tuple((lv.shape, lv.coarsen, None,
                    _freeze(lv.rweights), _freeze(lv.pweights))
                   for lv in levels)
    key = (static, conf, mode, k, spdt)
    if key in _CHUNK_CACHE:
        return _CHUNK_CACHE[key]

    cycm = 2 if conf[3] in ('F', 'W') else 1

    def chunk_fn(state, s, arrays, weights, fst_seq, pp_seq):
        st = tuple((sh, co, None, wr, wp)
                   for (sh, co, _, _, _), (wr, wp)
                   in zip(static, weights))

        def delta_cycle(rhs):
            zero = tuple(cx.zeros_like(c) for c in rhs)
            return _mg_rec(zero, rhs, arrays, st, 0, cycm, 0, conf,
                           is_top=True, spdt=spdt, fst_seq=fst_seq,
                           pp_seq=pp_seq)

        if mode == 'std':
            def body(e_, _):
                e_ = _mg_rec(e_, s, arrays, st, 0, cycm, 0, conf,
                             is_top=True, fst_seq=fst_seq,
                             pp_seq=pp_seq)
                r = _residual_e(e_, s, arrays[0])
                return e_, _norm(*r)
        elif mode == 'corr':
            def body(carry, _):
                e_, r_ = carry
                delta = delta_cycle(r_)
                e_ = tuple(a + d for a, d in zip(e_, delta))
                r_ = _residual_e(e_, s, arrays[0])
                return (e_, r_), _norm(*r_)
        else:                                       # 'ds'
            def body(carry, _):
                ehi, elo, rds = carry
                delta = delta_cycle(rds)
                ehi, elo = _ds_accumulate(ehi, elo, delta)
                rds = _ds_residual(ehi, elo, s, arrays[0])
                return (ehi, elo, rds), _norm(*rds)

        return lax.scan(body, state, None, length=k)

    fn = jax.jit(chunk_fn)
    _CHUNK_CACHE[key] = fn
    return fn


def _get_chunk_fn_multi(levels_seq, conf_seq, mode, spdt=None):
    """Jitted k-cycle executor where each cycle carries its OWN
    (levels, conf) — the sc/lr schedule rotation folded into one
    device dispatch (round-4 rotating configs were locked to k=1
    chunks; the reference's default sslsolver+sc+lr config therefore
    paid a tunnel round trip per cycle — VERDICT r4 #3).

    The body is unrolled (trace-time Python loop) over ``conf_seq``
    since each cycle's static configuration differs.  Dispatched with
    one full rotation period per chunk the conf sequence repeats
    exactly, so every chunk after the first reuses one compile.

    Modes as :func:`_get_chunk_fn` plus ``'pre'``: a fixed-cycle
    preconditioner application e = MG_k(0, r) — no norms computed or
    fetched, signature ``fn(r, arrays_seq, weights_seq, fst_seqs,
    pp_seqs) -> e``.
    """
    static_seq = tuple(
        tuple((lv.shape, lv.coarsen, None,
               _freeze(lv.rweights), _freeze(lv.pweights))
              for lv in levels)
        for levels in levels_seq)
    key = ('multi', static_seq, conf_seq, mode, spdt)
    if key in _CHUNK_CACHE:
        return _CHUNK_CACHE[key]

    def one(e_, rhs, i, arrays, weights, fst_seq, pp_seq, use_spdt):
        conf = conf_seq[i]
        st = tuple((sh, co, None, wr, wp)
                   for (sh, co, _, _, _), (wr, wp)
                   in zip(static_seq[i], weights))
        cycm = 2 if conf[3] in ('F', 'W') else 1
        return _mg_rec(e_, rhs, arrays, st, 0, cycm, 0, conf,
                       is_top=True, spdt=spdt if use_spdt else None,
                       fst_seq=fst_seq, pp_seq=pp_seq)

    if mode == 'pre':
        def chunk_fn(r, arrays_seq, weights_seq, fst_seqs, pp_seqs):
            e_ = tuple(cx.zeros_like(c) for c in r)
            for i in range(len(conf_seq)):
                e_ = one(e_, r, i, arrays_seq[i], weights_seq[i],
                         fst_seqs[i], pp_seqs[i], True)
            return e_
    else:
        def chunk_fn(state, s, arrays_seq, weights_seq, fst_seqs,
                     pp_seqs):
            norms = []
            for i in range(len(conf_seq)):
                a_i, w_i = arrays_seq[i], weights_seq[i]
                f_i, p_i = fst_seqs[i], pp_seqs[i]
                if mode == 'std':
                    state = one(state, s, i, a_i, w_i, f_i, p_i, False)
                    norms.append(_norm(*_residual_e(state, s, a_i[0])))
                elif mode == 'corr':
                    e_, r_ = state
                    zero = tuple(cx.zeros_like(c) for c in r_)
                    delta = one(zero, r_, i, a_i, w_i, f_i, p_i, True)
                    e_ = tuple(a + d for a, d in zip(e_, delta))
                    r_ = _residual_e(e_, s, a_i[0])
                    state = (e_, r_)
                    norms.append(_norm(*r_))
                else:                                   # 'ds'
                    ehi, elo, rds = state
                    zero = tuple(cx.zeros_like(c) for c in rds)
                    delta = one(zero, rds, i, a_i, w_i, f_i, p_i, True)
                    ehi, elo = _ds_accumulate(ehi, elo, delta)
                    rds = _ds_residual(ehi, elo, s, a_i[0])
                    state = (ehi, elo, rds)
                    norms.append(_norm(*rds))
            return state, jnp.stack(norms)

    fn = jax.jit(chunk_fn)
    _CHUNK_CACHE[key] = fn
    return fn


def _chunk_args_multi(levels_seq, conf_seq, spdt=None):
    """Per-cycle (arrays, weights, fstacks, pparams) input tuples for a
    multi-conf chunk."""
    arrays_seq = tuple(tuple(lv.arrays for lv in levels)
                       for levels in levels_seq)
    weights_seq = tuple(tuple((lv.rweights, lv.pweights)
                              for lv in levels)
                        for levels in levels_seq)
    seqs = tuple(_chunk_seqs(lv, cf, spdt)
                 for lv, cf in zip(levels_seq, conf_seq))
    fst_seqs = tuple(sq[0] for sq in seqs)
    pp_seqs = tuple(sq[1] for sq in seqs)
    return arrays_seq, weights_seq, fst_seqs, pp_seqs


def _collect_rotation(ctx, var, k):
    """Consume k steps of the sc/lr schedules, returning the per-cycle
    (conf, levels) sequences the multi-conf chunk will run.  Cycle i
    uses the dirs that were current before its dispatch — identical
    bookkeeping to the per-cycle host loop."""
    conf_seq, levels_seq = [], []
    for _ in range(k):
        conf_seq.append((var.nu_pre, var.nu_coarse, var.nu_post,
                         var.cycle, int(var.lr_dir)))
        levels_seq.append(ctx.levels(int(var.sc_dir)))
        if var.sc_cycle:
            var.sc_dir = next(var.sc_cycle)
        if var.lr_cycle:
            var.lr_dir = next(var.lr_cycle)
    return tuple(conf_seq), tuple(levels_seq)


def _rotation_period(var):
    """Length of the combined (sc_dir, lr_dir) rotation schedule."""
    import math
    a = len(var._raw_sc_cycle) if var.sc_cycle else 1
    b = len(var._raw_lr_cycle) if var.lr_cycle else 1
    return a * b // math.gcd(a, b)


def _rotation_chunk_k(var, kmax):
    """Chunk size for rotating configs: the largest divisor of the
    rotation period that fits ``kmax`` — divisors keep the dispatch
    phase fixed, so the multi-conf chunk compiles once and is reused
    for every subsequent chunk of the solve."""
    per = _rotation_period(var)
    k = min(per, max(1, kmax))
    while per % k:
        k -= 1
    return k


def _chunk_k(l2_last, l2_prev, target, kmax, inflight=0):
    """Adaptive chunk size: predicted cycles until ``target`` (from
    the observed per-cycle factor), minus work already in flight —
    bounds the speculative cycles wasted past a convergence or
    mode-switch threshold to ~1."""
    if kmax <= 1:
        return max(1, kmax)
    if l2_last and l2_prev and l2_last > 0 and l2_prev <= l2_last:
        # Non-improving cycle: divergence/stagnation termination may
        # hit mid-chunk (the chunk-END iterate bakes in the extra
        # divergent cycles) — react per cycle.
        return 1
    if not l2_last or not l2_prev or l2_last <= 0 or target <= 0:
        k = min(2, kmax)
    else:
        import math
        fac = l2_last / l2_prev
        need = math.log(max(target / l2_last, 1e-300)) / math.log(fac)
        k = max(1, min(kmax, int(math.ceil(need)) + 1 - inflight))
    # Quantize to powers of two (≤ kmax): every distinct scan length
    # is a separate (expensive, remote) chunk compile.
    q = 1
    while q * 2 <= min(k, kmax):
        q *= 2
    return q


def _chunk_seqs(levels, conf, spdt=None):
    """Per-level cached fstacks/pparams tuples for a chunked cycle
    (probe-compiles every embedded Pallas shape as a side effect)."""
    fst_seq = tuple(_level_fstacks(lv, conf[4], None, False, spdt=spdt)
                    for lv in levels)
    pp_seq = tuple(_level_pparams(lv, conf[4], None, False, pdt=spdt)
                   for lv in levels)
    return fst_seq, pp_seq


def _freeze(x):
    """Hashable static descriptor of (nested) weight presence."""
    if x is None:
        return None
    if isinstance(x, tuple):
        return tuple(_freeze(i) for i in x)
    return 'arr'


def _weights_pytree(levels):
    return tuple((lv.rweights, lv.pweights) for lv in levels)


@jax.jit
def _norm(rx, ry, rz):
    return jnp.sqrt(jnp.sum(cx.abs2(rx)) + jnp.sum(cx.abs2(ry)) +
                    jnp.sum(cx.abs2(rz)))


def residual_norm(e, s, arrays):
    r = _jit_residual(e, s, arrays)
    return float(_norm(*r))


@jax.jit
def _jit_residual(e, s, arrays):
    return _residual_e(e, s, arrays)


# ======================================================================
# Host drivers: multigrid and krylov
# ======================================================================

class _SolveContext:
    """Per-solve state: device fields and level hierarchies per sc_dir."""

    def __init__(self, grid, vmodel, sfield, efield, var, sharding=None):
        self.grid = grid
        self.vmodel = vmodel
        self.var = var
        # jnp.asarray canonicalizes to 32-bit types when x64 is off
        # (the TPU fast path); use the canonical dtype downstream.
        # On backends without complex support (TPU), complex fields are
        # stored as split re/im pairs (cx.C2).
        is_cplx = np.iscomplexobj(np.asarray(sfield.fx))
        self.split = use_split_complex() and is_cplx
        if self.split:
            rdt = jax.dtypes.canonicalize_dtype(
                np.asarray(sfield.fx).real.dtype)
            self.s = tuple(cx.aspair(np.asarray(f), dtype=rdt) for f in
                           (sfield.fx, sfield.fy, sfield.fz))
            self.e = tuple(cx.aspair(np.asarray(f), dtype=rdt) for f in
                           (efield.fx, efield.fy, efield.fz))
            self.dtype = np.asarray(sfield.fx).dtype
        else:
            self.s = tuple(jnp.asarray(f) for f in
                           (sfield.fx, sfield.fy, sfield.fz))
            self.e = tuple(jnp.asarray(f, dtype=self.s[0].dtype) for f in
                           (efield.fx, efield.fy, efield.fz))
            self.dtype = self.s[0].dtype
        self.sharding = _normalize_sharding(sharding)
        self.e_lo = None      # two-float lo stream of the solution
        self._levels = {}
        # Each sc_dir's hierarchy holds ~2× the fine grid in η/ζ
        # stacks (plus its factor/param caches); at the 256³ class,
        # caching all four rotation hierarchies next to the Krylov
        # working set OOMs the chip (measured) — keep an LRU of 2
        # there (sc rotation revisits each dir every 3rd cycle; a
        # rebuild is device-side restriction chains, ≪ a cycle).
        big = int(np.prod(grid.shape_cells)) > 32_000_000
        self._levels_cap = int(os.environ.get(
            'EMG3D_TPU_LEVELS_CACHE', 2 if big else 8))

    def levels(self, sc_dir):
        if sc_dir not in self._levels:
            while len(self._levels) >= max(1, self._levels_cap):
                self._levels.pop(next(iter(self._levels)))
            clevel = int(self.var.clevel[int(sc_dir)])
            self._levels[sc_dir] = build_levels(
                self.grid, self.vmodel, int(sc_dir), clevel, self.dtype,
                split=self.split)
        else:
            self._levels[sc_dir] = self._levels.pop(sc_dir)  # LRU bump
        return self._levels[sc_dir]


def _normalize_sharding(sharding):
    if sharding is None:
        return None
    if isinstance(sharding, dict):
        return sharding
    return {'mesh': sharding}


def _pipelined_checks():
    """Overlap convergence-check fetches with the next cycle's compute.

    On accelerator backends a device->host scalar fetch costs a full
    round trip; dispatching cycle i+1 before fetching cycle i's norm
    hides that latency.  One cycle of work may be computed beyond the
    converged one (it is discarded) — results and iteration counts are
    unchanged.  Off on CPU (fetches are free, keeps tests simple).
    """
    env = os.environ.get('EMG3D_TPU_PIPELINE')
    if env is not None:
        return env not in ('0', 'false', 'False')
    return jax.default_backend() != 'cpu'


@jax.jit
def _ds_residual(ehi, elo, s, arrays):
    """r = s − A·(ehi + elo) in double-single arithmetic.

    Evaluating the matvec in plain f32 leaves ~2⁻²⁴·‖s‖ of rounding
    noise in the residual, which floors both the convergence check and
    the correction-form source at 1-10× a 1e-6 tolerance (measured).
    :func:`ops.dsres.residual_ds` pushes the evaluation noise to
    ~2⁻⁴⁸·‖s‖ with error-free transformations on the same operator.
    """
    from .ops.dsres import residual_ds
    return residual_ds(ehi, elo, s, arrays)


@jax.jit
def _ds_accumulate(ehi, elo, delta):
    """(ehi, elo) += delta with an exact (Knuth) two-sum per element.

    The hi stream stays a faithful f32 rounding of the accumulated
    solution; the lo stream carries the rounding remainders, pushing
    the representable solution accuracy to ~f32^2 — the storage floor
    measured in CLAUDE.md item 2 (the residual floor was the f32
    representation of e, not residual evaluation).
    """
    from .ops.dsres import _two_sum as two

    out_hi, out_lo = [], []
    for h, l, d in zip(ehi, elo, delta):
        if cx.is_c2(h):
            hr, lr = two(h.re, d.re + l.re)
            hi_, li_ = two(h.im, d.im + l.im)
            out_hi.append(cx.C2(hr, hi_))
            out_lo.append(cx.C2(lr, li_))
        else:
            hh, ll = two(h, d + l)
            out_hi.append(hh)
            out_lo.append(ll)
    return tuple(out_hi), tuple(out_lo)


# Warm-latency knobs of the single-solve Krylov refinement (see
# _refine_krylov; hardware-tuned at 32³, scripts/hw_warm32.py): the
# pass-0 tolerance loosening, how many shortcut applications to try
# before paying a full Krylov pass, and the MG cycles per shortcut
# (None = the full var.maxit preconditioner schedule).  With the
# per-iteration Krylov exit (no speculative iterations) the minimal
# schedule wins: pass-0 at full tol + ONE 1-cycle shortcut = 7 MG
# cycles / 2.3 s warm at 32³ (was 19-21 cycles / 3.1-3.2 s).
_REFINE_INNER_SCALE = 1.0
_REFINE_SHORTCUT_TRIES = 1
_REFINE_SHORTCUT_CYCLES = 1


def _refine_krylov(residual_fn, norm_fn, precond, inner, xhi, xlo,
                   atol, maxit, inner_scale=1.0, shortcut_tries=1):
    """Two-float iterative refinement around a Krylov inner solve.

    Shared by the single and the batched sslsolver paths: the Krylov
    RECURSIVE residual converges below tol, but with f32 solution
    storage the TRUE residual floors at a few e-6 (measured 4.3e-6 at
    32³) — so the solution accumulates as a two-float (hi, lo) pair,
    each pass solves the correction system for the double-single-
    evaluated true residual, and convergence is judged on THAT.

    ``norm_fn``/``atol`` may be scalars (single solve) or per-lane
    vectors (batched); termination is all-lanes.  ``inner(r0, x0,
    scale)`` runs one Krylov solve of the correction system with its
    tolerance loosened by ``scale`` and returns ``(dx, info)``.
    Returns ``(xhi, xlo, rn_true, info)``.

    ``inner_scale`` > 1 loosens the FIRST pass only: the Krylov loop
    then stops up to one half-iteration (= one preconditioner
    application) earlier when it lands within scale×tol, and the much
    cheaper refinement shortcut (one preconditioner application
    reduces the residual ~10-1000×) closes the gap; if it cannot, the
    next pass runs at the true tolerance — lost work is bounded by
    one residual evaluation.
    """
    info = 0
    rn_true = None
    for _pass in range(4):
        r0 = residual_fn(xhi, xlo)
        rn_true = norm_fn(r0)
        if np.all(rn_true <= atol):
            # The double-single true residual is the arbiter: a
            # converged solution clears any stale inner-pass code
            # (e.g. a near-convergence breakdown).
            info = 0
            break
        if info != 0 or _pass == 3:
            if info == 0:
                info = maxit
            break
        if _pass >= 1:
            # Refinement passes start within a few × tol of
            # convergence (the pass-0 recursive residual met its
            # loosened tol; only the f32 storage floor and the
            # loosening remain), so a few cheap preconditioner
            # applications usually close the gap — try up to
            # ``shortcut_tries`` of them, each ~1/4 the cost of a
            # full Krylov iteration (2 preconditioner applications
            # plus the lagged speculative iterate).
            done = False
            for _try in range(shortcut_tries):
                dx0 = precond(r0)
                xh2, xl2 = _ds_accumulate(xhi, xlo, dx0)
                r2 = residual_fn(xh2, xl2)
                rn2 = norm_fn(r2)
                if not np.all(rn2 <= rn_true):
                    break
                xhi, xlo, r0, rn_true = xh2, xl2, r2, rn2
                if np.all(rn2 <= atol):
                    info = 0
                    done = True
                    break
            if done:
                break
        zero = tuple(cx.zeros_like(c) for c in xhi)
        dx, info = inner(r0, zero, inner_scale if _pass == 0 else 1.0)
        xhi, xlo = _ds_accumulate(xhi, xlo, dx)
    return xhi, xlo, rn_true, info


def _ds_wanted(e, var):
    """Two-float accumulation applies: f32 storage and a tol below the
    single-float solution-representation floor (~2e-6 relative)."""
    return (cx.real_dtype_of(e[0]) == jnp.float32
            and float(var.tol) < 2e-5)


def _smooth_spdt(e):
    """s/params stream dtype for CORRECTION-FORM smoothing.

    bfloat16 halves the Pallas smoothers' dominant HBM traffic; valid
    only when the smoothed system's rhs is an exactly-evaluated outer
    residual (then the O(2⁻⁸) update bias cannot shift the outer
    fixed point — the smoother only needs to contract).  f32 fields
    on the TPU path only; EMG3D_TPU_BF16_SMOOTH=0 disables.
    """
    if os.environ.get('EMG3D_TPU_BF16_SMOOTH', '1') in ('0', 'false',
                                                        'False'):
        return None
    try:
        if cx.real_dtype_of(e[0]) != jnp.float32:
            return None
    except Exception:
        return None
    return jnp.bfloat16


def multigrid(ctx, var, e=None, s=None, track=True):
    """Run MG cycles with the reference's termination logic.

    If ``e``/``s`` are given, runs on those fields (used as Krylov
    preconditioner); else on ctx.e/ctx.s (stand-alone, stores back).

    Stand-alone f32 solves switch to two-float (hi, lo) solution
    storage once the error nears the f32 representation floor: each
    further cycle runs in correction form (δ = MG(0, r)) and
    accumulates δ with a compensated two-sum, with the convergence
    residual evaluated as (s − A·hi) − A·lo.  This reaches the
    reference's default tol=1e-6 with float32 fields.
    """
    from collections import deque

    standalone = e is None
    if standalone:
        e, s = ctx.e, ctx.s

    fine = ctx.levels(int(var.sc_dir))[0]
    l2_last = residual_norm(e, s, fine.arrays)
    l2_prev = None
    l2_stag = np.ones(var._maxcycle) * l2_last
    # As a Krylov PRECONDITIONER the rhs is an (often unit-normalized)
    # basis vector, not the source: convergence/divergence must be
    # judged against THIS call's rhs norm, or a small-norm source
    # makes the very first check read as "diverged" (l2 ≈ ‖basis‖ = 1
    # > 10·‖s‖) and spuriously aborts the outer solver (gcrotmk).
    refe = var.l2_refe if standalone else l2_last

    dbg = var if var.verb > 4 else None
    if dbg is not None:
        var.cprint("     it cycmax               error", 4)
        var.cprint("      level [  dimension  ]            info\n", 4)
        var.cprint(_gs_info(0, 0, var.cycmax, fine.shape, l2_last)
                   + "initial error", 4)

    lookahead = 1 if dbg is not None else \
        (2 if _pipelined_checks() else 1)
    pending = deque()
    it_disp = 0   # dispatched cycles
    it = 0        # checked cycles
    first = True
    elo = None    # two-float lo stream (activated near the f32 floor)
    rds = None
    ds_tau = max(100.0 * float(var.tol), 1e-5)
    result = (e, None)
    # Standalone f32 solves run in CORRECTION FORM from the first
    # cycle (δ = MG(0, r) with r evaluated exactly outside): identical
    # iteration mathematically, but it licenses bfloat16 s/params
    # streaming inside the Pallas smoothers (the cycle's update bias
    # cannot shift the fixed point of e += δ, r = s − A·e).
    spdt = _smooth_spdt(e) if standalone else None
    corr = spdt is not None and var.nu_init == 0
    r_plain = None

    # Chunked dispatch: k cycles per device call (one jit scanning the
    # whole cycle body) removes the 3-6 per-cycle tunnel dispatches.
    # Conditions: no per-step debug logging, unsharded (the chunk jits
    # don't annotate meshes), a fine grid below the chunk-memory
    # ceiling (a whole-cycle jit holds every level's temporaries —
    # incl. inline-rebuilt line-factor stacks — LIVE at once: at 256³
    # that is >12 GB of HLO temp and the compile itself OOMs the
    # 16 GB chip; the piecewise host-driven path frees between
    # pieces), and — for k>1 — a cycle configuration that is constant
    # across the chunk (sc/lr rotation ⇒ k=1).
    use_chunks = (_chunking() and dbg is None and ctx.sharding is None
                  and int(np.prod(fine.shape)) <= _CHUNK_MAX_CELLS)

    while True:
        # Dispatch cycles (up to `lookahead` groups in flight).
        while it_disp < var.maxit and len(pending) < lookahead:
            conf = (var.nu_pre, var.nu_coarse, var.nu_post, var.cycle,
                    int(var.lr_dir))
            levels = ctx.levels(int(var.sc_dir))
            nu_init = var.nu_init if first else 0
            if first and var.verb > 3 and var._first_cycle:
                _qc_levels(var._level_all, len(levels), 0,
                           2 if var.cycle in ('F', 'W') else 1, 0,
                           var.cycle)
            first = False

            if use_chunks and nu_init == 0:
                rotating = bool(var.sc_cycle) or bool(var.lr_cycle)
                if rotating:
                    # One full rotation period (or a divisor of it —
                    # fixed dispatch phase = one compile) per chunk;
                    # react per-cycle when the residual stopped
                    # improving (divergence/stagnation can terminate
                    # mid-chunk and the chunk-END iterate would bake
                    # in the extra divergent cycles) or when the
                    # predicted cycles-to-target are fewer than the
                    # chunk (an overshot sc+lr cycle costs far more
                    # device time than an extra dispatch).
                    kc = _rotation_chunk_k(var, var.maxit - it_disp)
                    if l2_last and l2_prev and l2_last > 0:
                        if l2_prev <= l2_last:
                            kc = 1
                        else:
                            import math
                            fac = l2_last / l2_prev
                            need = (math.log(max(float(var.tol) * refe
                                                 / l2_last, 1e-300))
                                    / math.log(fac))
                            if need - (it_disp - it) <= kc - 0.5:
                                kc = 1
                else:
                    # Next threshold the host must react at: final
                    # convergence, or the two-float mode switch.
                    target = float(var.tol) * refe
                    if (standalone and elo is None
                            and _ds_wanted(e, var)):
                        target = max(target, ds_tau * var.l2_refe)
                    kc = _chunk_k(l2_last, l2_prev,
                                  target,
                                  min(_CHUNK_CYCLES,
                                      var.maxit - it_disp),
                                  inflight=it_disp - it)
                mode = 'ds' if elo is not None else \
                    ('corr' if corr else 'std')
                spdt_c = spdt if mode != 'std' else None
                if mode == 'ds':
                    state = (e, elo, rds)
                elif mode == 'corr':
                    if r_plain is None:
                        r_plain = _jit_residual(e, s, levels[0].arrays)
                    state = (e, r_plain)
                else:
                    state = e
                if rotating:
                    conf_seq, levels_seq = _collect_rotation(
                        ctx, var, kc)
                    fn = _get_chunk_fn_multi(levels_seq, conf_seq,
                                             mode, spdt_c)
                    margs = _chunk_args_multi(levels_seq, conf_seq,
                                              spdt_c)
                    out, norms = fn(state, s, *margs)
                else:
                    fst_seq, pp_seq = _chunk_seqs(levels, conf, spdt_c)
                    fn = _get_chunk_fn(levels, conf, mode, kc, spdt_c)
                    arrays = tuple(lv.arrays for lv in levels)
                    weights = tuple((lv.rweights, lv.pweights)
                                    for lv in levels)
                    out, norms = fn(state, s, arrays, weights, fst_seq,
                                    pp_seq)
                if mode == 'ds':
                    e, elo, rds = out
                elif mode == 'corr':
                    e, r_plain = out
                else:
                    e = out
                pending.append(((e, elo), norms, kc))
                it_disp += kc
                if not rotating:
                    for _ in range(kc):
                        if var.sc_cycle:
                            var.sc_dir = next(var.sc_cycle)
                        if var.lr_cycle:
                            var.lr_dir = next(var.lr_cycle)
            elif elo is not None:
                # Correction form: δ = MG(0, r) + compensated update.
                zero = tuple(cx.zeros_like(c) for c in e)
                delta = run_one_cycle(zero, rds, levels, conf,
                                      sharding=ctx.sharding, dbg=dbg,
                                      spdt=spdt)
                e, elo = _ds_accumulate(e, elo, delta)
                rds = _ds_residual(e, elo, s, levels[0].arrays)
                pending.append(((e, elo), _norm(*rds), 1))
                it_disp += 1
            elif corr:
                # Plain-f32 correction form (see above).
                if r_plain is None:
                    r_plain = _jit_residual(e, s, levels[0].arrays)
                zero = tuple(cx.zeros_like(c) for c in e)
                delta = run_one_cycle(zero, r_plain, levels, conf,
                                      sharding=ctx.sharding, dbg=dbg,
                                      spdt=spdt)
                e = tuple(a + d for a, d in zip(e, delta))
                r_plain = _jit_residual(e, s, levels[0].arrays)
                pending.append(((e, None), _norm(*r_plain), 1))
                it_disp += 1
            else:
                e = run_one_cycle(e, s, levels, conf, nu_init=nu_init,
                                  sharding=ctx.sharding, dbg=dbg)
                r = _jit_residual(e, s, levels[0].arrays)
                pending.append(((e, None), _norm(*r), 1))
                it_disp += 1

            if not (use_chunks and nu_init == 0):
                # Advance sc/lr schedules (per top-level cycle).
                if var.sc_cycle:
                    var.sc_dir = next(var.sc_cycle)
                if var.lr_cycle:
                    var.lr_dir = next(var.lr_cycle)

            # With lookahead, delay the first check until a second
            # group is in flight.
            if len(pending) < lookahead and it_disp < var.maxit:
                continue

        # Check the oldest in-flight group (reference bookkeeping:
        # store the previous error at slot (it-1) BEFORE incrementing,
        # compare the new error against the value of the same cycle
        # type, maxcycle checks ago; solver.py:519-521, 588-604).
        # A chunk contributes k per-cycle norms from ONE fetched
        # array; its state is the chunk-END iterate — if termination
        # hits mid-chunk the extra cycles are included (they only
        # further reduce the residual on a CONVERGED exit; on the
        # pathological DIVERGED/STAGNATED exits the returned iterate
        # is up to k−1 cycles past the reference's).
        e_i, nrm_i, k_i = pending.popleft()
        vals = np.atleast_1d(np.asarray(nrm_i)).astype(float)
        terminated = False
        want_ds = False
        # Under chunked dispatch one wall-clock reading covers all k
        # cycles of the group — interpolate timestamps linearly so
        # error-vs-runtime curves stay per-cycle shaped.
        if track:
            t_prev = (float(var.runtime_at_cycle[-1])
                      if len(var.runtime_at_cycle) else 0.0)
            t_now = var.time.elapsed
        for j, v in enumerate(vals):
            l2_stag[(it - 1) % var._maxcycle] = l2_last
            it += 1
            var.it += 1
            l2_prev = l2_last
            l2_last = float(v)

            if track:
                var.runtime_at_cycle = np.r_[
                    var.runtime_at_cycle,
                    t_prev + (t_now - t_prev) * (j + 1) / len(vals)]
                var.error_at_cycle = np.r_[var.error_at_cycle, l2_last]
                _print_cycle_info(var, l2_last, l2_prev)

            if _terminate(var, l2_last,
                          l2_stag[(it - 1) % var._maxcycle], it,
                          refe=refe):
                # Any further in-flight work is simply discarded;
                # var.it only ever counted checked cycles.
                terminated = True
                break

            # Two-float accumulation once the checked error nears the
            # f32 solution-representation floor (applied to future
            # dispatches after this group drains).
            if (standalone and elo is None and not want_ds
                    and _ds_wanted(e, var)
                    and l2_last < ds_tau * var.l2_refe):
                want_ds = True

        result = e_i
        if terminated:
            break
        if want_ds and elo is None:
            elo = tuple(cx.zeros_like(c) for c in e)
            rds = _ds_residual(
                e, elo, s, ctx.levels(int(var.sc_dir))[0].arrays)

    var.l2 = l2_last
    ehi_f, elo_f = result
    if standalone:
        ctx.e = ehi_f
        ctx.e_lo = elo_f
    return ehi_f


def _qc_levels(out, nlevels, lvl, cycmax, new_cycmax, cycle):
    """Replay the cycle's level visits for the QC graph.

    Mirrors the recursion's control flow (incl. the F-cycle
    ``cycmax - it`` trick); records a level at call entry and again
    after every prolongation, like the reference (solver.py:496, 567).
    """
    out.append(lvl)
    if lvl == nlevels - 1:
        return
    if lvl == 0 or new_cycmax == 0 or cycle != 'F':
        cm = cycmax
    else:
        cm = new_cycmax
    it = 0
    while it < cm:
        _qc_levels(out, nlevels, lvl + 1,
                   2 if cycle in ('F', 'W') else 1, cm - it, cycle)
        out.append(lvl)
        it += 1
        if lvl == 0:
            break


def _qc_graph(level_seq, width=70):
    """ASCII rendering of the level trajectory (verb>3 QC figure).

    One column per level transition; row r is grid 2^(r+1)h; a
    descent to a coarser grid draws ``\\``, an ascent ``/``.
    """
    seq = np.asarray(level_seq, dtype=int)
    if seq.size < 2:
        return ""
    frm, to = seq[:-1], seq[1:]
    row = np.minimum(frm, to)
    down = to > frm
    ncol = min(len(row), width)
    lines = ["       h_"]
    for r in range(int(seq.max())):
        marks = ''.join(
            ('\\' if down[v] else '/') if row[v] == r and frm[v] != to[v]
            else ' ' for v in range(ncol))
        lines.append(f"   {2**(r+1):4}h_ {marks}")
    out = "\n".join(lines) + "\n\n"
    if len(row) > width:
        out += (f"  (Cycle-QC restricted to first {width} steps of "
                f"{len(row)} steps.)\n")
    return out


def _print_cycle_info(var, l2_last, l2_prev):
    """Per-cycle log line (reference parity: solver.py:1575-1648)."""
    if var.verb < 0:
        var.one_liner(l2_last)
        return
    if var.verb < 3:
        return
    info = "\n" if var.verb > 4 else ""
    if var._first_cycle:
        if var.verb > 3 and var._level_all:
            info += _qc_graph(var._level_all)
        elif var.verb > 3:
            info += "\n"
        var._first_cycle = False
    info += f"   [{var.time.now}]   {l2_last/var.l2_refe:.3e} "
    info += f"after {var.it:3} {var.cycle}-cycles; "
    info += f"[{l2_last:.3e}, {l2_last/max(l2_prev, 1e-300):.3f}]"
    info += f" {int(var.sc_dir)} {int(var.lr_dir)}"
    if var.verb > 4:
        info += "\n"
    var.cprint(info, 3)


def _terminate(var, l2_last, l2_stag, it, refe=None):
    """Termination criteria (reference parity: solver.py:1682-1744).

    ``refe`` overrides the reference norm (preconditioner calls judge
    against their own rhs norm, see :func:`multigrid`).
    """
    if refe is None:
        refe = var.l2_refe
    finished = False
    sslabort = False

    if l2_last < var.tol * refe:
        var.exit_message = "CONVERGED"
        finished = True
    elif l2_last > 10 * refe or not np.isfinite(l2_last):
        var.exit_message = "DIVERGED"
        finished = True
        sslabort = True
    elif it > 2 and l2_last >= l2_stag:
        var.exit_message = "STAGNATED"
        finished = True
        sslabort = True
    elif it == var.maxit:
        if not var.sslsolver:
            var.exit_message = "MAX. ITERATION REACHED, NOT CONVERGED"
        finished = True

    if finished:
        if var.sslsolver and sslabort:
            raise _ConvergenceError
        elif not var.sslsolver:
            add = "\n" if var.verb < 5 else ""
            var.cprint(add + "   > " + var.exit_message, 2)
    return finished


class _ConvergenceError(Exception):
    """Raised to abort the Krylov loop on divergence/stagnation."""


def _dot(a, b):
    """Standard complex inner product <a, b> = sum(conj(a)*b)."""
    tot = 0j
    for x, y in zip(a, b):
        if cx.is_c2(x):
            re = jnp.sum(x.re * y.re + x.im * y.im)
            im = jnp.sum(x.re * y.im - x.im * y.re)
            tot = tot + complex(float(re), float(im))
        else:
            tot = tot + complex(jnp.vdot(x, y))
    return tot


def _axpy(alpha, x, y):
    return tuple(yy + alpha * xx for xx, yy in zip(x, y))


def krylov(ctx, var):
    """MG-preconditioned BiCGSTAB/CGS (reference: solver.py:610-734).

    Matches scipy's algorithms so iteration counts are comparable; the
    preconditioner M is one MG cycle (with sc/lr schedules advancing one
    step per application).
    """
    fine = ctx.levels(int(var.sc_dir))[0]
    arrays = fine.arrays
    s = ctx.s
    x = ctx.e

    def matvec(e):
        return stencil.amat(*e, *arrays)

    def precond(r):
        ez = tuple(cx.zeros_like(c) for c in r)
        try:
            return multigrid(ctx, var, e=ez, s=r, track=False)
        except _ConvergenceError:
            raise

    def callback(xk, l2=None):
        var._ssl_it += 1
        var.runtime_at_cycle = np.r_[var.runtime_at_cycle,
                                     var.time.elapsed]
        var.l2 = residual_norm(xk, s, arrays) if l2 is None else l2
        var.error_at_cycle = np.r_[var.error_at_cycle, var.l2]
        if var.verb > 3:
            log = f"   [{var.time.now}]   {var.l2/var.l2_refe:.3e} "
            log += f" after {var._ssl_it:3} {var.sslsolver}-cycles"
            var.cprint(log, 3)
        elif var.verb < 0:
            var.one_liner(var.l2)

    bnorm = float(_norm(*s))
    atol = max(float(var.tol) * bnorm, 1e-30)
    l2_final = None

    try:
        if var.sslsolver in ('bicgstab', 'cgs') and ctx.split and \
                _pipelined_checks():
            # Device-resident Krylov scalars + fixed-cycle MG
            # preconditioner: zero blocking host syncs per iteration
            # except the one lagged diagnostics fetch.  Unit-norm
            # scaling keeps the f32 recurrence scalars (4th powers of
            # residual magnitudes in the diagnostics) above the f32
            # underflow threshold — same fix as the batched path.
            #
            # Iterative refinement around the Krylov loop — see
            # :func:`_refine_krylov` (shared with the batched path).
            sc = 1.0 / max(bnorm, 1e-300)
            from .ops.dsres import residual_ds
            s_n = tuple(c * sc for c in s)
            xhi = tuple(c * sc for c in x)
            xlo = tuple(cx.zeros_like(c) for c in xhi)
            atol_n = max(float(var.tol), 1e-30)

            def precond_fast(r):
                return _precond_fixed_cycles(ctx, var, r, batch=False)

            def precond_short(r):
                # Refinement shortcut: the gap left by pass-0 is a
                # handful of ×tol; a shortened MG application can
                # close it at a fraction of the full preconditioner
                # schedule (knob-tuned on hardware).
                return _precond_fixed_cycles(
                    ctx, var, r, batch=False,
                    cycles=_REFINE_SHORTCUT_CYCLES)

            kernel = _bicgstab_device if var.sslsolver == 'bicgstab' \
                else _cgs_device

            def inner(r0, x0, scale=1.0):
                return kernel(matvec, precond_fast, r0, x0,
                              scale * atol_n, var.ssl_maxit, callback,
                              l2scale=bnorm)

            xhi, xlo, rnorm_true, info = _refine_krylov(
                lambda h, l: residual_ds(h, l, s_n, arrays),
                lambda r: float(_norm(*r)),
                precond_short, inner, xhi, xlo, atol_n, var.ssl_maxit,
                inner_scale=_REFINE_INNER_SCALE,
                shortcut_tries=_REFINE_SHORTCUT_TRIES)

            x = tuple(c * bnorm for c in xhi)
            ctx.e_lo = tuple(c * bnorm for c in xlo)
            l2_final = rnorm_true * bnorm
        elif var.sslsolver == 'gcrotmk' and ctx.split and \
                _pipelined_checks():
            # Device-basis GCROT(m,k) under the same two-float
            # refinement wrapper as bicgstab/cgs: unit-norm system,
            # fixed-cycle preconditioner, true-residual convergence.
            sc = 1.0 / max(bnorm, 1e-300)
            from .ops.dsres import residual_ds
            s_n = tuple(c * sc for c in s)
            xhi = tuple(c * sc for c in x)
            xlo = tuple(cx.zeros_like(c) for c in xhi)
            atol_n = max(float(var.tol), 1e-30)

            def gc_inner(r0, x0, scale=1.0):
                return _gcrotmk_device(
                    matvec,
                    lambda r: _precond_fixed_cycles(ctx, var, r,
                                                    batch=False),
                    r0, x0, scale * atol_n, var.ssl_maxit, callback,
                    l2scale=bnorm)

            xhi, xlo, rnorm_true, info = _refine_krylov(
                lambda h, l: residual_ds(h, l, s_n, arrays),
                lambda r: float(_norm(*r)),
                lambda r: _precond_fixed_cycles(
                    ctx, var, r, batch=False,
                    cycles=_REFINE_SHORTCUT_CYCLES),
                gc_inner, xhi, xlo, atol_n, var.ssl_maxit,
                inner_scale=_REFINE_INNER_SCALE,
                shortcut_tries=_REFINE_SHORTCUT_TRIES)

            x = tuple(c * bnorm for c in xhi)
            ctx.e_lo = tuple(c * bnorm for c in xlo)
            l2_final = rnorm_true * bnorm
        elif var.sslsolver == 'bicgstab':
            x, info = _bicgstab(matvec, precond, s, x, atol,
                                var.ssl_maxit, callback)
        elif var.sslsolver == 'cgs':
            x, info = _cgs(matvec, precond, s, x, atol,
                           var.ssl_maxit, callback)
        elif os.environ.get('EMG3D_TPU_SCIPY_GCROT'):
            # Compatibility-only: scipy owns the recurrence, full
            # device pytrees round-trip through the host per matvec.
            x, info = _scipy_gcrotmk(ctx, var, matvec, precond, s, x,
                                     callback)
        else:
            x, info = _gcrotmk_device(matvec, precond, s, x, atol,
                                      var.ssl_maxit, callback)
    except _ConvergenceError:
        info = -1
        x = tuple(cx.zeros_like(c) for c in s)
        ctx.e_lo = None
        l2_final = None
        var.exit_message += " (returned field is zero)"

    pre = "\n   > "
    if info < 0:
        if var.exit_message == '':
            var.exit_message = f"Error in {var.sslsolver} ({info})"
        pre = "\n* ERROR   :: "
    elif info > 0:
        var.exit_message = "MAX. ITERATION REACHED, NOT CONVERGED"
    else:
        var.exit_message = "CONVERGED"
    var.cprint(pre + var.exit_message, 2)

    ctx.e = x
    # The two-float path reports the double-single-evaluated true
    # residual (the plain f32 evaluation would report its own noise
    # floor); the host-scalar paths evaluate as before.
    var.l2 = l2_final if l2_final is not None \
        else residual_norm(x, s, arrays)
    return x


def _scipy_gcrotmk(ctx, var, matvec, precond, b, x, callback):
    """GCROT(m,k) via scipy on host-flattened vectors.

    scipy owns the Krylov recurrence; device work (matvec = stencil,
    preconditioner = one MG cycle) round-trips through the host — the
    same inversion of control as the reference (solver.py:610-734).
    """
    import scipy.sparse.linalg as ssl

    shapes = [tuple(np.shape(cx.tocomplex(c))) for c in b]
    sizes = [int(np.prod(sh)) for sh in shapes]
    split = ctx.split

    def to_flat(t):
        return np.concatenate(
            [np.asarray(cx.tocomplex(c)).ravel() for c in t])

    def from_flat(v):
        out = []
        o = 0
        for sh, n in zip(shapes, sizes):
            a = v[o:o+n].reshape(sh)
            o += n
            if split:
                out.append(cx.aspair(a, dtype=ctx.s[0].re.dtype))
            else:
                out.append(jnp.asarray(a))
        return tuple(out)

    nn = sum(sizes)

    def mv(v):
        return to_flat(matvec(from_flat(v)))

    def pc(v):
        return to_flat(precond(from_flat(v)))

    A = ssl.LinearOperator((nn, nn), dtype=np.complex128, matvec=mv)
    M = ssl.LinearOperator((nn, nn), dtype=np.complex128, matvec=pc)

    def cb(xk):
        callback(from_flat(xk))

    xf, info = ssl.gcrotmk(A, to_flat(b), x0=to_flat(x),
                           rtol=var.tol, atol=1e-30, M=M,
                           maxiter=var.ssl_maxit, callback=cb)
    return from_flat(xf), info


# ----------------------------------------------------------------------
# Device-native GCROT(m, k)
#
# The scipy fallback above round-trips FULL device pytrees through the
# host on every matvec/preconditioner call — tunnel-latency-bound on
# accelerator backends.  The native implementation below keeps the
# Krylov basis (V), the flexible preconditioned vectors (Z) and the
# recycled (C, U) pairs as device-resident stacks; the host sees one
# small packed fetch per inner step (the Hessenberg column + the new
# basis norm) and runs only the tiny (<= m x m) least-squares updates.
# Reference parity: emg3d/solver.py:610-734 (scipy gcrotmk semantics,
# Hicken & Zingg truncated recycling).
# ----------------------------------------------------------------------

_GCROT_M = int(os.environ.get('EMG3D_TPU_GCROT_M', 20))
_GCROT_K = int(os.environ.get('EMG3D_TPU_GCROT_K', 10))


def _st_dots(stacks, w):
    """<stack_i, w> over all field components -> (S,) C2 scalars.

    ``stacks`` holds one slot-stacked array per component (leading
    axis = slot); the dot is the standard complex inner product
    sum(conj(stack_i) * w) reduced over every component."""
    re = im = None
    for B, x in zip(stacks, w):
        if cx.is_c2(x):
            nd = x.re.ndim
            ax = (tuple(range(1, nd + 1)), tuple(range(nd)))
            r_ = (jnp.tensordot(B.re, x.re, ax)
                  + jnp.tensordot(B.im, x.im, ax))
            i_ = (jnp.tensordot(B.re, x.im, ax)
                  - jnp.tensordot(B.im, x.re, ax))
        else:
            nd = x.ndim
            ax = (tuple(range(1, nd + 1)), tuple(range(nd)))
            d = jnp.tensordot(jnp.conj(B), x, ax)
            r_, i_ = jnp.real(d), jnp.imag(d)
        re = r_ if re is None else re + r_
        im = i_ if im is None else im + i_
    return cx.C2(re, im)


def _st_comb(stacks, coef):
    """sum_i coef_i * stack_i per component (coef: (S,) C2 scalars)."""
    out = []
    for B in stacks:
        if cx.is_c2(B):
            ax = ((0,), (0,))
            re = (jnp.tensordot(coef.re, B.re, ax)
                  - jnp.tensordot(coef.im, B.im, ax))
            im = (jnp.tensordot(coef.re, B.im, ax)
                  + jnp.tensordot(coef.im, B.re, ax))
            out.append(cx.C2(re, im))
        else:
            cc = jax.lax.complex(coef.re, coef.im).astype(B.dtype)
            out.append(jnp.tensordot(cc, B, ((0,), (0,))))
    return tuple(out)


def _st_zeros(nslots, like):
    """Slot stacks of zeros shaped after the field pytree ``like``."""
    out = []
    for c in like:
        if cx.is_c2(c):
            sh = (nslots,) + c.re.shape
            out.append(cx.C2(jnp.zeros(sh, c.re.dtype),
                             jnp.zeros(sh, c.re.dtype)))
        else:
            out.append(jnp.zeros((nslots,) + c.shape, c.dtype))
    return tuple(out)


@jax.jit
def _gc_append(stack, idx, v, scale):
    """Slot write: stack[idx] := v * scale (scale: real device scalar)."""
    out = []
    for B, c in zip(stack, v):
        if cx.is_c2(c):
            out.append(cx.C2(B.re.at[idx].set(c.re * scale),
                             B.im.at[idx].set(c.im * scale)))
        else:
            out.append(B.at[idx].set(c * scale))
    return tuple(out)


@jax.jit
def _gc_ortho(cstack, vstack, cmask, vmask, w):
    """Orthogonalize w against the active C and V slots (CGS2).

    Two classical Gram-Schmidt passes in one dispatch (as stable as
    modified GS); inactive slots are masked to zero so slot counts
    never recompile.  Returns the orthogonalized w, its norm, and ONE
    packed real vector [cd.re, cd.im, vd.re, vd.im, wnorm] for a
    single host fetch per inner step.
    """
    def masked(d, mk):
        return cx.C2(d.re * mk, d.im * mk)

    def gs_pass(w_):
        cd = masked(_st_dots(cstack, w_), cmask)
        vd = masked(_st_dots(vstack, w_), vmask)
        w_ = tuple(ww - cc - vv for ww, cc, vv in
                   zip(w_, _st_comb(cstack, cd), _st_comb(vstack, vd)))
        return w_, cd, vd

    w, cd1, vd1 = gs_pass(w)
    w, cd2, vd2 = gs_pass(w)
    cd = cd1 + cd2
    vd = vd1 + vd2
    wn = jnp.sqrt(_dot_d(w, w).re)
    pk = jnp.concatenate([cd.re, cd.im, vd.re, vd.im, wn[None]])
    return w, wn, pk


@jax.jit
def _gc_form(vstack, zstack, ustack, hy, y, yb):
    """The new outer pair before normalization.

    cx_raw = V·(H y) is the A-image of ux_raw = Z·y − U·(B y) in the
    C-complement (A Z = C B + V H by the projected Arnoldi relation).
    """
    cxr = _st_comb(vstack, hy)
    uxr = tuple(zz - uu for zz, uu in
                zip(_st_comb(zstack, y), _st_comb(ustack, yb)))
    return cxr, uxr


@jax.jit
def _gc_update(x, r, cxr, uxr):
    """x/r update along the new direction + packed diagnostics.

    gamma = <c_new, r> with c_new = cxr/||cxr||; x += gamma·u_new,
    r −= gamma·c_new.  Returns the updated pair, rsqrt(||cxr||²) (the
    slot-write scale) and [||r_new||², ||cxr||²] for one fetch.
    """
    n2 = _dot_d(cxr, cxr).re
    g = _dot_d(cxr, r)
    inv = jax.lax.rsqrt(jnp.maximum(n2, jnp.finfo(n2.dtype).tiny))
    if cx.is_c2(x[0]):
        coef = cx.C2(g.re / n2, g.im / n2)
    else:
        coef = jax.lax.complex(g.re / n2, g.im / n2).astype(x[0].dtype)
    x_new = tuple(xx + coef * uu for xx, uu in zip(x, uxr))
    r_new = tuple(rr - coef * cc for rr, cc in zip(r, cxr))
    rn2 = _dot_d(r_new, r_new).re
    return x_new, r_new, inv, jnp.stack([rn2, n2])


def _coef_dev(c, like):
    """Host complex coefficient vector -> device scalars matching the
    field representation (C2 pair on the split path)."""
    dt = cx.real_dtype_of(like[0])
    return cx.C2(jnp.asarray(np.real(c), dt), jnp.asarray(np.imag(c), dt))


def _gcrotmk_device(matvec, precond, b, x, atol, maxiter, callback,
                    m=None, k=None, l2scale=1.0):
    """GCROT(m, k) with a device-resident basis and recycled subspace.

    Flexible inner FGMRES(m) (the preconditioner may vary — here it is
    a fixed number of MG cycles with advancing sc/lr schedules), outer
    recycling of k (c, u) pairs with oldest-out truncation.  All basis
    vectors stay on device; per inner step the host fetches one packed
    (4·slots+1)-float vector and solves a ≤ m×m least-squares problem.
    Works on both representations (CPU complex, TPU split C2).
    """
    m = _GCROT_M if m is None else m
    k = _GCROT_K if k is None else k
    dt = cx.real_dtype_of(b[0])

    r = tuple(bb - aa for bb, aa in zip(b, matvec(x)))
    rn = float(_norm(*r))
    if rn <= atol or maxiter == 0:
        return x, 0

    cstack = _st_zeros(k, r)
    ustack = _st_zeros(k, r)
    vstack = _st_zeros(m + 1, r)
    zstack = _st_zeros(m, r)
    cmask = np.zeros(k, np.float64 if dt == jnp.float64 else np.float32)
    cu_next = 0

    for _cycle in range(maxiter):
        beta = rn
        vstack = _gc_append(vstack, np.int32(0), r,
                            jnp.asarray(1.0 / beta, dt))
        v_cur = tuple(c * (1.0 / beta) for c in r)
        vmask = np.zeros(m + 1, cmask.dtype)
        vmask[0] = 1.0
        cmask_d = jnp.asarray(cmask)

        H = np.zeros((m + 1, m), np.complex128)
        Bm = np.zeros((k, m), np.complex128)
        e1 = np.zeros(m + 1, np.complex128)
        e1[0] = beta
        j = 0
        y = None
        while j < m:
            z = precond(v_cur)
            w = matvec(z)
            zstack = _gc_append(zstack, np.int32(j), z,
                                jnp.asarray(1.0, dt))
            w, _wn_d, pk = _gc_ortho(cstack, vstack, cmask_d,
                                     jnp.asarray(vmask), w)
            pk = np.asarray(pk, np.float64)            # ONE fetch
            cd = pk[:k] + 1j * pk[k:2 * k]
            vd = pk[2 * k:2 * k + m + 1] + 1j * pk[2 * k + m + 1:-1]
            wn = float(pk[-1])
            H[:, j] = vd
            H[j + 1, j] = wn
            Bm[:, j] = cd
            happy = not np.isfinite(wn) or wn <= 1e-30
            if not happy and j + 1 < m + 1:
                vstack = _gc_append(vstack, np.int32(j + 1), w,
                                    jnp.asarray(1.0 / wn, dt))
                vmask[j + 1] = 1.0
                v_cur = tuple(c * (1.0 / wn) for c in w)
            j += 1
            y = np.linalg.lstsq(H[:j + 1, :j], e1[:j + 1],
                                rcond=None)[0]
            pres = np.linalg.norm(e1[:j + 1] - H[:j + 1, :j] @ y)
            if pres <= atol or happy:
                break

        hy = np.zeros(m + 1, np.complex128)
        hy[:j + 1] = H[:j + 1, :j] @ y
        ypad = np.zeros(m, np.complex128)
        ypad[:j] = y
        yb = Bm[:, :j] @ y
        cxr, uxr = _gc_form(vstack, zstack, ustack,
                            _coef_dev(hy, r), _coef_dev(ypad, r),
                            _coef_dev(yb, r))
        x, r, inv_d, diag = _gc_update(x, r, cxr, uxr)
        cstack = _gc_append(cstack, np.int32(cu_next), cxr, inv_d)
        ustack = _gc_append(ustack, np.int32(cu_next), uxr, inv_d)
        cmask[cu_next] = 1.0
        cu_next = (cu_next + 1) % k

        rn2, n2 = np.asarray(diag, np.float64)         # one fetch/cycle
        rn = float(np.sqrt(max(rn2, 0.0)))
        callback(x, l2=rn * l2scale)
        if not np.isfinite(rn) or n2 <= 0:
            return x, -1
        if rn <= atol:
            return x, 0
    return x, maxiter


def _dot_d(a, b):
    """<a, b> as a device C2 scalar (no host sync)."""
    re = None
    im = None
    for x, y in zip(a, b):
        if cx.is_c2(x):
            r_ = jnp.sum(x.re * y.re + x.im * y.im)
            i_ = jnp.sum(x.re * y.im - x.im * y.re)
        else:
            v = jnp.vdot(x, y)
            r_, i_ = jnp.real(v), jnp.imag(v)
        re = r_ if re is None else re + r_
        im = i_ if im is None else im + i_
    return cx.C2(re, im)


def _cdiv0(num, den):
    """num/den as C2 scalars (no breakdown guard: the host checks the
    lagged |den| diagnostic and discards any poisoned iterates)."""
    d2 = den.re * den.re + den.im * den.im
    return cx.C2((num.re * den.re + num.im * den.im) / d2,
                 (num.im * den.re - num.re * den.im) / d2)


@jax.jit
def _bicg_p(r, rtilde, p, v, rho_prev, alpha, omega):
    """rho, beta and the search-direction update (one dispatch)."""
    rho = _dot_d(rtilde, r)
    beta = _cdiv0(rho, rho_prev) * _cdiv0(alpha, omega)
    p_new = tuple(rr + beta * (pp - omega * vv)
                  for rr, pp, vv in zip(r, p, v))
    return p_new, rho


@jax.jit
def _bicg_alpha(rtilde, v, rho, r):
    """alpha and the intermediate residual s = r - alpha v."""
    denom = _dot_d(rtilde, v)
    alpha = _cdiv0(rho, denom)
    sres = tuple(rr - alpha * vv for rr, vv in zip(r, v))
    return alpha, sres, denom


def _bicgstab_device(matvec, precond, b, x, atol, maxiter, callback,
                     l2scale=1.0):
    """BiCGSTAB with device-resident scalars and a per-iteration
    1-fetch check.

    Same recurrence as :func:`_bicgstab`, but every scalar (rho, alpha,
    omega, beta) stays a C2 device scalar: the host never blocks inside
    an iteration.  Breakdown/convergence tests run on ONE packed
    diagnostics vector per iteration, fetched right after the
    iteration is dispatched: the fetch costs one device->host round
    trip of pipeline bubble (~28 ms on the tunnel), which is noise
    against the 6 MG preconditioner cycles a speculatively dispatched
    extra iteration would waste (measured at 32³: a one-iteration lag
    dispatched 3 iterations where 1 sufficed — 12 wasted cycles ≈
    2 s; the lagged variant lives on only for the MG cycle pipeline,
    whose per-step work is one cycle, not six).  C2 (split) only.
    """
    from collections import deque

    r = tuple(bb - aa for bb, aa in zip(b, matvec(x)))
    rtilde = r
    one = jnp.asarray(1.0, dtype=cx.real_dtype_of(r[0]))
    zero = jnp.zeros_like(one)
    rho_prev = cx.C2(one, zero)
    alpha = cx.C2(one, zero)
    omega = cx.C2(one, zero)
    v = tuple(cx.zeros_like(c) for c in r)
    p = tuple(cx.zeros_like(c) for c in r)

    atol2 = atol * atol
    lag = 0
    pend = deque()

    def check(entry):
        """Pop one iteration's diagnostics; return (x, info) to stop."""
        (x_start, phat_i, alpha_i, x_after, diag_d) = entry
        diag = np.asarray(diag_d)
        (rn2, rho2, den2, sn2, tt, om2, rn2_new) = diag
        if rn2 <= atol2:
            return x_start, 0
        if rho2 == 0:
            return x_start, -10
        if den2 == 0:
            return x_start, -11
        if sn2 <= atol2:
            xh = _axpy(alpha_i, phat_i, x_start)
            callback(xh, l2=float(np.sqrt(sn2)) * l2scale)
            return xh, 0
        if tt == 0:
            return x_start, -12
        callback(x_after, l2=float(np.sqrt(rn2_new)) * l2scale)
        if rn2_new <= atol2:
            # Converged ON this iteration: without this test the exit
            # would wait for the NEXT entry's rn2 — one extra full
            # iteration (2 preconditioner applications) every solve.
            return x_after, 0
        if om2 == 0:
            return x_after, -13
        return None

    for it in range(maxiter):
        x_start = x
        if it == 0:
            p = r
            rho = _dot_d(rtilde, r)
        else:
            p, rho = _bicg_p(r, rtilde, p, v, rho_prev, alpha, omega)
        phat = precond(p)
        v = matvec(phat)
        alpha, sres, denom = _bicg_alpha(rtilde, v, rho, r)
        shat = precond(sres)
        t = matvec(shat)
        x, r, omega, diag = _bicg_close(x, r_start=r, phat=phat,
                                        shat=shat, sres=sres, t=t,
                                        alpha=alpha, rho=rho,
                                        denom=denom)
        rho_prev = rho
        pend.append((x_start, phat, alpha, x, diag))
        if len(pend) > lag:
            res = check(pend.popleft())
            if res is not None:
                return res
    while pend:
        res = check(pend.popleft())
        if res is not None:
            return res
    return x, maxiter


@jax.jit
def _bicg_close(x, r_start, phat, shat, sres, t, alpha, rho, denom):
    """omega, the x/r updates and packed diagnostics (one dispatch)."""
    tt = _dot_d(t, t)
    omega = _cdiv0(_dot_d(t, sres), tt)
    x_new = tuple(xx + alpha * ph + omega * sh
                  for xx, ph, sh in zip(x, phat, shat))
    r_new = tuple(ss - omega * ttt for ss, ttt in zip(sres, t))
    rn2 = _dot_d(r_start, r_start).re
    sn2 = _dot_d(sres, sres).re
    rn2_new = _dot_d(r_new, r_new).re
    diag = jnp.stack([rn2, cx.abs2(rho), cx.abs2(denom), sn2, tt.re,
                      cx.abs2(omega), rn2_new])
    return x_new, r_new, omega, diag


@jax.jit
def _cgs_p(r, rtilde, q, p, rho_prev):
    """rho, beta and the u/p updates of CGS (one dispatch)."""
    rho = _dot_d(rtilde, r)
    beta = _cdiv0(rho, rho_prev)
    u = tuple(rr + beta * qq for rr, qq in zip(r, q))
    p_new = tuple(uu + beta * (qq + beta * pp)
                  for uu, qq, pp in zip(u, q, p))
    return u, p_new, rho


@jax.jit
def _cgs_q(rtilde, vhat, rho, u):
    """alpha, q and u+q (one dispatch)."""
    denom = _dot_d(rtilde, vhat)
    alpha = _cdiv0(rho, denom)
    q = tuple(uu - alpha * vv for uu, vv in zip(u, vhat))
    uq = tuple(uu + qq for uu, qq in zip(u, q))
    return alpha, q, uq, denom


@jax.jit
def _cgs_close(x, r_start, uqhat, w, alpha, rho, denom):
    """The x/r updates and packed diagnostics (one dispatch).

    diag = [|r_start|^2, |rho|^2, |denom|^2, |r_new|^2].
    """
    x_new = tuple(xx + alpha * uu for xx, uu in zip(x, uqhat))
    r_new = tuple(rr - alpha * ww for rr, ww in zip(r_start, w))
    diag = jnp.stack([_dot_d(r_start, r_start).re, cx.abs2(rho),
                      cx.abs2(denom), _dot_d(r_new, r_new).re])
    return x_new, r_new, diag


def _cgs_device(matvec, precond, b, x, atol, maxiter, callback,
                l2scale=1.0):
    """CGS with device-resident scalars and a lagged 1-fetch check.

    The CGS analog of :func:`_bicgstab_device`: C2 device scalars, one
    packed-diagnostics fetch per iteration with a one-iteration lag,
    speculative iterates discarded on breakdown.  C2 (split) only.
    """
    from collections import deque

    r = tuple(bb - aa for bb, aa in zip(b, matvec(x)))
    rtilde = r
    one = jnp.asarray(1.0, dtype=cx.real_dtype_of(r[0]))
    rho_prev = cx.C2(one, jnp.zeros_like(one))
    q = tuple(cx.zeros_like(c) for c in r)
    p = tuple(cx.zeros_like(c) for c in r)

    atol2 = atol * atol
    lag = 0          # see _bicgstab_device: the fetch bubble is noise
    pend = deque()   # against a wasted speculative iteration

    def check(entry):
        x_start, x_after, diag_d = entry
        rn2, rho2, den2, rn2_new = np.asarray(diag_d)
        if rn2 <= atol2:
            return x_start, 0
        if rho2 == 0:
            return x_start, -10
        if den2 == 0:
            return x_start, -11
        callback(x_after, l2=float(np.sqrt(rn2_new)) * l2scale)
        if rn2_new <= atol2:
            return x_after, 0
        return None

    for it in range(maxiter):
        x_start = x
        if it == 0:
            u = r
            p = r
            rho = _dot_d(rtilde, r)
        else:
            u, p, rho = _cgs_p(r, rtilde, q, p, rho_prev)
        phat = precond(p)
        vhat = matvec(phat)
        alpha, q, uq, denom = _cgs_q(rtilde, vhat, rho, u)
        uqhat = precond(uq)
        w = matvec(uqhat)
        x, r, diag = _cgs_close(x, r, uqhat, w, alpha, rho, denom)
        rho_prev = rho
        pend.append((x_start, x, diag))
        if len(pend) > lag:
            res = check(pend.popleft())
            if res is not None:
                return res
    while pend:
        res = check(pend.popleft())
        if res is not None:
            return res
    return x, maxiter


def _bicgstab(matvec, precond, b, x, atol, maxiter, callback):
    """Right-preconditioned BiCGSTAB (scipy-compatible formulation)."""
    r = tuple(bb - aa for bb, aa in zip(b, matvec(x)))
    rtilde = r
    rho_prev, alpha, omega = 1.0, 1.0, 1.0
    v = p = None

    for it in range(maxiter):
        if float(_norm(*r)) <= atol:
            return x, 0
        rho = complex(_dot(rtilde, r))
        if rho == 0:
            return x, -10
        if it == 0:
            p = r
        else:
            beta = (rho / rho_prev) * (alpha / omega)
            p = tuple(rr + beta * (pp - omega * vv)
                      for rr, pp, vv in zip(r, p, v))
        phat = precond(p)
        v = matvec(phat)
        denom = complex(_dot(rtilde, v))
        if denom == 0:
            return x, -11
        alpha = rho / denom
        sres = tuple(rr - alpha * vv for rr, vv in zip(r, v))
        if float(_norm(*sres)) <= atol:
            x = _axpy(alpha, phat, x)
            callback(x)
            return x, 0
        shat = precond(sres)
        t = matvec(shat)
        tt = complex(_dot(t, t))
        if tt == 0:
            return x, -12
        omega = complex(_dot(t, sres)) / tt
        x = _axpy(alpha, phat, x)
        x = _axpy(omega, shat, x)
        r = tuple(ss - omega * ttt for ss, ttt in zip(sres, t))
        rho_prev = rho
        callback(x)
        if omega == 0:
            return x, -13
    return x, maxiter


def _cgs(matvec, precond, b, x, atol, maxiter, callback):
    """Preconditioned CGS."""
    r = tuple(bb - aa for bb, aa in zip(b, matvec(x)))
    rtilde = r
    rho_prev = 1.0
    u = p = q = None

    for it in range(maxiter):
        if float(_norm(*r)) <= atol:
            return x, 0
        rho = complex(_dot(rtilde, r))
        if rho == 0:
            return x, -10
        if it == 0:
            u = r
            p = r
        else:
            beta = rho / rho_prev
            u = tuple(rr + beta * qq for rr, qq in zip(r, q))
            p = tuple(uu + beta * (qq + beta * pp)
                      for uu, qq, pp in zip(u, q, p))
        phat = precond(p)
        vhat = matvec(phat)
        denom = complex(_dot(rtilde, vhat))
        if denom == 0:
            return x, -11
        alpha = rho / denom
        q = tuple(uu - alpha * vv for uu, vv in zip(u, vhat))
        uq = tuple(uu + qq for uu, qq in zip(u, q))
        uqhat = precond(uq)
        x = _axpy(alpha, uqhat, x)
        w = matvec(uqhat)
        r = tuple(rr - alpha * ww for rr, ww in zip(r, w))
        rho_prev = rho
        callback(x)
    return x, maxiter


# ======================================================================
# Main entry point
# ======================================================================

def solve(grid, model, sfield, efield=None, cycle='F', sslsolver=False,
          semicoarsening=False, linerelaxation=False, verb=2, **kwargs):
    """Solve the 3-D EM diffusion system A E = s·μ0·Js.

    Reference parity: emg3d/solver.py:35-430 (same signature, defaults,
    termination behavior, info_dict contents, and in-place efield update
    when an initial field is provided).

    Parameters (selection; see the reference for the full description)
    ----------
    grid : TensorMesh
    model : Model
    sfield : SourceField
    efield : Field, optional — initial guess; updated in place (host
        arrays); if provided, nothing is returned (unless return_info).
    cycle : {'F', 'V', 'W', None}
    sslsolver : {True, False, 'bicgstab', 'cgs'}
    semicoarsening : bool/int/digit-cycle
    linerelaxation : bool/int/digit-cycle
    verb : int
    kwargs : tol, maxit, nu_init, nu_pre, nu_coarse, nu_post, clevel,
        return_info, log

    Returns
    -------
    efield : Field (if no initial efield was provided)
    info_dict : dict (if return_info=True)
    """
    sharding = kwargs.pop('sharding', None)
    # Device-level tracing: profile='dir' (or EMG3D_TPU_PROFILE=dir)
    # wraps the solve in jax.profiler.trace — open the dump with
    # TensorBoard/xprof to see per-kernel device timelines.
    profile = kwargs.pop('profile', None) or \
        os.environ.get('EMG3D_TPU_PROFILE')
    # Prebuilt volume parameters (diff.py's AD path injects η/ζ
    # directly; ``model`` is then unused and may be None).
    vmodel_inp = kwargs.pop('_vmodel', None)
    var = MGParameters(
        verb=verb, cycle=cycle, sslsolver=sslsolver,
        linerelaxation=linerelaxation, semicoarsening=semicoarsening,
        shape_cells=tuple(grid.shape_cells), **kwargs)

    do_return = True

    # Compute reference error for tolerance.
    var.l2_refe = float(sfield.norm())
    var.cprint(f"\n:: emg3d_tpu START :: {var.time.now} :: "
               f"v{__import__('emg3d_tpu').__version__}\n", 2)
    var.cprint(var, 2)

    vmodel = vmodel_inp if vmodel_inp is not None \
        else models.VolumeModel(grid, model, sfield)

    if efield is None:
        efield = fields.Field.zeros(
            grid, frequency=sfield._frequency,
            dtype=np.asarray(sfield.fx).dtype)
    else:
        do_return = False
        var.do_return = False
        # Warm start: if converged already, return immediately.
        ctx0 = _SolveContext(grid, vmodel, sfield, efield, var,
                             sharding=sharding)
        fine = ctx0.levels(int(var.sc_dir))[0]
        l2 = residual_norm(ctx0.e, ctx0.s, fine.arrays)
        if l2 < var.tol * var.l2_refe and not var.sslsolver:
            var.exit_message = "CONVERGED"
            var.cprint("   > NOTHING DONE (provided efield already "
                       "converged)\n", 2)
            if var.return_info:
                return _info_dict(var)
            return None

    # Zero source field => zero efield.
    if var.l2_refe == 0:
        var.exit_message = "CONVERGED"
        var.cprint("   > RETURN ZERO E-FIELD (provided sfield is zero)\n",
                   2)
        z = fields.Field.zeros(grid, frequency=sfield._frequency,
                               dtype=np.asarray(sfield.fx).dtype)
        if not do_return:
            for a, b in zip((efield.fx, efield.fy, efield.fz),
                            (z.fx, z.fy, z.fz)):
                np.asarray(a)[...] = b
            if var.return_info:
                return _info_dict(var)
            return None
        if var.return_info:
            return z, _info_dict(var)
        return z

    ctx = _SolveContext(grid, vmodel, sfield, efield, var,
                        sharding=sharding)

    # Tracing a fused Pallas kernel is recursion-heavy, and the first
    # trace can happen deep inside a scipy Krylov call stack (gcrotmk
    # -> fgmres -> precond -> MG -> smoothing dispatch): CPython's
    # default 1000-frame limit then dies mid-trace (measured).  Raise
    # it once, process-wide.
    import sys as _sys
    _sys.setrecursionlimit(max(_sys.getrecursionlimit(), 20000))

    import contextlib
    prof = jax.profiler.trace(profile) if profile \
        else contextlib.nullcontext()
    try:
        with prof:
            if var.sslsolver:
                krylov(ctx, var)
            else:
                multigrid(ctx, var)
    except _ConvergenceError:
        pass

    var.runtime_at_cycle = np.r_[var.runtime_at_cycle, var.time.elapsed]
    var.error_at_cycle = np.r_[var.error_at_cycle, var.l2]

    if var.verb < 0:
        var.one_liner(var.l2, True)
    elif var.verb > 1:
        var.cprint(f"\n:: emg3d_tpu END   :: {var.time.now} :: "
                   f"runtime = {var.time.runtime}\n", 2)

    comps = [np.array(cx.tocomplex(c)) for c in ctx.e]
    if ctx.e_lo is not None:
        # Collapse the two-float solution on the host (f64 exact).
        comps = [hi.astype(np.complex128) + np.array(cx.tocomplex(lo))
                 for hi, lo in zip(comps, ctx.e_lo)]
    out = fields.Field(comps[0], comps[1], comps[2],
                       frequency=sfield._frequency)

    if not do_return:
        # In-place update of the provided field (reference semantics);
        # if its buffers are read-only (e.g. device-backed), rebind.
        for name in ('fx', 'fy', 'fz'):
            dst = np.asarray(getattr(efield, name))
            src = getattr(out, name)
            if dst.flags.writeable:
                dst[...] = src
            else:
                setattr(efield, name, src)
        if var.return_info:
            return _info_dict(var)
        return None

    if var.return_info:
        return out, _info_dict(var)
    return out


def _info_dict(var):
    return {
        'exit': 0 if var.exit_message == 'CONVERGED' else 1,
        'exit_message': var.exit_message,
        'abs_error': var.l2,
        'rel_error': var.l2 / var.l2_refe if var.l2_refe else 0.0,
        'ref_error': var.l2_refe,
        'tol': var.tol,
        'it_mg': var.it,
        'it_ssl': var._ssl_it,
        'time': var.time.elapsed,
        'runtime_at_cycle': var.runtime_at_cycle,
        'error_at_cycle': var.error_at_cycle,
        'log': var.log_message,
    }


# ======================================================================
# Batched multi-source solve
# ======================================================================

@jax.jit
def _jit_residual_b(e, s, arrays):
    """Residual for batched fields (leading source axis)."""
    return jax.vmap(lambda e_, s_, ar: _residual_e(e_, s_, ar),
                    in_axes=(0, 0, _arrays_in_axes(arrays)))(e, s,
                                                             arrays)


@jax.jit
def _jit_amat_b(e, arrays):
    """Operator application for batched fields."""
    return jax.vmap(lambda e_, ar: stencil.amat(*e_, *ar),
                    in_axes=(0, _arrays_in_axes(arrays)))(e, arrays)


@jax.jit
def _norm_b(rx, ry, rz):
    """Per-source residual norms for batched fields: (B,)."""
    def one(a):
        return jnp.sum(cx.abs2(a).reshape(a.shape[0], -1), axis=1)
    return jnp.sqrt(one(rx) + one(ry) + one(rz))


@jax.jit
def _ds_residual_b(ehi, elo, s, arrays):
    """Per-lane double-single residual (leading batch axis)."""
    from .ops.dsres import residual_ds
    return jax.vmap(residual_ds,
                    in_axes=(0, 0, 0, _arrays_in_axes(arrays)))(
                        ehi, elo, s, arrays)


def solve_batched(grid, model, sfields, cycle='F', semicoarsening=False,
                  linerelaxation=False, verb=2, **kwargs):
    """Solve for MANY sources at once on one grid (device-batched).

    The TPU-native replacement of the reference's process-pool fan-out
    over sources (simulations.py:821-913): all source fields are
    stacked along a leading batch axis and every multigrid cycle
    advances the whole batch in one compiled program — the device's
    parallelism does the work of the worker pool, with far better
    utilization for small/medium grids.

    Sources may have DIFFERENT frequencies: the frequency-dependent η
    parameters are then stacked per batch lane (SURVEY §2.6 item 2)
    and the whole (source × frequency) group advances in one compiled
    program.  Semicoarsening and line relaxation are supported;
    ``sslsolver`` supports 'bicgstab' and 'cgs'.

    Termination: CONVERGED when every source's residual is below tol;
    DIVERGED if any diverges; otherwise the usual criteria on the
    worst-converged source.

    Returns
    -------
    efields : list of Field
    info : dict — per-source 'rel_error' array, shared 'it_mg', etc.
    """
    if not sfields:
        raise ValueError("Provide at least one source field.")
    sslsolver = kwargs.pop('sslsolver', False)

    var = MGParameters(
        verb=verb, cycle=cycle, sslsolver=sslsolver,
        linerelaxation=linerelaxation, semicoarsening=semicoarsening,
        shape_cells=tuple(grid.shape_cells), **kwargs)

    # One VolumeModel per unique frequency; a per-lane LIST triggers
    # η-stacking in build_levels when frequencies are mixed.
    lane_freqs = [float(sf._frequency) for sf in sfields]
    if len(set(lane_freqs)) == 1:
        vmodel = models.VolumeModel(grid, model, sfields[0])
    else:
        by_freq = {}
        for sf in sfields:
            f = float(sf._frequency)
            if f not in by_freq:
                by_freq[f] = models.VolumeModel(grid, model, sf)
        vmodel = [by_freq[f] for f in lane_freqs]

    # Stack sources along a leading batch axis.  The batched Krylov
    # path always uses the split representation (its per-source scalar
    # algebra is written in C2); precision follows the x64 state.
    split = (use_split_complex() or bool(sslsolver)) and \
        np.iscomplexobj(np.asarray(sfields[0].fx))
    if split:
        rdt = jax.dtypes.canonicalize_dtype(
            np.asarray(sfields[0].fx).real.dtype)

        def stack(name):
            re = np.stack([np.asarray(getattr(sf, name)).real
                           for sf in sfields])
            im = np.stack([np.asarray(getattr(sf, name)).imag
                           for sf in sfields])
            return cx.C2(jnp.asarray(re, dtype=rdt),
                         jnp.asarray(im, dtype=rdt))
    else:
        def stack(name):
            return jnp.asarray(np.stack(
                [np.asarray(getattr(sf, name)) for sf in sfields]))

    s = (stack('fx'), stack('fy'), stack('fz'))
    e = tuple(cx.zeros_like(c) for c in s)

    ctx = _SolveContext.__new__(_SolveContext)
    ctx.grid = grid
    ctx.vmodel = vmodel
    ctx.var = var
    ctx.split = split
    ctx.s = s
    ctx.e = e
    ctx.dtype = np.asarray(sfields[0].fx).dtype
    ctx.sharding = None
    ctx._levels = {}
    big = int(np.prod(grid.shape_cells)) > 32_000_000
    ctx._levels_cap = int(os.environ.get('EMG3D_TPU_LEVELS_CACHE',
                                         2 if big else 8))

    refe = np.array([float(sf.norm()) for sf in sfields])
    var.l2_refe = float(refe.max())
    refe = np.where(refe == 0, 1.0, refe)

    if var.sslsolver:
        if var.sslsolver not in ('bicgstab', 'cgs'):
            raise NotImplementedError(
                "Batched Krylov implements bicgstab and cgs only.")
        fine = ctx.levels(int(var.sc_dir))[0]

        def matvec(ee):
            return _jit_amat_b(ee, fine.arrays)

        def prec(rr):
            return _precond_fixed_cycles(ctx, var, rr, batch=True)

        def on_iter(itk, xk):
            var._ssl_it += 1

        # Normalize every source to unit norm for the Krylov recurrence:
        # with float32 lanes the breakdown guards square already-squared
        # magnitudes (rho ~ ||r||^2), which underflows below ~1e-38 for
        # mu0-scaled sources (~1e-6) long before true convergence and
        # poisons the guarded divisions with 0/0.  O(1)-scaled lanes
        # keep every recurrence scalar comfortably inside f32 range.
        rdt_ = cx.real_dtype_of(s[0])
        sc_ = jnp.asarray(1.0 / refe, dtype=rdt_)
        s_n = tuple(c * sc_.reshape((-1, 1, 1, 1)) for c in s)
        atol_np = np.full(len(sfields), float(var.tol))
        atol_b = jnp.full((len(sfields),), var.tol, dtype=rdt_)

        # Two-float iterative refinement per lane — see
        # :func:`_refine_krylov` (shared with the single-solve path).
        kernel_b = _bicgstab_batched if var.sslsolver == 'bicgstab' \
            else _cgs_batched

        def inner_b(r0, x0, scale=1.0):
            return kernel_b(matvec, prec, r0, x0, scale * atol_b,
                            var.ssl_maxit, on_iter)

        xhi = e
        xlo = tuple(cx.zeros_like(c) for c in e)
        xhi, xlo, rn_true, kinfo = _refine_krylov(
            lambda h, l: _ds_residual_b(h, l, s_n, fine.arrays),
            lambda r: np.asarray(_norm_b(*r)),
            prec, inner_b, xhi, xlo, atol_np, var.ssl_maxit)

        us_ = jnp.asarray(refe, dtype=rdt_).reshape((-1, 1, 1, 1))
        l2_last = rn_true * refe
        if kinfo == 0:
            var.exit_message = 'CONVERGED'
        elif kinfo > 0:
            var.exit_message = 'MAX. ITERATION REACHED, NOT CONVERGED'
        else:
            var.exit_message = f'Error in {var.sslsolver} ({kinfo})'
        var.cprint("\n   > " + var.exit_message, 2)
        out = []
        comps = [np.array(cx.tocomplex(c * us_)) for c in xhi]
        lows = [np.array(cx.tocomplex(c * us_)) for c in xlo]
        for b_ in range(len(sfields)):
            out.append(fields.Field(
                comps[0][b_].astype(np.complex128) + lows[0][b_],
                comps[1][b_].astype(np.complex128) + lows[1][b_],
                comps[2][b_].astype(np.complex128) + lows[2][b_],
                frequency=sfields[b_]._frequency))
        info = {
            'exit': 0 if var.exit_message == 'CONVERGED' else 1,
            'exit_message': var.exit_message,
            'abs_error': l2_last,
            'rel_error': l2_last / refe,
            'ref_error': refe,
            'tol': var.tol,
            'it_mg': var.it,
            'it_ssl': var._ssl_it,
            'time': var.time.elapsed,
            'runtime_at_cycle': var.runtime_at_cycle,
            'error_at_cycle': var.error_at_cycle,
            'log': var.log_message,
        }
        return out, info

    from collections import deque
    pending = deque()
    lookahead = 2 if _pipelined_checks() else 1
    l2_last = None
    it_disp = 0
    it = 0
    first = True
    elo = None    # two-float lo stream (activated near the f32 floor)
    rds = None
    ds_tau = max(100.0 * float(var.tol), 1e-5)
    result = (e, None)

    fine0 = ctx.levels(int(var.sc_dir))[0]
    l2_last = np.asarray(_norm_b(*_jit_residual_b(e, s, fine0.arrays)))
    l2_stag = np.tile(l2_last, (var._maxcycle, 1))

    while True:
        while it_disp < var.maxit and len(pending) < lookahead:
            conf = (var.nu_pre, var.nu_coarse, var.nu_post, var.cycle,
                    int(var.lr_dir))
            levels = ctx.levels(int(var.sc_dir))
            nu_init = var.nu_init if first else 0
            first = False
            if elo is not None:
                # Correction form (see multigrid's two-float mode).
                zero = tuple(cx.zeros_like(c) for c in e)
                delta = run_one_cycle(zero, rds, levels, conf,
                                      batch=True)
                e, elo = _ds_accumulate(e, elo, delta)
                rds = _ds_residual_b(e, elo, s, levels[0].arrays)
                pending.append(((e, elo), _norm_b(*rds)))
            else:
                e = run_one_cycle(e, s, levels, conf, nu_init=nu_init,
                                  batch=True)
                r = _jit_residual_b(e, s, levels[0].arrays)
                pending.append(((e, None), _norm_b(*r)))
            it_disp += 1
            if var.sc_cycle:
                var.sc_dir = next(var.sc_cycle)
            if var.lr_cycle:
                var.lr_dir = next(var.lr_cycle)
            if len(pending) < lookahead and it_disp < var.maxit:
                continue

        e_i, nrm_i = pending.popleft()
        l2_stag[(it - 1) % var._maxcycle] = l2_last
        it += 1
        var.it += 1
        l2_last = np.asarray(nrm_i)
        rel = l2_last / refe

        if var.verb > 2:
            var.cprint(
                f"   [{var.time.now}]   max {rel.max():.3e} after "
                f"{it:3} {var.cycle}-cycles "
                f"({np.sum(rel < var.tol)}/{rel.size} converged)", 2)

        finished = False
        if np.all(rel < var.tol):
            var.exit_message = "CONVERGED"
            finished = True
        elif np.any(l2_last > 10 * refe) or not np.all(
                np.isfinite(l2_last)):
            var.exit_message = "DIVERGED"
            finished = True
        elif it > 2 and np.all(
                l2_last >= l2_stag[(it - 1) % var._maxcycle]):
            var.exit_message = "STAGNATED"
            finished = True
        elif it == var.maxit:
            var.exit_message = "MAX. ITERATION REACHED, NOT CONVERGED"
            finished = True

        result = e_i
        if finished:
            add = "\n" if var.verb < 5 else ""
            var.cprint(add + "   > " + var.exit_message, 2)
            break

        # Switch to two-float accumulation near the f32 floor.
        if (elo is None and _ds_wanted(e, var)
                and np.max(rel) < ds_tau):
            elo = tuple(cx.zeros_like(c) for c in e)
            rds = _ds_residual_b(
                e, elo, s, ctx.levels(int(var.sc_dir))[0].arrays)

    # Unstack into host Fields (per-lane frequency).
    out = []
    ehi_f, elo_f = result
    comps = [np.array(cx.tocomplex(c)) for c in ehi_f]
    if elo_f is not None:
        lows = [np.array(cx.tocomplex(c)) for c in elo_f]
        comps = [hi.astype(np.complex128) + lo
                 for hi, lo in zip(comps, lows)]
    for b in range(len(sfields)):
        out.append(fields.Field(comps[0][b], comps[1][b], comps[2][b],
                                frequency=sfields[b]._frequency))

    info = {
        'exit': 0 if var.exit_message == 'CONVERGED' else 1,
        'exit_message': var.exit_message,
        'abs_error': l2_last,
        'rel_error': l2_last / refe,
        'ref_error': refe,
        'tol': var.tol,
        'it_mg': it,
        'it_ssl': 0,
        'time': var.time.elapsed,
        'runtime_at_cycle': var.runtime_at_cycle,
        'error_at_cycle': var.error_at_cycle,
        'log': var.log_message,
    }
    return out, info


# ======================================================================
# Batched Krylov (per-source scalars on device)
# ======================================================================

def _dot_b(a, b):
    """Per-source inner products <a_i, b_i>: (B,) device scalar(s)."""
    def red(x):
        return jnp.sum(x.reshape(x.shape[0], -1), axis=1)
    re = None
    im = None
    for x, y in zip(a, b):
        if cx.is_c2(x):
            r_ = red(x.re * y.re + x.im * y.im)
            i_ = red(x.re * y.im - x.im * y.re)
        else:
            v = red(jnp.conj(x) * y)
            r_, i_ = jnp.real(v), jnp.imag(v)
        re = r_ if re is None else re + r_
        im = i_ if im is None else im + i_
    return cx.C2(re, im)


def _bcast_scal(scal, ndim):
    """(B,)-scalar (C2) -> broadcastable (B, 1, 1, 1)."""
    sh = (-1,) + (1,) * (ndim - 1)
    return cx.C2(scal.re.reshape(sh), scal.im.reshape(sh))


def _cdiv_guard(num, den, guard):
    """num/den with den replaced by 1 where ``guard`` is False."""
    d2 = den.re * den.re + den.im * den.im
    safe = jnp.where(guard, d2, 1.0)
    den = cx.C2(jnp.where(guard, den.re, 1.0),
                jnp.where(guard, den.im, 0.0))
    out = num * den.conj()
    return cx.C2(out.re / safe, out.im / safe)


def _bicgstab_batched(matvec, precond, b, x, atol_b, maxiter, on_iter):
    """Per-source BiCGSTAB with (B,) device scalars and lane freezing.

    Converged/broken-down sources are frozen via masks; the iteration
    stops when every source is converged (or maxiter).  Returns
    (x, info) with info=0 if all converged.
    """
    B = atol_b.shape[0]
    ndim = 4

    def fz(mask, new, old):
        """Freeze: where(active) take new else old (fields)."""
        m = mask.reshape((-1,) + (1,) * (ndim - 1))
        return tuple(cx.C2(jnp.where(m, nn.re, oo.re),
                           jnp.where(m, nn.im, oo.im))
                     if cx.is_c2(nn) else jnp.where(m, nn, oo)
                     for nn, oo in zip(new, old))

    r = tuple(bb - aa for bb, aa in zip(b, matvec(x)))
    rtilde = r
    ones = jnp.ones((B,))
    zeros_ = jnp.zeros((B,))
    rho_prev = cx.C2(ones, zeros_)
    alpha = cx.C2(ones, zeros_)
    omega = cx.C2(ones, zeros_)
    v = tuple(cx.zeros_like(c) for c in r)
    p = tuple(cx.zeros_like(c) for c in r)
    active = jnp.ones((B,), bool)

    info = maxiter
    for it in range(maxiter):
        rnorm = jnp.sqrt(_dot_b(r, r).re)
        host_rnorm = np.asarray(rnorm)
        host_active = np.asarray(active)
        done = host_rnorm <= np.asarray(atol_b)
        if np.all(done | ~host_active):
            info = 0 if np.all(done) else -1
            break
        active = jnp.asarray(host_active & ~done)

        rho = _dot_b(rtilde, r)
        ok = (rho.re**2 + rho.im**2) > 0
        active = active & ok

        beta = (_cdiv_guard(rho, rho_prev, active) *
                _cdiv_guard(alpha, omega, active))
        bb_ = _bcast_scal(beta, ndim)
        om_ = _bcast_scal(omega, ndim)
        p_new = tuple(rr + bb_ * (pp - om_ * vv)
                      for rr, pp, vv in zip(r, p, v))
        p = fz(active, p_new, p)

        phat = precond(p)
        v_new = matvec(phat)
        v = fz(active, v_new, v)
        denom = _dot_b(rtilde, v)
        ok = (denom.re**2 + denom.im**2) > 0
        active = active & ok
        alpha = _cdiv_guard(rho, denom, active)
        al_ = _bcast_scal(alpha, ndim)
        sres = tuple(rr - al_ * vv for rr, vv in zip(r, v))

        shat = precond(sres)
        t = matvec(shat)
        tt = _dot_b(t, t)
        ok = tt.re > 0
        active_o = active & ok
        omega = _cdiv_guard(_dot_b(t, sres), tt, active_o)
        om2_ = _bcast_scal(omega, ndim)

        x_new = tuple(xx + al_ * ph + om2_ * sh
                      for xx, ph, sh in zip(x, phat, shat))
        x = fz(active, x_new, x)
        r_new = tuple(ss - om2_ * ttt for ss, ttt in zip(sres, t))
        r = fz(active, r_new, r)
        rho_prev = rho
        on_iter(it, x)

    return x, info


def _cgs_batched(matvec, precond, b, x, atol_b, maxiter, on_iter):
    """Per-source CGS with (B,) device scalars and lane freezing.

    The CGS analog of :func:`_bicgstab_batched` (same lane-freezing
    protocol; recurrence of :func:`_cgs_device`).  With q = p = 0 and
    rho_prev = 1 the first iteration needs no special case: beta
    multiplies only zero vectors.
    """
    B = atol_b.shape[0]
    ndim = 4

    def fz(mask, new, old):
        m = mask.reshape((-1,) + (1,) * (ndim - 1))
        return tuple(cx.C2(jnp.where(m, nn.re, oo.re),
                           jnp.where(m, nn.im, oo.im))
                     if cx.is_c2(nn) else jnp.where(m, nn, oo)
                     for nn, oo in zip(new, old))

    r = tuple(bb - aa for bb, aa in zip(b, matvec(x)))
    rtilde = r
    ones = jnp.ones((B,))
    rho_prev = cx.C2(ones, jnp.zeros((B,)))
    q = tuple(cx.zeros_like(c) for c in r)
    p = tuple(cx.zeros_like(c) for c in r)
    active = jnp.ones((B,), bool)

    info = maxiter
    for it in range(maxiter):
        rnorm = jnp.sqrt(_dot_b(r, r).re)
        host_rnorm = np.asarray(rnorm)
        host_active = np.asarray(active)
        done = host_rnorm <= np.asarray(atol_b)
        if np.all(done | ~host_active):
            info = 0 if np.all(done) else -1
            break
        active = jnp.asarray(host_active & ~done)

        rho = _dot_b(rtilde, r)
        ok = (rho.re**2 + rho.im**2) > 0
        active = active & ok

        beta = _cdiv_guard(rho, rho_prev, active)
        bb_ = _bcast_scal(beta, ndim)
        u = tuple(rr + bb_ * qq for rr, qq in zip(r, q))
        p_new = tuple(uu + bb_ * (qq + bb_ * pp)
                      for uu, qq, pp in zip(u, q, p))
        p = fz(active, p_new, p)

        phat = precond(p)
        vhat = matvec(phat)
        denom = _dot_b(rtilde, vhat)
        ok = (denom.re**2 + denom.im**2) > 0
        active = active & ok
        alpha = _cdiv_guard(rho, denom, active)
        al_ = _bcast_scal(alpha, ndim)
        q_new = tuple(uu - al_ * vv for uu, vv in zip(u, vhat))
        q = fz(active, q_new, q)
        uq = tuple(uu + qq for uu, qq in zip(u, q))

        uqhat = precond(uq)
        w = matvec(uqhat)
        x_new = tuple(xx + al_ * uu for xx, uu in zip(x, uqhat))
        x = fz(active, x_new, x)
        r_new = tuple(rr - al_ * ww for rr, ww in zip(r, w))
        r = fz(active, r_new, r)
        rho_prev = rho
        on_iter(it, x)

    return x, info


def _precond_fixed_cycles(ctx, var, r, batch, cycles=None):
    """Preconditioner: exactly ``cycles`` MG cycles, no norm fetches.

    (When MG preconditions a Krylov solver, the default maxit equals
    the length of the sc/lr schedule — reference solver.py:1356-1364.)

    A preconditioner application is a correction solve by construction
    (rhs = a Krylov residual/basis vector, outer fixed point set by
    the EXACT outer recurrence), so the smoothers may stream their
    s/params in bfloat16 (_smooth_spdt): the O(2⁻⁸) update bias only
    perturbs the preconditioner, never the solution.
    """
    spdt = _smooth_spdt(r)
    n = var.maxit if cycles is None else cycles

    fine = ctx.levels(int(var.sc_dir))[0]
    if (not batch and _chunking() and ctx.sharding is None
            and int(np.prod(fine.shape)) <= _CHUNK_MAX_CELLS):
        # All n preconditioner cycles (rotation included) as ONE
        # jitted dispatch — no norms are computed, so a Krylov
        # iteration's 2 preconditioner applications cost 2 async
        # dispatches instead of ~3 cycles x several pieces each.
        # The default n equals the schedule length, so the dispatch
        # phase is fixed and the chunk compiles once per solve shape.
        conf_seq, levels_seq = _collect_rotation(ctx, var, n)
        var.it += n
        fn = _get_chunk_fn_multi(levels_seq, conf_seq, 'pre', spdt)
        return fn(r, *_chunk_args_multi(levels_seq, conf_seq, spdt))

    e = tuple(cx.zeros_like(c) for c in r)
    for _ in range(n):
        conf = (var.nu_pre, var.nu_coarse, var.nu_post, var.cycle,
                int(var.lr_dir))
        levels = ctx.levels(int(var.sc_dir))
        e = run_one_cycle(e, r, levels, conf, batch=batch, spdt=spdt)
        var.it += 1
        if var.sc_cycle:
            var.sc_dir = next(var.sc_cycle)
        if var.lr_cycle:
            var.lr_dir = next(var.lr_cycle)
    return e
