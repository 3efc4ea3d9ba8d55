"""Tensor meshes (staggered Yee grids) — host-side geometry.

TPU-native re-design of the reference's mesh layer
(/root/reference/emg3d/meshes.py:66-275).  The mesh is pure host-side
numpy metadata: cell widths and origin plus derived node/center/edge
bookkeeping.  Device code (the solver) only ever consumes plain arrays
drawn from here (``h``, volumes, transfer-operator matrices), so the mesh
itself is deliberately *not* a pytree.

Key differences from the reference:

- No ``discretize`` dependency or fallback split: one class provides the
  full (relevant) attribute surface of both.
- Arrays derived lazily and cached; the object is immutable by convention.
"""
import numpy as np

__all__ = [
    'TensorMesh', 'construct_mesh', 'origin_and_widths', 'good_mg_cell_nr',
    'skin_depth', 'wavelength', 'cell_width', 'check_mesh',
]


class TensorMesh:
    """A 3-D tensor-product (rectilinear) mesh.

    Parameters
    ----------
    h : sequence of three ndarrays
        Cell widths ``[hx, hy, hz]``.
    origin : array_like of 3 floats
        Coordinates of the bottom-south-west corner (x0, y0, z0).

    Reference parity: emg3d/meshes.py:66-275 (_TensorMesh/TensorMesh).
    """

    def __init__(self, h, origin=(0., 0., 0.)):
        self.h = [np.asarray(hh, dtype=np.float64).ravel() for hh in h]
        if len(self.h) != 3 or any(len(hh) < 1 for hh in self.h):
            raise ValueError("h must contain three width-arrays.")
        if any(np.any(hh <= 0) for hh in self.h):
            raise ValueError("All cell widths must be positive.")
        self.origin = np.asarray(origin, dtype=np.float64).ravel()
        if self.origin.size != 3:
            raise ValueError("origin must have three entries.")

        # Cell counts.
        self.shape_cells = tuple(int(len(hh)) for hh in self.h)
        self.shape_nodes = tuple(n + 1 for n in self.shape_cells)
        nx, ny, nz = self.shape_cells

        # Edge counts (x-edges: (nx, ny+1, nz+1), etc.).
        self.shape_edges_x = (nx, ny + 1, nz + 1)
        self.shape_edges_y = (nx + 1, ny, nz + 1)
        self.shape_edges_z = (nx + 1, ny + 1, nz)
        self.n_cells = nx * ny * nz
        self.n_nodes = (nx + 1) * (ny + 1) * (nz + 1)
        self.n_edges_x = int(np.prod(self.shape_edges_x))
        self.n_edges_y = int(np.prod(self.shape_edges_y))
        self.n_edges_z = int(np.prod(self.shape_edges_z))
        self.n_edges = self.n_edges_x + self.n_edges_y + self.n_edges_z

        self._cache = {}

    # -- Node / center vectors ------------------------------------------

    @property
    def nodes_x(self):
        return self._cached('nodes_x', lambda: np.r_[0., np.cumsum(self.h[0])]
                            + self.origin[0])

    @property
    def nodes_y(self):
        return self._cached('nodes_y', lambda: np.r_[0., np.cumsum(self.h[1])]
                            + self.origin[1])

    @property
    def nodes_z(self):
        return self._cached('nodes_z', lambda: np.r_[0., np.cumsum(self.h[2])]
                            + self.origin[2])

    @property
    def cell_centers_x(self):
        return self._cached(
            'cell_centers_x', lambda: (self.nodes_x[:-1] + self.nodes_x[1:])/2)

    @property
    def cell_centers_y(self):
        return self._cached(
            'cell_centers_y', lambda: (self.nodes_y[:-1] + self.nodes_y[1:])/2)

    @property
    def cell_centers_z(self):
        return self._cached(
            'cell_centers_z', lambda: (self.nodes_z[:-1] + self.nodes_z[1:])/2)

    @property
    def cell_volumes(self):
        """Cell volumes, shape (nx, ny, nz) (C-order 3-D array)."""
        def _vol():
            hx, hy, hz = self.h
            return (hx[:, None, None] * hy[None, :, None] * hz[None, None, :])
        return self._cached('cell_volumes', _vol)

    def _cached(self, key, fn):
        if key not in self._cache:
            self._cache[key] = fn()
        return self._cache[key]

    # -- Short aliases (reference/discretize style) ---------------------

    @property
    def vnC(self):
        return self.shape_cells

    @property
    def nC(self):
        return self.n_cells

    @property
    def vnN(self):
        return self.shape_nodes

    @property
    def vnEx(self):
        return self.shape_edges_x

    @property
    def vnEy(self):
        return self.shape_edges_y

    @property
    def vnEz(self):
        return self.shape_edges_z

    @property
    def nEx(self):
        return self.n_edges_x

    @property
    def nEy(self):
        return self.n_edges_y

    @property
    def nEz(self):
        return self.n_edges_z

    @property
    def nE(self):
        return self.n_edges

    # -- Housekeeping ----------------------------------------------------

    def __eq__(self, other):
        if not isinstance(other, TensorMesh):
            return NotImplemented
        return (self.shape_cells == other.shape_cells and
                np.allclose(self.origin, other.origin) and
                all(np.allclose(a, b) for a, b in zip(self.h, other.h)))

    def __hash__(self):
        return hash((self.shape_cells,
                     tuple(self.origin),
                     tuple(tuple(hh) for hh in self.h)))

    def __repr__(self):
        nx, ny, nz = self.shape_cells
        return (f"TensorMesh: {nx:,} x {ny:,} x {nz:,} "
                f"({self.n_cells:,} cells)")

    def copy(self):
        return TensorMesh.from_dict(self.to_dict())

    def to_dict(self, copy=False):
        out = {
            'hx': np.array(self.h[0]), 'hy': np.array(self.h[1]),
            'hz': np.array(self.h[2]), 'origin': np.array(self.origin),
            '__class__': self.__class__.__name__,
        }
        return out

    @classmethod
    def from_dict(cls, inp):
        inp = {k: v for k, v in inp.items() if k != '__class__'}
        try:
            return cls(h=[inp['hx'], inp['hy'], inp['hz']],
                       origin=inp['origin'])
        except KeyError as e:
            raise KeyError(f"Variable {e} missing in `inp`.") from e


# ----------------------------------------------------------------------
# Automatic mesh construction helpers
# (reference parity: emg3d/meshes.py:867-1042).
# ----------------------------------------------------------------------

def good_mg_cell_nr(max_nr=1024, max_prime=5, min_div=3):
    """Cell numbers p·2^n (p prime ≤ max_prime, n ≥ min_div) good for MG.

    Reference parity: emg3d/meshes.py:867-920.
    """
    if max_prime not in [2, 3, 5, 7, 11, 13]:
        raise ValueError(f"max_prime must be a prime <= 13; "
                         f"provided: {max_prime}.")
    primes = np.array([p for p in [2, 3, 5, 7, 11, 13] if p <= max_prime])
    numbers = []
    for p in primes:
        n = min_div
        while p * 2**n <= max_nr:
            numbers.append(p * 2**n)
            n += 1
    return np.unique(numbers)


def skin_depth(frequency, conductivity, mu_r=1.0):
    """Skin depth δ = 1/sqrt(π f μ σ)  [m].

    For Laplace-domain (negative) frequency s=f the factor πf is replaced
    by |f|/2.  Reference parity: emg3d/meshes.py:923-976.
    """
    mu = mu_r * 4e-7 * np.pi
    if frequency < 0:  # Laplace domain.
        return 1 / np.sqrt(-frequency / 2 * mu * conductivity)
    return 1 / np.sqrt(np.pi * frequency * mu * conductivity)


def wavelength(sdepth):
    """Wavelength λ = 2π δ [m].  Reference: emg3d/meshes.py:979-1004."""
    return 2 * np.pi * sdepth


def cell_width(sdepth, pps=3, limits=None):
    """Minimum cell width Δ = δ/pps, clipped to limits.

    Reference parity: emg3d/meshes.py:1007-1042 (min_cell_width).
    """
    dmin = sdepth / pps
    if limits is None:
        return dmin
    limits = np.atleast_1d(np.asarray(limits, dtype=float))
    if limits.size == 1:
        return float(limits[0])
    return float(np.clip(dmin, limits[0], limits[1]))


# Backwards-compatible alias matching the reference name.
min_cell_width = cell_width


def check_mesh(mesh):
    """Warn if the mesh is not good for multigrid (non 2^n-divisible)."""
    import warnings
    good = good_mg_cell_nr()
    for i, n in enumerate(mesh.shape_cells):
        if n not in good:
            warnings.warn(
                f"Mesh dimension {i} has {n} cells, which is not an "
                "optimal number for multigrid (p*2^n; p in {2,3,5,7}).",
                UserWarning)
            break


def origin_and_widths(frequency, properties, center, domain=None,
                      vector=None, seasurface=None, stretching=(1.0, 1.5),
                      min_width_limits=None, min_width_pps=3,
                      lambda_factor=1.0, max_buffer=100000.0,
                      lambda_from_center=False, mapping='Resistivity',
                      cell_numbers=None, verb=0, raise_error=True):
    """Compute origin and cell widths for one direction.

    Frequency- and property-aware 1-D gridding: a survey domain is covered
    with (possibly) constant cells of a skin-depth-derived minimum width;
    buffer zones extending to roughly a wavelength are added on both sides
    with geometrically stretched cells.

    This is a from-scratch implementation of the *behavior* of the
    reference's ``get_origin_widths`` (emg3d/meshes.py:578-864): the exact
    optimization loop differs, but the produced grids satisfy the same
    constraints (MG-friendly cell count, minimum width from pps, buffer of
    lambda_factor*wavelength capped at max_buffer, stretching within
    limits, optional seasurface pinning and fixed vectors).

    Returns ``(origin, widths)`` or ``(None, None)`` if no grid within
    ``cell_numbers`` satisfies the constraints (when raise_error=False).
    """
    from . import maps as _maps

    # Map (possibly multiple) properties to conductivities -> skin depths.
    properties = np.atleast_1d(np.asarray(properties, dtype=float))
    pmap = getattr(_maps, 'Map' + mapping)()
    cond = pmap.backward(properties)
    # First property is at the center; others define the boundary buffers.
    sd_center = skin_depth(frequency, cond[0])
    sd_bounds = skin_depth(frequency, cond[-1]) if cond.size > 1 else sd_center
    sd_neg = (skin_depth(frequency, cond[1])
              if cond.size > 2 else sd_bounds)
    sd_pos = (skin_depth(frequency, cond[-1])
              if cond.size > 1 else sd_bounds)

    # Minimum cell width.
    dmin = cell_width(sd_center, min_width_pps, min_width_limits)

    # Survey domain.
    if domain is None:
        if vector is not None:
            domain = np.array([np.min(vector), np.max(vector)], dtype=float)
        else:
            domain = np.array([center - dmin, center + dmin], dtype=float)
    else:
        domain = np.asarray(domain, dtype=float).copy()

    # Buffer (computation) domain: lambda_factor*wavelength, capped.
    buff_neg = min(lambda_factor * wavelength(sd_neg), max_buffer)
    buff_pos = min(lambda_factor * wavelength(sd_pos), max_buffer)
    if lambda_from_center:
        buff_neg = max(buff_neg - (center - domain[0]), 0.0)
        buff_pos = max(buff_pos - (domain[1] - center), 0.0)
    comp_domain = np.array([domain[0] - buff_neg, domain[1] + buff_pos])

    if seasurface is not None and seasurface > domain[1]:
        domain[1] = seasurface

    if cell_numbers is None:
        cell_numbers = good_mg_cell_nr()
    cell_numbers = np.sort(np.atleast_1d(cell_numbers))

    sa_min, sa_max = 1.0, float(np.atleast_1d(stretching)[0])
    ca_max = float(np.atleast_1d(stretching)[-1])

    if vector is not None:
        # Fixed survey-domain vector: only add buffers around it.
        svec = np.asarray(vector, dtype=float)
        sh = np.diff(svec)
        domain = np.array([svec[0], svec[-1]])
    else:
        svec = None

    # Try increasing cell numbers until the computation domain is covered.
    for nc in cell_numbers:
        if svec is None:
            # Survey part: constant cells of (possibly stretched) width.
            for alpha in np.arange(sa_min, sa_max + 1e-9, 0.01):
                n_s = int(np.ceil(np.log(
                    max((domain[1] - domain[0]) * (alpha - 1) / dmin + 1,
                        1e-30)) / np.log(alpha))) if alpha > 1.0 else \
                    int(np.ceil((domain[1] - domain[0]) / dmin))
                # Uniform width that exactly tiles the survey domain.
                n_s = max(n_s, 1)
                if n_s > nc:
                    continue
                width = (domain[1] - domain[0]) / n_s
                if alpha == sa_min and width > dmin * 1.0000001 and \
                        n_s + 1 <= nc:
                    n_s = int(np.ceil((domain[1] - domain[0]) / dmin))
                    if n_s > nc:
                        continue
                    width = (domain[1] - domain[0]) / n_s
                sh = np.full(n_s, width)
                break
            else:
                continue
        else:
            if len(sh) > nc:
                continue

        # Remaining cells for the two buffers.
        n_rem = nc - len(sh)

        # Geometrically stretch from the edge width into the buffers.
        h0 = sh[0] if len(sh) else dmin
        h1 = sh[-1] if len(sh) else dmin
        hn, hp, ok = _fill_buffers(
            n_rem, h0, h1, comp_domain[0], domain[0], domain[1],
            comp_domain[1], ca_max)
        if not ok:
            continue

        widths = np.r_[hn[::-1], sh, hp]
        origin = domain[0] - np.sum(hn)
        return float(origin), widths

    if raise_error:
        raise RuntimeError(
            "No suitable grid found; relax your criteria (stretching, "
            "cell_numbers, min_width_limits).")
    return None, None


def _fill_buffers(n_rem, h0, h1, cneg, dneg, dpos, cpos, alpha_max):
    """Distribute n_rem cells into two stretched buffer zones.

    Returns (widths_neg, widths_pos, success); widths_neg ordered from the
    domain edge outwards (caller reverses).
    """
    need_neg = dneg - cneg
    need_pos = cpos - dpos
    tot = need_neg + need_pos
    if tot <= 0:
        return np.zeros(0), np.zeros(0), True
    # Split cells proportionally to the required distances.
    for n_neg in range(n_rem + 1):
        n_pos = n_rem - n_neg
        # Greedy: find smallest alphas covering each side.
        a_neg = _min_alpha(n_neg, h0, need_neg, alpha_max)
        a_pos = _min_alpha(n_pos, h1, need_pos, alpha_max)
        if a_neg is None or a_pos is None:
            continue
        hn = h0 * a_neg**np.arange(1, n_neg + 1)
        hp = h1 * a_pos**np.arange(1, n_pos + 1)
        # Scale minimally so the buffer is at least covered.
        return hn, hp, True
    return None, None, False


def _min_alpha(n, h, dist, alpha_max, tol=1e-10):
    """Smallest stretching alpha such that sum(h*a^i, i=1..n) >= dist."""
    if dist <= 0:
        return 1.0 if n == 0 else 1.0
    if n == 0:
        return None
    if h * n >= dist:  # No stretching needed.
        return 1.0
    lo, hi = 1.0, alpha_max
    s = h * (hi * (hi**n - 1) / (hi - 1))
    if s < dist:
        return None
    for _ in range(100):
        mid = 0.5 * (lo + hi)
        s = h * (mid * (mid**n - 1) / (mid - 1)) if mid > 1 + tol else h * n
        if s < dist:
            lo = mid
        else:
            hi = mid
    return hi


def construct_mesh(frequency, properties, center, domain=None, vector=None,
                   seasurface=None, **kwargs):
    """Construct a frequency/property-aware 3-D tensor mesh.

    Per-direction gridding via :func:`origin_and_widths`.

    Parameters follow the reference's ``construct_mesh``
    (emg3d/meshes.py:278-575): `properties` can be a scalar (same
    everywhere), or sequences of 2 (center, boundary), 3 (center, bounds
    xy, bounds z-), 4 (center, xy, z-, z+) or 7 (center, x-, x+, y-, y+,
    z-, z+) values; `domain`/`vector` can be given per direction via dicts
    or 3-tuples.

    Returns
    -------
    TensorMesh
    """
    properties = np.atleast_1d(np.asarray(properties, dtype=float))
    center = np.asarray(center, dtype=float)

    # Expand properties to per-direction (center, lower, upper) triples.
    if properties.size == 1:
        p = properties[0]
        per_dir = [(p, p, p)] * 3
    elif properties.size == 2:
        c, b = properties
        per_dir = [(c, b, b)] * 3
    elif properties.size == 3:
        c, bxy, bz = properties
        per_dir = [(c, bxy, bxy), (c, bxy, bxy), (c, bz, bz)]
    elif properties.size == 4:
        c, bxy, bzn, bzp = properties
        per_dir = [(c, bxy, bxy), (c, bxy, bxy), (c, bzn, bzp)]
    elif properties.size == 7:
        c, xn, xp, yn, yp, zn, zp = properties
        per_dir = [(c, xn, xp), (c, yn, yp), (c, zn, zp)]
    else:
        raise ValueError(
            f"properties must have 1, 2, 3, 4, or 7 elements; "
            f"got {properties.size}.")

    def _get(opt, i, name):
        if opt is None:
            return None
        if isinstance(opt, dict):
            return opt.get(name)
        if isinstance(opt, (list, tuple)) and len(opt) == 3 and not \
                np.isscalar(opt[0]):
            return opt[i]
        return opt if np.isscalar(opt[0]) and len(opt) == 2 else opt[i]

    names = ['x', 'y', 'z']
    origins, widths = [], []
    for i in range(3):
        dom = _get(domain, i, names[i])
        vec = _get(vector, i, names[i])
        sea = seasurface if i == 2 else None
        o, w = origin_and_widths(
            frequency, per_dir[i], center[i], domain=dom, vector=vec,
            seasurface=sea, **kwargs)
        origins.append(o)
        widths.append(w)

    return TensorMesh(widths, origins)
