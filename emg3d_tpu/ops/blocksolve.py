"""Batched small complex-symmetric solves (LDLᵀ, no pivoting).

TPU-native replacement for the reference's sequential banded Cholesky
(/root/reference/emg3d/core.py:1447-1582): instead of factorizing one
6×6 node system or one banded line system at a time, we factorize
*millions of them at once* as unrolled elementwise operations on stacked
arrays — pure VPU work with perfect vectorization.

Two flavors:

- :func:`ldl_solve_sparse`: operates on a sparsity-annotated lower
  triangle given as per-entry arrays (entries may be ``None`` = zero).
  Used for the 6×6 point-smoother blocks, where materializing a dense
  (..., 6, 6) array would waste memory; everything stays as ~20
  broadcast-compatible arrays that XLA fuses.
- dense (..., k, k) helpers :func:`ldl_factor` / :func:`ldl_apply` for
  the 5×5 blocks of the line-relaxation block-tridiagonal solve (those
  fill in during elimination anyway).

The matrices are complex-*symmetric* (A = Aᵀ, not hermitian): the
factorization is A = L D Lᵀ without conjugation, as in [Muld07].
"""
import jax.numpy as jnp

from .. import cx

__all__ = ['ldl_solve_sparse', 'ldl_factor', 'ldl_apply', 'ldl_apply_mat',
           'block_tridiag_solve', 'block_tridiag_factor_entries',
           'block_tridiag_solve_entries']


def ldl_factor_sparse(n, entries):
    """Factorize complex-symmetric sparse-lower A = L D Lᵀ.

    The factorization depends only on the model coefficients (not on
    the field), so callers hoist it out of the per-color sweep.

    Returns (L, dinv): dict of strict-lower entries, list of inverse
    diagonal entries.
    """
    L = {}
    dinv = [None] * n
    for j in range(n):
        acc = entries.get((j, j))
        if acc is None:
            raise ValueError(f"Diagonal entry ({j},{j}) must be present.")
        for k in range(j):
            Ljk = L.get((j, k))
            if Ljk is not None:
                acc = acc - Ljk * Ljk * _d(dinv, k)
        dinv[j] = 1.0 / acc
        for i in range(j + 1, n):
            a = entries.get((i, j))
            s = None
            for k in range(j):
                Lik = L.get((i, k))
                Ljk = L.get((j, k))
                if Lik is not None and Ljk is not None:
                    t = Lik * Ljk * _d(dinv, k)
                    s = t if s is None else s + t
            if a is None and s is None:
                continue
            val = (a if a is not None else 0.)
            if s is not None:
                val = val - s
            L[(i, j)] = val * dinv[j]
    return L, dinv


def ldl_solve_factored(n, L, dinv, b):
    """Solve with a factorization from :func:`ldl_factor_sparse`."""
    y = list(b)
    for i in range(n):
        for k in range(i):
            Lik = L.get((i, k))
            if Lik is not None:
                y[i] = y[i] - Lik * y[k]
    for i in range(n):
        y[i] = y[i] * dinv[i]
    for i in range(n - 2, -1, -1):
        for k in range(i + 1, n):
            Lki = L.get((k, i))
            if Lki is not None:
                y[i] = y[i] - Lki * y[k]
    return y


def ldl_solve_sparse(n, entries, b):
    """Solve A x = b for complex-symmetric A given as sparse lower entries.

    Parameters
    ----------
    n : int
        System size (static).
    entries : dict[(i, j)] -> array or None
        Lower-triangle entries (i >= j), broadcast-compatible arrays;
        missing/None entries are structurally zero.
    b : list of n arrays
        Right-hand side components.

    Returns
    -------
    list of n arrays — the solution components.
    """
    L, dinv = ldl_factor_sparse(n, entries)
    return ldl_solve_factored(n, L, dinv, b)


def _d(dinv, k):
    return 1.0 / dinv[k]


def ldl_factor(A):
    """LDLᵀ factorization of dense complex-symmetric (..., k, k) blocks.

    Returns (L, dinv): L strict-lower with unit diagonal implied
    (..., k, k), dinv (..., k) the inverse diagonal of D.
    """
    k = A.shape[-1]
    Lcols = []
    dinv = []
    # Build column by column; keep entries as (..., ) arrays.
    L = [[None] * k for _ in range(k)]
    for j in range(k):
        acc = A[..., j, j]
        for p in range(j):
            acc = acc - L[j][p] * L[j][p] * (1.0 / dinv[p])
        dj = 1.0 / acc
        dinv.append(dj)
        for i in range(j + 1, k):
            v = A[..., i, j]
            for p in range(j):
                v = v - L[i][p] * L[j][p] * (1.0 / dinv[p])
            L[i][j] = v * dj
        Lcols.append(j)
    Lmat = cx.zeros_like(A)
    for i in range(k):
        for j in range(i):
            Lmat = Lmat.at[..., i, j].set(L[i][j])
    return Lmat, cx.stack(dinv, axis=-1)


def ldl_apply(fact, b):
    """Solve A x = b given ``fact = (L, dinv)`` from :func:`ldl_factor`.

    b : (..., k) -> x : (..., k)
    """
    L, dinv = fact
    k = b.shape[-1]
    y = [b[..., i] for i in range(k)]
    for i in range(k):
        for p in range(i):
            y[i] = y[i] - L[..., i, p] * y[p]
    for i in range(k):
        y[i] = y[i] * dinv[..., i]
    for i in range(k - 2, -1, -1):
        for p in range(i + 1, k):
            y[i] = y[i] - L[..., p, i] * y[p]
    return cx.stack(y, axis=-1)


def ldl_apply_mat(fact, M):
    """Solve A X = M (columns independently); M (..., k, m)."""
    import jax
    return jax.vmap(lambda col: ldl_apply(fact, col),
                    in_axes=-1, out_axes=-1)(M)


def block_tridiag_factor(D, B):
    """Forward block-Thomas elimination (field-independent part).

    Returns (factsL, factsd, Ws): stacked LDLᵀ factors of the
    eliminated diagonal blocks C_i and the elimination multipliers
    W_i = B_i C_{i-1}^{-1}.  These depend only on the model — callers
    factor once per smoothing call and reuse across colors/sweeps.
    """
    from jax import lax

    def mm(a, b):
        return cx.matmul_nt(a, b)

    def t(a):
        return cx.swapaxes(a, -1, -2)

    fact0 = ldl_factor(D[0])

    def fwd(carry, inp):
        factm = carry
        Di, Bi = inp
        # W = B_i C_{i-1}^{-1}  (C symmetric -> W = (C^{-1} B_iᵀ)ᵀ).
        W = t(ldl_apply_mat(factm, t(Bi)))
        Ci = Di - mm(W, t(Bi))
        facti = ldl_factor(Ci)
        return facti, (facti, W)

    _, (facts, Ws) = lax.scan(fwd, fact0, (D[1:], B[1:]))
    factsL = cx.concatenate([fact0[0][None], facts[0]], axis=0)
    factsd = cx.concatenate([fact0[1][None], facts[1]], axis=0)
    return factsL, factsd, Ws


def block_tridiag_solve_factored(factsL, factsd, Ws, B, r):
    """Solve with a factorization from :func:`block_tridiag_factor`."""
    from jax import lax

    def mv(a, b):
        return cx.matvec(a, b)

    def t(a):
        return cx.swapaxes(a, -1, -2)

    # Forward substitution: y_i = r_i − W_i y_{i-1}.
    def fwd(ym, inp):
        Wi, ri = inp
        yi = ri - mv(Wi, ym)
        return yi, yi

    y0 = r[0]
    _, ys = lax.scan(fwd, y0, (Ws, r[1:]))
    ys = cx.concatenate([y0[None], ys], axis=0)

    # Backward: δ_S-1 = C^{-1} y;  δ_i = C_i^{-1}(y_i − B_{i+1}ᵀ δ_{i+1}).
    xS = ldl_apply((factsL[-1], factsd[-1]), ys[-1])

    def bwd(xnext, inp):
        Li, di, yi, Bnext = inp
        xi = ldl_apply((Li, di), yi - mv(t(Bnext), xnext))
        return xi, xi

    _, xs = lax.scan(
        bwd, xS,
        (factsL[:-1], factsd[:-1], ys[:-1], B[1:]),
        reverse=True)
    return cx.concatenate([xs, xS[None]], axis=0)


def _lower_keys(n):
    return [(i, j) for i in range(n) for j in range(i)]


def block_tridiag_factor_entries(n, Dent, Bent):
    """Sparse-entry block-Thomas elimination (field-independent part).

    Like :func:`block_tridiag_factor` but the blocks never exist as
    dense ``(..., n, n)`` arrays: ``Dent``/``Bent`` are dicts of
    ``(S, ...)`` per-entry stacks (missing = structurally zero; Dent
    holds the lower triangle of the symmetric diagonal blocks), and
    the factors come back as one ``(S, ...)`` stack per strict-lower
    entry plus the inverse diagonals.  For the 5×5 line-relaxation
    blocks this stores 15 entry stacks instead of the dense path's
    25-entry L + 25-entry W + dense B (≈3× less HBM — the difference
    between OOM and fitting at 256³), skips every multiply against a
    structural zero of B, and needs no W matmuls at all: the solve
    uses the ``z = C⁻¹(r − B z₋)`` form (exactly the Pallas Thomas
    kernel's recurrence, ops/pallas_lr.py:_kernel_thomas).
    """
    from jax import lax

    lk = _lower_keys(n)

    def station(ent, i):
        return {k: v[i] for k, v in ent.items()}

    def full_fact(L, dinv):
        """Carry structure: every strict-lower entry present."""
        zero = 0.0 * dinv[0]
        return (tuple(L.get(k, zero) for k in lk), tuple(dinv))

    f0 = full_fact(*ldl_factor_sparse(n, station(Dent, i=0)))

    dkeys = sorted(Dent.keys())
    bkeys = sorted(Bent.keys())
    brows = {}                       # row a -> list of (k, key)
    for (a, k) in bkeys:
        brows.setdefault(a, []).append(k)

    def fwd(carry, inp):
        Lp, dp = carry
        Dv, Bv = inp
        Ld = dict(zip(lk, Lp))
        B = dict(zip(bkeys, Bv))
        D = dict(zip(dkeys, Dv))

        # cols[b] = C_{i-1}^{-1} (row b of B_i)  [= col b of C⁻¹B_iᵀ].
        zero = 0.0 * dp[0]
        cols = {}
        for b in brows:
            rhs = [B.get((b, k), zero) for k in range(n)]
            cols[b] = ldl_solve_factored(n, Ld, list(dp), rhs)

        # C_i = D_i − B_i cols  (lower triangle; B row a is sparse).
        C = {}
        for a in range(n):
            for b in range(a + 1):
                acc = D.get((a, b))
                if a in brows and b in cols:
                    for k in brows[a]:
                        t = B[(a, k)] * cols[b][k]
                        acc = (-t) if acc is None else (acc - t)
                if acc is not None:
                    C[(a, b)] = acc
        facti = full_fact(*ldl_factor_sparse(n, C))
        return facti, facti

    _, (Ls, ds) = lax.scan(fwd, f0, (tuple(Dent[k][1:] for k in dkeys),
                                     tuple(Bent[k][1:] for k in bkeys)))
    L_all = tuple(cx.concatenate([a[None], b], axis=0)
                  for a, b in zip(f0[0], Ls))
    d_all = tuple(cx.concatenate([a[None], b], axis=0)
                  for a, b in zip(f0[1], ds))
    return L_all, d_all


def block_tridiag_solve_entries(n, facts, Bent, r):
    """Solve with :func:`block_tridiag_factor_entries` factors.

    ``r`` is a list of n ``(S, ...)`` arrays; returns the same.
    """
    from jax import lax

    lk = _lower_keys(n)
    L_all, d_all = facts
    bkeys = sorted(Bent.keys())
    brows = {}
    for (a, k) in bkeys:
        brows.setdefault(a, []).append(k)

    def solve_one(Lv, dv, y):
        return ldl_solve_factored(n, dict(zip(lk, Lv)), list(dv), y)

    # Forward: z_i = C_i^{-1}(r_i − B_i z_{i-1}).
    z0 = solve_one([v[0] for v in L_all], [v[0] for v in d_all],
                   [v[0] for v in r])

    def fwd(zp, inp):
        Lv, dv, Bv, rv = inp
        B = dict(zip(bkeys, Bv))
        y = []
        for a in range(n):
            acc = rv[a]
            for k in brows.get(a, ()):
                acc = acc - B[(a, k)] * zp[k]
            y.append(acc)
        z = tuple(solve_one(Lv, dv, y))
        return z, z

    _, zs = lax.scan(fwd, tuple(z0),
                     (tuple(v[1:] for v in L_all),
                      tuple(v[1:] for v in d_all),
                      tuple(Bent[k][1:] for k in bkeys),
                      tuple(v[1:] for v in r)))
    zs = tuple(cx.concatenate([a[None], b], axis=0)
               for a, b in zip(z0, zs))

    # Backward: δ_i = z_i − C_i^{-1}(B_{i+1}ᵀ δ_{i+1});  (Bᵀ)_{ak} = B_{ka}.
    bcols = {}                      # col a of Bᵀ ↔ entries B_{ka}
    for (k, a) in bkeys:
        bcols.setdefault(a, []).append(k)

    dS = tuple(v[-1] for v in zs)

    def bwd(dn, inp):
        Lv, dv, Bv, zv = inp
        B = dict(zip(bkeys, Bv))
        u = []
        for a in range(n):
            acc = None
            for k in bcols.get(a, ()):
                t = B[(k, a)] * dn[k]
                acc = t if acc is None else acc + t
            u.append(acc if acc is not None else 0.0 * zv[a])
        cu = solve_one(Lv, dv, u)
        d = tuple(z - c for z, c in zip(zv, cu))
        return d, d

    _, ds_ = lax.scan(bwd, dS,
                      (tuple(v[:-1] for v in L_all),
                       tuple(v[:-1] for v in d_all),
                       tuple(Bent[k][1:] for k in bkeys),
                       tuple(v[:-1] for v in zs)),
                      reverse=True)
    return [cx.concatenate([low, dS[i][None]], axis=0)
            for i, low in enumerate(ds_)]


def block_tridiag_solve(D, B, r):
    """Solve a batched complex-symmetric block-tridiagonal system.

    The system has S stations of k unknowns; sub-diagonal blocks B[i]
    couple station i to station i-1 (B[0] is ignored), and by symmetry
    the super-diagonal blocks are B[i]ᵀ.

    D : (S, ..., k, k);  B : (S, ..., k, k);  r : (S, ..., k)
    Returns x : (S, ..., k).
    """
    factsL, factsd, Ws = block_tridiag_factor(D, B)
    return block_tridiag_solve_factored(factsL, factsd, Ws, B, r)
