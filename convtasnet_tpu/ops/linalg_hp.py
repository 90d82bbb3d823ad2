"""High-precision batched Cholesky + triangular solves for TPU.

Why this exists: XLA:TPU expands `cholesky` and `triangular_solve` HLOs
into blocked algorithms whose inner dots run at the backend's DEFAULT
f32 matmul precision — on the MXU that rounds operands through bf16,
and the expansion happens after JAX tracing, so neither
`jax.default_matmul_precision` nor per-op `precision=` reaches it.
Measured on v5e: `jnp.linalg.cholesky` of an ill-conditioned 512x512
speech Gram factors with ~2e-3 relative residual (vs ~1e-7 for true f32
on CPU) — three orders of magnitude of factorization quality lost, which
the device BSS-Eval metric (ops/metrics_device.py) cannot survive.

This module implements the same blocked algorithms in plain JAX ops with
every dot pinned to `Precision.HIGHEST` (the MXU's multi-pass full-f32
path), giving genuine f32-grade factors on TPU:

  * `cholesky_hp(A)` — left-looking blocked Cholesky over 128-wide
    panels (static Python loop, unrolled under jit); the per-block base
    case is an unblocked column-by-column `lax.fori_loop` using masked
    HIGHEST matvecs. Diagonal-block inverses are computed once by
    forward substitution (the cuBLAS-style trsm trick), so...
  * `cho_solve_hp(fac, b)` — both triangular solves are pure batched
    matmul chains (no sequential per-column work): block forward/back
    substitution with the precomputed 128x128 diagonal inverses.

Everything broadcasts over leading batch dimensions. Sizes that are not
multiples of the 128 block width fall back to a single base-case block
(fine for the small matrices where that happens).

Reference capability being served: evaluate.py:90-105's BSS-Eval, moved
on-device (VERDICT round-3 item 3).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST
_BS = 128


def _mm(a, b):
    """Batched matmul at HIGHEST precision (the whole point)."""
    return jnp.einsum("...ik,...kj->...ij", a, b, precision=_HI)


def _mmT(a, b):
    """a @ b^T at HIGHEST precision."""
    return jnp.einsum("...ik,...jk->...ij", a, b, precision=_HI)


def _chol_base(A):
    """Unblocked lower Cholesky, batched: [..., n, n] -> L.

    Column-by-column fori_loop; the per-column update is one masked
    HIGHEST matvec, so accuracy matches a classical f32 factorization.
    Assumes A is positive definite (callers add a ridge)."""
    n = A.shape[-1]
    iota = jnp.arange(n)

    def body(j, L):
        mask = (iota < j).astype(A.dtype)                    # cols < j
        rowj = jax.lax.dynamic_slice_in_dim(L, j, 1, axis=-2)[..., 0, :]
        rowj = rowj * mask                                   # [..., n]
        c = jax.lax.dynamic_slice_in_dim(A, j, 1, axis=-1)[..., 0]
        c = c - jnp.einsum("...ik,...k->...i", L * mask, rowj,
                           precision=_HI)
        cj = jax.lax.dynamic_slice_in_dim(c, j, 1, axis=-1)
        # No clamp: a non-positive pivot must produce NaN so the callers'
        # breakdown detector (cholesky_nan_rows) can trigger a fallback.
        d = jnp.sqrt(cj)                                     # [..., 1]
        col = jnp.where(iota >= j, c / d, jnp.zeros((), A.dtype))
        onehot = (iota == j).astype(A.dtype)                 # [n]
        return L * (1.0 - onehot) + col[..., None] * onehot

    return jax.lax.fori_loop(0, n, body, jnp.zeros_like(A))


def _tri_inv_base(L):
    """Inverse of a lower-triangular [..., n, n] by forward substitution
    (row-at-a-time fori_loop, HIGHEST matvecs). Used only on the
    well-scaled 128x128 diagonal blocks."""
    n = L.shape[-1]
    iota = jnp.arange(n)

    def body(j, X):
        mask = (iota < j).astype(L.dtype)
        rowj = jax.lax.dynamic_slice_in_dim(L, j, 1, axis=-2)[..., 0, :]
        acc = jnp.einsum("...k,...kj->...j", rowj * mask, X,
                         precision=_HI)                      # [..., n]
        djj = jnp.sum(rowj * (iota == j).astype(L.dtype), axis=-1,
                      keepdims=True)
        ej = (iota == j).astype(L.dtype)                     # identity row
        row = (ej - acc) / djj
        onehot = ((iota == j).astype(L.dtype))[..., None]    # row select
        return X * (1.0 - onehot) + row[..., None, :] * onehot

    return jax.lax.fori_loop(0, n, body, jnp.zeros_like(L))


class CholFactor(NamedTuple):
    """Blocked factor: L (lower, [..., n, n]) plus the per-diagonal-block
    inverses Dinv ([..., nb, bs, bs]) that make the solves matmul-only."""
    L: jnp.ndarray
    Dinv: jnp.ndarray
    bs: int


def _blk(A, i, j, bs):
    return A[..., i * bs:(i + 1) * bs, j * bs:(j + 1) * bs]


def cholesky_hp(A) -> CholFactor:
    """Batched lower Cholesky of PSD [..., n, n] at HIGHEST precision."""
    n = A.shape[-1]
    bs = _BS if n % _BS == 0 else n
    nb = n // bs
    if nb == 1:
        L = _chol_base(A)
        return CholFactor(L, _tri_inv_base(L)[..., None, :, :], bs)

    Lb = [[None] * nb for _ in range(nb)]
    Dinv = []
    for i in range(nb):
        S = _blk(A, i, i, bs)
        for k in range(i):
            S = S - _mmT(Lb[i][k], Lb[i][k])
        Lii = _chol_base(S)
        Dii = _tri_inv_base(Lii)
        Lb[i][i] = Lii
        Dinv.append(Dii)
        for r in range(i + 1, nb):
            P = _blk(A, r, i, bs)
            for k in range(i):
                P = P - _mmT(Lb[r][k], Lb[i][k])
            # L_ri = P L_ii^{-T}, with one refinement pass against L_ii
            # (the explicit inverse alone loses accuracy when L_ii is
            # ill-conditioned, and panel error propagates into every
            # downstream Schur complement).
            Y = _mmT(P, Dii)
            R = P - _mmT(Y, Lii)
            Lb[r][i] = Y + _mmT(R, Dii)
    zero = jnp.zeros_like(Lb[0][0])
    rows = [jnp.concatenate(
        [Lb[i][j] if j <= i else zero for j in range(nb)], axis=-1)
        for i in range(nb)]
    L = jnp.concatenate(rows, axis=-2)
    return CholFactor(L, jnp.stack(Dinv, axis=-3), bs)


def cho_solve_hp(fac: CholFactor, b) -> jnp.ndarray:
    """Solve A x = b from cholesky_hp's factor. b: [..., n] or [..., n, k].

    Both substitutions are static matmul chains (HIGHEST precision).
    Applying the explicit diagonal-block inverses loses accuracy when a
    trailing block of L is ill-conditioned (degenerate Grams), so each
    triangular solve runs one residual-refinement pass — two extra
    matmul sweeps that restore substitution-grade accuracy while keeping
    the whole solve sequential-free."""
    vec = b.ndim == fac.L.ndim - 1
    if vec:
        b = b[..., None]
    n = fac.L.shape[-1]
    bs = fac.bs
    nb = n // bs
    Dinv = [fac.Dinv[..., i, :, :] for i in range(nb)]
    Lb = lambda i, j: _blk(fac.L, i, j, bs)  # noqa: E731

    def split(v):
        return [v[..., i * bs:(i + 1) * bs, :] for i in range(nb)]

    def fwd(rhs):  # L y = rhs (block forward substitution)
        y = []
        for i in range(nb):
            acc = rhs[i]
            for j in range(i):
                acc = acc - _mm(Lb(i, j), y[j])
            y.append(_mm(Dinv[i], acc))
        return y

    def bwd(rhs):  # L^T x = rhs (block backward substitution)
        x = [None] * nb
        for i in range(nb - 1, -1, -1):
            acc = rhs[i]
            for j in range(i + 1, nb):
                acc = acc - _mm(jnp.swapaxes(Lb(j, i), -1, -2), x[j])
            x[i] = _mm(jnp.swapaxes(Dinv[i], -1, -2), acc)
        return x

    def refine(solver, mul, rhs, sol):
        res = [rhs[i] - mul(i, sol) for i in range(nb)]
        dx = solver(res)
        return [sol[i] + dx[i] for i in range(nb)]

    def lmul(i, v):  # (L v)_i
        acc = None
        for j in range(i + 1):
            t = _mm(Lb(i, j), v[j])
            acc = t if acc is None else acc + t
        return acc

    def ltmul(i, v):  # (L^T v)_i
        acc = None
        for j in range(i, nb):
            t = _mm(jnp.swapaxes(Lb(j, i), -1, -2), v[j])
            acc = t if acc is None else acc + t
        return acc

    bblk = split(b)
    y = refine(fwd, lmul, bblk, fwd(bblk))
    x = refine(bwd, ltmul, y, bwd(y))
    out = jnp.concatenate(x, axis=-2)
    return out[..., 0] if vec else out


def cholesky_nan_rows(fac: CholFactor) -> jnp.ndarray:
    """Per-batch-row NaN mask over the factor (breakdown detector)."""
    return jnp.any(jnp.isnan(fac.L), axis=(-2, -1))


def chol_factor_where(bad, fac_big: CholFactor, fac_small: CholFactor
                      ) -> CholFactor:
    """Per-row select between two factors (the big-ridge fallback)."""
    sel = bad[..., None, None]
    return CholFactor(
        jnp.where(sel, fac_big.L, fac_small.L),
        jnp.where(bad[..., None, None, None], fac_big.Dinv, fac_small.Dinv),
        fac_small.bs,
    )
