"""High-precision batched Cholesky/solve (ops/linalg_hp.py).

These kernels exist because XLA:TPU's cholesky/triangular_solve
expansions run their inner dots at default (bf16-rounded) precision; on
CPU they must simply match LAPACK-grade f32 results, which is what these
tests pin (the TPU win is measured in docs/results.md).
"""

import numpy as np
import pytest

from convtasnet_tpu.ops.linalg_hp import (cho_solve_hp, cholesky_hp,
                                          cholesky_nan_rows)


def _rand_psd(rng, batch, n, cond=1e3):
    q, _ = np.linalg.qr(rng.standard_normal((*batch, n, n)))
    lam = np.geomspace(1.0, 1.0 / cond, n)
    return (q * lam).astype(np.float64) @ np.swapaxes(q, -1, -2)


@pytest.mark.parametrize("n", [32, 96, 128, 256, 512])
def test_cholesky_matches_numpy(rng, n):
    A = _rand_psd(rng, (3,), n)
    fac = cholesky_hp(np.asarray(A, np.float32))
    want = np.linalg.cholesky(A)
    np.testing.assert_allclose(np.asarray(fac.L), want,
                               rtol=2e-3, atol=2e-5)
    # The factorization residual is the real quality gate (f32-grade).
    L = np.asarray(fac.L, np.float64)
    res = np.linalg.norm(L @ np.swapaxes(L, -1, -2) - A, axis=(-2, -1))
    scale = np.linalg.norm(A, axis=(-2, -1))
    assert np.all(res / scale < 5e-6)


@pytest.mark.parametrize("n,k", [(128, 1), (256, 4), (512, 3), (96, 2)])
def test_cho_solve_matches_numpy(rng, n, k):
    A = _rand_psd(rng, (2,), n)
    b = rng.standard_normal((2, n, k))
    fac = cholesky_hp(np.asarray(A, np.float32))
    x = np.asarray(cho_solve_hp(fac, np.asarray(b, np.float32)),
                   np.float64)
    want = np.linalg.solve(A, b)
    # Norm-wise f32-grade accuracy (elementwise would be cond-limited on
    # near-zero entries).
    assert (np.linalg.norm(x - want) / np.linalg.norm(want)) < 1e-4


def test_cho_solve_vector_rhs(rng):
    A = _rand_psd(rng, (2, 3), 128)  # two leading batch dims
    b = rng.standard_normal((2, 3, 128))
    fac = cholesky_hp(np.asarray(A, np.float32))
    x = np.asarray(cho_solve_hp(fac, np.asarray(b, np.float32)))
    assert x.shape == (2, 3, 128)
    want = np.linalg.solve(A, b[..., None])[..., 0]
    assert (np.linalg.norm(x - want) / np.linalg.norm(want)) < 1e-4


def test_breakdown_produces_nan_rows(rng):
    good = _rand_psd(rng, (), 128)
    bad = np.eye(128)
    bad[5, 5] = -1.0  # indefinite -> pivot failure
    A = np.stack([good, bad]).astype(np.float32)
    fac = cholesky_hp(A)
    flags = np.asarray(cholesky_nan_rows(fac))
    assert flags.tolist() == [False, True]
