import numpy as np
import pytest

from convtasnet_tpu.ops.metrics import (
    bss_eval_sources,
    sdr_improvement,
    si_snr,
    si_snr_improvement,
)


def test_si_snr_scale_invariant(rng):
    x = rng.standard_normal(512)
    assert si_snr(x, 3.7 * x) > 100  # capped near 118 dB by eps
    assert abs(si_snr(x, x + 0.1 * rng.standard_normal(512)) - 20) < 1.5


def test_si_snr_improvement_zero_for_mixture(rng):
    # Estimating the mixture itself gives SI-SNRi == 0 by construction.
    s = rng.standard_normal((2, 400))
    mix = s.sum(0)
    est = np.stack([mix, mix])
    assert abs(si_snr_improvement(s, est, mix)) < 1e-9


def _bruteforce_project(sources, est, flen):
    """Direct least-squares onto the delayed-source matrix (small sizes)."""
    C, T = sources.shape
    A = np.zeros((T + flen - 1, C * flen))
    for j in range(C):
        for d in range(flen):
            A[d : d + T, j * flen + d] = sources[j]
    b = np.concatenate([est, np.zeros(flen - 1)])
    h, *_ = np.linalg.lstsq(A, b, rcond=None)
    return A @ h


def test_projection_matches_bruteforce(rng):
    from convtasnet_tpu.ops.metrics import _project

    sources = rng.standard_normal((2, 64))
    est = rng.standard_normal(64)
    flen = 8
    got = _project(sources, est, flen)
    want = _bruteforce_project(sources, est, flen)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


def test_bss_eval_perfect_separation(rng):
    s = rng.standard_normal((2, 2000))
    sdr, sir, sar, perm = bss_eval_sources(s, s.copy(), filt_len=64)
    assert np.all(sdr > 100)
    np.testing.assert_array_equal(perm, [0, 1])


def test_bss_eval_finds_permutation(rng):
    s = rng.standard_normal((2, 2000))
    est = s[::-1].copy() + 0.01 * rng.standard_normal((2, 2000))
    sdr, sir, sar, perm = bss_eval_sources(s, est, filt_len=64)
    np.testing.assert_array_equal(perm, [1, 0])
    assert np.all(sdr > 20)


def test_bss_eval_invariant_to_short_filtering(rng):
    # SDR must forgive filtering within the filt_len allowance: an
    # FIR-filtered copy of the source lies exactly in the projection span.
    s = rng.standard_normal((2, 3000))
    h0 = rng.standard_normal(8)
    h1 = rng.standard_normal(8)
    est = np.stack([
        np.convolve(s[0], h0)[:3000],
        np.convolve(s[1], h1)[:3000],
    ])
    # The truncated convolution tail is unavoidable artifact energy, so
    # "near-perfect" here is ~30 dB, not inf (mir_eval behaves the same).
    sdr, _, _, perm = bss_eval_sources(s, est, filt_len=64)
    assert np.all(sdr > 25)
    np.testing.assert_array_equal(perm, [0, 1])


def test_sdri_positive_for_good_separation(rng):
    s = rng.standard_normal((2, 1500))
    mix = s.sum(0)
    good = s + 0.05 * rng.standard_normal((2, 1500))
    assert sdr_improvement(s, good, mix, filt_len=32) > 5
