"""Device-side BSS-Eval v3: batched SDR/SDRi on the TPU (VERDICT r3 #3).

The reference computes SDRi per utterance on the host through
mir_eval.bss_eval_sources (/root/reference/src/evaluate.py:76-105) — and
so did this repo's own host BSS-Eval (ops/metrics.py) at ~1.1 s/utt of
single-threaded numpy, leaving the chip >99.9% idle during cal_sdr=1
evaluation (separation itself takes 0.53 ms/utt). But the metric is
almost entirely batched matmul/FFT work: 512-tap least-squares
projections of each estimate onto the subspace of delayed references
(Vincent et al. 2006), assembled from FFT cross-correlations, a
block-Toeplitz Gram Cholesky, and energy ratios. This module runs the
WHOLE pipeline as one jitted program, batched over utterances, with the
estimates AND the do-nothing mixture anchor sharing one Gram
factorization per utterance.

Numerics vs the host/f64 implementation: everything here is f32 (TPU has
no f64). The Gram factorization uses a tiny lambda_max-scaled Tikhonov
ridge with a NaN-detected big-ridge fallback, and every solve runs
iterated-Tikhonov refinement against the raw Gram (details at
robust_cholesky below; the step count is a measured minimax — too many
steps amplify f32 FFT noise in near-null Gram directions). Measured
agreement with the f64 host: ~1e-6 dB on broadband signals and the
oracle test cases (comfortably inside the 1e-3 dB parity gate); on
DEGENERATE near-pure-tone mixtures — where the delayed-source Gram is
numerically rank-deficient and the f32 FFTs themselves carry ~1e-6
relative noise that f64 would need to resolve the near-null space —
worst-case ~0.04 dB (tests/test_metrics.py). The host f64 path stays
available as `--sdr_backend host` and remains the oracle.

Padding contract: rows may be zero-padded past their true length —
linear FFT correlations of zero-padded signals are EXACT (no wraparound
for any n_fft >= T + flen), so padded-batch results equal trimmed
per-utterance results up to f32. Estimates are masked to their true
length here (the model emits garbage past the utterance end; the host
path trims instead).
"""

from __future__ import annotations

from functools import partial
from itertools import permutations

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1.1920929e-07  # f32 machine eps, mirroring the host's f64 eps role
_JITTER = 3e-8        # ridge as a fraction of the lambda_max bound
_JITTER_BIG = 1e-4    # fallback ridge for rows whose f32 Cholesky NaN'd


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _ratios(s_target, e_interf, e_artif):
    """SDR/SIR/SAR from the three projection components (axis -1 = time)."""
    et = jnp.sum(s_target * s_target, axis=-1)
    ei = jnp.sum(e_interf * e_interf, axis=-1)
    eia = jnp.sum((e_interf + e_artif) ** 2, axis=-1)
    ea = jnp.sum(e_artif * e_artif, axis=-1)
    eti = jnp.sum((s_target + e_interf) ** 2, axis=-1)
    ten = jnp.float32(10.0)
    sdr = ten * jnp.log10(et / (eia + _EPS) + _EPS)
    sir = ten * jnp.log10(et / (ei + _EPS) + _EPS)
    sar = ten * jnp.log10(eti / (ea + _EPS) + _EPS)
    return sdr, sir, sar


@partial(jax.jit, static_argnames=("filt_len",))
def _bss_eval_kernel(refs, ests, mix, lengths, filt_len):
    """refs/ests [B, C, T], mix [B, T], lengths [B] ->
    (sdr [B, C], sir [B, C], perm [B, C], sdr0 [B, C], sdri [B]).

    sdr/sir are already gathered at the SIR-maximizing permutation;
    sdr0 is the mixture-anchor row (identical for every estimate, so the
    anchor is projected once, not C times); sdri matches
    ops.metrics.sdr_improvement's mean over channels.
    """
    # TPU's default f32 matmul precision rounds operands through bf16,
    # which this metric's conditioning cannot survive. This context pins
    # every traced dot to the MXU's full-f32 path; the Cholesky/solves
    # additionally use ops/linalg_hp.py because XLA's own expansions are
    # beyond the reach of this context (see the comment there). The whole
    # pipeline is a metric, not a training hot path — full f32 everywhere
    # is the right trade.
    with jax.default_matmul_precision("highest"):
        return _bss_eval_impl(refs, ests, mix, lengths, filt_len)


def _bss_eval_impl(refs, ests, mix, lengths, filt_len):
    B, C, T = refs.shape
    flen = filt_len
    n_fft = _next_pow2(T + flen)
    f32 = jnp.float32

    tmask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(f32)
    refs = refs.astype(f32) * tmask[:, None, :]
    ests = ests.astype(f32) * tmask[:, None, :]
    mix = mix.astype(f32) * tmask

    sf = jnp.fft.rfft(refs, n=n_fft, axis=-1)            # [B, C, F]

    # Gram blocks: cc_{jk}[d] = sum_t s_j[t] s_k[t+d] (circular, exact
    # for linear lags here); block[a, b] = cc[(a - b) mod n_fft].
    cc = jnp.fft.irfft(jnp.conj(sf)[:, :, None] * sf[:, None, :],
                       n=n_fft, axis=-1)                 # [B, C, C, n_fft]
    a = jnp.arange(flen)
    idx = (a[:, None] - a[None, :]) % n_fft              # [flen, flen]
    blocks = cc[..., idx]                                # [B, C, C, flen, flen]
    G = blocks.transpose(0, 1, 3, 2, 4).reshape(B, C * flen, C * flen)

    # f32 Cholesky of near-singular speech Grams needs a floor. Tonal
    # content makes delayed-source Grams arbitrarily ill-conditioned
    # (a sinusoid's 512 delays span a 2-dim space), so: factor with a
    # TINY ridge scaled to a Gershgorin bound on lambda_max (keeps the
    # regularization bias ~f32-eps-level), detect the rows where f32
    # Cholesky still broke down (NaN), and refactor those with a big
    # ridge — then the solves below de-bias with refinement steps
    # against the RAW Gram (iterated Tikhonov: converges to the
    # unregularized solution in well-conditioned directions, stays
    # regularized in the near-null space, where the f64 host's lstsq
    # fallback truncates too). Measured disagreement with the f64 host:
    # ~1e-6 dB broadband, ~0.04 dB worst-case on degenerate pure-tone
    # mixtures (tests/test_metrics.py and the module docstring).
    # The factorization/solves use ops/linalg_hp.py, NOT
    # jnp.linalg.cholesky / solve_triangular: XLA:TPU expands those into
    # blocked dots at DEFAULT precision (bf16-rounded operands) after
    # tracing, beyond the reach of any jax precision control — measured
    # ~2e-3 relative factor residual vs ~1e-7 for true f32, which turned
    # into ~2 dB SDRi error on TPU while CPU f32 agreed to centi-dB.
    from .linalg_hp import (cho_solve_hp, chol_factor_where, cholesky_hp,
                            cholesky_nan_rows)

    def robust_cholesky(Graw):
        lam = jnp.max(jnp.sum(jnp.abs(Graw), axis=-1), axis=-1)  # [...]
        eye = jnp.eye(Graw.shape[-1])
        fac1 = cholesky_hp(
            Graw + (_JITTER * lam + _EPS)[..., None, None] * eye)
        bad = cholesky_nan_rows(fac1)
        fac2 = cholesky_hp(
            Graw + (_JITTER_BIG * lam + _EPS)[..., None, None] * eye)
        return chol_factor_where(bad, fac2, fac1)

    L = robust_cholesky(G)                               # factor of [B, CF, CF]
    Gd = blocks[:, jnp.arange(C), jnp.arange(C)]         # [B, C, flen, flen]
    Ld = robust_cholesky(Gd)

    def refined_solve(fac, Graw, b, steps=4):
        """Solve Graw h ~= b through the jittered factor + refinement."""
        h = cho_solve_hp(fac, b)
        for _ in range(steps):
            # HIGHEST precision is load-bearing: the TPU MXU's default
            # f32 matmul path rounds through bf16, which wipes out the
            # cancellation this residual exists to measure.
            r = b - jnp.einsum("...ij,...j->...i", Graw, h,
                               precision=jax.lax.Precision.HIGHEST)
            h = h + cho_solve_hp(fac, r)
        return h

    Tp = T + flen - 1

    def project(e):
        """One estimate [B, T] -> (s_target [B, C, Tp], e_interf, e_artif)."""
        ef = jnp.fft.rfft(e, n=n_fft, axis=-1)           # [B, F]
        cd = jnp.fft.irfft(jnp.conj(sf) * ef[:, None], n=n_fft, axis=-1)
        D = cd[..., :flen]                               # [B, C, flen]
        h = refined_solve(L, G, D.reshape(B, C * flen))
        hf = jnp.fft.rfft(h.reshape(B, C, flen), n=n_fft, axis=-1)
        p_all = jnp.fft.irfft(jnp.sum(hf * sf, axis=1), n=n_fft,
                              axis=-1)[..., :Tp]         # [B, Tp]
        e_pad = jnp.pad(e, ((0, 0), (0, flen - 1)))
        e_artif = e_pad - p_all
        hj = refined_solve(Ld, Gd, D)                    # [B, C, flen]
        hjf = jnp.fft.rfft(hj, n=n_fft, axis=-1)
        s_target = jnp.fft.irfft(hjf * sf, n=n_fft, axis=-1)[..., :Tp]
        e_interf = p_all[:, None, :] - s_target
        return s_target, e_interf, e_artif[:, None, :]

    # C estimates, vmapped over the channel axis -> [C(est), B, C(ref)].
    sdr_m, sir_m, _ = jax.vmap(
        lambda e: _ratios(*project(e)), in_axes=1, out_axes=0)(ests)
    sdr_m = sdr_m.transpose(1, 0, 2)                     # [B, Cest, Cref]
    sir_m = sir_m.transpose(1, 0, 2)
    # The anchor (mixture duplicated per channel) projects ONCE.
    sdr0_row, _, _ = _ratios(*project(mix))              # [B, Cref]

    # SIR-maximizing permutation (mir_eval default, host parity): argmax
    # over the static C! enumeration, ties to the first (host uses strict
    # '>' over itertools order).
    perms = np.array(list(permutations(range(C))))       # [P, C]
    rows = np.arange(C)
    mean_sir = jnp.stack(
        [jnp.mean(sir_m[:, rows, p], axis=-1) for p in perms], axis=1)
    best = jnp.argmax(mean_sir, axis=1)                  # first max wins
    perm = jnp.asarray(perms)[best]                      # [B, C]
    sdr = jnp.take_along_axis(sdr_m, perm[:, None, :], axis=2)[
        :, rows, rows]
    sir = jnp.take_along_axis(sir_m, perm[:, None, :], axis=2)[
        :, rows, rows]
    sdri = jnp.mean(sdr - sdr0_row, axis=-1)
    return sdr, sir, perm, sdr0_row, sdri


def sdr_improvement_batch(src_ref, src_est, mix, lengths=None,
                          filt_len: int = 512):
    """Batched device SDRi: [B, C, T] refs/ests, [B, T] mix -> [B] f32.

    Drop-in batched analogue of ops.metrics.sdr_improvement (the
    mixture-anchor SDRi of /root/reference/src/evaluate.py:90-105),
    running as one jitted program on the accelerator. lengths defaults to
    the full T; rows are masked past their length (see module docstring).
    """
    src_ref = jnp.asarray(src_ref)
    B, C, T = src_ref.shape
    if lengths is None:
        lengths = jnp.full((B,), T, jnp.int32)
    *_, sdri = _bss_eval_kernel(src_ref, jnp.asarray(src_est),
                                jnp.asarray(mix), jnp.asarray(lengths),
                                filt_len)
    return sdri


def bss_eval_sources_device(reference_sources, estimated_sources,
                            filt_len: int = 512):
    """Single-utterance device BSS-Eval matching the host contract:
    [C, T] refs/ests -> (sdr [C], sir [C], perm [C]) at the
    SIR-maximizing permutation."""
    ref = jnp.asarray(reference_sources)[None]
    est = jnp.asarray(estimated_sources)[None]
    mix = jnp.sum(ref, axis=1)  # anchor unused by this entry point
    sdr, sir, perm, _, _ = _bss_eval_kernel(
        ref, est, mix, jnp.asarray([ref.shape[-1]], jnp.int32), filt_len)
    return np.asarray(sdr[0]), np.asarray(sir[0]), np.asarray(perm[0])


def si_snr_improvement_batch(src_ref, src_est, mix, lengths=None):
    """Batched device SI-SNRi: [B, C, T] refs/ests, [B, T] mix -> [B] f32.

    The host ops.metrics.si_snr_improvement semantics (reference
    evaluate.py:108-144: per-channel SI-SNR of the estimate minus the
    duplicated-mixture baseline, averaged over C) as masked f32 device
    math, so multi-host evaluation can reduce metrics on device instead
    of fetching non-addressable global estimates to each host. Rows are
    masked to their true length (zero-mean divides by the real sample
    count); agreement with the trimmed f64 host path is ~1e-5 dB on
    broadband separation outputs (tests/test_metrics.py).
    """
    src_ref = jnp.asarray(src_ref)
    B, C, T = src_ref.shape
    if lengths is None:
        lengths = jnp.full((B,), T, jnp.int32)
    eps = 1e-8  # the host metric's EPS (ops/metrics.py)
    mask = (jnp.arange(T)[None, None, :]
            < jnp.asarray(lengths)[:, None, None]).astype(jnp.float32)
    n = jnp.maximum(jnp.asarray(lengths), 1).astype(jnp.float32)[:, None, None]

    def zero_mean(x):
        x = x.astype(jnp.float32) * mask
        return (x - jnp.sum(x, 2, keepdims=True) / n) * mask

    ref = zero_mean(src_ref)

    def si_snr(est):  # est [B, C, T] zero-meaned/masked -> [B, C] dB
        ref_energy = jnp.sum(ref * ref, 2) + eps
        scale = jnp.sum(ref * est, 2) / ref_energy
        proj = scale[..., None] * ref
        noise = est - proj
        ratio = jnp.sum(proj * proj, 2) / (jnp.sum(noise * noise, 2) + eps)
        return 10.0 * jnp.log10(ratio + eps)

    est_snr = si_snr(zero_mean(src_est))
    base_snr = si_snr(zero_mean(jnp.broadcast_to(
        jnp.asarray(mix)[:, None, :], (B, C, T))))
    return jnp.mean(est_snr - base_snr, axis=1)
