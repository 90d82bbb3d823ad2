"""Separation quality metrics: SI-SNR(i) and BSS-Eval SDR(i)/SIR/SAR.

Host-side numpy implementations matching the reference eval harness
(evaluate.py:90-144). The reference outsources SDR to
mir_eval.bss_eval_sources; that package isn't available here, so the
framework carries its own BSS Eval v3 implementation built from the metric
definitions (Vincent et al., "Performance measurement in blind audio
source separation", IEEE TASLP 2006): 512-tap least-squares projections of
the estimate onto the subspace of delayed references, assembled with FFT
cross-correlations and a block-Gram solve, with the SIR-maximizing
permutation search mir_eval applies by default.
"""

from __future__ import annotations

from itertools import permutations
from typing import Tuple

import numpy as np

EPS = 1e-8


# --------------------------------------------------------------------------
# SI-SNR (evaluate.py:128-144 semantics)
# --------------------------------------------------------------------------

def si_snr(ref: np.ndarray, est: np.ndarray, eps: float = EPS) -> float:
    """Scale-invariant SNR between two 1-D signals."""
    ref = np.asarray(ref, np.float64)
    est = np.asarray(est, np.float64)
    assert ref.shape == est.shape
    ref = ref - ref.mean()
    est = est - est.mean()
    ref_energy = np.sum(ref**2) + eps
    proj = np.sum(ref * est) * ref / ref_energy
    noise = est - proj
    ratio = np.sum(proj**2) / (np.sum(noise**2) + eps)
    return float(10 * np.log10(ratio + eps))


def si_snr_improvement(src_ref: np.ndarray, src_est: np.ndarray, mix: np.ndarray) -> float:
    """Average SI-SNRi over channels, mixture as the do-nothing baseline
    (evaluate.py:108-125). src_ref/src_est: [C, T], mix: [T]."""
    C = src_ref.shape[0]
    vals = []
    for c in range(C):
        snr = si_snr(src_ref[c], src_est[c])
        base = si_snr(src_ref[c], mix)
        vals.append(snr - base)
    return float(np.mean(vals))


# --------------------------------------------------------------------------
# BSS Eval v3 (SDR / SIR / SAR)
# --------------------------------------------------------------------------

def _corr_matrices(sources: np.ndarray, est: np.ndarray, flen: int):
    """Gram matrix G of delayed sources and cross-correlation D with est.

    sources: [C, T] (zero-padded internally), est: [T].
    G: [C*flen, C*flen], G[j*flen+a, k*flen+b] = sum_t s_j[t-a] s_k[t-b]
    D: [C*flen], D[j*flen+a] = sum_t s_j[t-a] est[t]
    Correlations over the zero-padded support, computed via FFT.
    """
    C, T = sources.shape
    n_fft = 1
    while n_fft < T + flen:
        n_fft *= 2
    sf = np.fft.rfft(sources, n=n_fft, axis=1)
    ef = np.fft.rfft(est, n=n_fft)

    from scipy.linalg import toeplitz

    G = np.empty((C * flen, C * flen))
    for j in range(C):
        for k in range(j, C):
            # cross-correlation cc[d] = sum_t s_j[t] s_k[t+d]; the (j, k)
            # block is Toeplitz: block[a, b] = <s_j delayed a, s_k delayed b>
            # = sum_u s_j[u] s_k[u + a - b] = cc[(a - b) mod n_fft].
            cc = np.fft.irfft(np.conj(sf[j]) * sf[k], n=n_fft)
            block = toeplitz(cc[:flen], cc[(-np.arange(flen)) % n_fft])
            G[j * flen : (j + 1) * flen, k * flen : (k + 1) * flen] = block
            if k != j:
                G[k * flen : (k + 1) * flen, j * flen : (j + 1) * flen] = block.T
    D = np.empty(C * flen)
    for j in range(C):
        cd = np.fft.irfft(np.conj(sf[j]) * ef, n=n_fft)
        D[j * flen : (j + 1) * flen] = cd[:flen]
    return G, D


def _project(sources: np.ndarray, est: np.ndarray, flen: int) -> np.ndarray:
    """Least-squares projection of est onto delays 0..flen-1 of sources."""
    C, T = sources.shape
    G, D = _corr_matrices(sources, est, flen)
    try:
        h = np.linalg.solve(G, D)
    except np.linalg.LinAlgError:
        h, *_ = np.linalg.lstsq(G, D, rcond=None)
    # Filter-and-sum: proj[t] = sum_j sum_a h[j,a] s_j[t-a]
    proj = np.zeros(T + flen - 1)
    for j in range(C):
        proj += np.convolve(sources[j], h[j * flen : (j + 1) * flen])
    return proj


def _decompose(ref: np.ndarray, est: np.ndarray, j: int, flen: int):
    """s_target / e_interf / e_artif for estimate est of source j."""
    C, T = ref.shape
    padded_est = np.concatenate([est, np.zeros(flen - 1)])
    s_target = _project(ref[j : j + 1], est, flen)
    p_all = _project(ref, est, flen)
    e_interf = p_all - s_target
    e_artif = padded_est - p_all
    return s_target, e_interf, e_artif


def _ratios(s_target, e_interf, e_artif, eps: float = np.finfo(np.float64).eps):
    sdr = 10 * np.log10(np.sum(s_target**2) / (np.sum((e_interf + e_artif) ** 2) + eps) + eps)
    sir = 10 * np.log10(np.sum(s_target**2) / (np.sum(e_interf**2) + eps) + eps)
    sar = 10 * np.log10(
        np.sum((s_target + e_interf) ** 2) / (np.sum(e_artif**2) + eps) + eps
    )
    return sdr, sir, sar


def bss_eval_sources(
    reference_sources: np.ndarray,
    estimated_sources: np.ndarray,
    compute_permutation: bool = True,
    filt_len: int = 512,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """BSS Eval SDR/SIR/SAR with SIR-maximizing permutation search.

    Args: [C, T] references and estimates (same shapes).
    Returns (sdr, sir, sar, perm) each [C], with estimate i scored against
    reference perm[i] — the mir_eval-compatible contract the reference eval
    relies on (evaluate.py:101-103).
    """
    ref = np.asarray(reference_sources, np.float64)
    est = np.asarray(estimated_sources, np.float64)
    if ref.ndim == 1:
        ref = ref[None]
    if est.ndim == 1:
        est = est[None]
    C = est.shape[0]
    Cr = ref.shape[0]

    # Pairwise metrics: estimate i vs reference j.
    sdr_m = np.empty((C, Cr))
    sir_m = np.empty((C, Cr))
    sar_m = np.empty((C, Cr))
    for i in range(C):
        for j in range(Cr):
            parts = _decompose(ref, est[i], j, filt_len)
            sdr_m[i, j], sir_m[i, j], sar_m[i, j] = _ratios(*parts)

    if not compute_permutation or C == 1:
        idx = np.arange(C)
        return sdr_m[idx, idx], sir_m[idx, idx], sar_m[idx, idx], idx

    best, best_perm = -np.inf, None
    for p in permutations(range(Cr), C):
        mean_sir = np.mean([sir_m[i, p[i]] for i in range(C)])
        if mean_sir > best:
            best, best_perm = mean_sir, p
    perm = np.array(best_perm)
    rows = np.arange(C)
    return sdr_m[rows, perm], sir_m[rows, perm], sar_m[rows, perm], perm


def sdr_improvement(src_ref: np.ndarray, src_est: np.ndarray, mix: np.ndarray,
                    filt_len: int = 512) -> float:
    """Average SDRi with the mixture duplicated as the do-nothing anchor
    (evaluate.py:90-105). src_ref/src_est: [C, T], mix: [T]."""
    C = src_ref.shape[0]
    anchor = np.stack([mix] * C, axis=0)
    sdr, *_ = bss_eval_sources(src_ref, src_est, filt_len=filt_len)
    sdr0, *_ = bss_eval_sources(src_ref, anchor, filt_len=filt_len)
    return float(np.mean(sdr - sdr0))
