"""Utterance-level permutation-invariant SI-SNR (uPIT) loss.

Fully-vectorized re-design of the reference criterion
(pit_criterion.py:12-113): the pairwise C x C SI-SNR table, the C!
permutation search (einsum against one-hot permutation matrices), the
argmax reorder, and the length masking all run on-device with static
shapes — no Python loops over batch or channels (the reference reorders
with an explicit B x C loop at pit_criterion.py:94-97 and builds the mask
with a loop at :110-112).

Semantics are bit-matched to the reference, including its quirks:
  * estimates are masked before zero-meaning; means divide by the true
    lengths but sum over padded positions (pit_criterion.py:37-48)
  * EPS=1e-8 added to target energy, to the ratio denominator, and inside
    log10 (pit_criterion.py:56,:61-62)
  * max SNR is divided by C and the loss is -mean over the batch
    (pit_criterion.py:22,:75)
  * reorder uses the argmax permutation DIRECTLY, not its inverse
    (pit_criterion.py:91-97) — identical for C=2 (all permutations are
    involutions), kept for parity at C>=3.
"""

from __future__ import annotations

from itertools import permutations
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..config import EPS


def length_mask(lengths: jnp.ndarray, T: int) -> jnp.ndarray:
    """[B] lengths -> [B, 1, T] {0,1} float mask."""
    return (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)[:, None, :]


def perm_matrix(C: int) -> np.ndarray:
    """All permutations of range(C) as a static [C!, C] int array."""
    return np.array(list(permutations(range(C))), dtype=np.int32)


def _pair_snr_direct(zm_est, zm_src):
    """Reference-order pairwise table: materializes the [B, C, C, T]
    projection/noise tensors (several HBM passes; numerically identical to
    pit_criterion.py:52-62 even at extreme SI-SNR)."""
    s_src = zm_src[:, None, :, :]  # [B, 1, C, T]
    s_est = zm_est[:, :, None, :]  # [B, C, 1, T]
    dot = jnp.sum(s_est * s_src, axis=3, keepdims=True)  # [B, C, C, 1]
    src_energy = jnp.sum(s_src**2, axis=3, keepdims=True) + EPS
    proj = dot * s_src / src_energy  # [B, C, C, T]
    noise = s_est - proj
    ratio = jnp.sum(proj**2, axis=3) / (jnp.sum(noise**2, axis=3) + EPS)
    return 10.0 * jnp.log10(ratio + EPS)  # [B, C, C]


def _pair_snr_gram(zm_est, zm_src):
    """MXU-native pairwise table: every projection statistic is a function
    of the cross-Gram matrix, so the whole table costs ONE batched
    [B, C, T] @ [B, T, C+...] contraction over the samples — one pass over
    HBM instead of ~5. With a = <e_i, s_j>/||s_j||^2:
        ||proj||^2  = a^2 ||s_j||^2 = <e_i,s_j>^2 / ||s_j||^2
        ||noise||^2 = ||e_i||^2 - 2a<e_i,s_j> + a^2||s_j||^2
    Loses ~f32-epsilon * ||e||^2 absolute accuracy to cancellation, which
    only matters beyond ~60 dB SI-SNR.

    Measured on v5e at B=5, C=2, T=32000 the DIRECT form wins (0.03 vs
    0.59 ms standalone; full train step identical): with C=2 the [C, C]
    Gram matmul occupies <2% of an MXU tile while XLA fuses the direct
    reductions into efficient VPU loops. The Gram form is kept for large
    C, where the C x C table's O(C^2 T) elementwise passes dominate."""
    es = jnp.einsum("bit,bjt->bij", zm_est, zm_src,
                    preferred_element_type=jnp.float32)  # [B, C(est), C(src)]
    ee = jnp.einsum("bit,bit->bi", zm_est, zm_est,
                    preferred_element_type=jnp.float32)  # [B, C]
    ss = jnp.einsum("bjt,bjt->bj", zm_src, zm_src,
                    preferred_element_type=jnp.float32)  # [B, C]
    src_energy = ss[:, None, :] + EPS  # [B, 1, C]
    a = es / src_energy
    proj_e = es * a                                  # <e,s>^2/||s||^2
    noise_e = ee[:, :, None] - 2.0 * a * es + a * a * src_energy
    noise_e = jnp.maximum(noise_e, 0.0)  # clamp tiny negative cancellation
    ratio = proj_e / (noise_e + EPS)
    return 10.0 * jnp.log10(ratio + EPS)


def si_snr_with_pit(
    source: jnp.ndarray,
    estimate: jnp.ndarray,
    lengths: jnp.ndarray,
    method: str = "direct",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Max-permutation SI-SNR per utterance.

    Args:
      source: [B, C, T] targets (padding beyond lengths is masked off).
      estimate: [B, C, T] model output.
      lengths: [B] valid sample counts.
      method: "direct" (reference-order arithmetic, default — fastest
        for C<=3, see _pair_snr_gram) or "gram" (single-pass MXU form).
    Returns:
      (max_snr [B], best_perm [B, C], masked_estimate [B, C, T])
    """
    B, C, T = source.shape
    source = source.astype(jnp.float32)
    estimate = estimate.astype(jnp.float32)
    mask = length_mask(lengths, T)  # [B, 1, T]
    # Mask BOTH tensors like the reference (pit_criterion.py:37-48) so the
    # loss is correct even for callers whose targets carry non-zero padding
    # (this repo's pipeline zero-pads, but the API shouldn't rely on it).
    source = source * mask
    estimate = estimate * mask

    # max(n, 1): rows with length 0 are padding rows (e.g. batches padded
    # to a data-parallel multiple, parallel/mesh.py); keep their arithmetic
    # finite here — cal_loss gives them zero weight.
    n = jnp.maximum(lengths, 1).astype(jnp.float32)[:, None, None]
    zm_src = source - jnp.sum(source, axis=2, keepdims=True) / n
    zm_est = estimate - jnp.sum(estimate, axis=2, keepdims=True) / n
    zm_src = zm_src * mask
    zm_est = zm_est * mask

    pair_fn = _pair_snr_gram if method == "gram" else _pair_snr_direct
    pair_snr = pair_fn(zm_est, zm_src)  # [B, i_est, j_src]

    perms = jnp.asarray(perm_matrix(C))  # [C!, C]
    # snr_set[b, p] = sum_i pair_snr[b, i, perms[p, i]]
    snr_set = jnp.sum(
        jnp.take_along_axis(
            pair_snr[:, None, :, :],  # [B, 1, C, C]
            perms[None, :, :, None],  # [1, C!, C, 1]
            axis=3,
        )[..., 0],
        axis=2,
    )  # [B, C!]
    best_idx = jnp.argmax(snr_set, axis=1)  # [B]
    max_snr = jnp.max(snr_set, axis=1) / C  # [B]
    best_perm = perms[best_idx]  # [B, C]
    return max_snr, best_perm, estimate


def reorder_source(source: jnp.ndarray, perm: jnp.ndarray) -> jnp.ndarray:
    """reorder[b, c] = source[b, perm[b, c]] — vectorized take_along_axis
    replacing the reference's B x C Python loop (pit_criterion.py:94-97)."""
    return jnp.take_along_axis(source, perm[:, :, None], axis=1)


def cal_loss(
    source: jnp.ndarray,
    estimate: jnp.ndarray,
    lengths: jnp.ndarray,
    method: str = "direct",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Reference-compatible entry (pit_criterion.py:12-24).

    Returns (loss scalar, max_snr [B], masked_estimate, reordered_estimate).
    """
    max_snr, best_perm, masked_est = si_snr_with_pit(source, estimate,
                                                     lengths, method)
    # Zero-length rows are padding (batches padded to a data-parallel
    # multiple, parallel/mesh.py): excluded from the mean with zero weight,
    # so padded and unpadded batches produce identical loss AND gradients.
    # For all-real batches this is exactly the reference's -mean
    # (pit_criterion.py:22).
    w = (lengths > 0).astype(max_snr.dtype)
    loss = -jnp.sum(max_snr * w) / jnp.maximum(jnp.sum(w), 1.0)
    reordered = reorder_source(masked_est, best_perm)
    return loss, max_snr, masked_est, reordered
