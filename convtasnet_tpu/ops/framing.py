"""Signal framing and overlap-add, built for TPU/XLA.

The reference implements the encoder as a strided nn.Conv1d
(conv_tasnet.py:106) and reconstruction via a GCD-subframe scatter-add
ported from TF (utils.py:9-46). On TPU we avoid scatter in the hot path:

* `frame_signal` turns [..., T] into [..., K, L] windows with hop S using
  pure reshapes + concatenation when L % S == 0 (the framework's encoder
  then runs one big [M*K, L] @ [L, N] matmul on the MXU).
* `overlap_and_add` inverts it as a static sum of L//S shifted, padded
  sub-signals — elementwise adds XLA fuses, no scatter — with a
  scatter-add fallback for irregular (L, S).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def num_frames(T: int, frame_len: int, hop: int) -> int:
    return (T - frame_len) // hop + 1


def frame_signal(x: jnp.ndarray, frame_len: int, hop: int) -> jnp.ndarray:
    """Extract overlapping frames: [..., T] -> [..., K, frame_len].

    K = (T - frame_len) // hop + 1; trailing samples that do not fill a
    full frame are dropped (same as a VALID strided conv, the reference
    encoder's behavior at conv_tasnet.py:106-116).
    """
    T = x.shape[-1]
    K = num_frames(T, frame_len, hop)
    if K <= 0:
        raise ValueError(f"signal too short to frame: T={T} L={frame_len}")
    if frame_len % hop == 0:
        # L = r * S. Subframe view [..., T//S, S]; frame k = subframes
        # [k, k+1, .., k+r-1] concatenated. Build by stacking r shifted
        # views — reshape + slice + concat only.
        r = frame_len // hop
        n_sub = T // hop
        sub = x[..., : n_sub * hop].reshape(*x.shape[:-1], n_sub, hop)
        parts = [sub[..., i : i + K, :] for i in range(r)]
        return jnp.concatenate(parts, axis=-1)
    # General case: gather windows (cold path).
    starts = jnp.arange(K) * hop
    idx = starts[:, None] + jnp.arange(frame_len)[None, :]
    return x[..., idx]


def overlap_and_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """Overlap-add frames [..., K, L] with the given hop -> [..., T_out].

    T_out = (K - 1) * hop + L, matching the reference semantics
    (utils.py:28-46). Fast path for L % hop == 0 uses r = L // hop shifted
    zero-padded adds (r = 2 for the canonical 50%-overlap encoder);
    fallback uses XLA scatter-add over GCD subframes.
    """
    *lead, K, L = frames.shape
    T_out = (K - 1) * hop + L
    if L % hop == 0:
        r = L // hop
        # Split each frame into r chunks of size hop; chunk c of frame k
        # lands at output subframe (k + c). Sum r shifted sub-signals.
        chunks = frames.reshape(*lead, K, r, hop)
        n_sub = K + r - 1  # output subframes
        out = jnp.zeros((*lead, n_sub, hop), dtype=frames.dtype)
        for c in range(r):
            piece = chunks[..., :, c, :]  # [..., K, hop]
            pad = [(0, 0)] * len(lead) + [(c, n_sub - K - c), (0, 0)]
            out = out + jnp.pad(piece, pad)
        return out.reshape(*lead, n_sub * hop)[..., :T_out]
    # General case: GCD subframe scatter-add (mirrors utils.py:31-45).
    g = math.gcd(L, hop)
    sub_per_frame = L // g
    sub_step = hop // g
    n_out_sub = T_out // g
    sub = frames.reshape(*lead, K * sub_per_frame, g)
    frame_idx = (
        jnp.arange(K)[:, None] * sub_step + jnp.arange(sub_per_frame)[None, :]
    ).reshape(-1)
    out = jnp.zeros((*lead, n_out_sub, g), dtype=frames.dtype)
    out = out.at[..., frame_idx, :].add(sub)
    return out.reshape(*lead, n_out_sub * g)
