"""Pointwise and dilated depthwise 1-D convolutions, channels-last.

The reference's 1x1 convs (conv_tasnet.py:169,:185,:217,:256) are plain
matmuls in our [M, K, ch] layout — the framework expresses them as einsums
so XLA tiles [M*K, in] @ [in, out] onto the MXU with bf16 inputs and f32
accumulation.

The dilated depthwise conv (conv_tasnet.py:247-250, groups=in_channels) is
a static sum of P shifted slices — pure VPU work XLA fuses into one pass.
A fused Pallas kernel (ops/pallas/) replaces it on TPU for the hot path.
"""

from __future__ import annotations

import jax.numpy as jnp


def pointwise(x: jnp.ndarray, w: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    """1x1 conv: [M, K, cin] @ [cin, cout] -> [M, K, cout], f32 accumulate."""
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    return jnp.einsum("mki,io->mko", x, w, preferred_element_type=jnp.float32)


def depthwise_dilated(
    x: jnp.ndarray,
    w: jnp.ndarray,
    dilation: int,
    causal: bool,
    axis_name=None,
) -> jnp.ndarray:
    """Depthwise dilated conv over time. x: [M, K, ch], w: [P, ch] -> [M, K, ch].

    Non-causal: symmetric padding (P-1)*d//2 (conv_tasnet.py:176).
    Causal: the reference pads (P-1)*d both sides then chomps the right
    (conv_tasnet.py:251-252, :275-289) — net effect is left-only padding of
    (P-1)*d, reproduced here directly.
    Output length equals input length for both (odd P in the non-causal case,
    as in the reference where P defaults to 3).

    axis_name: when running context-parallel inside shard_map with the frame
    axis sharded, boundary frames come from the ring neighbors via a
    ppermute halo exchange instead of zero padding (zeros only at the true
    sequence edges — ppermute zero-fills unpaired shards).
    """
    import jax

    P = w.shape[0]
    span = (P - 1) * dilation
    if causal:
        left, right = span, 0
    else:
        left, right = span // 2, span - span // 2
    K = x.shape[1]
    if axis_name is None:
        xp = jnp.pad(x, ((0, 0), (left, right), (0, 0)))
    else:
        n_shards = jax.lax.psum(1, axis_name)
        parts = []
        if left > 0:
            # My last `left` frames -> right neighbor's left halo.
            send = x[:, K - left :, :] if left <= K else jnp.pad(
                x, ((0, 0), (left - K, 0), (0, 0)))
            lhalo = jax.lax.ppermute(
                send, axis_name, [(i, i + 1) for i in range(n_shards - 1)]
            )
            parts.append(lhalo)
        parts.append(x)
        if right > 0:
            send = x[:, :right, :] if right <= K else jnp.pad(
                x, ((0, 0), (0, right - K), (0, 0)))
            rhalo = jax.lax.ppermute(
                send, axis_name, [(i + 1, i) for i in range(n_shards - 1)]
            )
            parts.append(rhalo)
        xp = jnp.concatenate(parts, axis=1)
    out = None
    for p in range(P):
        tap = xp[:, p * dilation : p * dilation + K, :] * w[p].astype(x.dtype)
        out = tap if out is None else out + tap
    return out
