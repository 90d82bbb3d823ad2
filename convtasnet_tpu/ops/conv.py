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
) -> jnp.ndarray:
    """Depthwise dilated conv over time. x: [M, K, ch], w: [P, ch] -> [M, K, ch].

    Non-causal: symmetric padding (P-1)*d//2 (conv_tasnet.py:176).
    Causal: the reference pads (P-1)*d both sides then chomps the right
    (conv_tasnet.py:251-252, :275-289) — net effect is left-only padding of
    (P-1)*d, reproduced here directly.
    Output length equals input length for both (odd P in the non-causal case,
    as in the reference where P defaults to 3).
    """
    P = w.shape[0]
    span = (P - 1) * dilation
    if causal:
        left, right = span, 0
    else:
        left, right = span // 2, span - span // 2
    K = x.shape[1]
    xp = jnp.pad(x, ((0, 0), (left, right), (0, 0)))
    out = None
    for p in range(P):
        tap = xp[:, p * dilation : p * dilation + K, :] * w[p].astype(x.dtype)
        out = tap if out is None else out + tap
    return out
