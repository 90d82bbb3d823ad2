"""Normalization layers (cLN / gLN / BN) in time-major, channels-last layout.

Activations flow as [M, K, ch] (batch, frames, channels) — channels ride the
TPU lane dimension. Statistics are always computed in float32 regardless of
the activation dtype; outputs are cast back.

Semantics match the reference exactly:
  * cLN: per-(m, k) mean/biased-var over channels (conv_tasnet.py:319-329)
  * gLN: per-m mean/biased-var over channels AND time (conv_tasnet.py:344-355)
  * BN:  torch.nn.BatchNorm1d semantics — per-channel stats over (M, K),
         eps=1e-5, running stats updated with momentum 0.1 and *unbiased*
         variance, batch (biased) stats used for normalization in training
         (conv_tasnet.py:300-303)
  * EPS = 1e-8 added to variance *before* sqrt for cLN/gLN (conv_tasnet.py:328)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ..config import EPS

BN_EPS = 1e-5  # torch BatchNorm1d default
BN_MOMENTUM = 0.1


def channelwise_layer_norm(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """cLN over the channel (last) axis, per time step. x: [M, K, ch]."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = gamma * (xf - mean) * jnp.power(var + EPS, -0.5) + beta
    return y.astype(x.dtype)


def global_layer_norm(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """gLN over channels and time, per batch element. x: [M, K, ch].

    Under pjit the plain jnp.mean lowers to a psum over whichever mesh axes
    shard K or ch. Inside shard_map (context parallelism) reductions are
    local, so pass axis_name to all-reduce the statistics explicitly over
    the sharded frame axis.
    """
    import jax

    xf = x.astype(jnp.float32)
    if axis_name is None:
        mean = jnp.mean(xf, axis=(-1, -2), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(-1, -2), keepdims=True)
    else:
        n_local = x.shape[-1] * x.shape[-2]
        n = n_local * jax.lax.psum(1, axis_name)
        mean = jax.lax.psum(jnp.sum(xf, axis=(-1, -2), keepdims=True), axis_name) / n
        var = jax.lax.psum(
            jnp.sum(jnp.square(xf - mean), axis=(-1, -2), keepdims=True), axis_name
        ) / n
    y = gamma * (xf - mean) * jnp.power(var + EPS, -0.5) + beta
    return y.astype(x.dtype)


def batch_norm(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    running_mean: jnp.ndarray,
    running_var: jnp.ndarray,
    train: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """BatchNorm over (M, K) per channel. x: [M, K, ch].

    Returns (y, new_running_mean, new_running_var). In eval mode the running
    stats are returned unchanged.
    """
    xf = x.astype(jnp.float32)
    if train:
        mean = jnp.mean(xf, axis=(0, 1))
        var = jnp.mean(jnp.square(xf - mean), axis=(0, 1))  # biased, for norm
        n = x.shape[0] * x.shape[1]
        unbiased = var * (n / max(n - 1, 1))
        new_mean = (1 - BN_MOMENTUM) * running_mean + BN_MOMENTUM * mean
        new_var = (1 - BN_MOMENTUM) * running_var + BN_MOMENTUM * unbiased
    else:
        mean, var = running_mean, running_var
        new_mean, new_var = running_mean, running_var
    y = gamma * (xf - mean) * jnp.power(var + BN_EPS, -0.5) + beta
    return y.astype(x.dtype), new_mean, new_var


def apply_norm(
    norm_type: str,
    x: jnp.ndarray,
    params: dict,
    state: Optional[dict],
    train: bool,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, Optional[dict]]:
    """Dispatch like the reference's chose_norm (conv_tasnet.py:292-303)."""
    if norm_type == "cLN":
        return channelwise_layer_norm(x, params["gamma"], params["beta"]), state
    if norm_type == "gLN":
        return global_layer_norm(x, params["gamma"], params["beta"], axis_name), state
    if norm_type == "BN":
        if axis_name is not None:
            raise NotImplementedError("BN under context parallelism")
        y, rm, rv = batch_norm(
            x, params["gamma"], params["beta"], state["mean"], state["var"], train
        )
        return y, {"mean": rm, "var": rv}
    raise ValueError(f"unsupported norm_type: {norm_type}")
