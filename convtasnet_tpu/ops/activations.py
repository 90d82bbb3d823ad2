"""Activation functions."""

from __future__ import annotations

import jax.numpy as jnp


def prelu(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """PReLU with a single shared slope (torch nn.PReLU() default,
    conv_tasnet.py:218,:253): y = max(x, 0) + alpha * min(x, 0)."""
    a = alpha.astype(x.dtype)
    return jnp.where(x >= 0, x, a * x)
