"""Parameter initializers reproducing the reference's init distribution.

The reference applies nn.init.xavier_normal_ to every parameter with
ndim > 1 (conv_tasnet.py:41-43). Torch computes fan-in/out from the *torch*
weight shape ([out_ch, in_ch, kernel] for Conv1d, [out, in] for Linear,
[1, ch, 1] for the norm gamma/beta), so initializers here take the
torch-equivalent shape for the fan computation and return arrays in this
framework's channels-last layouts.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _torch_fan(torch_shape: Sequence[int]) -> Tuple[int, int]:
    """fan_in/fan_out per torch.nn.init._calculate_fan_in_and_fan_out."""
    receptive = 1
    for s in torch_shape[2:]:
        receptive *= s
    fan_in = torch_shape[1] * receptive
    fan_out = torch_shape[0] * receptive
    return fan_in, fan_out


def xavier_normal(key, torch_shape: Sequence[int], out_shape: Sequence[int],
                  dtype=jnp.float32) -> jnp.ndarray:
    """Xavier/Glorot normal: std = sqrt(2 / (fan_in + fan_out)).

    torch_shape drives the fan computation; out_shape is the layout actually
    stored (e.g. torch Conv1d [out, in, k] stored as [k*in, out])."""
    fan_in, fan_out = _torch_fan(torch_shape)
    std = math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, tuple(out_shape), dtype=dtype)
