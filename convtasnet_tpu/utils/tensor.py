"""Small tensor utilities mirroring the reference's src/utils.py surface."""

from __future__ import annotations

from typing import List, Union

import numpy as np


def remove_pad(inputs, lengths) -> List[np.ndarray]:
    """Trim per-item padding: [B, C, T] or [B, T] -> list of numpy [C, len]
    or [len] arrays (reference utils.py:49-66)."""
    inputs = np.asarray(inputs)
    lengths = np.asarray(lengths)
    results = []
    for x, n in zip(inputs, lengths):
        results.append(np.asarray(x[..., : int(n)]))
    return results
