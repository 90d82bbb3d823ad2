"""Debugging / sanitizer hooks (SURVEY.md §5 'race detection: none' gap).

JAX's equivalents of native-code sanitizers for this framework:

* transfer guards catch silent host<->device transfers inside the training
  loop (the classic throughput bug class)
* debug_nans aborts on the first NaN-producing op instead of at the loss
* Pallas kernels run under interpret mode on CPU in the test suite
  (tests/test_pallas_tcn.py, test_pallas_whole.py, test_pallas_hybrid.py,
  test_pallas_mesh.py), the kernel-level race/shape sanitizer
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def strict_mode(nan_checks: bool = True, transfer_guard: str = "disallow"):
    """Run a block with implicit-transfer errors and NaN aborts enabled.

    Example:
        with strict_mode():
            solver.train()
    """
    prev_guard = jax.config.jax_transfer_guard
    prev_nans = jax.config.jax_debug_nans
    try:
        jax.config.update("jax_transfer_guard", transfer_guard)
        if nan_checks:
            jax.config.update("jax_debug_nans", True)
        yield
    finally:
        jax.config.update("jax_transfer_guard", prev_guard)
        jax.config.update("jax_debug_nans", prev_nans)
