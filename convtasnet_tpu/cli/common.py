"""Shared CLI helpers (evaluate/separate kernel-path flag handling)."""

from __future__ import annotations

import argparse
import dataclasses

USE_PALLAS_CHOICES = ("auto", "whole", "hybrid", "1", "true", "0", "false",
                      "always", "keep")


def add_use_pallas_flag(p: argparse.ArgumentParser) -> None:
    p.add_argument(
        "--use_pallas", default="auto", type=str.lower,
        choices=USE_PALLAS_CHOICES,
        help="inference kernel path: auto (whole-block Pallas on TPU, pure "
             "XLA elsewhere — default), whole, 1/true (mid-chain), 0/false "
             "(pure XLA), keep (whatever the checkpoint was trained with)")


def apply_use_pallas(cfg, flag: str):
    """Resolve the --use_pallas flag into cfg.use_pallas.

    'auto' picks the whole-block kernel only when the default backend is a
    real TPU: on CPU the kernels would run in Pallas interpret mode
    (pathologically slow), so everything else falls back to XLA."""
    flag = flag.lower()
    if flag == "keep":
        return cfg
    if flag == "auto":
        import jax
        up = "whole" if jax.default_backend() == "tpu" else False
    else:
        up = {"0": False, "false": False, "1": True, "true": True,
              "whole": "whole", "hybrid": "hybrid", "always": "always"}[flag]
    # Kernel choice is a runtime decision, not a model property.
    return dataclasses.replace(cfg, use_pallas=up)
