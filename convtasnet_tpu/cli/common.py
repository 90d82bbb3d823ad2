"""Shared CLI helpers (evaluate/separate kernel-path flag handling)."""

from __future__ import annotations

import argparse
import dataclasses

USE_PALLAS_CHOICES = ("auto", "whole", "hybrid", "1", "true", "0", "false",
                      "keep")


def add_use_pallas_flag(p: argparse.ArgumentParser) -> None:
    p.add_argument(
        "--use_pallas", default="auto", type=str.lower,
        choices=USE_PALLAS_CHOICES,
        help="inference kernel path: auto/1/true (best Pallas tier that "
             "fits VMEM on TPU — mega-kernel, then per-block — pure XLA "
             "elsewhere; default), whole/hybrid (same inference tiers, "
             "kept as explicit names for the training opt-ins), 0/false "
             "(pure XLA), keep (whatever the checkpoint was trained with)")


def apply_use_pallas(cfg, flag: str):
    """Resolve the --use_pallas flag into cfg.use_pallas.

    'auto'/'1'/'true' enable the kernels only when the default backend is
    a real TPU: on CPU they would run in Pallas interpret mode
    (pathologically slow), so everything else falls back to XLA."""
    flag = flag.lower()
    if flag == "keep":
        return cfg
    if flag in ("auto", "1", "true"):
        import jax
        up = jax.default_backend() == "tpu"
    else:
        up = {"0": False, "false": False,
              "whole": "whole", "hybrid": "hybrid"}[flag]
    # Kernel choice is a runtime decision, not a model property.
    return dataclasses.replace(cfg, use_pallas=up)


def resolve_mesh_pallas(cfg, tp: int, cp: int = 1):
    """Hard-gate Pallas kernels against tensor/context parallelism.

    The whole-block/mega kernels keep FULL weights VMEM-resident and
    grid over the batch, so they compose with a data-sharded mesh (via
    parallel.mesh.make_dp_forward) but not with 'model'-sharded params:
    under GSPMD the opaque pallas_call would all-gather the TP-sharded
    weights AND activations and run dp*tp-fold redundant work (VERDICT
    round 3, confirmed in HLO). Under CP the frame axis is sharded and
    the blocks need halo exchanges the kernels don't implement (the
    separator's axis_name gate would fall back silently). Both cases
    fall back to the XLA path with a loud warning instead."""
    if (tp > 1 or cp > 1) and cfg.use_pallas:
        import warnings

        which = "--tp" if tp > 1 else "--cp"
        warnings.warn(
            f"--use_pallas does not compose with {which} (the kernels "
            "hold full weights in VMEM and the whole frame axis per "
            "item); falling back to the XLA forward for this mesh",
            stacklevel=2)
        return dataclasses.replace(cfg, use_pallas=False)
    return cfg
