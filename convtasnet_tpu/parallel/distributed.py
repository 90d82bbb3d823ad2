"""Multi-host initialization and batch sharding across processes.

The reference is single-process (nn.DataParallel, train.py:121). Here
multi-host runs use jax.distributed: every host runs the same program, the
mesh spans all hosts' devices, and each host feeds only its slice of the
global batch (jax.make_array_from_process_local_data assembles the global
sharded array). Collectives ride ICI within a slice and DCN across slices,
chosen by XLA from the mesh layout.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with env-var fallbacks.

    On TPU pods with standard env (TPU_WORKER_HOSTNAMES etc.) argumentless
    initialize() autodetects; args/env override for manual launches
    (COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID)."""
    kwargs = {}
    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])
    # Multi-process CPU (tests / simulation) needs the gloo collectives
    # backend; harmless on TPU where ICI collectives are native.
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass  # older jax without the option
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def global_batch_from_local(mesh: Mesh, local_batch: np.ndarray,
                            spec: P = P("data")) -> jax.Array:
    """Assemble a globally-sharded array from this process's local shard.

    Each host loads batch_size_global / num_hosts items; the returned array
    is addressable-shard-local but logically global, ready for the jitted
    step."""
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(sharding, local_batch)


def is_coordinator() -> bool:
    return jax.process_index() == 0


def shard_batch_fn_multihost(mesh: Mesh):
    """Multi-process analogue of mesh.shard_batch_fn for the Solver.

    Every process loads the SAME global batch (the loader's order is a pure
    function of (seed, epoch), so ranks agree without communication) and
    contributes its contiguous row slice via make_array_from_process_local_
    data. Batches indivisible by the data axis or process count are padded
    with zero rows (length 0, zero loss weight — ops/loss.py:cal_loss) up
    to the next lcm(dp, nproc) multiple, mirroring the single-process
    sharder: loss/grads stay exact and every device keeps a slice."""
    dp = mesh.shape["data"]

    def shard(mixture, lengths, source):
        nproc = jax.process_count()
        rank = jax.process_index()
        arrays = [np.asarray(mixture), np.asarray(lengths),
                  np.asarray(source) if source is not None else None]
        b = arrays[0].shape[0]
        q = dp * nproc // math.gcd(dp, nproc)  # lcm
        b_pad = -(-b // q) * q
        if b_pad != b:
            arrays = [np.pad(a, [(0, b_pad - b)] + [(0, 0)] * (a.ndim - 1))
                      if a is not None else None for a in arrays]
        lo, hi = rank * b_pad // nproc, (rank + 1) * b_pad // nproc
        out = [global_batch_from_local(mesh, a[lo:hi], P("data"))
               if a is not None else None for a in arrays]
        return tuple(out)

    return shard
