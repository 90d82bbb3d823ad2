"""Device meshes and sharding rules: data parallel + tensor parallel.

The reference's entire distributed story is single-process
nn.DataParallel (train.py:121). Here parallelism is mesh-native:

* a ('data', 'model') jax.sharding.Mesh over all addressable devices
  (multi-host via jax.distributed handled by jax itself)
* DP: batches sharded over 'data'; XLA emits the gradient all-reduce over
  ICI during the jitted train step — no hand-written collectives
* TP (Megatron-style within each temporal block): the H (hidden) axis of
  in_w / dw_w / norm affines is column-sharded over 'model' and out_w is
  row-sharded, so the block's two 1x1 matmuls need exactly one psum per
  block, which the SPMD partitioner inserts; the depthwise conv is
  per-channel and needs none. gLN/cLN statistics over a sharded H reduce
  with an automatic psum over 'model'.

Everything here only *annotates* shardings (device_put with NamedSharding);
pjit/XLA SPMD does the rest — the scaling-book recipe.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 0, tp: int = 1, cp: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh — or the full SURVEY §7
    ('data', 'model', 'context') mesh when cp > 1 (TP x CP composition:
    'model' rides GSPMD auto-sharding inside the CP shard_map body, see
    parallel/context.py). dp<=0 means 'all remaining devices'."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp <= 0:
        if n % (tp * cp) != 0:
            raise ValueError(f"{n} devices not divisible by tp*cp={tp * cp}")
        dp = n // (tp * cp)
    if dp * tp * cp > n:
        raise ValueError(f"dp*tp*cp={dp * tp * cp} exceeds {n} devices")
    if cp > 1:
        grid = mesh_utils.create_device_mesh(
            (dp, tp, cp), devices=devices[: dp * tp * cp])
        return Mesh(grid, ("data", "model", "context"))
    grid = mesh_utils.create_device_mesh((dp, tp), devices=devices[: dp * tp])
    return Mesh(grid, ("data", "model"))


# Parameter partition rules: leaf-path substring -> PartitionSpec.
# Stacked block leaves are [R, X, ...]; the H axis is last for in_w /
# gamma / beta / dw_w and axis 2 for out_w ([R, X, H, B]).
#
# All four big matmuls are sharded (SURVEY §2: "shard H (and C*N mask
# channels)"), keeping the residual-stream activations [M, K, B]
# replicated over 'model':
#   bottleneck [N, B]: contraction dim N sharded (row-parallel, one psum)
#   in_w [B, H]:       output H sharded (column-parallel, no collective)
#   dw_w/norms [.., H]: per-channel, follow H — no collective
#   out_w [H, B]:      contraction H sharded (row-parallel, one psum) —
#                      the Megatron pair with in_w: one psum per block
#   mask [B, C*N]:     output channels sharded (column-parallel); the
#                      [M, K, C*N] mask stays channel-sharded through
#                      relu/softmax and the decoder basis matmul, whose
#                      N-contraction emits the final psum
_TP_RULES = [
    ("bottleneck/w", P("model", None)),
    ("blocks/in_w", P(None, None, None, "model")),
    ("blocks/in_gamma", P(None, None, "model")),
    ("blocks/in_beta", P(None, None, "model")),
    ("blocks/dw_w", P(None, None, None, "model")),
    ("blocks/dw_gamma", P(None, None, "model")),
    ("blocks/dw_beta", P(None, None, "model")),
    ("blocks/out_w", P(None, None, "model", None)),
    ("mask/w", P(None, "model")),
]


def _param_spec(path: str, tp: int) -> P:
    if tp > 1:
        for key, spec in _TP_RULES:
            if key in path:
                return spec
    return P()  # replicated


def _path_to_str(path) -> str:
    parts = []
    for e in path:
        if hasattr(e, "key"):
            parts.append(str(e.key))
        elif hasattr(e, "idx"):
            parts.append(str(e.idx))
        elif hasattr(e, "name"):
            parts.append(str(e.name))
        else:
            parts.append(str(e))
    return "/".join(parts)


def shard_params_fn(mesh: Mesh, tp: int) -> Callable:
    """Returns (params, state, opt_state) -> sharded pytrees."""

    def place(tree):
        def put(path, leaf):
            spec = _param_spec(_path_to_str(path), tp)
            return jax.device_put(leaf, NamedSharding(mesh, spec))

        return jax.tree_util.tree_map_with_path(put, tree)

    def shard(params, state, opt_state):
        params = place(params)
        state = place(state)
        if opt_state is not None:
            # Optimizer moments mirror the param layout (mu/nu per leaf);
            # scalars (step/lr) replicate via the default P().
            opt_state = opt_state.__class__(
                step=jax.device_put(opt_state.step, NamedSharding(mesh, P())),
                lr=jax.device_put(opt_state.lr, NamedSharding(mesh, P())),
                mu=place(opt_state.mu),
                nu=place(opt_state.nu),
            )
        return params, state, opt_state

    return shard


def shard_batch_fn(mesh: Mesh) -> Callable:
    """Returns (mixture, lengths, source) -> device arrays sharded on 'data'.

    Batches whose leading dim doesn't divide the data axis are padded with
    zero rows (length 0) up to the next multiple instead of replicated —
    the loss gives zero-length rows zero weight (ops/loss.py:cal_loss), so
    loss and gradients are exact while every device keeps a 1/dp slice of
    the work (e.g. trailing partial batches, small CV batches)."""
    dp = mesh.shape["data"]

    def pad_rows(a, b_pad):
        a = np.asarray(a)
        if a.shape[0] == b_pad:
            return a
        widths = [(0, b_pad - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
        return np.pad(a, widths)

    def shard(mixture, lengths, source):
        b = np.asarray(mixture).shape[0]
        b_pad = -(-b // dp) * dp
        sb = NamedSharding(mesh, P("data"))
        out = [
            jax.device_put(pad_rows(mixture, b_pad), sb),
            jax.device_put(pad_rows(lengths, b_pad), sb),
        ]
        if source is not None:
            out.append(jax.device_put(pad_rows(source, b_pad), sb))
        else:
            out.append(None)
        return tuple(out)

    return shard


def make_sharders(dp: int = 0, tp: int = 1, devices=None) -> Tuple[Callable, Callable]:
    mesh = make_mesh(dp=dp, tp=tp, devices=devices)
    return shard_batch_fn(mesh), shard_params_fn(mesh, tp)


def make_dp_forward(cfg, mesh: Mesh, batch_axis: str = "data") -> Callable:
    """Inference forward that composes the Pallas kernels with a DP mesh.

    Under plain pjit, a pallas_call is an opaque custom-call the SPMD
    partitioner cannot shard: it replicates the call and ALL-GATHERS the
    globally-sharded activations onto every device (confirmed in compiled
    HLO, VERDICT round 3) — dp x redundant compute and memory, silently.
    Running the forward inside shard_map, manual over the batch axis,
    hands each device its [M/dp] batch slice instead; the kernels' grid
    dim IS the batch dim, so per-device work is exactly 1/dp with zero
    activation collectives (tests/test_pallas_mesh.py lowers this path
    and asserts the compiled module contains no all-gather).

    Identical numerics to the single-device forward: rows are independent
    (per-item gLN/cLN statistics), so slicing the batch changes nothing.
    Works for the XLA path too (same guarantee, no reliance on the
    partitioner's choices). Requires every non-batch mesh axis to be
    trivial — the kernels keep full weights VMEM-resident, so TP must use
    the GSPMD path with use_pallas off (cli/common.resolve_mesh_pallas).

    Returns fn(params, state, mixture [M, T]) -> est [M, C, T] with M
    divisible by the batch-axis size (shard_batch_fn pads with zero rows).
    """
    from jax import shard_map

    from ..models.conv_tasnet import forward

    for ax in mesh.axis_names:
        if ax != batch_axis and mesh.shape[ax] > 1:
            raise ValueError(
                f"make_dp_forward shards the batch axis only; mesh axis "
                f"{ax!r} has size {mesh.shape[ax]} (use the GSPMD/TP or "
                f"CP paths for model/context sharding)")

    def body(params, state, mixture):
        est, _ = forward(params, state, cfg, mixture, train=False)
        return est

    return shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(batch_axis)),
        out_specs=P(batch_axis),
        check_vma=False,
    )
