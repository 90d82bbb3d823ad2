"""Context parallelism (CP): shard the frame axis K across chips.

The reference bounds sequence length to dodge memory limits (4 s training
segments, cv_maxlen skip — train.py:26-29, data.py:102). CP removes the
bound: long 16 kHz audio is sharded along time, and the TCN runs under
shard_map with

  * halo exchange of (P-1)*dilation boundary frames per dilated depthwise
    conv via lax.ppermute over ICI neighbors (ops/conv.py axis_name path)
  * gLN statistics all-reduced with psum (ops/norms.py axis_name path)
  * exact overlap-add seams: each shard's local OLA covers K_loc*S samples
    plus an (L-S)-sample tail that overlaps the next shard's head; tails
    are ppermute'd right and added, and every shard also emits its tail so
    the last shard's (otherwise unconsumed) tail reconstructs the final
    T_conv = K*S + (L-S) samples bit-for-bit like the unsharded decoder.

Constraint (this round): K must divide the context axis evenly and local
K_loc must cover the largest halo span (P-1)*2**(X-1).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ConvTasNetConfig
from ..models.conv_tasnet import separate
from ..ops.framing import frame_signal, overlap_and_add


def cp_num_frames(cfg: ConvTasNetConfig, T: int) -> int:
    return cfg.num_frames(T)


def _cp_shard_body(frames, params, state, cfg: ConvTasNetConfig, train: bool,
                   axis: str):
    """Runs on one shard: frames [M, K_loc, L] -> (body, tail).

    body: [M, C, K_loc*S] waveform samples owned by this shard.
    tail: [M, C, L-S] this shard's unconsumed OLA tail.
    """
    dt = cfg.dtype
    S = cfg.stride
    # Encoder (per-frame, local).
    w = jnp.einsum(
        "mkl,ln->mkn", frames.astype(dt), params["encoder"]["U"].astype(dt),
        preferred_element_type=jnp.float32,
    )
    w = jnp.maximum(w, 0.0).astype(dt)
    # Separator with CP collectives.
    mask, _ = separate(params, state, cfg, w, train, axis_name=axis)
    # Decoder matmul (per-frame, local).
    source_w = w[:, :, None, :] * mask
    est_frames = jnp.einsum(
        "mkcn,nl->mckl", source_w.astype(dt), params["decoder"]["V"].astype(dt),
        preferred_element_type=jnp.float32,
    )  # [M, C, K_loc, L]
    local = overlap_and_add(est_frames, S)  # [M, C, K_loc*S + (L-S)]
    K_loc = est_frames.shape[2]
    body, tail = local[..., : K_loc * S], local[..., K_loc * S :]
    n = jax.lax.psum(1, axis)
    from_left = jax.lax.ppermute(
        tail, axis, [(i, i + 1) for i in range(n - 1)]
    )
    body = body.at[..., : tail.shape[-1]].add(from_left)
    return body, tail


def cp_forward(
    params,
    state,
    cfg: ConvTasNetConfig,
    mixture: jnp.ndarray,
    mesh: Mesh,
    axis: str = "context",
    train: bool = False,
) -> jnp.ndarray:
    """Context-parallel forward: [M, T] -> [M, C, T] float32.

    Numerically equivalent to models.conv_tasnet.forward (up to float
    reduction order). Requires K % mesh.shape[axis] == 0.
    """
    n = mesh.shape[axis]
    T = mixture.shape[-1]
    K = cfg.num_frames(T)
    if K % n != 0:
        raise ValueError(
            f"CP requires K % n_shards == 0 (K={K}, n={n}); pad the input "
            f"so (T-L)/(L/2)+1 is a multiple of {n}"
        )
    span = (cfg.P - 1) * 2 ** (cfg.X - 1)
    if K // n < span:
        raise ValueError(
            f"local frames {K//n} < max halo span {span}; use fewer shards"
        )
    frames = frame_signal(mixture, cfg.L, cfg.stride)  # [M, K, L]

    from jax import shard_map

    body_fn = partial(_cp_shard_body, cfg=cfg, train=train, axis=axis)
    sharded = shard_map(
        body_fn,
        mesh=mesh,
        in_specs=(P(None, axis, None), P(), P()),
        out_specs=(P(None, None, axis), P(None, None, axis)),
        check_vma=False,
    )
    body, tails = sharded(frames, params, state)
    # body: [M, C, K*S] globally; tails: [M, C, n*(L-S)] — only the last
    # shard's tail is unconsumed and extends the signal to T_conv.
    last_tail = tails[..., (n - 1) * (cfg.L - cfg.stride):]
    est = jnp.concatenate([body, last_tail], axis=-1)
    if est.shape[-1] < T:
        est = jnp.pad(est, ((0, 0), (0, 0), (0, T - est.shape[-1])))
    return est[..., :T]
