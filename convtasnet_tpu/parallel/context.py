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

Inputs are padded INTERNALLY so the frame count divides the context axis
and each shard covers the largest halo span (P-1)*2**(X-1) — callers never
see a shape constraint. Like batch-max padding, gLN statistics include the
padded frames (see docs/parity.md); parity tests compare against the
single-device forward on the same padded signal.

The whole path is differentiable: shard_map transposes ppermute/psum, so
`make_cp_train_step` trains with the frame axis sharded — halo-exchange
gradients and gLN stat all-reduces flow through the backward pass
(gradient-parity-tested vs single device in tests/test_context.py).

Composition with tensor parallelism (TP x CP, the SURVEY §7
('data','model','context') mesh): when the mesh carries a 'model' axis,
shard_map runs MANUAL over ('data','context') only and leaves 'model'
as an AUTO axis — inside the body the arrays keep their global H extent
and GSPMD inserts the TP collectives (the in_w/out_w psum pair, sharded
norm-stat reductions) exactly as it does on the pjit DP x TP path, while
the hand-written halo ppermutes and gLN psums ride the manual axes.
Parameters enter with their TP NamedShardings (parallel/mesh.py rules)
untouched by the in_specs.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ConvTasNetConfig
from ..models.conv_tasnet import separate
from ..ops.framing import frame_signal, overlap_and_add


def cp_num_frames(cfg: ConvTasNetConfig, T: int) -> int:
    return cfg.num_frames(T)


def cp_padded_frames(cfg: ConvTasNetConfig, T: int, n: int) -> int:
    """Frame count after internal CP padding: the smallest multiple of n
    that covers T's frames AND gives every shard at least the largest halo
    span (single-neighbor exchange needs K_loc >= (P-1)*2**(X-1))."""
    span = (cfg.P - 1) * 2 ** (cfg.X - 1)
    K = max(cfg.num_frames(max(T, cfg.L)), 1)
    return n * max(-(-K // n), span)


def _cp_shard_body(frames, params, state, cfg: ConvTasNetConfig, train: bool,
                   axis: str, has_auto: bool = False):
    """Runs on one shard: frames [M, K_loc, L] -> (body, tail).

    body: [M, C, K_loc*S] waveform samples owned by this shard.
    tail: [M, C, L-S] this shard's unconsumed OLA tail.

    has_auto: the mesh carries GSPMD-auto axes (TP's 'model'); the mask is
    then explicitly constrained back to replicated before the decoder so
    the body outputs match the manual-only out_specs (GSPMD's propagation
    may otherwise keep the C*N-sharded mask sharding through to the
    waveform outputs).
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
    if has_auto:
        mask = jax.lax.with_sharding_constraint(mask, P())
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
    batch_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Context-parallel forward: [M, T] -> [M, C, T] float32.

    The signal is padded internally so no shape constraint leaks to the
    caller; gLN statistics include the padded frames exactly like batch-max
    padding does (docs/parity.md). Numerically equivalent to
    models.conv_tasnet.forward on the padded signal (up to float reduction
    order). batch_axis additionally shards the batch dim (DP x CP meshes).
    BN is unsupported under CP (cross-shard running stats; documented in
    docs/parallelism.md).
    """
    if cfg.norm_type == "BN":
        raise ValueError("BN is unsupported under context parallelism "
                         "(see docs/parallelism.md support matrix)")
    n = mesh.shape[axis]
    M, T = mixture.shape
    if batch_axis is not None:
        # Pad the batch dim up to the data axis (rows are independent —
        # every normalization is per-element — so zero rows are harmless
        # and sliced off below). Unlike the replicate-fallback of the pjit
        # DP path, sharded eval keeps its speedup at any batch size.
        dpn = mesh.shape[batch_axis]
        M_pad = -(-M // dpn) * dpn
        if M_pad != M:
            mixture = jnp.pad(mixture, ((0, M_pad - M), (0, 0)))
    K_pad = cp_padded_frames(cfg, T, n)
    T_need = (K_pad - 1) * cfg.stride + cfg.L
    if T_need > T:
        mixture = jnp.pad(mixture, ((0, 0), (0, T_need - T)))
    frames = frame_signal(mixture[..., :T_need], cfg.L, cfg.stride)  # [M, K_pad, L]

    from jax import shard_map

    # Manual only over the context (and batch) axes; any other mesh axis
    # (e.g. 'model' for TP) stays AUTO: GSPMD shards the body's matmuls
    # and norm reductions over it, composing TP with the manual CP
    # collectives (see module docstring).
    manual = {axis} | ({batch_axis} if batch_axis is not None else set())
    kwargs = {}
    has_auto = bool(set(mesh.axis_names) - manual)
    if has_auto:
        kwargs["axis_names"] = manual
    body_fn = partial(_cp_shard_body, cfg=cfg, train=train, axis=axis,
                      has_auto=has_auto)
    sharded = shard_map(
        body_fn,
        mesh=mesh,
        in_specs=(P(batch_axis, axis, None), P(), P()),
        out_specs=(P(batch_axis, None, axis), P(batch_axis, None, axis)),
        check_vma=False,
        **kwargs,
    )
    body, tails = sharded(frames, params, state)
    # body: [M, C, K_pad*S] globally; tails: [M, C, n*(L-S)] — only the
    # last shard's tail is unconsumed and extends the signal to T_conv.
    last_tail = tails[..., (n - 1) * (cfg.L - cfg.stride):]
    est = jnp.concatenate([body, last_tail], axis=-1)
    if est.shape[-1] < T:
        est = jnp.pad(est, ((0, 0), (0, 0), (0, T - est.shape[-1])))
    return est[:M, :, :T]


def make_cp_train_step(
    cfg: ConvTasNetConfig,
    opt,
    mesh: Mesh,
    max_norm: float,
    axis: str = "context",
    batch_axis: Optional[str] = None,
) -> Callable:
    """Jitted CP train step matching make_train_step's signature: the
    forward runs under shard_map with the frame axis sharded; the loss and
    optimizer update run on the gathered [M, C, T] estimates (waveform-
    sized, small next to the sharded TCN activations). Gradients flow
    through the halo exchanges / psums (shard_map transposes them); the
    replicated-params in_spec transposes to the gradient all-reduce.

    SURVEY §2 CP row + §5 long-context: this is the training path the
    reference lacks entirely (it bounds length via cv_maxlen instead)."""
    from ..ops.loss import cal_loss
    from ..training.optim import clip_by_global_norm

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(params, opt_state, state, mixture, source, lengths):
        def loss_fn(p):
            est = cp_forward(p, state, cfg, mixture, mesh, axis, train=True,
                             batch_axis=batch_axis)
            loss, *_ = cal_loss(source, est, lengths)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads, grad_norm = clip_by_global_norm(grads, max_norm)
        params, opt_state = opt.update(grads, opt_state, params)
        return params, opt_state, state, loss, grad_norm

    return step


def make_cp_eval_step(
    cfg: ConvTasNetConfig,
    mesh: Mesh,
    axis: str = "context",
    batch_axis: Optional[str] = None,
) -> Callable:
    from ..ops.loss import cal_loss

    @jax.jit
    def step(params, state, mixture, source, lengths):
        est = cp_forward(params, state, cfg, mixture, mesh, axis,
                         train=False, batch_axis=batch_axis)
        loss, *_ = cal_loss(source, est, lengths)
        return loss

    return step
