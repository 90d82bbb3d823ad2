"""Conv-TasNet, TPU-native.

Functional re-design of the reference model (conv_tasnet.py:13-355), not a
port:

* Layout is time-major channels-last [M, K, ch] so every 1x1 conv is one
  large [M*K, in] @ [in, out] MXU matmul (bf16 in, f32 accumulate) and the
  channel dim rides the TPU lane dimension.
* The encoder's strided conv (conv_tasnet.py:106) becomes frame-as-matmul:
  [M, K, L] @ [L, N].
* The R repeats run under lax.scan with parameters stacked on a leading
  [R, ...] axis (one compiled body instead of R copies); the X blocks per
  repeat are unrolled because each has a distinct static dilation 2**x
  (conv_tasnet.py:174-176). Optional jax.checkpoint per repeat trades
  recompute for HBM.
* All parameters are f32 pytrees; activations flow in cfg.compute_dtype.

Exact reference semantics preserved: ReLU-nonnegative encoder output
(conv_tasnet.py:116), always-cLN input norm (conv_tasnet.py:167), residual
add without ReLU (conv_tasnet.py:237), causal chomp (conv_tasnet.py:251),
relu/softmax masks (conv_tasnet.py:203-208), overlap-add decode + zero-pad
back to the input length (conv_tasnet.py:128-142, :57-59).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ConvTasNetConfig
from ..ops.activations import prelu
from ..ops.conv import depthwise_dilated, pointwise
from ..ops.framing import frame_signal, overlap_and_add
from ..ops.norms import apply_norm
from ..utils.initializers import xavier_normal

Params = Dict[str, Any]
State = Dict[str, Any]


# --------------------------------------------------------------------------
# Init
# --------------------------------------------------------------------------

def init_params(key: jax.Array, cfg: ConvTasNetConfig) -> Tuple[Params, State]:
    """Build the parameter/state pytrees.

    Reproduces the reference init distribution: xavier-normal on every
    torch-param with ndim > 1 — including gLN/cLN gamma/beta [1, ch, 1]
    (conv_tasnet.py:41-43, a quirk kept behind cfg.reference_norm_init) —
    PReLU slopes at 0.25, BN affine at 1/0 (ndim-1 params are untouched by
    the reference loop).
    """
    N, L, B, H, P, X, R, C = (
        cfg.N, cfg.L, cfg.B, cfg.H, cfg.P, cfg.X, cfg.R, cfg.C,
    )
    keys = iter(jax.random.split(key, 16 + 8 * R * X))

    def norm_init(k, ch, norm_type):
        # gLN/cLN gamma/beta are torch shape [1, ch, 1] (ndim 3 -> xavier'd
        # when reference_norm_init); BN affine is torch shape [ch] (ndim 1 ->
        # always 1/0).
        if norm_type in ("gLN", "cLN") and cfg.reference_norm_init:
            k1, k2 = jax.random.split(k)
            return (
                xavier_normal(k1, (1, ch, 1), (ch,)),
                xavier_normal(k2, (1, ch, 1), (ch,)),
            )
        return jnp.ones((ch,)), jnp.zeros((ch,))

    enc_U = xavier_normal(next(keys), (N, 1, L), (L, N))
    dec_V = xavier_normal(next(keys), (L, N), (N, L))

    ln_gamma, ln_beta = norm_init(next(keys), N, "cLN")  # always cLN
    bottleneck_w = xavier_normal(next(keys), (B, N, 1), (N, B))
    mask_w = xavier_normal(next(keys), (C * N, B, 1), (B, C * N))

    def stack(fn):
        rows = [[fn(next(keys)) for _ in range(X)] for _ in range(R)]
        return jnp.stack([jnp.stack(r) for r in rows])

    blocks = {
        "in_w": stack(lambda k: xavier_normal(k, (H, B, 1), (B, H))),
        "in_prelu": jnp.full((R, X), 0.25),
        "dw_w": stack(lambda k: xavier_normal(k, (H, 1, P), (P, H))),
        "dw_prelu": jnp.full((R, X), 0.25),
        "out_w": stack(lambda k: xavier_normal(k, (B, H, 1), (H, B))),
    }
    for site in ("in", "dw"):
        gs, bs = [], []
        for _ in range(R):
            grow, brow = [], []
            for _ in range(X):
                g, b = norm_init(next(keys), H, cfg.norm_type)
                grow.append(g)
                brow.append(b)
            gs.append(jnp.stack(grow))
            bs.append(jnp.stack(brow))
        blocks[f"{site}_gamma"] = jnp.stack(gs)
        blocks[f"{site}_beta"] = jnp.stack(bs)

    params: Params = {
        "encoder": {"U": enc_U},
        "separator": {
            "ln": {"gamma": ln_gamma, "beta": ln_beta},
            "bottleneck": {"w": bottleneck_w},
            "blocks": blocks,
            "mask": {"w": mask_w},
        },
        "decoder": {"V": dec_V},
    }

    state: State = {}
    if cfg.norm_type == "BN":
        state = {
            "blocks": {
                "in_mean": jnp.zeros((R, X, H)),
                "in_var": jnp.ones((R, X, H)),
                "dw_mean": jnp.zeros((R, X, H)),
                "dw_var": jnp.ones((R, X, H)),
            }
        }
    return params, state


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------

def encode(params: Params, cfg: ConvTasNetConfig, mixture: jnp.ndarray) -> jnp.ndarray:
    """Learned analysis basis: [M, T] -> nonnegative [M, K, N]."""
    dt = cfg.dtype
    frames = frame_signal(mixture, cfg.L, cfg.stride)  # [M, K, L]
    w = jnp.einsum(
        "mkl,ln->mkn",
        frames.astype(dt),
        params["encoder"]["U"].astype(dt),
        preferred_element_type=jnp.float32,
    )
    return jnp.maximum(w, 0.0).astype(dt)


def _temporal_block(
    x: jnp.ndarray,
    bp: Dict[str, jnp.ndarray],
    bstate: Optional[Dict[str, jnp.ndarray]],
    cfg: ConvTasNetConfig,
    dilation: int,
    train: bool,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, Optional[Dict[str, jnp.ndarray]]]:
    """One residual block (conv_tasnet.py:212-272): 1x1 -> PReLU -> norm ->
    dilated depthwise [-> chomp] -> PReLU -> norm -> 1x1, + residual."""
    dt = cfg.dtype
    res = x
    y = pointwise(x, bp["in_w"], dt).astype(dt)
    new_state = {} if bstate is not None else None
    y = prelu(y, bp["in_prelu"])
    s_in = None if bstate is None else {"mean": bstate["in_mean"], "var": bstate["in_var"]}
    y, s_in = apply_norm(
        cfg.norm_type, y, {"gamma": bp["in_gamma"], "beta": bp["in_beta"]},
        s_in, train, axis_name,
    )
    y = depthwise_dilated(y, bp["dw_w"], dilation, cfg.causal, axis_name)
    y = prelu(y, bp["dw_prelu"])
    s_dw = None if bstate is None else {"mean": bstate["dw_mean"], "var": bstate["dw_var"]}
    y, s_dw = apply_norm(
        cfg.norm_type, y, {"gamma": bp["dw_gamma"], "beta": bp["dw_beta"]},
        s_dw, train, axis_name,
    )
    if bstate is not None:
        new_state = {
            "in_mean": s_in["mean"], "in_var": s_in["var"],
            "dw_mean": s_dw["mean"], "dw_var": s_dw["var"],
        }
    y = pointwise(y, bp["out_w"], dt).astype(dt)
    return res + y, new_state


def _use_fused_whole(cfg: ConvTasNetConfig, bstate, x: jnp.ndarray,
                     train: bool = False) -> bool:
    """Kernel-tier auto dispatch (one user switch, VERDICT round-3 #6).

    Any truthy use_pallas enables the whole-block kernel family for
    INFERENCE (both 1x1 matmuls inside; fused_whole_block.py, upgraded to
    the whole-TCN mega-kernel in separate() when it fits VMEM) — the
    measured-fastest forwards on v5e (docs/results.md). The dominated
    mid-chain tier (round-1 fused_block.py) was deleted in round 4: auto
    dispatch never selected it (the whole-block tier fits the same K
    range and beats it everywhere measured).

    TRAINING stays on XLA's no-remat backward for True/"auto" — the
    measured fastest trainer on v5e — with the Pallas training tiers as
    explicit opt-ins: "whole" = recompute custom-VJP backward kernel
    (whole_block_vjp.py — keeps four [K(+2*span), H] slabs plus the
    pipelined [K, B] x/g/dx blocks resident; ~8x less activation HBM),
    "hybrid" = saved-residual pair (whole_tcn_hybrid.py / fallback
    whole_block_hybrid.py — the forward additionally keeps the y1/c
    residual slabs in VMEM while streaming them to HBM; ~6x less)."""
    if not cfg.use_pallas:
        return False
    if cfg.norm_type == "BN" or bstate is not None:
        return False
    if train and cfg.use_pallas not in ("whole", "hybrid"):
        return False
    # Hardware Mosaic requires the channel (lane) dims 128-aligned: the
    # kernels slice [.., B]/[.., H] slabs whose last dim must match the
    # (8, 128) tiling. Interpret mode (CPU tests) has no such constraint.
    if jax.default_backend() != "cpu" and (cfg.B % 128 or cfg.H % 128):
        return False
    K = -(-x.shape[1] // 128) * 128
    it = cfg.dtype.itemsize
    span = (cfg.P - 1) * 2 ** (cfg.X - 1)
    if train and cfg.use_pallas == "whole":
        need = (2 * K * cfg.H + 2 * (K + 2 * span) * cfg.H  # y1/c + b/dz
                + 6 * K * cfg.B                             # x/g/dx pipelined
                ) * it + 12 * cfg.B * cfg.H                 # f32 w-grad accums
        # 48 MiB, not the 128 MiB VMEM: Mosaic's per-op scoped temporaries
        # roughly double the accounted slabs. Measured on v5e (round 5,
        # scaled-config probes): the VJP kernel compiles at 44 MB
        # accounted (K=2048, H=1024) and F-checks the TPU compile helper
        # at 67 MB (K=4096, H=1024) — the bound sits between, so
        # out-of-range configs fall back to XLA instead of crashing.
        return need <= 48 * 1024 * 1024
    if train:  # hybrid: forward kernel with resident y1/c residual slabs
        need = (2 * K * cfg.B + (K + 2 * span) * cfg.H + 2 * K * cfg.H
                + 2 * cfg.B * cfg.H) * it
        return need <= 30 * 1024 * 1024
    need = (2 * K * cfg.B + (K + 2 * span) * cfg.H + K * cfg.H
            + 2 * cfg.B * cfg.H) * it
    return need <= 13 * 1024 * 1024


def separate(
    params: Params,
    state: State,
    cfg: ConvTasNetConfig,
    mixture_w: jnp.ndarray,
    train: bool = False,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, State]:
    """Mask estimation TCN: [M, K, N] -> ([M, K, C, N] mask, new_state).

    axis_name: set when running inside shard_map with the frame axis K
    sharded (context parallelism); gLN stats all-reduce and the dilated
    convs halo-exchange over that axis."""
    sp = params["separator"]
    dt = cfg.dtype
    M, K, N = mixture_w.shape

    # Input norm is ALWAYS cLN regardless of norm_type (conv_tasnet.py:167).
    x, _ = apply_norm("cLN", mixture_w, sp["ln"], None, train)
    x = pointwise(x, sp["bottleneck"]["w"], dt).astype(dt)  # [M, K, B]

    has_bn = cfg.norm_type == "BN"
    block_params = sp["blocks"]
    block_state = state.get("blocks") if has_bn else None

    # Fused Pallas path: pad the frame axis to 128 alignment ONCE here
    # (not per block — each per-block pad/slice would cost a full HBM copy)
    # and run every block's kernel with exact stats over the true K frames.
    fused_valid_k = None
    fused_whole = (axis_name is None
                   and _use_fused_whole(cfg, block_state, x, train))
    if fused_whole:
        fused_valid_k = K
        K_pad = -(-K // 128) * 128
        if K_pad != K:
            x = jnp.pad(x, ((0, 0), (0, K_pad - K), (0, 0)))

    # Whole-TCN mega-kernels: all R*X blocks in ONE Pallas call with the
    # residual stream resident in VMEM across blocks and block weights
    # fetched once — ~64x less HBM traffic than per-block kernels.
    # Inference: ops/pallas/whole_tcn.py. Training (use_pallas="hybrid"):
    # the residual-saving forward + whole-chain backward mega-kernel pair
    # (ops/pallas/whole_tcn_hybrid.py). Falls back to the per-block
    # kernels when the VMEM footprint (weights + slabs) doesn't fit.
    if fused_whole and (not train or cfg.use_pallas == "hybrid"):
        from ..ops.pallas.whole_tcn import tcn_vmem_need, whole_tcn_pallas
        from ..ops.pallas.whole_tcn_hybrid import (tcn_bwd_vmem_need,
                                                   whole_tcn_train)

        K_pad = x.shape[1]
        it = cfg.dtype.itemsize
        NB = cfg.R * cfg.X
        if train:
            fits = (tcn_vmem_need(K_pad, cfg.B, cfg.H, NB, cfg.P, cfg.X,
                                  it, save=True) <= 110 * 1024 * 1024
                    and tcn_bwd_vmem_need(K_pad, cfg.B, cfg.H, NB, cfg.P,
                                          cfg.X, it) <= 115 * 1024 * 1024)
        else:
            fits = tcn_vmem_need(K_pad, cfg.B, cfg.H, NB, cfg.P, cfg.X,
                                 it) <= 100 * 1024 * 1024
        if fits:
            bp = {k: v.reshape((-1,) + v.shape[2:])
                  for k, v in block_params.items()}
            fn = whole_tcn_train if train else whole_tcn_pallas
            x = fn(
                x, bp["in_w"], bp["in_prelu"], bp["in_gamma"],
                bp["in_beta"], bp["dw_w"], bp["dw_prelu"], bp["dw_gamma"],
                bp["dw_beta"], bp["out_w"], cfg.norm_type, cfg.causal,
                cfg.X, jax.default_backend() == "cpu",
                fused_valid_k if fused_valid_k != K_pad else None,
            )
            if x.shape[1] != K:
                x = x[:, :K, :]
            score = pointwise(x, sp["mask"]["w"], dt)  # [M, K, C*N] f32
            score = score.reshape(M, K, cfg.C, N)
            if cfg.mask_nonlinear == "softmax":
                mask = jax.nn.softmax(score, axis=2)
            else:
                mask = jnp.maximum(score, 0.0)
            return mask.astype(dt), state

    def repeat_body(carry, xs):
        x = carry
        bp_r, bs_r = xs
        new_bs_r = {} if bs_r is not None else None
        for xi in range(cfg.X):
            bp = {k: v[xi] for k, v in bp_r.items()}
            bs = {k: v[xi] for k, v in bs_r.items()} if bs_r is not None else None
            if fused_whole:
                if train and cfg.use_pallas == "hybrid":
                    # Hybrid: forward kernel saves the y1/c mid-chain
                    # residuals; backward is fused XLA consuming them
                    # (no-remat, whole_block_hybrid.py).
                    from ..ops.pallas.whole_block_hybrid import whole_block_hybrid as _wb
                elif train:
                    # Custom-VJP path: backward is one Pallas kernel that
                    # recomputes the mid-chain from the saved [M, K, B]
                    # block input (whole_block_vjp.py).
                    from ..ops.pallas.whole_block_vjp import whole_block_train as _wb
                else:
                    from ..ops.pallas.fused_whole_block import whole_block_pallas as _wb
                x = _wb(
                    x, bp["in_w"], bp["in_prelu"], bp["in_gamma"],
                    bp["in_beta"], bp["dw_w"], bp["dw_prelu"],
                    bp["dw_gamma"], bp["dw_beta"], bp["out_w"],
                    cfg.norm_type, 2**xi, cfg.causal,
                    jax.default_backend() == "cpu",
                    fused_valid_k if fused_valid_k != x.shape[1] else None,
                )
                continue
            blk = _temporal_block
            if cfg.remat == "block":
                blk = jax.checkpoint(
                    _temporal_block,
                    static_argnums=(3, 4, 5, 6),
                )
            elif cfg.remat == "dots":
                # Keep every matmul output, recompute only elementwise
                # (PReLU/norm) in backward: ~1/4 less matmul work than
                # "block" at the cost of two [M,K,H]-sized residuals/block.
                blk = jax.checkpoint(
                    _temporal_block,
                    static_argnums=(3, 4, 5, 6),
                    policy=jax.checkpoint_policies.dots_saveable,
                )
            x, nbs = blk(x, bp, bs, cfg, 2**xi, train, axis_name)
            if nbs is not None:
                for k, v in nbs.items():
                    new_bs_r.setdefault(k, []).append(v)
        if new_bs_r is not None:
            new_bs_r = {k: jnp.stack(v) for k, v in new_bs_r.items()}
        return x, new_bs_r

    body = (jax.checkpoint(repeat_body)
            if cfg.remat in (True, "repeat") else repeat_body)
    unroll = max(1, int(getattr(cfg, "scan_unroll", 1)))
    # XLA:TPU compiler-crash workaround (measured round 5 on v5e with this
    # image's libtpu): the ROLLED scan over the R repeats drives the TPU
    # compile helper into a fatal subprocess crash once the per-block slab
    # reaches [K >= 4096, H = 1024] (bf16; X in {8, 10}; pure XLA — no
    # Pallas involved). The identical program compiles and runs with the
    # body unrolled, as do K = 2048 or H = 512 rolled (full probe matrix
    # in docs/results.md round 5). Unrolling is semantically identical and
    # the measured-fastest schedule anyway (round 1), so auto-unroll in
    # the crash regime instead of handing users an opaque INTERNAL error.
    # Probe matrix: [K=3999..8064, H=1024] rolled all crash; [K=2048,
    # H=1024], [K=4096, H=512] rolled both compile — so the guard trips
    # strictly above the largest measured-good K*H product (2048*1024).
    if (unroll == 1 and jax.default_backend() == "tpu"
            and x.shape[1] * cfg.H > 2048 * 1024):
        unroll = cfg.R
    if has_bn:
        x, new_block_state = jax.lax.scan(body, x, (block_params, block_state),
                                          unroll=unroll)
        new_state: State = {"blocks": new_block_state}
    else:
        x, _ = jax.lax.scan(body, x, (block_params, None), unroll=unroll)
        new_state = state
    if fused_valid_k is not None and x.shape[1] != K:
        x = x[:, :K, :]

    score = pointwise(x, sp["mask"]["w"], dt)  # [M, K, C*N] f32
    score = score.reshape(M, K, cfg.C, N)
    if cfg.mask_nonlinear == "softmax":
        mask = jax.nn.softmax(score, axis=2)
    else:
        mask = jnp.maximum(score, 0.0)
    return mask.astype(dt), new_state


def decode(
    params: Params,
    cfg: ConvTasNetConfig,
    mixture_w: jnp.ndarray,
    est_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Masked synthesis + overlap-add: -> [M, C, (K-1)*S + L] float32."""
    dt = cfg.dtype
    source_w = mixture_w[:, :, None, :] * est_mask  # [M, K, C, N]
    est_frames = jnp.einsum(
        "mkcn,nl->mckl",
        source_w.astype(dt),
        params["decoder"]["V"].astype(dt),
        preferred_element_type=jnp.float32,
    )  # [M, C, K, L] f32
    return overlap_and_add(est_frames, cfg.stride)


def forward(
    params: Params,
    state: State,
    cfg: ConvTasNetConfig,
    mixture: jnp.ndarray,
    train: bool = False,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, State]:
    """Full model: [M, T] -> ([M, C, T] float32 estimates, new_state)."""
    mixture_w = encode(params, cfg, mixture)
    est_mask, new_state = separate(params, state, cfg, mixture_w, train, axis_name)
    est_source = decode(params, cfg, mixture_w, est_mask)
    T, T_conv = mixture.shape[-1], est_source.shape[-1]
    est_source = jnp.pad(est_source, ((0, 0), (0, 0), (0, T - T_conv)))
    return est_source, new_state


class ConvTasNet:
    """Thin OO wrapper over the pure functions (cfg is static/hashable)."""

    def __init__(self, cfg: ConvTasNetConfig):
        self.cfg = cfg

    def init(self, key: jax.Array) -> Tuple[Params, State]:
        # One compiled program instead of ~600 eager dispatches (272 key
        # splits + per-leaf xavier draws): on a remote backend every eager
        # op pays a network round trip, turning startup into minutes.
        return jax.jit(lambda k: init_params(k, self.cfg))(key)

    def apply(self, params, state, mixture, train: bool = False):
        return forward(params, state, self.cfg, mixture, train)

    def num_params(self, params: Params) -> int:
        return sum(p.size for p in jax.tree_util.tree_leaves(params))
