"""Whole-temporal-block Pallas kernel: both 1x1 matmuls fused in.

The round-1 mid-chain kernel (deleted in round 4 — dominated tier) still
handed the [K, H] activation back to XLA between the two pointwise convs,
so each block cost four HBM slab transfers (read x, write/read the H-wide
mid activation, write out) plus an XLA<->Pallas boundary that defeats
overlap. This kernel executes the ENTIRE residual block
(conv_tasnet.py:212-238)

    out = x + out_w( norm2( prelu2( dwconv( norm1( prelu1( in_w(x) ))))))

with exactly ONE HBM read and ONE write of the narrow [K, B] bottleneck
slab per block: the [B, H]/[H, B] weights live in VMEM and both 1x1 convs
run as MXU dots inside the kernel, tile by tile over the frame axis. Per
paper-config block that is ~3.4 MB of activation traffic instead of
~13 MB for the mid-chain kernel (and more for XLA), pushing the forward
toward its ~1.5 ms MXU floor at batch 5.

Training modes:
  * save_residuals=False (inference): no extra outputs.
  * save_residuals=True (the HYBRID training forward, whole_block_hybrid.py):
    the kernel additionally streams the two mid-chain matmul/conv outputs
    y1 = round(x @ in_w) and c = dwconv(norm1(prelu(y1))) to HBM via
    async copies overlapped with the following passes. The backward then
    consumes them instead of recomputing the mid-chain (the no-remat trade
    XLA makes, but with this faster forward) — VERDICT round-2 item 1.

Numerics match the XLA block: the first dot's f32 accumulator is rounded
to the activation dtype before PReLU (pointwise().astype(dt) in
models/conv_tasnet.py), statistics are f32, EPS inside rsqrt, and the
residual add happens in the activation dtype.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import EPS


def _prelu(x, alpha):
    return jnp.where(x >= 0, x, alpha * x)


def _row_norm(a, gamma, beta):
    mean = jnp.mean(a, axis=-1, keepdims=True)
    d = a - mean
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    return gamma[None, :] * (d * jax.lax.rsqrt(var + EPS)) + beta[None, :]


def _block_kernel(x_hbm, in_w_ref, a1_ref, g1_ref, b1_ref, w_ref, a2_ref,
                  g2_ref, b2_ref, out_w_ref, *refs,
                  norm_type, dilation, causal, P, K, K_pad, B, H, TK, save):
    """Grid step = one batch item. slabs[2] double-buffer the [K_pad, B]
    x slab across grid steps and are overwritten in place by the output
    (residual consumed tile-by-tile). With save=True, y1/c residual slabs are DMA'd to HBM,
    overlapped with the passes that follow their final write."""
    if save:
        (out_hbm, y1_hbm, c_hbm, slabs, bslab, y1slab, cslab,
         in_sems, out_sems, res_sems) = refs
    else:
        out_hbm, slabs, bslab, eslab, in_sems, out_sems = refs
    m = pl.program_id(0)
    M = pl.num_programs(0)
    slot = m % 2
    span = (P - 1) * dilation
    left = span if causal else span // 2
    n = K * H
    tiles = [(t0, TK) for t0 in range(0, K_pad, TK)]
    xslab = slabs.at[slot]

    def in_dma(i):
        return pltpu.make_async_copy(x_hbm.at[i], slabs.at[i % 2], in_sems.at[i % 2])

    def out_dma(i):
        return pltpu.make_async_copy(slabs.at[i % 2], out_hbm.at[i], out_sems.at[i % 2])

    if save:
        def y1_dma(i):
            return pltpu.make_async_copy(y1slab, y1_hbm.at[i], res_sems.at[0])

        def c_dma(i):
            return pltpu.make_async_copy(cslab, c_hbm.at[i], res_sems.at[1])

    @pl.when(m == 0)
    def _():
        in_dma(0).start()

    @pl.when((m >= 1) & (m + 1 < M))
    def _():
        out_dma(m - 1).wait()

    @pl.when(m + 1 < M)
    def _():
        in_dma(m + 1).start()

    in_dma(m).wait()
    if save:
        # The previous step's residual DMAs read y1slab/cslab; they must
        # drain before this step overwrites the slabs.
        @pl.when(m >= 1)
        def _():
            y1_dma(m - 1).wait()
            c_dma(m - 1).wait()

    a1 = a1_ref[0]
    a2 = a2_ref[0]
    g1 = g1_ref[...].astype(jnp.float32)
    b1 = b1_ref[...].astype(jnp.float32)
    g2 = g2_ref[...].astype(jnp.float32)
    b2 = b2_ref[...].astype(jnp.float32)
    w = w_ref[...].astype(jnp.float32)  # [P, H]
    dt = xslab.dtype

    def y1_tile(t0, tk):
        """round(x @ in_w) rows [t0, t0+tk): MXU dot, rounded like the
        XLA path's pointwise().astype(dt) before the PReLU."""
        return jax.lax.dot_general(
            xslab[t0 : t0 + tk, :], in_w_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dt)

    def conv_tile(t0, tk):
        c = None
        for p in range(P):
            off = span - left + p * dilation + t0
            tap = bslab[off : off + tk, :].astype(jnp.float32) * w[p][None, :]
            c = tap if c is None else c + tap
        return c

    # ---- in_w -> PReLU -> norm1 into the bordered conv slab ----
    if norm_type == "gLN":
        s = jnp.float32(0.0)
        ss = jnp.float32(0.0)
        for t0, tk in tiles:
            y1 = y1_tile(t0, tk)
            if save:
                y1slab[t0 : t0 + tk, :] = y1
            a = _prelu(y1.astype(jnp.float32), a1)
            s = s + jnp.sum(a)
            ss = ss + jnp.sum(a * a)
            if not save:
                eslab[t0 : t0 + tk, :] = a.astype(dt)  # reread in pass 2
        mean1 = s / n
        inv1 = jax.lax.rsqrt(jnp.maximum(ss / n - mean1 * mean1, 0.0) + EPS)
        for t0, tk in tiles:
            if save:
                a = _prelu(y1slab[t0 : t0 + tk, :].astype(jnp.float32), a1)
            else:
                a = eslab[t0 : t0 + tk, :].astype(jnp.float32)
            b = g1[None, :] * ((a - mean1) * inv1) + b1[None, :]
            bslab[span + t0 : span + t0 + tk, :] = b.astype(dt)
    else:
        for t0, tk in tiles:
            y1 = y1_tile(t0, tk)
            if save:
                y1slab[t0 : t0 + tk, :] = y1
            b = _row_norm(_prelu(y1.astype(jnp.float32), a1), g1, b1)
            bslab[span + t0 : span + t0 + tk, :] = b.astype(dt)
    if save:
        y1_dma(m).start()

    if span > 0:
        bslab[0:span, :] = jnp.zeros((span, H), dt)
    bslab[span + K :, :] = jnp.zeros((bslab.shape[0] - span - K, H), dt)

    # ---- dwconv -> PReLU -> norm2 -> out_w -> +x, overwriting xslab ----
    if norm_type == "gLN":
        s = jnp.float32(0.0)
        ss = jnp.float32(0.0)
        for t0, tk in tiles:
            c = conv_tile(t0, tk)
            if save:
                cslab[t0 : t0 + tk, :] = c.astype(dt)
            e = _prelu(c, a2)
            if t0 + tk > K:
                rows = jax.lax.broadcasted_iota(jnp.int32, (tk, 1), 0)
                em = jnp.where(rows < K - t0, e, 0.0)
            else:
                em = e
            s = s + jnp.sum(em)
            ss = ss + jnp.sum(em * em)
            if not save:
                eslab[t0 : t0 + tk, :] = e.astype(dt)
        mean2 = s / n
        inv2 = jax.lax.rsqrt(jnp.maximum(ss / n - mean2 * mean2, 0.0) + EPS)
        for t0, tk in tiles:
            if save:
                e = _prelu(cslab[t0 : t0 + tk, :].astype(jnp.float32), a2)
            else:
                e = eslab[t0 : t0 + tk, :].astype(jnp.float32)
            z = (g2[None, :] * ((e - mean2) * inv2) + b2[None, :]).astype(dt)
            o = jax.lax.dot_general(
                z, out_w_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt)
            xslab[t0 : t0 + tk, :] = xslab[t0 : t0 + tk, :] + o
    else:
        for t0, tk in tiles:
            c = conv_tile(t0, tk)
            if save:
                cslab[t0 : t0 + tk, :] = c.astype(dt)
            z = _row_norm(_prelu(c, a2), g2, b2).astype(dt)
            o = jax.lax.dot_general(
                z, out_w_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt)
            xslab[t0 : t0 + tk, :] = xslab[t0 : t0 + tk, :] + o
    if save:
        c_dma(m).start()

    # Pad rows must leave the kernel as exact zeros (x pad rows are zero,
    # but norm/bias give the z pad rows nonzero values).
    if K_pad > K:
        xslab[K:K_pad, :] = jnp.zeros((K_pad - K, B), dt)

    out_dma(m).start()

    @pl.when(m == M - 1)
    def _():
        out_dma(m).wait()

    @pl.when((m == M - 1) & (M >= 2))
    def _():
        out_dma(m - 1).wait()

    if save:
        @pl.when(m == M - 1)
        def _():
            y1_dma(m).wait()
            c_dma(m).wait()


def whole_block_pallas(x, in_w, alpha1, gamma1, beta1, w, alpha2, gamma2,
                       beta2, out_w, norm_type, dilation, causal,
                       interpret=False, valid_k=None, save_residuals=False):
    """One full temporal block on TPU: [M, K(,pad), B] -> same shape.

    With valid_k set, x is already padded to a 128-multiple frame count
    and pad rows are exact zeros (the separator hoists the pad out of the
    block loop); output pad rows are zeroed.

    With save_residuals=True, returns (out, y1, c) where y1 [M, K_pad, H]
    is the dtype-rounded first matmul output (pad rows exact zeros) and
    c [M, K_pad, H] the depthwise-conv output (pad rows NOT masked —
    consumers must mask beyond valid_k).
    """
    M, K_in, B = x.shape
    P, H = w.shape
    span = (P - 1) * dilation
    if valid_k is not None:
        K = valid_k
        K_pad = K_in
    else:
        K = K_in
        K_pad = -(-K // 128) * 128
        if K_pad != K:
            x = jnp.pad(x, ((0, 0), (0, K_pad - K), (0, 0)))
    # Frame-tile size: measured flat from 128 to 512 (the kernel is bound
    # by the serial pass chain, not dot granularity); >512 explodes Mosaic
    # compile memory. Tunable for future hardware via CONVTASNET_WHOLE_TK.
    import os as _os

    want_tk = min(512, int(_os.environ.get("CONVTASNET_WHOLE_TK", "128")))
    # K_pad is always 128-aligned: round the request down to a 128 multiple
    # and step down by 128s until it divides K_pad (terminates at 128),
    # instead of halving to a degenerate tile (e.g. 384 with K_pad=512 -> 1).
    TK = min(max(want_tk // 128 * 128, 128), K_pad)
    while K_pad % TK:
        TK -= 128
    kernel = partial(_block_kernel, norm_type=norm_type, dilation=dilation,
                     causal=causal, P=P, K=K, K_pad=K_pad, B=B, H=H, TK=TK,
                     save=save_residuals)
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    scal = pl.BlockSpec(memory_space=pltpu.SMEM)
    if save_residuals:
        out_shape = [
            jax.ShapeDtypeStruct((M, K_pad, B), x.dtype),
            jax.ShapeDtypeStruct((M, K_pad, H), x.dtype),  # y1
            jax.ShapeDtypeStruct((M, K_pad, H), x.dtype),  # c
        ]
        out_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 3
        scratch = [
            pltpu.VMEM((2, K_pad, B), x.dtype),          # x/out double buffer
            pltpu.VMEM((K_pad + 2 * span, H), x.dtype),  # bordered conv slab
            pltpu.VMEM((K_pad, H), x.dtype),             # y1 slab
            pltpu.VMEM((K_pad, H), x.dtype),             # c slab
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),               # y1/c out DMAs
        ]
        vmem_limit = 32 * 1024 * 1024
    else:
        out_shape = jax.ShapeDtypeStruct((M, K_pad, B), x.dtype)
        out_specs = pl.BlockSpec(memory_space=pl.ANY)
        scratch = [
            pltpu.VMEM((2, K_pad, B), x.dtype),          # x/out double buffer
            pltpu.VMEM((K_pad + 2 * span, H), x.dtype),  # bordered conv slab
            pltpu.VMEM((K_pad, H), x.dtype),             # a/e two-pass slab
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        vmem_limit = 24 * 1024 * 1024
    out = pl.pallas_call(
        kernel,
        grid=(M,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            vec,                                 # in_w [B, H]
            scal, vec, vec, vec, scal, vec, vec,
            vec,                                 # out_w [H, B]
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit,
        ),
        interpret=interpret,
    )(
        x,
        in_w.astype(x.dtype),
        jnp.asarray(alpha1, jnp.float32).reshape(1),
        gamma1, beta1, w,
        jnp.asarray(alpha2, jnp.float32).reshape(1),
        gamma2, beta2,
        out_w.astype(x.dtype),
    )
    if save_residuals:
        out, y1, c = out
        if valid_k is None and K_pad != K:
            return out[:, :K, :], y1, c
        return out, y1, c
    if valid_k is not None:
        return out
    return out[:, :K, :] if K_pad != K else out
