"""Whole-TCN mega-kernel: ALL R*X temporal blocks in ONE Pallas kernel.

The whole-block kernel (fused_whole_block.py) reads and writes the
[K, B] bottleneck slab from/to HBM once per block — 32 round trips of
the residual stream per batch item at the paper config (~210 MB/item),
which round-2 measurements showed binds the serial pass chain
(docs/results.md: "cross-block pipelining" named as the remaining
lever, VERDICT round-2 item 2). This kernel eliminates the round trips
entirely:

  * the residual stream [K_pad, B] stays RESIDENT IN VMEM across all
    NB = R*X blocks (grid = one step per batch item; the block loop is
    a static Python loop inside the kernel, so every dilation 2**(i%X)
    and halo span is compile-time constant);
  * every block's weights are VMEM-resident for the whole kernel
    (stacked [NB, ...] arrays, ~17 MB at the paper config, fetched
    from HBM once per kernel launch, not per batch item);
  * per batch item the only HBM traffic is one [K_pad, B] read and one
    write (~3.3 MB instead of ~210 MB), double-buffered across grid
    steps so item m+1's input DMA overlaps item m's 32-block compute;
  * each block is a handful of FULL-SLAB ops (two big MXU dots, static
    conv-tap slices, fused elementwise) — no tile loops, so Mosaic
    tiles and software-pipelines each op internally. A fori_loop-tiled
    first cut measured 7.8 ms at batch 8 vs 5.8 for the per-block
    kernel: loop-carried serialization ate the traffic win.

Numerics are identical to the per-block kernel and the XLA path
(conv_tasnet.py:212-238 semantics): first dot's f32 accumulator rounded
to the activation dtype before PReLU, f32 statistics excluding pad rows,
EPS inside rsqrt, residual add in the activation dtype, pad rows exact
zeros at every block boundary.

Inference-only: training keeps the XLA / hybrid tiers (the backward
would need the mid-chain residuals this kernel deliberately never
materializes in HBM). Reference capability being beaten: the TCN
forward, /root/reference/src/conv_tasnet.py:146-210.
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


def _tcn_kernel(x_hbm, in_w_ref, a1_ref, g1_ref, b1_ref, w_ref, a2_ref,
                g2_ref, b2_ref, out_w_ref, *refs,
                norm_type, causal, X, NB, P, K, K_pad, B, H, span_max, J,
                save=False, fold=False):
    """One grid step processes J batch items (J=2 when the batch allows):
    the J per-item chains are fully independent, and emitting their ops
    phase-interleaved in one straight-line block lets Mosaic's scheduler
    overlap item A's MXU dots with item B's VPU elementwise chains — the
    single-item chain is ~40%% MXU / ~50%% VPU serial, so pairing hides
    most of the smaller side.

    With save=True (the mega-HYBRID training forward, J=1): every block's
    INPUT slab x_nb (narrow [K_pad, B] — DMA'd out before the in-place
    residual add overwrites it) and depthwise-conv output c_nb (pre-PReLU
    [K_pad, H]) stream to HBM, overlapped with the block compute. The
    backward mega-kernel (whole_tcn_bwd) consumes them: x gives din_w and
    the y1 recompute (one cheap MXU dot), c gives the second chain —
    nothing else is rematerialized."""
    if save:
        (out_hbm, xres_hbm, cres_hbm, slabs, bslab, cslabs,
         in_sems, out_sems, x_sems, c_sems) = refs
    else:
        out_hbm, slabs, bslab, in_sems, out_sems = refs
    g = pl.program_id(0)
    G = pl.num_programs(0)
    slot = g % 2
    n = K * H
    f32 = jnp.float32
    dt = slabs.dtype
    masked = K < K_pad
    gln = norm_type == "gLN"

    def in_dma(i):
        return pltpu.make_async_copy(x_hbm.at[pl.ds(i * J, J)],
                                     slabs.at[i % 2], in_sems.at[i % 2])

    def out_dma(i):
        return pltpu.make_async_copy(slabs.at[i % 2],
                                     out_hbm.at[pl.ds(i * J, J)],
                                     out_sems.at[i % 2])

    if save:  # J == 1
        def x_dma(nb):
            return pltpu.make_async_copy(slabs.at[slot, 0],
                                         xres_hbm.at[g, nb],
                                         x_sems.at[nb % 2])

        def c_dma(nb):
            return pltpu.make_async_copy(cslabs.at[nb % 2],
                                         cres_hbm.at[g, nb],
                                         c_sems.at[nb % 2])

    @pl.when(g == 0)
    def _():
        in_dma(0).start()

    # Free the other slot (out DMA of g-1 reads it) BEFORE prefetching
    # g+1 into it; the prefetch still overlaps this step's NB blocks.
    @pl.when(g >= 1)
    def _():
        out_dma(g - 1).wait()

    @pl.when(g + 1 < G)
    def _():
        in_dma(g + 1).start()

    in_dma(g).wait()
    xs = [slabs.at[slot, j] for j in range(J)]

    if masked:
        rowmask = jax.lax.broadcasted_iota(jnp.int32, (K_pad, 1), 0) < K

    for nb in range(NB):
        d = 2 ** (nb % X)
        span = (P - 1) * d
        left = span if causal else span // 2
        a1 = a1_ref[nb]
        a2 = a2_ref[nb]
        g1 = g1_ref[nb].astype(f32)[None, :]
        b1 = b1_ref[nb].astype(f32)[None, :]
        g2 = g2_ref[nb].astype(f32)[None, :]
        b2 = b2_ref[nb].astype(f32)[None, :]
        w = w_ref[nb].astype(f32)  # [P, H]

        # ---- in_w -> PReLU -> norm1 -> bordered conv slabs (full-slab,
        # phase-interleaved over the J items) ----
        if save:
            # Stream this block's INPUT out now; waited before the
            # in-place residual add at the end of the block overwrites it.
            x_dma(nb).start()
        a = []
        for j in range(J):
            y1 = jax.lax.dot_general(
                xs[j][...], in_w_ref[nb], (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            ).astype(dt)  # rounded like pointwise().astype(dt) in XLA
            a.append(_prelu(y1.astype(f32), a1))
        for j in range(J):
            aj = a[j]
            # y1 pad rows are exact zeros (x pad rows zero), so aj
            # contributes nothing to the gLN sums there — no mask needed.
            if gln:
                mean1 = jnp.sum(aj) / n
                inv1 = jax.lax.rsqrt(
                    jnp.maximum(jnp.sum(aj * aj) / n - mean1 * mean1, 0.0)
                    + EPS)
                b = g1 * ((aj - mean1) * inv1) + b1
            else:  # cLN: per-row stats
                mean = jnp.mean(aj, axis=-1, keepdims=True)
                dev = aj - mean
                var = jnp.mean(dev * dev, axis=-1, keepdims=True)
                b = g1 * (dev * jax.lax.rsqrt(var + EPS)) + b1
            bslab[j, span_max: span_max + K_pad, :] = b.astype(dt)
            # Zero the halo borders and the written pad rows beyond K
            # (static slices; the border is span_max rows for all blocks).
            bslab[j, 0:span_max, :] = jnp.zeros((span_max, H), dt)
            bslab[j, span_max + K:, :] = jnp.zeros(
                (bslab.shape[1] - span_max - K, H), dt)

        # ---- dwconv (static tap slices) -> PReLU -> norm2 -> out_w ----
        base = span_max - left
        es = []
        for j in range(J):
            c = None
            for p in range(P):
                tap = bslab[j, base + p * d: base + p * d + K_pad,
                            :].astype(f32) * w[p]
                c = tap if c is None else c + tap
            if save:
                if nb >= 2:  # free the revolving c slab slot
                    c_dma(nb - 2).wait()
                cslabs[nb % 2, :, :] = c.astype(dt)
                c_dma(nb).start()
            es.append(_prelu(c, a2))
        if fold:
            # Per-block row-vector projections of the affine terms through
            # out_w ([1, H] @ [H, B] — negligible next to the slab dots).
            ow32 = out_w_ref[nb].astype(f32)
            g2w = jax.lax.dot_general(g2, ow32, (((1,), (0,)), ((), ())),
                                      preferred_element_type=f32)  # [1, B]
            b2w = jax.lax.dot_general(b2, ow32, (((1,), (0,)), ((), ())),
                                      preferred_element_type=f32)  # [1, B]
        for j in range(J):
            e = es[j]
            if fold:
                # Round-5 forward lever (VERDICT r4 #3): norm2 is affine
                # in e per row, and the out_w contraction is linear, so
                # fold the normalize INTO the matmul:
                #   z @ W = inv * ((e @ (g2 (.) W)) - mean * (g2 @ W))
                #           + b2 @ W
                # (inv/mean scalar for gLN, per-row for cLN). This deletes
                # the full [K, H] normalize pass AND breaks the stats ->
                # matmul dependency: the MXU dot of e no longer waits on
                # the reduction, so Mosaic can overlap them. Numerics:
                # the dt rounding moves from z to e (same relative grade;
                # parity tested in f32 and vs the unfolded kernel).
                t = jax.lax.dot_general(
                    e.astype(dt), (g2.reshape(H, 1) * ow32).astype(dt),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )  # [K_pad, B]
                if gln:
                    em = jnp.where(rowmask, e, 0.0) if masked else e
                    mean2 = jnp.sum(em) / n
                    inv2 = jax.lax.rsqrt(
                        jnp.maximum(jnp.sum(em * em) / n - mean2 * mean2,
                                    0.0) + EPS)
                    o = (inv2 * t + (b2w - (inv2 * mean2) * g2w)).astype(dt)
                else:
                    mean = jnp.mean(e, axis=-1, keepdims=True)  # [K_pad, 1]
                    var = jnp.mean(e * e, axis=-1, keepdims=True) \
                        - mean * mean
                    rinv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + EPS)
                    o = (rinv * (t - mean * g2w) + b2w).astype(dt)
            else:
                if gln:
                    em = jnp.where(rowmask, e, 0.0) if masked else e
                    mean2 = jnp.sum(em) / n
                    inv2 = jax.lax.rsqrt(
                        jnp.maximum(jnp.sum(em * em) / n - mean2 * mean2,
                                    0.0) + EPS)
                    z = (g2 * ((e - mean2) * inv2) + b2).astype(dt)
                else:
                    mean = jnp.mean(e, axis=-1, keepdims=True)
                    dev = e - mean
                    var = jnp.mean(dev * dev, axis=-1, keepdims=True)
                    z = (g2 * (dev * jax.lax.rsqrt(var + EPS)) + b2).astype(dt)
                o = jax.lax.dot_general(
                    z, out_w_ref[nb], (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                ).astype(dt)
            # Residual add in place; pad rows leave every block as exact
            # zeros (norm/bias makes o nonzero there and the next block's
            # stats rely on zero pad rows).
            if save:
                x_dma(nb).wait()  # the input snapshot must be out first
            if masked:
                xs[j][...] = jnp.where(rowmask, xs[j][...] + o,
                                       jnp.zeros((), dt))
            else:
                xs[j][...] = xs[j][...] + o

    if save:
        c_dma(NB - 2).wait()
        c_dma(NB - 1).wait()

    out_dma(g).start()

    @pl.when(g == G - 1)
    def _():
        out_dma(g).wait()


def whole_tcn_pallas(x, in_w, a1, g1, b1, w, a2, g2, b2, out_w,
                     norm_type, causal, X, interpret=False, valid_k=None,
                     save_residuals=False, fold_norm2=None):
    """All NB = R*X temporal blocks fused: [M, K(,pad), B] -> same shape.

    Weights come stacked over blocks in scan order: leaf shape
    [NB, ...] where block i uses dilation 2**(i % X). With valid_k set,
    x is already 128-padded with exact-zero pad rows.

    With save_residuals=True returns (out, x_res, c_res) where
    x_res [M, NB, K_pad, B] is every block's input slab and
    c_res [M, NB, K_pad, H] every block's (dtype-rounded, pad rows NOT
    masked) depthwise-conv output — the mega-hybrid training residuals.
    """
    M, K_in, B = x.shape
    NB, P, H = w.shape
    if valid_k is not None:
        K, K_pad = valid_k, K_in
    else:
        K = K_in
        K_pad = -(-K // 128) * 128
        if K_pad != K:
            x = jnp.pad(x, ((0, 0), (0, K_pad - K), (0, 0)))
    span_max = (P - 1) * 2 ** (X - 1)
    it = x.dtype.itemsize
    if fold_norm2 is None:
        # Trace-time default (compiled programs cache the value): the
        # norm2->matmul fold is inference-only (the hybrid backward
        # recomputes norm2 from the saved c residuals, so the save path
        # keeps the reference op order). Measured on v5e round 5 — see
        # docs/results.md; CONVTASNET_TCN_FOLD=0 restores the unfolded
        # kernel for experiments.
        import os as _os

        fold_norm2 = (_os.environ.get("CONVTASNET_TCN_FOLD", "1") != "0"
                      and not save_residuals)

    # Pair batch items per grid step when the batch and VMEM allow it
    # (the MXU/VPU-overlap win in _tcn_kernel's docstring). Odd batches
    # pad one zero item (sliced off below) — the pairing win dwarfs the
    # <= 1-item overhead. Residual saving pins J=1 (the x DMA snapshots
    # the single resident slab).
    J = 2 if (not save_residuals and M > 1 and tcn_vmem_need(
        K_pad, B, H, NB, P, X, it, J=2) <= 110 * 1024 * 1024) else 1
    M_pad = -(-M // J) * J
    if M_pad != M:
        x = jnp.pad(x, ((0, M_pad - M), (0, 0), (0, 0)))

    kernel = partial(_tcn_kernel, norm_type=norm_type, causal=causal, X=X,
                     NB=NB, P=P, K=K, K_pad=K_pad, B=B, H=H,
                     span_max=span_max, J=J, save=save_residuals,
                     fold=bool(fold_norm2) and not save_residuals)
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    scal = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem_limit = min(
        128 * 1024 * 1024,
        tcn_vmem_need(K_pad, B, H, NB, P, X, it, J=J,
                      save=save_residuals) + 8 * 1024 * 1024)
    if save_residuals:
        out_shape = [
            jax.ShapeDtypeStruct((M_pad, K_pad, B), x.dtype),
            jax.ShapeDtypeStruct((M_pad, NB, K_pad, B), x.dtype),  # x_res
            jax.ShapeDtypeStruct((M_pad, NB, K_pad, H), x.dtype),  # c_res
        ]
        out_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 3
        scratch = [
            pltpu.VMEM((2, J, K_pad, B), x.dtype),  # resident residuals
            pltpu.VMEM((J, K_pad + 2 * span_max, H), x.dtype),  # conv slabs
            pltpu.VMEM((2, K_pad, H), x.dtype),     # revolving c-out slabs
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),          # x_res out
            pltpu.SemaphoreType.DMA((2,)),          # c_res out
        ]
    else:
        out_shape = jax.ShapeDtypeStruct((M_pad, K_pad, B), x.dtype)
        out_specs = pl.BlockSpec(memory_space=pl.ANY)
        scratch = [
            pltpu.VMEM((2, J, K_pad, B), x.dtype),  # resident residuals
            pltpu.VMEM((J, K_pad + 2 * span_max, H), x.dtype),  # conv slabs
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    out = pl.pallas_call(
        kernel,
        grid=(M_pad // J,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            vec,                                 # in_w  [NB, B, H]
            scal, vec, vec, vec, scal, vec, vec,
            vec,                                 # out_w [NB, H, B]
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
        jnp.asarray(a1, jnp.float32).reshape(NB),
        g1, b1, w,
        jnp.asarray(a2, jnp.float32).reshape(NB),
        g2, b2,
        out_w.astype(x.dtype),
    )
    if save_residuals:
        out, x_res, c_res = out
        if M_pad != M:
            out, x_res, c_res = out[:M], x_res[:M], c_res[:M]
        if valid_k is None and K_pad != K:
            out = out[:, :K, :]
        return out, x_res, c_res
    if M_pad != M:
        out = out[:M]
    if valid_k is not None:
        return out
    return out[:, :K, :] if K_pad != K else out


def tcn_vmem_need(K_pad: int, B: int, H: int, NB: int, P: int, X: int,
                  itemsize: int, J: int = 1, save: bool = False) -> int:
    """VMEM bytes the mega-kernel needs (for the dispatch check): the
    persistent buffers plus ~4 [K_pad, H] f32 intermediates per paired
    item the full-slab block body keeps live (a/b/c-e chains)."""
    span_max = (P - 1) * 2 ** (X - 1)
    return (J * 2 * K_pad * B                    # residual double buffers
            + J * (K_pad + 2 * span_max) * H     # bordered conv slabs
            + (2 * K_pad * H if save else 0)     # revolving c-out slabs
            + 2 * NB * B * H + NB * P * H        # all block weights
            ) * itemsize + J * 4 * K_pad * H * 4  # f32 full-slab temps
