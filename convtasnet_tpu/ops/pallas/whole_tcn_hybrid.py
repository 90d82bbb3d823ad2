"""Mega-hybrid training path: whole-TCN Pallas forward AND backward.

Forward: the whole-TCN mega-kernel (whole_tcn.py) with
save_residuals=True — per block it streams the block INPUT x_nb (narrow
[K_pad, B]) and the depthwise-conv output c_nb ([K_pad, H], pre-PReLU)
to HBM, overlapped with compute. That residual choice is deliberate:
x_nb is what din_w needs directly AND one cheap MXU dot away from y1
(from which the whole first chain recomputes), so the residual set is
~(B+H)/2H the size of saving y1+c while the backward recomputes nothing
serial — only per-block elementwise chains the VPU was going to touch
anyway.

Backward: ONE Pallas kernel for the entire 32-block gradient chain,
mirroring the forward's VMEM discipline:

  * the gradient stream dL/dx_nb [K_pad, B] stays RESIDENT in the dx
    output block across all blocks (reverse order), never touching HBM
    between blocks;
  * x_nb/c_nb stream in via double-buffered DMAs (block nb-1 prefetched
    during block nb's compute);
  * every weight gradient accumulates in f32 directly in its resident
    VMEM output buffer across blocks AND batch items (zeroed at grid
    step 0, flushed to HBM once at the end) — the [NB, B, H] + [NB, H,
    B] accumulators are the big VMEM tenants (~34 MB at paper config);
  * per block: five MXU dots (y1 recompute, dz, dout_w, dx, din_w) and
    the fused f32 elementwise grad chains of
    whole_block_hybrid._hybrid_bwd_math, whose numerics this kernel
    reproduces exactly (f32 statistics, EPS inside rsqrt, dt-rounded
    dot operands, pad-row masks at the same points).

The jnp hybrid backward (whole_block_hybrid.py) streams every
intermediate through HBM (measured 12.5 ms at the paper config, batch
5, vs XLA's own 10.7 ms no-remat backward); this kernel's HBM traffic
is just the residual reads (~157 MB/item) plus dx/g, so it targets the
compute floor instead. Reference capability being beaten: the training
hot loop, /root/reference/src/solver.py:172-186.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import EPS
from .whole_tcn import tcn_vmem_need, whole_tcn_pallas


def _prelu(v, alpha):
    # Compare AND select in f32, downcast after: the v5e VPU has no bf16
    # >= (Mosaic: "Target does not support this comparison") and an
    # f32-layout i1 mask cannot relayout into a bf16 select ("Invalid
    # relayout ... vector<...xi1>").
    vf = v.astype(jnp.float32)
    af = jnp.asarray(alpha, jnp.float32)
    return jnp.where(vf >= 0, vf, af * vf).astype(v.dtype)


def _dprelu(v, alpha):
    vf = v.astype(jnp.float32)
    return jnp.where(vf >= 0, jnp.float32(1),
                     jnp.asarray(alpha, jnp.float32)).astype(v.dtype)


def _tcn_bwd_kernel(xres_hbm, cres_hbm, g_hbm,
                    in_w_ref, a1_ref, g1_ref, b1_ref, w_ref, a2_ref,
                    g2_ref, b2_ref, out_w_ref,
                    dx_ref, din_w_ref, da1_ref, dg1_ref, db1_ref, dw_ref,
                    da2_ref, dg2_ref, db2_ref, dout_w_ref,
                    xslabs, cslabs, hslab, x_sems, c_sems, g_sem, *,
                    norm_type, causal, X, NB, P, K, K_pad, B, H, span_max):
    m = pl.program_id(0)
    M = pl.num_programs(0)
    n = K * H
    f32 = jnp.float32
    dt = xslabs.dtype
    masked = K < K_pad
    gln = norm_type == "gLN"

    def x_dma(nb):
        return pltpu.make_async_copy(xres_hbm.at[m, nb],
                                     xslabs.at[nb % 2], x_sems.at[nb % 2])

    def c_dma(nb):
        return pltpu.make_async_copy(cres_hbm.at[m, nb],
                                     cslabs.at[nb % 2], c_sems.at[nb % 2])

    # Zero every weight-grad accumulator once; they accumulate across
    # blocks and batch items in their resident VMEM output buffers.
    @pl.when(m == 0)
    def _():
        for ref in (din_w_ref, dout_w_ref, dw_ref, dg1_ref, db1_ref,
                    dg2_ref, db2_ref):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)
        for i in range(NB):  # SMEM takes scalar stores only
            da1_ref[i] = f32(0)
            da2_ref[i] = f32(0)

    # Upstream g is DMA'd straight into the dx output block (the resident
    # gradient stream) instead of a pipelined input window — saves two
    # [K_pad, B] VMEM buffers; the backward kernel sits within ~1 MB of
    # the 128 MB VMEM ceiling at the paper config.
    g_in = pltpu.make_async_copy(g_hbm.at[m], dx_ref.at[0], g_sem)
    g_in.start()
    x_dma(NB - 1).start()
    c_dma(NB - 1).start()

    if masked:
        rowmask = jax.lax.broadcasted_iota(jnp.int32, (K_pad, 1), 0) < K

        def rmask(v):
            return jnp.where(rowmask, v, jnp.zeros((), v.dtype))
    else:
        def rmask(v):
            return v

    # The gradient stream lives in the dx output block (flushed to HBM
    # once per item). Upstream cotangent rows beyond K are meaningless
    # (the forward zeroed those outputs) — mask once.
    g_in.wait()
    dx_ref[0] = rmask(dx_ref[0])

    for nb in range(NB - 1, -1, -1):
        d = 2 ** (nb % X)
        span = (P - 1) * d
        left = span if causal else span // 2
        a1 = a1_ref[nb]
        a2 = a2_ref[nb]
        g1 = g1_ref[nb].astype(f32)[None, :]
        g2 = g2_ref[nb].astype(f32)[None, :]
        w = w_ref[nb].astype(f32)  # [P, H]

        if nb >= 1:  # prefetch the next (reverse-order) block's residuals
            x_dma(nb - 1).start()
            c_dma(nb - 1).start()
        x_dma(nb).wait()
        c_dma(nb).wait()
        x = xslabs[nb % 2]          # [K_pad, B] dt, pad rows exact zeros
        cf = rmask(cslabs[nb % 2])  # dt; stored c pad rows are unmasked

        g_dt = dx_ref[0]            # masked running gradient, dt

        # PRECISION POLICY (whole_block_hybrid._hybrid_bwd_math): every
        # wide [K_pad, H] tensor stays in the ACTIVATION dtype — halving
        # the VMEM temp footprint Mosaic must schedule (an all-f32
        # version exceeded the 128 MB ceiling by 18 MB) — while norm
        # statistics, reductions, and matmul/weight-grad accumulators
        # are exact f32.
        a1d = a1.astype(dt)
        a2d = a2.astype(dt)
        g1d = g1.astype(dt)
        g2d = g2.astype(dt)

        # ---- recompute chain 1 from x (bit-identical dot to forward) ----
        y1 = jax.lax.dot_general(
            x, in_w_ref[nb], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ).astype(dt)
        a = _prelu(y1, a1d)
        if gln:
            mean1 = jnp.sum(a, dtype=f32) / n
            inv1 = jax.lax.rsqrt(
                jnp.maximum(jnp.sum(a.astype(f32) * a.astype(f32)) / n
                            - mean1 * mean1, 0.0) + EPS)
        else:
            af = a.astype(f32)
            mean1 = jnp.mean(af, axis=-1, keepdims=True)
            dv = af - mean1
            inv1 = jax.lax.rsqrt(
                jnp.mean(dv * dv, axis=-1, keepdims=True) + EPS)
        ahat = ((a - mean1.astype(dt)) * inv1.astype(dt))
        b = rmask(g1d * ahat + b1_ref[nb].astype(dt)[None, :])

        # ---- recompute chain 2 from c ----
        e = _prelu(cf, a2d)
        if gln:
            mean2 = jnp.sum(e, dtype=f32) / n
            inv2 = jax.lax.rsqrt(
                jnp.maximum(jnp.sum(e.astype(f32) * e.astype(f32)) / n
                            - mean2 * mean2, 0.0) + EPS)
        else:
            ef = e.astype(f32)
            mean2 = jnp.mean(ef, axis=-1, keepdims=True)
            dv = ef - mean2
            inv2 = jax.lax.rsqrt(
                jnp.mean(dv * dv, axis=-1, keepdims=True) + EPS)
        ehat = ((e - mean2.astype(dt)) * inv2.astype(dt))
        z_dt = g2d * ehat + b2_ref[nb].astype(dt)[None, :]

        # ---- out_w backward ----
        dz = jax.lax.dot_general(   # [K, H] = g [K, B] x out_w [H, B]^T
            g_dt, out_w_ref[nb], (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        ).astype(dt)
        dout_w_ref[nb] += jax.lax.dot_general(  # [H, B] = z^T g
            z_dt, g_dt, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )

        # ---- norm2 / prelu2 backward ----
        dg2_ref[nb] += jnp.sum(dz.astype(f32) * ehat.astype(f32), axis=0)
        db2_ref[nb] += jnp.sum(dz, axis=0, dtype=f32)
        dzg = dz * g2d
        if gln:
            de = inv2.astype(dt) * (
                dzg - (jnp.sum(dzg, dtype=f32) / n).astype(dt)
                - ehat * (jnp.sum(dzg.astype(f32)
                                  * ehat.astype(f32)) / n).astype(dt))
        else:
            de = inv2.astype(dt) * (
                dzg - jnp.mean(dzg.astype(f32), -1,
                               keepdims=True).astype(dt)
                - ehat * jnp.mean((dzg * ehat).astype(f32), -1,
                                  keepdims=True).astype(dt))
        de = rmask(de)
        da2_ref[nb] += jnp.sum(de.astype(f32)
                               * jnp.minimum(cf.astype(f32), 0.0))
        dc = de * _dprelu(cf, a2d)

        # ---- depthwise conv backward ----
        # dw[p] = sum_k dc[k] * b[k - left + p*d]: b in the bordered slab.
        hslab[span_max: span_max + K_pad, :] = b
        hslab[0:span_max, :] = jnp.zeros((span_max, H), dt)
        hslab[span_max + K:, :] = jnp.zeros(
            (hslab.shape[0] - span_max - K, H), dt)
        base = span_max - left
        dwacc = []
        for p in range(P):
            tap = hslab[base + p * d: base + p * d + K_pad, :]
            dwacc.append(jnp.sum(dc.astype(f32) * tap.astype(f32), axis=0))
        dw_ref[nb] += jnp.stack(dwacc)
        # db[j] = sum_p w[p] * dc[j + left - p*d]: dc reuses the slab.
        hslab[span_max: span_max + K_pad, :] = dc
        hslab[0:span_max, :] = jnp.zeros((span_max, H), dt)
        hslab[span_max + K:, :] = jnp.zeros(
            (hslab.shape[0] - span_max - K, H), dt)
        db = None
        for p in range(P):
            off = span_max + left - p * d
            tap = w[p].astype(dt) * hslab[off: off + K_pad, :]
            db = tap if db is None else db + tap
        db = rmask(db)

        # ---- norm1 / prelu1 backward ----
        dg1_ref[nb] += jnp.sum(db.astype(f32) * ahat.astype(f32), axis=0)
        db1_ref[nb] += jnp.sum(db, axis=0, dtype=f32)
        dbg = db * g1d
        if gln:
            da = inv1.astype(dt) * (
                dbg - (jnp.sum(dbg, dtype=f32) / n).astype(dt)
                - ahat * (jnp.sum(dbg.astype(f32)
                                  * ahat.astype(f32)) / n).astype(dt))
        else:
            da = inv1.astype(dt) * (
                dbg - jnp.mean(dbg.astype(f32), -1,
                               keepdims=True).astype(dt)
                - ahat * jnp.mean((dbg * ahat).astype(f32), -1,
                                  keepdims=True).astype(dt))
        da = rmask(da)
        da1_ref[nb] += jnp.sum(da.astype(f32)
                               * jnp.minimum(y1.astype(f32), 0.0))
        dy1_dt = da * _dprelu(y1, a1d)

        # ---- in_w backward + residual path ----
        din_w_ref[nb] += jax.lax.dot_general(  # [B, H] = x^T dy1
            x, dy1_dt, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        dx = jax.lax.dot_general(   # [K, B] = dy1 [K, H] x in_w [B, H]^T
            dy1_dt, in_w_ref[nb], (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        ).astype(dt) + g_dt
        dx_ref[0] = rmask(dx)


def whole_tcn_bwd(g, x_res, c_res, in_w, a1, g1, b1, w, a2, g2, b2, out_w,
                  norm_type, causal, X, K, interpret=False):
    """Backward of the whole TCN stack: upstream g [M, K_pad, B] plus the
    saved residuals -> (dx, din_w, da1, dg1, db1, dw, da2, dg2, db2,
    dout_w), weight grads summed over blocks' items in f32."""
    M, K_pad, B = g.shape
    NB, P, H = w.shape
    span_max = (P - 1) * 2 ** (X - 1)
    it = g.dtype.itemsize

    kernel = partial(_tcn_bwd_kernel, norm_type=norm_type, causal=causal,
                     X=X, NB=NB, P=P, K=K, K_pad=K_pad, B=B, H=H,
                     span_max=span_max)
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    scal = pl.BlockSpec(memory_space=pltpu.SMEM)
    acc = pl.BlockSpec(  # resident f32 accumulator, flushed once
        (NB, B, H), lambda m: (0, 0, 0), memory_space=pltpu.VMEM)
    acc_o = pl.BlockSpec(
        (NB, H, B), lambda m: (0, 0, 0), memory_space=pltpu.VMEM)
    acc_w = pl.BlockSpec(
        (NB, P, H), lambda m: (0, 0, 0), memory_space=pltpu.VMEM)
    acc_h = pl.BlockSpec(
        (NB, H), lambda m: (0, 0), memory_space=pltpu.VMEM)
    acc_s = pl.BlockSpec((NB,), lambda m: (0,), memory_space=pltpu.SMEM)
    f32 = jnp.float32
    vmem_limit = min(
        128 * 1024 * 1024,
        tcn_bwd_vmem_need(K_pad, B, H, NB, P, X, it) + 8 * 1024 * 1024)
    out = pl.pallas_call(
        kernel,
        grid=(M,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x_res stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # c_res stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # upstream g (manual DMA)
            vec,                                 # in_w  [NB, B, H]
            scal, vec, vec, vec, scal, vec, vec,
            vec,                                 # out_w [NB, H, B]
        ],
        out_specs=[
            pl.BlockSpec((1, K_pad, B), lambda m: (m, 0, 0),
                         memory_space=pltpu.VMEM),  # dx, per item
            acc, acc_s, acc_h, acc_h, acc_w, acc_s, acc_h, acc_h, acc_o,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, K_pad, B), g.dtype),   # dx
            jax.ShapeDtypeStruct((NB, B, H), f32),          # din_w
            jax.ShapeDtypeStruct((NB,), f32),               # da1
            jax.ShapeDtypeStruct((NB, H), f32),             # dg1
            jax.ShapeDtypeStruct((NB, H), f32),             # db1
            jax.ShapeDtypeStruct((NB, P, H), f32),          # dw
            jax.ShapeDtypeStruct((NB,), f32),               # da2
            jax.ShapeDtypeStruct((NB, H), f32),             # dg2
            jax.ShapeDtypeStruct((NB, H), f32),             # db2
            jax.ShapeDtypeStruct((NB, H, B), f32),          # dout_w
        ],
        scratch_shapes=[
            pltpu.VMEM((2, K_pad, B), g.dtype),   # x_res double buffer
            pltpu.VMEM((2, K_pad, H), g.dtype),   # c_res double buffer
            pltpu.VMEM((K_pad + 2 * span_max, H), g.dtype),  # b/dc slab
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),         # upstream g in
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit,
        ),
        interpret=interpret,
    )(
        x_res, c_res, g,
        in_w.astype(g.dtype),
        jnp.asarray(a1, f32).reshape(NB),
        g1, b1, w,
        jnp.asarray(a2, f32).reshape(NB),
        g2, b2,
        out_w.astype(g.dtype),
    )
    return out


def tcn_bwd_vmem_need(K_pad: int, B: int, H: int, NB: int, P: int, X: int,
                      itemsize: int) -> int:
    """VMEM bytes for the backward mega-kernel's dispatch check."""
    span_max = (P - 1) * 2 ** (X - 1)
    return ((2 * K_pad * B + 2 * K_pad * H       # residual double buffers
             + (K_pad + 2 * span_max) * H        # bordered b/dc slab
             + 2 * NB * B * H + NB * P * H       # weights
             + 2 * K_pad * B                     # dx out block (x2 buffers)
             ) * itemsize
            + (2 * NB * B * H + NB * P * H + 4 * NB * H) * 4  # f32 accums
            + 5 * K_pad * H * 4)                 # f32 full-slab temps


@partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14))
def whole_tcn_train(x, in_w, a1, g1, b1, w, a2, g2, b2, out_w,
                    norm_type, causal, X, interpret, valid_k):
    """Differentiable whole-TCN op: forward = the residual-saving mega
    kernel, backward = the whole-chain gradient mega-kernel. x must be
    128-padded on the frame axis with exact-zero pad rows (valid_k = the
    true frame count), as the separator guarantees."""
    out, _, _ = whole_tcn_pallas(
        x, in_w, a1, g1, b1, w, a2, g2, b2, out_w, norm_type, causal, X,
        interpret, valid_k, save_residuals=True)
    return out


def _wtt_fwd(x, in_w, a1, g1, b1, w, a2, g2, b2, out_w,
             norm_type, causal, X, interpret, valid_k):
    out, x_res, c_res = whole_tcn_pallas(
        x, in_w, a1, g1, b1, w, a2, g2, b2, out_w, norm_type, causal, X,
        interpret, valid_k, save_residuals=True)
    return out, (x_res, c_res, in_w, a1, g1, b1, w, a2, g2, b2, out_w)


def _wtt_bwd(norm_type, causal, X, interpret, valid_k, res, g):
    (x_res, c_res, in_w, a1, g1, b1, w, a2, g2, b2, out_w) = res
    K = valid_k if valid_k is not None else g.shape[1]
    (dx, din_w, da1, dg1, db1, dw, da2, dg2, db2, dout_w) = whole_tcn_bwd(
        g.astype(x_res.dtype), x_res, c_res, in_w, a1, g1, b1, w, a2, g2,
        b2, out_w, norm_type, causal, X, K, interpret)
    return (dx,
            din_w.astype(in_w.dtype),
            da1.reshape(jnp.shape(a1)).astype(jnp.asarray(a1).dtype),
            dg1.astype(g1.dtype), db1.astype(b1.dtype),
            dw.astype(w.dtype),
            da2.reshape(jnp.shape(a2)).astype(jnp.asarray(a2).dtype),
            dg2.astype(g2.dtype), db2.astype(b2.dtype),
            dout_w.astype(out_w.dtype))


whole_tcn_train.defvjp(_wtt_fwd, _wtt_bwd)
