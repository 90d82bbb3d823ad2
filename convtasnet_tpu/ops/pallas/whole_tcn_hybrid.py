"""Mega-hybrid training path: whole-TCN Pallas forward + Pallas backward.

Forward: the whole-TCN mega-kernel (whole_tcn.py) with
save_residuals=True — per block it streams the block INPUT x_nb (narrow
[K_pad, B]) and the depthwise-conv output c_nb ([K_pad, H], pre-PReLU)
to HBM, overlapped with compute. That residual choice is deliberate:
x_nb is what din_w needs directly AND one cheap MXU dot away from y1
(from which the whole first chain recomputes), so the residual set is
narrower than saving y1+c while the backward recomputes nothing serial
— only per-block elementwise chains the VPU was going to touch anyway.

Backward: one Pallas kernel PER BLOCK (32 pallas_calls chained in
reverse by XLA), each gridded over the batch:

  * the gradient stream dx [K_pad, B] round-trips HBM between blocks —
    ~2 x 1.6 MB x 32 x M of traffic (~0.7 ms at the paper config), the
    price of keeping every kernel's VMEM footprint at ~40 MB. A
    whole-chain backward mega-kernel was built first and measured: its
    32-block straight-line body made Mosaic hold ~90 MB of scoped slab
    temporaries (no cross-block buffer coalescing), overflowing the
    128 MB VMEM ceiling at the paper config regardless of stream dtype;
  * x_nb/c_nb/g/dx are pipelined Pallas windows (auto double-buffered);
    per-block weights enter as single-block windows;
  * each block's weight gradients accumulate across batch items in f32
    in resident VMEM output buffers (zeroed at grid step 0);
  * per block: five MXU dots (y1 recompute, dz, dout_w, dx, din_w) and
    the fused elementwise grad chains of
    whole_block_hybrid._hybrid_bwd_math, whose numerics this kernel
    reproduces (activation-dtype streams, f32 statistics / reductions /
    accumulators, EPS inside rsqrt, pad-row masks at the same points).

v5e Mosaic constraints honored here: no bf16 comparisons (PReLU and its
derivative compare AND select in f32, downcast after — an f32-layout i1
mask cannot relayout into a bf16 select), scalar-only SMEM stores.
Reference capability being beaten: the training hot loop,
/root/reference/src/solver.py:172-186.
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
    vf = v.astype(jnp.float32)
    af = jnp.asarray(alpha, jnp.float32)
    return jnp.where(vf >= 0, vf, af * vf).astype(v.dtype)


def _dprelu(v, alpha):
    vf = v.astype(jnp.float32)
    return jnp.where(vf >= 0, jnp.float32(1),
                     jnp.asarray(alpha, jnp.float32)).astype(v.dtype)


def _bwd_block_kernel(x_ref, c_ref, g_ref,
                      in_w_ref, a1_ref, g1_ref, b1_ref, w_ref, a2_ref,
                      g2_ref, b2_ref, out_w_ref,
                      dx_ref, din_w_ref, da1_ref, dg1_ref, db1_ref, dw_ref,
                      da2_ref, dg2_ref, db2_ref, dout_w_ref,
                      hslab, *,
                      norm_type, dilation, causal, NB, P, K, K_pad, B, H, J):
    """One grid step processes J batch items (J=2 when VMEM allows —
    VERDICT round-3 item 2): the J per-item gradient chains are fully
    independent straight-line code in one kernel body, so Mosaic's
    scheduler can overlap item A's serial VPU elementwise chains with
    item B's five MXU dots — the same phase-interleave trick the forward
    mega-kernel measured at +5% (whole_tcn._tcn_kernel). Only the tiny
    f32 weight-grad accumulator '+=' ops order the two chains."""
    m = pl.program_id(0)
    n = K * H
    f32 = jnp.float32
    dt = x_ref.dtype
    masked = K < K_pad
    gln = norm_type == "gLN"
    d = dilation
    span = (P - 1) * d
    left = span if causal else span // 2

    # Zero this block's weight-grad accumulators once; they accumulate
    # across batch items in their resident VMEM/SMEM output buffers.
    @pl.when(m == 0)
    def _():
        for ref in (din_w_ref, dout_w_ref, dw_ref, dg1_ref, db1_ref,
                    dg2_ref, db2_ref):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)
        da1_ref[0] = f32(0)
        da2_ref[0] = f32(0)

    if masked:
        rowmask = jax.lax.broadcasted_iota(jnp.int32, (K_pad, 1), 0) < K

        def rmask(v):
            return jnp.where(rowmask, v, jnp.zeros((), v.dtype))
    else:
        def rmask(v):
            return v

    in_w = in_w_ref[0]          # [B, H] dt
    out_w = out_w_ref[0]        # [H, B] dt
    a1 = a1_ref[0]
    a2 = a2_ref[0]
    g1d = g1_ref[0].astype(dt)        # [1, H]
    g2d = g2_ref[0].astype(dt)

    for j in range(J):
        x = x_ref[j, 0]             # [K_pad, B] dt, pad rows exact zeros
        cf = rmask(c_ref[j, 0])     # dt; stored c pad rows are unmasked
        # Upstream cotangent rows beyond K are meaningless (the forward
        # zeroed those outputs) — masked every block, cheap.
        g_dt = rmask(g_ref[j])

        # ---- recompute chain 1 from x (bit-identical dot to forward) ----
        y1 = jax.lax.dot_general(
            x, in_w, (((1,), (0,)), ((), ())), preferred_element_type=f32,
        ).astype(dt)
        a = _prelu(y1, a1)
        if gln:
            mean1 = jnp.sum(a, dtype=f32) / n
            inv1 = jax.lax.rsqrt(
                jnp.maximum(jnp.sum(a.astype(f32) * a.astype(f32)) / n
                            - mean1 * mean1, 0.0) + EPS)
        else:
            af = a.astype(f32)
            mean1 = jnp.mean(af, axis=-1, keepdims=True)
            dv = af - mean1
            inv1 = jax.lax.rsqrt(jnp.mean(dv * dv, axis=-1, keepdims=True)
                                 + EPS)
        ahat = (a - mean1.astype(dt)) * inv1.astype(dt)
        b = rmask(g1d * ahat + b1_ref[0].astype(dt))

        # ---- recompute chain 2 from c ----
        e = _prelu(cf, a2)
        if gln:
            mean2 = jnp.sum(e, dtype=f32) / n
            inv2 = jax.lax.rsqrt(
                jnp.maximum(jnp.sum(e.astype(f32) * e.astype(f32)) / n
                            - mean2 * mean2, 0.0) + EPS)
        else:
            ef = e.astype(f32)
            mean2 = jnp.mean(ef, axis=-1, keepdims=True)
            dv = ef - mean2
            inv2 = jax.lax.rsqrt(jnp.mean(dv * dv, axis=-1, keepdims=True)
                                 + EPS)
        ehat = (e - mean2.astype(dt)) * inv2.astype(dt)
        z_dt = g2d * ehat + b2_ref[0].astype(dt)

        # ---- out_w backward ----
        dz = jax.lax.dot_general(   # [K, H] = g [K, B] x out_w [H, B]^T
            g_dt, out_w, (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        ).astype(dt)
        dout_w_ref[...] += jax.lax.dot_general(  # [H, B] = z^T g
            z_dt, g_dt, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )

        # ---- norm2 / prelu2 backward ----
        dg2_ref[0] += jnp.sum(dz.astype(f32) * ehat.astype(f32), axis=0)
        db2_ref[0] += jnp.sum(dz, axis=0, dtype=f32)
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
        da2_ref[0] += jnp.sum(de.astype(f32)
                              * jnp.minimum(cf.astype(f32), 0.0))
        dc = de * _dprelu(cf, a2)

        # ---- depthwise conv backward ----
        # dw[p] = sum_k dc[k] * b[k - left + p*d]: b in the bordered slab.
        hslab[j, span: span + K_pad, :] = b
        if span > 0:
            hslab[j, 0:span, :] = jnp.zeros((span, H), dt)
        hslab[j, span + K:, :] = jnp.zeros(
            (hslab.shape[1] - span - K, H), dt)
        base = span - left
        dwacc = []
        for p in range(P):
            tap = hslab[j, base + p * d: base + p * d + K_pad, :]
            dwacc.append(jnp.sum(dc.astype(f32) * tap.astype(f32), axis=0))
        dw_ref[...] += jnp.stack(dwacc)
        # db[k] = sum_p w[p] * dc[k + left - p*d]: dc reuses the slab.
        hslab[j, span: span + K_pad, :] = dc
        if span > 0:
            hslab[j, 0:span, :] = jnp.zeros((span, H), dt)
        hslab[j, span + K:, :] = jnp.zeros(
            (hslab.shape[1] - span - K, H), dt)
        db = None
        for p in range(P):
            off = span + left - p * d
            tap = w_ref[0, p].astype(dt) * hslab[j, off: off + K_pad, :]
            db = tap if db is None else db + tap
        db = rmask(db)

        # ---- norm1 / prelu1 backward ----
        dg1_ref[0] += jnp.sum(db.astype(f32) * ahat.astype(f32), axis=0)
        db1_ref[0] += jnp.sum(db, axis=0, dtype=f32)
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
        da1_ref[0] += jnp.sum(da.astype(f32)
                              * jnp.minimum(y1.astype(f32), 0.0))
        dy1_dt = da * _dprelu(y1, a1)

        # ---- in_w backward + residual path ----
        din_w_ref[...] += jax.lax.dot_general(   # [B, H] = x^T dy1
            x, dy1_dt, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        dx = jax.lax.dot_general(   # [K, B] = dy1 [K, H] x in_w [B, H]^T
            dy1_dt, in_w, (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        ).astype(dt) + g_dt
        dx_ref[j] = rmask(dx)


def _bwd_block_call(nb, g, x_res, c_res, in_w, a1, g1, b1, w, a2, g2, b2,
                    out_w, norm_type, causal, X, K, interpret, J=1):
    M, K_pad, B = g.shape
    NB, P, H = w.shape
    assert M % J == 0
    d = 2 ** (nb % X)
    span = (P - 1) * d
    f32 = jnp.float32
    kernel = partial(_bwd_block_kernel, norm_type=norm_type, dilation=d,
                     causal=causal, NB=NB, P=P, K=K, K_pad=K_pad, B=B, H=H,
                     J=J)
    win = pltpu.VMEM
    acc = lambda shape: pl.BlockSpec(  # noqa: E731 — resident accumulator
        shape, lambda m: (0,) * len(shape), memory_space=win)
    out = pl.pallas_call(
        kernel,
        grid=(M // J,),
        in_specs=[
            pl.BlockSpec((J, 1, K_pad, B), lambda m: (m, nb, 0, 0),
                         memory_space=win),          # x_nb
            pl.BlockSpec((J, 1, K_pad, H), lambda m: (m, nb, 0, 0),
                         memory_space=win),          # c_nb
            pl.BlockSpec((J, K_pad, B), lambda m: (m, 0, 0),
                         memory_space=win),          # upstream g
            pl.BlockSpec((1, B, H), lambda m: (nb, 0, 0),
                         memory_space=win),          # in_w
            # Per-block params are pre-sliced/reshaped OUTSIDE the kernel
            # (nb is static): Mosaic constrains the last two dims of every
            # blocked window, so the block index must ride a leading
            # singleton dim (affines: [NB, 1, H]) or be sliced away
            # entirely (scalars: whole-array [1] SMEM windows).
            pl.BlockSpec(memory_space=pltpu.SMEM),               # a1 [1]
            pl.BlockSpec((1, 1, H), lambda m: (nb, 0, 0),
                         memory_space=win),                      # g1
            pl.BlockSpec((1, 1, H), lambda m: (nb, 0, 0),
                         memory_space=win),                      # b1
            pl.BlockSpec((1, P, H), lambda m: (nb, 0, 0),
                         memory_space=win),          # dw_w
            pl.BlockSpec(memory_space=pltpu.SMEM),               # a2 [1]
            pl.BlockSpec((1, 1, H), lambda m: (nb, 0, 0),
                         memory_space=win),                      # g2
            pl.BlockSpec((1, 1, H), lambda m: (nb, 0, 0),
                         memory_space=win),                      # b2
            pl.BlockSpec((1, H, B), lambda m: (nb, 0, 0),
                         memory_space=win),          # out_w
        ],
        out_specs=[
            pl.BlockSpec((J, K_pad, B), lambda m: (m, 0, 0),
                         memory_space=win),          # dx
            acc((B, H)),                             # din_w
            pl.BlockSpec((1,), lambda m: (0,), memory_space=pltpu.SMEM),
            acc((1, H)), acc((1, H)), acc((P, H)),
            pl.BlockSpec((1,), lambda m: (0,), memory_space=pltpu.SMEM),
            acc((1, H)), acc((1, H)),
            acc((H, B)),                             # dout_w
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, K_pad, B), g.dtype),   # dx
            jax.ShapeDtypeStruct((B, H), f32),              # din_w
            jax.ShapeDtypeStruct((1,), f32),                # da1
            jax.ShapeDtypeStruct((1, H), f32),              # dg1
            jax.ShapeDtypeStruct((1, H), f32),              # db1
            jax.ShapeDtypeStruct((P, H), f32),              # dw
            jax.ShapeDtypeStruct((1,), f32),                # da2
            jax.ShapeDtypeStruct((1, H), f32),              # dg2
            jax.ShapeDtypeStruct((1, H), f32),              # db2
            jax.ShapeDtypeStruct((H, B), f32),              # dout_w
        ],
        scratch_shapes=[
            pltpu.VMEM((J, K_pad + 2 * span, H), g.dtype),  # b/dc slabs
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        x_res, c_res, g,
        in_w.astype(g.dtype),
        jnp.asarray(a1, f32).reshape(NB)[nb].reshape(1),
        g1.astype(f32).reshape(NB, 1, H), b1.astype(f32).reshape(NB, 1, H),
        w,
        jnp.asarray(a2, f32).reshape(NB)[nb].reshape(1),
        g2.astype(f32).reshape(NB, 1, H), b2.astype(f32).reshape(NB, 1, H),
        out_w.astype(g.dtype),
    )
    return out


def whole_tcn_bwd(g, x_res, c_res, in_w, a1, g1, b1, w, a2, g2, b2, out_w,
                  norm_type, causal, X, K, interpret=False):
    """Backward of the whole TCN stack: upstream g [M, K_pad, B] plus the
    saved residuals -> (dx, din_w, da1, dg1, db1, dw, da2, dg2, db2,
    dout_w), weight grads per block summed over items in f32 (stacked
    [NB, ...])."""
    NB, P, H = w.shape
    M, K_pad, B = g.shape
    # J=2 phase-interleave pairing (VERDICT r3 #2) was built and
    # MEASURED NEGATIVE on v5e at the paper config: batch-5 step 23.50 ms
    # vs 18.54 ms for J=1 (even the 5/6 padding-corrected 19.6 ms loses)
    # — under the doubled VMEM footprint Mosaic serializes rather than
    # overlaps the two chains, closing the round-3 floor argument from
    # the last untried direction (docs/results.md round 4). Default
    # stays J=1; CONVTASNET_BWD_J=2 re-enables the pairing for
    # experiments (odd batches pad one zero item, grads exact — a zero
    # item's g=0 kills dz/de/dc/db/da through every chain).
    # NOTE: the value is captured at FIRST jit trace — later changes to
    # the env var are invisible to already-compiled programs (XLA cache).
    import os as _os
    try:
        J = int(_os.environ.get("CONVTASNET_BWD_J", "1") or "1")
    except ValueError:
        import warnings as _warnings

        _warnings.warn("CONVTASNET_BWD_J must be an integer "
                       f"(got {_os.environ['CONVTASNET_BWD_J']!r}); using 1")
        J = 1
    if J < 1:
        J = 1
    if J > 1 and (M == 1 or tcn_bwd_vmem_need(
            K_pad, B, H, NB, P, X, g.dtype.itemsize, J=J)
            > 115 * 1024 * 1024):
        J = 1
    M_pad = -(-M // J) * J
    if M_pad != M:
        padw = ((0, M_pad - M),)
        g = jnp.pad(g, padw + ((0, 0),) * 2)
        x_res = jnp.pad(x_res, padw + ((0, 0),) * 3)
        c_res = jnp.pad(c_res, padw + ((0, 0),) * 3)
    per_block = {k: [] for k in range(10)}
    dx = g
    for nb in range(NB - 1, -1, -1):
        res = _bwd_block_call(nb, dx, x_res, c_res, in_w, a1, g1, b1, w,
                              a2, g2, b2, out_w, norm_type, causal, X, K,
                              interpret, J=J)
        dx = res[0]
        for i in range(1, 10):
            per_block[i].append(res[i])
    if M_pad != M:
        dx = dx[:M]
    # Collected in reverse block order; stack forward.
    stacked = [jnp.stack(per_block[i][::-1]) for i in range(1, 10)]
    din_w, da1, dg1, db1, dw, da2, dg2, db2, dout_w = stacked
    H = dg1.shape[-1]
    return (dx, din_w, da1.reshape(NB), dg1.reshape(NB, H),
            db1.reshape(NB, H), dw, da2.reshape(NB), dg2.reshape(NB, H),
            db2.reshape(NB, H), dout_w)


def tcn_bwd_vmem_need(K_pad: int, B: int, H: int, NB: int, P: int, X: int,
                      itemsize: int, J: int = 1) -> int:
    """VMEM bytes for the per-block backward kernel's dispatch check
    (worst block: span_max border). J = batch items per grid step; the
    windows, slabs, and live temps scale with J, the weights/accums
    don't."""
    span_max = (P - 1) * 2 ** (X - 1)
    return (J * (2 * K_pad * B * 3               # x/g/dx windows (x2 bufs)
                 + 2 * K_pad * H                 # c window (x2 bufs)
                 + (K_pad + 2 * span_max) * H    # bordered b/dc slab
                 ) * itemsize
            + (2 * B * H + P * H) * itemsize     # block weights
            + (2 * B * H + P * H + 4 * H) * 4    # f32 accums
            # Live [K_pad, H] chain temps are activation-dtype (the f32
            # pieces are scalar/row stats); ~8 live per item, validated
            # by compiling J=2 at the paper config on v5e.
            + J * 8 * K_pad * H * itemsize)


@partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14))
def whole_tcn_train(x, in_w, a1, g1, b1, w, a2, g2, b2, out_w,
                    norm_type, causal, X, interpret, valid_k):
    """Differentiable whole-TCN op: forward = the residual-saving mega
    kernel, backward = the per-block gradient kernels chained in reverse.
    x must be 128-padded on the frame axis with exact-zero pad rows
    (valid_k = the true frame count), as the separator guarantees."""
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
