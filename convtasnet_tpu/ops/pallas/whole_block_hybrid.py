"""Hybrid whole-block training path: Pallas forward that SAVES the
mid-chain residuals + a no-remat XLA backward that consumes them.

Round-2 measurements (docs/results.md) showed the whole-block Pallas
*forward* beats XLA (5.01 vs 5.75 ms at the paper config, batch 5) while
the recompute-based Pallas *backward* loses (13.9 vs 10.7 ms) — it is
VPU-bound re-deriving the mid-chain from the block input inside VMEM.
This module takes the other side of the trade, the one XLA's winning
no-remat path makes: the forward kernel (fused_whole_block.py with
save_residuals=True) streams the two matmul/conv outputs

    y1 = round(x @ in_w)            [M, K, H]  (pre-PReLU1)
    c  = dwconv(norm1(prelu1(y1)))  [M, K, H]  (pre-PReLU2)

to HBM via DMAs overlapped with the kernel's later passes, and the
backward is plain jnp: XLA fuses the elementwise chains (PReLU/norm
grads) around four MXU matmuls, reading y1/c instead of recomputing
them. Per block the activation HBM cost is two narrow [K, B] slabs plus
two [K, H] slabs — ~4x less than XLA's own no-remat residual set — with
zero recompute of the serial mid-chain.

Backward math (biased-variance layer norm with EPS inside rsqrt,
matching the reference conv_tasnet.py:319-355): with vhat = (v - mu) * r
and r = rsqrt(var + EPS) over n reduced elements,

    d_beta = sum(dy);  d_gamma = sum(dy * vhat)
    dv = r * (dy*gamma - mean(dy*gamma) - vhat * mean(dy*gamma * vhat))

and PReLU: dv = dy * (v >= 0 ? 1 : alpha), d_alpha = sum(dy * min(v, 0)).

The depthwise conv transpose mirrors the forward taps: with the forward
c[k] = sum_p w[p] * b[k - left + p*d], the input grad is
db[j] = sum_p w[p] * dc[j + left - p*d] and the weight grad
dw[p] = sum_k dc[k] * b[k - left + p*d].

Rounding points mirror the forward kernel (y1 and c are the kernel's
dtype-rounded slabs; the backward's dots consume activation-dtype
operands like the kernel's) and pad rows are masked exactly where the
forward forces them. Reference capability being beaten: the training hot
loop, /root/reference/src/solver.py:172-186.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...config import EPS
from .fused_whole_block import whole_block_pallas


def _prelu(v, alpha):
    return jnp.where(v >= 0, v, alpha * v)


def _dprelu(v, alpha):
    return jnp.where(v >= 0, 1.0, alpha)


def _hybrid_bwd_math(x, y1, c, g, in_w, alpha1, gamma1, beta1, w, alpha2,
                     gamma2, beta2, out_w, norm_type, dilation, causal, K):
    """Pure-jnp backward consuming the saved residuals.

    PRECISION POLICY (this is what makes the path fast): every wide
    [M, K, H] elementwise tensor stays in the ACTIVATION dtype — the
    backward is HBM-bandwidth bound (each fused pass streams ~16 MB/block
    at bf16; an all-f32 version measured 17.6 ms vs XLA's own 10.7 ms
    no-remat backward purely from doubled traffic) — while everything
    narrow is exact: norm statistics, all reductions (jnp.sum/mean with
    dtype=f32), matmul accumulators (preferred_element_type=f32), and
    all parameter gradients. This mirrors XLA's own backward of a bf16
    forward: bf16 streams, f32 accumulation."""
    M, K_pad, B = x.shape
    P, H = w.shape
    span = (P - 1) * dilation
    left = span if causal else span // 2
    n = K * H
    dt = x.dtype
    f32 = jnp.float32
    gln = norm_type == "gLN"

    a1 = jnp.asarray(alpha1, dt)
    a2 = jnp.asarray(alpha2, dt)
    g1 = gamma1.reshape(1, 1, H).astype(dt)
    b1 = beta1.reshape(1, 1, H).astype(dt)
    g2 = gamma2.reshape(1, 1, H).astype(dt)
    w_dt = w.astype(dt)
    in_w_dt = in_w.astype(dt)
    out_w_dt = out_w.astype(dt)

    if K != K_pad:
        mask = (jnp.arange(K_pad) < K)[None, :, None]

        def rmask(v):
            return jnp.where(mask, v, jnp.zeros((), v.dtype))
    else:
        def rmask(v):
            return v

    def gmean(v):
        # gLN mean over the n = K*H valid elements, per item; f32 accum.
        return (jnp.sum(v, axis=(1, 2), keepdims=True, dtype=f32) / n)

    def rstats(v):
        mean = jnp.mean(v.astype(f32), axis=-1, keepdims=True)
        d = v.astype(f32) - mean
        var = jnp.mean(d * d, axis=-1, keepdims=True)
        return mean, jax.lax.rsqrt(var + EPS)

    # ---- Recompute normalized activations from the saved slabs ----
    # (pad rows of y1 are exact zeros by the kernel contract)
    a = _prelu(y1, a1)  # dt
    if gln:
        mu1 = gmean(a)
        inv1 = jax.lax.rsqrt(
            jnp.maximum(gmean(a.astype(f32) * a.astype(f32))
                        - mu1 * mu1, 0.0) + EPS)
    else:
        mu1, inv1 = rstats(a)
    ahat = ((a - mu1.astype(dt)) * inv1.astype(dt))  # dt stream
    b = rmask(g1 * ahat + b1)  # forward forces b pad rows to zero

    cf = rmask(c)  # kernel does NOT mask stored c pad rows
    e = _prelu(cf, a2)
    if gln:
        mu2 = gmean(e)
        inv2 = jax.lax.rsqrt(
            jnp.maximum(gmean(e.astype(f32) * e.astype(f32))
                        - mu2 * mu2, 0.0) + EPS)
    else:
        mu2, inv2 = rstats(e)
    ehat = ((e - mu2.astype(dt)) * inv2.astype(dt))
    z_dt = g2 * ehat + beta2.reshape(1, 1, H).astype(dt)

    # ---- out_w backward ----
    g_dt = rmask(g.astype(dt))
    dz = jnp.einsum("mkb,hb->mkh", g_dt, out_w_dt,
                    preferred_element_type=f32).astype(dt)
    dout_w = jnp.einsum("mkh,mkb->hb", z_dt, g_dt,
                        preferred_element_type=f32)

    # ---- norm2 / prelu2 backward ----
    dg2 = jnp.sum(dz.astype(f32) * ehat.astype(f32), axis=(0, 1))
    db2 = jnp.sum(dz, axis=(0, 1), dtype=f32)
    dzg = dz * g2
    if gln:
        de = inv2.astype(dt) * (dzg - gmean(dzg).astype(dt)
                                - ehat * gmean(dzg * ehat).astype(dt))
    else:
        de = inv2.astype(dt) * (
            dzg - jnp.mean(dzg.astype(f32), -1, keepdims=True).astype(dt)
            - ehat * jnp.mean((dzg * ehat).astype(f32), -1,
                              keepdims=True).astype(dt))
    de = rmask(de)
    da2 = jnp.sum(de.astype(f32) * jnp.minimum(cf, 0).astype(f32))
    dc = de * _dprelu(cf, a2)

    # ---- depthwise conv backward (shift-and-sum, static offsets) ----
    bp = jnp.pad(b, ((0, 0), (left, span - left), (0, 0)))
    dw = jnp.stack([
        jnp.sum(dc.astype(f32)
                * bp[:, p * dilation:p * dilation + K_pad, :].astype(f32),
                axis=(0, 1))
        for p in range(P)
    ])  # [P, H] f32
    dcp = jnp.pad(dc, ((0, 0), (span - left, left), (0, 0)))
    db = None
    for p in range(P):
        tap = w_dt[p][None, None, :] * dcp[
            :, span - p * dilation:span - p * dilation + K_pad, :]
        db = tap if db is None else db + tap
    db = rmask(db)

    # ---- norm1 / prelu1 backward ----
    dg1 = jnp.sum(db.astype(f32) * ahat.astype(f32), axis=(0, 1))
    db1 = jnp.sum(db, axis=(0, 1), dtype=f32)
    dbg = db * g1
    if gln:
        da = inv1.astype(dt) * (dbg - gmean(dbg).astype(dt)
                                - ahat * gmean(dbg * ahat).astype(dt))
    else:
        da = inv1.astype(dt) * (
            dbg - jnp.mean(dbg.astype(f32), -1, keepdims=True).astype(dt)
            - ahat * jnp.mean((dbg * ahat).astype(f32), -1,
                              keepdims=True).astype(dt))
    da = rmask(da)
    da1 = jnp.sum(da.astype(f32) * jnp.minimum(y1, 0).astype(f32))
    dy1_dt = da * _dprelu(y1, a1)

    # ---- in_w backward + residual path ----
    dx = (jnp.einsum("mkh,bh->mkb", dy1_dt, in_w_dt,
                     preferred_element_type=f32).astype(dt) + g_dt)
    dx = rmask(dx)
    din_w = jnp.einsum("mkb,mkh->bh", x, dy1_dt, preferred_element_type=f32)

    return (dx, din_w.astype(in_w.dtype), da1.astype(f32),
            dg1.reshape(gamma1.shape).astype(gamma1.dtype),
            db1.reshape(beta1.shape).astype(beta1.dtype),
            dw.astype(w.dtype), da2.astype(f32),
            dg2.reshape(gamma2.shape).astype(gamma2.dtype),
            db2.reshape(beta2.shape).astype(beta2.dtype),
            dout_w.astype(out_w.dtype))


@partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14))
def whole_block_hybrid(x, in_w, alpha1, gamma1, beta1, w, alpha2, gamma2,
                       beta2, out_w, norm_type, dilation, causal, interpret,
                       valid_k):
    """Differentiable whole-block op: forward = the residual-saving Pallas
    kernel, backward = fused XLA consuming the saved slabs (no recompute
    of the mid-chain). x must already be 128-padded on the frame axis with
    zero pad rows (valid_k = true frame count), as the separator
    guarantees."""
    out, _, _ = whole_block_pallas(
        x, in_w, alpha1, gamma1, beta1, w, alpha2, gamma2, beta2, out_w,
        norm_type, dilation, causal, interpret, valid_k, save_residuals=True)
    return out


def _wbh_fwd(x, in_w, alpha1, gamma1, beta1, w, alpha2, gamma2, beta2,
             out_w, norm_type, dilation, causal, interpret, valid_k):
    out, y1, c = whole_block_pallas(
        x, in_w, alpha1, gamma1, beta1, w, alpha2, gamma2, beta2, out_w,
        norm_type, dilation, causal, interpret, valid_k, save_residuals=True)
    return out, (x, y1, c, in_w, alpha1, gamma1, beta1, w, alpha2, gamma2,
                 beta2, out_w)


def _wbh_bwd(norm_type, dilation, causal, interpret, valid_k, res, g):
    (x, y1, c, in_w, alpha1, gamma1, beta1, w, alpha2, gamma2, beta2,
     out_w) = res
    K = valid_k if valid_k is not None else x.shape[1]
    return _hybrid_bwd_math(
        x, y1, c, g.astype(x.dtype), in_w, alpha1, gamma1, beta1, w,
        alpha2, gamma2, beta2, out_w, norm_type, dilation, causal, K)


whole_block_hybrid.defvjp(_wbh_fwd, _wbh_bwd)
