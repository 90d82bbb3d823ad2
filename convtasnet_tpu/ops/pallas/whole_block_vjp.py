"""Trainable whole-temporal-block kernel: custom VJP with a one-kernel
Pallas backward.

Training with XLA (no remat, unrolled scan) is HBM-bound: the backward
reads back every saved [M, K, H] intermediate of all R*X blocks (~10 GB at
the paper config, docs/results.md). This path instead saves ONLY the
[M, K, B] block input per block and runs the whole backward of one block

    out = x + out_w( norm2( prelu2( dwconv( norm1( prelu1( in_w(x) ))))))

in a single Pallas kernel that RECOMPUTES the mid-chain from x inside VMEM
(remat at zero HBM cost) and produces dx plus all eight parameter
gradients. Per block the HBM traffic is three narrow [K, B] slabs (read x,
read g, write dx) instead of ~10 wide [K, H] ones. The kernel keeps three
[K(+2*span), H] slabs resident (y1; c then db; dz then dc) and runs six
serial passes; the post-norm1 activation b is never materialized — the two
consumers (the conv and the dw-grad) recompute the (tile + halo) rows they
need from y1 on the fly, trading ~(span/TK) redundant VPU work for a whole
slab of VMEM and two full passes.

Backward math (biased-variance layer norm with EPS inside rsqrt, matching
the reference conv_tasnet.py:319-355): with x_hat = (v - mu) * r and
r = rsqrt(var + EPS) over N reduced elements,

    d_beta = sum(dy);  d_gamma = sum(dy * x_hat)
    dv = r * (dy*gamma - mean(dy*gamma) - x_hat * mean(dy*gamma * x_hat))

and PReLU: dv = dy * (v >= 0 ? 1 : alpha), d_alpha = sum(dy * min(v, 0)).

The depthwise conv transpose mirrors the forward taps: with the forward
c[k] = sum_p w[p] * b[k - left + p*d], the input grad is
db[j] = sum_p w[p] * dc[j + left - p*d] and the weight grad
dw[p] = sum_k dc[k] * b[k - left + p*d].

Rounding points (f32 accumulators cast to the activation dtype after each
matmul / stored slab) mirror the forward kernel so recomputed values equal
the forward's, and pad rows beyond the true K are masked exactly where the
forward forces them (b/c pad rows, final out rows).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import EPS
from .fused_whole_block import whole_block_pallas


def _prelu(v, alpha):
    return jnp.where(v >= 0, v, alpha * v)


def _dprelu(v, alpha):
    return jnp.where(v >= 0, 1.0, alpha)


def _row_stats(v):
    mean = jnp.mean(v, axis=-1, keepdims=True)
    d = v - mean
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    return mean, jax.lax.rsqrt(var + EPS)


def _bwd_kernel(x_ref, g_ref, in_w_ref, a1_ref, g1_ref, b1_ref, w_ref,
                a2_ref, g2_ref, b2_ref, out_w_ref,
                dx_ref, din_w_ref, da1_ref, dg1_ref, db1_ref, dw_ref,
                da2_ref, dg2_ref, db2_ref, dout_w_ref,
                y1s, cs, dzb, *,
                norm_type, dilation, causal, P, K, K_pad, B, H, TK):
    """Grid step = one batch item m; parameter-grad outputs revisit block
    (0,..) every step and accumulate."""
    m = pl.program_id(0)
    span = (P - 1) * dilation
    left = span if causal else span // 2
    n = K * H
    tiles = [(t0, TK) for t0 in range(0, K_pad, TK)]
    dt = x_ref.dtype
    gln = norm_type == "gLN"

    a1 = a1_ref[0]
    a2 = a2_ref[0]
    g1 = g1_ref[...].astype(jnp.float32)
    b1 = b1_ref[...].astype(jnp.float32)
    g2 = g2_ref[...].astype(jnp.float32)
    w = w_ref[...].astype(jnp.float32)  # [P, H]

    @pl.when(m == 0)
    def _():
        din_w_ref[...] = jnp.zeros_like(din_w_ref)
        da1_ref[0, 0] = jnp.float32(0.0)
        dg1_ref[...] = jnp.zeros_like(dg1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw_ref[...] = jnp.zeros_like(dw_ref)
        da2_ref[0, 0] = jnp.float32(0.0)
        dg2_ref[...] = jnp.zeros_like(dg2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dout_w_ref[...] = jnp.zeros_like(dout_w_ref)

    def row_mask(t0, tk, v, fill=0.0):
        """Zero rows at or beyond the true K (pad rows)."""
        if t0 + tk <= K:
            return v
        rows = jax.lax.broadcasted_iota(jnp.int32, (tk, 1), 0)
        return jnp.where(rows < K - t0, v, fill)

    # ---- Pass 1: recompute y1 = round(x @ in_w); gLN stats over a ----
    s1 = jnp.float32(0.0)
    ss1 = jnp.float32(0.0)
    for t0, tk in tiles:
        y1 = jax.lax.dot_general(
            x_ref[0, t0:t0 + tk, :], in_w_ref[...],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).astype(dt)
        y1s[t0:t0 + tk, :] = y1
        if gln:
            a = _prelu(y1.astype(jnp.float32), a1)  # pad rows are 0 (x pad 0)
            s1 = s1 + jnp.sum(a)
            ss1 = ss1 + jnp.sum(a * a)
    if gln:
        mu1 = s1 / n
        inv1 = jax.lax.rsqrt(jnp.maximum(ss1 / n - mu1 * mu1, 0.0) + EPS)
        norm1 = lambda a: g1[None, :] * ((a - mu1) * inv1) + b1[None, :]  # noqa: E731
    else:
        def norm1(a):
            mean, inv = _row_stats(a)
            return g1[None, :] * ((a - mean) * inv) + b1[None, :]

    def b_rows(lo, nrows):
        """Recompute b (= norm1(prelu(y1))) for absolute frame rows
        [lo, lo + nrows); out-of-range rows and pad rows (>= K, forced to
        zero by the forward) come back as exact zeros. lo/nrows are
        Python-static per tile."""
        c_lo, c_hi = max(lo, 0), min(lo + nrows, K_pad)
        a = _prelu(y1s[c_lo:c_hi, :].astype(jnp.float32), a1)
        b = norm1(a)
        b = row_mask(c_lo, c_hi - c_lo, b)
        return jnp.pad(b, ((c_lo - lo, lo + nrows - c_hi), (0, 0)))

    # ---- Pass 2: c = dwconv(b) (b recomputed per tile with its halo);
    #      gLN stats over e = prelu(c) ----
    s2 = jnp.float32(0.0)
    ss2 = jnp.float32(0.0)
    for t0, tk in tiles:
        be = b_rows(t0 - left, tk + span)  # rows t0-left .. t0+tk-1+right
        c = None
        for p in range(P):
            tap = be[p * dilation:p * dilation + tk, :] * w[p][None, :]
            c = tap if c is None else c + tap
        c = row_mask(t0, tk, c)
        cs[t0:t0 + tk, :] = c.astype(dt)
        if gln:
            e = _prelu(c, a2)
            s2 = s2 + jnp.sum(e)
            ss2 = ss2 + jnp.sum(e * e)
    if gln:
        mu2 = s2 / n
        inv2 = jax.lax.rsqrt(jnp.maximum(ss2 / n - mu2 * mu2, 0.0) + EPS)

    # ---- Pass 3: dz = g @ out_w^T; dW_out, dg2, db2; gLN grad sums ----
    sa = jnp.float32(0.0)
    sb = jnp.float32(0.0)
    for t0, tk in tiles:
        gt = row_mask(t0, tk, g_ref[0, t0:t0 + tk, :].astype(jnp.float32))
        c = cs[t0:t0 + tk, :].astype(jnp.float32)
        e = _prelu(c, a2)
        if gln:
            ehat = (e - mu2) * inv2
        else:
            mean, inv = _row_stats(e)
            ehat = (e - mean) * inv
        z = (g2[None, :] * ehat + b2_ref[...].astype(jnp.float32)[None, :]
             ).astype(dt)
        dz = jax.lax.dot_general(  # g @ out_w^T: contract B dims
            gt.astype(dt), out_w_ref[...],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
        dout_w_ref[...] += jax.lax.dot_general(  # z^T @ g -> [H, B]
            z, gt.astype(dt),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        dg2_ref[...] += jnp.sum(dz * ehat, axis=0, keepdims=True)
        db2_ref[...] += jnp.sum(dz, axis=0, keepdims=True)
        if gln:
            dzg = dz * g2[None, :]
            sa = sa + jnp.sum(dzg)
            sb = sb + jnp.sum(dzg * ehat)
            dzb[span + t0:span + t0 + tk, :] = dz.astype(dt)
        else:
            dzg = dz * g2[None, :]
            mh_a = jnp.mean(dzg, axis=-1, keepdims=True)
            mh_b = jnp.mean(dzg * ehat, axis=-1, keepdims=True)
            de = inv * (dzg - mh_a - ehat * mh_b)
            de = row_mask(t0, tk, de)
            dc = de * _dprelu(c, a2)
            da2_ref[0, 0] += jnp.sum(de * jnp.minimum(c, 0.0))
            be = b_rows(t0 - left, tk + span)
            for p in range(P):
                dw_ref[p:p + 1, :] += jnp.sum(
                    dc * be[p * dilation:p * dilation + tk, :],
                    axis=0, keepdims=True)
            dzb[span + t0:span + t0 + tk, :] = dc.astype(dt)

    if span > 0:
        dzb[0:span, :] = jnp.zeros((span, H), dt)
        dzb[span + K_pad:, :] = jnp.zeros((dzb.shape[0] - span - K_pad, H), dt)

    # ---- Pass 4 (gLN only): de/dc with global means; dw; dalpha2 ----
    if gln:
        m_a = sa / n
        m_b = sb / n
        for t0, tk in tiles:
            dz = dzb[span + t0:span + t0 + tk, :].astype(jnp.float32)
            c = cs[t0:t0 + tk, :].astype(jnp.float32)
            e = _prelu(c, a2)
            ehat = (e - mu2) * inv2
            de = inv2 * (dz * g2[None, :] - m_a - ehat * m_b)
            de = row_mask(t0, tk, de)  # dz pad rows are 0 but -m_a is not
            dc = de * _dprelu(c, a2)
            da2_ref[0, 0] += jnp.sum(de * jnp.minimum(c, 0.0))
            be = b_rows(t0 - left, tk + span)
            for p in range(P):
                dw_ref[p:p + 1, :] += jnp.sum(
                    dc * be[p * dilation:p * dilation + tk, :],
                    axis=0, keepdims=True)
            dzb[span + t0:span + t0 + tk, :] = dc.astype(dt)

    # ---- Pass 5: db = conv^T(dc) into cs (c is spent); norm1 grad sums ----
    sa1 = jnp.float32(0.0)
    sb1 = jnp.float32(0.0)
    for t0, tk in tiles:
        db = None
        for p in range(P):
            off = span + left - p * dilation + t0
            tap = dzb[off:off + tk, :].astype(jnp.float32) * w[p][None, :]
            db = tap if db is None else db + tap
        db = row_mask(t0, tk, db)  # forward forces b pad rows to zero
        a = _prelu(y1s[t0:t0 + tk, :].astype(jnp.float32), a1)
        if gln:
            ahat = (a - mu1) * inv1
            dbg = db * g1[None, :]
            sa1 = sa1 + jnp.sum(dbg)
            sb1 = sb1 + jnp.sum(dbg * ahat)
        else:
            mean, inv = _row_stats(a)
            ahat = (a - mean) * inv
        dg1_ref[...] += jnp.sum(db * ahat, axis=0, keepdims=True)
        db1_ref[...] += jnp.sum(db, axis=0, keepdims=True)
        cs[t0:t0 + tk, :] = db.astype(dt)

    # ---- Pass 6: da -> dy1 -> dx, dW_in, dalpha1 ----
    if gln:
        m_a1 = sa1 / n
        m_b1 = sb1 / n
    for t0, tk in tiles:
        db = cs[t0:t0 + tk, :].astype(jnp.float32)
        y1 = y1s[t0:t0 + tk, :].astype(jnp.float32)
        a = _prelu(y1, a1)
        if gln:
            ahat = (a - mu1) * inv1
            da = inv1 * (db * g1[None, :] - m_a1 - ahat * m_b1)
        else:
            mean, inv = _row_stats(a)
            ahat = (a - mean) * inv
            dbg = db * g1[None, :]
            mh_a = jnp.mean(dbg, axis=-1, keepdims=True)
            mh_b = jnp.mean(dbg * ahat, axis=-1, keepdims=True)
            da = inv * (dbg - mh_a - ahat * mh_b)
        da = row_mask(t0, tk, da)
        da1_ref[0, 0] += jnp.sum(da * jnp.minimum(y1, 0.0))
        dy1 = (da * _dprelu(y1, a1)).astype(dt)
        gt = row_mask(t0, tk, g_ref[0, t0:t0 + tk, :].astype(jnp.float32))
        dxt = jax.lax.dot_general(  # dy1 @ in_w^T: contract H dims
            dy1, in_w_ref[...],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ) + gt
        dx_ref[0, t0:t0 + tk, :] = row_mask(t0, tk, dxt).astype(dt)
        din_w_ref[...] += jax.lax.dot_general(  # x^T @ dy1 -> [B, H]
            x_ref[0, t0:t0 + tk, :], dy1,
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )


def _whole_block_bwd_pallas(x, g, in_w, alpha1, gamma1, beta1, w, alpha2,
                            gamma2, beta2, out_w, norm_type, dilation,
                            causal, interpret, K):
    M, K_pad, B = x.shape
    P, H = w.shape
    span = (P - 1) * dilation
    import os as _os

    want_tk = min(512, int(_os.environ.get("CONVTASNET_WHOLE_TK", "128")))
    TK = min(max(want_tk // 128 * 128, 128), K_pad)
    while K_pad % TK:
        TK -= 128
    kernel = partial(_bwd_kernel, norm_type=norm_type, dilation=dilation,
                     causal=causal, P=P, K=K, K_pad=K_pad, B=B, H=H, TK=TK)
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    scal = pl.BlockSpec(memory_space=pltpu.SMEM)
    acc = lambda shape: pl.BlockSpec(  # noqa: E731 — revisited accumulator
        shape, lambda m: (0,) * len(shape), memory_space=pltpu.VMEM)
    sacc = pl.BlockSpec((1, 1), lambda m: (0, 0), memory_space=pltpu.SMEM)
    f32 = jnp.float32
    outs = pl.pallas_call(
        kernel,
        grid=(M,),
        in_specs=[
            pl.BlockSpec((1, K_pad, B), lambda m: (m, 0, 0),
                         memory_space=pltpu.VMEM),  # x
            pl.BlockSpec((1, K_pad, B), lambda m: (m, 0, 0),
                         memory_space=pltpu.VMEM),  # g
            vec, scal, vec, vec, vec, scal, vec, vec, vec,
        ],
        out_specs=[
            pl.BlockSpec((1, K_pad, B), lambda m: (m, 0, 0),
                         memory_space=pltpu.VMEM),  # dx
            acc((B, H)), sacc, acc((1, H)), acc((1, H)),
            acc((P, H)), sacc, acc((1, H)), acc((1, H)),
            acc((H, B)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, K_pad, B), x.dtype),
            jax.ShapeDtypeStruct((B, H), f32),
            jax.ShapeDtypeStruct((1, 1), f32),
            jax.ShapeDtypeStruct((1, H), f32),
            jax.ShapeDtypeStruct((1, H), f32),
            jax.ShapeDtypeStruct((P, H), f32),
            jax.ShapeDtypeStruct((1, 1), f32),
            jax.ShapeDtypeStruct((1, H), f32),
            jax.ShapeDtypeStruct((1, H), f32),
            jax.ShapeDtypeStruct((H, B), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((K_pad, H), x.dtype),             # y1 slab
            pltpu.VMEM((K_pad, H), x.dtype),             # c, then db
            pltpu.VMEM((K_pad + 2 * span, H), x.dtype),  # dz, then dc
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        x, g,
        in_w.astype(x.dtype),
        jnp.asarray(alpha1, f32).reshape(1),
        gamma1, beta1, w,
        jnp.asarray(alpha2, f32).reshape(1),
        gamma2, beta2,
        out_w.astype(x.dtype),
    )
    (dx, din_w, da1, dg1, db1, dw, da2, dg2, db2, dout_w) = outs
    return (dx, din_w, da1.reshape(()), dg1.reshape(gamma1.shape),
            db1.reshape(beta1.shape), dw, da2.reshape(()),
            dg2.reshape(gamma2.shape), db2.reshape(beta2.shape), dout_w)


@partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14))
def whole_block_train(x, in_w, alpha1, gamma1, beta1, w, alpha2, gamma2,
                      beta2, out_w, norm_type, dilation, causal, interpret,
                      valid_k):
    """Differentiable whole-block op: forward = whole_block_pallas, backward
    = the fused recompute kernel above. x must already be 128-padded on the
    frame axis with zero pad rows (valid_k = true frame count), as the
    separator guarantees."""
    return whole_block_pallas(x, in_w, alpha1, gamma1, beta1, w, alpha2,
                              gamma2, beta2, out_w, norm_type, dilation,
                              causal, interpret, valid_k)


def _wbt_fwd(x, in_w, alpha1, gamma1, beta1, w, alpha2, gamma2, beta2,
             out_w, norm_type, dilation, causal, interpret, valid_k):
    out = whole_block_pallas(x, in_w, alpha1, gamma1, beta1, w, alpha2,
                             gamma2, beta2, out_w, norm_type, dilation,
                             causal, interpret, valid_k)
    # Save ONLY the block input (+ small params): the backward kernel
    # recomputes the wide mid-chain in VMEM.
    return out, (x, in_w, alpha1, gamma1, beta1, w, alpha2, gamma2, beta2,
                 out_w)


def _wbt_bwd(norm_type, dilation, causal, interpret, valid_k, res, g):
    (x, in_w, alpha1, gamma1, beta1, w, alpha2, gamma2, beta2, out_w) = res
    K = valid_k if valid_k is not None else x.shape[1]
    grads = _whole_block_bwd_pallas(
        x, g.astype(x.dtype), in_w, alpha1, gamma1, beta1, w, alpha2,
        gamma2, beta2, out_w, norm_type, dilation, causal, interpret, K)
    (dx, din_w, da1, dg1, db1, dw, da2, dg2, db2, dout_w) = grads
    return (dx, din_w.astype(in_w.dtype), da1.astype(jnp.float32),
            dg1.astype(gamma1.dtype), db1.astype(beta1.dtype),
            dw.astype(w.dtype), da2.astype(jnp.float32),
            dg2.astype(gamma2.dtype), db2.astype(beta2.dtype),
            dout_w.astype(out_w.dtype))


whole_block_train.defvjp(_wbt_fwd, _wbt_bwd)
