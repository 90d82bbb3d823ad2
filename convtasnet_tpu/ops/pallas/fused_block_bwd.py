"""Backward Pallas kernel for the fused TCN mid-chain.

Forward chain (fused_block.py): a = PReLU(y, a1); b = norm1(a);
c = dwconv(b, w); e = PReLU(c, a2); z = norm2(e).

This kernel computes, per batch slab, dy plus per-slab partial parameter
gradients, entirely from (y, dz) with three HBM transfers (read y, read
dz, write dy) — the intermediates a, b, c, e are recomputed inside VMEM
exactly like the forward kernel (same single-pass sum/sumsq statistics on
fully-aligned tiles), and the gradient chain runs analytically:

  * LN backward:   dv = inv * (gy - mean(gy) - vhat * mean(gy * vhat)),
                   dgamma = sum(du * vhat), dbeta = sum(du)
                   (gLN means over the true K*H; cLN per frame)
  * PReLU backward: dx = du * where(x >= 0, 1, alpha);
                    dalpha = sum(du * min(x, 0))
  * dwconv backward: db = correlation(dc, w), dw[p] = sum_k dc[k] b[k+off]

Pad rows (frame axis aligned to 128) are zero in y and in dz (cotangents
of zero-contribution rows), but the mean-subtraction terms of the LN
backward are nonzero there, so dc and dy are explicitly masked back to
zero at the pad boundary to keep the correlation and the emitted gradient
exact.

Per-slab parameter partials come out as separate [M, ...] outputs and are
summed over the batch by the caller — negligible traffic next to the
slabs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import EPS


def _prelu_grad(x, alpha):
    return jnp.where(x >= 0, 1.0, alpha)


def _mid_bwd_kernel(y_hbm, dz_hbm, a1_ref, g1_ref, b1_ref, w_ref, a2_ref,
                    g2_ref, b2_ref,
                    dy_hbm, dg1_ref, db1_ref, dw_ref, dg2_ref, db2_ref,
                    dal_ref,
                    yslab, dzslab, bslab, dcslab, sems, *,
                    norm_type, dilation, causal, P, K, K_pad, H, TK):
    m = pl.program_id(0)
    span = (P - 1) * dilation
    left = span if causal else span // 2
    n = K * H
    nt = K_pad // TK  # all tiles full TK; pad rows are zeros in y/dz
    gln = norm_type == "gLN"

    cin_y = pltpu.make_async_copy(y_hbm.at[m], yslab, sems.at[0])
    cin_dz = pltpu.make_async_copy(dz_hbm.at[m], dzslab, sems.at[1])
    cin_y.start()
    cin_dz.start()

    a1 = a1_ref[0]
    a2 = a2_ref[0]
    g1 = g1_ref[...].astype(jnp.float32)
    b1v = b1_ref[...].astype(jnp.float32)
    g2 = g2_ref[...].astype(jnp.float32)
    b2v = b2_ref[...].astype(jnp.float32)
    w = w_ref[...].astype(jnp.float32)

    # Tile loops are statically unrolled: Mosaic accepts unaligned STATIC
    # slice offsets (conv taps sit at odd offsets) but cannot prove
    # alignment of dynamic ones, even via pl.multiple_of once a static
    # tap offset is added.
    def start(t):
        return t * TK

    def loop(nt_, body, init):
        c = init
        for t in range(nt_):
            c = body(t, c)
        return c

    def rowmask(t0, val, fill=0.0):
        """Zero rows >= K (the pad region)."""
        if K == K_pad:
            return val
        rows = jax.lax.broadcasted_iota(jnp.int32, (TK, 1), 0)
        return jnp.where(rows + t0 < K, val, fill)

    def a_tile(t0):
        y = yslab[pl.ds(t0, TK), :].astype(jnp.float32)
        return jnp.where(y >= 0, y, a1 * y)

    def conv_tile(slab, t0, taps_w):
        out = None
        for p in range(P):
            off = span - left + p * dilation
            tap = slab[pl.ds(t0 + off, TK), :].astype(jnp.float32) * taps_w[p][None, :]
            out = tap if out is None else out + tap
        return out

    def corr_tile(slab, t0):
        """Transpose conv: db[k] = sum_p w[p] * dc[k - (p*d - left)]."""
        out = None
        for p in range(P):
            off = span + left - p * dilation
            tap = slab[pl.ds(t0 + off, TK), :].astype(jnp.float32) * w[p][None, :]
            out = tap if out is None else out + tap
        return out

    cin_y.wait()

    # ---- forward recompute: stats1, b-slab, stats2 -------------------
    if gln:
        def s1_body(t, c):
            a = a_tile(start(t))
            return c[0] + jnp.sum(a), c[1] + jnp.sum(a * a)

        s, ss = loop(nt, s1_body, (jnp.float32(0), jnp.float32(0)))
        mean1 = s / n
        inv1 = jax.lax.rsqrt(jnp.maximum(ss / n - mean1 * mean1, 0.0) + EPS)

    def b_body(t, _):
        t0 = start(t)
        a = a_tile(t0)
        if gln:
            b = g1[None, :] * ((a - mean1) * inv1) + b1v[None, :]
        else:
            mu = jnp.mean(a, axis=-1, keepdims=True)
            d = a - mu
            iv = jax.lax.rsqrt(jnp.mean(d * d, axis=-1, keepdims=True) + EPS)
            b = g1[None, :] * (d * iv) + b1v[None, :]
        bslab[pl.ds(span + t0, TK), :] = b.astype(bslab.dtype)
        return 0

    loop(nt, b_body, 0)
    if span > 0:
        bslab[0:span, :] = jnp.zeros((span, H), bslab.dtype)
    bslab[span + K :, :] = jnp.zeros((bslab.shape[0] - span - K, H), bslab.dtype)

    def e_tile(t0):
        c = conv_tile(bslab, t0, w)
        return jnp.where(c >= 0, c, a2 * c), c

    if gln:
        def s2_body(t, c):
            e, _ = e_tile(start(t))
            em = rowmask(start(t), e)
            return c[0] + jnp.sum(em), c[1] + jnp.sum(em * em)

        s, ss = loop(nt, s2_body, (jnp.float32(0), jnp.float32(0)))
        mean2 = s / n
        inv2 = jax.lax.rsqrt(jnp.maximum(ss / n - mean2 * mean2, 0.0) + EPS)

    cin_dz.wait()

    # ---- backward: norm2 + PReLU2 -> dc-slab, param partials ---------
    zh = jnp.zeros((H,), jnp.float32)
    if gln:
        def g2_body(t, c):
            t0 = start(t)
            dz = rowmask(t0, dzslab[pl.ds(t0, TK), :].astype(jnp.float32))
            e, _ = e_tile(t0)
            ehat = (e - mean2) * inv2
            gy = dz * g2[None, :]
            return (c[0] + jnp.sum(gy), c[1] + jnp.sum(gy * ehat),
                    c[2] + jnp.sum(dz, axis=0), c[3] + jnp.sum(dz * ehat, axis=0))

        sgy, sgyv, dbeta2, dgamma2 = loop(nt, g2_body, (jnp.float32(0), jnp.float32(0), zh, zh))
        mgy2 = sgy / n
        mgyv2 = sgyv / n

    def dc_body(t, c):
        t0 = start(t)
        dz = rowmask(t0, dzslab[pl.ds(t0, TK), :].astype(jnp.float32))
        e, cc = e_tile(t0)
        if gln:
            ehat = (e - mean2) * inv2
            de = inv2 * (dz * g2[None, :] - mgy2 - ehat * mgyv2)
            extra = ()
        else:
            mu = jnp.mean(e, axis=-1, keepdims=True)
            d = e - mu
            iv = jax.lax.rsqrt(jnp.mean(d * d, axis=-1, keepdims=True) + EPS)
            ehat = d * iv
            gy = dz * g2[None, :]
            de = iv * (gy - jnp.mean(gy, axis=-1, keepdims=True)
                       - ehat * jnp.mean(gy * ehat, axis=-1, keepdims=True))
            extra = (c[1] + jnp.sum(dz, axis=0),
                     c[2] + jnp.sum(dz * ehat, axis=0))
        dc = rowmask(t0, de * _prelu_grad(cc, a2))
        dal = c[0] + jnp.sum(rowmask(t0, de * jnp.minimum(cc, 0.0)))
        dcslab[pl.ds(span + t0, TK), :] = dc.astype(dcslab.dtype)
        return (dal,) + extra

    if gln:
        (dalpha2,) = loop(nt, dc_body, (jnp.float32(0),))
    else:
        dalpha2, dbeta2, dgamma2 = loop(nt, dc_body, (jnp.float32(0), zh, zh))
    if span > 0:
        dcslab[0:span, :] = jnp.zeros((span, H), dcslab.dtype)
    dcslab[span + K_pad :, :] = jnp.zeros(
        (dcslab.shape[0] - span - K_pad, H), dcslab.dtype
    )

    # ---- dwconv backward: dw partials + norm1-bwd reductions ---------
    def dw_body(t, c):
        t0 = start(t)
        dw_rows, dbeta1, dgamma1, sgy, sgyv = c
        dc = dcslab[pl.ds(span + t0, TK), :].astype(jnp.float32)
        new_rows = []
        for p in range(P):
            off = span - left + p * dilation
            bsh = bslab[pl.ds(t0 + off, TK), :].astype(jnp.float32)
            new_rows.append(dw_rows[p] + jnp.sum(dc * bsh, axis=0))
        db = corr_tile(dcslab, t0)
        a = a_tile(t0)
        if gln:
            ahat = (a - mean1) * inv1
            gy = rowmask(t0, db * g1[None, :])
            sgy = sgy + jnp.sum(gy)
            sgyv = sgyv + jnp.sum(gy * ahat)
            dbeta1 = dbeta1 + jnp.sum(rowmask(t0, db), axis=0)
            dgamma1 = dgamma1 + jnp.sum(rowmask(t0, db * ahat), axis=0)
        else:
            dbeta1 = dbeta1 + jnp.sum(rowmask(t0, db), axis=0)
            mu = jnp.mean(a, axis=-1, keepdims=True)
            d = a - mu
            iv = jax.lax.rsqrt(jnp.mean(d * d, axis=-1, keepdims=True) + EPS)
            dgamma1 = dgamma1 + jnp.sum(rowmask(t0, db * (d * iv)), axis=0)
        return tuple(new_rows), dbeta1, dgamma1, sgy, sgyv

    init = (tuple(jnp.zeros((H,), jnp.float32) for _ in range(P)),
            zh, zh, jnp.float32(0), jnp.float32(0))
    dw_rows, dbeta1, dgamma1, sgy, sgyv = loop(nt, dw_body, init)
    if gln:
        mgy1 = sgy / n
        mgyv1 = sgyv / n

    # ---- norm1 + PReLU1 backward -> dy (into dzslab, then DMA out) ---
    def dy_body(t, dal):
        t0 = start(t)
        db = corr_tile(dcslab, t0)
        a = a_tile(t0)
        yv = yslab[pl.ds(t0, TK), :].astype(jnp.float32)
        if gln:
            ahat = (a - mean1) * inv1
            da = inv1 * (db * g1[None, :] - mgy1 - ahat * mgyv1)
        else:
            mu = jnp.mean(a, axis=-1, keepdims=True)
            d = a - mu
            iv = jax.lax.rsqrt(jnp.mean(d * d, axis=-1, keepdims=True) + EPS)
            ahat = d * iv
            gy = db * g1[None, :]
            da = iv * (gy - jnp.mean(gy, axis=-1, keepdims=True)
                       - ahat * jnp.mean(gy * ahat, axis=-1, keepdims=True))
        da = rowmask(t0, da)
        dal = dal + jnp.sum(da * jnp.minimum(yv, 0.0))
        dy = da * _prelu_grad(yv, a1)
        dzslab[pl.ds(t0, TK), :] = dy.astype(dzslab.dtype)
        return dal

    dalpha1 = loop(nt, dy_body, jnp.float32(0))

    dg1_ref[0, 0, :] = dgamma1
    db1_ref[0, 0, :] = dbeta1
    dw_ref[0] = jnp.stack(dw_rows)
    dg2_ref[0, 0, :] = dgamma2
    db2_ref[0, 0, :] = dbeta2
    dal_ref[0, 0, 0] = dalpha1
    dal_ref[0, 0, 1] = dalpha2

    cout = pltpu.make_async_copy(dzslab, dy_hbm.at[m], sems.at[2])
    cout.start()
    cout.wait()


def mid_bwd_pallas(y, dz, alpha1, gamma1, beta1, w, alpha2, gamma2, beta2,
                   norm_type, dilation, causal, interpret, valid_k=None):
    """Fused backward. y/dz: [M, K(_pad), H]. Returns
    (dy, dalpha1, dgamma1, dbeta1, dw, dalpha2, dgamma2, dbeta2)."""
    M, K_in, H = y.shape
    P = w.shape[0]
    span = (P - 1) * dilation
    if valid_k is not None:
        K, K_pad = valid_k, K_in
    else:
        K = K_in
        K_pad = -(-K // 128) * 128
        if K_pad != K:
            pad = ((0, 0), (0, K_pad - K), (0, 0))
            y = jnp.pad(y, pad)
            dz = jnp.pad(dz, pad)
    TK = min(128, K_pad)
    kernel = partial(_mid_bwd_kernel, norm_type=norm_type, dilation=dilation,
                     causal=causal, P=P, K=K, K_pad=K_pad, H=H, TK=TK)
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    scal = pl.BlockSpec(memory_space=pltpu.SMEM)
    pm3 = lambda m: (m, 0, 0)  # noqa: E731
    outs = pl.pallas_call(
        kernel,
        grid=(M,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            scal, vec, vec, vec, scal, vec, vec,
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, H), pm3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), pm3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, H), pm3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), pm3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), pm3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2), pm3, memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, K_pad, H), y.dtype),     # dy
            jax.ShapeDtypeStruct((M, 1, H), jnp.float32),     # dgamma1
            jax.ShapeDtypeStruct((M, 1, H), jnp.float32),     # dbeta1
            jax.ShapeDtypeStruct((M, P, H), jnp.float32),     # dw
            jax.ShapeDtypeStruct((M, 1, H), jnp.float32),     # dgamma2
            jax.ShapeDtypeStruct((M, 1, H), jnp.float32),     # dbeta2
            jax.ShapeDtypeStruct((M, 1, 2), jnp.float32),     # dalpha1/2
        ],
        scratch_shapes=[
            pltpu.VMEM((K_pad, H), y.dtype),               # y slab
            pltpu.VMEM((K_pad, H), y.dtype),               # dz / dy slab
            pltpu.VMEM((K_pad + 2 * span, H), y.dtype),    # b slab
            pltpu.VMEM((K_pad + 2 * span, H), y.dtype),    # dc slab
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        y, dz,
        jnp.asarray(alpha1, jnp.float32).reshape(1),
        gamma1, beta1, w,
        jnp.asarray(alpha2, jnp.float32).reshape(1),
        gamma2, beta2,
    )
    dy, dg1, db1, dw, dg2, db2, dal = outs
    if valid_k is None and K_pad != K:
        dy = dy[:, :K, :]
    return (
        dy,
        jnp.sum(dal[:, 0, 0]).astype(jnp.float32),
        jnp.sum(dg1[:, 0], axis=0), jnp.sum(db1[:, 0], axis=0),
        jnp.sum(dw, axis=0),
        jnp.sum(dal[:, 0, 1]).astype(jnp.float32),
        jnp.sum(dg2[:, 0], axis=0), jnp.sum(db2[:, 0], axis=0),
    )
