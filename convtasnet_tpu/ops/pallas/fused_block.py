"""Fused TCN mid-chain Pallas kernel.

Each temporal block (conv_tasnet.py:212-272) is
    1x1 -> [PReLU -> norm -> dilated depthwise -> PReLU -> norm] -> 1x1
The bracketed mid-chain between the two MXU matmuls is bandwidth-bound:
XLA executes it as ~4 separate HBM passes over the [K, H] activation. This
kernel grids over the batch and performs the whole chain with exactly ONE
HBM read and ONE HBM write per slab:

  * the [K, H] slab is DMA'd manually (inputs stay in ANY/HBM space), so
    VMEM holds just two activation-dtype slabs — the input/result slab and
    a zero-bordered conv slab — ~7 MB at the paper config instead of the
    21.75 MB that whole-slab f32 temporaries + pipeline double-buffering
    cost (which overflowed the 16 MB VMEM).
  * statistics run as chunked two-pass f32 reductions over VMEM (fori_loop
    with TK-row tiles), so accuracy matches the XLA two-pass variance and
    temporaries stay at one [TK, H] f32 tile.
  * the depthwise taps are static slices of the bordered slab; causal
    (left-pad/chomp, conv_tasnet.py:251-252) and non-causal paddings are
    just different slice origins. gLN reduces over (K, H); cLN is per-frame
    and needs no global pass.

Backward (custom_vjp) is analytic JAX: PReLU/LN/conv-transpose gradients
composed in one fused XLA pass, recomputing the cheap intermediates from
the saved input — no activation slabs are stored, which composes with the
per-repeat remat policy.
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


def _row_norm_f32(a, gamma, beta):
    """cLN: per-row (time step) stats over channels. a: [TK, H] f32."""
    mean = jnp.mean(a, axis=-1, keepdims=True)
    d = a - mean
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    return gamma[None, :] * (d * jax.lax.rsqrt(var + EPS)) + beta[None, :]


def _mid_kernel(y_hbm, a1_ref, g1_ref, b1_ref, w_ref, a2_ref, g2_ref, b2_ref,
                out_hbm, yslab, bslab, sems, *,
                norm_type, dilation, causal, P, K, H, TK):
    m = pl.program_id(0)
    span = (P - 1) * dilation
    left = span if causal else span // 2
    n = K * H
    # Static tile table (ragged tail) — Mosaic handles unaligned STATIC
    # sublane offsets but cannot prove alignment of dynamic ones, so the
    # tile loop is unrolled in Python with literal slice starts.
    tiles = [(t0, min(TK, K - t0)) for t0 in range(0, K, TK)]

    cp_in = pltpu.make_async_copy(y_hbm.at[m], yslab, sems.at[0])
    cp_in.start()

    a1 = a1_ref[0]
    a2 = a2_ref[0]
    g1 = g1_ref[...].astype(jnp.float32)
    b1 = b1_ref[...].astype(jnp.float32)
    g2 = g2_ref[...].astype(jnp.float32)
    b2 = b2_ref[...].astype(jnp.float32)
    w = w_ref[...].astype(jnp.float32)  # [P, H]

    def a_tile(t0, tk):
        return _prelu(yslab[t0 : t0 + tk, :].astype(jnp.float32), a1)

    def conv_tile(t0, tk):
        """Depthwise dilated conv rows [t0, t0+tk) from the bordered slab."""
        c = None
        for p in range(P):
            off = span - left + p * dilation + t0
            tap = bslab[off : off + tk, :].astype(jnp.float32) * w[p][None, :]
            c = tap if c is None else c + tap
        return c

    cp_in.wait()

    if norm_type == "gLN":
        # Two-pass f32 stats of prelu(y) over (K, H).
        s = jnp.float32(0.0)
        for t0, tk in tiles:
            s = s + jnp.sum(a_tile(t0, tk))
        mean1 = s / n
        v = jnp.float32(0.0)
        for t0, tk in tiles:
            d = a_tile(t0, tk) - mean1
            v = v + jnp.sum(d * d)
        inv1 = jax.lax.rsqrt(v / n + EPS)
        for t0, tk in tiles:
            b = g1[None, :] * ((a_tile(t0, tk) - mean1) * inv1) + b1[None, :]
            bslab[span + t0 : span + t0 + tk, :] = b.astype(bslab.dtype)
    else:  # cLN: local per-row stats, single pass
        for t0, tk in tiles:
            b = _row_norm_f32(a_tile(t0, tk), g1, b1)
            bslab[span + t0 : span + t0 + tk, :] = b.astype(bslab.dtype)

    # Zero halo borders once b is in place.
    if span > 0:
        bslab[0:span, :] = jnp.zeros((span, H), bslab.dtype)
        bslab[span + K : 2 * span + K, :] = jnp.zeros((span, H), bslab.dtype)

    if norm_type == "gLN":
        s = jnp.float32(0.0)
        for t0, tk in tiles:
            s = s + jnp.sum(_prelu(conv_tile(t0, tk), a2))
        mean2 = s / n
        v = jnp.float32(0.0)
        for t0, tk in tiles:
            d = _prelu(conv_tile(t0, tk), a2) - mean2
            v = v + jnp.sum(d * d)
        inv2 = jax.lax.rsqrt(v / n + EPS)
        for t0, tk in tiles:
            e = _prelu(conv_tile(t0, tk), a2)
            z = g2[None, :] * ((e - mean2) * inv2) + b2[None, :]
            yslab[t0 : t0 + tk, :] = z.astype(yslab.dtype)
    else:
        for t0, tk in tiles:
            z = _row_norm_f32(_prelu(conv_tile(t0, tk), a2), g2, b2)
            yslab[t0 : t0 + tk, :] = z.astype(yslab.dtype)

    cp_out = pltpu.make_async_copy(yslab, out_hbm.at[m], sems.at[1])
    cp_out.start()
    cp_out.wait()


def _mid_pallas(y, alpha1, gamma1, beta1, w, alpha2, gamma2, beta2,
                norm_type, dilation, causal, interpret):
    M, K, H = y.shape
    P = w.shape[0]
    span = (P - 1) * dilation
    TK = min(256, K)
    # DMA slices must be sublane-aligned: pad the frame axis to 32 rows.
    # The kernel's static tile table only touches the true K rows (gLN
    # statistics stay exact); pad rows carry junk that is sliced off below.
    K_pad = -(-K // 32) * 32
    if K_pad != K:
        y = jnp.pad(y, ((0, 0), (0, K_pad - K), (0, 0)))
    kernel = partial(_mid_kernel, norm_type=norm_type, dilation=dilation,
                     causal=causal, P=P, K=K, H=H, TK=TK)
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    scal = pl.BlockSpec(memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kernel,
        grid=(M,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # y stays in HBM
            scal, vec, vec, vec, scal, vec, vec,
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((M, K_pad, H), y.dtype),
        scratch_shapes=[
            pltpu.VMEM((K_pad, H), y.dtype),         # y / z slab
            pltpu.VMEM((K + 2 * span, H), y.dtype),  # bordered conv slab
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(
        y,
        jnp.asarray(alpha1, jnp.float32).reshape(1),
        gamma1, beta1, w,
        jnp.asarray(alpha2, jnp.float32).reshape(1),
        gamma2, beta2,
    )
    return out[:, :K, :] if K_pad != K else out


# ---------------------------------------------------------------------------
# Reference chain (for backward + XLA fallback parity)
# ---------------------------------------------------------------------------

def mid_reference(y, alpha1, gamma1, beta1, w, alpha2, gamma2, beta2,
                  norm_type, dilation, causal):
    """Pure-JAX mid-chain, numerically matching the fused kernel."""
    from ..activations import prelu
    from ..conv import depthwise_dilated
    from ..norms import channelwise_layer_norm, global_layer_norm

    norm = global_layer_norm if norm_type == "gLN" else channelwise_layer_norm
    a = prelu(y, alpha1)
    b = norm(a, gamma1, beta1)
    c = depthwise_dilated(b, w, dilation, causal)
    e = prelu(c, alpha2)
    return norm(e, gamma2, beta2)


@partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def fused_tcn_mid(y, alpha1, gamma1, beta1, w, alpha2, gamma2, beta2,
                  norm_type="gLN", dilation=1, causal=False, interpret=False):
    """Fused PReLU->norm->dwconv->PReLU->norm. y: [M, K, H] -> [M, K, H]."""
    return _mid_pallas(y, alpha1, gamma1, beta1, w, alpha2, gamma2, beta2,
                       norm_type, dilation, causal, interpret)


def _fwd(y, a1, g1, b1, w, a2, g2, b2, norm_type="gLN", dilation=1,
         causal=False, interpret=False):
    out = _mid_pallas(y, a1, g1, b1, w, a2, g2, b2,
                      norm_type, dilation, causal, interpret)
    return out, (y, a1, g1, b1, w, a2, g2, b2)


def _bwd(norm_type, dilation, causal, interpret, res, dz):
    y, a1, g1, b1, w, a2, g2, b2 = res

    def f(y, a1, g1, b1, w, a2, g2, b2):
        return mid_reference(y, a1, g1, b1, w, a2, g2, b2,
                             norm_type, dilation, causal)

    _, vjp = jax.vjp(f, y, a1, g1, b1, w, a2, g2, b2)
    return vjp(dz)


fused_tcn_mid.defvjp(_fwd, _bwd)
