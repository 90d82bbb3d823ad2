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
                out_hbm, slabs, bslab, in_sems, out_sems, *,
                norm_type, dilation, causal, P, K, K_pad, H, TK):
    """Per-grid-step body with cross-step double-buffered DMA.

    slabs[2] hold the input y and later (in place, once y is dead after the
    normalize-write) the conv+PReLU output e and the final z — the input
    slab doubles as the output slab, so two slabs pipeline M grid steps.
    Statistics are single-pass f32 sum/sumsq (E[x^2] - m^2; post-PReLU
    activations are near-centered so cancellation is benign).
    """
    m = pl.program_id(0)
    M = pl.num_programs(0)
    slot = m % 2
    span = (P - 1) * dilation
    left = span if causal else span // 2
    n = K * H  # true element count: pad rows are zero and sum to nothing
    # Static tile table — all tiles are full TK and 128-aligned because the
    # frame axis is padded to a TK multiple and pad rows are exact zeros
    # (prelu(0) = 0 contributes nothing to the statistics; the pad rows of
    # the output are re-zeroed before the out-DMA). Static unrolled slices
    # keep Mosaic happy about sublane alignment.
    tiles = [(t0, TK) for t0 in range(0, K_pad, TK)]
    yslab = slabs.at[slot]

    def in_dma(i):
        return pltpu.make_async_copy(y_hbm.at[i], slabs.at[i % 2], in_sems.at[i % 2])

    def out_dma(i):
        return pltpu.make_async_copy(slabs.at[i % 2], out_hbm.at[i], out_sems.at[i % 2])

    # Pipeline: step m waits its input (started by step m-1, or here at m=0),
    # prefetches input m+1 after draining the out-DMA that step m-1 left on
    # that slab, computes in place, then kicks its own out-DMA.
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

    if norm_type == "gLN":
        s = jnp.float32(0.0)
        ss = jnp.float32(0.0)
        for t0, tk in tiles:
            a = a_tile(t0, tk)
            s = s + jnp.sum(a)
            ss = ss + jnp.sum(a * a)
        mean1 = s / n
        inv1 = jax.lax.rsqrt(jnp.maximum(ss / n - mean1 * mean1, 0.0) + EPS)
        for t0, tk in tiles:
            b = g1[None, :] * ((a_tile(t0, tk) - mean1) * inv1) + b1[None, :]
            bslab[span + t0 : span + t0 + tk, :] = b.astype(bslab.dtype)
    else:  # cLN: local per-row stats, single pass
        for t0, tk in tiles:
            b = _row_norm_f32(a_tile(t0, tk), g1, b1)
            bslab[span + t0 : span + t0 + tk, :] = b.astype(bslab.dtype)

    # Zero the halo borders AND the pad-row region (cLN/gLN of a zero row
    # is nonzero garbage there) so conv taps past the true K read zeros.
    if span > 0:
        bslab[0:span, :] = jnp.zeros((span, H), bslab.dtype)
    bslab[span + K :, :] = jnp.zeros(
        (bslab.shape[0] - span - K, H), bslab.dtype
    )

    # Conv + PReLU once per tile; e overwrites the (now dead) y slab.
    # Pad rows bordering K pick up left taps of REAL rows, so the tile
    # straddling K masks them out of the statistics (static predicate).
    if norm_type == "gLN":
        s = jnp.float32(0.0)
        ss = jnp.float32(0.0)
        for t0, tk in tiles:
            e = _prelu(conv_tile(t0, tk), a2)
            if t0 + tk > K:
                rows = jax.lax.broadcasted_iota(jnp.int32, (tk, 1), 0)
                em = jnp.where(rows < K - t0, e, 0.0)
            else:
                em = e
            s = s + jnp.sum(em)
            ss = ss + jnp.sum(em * em)
            yslab[t0 : t0 + tk, :] = e.astype(yslab.dtype)
        mean2 = s / n
        inv2 = jax.lax.rsqrt(jnp.maximum(ss / n - mean2 * mean2, 0.0) + EPS)
        for t0, tk in tiles:
            e = yslab[t0 : t0 + tk, :].astype(jnp.float32)
            z = g2[None, :] * ((e - mean2) * inv2) + b2[None, :]
            yslab[t0 : t0 + tk, :] = z.astype(yslab.dtype)
    else:
        for t0, tk in tiles:
            z = _row_norm_f32(_prelu(conv_tile(t0, tk), a2), g2, b2)
            yslab[t0 : t0 + tk, :] = z.astype(yslab.dtype)

    # Zero the alignment pad rows so downstream consumers (and their
    # gradients) see exact zeros rather than stale VMEM bits.
    if K_pad > K:
        yslab[K:K_pad, :] = jnp.zeros((K_pad - K, H), yslab.dtype)

    out_dma(m).start()

    @pl.when(m == M - 1)
    def _():
        out_dma(m).wait()

    @pl.when((m == M - 1) & (M >= 2))
    def _():
        out_dma(m - 1).wait()


def _mid_pallas(y, alpha1, gamma1, beta1, w, alpha2, gamma2, beta2,
                norm_type, dilation, causal, interpret, valid_k=None):
    M, K_in, H = y.shape
    P = w.shape[0]
    span = (P - 1) * dilation
    # DMA slices must be sublane-aligned: the frame axis is padded to 32
    # rows. With valid_k the caller passes an already-padded array (pad
    # hoisted out of the per-block loop); otherwise we pad/slice here. The
    # kernel's static tile table only touches the true K rows (gLN
    # statistics stay exact) and zero-fills the pad rows on output.
    if valid_k is not None:
        K = valid_k
        K_pad = K_in
        assert K_pad % 128 == 0 or K_pad == K, (K, K_pad)
    else:
        K = K_in
        K_pad = -(-K // 128) * 128
        if K_pad != K:
            y = jnp.pad(y, ((0, 0), (0, K_pad - K), (0, 0)))
    TK = min(128, K_pad)
    kernel = partial(_mid_kernel, norm_type=norm_type, dilation=dilation,
                     causal=causal, P=P, K=K, K_pad=K_pad, H=H, TK=TK)
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
            pltpu.VMEM((2, K_pad, H), y.dtype),      # double-buffered y/e/z slabs
            pltpu.VMEM((K_pad + 2 * span, H), y.dtype),  # bordered conv slab
            pltpu.SemaphoreType.DMA((2,)),           # in-DMA sems
            pltpu.SemaphoreType.DMA((2,)),           # out-DMA sems
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=20 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        y,
        jnp.asarray(alpha1, jnp.float32).reshape(1),
        gamma1, beta1, w,
        jnp.asarray(alpha2, jnp.float32).reshape(1),
        gamma2, beta2,
    )
    if valid_k is not None:
        return out  # stays padded; caller slices once at the end
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


@partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def fused_tcn_mid(y, alpha1, gamma1, beta1, w, alpha2, gamma2, beta2,
                  norm_type="gLN", dilation=1, causal=False, interpret=False,
                  valid_k=None):
    """Fused PReLU->norm->dwconv->PReLU->norm. y: [M, K, H] -> [M, K, H].

    With valid_k set, y is [M, K_pad, H] (K_pad % 32 == 0) and only the
    first valid_k frames are real; pad rows are zero in and out."""
    return _mid_pallas(y, alpha1, gamma1, beta1, w, alpha2, gamma2, beta2,
                       norm_type, dilation, causal, interpret, valid_k)


def _fwd(y, a1, g1, b1, w, a2, g2, b2, norm_type="gLN", dilation=1,
         causal=False, interpret=False, valid_k=None):
    out = _mid_pallas(y, a1, g1, b1, w, a2, g2, b2,
                      norm_type, dilation, causal, interpret, valid_k)
    return out, (y, a1, g1, b1, w, a2, g2, b2)


def _bwd(norm_type, dilation, causal, interpret, valid_k, res, dz):
    y, a1, g1, b1, w, a2, g2, b2 = res
    from .fused_block_bwd import mid_bwd_pallas

    dy, da1, dg1, db1, dw, da2, dg2, db2 = mid_bwd_pallas(
        y, dz, a1, g1, b1, w, a2, g2, b2,
        norm_type, dilation, causal, interpret, valid_k,
    )
    return (
        dy,
        da1.astype(jnp.asarray(a1).dtype).reshape(jnp.shape(a1)),
        dg1.astype(g1.dtype), db1.astype(b1.dtype),
        dw.astype(w.dtype),
        da2.astype(jnp.asarray(a2).dtype).reshape(jnp.shape(a2)),
        dg2.astype(g2.dtype), db2.astype(b2.dtype),
    )


fused_tcn_mid.defvjp(_fwd, _bwd)
