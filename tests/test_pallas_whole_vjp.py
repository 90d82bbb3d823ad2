"""Gradient parity of the whole-block custom VJP (Pallas backward kernel,
interpret mode on CPU) against jax.grad of the pure-XLA block."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convtasnet_tpu.config import ConvTasNetConfig
from convtasnet_tpu.models.conv_tasnet import _temporal_block
from convtasnet_tpu.ops.pallas.whole_block_vjp import whole_block_train


def _params(rng, B, H, P):
    return dict(
        in_w=jnp.asarray(rng.standard_normal((B, H)), jnp.float32) * 0.3,
        in_prelu=jnp.float32(0.25),
        in_gamma=jnp.asarray(rng.standard_normal(H), jnp.float32) * 0.2 + 1.0,
        in_beta=jnp.asarray(rng.standard_normal(H), jnp.float32) * 0.1,
        dw_w=jnp.asarray(rng.standard_normal((P, H)), jnp.float32) * 0.3,
        dw_prelu=jnp.float32(-0.1),  # negative slope: sign(prelu) != sign(x)
        dw_gamma=jnp.asarray(rng.standard_normal(H), jnp.float32) * 0.2 + 1.0,
        dw_beta=jnp.asarray(rng.standard_normal(H), jnp.float32) * 0.1,
        out_w=jnp.asarray(rng.standard_normal((H, B)), jnp.float32) * 0.3,
    )


ORDER = ("in_w", "in_prelu", "in_gamma", "in_beta", "dw_w", "dw_prelu",
         "dw_gamma", "dw_beta", "out_w")


def _run_case(norm_type, causal, dilation, K, K_pad, M=2, B=64, H=128, P=3,
              seed=0):
    rng = np.random.default_rng(seed)
    bp = _params(rng, B, H, P)
    x = jnp.asarray(rng.standard_normal((M, K_pad, B)), jnp.float32) * 0.5
    if K != K_pad:
        x = x.at[:, K:, :].set(0.0)
    g = jnp.asarray(rng.standard_normal((M, K_pad, B)), jnp.float32)
    if K != K_pad:
        g = g.at[:, K:, :].set(0.0)

    cfg = ConvTasNetConfig(N=8, L=4, B=B, H=H, P=P, X=1, R=1, C=2,
                           norm_type=norm_type, causal=causal,
                           compute_dtype="float32")

    def xla_loss(args):
        bpd = dict(zip(ORDER, args[1:]))
        # Reproduce the separator's pad discipline: stats over the first K
        # frames only, pad rows zeroed — via the fused_valid_k-free path on
        # the UNPADDED slab, then re-pad (the kernel's contract).
        xin = args[0][:, :K, :]
        out, _ = _temporal_block(xin, bpd, None, cfg, dilation, True)
        out = jnp.pad(out, ((0, 0), (0, K_pad - K), (0, 0)))
        return jnp.sum(out * g)

    def pallas_loss(args):
        out = whole_block_train(
            args[0], *args[1:], norm_type, dilation, causal, True,
            K if K != K_pad else None)
        return jnp.sum(out * g)

    args = (x,) + tuple(bp[k] for k in ORDER)
    ref_val, ref_grads = jax.value_and_grad(xla_loss)(args)
    got_val, got_grads = jax.value_and_grad(pallas_loss)(args)
    # Forward-value tolerance: the kernel computes variance as ss/n - mu^2
    # (single pass) vs XLA's two-pass mean((a-mean)^2) — a reduction-order
    # difference bounded well below bf16 resolution; the forward kernel has
    # its own parity suite (test_pallas_whole.py).
    np.testing.assert_allclose(float(got_val), float(ref_val), rtol=3e-4)
    names = ("x",) + ORDER
    for name, a, b in zip(names, ref_grads, got_grads):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-5,
            err_msg=f"grad mismatch: {name} ({norm_type}, causal={causal}, "
                    f"d={dilation}, K={K}/{K_pad})")


@pytest.mark.parametrize("norm_type", ["gLN", "cLN"])
@pytest.mark.parametrize("causal", [False, True])
def test_whole_block_vjp_grads(norm_type, causal):
    _run_case(norm_type, causal, dilation=2, K=256, K_pad=256)


def test_whole_block_vjp_grads_padded_frames():
    """K=200 padded to 256: stats and grads must ignore pad rows."""
    _run_case("gLN", False, dilation=4, K=200, K_pad=256, seed=3)
    _run_case("cLN", True, dilation=1, K=200, K_pad=256, seed=4)


def test_whole_block_vjp_large_dilation():
    _run_case("gLN", True, dilation=16, K=384, K_pad=384, seed=5)
