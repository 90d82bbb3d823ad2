"""Parity of the hybrid whole-block path (Pallas forward saving y1/c
residuals, interpret mode on CPU + fused-XLA backward) against jax.grad
of the pure-XLA block."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convtasnet_tpu.config import ConvTasNetConfig
from convtasnet_tpu.models.conv_tasnet import _temporal_block
from convtasnet_tpu.ops.pallas.fused_whole_block import whole_block_pallas
from convtasnet_tpu.ops.pallas.whole_block_hybrid import whole_block_hybrid


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


def _case_inputs(norm_type, causal, K, K_pad, M, B, H, P, seed):
    rng = np.random.default_rng(seed)
    bp = _params(rng, B, H, P)
    x = jnp.asarray(rng.standard_normal((M, K_pad, B)), jnp.float32) * 0.5
    g = jnp.asarray(rng.standard_normal((M, K_pad, B)), jnp.float32)
    if K != K_pad:
        x = x.at[:, K:, :].set(0.0)
        g = g.at[:, K:, :].set(0.0)
    return bp, x, g


def test_forward_saved_residuals_match_recompute():
    """save_residuals=True must return the same out as the plain kernel,
    and y1/c must equal the mid-chain recomputed in plain jnp."""
    from convtasnet_tpu.config import EPS

    bp, x, _ = _case_inputs("gLN", False, 200, 256, 2, 64, 128, 3, seed=7)
    args = tuple(bp[k] for k in ORDER)
    out_ref = whole_block_pallas(x, *args, "gLN", 2, False, True, 200)
    out, y1, c = whole_block_pallas(x, *args, "gLN", 2, False, True, 200,
                                    save_residuals=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_ref))

    y1_ref = jnp.einsum("mkb,bh->mkh", x, bp["in_w"])
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y1_ref),
                               rtol=1e-5, atol=1e-5)
    assert np.all(np.asarray(y1)[:, 200:, :] == 0.0)

    a = jnp.where(y1_ref >= 0, y1_ref, bp["in_prelu"] * y1_ref)
    mask = (jnp.arange(256) < 200)[None, :, None]
    n = 200 * 128
    mu = jnp.sum(jnp.where(mask, a, 0), axis=(1, 2), keepdims=True) / n
    var = jnp.sum(jnp.where(mask, a * a, 0), axis=(1, 2), keepdims=True) / n - mu**2
    b = bp["in_gamma"] * ((a - mu) * jax.lax.rsqrt(var + EPS)) + bp["in_beta"]
    b = jnp.where(mask, b, 0.0)
    span, left = 2 * 2, 2  # (P-1)*d, non-causal
    bpad = jnp.pad(b, ((0, 0), (left, span - left), (0, 0)))
    c_ref = sum(bp["dw_w"][p] * bpad[:, p * 2:p * 2 + 256, :]
                for p in range(3))
    np.testing.assert_allclose(np.asarray(c)[:, :200, :],
                               np.asarray(c_ref)[:, :200, :],
                               rtol=2e-4, atol=2e-4)


def _run_case(norm_type, causal, dilation, K, K_pad, M=2, B=64, H=128, P=3,
              seed=0):
    bp, x, g = _case_inputs(norm_type, causal, K, K_pad, M, B, H, P, seed)

    cfg = ConvTasNetConfig(N=8, L=4, B=B, H=H, P=P, X=1, R=1, C=2,
                           norm_type=norm_type, causal=causal,
                           compute_dtype="float32")

    def xla_loss(args):
        bpd = dict(zip(ORDER, args[1:]))
        xin = args[0][:, :K, :]
        out, _ = _temporal_block(xin, bpd, None, cfg, dilation, True)
        out = jnp.pad(out, ((0, 0), (0, K_pad - K), (0, 0)))
        return jnp.sum(out * g)

    def hybrid_loss(args):
        out = whole_block_hybrid(
            args[0], *args[1:], norm_type, dilation, causal, True,
            K if K != K_pad else None)
        return jnp.sum(out * g)

    args = (x,) + tuple(bp[k] for k in ORDER)
    ref_val, ref_grads = jax.value_and_grad(xla_loss)(args)
    got_val, got_grads = jax.value_and_grad(hybrid_loss)(args)
    np.testing.assert_allclose(float(got_val), float(ref_val), rtol=3e-4)
    names = ("x",) + ORDER
    for name, a, b in zip(names, ref_grads, got_grads):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-5,
            err_msg=f"grad mismatch: {name} ({norm_type}, causal={causal}, "
                    f"d={dilation}, K={K}/{K_pad})")


@pytest.mark.parametrize("norm_type", ["gLN", "cLN"])
@pytest.mark.parametrize("causal", [False, True])
def test_whole_block_hybrid_grads(norm_type, causal):
    _run_case(norm_type, causal, dilation=2, K=256, K_pad=256)


def test_whole_block_hybrid_grads_padded_frames():
    """K=200 padded to 256: stats and grads must ignore pad rows."""
    _run_case("gLN", False, dilation=4, K=200, K_pad=256, seed=3)
    _run_case("cLN", True, dilation=1, K=200, K_pad=256, seed=4)


def test_whole_block_hybrid_large_dilation():
    _run_case("gLN", True, dilation=16, K=384, K_pad=384, seed=5)


def test_whole_model_hybrid_train_parity():
    """Whole-model loss + grads: use_pallas='hybrid' vs pure XLA."""
    from convtasnet_tpu.models.conv_tasnet import ConvTasNet, forward
    from convtasnet_tpu.ops.loss import cal_loss

    cfg_x = ConvTasNetConfig(N=16, L=8, B=64, H=128, P=3, X=2, R=2, C=2,
                             norm_type="gLN", compute_dtype="float32")
    cfg_p = ConvTasNetConfig(N=16, L=8, B=64, H=128, P=3, X=2, R=2, C=2,
                             norm_type="gLN", compute_dtype="float32",
                             use_pallas="hybrid")
    key = jax.random.PRNGKey(0)
    params, state = ConvTasNet(cfg_x).init(key)
    rng = np.random.default_rng(1)
    T = 1024
    mix = jnp.asarray(rng.standard_normal((2, T)), jnp.float32)
    src = jnp.asarray(rng.standard_normal((2, 2, T)), jnp.float32)
    lens = jnp.asarray([T, T - 100], jnp.int32)

    def loss_fn(p, cfg):
        est, _ = forward(p, state, cfg, mix, train=True)
        loss, *_ = cal_loss(src, est, lens)
        return loss

    lx, gx = jax.value_and_grad(lambda p: loss_fn(p, cfg_x))(params)
    lp, gp = jax.value_and_grad(lambda p: loss_fn(p, cfg_p))(params)
    np.testing.assert_allclose(float(lp), float(lx), rtol=2e-4)
    flat_x = jax.tree_util.tree_leaves_with_path(gx)
    flat_p = jax.tree_util.tree_leaves(gp)
    for (path, a), b in zip(flat_x, flat_p):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-4,
            err_msg=f"whole-model grad mismatch at {jax.tree_util.keystr(path)}")
