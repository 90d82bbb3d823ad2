"""Whole-block Pallas kernel parity (ops/pallas/fused_whole_block.py).

The kernel runs the complete temporal block — 1x1 matmul, PReLU, norm,
dilated depthwise conv, PReLU, norm, 1x1 matmul, residual — in one
pallas_call. Interpret mode on CPU checks it against the XLA block path
(models/conv_tasnet._temporal_block) across norm types, causality,
dilations, and non-128-aligned frame counts; a model-level test checks
the use_pallas="whole" forward against use_pallas=False.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convtasnet_tpu.config import ConvTasNetConfig
from convtasnet_tpu.models.conv_tasnet import (ConvTasNet, _temporal_block,
                                               forward, init_params)
from convtasnet_tpu.ops.pallas.fused_whole_block import whole_block_pallas

TINY = dict(N=16, L=8, B=128, H=256, P=3, X=2, R=1, C=2,
            compute_dtype="float32")


def _block_params(rng, B, H, P):
    return {
        "in_w": jnp.asarray(rng.normal(size=(B, H)).astype(np.float32) * 0.05),
        "in_prelu": jnp.float32(0.25),
        "in_gamma": jnp.asarray(rng.normal(size=H).astype(np.float32) * 0.1 + 1),
        "in_beta": jnp.asarray(rng.normal(size=H).astype(np.float32) * 0.1),
        "dw_w": jnp.asarray(rng.normal(size=(P, H)).astype(np.float32) * 0.2),
        "dw_prelu": jnp.float32(0.25),
        "dw_gamma": jnp.asarray(rng.normal(size=H).astype(np.float32) * 0.1 + 1),
        "dw_beta": jnp.asarray(rng.normal(size=H).astype(np.float32) * 0.1),
        "out_w": jnp.asarray(rng.normal(size=(H, B)).astype(np.float32) * 0.05),
    }


@pytest.mark.parametrize("norm_type,causal,dilation,K", [
    ("gLN", False, 1, 128),
    ("gLN", False, 4, 200),     # unaligned K exercises pad-row handling
    ("gLN", True, 2, 256),
    ("cLN", False, 1, 128),
    ("cLN", True, 8, 300),
])
def test_whole_block_matches_xla_block(norm_type, causal, dilation, K):
    rng = np.random.default_rng(0)
    B, H, P = 128, 256, 3
    bp = _block_params(rng, B, H, P)
    x = jnp.asarray(rng.normal(size=(2, K, B)).astype(np.float32) * 0.3)

    cfg = ConvTasNetConfig(N=16, L=8, B=B, H=H, P=P, X=4, R=1, C=2,
                           norm_type=norm_type, causal=causal,
                           compute_dtype="float32", use_pallas=False)
    want, _ = _temporal_block(x, bp, None, cfg, dilation, False)
    got = whole_block_pallas(
        x, bp["in_w"], bp["in_prelu"], bp["in_gamma"], bp["in_beta"],
        bp["dw_w"], bp["dw_prelu"], bp["dw_gamma"], bp["dw_beta"],
        bp["out_w"], norm_type, dilation, causal, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_whole_block_prepadded_valid_k():
    """The hoisted-pad path: input padded to 128 rows, valid_k marks the
    true frames; output pad rows must be exact zeros."""
    rng = np.random.default_rng(1)
    B, H, P, K = 128, 256, 3, 100
    bp = _block_params(rng, B, H, P)
    x = jnp.asarray(rng.normal(size=(1, K, B)).astype(np.float32) * 0.3)
    xp = jnp.pad(x, ((0, 0), (0, 128 - K), (0, 0)))
    got = whole_block_pallas(
        xp, bp["in_w"], bp["in_prelu"], bp["in_gamma"], bp["in_beta"],
        bp["dw_w"], bp["dw_prelu"], bp["dw_gamma"], bp["dw_beta"],
        bp["out_w"], "gLN", 2, False, interpret=True, valid_k=K,
    )
    want = whole_block_pallas(
        x, bp["in_w"], bp["in_prelu"], bp["in_gamma"], bp["in_beta"],
        bp["dw_w"], bp["dw_prelu"], bp["dw_gamma"], bp["dw_beta"],
        bp["out_w"], "gLN", 2, False, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got[:, :K]), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
    assert np.all(np.asarray(got[:, K:]) == 0.0)


@pytest.mark.parametrize("norm_type,causal", [("gLN", False), ("cLN", True)])
def test_model_forward_whole_matches_xla(norm_type, causal):
    cfg_ref = ConvTasNetConfig(norm_type=norm_type, causal=causal,
                               use_pallas=False, **TINY)
    cfg_whole = ConvTasNetConfig(norm_type=norm_type, causal=causal,
                                 use_pallas="whole", **TINY)
    params, state = init_params(jax.random.key(3), cfg_ref)
    rng = np.random.default_rng(3)
    mix = jnp.asarray(rng.normal(size=(2, 1600)).astype(np.float32))
    want, _ = forward(params, state, cfg_ref, mix, train=False)
    got, _ = forward(params, state, cfg_whole, mix, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-5)


def test_whole_mode_training_matches_xla():
    """use_pallas='whole' training runs the custom-VJP kernel
    (ops/pallas/whole_block_vjp.py): whole-model loss and every parameter
    gradient must match the XLA path."""
    from convtasnet_tpu.ops.loss import cal_loss

    cfg_ref = ConvTasNetConfig(use_pallas=False, **TINY)
    cfg_whole = ConvTasNetConfig(use_pallas="whole", **TINY)
    params, state = init_params(jax.random.key(4), cfg_ref)
    rng = np.random.default_rng(4)
    mix = jnp.asarray(rng.normal(size=(2, 1600)).astype(np.float32))
    src = jnp.stack([mix * 0.6, mix * 0.4], axis=1)
    lens = jnp.full(2, 1600, jnp.int32)

    def loss_fn(p, cfg):
        est, _ = forward(p, state, cfg, mix, train=True)
        return cal_loss(src, est, lens)[0]

    want_l, want_g = jax.value_and_grad(loss_fn)(params, cfg_ref)
    got_l, got_g = jax.value_and_grad(loss_fn)(params, cfg_whole)
    np.testing.assert_allclose(float(got_l), float(want_l), rtol=1e-4)
    flat_w, _ = jax.tree_util.tree_flatten_with_path(want_g)
    flat_g = jax.tree_util.tree_leaves(got_g)
    for (path, a), b in zip(flat_w, flat_g):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=1e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")
