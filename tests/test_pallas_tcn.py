"""Whole-TCN mega-kernel parity (ops/pallas/whole_tcn.py).

One pallas_call runs ALL R*X temporal blocks with the residual stream
resident in VMEM. Interpret mode on CPU checks it against the XLA
per-block path across norm types, causality, and non-128-aligned frame
counts, plus the model-level dispatch and its VMEM fallback.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convtasnet_tpu.config import ConvTasNetConfig
from convtasnet_tpu.models.conv_tasnet import (ConvTasNet, _temporal_block,
                                               forward, init_params)
from convtasnet_tpu.ops.pallas.whole_tcn import whole_tcn_pallas

TINY = dict(N=16, L=8, B=128, H=256, P=3, X=2, R=2, C=2,
            compute_dtype="float32")


def _stacked_blocks(rng, NB, B, H, P):
    return {
        "in_w": jnp.asarray(rng.normal(size=(NB, B, H)).astype(np.float32) * 0.05),
        "in_prelu": jnp.full((NB,), 0.25, jnp.float32),
        "in_gamma": jnp.asarray(rng.normal(size=(NB, H)).astype(np.float32) * 0.1 + 1),
        "in_beta": jnp.asarray(rng.normal(size=(NB, H)).astype(np.float32) * 0.1),
        "dw_w": jnp.asarray(rng.normal(size=(NB, P, H)).astype(np.float32) * 0.2),
        "dw_prelu": jnp.full((NB,), 0.25, jnp.float32),
        "dw_gamma": jnp.asarray(rng.normal(size=(NB, H)).astype(np.float32) * 0.1 + 1),
        "dw_beta": jnp.asarray(rng.normal(size=(NB, H)).astype(np.float32) * 0.1),
        "out_w": jnp.asarray(rng.normal(size=(NB, H, B)).astype(np.float32) * 0.05),
    }


def _xla_blocks(x, bp, norm_type, causal, X, cfg):
    NB = bp["in_w"].shape[0]
    for nb in range(NB):
        blk = {k: v[nb] for k, v in bp.items()}
        x, _ = _temporal_block(x, blk, None, cfg, 2 ** (nb % X), False)
    return x


@pytest.mark.parametrize("norm_type,causal,K", [
    ("gLN", False, 128),
    ("gLN", False, 200),     # unaligned K exercises pad-row handling
    ("gLN", True, 256),
    ("cLN", False, 128),
    ("cLN", True, 300),
])
def test_whole_tcn_matches_xla_chain(norm_type, causal, K):
    rng = np.random.default_rng(0)
    B, H, P, X, R = 128, 256, 3, 2, 2
    bp = _stacked_blocks(rng, R * X, B, H, P)
    x = jnp.asarray(rng.normal(size=(2, K, B)).astype(np.float32) * 0.3)

    cfg = ConvTasNetConfig(N=16, L=8, B=B, H=H, P=P, X=X, R=R, C=2,
                           norm_type=norm_type, causal=causal,
                           compute_dtype="float32", use_pallas=False)
    want = _xla_blocks(x, bp, norm_type, causal, X, cfg)
    got = whole_tcn_pallas(
        x, bp["in_w"], bp["in_prelu"], bp["in_gamma"], bp["in_beta"],
        bp["dw_w"], bp["dw_prelu"], bp["dw_gamma"], bp["dw_beta"],
        bp["out_w"], norm_type, causal, X, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-5)


def test_whole_tcn_prepadded_valid_k():
    """Pre-padded input with valid_k: output pad rows exact zeros and the
    valid region matches the unpadded call."""
    rng = np.random.default_rng(1)
    B, H, P, X = 128, 256, 3, 2
    bp = _stacked_blocks(rng, 4, B, H, P)
    K = 100
    x = jnp.asarray(rng.normal(size=(1, K, B)).astype(np.float32) * 0.3)
    xp = jnp.pad(x, ((0, 0), (0, 128 - K), (0, 0)))
    got = whole_tcn_pallas(
        xp, bp["in_w"], bp["in_prelu"], bp["in_gamma"], bp["in_beta"],
        bp["dw_w"], bp["dw_prelu"], bp["dw_gamma"], bp["dw_beta"],
        bp["out_w"], "gLN", False, X, interpret=True, valid_k=K,
    )
    want = whole_tcn_pallas(
        x, bp["in_w"], bp["in_prelu"], bp["in_gamma"], bp["in_beta"],
        bp["dw_w"], bp["dw_prelu"], bp["dw_gamma"], bp["dw_beta"],
        bp["out_w"], "gLN", False, X, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got[:, :K]), np.asarray(want),
                               rtol=5e-4, atol=5e-5)
    assert np.all(np.asarray(got[:, K:]) == 0.0)


@pytest.mark.parametrize("norm_type,causal", [("gLN", False), ("cLN", True)])
def test_model_forward_tcn_matches_xla(norm_type, causal):
    """use_pallas='whole' inference dispatches to the mega-kernel at this
    config (VMEM check passes) and must match the XLA forward."""
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


def test_model_falls_back_when_vmem_exceeded(monkeypatch):
    """If the mega-kernel footprint doesn't fit, inference silently uses
    the per-block whole-block kernel — same numbers."""
    import convtasnet_tpu.ops.pallas.whole_tcn as wt

    cfg_ref = ConvTasNetConfig(use_pallas=False, **TINY)
    cfg_whole = ConvTasNetConfig(use_pallas="whole", **TINY)
    params, state = init_params(jax.random.key(5), cfg_ref)
    rng = np.random.default_rng(5)
    mix = jnp.asarray(rng.normal(size=(1, 1600)).astype(np.float32))
    want, _ = forward(params, state, cfg_ref, mix, train=False)
    monkeypatch.setattr(wt, "tcn_vmem_need", lambda *a: 1 << 40)
    got, _ = forward(params, state, cfg_whole, mix, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-5)


# ---------------------------------------------------------------------------
# Mega-hybrid training path (ops/pallas/whole_tcn_hybrid.py): the
# residual-saving forward + whole-chain backward mega-kernel pair.
# ---------------------------------------------------------------------------

def test_whole_tcn_save_residuals_match_forward():
    """save_residuals=True returns the same output plus per-block input /
    conv-output slabs that match an XLA replay."""
    import jax

    from convtasnet_tpu.ops.conv import depthwise_dilated
    from convtasnet_tpu.ops.norms import apply_norm
    from convtasnet_tpu.models.conv_tasnet import prelu, pointwise

    rng = np.random.default_rng(2)
    B, H, P, X, R = 128, 256, 3, 2, 2
    NB = R * X
    bp = _stacked_blocks(rng, NB, B, H, P)
    x = jnp.asarray(rng.normal(size=(2, 128, B)).astype(np.float32) * 0.3)

    from convtasnet_tpu.ops.pallas.whole_tcn import whole_tcn_pallas

    # fold_norm2=False: the save path keeps the reference op order, so
    # the bit-exact comparison is against the unfolded forward (the
    # folded-vs-unfolded tolerance is test_whole_tcn_fold_matches_unfolded).
    want = whole_tcn_pallas(
        x, bp["in_w"], bp["in_prelu"], bp["in_gamma"], bp["in_beta"],
        bp["dw_w"], bp["dw_prelu"], bp["dw_gamma"], bp["dw_beta"],
        bp["out_w"], "gLN", False, X, interpret=True, fold_norm2=False)
    got, x_res, c_res = whole_tcn_pallas(
        x, bp["in_w"], bp["in_prelu"], bp["in_gamma"], bp["in_beta"],
        bp["dw_w"], bp["dw_prelu"], bp["dw_gamma"], bp["dw_beta"],
        bp["out_w"], "gLN", False, X, interpret=True, save_residuals=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-7)
    assert x_res.shape == (2, NB, 128, B)
    assert c_res.shape == (2, NB, 128, H)
    # Block 0's saved input is the TCN input itself.
    np.testing.assert_allclose(np.asarray(x_res[:, 0]), np.asarray(x),
                               rtol=1e-6, atol=1e-7)
    # Replay chain 1 of block 0 in XLA and check the saved conv output.
    dt = x.dtype
    y = pointwise(x, bp["in_w"][0], dt).astype(dt)
    y = prelu(y, bp["in_prelu"][0])
    y, _ = apply_norm("gLN", y, {"gamma": bp["in_gamma"][0],
                                 "beta": bp["in_beta"][0]}, None, False)
    c_want = depthwise_dilated(y.astype(dt), bp["dw_w"][0], 1, False, None)
    np.testing.assert_allclose(np.asarray(c_res[:, 0]), np.asarray(c_want),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("norm_type,causal,K", [
    ("gLN", False, 128),
    ("gLN", True, 200),     # unaligned K exercises pad-row masking
    ("cLN", False, 300),
])
def test_whole_tcn_train_grads_match_xla(norm_type, causal, K):
    """Whole-chain gradient parity: loss + every weight/input grad of the
    mega-hybrid custom VJP vs jax.grad of the XLA block chain."""
    from convtasnet_tpu.ops.pallas.whole_tcn_hybrid import whole_tcn_train

    rng = np.random.default_rng(7)
    B, H, P, X, R = 128, 256, 3, 2, 2
    NB = R * X
    bp = _stacked_blocks(rng, NB, B, H, P)
    x = jnp.asarray(rng.normal(size=(2, K, B)).astype(np.float32) * 0.3)
    K_pad = -(-K // 128) * 128
    xp = jnp.pad(x, ((0, 0), (0, K_pad - K), (0, 0)))
    cfg = ConvTasNetConfig(N=16, L=8, B=B, H=H, P=P, X=X, R=R, C=2,
                           norm_type=norm_type, causal=causal,
                           compute_dtype="float32", use_pallas=False)
    tgt = jnp.asarray(rng.normal(size=(2, K_pad, B)).astype(np.float32))

    order = ["in_w", "in_prelu", "in_gamma", "in_beta", "dw_w",
             "dw_prelu", "dw_gamma", "dw_beta", "out_w"]

    def loss_kernel(xp, bp):
        out = whole_tcn_train(
            xp, *[bp[k] for k in order], norm_type, causal, X, True,
            K if K != K_pad else None)
        # Kernel output pad rows are exact zeros -> sin(0)*tgt = 0, so
        # the loss equals the unpadded XLA chain's.
        return jnp.sum(jnp.sin(out) * tgt)

    def loss_xla(x, bp):
        # The oracle runs on the UNPADDED input: no pad rows exist, so
        # its gLN statistics match the kernel's masked statistics.
        out = _xla_blocks(x, bp, norm_type, causal, X, cfg)
        return jnp.sum(jnp.sin(out) * tgt[:, :K])

    lk, gk = jax.value_and_grad(loss_kernel, argnums=(0, 1))(xp, bp)
    lx, gx = jax.value_and_grad(loss_xla, argnums=(0, 1))(x, bp)
    np.testing.assert_allclose(float(lk), float(lx), rtol=1e-5)
    # Input gradient (valid rows; the kernel masks pad rows to zero).
    np.testing.assert_allclose(np.asarray(gk[0][:, :K]),
                               np.asarray(gx[0]),
                               rtol=2e-3, atol=2e-5)
    assert np.all(np.asarray(gk[0][:, K:]) == 0.0)
    for k in order:
        # atol 5e-4 (grads are O(10-60)): the kernel accumulates weight
        # grads in a different (per-block, per-item) f32 order than
        # XLA's fused reductions.
        np.testing.assert_allclose(
            np.asarray(gk[1][k]), np.asarray(gx[1][k]),
            rtol=2e-3, atol=5e-4, err_msg=f"grad mismatch at {k}")


def test_whole_tcn_train_grads_odd_batch(monkeypatch):
    """J=2 backward pairing with an ODD batch: the zero-padded third
    item must contribute exactly zero to every weight gradient and its
    dx row must be sliced off. (J=2 measured slower than J=1 on v5e and
    defaults off — forced here via CONVTASNET_BWD_J to keep the pairing
    path correct for experiments.)"""
    monkeypatch.setenv("CONVTASNET_BWD_J", "2")
    from convtasnet_tpu.ops.pallas.whole_tcn_hybrid import whole_tcn_train

    rng = np.random.default_rng(9)
    B, H, P, X, R, K = 128, 256, 3, 2, 1, 256
    NB = R * X
    bp = _stacked_blocks(rng, NB, B, H, P)
    x = jnp.asarray(rng.normal(size=(3, K, B)).astype(np.float32) * 0.3)
    tgt = jnp.asarray(rng.normal(size=(3, K, B)).astype(np.float32))
    cfg = ConvTasNetConfig(N=16, L=8, B=B, H=H, P=P, X=X, R=R, C=2,
                           norm_type="gLN", causal=False,
                           compute_dtype="float32", use_pallas=False)
    order = ["in_w", "in_prelu", "in_gamma", "in_beta", "dw_w",
             "dw_prelu", "dw_gamma", "dw_beta", "out_w"]

    def loss_kernel(x, bp):
        out = whole_tcn_train(x, *[bp[k] for k in order], "gLN", False,
                              X, True, None)
        return jnp.sum(jnp.sin(out) * tgt)

    def loss_xla(x, bp):
        out = _xla_blocks(x, bp, "gLN", False, X, cfg)
        return jnp.sum(jnp.sin(out) * tgt)

    lk, gk = jax.value_and_grad(loss_kernel, argnums=(0, 1))(x, bp)
    lx, gx = jax.value_and_grad(loss_xla, argnums=(0, 1))(x, bp)
    np.testing.assert_allclose(float(lk), float(lx), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gx[0]),
                               rtol=2e-3, atol=2e-5)
    for k in order:
        np.testing.assert_allclose(
            np.asarray(gk[1][k]), np.asarray(gx[1][k]),
            rtol=2e-3, atol=5e-4, err_msg=f"grad mismatch at {k}")


def test_model_hybrid_training_uses_mega_and_matches_xla():
    """use_pallas='hybrid' training at a config where the mega pair fits:
    whole-model loss and every parameter gradient match the XLA path."""
    from convtasnet_tpu.ops.loss import cal_loss

    cfg_ref = ConvTasNetConfig(use_pallas=False, **TINY)
    cfg_h = ConvTasNetConfig(use_pallas="hybrid", **TINY)
    params, state = init_params(jax.random.key(4), cfg_ref)
    rng = np.random.default_rng(4)
    mix = jnp.asarray(rng.normal(size=(2, 1600)).astype(np.float32))
    src = jnp.stack([mix * 0.6, mix * 0.4], axis=1)
    lens = jnp.full(2, 1600, jnp.int32)

    def loss_fn(p, cfg):
        est, _ = forward(p, state, cfg, mix, train=True)
        return cal_loss(src, est, lens)[0]

    want_l, want_g = jax.value_and_grad(loss_fn)(params, cfg_ref)
    got_l, got_g = jax.value_and_grad(loss_fn)(params, cfg_h)
    np.testing.assert_allclose(float(got_l), float(want_l), rtol=1e-4)
    flat_w, _ = jax.tree_util.tree_flatten_with_path(want_g)
    flat_g = jax.tree_util.tree_leaves(got_g)
    for (path, a), b in zip(flat_w, flat_g):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=1e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


@pytest.mark.parametrize("norm_type,causal,K", [
    ("gLN", False, 200),
    ("cLN", True, 300),
])
def test_whole_tcn_fold_matches_unfolded(norm_type, causal, K):
    """The round-5 norm2->matmul fold (z @ W rewritten as
    inv*(e @ (g2 (.) W)) - inv*mean*(g2 @ W) + b2 @ W) must match the
    unfolded kernel to f32 rounding — same math, different association."""
    rng = np.random.default_rng(3)
    B, H, P, X, R = 128, 256, 3, 2, 2
    bp = _stacked_blocks(rng, R * X, B, H, P)
    x = jnp.asarray(rng.normal(size=(2, K, B)).astype(np.float32) * 0.3)
    args = (x, bp["in_w"], bp["in_prelu"], bp["in_gamma"], bp["in_beta"],
            bp["dw_w"], bp["dw_prelu"], bp["dw_gamma"], bp["dw_beta"],
            bp["out_w"], norm_type, causal, X)
    want = whole_tcn_pallas(*args, interpret=True, fold_norm2=False)
    got = whole_tcn_pallas(*args, interpret=True, fold_norm2=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-5)


def test_whole_vjp_dispatch_bounds_scaled_config():
    """Round-5 hardware finding: the whole-block VJP kernel compiles at
    44 MB accounted VMEM (K=2048, H=1024) but F-checks the TPU compile
    helper at 67 MB (K=4096, H=1024) — Mosaic's scoped temporaries
    roughly double the accounted slabs. The dispatch bound (48 MiB) must
    admit the measured-good point and reject the measured-crash point so
    scaled configs fall back to XLA instead of crashing the compiler."""
    import jax.numpy as jnp

    from convtasnet_tpu.models.conv_tasnet import _use_fused_whole

    cfg = ConvTasNetConfig(N=256, L=32, B=256, H=1024, P=3, X=10, R=6,
                           C=2, use_pallas="whole",
                           compute_dtype="bfloat16")
    ok = jnp.zeros((1, 2048, 256), jnp.bfloat16)
    crash = jnp.zeros((1, 3999, 256), jnp.bfloat16)  # 4 s @ 16 kHz
    assert _use_fused_whole(cfg, None, ok, train=True)
    assert not _use_fused_whole(cfg, None, crash, train=True)
    # The paper config stays comfortably inside the bound.
    paper = ConvTasNetConfig(use_pallas="whole", compute_dtype="bfloat16")
    x = jnp.zeros((1, 3199, 256), jnp.bfloat16)  # 4 s @ 8 kHz
    assert _use_fused_whole(paper, None, x, train=True)
