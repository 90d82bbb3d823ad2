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
        x, _ = _temporal_block(x, blk, None, cfg, 2 ** (nb % X), False,
                               None, None)
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
