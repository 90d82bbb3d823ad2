"""Context-parallel (frame-axis sharded) forward parity tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from convtasnet_tpu.config import ConvTasNetConfig
from convtasnet_tpu.models.conv_tasnet import forward, init_params
from convtasnet_tpu.parallel.context import cp_forward

TINY = dict(N=8, L=4, B=8, H=16, P=3, X=3, R=2, C=2, compute_dtype="float32")


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("context",))


def _input_for_k(cfg, K):
    # T such that num_frames(T) == K: T = (K-1)*S + L
    T = (K - 1) * cfg.stride + cfg.L
    rng = np.random.default_rng(5)
    return jnp.asarray(rng.standard_normal((2, T)).astype(np.float32))


@pytest.mark.parametrize("norm_type,causal", [("gLN", False), ("cLN", True), ("cLN", False)])
def test_cp_matches_single_device(norm_type, causal):
    cfg = ConvTasNetConfig(norm_type=norm_type, causal=causal, **TINY)
    params, state = init_params(jax.random.key(0), cfg)
    mix = _input_for_k(cfg, K=64)  # 64 frames over 4 shards
    ref, _ = forward(params, state, cfg, mix)
    got = cp_forward(params, state, cfg, mix, _mesh(4))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=5e-4, atol=1e-5)


def test_cp_eight_shards():
    cfg = ConvTasNetConfig(**TINY)
    params, state = init_params(jax.random.key(1), cfg)
    mix = _input_for_k(cfg, K=128)
    ref, _ = forward(params, state, cfg, mix)
    got = cp_forward(params, state, cfg, mix, _mesh(8))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=5e-4, atol=1e-5)


def test_cp_rejects_indivisible_k():
    cfg = ConvTasNetConfig(**TINY)
    params, state = init_params(jax.random.key(2), cfg)
    mix = _input_for_k(cfg, K=63)
    with pytest.raises(ValueError, match="K % n_shards"):
        cp_forward(params, state, cfg, mix, _mesh(4))


def test_cp_rejects_small_shards():
    cfg = ConvTasNetConfig(**{**TINY, "X": 5})  # span = 2*16 = 32 frames
    params, state = init_params(jax.random.key(3), cfg)
    mix = _input_for_k(cfg, K=64)  # 8 frames/shard < 32 halo
    with pytest.raises(ValueError, match="halo span"):
        cp_forward(params, state, cfg, mix, _mesh(8))
