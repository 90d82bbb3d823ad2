"""Pallas kernel parity tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convtasnet_tpu.ops.pallas.fused_block import fused_tcn_mid, mid_reference


def _mid_inputs(rng, M=2, K=37, H=16, P=3):
    y = rng.standard_normal((M, K, H)).astype(np.float32)
    a1, a2 = np.float32(0.25), np.float32(0.1)
    g1 = rng.standard_normal(H).astype(np.float32)
    b1 = rng.standard_normal(H).astype(np.float32)
    g2 = rng.standard_normal(H).astype(np.float32)
    b2 = rng.standard_normal(H).astype(np.float32)
    w = rng.standard_normal((P, H)).astype(np.float32)
    return tuple(map(jnp.asarray, (y, a1, g1, b1, w, a2, g2, b2)))


@pytest.mark.parametrize("norm_type", ["gLN", "cLN"])
@pytest.mark.parametrize("dilation,causal", [(1, False), (2, False), (4, True), (1, True)])
def test_fused_mid_matches_reference(rng, norm_type, dilation, causal):
    args = _mid_inputs(rng)
    got = fused_tcn_mid(*args, norm_type, dilation, causal, True)
    want = mid_reference(*args, norm_type, dilation, causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_fused_mid_grad_matches_reference(rng):
    args = _mid_inputs(rng, M=1, K=16, H=8)

    def f_k(*a):
        return jnp.sum(jnp.tanh(fused_tcn_mid(*a, "gLN", 2, False, True)))

    def f_r(*a):
        return jnp.sum(jnp.tanh(mid_reference(*a, "gLN", 2, False)))

    gk = jax.grad(f_k, argnums=tuple(range(8)))(*args)
    gr = jax.grad(f_r, argnums=tuple(range(8)))(*args)
    for i, (a_, b_) in enumerate(zip(gk, gr)):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_), rtol=2e-4,
                                   atol=2e-5, err_msg=f"arg {i}")


def test_model_with_pallas_matches_without(rng):
    from convtasnet_tpu.config import ConvTasNetConfig
    from convtasnet_tpu.models.conv_tasnet import forward, init_params

    kw = dict(N=8, L=4, B=8, H=16, P=3, X=3, R=2, C=2, compute_dtype="float32")
    cfg0 = ConvTasNetConfig(**kw)
    cfg1 = ConvTasNetConfig(use_pallas=True, **kw)
    params, state = init_params(jax.random.key(0), cfg0)
    mix = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))
    y0, _ = forward(params, state, cfg0, mix)
    y1, _ = forward(params, state, cfg1, mix)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=2e-4, atol=2e-5)
