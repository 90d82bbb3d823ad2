"""Fused backward kernel parity vs jax.vjp of the reference chain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convtasnet_tpu.ops.pallas.fused_block import fused_tcn_mid, mid_reference


def _inputs(rng, M=2, K=37, H=16, P=3):
    y = rng.standard_normal((M, K, H)).astype(np.float32)
    a1 = np.float32(0.25)
    a2 = np.float32(-0.15)  # negative slope exercises the sign recovery
    g1 = rng.standard_normal(H).astype(np.float32)
    b1 = rng.standard_normal(H).astype(np.float32)
    g2 = rng.standard_normal(H).astype(np.float32)
    b2 = rng.standard_normal(H).astype(np.float32)
    w = rng.standard_normal((P, H)).astype(np.float32)
    return tuple(map(jnp.asarray, (y, a1, g1, b1, w, a2, g2, b2)))


@pytest.mark.parametrize("norm_type", ["gLN", "cLN"])
@pytest.mark.parametrize("dilation,causal", [(1, False), (2, False), (4, True)])
def test_bwd_kernel_matches_autodiff(rng, norm_type, dilation, causal):
    args = _inputs(rng)
    dz = jnp.asarray(rng.standard_normal((2, 37, 16)).astype(np.float32))

    def f_k(*a):
        return jnp.sum(fused_tcn_mid(*a, norm_type, dilation, causal, True) * dz)

    def f_r(*a):
        return jnp.sum(mid_reference(*a, norm_type, dilation, causal) * dz)

    gk = jax.grad(f_k, argnums=tuple(range(8)))(*args)
    gr = jax.grad(f_r, argnums=tuple(range(8)))(*args)
    names = ["dy", "da1", "dg1", "db1", "dw", "da2", "dg2", "db2"]
    for name, a_, b_ in zip(names, gk, gr):
        np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), rtol=3e-4, atol=3e-5, err_msg=name
        )


def test_bwd_kernel_batch_accumulation(rng):
    # Parameter grads must sum over the batch dimension correctly.
    args = _inputs(rng, M=5, K=16, H=8)

    def loss_k(*a):
        return jnp.sum(jnp.sin(fused_tcn_mid(*a, "gLN", 1, False, True)))

    def loss_r(*a):
        return jnp.sum(jnp.sin(mid_reference(*a, "gLN", 1, False)))

    gk = jax.grad(loss_k, argnums=(4,))(*args)[0]  # dw
    gr = jax.grad(loss_r, argnums=(4,))(*args)[0]
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), rtol=3e-4, atol=3e-5)


def test_model_train_step_grads_with_pallas(rng):
    """End-to-end grads through the model with the fused kernel active in
    the backward (force the fused path in training via a train=False-style
    config by calling forward directly)."""
    from convtasnet_tpu.config import ConvTasNetConfig
    from convtasnet_tpu.models.conv_tasnet import forward, init_params

    kw = dict(N=8, L=4, B=8, H=16, P=3, X=3, R=2, C=2, compute_dtype="float32")
    cfg0 = ConvTasNetConfig(**kw)
    cfg1 = ConvTasNetConfig(use_pallas=True, **kw)
    params, state = init_params(jax.random.key(0), cfg0)
    mix = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))

    def loss(p, cfg):
        est, _ = forward(p, state, cfg, mix, train=False)
        return jnp.sum(est**2)

    g0 = jax.grad(lambda p: loss(p, cfg0))(params)
    g1 = jax.grad(lambda p: loss(p, cfg1))(params)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g0),
        jax.tree_util.tree_leaves_with_path(g1),
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-4,
                                   atol=5e-5, err_msg=str(pa))
