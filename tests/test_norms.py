import numpy as np
import jax.numpy as jnp
import pytest

from convtasnet_tpu.config import EPS
from convtasnet_tpu.ops.norms import (
    BN_EPS,
    BN_MOMENTUM,
    batch_norm,
    channelwise_layer_norm,
    global_layer_norm,
)


def test_cln_oracle(rng):
    # cLN: stats over channels per (m, k); biased var; EPS inside sqrt
    # (reference conv_tasnet.py:319-329).
    x = rng.standard_normal((2, 5, 7)).astype(np.float32)
    gamma = rng.standard_normal(7).astype(np.float32)
    beta = rng.standard_normal(7).astype(np.float32)
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    want = gamma * (x - mean) / np.sqrt(var + EPS) + beta
    got = np.asarray(channelwise_layer_norm(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_gln_oracle(rng):
    x = rng.standard_normal((2, 5, 7)).astype(np.float32)
    gamma = rng.standard_normal(7).astype(np.float32)
    beta = rng.standard_normal(7).astype(np.float32)
    mean = x.mean((-1, -2), keepdims=True)
    var = ((x - mean) ** 2).mean((-1, -2), keepdims=True)
    want = gamma * (x - mean) / np.sqrt(var + EPS) + beta
    got = np.asarray(global_layer_norm(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_gln_is_global_cln_is_not(rng):
    # Property: gLN output changes everywhere when one frame changes;
    # cLN output changes only at that frame.
    x = rng.standard_normal((1, 6, 4)).astype(np.float32)
    g = np.ones(4, np.float32)
    b = np.zeros(4, np.float32)
    x2 = x.copy()
    x2[0, 3] += 10.0
    cln1 = np.asarray(channelwise_layer_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b)))
    cln2 = np.asarray(channelwise_layer_norm(jnp.asarray(x2), jnp.asarray(g), jnp.asarray(b)))
    assert np.allclose(cln1[0, :3], cln2[0, :3]) and np.allclose(cln1[0, 4:], cln2[0, 4:])
    gln1 = np.asarray(global_layer_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b)))
    gln2 = np.asarray(global_layer_norm(jnp.asarray(x2), jnp.asarray(g), jnp.asarray(b)))
    assert not np.allclose(gln1[0, 0], gln2[0, 0])


@pytest.mark.parametrize("train", [True, False])
def test_bn_matches_torch(rng, train):
    torch = pytest.importorskip("torch")
    x = rng.standard_normal((4, 9, 5)).astype(np.float32)
    gamma = rng.standard_normal(5).astype(np.float32)
    beta = rng.standard_normal(5).astype(np.float32)
    rm = rng.standard_normal(5).astype(np.float32)
    rv = rng.random(5).astype(np.float32) + 0.5

    bn = torch.nn.BatchNorm1d(5, eps=BN_EPS, momentum=BN_MOMENTUM)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(gamma))
        bn.bias.copy_(torch.from_numpy(beta))
        bn.running_mean.copy_(torch.from_numpy(rm))
        bn.running_var.copy_(torch.from_numpy(rv))
    bn.train(train)
    # torch layout [M, C, K] <-> ours [M, K, C]
    want = bn(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy().transpose(0, 2, 1)

    got, new_rm, new_rv = batch_norm(
        jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta),
        jnp.asarray(rm), jnp.asarray(rv), train=train,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_rm), bn.running_mean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_rv), bn.running_var.numpy(), rtol=1e-5, atol=1e-6)
