import numpy as np
import jax.numpy as jnp
import pytest

from convtasnet_tpu.ops.conv import depthwise_dilated, pointwise


def test_pointwise_is_matmul(rng):
    x = rng.standard_normal((2, 6, 4)).astype(np.float32)
    w = rng.standard_normal((4, 3)).astype(np.float32)
    got = np.asarray(pointwise(jnp.asarray(x), jnp.asarray(w)))
    np.testing.assert_allclose(got, x @ w, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("dilation", [1, 2, 4])
def test_depthwise_noncausal_matches_torch(rng, dilation):
    # Reference: nn.Conv1d(H, H, P, dilation=d, groups=H,
    # padding=(P-1)*d//2) (conv_tasnet.py:176,:247-250).
    torch = pytest.importorskip("torch")
    H, P, K, M = 6, 3, 20, 2
    x = rng.standard_normal((M, K, H)).astype(np.float32)
    w = rng.standard_normal((P, H)).astype(np.float32)
    got = np.asarray(depthwise_dilated(jnp.asarray(x), jnp.asarray(w), dilation, causal=False))

    tw = torch.from_numpy(w.T[:, None, :])  # [H, 1, P]
    want = torch.nn.functional.conv1d(
        torch.from_numpy(x.transpose(0, 2, 1)), tw,
        padding=(P - 1) * dilation // 2, dilation=dilation, groups=H,
    ).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("dilation", [1, 2])
def test_depthwise_causal_matches_torch_chomp(rng, dilation):
    # Reference causal path: pad (P-1)*d both sides, then chomp the right
    # (conv_tasnet.py:251-252,:275-289) == left-pad only.
    torch = pytest.importorskip("torch")
    H, P, K, M = 4, 3, 16, 2
    pad = (P - 1) * dilation
    x = rng.standard_normal((M, K, H)).astype(np.float32)
    w = rng.standard_normal((P, H)).astype(np.float32)
    got = np.asarray(depthwise_dilated(jnp.asarray(x), jnp.asarray(w), dilation, causal=True))

    tw = torch.from_numpy(w.T[:, None, :])
    full = torch.nn.functional.conv1d(
        torch.from_numpy(x.transpose(0, 2, 1)), tw,
        padding=pad, dilation=dilation, groups=H,
    )
    want = full[:, :, :-pad].numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_depthwise_causal_no_future_leak(rng):
    # Property: causal output at frame t is unchanged when future frames change.
    H, P, K = 3, 3, 24
    x = rng.standard_normal((1, K, H)).astype(np.float32)
    w = rng.standard_normal((P, H)).astype(np.float32)
    y1 = np.asarray(depthwise_dilated(jnp.asarray(x), jnp.asarray(w), 4, causal=True))
    x2 = x.copy()
    x2[0, 12:] += 5.0
    y2 = np.asarray(depthwise_dilated(jnp.asarray(x2), jnp.asarray(w), 4, causal=True))
    np.testing.assert_allclose(y1[0, :12], y2[0, :12], rtol=1e-6)
    assert not np.allclose(y1[0, 12:], y2[0, 12:])
