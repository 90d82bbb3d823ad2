import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convtasnet_tpu.config import ConvTasNetConfig
from convtasnet_tpu.models.conv_tasnet import ConvTasNet, forward, init_params

TINY = dict(N=8, L=4, B=6, H=12, P=3, X=3, R=2, C=2, compute_dtype="float32")


def _mix(rng, M=2, T=64):
    return jnp.asarray(rng.standard_normal((M, T)).astype(np.float32))


@pytest.mark.parametrize("norm_type", ["gLN", "cLN", "BN"])
@pytest.mark.parametrize("mask_nonlinear", ["relu", "softmax"])
def test_forward_shapes(rng, norm_type, mask_nonlinear):
    cfg = ConvTasNetConfig(norm_type=norm_type, mask_nonlinear=mask_nonlinear, **TINY)
    model = ConvTasNet(cfg)
    params, state = model.init(jax.random.key(0))
    mix = _mix(rng, M=3, T=64)
    est, new_state = model.apply(params, state, mix, train=True)
    assert est.shape == (3, 2, 64)
    assert est.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(est)))


def test_forward_jit_and_deterministic(rng):
    cfg = ConvTasNetConfig(**TINY)
    params, state = init_params(jax.random.key(1), cfg)
    mix = _mix(rng)
    f = jax.jit(lambda p, s, m: forward(p, s, cfg, m, train=False))
    e1, _ = f(params, state, mix)
    e2, _ = f(params, state, mix)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_softmax_mask_sums_to_one_over_speakers(rng):
    from convtasnet_tpu.models.conv_tasnet import encode, separate

    cfg = ConvTasNetConfig(mask_nonlinear="softmax", **TINY)
    params, state = init_params(jax.random.key(2), cfg)
    w = encode(params, cfg, _mix(rng))
    mask, _ = separate(params, state, cfg, w)
    np.testing.assert_allclose(np.asarray(mask.sum(axis=2)), 1.0, rtol=1e-5)


def test_relu_mask_nonnegative(rng):
    from convtasnet_tpu.models.conv_tasnet import encode, separate

    cfg = ConvTasNetConfig(**TINY)
    params, state = init_params(jax.random.key(3), cfg)
    w = encode(params, cfg, _mix(rng))
    assert float(w.min()) >= 0.0  # encoder ReLU (conv_tasnet.py:116)
    mask, _ = separate(params, state, cfg, w)
    assert float(mask.min()) >= 0.0


def test_causal_model_no_future_leak(rng):
    # Output before time t must not change when the future of the input
    # changes (receptive-field-exact causality via left-pad chomp).
    cfg = ConvTasNetConfig(norm_type="cLN", causal=True, **TINY)
    params, state = init_params(jax.random.key(4), cfg)
    x = np.asarray(_mix(rng, M=1, T=128))
    y1, _ = forward(params, state, cfg, jnp.asarray(x))
    x2 = x.copy()
    x2[:, 96:] += 3.0
    y2, _ = forward(params, state, cfg, jnp.asarray(x2))
    # Encoder frame k covers samples [k*S, k*S+L); frames strictly before
    # sample 96 are unchanged, so output up to sample 92 (last full frame
    # boundary) must match.
    np.testing.assert_allclose(np.asarray(y1)[..., :92], np.asarray(y2)[..., :92], atol=1e-5)
    assert not np.allclose(np.asarray(y1)[..., 96:], np.asarray(y2)[..., 96:])


def test_noncausal_model_sees_future(rng):
    # Non-causal lookahead: each block sees (P-1)/2*d future frames; with
    # X=3, R=2 that is 2*(1+2+4)=14 frames = 28 samples at stride 2. A
    # change at sample 96 must reach outputs in (96-28-L, 96) but not the
    # far past.
    cfg = ConvTasNetConfig(norm_type="cLN", causal=False, **TINY)
    params, state = init_params(jax.random.key(5), cfg)
    x = np.asarray(_mix(rng, M=1, T=128))
    y1, _ = forward(params, state, cfg, jnp.asarray(x))
    x2 = x.copy()
    x2[:, 96:] += 3.0
    y2, _ = forward(params, state, cfg, jnp.asarray(x2))
    assert not np.allclose(np.asarray(y1)[..., 70:96], np.asarray(y2)[..., 70:96])
    np.testing.assert_allclose(
        np.asarray(y1)[..., :60], np.asarray(y2)[..., :60], atol=1e-6
    )


def test_gradients_flow_everywhere(rng):
    cfg = ConvTasNetConfig(**TINY)
    params, state = init_params(jax.random.key(6), cfg)
    mix = _mix(rng)
    src = jnp.asarray(np.random.default_rng(0).standard_normal((2, 2, 64)).astype(np.float32))

    def loss_fn(p):
        est, _ = forward(p, state, cfg, mix, train=True)
        from convtasnet_tpu.ops.loss import cal_loss

        loss, *_ = cal_loss(src, est, jnp.array([64, 64]))
        return loss

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves_with_path(grads)
    for path, g in flat:
        assert np.all(np.isfinite(np.asarray(g))), path
        assert float(jnp.abs(g).max()) > 0, f"zero grad at {path}"


def test_bn_state_updates_in_train_only(rng):
    cfg = ConvTasNetConfig(norm_type="BN", **TINY)
    params, state = init_params(jax.random.key(7), cfg)
    mix = _mix(rng)
    _, st_eval = forward(params, state, cfg, mix, train=False)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: np.allclose(a, b), state, st_eval)
    )
    _, st_train = forward(params, state, cfg, mix, train=True)
    changed = jax.tree_util.tree_map(lambda a, b: not np.allclose(a, b), state, st_train)
    assert any(jax.tree_util.tree_leaves(changed))


def test_remat_matches_no_remat(rng):
    cfg = ConvTasNetConfig(**TINY)
    cfg_r = ConvTasNetConfig(remat=True, **TINY)
    params, state = init_params(jax.random.key(8), cfg)
    mix = _mix(rng)
    y1, _ = forward(params, state, cfg, mix)
    y2, _ = forward(params, state, cfg_r, mix)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-5, atol=1e-6)


def test_num_params_matches_formula():
    cfg = ConvTasNetConfig(**TINY)
    model = ConvTasNet(cfg)
    params, _ = model.init(jax.random.key(0))
    N, L, B, H, P, X, R, C = cfg.N, cfg.L, cfg.B, cfg.H, cfg.P, cfg.X, cfg.R, cfg.C
    want = (
        L * N  # encoder
        + N * L  # decoder
        + 2 * N  # input cLN
        + N * B  # bottleneck
        + B * C * N  # mask conv
        + R * X * (B * H + H * B + P * H + 2 + 4 * H)  # blocks
    )
    assert model.num_params(params) == want


@pytest.mark.parametrize("remat", ["block", "dots"])
def test_remat_policies_match_forward_and_grad(rng, remat):
    """remat='block'/'dots' and scan_unroll change scheduling only — the
    forward output and the gradients must match the un-rematerialized,
    rolled-scan baseline."""
    from convtasnet_tpu.ops.loss import cal_loss

    cfg = ConvTasNetConfig(**TINY)
    cfg_r = ConvTasNetConfig(remat=remat, scan_unroll=2, **TINY)
    params, state = init_params(jax.random.key(9), cfg)
    mix = _mix(rng)
    src = jnp.stack([mix * 0.6, mix * 0.4], axis=1)
    lens = jnp.full(mix.shape[0], mix.shape[1], jnp.int32)

    y1, _ = forward(params, state, cfg, mix)
    y2, _ = forward(params, state, cfg_r, mix)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-5, atol=1e-6)

    def loss_of(c):
        def f(p):
            est, _ = forward(p, state, c, mix, train=True)
            return cal_loss(src, est, lens)[0]
        return jax.grad(f)(params)

    g1, g2 = loss_of(cfg), loss_of(cfg_r)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)
