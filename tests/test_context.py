"""Context-parallel (frame-axis sharded) forward + training parity tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from convtasnet_tpu.config import ConvTasNetConfig
from convtasnet_tpu.models.conv_tasnet import forward, init_params
from convtasnet_tpu.parallel.context import (
    cp_forward,
    cp_padded_frames,
    make_cp_train_step,
)
from convtasnet_tpu.training.optim import Optimizer, clip_by_global_norm

TINY = dict(N=8, L=4, B=8, H=16, P=3, X=3, R=2, C=2, compute_dtype="float32")


def _mesh(n, axes=("context",)):
    devs = np.array(jax.devices()[: n]).reshape(
        tuple(n if a == "context" else 1 for a in axes)
        if len(axes) > 1 else (n,))
    return Mesh(devs, axes)


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


def test_cp_pads_indivisible_k_internally():
    """K=63 over 4 shards: padded to 64 internally; parity against the
    single-device forward on the identically padded signal (gLN statistics
    include the pad, like batch-max padding — docs/parity.md)."""
    cfg = ConvTasNetConfig(**TINY)
    params, state = init_params(jax.random.key(2), cfg)
    mix = _input_for_k(cfg, K=63)
    T = mix.shape[-1]
    K_pad = cp_padded_frames(cfg, T, 4)
    assert K_pad == 64
    T_pad = (K_pad - 1) * cfg.stride + cfg.L
    ref, _ = forward(params, state, cfg,
                     jnp.pad(mix, ((0, 0), (0, T_pad - T))))
    got = cp_forward(params, state, cfg, mix, _mesh(4))
    assert got.shape[-1] == T
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref)[..., :T],
                               rtol=5e-4, atol=1e-5)


def test_cp_pads_small_shards_internally():
    """Shards below the halo span are padded up instead of rejected."""
    cfg = ConvTasNetConfig(**{**TINY, "X": 5})  # span = 2*16 = 32 frames
    params, state = init_params(jax.random.key(3), cfg)
    mix = _input_for_k(cfg, K=64)  # 8 frames/shard < 32 halo -> pad to 32
    T = mix.shape[-1]
    K_pad = cp_padded_frames(cfg, T, 8)
    assert K_pad == 8 * 32
    T_pad = (K_pad - 1) * cfg.stride + cfg.L
    ref, _ = forward(params, state, cfg,
                     jnp.pad(mix, ((0, 0), (0, T_pad - T))))
    got = cp_forward(params, state, cfg, mix, _mesh(8))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref)[..., :T],
                               rtol=5e-4, atol=1e-5)


def test_cp_rejects_bn():
    cfg = ConvTasNetConfig(**{**TINY, "norm_type": "BN"})
    params, state = init_params(jax.random.key(4), cfg)
    mix = _input_for_k(cfg, K=64)
    with pytest.raises(ValueError, match="BN"):
        cp_forward(params, state, cfg, mix, _mesh(4))


def _grads_single_device(cfg, params, state, mix, src, lengths):
    """Reference gradients: plain forward on the CP-padded signal."""
    from convtasnet_tpu.ops.loss import cal_loss

    def loss_fn(p):
        est, _ = forward(p, state, cfg, mix, train=True)
        est = est[..., : src.shape[-1]]
        loss, *_ = cal_loss(src, est, lengths)
        return loss

    return jax.value_and_grad(loss_fn)(params)


@pytest.mark.parametrize("norm_type,causal", [("gLN", False), ("cLN", True)])
def test_cp_gradient_parity(norm_type, causal):
    """d(loss)/d(params) through the sharded forward (halo-exchange and
    psum transposes) must match single-device gradients."""
    from convtasnet_tpu.ops.loss import cal_loss

    cfg = ConvTasNetConfig(norm_type=norm_type, causal=causal, **TINY)
    params, state = init_params(jax.random.key(6), cfg)
    mesh = _mesh(4)
    rng = np.random.default_rng(9)
    T = (64 - 1) * cfg.stride + cfg.L
    src = jnp.asarray(rng.standard_normal((2, 2, T)).astype(np.float32) * 0.3)
    mix = src.sum(1)
    lengths = jnp.asarray([T, T], jnp.int32)

    def cp_loss(p):
        est = cp_forward(p, state, cfg, mix, mesh, train=True)
        loss, *_ = cal_loss(src, est, lengths)
        return loss

    loss_cp, grads_cp = jax.value_and_grad(cp_loss)(params)
    loss_ref, grads_ref = _grads_single_device(cfg, params, state, mix, src,
                                               lengths)
    np.testing.assert_allclose(float(loss_cp), float(loss_ref), rtol=1e-5)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(grads_ref),
        jax.tree_util.tree_leaves_with_path(grads_cp),
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-5, err_msg=str(pa))


@pytest.mark.parametrize("axes,batch_axis", [(("context",), None),
                                             (("data", "context"), "data")])
def test_cp_train_step_parity(axes, batch_axis):
    """Three CP train steps == three single-device steps (loss trajectory
    and final params), pure CP and DP x CP."""
    cfg = ConvTasNetConfig(**TINY)
    opt = Optimizer("adam", lr=1e-3)
    rng = np.random.default_rng(11)
    T = (64 - 1) * cfg.stride + cfg.L
    src = jnp.asarray(rng.standard_normal((2, 2, T)).astype(np.float32) * 0.3)
    mix = src.sum(1)
    lengths = jnp.asarray([T, T], jnp.int32)

    if batch_axis:
        devs = np.array(jax.devices()[:8]).reshape(2, 4)
        mesh = Mesh(devs, ("data", "context"))
    else:
        mesh = _mesh(4)

    def run_cp():
        params, state = init_params(jax.random.key(7), cfg)
        opt_state = opt.init(params)
        step = make_cp_train_step(cfg, opt, mesh, max_norm=5.0,
                                  batch_axis=batch_axis)
        losses = []
        for _ in range(3):
            params, opt_state, state, loss, _ = step(
                params, opt_state, state, mix, src, lengths)
            losses.append(float(loss))
        return losses, jax.device_get(params)

    def run_ref():
        from convtasnet_tpu.ops.loss import cal_loss

        params, state = init_params(jax.random.key(7), cfg)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state, mix_, src_, lengths_):
            def loss_fn(p):
                est, _ = forward(p, state, cfg, mix_, train=True)
                loss, *_ = cal_loss(src_, est, lengths_)
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(params)
            grads, _ = clip_by_global_norm(grads, 5.0)
            params, opt_state = opt.update(grads, opt_state, params)
            return params, opt_state, loss

        losses = []
        for _ in range(3):
            params, opt_state, loss = step(params, opt_state, mix, src, lengths)
            losses.append(float(loss))
        return losses, jax.device_get(params)

    got_losses, got_params = run_cp()
    ref_losses, ref_params = run_ref()
    np.testing.assert_allclose(got_losses, ref_losses, rtol=1e-4)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(ref_params),
        jax.tree_util.tree_leaves_with_path(got_params),
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-5, err_msg=str(pa))


# ---------------------------------------------------------------------------
# TP x CP composition: the full ('data', 'model', 'context') mesh
# (SURVEY §7 design stance; VERDICT round-2 item 3). TP rides GSPMD auto
# axes inside the manual CP shard_map body.
# ---------------------------------------------------------------------------

def test_tp_cp_forward_parity():
    """dp=2 x tp=2 x cp=2 forward == single-device forward on the padded
    signal, with params TP-sharded via the mesh rules."""
    from convtasnet_tpu.parallel.mesh import make_mesh, shard_params_fn

    cfg = ConvTasNetConfig(**TINY)
    params, state = init_params(jax.random.key(0), cfg)
    mesh = make_mesh(dp=2, tp=2, cp=2)
    assert mesh.axis_names == ("data", "model", "context")
    params_s, state_s, _ = shard_params_fn(mesh, tp=2)(params, state, None)
    # H axis of in_w really is sharded over 'model'.
    spec = params_s["separator"]["blocks"]["in_w"].sharding.spec
    assert "model" in str(spec)

    mix = _input_for_k(cfg, K=64)
    K_pad = cp_padded_frames(cfg, mix.shape[-1], 2)
    T_need = (K_pad - 1) * cfg.stride + cfg.L
    mix_pad = jnp.pad(mix, ((0, 0), (0, max(0, T_need - mix.shape[-1]))))
    ref, _ = forward(params, state, cfg, mix_pad)

    got = jax.jit(lambda p, s, m: cp_forward(
        p, s, cfg, m, mesh, train=False, batch_axis="data"))(
        params_s, state_s, mix)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref[:, :, : mix.shape[-1]]),
        rtol=1e-4, atol=1e-5)


def test_tp_cp_train_step_parity():
    """Three dp=2 x tp=2 x cp=2 train steps == three single-device steps
    (loss trajectory and final params)."""
    from convtasnet_tpu.ops.loss import cal_loss
    from convtasnet_tpu.parallel.mesh import make_mesh, shard_params_fn

    cfg = ConvTasNetConfig(**TINY)
    opt = Optimizer("adam", lr=1e-3)
    rng = np.random.default_rng(13)
    T = (64 - 1) * cfg.stride + cfg.L
    src = jnp.asarray(rng.standard_normal((2, 2, T)).astype(np.float32) * 0.3)
    mix = src.sum(1)
    lengths = jnp.asarray([T, T - 17], jnp.int32)

    mesh = make_mesh(dp=2, tp=2, cp=2)

    def run_tp_cp():
        params, state = init_params(jax.random.key(7), cfg)
        opt_state = opt.init(params)
        params, state, opt_state = shard_params_fn(mesh, tp=2)(
            params, state, opt_state)
        step = make_cp_train_step(cfg, opt, mesh, max_norm=5.0,
                                  batch_axis="data")
        losses = []
        for _ in range(3):
            params, opt_state, state, loss, _ = step(
                params, opt_state, state, mix, src, lengths)
            losses.append(float(loss))
        return losses, jax.device_get(params)

    def run_ref():
        params, state = init_params(jax.random.key(7), cfg)
        opt_state = opt.init(params)
        K_pad = cp_padded_frames(cfg, T, 2)
        T_need = (K_pad - 1) * cfg.stride + cfg.L
        mix_p = jnp.pad(mix, ((0, 0), (0, max(0, T_need - T))))
        src_p = jnp.pad(src, ((0, 0), (0, 0), (0, max(0, T_need - T))))

        @jax.jit
        def step(params, opt_state, mix_, src_, lengths_):
            def loss_fn(p):
                est, _ = forward(p, state, cfg, mix_, train=True)
                loss, *_ = cal_loss(src_, est, lengths_)
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(params)
            grads, _ = clip_by_global_norm(grads, 5.0)
            params, opt_state = opt.update(grads, opt_state, params)
            return params, opt_state, loss

        losses = []
        for _ in range(3):
            params, opt_state, loss = step(params, opt_state, mix_p, src_p,
                                           lengths)
            losses.append(float(loss))
        return losses, jax.device_get(params)

    got_losses, got_params = run_tp_cp()
    ref_losses, ref_params = run_ref()
    np.testing.assert_allclose(got_losses, ref_losses, rtol=1e-4)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(ref_params),
        jax.tree_util.tree_leaves_with_path(got_params),
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-5, err_msg=str(pa))


@pytest.mark.slow
def test_cp_scaled_geometry_x10_16khz():
    """BASELINE.json configs[4] geometry on the CPU mesh (round-5 VERDICT
    item 1b): X=10 gives the 1024-frame halo span the TP/CP sharding
    rules cite as their motivation; a realistic 16 kHz long-form length
    (~6 s, K=6063 frames over cp=4 shards of ~1516 >= the span) exercises
    cp_padded_frames' span floor and the deep 20-block dilation ladder.
    Channel dims are scaled down for CPU wall time (the channel axes are
    parity-covered at width by the other tests; the GEOMETRY — dilations
    to 512, halo spans, 16 kHz frame counts — is what this run pins).
    Checks CP forward parity and one CP train step vs single-device."""
    cfg = ConvTasNetConfig(N=16, L=32, B=16, H=32, P=3, X=10, R=2, C=2,
                           compute_dtype="float32")
    assert (cfg.P - 1) * 2 ** (cfg.X - 1) == 1024  # the scaled halo span
    rng = np.random.default_rng(23)
    T = 97013  # ~6.06 s at 16 kHz, deliberately not a multiple of stride
    src = jnp.asarray(rng.standard_normal((2, 2, T)).astype(np.float32) * 0.3)
    mix = src.sum(1)
    lengths = jnp.asarray([T, T], jnp.int32)
    params, state = init_params(jax.random.key(3), cfg)
    mesh = _mesh(4)
    # shards exceed the halo span -> single-neighbor exchange suffices
    K_pad = cp_padded_frames(cfg, T, 4)
    assert K_pad // 4 >= 1024

    # The parity contract (docs/parity.md): CP equals the single-device
    # forward on the IDENTICALLY padded signal — the odd length pads one
    # frame internally and gLN statistics legitimately include it (an
    # unpadded reference diverges ~0.25 abs after 20 norm layers).
    T_need = (K_pad - 1) * cfg.stride + cfg.L
    ref, _ = forward(params, state, cfg,
                     jnp.pad(mix, ((0, 0), (0, T_need - T))), train=False)
    got = cp_forward(params, state, cfg, mix, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref)[..., :T],
                               rtol=2e-4, atol=2e-4)

    # Train-step parity at an exactly-divisible length (no internal pad,
    # so the single-device loss is the literal reference).
    T2 = (K_pad - 1) * cfg.stride + cfg.L
    src2 = jnp.asarray(
        np.random.default_rng(31).standard_normal((2, 2, T2))
        .astype(np.float32) * 0.3)
    mix2 = src2.sum(1)
    lengths2 = jnp.asarray([T2, T2], jnp.int32)
    from convtasnet_tpu.ops.loss import cal_loss

    est_ref, _ = forward(params, state, cfg, mix2, train=True)
    ref = float(cal_loss(src2, est_ref, lengths2)[0])

    opt = Optimizer("adam", lr=1e-3)
    opt_state = opt.init(params)
    step = make_cp_train_step(cfg, opt, mesh, max_norm=5.0)  # donates args
    _, _, _, loss_cp, _ = step(params, opt_state, state, mix2, src2,
                               lengths2)
    np.testing.assert_allclose(float(loss_cp), ref, rtol=1e-5)


@pytest.mark.slow
def test_tp_scaled_geometry_x10_16khz():
    """TP train-step parity at the scaled geometry (VERDICT r5 item 1b):
    dp=4 x tp=2 mesh, X=10 dilation ladder, 16 kHz long-form input."""
    from convtasnet_tpu.models.conv_tasnet import ConvTasNet
    from convtasnet_tpu.parallel.mesh import make_sharders
    from convtasnet_tpu.training.solver import make_train_step

    cfg = ConvTasNetConfig(N=16, L=32, B=16, H=32, P=3, X=10, R=2, C=2,
                           compute_dtype="float32")
    model = ConvTasNet(cfg)
    opt = Optimizer("adam", lr=1e-3)
    rng = np.random.default_rng(29)
    T = 64032  # 4 s at 16 kHz
    src = rng.standard_normal((4, 2, T)).astype(np.float32) * 0.3
    mix = src.sum(1)
    lengths = np.full((4,), T, np.int32)

    params, state = model.init(jax.random.key(11))
    opt_state = opt.init(params)
    step = make_train_step(model, opt, max_norm=5.0)
    ref_loss = float(step(params, opt_state, state, jnp.asarray(mix),
                          jnp.asarray(src), jnp.asarray(lengths))[3])

    shard_batch, shard_params = make_sharders(dp=4, tp=2)
    params, state = model.init(jax.random.key(11))
    opt_state = opt.init(params)
    params, state, opt_state = shard_params(params, state, opt_state)
    smix, slens, ssrc = shard_batch(mix, lengths, src)
    tp_loss = float(step(params, opt_state, state, smix, ssrc, slens)[3])
    np.testing.assert_allclose(tp_loss, ref_loss, rtol=1e-5)
