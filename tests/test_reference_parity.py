"""Weight-transplant numerical parity against the ACTUAL reference PyTorch
implementation (/root/reference/src), not numpy re-derivations.

A randomly initialized reference ConvTasNet's state_dict is converted into
this framework's pytrees (convtasnet_tpu.compat) and the two models are run
on the same inputs:

  * forward output parity (f32, atol 1e-5) across norm_type x causal x
    mask_nonlinear x C
  * cal_loss parity incl. max_snr values, best-perm indices, and the
    reordered estimates (pit_criterion.py:12-24)
  * parameter-gradient parity (d loss / d params, atol 1e-4) — the
    state_dict->pytree mapping is pure transpose/reshape, so the same
    converter maps torch .grad tensors onto our gradient pytree
  * round-trip: pytree -> state_dict -> reference model matches pytree

The reference sources are imported directly (read-only); overlap_and_add's
hardcoded .cuda() (utils.py:40) is neutralized for CPU-only torch by
no-opping torch.Tensor.cuda.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_SRC = "/root/reference/src"


@pytest.fixture(scope="module")
def ref():
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    # CPU-only torch: utils.overlap_and_add calls .cuda() unconditionally.
    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self
    import conv_tasnet as ref_ct
    import pit_criterion as ref_pit

    return ref_ct, ref_pit


def _jax_cfg(**kw):
    from convtasnet_tpu.config import ConvTasNetConfig

    base = dict(N=16, L=4, B=8, H=12, P=3, X=2, R=2, C=2,
                compute_dtype="float32", use_pallas=False)
    base.update(kw)
    return ConvTasNetConfig(**base)


def _transplant(ref_model, cfg):
    from convtasnet_tpu.compat import params_from_state_dict

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    return params_from_state_dict(sd, cfg)


def _build_ref(ref_ct, cfg, seed=0):
    torch.manual_seed(seed)
    return ref_ct.ConvTasNet(cfg.N, cfg.L, cfg.B, cfg.H, cfg.P, cfg.X,
                             cfg.R, cfg.C, norm_type=cfg.norm_type,
                             causal=cfg.causal,
                             mask_nonlinear=cfg.mask_nonlinear)


CASES = [
    dict(norm_type="gLN", causal=False, mask_nonlinear="relu", C=2),
    dict(norm_type="gLN", causal=False, mask_nonlinear="softmax", C=2),
    dict(norm_type="gLN", causal=True, mask_nonlinear="relu", C=3),
    dict(norm_type="cLN", causal=False, mask_nonlinear="relu", C=2),
    dict(norm_type="cLN", causal=True, mask_nonlinear="softmax", C=2),
    dict(norm_type="cLN", causal=True, mask_nonlinear="relu", C=3),
    dict(norm_type="BN", causal=False, mask_nonlinear="relu", C=2),
    dict(norm_type="BN", causal=True, mask_nonlinear="softmax", C=3),
]


@pytest.mark.parametrize("case", CASES,
                         ids=lambda c: f"{c['norm_type']}-"
                                       f"{'causal' if c['causal'] else 'nc'}-"
                                       f"{c['mask_nonlinear']}-C{c['C']}")
def test_forward_parity(ref, case):
    """Reference forward == our forward with transplanted weights."""
    from convtasnet_tpu.models.conv_tasnet import forward

    ref_ct, _ = ref
    cfg = _jax_cfg(**case)
    model = _build_ref(ref_ct, cfg, seed=hash(str(case)) % 2**31)
    model.eval()
    params, state = _transplant(model, cfg)

    rng = np.random.default_rng(3)
    mix = rng.standard_normal((3, 202)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(mix)).numpy()
    got, _ = forward(params, state, cfg, mix, train=False)
    got = np.asarray(got)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_forward_parity_paper_config(ref):
    """Paper config (N=256,L=20,B=256,H=512,P=3,X=8,R=4, gLN) forward parity
    on a 2 s utterance — the exact configuration behind README.md:14."""
    from convtasnet_tpu.models.conv_tasnet import forward

    ref_ct, _ = ref
    cfg = _jax_cfg(N=256, L=20, B=256, H=512, P=3, X=8, R=4, C=2,
                   norm_type="gLN")
    model = _build_ref(ref_ct, cfg, seed=7)
    model.eval()
    params, state = _transplant(model, cfg)

    rng = np.random.default_rng(11)
    mix = (rng.standard_normal((1, 16000)) * 0.1).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(mix)).numpy()
    got = np.asarray(forward(params, state, cfg, mix)[0])
    # 32 residual blocks of f32 accumulation: slightly looser tolerance.
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("C", [2, 3])
def test_cal_loss_parity(ref, C):
    """Loss value, per-utterance max-SNR, best-perm reorder vs the reference
    criterion on random estimates with ragged lengths."""
    from convtasnet_tpu.ops.loss import cal_loss

    _, ref_pit = ref
    rng = np.random.default_rng(5 + C)
    B, T = 4, 300
    lengths = np.array([300, 211, 300, 64], np.int64)
    src = rng.standard_normal((B, C, T)).astype(np.float32)
    est = rng.standard_normal((B, C, T)).astype(np.float32)
    for b in range(B):
        src[b, :, lengths[b]:] = 0

    t_loss, t_snr, _, t_re = ref_pit.cal_loss(
        torch.from_numpy(src.copy()), torch.from_numpy(est.copy()),
        torch.from_numpy(lengths))
    loss, snr, _, re = cal_loss(src, est, lengths.astype(np.int32))

    np.testing.assert_allclose(float(loss), float(t_loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(snr), t_snr.numpy().ravel(),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(re), t_re.numpy(), atol=1e-6)


@pytest.mark.parametrize(
    "case",
    [dict(norm_type="gLN", causal=False, mask_nonlinear="relu", C=2),
     dict(norm_type="cLN", causal=True, mask_nonlinear="relu", C=2),
     dict(norm_type="gLN", causal=False, mask_nonlinear="softmax", C=3),
     dict(norm_type="BN", causal=False, mask_nonlinear="relu", C=2)],
    ids=lambda c: f"{c['norm_type']}-{'causal' if c['causal'] else 'nc'}-"
                  f"{c['mask_nonlinear']}-C{c['C']}")
def test_gradient_parity(ref, case):
    """d(uPIT loss)/d(params): torch autograd vs jax.grad after transplant.
    The converter mapping is linear, so torch .grad tensors convert through
    the same params_from_state_dict."""
    import jax

    from convtasnet_tpu.compat import params_from_state_dict
    from convtasnet_tpu.models.conv_tasnet import forward
    from convtasnet_tpu.ops.loss import cal_loss

    ref_ct, ref_pit = ref
    cfg = _jax_cfg(**case)
    model = _build_ref(ref_ct, cfg, seed=13)
    model.train()
    params, state = _transplant(model, cfg)

    rng = np.random.default_rng(17)
    B, T = 2, 150
    lengths = np.array([150, 103], np.int64)
    src = rng.standard_normal((B, cfg.C, T)).astype(np.float32) * 0.3
    for b in range(B):
        src[b, :, lengths[b]:] = 0
    mix = src.sum(1)

    # torch side
    t_mix = torch.from_numpy(mix)
    est = model(t_mix)
    t_loss, *_ = ref_pit.cal_loss(torch.from_numpy(src.copy()), est,
                                  torch.from_numpy(lengths))
    model.zero_grad()
    t_loss.backward()
    grad_sd = {}
    for k, v in model.state_dict().items():
        p = dict(model.named_parameters()).get(k)
        grad_sd[k] = (p.grad.detach().numpy() if p is not None and
                      p.grad is not None else np.zeros_like(v.numpy()))
    want_grads, _ = params_from_state_dict(grad_sd, cfg)

    # jax side
    def loss_fn(p):
        e, _ = forward(p, state, cfg, mix, train=True)
        l, *_ = cal_loss(src, e, lengths.astype(np.int32))
        return l

    loss, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss), float(t_loss), rtol=1e-5)

    flat_want = jax.tree_util.tree_leaves_with_path(want_grads)
    flat_got = {jax.tree_util.keystr(p): g
                for p, g in jax.tree_util.tree_leaves_with_path(grads)}
    for path, want in flat_want:
        key = jax.tree_util.keystr(path)
        got = np.asarray(flat_got[key])
        np.testing.assert_allclose(
            got, np.asarray(want), atol=1e-4, rtol=1e-3,
            err_msg=f"gradient mismatch at {key}")


def test_state_dict_round_trip(ref):
    """pytree -> state_dict -> reference model reproduces the pytree model's
    outputs (export path), for gLN and BN."""
    from convtasnet_tpu.compat import state_dict_from_params
    from convtasnet_tpu.models.conv_tasnet import forward

    ref_ct, _ = ref
    for norm_type, causal in (("gLN", False), ("BN", True)):
        cfg = _jax_cfg(norm_type=norm_type, causal=causal)
        model = _build_ref(ref_ct, cfg, seed=23)
        model.eval()
        params, state = _transplant(model, cfg)

        sd = state_dict_from_params(params, state, cfg)
        model2 = _build_ref(ref_ct, cfg, seed=99)  # different random init
        model2.load_state_dict({k: torch.from_numpy(np.array(v))
                                for k, v in sd.items()})
        model2.eval()

        rng = np.random.default_rng(29)
        mix = rng.standard_normal((2, 120)).astype(np.float32)
        with torch.no_grad():
            want = model2(torch.from_numpy(mix)).numpy()
        got = np.asarray(forward(params, state, cfg, mix)[0])
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_import_torch_cli_round_trip(ref, tmp_path):
    """Briefly train the reference model (so BN stats / loss history are
    non-trivial), serialize with the reference's own serialize(), convert
    through the import CLI, and check the imported checkpoint's forward
    matches torch eval (<=1e-5)."""
    from convtasnet_tpu.cli.import_torch import build_parser, import_torch
    from convtasnet_tpu.models.conv_tasnet import forward
    from convtasnet_tpu.training.checkpoint import load_model

    ref_ct, ref_pit = ref
    cfg = _jax_cfg(norm_type="BN", C=2)
    model = _build_ref(ref_ct, cfg, seed=31)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)

    rng = np.random.default_rng(37)
    src = rng.standard_normal((2, 2, 160)).astype(np.float32) * 0.2
    mix = src.sum(1)
    lengths = torch.tensor([160, 160])
    model.train()
    for _ in range(3):  # a few real steps: BN running stats move
        loss, *_ = ref_pit.cal_loss(torch.from_numpy(src),
                                    model(torch.from_numpy(mix)), lengths)
        opt.zero_grad()
        loss.backward()
        opt.step()

    pkg = ref_ct.ConvTasNet.serialize(model, opt, epoch=3,
                                      tr_loss=torch.zeros(10),
                                      cv_loss=torch.zeros(10))
    pth = str(tmp_path / "final.pth.tar")
    torch.save(pkg, pth)

    out = str(tmp_path / "final.ckpt")
    args = build_parser().parse_args(["--torch_path", pth, "--out", out,
                                      "--compute_dtype", "float32"])
    import_torch(args, log=lambda *_: None)

    cfg2, params, state = load_model(out)
    assert (cfg2.N, cfg2.norm_type, cfg2.C) == (cfg.N, "BN", 2)
    model.eval()
    test_mix = rng.standard_normal((2, 200)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(test_mix)).numpy()
    got = np.asarray(forward(params, state, cfg2, test_mix)[0])
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
