"""Pallas kernels x device mesh composition (VERDICT round-3 item 1).

Under plain pjit, GSPMD cannot shard an opaque pallas_call: it replicates
the kernel and ALL-GATHERS the globally-sharded batch onto every device —
dp-fold redundant compute and memory, silently (confirmed in compiled HLO
in round 3). The fix routes data-parallel inference through shard_map
(parallel.mesh.make_dp_forward), manual over the batch axis, so each
device's kernel sees its local [M/dp] slice. These tests pin the
contract three ways: the compiled module contains ZERO all-gathers, the
numerics match single-device exactly, and the evaluate/separate CLIs
produce identical results under --dp --use_pallas.

Also covers the round-4 kernel-tier collapse (VERDICT item 6):
use_pallas=True now auto-dispatches the whole-block tiers for inference.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from convtasnet_tpu.config import ConvTasNetConfig
from convtasnet_tpu.models.conv_tasnet import (_use_fused_whole, forward,
                                               init_params)
from convtasnet_tpu.parallel.mesh import make_dp_forward, make_mesh

TINY = dict(N=16, L=8, B=16, H=32, P=3, X=3, R=2, C=2,
            compute_dtype="float32")


def _setup(use_pallas):
    cfg = ConvTasNetConfig(use_pallas=use_pallas, **TINY)
    params, state = init_params(jax.random.key(0), cfg)
    mix = np.random.default_rng(0).standard_normal((8, 1024)).astype(np.float32)
    return cfg, params, state, jnp.asarray(mix)


def test_dp_pallas_forward_compiles_without_allgather():
    """The shard_map dp path must emit no activation collectives at all:
    rows are independent, so the forward is embarrassingly parallel."""
    cfg, params, state, mix = _setup("whole")
    mesh = make_mesh(dp=8)
    fwd = make_dp_forward(cfg, mesh)
    txt = jax.jit(fwd).lower(params, state, mix).compile().as_text()
    assert "all-gather" not in txt
    assert "all-reduce" not in txt


def test_plain_pjit_pallas_replicates_the_batch():
    """Documents the failure mode the shard_map path exists to avoid:
    plain jit over sharded inputs all-gathers the batch around the
    opaque pallas_call (the round-3 VERDICT repro). If this ever stops
    holding (XLA learning to shard custom-calls), make_dp_forward's
    guard rationale should be revisited."""
    cfg, params, state, mix = _setup("whole")
    mesh = make_mesh(dp=8)
    mix_sharded = jax.device_put(mix, NamedSharding(mesh, P("data")))
    txt = (jax.jit(lambda p, s, m: forward(p, s, cfg, m)[0])
           .lower(params, state, mix_sharded).compile().as_text())
    assert "all-gather" in txt


def test_dp_pallas_forward_matches_single_device():
    cfg, params, state, mix = _setup("whole")
    ref, _ = forward(params, state, cfg, mix)
    mesh = make_mesh(dp=8)
    got = make_dp_forward(cfg, mesh)(params, state, mix)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_dp_xla_forward_matches_single_device():
    """make_dp_forward is also the dp path for the XLA forward."""
    cfg, params, state, mix = _setup(False)
    ref, _ = forward(params, state, cfg, mix)
    mesh = make_mesh(dp=8)
    got = make_dp_forward(cfg, mesh)(params, state, mix)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_dp_forward_rejects_nontrivial_model_axis():
    cfg, _, _, _ = _setup("whole")
    mesh = make_mesh(dp=4, tp=2)
    with pytest.raises(ValueError, match="batch axis only"):
        make_dp_forward(cfg, mesh)


def test_resolve_mesh_pallas_gates_tp_and_cp():
    from convtasnet_tpu.cli.common import resolve_mesh_pallas

    cfg = ConvTasNetConfig(use_pallas="whole", **TINY)
    with pytest.warns(UserWarning, match="does not compose"):
        assert resolve_mesh_pallas(cfg, tp=2).use_pallas is False
    with pytest.warns(UserWarning, match="does not compose"):
        assert resolve_mesh_pallas(cfg, tp=1, cp=8).use_pallas is False
    assert resolve_mesh_pallas(cfg, tp=1, cp=1).use_pallas == "whole"
    cfg_off = ConvTasNetConfig(use_pallas=False, **TINY)
    assert resolve_mesh_pallas(cfg_off, tp=2).use_pallas is False


def test_auto_tier_true_dispatches_whole_for_inference():
    """use_pallas=True == the whole-block tiers for inference (one user
    switch; the dominated mid-chain tier was deleted in round 4)."""
    cfg_t, params, state, mix = _setup(True)
    cfg_w = ConvTasNetConfig(use_pallas="whole", **TINY)
    x = jnp.zeros((2, 256, TINY["B"]), jnp.float32)
    assert _use_fused_whole(cfg_t, None, x, train=False)
    assert _use_fused_whole(cfg_w, None, x, train=False)
    # Training: True stays on XLA; the Pallas trainers are explicit.
    assert not _use_fused_whole(cfg_t, None, x, train=True)
    assert _use_fused_whole(cfg_w, None, x, train=True)
    out_t, _ = forward(params, state, cfg_t, mix)
    out_w, _ = forward(params, state, cfg_w, mix)
    np.testing.assert_array_equal(np.asarray(out_t), np.asarray(out_w))


# ---------------------------------------------------------------------------
# CLI end-to-end: --dp/--cp with --use_pallas on the evaluate/separate
# surface (the production multi-chip inference configs).
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ckpt_and_data(tmp_path_factory):
    from convtasnet_tpu.data.synthetic import make_wav_dataset
    from convtasnet_tpu.training.checkpoint import save_checkpoint

    out = tmp_path_factory.mktemp("dpeval")
    json_root = make_wav_dataset(str(out), n_utts=4, C=2, sample_rate=8000,
                                 min_sec=1.0, max_sec=1.5, seed=7)
    cfg = ConvTasNetConfig(**TINY)
    params, state = init_params(jax.random.key(1), cfg)
    ckpt = os.path.join(str(out), "model.ckpt")
    save_checkpoint(ckpt, cfg, params, state)
    return ckpt, json_root, str(out)


def _eval(ckpt, data_dir, extra):
    from convtasnet_tpu.cli.evaluate import main

    return main(["--model_path", ckpt, "--data_dir", data_dir,
                 "--pad_to_multiple", "4000"] + extra)


def test_evaluate_dp_pallas_matches_single(ckpt_and_data):
    ckpt, json_root, _ = ckpt_and_data
    tt = os.path.join(json_root, "tt")
    ref = _eval(ckpt, tt, ["--use_pallas", "0"])
    got = _eval(ckpt, tt, ["--dp", "8", "--use_pallas", "whole"])
    assert got["count"] == ref["count"] == 4
    assert abs(got["si_snri"] - ref["si_snri"]) < 1e-3


def test_evaluate_cp_matches_single(ckpt_and_data):
    """--cp on the evaluate surface (VERDICT round-3 item 5): the frame
    axis of each utterance shards over all 8 devices. CP pads the signal
    internally (a few extra frames enter the gLN statistics, same
    semantics as batch-max padding), so metrics agree to ~centi-dB."""
    ckpt, json_root, _ = ckpt_and_data
    tt = os.path.join(json_root, "tt")
    ref = _eval(ckpt, tt, ["--use_pallas", "0"])
    got = _eval(ckpt, tt, ["--cp", "8"])
    assert got["count"] == ref["count"] == 4
    assert abs(got["si_snri"] - ref["si_snri"]) < 0.05


def test_evaluate_dp_cp_composed(ckpt_and_data):
    """DP x CP on one mesh: batches shard over 'data' while each row's
    frame axis shards over 'context'; the device BSS-Eval shard_maps
    over 'data' on the same 3-axis mesh."""
    ckpt, json_root, _ = ckpt_and_data
    tt = os.path.join(json_root, "tt")
    ref = _eval(ckpt, tt, ["--use_pallas", "0", "--cal_sdr", "1",
                           "--sdr_backend", "host"])
    got = _eval(ckpt, tt, ["--dp", "2", "--cp", "4", "--batch_size", "2",
                           "--cal_sdr", "1", "--sdr_backend", "device"])
    assert got["count"] == ref["count"] == 4
    assert abs(got["si_snri"] - ref["si_snri"]) < 0.05
    # CP's internal padding perturbs the separation slightly (gLN sees a
    # few extra frames), so SDRi moves a bit more than the SDR-backend
    # difference alone.
    assert abs(got["sdri"] - ref["sdri"]) < 0.3


def test_evaluate_device_sdr_matches_host(ckpt_and_data):
    """--sdr_backend device (the batched jitted BSS-Eval fused into the
    eval program, VERDICT r3 #3) must reproduce the host per-utterance
    SDRi numbers."""
    ckpt, json_root, _ = ckpt_and_data
    tt = os.path.join(json_root, "tt")
    ref = _eval(ckpt, tt, ["--cal_sdr", "1", "--sdr_backend", "host"])
    got = _eval(ckpt, tt, ["--cal_sdr", "1", "--sdr_backend", "device"])
    assert got["count"] == ref["count"] == 4
    # Synthetic tonal wavs + random-model estimates are the f32
    # conditioning worst case (~0.04 dB/utt; see metrics_device docstring).
    assert abs(got["sdri"] - ref["sdri"]) < 0.1
    assert abs(got["si_snri"] - ref["si_snri"]) < 1e-4


def test_evaluate_device_sdr_composes_with_dp(ckpt_and_data):
    """Device BSS-Eval under a --dp mesh: the batched metric shards over
    'data' like the forward."""
    ckpt, json_root, _ = ckpt_and_data
    tt = os.path.join(json_root, "tt")
    ref = _eval(ckpt, tt, ["--cal_sdr", "1", "--sdr_backend", "host"])
    got = _eval(ckpt, tt, ["--cal_sdr", "1", "--sdr_backend", "device",
                           "--dp", "8", "--use_pallas", "whole",
                           "--batch_size", "4"])
    assert got["count"] == ref["count"] == 4
    assert abs(got["sdri"] - ref["sdri"]) < 0.1


def test_separate_dp_pallas_matches_single(ckpt_and_data, tmp_path):
    from convtasnet_tpu.cli.separate import main as sep_main
    from convtasnet_tpu.data.wavio import read_wav

    ckpt, _, root = ckpt_and_data
    mix_dir = os.path.join(root, "wav", "tt", "mix")
    ref_dir, dp_dir = str(tmp_path / "ref"), str(tmp_path / "dp")
    n_ref = sep_main(["--model_path", ckpt, "--mix_dir", mix_dir,
                      "--out_dir", ref_dir, "--pad_to_multiple", "4000",
                      "--use_pallas", "0"])
    n_dp = sep_main(["--model_path", ckpt, "--mix_dir", mix_dir,
                     "--out_dir", dp_dir, "--pad_to_multiple", "4000",
                     "--dp", "8", "--use_pallas", "whole"])
    assert n_ref == n_dp == 4
    names = sorted(f for f in os.listdir(ref_dir) if f.endswith("_s1.wav"))
    assert len(names) == 4
    for name in names:
        a, _ = read_wav(os.path.join(ref_dir, name))
        b, _ = read_wav(os.path.join(dp_dir, name))
        np.testing.assert_allclose(a, b, atol=2e-3)


def test_separate_cp_matches_single(ckpt_and_data, tmp_path):
    from convtasnet_tpu.cli.separate import main as sep_main
    from convtasnet_tpu.data.wavio import read_wav

    ckpt, _, root = ckpt_and_data
    mix_dir = os.path.join(root, "wav", "tt", "mix")
    ref_dir, cp_dir = str(tmp_path / "ref"), str(tmp_path / "cp")
    sep_main(["--model_path", ckpt, "--mix_dir", mix_dir,
              "--out_dir", ref_dir, "--pad_to_multiple", "4000",
              "--use_pallas", "0"])
    n = sep_main(["--model_path", ckpt, "--mix_dir", mix_dir,
                  "--out_dir", cp_dir, "--pad_to_multiple", "4000",
                  "--cp", "8"])
    assert n == 4
    names = sorted(f for f in os.listdir(ref_dir) if f.endswith("_s2.wav"))
    for name in names:
        a, _ = read_wav(os.path.join(ref_dir, name))
        b, _ = read_wav(os.path.join(cp_dir, name))
        # CP's internal padding perturbs gLN statistics slightly (same
        # semantics as batch-max padding); waveforms agree closely.
        np.testing.assert_allclose(a, b, atol=2e-2)
