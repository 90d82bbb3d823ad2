"""3-speaker separation (wsj0-3mix analogue) end-to-end coverage."""

import os

import jax
import numpy as np
import pytest

from convtasnet_tpu.config import ConvTasNetConfig, TrainConfig
from convtasnet_tpu.data.dataset import AudioDataset, Batch, DataLoader
from convtasnet_tpu.data.synthetic import make_wav_dataset, synthetic_batch
from convtasnet_tpu.models.conv_tasnet import ConvTasNet
from convtasnet_tpu.training.solver import Solver

TINY3 = dict(N=16, L=8, B=12, H=24, P=3, X=2, R=2, C=3, compute_dtype="float32")


def test_three_speaker_training_learns(tmp_path):
    rng = np.random.default_rng(11)
    tr = [Batch(*synthetic_batch(rng, 3, 3, 2048)) for _ in range(3)]
    cv = [Batch(*synthetic_batch(rng, 2, 3, 2048))]
    model = ConvTasNet(ConvTasNetConfig(**TINY3))
    solver = Solver(
        model,
        TrainConfig(epochs=3, save_folder=str(tmp_path), print_freq=100),
        tr, cv,
    )
    out = solver.train()
    assert out["tr_loss"][-1] < out["tr_loss"][0]


def test_three_speaker_data_pipeline(tmp_path):
    json_root = make_wav_dataset(str(tmp_path), n_utts=3, C=3, min_sec=1.0,
                                 max_sec=1.6, seed=5, splits=("tr",))
    ds = AudioDataset(os.path.join(json_root, "tr"), batch_size=3,
                      segment=0.5, num_speakers=3)
    b = ds.load_batch(0)
    assert b.source.shape[1] == 3
    np.testing.assert_allclose(b.mixture, b.source.sum(1), atol=1e-5)


def test_three_speaker_separate_cli(tmp_path):
    # Train nothing — just checkpoint an init model and run separate end
    # to end to confirm C=3 writes s1/s2/s3.
    from convtasnet_tpu.cli.separate import main as sep_main
    from convtasnet_tpu.training.checkpoint import save_checkpoint

    root = make_wav_dataset(str(tmp_path / "d"), n_utts=2, C=3, min_sec=1.0,
                            max_sec=1.2, seed=6, splits=("tt",))
    cfg = ConvTasNetConfig(**TINY3)
    model = ConvTasNet(cfg)
    params, state = model.init(jax.random.key(0))
    ck = str(tmp_path / "m.ckpt")
    save_checkpoint(ck, cfg, params, state)
    out_dir = str(tmp_path / "out")
    n = sep_main([
        "--model_path", ck,
        "--mix_dir", os.path.join(str(tmp_path / "d"), "wav", "tt", "mix"),
        "--out_dir", out_dir,
    ])
    assert n == 2
    import glob

    assert len(glob.glob(os.path.join(out_dir, "*_s3.wav"))) == 2


def test_long_receptive_field_config(rng):
    # BASELINE config 5 shape: X=10 doubling dilations (span 1024 frames)
    # on a short input — padding must dominate gracefully.
    from convtasnet_tpu.models.conv_tasnet import forward, init_params

    cfg = ConvTasNetConfig(N=8, L=4, B=8, H=8, P=3, X=10, R=1, C=2,
                           compute_dtype="float32")
    params, state = init_params(jax.random.key(0), cfg)
    mix = np.random.default_rng(0).standard_normal((1, 256)).astype(np.float32)
    est, _ = forward(params, state, cfg, mix)
    assert est.shape == (1, 2, 256)
    assert np.isfinite(np.asarray(est)).all()
