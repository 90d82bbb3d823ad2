import os

import jax
import numpy as np
import pytest

from convtasnet_tpu.config import ConvTasNetConfig, TrainConfig
from convtasnet_tpu.data.dataset import Batch
from convtasnet_tpu.data.synthetic import synthetic_batch
from convtasnet_tpu.models.conv_tasnet import ConvTasNet
from convtasnet_tpu.training.solver import Solver

TINY = dict(N=16, L=8, B=12, H=24, P=3, X=2, R=2, C=2, compute_dtype="float32")


def _loaders(n_batches=3, batch=2, T=2048):
    rng = np.random.default_rng(7)
    tr = [Batch(*synthetic_batch(rng, batch, 2, T)) for _ in range(n_batches)]
    cv = [Batch(*synthetic_batch(rng, batch, 2, T)) for _ in range(2)]
    return tr, cv


def _solver(tmp_path, epochs=2, **kw):
    model = ConvTasNet(ConvTasNetConfig(**TINY))
    cfg = TrainConfig(
        epochs=epochs, batch_size=2, save_folder=str(tmp_path), print_freq=100,
        checkpoint=True, **kw,
    )
    tr, cv = _loaders()
    return Solver(model, cfg, tr, cv)


def test_training_reduces_loss(tmp_path):
    s = _solver(tmp_path, epochs=3)
    out = s.train()
    assert len(out["tr_loss"]) == 3
    assert out["tr_loss"][-1] < out["tr_loss"][0]
    assert np.isfinite(out["cv_loss"]).all()
    # best model saved
    assert os.path.exists(os.path.join(str(tmp_path), "final.ckpt"))


def test_checkpoint_resume_continues(tmp_path):
    s1 = _solver(tmp_path, epochs=2)
    s1.train()
    ck = os.path.join(str(tmp_path), "epoch2.ckpt")
    assert os.path.exists(ck)

    s2 = _solver(tmp_path, epochs=3, continue_from=ck)
    assert s2.start_epoch == 2
    assert len(s2.tr_loss) == 2
    # resumed params identical to saved ones
    p1 = jax.device_get(s1.params)
    p2 = jax.device_get(s2.params)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: np.allclose(a, b), p1, p2)
    )
    out = s2.train()
    assert len(out["tr_loss"]) == 3  # 2 restored + 1 new


class _ScriptedSolver(Solver):
    """Overrides the epoch runner to replay scripted CV losses."""

    def __init__(self, *a, cv_script=None, **kw):
        super().__init__(*a, **kw)
        self.cv_script = list(cv_script)
        self._calls = 0

    def _run_one_epoch(self, epoch, cross_valid):
        if cross_valid:
            v = self.cv_script[self._calls]
            self._calls += 1
            return v, 0.0
        return -1.0, 0.0


def _scripted(tmp_path, losses, epochs, early_stop=True):
    model = ConvTasNet(ConvTasNetConfig(**TINY))
    cfg = TrainConfig(
        epochs=epochs, save_folder=str(tmp_path), half_lr=True,
        early_stop=early_stop, print_freq=1000, lr=1e-3,
    )
    tr, cv = _loaders(n_batches=1, T=512)
    return _ScriptedSolver(model, cfg, tr, cv, cv_script=losses)


def test_lr_halves_after_three_no_improvement(tmp_path):
    # cv losses: improve, then 3 flat epochs -> halving on the 4th.
    s = _scripted(tmp_path, [10.0, 10.0, 10.0, 10.0, 9.0], epochs=5)
    s.train()
    lrs = [h["lr"] for h in s.history]
    # epochs 1-2-3 keep lr, epoch 3 (third no-improve) halves
    assert lrs[0] == pytest.approx(1e-3)
    assert min(lrs) == pytest.approx(5e-4)


def test_early_stop_after_ten(tmp_path):
    s = _scripted(tmp_path, [10.0] * 12, epochs=12)
    out = s.train()
    # 1st epoch sets prev; then 10 consecutive no-improvements stop at epoch 11.
    assert len(out["cv_loss"]) == 11


def test_no_early_stop_when_disabled(tmp_path):
    s = _scripted(tmp_path, [10.0] * 12, epochs=12, early_stop=False)
    out = s.train()
    assert len(out["cv_loss"]) == 12


def test_midepoch_checkpoint_resume(tmp_path):
    """Preemption-safe resume: latest.ckpt written mid-epoch resumes inside
    that epoch at the right step with deterministic loader order."""
    from convtasnet_tpu.data.dataset import Batch
    from convtasnet_tpu.training.checkpoint import load_header

    class ListLoader(list):
        def set_epoch(self, e):
            self.epoch = e

        def iter_from(self, skip):
            self.last_skip = skip
            return iter(list.__getitem__(self, slice(skip, None)))

        def __iter__(self):
            return self.iter_from(0)

    rng = np.random.default_rng(3)
    tr = ListLoader([Batch(*synthetic_batch(rng, 2, 2, 1024)) for _ in range(5)])
    cv = ListLoader([Batch(*synthetic_batch(rng, 2, 2, 1024))])
    model = ConvTasNet(ConvTasNetConfig(**TINY))
    cfg = TrainConfig(epochs=1, save_folder=str(tmp_path), print_freq=100,
                      save_every_steps=2)
    Solver(model, cfg, tr, cv).train()
    latest = os.path.join(str(tmp_path), "latest.ckpt")
    assert os.path.exists(latest)
    hdr = load_header(latest)
    assert hdr["extra"]["step_in_epoch"] == 4  # saved at steps 2 and 4

    cfg2 = TrainConfig(epochs=1, save_folder=str(tmp_path), print_freq=100,
                       continue_from=latest)
    s2 = Solver(model, cfg2, tr, cv)
    assert s2.resume_step == 4
    s2.train()
    assert tr.last_skip == 4  # resumed epoch skipped completed steps


def test_cv_batching_preserves_utterance_mean(tmp_path):
    """The CV epoch average must be the reference's mean-over-utterances
    (train.py:106-108 validates at batch_size=1) no matter how utterances
    are grouped into batches: batch losses are weighted by real utterance
    count and zero-length pad rows carry zero weight."""
    rng = np.random.default_rng(3)
    T = 2048
    utts = [synthetic_batch(rng, 1, 2, T) for _ in range(5)]

    def batch_of(items):
        mix = np.concatenate([m for m, _, _ in items])
        lens = np.concatenate([l for _, l, _ in items])
        src = np.concatenate([s for _, _, s in items])
        return Batch(mix, lens, src)

    model = ConvTasNet(ConvTasNetConfig(**TINY))
    cfg = TrainConfig(epochs=1, batch_size=2, save_folder=str(tmp_path),
                      print_freq=100)
    tr = [batch_of(utts[:2])]

    def cv_avg(cv):
        s = Solver(model, cfg, tr, cv)
        loss, _ = s._run_one_epoch(0, cross_valid=True)
        return loss

    # batch_size=1 (the reference grouping) vs uneven grouping [2, 3]
    one = cv_avg([batch_of([u]) for u in utts])
    grouped = cv_avg([batch_of(utts[:2]), batch_of(utts[2:])])
    np.testing.assert_allclose(grouped, one, rtol=1e-5)

    # padded grouping: a zero-length pad row must not move the average
    b = batch_of(utts[2:])
    padded = Batch(
        np.concatenate([b.mixture, np.zeros_like(b.mixture[:1])]),
        np.concatenate([b.lengths, np.zeros_like(b.lengths[:1])]),
        np.concatenate([b.source, np.zeros_like(b.source[:1])]))
    padded_avg = cv_avg([batch_of(utts[:2]), padded])
    np.testing.assert_allclose(padded_avg, one, rtol=1e-5)
