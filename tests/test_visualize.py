"""Loss-curve rendering tests (utils/visualize.py — the visdom analogue,
reference solver.py:139-156)."""

import json
import os

import pytest

matplotlib = pytest.importorskip("matplotlib")

from convtasnet_tpu.utils.visualize import (
    main as viz_main,
    plot_history,
    plot_history_jsonl,
    plot_loss_curves,
)


def _is_png(path):
    with open(path, "rb") as f:
        return f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_plot_loss_curves(tmp_path):
    out = str(tmp_path / "loss.png")
    got = plot_loss_curves([5.0, 2.0, 1.0, 0.5], [6.0, 3.0, 2.5, 2.6], out,
                           lr=[1e-3, 1e-3, 5e-4, 5e-4])
    assert got == out and _is_png(out)


def test_plot_history_and_jsonl_cli(tmp_path):
    hist = [{"epoch": i + 1, "tr_loss": 10.0 / (i + 1),
             "cv_loss": 12.0 / (i + 1), "lr": 1e-3, "audio_sps": 100.0}
            for i in range(5)]
    out = str(tmp_path / "h.png")
    assert plot_history(hist, out) == out and _is_png(out)

    jsonl = tmp_path / "history.jsonl"
    with open(jsonl, "w") as f:
        for h in hist:
            f.write(json.dumps(h) + "\n")
        f.write("not json\n")  # log noise must be tolerated
    out2 = str(tmp_path / "j.png")
    assert plot_history_jsonl(str(jsonl), out2) == out2 and _is_png(out2)

    # CLI over the experiment dir writes <dir>/loss.png
    assert viz_main([str(tmp_path)]) == 0
    assert _is_png(tmp_path / "loss.png")


def test_empty_history_is_noop(tmp_path):
    assert plot_history([], str(tmp_path / "x.png")) is None
    assert not os.path.exists(tmp_path / "x.png")


def test_solver_renders_loss_png(tmp_path):
    """End-to-end: Solver with visualize=True writes loss.png per epoch."""
    import numpy as np

    from convtasnet_tpu.config import ConvTasNetConfig, TrainConfig
    from convtasnet_tpu.data.dataset import Batch
    from convtasnet_tpu.data.synthetic import synthetic_batch
    from convtasnet_tpu.models.conv_tasnet import ConvTasNet
    from convtasnet_tpu.training.solver import Solver

    cfg = ConvTasNetConfig(N=8, L=8, B=8, H=16, P=3, X=1, R=1, C=2,
                           compute_dtype="float32", use_pallas=False)
    tcfg = TrainConfig(epochs=2, batch_size=2, save_folder=str(tmp_path),
                       checkpoint=False, visualize=True, print_freq=100)
    rng = np.random.default_rng(0)
    tr = [Batch(*synthetic_batch(rng, 2, 2, 2000)) for _ in range(2)]
    cv = [Batch(*synthetic_batch(rng, 2, 2, 2000))]
    solver = Solver(ConvTasNet(cfg), tcfg, tr, cv)
    solver.train()
    assert _is_png(tmp_path / "loss.png")
    # Per-iteration live window (the reference's visdom every-iter plot):
    # EVERY train iteration is captured (2 batches x 2 epochs).
    assert _is_png(tmp_path / "loss_iter.png")
    assert [p["iter"] for p in solver.iter_history] == [1, 2, 3, 4]


def test_plot_iter_curve(tmp_path):
    from convtasnet_tpu.utils.visualize import plot_iter_curve

    pts = [{"iter": i + 1, "epoch": i // 5, "loss": 10.0 - 0.1 * i}
           for i in range(15)]
    out = str(tmp_path / "it.png")
    assert plot_iter_curve(pts, out) == out and _is_png(out)
    assert plot_iter_curve([], str(tmp_path / "no.png")) is None


def test_partial_cv_history(tmp_path):
    """Rows without cv_loss (CV every k epochs, partial histories) must
    not crash and must keep CV aligned to the epoch axis."""
    hist = [{"epoch": 1, "tr_loss": 5.0, "cv_loss": 6.0, "lr": 1e-3},
            {"epoch": 2, "tr_loss": 4.0, "lr": 1e-3},      # no CV this epoch
            {"epoch": 3, "tr_loss": 3.0, "cv_loss": 3.5}]  # no lr
    out = str(tmp_path / "p.png")
    assert plot_history(hist, out) == out and _is_png(out)


def test_cli_missing_history(tmp_path):
    assert viz_main([str(tmp_path)]) == 1


def test_iter_plot_wall_clock_throttle(tmp_path, monkeypatch):
    """Every iteration's loss is captured (as a no-sync device scalar,
    drained at sync points), but the PNG re-render is wall-clock throttled
    (Solver.iter_plot_interval) so live plotting cannot eat a loader-bound
    host's epoch time."""
    import numpy as np

    import convtasnet_tpu.utils.visualize as viz
    from convtasnet_tpu.config import ConvTasNetConfig, TrainConfig
    from convtasnet_tpu.data.dataset import Batch
    from convtasnet_tpu.data.synthetic import synthetic_batch
    from convtasnet_tpu.models.conv_tasnet import ConvTasNet
    from convtasnet_tpu.training.solver import Solver

    cfg = ConvTasNetConfig(N=8, L=8, B=8, H=16, P=3, X=1, R=1, C=2,
                           compute_dtype="float32", use_pallas=False)
    tcfg = TrainConfig(epochs=2, batch_size=2, save_folder=str(tmp_path),
                       checkpoint=False, visualize=True, print_freq=100)
    rng = np.random.default_rng(0)
    tr = [Batch(*synthetic_batch(rng, 2, 2, 2000)) for _ in range(2)]
    cv = [Batch(*synthetic_batch(rng, 2, 2, 2000))]
    solver = Solver(ConvTasNet(cfg), tcfg, tr, cv)
    solver.iter_plot_interval = 1e9  # only the very first render may fire
    renders = []
    monkeypatch.setattr(viz, "plot_iter_curve",
                        lambda pts, path: renders.append(len(pts)))
    solver.train()
    # Every train iteration captured: 2 batches x 2 epochs, in order.
    assert [p["iter"] for p in solver.iter_history] == [1, 2, 3, 4]
    assert not solver._pending_iter  # all drained at sync points
    # One throttled render at the first drain, plus the unconditional
    # final render after training (so the persisted PNG always reflects
    # the complete history — ADVICE round-2 item 2).
    assert renders == [1, 4]
