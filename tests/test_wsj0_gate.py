"""Ready-to-fire WSJ0 gate (VERDICT round-3 item 8).

The 15.3 dB BASELINE row needs the LDC WSJ0 corpus, absent in this
environment. These tests assert the WIRING so the one documented command
(docs/data.md: `WSJ0_ROOT=... python recipes/wsj0/run.py --stage 0`)
launches the full pipeline unmodified the moment the corpus appears:

  * detection-logic tests run everywhere (fake corpus trees);
  * the real-corpus smoke is skipped-by-default and activates
    automatically on any machine where `detect_sphere_root()` finds the
    LDC layout — it converts a handful of utterances and checks wavs.
"""

import os
import sys

import pytest

_RECIPE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "recipes", "wsj0")
sys.path.insert(0, _RECIPE_DIR)

from run import build_parser, detect_sphere_root  # noqa: E402


def test_detect_explicit_path_passthrough(tmp_path):
    assert detect_sphere_root(str(tmp_path)) == str(tmp_path)
    assert detect_sphere_root("") == ""


def test_detect_via_env_var(tmp_path, monkeypatch):
    root = tmp_path / "corpus"
    (root / "si_tr_s" / "011").mkdir(parents=True)
    monkeypatch.setenv("WSJ0_ROOT", str(root))
    assert detect_sphere_root("auto") == str(root)


def test_detect_nested_wsj0_dir(tmp_path, monkeypatch):
    root = tmp_path / "LDC93S6A"
    (root / "wsj0" / "si_dt_05").mkdir(parents=True)
    monkeypatch.setenv("WSJ0_ROOT", str(root))
    assert detect_sphere_root("auto") == str(root / "wsj0")


def test_detect_absent_returns_empty(tmp_path, monkeypatch):
    monkeypatch.setenv("WSJ0_ROOT", str(tmp_path / "nope"))
    monkeypatch.chdir(tmp_path)  # keep relative candidates empty too
    assert detect_sphere_root("auto") == ""


def test_paper_config_is_the_default():
    """The zero-edit command must run the BASELINE recipe: paper config,
    official mixture counts, full plateau-policy training."""
    a = build_parser().parse_args([])
    assert (a.N, a.L, a.B, a.H, a.P, a.X, a.R, a.C) == (
        256, 20, 256, 512, 3, 8, 4, 2)
    assert a.norm_type == "gLN" and not a.causal
    assert a.epochs == 100 and a.half_lr and a.early_stop
    assert a.optimizer == "adam" and a.lr == 1e-3 and a.max_norm == 5.0
    assert (a.n_mix_tr, a.n_mix_cv, a.n_mix_tt) == (20000, 5000, 3000)
    assert a.mix_mode == "min" and a.sample_rate == 8000
    assert a.sphere_root == "auto"  # stage 0 self-gates on detection


@pytest.mark.slow
@pytest.mark.skipif(not detect_sphere_root("auto"),
                    reason="LDC WSJ0 corpus not present (see docs/data.md)")
def test_real_corpus_stage0_smoke(tmp_path):
    """Activates automatically where the corpus exists: convert one split
    dir's first utterances and create a few mixtures end to end."""
    from convtasnet_tpu.data.sphio import convert_sphere_dir

    root = detect_sphere_root("auto")
    split = next(s for s in ("si_tr_s", "si_dt_05", "si_et_05")
                 if os.path.isdir(os.path.join(root, s)))
    src = os.path.join(root, split)
    spk = next(os.path.join(src, d) for d in sorted(os.listdir(src))
               if os.path.isdir(os.path.join(src, d)))
    out = str(tmp_path / "wav")
    wavs = convert_sphere_dir(spk, out, n_threads=2)
    assert wavs, f"no sphere files converted from {spk}"
    from convtasnet_tpu.data.wavio import read_wav

    y, sr = read_wav(wavs[0])
    assert len(y) > 0 and sr in (8000, 16000)
