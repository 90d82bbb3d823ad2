import os

import numpy as np
import pytest

from convtasnet_tpu.data.mixtures import (
    active_speech_level,
    create_mixtures,
    mix_pair,
    random_pair_list,
)
from convtasnet_tpu.data.wavio import read_wav, write_wav


def test_active_level_ignores_silence(rng):
    speech = rng.standard_normal(4000).astype(np.float32) * 0.2
    padded = np.concatenate([np.zeros(4000, np.float32), speech])
    # Active level of speech+silence ~ level of speech alone, NOT halved rms.
    lvl_speech = active_speech_level(speech)
    lvl_padded = active_speech_level(padded)
    assert abs(lvl_padded - lvl_speech) / lvl_speech < 0.1
    assert np.sqrt((padded**2).mean()) < 0.8 * lvl_padded


def test_mix_pair_snr(rng):
    a = rng.standard_normal(8000).astype(np.float32) * 0.1
    b = rng.standard_normal(8000).astype(np.float32) * 0.5
    mix, scaled, gain = mix_pair([a, b], [0.0, 5.0], mode="min")
    # After scaling, source 1 should sit 5 dB below source 0 in active level.
    la = active_speech_level(scaled[0])
    lb = active_speech_level(scaled[1])
    assert abs(20 * np.log10(la / lb) - 5.0) < 0.5
    np.testing.assert_allclose(mix, np.sum(scaled, axis=0), atol=1e-6)
    assert np.abs(mix).max() <= 0.9 + 1e-6


def test_mix_pair_modes(rng):
    a = rng.standard_normal(1000).astype(np.float32)
    b = rng.standard_normal(600).astype(np.float32)
    m_min, s_min, _ = mix_pair([a, b], [0, 0], "min")
    m_max, s_max, _ = mix_pair([a, b], [0, 0], "max")
    assert m_min.shape[0] == 600 and m_max.shape[0] == 1000
    assert np.allclose(s_max[1][600:], 0)
    with pytest.raises(ValueError):
        mix_pair([a, b], [0, 0], "median")


def test_create_mixtures_tree(tmp_path, rng):
    src_dir = tmp_path / "pool"
    os.makedirs(src_dir)
    for i in range(4):
        write_wav(str(src_dir / f"u{i}.wav"),
                  rng.standard_normal(3000).astype(np.float32) * 0.2,
                  8000, "FLOAT")
    pairs = random_pair_list([str(src_dir)], n_mixtures=3, C=2, seed=1)
    out = tmp_path / "mixed"
    meta = create_mixtures(pairs, str(out), mode="min")
    assert len(meta) == 3
    for m in meta:
        mix, sr = read_wav(str(out / "mix" / (m["name"] + ".wav")))
        s1, _ = read_wav(str(out / "s1" / (m["name"] + ".wav")))
        s2, _ = read_wav(str(out / "s2" / (m["name"] + ".wav")))
        assert sr == 8000 and len(mix) == m["n_samples"]
        np.testing.assert_allclose(mix, s1 + s2, atol=2.5 / 32768)


def test_pipeline_consumes_created_mixtures(tmp_path, rng):
    # The created tree must flow through preprocess + AudioDataset.
    from convtasnet_tpu.data.dataset import AudioDataset
    from convtasnet_tpu.data.manifest import preprocess_one_dir

    src_dir = tmp_path / "pool"
    os.makedirs(src_dir)
    for i in range(4):
        write_wav(str(src_dir / f"u{i}.wav"),
                  rng.standard_normal(9000).astype(np.float32) * 0.2,
                  8000, "FLOAT")
    out = tmp_path / "mixed"
    create_mixtures(random_pair_list([str(src_dir)], 4, seed=2), str(out))
    for spk in ["mix", "s1", "s2"]:
        preprocess_one_dir(str(out / spk), str(tmp_path / "json"), spk, 8000)
    ds = AudioDataset(str(tmp_path / "json"), batch_size=4, segment=1.0)
    b = ds.load_batch(0)
    np.testing.assert_allclose(b.mixture, b.source.sum(1), atol=1e-3)


def test_random_pairs_use_distinct_speakers(tmp_path):
    """MERL-list semantics: the C sources of one mixture never share a
    speaker (and never a file), given enough speakers."""
    import os
    from convtasnet_tpu.data.mixtures import random_pair_list_from_files
    files = []
    for spk in ["011", "012", "013"]:
        d = tmp_path / spk
        d.mkdir()
        for u in range(3):
            p = d / f"u{u}.wav"
            p.write_bytes(b"")
            files.append(str(p))
    pairs = random_pair_list_from_files(files, 50, C=2, seed=3)
    assert len(pairs) == 50
    for paths, snrs in pairs:
        spk = [os.path.basename(os.path.dirname(p)) for p in paths]
        assert spk[0] != spk[1]
        assert paths[0] != paths[1]
        assert snrs[0] == 0.0 and 0.0 <= snrs[1] <= 5.0


# ---------------------------------------------------------------------------
# ITU-T P.56 active speech level (round-5: the MERL activlev parity fix)
# ---------------------------------------------------------------------------

def _gated_speech(rng, n_bursts=6, burst=8000, gap=8000, amp=0.3):
    """Speech-like bursts (harmonic + envelope) separated by silence."""
    from convtasnet_tpu.data.synthetic import synthetic_sources

    segs = []
    for _ in range(n_bursts):
        s = synthetic_sources(rng, 1, burst)[0]
        segs += [amp * s / (np.sqrt((s**2).mean()) + 1e-12),
                 np.zeros(gap, np.float32)]
    return np.concatenate(segs).astype(np.float32)


def test_p56_stationary_noise_is_fully_active(rng):
    from convtasnet_tpu.data.mixtures import active_speech_level_p56

    x = (rng.standard_normal(32000) * 0.1).astype(np.float32)
    lvl, act = active_speech_level_p56(x, 8000)
    rms = float(np.sqrt((x**2).mean()))
    assert act > 0.95
    assert abs(20 * np.log10(lvl / rms)) < 0.5


def test_p56_gated_bursts_level_and_activity(rng):
    """50%-duty bursts: the active level must track the BURST RMS (not
    the halved whole-signal RMS) and the activity factor ~ the duty cycle
    plus the 0.2 s hangover per burst."""
    from convtasnet_tpu.data.mixtures import active_speech_level_p56

    x = _gated_speech(rng, n_bursts=6, burst=8000, gap=8000, amp=0.3)
    lvl, act = active_speech_level_p56(x, 8000)
    burst_rms = 0.3
    # The hangover admits ~0.2 s of trailing silence per burst into the
    # active set, so the level sits slightly BELOW the burst RMS (~1 dB
    # here) — never anywhere near the -3 dB a whole-signal RMS would give.
    assert abs(20 * np.log10(lvl / burst_rms)) < 1.5
    assert 0.45 < act < 0.72  # 0.5 duty + hangover/envelope tails


def test_p56_scale_invariant_level_ratio(rng):
    from convtasnet_tpu.data.mixtures import active_speech_level_p56

    x = _gated_speech(rng)
    l1, a1 = active_speech_level_p56(x, 8000)
    l2, a2 = active_speech_level_p56(7.3 * x, 8000)
    assert abs(l2 / l1 - 7.3) < 1e-3
    assert abs(a1 - a2) < 1e-6


def test_p56_silence_padding_invariant(rng):
    from convtasnet_tpu.data.mixtures import active_speech_level_p56

    x = _gated_speech(rng, n_bursts=4)
    padded = np.concatenate([np.zeros(24000, np.float32), x,
                             np.zeros(24000, np.float32)])
    l1, a1 = active_speech_level_p56(x, 8000)
    l2, a2 = active_speech_level_p56(padded, 8000)
    assert abs(20 * np.log10(l2 / l1)) < 0.2
    assert a2 < a1  # activity drops, level does not


def test_p56_degenerate_inputs():
    from convtasnet_tpu.data.mixtures import active_speech_level_p56

    lvl, act = active_speech_level_p56(np.zeros(1000, np.float32), 8000)
    assert act == 0.0 and lvl <= 1e-9
    lvl, act = active_speech_level_p56(np.ones(4000, np.float32), 8000)
    assert act == 1.0 and abs(lvl - 1.0) < 1e-6
    lvl, act = active_speech_level_p56(np.zeros(0, np.float32), 8000)
    assert act == 0.0


def test_mix_pair_snr_on_gated_speech(rng):
    """The SNR contract must hold by ACTIVE level on pause-laden speech —
    exactly the case where plain RMS scaling is wrong by the duty cycle."""
    from convtasnet_tpu.data.mixtures import active_speech_level_p56

    a = _gated_speech(rng, n_bursts=4, burst=6000, gap=9000, amp=0.2)
    b = _gated_speech(rng, n_bursts=5, burst=9000, gap=4000, amp=0.5)
    T = min(len(a), len(b))
    mix, scaled, gain = mix_pair([a[:T], b[:T]], [0.0, 4.0], mode="min")
    la, _ = active_speech_level_p56(scaled[0], 8000)
    lb, _ = active_speech_level_p56(scaled[1], 8000)
    assert abs(20 * np.log10(la / lb) - 4.0) < 0.3
