import numpy as np
import pytest

from convtasnet_tpu.data.wavio import read_wav, resample, write_wav


def test_pcm16_roundtrip(tmp_path, rng):
    x = rng.uniform(-0.9, 0.9, 4000).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, x, 8000, "PCM_16")
    y, sr = read_wav(p)
    assert sr == 8000
    # write scales by 32767, read by 32768, plus rounding: ~1.5 LSB worst case
    np.testing.assert_allclose(y, x, atol=1.6 / 32768)


def test_float_roundtrip_lossless(tmp_path, rng):
    x = rng.standard_normal(1000).astype(np.float32)
    p = str(tmp_path / "f.wav")
    write_wav(p, x, 16000, "FLOAT")
    y, sr = read_wav(p)
    assert sr == 16000
    np.testing.assert_array_equal(y, x)


def test_stereo_mono_mix(tmp_path, rng):
    x = rng.standard_normal((500, 2)).astype(np.float32) * 0.4
    p = str(tmp_path / "s.wav")
    write_wav(p, x, 8000, "FLOAT")
    y, _ = read_wav(p)
    np.testing.assert_allclose(y, x.mean(axis=1), atol=1e-6)


def test_pcm16_clips_out_of_range(tmp_path):
    x = np.array([2.0, -2.0, 0.5], np.float32)
    p = str(tmp_path / "c.wav")
    write_wav(p, x, 8000, "PCM_16")
    y, _ = read_wav(p)
    assert abs(y[0] - 32767 / 32768) < 1e-5
    assert abs(y[1] + 1.0) < 1e-5


def test_read_with_resample(tmp_path):
    # 440 Hz tone at 16 kHz, read at 8 kHz -> still 440 Hz, half the samples.
    sr0, sr1, sec = 16000, 8000, 1.0
    t = np.arange(int(sr0 * sec)) / sr0
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32) * 0.5
    p = str(tmp_path / "r.wav")
    write_wav(p, x, sr0, "FLOAT")
    y, sr = read_wav(p, sample_rate=sr1)
    assert sr == sr1
    assert abs(len(y) - sr1 * sec) <= 1
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    peak_hz = np.argmax(spec) * sr1 / len(y)
    assert abs(peak_hz - 440) < 5


def test_resample_identity():
    x = np.random.default_rng(0).standard_normal(100).astype(np.float32)
    assert resample(x, 8000, 8000) is x


def test_rejects_non_wav(tmp_path):
    p = str(tmp_path / "bad.wav")
    with open(p, "wb") as f:
        f.write(b"not a wav file at all")
    with pytest.raises(ValueError):
        read_wav(p)
