"""Native C++ wav decoder parity with the Python codec."""

import os

import numpy as np
import pytest

from convtasnet_tpu.data import native_loader
from convtasnet_tpu.data.wavio import read_wav, write_wav

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="no C++ toolchain"
)


def test_native_matches_python_pcm16(tmp_path, rng):
    paths = []
    for i in range(6):
        x = rng.uniform(-0.9, 0.9, 1000 + 100 * i).astype(np.float32)
        p = str(tmp_path / f"p{i}.wav")
        write_wav(p, x, 8000, "PCM_16")
        paths.append(p)
    buf, lens, rates = native_loader.decode_batch(paths, 2000, n_threads=3)
    assert (rates == 8000).all()
    for i, p in enumerate(paths):
        want, _ = read_wav(p)
        assert lens[i] == want.size
        np.testing.assert_allclose(buf[i, : lens[i]], want, atol=1e-6)


def test_native_matches_python_float(tmp_path, rng):
    x = rng.standard_normal(777).astype(np.float32)
    p = str(tmp_path / "f.wav")
    write_wav(p, x, 16000, "FLOAT")
    buf, lens, rates = native_loader.decode_batch([p], 1000)
    assert rates[0] == 16000 and lens[0] == 777
    np.testing.assert_array_equal(buf[0, :777], x)


def test_native_stereo_mixdown(tmp_path, rng):
    x = rng.standard_normal((300, 2)).astype(np.float32) * 0.3
    p = str(tmp_path / "s.wav")
    write_wav(p, x, 8000, "FLOAT")
    buf, lens, _ = native_loader.decode_batch([p], 400)
    np.testing.assert_allclose(buf[0, :300], x.mean(1), atol=1e-6)


def test_native_reports_bad_file(tmp_path):
    p = str(tmp_path / "bad.wav")
    with open(p, "wb") as f:
        f.write(b"garbage data here that is not a wav")
    with pytest.raises(RuntimeError, match="decode failed"):
        native_loader.decode_batch([p], 100)


def test_dataset_uses_native_and_matches_python(tmp_path, rng):
    from convtasnet_tpu.data.dataset import AudioDataset
    from convtasnet_tpu.data.synthetic import make_wav_dataset

    json_root = make_wav_dataset(str(tmp_path), n_utts=3, C=2, min_sec=1.0,
                                 max_sec=2.0, seed=4, splits=("tr",))
    ds = AudioDataset(os.path.join(json_root, "tr"), batch_size=4, segment=1.0)
    b_native = ds.load_batch(0)
    ds.disable_native = True
    b_python = ds.load_batch(0)
    np.testing.assert_allclose(b_native.mixture, b_python.mixture, atol=1e-6)
    np.testing.assert_allclose(b_native.source, b_python.source, atol=1e-6)


def test_native_concurrent_callers(tmp_path, rng):
    """Hammer the persistent pool from many Python threads (the DataLoader
    calls it concurrently); every batch must decode exactly."""
    import concurrent.futures as futures

    paths, refs = [], []
    for i in range(8):
        x = rng.uniform(-0.8, 0.8, 500 + 37 * i).astype(np.float32)
        p = str(tmp_path / f"c{i}.wav")
        write_wav(p, x, 8000, "FLOAT")
        paths.append(p)
        refs.append(x)

    def job(seed):
        order = np.random.default_rng(seed).permutation(8)
        sel = [paths[j] for j in order]
        buf, lens, rates = native_loader.decode_batch(sel, 1000, n_threads=3)
        for k, j in enumerate(order):
            assert lens[k] == refs[j].size
            np.testing.assert_array_equal(buf[k, : lens[k]], refs[j])
        return True

    with futures.ThreadPoolExecutor(6) as pool:
        results = list(pool.map(job, range(60)))
    assert all(results)
