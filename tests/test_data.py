import json
import os

import numpy as np
import pytest

from convtasnet_tpu.data.dataset import AudioDataset, DataLoader, EvalDataset
from convtasnet_tpu.data.manifest import load_manifest, preprocess_one_dir
from convtasnet_tpu.data.synthetic import make_wav_dataset
from convtasnet_tpu.data.wavio import write_wav


@pytest.fixture(scope="module")
def wav_root(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth")
    json_root = make_wav_dataset(str(out), n_utts=6, C=2, sample_rate=8000,
                                 min_sec=1.0, max_sec=3.0, seed=1)
    return json_root


def test_manifest_counts_samples(tmp_path, rng):
    d = tmp_path / "wavs"
    os.makedirs(d)
    for i, n in enumerate([800, 1600]):
        write_wav(str(d / f"u{i}.wav"), rng.standard_normal(n).astype(np.float32) * 0.1,
                  8000, "FLOAT")
    mpath = preprocess_one_dir(str(d), str(tmp_path), "mix", 8000)
    infos = load_manifest(mpath)
    assert sorted(n for _, n in infos) == [800, 1600]


def test_segment_mode_static_shapes(wav_root):
    ds = AudioDataset(os.path.join(wav_root, "tr"), batch_size=4,
                      sample_rate=8000, segment=1.0)
    assert len(ds) > 0
    for i in range(len(ds)):
        b = ds.load_batch(i)
        # every item is exactly segment_len -> single static XLA shape
        assert b.mixture.shape[1] == 8000
        assert (b.lengths == 8000).all()
        assert b.source.shape == (b.mixture.shape[0], 2, 8000)
        # mixture == sum of sources for synthetic data
        np.testing.assert_allclose(b.mixture, b.source.sum(1), atol=1e-5)


def test_segment_packing_counts_segments_not_utts(tmp_path, rng):
    # Three 2.5 s utts at segment=1 s: each contributes ceil(2.5)=3 segments;
    # with batch_size=6 the reference packing takes two utts per minibatch.
    d = tmp_path / "w"
    for s in ["mix", "s1", "s2"]:
        os.makedirs(d / s)
    for i in range(3):
        for s in ["mix", "s1", "s2"]:
            write_wav(str(d / s / f"u{i}.wav"),
                      rng.standard_normal(20000).astype(np.float32) * 0.1,
                      8000, "FLOAT")
    for s in ["mix", "s1", "s2"]:
        preprocess_one_dir(str(d / s), str(tmp_path / "j"), s, 8000)
    ds = AudioDataset(str(tmp_path / "j"), batch_size=6, sample_rate=8000, segment=1.0)
    assert len(ds) == 2
    assert len(ds.batches[0]["idxs"]) == 2
    assert len(ds.batches[1]["idxs"]) == 1
    b = ds.load_batch(0)
    assert b.mixture.shape[0] == 6  # 3 segments x 2 utts


def test_short_utterances_dropped(tmp_path, rng):
    d = tmp_path / "w"
    for s in ["mix", "s1", "s2"]:
        os.makedirs(d / s)
    for i, n in enumerate([4000, 12000]):  # 0.5 s and 1.5 s
        for s in ["mix", "s1", "s2"]:
            write_wav(str(d / s / f"u{i}.wav"),
                      rng.standard_normal(n).astype(np.float32) * 0.1, 8000, "FLOAT")
    for s in ["mix", "s1", "s2"]:
        preprocess_one_dir(str(d / s), str(tmp_path / "j"), s, 8000)
    ds = AudioDataset(str(tmp_path / "j"), batch_size=4, sample_rate=8000, segment=1.0)
    assert ds.num_dropped == 1
    b = ds.load_batch(0)
    # 1.5 s utt -> one full window + one tail window [-seg:]
    assert b.mixture.shape[0] == 2


def test_full_utterance_mode_skips_long(wav_root):
    ds = AudioDataset(os.path.join(wav_root, "cv"), batch_size=2,
                      sample_rate=8000, segment=-1, cv_maxlen=2.0)
    for i in range(len(ds)):
        b = ds.load_batch(i)
        assert (b.lengths <= 16000).all()
        # padded to batch max
        assert b.mixture.shape[1] == b.lengths.max()


def test_pad_to_multiple(wav_root):
    ds = AudioDataset(os.path.join(wav_root, "cv"), batch_size=2,
                      sample_rate=8000, segment=-1, cv_maxlen=4.0,
                      pad_to_multiple=4000)
    for i in range(len(ds)):
        assert ds.load_batch(i).mixture.shape[1] % 4000 == 0


def test_loader_prefetch_and_shuffle(wav_root):
    ds = AudioDataset(os.path.join(wav_root, "tr"), batch_size=4,
                      sample_rate=8000, segment=1.0)
    loader = DataLoader(ds, shuffle=True, num_workers=2, seed=0)
    n1 = sum(1 for _ in loader)
    n2 = sum(1 for _ in loader)
    assert n1 == n2 == len(ds)


def test_eval_dataset_from_dir(wav_root):
    mix_dir = os.path.join(os.path.dirname(wav_root), "wav", "tt", "mix")
    ds = EvalDataset(mix_dir=mix_dir, batch_size=2, sample_rate=8000)
    total = 0
    for i in range(len(ds)):
        b = ds.load_batch(i)
        assert b.filenames is not None
        total += len(b.filenames)
    assert total == 6
    assert os.path.exists(os.path.join(mix_dir, "mix.json"))


def test_eval_dataset_pad_to_multiple(tmp_path):
    """pad_to_multiple bounds the distinct batch shapes so batch-1
    inference compiles O(1) programs instead of one per utterance length
    (the TPU eval-throughput bug class)."""
    from convtasnet_tpu.data.dataset import EvalDataset
    from convtasnet_tpu.data.wavio import write_wav

    rng = np.random.default_rng(0)
    d = tmp_path / "mix"
    d.mkdir()
    for i, n in enumerate([3100, 4200, 5300, 6400]):
        write_wav(str(d / f"u{i}.wav"), rng.normal(size=n).astype(np.float32) * 0.1,
                  8000)
    ds = EvalDataset(mix_dir=str(d), batch_size=1, sample_rate=8000,
                     pad_to_multiple=4000)
    shapes = set()
    for i in range(len(ds)):
        b = ds.load_batch(i)
        assert b.mixture.shape[1] % 4000 == 0
        assert b.mixture.shape[1] >= int(b.lengths.max())
        shapes.add(b.mixture.shape[1])
    assert shapes == {4000, 8000}


def test_loader_releases_completed_batches(wav_root):
    """The producer must not retain completed futures: at any point at most
    prefetch+queue batches may be alive, not the whole epoch (the round-1
    future-retention leak)."""
    import gc
    import weakref

    ds = AudioDataset(os.path.join(wav_root, "tr"), batch_size=2,
                      sample_rate=8000, segment=1.0)
    loader = DataLoader(ds, num_workers=1, prefetch=1)
    refs = []
    for batch in loader:
        refs.append(weakref.ref(batch))
        del batch
        gc.collect()
        # Everything the consumer has dropped except a small prefetch window
        # must be collectable.
        alive = sum(1 for r in refs if r() is not None)
        assert alive <= 1 + loader.prefetch + 2, f"{alive} batches retained"
    gc.collect()
    assert all(r() is None for r in refs)
