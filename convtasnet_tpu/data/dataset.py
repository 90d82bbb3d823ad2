"""Bucketed / segmented audio datasets and a prefetching loader.

Reproduces the reference pipeline semantics exactly (data.py:32-299) with a
TPU-first twist — training batches come out at one static shape:

* length-sorted bucketing (desc) over manifest entries (data.py:53-57)
* segment mode: utterances shorter than the segment are dropped
  (data.py:62-67); each utterance contributes ceil(len/segment) segments
  toward batch_size, with the reference's skip-first-oversized rule
  (data.py:69-94); loading chops non-overlapping windows plus a tail
  window [-segment:] (data.py:262-267). Every emitted item is exactly
  segment_len samples -> one static XLA shape all epoch.
* full-utterance mode (segment < 0): batches of batch_size, skipping
  utterances longer than cv_maxlen (data.py:95-112), zero-padded to the
  batch max (data.py:293-299) or optionally to a multiple (pad_to_multiple)
  to bound the number of distinct compiled shapes on TPU.

The loader overlaps host wav decode with device compute via a thread pool
and a bounded prefetch queue (the reference leans on torch DataLoader
workers, train.py:109-113)."""

from __future__ import annotations

import concurrent.futures as futures
import os
import queue
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .manifest import load_manifest
from .wavio import read_wav


class Batch:
    """One training/eval batch: mixture [B, T], lengths [B], sources [B, C, T]."""

    __slots__ = ("mixture", "lengths", "source", "filenames", "__weakref__")

    def __init__(self, mixture, lengths, source=None, filenames=None):
        self.mixture = mixture
        self.lengths = lengths
        self.source = source
        self.filenames = filenames


def _sorted_infos(json_dir: str, speakers: Sequence[str]):
    infos = {s: load_manifest(os.path.join(json_dir, s + ".json")) for s in speakers}
    order = sorted(
        range(len(infos["mix"])), key=lambda i: int(infos["mix"][i][1]), reverse=True
    )
    return {s: [v[i] for i in order] for s, v in infos.items()}


class AudioDataset:
    """Minibatch plan over a manifest directory (mix.json + s1..sC.json)."""

    def __init__(
        self,
        json_dir: str,
        batch_size: int,
        sample_rate: int = 8000,
        segment: float = 4.0,
        cv_maxlen: float = 8.0,
        num_speakers: int = 2,
        pad_to_multiple: int = 1,
    ):
        self.sample_rate = sample_rate
        self.num_speakers = num_speakers
        self.pad_to_multiple = pad_to_multiple
        self.segment_len = int(segment * sample_rate) if segment >= 0 else -1
        speakers = ["mix"] + [f"s{i+1}" for i in range(num_speakers)]
        infos = _sorted_infos(json_dir, speakers)
        mix = infos["mix"]

        batches: List[dict] = []
        if self.segment_len > 0:
            seg = self.segment_len
            dropped = sum(1 for _, n in mix if int(n) < seg)
            self.num_dropped = dropped
            start = 0
            while start < len(mix):
                num_segments = 0
                end = start
                idxs: List[int] = []
                while num_segments < batch_size and end < len(mix):
                    utt_len = int(mix[end][1])
                    if utt_len >= seg:
                        num_segments += -(-utt_len // seg)
                        if num_segments > batch_size:
                            # Reference rule: an oversized first utterance is
                            # skipped outright (data.py:79-83).
                            if start == end:
                                end += 1
                            break
                        idxs.append(end)
                    end += 1
                if idxs:
                    batches.append({"idxs": idxs})
                if end == len(mix):
                    break
                start = end
        else:
            self.num_dropped = 0
            maxlen = cv_maxlen * sample_rate
            start = 0
            while start < len(mix):
                end = min(len(mix), start + batch_size)
                if int(mix[start][1]) > maxlen:
                    start = end
                    continue
                batches.append({"idxs": list(range(start, end))})
                if end == len(mix):
                    break
                start = end
        self.infos = infos
        self.speakers = speakers
        self.batches = batches

    def __len__(self):
        return len(self.batches)

    def _decode_utts(self, idxs):
        """Decode all files for the given utterances -> {(speaker, j): [T]}.

        Uses the native C++ thread-pool decoder when available; any file
        whose on-disk rate differs from the target is re-read through the
        Python codec (which resamples)."""
        sr = self.sample_rate
        jobs = [(s, j) for j in idxs for s in self.speakers]
        out = {}
        native_ok = False
        if not getattr(self, "disable_native", False):
            from . import native_loader

            if native_loader.available():
                paths = [self.infos[s][j][0] for s, j in jobs]
                max_len = max(int(self.infos[s][j][1]) for s, j in jobs)
                try:
                    buf, lens, rates = native_loader.decode_batch(paths, max_len)
                    for k, (s, j) in enumerate(jobs):
                        if int(rates[k]) == sr:
                            out[(s, j)] = buf[k, : int(lens[k])]
                    native_ok = True
                except RuntimeError:
                    out = {}
        for s, j in jobs:
            if (s, j) not in out:
                out[(s, j)], _ = read_wav(self.infos[s][j][0], sample_rate=sr)
        return out

    def load_batch(self, i: int) -> Batch:
        """Decode one planned minibatch into padded numpy arrays."""
        idxs = self.batches[i]["idxs"]
        sr = self.sample_rate
        C = self.num_speakers
        mixtures: List[np.ndarray] = []
        sources: List[np.ndarray] = []
        decoded = self._decode_utts(idxs)
        for j in idxs:
            mix_path, n = self.infos["mix"][j]
            for s in self.speakers[1:]:
                assert int(self.infos[s][j][1]) == int(n), "length mismatch in manifests"
            mix = decoded[("mix", j)]
            srcs = np.stack(
                [decoded[(s, j)] for s in self.speakers[1:]], axis=1
            )  # [T, C]
            T = mix.shape[0]
            seg = self.segment_len
            if seg > 0:
                for k in range(0, T - seg + 1, seg):
                    mixtures.append(mix[k : k + seg])
                    sources.append(srcs[k : k + seg])
                if T % seg != 0:
                    mixtures.append(mix[-seg:])
                    sources.append(srcs[-seg:])
            else:
                mixtures.append(mix)
                sources.append(srcs)
        lengths = np.array([m.shape[0] for m in mixtures], dtype=np.int32)
        maxT = int(lengths.max())
        m = self.pad_to_multiple
        if m > 1:
            maxT = -(-maxT // m) * m
        B = len(mixtures)
        mix_pad = np.zeros((B, maxT), np.float32)
        src_pad = np.zeros((B, C, maxT), np.float32)
        for b in range(B):
            mix_pad[b, : lengths[b]] = mixtures[b]
            src_pad[b, :, : lengths[b]] = sources[b].T
        return Batch(mix_pad, lengths, src_pad)


class EvalDataset:
    """Mixture-only dataset for inference (data.py:162-199). Accepts a
    directory of wavs (manifested on the fly) or an existing mix.json."""

    def __init__(self, mix_dir: Optional[str] = None, mix_json: Optional[str] = None,
                 batch_size: int = 1, sample_rate: int = 8000,
                 pad_to_multiple: int = 1):
        assert mix_dir is not None or mix_json is not None
        self.pad_to_multiple = pad_to_multiple
        if mix_dir is not None:
            from .manifest import preprocess_one_dir

            mix_json = preprocess_one_dir(mix_dir, mix_dir, "mix", sample_rate)
        infos = sorted(load_manifest(mix_json), key=lambda e: int(e[1]), reverse=True)
        self.infos = infos
        self.sample_rate = sample_rate
        self.batches = [
            list(range(s, min(len(infos), s + batch_size)))
            for s in range(0, len(infos), batch_size)
        ]

    def __len__(self):
        return len(self.batches)

    def load_batch(self, i: int) -> Batch:
        idxs = self.batches[i]
        mixtures, names = [], []
        for j in idxs:
            path, _ = self.infos[j]
            x, _ = read_wav(path, sample_rate=self.sample_rate)
            mixtures.append(x)
            names.append(path)
        lengths = np.array([m.shape[0] for m in mixtures], dtype=np.int32)
        maxT = int(lengths.max())
        if self.pad_to_multiple > 1:
            # Bound the number of distinct compiled shapes: without this,
            # batch_size=1 inference compiles once PER UTTERANCE length.
            maxT = -(-maxT // self.pad_to_multiple) * self.pad_to_multiple
        mix_pad = np.zeros((len(mixtures), maxT), np.float32)
        for b, m in enumerate(mixtures):
            mix_pad[b, : lengths[b]] = m
        return Batch(mix_pad, lengths, filenames=names)


class DataLoader:
    """Threaded prefetching iterator over an AudioDataset/EvalDataset."""

    def __init__(self, dataset, shuffle: bool = False, num_workers: int = 2,
                 prefetch: int = 2, seed: int = 0):
        self.dataset = dataset
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self._epoch = 0
        self._seed = seed

    def __len__(self):
        return len(self.dataset)

    def set_epoch(self, epoch: int) -> None:
        """Pin the shuffle epoch so iteration order is a pure function of
        (seed, epoch) — the deterministic-replay hook mid-epoch resume
        relies on (reference torch DataLoader has no analogue)."""
        self._epoch = epoch

    def __iter__(self) -> Iterator[Batch]:
        return self.iter_from(0)

    def iter_from(self, skip: int) -> Iterator[Batch]:
        """Iterate, dropping the first `skip` planned batches without
        decoding them (mid-epoch checkpoint resume)."""
        order = list(range(len(self.dataset)))
        if self.shuffle:
            rng = np.random.default_rng(self._seed + self._epoch)
            rng.shuffle(order)
        order = order[skip:]
        self._epoch += 1

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with futures.ThreadPoolExecutor(self.num_workers) as pool:
                pending = [pool.submit(self.dataset.load_batch, i) for i in order[: self.prefetch + 1]]
                next_submit = self.prefetch + 1
                for k in range(len(order)):
                    if stop.is_set():
                        for p in pending:
                            if p is not None:
                                p.cancel()
                        return
                    try:
                        q.put(pending[k].result())
                    except Exception as e:  # surface loader errors to consumer
                        q.put(e)
                        return
                    # Release the completed future: a Future keeps its result
                    # (a decoded, padded batch) alive, so retaining the whole
                    # list would pin every batch of the epoch in host memory.
                    pending[k] = None
                    if next_submit < len(order):
                        pending.append(pool.submit(self.dataset.load_batch, order[next_submit]))
                        next_submit += 1
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
