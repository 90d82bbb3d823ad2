"""Multi-speaker mixture creation (the MERL create-speaker-mixtures port).

The reference ships MATLAB scripts (tools/create-speaker-mixtures.zip,
tools/Makefile:16-17) that build wsj0-{2,3}mix: pairs of utterances mixed
at a random target SNR in [0, 5] dB after speech-active-level
normalization, in 'min' (truncate to shorter) and 'max' (pad to longer)
modes. This module provides the same capability in Python:

* activity-weighted speech level (a practical stand-in for ITU-T P.56
  active speech level: RMS over frames above a -50 dBfs-relative energy
  threshold)
* pairing list either provided explicitly (path_a, path_b, snr_db) — the
  MERL recipe distributes such .txt lists — or generated from directories
  with a seeded RNG
* writes mix/s1/../sC trees compatible with preprocess/AudioDataset and
  returns the per-mixture metadata.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .wavio import read_wav, write_wav


def active_speech_level(x: np.ndarray, frame: int = 200,
                        threshold_db: float = -50.0) -> float:
    """RMS over frames whose energy is within threshold_db of the peak
    frame — ignores silence when scaling, like the MERL activlev usage."""
    n = (len(x) // frame) * frame
    if n == 0:
        return float(np.sqrt(np.mean(x**2)) + 1e-12)
    frames = x[:n].reshape(-1, frame)
    energy = np.mean(frames**2, axis=1)
    peak = energy.max()
    active = energy >= peak * (10 ** (threshold_db / 10))
    lvl = np.sqrt(energy[active].mean()) if active.any() else np.sqrt(energy.mean())
    return float(lvl + 1e-12)


def mix_pair(
    sources: Sequence[np.ndarray],
    snrs_db: Sequence[float],
    mode: str = "min",
) -> Tuple[np.ndarray, List[np.ndarray], float]:
    """Scale each source to its target SNR (relative to source 0) by active
    speech level, then sum. mode: 'min' truncates to the shortest, 'max'
    zero-pads to the longest. Returns (mixture, scaled_sources, gain) where
    gain is the common factor applied to keep |mix| <= 0.9."""
    assert len(sources) == len(snrs_db)
    scaled = []
    base_lvl = active_speech_level(sources[0])
    for x, snr in zip(sources, snrs_db):
        lvl = active_speech_level(x)
        target = base_lvl * (10 ** (-snr / 20.0))
        scaled.append(x * (target / lvl))
    if mode == "min":
        T = min(len(x) for x in scaled)
        scaled = [x[:T] for x in scaled]
    elif mode == "max":
        T = max(len(x) for x in scaled)
        scaled = [np.pad(x, (0, T - len(x))) for x in scaled]
    else:
        raise ValueError(f"mode must be min|max, got {mode}")
    mix = np.sum(scaled, axis=0)
    peak = np.abs(mix).max()
    gain = 0.9 / peak if peak > 0.9 else 1.0
    return mix * gain, [x * gain for x in scaled], gain


def create_mixtures(
    pair_list: Sequence[Tuple[Sequence[str], Sequence[float]]],
    out_dir: str,
    sample_rate: int = 8000,
    mode: str = "min",
    subtype: str = "PCM_16",
) -> List[dict]:
    """Materialize a mixture dataset.

    pair_list: sequence of (paths [C], snrs_db [C]); snr of source 0 is
    conventionally 0. Output tree: out_dir/{mix,s1..sC}/<name>.wav with
    name = '_'.join of source basenames + snrs (MERL naming convention).
    """
    meta = []
    for paths, snrs in pair_list:
        C = len(paths)
        srcs = [read_wav(p, sample_rate=sample_rate)[0] for p in paths]
        mix, scaled, gain = mix_pair(srcs, snrs, mode)
        stem = "_".join(
            f"{os.path.splitext(os.path.basename(p))[0]}_{snr:.4g}"
            for p, snr in zip(paths, snrs)
        )
        write_wav(os.path.join(out_dir, "mix", stem + ".wav"), mix,
                  sample_rate, subtype)
        for c in range(C):
            write_wav(os.path.join(out_dir, f"s{c+1}", stem + ".wav"),
                      scaled[c], sample_rate, subtype)
        meta.append({"name": stem, "paths": list(paths),
                     "snrs_db": list(snrs), "gain": gain,
                     "n_samples": int(len(mix))})
    return meta


def random_pair_list_from_files(
    files: Sequence[str],
    n_mixtures: int,
    C: int = 2,
    snr_range: Tuple[float, float] = (0.0, 5.0),
    seed: int = 0,
    speaker_of=None,
) -> List[Tuple[List[str], List[float]]]:
    """Seeded random C-way pairing over a flat utterance list.

    Like the MERL mixture lists, the C sources of a mixture always come
    from C *different* speakers (speaker_of: path -> id, default the
    parent directory name; falls back to distinct files when fewer than C
    speakers exist). First source gets SNR 0 dB, the rest a uniform draw
    in snr_range (the wsj0-mix convention).
    """
    if speaker_of is None:
        speaker_of = lambda p: os.path.basename(os.path.dirname(p))
    rng = np.random.default_rng(seed)
    files = sorted(files)
    by_spk: dict = {}
    for f in files:
        by_spk.setdefault(speaker_of(f), []).append(f)
    speakers = sorted(by_spk)
    distinct_spk = len(speakers) >= C
    if not distinct_spk and len(files) < C:
        raise ValueError(f"need at least {C} utterances to build mixtures")
    out = []
    for _ in range(n_mixtures):
        if distinct_spk:
            chosen = rng.choice(len(speakers), size=C, replace=False)
            paths = [str(rng.choice(by_spk[speakers[i]])) for i in chosen]
        else:
            chosen = rng.choice(len(files), size=C, replace=False)
            paths = [files[i] for i in chosen]
        snrs = [0.0] + [float(rng.uniform(*snr_range)) for _ in range(C - 1)]
        out.append((paths, snrs))
    return out


def random_pair_list(
    wav_dirs: Sequence[str],
    n_mixtures: int,
    C: int = 2,
    snr_range: Tuple[float, float] = (0.0, 5.0),
    seed: int = 0,
) -> List[Tuple[List[str], List[float]]]:
    """random_pair_list_from_files over the wavs found under wav_dirs
    (recursive). Speaker id is the wav's parent directory."""
    files = [
        os.path.join(r, f)
        for d in wav_dirs
        for r, _, fs in os.walk(d)
        for f in fs if f.endswith(".wav")
    ]
    return random_pair_list_from_files(files, n_mixtures, C=C,
                                       snr_range=snr_range, seed=seed)
