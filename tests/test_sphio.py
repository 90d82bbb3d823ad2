"""SPHERE + shorten decoder tests (native/sphio.cpp via data/sphio.py).

Round-trips real shorten-v2 bitstreams produced by the independent
test-side encoder (tests/shorten_encoder.py) through the native decoder,
plus uncompressed pcm/ulaw paths and the corpus-conversion walk — the
capability the reference gets from the third-party sph2pipe C tool
(reference tools/Makefile:9-11, egs/wsj0/local/data_prepare.sh:16-33).
"""

import os

import numpy as np
import pytest

from convtasnet_tpu.data import sphio
from convtasnet_tpu.data.wavio import read_wav

from shorten_encoder import (
    TYPE_ALAW,
    TYPE_S16HL,
    TYPE_U16HL,
    TYPE_ULAW,
    encode_shorten_v2,
    write_sphere,
    write_sphere_pcm,
    write_sphere_shorten,
)

needs_native = pytest.mark.skipif(
    not sphio.native_available(), reason="no C++ toolchain for libsphio"
)


def _speechlike(rng, n, nchan=1, scale=3000):
    """Smooth-ish int16 signal so DIFF predictors have small residuals."""
    t = np.arange(n)[:, None]
    f = rng.uniform(0.002, 0.02, size=(1, nchan))
    x = scale * np.sin(2 * np.pi * f * t) + rng.normal(0, 80, size=(n, nchan))
    out = np.clip(np.round(x), -32000, 32000).astype(np.int64)
    return out[:, 0] if nchan == 1 else out


# ---------------------------------------------------------------------------
# Header + uncompressed codings (native and pure-Python agree)
# ---------------------------------------------------------------------------

def test_pcm_big_endian_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.integers(-32768, 32767, size=1000).astype(np.int16)
    p = str(tmp_path / "a.sph")
    write_sphere_pcm(p, x, 8000, big_endian=True)
    ch, sr, ns = sphio.sphere_info(p)
    assert (ch, sr, ns) == (1, 8000, 1000)
    pcm, sr2 = sphio.read_sphere_int16(p)
    assert sr2 == 8000
    np.testing.assert_array_equal(pcm, x)
    # pure-Python fallback agrees with the native path
    np.testing.assert_array_equal(sphio._decode_py(p), x)


def test_pcm_little_endian_and_stereo(tmp_path):
    rng = np.random.default_rng(1)
    x = rng.integers(-2000, 2000, size=(300, 2)).astype(np.int16)
    p = str(tmp_path / "b.sph")
    write_sphere_pcm(p, x, 16000, big_endian=False)
    pcm, sr = sphio.read_sphere_int16(p)
    assert sr == 16000 and pcm.shape == (300, 2)
    np.testing.assert_array_equal(pcm, x)


def test_ulaw_uncompressed(tmp_path):
    codes = np.arange(256, dtype=np.uint8)
    p = str(tmp_path / "u.sph")
    write_sphere(p, codes.tobytes(), sample_count=256, sample_rate=8000,
                 sample_n_bytes=1, byte_format="1", coding="ulaw")
    pcm, _ = sphio.read_sphere_int16(p)
    want = sphio._ulaw_table()[codes]
    np.testing.assert_array_equal(pcm, want)
    # G.711 mu-law spot values: code 0xFF decodes to 0, full-scale is 32124,
    # and decode is odd-symmetric across the sign bit.
    assert int(want[0xFF]) == 0
    assert int(want[0x00]) == -32124 and int(want[0x80]) == 32124
    np.testing.assert_array_equal(want[:128], -want[128:])


def test_float_read_sphere_scaling(tmp_path):
    x = np.array([-32768, 0, 16384], dtype=np.int16)
    p = str(tmp_path / "c.sph")
    write_sphere_pcm(p, x, 8000)
    f, _ = sphio.read_sphere(p)
    np.testing.assert_allclose(f, [-1.0, 0.0, 0.5])


def test_non_sphere_rejected(tmp_path):
    p = str(tmp_path / "notsph.sph")
    with open(p, "wb") as f:
        f.write(b"RIFF" + b"\x00" * 100)
    with pytest.raises(ValueError):
        sphio.sphere_info(p)


# ---------------------------------------------------------------------------
# Shorten v2 round-trips (native decoder vs independent test encoder)
# ---------------------------------------------------------------------------

@needs_native
@pytest.mark.parametrize("mode", ["diff0", "diff1", "diff2", "diff3"])
def test_shorten_diff_modes(tmp_path, mode):
    rng = np.random.default_rng(7)
    x = _speechlike(rng, 1234)
    p = str(tmp_path / f"{mode}.wv1")
    write_sphere_shorten(p, x, 8000, mode=mode, blocksize=256)
    pcm, sr = sphio.read_sphere_int16(p)
    assert sr == 8000
    np.testing.assert_array_equal(pcm, x.astype(np.int16))


@needs_native
@pytest.mark.parametrize("nmean", [0, 2, 4])
def test_shorten_block_means(tmp_path, nmean):
    rng = np.random.default_rng(8)
    x = _speechlike(rng, 2000) + 500  # DC offset exercises coffset
    p = str(tmp_path / "m.wv1")
    write_sphere_shorten(p, x, 8000, mode="diff1", nmean=nmean, blocksize=128)
    pcm, _ = sphio.read_sphere_int16(p)
    np.testing.assert_array_equal(pcm, x.astype(np.int16))


@needs_native
def test_shorten_stereo_interleave(tmp_path):
    rng = np.random.default_rng(9)
    x = _speechlike(rng, 777, nchan=2)
    p = str(tmp_path / "st.wv1")
    write_sphere_shorten(p, x, 16000, mode="diff2", blocksize=64)
    pcm, sr = sphio.read_sphere_int16(p)
    assert sr == 16000 and pcm.shape == (777, 2)
    np.testing.assert_array_equal(pcm, x.astype(np.int16))


@needs_native
def test_shorten_qlpc(tmp_path):
    rng = np.random.default_rng(10)
    x = _speechlike(rng, 1500)
    p = str(tmp_path / "q.wv1")
    write_sphere_shorten(p, x, 8000, mode="qlpc", maxnlpc=4, blocksize=256,
                         qlpc_coeffs=(40, -12, 5))
    pcm, _ = sphio.read_sphere_int16(p)
    np.testing.assert_array_equal(pcm, x.astype(np.int16))


@needs_native
def test_shorten_qlpc_with_means(tmp_path):
    rng = np.random.default_rng(11)
    x = _speechlike(rng, 1024) + 300
    p = str(tmp_path / "qm.wv1")
    write_sphere_shorten(p, x, 8000, mode="qlpc", maxnlpc=2, nmean=4,
                         blocksize=256, qlpc_coeffs=(30, -8))
    pcm, _ = sphio.read_sphere_int16(p)
    np.testing.assert_array_equal(pcm, x.astype(np.int16))


@needs_native
def test_shorten_bitshift(tmp_path):
    rng = np.random.default_rng(12)
    x = (_speechlike(rng, 900) >> 2) << 2  # multiples of 4
    p = str(tmp_path / "bs.wv1")
    write_sphere_shorten(p, x, 8000, mode="diff1", bitshift=2)
    pcm, _ = sphio.read_sphere_int16(p)
    np.testing.assert_array_equal(pcm, x.astype(np.int16))


@needs_native
def test_shorten_verbatim_and_zero(tmp_path):
    x = np.zeros(640, dtype=np.int64)
    p = str(tmp_path / "z.wv1")
    write_sphere_shorten(p, x, 8000, mode="zero", blocksize=128,
                         verbatim=b"NIST_1A embedded header copy\x00\x01\xff")
    pcm, _ = sphio.read_sphere_int16(p)
    np.testing.assert_array_equal(pcm, np.zeros(640, dtype=np.int16))


@needs_native
def test_shorten_ulaw_codes(tmp_path):
    rng = np.random.default_rng(13)
    codes = rng.integers(0, 256, size=800).astype(np.int64)
    p = str(tmp_path / "ul.wv1")
    write_sphere_shorten(p, codes, 8000, coding_base="ulaw",
                         ftype=TYPE_ULAW, mode="diff0", blocksize=256)
    pcm, _ = sphio.read_sphere_int16(p)
    want = sphio._ulaw_table()[codes.astype(np.uint8)]
    np.testing.assert_array_equal(pcm, want)


@needs_native
def test_shorten_alaw_codes(tmp_path):
    rng = np.random.default_rng(14)
    codes = rng.integers(0, 256, size=512).astype(np.int64)
    p = str(tmp_path / "al.wv1")
    write_sphere_shorten(p, codes, 8000, coding_base="alaw",
                         ftype=TYPE_ALAW, mode="diff0", blocksize=128)
    pcm, _ = sphio.read_sphere_int16(p)
    want = sphio._alaw_table()[codes.astype(np.uint8)]
    np.testing.assert_array_equal(pcm, want)


@needs_native
def test_shorten_u16_offset_binary(tmp_path):
    rng = np.random.default_rng(15)
    x = _speechlike(rng, 600)
    p = str(tmp_path / "u16.wv1")
    write_sphere_shorten(p, x + 32768, 8000, ftype=TYPE_U16HL, mode="diff1")
    pcm, _ = sphio.read_sphere_int16(p)
    np.testing.assert_array_equal(pcm, x.astype(np.int16))


@needs_native
def test_shorten_tail_shorter_than_blocksize(tmp_path):
    rng = np.random.default_rng(16)
    x = _speechlike(rng, 1000)  # 1000 = 3*256 + 232 tail -> FN_BLOCKSIZE
    p = str(tmp_path / "t.wv1")
    write_sphere_shorten(p, x, 8000, mode="diff1", blocksize=256)
    pcm, _ = sphio.read_sphere_int16(p)
    assert pcm.shape == (1000,)
    np.testing.assert_array_equal(pcm, x.astype(np.int16))


@needs_native
def test_shorten_corrupt_stream_errors(tmp_path):
    p = str(tmp_path / "bad.wv1")
    write_sphere(p, b"ajkg2" + b"\x00" * 64, sample_count=100, sample_rate=8000,
                 coding="pcm,embedded-shorten-v2.00")
    with pytest.raises(ValueError):
        sphio.read_sphere_int16(p)


# ---------------------------------------------------------------------------
# Corpus conversion (the data_prepare.sh analogue)
# ---------------------------------------------------------------------------

def test_convert_sphere_dir(tmp_path):
    rng = np.random.default_rng(20)
    src = tmp_path / "corpus"
    for rel in ["si_tr_s/011/a.wv1", "si_tr_s/011/b.wv1", "si_dt_05/c.sph"]:
        path = src / rel
        path.parent.mkdir(parents=True, exist_ok=True)
        x = rng.integers(-3000, 3000, size=500).astype(np.int16)
        write_sphere_pcm(str(path), x, 8000)
    out = sphio.convert_sphere_dir(str(src), str(tmp_path / "wav"), n_threads=2)
    assert len(out) == 3
    for w in out:
        assert os.path.exists(w) and w.endswith(".wav")
        audio, sr = read_wav(w)
        assert sr == 8000 and audio.shape[0] == 500


def test_convert_is_sample_exact(tmp_path):
    rng = np.random.default_rng(21)
    x = rng.integers(-32768, 32767, size=800).astype(np.int16)
    sph = str(tmp_path / "e.wv1")
    wav = str(tmp_path / "e.wav")
    write_sphere_pcm(sph, x, 8000)
    sphio.convert_sphere_file(sph, wav)
    import wave as wavemod
    with wavemod.open(wav, "rb") as w:
        back = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    np.testing.assert_array_equal(back, x)


@needs_native
def test_recipe_stage0_end_to_end(tmp_path):
    """Raw shorten-compressed sphere corpus -> wav -> mixtures via the
    recipe driver's stage 0 (the reference's data_prepare.sh + MERL
    mixture-script pipeline, run.sh:77-99)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from recipes.wsj0.run import main as recipe_main

    rng = np.random.default_rng(30)
    corpus = tmp_path / "corpus"
    for split in ["si_tr_s", "si_dt_05", "si_et_05"]:
        for spk in ["011", "012", "013"]:
            d = corpus / split / spk
            d.mkdir(parents=True)
            for u in range(2):
                x = _speechlike(rng, 16000 + 2000 * u)
                write_sphere_shorten(str(d / f"{spk}c{u}.wv1"), x, 16000,
                                     mode="diff2", blocksize=256)
    recipe_main([
        "--stage", "0", "--stop_stage", "0",
        "--sphere_root", str(corpus),
        "--spk_wav_root", str(tmp_path / "spk"),
        "--wav_root", str(tmp_path / "wav"),
        "--exp_root", str(tmp_path / "exp"),
        "--n_mix_tr", "4", "--n_mix_cv", "3", "--n_mix_tt", "3",
        "--sample_rate", "8000", "--num_workers", "2",
    ])
    for split, n in [("tr", 4), ("cv", 3), ("tt", 3)]:
        for sub in ["mix", "s1", "s2"]:
            d = tmp_path / "wav" / split / sub
            wavs = sorted(os.listdir(d))
            assert len(wavs) == n, (split, sub, wavs)
            audio, sr = read_wav(str(d / wavs[0]))
            assert sr == 8000 and audio.shape[0] > 4000


@needs_native
@pytest.mark.parametrize("ascii_version", [False, True])
def test_shorten_version_byte_forms(tmp_path, ascii_version):
    """Real shorten streams carry a binary version byte (0x02); some tools
    write the ASCII digit '2'. Both must decode (the test encoder's
    default is the spec-accurate binary form)."""
    rng = np.random.default_rng(17)
    x = _speechlike(rng, 600)
    p = str(tmp_path / "v.wv1")
    write_sphere_shorten(p, x, 8000, mode="diff1",
                         ascii_version=ascii_version)
    raw = open(p, "rb").read()
    off = raw.index(b"ajkg") + 4
    assert raw[off] == (ord("2") if ascii_version else 2)
    pcm, _ = sphio.read_sphere_int16(p)
    np.testing.assert_array_equal(pcm, x.astype(np.int16))


def test_pcm_trailing_padding_ignored(tmp_path):
    """sph2pipe decodes exactly sample_count frames; trailing checksum or
    padding bytes after the audio must not error or be decoded as audio."""
    rng = np.random.default_rng(18)
    x = rng.integers(-1000, 1000, size=500).astype(np.int16)
    p = str(tmp_path / "pad.sph")
    write_sphere(p, x.astype(">i2").tobytes() + b"\x42" * 37,
                 sample_count=500, sample_rate=8000, coding="pcm")
    pcm, _ = sphio.read_sphere_int16(p)
    assert pcm.shape == (500,)
    np.testing.assert_array_equal(pcm, x)


@needs_native
def test_decoder_survives_fuzzed_bitstreams(tmp_path):
    """Random garbage after a valid shorten magic must produce a clean
    error (or a short decode), never a hang or crash — the native decoder
    guards its loops (runaway uvar, oversized blocksize/nlpc, EOF)."""
    rng = np.random.default_rng(99)
    for trial in range(50):
        body = b"ajkg" + bytes([2]) + rng.bytes(int(rng.integers(8, 400)))
        p = str(tmp_path / f"fuzz{trial}.wv1")
        write_sphere(p, body, sample_count=int(rng.integers(1, 5000)),
                     sample_rate=8000, coding="pcm,embedded-shorten-v2.00")
        try:
            pcm, _ = sphio.read_sphere_int16(p)
            assert pcm.dtype == np.int16  # short/valid-prefix decode is fine
        except ValueError:
            pass  # clean rejection is fine


@needs_native
def test_decoder_survives_fuzzed_headers(tmp_path):
    rng = np.random.default_rng(100)
    for trial in range(30):
        blob = b"NIST_1A\n   1024\n" + rng.bytes(1200)
        p = str(tmp_path / f"h{trial}.sph")
        with open(p, "wb") as f:
            f.write(blob)
        try:
            sphio.read_sphere_int16(p)
        except ValueError:
            pass
