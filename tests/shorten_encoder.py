"""Test-only shorten v2 encoder + NIST SPHERE writer.

Produces real shorten-v2 bitstreams (magic, Rice/uvar coding, DIFF0-3 /
ZERO / QLPC predictors, block means, bitshift, verbatim chunks) so the
native decoder in native/sphio.cpp can be validated by round-trip: these
are written independently from the published algorithm (Robinson, TR156)
with the encoder-side recursions, while the decoder implements the
inverse recursions.
"""

from __future__ import annotations

import numpy as np

FN_DIFF0, FN_DIFF1, FN_DIFF2, FN_DIFF3 = 0, 1, 2, 3
FN_QUIT, FN_BLOCKSIZE, FN_BITSHIFT, FN_QLPC, FN_ZERO, FN_VERBATIM = 4, 5, 6, 7, 8, 9
FNSIZE, ENERGYSIZE, BITSHIFTSIZE, NWRAP = 2, 3, 2, 3
ULONGSIZE, LPCQSIZE, LPCQUANT = 2, 2, 5
VERBATIM_CKSIZE_SIZE, VERBATIM_BYTE_SIZE = 5, 8
TYPE_S16HL, TYPE_U16HL, TYPE_ULAW, TYPE_ALAW, TYPE_S8, TYPE_U8 = 3, 4, 7, 10, 1, 2


class BitWriter:
    """MSB-first bits packed into 32-bit big-endian words."""

    def __init__(self):
        self.out = bytearray()
        self.word = 0
        self.nbits = 0

    def bit(self, b: int) -> None:
        self.word = (self.word << 1) | (b & 1)
        self.nbits += 1
        if self.nbits == 32:
            self.out += self.word.to_bytes(4, "big")
            self.word, self.nbits = 0, 0

    def bits(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bit((value >> i) & 1)

    def uvar(self, value: int, nbin: int) -> None:
        high, low = value >> nbin, value & ((1 << nbin) - 1)
        for _ in range(high):
            self.bit(0)
        self.bit(1)
        self.bits(low, nbin)

    def ulong(self, value: int) -> None:
        nbit = max(int(value).bit_length(), 0)
        self.uvar(nbit, ULONGSIZE)
        self.uvar(value, nbit)

    def var(self, value: int, nbin: int) -> None:
        u = 2 * value if value >= 0 else -2 * value - 1
        self.uvar(u, nbin + 1)

    def flush(self) -> bytes:
        while self.nbits:
            self.bit(0)
        return bytes(self.out)


def _pick_k(res) -> int:
    mean = float(np.mean(np.abs(np.asarray(res, dtype=np.float64)))) if len(res) else 0.0
    return min(14, max(0, int(mean).bit_length()))


def encode_shorten_v2(
    samples: np.ndarray,
    ftype: int = TYPE_S16HL,
    blocksize: int = 256,
    nmean: int = 0,
    maxnlpc: int = 0,
    mode: str = "diff1",
    bitshift: int = 0,
    verbatim: bytes = b"",
    qlpc_coeffs=(40, -12),
    ascii_version: bool = False,
) -> bytes:
    """Encodes [T] or [T, nchan] integer samples (post-companding codes for
    ulaw/alaw types, offset-binary for U8/U16) into a shorten v2 payload."""
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    nchan = x.shape[1]
    if bitshift:
        assert np.all(x % (1 << bitshift) == 0), "bitshift needs divisible samples"
        x = x >> bitshift
    nwrap = max(NWRAP, maxnlpc)

    w = BitWriter()
    # Real shorten writes the raw binary version byte (0x02); some tools
    # write the ASCII digit. The decoder accepts both; default to the
    # spec-accurate binary form.
    payload_head = b"ajkg" + (b"2" if ascii_version else bytes([2]))
    w_head = bytearray(payload_head)
    w.ulong(ftype)
    w.ulong(nchan)
    w.ulong(blocksize)
    w.ulong(maxnlpc)
    w.ulong(nmean)
    w.ulong(0)  # nskip

    if verbatim:
        w.uvar(FN_VERBATIM, FNSIZE)
        w.uvar(len(verbatim), VERBATIM_CKSIZE_SIZE)
        for b in verbatim:
            w.uvar(b, VERBATIM_BYTE_SIZE)
    if bitshift:
        w.uvar(FN_BITSHIFT, FNSIZE)
        w.uvar(bitshift, BITSHIFTSIZE)

    hist = np.zeros((nchan, nwrap), dtype=np.int64)
    offsets = np.zeros((nchan, max(1, nmean)), dtype=np.int64)
    T = x.shape[0]
    pos = 0
    cur_bs = blocksize
    while pos < T:
        bs = min(cur_bs, T - pos)
        if bs != cur_bs:
            w.uvar(FN_BLOCKSIZE, FNSIZE)
            w.ulong(bs)
            cur_bs = bs
        for ch in range(nchan):
            blk = x[pos:pos + bs, ch]
            coffset = int(offsets[ch, 0])
            if nmean > 0:
                s = nmean // 2 + int(offsets[ch].sum())
                coffset = s // nmean
                if bitshift:
                    coffset = coffset if bitshift == 0 else ((coffset >> (bitshift - 1)) + 1) >> 1
            h = hist[ch]
            if mode == "zero" and np.all(blk == 0):
                w.uvar(FN_ZERO, FNSIZE)
            elif mode == "qlpc":
                nlpc = len(qlpc_coeffs)
                assert nlpc <= maxnlpc
                prev = np.concatenate([h, blk])
                res = []
                lpcqoffset = 1 << (LPCQUANT - 1)
                adj = prev.copy()
                adj[:nwrap] = adj[:nwrap] - coffset
                for i in range(bs):
                    acc = lpcqoffset
                    for j, cj in enumerate(qlpc_coeffs):
                        acc += cj * int(adj[nwrap + i - j - 1])
                    pred = acc >> LPCQUANT
                    r = int(blk[i]) - coffset - pred
                    res.append(r)
                    adj[nwrap + i] = int(blk[i]) - coffset
                k = _pick_k(res)
                w.uvar(FN_QLPC, FNSIZE)
                w.uvar(k, ENERGYSIZE)
                w.uvar(nlpc, LPCQSIZE)
                for cj in qlpc_coeffs:
                    w.var(int(cj), LPCQUANT)
                for r in res:
                    w.var(r, k)
            else:
                order = {"diff0": 0, "diff1": 1, "diff2": 2, "diff3": 3}[mode]
                prev = np.concatenate([h, blk])
                res = []
                for i in range(bs):
                    p = nwrap + i
                    if order == 0:
                        pred = coffset
                    elif order == 1:
                        pred = int(prev[p - 1])
                    elif order == 2:
                        pred = 2 * int(prev[p - 1]) - int(prev[p - 2])
                    else:
                        pred = 3 * (int(prev[p - 1]) - int(prev[p - 2])) + int(prev[p - 3])
                    res.append(int(blk[i]) - pred)
                k = _pick_k(res)
                w.uvar(FN_DIFF0 + order, FNSIZE)
                w.uvar(k, ENERGYSIZE)
                for r in res:
                    w.var(r, k)
            if nmean > 0:
                s = bs // 2 + int(blk.sum())
                offsets[ch, :-1] = offsets[ch, 1:]
                offsets[ch, -1] = (s // bs) << bitshift
            hist[ch] = np.concatenate([h, blk])[-nwrap:]
        pos += bs
    w.uvar(FN_QUIT, FNSIZE)
    return bytes(w_head) + w.flush()


def write_sphere(path: str, body: bytes, *, sample_count: int, sample_rate: int,
                 channels: int = 1, sample_n_bytes: int = 2,
                 byte_format: str = "10", coding: str = "pcm") -> None:
    """Writes a 1024-byte-header NIST SPHERE file."""
    lines = [
        "NIST_1A",
        "   1024",
        f"sample_count -i {sample_count}",
        f"sample_rate -i {sample_rate}",
        f"channel_count -i {channels}",
        f"sample_n_bytes -i {sample_n_bytes}",
        f"sample_byte_format -s{len(byte_format)} {byte_format}",
        f"sample_coding -s{len(coding)} {coding}",
        "end_head",
    ]
    header = ("\n".join(lines) + "\n").encode("ascii")
    assert len(header) <= 1024
    header += b" " * (1024 - len(header))
    with open(path, "wb") as f:
        f.write(header)
        f.write(body)


def write_sphere_pcm(path: str, samples: np.ndarray, sample_rate: int,
                     big_endian: bool = True) -> None:
    x = np.asarray(samples, dtype=np.int16)
    nchan = 1 if x.ndim == 1 else x.shape[1]
    body = x.astype(">i2" if big_endian else "<i2").tobytes()
    write_sphere(path, body, sample_count=x.shape[0], sample_rate=sample_rate,
                 channels=nchan, byte_format="10" if big_endian else "01",
                 coding="pcm")


def write_sphere_shorten(path: str, samples: np.ndarray, sample_rate: int,
                         coding_base: str = "pcm", **kw) -> None:
    x = np.asarray(samples)
    nchan = 1 if x.ndim == 1 else x.shape[1]
    body = encode_shorten_v2(x, **kw)
    write_sphere(path, body, sample_count=x.shape[0], sample_rate=sample_rate,
                 channels=nchan,
                 coding=f"{coding_base},embedded-shorten-v2.00")
