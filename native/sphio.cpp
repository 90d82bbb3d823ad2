// Native NIST SPHERE reader with embedded-shorten decompression.
//
// The reference distributes WSJ0 audio prep through the third-party
// sph2pipe C tool (reference tools/Makefile:9-11, built with `gcc *.c -lm`;
// invoked by egs/wsj0/local/data_prepare.sh:16-33 to convert .wv1 SPHERE
// files to wav before mixture creation). This framework's analogue is a
// from-scratch C++ implementation of the two things that tool provides for
// the recipe: NIST SPHERE header parsing and sample decoding for the
// codings WSJ-era corpora use —
//   * pcm 16-bit (both byte orders) and 8-bit
//   * mu-law / a-law (G.711)
//   * embedded shorten v2 ("pcm,embedded-shorten-v2.00" et al.), the
//     lossless predictive+Rice coding used by LDC .wv1/.wv2 files
// The shorten decoder is written from the published algorithm description
// (T. Robinson, "SHORTEN: simple lossless and near-lossless waveform
// compression", Cambridge TR156, 1994), not copied from any implementation.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 sphio.cpp -o libsphio.so

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <string>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Error codes (keep in sync with convtasnet_tpu/data/sphio.py)
// ---------------------------------------------------------------------------
enum {
  SPH_OK = 0,
  SPH_ERR_IO = -1,
  SPH_ERR_HEADER = -2,
  SPH_ERR_CODING = -3,   // unsupported sample_coding / shorten file type
  SPH_ERR_BITSTREAM = -4,
  SPH_ERR_CAPACITY = -5,
};

bool read_file(const char* path, std::vector<uint8_t>* buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (n < 16) { std::fclose(f); return false; }
  buf->resize(static_cast<size_t>(n));
  size_t got = std::fread(buf->data(), 1, buf->size(), f);
  std::fclose(f);
  return got == buf->size();
}

// Reads at most `limit` leading bytes (enough for header parsing, so
// sph_info never slurps a multi-MB audio payload).
bool read_prefix(const char* path, long limit, std::vector<uint8_t>* buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  buf->resize(static_cast<size_t>(limit));
  size_t got = std::fread(buf->data(), 1, buf->size(), f);
  std::fclose(f);
  if (got < 16) return false;
  buf->resize(got);
  return true;
}

// ---------------------------------------------------------------------------
// SPHERE header: "NIST_1A\n<size>\n" then "name -i|-r|-sN value" lines
// terminated by "end_head". All ASCII within the first <size> bytes.
// ---------------------------------------------------------------------------
struct SphHeader {
  long header_bytes = 0;
  int channels = 1;
  int rate = 0;
  long sample_count = 0;
  int sample_n_bytes = 2;
  std::string byte_format;   // "10" big-endian, "01" little-endian, "1"
  std::string coding = "pcm";
};

bool parse_header(const std::vector<uint8_t>& b, SphHeader* h) {
  if (b.size() < 16 || std::memcmp(b.data(), "NIST_1A", 7) != 0) return false;
  // Second line: header size in decimal.
  size_t p = 8;
  while (p < b.size() && (b[p] == ' ' || b[p] == '\n')) p++;
  long hsize = 0;
  while (p < b.size() && b[p] >= '0' && b[p] <= '9') hsize = hsize * 10 + (b[p++] - '0');
  if (hsize < 16 || static_cast<size_t>(hsize) > b.size()) return false;
  h->header_bytes = hsize;
  // Field lines.
  std::string text(reinterpret_cast<const char*>(b.data()), static_cast<size_t>(hsize));
  size_t pos = text.find('\n');            // end of "NIST_1A"
  if (pos == std::string::npos) return false;
  pos = text.find('\n', pos + 1);          // end of the size line
  while (pos != std::string::npos && pos + 1 < text.size()) {
    size_t eol = text.find('\n', pos + 1);
    std::string line = text.substr(pos + 1, eol == std::string::npos
                                                ? std::string::npos : eol - pos - 1);
    pos = eol;
    if (line.rfind("end_head", 0) == 0) break;
    size_t sp1 = line.find(' ');
    if (sp1 == std::string::npos) continue;
    size_t sp2 = line.find(' ', sp1 + 1);
    if (sp2 == std::string::npos) continue;
    std::string name = line.substr(0, sp1);
    std::string value = line.substr(sp2 + 1);
    if (name == "channel_count") h->channels = std::atoi(value.c_str());
    else if (name == "sample_rate") h->rate = std::atoi(value.c_str());
    else if (name == "sample_count") h->sample_count = std::atol(value.c_str());
    else if (name == "sample_n_bytes") h->sample_n_bytes = std::atoi(value.c_str());
    else if (name == "sample_byte_format") h->byte_format = value;
    else if (name == "sample_coding") h->coding = value;
  }
  return h->rate > 0 && h->channels > 0;
}

// ---------------------------------------------------------------------------
// G.711 companding
// ---------------------------------------------------------------------------
int16_t ulaw2linear(uint8_t u) {
  u = ~u;
  int t = ((u & 0x0f) << 3) + 0x84;
  t <<= (u >> 4) & 0x07;
  return static_cast<int16_t>((u & 0x80) ? (0x84 - t) : (t - 0x84));
}

int16_t alaw2linear(uint8_t a) {
  a ^= 0x55;
  int t = (a & 0x0f) << 4;
  int seg = (a & 0x70) >> 4;
  if (seg == 0) t += 8;
  else if (seg == 1) t += 0x108;
  else t = (t + 0x108) << (seg - 1);
  return static_cast<int16_t>((a & 0x80) ? t : -t);
}

// ---------------------------------------------------------------------------
// Shorten v2 bitstream reader: 32-bit big-endian words, bits MSB-first.
// ---------------------------------------------------------------------------
struct BitReader {
  const uint8_t* p;
  const uint8_t* end;
  uint32_t word = 0;
  int bits_left = 0;
  bool overrun = false;

  BitReader(const uint8_t* begin, const uint8_t* e) : p(begin), end(e) {}

  void refill() {
    word = 0;
    for (int i = 0; i < 4; i++) {
      word <<= 8;
      if (p < end) word |= *p++;
      else overrun = true;  // zero-pad past EOF; flagged for the caller
    }
    bits_left = 32;
  }

  uint32_t bit() {
    if (bits_left == 0) refill();
    bits_left--;
    return (word >> bits_left) & 1u;
  }

  // Rice code: unary quotient (count of 0 bits before a 1), then nbin-bit
  // remainder MSB-first.
  uint64_t uvar(int nbin) {
    uint64_t result = 0;
    while (bit() == 0) {
      if (++result > (1u << 20) || overrun) { overrun = true; return 0; }
    }
    for (int i = 0; i < nbin; i++) result = (result << 1) | bit();
    return result;
  }

  // Self-sizing unsigned: a 2-bit-Rice-coded bit width, then that many bits.
  uint64_t ulong_() { return uvar(static_cast<int>(uvar(2))); }

  // Signed: zigzag on uvar(nbin + 1).
  int64_t var(int nbin) {
    uint64_t u = uvar(nbin + 1);
    return (u & 1) ? -static_cast<int64_t>(u >> 1) - 1
                   : static_cast<int64_t>(u >> 1);
  }
};

// Shorten function codes and parameter widths.
enum {
  FN_DIFF0 = 0, FN_DIFF1 = 1, FN_DIFF2 = 2, FN_DIFF3 = 3, FN_QUIT = 4,
  FN_BLOCKSIZE = 5, FN_BITSHIFT = 6, FN_QLPC = 7, FN_ZERO = 8, FN_VERBATIM = 9,
};
enum {
  FNSIZE = 2, ENERGYSIZE = 3, BITSHIFTSIZE = 2, NWRAP = 3,
  ULONGSIZE = 2, LPCQSIZE = 2, LPCQUANT = 5, XBYTESIZE = 7,
  VERBATIM_CKSIZE_SIZE = 5, VERBATIM_BYTE_SIZE = 8,
};
// Shorten sample file types (subset we decode).
enum {
  TYPE_AU1 = 0, TYPE_S8 = 1, TYPE_U8 = 2, TYPE_S16HL = 3, TYPE_U16HL = 4,
  TYPE_S16LH = 5, TYPE_U16LH = 6, TYPE_ULAW = 7, TYPE_AU2 = 8, TYPE_AU3 = 9,
  TYPE_ALAW = 10,
};

int64_t rounded_shift_down(int64_t x, int n) {
  return n == 0 ? x : ((x >> (n - 1)) + 1) >> 1;
}

// Decodes a shorten v2 payload to interleaved int16. Returns samples per
// channel, or a negative error. `want` caps output (samples per channel).
int64_t shorten_decode(const uint8_t* data, size_t len, int16_t* out,
                       int64_t capacity_total, int expect_chan, int64_t want) {
  if (len < 5 || std::memcmp(data, "ajkg", 4) != 0) return SPH_ERR_BITSTREAM;
  // Real shorten streams store a raw binary version byte (0x02); some
  // tools write the ASCII digit. Accept both.
  int version = data[4] >= '0' ? data[4] - '0' : data[4];
  if (version < 1 || version > 2) return SPH_ERR_CODING;
  BitReader br(data + 5, data + len);

  const int64_t ftype = br.ulong_();
  const int64_t nchan = br.ulong_();
  int64_t blocksize = br.ulong_();
  const int64_t maxnlpc = br.ulong_();
  const int64_t nmean = br.ulong_();
  const int64_t nskip = br.ulong_();
  for (int64_t i = 0; i < nskip; i++) br.uvar(XBYTESIZE);
  if (br.overrun || nchan <= 0 || nchan > 16 || blocksize <= 0 ||
      blocksize > (1 << 20) || maxnlpc < 0 || maxnlpc > 1024 || nmean < 0 ||
      nmean > 65536)
    return SPH_ERR_BITSTREAM;
  if (expect_chan > 0 && nchan != expect_chan) return SPH_ERR_BITSTREAM;

  bool sixteen;
  switch (ftype) {
    case TYPE_S16HL: case TYPE_U16HL: case TYPE_S16LH: case TYPE_U16LH:
      sixteen = true; break;
    case TYPE_S8: case TYPE_U8: case TYPE_ULAW: case TYPE_ALAW:
      sixteen = false; break;
    default:
      return SPH_ERR_CODING;  // AU1/AU2/AU3 internal formats not supported
  }
  (void)sixteen;

  const int64_t nwrap = std::max<int64_t>(NWRAP, maxnlpc);
  // Per-channel sample buffer with nwrap samples of history at the front.
  std::vector<std::vector<int64_t>> buf(nchan);
  for (auto& b : buf) b.assign(static_cast<size_t>(nwrap + blocksize), 0);
  std::vector<std::vector<int64_t>> offset(
      nchan, std::vector<int64_t>(static_cast<size_t>(std::max<int64_t>(1, nmean)), 0));
  std::vector<int64_t> qlpc(static_cast<size_t>(std::max<int64_t>(1, maxnlpc)), 0);

  int bitshift = 0;
  int chan = 0;
  int64_t done_per_chan = 0;  // full rounds emitted
  const int64_t lpcqoffset = (version >= 2) ? (1 << (LPCQUANT - 1)) : 0;

  while (true) {
    if (br.overrun) return SPH_ERR_BITSTREAM;
    const int fn = static_cast<int>(br.uvar(FNSIZE));
    if (fn == FN_QUIT) break;

    switch (fn) {
      case FN_BLOCKSIZE: {
        // Blocksize changes are only valid at round boundaries: mid-round
        // (after some channels of this round decoded) the reallocation
        // below would silently discard their already-decoded samples.
        if (chan != 0) return SPH_ERR_BITSTREAM;
        int64_t nb = br.ulong_();
        if (nb <= 0 || nb > (1 << 20)) return SPH_ERR_BITSTREAM;
        blocksize = nb;
        for (auto& b : buf) {
          // Preserve history, grow/shrink the block region.
          std::vector<int64_t> nbuf(static_cast<size_t>(nwrap + blocksize), 0);
          std::memcpy(nbuf.data(), b.data(), sizeof(int64_t) * nwrap);
          b.swap(nbuf);
        }
        continue;
      }
      case FN_BITSHIFT:
        bitshift = static_cast<int>(br.uvar(BITSHIFTSIZE));
        if (bitshift > 31) return SPH_ERR_BITSTREAM;
        continue;
      case FN_VERBATIM: {
        // Carries the embedded original file header; not audio — discard.
        int64_t n = br.uvar(VERBATIM_CKSIZE_SIZE);
        while (n-- > 0) br.uvar(VERBATIM_BYTE_SIZE);
        continue;
      }
      case FN_DIFF0: case FN_DIFF1: case FN_DIFF2: case FN_DIFF3:
      case FN_QLPC: case FN_ZERO:
        break;
      default:
        return SPH_ERR_BITSTREAM;
    }

    // --- audio block for channel `chan` ---
    int64_t* c = buf[chan].data() + nwrap;  // c[-1..-nwrap] is history
    int64_t coffset = offset[chan][0];
    if (nmean > 0) {
      int64_t sum = (version < 2) ? 0 : nmean / 2;
      for (int64_t i = 0; i < nmean; i++) sum += offset[chan][i];
      coffset = sum / nmean;
      if (version >= 2) coffset = rounded_shift_down(coffset, bitshift);
    }

    if (fn == FN_ZERO) {
      for (int64_t i = 0; i < blocksize; i++) c[i] = 0;
    } else {
      const int resn = static_cast<int>(br.uvar(ENERGYSIZE));
      if (resn > 30) return SPH_ERR_BITSTREAM;
      switch (fn) {
        case FN_DIFF0:
          for (int64_t i = 0; i < blocksize; i++) c[i] = br.var(resn) + coffset;
          break;
        case FN_DIFF1:
          for (int64_t i = 0; i < blocksize; i++) c[i] = br.var(resn) + c[i - 1];
          break;
        case FN_DIFF2:
          for (int64_t i = 0; i < blocksize; i++)
            c[i] = br.var(resn) + 2 * c[i - 1] - c[i - 2];
          break;
        case FN_DIFF3:
          for (int64_t i = 0; i < blocksize; i++)
            c[i] = br.var(resn) + 3 * (c[i - 1] - c[i - 2]) + c[i - 3];
          break;
        case FN_QLPC: {
          const int64_t nlpc = static_cast<int64_t>(br.uvar(LPCQSIZE));
          if (nlpc > maxnlpc || nlpc > nwrap) return SPH_ERR_BITSTREAM;
          for (int64_t j = 0; j < nlpc; j++) qlpc[j] = br.var(LPCQUANT);
          if (coffset != 0)
            for (int64_t i = -nlpc; i < 0; i++) c[i] -= coffset;
          for (int64_t i = 0; i < blocksize; i++) {
            int64_t sum = lpcqoffset;
            for (int64_t j = 0; j < nlpc; j++) sum += qlpc[j] * c[i - j - 1];
            c[i] = br.var(resn) + (sum >> LPCQUANT);
          }
          if (coffset != 0)
            for (int64_t i = 0; i < blocksize; i++) c[i] += coffset;
          break;
        }
      }
    }

    // Running block means feed the next coffset.
    if (nmean > 0) {
      int64_t sum = (version < 2) ? 0 : blocksize / 2;
      for (int64_t i = 0; i < blocksize; i++) sum += c[i];
      for (int64_t i = 0; i < nmean - 1; i++) offset[chan][i] = offset[chan][i + 1];
      int64_t m = sum / blocksize;
      offset[chan][nmean - 1] = (version >= 2) ? (m << bitshift) : m;
    }
    // Wrap history for the next block of this channel.
    for (int64_t i = 0; i < nwrap; i++) c[i - nwrap] = c[blocksize - nwrap + i];

    if (chan == nchan - 1) {
      // All channels decoded this round: emit interleaved int16.
      for (int64_t i = 0; i < blocksize; i++) {
        if (done_per_chan + i >= want) break;
        for (int64_t ch = 0; ch < nchan; ch++) {
          int64_t idx = (done_per_chan + i) * nchan + ch;
          if (idx >= capacity_total) return SPH_ERR_CAPACITY;
          int64_t v = buf[ch][static_cast<size_t>(nwrap + i)] << bitshift;
          int16_t s;
          switch (ftype) {
            case TYPE_ULAW: s = ulaw2linear(static_cast<uint8_t>(v & 0xff)); break;
            case TYPE_ALAW: s = alaw2linear(static_cast<uint8_t>(v & 0xff)); break;
            case TYPE_U8:   s = static_cast<int16_t>((v - 128) << 8); break;
            case TYPE_S8:   s = static_cast<int16_t>(v << 8); break;
            case TYPE_U16HL: case TYPE_U16LH:
              s = static_cast<int16_t>(v - 32768); break;
            default:
              s = static_cast<int16_t>(
                  v < -32768 ? -32768 : (v > 32767 ? 32767 : v));
          }
          out[idx] = s;
        }
      }
      done_per_chan += blocksize;
      if (done_per_chan >= want) break;  // header told us the true length
    }
    chan = (chan + 1) % static_cast<int>(nchan);
  }
  return std::min<int64_t>(done_per_chan, want);
}

int64_t decode_linear(const SphHeader& h, const uint8_t* d, size_t n,
                      int16_t* out, int64_t capacity_total) {
  const bool big = h.byte_format != "01";  // SPHERE default/typical is "10"
  // sph2pipe decodes exactly sample_count frames; trailing non-audio
  // bytes (padding/checksums) are ignored rather than being an error.
  const int64_t declared = h.sample_count > 0
      ? h.sample_count * h.channels
      : std::numeric_limits<int64_t>::max();
  int64_t total;
  if (h.sample_n_bytes == 2) {
    total = std::min<int64_t>(static_cast<int64_t>(n / 2), declared);
    if (total > capacity_total) return SPH_ERR_CAPACITY;
    for (int64_t i = 0; i < total; i++) {
      uint16_t raw = big ? (d[2 * i] << 8) | d[2 * i + 1]
                         : (d[2 * i + 1] << 8) | d[2 * i];
      out[i] = static_cast<int16_t>(raw);
    }
  } else if (h.sample_n_bytes == 1) {
    total = std::min<int64_t>(static_cast<int64_t>(n), declared);
    if (total > capacity_total) return SPH_ERR_CAPACITY;
    if (h.coding.rfind("ulaw", 0) == 0 || h.coding.rfind("mu-law", 0) == 0)
      for (int64_t i = 0; i < total; i++) out[i] = ulaw2linear(d[i]);
    else if (h.coding.rfind("alaw", 0) == 0)
      for (int64_t i = 0; i < total; i++) out[i] = alaw2linear(d[i]);
    else  // 8-bit linear pcm (signed)
      for (int64_t i = 0; i < total; i++)
        out[i] = static_cast<int16_t>(static_cast<int8_t>(d[i]) << 8);
  } else {
    return SPH_ERR_CODING;
  }
  return total / h.channels;
}

}  // namespace

extern "C" {

// Parses the SPHERE header. Returns SPH_OK or a negative error code.
int sph_info(const char* path, int32_t* channels, int32_t* rate,
             int64_t* sample_count) {
  std::vector<uint8_t> b;
  if (!read_prefix(path, 1 << 20, &b)) return SPH_ERR_IO;
  SphHeader h;
  if (!parse_header(b, &h)) return SPH_ERR_HEADER;
  *channels = h.channels;
  *rate = h.rate;
  *sample_count = h.sample_count;
  return SPH_OK;
}

// Decodes the whole file to interleaved int16. `capacity_total` is the size
// of `out` in samples (frames * channels). Returns frames decoded (samples
// per channel) or a negative error code.
int64_t sph_decode(const char* path, int16_t* out, int64_t capacity_total) {
  std::vector<uint8_t> b;
  if (!read_file(path, &b)) return SPH_ERR_IO;
  SphHeader h;
  if (!parse_header(b, &h)) return SPH_ERR_HEADER;
  const uint8_t* d = b.data() + h.header_bytes;
  const size_t n = b.size() - static_cast<size_t>(h.header_bytes);

  if (h.coding.find("embedded-shorten") != std::string::npos) {
    if (h.sample_count <= 0) return SPH_ERR_HEADER;  // length is mandatory
    return shorten_decode(d, n, out, capacity_total, h.channels,
                          h.sample_count);
  }
  if (h.coding.rfind("pcm", 0) == 0 || h.coding.rfind("ulaw", 0) == 0 ||
      h.coding.rfind("mu-law", 0) == 0 || h.coding.rfind("alaw", 0) == 0 ||
      h.coding.empty())
    return decode_linear(h, d, n, out, capacity_total);
  return SPH_ERR_CODING;
}

}  // extern "C"
