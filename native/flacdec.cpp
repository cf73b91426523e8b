// Minimal FLAC decoder — native data-loader component.
//
// The reference reads its speech benchmark sample (paper_plots/84-121123-0020.flac)
// through python-soundfile -> libsndfile (C).  This standalone decoder covers the
// FLAC subset produced by the libFLAC encoder: STREAMINFO, frames with
// constant/verbatim/fixed/LPC subframes, Rice/Rice2 residual partitions,
// wasted bits, and all four stereo decorrelation modes, for 8/16/24/32-bit PCM.
// CRCs are parsed past but not verified (decode integrity is validated in the
// Python tests against known signals).
//
// C ABI:
//   int  flac_decode(const char* path, int32_t** out, long* n_samples,
//                    int* n_channels, int* sample_rate, int* bits);
//   void flac_free(int32_t* buf);
//
// Returns 0 on success; negative error codes otherwise.  *out is a malloc'd
// interleaved [n_samples x n_channels] int32 buffer.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct BitReader {
  const uint8_t* data;
  size_t size;
  size_t byte_pos = 0;
  int bit_pos = 0;  // bits consumed in current byte (0..7), MSB first
  bool error = false;

  BitReader(const uint8_t* d, size_t n) : data(d), size(n) {}

  bool eof() const { return byte_pos >= size; }

  uint32_t read_bit() {
    if (byte_pos >= size) { error = true; return 0; }
    uint32_t b = (data[byte_pos] >> (7 - bit_pos)) & 1u;
    if (++bit_pos == 8) { bit_pos = 0; ++byte_pos; }
    return b;
  }

  uint64_t read_bits(int n) {
    uint64_t v = 0;
    // fast path whole bytes when aligned
    while (n >= 8 && bit_pos == 0 && byte_pos < size) {
      v = (v << 8) | data[byte_pos++];
      n -= 8;
    }
    for (int i = 0; i < n; ++i) v = (v << 1) | read_bit();
    return v;
  }

  int64_t read_signed(int n) {
    uint64_t v = read_bits(n);
    if (n == 0) return 0;
    uint64_t sign = 1ull << (n - 1);
    if (v & sign) return (int64_t)(v | ~((1ull << n) - 1));
    return (int64_t)v;
  }

  uint32_t read_unary() {
    uint32_t q = 0;
    while (!error && read_bit() == 0) {
      ++q;
      if (q > 1u << 24) { error = true; break; }  // corrupt stream guard
    }
    return q;
  }

  void align_byte() {
    if (bit_pos != 0) { bit_pos = 0; ++byte_pos; }
  }
};

// UTF-8-style coded number (frame header sample/frame index)
uint64_t read_utf8_number(BitReader& br) {
  uint32_t b0 = (uint32_t)br.read_bits(8);
  int extra = 0;
  uint64_t v;
  if ((b0 & 0x80) == 0) return b0;
  else if ((b0 & 0xE0) == 0xC0) { v = b0 & 0x1F; extra = 1; }
  else if ((b0 & 0xF0) == 0xE0) { v = b0 & 0x0F; extra = 2; }
  else if ((b0 & 0xF8) == 0xF0) { v = b0 & 0x07; extra = 3; }
  else if ((b0 & 0xFC) == 0xF8) { v = b0 & 0x03; extra = 4; }
  else if ((b0 & 0xFE) == 0xFC) { v = b0 & 0x01; extra = 5; }
  else if (b0 == 0xFE) { v = 0; extra = 6; }
  else { br.error = true; return 0; }
  for (int i = 0; i < extra; ++i) v = (v << 6) | (br.read_bits(8) & 0x3F);
  return v;
}

bool read_residual(BitReader& br, int blocksize, int pred_order,
                   std::vector<int64_t>& out) {
  uint32_t method = (uint32_t)br.read_bits(2);
  if (method > 1) return false;
  int param_bits = method == 0 ? 4 : 5;
  uint32_t escape = method == 0 ? 0xF : 0x1F;
  uint32_t part_order = (uint32_t)br.read_bits(4);
  uint32_t nparts = 1u << part_order;
  int idx = pred_order;
  for (uint32_t p = 0; p < nparts; ++p) {
    int count = blocksize >> part_order;
    if (p == 0) count -= pred_order;
    if (count < 0) return false;
    uint32_t param = (uint32_t)br.read_bits(param_bits);
    if (param == escape) {
      int raw_bits = (int)br.read_bits(5);
      for (int i = 0; i < count; ++i) out[idx++] = raw_bits ? br.read_signed(raw_bits) : 0;
    } else {
      for (int i = 0; i < count; ++i) {
        uint32_t q = br.read_unary();
        uint64_t r = br.read_bits(param);
        uint64_t u = ((uint64_t)q << param) | r;
        out[idx++] = (int64_t)(u >> 1) ^ -(int64_t)(u & 1);  // zigzag
      }
    }
    if (br.error) return false;
  }
  return idx == blocksize;
}

const int kFixedOrders[5][4] = {
    {},
    {1},
    {2, -1},
    {3, -3, 1},
    {4, -6, 4, -1},
};

bool decode_subframe(BitReader& br, int blocksize, int bps,
                     std::vector<int64_t>& out) {
  if (br.read_bit() != 0) return false;  // reserved
  uint32_t type = (uint32_t)br.read_bits(6);
  int wasted = 0;
  if (br.read_bit()) wasted = (int)br.read_unary() + 1;
  bps -= wasted;
  out.assign(blocksize, 0);

  if (type == 0) {  // CONSTANT
    int64_t v = br.read_signed(bps);
    for (int i = 0; i < blocksize; ++i) out[i] = v;
  } else if (type == 1) {  // VERBATIM
    for (int i = 0; i < blocksize; ++i) out[i] = br.read_signed(bps);
  } else if (type >= 8 && type <= 12) {  // FIXED order 0-4
    int order = (int)type - 8;
    for (int i = 0; i < order; ++i) out[i] = br.read_signed(bps);
    if (!read_residual(br, blocksize, order, out)) return false;
    for (int i = order; i < blocksize; ++i) {
      int64_t pred = 0;
      for (int j = 0; j < order; ++j) pred += (int64_t)kFixedOrders[order][j] * out[i - 1 - j];
      out[i] += pred;
    }
  } else if (type >= 32) {  // LPC order 1-32
    int order = (int)type - 31;
    for (int i = 0; i < order; ++i) out[i] = br.read_signed(bps);
    int precision = (int)br.read_bits(4) + 1;
    if (precision == 16) return false;  // invalid code 1111
    int shift = (int)br.read_signed(5);
    if (shift < 0) return false;
    std::vector<int64_t> coef(order);
    for (int i = 0; i < order; ++i) coef[i] = br.read_signed(precision);
    if (!read_residual(br, blocksize, order, out)) return false;
    for (int i = order; i < blocksize; ++i) {
      int64_t pred = 0;
      for (int j = 0; j < order; ++j) pred += coef[j] * out[i - 1 - j];
      out[i] += pred >> shift;
    }
  } else {
    return false;  // reserved type
  }
  if (wasted) {
    for (int i = 0; i < blocksize; ++i) out[i] <<= wasted;
  }
  return !br.error;
}

}  // namespace

extern "C" {

int flac_decode(const char* path, int32_t** out, long* n_samples,
                int* n_channels, int* sample_rate, int* bits) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long fsize = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf((size_t)fsize);
  if (fread(buf.data(), 1, (size_t)fsize, f) != (size_t)fsize) { fclose(f); return -2; }
  fclose(f);

  if (fsize < 42 || memcmp(buf.data(), "fLaC", 4) != 0) return -3;

  BitReader br(buf.data(), buf.size());
  br.byte_pos = 4;

  // ---- metadata blocks; STREAMINFO is mandatory first
  int channels = 0, sr = 0, bps = 0;
  uint64_t total = 0;
  bool last = false, first_block = true;
  while (!last) {
    last = br.read_bit() != 0;
    uint32_t type = (uint32_t)br.read_bits(7);
    uint32_t len = (uint32_t)br.read_bits(24);
    if (first_block) {
      if (type != 0 || len < 34) return -4;
      br.read_bits(16);  // min blocksize
      br.read_bits(16);  // max blocksize
      br.read_bits(24);  // min framesize
      br.read_bits(24);  // max framesize
      sr = (int)br.read_bits(20);
      channels = (int)br.read_bits(3) + 1;
      bps = (int)br.read_bits(5) + 1;
      total = br.read_bits(36);
      for (int i = 0; i < 16; ++i) br.read_bits(8);  // MD5
      first_block = false;
    } else {
      for (uint32_t i = 0; i < len; ++i) br.read_bits(8);
    }
    if (br.error) return -5;
  }
  if (channels < 1 || channels > 8 || sr <= 0) return -6;

  std::vector<int32_t> pcm;
  if (total) pcm.reserve((size_t)total * channels);
  std::vector<std::vector<int64_t>> ch(channels);

  // ---- frames
  while (br.byte_pos < br.size) {
    // sync code 0b11111111111110
    uint32_t sync = (uint32_t)br.read_bits(14);
    if (br.error || br.eof()) break;
    if (sync != 0x3FFE) break;  // trailing garbage / done
    br.read_bit();                         // reserved
    br.read_bit();                         // blocking strategy
    uint32_t bs_code = (uint32_t)br.read_bits(4);
    uint32_t sr_code = (uint32_t)br.read_bits(4);
    uint32_t ch_code = (uint32_t)br.read_bits(4);
    uint32_t ss_code = (uint32_t)br.read_bits(3);
    br.read_bit();  // reserved
    read_utf8_number(br);

    int blocksize;
    switch (bs_code) {
      case 1: blocksize = 192; break;
      case 2: case 3: case 4: case 5: blocksize = 576 << (bs_code - 2); break;
      case 6: blocksize = (int)br.read_bits(8) + 1; break;
      case 7: blocksize = (int)br.read_bits(16) + 1; break;
      default:
        if (bs_code >= 8) blocksize = 256 << (bs_code - 8);
        else return -7;
    }
    if (sr_code == 12) br.read_bits(8);
    else if (sr_code == 13 || sr_code == 14) br.read_bits(16);
    int frame_bps = bps;
    switch (ss_code) {
      case 0: break;  // from STREAMINFO
      case 1: frame_bps = 8; break;
      case 2: frame_bps = 12; break;
      case 4: frame_bps = 16; break;
      case 5: frame_bps = 20; break;
      case 6: frame_bps = 24; break;
      case 7: frame_bps = 32; break;
      default: return -8;
    }
    br.read_bits(8);  // CRC-8

    int nch = channels;
    if (ch_code >= 8 && ch_code <= 10) nch = 2;
    else if (ch_code > 10) return -9;

    for (int c = 0; c < nch; ++c) {
      int sub_bps = frame_bps;
      // side channel carries one extra bit
      if ((ch_code == 8 && c == 1) || (ch_code == 9 && c == 0) ||
          (ch_code == 10 && c == 1))
        sub_bps += 1;
      if (!decode_subframe(br, blocksize, sub_bps, ch[c])) return -10;
    }
    br.align_byte();
    br.read_bits(16);  // frame CRC-16
    if (br.error) return -11;

    // stereo decorrelation
    if (ch_code == 8) {  // left/side
      for (int i = 0; i < blocksize; ++i) ch[1][i] = ch[0][i] - ch[1][i];
    } else if (ch_code == 9) {  // right/side: ch0=side, ch1=right
      for (int i = 0; i < blocksize; ++i) ch[0][i] = ch[0][i] + ch[1][i];
    } else if (ch_code == 10) {  // mid/side
      for (int i = 0; i < blocksize; ++i) {
        int64_t side = ch[1][i];
        int64_t mid = (ch[0][i] << 1) | (side & 1);
        ch[0][i] = (mid + side) >> 1;
        ch[1][i] = (mid - side) >> 1;
      }
    }

    for (int i = 0; i < blocksize; ++i)
      for (int c = 0; c < nch; ++c) pcm.push_back((int32_t)ch[c][i]);

    if (total && pcm.size() >= (size_t)total * channels) break;
  }

  long ns = (long)(pcm.size() / channels);
  if (ns == 0) return -12;
  int32_t* res = (int32_t*)malloc(pcm.size() * sizeof(int32_t));
  if (!res) return -13;
  memcpy(res, pcm.data(), pcm.size() * sizeof(int32_t));
  *out = res;
  *n_samples = ns;
  *n_channels = channels;
  *sample_rate = sr;
  *bits = bps;
  return 0;
}

void flac_free(int32_t* buf) { free(buf); }

}  // extern "C"
