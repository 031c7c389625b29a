// First-party FLAC decoder (C library, driven from Python via ctypes).
//
// Replaces the reference's third-party decode stack (soundfile → librosa
// → pydub/ffmpeg cascade at vocalis/core/audio_utils.py:17-76) with a
// native in-repo implementation: the TPU build's data loader decodes on
// host CPU and ships float32 PCM to the device. Correctness is
// self-verifying — STREAMINFO carries an MD5 of the decoded PCM stream,
// which the Python wrapper checks (tests/test_audio_io.py).
//
// Supports the full FLAC subset in practice: 16/24/8/32-bit, all channel
// assignments (independent, left/side, right/side, mid/side), constant /
// verbatim / fixed(0-4) / LPC(1-32) subframes, Rice partitions with both
// 4- and 5-bit parameters and escape codes, UTF-8 frame numbers, CRC-8
// header and CRC-16 frame checks.
//
// Build: g++ -O2 -shared -fPIC -o libflacdec.so flac_decoder.cpp

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <vector>

namespace {

struct BitReader {
  const uint8_t* data;
  size_t size;
  size_t byte_pos = 0;
  int bit_pos = 0;  // bits consumed in current byte (0..7)
  bool error = false;

  explicit BitReader(const uint8_t* d, size_t n) : data(d), size(n) {}

  bool eof() const { return byte_pos >= size; }

  uint32_t read_bit() {
    if (byte_pos >= size) { error = true; return 0; }
    uint32_t bit = (data[byte_pos] >> (7 - bit_pos)) & 1u;
    if (++bit_pos == 8) { bit_pos = 0; ++byte_pos; }
    return bit;
  }

  uint64_t read_bits(int n) {  // n <= 64
    uint64_t v = 0;
    // fast path: byte-aligned whole bytes
    while (n >= 8 && bit_pos == 0) {
      if (byte_pos >= size) { error = true; return 0; }
      v = (v << 8) | data[byte_pos++];
      n -= 8;
    }
    for (int i = 0; i < n; ++i) v = (v << 1) | read_bit();
    return v;
  }

  int64_t read_signed(int n) {
    if (n == 0) return 0;
    uint64_t v = read_bits(n);
    uint64_t sign = 1ull << (n - 1);
    return (v & sign) ? (int64_t)(v | ~((sign << 1) - 1)) : (int64_t)v;
  }

  uint32_t read_unary() {
    uint32_t q = 0;
    // byte-at-a-time scan for the terminating 1 bit
    while (true) {
      if (byte_pos >= size) { error = true; return q; }
      uint8_t cur = data[byte_pos] & (0xFFu >> bit_pos);
      if (cur == 0) {
        q += 8 - bit_pos;
        bit_pos = 0;
        ++byte_pos;
        continue;
      }
      // index of highest set bit
      int hi = 7;
      while (!((cur >> hi) & 1)) --hi;
      int zeros = (7 - hi) - bit_pos;
      q += zeros;
      bit_pos += zeros + 1;
      if (bit_pos >= 8) { bit_pos -= 8; ++byte_pos; }
      return q;
    }
  }

  void align() {
    if (bit_pos) { bit_pos = 0; ++byte_pos; }
  }
};

uint8_t crc8(const uint8_t* d, size_t n) {
  uint8_t crc = 0;
  for (size_t i = 0; i < n; ++i) {
    crc ^= d[i];
    for (int b = 0; b < 8; ++b)
      crc = (crc & 0x80) ? (uint8_t)((crc << 1) ^ 0x07) : (uint8_t)(crc << 1);
  }
  return crc;
}

uint16_t crc16(const uint8_t* d, size_t n) {
  uint16_t crc = 0;
  for (size_t i = 0; i < n; ++i) {
    crc ^= (uint16_t)d[i] << 8;
    for (int b = 0; b < 8; ++b)
      crc = (crc & 0x8000) ? (uint16_t)((crc << 1) ^ 0x8005)
                           : (uint16_t)(crc << 1);
  }
  return crc;
}

const int kFixedOrders[5][4] = {
    {},                  // order 0: e = x
    {1},                 // order 1: e = x - x1
    {2, -1},             // order 2
    {3, -3, 1},          // order 3
    {4, -6, 4, -1},      // order 4
};

struct StreamInfo {
  uint32_t min_block = 0, max_block = 0;
  uint32_t sample_rate = 0;
  uint32_t channels = 0;
  uint32_t bits_per_sample = 0;
  uint64_t total_samples = 0;
  uint8_t md5[16] = {0};
};

bool read_residual(BitReader& br, int order, int block_size,
                   std::vector<int64_t>& out) {
  uint32_t method = (uint32_t)br.read_bits(2);
  if (method > 1) return false;
  int param_bits = method == 0 ? 4 : 5;
  uint32_t escape = method == 0 ? 0xF : 0x1F;
  uint32_t part_order = (uint32_t)br.read_bits(4);
  uint32_t n_parts = 1u << part_order;
  int idx = order;
  for (uint32_t p = 0; p < n_parts; ++p) {
    int count = (int)(block_size >> part_order) - (p == 0 ? order : 0);
    if (count < 0) return false;
    uint32_t param = (uint32_t)br.read_bits(param_bits);
    if (param == escape) {
      int nbits = (int)br.read_bits(5);
      for (int i = 0; i < count; ++i) out[idx++] = br.read_signed(nbits);
    } else {
      for (int i = 0; i < count; ++i) {
        uint32_t q = br.read_unary();
        uint64_t r = br.read_bits(param);
        uint64_t u = ((uint64_t)q << param) | r;
        out[idx++] = (u & 1) ? -((int64_t)(u >> 1)) - 1 : (int64_t)(u >> 1);
      }
    }
    if (br.error) return false;
  }
  return idx == block_size;
}

bool decode_subframe(BitReader& br, int block_size, int bps,
                     std::vector<int64_t>& out) {
  if (br.read_bit() != 0) return false;  // padding bit
  uint32_t type = (uint32_t)br.read_bits(6);
  int wasted = 0;
  if (br.read_bit()) {  // wasted bits flag: unary count - 1
    wasted = 1 + (int)br.read_unary();
  }
  bps -= wasted;
  out.assign(block_size, 0);

  if (type == 0) {  // CONSTANT
    int64_t v = br.read_signed(bps);
    for (int i = 0; i < block_size; ++i) out[i] = v;
  } else if (type == 1) {  // VERBATIM
    for (int i = 0; i < block_size; ++i) out[i] = br.read_signed(bps);
  } else if (type >= 8 && type <= 12) {  // FIXED, order 0-4
    int order = (int)type - 8;
    for (int i = 0; i < order; ++i) out[i] = br.read_signed(bps);
    if (!read_residual(br, order, block_size, out)) return false;
    for (int i = order; i < block_size; ++i) {
      int64_t pred = 0;
      for (int j = 0; j < order; ++j)
        pred += (int64_t)kFixedOrders[order][j] * out[i - 1 - j];
      out[i] += pred;
    }
  } else if (type >= 32) {  // LPC, order 1-32
    int order = (int)(type & 31) + 1;
    for (int i = 0; i < order; ++i) out[i] = br.read_signed(bps);
    uint32_t prec = (uint32_t)br.read_bits(4);
    if (prec == 15) return false;
    prec += 1;
    int shift = (int)br.read_signed(5);
    if (shift < 0) return false;
    int64_t coef[32];
    for (int i = 0; i < order; ++i) coef[i] = br.read_signed((int)prec);
    if (!read_residual(br, order, block_size, out)) return false;
    for (int i = order; i < block_size; ++i) {
      int64_t pred = 0;
      for (int j = 0; j < order; ++j) pred += coef[j] * out[i - 1 - j];
      out[i] += pred >> shift;
    }
  } else {
    return false;  // reserved
  }
  if (wasted)
    for (int i = 0; i < block_size; ++i) out[i] <<= wasted;
  return !br.error;
}

uint64_t read_utf8_number(BitReader& br) {
  uint32_t b0 = (uint32_t)br.read_bits(8);
  int extra = 0;
  uint64_t v;
  if (b0 < 0x80) return b0;
  else if ((b0 & 0xE0) == 0xC0) { v = b0 & 0x1F; extra = 1; }
  else if ((b0 & 0xF0) == 0xE0) { v = b0 & 0x0F; extra = 2; }
  else if ((b0 & 0xF8) == 0xF0) { v = b0 & 0x07; extra = 3; }
  else if ((b0 & 0xFC) == 0xF8) { v = b0 & 0x03; extra = 4; }
  else if ((b0 & 0xFE) == 0xFC) { v = b0 & 0x01; extra = 5; }
  else if (b0 == 0xFE) { v = 0; extra = 6; }
  else { br.error = true; return 0; }
  for (int i = 0; i < extra; ++i) {
    uint32_t b = (uint32_t)br.read_bits(8);
    if ((b & 0xC0) != 0x80) { br.error = true; return 0; }
    v = (v << 6) | (b & 0x3F);
  }
  return v;
}

}  // namespace

extern "C" {

// Parses STREAMINFO. Returns 0 on success.
// info_out: [sample_rate, channels, bits_per_sample, total_samples_lo,
//            total_samples_hi], md5_out: 16 bytes.
int flac_stream_info(const uint8_t* data, size_t size, uint32_t* info_out,
                     uint8_t* md5_out) {
  if (size < 42 || memcmp(data, "fLaC", 4) != 0) return -1;
  size_t pos = 4;
  while (pos + 4 <= size) {
    uint8_t hdr = data[pos];
    uint32_t type = hdr & 0x7F;
    uint32_t len = ((uint32_t)data[pos + 1] << 16) |
                   ((uint32_t)data[pos + 2] << 8) | data[pos + 3];
    pos += 4;
    if (type == 0) {  // STREAMINFO
      if (pos + 34 > size) return -2;
      const uint8_t* p = data + pos;
      uint32_t sr = ((uint32_t)p[10] << 12) | ((uint32_t)p[11] << 4) |
                    (p[12] >> 4);
      uint32_t ch = ((p[12] >> 1) & 0x7) + 1;
      uint32_t bps = (((p[12] & 1) << 4) | (p[13] >> 4)) + 1;
      uint64_t total = ((uint64_t)(p[13] & 0x0F) << 32) |
                       ((uint64_t)p[14] << 24) | ((uint64_t)p[15] << 16) |
                       ((uint64_t)p[16] << 8) | p[17];
      info_out[0] = sr;
      info_out[1] = ch;
      info_out[2] = bps;
      info_out[3] = (uint32_t)(total & 0xFFFFFFFFu);
      info_out[4] = (uint32_t)(total >> 32);
      memcpy(md5_out, p + 18, 16);
      return 0;
    }
    pos += len;
    if (hdr & 0x80) break;  // was last block and not STREAMINFO
  }
  return -3;
}

// Decodes the whole stream to interleaved int32 samples.
// Returns number of samples per channel, or negative error.
long long flac_decode(const uint8_t* data, size_t size, int32_t* out,
                      long long out_capacity_per_channel) {
  uint32_t info[5];
  uint8_t md5[16];
  if (flac_stream_info(data, size, info, md5) != 0) return -1;
  uint32_t channels = info[1];
  uint32_t stream_bps = info[2];

  // skip metadata blocks
  size_t pos = 4;
  bool last = false;
  while (!last && pos + 4 <= size) {
    last = data[pos] & 0x80;
    uint32_t len = ((uint32_t)data[pos + 1] << 16) |
                   ((uint32_t)data[pos + 2] << 8) | data[pos + 3];
    pos += 4 + len;
  }

  BitReader br(data, size);
  br.byte_pos = pos;
  long long written = 0;
  std::vector<std::vector<int64_t>> chan(channels);

  while (br.byte_pos + 2 < size) {
    size_t frame_start = br.byte_pos;
    uint32_t sync = (uint32_t)br.read_bits(14);
    if (br.error) break;
    if (sync != 0x3FFE) return -4;
    br.read_bit();  // reserved
    br.read_bit();  // blocking strategy
    uint32_t bs_code = (uint32_t)br.read_bits(4);
    uint32_t sr_code = (uint32_t)br.read_bits(4);
    uint32_t ch_code = (uint32_t)br.read_bits(4);
    uint32_t bps_code = (uint32_t)br.read_bits(3);
    br.read_bit();  // reserved

    read_utf8_number(br);  // frame/sample number (unused; sequential decode)

    int block_size;
    switch (bs_code) {
      case 0: return -5;
      case 1: block_size = 192; break;
      case 6: block_size = (int)br.read_bits(8) + 1; break;
      case 7: block_size = (int)br.read_bits(16) + 1; break;
      default:
        if (bs_code <= 5) block_size = 576 << (bs_code - 2);
        else block_size = 256 << (bs_code - 8);
    }
    if (sr_code == 12) br.read_bits(8);
    else if (sr_code == 13 || sr_code == 14) br.read_bits(16);

    int bps;
    switch (bps_code) {
      case 0: bps = (int)stream_bps; break;
      case 1: bps = 8; break;
      case 2: bps = 12; break;
      case 4: bps = 16; break;
      case 5: bps = 20; break;
      case 6: bps = 24; break;
      case 7: bps = 32; break;
      default: return -6;
    }

    // CRC-8 covers the header bytes up to (not incl.) the CRC byte
    br.align();
    size_t hdr_len = br.byte_pos - frame_start;
    uint8_t hcrc = (uint8_t)br.read_bits(8);
    if (crc8(data + frame_start, hdr_len) != hcrc) return -7;

    int n_ch = (ch_code < 8) ? (int)ch_code + 1 : 2;
    if ((uint32_t)n_ch != channels) return -8;

    for (int c = 0; c < n_ch; ++c) {
      int sub_bps = bps;
      // side channels carry one extra bit
      if (ch_code == 8 && c == 1) sub_bps += 1;       // left/side
      else if (ch_code == 9 && c == 0) sub_bps += 1;  // right/side
      else if (ch_code == 10 && c == 1) sub_bps += 1; // mid/side
      if (!decode_subframe(br, block_size, sub_bps, chan[c])) return -9;
    }
    br.align();
    size_t frame_len = br.byte_pos - frame_start;
    uint16_t fcrc = (uint16_t)br.read_bits(16);
    if (crc16(data + frame_start, frame_len) != fcrc) return -10;
    if (br.error) return -11;

    // undo inter-channel decorrelation
    if (ch_code == 8) {        // left/side: right = left - side
      for (int i = 0; i < block_size; ++i)
        chan[1][i] = chan[0][i] - chan[1][i];
    } else if (ch_code == 9) { // right/side: left = right + side
      for (int i = 0; i < block_size; ++i)
        chan[0][i] = chan[1][i] + chan[0][i];
    } else if (ch_code == 10) {// mid/side
      for (int i = 0; i < block_size; ++i) {
        int64_t side = chan[1][i];
        int64_t mid = (chan[0][i] << 1) | (side & 1);
        chan[0][i] = (mid + side) >> 1;
        chan[1][i] = (mid - side) >> 1;
      }
    }

    if (written + block_size > out_capacity_per_channel) return -12;
    for (int i = 0; i < block_size; ++i)
      for (uint32_t c = 0; c < channels; ++c)
        out[(written + i) * channels + c] = (int32_t)chan[c][i];
    written += block_size;
  }
  return written;
}

}  // extern "C"
