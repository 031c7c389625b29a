// First-party AAC-LC decoder + MP4/ADTS demux.
//
// Replaces the reference's delegation to ffmpeg for m4a/aac input
// (vocalis/core/audio_utils.py:17-76: soundfile -> librosa -> pydub ->
// ffmpeg cascade). Scope: MPEG-4 AAC Low Complexity (the profile every
// mainstream encoder emits), mono/stereo and multi-channel element
// sequences, long/short/start/stop windows, sine + KBD shapes, M/S and
// intensity stereo, TNS, PNS, pulse data; MP4 (ISO-BMFF) and ADTS
// containers. Not implemented: SBR/PS enhancement layers (HE-AAC files
// decode their LC core at the core rate), CCE coupling, 960-sample
// frames, MAIN/LTP prediction (not AAC-LC tools).
//
// Bitstream constants (Huffman codebooks, scalefactor-band offsets,
// TNS band limits) are ISO/IEC 14496-3 public-standard data recovered
// from the system codec archive by scripts/gen_aac_tables.py into
// aac_tables.h; everything else (IMDCT, windows, dequant, tool chain)
// is implemented from the spec's math here. Validated sample-exactly
// against libavcodec decoding the same access units
// (tests/test_aac.py, skip-if-absent oracle — the same pattern as the
// MP3 decoder's libmpg123 oracle in tests/test_mp3.py).
//
// C ABI (mirrors mp3_decoder.cpp):
//   long aac_info(data, size, *sr, *ch)             -> sample-count bound
//   long aac_decode(data, size, out, cap, *sr, *ch) -> frames written
//   long aac_demux(data, size, out_sizes, cap, *asc0, *asc1)
//       -> number of access units (demux-only introspection for tests)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

#include "aac_tables.h"

namespace {

// ---------------------------------------------------------------------------
// bit reader (MSB first)

struct BitReader {
    const uint8_t* data;
    size_t size;      // bytes
    size_t pos = 0;   // bit position
    bool overrun = false;

    BitReader(const uint8_t* d, size_t n) : data(d), size(n) {}

    uint32_t get(int n) {
        uint32_t v = 0;
        for (int i = 0; i < n; i++) {
            size_t byte = pos >> 3;
            if (byte >= size) { overrun = true; return v << (n - i); }
            v = (v << 1) | ((data[byte] >> (7 - (pos & 7))) & 1);
            pos++;
        }
        return v;
    }
    uint32_t get1() { return get(1); }
    int sget(int n) {  // sign-extended
        uint32_t v = get(n);
        return (int)(v << (32 - n)) >> (32 - n);
    }
    void align() { pos = (pos + 7) & ~size_t(7); }
    size_t bits_left() const { return size * 8 - pos; }
};

// ---------------------------------------------------------------------------
// Huffman decode: walk the code bit-by-bit against the (code, len)
// tables. Max codeword 19 bits (sf book); per-length first/last index
// maps make each step O(log n) at worst — plenty for a file decoder.

struct HuffCB {
    // entries sorted by (len, code) with an index per length
    struct E { uint32_t code; uint16_t idx; };
    std::vector<E> by_len[20];  // length 1..19

    void build(const uint32_t* codes, const uint8_t* bits, int n) {
        for (int i = 0; i < n; i++)
            by_len[bits[i]].push_back({codes[i], (uint16_t)i});
    }
    void build16(const uint16_t* codes, const uint8_t* bits, int n) {
        for (int i = 0; i < n; i++)
            by_len[bits[i]].push_back({codes[i], (uint16_t)i});
    }
    // returns symbol index or -1
    int decode(BitReader& br) const {
        uint32_t acc = 0;
        for (int len = 1; len < 20; len++) {
            acc = (acc << 1) | br.get1();
            if (br.overrun) return -1;
            for (const E& e : by_len[len])
                if (e.code == acc) return e.idx;
        }
        return -1;
    }
};

struct Tables {
    HuffCB spec[11];
    HuffCB sf;
    // windows
    float sine_long[1024], sine_short[128];
    float kbd_long[1024], kbd_short[128];
    // IMDCT basis, [n][k] layout: long 2048x1024, short 256x128
    std::vector<float> imdct_long, imdct_short;

    Tables() {
        for (int i = 0; i < 11; i++)
            spec[i].build16(aactab::spec_cb[i].codes, aactab::spec_cb[i].bits,
                            aactab::spec_cb[i].n);
        sf.build(aactab::sf_codes, aactab::sf_bits, 121);
        for (int i = 0; i < 1024; i++)
            sine_long[i] = std::sin(M_PI / 2048 * (i + 0.5));
        for (int i = 0; i < 128; i++)
            sine_short[i] = std::sin(M_PI / 256 * (i + 0.5));
        make_kbd(kbd_long, 1024, 4.0);
        make_kbd(kbd_short, 128, 6.0);
        make_imdct(imdct_long, 2048);
        make_imdct(imdct_short, 256);
    }

    // Kaiser-Bessel derived window, left half of an N*2 window
    // (14496-3 §4.6.11.2): w[n] = sqrt(cum[n+1]/cum[N+1]) over Kaiser
    // terms v[j] = I0(pi*a*sqrt(1-(2j/N - 1)^2)).
    static double bessel_i0(double x) {
        double s = 1.0, t = 1.0;
        for (int k = 1; k < 64; k++) {
            t *= (x / (2.0 * k)) * (x / (2.0 * k));
            s += t;
            if (t < 1e-21 * s) break;
        }
        return s;
    }
    static void make_kbd(float* w, int n, double alpha) {
        std::vector<double> cum(n + 1);
        double acc = 0;
        for (int j = 0; j <= n; j++) {
            double r = 2.0 * j / n - 1.0;
            acc += bessel_i0(M_PI * alpha * std::sqrt(1.0 - r * r));
            cum[j] = acc;
        }
        for (int i = 0; i < n; i++)
            w[i] = std::sqrt(cum[i] / cum[n]);
    }

    // x[n] = sum_k X[k] cos(2pi/N (n + n0)(k + 1/2)), n0 = (N/2+1)/2
    // (14496-3 §4.6.11.1). Stored [n][k] so the inner MAC loop is
    // contiguous; 8.4 MB for the long basis, computed once per process.
    static void make_imdct(std::vector<float>& tab, int n) {
        int m = n / 2;
        double n0 = (m + 1) / 2.0;
        tab.resize((size_t)n * m);
        for (int i = 0; i < n; i++)
            for (int k = 0; k < m; k++)
                tab[(size_t)i * m + k] =
                    std::cos(2.0 * M_PI / n * (i + n0) * (k + 0.5));
    }
};

const Tables& tables() {
    static Tables t;
    return t;
}

// ---------------------------------------------------------------------------
// AAC-LC frame decoder

constexpr int MAX_CH = 8;

enum { ONLY_LONG = 0, LONG_START = 1, EIGHT_SHORT = 2, LONG_STOP = 3 };
enum { ZERO_HCB = 0, NOISE_HCB = 13, INTENSITY_HCB2 = 14, INTENSITY_HCB = 15 };

struct IcsInfo {
    int window_sequence = ONLY_LONG;
    int window_shape = 0;           // 0 sine, 1 KBD
    int max_sfb = 0;
    int num_windows = 1;
    int num_groups = 1;
    int group_len[8] = {1};         // windows per group
    const uint16_t* swb_offset = nullptr;
    int num_swb = 0;
};

struct ChannelDec {
    float spec[1024];               // de-interleaved spectra
    IcsInfo ics;
    uint8_t sfb_cb[8][64];          // per group
    int sf[8][64];                  // scalefactor / is_pos / noise_nrg
    // TNS
    bool tns_present = false;
    int tns_n_filt[8] = {0};
    int tns_length[8][4], tns_order[8][4], tns_dir[8][4];
    float tns_coef[8][4][32];
};

struct ChannelState {                // persists across frames
    float overlap[1024] = {0};
    int prev_shape = 0;
    int prev_seq = ONLY_LONG;
};

struct Decoder {
    int sr_index = 3;               // 48k default
    int channels = 2;
    ChannelState state[MAX_CH];
    uint32_t noise_rng = 0x1f2e3d4c;
    std::string err;

    bool fail(const char* m) { err = m; return false; }

    // ---- ics_info (14496-3 Table 4.6)
    bool read_ics_info(BitReader& br, IcsInfo& ics) {
        br.get1();                               // ics_reserved
        ics.window_sequence = br.get(2);
        ics.window_shape = br.get1();
        if (ics.window_sequence == EIGHT_SHORT) {
            ics.max_sfb = br.get(4);
            uint32_t grouping = br.get(7);
            ics.num_windows = 8;
            ics.num_groups = 1;
            ics.group_len[0] = 1;
            for (int w = 1; w < 8; w++) {
                if ((grouping >> (7 - w)) & 1) {
                    ics.group_len[ics.num_groups - 1]++;
                } else {
                    ics.group_len[ics.num_groups++] = 1;
                }
            }
            ics.swb_offset = aactab::swb_offset_128[sr_index];
            ics.num_swb = aactab::num_swb_128[sr_index];
        } else {
            ics.max_sfb = br.get(6);
            if (br.get1())                        // predictor_data_present
                return fail("MAIN/LTP prediction is not an AAC-LC tool");
            ics.num_windows = 1;
            ics.num_groups = 1;
            ics.group_len[0] = 1;
            ics.swb_offset = aactab::swb_offset_1024[sr_index];
            ics.num_swb = aactab::num_swb_1024[sr_index];
        }
        if (ics.max_sfb > ics.num_swb) return fail("max_sfb > num_swb");
        return true;
    }

    // ---- section data (Table 4.52)
    bool read_sections(BitReader& br, ChannelDec& cd) {
        const IcsInfo& ics = cd.ics;
        int bits = ics.window_sequence == EIGHT_SHORT ? 3 : 5;
        int esc = (1 << bits) - 1;
        for (int g = 0; g < ics.num_groups; g++) {
            int k = 0;
            while (k < ics.max_sfb) {
                int cb = br.get(4);
                int len = 0, inc;
                do { inc = br.get(bits); len += inc; } while (inc == esc);
                if (br.overrun || len == 0 || k + len > ics.max_sfb)
                    return fail("bad section data");
                if (cb == 12) return fail("reserved codebook 12");
                for (int s = k; s < k + len; s++) cd.sfb_cb[g][s] = cb;
                k += len;
            }
        }
        return true;
    }

    // ---- scale factor data (Table 4.53): DPCM from global_gain;
    // intensity positions and PNS energies ride the same codebook.
    bool read_scalefactors(BitReader& br, ChannelDec& cd, int global_gain) {
        const Tables& t = tables();
        int sf_off = global_gain;
        int is_off = 0;
        int noise_off = global_gain - 90;
        bool noise_first = true;
        for (int g = 0; g < cd.ics.num_groups; g++)
            for (int s = 0; s < cd.ics.max_sfb; s++) {
                int cb = cd.sfb_cb[g][s];
                if (cb == ZERO_HCB) {
                    cd.sf[g][s] = 0;
                } else if (cb == INTENSITY_HCB || cb == INTENSITY_HCB2) {
                    int d = t.sf.decode(br);
                    if (d < 0) return fail("sf huffman");
                    is_off += d - 60;
                    cd.sf[g][s] = is_off;
                } else if (cb == NOISE_HCB) {
                    if (noise_first) {
                        noise_off += (int)br.get(9) - 256;
                        noise_first = false;
                    } else {
                        int d = t.sf.decode(br);
                        if (d < 0) return fail("sf huffman");
                        noise_off += d - 60;
                    }
                    cd.sf[g][s] = noise_off;
                } else {
                    int d = t.sf.decode(br);
                    if (d < 0) return fail("sf huffman");
                    sf_off += d - 60;
                    if (sf_off < 0 || sf_off > 255) return fail("sf range");
                    cd.sf[g][s] = sf_off;
                }
            }
        return true;
    }

    // ---- TNS data (Table 4.54)
    bool read_tns(BitReader& br, ChannelDec& cd) {
        bool short_win = cd.ics.window_sequence == EIGHT_SHORT;
        for (int w = 0; w < cd.ics.num_windows; w++) {
            int n_filt = br.get(short_win ? 1 : 2);
            cd.tns_n_filt[w] = n_filt;
            if (!n_filt) continue;
            int coef_res = br.get1();
            for (int f = 0; f < n_filt; f++) {
                cd.tns_length[w][f] = br.get(short_win ? 4 : 6);
                int order = cd.tns_order[w][f] = br.get(short_win ? 3 : 5);
                if (order > 20) return fail("TNS order > 20");
                if (!order) continue;
                cd.tns_dir[w][f] = br.get1();
                int compress = br.get1();
                int bits = coef_res + 3 - compress;
                // dequant (14496-3 §4.6.9.3 tns_decode_coef)
                double iqfac = ((1 << (coef_res + 2)) - 0.5) / (M_PI / 2);
                double iqfac_m = ((1 << (coef_res + 2)) + 0.5) / (M_PI / 2);
                for (int i = 0; i < order; i++) {
                    int c = br.sget(bits);
                    cd.tns_coef[w][f][i] =
                        std::sin(c / (c >= 0 ? iqfac : iqfac_m));
                }
            }
        }
        return !br.overrun;
    }

    // ---- spectral data (Table 4.57): per group, per section, per
    // window-in-group interleaved; decoded into a group-linear buffer
    // then de-interleaved into per-window spectra.
    bool read_spectral(BitReader& br, ChannelDec& cd) {
        const Tables& t = tables();
        const IcsInfo& ics = cd.ics;
        std::memset(cd.spec, 0, sizeof(cd.spec));
        float gbuf[1024];
        int win0 = 0;
        for (int g = 0; g < ics.num_groups; g++) {
            int wgl = ics.group_len[g];
            std::memset(gbuf, 0, sizeof(gbuf));
            int base = 0;  // position in the group buffer
            for (int s = 0; s < ics.max_sfb; s++) {
                int cb = cd.sfb_cb[g][s];
                int width = ics.swb_offset[s + 1] - ics.swb_offset[s];
                int n = width * wgl;
                if (cb >= 1 && cb <= 11) {
                    const HuffCB& h = t.spec[cb - 1];
                    int dim = cb <= 4 ? 4 : 2;
                    bool is_signed = cb <= 2 || cb == 5 || cb == 6;
                    for (int i = 0; i < n; i += dim) {
                        int idx = h.decode(br);
                        if (idx < 0) return fail("spectral huffman");
                        int v[4];
                        if (cb <= 2) {            // signed quads base 3
                            v[0] = idx / 27 % 3 - 1; v[1] = idx / 9 % 3 - 1;
                            v[2] = idx / 3 % 3 - 1;  v[3] = idx % 3 - 1;
                        } else if (cb <= 4) {     // unsigned quads base 3
                            v[0] = idx / 27 % 3; v[1] = idx / 9 % 3;
                            v[2] = idx / 3 % 3;  v[3] = idx % 3;
                        } else if (cb <= 6) {     // signed pairs base 9
                            v[0] = idx / 9 - 4; v[1] = idx % 9 - 4;
                        } else if (cb <= 8) {     // unsigned pairs base 8
                            v[0] = idx / 8; v[1] = idx % 8;
                        } else if (cb <= 10) {    // unsigned pairs base 13
                            v[0] = idx / 13; v[1] = idx % 13;
                        } else {                  // cb 11: base 17, 16=esc
                            v[0] = idx / 17; v[1] = idx % 17;
                        }
                        int sign[4] = {1, 1, 1, 1};
                        if (!is_signed)
                            for (int j = 0; j < dim; j++)
                                if (v[j] && br.get1()) sign[j] = -1;
                        if (cb == 11)
                            for (int j = 0; j < dim; j++)
                                if (v[j] == 16) {
                                    int nbits = 4;
                                    while (br.get1() && nbits < 20) nbits++;
                                    if (nbits >= 20)
                                        return fail("escape prefix");
                                    v[j] = (1 << nbits) + br.get(nbits);
                                    if (v[j] > 8191)
                                        return fail("coef > 8191");
                                }
                        for (int j = 0; j < dim && base + i + j < 1024; j++)
                            gbuf[base + i + j] = (float)(sign[j] * v[j]);
                    }
                    if (br.overrun) return fail("spectral overrun");
                }
                base += n;
            }
            // de-interleave: group buffer [sfb][win][coef] -> per-window
            // spectra (windows are 128 coefs; the single long window is
            // win0=0 so the same indexing covers both cases)
            base = 0;
            for (int s = 0; s < ics.max_sfb; s++) {
                int off = ics.swb_offset[s];
                int width = ics.swb_offset[s + 1] - ics.swb_offset[s];
                for (int w = 0; w < wgl; w++)
                    std::memcpy(&cd.spec[(win0 + w) * 128 + off],
                                &gbuf[base + w * width],
                                width * sizeof(float));
                base += width * wgl;
            }
            win0 += wgl;
        }
        return true;
    }

    // ---- pulse data (Table 4.7, long windows only): parsed in
    // bitstream position (right after its present bit), applied to the
    // quantized values after spectral decode.
    struct Pulse { int n = 0; int pos[4]; int amp[4]; };

    bool read_pulse(BitReader& br, ChannelDec& cd, Pulse& p) {
        p.n = br.get(2) + 1;
        int start_sfb = br.get(6);
        if (start_sfb >= cd.ics.num_swb) return fail("pulse sfb");
        int k = cd.ics.swb_offset[start_sfb];
        for (int i = 0; i < p.n; i++) {
            k += br.get(5);
            p.amp[i] = br.get(4);
            if (k >= 1024) return fail("pulse offset");
            p.pos[i] = k;
        }
        return !br.overrun;
    }

    static void apply_pulse(ChannelDec& cd, const Pulse& p) {
        for (int i = 0; i < p.n; i++) {
            float v = cd.spec[p.pos[i]];
            cd.spec[p.pos[i]] = v >= 0 ? v + p.amp[i] : v - p.amp[i];
        }
    }

    // ---- dequant + scalefactor application (§4.6.2-4.6.3):
    // x = sign(q) |q|^{4/3} 2^{(sf-100)/4}; PNS bands get scaled noise.
    void dequant(ChannelDec& cd) {
        const IcsInfo& ics = cd.ics;
        int win0 = 0;
        for (int g = 0; g < ics.num_groups; g++) {
            for (int s = 0; s < ics.max_sfb; s++) {
                int cb = cd.sfb_cb[g][s];
                int off = ics.swb_offset[s];
                int width = ics.swb_offset[s + 1] - ics.swb_offset[s];
                if (cb == ZERO_HCB || cb == INTENSITY_HCB
                    || cb == INTENSITY_HCB2)
                    continue;
                if (cb == NOISE_HCB) {
                    // §4.6.13: unit-energy random vector scaled to
                    // 2^{sf/4} per-band RMS energy
                    for (int w = 0; w < ics.group_len[g]; w++) {
                        float* x = &cd.spec[(win0 + w) * 128 + off];
                        double e = 0;
                        for (int i = 0; i < width; i++) {
                            noise_rng = noise_rng * 1664525u + 1013904223u;
                            x[i] = (float)(int32_t)noise_rng;
                            e += (double)x[i] * x[i];
                        }
                        float scale = (float)(std::pow(2.0, 0.25 * cd.sf[g][s])
                                              / std::sqrt(e > 0 ? e : 1.0));
                        for (int i = 0; i < width; i++) x[i] *= scale;
                    }
                    continue;
                }
                float gain = (float)std::pow(2.0, 0.25 * (cd.sf[g][s] - 100));
                for (int w = 0; w < ics.group_len[g]; w++) {
                    float* x = &cd.spec[(win0 + w) * 128 + off];
                    for (int i = 0; i < width; i++) {
                        float q = x[i];
                        x[i] = std::copysign(
                            std::pow(std::fabs(q), 4.0 / 3.0), q) * gain;
                    }
                }
            }
            win0 += ics.group_len[g];
        }
    }

    // ---- M/S stereo (§4.6.8.1): l=m+s, r=m-s on ms_used bands of a
    // common-window CPE (intensity/noise bands excluded).
    static void apply_ms(ChannelDec& l, ChannelDec& r,
                         const uint8_t ms_used[8][64], int ms_present) {
        const IcsInfo& ics = l.ics;
        int win0 = 0;
        for (int g = 0; g < ics.num_groups; g++) {
            for (int s = 0; s < ics.max_sfb; s++) {
                int cb = r.sfb_cb[g][s];
                if (cb == INTENSITY_HCB || cb == INTENSITY_HCB2
                    || cb == NOISE_HCB)
                    continue;
                if (!(ms_present == 2 || ms_used[g][s])) continue;
                int off = ics.swb_offset[s];
                int width = ics.swb_offset[s + 1] - ics.swb_offset[s];
                for (int w = 0; w < ics.group_len[g]; w++) {
                    float* lx = &l.spec[(win0 + w) * 128 + off];
                    float* rx = &r.spec[(win0 + w) * 128 + off];
                    for (int i = 0; i < width; i++) {
                        float m = lx[i], sdiff = rx[i];
                        lx[i] = m + sdiff;
                        rx[i] = m - sdiff;
                    }
                }
            }
            win0 += ics.group_len[g];
        }
    }

    // ---- intensity stereo (§4.6.8.2): right channel reconstructed
    // from the left at 2^{-is_pos/4}, phase by codebook and ms_used.
    static void apply_intensity(ChannelDec& l, ChannelDec& r,
                                const uint8_t ms_used[8][64],
                                int ms_present) {
        const IcsInfo& ics = r.ics;
        int win0 = 0;
        for (int g = 0; g < ics.num_groups; g++) {
            for (int s = 0; s < ics.max_sfb; s++) {
                int cb = r.sfb_cb[g][s];
                if (cb != INTENSITY_HCB && cb != INTENSITY_HCB2)
                    continue;
                float sign = cb == INTENSITY_HCB ? 1.0f : -1.0f;
                if (ms_present == 2 || (ms_present == 1 && ms_used[g][s]))
                    sign = -sign;
                float scale =
                    sign * (float)std::pow(0.5, 0.25 * r.sf[g][s]);
                int off = ics.swb_offset[s];
                int width = ics.swb_offset[s + 1] - ics.swb_offset[s];
                for (int w = 0; w < ics.group_len[g]; w++) {
                    float* lx = &l.spec[(win0 + w) * 128 + off];
                    float* rx = &r.spec[(win0 + w) * 128 + off];
                    for (int i = 0; i < width; i++)
                        rx[i] = lx[i] * scale;
                }
            }
            win0 += ics.group_len[g];
        }
    }

    // ---- TNS synthesis filter (§4.6.9): all-pole IIR along the
    // spectral coefficients of each window over the filter's sfb range.
    void apply_tns(ChannelDec& cd) {
        const IcsInfo& ics = cd.ics;
        bool short_win = ics.window_sequence == EIGHT_SHORT;
        int tns_max = short_win ? aactab::tns_max_bands_128[sr_index]
                                : aactab::tns_max_bands_1024[sr_index];
        int frame = short_win ? 128 : 1024;
        for (int w = 0; w < ics.num_windows; w++) {
            int bottom = ics.num_swb;
            for (int f = 0; f < cd.tns_n_filt[w]; f++) {
                int top = bottom;
                bottom = top - cd.tns_length[w][f];
                if (bottom < 0) bottom = 0;
                int order = cd.tns_order[w][f];
                if (!order) continue;
                // reflection -> LPC (tns_decode_coef recursion)
                float lpc[32], tmp[32];
                const float* coef = cd.tns_coef[w][f];
                lpc[0] = 1.0f;
                for (int m = 1; m <= order; m++) {
                    for (int i = 1; i < m; i++)
                        tmp[i] = lpc[i] + coef[m - 1] * lpc[m - i];
                    for (int i = 1; i < m; i++) lpc[i] = tmp[i];
                    lpc[m] = coef[m - 1];
                }
                int start_swb = std::min(std::min(bottom, tns_max),
                                         ics.max_sfb);
                int end_swb = std::min(std::min(top, tns_max), ics.max_sfb);
                int start = ics.swb_offset[start_swb];
                int end = ics.swb_offset[end_swb];
                if (end > frame) end = frame;
                int size = end - start;
                if (size <= 0) continue;
                float* x = &cd.spec[w * 128 + start];
                if (!cd.tns_dir[w][f]) {
                    for (int i = 0; i < size; i++)
                        for (int j = 1; j <= order && j <= i; j++)
                            x[i] -= lpc[j] * x[i - j];
                } else {
                    for (int i = size - 1; i >= 0; i--)
                        for (int j = 1; j <= order && i + j < size; j++)
                            x[i] -= lpc[j] * x[i + j];
                }
            }
        }
    }

    // ---- filterbank (§4.6.11): IMDCT + window + overlap-add.
    // Long transforms 1024 coefs -> 2048 samples; the short sequence
    // runs 8 x 256 at 128 hop starting at offset 448.
    void filterbank(ChannelDec& cd, ChannelState& st, float* out) {
        const Tables& t = tables();
        const float* wl_cur = cd.ics.window_shape ? t.kbd_long : t.sine_long;
        const float* wl_prev = st.prev_shape ? t.kbd_long : t.sine_long;
        const float* ws_cur = cd.ics.window_shape ? t.kbd_short
                                                  : t.sine_short;
        const float* ws_prev = st.prev_shape ? t.kbd_short : t.sine_short;
        int seq = cd.ics.window_sequence;
        float buf[2048];

        auto imdct = [&](const float* spec, int n, float* dst) {
            int m = n / 2;
            const float* tab = n == 2048 ? t.imdct_long.data()
                                         : t.imdct_short.data();
            // 2/N is the spec gain; the extra 1/2^15 maps the spec's
            // int16-range output convention onto float [-1, 1] (the
            // same convention libavcodec's float decoder uses)
            float gain = (2.0f / n) * (1.0f / 32768.0f);
            for (int i = 0; i < n; i++) {
                const float* row = tab + (size_t)i * m;
                float acc = 0;
                for (int k = 0; k < m; k++) acc += spec[k] * row[k];
                dst[i] = acc * gain;
            }
        };

        if (seq != EIGHT_SHORT) {
            imdct(cd.spec, 2048, buf);
            // left half: previous frame's shape (transition continuity)
            if (seq == LONG_STOP) {
                // [zeros(448) | short_rise(128) | ones(448)]
                for (int i = 0; i < 448; i++) buf[i] = 0;
                for (int i = 0; i < 128; i++) buf[448 + i] *= ws_prev[i];
            } else {
                for (int i = 0; i < 1024; i++) buf[i] *= wl_prev[i];
            }
            // right half: current shape
            if (seq == LONG_START) {
                // [ones(448) | short_fall(128) | zeros(448)]
                for (int i = 0; i < 128; i++)
                    buf[1024 + 448 + i] *= ws_cur[127 - i];
                for (int i = 0; i < 448; i++) buf[1024 + 576 + i] = 0;
            } else {
                for (int i = 0; i < 1024; i++)
                    buf[1024 + i] *= wl_cur[1023 - i];
            }
            for (int i = 0; i < 1024; i++) out[i] = buf[i] + st.overlap[i];
            for (int i = 0; i < 1024; i++) st.overlap[i] = buf[1024 + i];
        } else {
            float acc[2048] = {0};   // 1024 out + 1024 next-overlap
            float wbuf[256];
            for (int w = 0; w < 8; w++) {
                imdct(&cd.spec[w * 128], 256, wbuf);
                const float* wp = w == 0 ? ws_prev : ws_cur;
                for (int i = 0; i < 128; i++) wbuf[i] *= wp[i];
                for (int i = 0; i < 128; i++) wbuf[128 + i] *= ws_cur[127 - i];
                int o = 448 + w * 128;
                for (int i = 0; i < 256; i++) acc[o + i] += wbuf[i];
            }
            for (int i = 0; i < 1024; i++) out[i] = acc[i] + st.overlap[i];
            for (int i = 0; i < 1024; i++) st.overlap[i] = acc[1024 + i];
        }
        st.prev_shape = cd.ics.window_shape;
        st.prev_seq = seq;
    }

    // ---- individual_channel_stream (Table 4.50)
    bool read_ics(BitReader& br, ChannelDec& cd, bool common_window) {
        int global_gain = br.get(8);
        if (!common_window && !read_ics_info(br, cd.ics)) return false;
        if (!read_sections(br, cd)) return false;
        if (!read_scalefactors(br, cd, global_gain)) return false;
        Pulse pulse;
        if (br.get1()) {
            if (cd.ics.window_sequence == EIGHT_SHORT)
                return fail("pulse data in short window");
            if (!read_pulse(br, cd, pulse)) return false;
        }
        cd.tns_present = br.get1();
        if (cd.tns_present && !read_tns(br, cd)) return false;
        if (br.get1()) return fail("SSR gain control is not an LC tool");
        if (!read_spectral(br, cd)) return false;
        apply_pulse(cd, pulse);
        return !br.overrun;
    }

    // ---- syntactic elements
    bool decode_sce(BitReader& br, float* out_ch) {
        ChannelDec cd;
        br.get(4);  // element_instance_tag
        if (!read_ics(br, cd, false)) return false;
        dequant(cd);
        if (cd.tns_present) apply_tns(cd);
        filterbank(cd, state[cur_ch_], out_ch);
        return true;
    }

    bool decode_cpe(BitReader& br, float* out_l, float* out_r) {
        ChannelDec l, r;
        uint8_t ms_used[8][64] = {{0}};
        br.get(4);  // element_instance_tag
        int common = br.get1();
        int ms_present = 0;
        if (common) {
            if (!read_ics_info(br, l.ics)) return false;
            r.ics = l.ics;
            ms_present = br.get(2);
            if (ms_present == 3) return fail("ms_mask_present == 3");
            if (ms_present == 1)
                for (int g = 0; g < l.ics.num_groups; g++)
                    for (int s = 0; s < l.ics.max_sfb; s++)
                        ms_used[g][s] = br.get1();
        }
        if (!read_ics(br, l, common)) return false;
        if (!read_ics(br, r, common)) return false;
        dequant(l);
        dequant(r);
        if (common) {
            apply_ms(l, r, ms_used, ms_present);
            apply_intensity(l, r, ms_used, ms_present);
        }
        if (l.tns_present) apply_tns(l);
        if (r.tns_present) apply_tns(r);
        filterbank(l, state[cur_ch_], out_l);
        filterbank(r, state[cur_ch_ + 1], out_r);
        return true;
    }

    // program_config_element (Table 4.2) — parsed to stay bit-aligned
    bool skip_pce(BitReader& br) {
        br.get(4 + 2 + 4);  // tag, object_type, sampling_frequency_index
        int nf = br.get(4), ns = br.get(4), nb = br.get(4), nl = br.get(2);
        int na = br.get(3), nc = br.get(4);
        if (br.get1()) br.get(4);      // mono mixdown
        if (br.get1()) br.get(4);      // stereo mixdown
        if (br.get1()) br.get(3);      // matrix mixdown
        for (int i = 0; i < nf + ns + nb; i++) br.get(5);  // is_cpe+tag
        for (int i = 0; i < nl + na; i++) br.get(4);
        for (int i = 0; i < nc; i++) br.get(5);
        br.align();                     // comment field is byte-aligned
        int n = br.get(8);
        for (int i = 0; i < n; i++) br.get(8);
        return !br.overrun;
    }

    int cur_ch_ = 0;

    // ---- raw_data_block (Table 4.3): one 1024-sample frame.
    // interleave: out[frame*channels] float
    bool decode_frame(BitReader& br, float* out, int* out_ch) {
        float chbuf[MAX_CH][1024];
        cur_ch_ = 0;
        for (;;) {
            int id = br.get(3);
            if (br.overrun) return fail("truncated raw_data_block");
            if (id == 7) break;                     // END
            switch (id) {
                case 0:                             // SCE
                case 3:                             // LFE
                    if (cur_ch_ + 1 > MAX_CH) return fail("too many channels");
                    if (!decode_sce(br, chbuf[cur_ch_])) return false;
                    cur_ch_ += 1;
                    break;
                case 1:                             // CPE
                    if (cur_ch_ + 2 > MAX_CH) return fail("too many channels");
                    if (!decode_cpe(br, chbuf[cur_ch_], chbuf[cur_ch_ + 1]))
                        return false;
                    cur_ch_ += 2;
                    break;
                case 2:
                    return fail("CCE coupling not supported");
                case 4: {                           // DSE
                    br.get(4);
                    int align = br.get1();
                    int n = br.get(8);
                    if (n == 255) n += br.get(8);
                    if (align) br.align();
                    for (int i = 0; i < n; i++) br.get(8);
                    break;
                }
                case 5:
                    if (!skip_pce(br)) return false;
                    break;
                case 6: {                           // FIL (SBR lives here;
                    int n = br.get(4);              //  LC core only)
                    if (n == 15) n += (int)br.get(8) - 1;
                    for (int i = 0; i < n; i++) br.get(8);
                    break;
                }
            }
            if (br.overrun) return fail("element overrun");
        }
        *out_ch = cur_ch_;
        for (int i = 0; i < 1024; i++)
            for (int c = 0; c < cur_ch_; c++)
                out[i * cur_ch_ + c] = chbuf[c][i];
        return true;
    }
};

// ---------------------------------------------------------------------------
// containers

struct AU { size_t offset, size; };

struct Stream {
    int sr_index = -1;
    int channels = 0;
    int priming = 0;                 // leading samples to drop (MP4 edts)
    std::vector<AU> aus;
};

// ---- ADTS (14496-3 §1.A.3)

bool parse_adts(const uint8_t* d, size_t n, Stream& s) {
    size_t p = 0;
    if (n < 7) return false;
    // optional ID3v2 prefix
    if (n > 10 && !std::memcmp(d, "ID3", 3)) {
        size_t sz = ((d[6] & 0x7f) << 21) | ((d[7] & 0x7f) << 14)
                    | ((d[8] & 0x7f) << 7) | (d[9] & 0x7f);
        p = 10 + sz;
    }
    bool any = false;
    while (p + 7 <= n) {
        if (d[p] != 0xff || (d[p + 1] & 0xf6) != 0xf0) {
            if (!any) return false;
            break;                    // trailing garbage after valid frames
        }
        int profile = (d[p + 2] >> 6) & 3;        // 1 = AAC-LC
        int sf_idx = (d[p + 2] >> 2) & 0xf;
        int ch_cfg = ((d[p + 2] & 1) << 2) | (d[p + 3] >> 6);
        int frame_len = ((d[p + 3] & 3) << 11) | (d[p + 4] << 3)
                        | (d[p + 5] >> 5);
        int hdr = (d[p + 1] & 1) ? 7 : 9;          // protection_absent
        if (frame_len < hdr || p + frame_len > n) break;
        if (profile != 1 || sf_idx > 12) return false;
        if (!any) {
            s.sr_index = sf_idx;
            s.channels = ch_cfg ? ch_cfg : 2;
            any = true;
        }
        s.aus.push_back({p + hdr, (size_t)(frame_len - hdr)});
        p += frame_len;
    }
    return any;
}

// ---- MP4 / ISO-BMFF demux (ISO 14496-12): walk the box tree to the
// audio trak's sample tables and the esds AudioSpecificConfig.

uint32_t rd32(const uint8_t* p) {
    return ((uint32_t)p[0] << 24) | (p[1] << 16) | (p[2] << 8) | p[3];
}
uint64_t rd64(const uint8_t* p) {
    return ((uint64_t)rd32(p) << 32) | rd32(p + 4);
}

struct Box { uint32_t type; const uint8_t* body; size_t size; };

// iterate child boxes of [p, p+n)
template <typename F>
void for_boxes(const uint8_t* p, size_t n, F f) {
    size_t off = 0;
    while (off + 8 <= n) {
        uint64_t sz = rd32(p + off);
        uint32_t type = rd32(p + off + 4);
        size_t hdr = 8;
        if (sz == 1) {
            if (off + 16 > n) return;
            sz = rd64(p + off + 8);
            hdr = 16;
        } else if (sz == 0) {
            sz = n - off;
        }
        if (sz < hdr || off + sz > n) return;
        f(Box{type, p + off + hdr, (size_t)(sz - hdr)});
        off += sz;
    }
}

#define FOURCC(a, b, c, d) \
    ((uint32_t)(a) << 24 | (uint32_t)(b) << 16 | (uint32_t)(c) << 8 | (d))

// expandable descriptor length (14496-1 §8.3.3)
size_t desc_len(const uint8_t* p, size_t n, size_t& used) {
    size_t len = 0;
    used = 0;
    while (used < 4 && used < n) {
        uint8_t b = p[used++];
        len = (len << 7) | (b & 0x7f);
        if (!(b & 0x80)) break;
    }
    return len;
}

bool parse_esds(const uint8_t* p, size_t n, int& sr_index, int& channels) {
    if (n < 4) return false;
    p += 4;  // fullbox version/flags
    n -= 4;
    // ES_Descriptor(0x03) -> DecoderConfig(0x04) -> DecSpecificInfo(0x05)
    size_t used;
    if (!n || p[0] != 0x03) return false;
    desc_len(p + 1, n - 1, used);
    size_t off = 1 + used + 3;                 // ES_ID(2) + flags(1)
    if (off >= n) return false;
    uint8_t flags = p[1 + used + 2];
    if (flags & 0x80) off += 2;                // streamDependence
    if (flags & 0x40) {                        // URL
        if (off >= n) return false;
        off += 1 + p[off];
    }
    if (flags & 0x20) off += 2;                // OCRstream
    if (off >= n || p[off] != 0x04) return false;
    desc_len(p + off + 1, n - off - 1, used);
    off += 1 + used;
    off += 13;                                 // objType+stream+buf+rates
    if (off >= n || p[off] != 0x05) return false;
    size_t asc_len = desc_len(p + off + 1, n - off - 1, used);
    off += 1 + used;
    if (off + asc_len > n || asc_len < 2) return false;
    // AudioSpecificConfig (14496-3 §1.6.2.1)
    BitReader br(p + off, asc_len);
    int aot = br.get(5);
    if (aot == 31) aot = 32 + br.get(6);
    int sfi = br.get(4);
    if (sfi == 15) {
        int rate = br.get(24);
        sfi = -1;
        for (int i = 0; i < 13; i++)
            if (aactab::sample_rates[i] == rate) sfi = i;
        if (sfi < 0) return false;
    }
    int ch = br.get(4);
    // 2 = AAC-LC; 5/29 = HE-AAC signalling whose core is LC
    if (aot != 2 && aot != 5 && aot != 29) return false;
    if (aot == 2) {
        if (br.get1()) return false;           // frameLengthFlag: 960
        if (br.get1()) br.get(14);             // dependsOnCoreCoder
        br.get1();                             // extensionFlag
    }
    sr_index = sfi;
    channels = ch ? ch : 2;
    return sfi >= 0 && sfi <= 12;
}

bool parse_mp4(const uint8_t* d, size_t n, Stream& s) {
    if (n < 12 || rd32(d + 4) != FOURCC('f', 't', 'y', 'p')) return false;
    const uint8_t *stsd = nullptr, *stsz = nullptr, *stsc = nullptr,
                  *stco = nullptr, *co64 = nullptr, *elst = nullptr;
    size_t stsd_n = 0, stsz_n = 0, stsc_n = 0, stco_n = 0, co64_n = 0,
           elst_n = 0;
    uint32_t mdhd_timescale = 0;

    for_boxes(d, n, [&](Box moov) {
        if (moov.type != FOURCC('m', 'o', 'o', 'v')) return;
        for_boxes(moov.body, moov.size, [&](Box trak) {
            if (trak.type != FOURCC('t', 'r', 'a', 'k') || stsd) return;
            bool is_audio = false;
            const uint8_t* t_stsd = nullptr;
            const uint8_t *t_stsz = nullptr, *t_stsc = nullptr,
                          *t_stco = nullptr, *t_co64 = nullptr,
                          *t_elst = nullptr;
            size_t l_stsd = 0, l_stsz = 0, l_stsc = 0, l_stco = 0,
                   l_co64 = 0, l_elst = 0;
            uint32_t t_ts = 0;
            for_boxes(trak.body, trak.size, [&](Box tb) {
                if (tb.type == FOURCC('e', 'd', 't', 's')) {
                    for_boxes(tb.body, tb.size, [&](Box eb) {
                        if (eb.type == FOURCC('e', 'l', 's', 't')) {
                            t_elst = eb.body;
                            l_elst = eb.size;
                        }
                    });
                }
                if (tb.type != FOURCC('m', 'd', 'i', 'a')) return;
                for_boxes(tb.body, tb.size, [&](Box mb) {
                    if (mb.type == FOURCC('m', 'd', 'h', 'd')) {
                        if (mb.size >= 20)
                            t_ts = mb.body[0] == 1 ? rd32(mb.body + 20)
                                                   : rd32(mb.body + 12);
                    }
                    if (mb.type == FOURCC('h', 'd', 'l', 'r')) {
                        if (mb.size >= 12
                            && rd32(mb.body + 8)
                                   == FOURCC('s', 'o', 'u', 'n'))
                            is_audio = true;
                    }
                    if (mb.type != FOURCC('m', 'i', 'n', 'f')) return;
                    for_boxes(mb.body, mb.size, [&](Box nb) {
                        if (nb.type != FOURCC('s', 't', 'b', 'l')) return;
                        for_boxes(nb.body, nb.size, [&](Box sb) {
                            switch (sb.type) {
                                case FOURCC('s', 't', 's', 'd'):
                                    t_stsd = sb.body; l_stsd = sb.size; break;
                                case FOURCC('s', 't', 's', 'z'):
                                    t_stsz = sb.body; l_stsz = sb.size; break;
                                case FOURCC('s', 't', 's', 'c'):
                                    t_stsc = sb.body; l_stsc = sb.size; break;
                                case FOURCC('s', 't', 'c', 'o'):
                                    t_stco = sb.body; l_stco = sb.size; break;
                                case FOURCC('c', 'o', '6', '4'):
                                    t_co64 = sb.body; l_co64 = sb.size; break;
                            }
                        });
                    });
                });
            });
            if (is_audio && t_stsd) {
                stsd = t_stsd; stsd_n = l_stsd;
                stsz = t_stsz; stsz_n = l_stsz;
                stsc = t_stsc; stsc_n = l_stsc;
                stco = t_stco; stco_n = l_stco;
                co64 = t_co64; co64_n = l_co64;
                elst = t_elst; elst_n = l_elst;
                mdhd_timescale = t_ts;
            }
        });
    });
    if (!stsd || !stsz || !stsc || (!stco && !co64)) return false;

    // stsd -> mp4a sample entry -> esds (scan children; mp4a v1/v2
    // prepend extra fields so we locate esds by fourcc)
    bool got_esds = false;
    for_boxes(stsd + 8, stsd_n - 8, [&](Box se) {
        if (se.type != FOURCC('m', 'p', '4', 'a') || got_esds) return;
        for (size_t off = 28; off + 8 <= se.size; off++) {
            if (rd32(se.body + off + 4) == FOURCC('e', 's', 'd', 's')) {
                uint32_t bsz = rd32(se.body + off);
                if (bsz >= 8 && off + bsz <= se.size
                    && parse_esds(se.body + off + 8, bsz - 8,
                                  s.sr_index, s.channels)) {
                    got_esds = true;
                    return;
                }
            }
        }
    });
    if (!got_esds) return false;

    // edts/elst: initial media_time = encoder priming to drop
    if (elst && elst_n >= 16) {
        int version = elst[0];
        uint32_t count = rd32(elst + 4);
        if (count >= 1) {
            int64_t media_time =
                version == 1 ? (int64_t)rd64(elst + 8 + 8)
                             : (int32_t)rd32(elst + 8 + 4);
            if (media_time > 0 && media_time < 1 << 20)
                s.priming = (int)media_time;
        }
    }
    (void)mdhd_timescale;

    // expand sample tables into per-AU (offset, size)
    uint32_t uniform = rd32(stsz + 4);
    uint32_t sample_count = rd32(stsz + 8);
    uint32_t chunk_count = stco ? rd32(stco + 4) : rd32(co64 + 4);
    uint32_t stsc_count = rd32(stsc + 4);
    size_t sample = 0;
    for (uint32_t c = 0; c < chunk_count && sample < sample_count; c++) {
        // samples in this chunk: last stsc entry with first_chunk <= c+1
        uint32_t spc = 1;
        for (uint32_t e = 0; e < stsc_count; e++) {
            uint32_t first = rd32(stsc + 8 + e * 12);
            if (first <= c + 1) spc = rd32(stsc + 8 + e * 12 + 4);
            else break;
        }
        uint64_t off = stco ? rd32(stco + 8 + c * 4) : rd64(co64 + 8 + c * 8);
        for (uint32_t i = 0; i < spc && sample < sample_count; i++) {
            uint32_t sz = uniform ? uniform
                                  : rd32(stsz + 12 + sample * 4);
            if (off + sz > n) return false;
            s.aus.push_back({(size_t)off, sz});
            off += sz;
            sample++;
        }
    }
    return !s.aus.empty();
}

bool parse_any(const uint8_t* d, size_t n, Stream& s) {
    if (n > 12 && rd32(d + 4) == FOURCC('f', 't', 'y', 'p'))
        return parse_mp4(d, n, s);
    return parse_adts(d, n, s);
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI

extern "C" {

// sample-count upper bound + stream params; <0 on unrecognized input
long aac_info(const char* data, long size, int* sr, int* ch) {
    Stream s;
    if (!parse_any((const uint8_t*)data, (size_t)size, s)) return -1;
    *sr = aactab::sample_rates[s.sr_index];
    *ch = s.channels;
    return (long)s.aus.size() * 1024;
}

// demux introspection for tests: writes per-AU sizes, returns AU count
long aac_demux(const char* data, long size, int* out_sizes, long cap) {
    Stream s;
    if (!parse_any((const uint8_t*)data, (size_t)size, s)) return -1;
    for (long i = 0; i < (long)s.aus.size() && i < cap; i++)
        out_sizes[i] = (int)s.aus[i].size;
    return (long)s.aus.size();
}

// decode everything: out holds interleaved float frames (cap frames);
// returns frames written, <0 on error
long aac_decode(const char* data, long size, float* out, long cap,
                int* sr, int* ch) {
    Stream s;
    if (!parse_any((const uint8_t*)data, (size_t)size, s)) return -1;
    Decoder dec;
    dec.sr_index = s.sr_index;
    dec.channels = s.channels;
    *sr = aactab::sample_rates[s.sr_index];
    int out_ch = s.channels;
    long written = 0;
    long drop = s.priming;
    float frame[1024 * MAX_CH];
    for (const AU& au : s.aus) {
        BitReader br((const uint8_t*)data + au.offset, au.size);
        int fch = 0;
        if (!dec.decode_frame(br, frame, &fch)) return -2;
        if (fch != out_ch && written == 0 && drop == s.priming)
            out_ch = fch;              // trust the bitstream over the header
        if (fch != out_ch) return -3;
        const float* src = frame;
        long nsmp = 1024;
        if (drop > 0) {
            long d = drop < nsmp ? drop : nsmp;
            src += d * fch;
            nsmp -= d;
            drop -= d;
        }
        if (written + nsmp > cap) nsmp = cap - written;
        if (nsmp > 0) {
            std::memcpy(out + written * out_ch, src,
                        (size_t)nsmp * out_ch * sizeof(float));
            written += nsmp;
        }
    }
    *ch = out_ch;
    return written;
}

}  // extern "C"

