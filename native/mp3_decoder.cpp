// First-party MPEG-1/2/2.5 Layer III decoder.
//
// The reference pipeline decodes mp3 through third-party ffmpeg via the
// soundfile->librosa->pydub cascade (vocalis/core/audio_utils.py:17-76).
// This is a from-scratch implementation of ISO/IEC 11172-3 (and 13818-3
// LSF) Layer III: frame sync + header, side info, bit reservoir,
// scalefactors (MPEG-1 scfsi and MPEG-2 LSF variants), Huffman spectrum
// decode (big values + count1), requantization, MS/intensity stereo,
// short-block reordering, alias reduction, IMDCT (36/12-point with the
// four block-type windows), frequency inversion, and the polyphase
// synthesis filterbank. Constant tables (Huffman codebooks, scalefactor
// bands, synthesis window) are public-standard data in mp3_tables.h.
//
// Exports (C ABI, loaded via ctypes from audio/io.py):
//   mp3_info(data, n, *sr, *ch)      -> exact decoded samples/ch or -1
//   mp3_decode(data, n, out, max, *sr, *ch)
//        -> samples/ch written to `out` (interleaved if ch==2) or -1
//
// Layer I/II frames are rejected (the workspace's decode cascade treats
// that as "unsupported container", degrading to silence upstream).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#include "mp3_tables.h"

namespace {

constexpr double PI = 3.14159265358979323846;

// ---------------------------------------------------------------- bits
struct BitReader {
    const uint8_t* d;
    size_t nbits;
    size_t pos = 0;  // bit position

    BitReader(const uint8_t* data, size_t nbytes)
        : d(data), nbits(nbytes * 8) {}

    uint32_t get(int n) {
        uint32_t v = 0;
        for (int i = 0; i < n; i++) {
            v <<= 1;
            if (pos < nbits)
                v |= (d[pos >> 3] >> (7 - (pos & 7))) & 1;
            pos++;
        }
        return v;
    }
    uint32_t get1() { return get(1); }
    bool overrun() const { return pos > nbits; }
};

// -------------------------------------------------------------- header
struct Header {
    int version;       // 1, 2, or 25 (MPEG-2.5)
    int lsf;           // 1 for MPEG-2 / 2.5
    int sample_rate;
    int sr_row;        // row into band_size tables (0-8)
    int bitrate;       // bits/s
    int channels;
    int mode;          // 0 stereo, 1 joint, 2 dual, 3 mono
    int mode_ext;
    int padding;
    int crc;           // 1 = CRC-16 present after header
    int frame_bytes;   // whole frame incl. header
    int side_bytes;
};

const int FREQ_TAB[3] = {44100, 48000, 32000};
const int BITRATE_V1_L3[15] = {0, 32, 40, 48, 56, 64, 80, 96,
                               112, 128, 160, 192, 224, 256, 320};
const int BITRATE_V2_L3[15] = {0, 8, 16, 24, 32, 40, 48, 56,
                               64, 80, 96, 112, 128, 144, 160};

bool parse_header(const uint8_t* p, Header* h) {
    uint32_t hd = (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
                  (uint32_t(p[2]) << 8) | p[3];
    if ((hd >> 21) != 0x7FF) return false;
    int ver_bits = (hd >> 19) & 3;
    int layer_bits = (hd >> 17) & 3;
    if (layer_bits != 1) return false;  // Layer III only
    if (ver_bits == 1) return false;    // reserved
    h->version = ver_bits == 3 ? 1 : (ver_bits == 2 ? 2 : 25);
    h->lsf = h->version != 1;
    int mpeg25 = h->version == 25;
    h->crc = !((hd >> 16) & 1);
    int br_idx = (hd >> 12) & 15;
    int sr_idx = (hd >> 10) & 3;
    if (br_idx == 0 || br_idx == 15 || sr_idx == 3) return false;
    h->sample_rate = FREQ_TAB[sr_idx] >> (h->lsf + mpeg25);
    h->sr_row = sr_idx + 3 * (h->lsf + mpeg25);
    h->bitrate = 1000 * (h->lsf ? BITRATE_V2_L3[br_idx]
                                : BITRATE_V1_L3[br_idx]);
    h->padding = (hd >> 9) & 1;
    h->mode = (hd >> 6) & 3;
    h->mode_ext = (hd >> 4) & 3;
    h->channels = h->mode == 3 ? 1 : 2;
    int coef = h->lsf ? 72 : 144;
    h->frame_bytes = coef * h->bitrate / h->sample_rate + h->padding;
    h->side_bytes = h->lsf ? (h->channels == 1 ? 9 : 17)
                           : (h->channels == 1 ? 17 : 32);
    return h->frame_bytes > 4 + h->side_bytes;
}

// ----------------------------------------------------------- side info
struct GranuleInfo {
    int part2_3_length;
    int big_values;
    int global_gain;
    int scalefac_compress;
    int window_switching;
    int block_type;          // 0 long, 1 start, 2 short, 3 stop
    int mixed_block;
    int table_select[3];
    int subblock_gain[3];
    int region0_count;
    int region1_count;
    int preflag;
    int scalefac_scale;
    int count1table_select;
};

struct SideInfo {
    int main_data_begin;
    int scfsi[2][4];
    GranuleInfo gr[2][2];  // [granule][channel]
};

bool parse_side_info(BitReader& br, const Header& h, SideInfo* si) {
    int ngr = h.lsf ? 1 : 2;
    si->main_data_begin = br.get(h.lsf ? 8 : 9);
    br.get(h.lsf ? (h.channels == 1 ? 1 : 2)
                 : (h.channels == 1 ? 5 : 3));  // private bits
    if (!h.lsf)
        for (int ch = 0; ch < h.channels; ch++)
            for (int b = 0; b < 4; b++) si->scfsi[ch][b] = br.get1();
    for (int g = 0; g < ngr; g++) {
        for (int ch = 0; ch < h.channels; ch++) {
            GranuleInfo& gi = si->gr[g][ch];
            gi.part2_3_length = br.get(12);
            gi.big_values = br.get(9);
            if (gi.big_values > 288) return false;
            gi.global_gain = br.get(8);
            gi.scalefac_compress = br.get(h.lsf ? 9 : 4);
            gi.window_switching = br.get1();
            if (gi.window_switching) {
                gi.block_type = br.get(2);
                gi.mixed_block = br.get1();
                if (gi.block_type == 0) return false;
                gi.table_select[0] = br.get(5);
                gi.table_select[1] = br.get(5);
                gi.table_select[2] = 0;
                for (int w = 0; w < 3; w++) gi.subblock_gain[w] = br.get(3);
                gi.region0_count =
                    (gi.block_type == 2 && !gi.mixed_block) ? 8 : 7;
                gi.region1_count = 20 - gi.region0_count;
            } else {
                gi.block_type = 0;
                gi.mixed_block = 0;
                for (int w = 0; w < 3; w++) gi.subblock_gain[w] = 0;
                for (int r = 0; r < 3; r++) gi.table_select[r] = br.get(5);
                gi.region0_count = br.get(4);
                gi.region1_count = br.get(3);
            }
            gi.preflag = h.lsf ? 0 : br.get1();
            gi.scalefac_scale = br.get1();
            gi.count1table_select = br.get1();
        }
    }
    return !br.overrun();
}

// ------------------------------------------------------- Huffman trees
struct HuffNode { int16_t child[2]; int16_t leaf; };  // leaf = (x<<4)|y or -1

struct HuffTree {
    std::vector<HuffNode> nodes;
    void build(const mp3tab::HuffEntry* e, int n) {
        nodes.push_back({{-1, -1}, -1});
        for (int i = 0; i < n; i++) {
            int cur = 0;
            for (int b = e[i].len - 1; b >= 0; b--) {
                int bit = (e[i].code >> b) & 1;
                if (nodes[cur].child[bit] < 0) {
                    nodes[cur].child[bit] = (int16_t)nodes.size();
                    nodes.push_back({{-1, -1}, -1});
                }
                cur = nodes[cur].child[bit];
            }
            nodes[cur].leaf = (int16_t)((e[i].x << 4) | e[i].y);
        }
    }
    int decode(BitReader& br) const {  // returns (x<<4)|y, or -1 on error
        int cur = 0;
        for (int guard = 0; guard < 24; guard++) {
            if (nodes[cur].leaf >= 0) return nodes[cur].leaf;
            int nxt = nodes[cur].child[br.get1()];
            if (nxt < 0) return -1;
            cur = nxt;
        }
        return nodes[cur].leaf;
    }
};

const HuffTree* huff_tree(int idx) {  // idx 0..15 into mp3tab::huff_tables
    static HuffTree trees[16];
    static bool built = false;
    if (!built) {
        for (int i = 1; i < 16; i++)
            trees[i].build(mp3tab::huff_tables[i].e, mp3tab::huff_tables[i].n);
        built = true;
    }
    return &trees[idx];
}

struct QuadTree {
    std::vector<HuffNode> nodes;
    void build(int which) {
        nodes.push_back({{-1, -1}, -1});
        for (int v = 0; v < 16; v++) {
            int code = mp3tab::quad_codes[which][v];
            int len = mp3tab::quad_bits[which][v];
            int cur = 0;
            for (int b = len - 1; b >= 0; b--) {
                int bit = (code >> b) & 1;
                if (nodes[cur].child[bit] < 0) {
                    nodes[cur].child[bit] = (int16_t)nodes.size();
                    nodes.push_back({{-1, -1}, -1});
                }
                cur = nodes[cur].child[bit];
            }
            nodes[cur].leaf = (int16_t)v;
        }
    }
};

const QuadTree* quad_tree(int which) {
    static QuadTree trees[2];
    static bool built = false;
    if (!built) { trees[0].build(0); trees[1].build(1); built = true; }
    return &trees[which];
}

// ------------------------------------------------------ scalefactors
struct ScaleFactors {
    int l[23];        // long bands (22 + guard)
    int s[3][13];     // short bands per window
};

// MPEG-1 (ISO 11172-3 2.4.2.7); returns part2 bit count consumed
void read_scalefactors_mpeg1(BitReader& br, const GranuleInfo& gi,
                             const int scfsi[4], int granule,
                             ScaleFactors* sf, const ScaleFactors* sf_gr0) {
    int slen1 = mp3tab::slen_table[0][gi.scalefac_compress];
    int slen2 = mp3tab::slen_table[1][gi.scalefac_compress];
    std::memset(sf->l, 0, sizeof sf->l);
    std::memset(sf->s, 0, sizeof sf->s);
    if (gi.block_type == 2) {
        if (gi.mixed_block)
            for (int b = 0; b < 8; b++) sf->l[b] = br.get(slen1);
        int start = gi.mixed_block ? 3 : 0;
        for (int b = start; b < 6; b++)
            for (int w = 0; w < 3; w++) sf->s[w][b] = br.get(slen1);
        for (int b = 6; b < 12; b++)
            for (int w = 0; w < 3; w++) sf->s[w][b] = br.get(slen2);
    } else {
        static const int groups[4][2] = {{0, 6}, {6, 11}, {11, 16}, {16, 21}};
        for (int gidx = 0; gidx < 4; gidx++) {
            int slen = gidx < 2 ? slen1 : slen2;
            if (granule == 1 && scfsi[gidx]) {
                for (int b = groups[gidx][0]; b < groups[gidx][1]; b++)
                    sf->l[b] = sf_gr0->l[b];
            } else {
                for (int b = groups[gidx][0]; b < groups[gidx][1]; b++)
                    sf->l[b] = br.get(slen);
            }
        }
    }
}

// MPEG-2 LSF (ISO 13818-3 2.4.3.2), incl. the intensity-channel variant
void read_scalefactors_lsf(BitReader& br, GranuleInfo& gi,
                           bool intensity_channel, ScaleFactors* sf) {
    int sfc = gi.scalefac_compress;
    int slen[4];
    int block_number = gi.block_type == 2 ? (gi.mixed_block ? 2 : 1) : 0;
    int row;
    if (!intensity_channel) {
        if (sfc < 400) {
            slen[0] = (sfc >> 4) / 5; slen[1] = (sfc >> 4) % 5;
            slen[2] = (sfc % 16) >> 2; slen[3] = sfc % 4;
            row = 0;
        } else if (sfc < 500) {
            sfc -= 400;
            slen[0] = (sfc >> 2) / 5; slen[1] = (sfc >> 2) % 5;
            slen[2] = sfc % 4; slen[3] = 0;
            row = 1;
        } else {
            sfc -= 500;
            slen[0] = sfc / 3; slen[1] = sfc % 3; slen[2] = 0; slen[3] = 0;
            gi.preflag = 1;
            row = 2;
        }
    } else {
        sfc >>= 1;
        if (sfc < 180) {
            slen[0] = sfc / 36; slen[1] = (sfc % 36) / 6;
            slen[2] = sfc % 6; slen[3] = 0;
            row = 3;
        } else if (sfc < 244) {
            sfc -= 180;
            slen[0] = (sfc % 64) >> 4; slen[1] = (sfc % 16) >> 2;
            slen[2] = sfc % 4; slen[3] = 0;
            row = 4;
        } else {
            sfc -= 244;
            slen[0] = sfc / 3; slen[1] = sfc % 3; slen[2] = 0; slen[3] = 0;
            row = 5;
        }
    }
    int raw[40];
    int k = 0;
    for (int grp = 0; grp < 4; grp++) {
        int n = mp3tab::lsf_nsf_table[row][block_number][grp];
        for (int i = 0; i < n; i++) raw[k++] = br.get(slen[grp]);
    }
    while (k < 40) raw[k++] = 0;
    std::memset(sf->l, 0, sizeof sf->l);
    std::memset(sf->s, 0, sizeof sf->s);
    if (gi.block_type == 2) {
        int j = 0;
        if (gi.mixed_block)
            for (int b = 0; b < 8; b++) sf->l[b] = raw[j++];
        int start = gi.mixed_block ? 3 : 0;
        for (int b = start; b < 12; b++)
            for (int w = 0; w < 3; w++) sf->s[w][b] = raw[j++];
    } else {
        for (int b = 0; b < 21; b++) sf->l[b] = raw[b];
    }
}

// ----------------------------------------------------- spectrum decode
struct BandIndex {
    int long_idx[23];   // cumulative long band starts (23 entries, [22]=576)
    int short_idx[14];  // cumulative short band starts (per window, [13]=192)
};

BandIndex band_index_for(int sr_row) {
    BandIndex bi{};
    int acc = 0;
    for (int b = 0; b < 22; b++) {
        bi.long_idx[b] = acc;
        acc += mp3tab::band_size_long[sr_row][b];
    }
    bi.long_idx[22] = acc;  // 576
    acc = 0;
    for (int b = 0; b < 13; b++) {
        bi.short_idx[b] = acc;
        acc += mp3tab::band_size_short[sr_row][b];
    }
    bi.short_idx[13] = acc;  // 192
    return bi;
}

// Huffman-decode one granule-channel's spectrum into is[576] (integer
// amplitudes); returns index of first zero sample (rzero boundary).
int decode_spectrum(BitReader& br, const GranuleInfo& gi,
                    const BandIndex& bi, size_t part2_3_end, int32_t* is) {
    std::memset(is, 0, 576 * sizeof *is);
    int region_bound[3];
    if (gi.window_switching && gi.block_type == 2 && !gi.mixed_block) {
        region_bound[0] = bi.short_idx[3] * 3;  // 3 full short bands
        region_bound[1] = 576;
    } else {
        int r0 = gi.region0_count + 1;
        int r1 = r0 + gi.region1_count + 1;
        if (r0 > 22) r0 = 22;
        if (r1 > 22) r1 = 22;
        region_bound[0] = bi.long_idx[r0];
        region_bound[1] = bi.long_idx[r1];
    }
    region_bound[2] = 576;

    int pos = 0;
    int nbig = 2 * gi.big_values;
    if (nbig > 576) nbig = 576;
    while (pos < nbig && br.pos < part2_3_end) {
        int region = pos < region_bound[0] ? 0 : (pos < region_bound[1] ? 1 : 2);
        int sel = gi.table_select[region];
        int tab_idx = mp3tab::huff_select[sel][0];
        int linbits = mp3tab::huff_select[sel][1];
        int x, y;
        if (tab_idx == 0) {
            x = y = 0;
        } else {
            int leaf = huff_tree(tab_idx)->decode(br);
            if (leaf < 0) break;
            x = leaf >> 4;
            y = leaf & 15;
        }
        if (x == 15 && linbits) x += br.get(linbits);
        if (x) { if (br.get1()) x = -x; }
        if (y == 15 && linbits) y += br.get(linbits);
        if (y) { if (br.get1()) y = -y; }
        is[pos++] = x;
        is[pos++] = y;
    }
    // count1 region: quadruples of |v| <= 1 until bits run out
    const QuadTree* qt = quad_tree(gi.count1table_select);
    while (pos <= 572 && br.pos < part2_3_end) {
        int v;
        if (gi.count1table_select == 1) {
            v = 15 - (int)br.get(4);  // table B: fixed 4-bit complement code
        } else {
            int cur = 0;
            v = -1;
            for (int g = 0; g < 8; g++) {
                if (qt->nodes[cur].leaf >= 0) { v = qt->nodes[cur].leaf; break; }
                int nxt = qt->nodes[cur].child[br.get1()];
                if (nxt < 0) break;
                cur = nxt;
            }
            if (v < 0 && qt->nodes[cur].leaf >= 0) v = qt->nodes[cur].leaf;
            if (v < 0) break;
        }
        if (br.pos > part2_3_end) break;  // quadruple straddled the boundary
        int quad[4] = {(v >> 3) & 1, (v >> 2) & 1, (v >> 1) & 1, v & 1};
        for (int i = 0; i < 4; i++) {
            int s = quad[i];
            if (s) { if (br.get1()) s = -s; }
            is[pos++] = s;
        }
    }
    br.pos = part2_3_end;  // re-align (spec: stuffing bits are skipped)
    int rzero = 576;
    while (rzero > 0 && is[rzero - 1] == 0) rzero--;
    return rzero;
}

// --------------------------------------------------------- requantize
double pow43(int v) {
    static double lut[8207];
    static bool built = false;
    if (!built) {
        for (int i = 0; i < 8207; i++) lut[i] = std::pow(i, 4.0 / 3.0);
        built = true;
    }
    int a = v < 0 ? -v : v;
    double m = a < 8207 ? lut[a] : std::pow(a, 4.0 / 3.0);
    return v < 0 ? -m : m;
}

void requantize(const GranuleInfo& gi, const ScaleFactors& sf,
                const BandIndex& bi, const int32_t* is, double* xr) {
    double gain = std::pow(2.0, 0.25 * (gi.global_gain - 210));
    // scalefac_multiplier = (scalefac_scale + 1) / 2 (ISO 2.4.3.4):
    // scalefactor steps of sqrt(2) or 2
    double sf_mult = gi.scalefac_scale ? 1.0 : 0.5;
    if (gi.block_type == 2) {
        int long_lines = gi.mixed_block ? 36 : 0;
        // long (mixed) part
        for (int i = 0; i < long_lines; i++) {
            int b = 0;
            while (bi.long_idx[b + 1] <= i) b++;
            double sc = sf.l[b] + (gi.preflag ? mp3tab::pretab[1][b] : 0);
            xr[i] = pow43(is[i]) * gain * std::pow(2.0, -sf_mult * sc);
        }
        // short part: spectrum here is still in Huffman (band-major) order
        int sfb_min = gi.mixed_block ? 3 : 0;
        int pos = long_lines;
        for (int b = sfb_min; b < 13 && pos < 576; b++) {
            int n = bi.short_idx[b + 1] - bi.short_idx[b];
            for (int w = 0; w < 3; w++) {
                double g = gain *
                    std::pow(2.0, -2.0 * gi.subblock_gain[w]) *
                    std::pow(2.0, -sf_mult * sf.s[w][b]);
                for (int i = 0; i < n && pos < 576; i++, pos++)
                    xr[pos] = pow43(is[pos]) * g;
            }
        }
        while (pos < 576) { xr[pos] = 0.0; pos++; }
    } else {
        for (int i = 0; i < 576; i++) {
            int b = 0;
            while (b < 21 && bi.long_idx[b + 1] <= i) b++;
            double sc = sf.l[b] + (gi.preflag ? mp3tab::pretab[1][b] : 0);
            xr[i] = pow43(is[i]) * gain * std::pow(2.0, -sf_mult * sc);
        }
    }
}

// ------------------------------------------------------------- stereo
void apply_stereo(const Header& h, const GranuleInfo gi[2],
                  const ScaleFactors sf[2], const BandIndex& bi,
                  int rzero_right, double* xl, double* xr_) {
    bool ms = h.mode == 1 && (h.mode_ext & 2);
    bool is_st = h.mode == 1 && (h.mode_ext & 1);
    const double SQRT1_2 = 0.70710678118654752440;

    int is_bound = 576;
    if (is_st) {
        // intensity starts at the first band wholly above the right
        // channel's last nonzero line
        if (gi[0].block_type != 2) {
            int b = 0;
            while (b < 22 && bi.long_idx[b] < rzero_right) b++;
            is_bound = bi.long_idx[b < 22 ? b : 22];
        } else {
            is_bound = rzero_right;  // per-window handling below is coarse
        }
    }
    for (int i = 0; i < (is_st ? is_bound : 576); i++) {
        if (ms) {
            double m = xl[i], s = xr_[i];
            xl[i] = (m + s) * SQRT1_2;
            xr_[i] = (m - s) * SQRT1_2;
        }
    }
    if (is_st && gi[0].block_type != 2) {
        for (int b = 0; b < 22; b++) {
            int start = bi.long_idx[b], end = bi.long_idx[b + 1];
            if (start < is_bound) continue;
            int is_pos = sf[1].l[b < 21 ? b : 20];
            for (int i = start; i < end; i++) {
                if (is_pos == 7) {
                    if (ms) {
                        double m = xl[i], s = xr_[i];
                        xl[i] = (m + s) * SQRT1_2;
                        xr_[i] = (m - s) * SQRT1_2;
                    }
                } else {
                    double ratio = std::tan(is_pos * PI / 12.0);
                    double v = xl[i];
                    xl[i] = v * (ratio / (1.0 + ratio));
                    xr_[i] = v * (1.0 / (1.0 + ratio));
                }
            }
        }
    } else if (is_st) {
        // Simplification (documented): short-block and MPEG-2 LSF
        // intensity positions collapse to a centered downmix (L=R=x).
        // Mainstream encoders (LAME, shine, ffmpeg's) never emit
        // intensity stereo, so this branch is effectively dead in
        // practice; a conforming stream hitting it degrades to mono
        // imaging in the affected bands rather than mis-decoding.
        for (int i = is_bound; i < 576; i++) {
            double v = xl[i];
            xl[i] = v;
            xr_[i] = v;
        }
    }
}

// ------------------------------------------- reorder / alias / IMDCT
void reorder_short(const GranuleInfo& gi, const BandIndex& bi, double* xr) {
    if (gi.block_type != 2) return;
    double tmp[576];
    std::memcpy(tmp, xr, sizeof tmp);
    int long_lines = gi.mixed_block ? 36 : 0;
    int sfb_min = gi.mixed_block ? 3 : 0;
    int pos = long_lines;  // read cursor in Huffman (band-major) order
    for (int b = sfb_min; b < 13; b++) {
        int start = bi.short_idx[b];  // per-window line index
        int n = bi.short_idx[b + 1] - bi.short_idx[b];
        for (int w = 0; w < 3; w++) {
            for (int i = 0; i < n; i++, pos++) {
                int f = start + i;             // frequency line in window w
                int dst = (f / 6) * 18 + w * 6 + (f % 6);
                if (dst < 576 && pos < 576) xr[dst] = tmp[pos];
            }
        }
    }
}

void alias_reduce(const GranuleInfo& gi, double* xr) {
    static const double ci[8] = {-0.6, -0.535, -0.33, -0.185,
                                 -0.095, -0.041, -0.0142, -0.0037};
    static double cs[8], ca[8];
    static bool built = false;
    if (!built) {
        for (int i = 0; i < 8; i++) {
            double d = std::sqrt(1.0 + ci[i] * ci[i]);
            cs[i] = 1.0 / d;
            ca[i] = ci[i] / d;
        }
        built = true;
    }
    int sblim = gi.block_type == 2 ? (gi.mixed_block ? 1 : 0) : 31;
    for (int sb = 1; sb <= sblim; sb++) {
        for (int i = 0; i < 8; i++) {
            double a = xr[18 * sb - 1 - i];
            double b = xr[18 * sb + i];
            xr[18 * sb - 1 - i] = a * cs[i] - b * ca[i];
            xr[18 * sb + i] = b * cs[i] + a * ca[i];
        }
    }
}

struct IMDCTTables {
    double cos36[36][18];
    double cos12[12][6];
    double win[4][36];       // block types 0,1,3 full windows
    double win_short[12];
    IMDCTTables() {
        for (int i = 0; i < 36; i++)
            for (int k = 0; k < 18; k++)
                cos36[i][k] = std::cos(PI / 72.0 * (2 * i + 1 + 18) * (2 * k + 1));
        for (int i = 0; i < 12; i++)
            for (int k = 0; k < 6; k++)
                cos12[i][k] = std::cos(PI / 24.0 * (2 * i + 1 + 6) * (2 * k + 1));
        for (int i = 0; i < 36; i++) win[0][i] = std::sin(PI / 36.0 * (i + 0.5));
        for (int i = 0; i < 36; i++) {  // start
            if (i < 18) win[1][i] = std::sin(PI / 36.0 * (i + 0.5));
            else if (i < 24) win[1][i] = 1.0;
            else if (i < 30) win[1][i] = std::sin(PI / 12.0 * (i - 18 + 0.5));
            else win[1][i] = 0.0;
        }
        for (int i = 0; i < 36; i++) {  // stop
            if (i < 6) win[3][i] = 0.0;
            else if (i < 12) win[3][i] = std::sin(PI / 12.0 * (i - 6 + 0.5));
            else if (i < 18) win[3][i] = 1.0;
            else win[3][i] = std::sin(PI / 36.0 * (i + 0.5));
        }
        for (int i = 0; i < 12; i++) win_short[i] = std::sin(PI / 12.0 * (i + 0.5));
    }
};

// hybrid filterbank: per-subband IMDCT + window + overlap-add
void hybrid_synthesis(const GranuleInfo& gi, const IMDCTTables& T,
                      const double* xr, double overlap[32][18],
                      double out[18][32]) {
    for (int sb = 0; sb < 32; sb++) {
        const double* X = xr + 18 * sb;
        int bt = gi.block_type;
        if (bt == 2 && gi.mixed_block && sb < 2) bt = 0;
        double raw[36];
        if (bt == 2) {
            std::memset(raw, 0, sizeof raw);
            for (int w = 0; w < 3; w++) {
                double blk[12];
                for (int i = 0; i < 12; i++) {
                    double acc = 0;
                    for (int k = 0; k < 6; k++)
                        acc += X[w * 6 + k] * T.cos12[i][k];
                    blk[i] = acc * T.win_short[i];
                }
                for (int i = 0; i < 12; i++) raw[6 + 6 * w + i] += blk[i];
            }
        } else {
            for (int i = 0; i < 36; i++) {
                double acc = 0;
                for (int k = 0; k < 18; k++) acc += X[k] * T.cos36[i][k];
                raw[i] = acc * T.win[bt][i];
            }
        }
        for (int i = 0; i < 18; i++) {
            double v = raw[i] + overlap[sb][i];
            overlap[sb][i] = raw[i + 18];
            // frequency inversion: odd time samples of odd subbands
            if ((sb & 1) && (i & 1)) v = -v;
            out[i][sb] = v;
        }
    }
}

// ------------------------------------------------- polyphase synthesis
struct SynthDCT {
    double n[64][32];
    SynthDCT() {
        for (int i = 0; i < 64; i++)
            for (int k = 0; k < 32; k++)
                n[i][k] = std::cos((16 + i) * (2 * k + 1) * PI / 64.0);
    }
    static const SynthDCT& get() {
        static SynthDCT t;
        return t;
    }
};

struct Synth {
    double v[1024] = {0};
    double window[512];
    Synth() {
        for (int i = 0; i < 257; i++) {
            double val = mp3tab::enwindow[i] / 65536.0;  // -> ISO D scale
            window[i] = val;
            if (i > 0 && i < 512 - i)
                window[512 - i] = ((i & 63) != 0) ? -val : val;
        }
    }
    void run(const double s[32], float* pcm, int stride) {
        const SynthDCT& dct = SynthDCT::get();
        std::memmove(v + 64, v, (1024 - 64) * sizeof(double));
        for (int i = 0; i < 64; i++) {
            double acc = 0;
            for (int k = 0; k < 32; k++) acc += s[k] * dct.n[i][k];
            v[i] = acc;
        }
        for (int j = 0; j < 32; j++) {
            double acc = 0;
            for (int i = 0; i < 16; i++) {
                // U[i*32+j] mapping per ISO: even i from v[i*64+j] block,
                // odd i from v[i*64+96..] block
                int base = (i >> 1) * 128;
                double u = (i & 1) ? v[base + 96 + j] : v[base + j];
                acc += u * window[j + 32 * i];
            }
            double val = acc;
            if (val > 1.0) val = 1.0;
            if (val < -1.0) val = -1.0;
            *pcm = (float)val;
            pcm += stride;
        }
    }
};

// --------------------------------------------------------------- main
struct Decoder {
    Header h;
    SideInfo si;
    std::vector<uint8_t> reservoir;
    double overlap[2][32][18] = {};
    Synth synth[2];
    IMDCTTables imdct;
    ScaleFactors sf_gr0[2];

    // decode one frame's granules into out (interleaved); returns
    // samples/ch produced (0 if the reservoir lacks data)
    int decode_frame(const uint8_t* frame, float* out, long cap) {
        BitReader sbr(frame + 4 + (h.crc ? 2 : 0), h.side_bytes);
        if (!parse_side_info(sbr, h, &si)) return 0;
        int ngr = h.lsf ? 1 : 2;
        int header_len = 4 + (h.crc ? 2 : 0) + h.side_bytes;
        int main_len = h.frame_bytes - header_len;
        if (main_len < 0) return 0;

        size_t start = reservoir.size();
        if ((int)start < si.main_data_begin) {
            // not enough reservoir yet (start of stream): stash and skip
            reservoir.insert(reservoir.end(), frame + header_len,
                             frame + header_len + main_len);
            trim_reservoir();
            return 0;
        }
        size_t begin = start - si.main_data_begin;
        reservoir.insert(reservoir.end(), frame + header_len,
                         frame + header_len + main_len);

        BitReader br(reservoir.data(), reservoir.size());
        br.pos = begin * 8;

        BandIndex bi = band_index_for(h.sr_row);
        int produced = 0;
        for (int g = 0; g < ngr; g++) {
            double xr[2][576];
            int rzero[2] = {576, 576};
            ScaleFactors sf[2];
            for (int ch = 0; ch < h.channels; ch++) {
                GranuleInfo& gi = si.gr[g][ch];
                size_t p23_end = br.pos + gi.part2_3_length;
                if (h.lsf) {
                    bool ich = ch == 1 && h.mode == 1 && (h.mode_ext & 1);
                    read_scalefactors_lsf(br, gi, ich, &sf[ch]);
                } else {
                    read_scalefactors_mpeg1(br, gi, si.scfsi[ch], g,
                                            &sf[ch], &sf_gr0[ch]);
                    if (g == 0) sf_gr0[ch] = sf[ch];
                }
                int32_t is[576];
                rzero[ch] = decode_spectrum(br, gi, bi, p23_end, is);
                requantize(gi, sf[ch], bi, is, xr[ch]);
            }
            if (h.channels == 2) {
                GranuleInfo gis[2] = {si.gr[g][0], si.gr[g][1]};
                apply_stereo(h, gis, sf, bi, rzero[1], xr[0], xr[1]);
            }
            for (int ch = 0; ch < h.channels; ch++) {
                GranuleInfo& gi = si.gr[g][ch];
                reorder_short(gi, bi, xr[ch]);
                alias_reduce(gi, xr[ch]);
                double td[18][32];
                hybrid_synthesis(gi, imdct, xr[ch], overlap[ch], td);
                if ((produced + 18 * 32) * h.channels > cap) return produced;
                for (int t = 0; t < 18; t++)
                    synth[ch].run(td[t],
                                  out + (produced + 32 * t) * h.channels + ch,
                                  h.channels);
            }
            produced += 18 * 32;
        }
        trim_reservoir();
        return produced;
    }

    void trim_reservoir() {
        // keep at most 511 bytes (max main_data_begin) of history
        if (reservoir.size() > 511)
            reservoir.erase(reservoir.begin(),
                            reservoir.end() - 511);
    }
};

long skip_id3(const uint8_t* d, long n) {
    if (n >= 10 && d[0] == 'I' && d[1] == 'D' && d[2] == '3') {
        long sz = ((d[6] & 0x7f) << 21) | ((d[7] & 0x7f) << 14) |
                  ((d[8] & 0x7f) << 7) | (d[9] & 0x7f);
        return 10 + sz;
    }
    return 0;
}

long next_frame(const uint8_t* d, long n, long pos, Header* h) {
    while (pos + 4 <= n) {
        if (d[pos] == 0xFF && (d[pos + 1] & 0xE0) == 0xE0 &&
            parse_header(d + pos, h) && pos + h->frame_bytes <= n)
            return pos;
        pos++;
    }
    return -1;
}

}  // namespace

extern "C" {

// sanity: identical inputs through both per-channel synth states must
// produce identical outputs (guards against state aliasing/overflow)
double mp3_synth_selftest() {
    Decoder dec;
    float out[2 * 32 * 18 * 4];
    double maxdiff = 0;
    unsigned rng = 12345;
    for (int it = 0; it < 8; it++) {
        double td[18][32];
        for (int t = 0; t < 18; t++)
            for (int sb = 0; sb < 32; sb++) {
                rng = rng * 1103515245 + 12345;
                td[t][sb] = ((rng >> 16) & 0x7fff) / 32768.0 - 0.5;
            }
        for (int ch = 0; ch < 2; ch++)
            for (int t = 0; t < 18; t++)
                dec.synth[ch].run(td[t], out + (32 * t) * 2 + ch, 2);
        for (int i = 0; i < 32 * 18; i++) {
            double d = out[2 * i] - out[2 * i + 1];
            if (d < 0) d = -d;
            if (d > maxdiff) maxdiff = d;
        }
    }
    return maxdiff;
}

long mp3_info(const uint8_t* data, long n, int* sample_rate, int* channels) {
    Header h;
    long pos = skip_id3(data, n);
    pos = next_frame(data, n, pos, &h);
    if (pos < 0) return -1;
    *sample_rate = h.sample_rate;
    *channels = h.channels;
    long frames = 0;
    while (pos >= 0) {
        frames++;
        pos = next_frame(data, n, pos + h.frame_bytes, &h);
    }
    return frames * (h.lsf ? 576 : 1152);
}

long mp3_decode(const uint8_t* data, long n, float* out, long max_samples,
                int* sample_rate, int* channels) {
    Header h;
    long pos = skip_id3(data, n);
    pos = next_frame(data, n, pos, &h);
    if (pos < 0) return -1;
    *sample_rate = h.sample_rate;
    *channels = h.channels;
    Decoder dec;
    dec.h = h;
    long written = 0;  // samples per channel
    while (pos >= 0) {
        Header fh;
        if (!parse_header(data + pos, &fh)) break;
        if (fh.sample_rate != h.sample_rate || fh.channels != h.channels)
            break;  // stream parameter change: stop at the boundary
        dec.h = fh;
        long cap = (max_samples - written) * h.channels;
        if (cap < 1152 * h.channels) break;
        written += dec.decode_frame(data + pos, out + written * h.channels,
                                    cap);
        pos = next_frame(data, n, pos + fh.frame_bytes, &fh);
    }
    return written;
}

}  // extern "C"
