// First-party Ogg Opus decoder (RFC 6716 + RFC 7845).
//
// Replaces the reference's delegation to ffmpeg for .opus input
// (vocalis/core/audio_utils.py:17-76 pydub→ffmpeg cascade). Scope:
// the full Opus decode matrix — SILK-only (NB/MB/WB, 10-60 ms), hybrid
// (SWB/FB), and CELT-only (2.5-20 ms) modes, mono and stereo, packet
// codes 0-3 with padding, plus the Ogg encapsulation (OpusHead,
// pre-skip, end trimming) and 48 kHz output.
//
// Everything here is implemented from the RFC's normative algorithms;
// the fixed spec DATA (SILK range-coder CDFs and codebooks, CELT band
// layout / probability models / PVQ U(N,K) rows / window) is recovered
// from the system codec archive by scripts/gen_opus_tables.py (same
// provenance as the MP3/AAC/Vorbis tables). Validated against the
// reference libopus decoder in tests/test_opus.py (skip-if-absent
// oracle).
//
// C ABI (mirrors mp3/aac/vorbis):
//   long opus_pkt_decode(...)  packet-level decode (test oracle seam)
//   long opus_file_info(data, size, *sr, *ch)             -> sample bound
//   long opus_file_decode(data, size, out, cap, *sr, *ch) -> frames
//
// Decoded PCM is float at 48 kHz in [-1, 1].

#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

#include "opus_tables.h"

// trace hook for differential testing: called after every range-decoder
// op with (type, a, b, cdf_ptr, cdf_len, result). Types: 0=cdf 1=logp
// 2=uint 3=raw 4=laplace 5=decode 6=update
typedef void (*opus_rc_trace_fn)(int, long, long, const uint16_t*, int,
                                 long);
static opus_rc_trace_fn g_rc_trace = nullptr;
extern "C" void opus_set_rc_trace(opus_rc_trace_fn fn) { g_rc_trace = fn; }

static std::vector<float> g_dump_freq;  // debug hook: last ch0 spectrum
static std::vector<float> g_dump_energy;
static std::vector<float> g_dump_silk;  // debug hook: SILK-rate mono output

namespace {

// ---------------------------------------------------------------------------
// Range decoder (RFC 6716 §4.1). One instance per Opus frame. Raw bits
// read LSB-first from the END of the frame, shared with the range-coded
// stream reading from the front.

struct RangeDec {
    const uint8_t* buf = nullptr;
    uint32_t storage = 0;      // frame length in bytes
    uint32_t pos = 0;          // next front byte
    uint32_t val = 0;
    uint32_t rng = 0;
    uint32_t total_bits = 0;   // nbits_total
    // raw-bit reader (from the back)
    uint32_t end_pos = 0;      // bytes consumed from the back
    uint32_t end_window = 0;
    int end_bits = 0;
    uint32_t rem = 0;          // leftover bit window (EC_CODE_EXTRA trick)

    void init(const uint8_t* data, uint32_t size) {
        buf = data;
        storage = size;
        pos = 0;
        end_pos = 0;
        end_window = 0;
        end_bits = 0;
        total_bits = 9;
        rem = next_front();
        val = 128 - 1 - (rem >> 1);
        rng = 128;
        normalize();
    }
    uint8_t next_front() { return pos < storage ? buf[pos++] : 0; }
    void normalize() {
        // renorm symbols STRADDLE byte boundaries: the init read consumed
        // only 7 bits, so each refill is (prev<<8 | next) >> 1
        while (rng <= (1u << 23)) {
            uint32_t sym = rem;
            rem = next_front();
            sym = ((sym << 8) | rem) >> 1;
            val = ((val << 8) + (255u & ~sym)) & 0x7FFFFFFFu;
            rng <<= 8;
            total_bits += 8;
        }
    }
    // ffmpeg-format CDF model: {ft, cum1, ..., ft}
    int dec_cdf(const uint16_t* cdf) {
        uint32_t ft = cdf[0];
        const uint16_t* cums = cdf + 1;
        uint32_t scale = rng / ft;
        uint32_t sym = val / scale + 1;
        sym = ft - (sym < ft ? sym : ft);
        int k = 0;
        while (cums[k] <= sym) k++;
        uint32_t high = cums[k], low = k ? cums[k - 1] : 0;
        val -= scale * (ft - high);
        rng = low ? scale * (high - low) : rng - scale * (ft - high);
        normalize();
        if (g_rc_trace) g_rc_trace(0, 0, 0, cdf, 0, k);
        return k;
    }
    // generic decode with explicit (fl, fh, ft) — used by uint/laplace/theta
    uint32_t decode(uint32_t ft) {  // returns fs in [0, ft)
        uint32_t scale = rng / ft;
        uint32_t sym = val / scale + 1;
        sym = ft - (sym < ft ? sym : ft);
        return sym;
    }
    void update(uint32_t fl, uint32_t fh, uint32_t ft) {
        uint32_t scale = rng / ft;
        val -= scale * (ft - fh);
        rng = fl ? scale * (fh - fl) : rng - scale * (ft - fh);
        normalize();
    }
    int dec_bit_logp(unsigned logp) {
        uint32_t s = rng >> logp;
        int bit = val < s;
        if (bit) rng = s;
        else { val -= s; rng -= s; }
        normalize();
        if (g_rc_trace) g_rc_trace(1, logp, 0, nullptr, 0, bit);
        return bit;
    }
    uint32_t dec_bits_inner(int n) {
        while (end_bits < n) {
            uint8_t b = end_pos < storage ? buf[storage - 1 - end_pos] : 0;
            end_pos++;
            end_window |= (uint32_t)b << end_bits;
            end_bits += 8;
        }
        uint32_t ret = end_window & ((n < 32 ? (1u << n) : 0u) - 1u);
        end_window >>= n;
        end_bits -= n;
        total_bits += n;
        return ret;
    }
    uint32_t dec_bits(int n) {
        uint32_t ret = dec_bits_inner(n);
        if (g_rc_trace) g_rc_trace(3, n, 0, nullptr, 0, ret);
        return ret;
    }
    static int ilog(uint32_t v) {
        int r = 0;
        while (v) { r++; v >>= 1; }
        return r;
    }
    uint32_t dec_uint(uint32_t ft_orig) {  // uniform in [0, ft_orig)
        uint32_t ft = ft_orig;
        if (ft <= 1) return 0;
        ft--;
        int ftb = ilog(ft);
        uint32_t out;
        if (ftb > 8) {
            ftb -= 8;
            uint32_t ft_hi = (ft >> ftb) + 1;
            uint32_t fs = decode(ft_hi);
            update(fs, fs + 1, ft_hi);
            uint32_t lo = dec_bits_inner(ftb);
            uint32_t ret = (fs << ftb) | lo;
            out = ret > ft ? ft : ret;  // bitstream error: clamp
        } else {
            uint32_t ftp = ft + 1;
            uint32_t fs = decode(ftp);
            update(fs, fs + 1, ftp);
            out = fs;
        }
        if (g_rc_trace) g_rc_trace(2, ft_orig, 0, nullptr, 0, out);
        return out;
    }
    uint32_t tell() const { return total_bits - ilog(rng); }
    uint32_t tell_frac() const {
        uint32_t nbits = total_bits << 3;
        int l = ilog(rng);
        uint32_t r = rng >> (l - 16);
        for (int i = 0; i < 3; i++) {
            r = (r * r) >> 15;
            int b = r >> 16;
            l = (l << 1) | b;
            r >>= b;
        }
        return nbits - l;
    }
};

// Laplace decode (CELT coarse energy; libopus laplace.c semantics)
int ec_laplace_decode(RangeDec& rc, uint32_t fs, int decay) {
    const uint32_t fs0_in = fs;
    const int decay_in = decay;
    const uint32_t MINP = 1;       // LAPLACE_MINP (LOG_MINP=0)
    const int NMIN = 16;           // LAPLACE_NMIN
    int val = 0;
    uint32_t fl = 0;
    uint32_t fm = rc.decode(32768);
    if (fm >= fs) {
        val++;
        fl = fs;
        uint32_t ft = 32768 - MINP * (2 * NMIN) - fs;
        fs = (uint32_t)(((uint64_t)ft * (16384 - decay)) >> 15) + MINP;
        while (fs > MINP && fm >= fl + 2 * fs) {
            fs *= 2;
            fl += fs;
            fs = (uint32_t)(((uint64_t)(fs - 2 * MINP) * decay) >> 15);
            fs += MINP;
            val++;
        }
        if (fs <= MINP) {
            int di = (fm - fl) >> 1;  // LOG_MINP+1 = 1
            val += di;
            fl += 2 * di * MINP;
        }
        if (fm < fl + fs) val = -val;
        else fl += fs;
    }
    uint32_t fh = fl + fs < 32768 ? fl + fs : 32768;
    rc.update(fl, fh, 32768);
    if (g_rc_trace) g_rc_trace(4, fs0_in, decay_in, nullptr, 0, val);
    return val;
}

// ---------------------------------------------------------------------------
// CELT decoder (RFC 6716 §4.3)

constexpr int NB_BANDS = 21;
constexpr int OVERLAP = 120;
constexpr int BITRES = 3;
constexpr int MAX_FINE_BITS = 8;
constexpr int FINE_OFFSET = 21;
constexpr int QTHETA_OFFSET = 4;
constexpr int QTHETA_OFFSET_TWOPHASE = 16;
constexpr float EPSILON = 1e-15f;

enum { SPREAD_NONE = 0, SPREAD_LIGHT, SPREAD_NORMAL, SPREAD_AGGRESSIVE };

inline uint32_t celt_lcg_rand(uint32_t seed) {
    return 1664525u * seed + 1013904223u;
}

inline int imin(int a, int b) { return a < b ? a : b; }
inline int imax(int a, int b) { return a > b ? a : b; }

// bit-exact trig helpers shared by float and fixed builds (libopus
// mathops.h) — these keep theta splitting deterministic.
inline int frac_mul16(int a, int b) { return (16384 + a * b) >> 15; }
inline int bitexact_cos(int x) {
    int tmp = (4096 + x * x) >> 13;
    int x2 = tmp;
    x2 = (32767 - x2) +
         frac_mul16(x2, -7651 + frac_mul16(x2, 8277 + frac_mul16(-626, x2)));
    return 1 + x2;
}
inline int bitexact_log2tan(int isin, int icos) {
    int lc = RangeDec::ilog(icos);
    int ls = RangeDec::ilog(isin);
    icos <<= 15 - lc;
    isin <<= 15 - ls;
    return (ls - lc) * (1 << 11) +
           frac_mul16(isin, frac_mul16(isin, -2597) + 7932) -
           frac_mul16(icos, frac_mul16(icos, -2597) + 7932);
}

// PVQ size V(N,K) via the U table (opustab celt_pvq_u + row offsets)
inline const uint32_t* pvq_u_row(int n) {
    return opustab::celt_pvq_u + opustab::celt_pvq_u_row[n];
}
inline uint32_t PVQ_U(int n, int k) {
    int a = imin(n, k), b = imax(n, k);
    return pvq_u_row(a)[b];
}
inline uint32_t PVQ_V(int n, int k) { return PVQ_U(n, k) + PVQ_U(n, k + 1); }

// cwrs index → pulse vector (libopus cwrs.c cwrsi), returns Ryy
float cwrsi(int n, int k, uint32_t i, int* y) {
    float yy = 0;
    while (n > 2) {
        uint32_t p;
        int s, k0;
        int16_t val;
        if (k >= n) {
            const uint32_t* row = pvq_u_row(n);
            p = row[k + 1];
            s = -(i >= p);
            i -= p & (uint32_t)s;
            k0 = k;
            uint32_t q = row[n];
            if (q > i) {
                k = n;
                do p = pvq_u_row(--k)[n];
                while (p > i);
            } else {
                for (p = row[k]; p > i; p = row[k]) k--;
            }
            i -= p;
            val = (int16_t)((k0 - k + s) ^ s);
            *y++ = val;
            yy += (float)val * val;
        } else {
            uint32_t p2 = pvq_u_row(k)[n];
            uint32_t q = pvq_u_row(k + 1)[n];
            if (p2 <= i && i < q) {
                i -= p2;
                *y++ = 0;
            } else {
                s = -(i >= q);
                i -= q & (uint32_t)s;
                k0 = k;
                do p2 = pvq_u_row(--k)[n];
                while (p2 > i);
                i -= p2;
                val = (int16_t)((k0 - k + s) ^ s);
                *y++ = val;
                yy += (float)val * val;
            }
        }
        n--;
    }
    {   // n == 2
        uint32_t p = (uint32_t)(2 * k + 1);
        int s = -(i >= p);
        i -= p & (uint32_t)s;
        int k0 = k;
        k = (int)((i + 1) >> 1);
        if (k) i -= 2 * (uint32_t)k - 1;
        int16_t val = (int16_t)((k0 - k + s) ^ s);
        *y++ = val;
        yy += (float)val * val;
    }
    {   // n == 1
        int s = -(int)i;
        int16_t val = (int16_t)((k + s) ^ s);
        *y = val;
        yy += (float)val * val;
    }
    return yy;
}

struct CeltState {
    int channels = 1;          // coded channels
    float oldE[2][NB_BANDS];   // band energies (log2 domain)
    float oldLogE[2][NB_BANDS];
    float oldLogE2[2][NB_BANDS];
    float overlap_mem[2][OVERLAP];  // MDCT tail per channel
    float deemph_mem[2];
    float preemph_coef = 0.85f;
    uint32_t rng = 0;
    int postfilter_period = 0, postfilter_period_old = 0;
    float postfilter_gain = 0, postfilter_gain_old = 0;
    int postfilter_tapset = 0, postfilter_tapset_old = 0;
    // comb-filter history: keep the last COMBFILTER_MAXPERIOD+frame samples
    std::vector<float> syn_hist[2];  // rolling synthesis buffer per channel

    void reset(int ch) {
        channels = ch;
        for (int c = 0; c < 2; c++) {
            for (int i = 0; i < NB_BANDS; i++) {
                oldE[c][i] = 0;
                oldLogE[c][i] = oldLogE2[c][i] = -28.0f;
            }
            memset(overlap_mem[c], 0, sizeof(overlap_mem[c]));
            deemph_mem[c] = 0;
            syn_hist[c].assign(1024, 0.0f);  // COMBFILTER_MAXPERIOD
        }
        rng = 0;
        postfilter_period = postfilter_period_old = 0;
        postfilter_gain = postfilter_gain_old = 0;
        postfilter_tapset = postfilter_tapset_old = 0;
    }
};

// Allocation context shared through band decode
struct BandCtx {
    RangeDec* rc;
    int i;                 // current band
    int intensity;
    int spread;
    int tf_change;
    int32_t remaining_bits;
    uint32_t seed;
    int resynth = 1;
};

void renormalise_vector(float* X, int N, float gain) {
    float E = EPSILON;
    for (int j = 0; j < N; j++) E += X[j] * X[j];
    float g = gain / std::sqrt(E);
    for (int j = 0; j < N; j++) X[j] *= g;
}

void exp_rotation1(float* X, int len, int stride, float c, float s) {
    float ms = -s;
    float* Xptr = X;
    for (int i = 0; i < len - stride; i++) {
        float x1 = Xptr[0], x2 = Xptr[stride];
        Xptr[stride] = c * x2 + s * x1;
        *Xptr++ = c * x1 + ms * x2;
    }
    Xptr = &X[len - 2 * stride - 1];
    for (int i = len - 2 * stride - 1; i >= 0; i--) {
        float x1 = Xptr[0], x2 = Xptr[stride];
        Xptr[stride] = c * x2 + s * x1;
        *Xptr-- = c * x1 + ms * x2;
    }
}

void exp_rotation(float* X, int len, int dir, int stride, int K, int spread) {
    static const int SPREAD_FACTOR[3] = {15, 10, 5};
    if (2 * K >= len || spread == SPREAD_NONE) return;
    int factor = SPREAD_FACTOR[spread - 1];
    float gain = (float)len / (float)(len + factor * K);
    float theta = 0.5f * gain * gain;
    float c = std::cos(0.5f * (float)M_PI * theta);
    float s = std::cos(0.5f * (float)M_PI * (1.0f - theta));  // sin
    int stride2 = 0;
    if (len >= 8 * stride) {
        stride2 = 1;
        while ((stride2 * stride2 + stride2) * stride + (stride >> 2) < len)
            stride2++;
    }
    len /= stride;
    for (int i = 0; i < stride; i++) {
        if (dir < 0) {
            if (stride2) exp_rotation1(X + i * len, len, stride2, s, c);
            exp_rotation1(X + i * len, len, 1, c, s);
        } else {
            exp_rotation1(X + i * len, len, 1, c, -s);
            if (stride2) exp_rotation1(X + i * len, len, stride2, s, -c);
        }
    }
}

unsigned extract_collapse_mask(const int* iy, int N, int B) {
    if (B <= 1) return 1;
    unsigned mask = 0;
    int N0 = N / B;
    for (int i = 0; i < B; i++) {
        unsigned tmp = 0;
        for (int j = 0; j < N0; j++) tmp |= (unsigned)std::abs(iy[i * N0 + j]);
        mask |= (tmp != 0) << i;
    }
    return mask;
}

unsigned alg_unquant(float* X, int N, int K, int spread, int B, RangeDec& rc,
                     float gain) {
    std::vector<int> iy(N);
    uint32_t idx = rc.dec_uint(PVQ_V(N, K));
    float Ryy = cwrsi(N, K, idx, iy.data());
    float g = gain / std::sqrt(Ryy);
    for (int j = 0; j < N; j++) X[j] = g * iy[j];
    exp_rotation(X, N, -1, B, K, spread);
    return extract_collapse_mask(iy.data(), N, B);
}

// pulse-cache bit lookups (libopus rate.h)
inline const uint8_t* band_cache(int band, int LM) {
    return opustab::celt_cache_bits +
           opustab::celt_cache_index[(LM + 1) * NB_BANDS + band];
}
inline int bits2pulses(int band, int LM, int bits) {
    const uint8_t* cache = band_cache(band, LM);
    int lo = 0, hi = cache[0];
    bits--;
    for (int i = 0; i < 6; i++) {
        int mid = (lo + hi + 1) >> 1;
        if ((int)cache[mid] >= bits) hi = mid; else lo = mid;
    }
    if (bits - (lo == 0 ? -1 : (int)cache[lo]) <= (int)cache[hi] - bits)
        return lo;
    return hi;
}
inline int pulses2bits(int band, int LM, int pulses) {
    return pulses == 0 ? 0 : band_cache(band, LM)[pulses] + 1;
}
inline int get_pulses(int i) {
    return i < 8 ? i : (8 + (i & 7)) << ((i >> 3) - 1);
}

int compute_qn(int N, int b, int offset, int pulse_cap, int stereo) {
    int N2 = 2 * N - 1;
    if (stereo && N == 2) N2--;
    int qb = (b + N2 * offset) / N2;
    qb = imin(b - pulse_cap - (4 << BITRES), qb);
    qb = imin(8 << BITRES, qb);
    if (qb < (1 << BITRES >> 1)) return 1;
    int qn = opustab::celt_qn_exp2[qb & 0x7] >> (14 - (qb >> BITRES));
    return ((qn + 1) >> 1) << 1;
}

void haar1(float* X, int N0, int stride) {
    N0 >>= 1;
    const float rt = 0.70710678f;
    for (int i = 0; i < stride; i++)
        for (int j = 0; j < N0; j++) {
            float t1 = rt * X[stride * 2 * j + i];
            float t2 = rt * X[stride * (2 * j + 1) + i];
            X[stride * 2 * j + i] = t1 + t2;
            X[stride * (2 * j + 1) + i] = t1 - t2;
        }
}

// hadamard interleave tables (bands.c ordery_table)
static const int ordery_table[] = {
    1, 0,
    3, 0, 2, 1,
    7, 0, 4, 3, 6, 1, 5, 2,
    15, 0, 8, 7, 12, 3, 11, 4, 14, 1, 9, 6, 13, 2, 10, 5,
};

void deinterleave_hadamard(float* X, int N0, int stride, int hadamard) {
    int N = N0 * stride;
    std::vector<float> tmp(N);
    if (hadamard) {
        const int* ordery = ordery_table + stride - 2;
        for (int i = 0; i < stride; i++)
            for (int j = 0; j < N0; j++)
                tmp[ordery[i] * N0 + j] = X[j * stride + i];
    } else {
        for (int i = 0; i < stride; i++)
            for (int j = 0; j < N0; j++) tmp[i * N0 + j] = X[j * stride + i];
    }
    memcpy(X, tmp.data(), N * sizeof(float));
}

void interleave_hadamard(float* X, int N0, int stride, int hadamard) {
    int N = N0 * stride;
    std::vector<float> tmp(N);
    if (hadamard) {
        const int* ordery = ordery_table + stride - 2;
        for (int i = 0; i < stride; i++)
            for (int j = 0; j < N0; j++)
                tmp[j * stride + i] = X[ordery[i] * N0 + j];
    } else {
        for (int i = 0; i < stride; i++)
            for (int j = 0; j < N0; j++) tmp[j * stride + i] = X[i * N0 + j];
    }
    memcpy(X, tmp.data(), N * sizeof(float));
}

void stereo_merge(float* X, float* Y, float mid, int N) {
    float xp = 0, side = 0;
    for (int j = 0; j < N; j++) {
        xp += Y[j] * X[j];
        side += Y[j] * Y[j];
    }
    xp *= mid;
    float El = mid * mid + side - 2 * xp;
    float Er = mid * mid + side + 2 * xp;
    if (Er < 6e-4f || El < 6e-4f) {
        for (int j = 0; j < N; j++) Y[j] = X[j];
        return;
    }
    float lgain = 1.0f / std::sqrt(El);
    float rgain = 1.0f / std::sqrt(Er);
    for (int j = 0; j < N; j++) {
        float l = mid * X[j];
        float s = Y[j];
        X[j] = lgain * (l - s);
        Y[j] = rgain * (l + s);
    }
}

struct ThetaResult {
    int itheta = 0, inv = 0, imid = 0, iside = 0, delta = 0, qalloc = 0;
    int fill;
};

// decode the mid/side angle for a split (bands.c compute_theta, decoder)
ThetaResult compute_theta(BandCtx& ctx, int N, int* b, int B, int B0, int LM,
                          int stereo, int* fill) {
    ThetaResult r;
    RangeDec& rc = *ctx.rc;
    int i = ctx.i;
    int pulse_cap = opustab::celt_log_freq_range[i] + LM * (1 << BITRES);
    int offset = (pulse_cap >> 1) -
                 (stereo && N == 2 ? QTHETA_OFFSET_TWOPHASE : QTHETA_OFFSET);
    int qn = compute_qn(N, *b, offset, pulse_cap, stereo);
    if (stereo && i >= ctx.intensity) qn = 1;
    uint32_t tell = rc.tell_frac();
    int itheta = 0, inv = 0;
    if (qn != 1) {
        if (stereo && N > 2) {
            const int p0 = 3;
            int x0 = qn / 2;
            uint32_t ft = (uint32_t)(p0 * (x0 + 1) + x0);
            uint32_t fs = rc.decode(ft);
            int x;
            if (fs < (uint32_t)((x0 + 1) * p0)) x = fs / p0;
            else x = x0 + 1 + (fs - (x0 + 1) * p0);
            uint32_t fl = x <= x0 ? (uint32_t)(p0 * x)
                                  : (uint32_t)((x - 1 - x0) + (x0 + 1) * p0);
            uint32_t fw = x <= x0 ? (uint32_t)p0 : 1u;
            rc.update(fl, fl + fw, ft);
            if (g_rc_trace) g_rc_trace(5, qn, 0, nullptr, 0, x);
            itheta = x;
        } else if (B0 > 1 || stereo) {
            itheta = rc.dec_uint(qn + 1);
        } else {
            // triangular pdf
            uint32_t ft = (uint32_t)(((qn >> 1) + 1) * ((qn >> 1) + 1));
            uint32_t fm = rc.decode(ft);
            uint32_t fl, fs2;
            if (fm < (uint32_t)(((qn >> 1) * ((qn >> 1) + 1)) >> 1)) {
                {
                    uint32_t v = 8 * fm + 1, s = 0;
                    while ((s + 1) * (uint64_t)(s + 1) <= v) s++;
                    itheta = (int)((s - 1) >> 1);
                }
                fs2 = itheta + 1;
                fl = (uint32_t)(itheta * (itheta + 1)) >> 1;
            } else {
                uint32_t v = 8 * (ft - fm - 1) + 1, s = 0;
                while ((s + 1) * (uint64_t)(s + 1) <= v) s++;
                itheta = (int)((2 * (qn + 1) - s) >> 1);
                fs2 = qn + 1 - itheta;
                fl = ft - (((uint32_t)(qn + 1 - itheta) * (qn + 2 - itheta)) >> 1);
            }
            rc.update(fl, fl + fs2, ft);
            if (g_rc_trace) g_rc_trace(6, qn, 0, nullptr, 0, itheta);
        }
        itheta = (int)(((int64_t)itheta * 16384) / qn);
    } else if (stereo) {
        if (*b > 2 << BITRES && ctx.remaining_bits > 2 << BITRES)
            inv = rc.dec_bit_logp(2);
        itheta = 0;
    }
    int qalloc = (int)(rc.tell_frac() - tell);
    *b -= qalloc;
    ctx.remaining_bits -= qalloc;

    int imid, iside, delta;
    if (itheta == 0) {
        imid = 32767; iside = 0;
        *fill &= (1 << B) - 1;
        delta = -16384;
    } else if (itheta == 16384) {
        imid = 0; iside = 32767;
        *fill &= ((1 << B) - 1) << B;
        delta = 16384;
    } else {
        imid = bitexact_cos(itheta);
        iside = bitexact_cos(16384 - itheta);
        delta = frac_mul16((N - 1) << 7, bitexact_log2tan(iside, imid));
    }
    r.itheta = itheta; r.inv = inv; r.imid = imid; r.iside = iside;
    r.delta = delta; r.qalloc = qalloc;
    return r;
}

unsigned quant_band(BandCtx& ctx, float* X, int N, int b, int B,
                    float* lowband, int LM, float* lowband_out, float gain,
                    float* lowband_scratch, int fill);

// recursive partition (bands.c quant_partition, decode side)
unsigned quant_partition(BandCtx& ctx, float* X, int N, int b, int B,
                         float* lowband, int LM, float gain, int fill) {
    RangeDec& rc = *ctx.rc;
    int i = ctx.i;
    const uint8_t* cache = band_cache(i, LM);
    unsigned cm = 0;
    if (LM != -1 && b > (int)cache[cache[0]] + 12 && N > 2) {
        N >>= 1;
        float* Y = X + N;
        LM -= 1;
        if (B == 1) fill = (fill & 1) | (fill << 1);
        int B0 = B;
        B = (B + 1) >> 1;
        ThetaResult th = compute_theta(ctx, N, &b, B, B0, LM, 0, &fill);
        int itheta = th.itheta;
        int delta = th.delta;
        float mid = (1.0f / 32768) * th.imid;
        float side = (1.0f / 32768) * th.iside;
        if (B0 > 1 && (itheta & 0x3fff)) {
            if (itheta > 8192) delta -= delta >> (4 - LM);
            else delta = imin(0, delta + (N << BITRES >> (5 - LM)));
        }
        int mbits = imax(0, imin(b, (b - delta) / 2));
        int sbits = b - mbits;
        int32_t rebalance = ctx.remaining_bits;
        float* next_lowband2 = lowband ? lowband + N : nullptr;
        if (mbits >= sbits) {
            cm = quant_partition(ctx, X, N, mbits, B, lowband, LM,
                                 gain * mid, fill);
            rebalance = mbits - (rebalance - ctx.remaining_bits);
            if (rebalance > 3 << BITRES && itheta != 0)
                sbits += rebalance - (3 << BITRES);
            cm |= quant_partition(ctx, Y, N, sbits, B, next_lowband2, LM,
                                  gain * side, fill >> B)
                  << (B0 >> 1);
        } else {
            cm = quant_partition(ctx, Y, N, sbits, B, next_lowband2, LM,
                                 gain * side, fill >> B)
                 << (B0 >> 1);
            rebalance = sbits - (rebalance - ctx.remaining_bits);
            if (rebalance > 3 << BITRES && itheta != 16384)
                mbits += rebalance - (3 << BITRES);
            cm |= quant_partition(ctx, X, N, mbits, B, lowband, LM,
                                  gain * mid, fill);
        }
    } else {
        // leaf
        int q = bits2pulses(i, LM, b);
        int curr_bits = pulses2bits(i, LM, q);
        ctx.remaining_bits -= curr_bits;
        while (ctx.remaining_bits < 0 && q > 0) {
            ctx.remaining_bits += curr_bits;
            q--;
            curr_bits = pulses2bits(i, LM, q);
            ctx.remaining_bits -= curr_bits;
        }
        if (q != 0) {
            int K = get_pulses(q);
            cm = alg_unquant(X, N, K, ctx.spread, B, rc, gain);
        } else {
            unsigned cm_mask = (1u << B) - 1;
            fill &= cm_mask;
            if (!fill) {
                memset(X, 0, N * sizeof(float));
                cm = 0;
            } else {
                if (lowband == nullptr) {
                    for (int j = 0; j < N; j++) {
                        ctx.seed = celt_lcg_rand(ctx.seed);
                        X[j] = (float)((int32_t)ctx.seed >> 20);
                    }
                    cm = cm_mask;
                } else {
                    for (int j = 0; j < N; j++) {
                        ctx.seed = celt_lcg_rand(ctx.seed);
                        float tmp = 1.0f / 256;
                        tmp = (ctx.seed & 0x8000) ? tmp : -tmp;
                        X[j] = lowband[j] + tmp;
                    }
                    cm = (unsigned)fill;
                }
                renormalise_vector(X, N, gain);
            }
        }
    }
    return cm;
}

unsigned quant_band_n1(BandCtx& ctx, float* X, float* Y, float* lowband_out) {
    float* x = X;
    for (int c = 0; c < 1 + (Y != nullptr); c++) {
        int sign = 0;
        if (ctx.remaining_bits >= 1 << BITRES) {
            sign = ctx.rc->dec_bits(1);
            ctx.remaining_bits -= 1 << BITRES;
        }
        x[0] = sign ? -1.0f : 1.0f;
        x = Y;
    }
    if (lowband_out) lowband_out[0] = X[0];
    return 1;
}

static const uint8_t bit_interleave_table[16] = {
    0, 1, 1, 1, 2, 3, 3, 3, 2, 3, 3, 3, 2, 3, 3, 3,
};
static const uint8_t bit_deinterleave_table[16] = {
    0x00, 0x03, 0x0C, 0x0F, 0x30, 0x33, 0x3C, 0x3F,
    0xC0, 0xC3, 0xCC, 0xCF, 0xF0, 0xF3, 0xFC, 0xFF,
};

// mono/stereo-mid band wrapper (bands.c quant_band, decode side)
unsigned quant_band(BandCtx& ctx, float* X, int N, int b, int B,
                    float* lowband, int LM, float* lowband_out, float gain,
                    float* lowband_scratch, int fill) {
    int N0 = N;
    int N_B = N / B;
    int B0 = B;
    int time_divide = 0, recombine = 0;
    int longBlocks = B0 == 1;

    if (N == 1) return quant_band_n1(ctx, X, nullptr, lowband_out);

    int tf_change = ctx.tf_change;
    if (tf_change > 0) recombine = tf_change;
    if (lowband_scratch && lowband &&
        (recombine || ((N_B & 1) == 0 && tf_change < 0) || B0 > 1)) {
        memcpy(lowband_scratch, lowband, N * sizeof(float));
        lowband = lowband_scratch;
    }
    for (int k = 0; k < recombine; k++) {
        if (lowband) haar1(lowband, N >> k, 1 << k);
        fill = bit_interleave_table[fill & 0xF] |
               bit_interleave_table[fill >> 4] << 2;
    }
    B >>= recombine;
    N_B <<= recombine;
    while ((N_B & 1) == 0 && tf_change < 0) {
        if (lowband) haar1(lowband, N_B, B);
        fill |= fill << B;
        B <<= 1;
        N_B >>= 1;
        time_divide++;
        tf_change++;
    }
    B0 = B;
    int N_B0 = N_B;
    if (B0 > 1 && lowband)
        deinterleave_hadamard(lowband, N_B >> recombine, B0 << recombine,
                              longBlocks);

    unsigned cm = quant_partition(ctx, X, N, b, B, lowband, LM, gain, fill);

    // resynthesis undo
    if (ctx.resynth) {
        if (B0 > 1)
            interleave_hadamard(X, N_B >> recombine, B0 << recombine,
                                longBlocks);
        N_B = N_B0;
        B = B0;
        for (int k = 0; k < time_divide; k++) {
            B >>= 1;
            N_B <<= 1;
            cm |= cm >> B;
            haar1(X, N_B, B);
        }
        for (int k = 0; k < recombine; k++) {
            cm = bit_deinterleave_table[cm];
            haar1(X, N0 >> k, 1 << k);
        }
        B <<= recombine;
        if (lowband_out) {
            float n = std::sqrt((float)N0);
            for (int j = 0; j < N0; j++) lowband_out[j] = n * X[j];
        }
        cm &= (1u << B) - 1;
    }
    return cm;
}

// stereo band (bands.c quant_band_stereo, decode side)
unsigned quant_band_stereo(BandCtx& ctx, float* X, float* Y, int N, int b,
                           int B, float* lowband, int LM, float* lowband_out,
                           float* lowband_scratch, int fill) {
    if (N == 1) return quant_band_n1(ctx, X, Y, lowband_out);
    unsigned cm = 0;
    int orig_fill = fill;
    ThetaResult th = compute_theta(ctx, N, &b, B, B, LM, 1, &fill);
    int itheta = th.itheta, inv = th.inv;
    float mid = (1.0f / 32768) * th.imid;
    float side = (1.0f / 32768) * th.iside;
    if (N == 2) {
        int sbits = (itheta != 0 && itheta != 16384) ? 1 << BITRES : 0;
        int mbits = b - sbits;
        int c = itheta > 8192;
        ctx.remaining_bits -= sbits;
        float* x2 = c ? Y : X;
        float* y2 = c ? X : Y;
        int sign = 0;
        if (sbits) sign = ctx.rc->dec_bits(1);
        sign = 1 - 2 * sign;
        cm = quant_band(ctx, x2, N, mbits, B, lowband, LM, lowband_out, 1.0f,
                        lowband_scratch, orig_fill);
        y2[0] = -sign * x2[1];
        y2[1] = sign * x2[0];
        if (ctx.resynth) {
            X[0] *= mid; X[1] *= mid;
            Y[0] *= side; Y[1] *= side;
            float tmp = X[0];
            X[0] = tmp - Y[0];
            Y[0] = tmp + Y[0];
            tmp = X[1];
            X[1] = tmp - Y[1];
            Y[1] = tmp + Y[1];
        }
    } else {
        int mbits = imax(0, imin(b, (b - th.delta) / 2));
        int sbits = b - mbits;
        int32_t rebalance = ctx.remaining_bits;
        if (mbits >= sbits) {
            cm = quant_band(ctx, X, N, mbits, B, lowband, LM, lowband_out,
                            1.0f, lowband_scratch, fill);
            rebalance = mbits - (rebalance - ctx.remaining_bits);
            if (rebalance > 3 << BITRES && itheta != 0)
                sbits += rebalance - (3 << BITRES);
            cm |= quant_band(ctx, Y, N, sbits, B, nullptr, LM, nullptr, side,
                             nullptr, fill >> B);
        } else {
            cm = quant_band(ctx, Y, N, sbits, B, nullptr, LM, nullptr, side,
                            nullptr, fill >> B);
            rebalance = sbits - (rebalance - ctx.remaining_bits);
            if (rebalance > 3 << BITRES && itheta != 16384)
                mbits += rebalance - (3 << BITRES);
            cm |= quant_band(ctx, X, N, mbits, B, lowband, LM, lowband_out,
                             1.0f, lowband_scratch, fill);
        }
    }
    if (ctx.resynth) {
        if (N != 2) stereo_merge(X, Y, mid, N);
        if (inv)
            for (int j = 0; j < N; j++) Y[j] = -Y[j];
    }
    return cm;
}

// --- coarse / fine energy (quant_bands.c, decode side) ---------------------

void unquant_coarse_energy(RangeDec& rc, int start, int end, float oldE[][NB_BANDS],
                           int intra, int C, int LM, uint32_t budget_bits) {
    const uint8_t* prob = &opustab::celt_coarse_energy_dist[LM][intra][0];
    // ffmpeg-convention coefficients: beta here is libopus's (1-beta),
    // so the walking-average update is prev += beta*q directly
    float coef, beta;
    if (intra) {
        coef = 0;
        beta = 1.0f - 4915.0f / 32768.0f;
    } else {
        coef = opustab::celt_alpha_coef[LM];
        beta = opustab::celt_beta_coef[LM];
    }
    float prev[2] = {0, 0};
    for (int i = start; i < end; i++) {
        for (int c = 0; c < C; c++) {
            uint32_t tell = rc.tell();
            int qi;
            if (budget_bits - tell >= 15) {
                int pi = 2 * imin(i, 20);
                qi = ec_laplace_decode(rc, (uint32_t)prob[pi] << 7,
                                       (int)prob[pi + 1] << 6);
            } else if (budget_bits - tell >= 2) {
                qi = rc.dec_cdf(opustab::celt_model_energy_small);
                qi = (qi >> 1) ^ -(qi & 1);
            } else if (budget_bits - tell >= 1) {
                qi = -rc.dec_bit_logp(1);
            } else {
                qi = -1;
            }
            float q = (float)qi;
            float old = oldE[c][i] < -9.0f ? -9.0f : oldE[c][i];
            oldE[c][i] = coef * old + prev[c] + q;
            prev[c] = prev[c] + beta * q;
        }
    }
}

void unquant_fine_energy(RangeDec& rc, int start, int end, float oldE[][NB_BANDS],
                         const int* fine_quant, int C) {
    for (int i = start; i < end; i++) {
        if (fine_quant[i] <= 0) continue;
        for (int c = 0; c < C; c++) {
            int q2 = rc.dec_bits(fine_quant[i]);
            float offset =
                (q2 + 0.5f) * (1 << (14 - fine_quant[i])) * (1.0f / 16384) -
                0.5f;
            oldE[c][i] += offset;
        }
    }
}

void unquant_energy_finalise(RangeDec& rc, int start, int end,
                             float oldE[][NB_BANDS], const int* fine_quant,
                             const int* fine_priority, int bits_left, int C) {
    for (int prio = 0; prio < 2; prio++) {
        for (int i = start; i < end && bits_left >= C; i++) {
            if (fine_quant[i] >= MAX_FINE_BITS || fine_priority[i] != prio)
                continue;
            for (int c = 0; c < C; c++) {
                int q2 = rc.dec_bits(1);
                float offset = (q2 - 0.5f) *
                               (1.0f / (1 << (fine_quant[i] + 1)));
                oldE[c][i] += offset;
                bits_left--;
            }
        }
    }
}

// --- tf_decode (celt.c) ----------------------------------------------------

void tf_decode(RangeDec& rc, int start, int end, int isTransient, int* tf_res,
               int LM) {
    uint32_t budget = rc.storage * 8;
    uint32_t tell = rc.tell();
    int logp = isTransient ? 2 : 4;
    int tf_select_rsv = LM > 0 && tell + logp + 1 <= budget;
    budget -= tf_select_rsv;
    int tf_changed = 0, curr = 0;
    for (int i = start; i < end; i++) {
        if (tell + logp <= budget) {
            curr ^= rc.dec_bit_logp(logp);
            tell = rc.tell();
            tf_changed |= curr;
        }
        tf_res[i] = curr;
        logp = isTransient ? 4 : 5;
    }
    int tf_select = 0;
    if (tf_select_rsv &&
        opustab::celt_tf_select[LM][isTransient][0][tf_changed] !=
            opustab::celt_tf_select[LM][isTransient][1][tf_changed]) {
        tf_select = rc.dec_bit_logp(1);
    }
    for (int i = start; i < end; i++)
        tf_res[i] =
            opustab::celt_tf_select[LM][isTransient][tf_select][tf_res[i]];
}

// --- bit allocation (rate.c) -----------------------------------------------

int interp_bits2pulses(int start, int end, int skip_start, const int* bits1,
                       const int* bits2, const int* thresh, const int* cap,
                       int total, int32_t* _balance, int skip_rsv,
                       int* intensity, int intensity_rsv, int* dual_stereo,
                       int dual_stereo_rsv, int* bits, int* ebits,
                       int* fine_priority, int C, int LM, RangeDec& rc) {
    const int ALLOC_STEPS = 6;
    int stereo = C > 1 ? 1 : 0;
    int logM = LM << BITRES;
    int alloc_floor = C << BITRES;
    const uint8_t* eb = opustab::celt_freq_bands;
    int lo = 0, hi = 1 << ALLOC_STEPS;
    int psum, done;
    for (int it = 0; it < ALLOC_STEPS; it++) {
        int mid = (lo + hi) >> 1;
        psum = 0;
        done = 0;
        for (int j = end; j-- > start;) {
            int tmp = bits1[j] + ((int64_t)mid * bits2[j] >> ALLOC_STEPS);
            if (tmp >= thresh[j] || done) {
                done = 1;
                psum += imin(tmp, cap[j]);
            } else if (tmp >= alloc_floor) {
                psum += alloc_floor;
            }
        }
        if (psum > total) hi = mid;
        else lo = mid;
    }
    psum = 0;
    done = 0;
    for (int j = end; j-- > start;) {
        int tmp = bits1[j] + ((int64_t)lo * bits2[j] >> ALLOC_STEPS);
        if (tmp < thresh[j] && !done) {
            if (tmp >= alloc_floor) tmp = alloc_floor;
            else tmp = 0;
        } else {
            done = 1;
        }
        tmp = imin(tmp, cap[j]);
        bits[j] = tmp;
        psum += tmp;
    }
    int codedBands = end;
    for (;;) {
        int j = codedBands - 1;
        if (j <= skip_start) {
            total += skip_rsv;
            break;
        }
        int left = total - psum;
        int denom = eb[codedBands] - eb[start];
        int percoeff = left / denom;
        left -= denom * percoeff;
        int rem = imax(left - (eb[j] - eb[start]), 0);
        int band_width = eb[codedBands] - eb[j];
        int band_bits = bits[j] + percoeff * band_width + rem;
        if (band_bits >= imax(thresh[j], alloc_floor + (1 << BITRES))) {
            if (rc.dec_bit_logp(1)) break;
            psum += 1 << BITRES;
            band_bits -= 1 << BITRES;
        }
        psum -= bits[j] + intensity_rsv;
        if (intensity_rsv > 0)
            intensity_rsv = opustab::celt_log2_frac[j - start];
        psum += intensity_rsv;
        if (band_bits >= alloc_floor) {
            psum += alloc_floor;
            bits[j] = alloc_floor;
        } else {
            bits[j] = 0;
        }
        codedBands--;
    }
    if (intensity_rsv > 0)
        *intensity = start + rc.dec_uint(codedBands + 1 - start);
    else
        *intensity = 0;
    if (*intensity <= start) {
        total += dual_stereo_rsv;
        dual_stereo_rsv = 0;
    }
    if (dual_stereo_rsv > 0) *dual_stereo = rc.dec_bit_logp(1);
    else *dual_stereo = 0;

    int left = total - psum;
    int denom = eb[codedBands] - eb[start];
    int percoeff = left / denom;
    left -= denom * percoeff;
    for (int j = start; j < codedBands; j++)
        bits[j] += percoeff * (eb[j + 1] - eb[j]);
    for (int j = start; j < codedBands; j++) {
        int tmp = imin(left, eb[j + 1] - eb[j]);
        bits[j] += tmp;
        left -= tmp;
    }
    int balance = 0;
    int j;
    for (j = start; j < codedBands; j++) {
        int N0 = eb[j + 1] - eb[j];
        int N = N0 << LM;
        int bit = bits[j] + balance;
        int excess = 0;
        if (N > 1) {
            excess = imax(bit - cap[j], 0);
            bits[j] = bit - excess;
            int den = C * N + (C == 2 && N > 2 && !*dual_stereo &&
                                       j < *intensity
                                   ? 1
                                   : 0);
            int NClogN = den * (opustab::celt_log_freq_range[j] + logM);
            int offset = (NClogN >> 1) - den * FINE_OFFSET;
            if (N == 2) offset += den << BITRES >> 2;
            if (bits[j] + offset < den * 2 << BITRES) offset += NClogN >> 2;
            else if (bits[j] + offset < den * 3 << BITRES)
                offset += NClogN >> 3;
            ebits[j] = imax(0, bits[j] + offset + (den << (BITRES - 1)));
            ebits[j] = (ebits[j] / den) >> BITRES;
            if (C * ebits[j] > (bits[j] >> BITRES))
                ebits[j] = bits[j] >> stereo >> BITRES;
            ebits[j] = imin(ebits[j], MAX_FINE_BITS);
            fine_priority[j] = ebits[j] * (den << BITRES) >= bits[j] + offset;
            bits[j] -= C * ebits[j] << BITRES;
        } else {
            excess = imax(0, bit - (C << BITRES));
            bits[j] = bit - excess;
            ebits[j] = 0;
            fine_priority[j] = 1;
        }
        if (excess > 0) {
            int extra_fine =
                imin(excess >> (stereo + BITRES), MAX_FINE_BITS - ebits[j]);
            ebits[j] += extra_fine;
            int extra_bits = extra_fine * C << BITRES;
            fine_priority[j] = extra_bits >= excess - balance;
            excess -= extra_bits;
        }
        balance = excess;
    }
    *_balance = balance;
    for (; j < end; j++) {
        ebits[j] = bits[j] >> stereo >> BITRES;
        bits[j] = 0;
        fine_priority[j] = ebits[j] < 1;
    }
    return codedBands;
}

int clt_compute_allocation(int start, int end, const int* offsets,
                           const int* cap, int alloc_trim, int* intensity,
                           int* dual_stereo, int total, int32_t* balance,
                           int* pulses, int* ebits, int* fine_priority, int C,
                           int LM, RangeDec& rc) {
    const uint8_t* eb = opustab::celt_freq_bands;
    total = imax(total, 0);
    int skip_start = start;
    int skip_rsv = total >= 1 << BITRES ? 1 << BITRES : 0;
    total -= skip_rsv;
    int intensity_rsv = 0, dual_stereo_rsv = 0;
    if (C == 2) {
        intensity_rsv = opustab::celt_log2_frac[end - start];
        if (intensity_rsv > total) {
            intensity_rsv = 0;
        } else {
            total -= intensity_rsv;
            dual_stereo_rsv = total >= 1 << BITRES ? 1 << BITRES : 0;
            total -= dual_stereo_rsv;
        }
    }
    int bits1[NB_BANDS], bits2[NB_BANDS], thresh[NB_BANDS],
        trim_offset[NB_BANDS];
    for (int j = start; j < end; j++) {
        int width = eb[j + 1] - eb[j];
        thresh[j] = imax(C << BITRES, (3 * width << LM << BITRES) >> 4);
        trim_offset[j] = C * width * (alloc_trim - 5 - LM) * (end - j - 1) *
                             (1 << (LM + BITRES)) >>
                         6;
        if ((width << LM) == 1) trim_offset[j] -= C << BITRES;
    }
    int lo = 1, hi = 11 - 1;
    do {
        int done = 0, psum = 0;
        int mid = (lo + hi) >> 1;
        for (int j = end; j-- > start;) {
            int width = eb[j + 1] - eb[j];
            int bitsj = C * width * opustab::celt_static_alloc[mid][j] << LM >>
                        2;
            if (bitsj > 0) bitsj = imax(0, bitsj + trim_offset[j]);
            bitsj += offsets[j];
            if (bitsj >= thresh[j] || done) {
                done = 1;
                psum += imin(bitsj, cap[j]);
            } else if (bitsj >= C << BITRES) {
                psum += C << BITRES;
            }
        }
        if (psum > total) hi = mid - 1;
        else lo = mid + 1;
    } while (lo <= hi);
    hi = lo;
    lo = hi - 1;
    for (int j = start; j < end; j++) {
        int width = eb[j + 1] - eb[j];
        int bits1j = C * width * opustab::celt_static_alloc[lo][j] << LM >> 2;
        int bits2j = hi >= 11
                         ? cap[j]
                         : C * width * opustab::celt_static_alloc[hi][j]
                               << LM >> 2;
        if (bits1j > 0) bits1j = imax(0, bits1j + trim_offset[j]);
        if (bits2j > 0) bits2j = imax(0, bits2j + trim_offset[j]);
        if (lo > 0) bits1j += offsets[j];
        bits2j += offsets[j];
        if (offsets[j] > 0) skip_start = j;
        bits2j = imax(0, bits2j - bits1j);
        bits1[j] = bits1j;
        bits2[j] = bits2j;
    }
    return interp_bits2pulses(start, end, skip_start, bits1, bits2, thresh,
                              cap, total, balance, skip_rsv, intensity,
                              intensity_rsv, dual_stereo, dual_stereo_rsv,
                              pulses, ebits, fine_priority, C, LM, rc);
}

// --- quant_all_bands (bands.c) ---------------------------------------------

void quant_all_bands(RangeDec& rc, int start, int end, float* X_, float* Y_,
                     uint8_t* collapse_masks, const int* pulses,
                     int shortBlocks, int spread, int dual_stereo,
                     int intensity, const int* tf_res, int32_t total_bits,
                     int32_t balance, int LM, int codedBands, uint32_t* seed) {
    const uint8_t* eb = opustab::celt_freq_bands;
    int M = 1 << LM;
    int B = shortBlocks ? M : 1;
    int C = Y_ ? 2 : 1;
    int norm_offset = M * eb[start];
    int frame_n = M * eb[NB_BANDS];
    // norm buffers for folding (per channel)
    std::vector<float> norm_buf(C * (frame_n - norm_offset), 0.0f);
    float* norm = norm_buf.data();
    float* norm2 = norm + (frame_n - norm_offset);
    std::vector<float> scratch(frame_n);
    int lowband_offset = 0;
    int update_lowband = 1;
    BandCtx ctx;
    ctx.rc = &rc;
    ctx.intensity = intensity;
    ctx.spread = spread;
    ctx.seed = *seed;
    for (int i = start; i < end; i++) {
        int N = (eb[i + 1] - eb[i]) << LM;
        float* X = X_ + M * eb[i];
        float* Y = Y_ ? Y_ + M * eb[i] : nullptr;
        uint32_t tell = rc.tell_frac();
        if (i != start) balance -= tell;
        int32_t remaining_bits = total_bits - tell - 1;
        ctx.remaining_bits = remaining_bits;
        int b = 0;
        if (i <= codedBands - 1) {
            int curr_balance = balance / imin(3, codedBands - i);
            b = imax(0, imin(16383,
                             imin(remaining_bits + 1,
                                  pulses[i] + curr_balance)));
        }
        if (M * eb[i] - N >= M * eb[start] &&
            (update_lowband || lowband_offset == 0))
            lowband_offset = i;
        ctx.i = i;
        ctx.tf_change = tf_res[i];
        int effective_lowband = -1;
        unsigned x_cm, y_cm;
        if (lowband_offset != 0 &&
            (spread != SPREAD_AGGRESSIVE || B > 1 || ctx.tf_change < 0)) {
            effective_lowband =
                imax(0, M * eb[lowband_offset] - norm_offset - N);
            int fold_start = lowband_offset;
            while (M * eb[--fold_start] > effective_lowband + norm_offset) {}
            int fold_end = lowband_offset - 1;
            while (M * eb[++fold_end] < effective_lowband + norm_offset + N) {}
            x_cm = y_cm = 0;
            int fold_i = fold_start;
            do {
                x_cm |= collapse_masks[fold_i * C + 0];
                y_cm |= collapse_masks[fold_i * C + C - 1];
            } while (++fold_i < fold_end);
        } else {
            x_cm = y_cm = (1u << B) - 1;
        }
        if (dual_stereo && i == intensity) {
            dual_stereo = 0;
            for (int j = 0; j < M * eb[i] - norm_offset; j++)
                norm[j] = 0.5f * (norm[j] + norm2[j]);
        }
        float* eff_lowband_x =
            effective_lowband != -1 ? norm + effective_lowband : nullptr;
        float* lowband_out =
            i != end - 1 ? norm + M * eb[i] - norm_offset : nullptr;
        if (dual_stereo) {
            x_cm = quant_band(ctx, X, N, b / 2, B, eff_lowband_x, LM,
                              lowband_out, 1.0f, scratch.data(), (int)x_cm);
            float* eff_lowband_y = effective_lowband != -1
                                       ? norm2 + effective_lowband
                                       : nullptr;
            float* lowband_out_y =
                i != end - 1 ? norm2 + M * eb[i] - norm_offset : nullptr;
            y_cm = quant_band(ctx, Y, N, b / 2, B, eff_lowband_y, LM,
                              lowband_out_y, 1.0f, scratch.data(), (int)y_cm);
        } else {
            if (Y) {
                x_cm = quant_band_stereo(ctx, X, Y, N, b, B, eff_lowband_x,
                                         LM, lowband_out, scratch.data(),
                                         (int)(x_cm | y_cm));
            } else {
                x_cm = quant_band(ctx, X, N, b, B, eff_lowband_x, LM,
                                  lowband_out, 1.0f, scratch.data(),
                                  (int)(x_cm | y_cm));
            }
            y_cm = x_cm;
        }
        collapse_masks[i * C + 0] = (uint8_t)x_cm;
        collapse_masks[i * C + C - 1] = (uint8_t)y_cm;
        balance += pulses[i] + tell;
        update_lowband = b > (N << BITRES);
    }
    *seed = ctx.seed;
}

// --- anti-collapse (bands.c) -----------------------------------------------

void anti_collapse(float* X_, const uint8_t* collapse_masks, int LM, int C,
                   int size, int start, int end, const float logE[][NB_BANDS],
                   const float prev1logE[][NB_BANDS],
                   const float prev2logE[][NB_BANDS], const int* pulses,
                   uint32_t seed) {
    const uint8_t* eb = opustab::celt_freq_bands;
    for (int i = start; i < end; i++) {
        int N0 = eb[i + 1] - eb[i];
        // depth in 1/8 bits/sample: pulses[] carries the allocation's
        // leftover PVQ bits (8th-bit units)
        int depth = ((1 + pulses[i]) / N0) >> LM;
        float thresh = 0.5f * std::exp2(-0.125f * depth);
        float sqrt_1 = 1.0f / std::sqrt((float)(N0 << LM));
        for (int c = 0; c < C; c++) {
            float prev1 = prev1logE[c][i];
            float prev2 = prev2logE[c][i];
            if (C == 1) {
                prev1 = std::max(prev1, prev1logE[1][i]);
                prev2 = std::max(prev2, prev2logE[1][i]);
            }
            float Ediff = logE[c][i] - std::min(prev1, prev2);
            Ediff = std::max(0.0f, Ediff);
            float r = 2.0f * std::exp2(-Ediff);
            if (LM == 3) r *= 1.41421356f;
            r = std::min(thresh, r);
            r = r * sqrt_1;
            float* X = X_ + c * size + (eb[i] << LM);
            int renorm = 0;
            for (int k = 0; k < 1 << LM; k++) {
                if (!(collapse_masks[i * C + c] & (1 << k))) {
                    for (int j = 0; j < N0; j++) {
                        seed = celt_lcg_rand(seed);
                        X[(j << LM) + k] = (seed & 0x8000) ? r : -r;
                    }
                    renorm = 1;
                }
            }
            if (renorm) renormalise_vector(X, N0 << LM, 1.0f);
        }
    }
}

// --- synthesis -------------------------------------------------------------

void denormalise_bands(const float* X, float* freq, const float* oldE,
                       int start, int end, int M, int silence, int n_total) {
    const uint8_t* eb = opustab::celt_freq_bands;
    int bound = M * eb[end];
    if (silence) {
        memset(freq, 0, n_total * sizeof(float));
        return;
    }
    memset(freq, 0, M * eb[start] * sizeof(float));
    for (int i = start; i < end; i++) {
        float lg = oldE[i] + opustab::celt_mean_energy[i];
        float g = std::exp2(std::min(32.0f, lg));
        for (int j = M * eb[i]; j < M * eb[i + 1]; j++) freq[j] = g * X[j];
    }
    memset(freq + bound, 0, (n_total - bound) * sizeof(float));
}

// Backward MDCT body + TDAC window mirror (mdct.c clt_mdct_backward
// semantics): `in` has stride `stride`, out receives the N2-sample body
// at [overlap/2, overlap/2+N2) and the windowed mirror over [0, overlap).
void mdct_backward(const float* in, int stride, float* out, int N2) {
    // body[j] = t[N2/2 + j] of the canonical 2*N2-point IMDCT
    //   t[n] = sum_k X[k] cos(pi/N2 (n + 0.5 + N2/2)(k + 0.5))
    // naive O(N^2); decode-rate cost is fine for file decode
    double c0 = M_PI / N2;
    for (int j = 0; j < N2; j++) {
        double n = j + 0.5 + N2;
        double acc = 0;
        for (int k = 0; k < N2; k++)
            acc += (double)in[k * stride] * std::cos(c0 * n * (k + 0.5));
        out[OVERLAP / 2 + j] = (float)acc;
    }
    // TDAC mirror with window over [0, overlap)
    const float* w = opustab::celt_window;
    float* xp1 = out + OVERLAP - 1;
    float* yp1 = out;
    const float* wp1 = w;
    const float* wp2 = w + OVERLAP - 1;
    for (int i = 0; i < OVERLAP / 2; i++) {
        float x1 = *xp1, x2 = *yp1;
        *yp1++ = *wp2 * x2 - *wp1 * x1;
        *xp1-- = *wp1 * x2 + *wp2 * x1;
        wp1++;
        wp2--;
    }
}

// comb filter (postfilter; celt.c comb_filter)
void comb_filter(float* y, float* x, int T0, int T1, int N, float g0,
                 float g1, int tapset0, int tapset1) {
    if (g0 == 0 && g1 == 0) {
        if (x != y) memmove(y, x, N * sizeof(float));
        return;
    }
    const float(*gains)[3] = opustab::celt_postfilter_taps;
    T0 = imax(T0, 15);
    T1 = imax(T1, 15);
    float g00 = g0 * gains[tapset0][0];
    float g01 = g0 * gains[tapset0][1];
    float g02 = g0 * gains[tapset0][2];
    float g10 = g1 * gains[tapset1][0];
    float g11 = g1 * gains[tapset1][1];
    float g12 = g1 * gains[tapset1][2];
    int overlap = imin(OVERLAP, N);
    int i = 0;
    for (; i < overlap; i++) {
        float f = opustab::celt_window2[i];
        y[i] = x[i] +
               (1 - f) * (g00 * x[i - T0] +
                          g01 * (x[i - T0 + 1] + x[i - T0 - 1]) +
                          g02 * (x[i - T0 + 2] + x[i - T0 - 2])) +
               f * (g10 * x[i - T1] + g11 * (x[i - T1 + 1] + x[i - T1 - 1]) +
                    g12 * (x[i - T1 + 2] + x[i - T1 - 2]));
    }
    for (; i < N; i++) {
        y[i] = x[i] + g10 * x[i - T1] +
               g11 * (x[i - T1 + 1] + x[i - T1 - 1]) +
               g12 * (x[i - T1 + 2] + x[i - T1 - 2]);
    }
}

// --- CELT frame decode (celt_decoder.c celt_decode_with_ec) ---------------
// Decodes one CELT frame of N = 120<<LM samples/channel at 48 kHz into
// out[ch][N] (float, CELT_SIG scale ±32768; caller divides).

struct CeltFrameOut {
    int silence = 0;
};

int celt_frame_decode(CeltState& st, RangeDec& rc, int LM, int start_band,
                      int end_band, float* out_l, float* out_r) {
    const uint8_t* eb = opustab::celt_freq_bands;
    int C = st.channels;
    int M = 1 << LM;
    int N = M * 120;
    int frame_n = M * eb[NB_BANDS];  // == N
    int start = start_band, end = end_band;
    uint32_t total_bits = rc.storage * 8;
    uint32_t tell = rc.tell();

    int silence = 0;
    if (tell >= total_bits) silence = 1;
    else if (tell == 1) silence = rc.dec_bit_logp(15);
    if (silence) {
        // consume the rest
        rc.total_bits += total_bits - rc.tell();
        tell = total_bits;
    } else {
        tell = rc.tell();
    }

    int postfilter_pitch = 0, postfilter_tapset = 0;
    float postfilter_gain = 0;
    if (start == 0 && tell + 16 <= total_bits) {
        if (rc.dec_bit_logp(1)) {
            int octave = rc.dec_uint(6);
            postfilter_pitch = (16 << octave) + rc.dec_bits(4 + octave) - 1;
            int qg = rc.dec_bits(3);
            if (rc.tell() + 2 <= total_bits)
                postfilter_tapset = rc.dec_cdf(opustab::celt_model_tapset);
            postfilter_gain = 0.09375f * (qg + 1);
        }
        tell = rc.tell();
    }
    int isTransient = 0;
    if (LM > 0 && tell + 3 <= total_bits) {
        isTransient = rc.dec_bit_logp(3);
        tell = rc.tell();
    }
    int shortBlocks = isTransient ? M : 0;
    int intra = 0;
    if (tell + 3 <= total_bits) intra = rc.dec_bit_logp(3);

    // stash previous energies for anti-collapse
    float prev1[2][NB_BANDS], prev2[2][NB_BANDS];
    memcpy(prev1, st.oldLogE, sizeof(prev1));
    memcpy(prev2, st.oldLogE2, sizeof(prev2));

    unquant_coarse_energy(rc, start, end, st.oldE, intra, C, LM, total_bits);

    int tf_res[NB_BANDS] = {0};
    tf_decode(rc, start, end, isTransient, tf_res, LM);

    tell = rc.tell();
    int spread = SPREAD_NORMAL;
    if (tell + 4 <= total_bits)
        spread = rc.dec_cdf(opustab::celt_model_spread);

    int cap[NB_BANDS], offsets[NB_BANDS] = {0};
    for (int i = 0; i < NB_BANDS; i++)
        cap[i] = (opustab::celt_static_caps[LM][C - 1][i] + 64) * C *
                     (opustab::celt_freq_range[i] << LM) >>
                 2;

    int dynalloc_logp = 6;
    int32_t total_bits_frac = (int32_t)total_bits << BITRES;
    int32_t tell_frac = rc.tell_frac();
    int32_t total_boost = 0;
    for (int i = start; i < end; i++) {
        int width = C * opustab::celt_freq_range[i] << LM;
        int quanta = imin(width << BITRES, imax(6 << BITRES, width));
        int dynalloc_loop_logp = dynalloc_logp;
        int boost = 0;
        while ((int32_t)rc.tell_frac() + (dynalloc_loop_logp << BITRES) <
                   total_bits_frac - total_boost &&
               boost < cap[i]) {
            int flag = rc.dec_bit_logp(dynalloc_loop_logp);
            if (!flag) break;
            boost += quanta;
            total_boost += quanta;
            dynalloc_loop_logp = 1;
        }
        offsets[i] = boost;
        if (boost > 0) dynalloc_logp = imax(2, dynalloc_logp - 1);
    }
    int alloc_trim = 5;
    if ((int32_t)rc.tell_frac() + (6 << BITRES) <=
        total_bits_frac - total_boost)
        alloc_trim = rc.dec_cdf(opustab::celt_model_alloc_trim);

    int32_t bits =
        ((int32_t)rc.storage * 8 << BITRES) - (int32_t)rc.tell_frac() - 1;
    int anti_collapse_rsv =
        isTransient && LM >= 2 && bits >= ((LM + 2) << BITRES) ? 1 << BITRES
                                                              : 0;
    bits -= anti_collapse_rsv;

    int intensity = 0, dual_stereo = 0;
    int pulses[NB_BANDS] = {0}, fine_quant[NB_BANDS] = {0},
        fine_priority[NB_BANDS] = {0};
    int32_t balance = 0;
    int codedBands = clt_compute_allocation(
        start, end, offsets, cap, alloc_trim, &intensity, &dual_stereo, bits,
        &balance, pulses, fine_quant, fine_priority, C, LM, rc);

    unquant_fine_energy(rc, start, end, st.oldE, fine_quant, C);

    std::vector<float> X(C * frame_n, 0.0f);
    uint8_t collapse_masks[NB_BANDS * 2] = {0};
    quant_all_bands(rc, start, end, X.data(),
                    C == 2 ? X.data() + frame_n : nullptr, collapse_masks,
                    pulses, shortBlocks, spread, dual_stereo, intensity,
                    tf_res,
                    ((int32_t)rc.storage * 8 << BITRES) - anti_collapse_rsv,
                    balance, LM, codedBands, &st.rng);

    int anti_collapse_on = 0;
    if (anti_collapse_rsv > 0) anti_collapse_on = rc.dec_bits(1);

    unquant_energy_finalise(rc, start, end, st.oldE, fine_quant,
                            fine_priority,
                            rc.storage * 8 - rc.tell(), C);

    if (anti_collapse_on)
        anti_collapse(X.data(), collapse_masks, LM, C, frame_n, start, end,
                      st.oldE, prev1, prev2, pulses, st.rng);

    if (silence) {
        for (int c = 0; c < 2; c++)
            for (int i = 0; i < NB_BANDS; i++) st.oldE[c][i] = -28.0f;
    }

    // synthesis: denormalise + per-block IMDCT with cross-block windows
    int B, NB, b_stride;
    if (isTransient) { B = M; NB = 120; }
    else { B = 1; NB = 120 << LM; }
    b_stride = B;
    float* outs[2] = {out_l, out_r};
    std::vector<float> freq(N);
    std::vector<float> syn(N + OVERLAP / 2);
    for (int c = 0; c < C; c++) {
        denormalise_bands(X.data() + c * frame_n, freq.data(), st.oldE[c],
                          start, end, M, silence, N);
        if (c == 0) {
            g_dump_freq = freq;
            g_dump_energy.assign(st.oldE[0], st.oldE[0] + NB_BANDS);
        }
        // seed the head with last frame's tail ([N, N+ov/2) leftover)
        memset(syn.data(), 0, syn.size() * sizeof(float));
        memcpy(syn.data(), st.overlap_mem[c], (OVERLAP / 2) * sizeof(float));
        for (int b = 0; b < B; b++)
            mdct_backward(freq.data() + b, b_stride, syn.data() + NB * b,
                          NB);
        // save the tail for next frame (written past N by the last block)
        memcpy(st.overlap_mem[c], syn.data() + N,
               (OVERLAP / 2) * sizeof(float));
        memcpy(outs[c], syn.data(), N * sizeof(float));
    }

    // postfilter (comb) over the frame: history buffer holds the last
    // 1024 (COMBFILTER_MAXPERIOD) pre-deemphasis samples per channel
    for (int c = 0; c < C; c++) {
        auto& hist = st.syn_hist[c];  // size 1024
        std::vector<float> work(1024 + N);
        memcpy(work.data(), hist.data(), 1024 * sizeof(float));
        memcpy(work.data() + 1024, outs[c], N * sizeof(float));
        float* xbase = work.data() + 1024;
        comb_filter(xbase, xbase, st.postfilter_period_old,
                    st.postfilter_period, imin(N, 120),
                    st.postfilter_gain_old, st.postfilter_gain,
                    st.postfilter_tapset_old, st.postfilter_tapset);
        if (LM != 0)
            comb_filter(xbase + 120, xbase + 120, st.postfilter_period,
                        postfilter_pitch, N - 120, st.postfilter_gain,
                        postfilter_gain, st.postfilter_tapset,
                        postfilter_tapset);
        // history keeps UNFILTERED? no — libopus keeps the filtered
        // synthesis in decode_mem; comb reads past filtered samples
        memcpy(hist.data(), work.data() + N, 1024 * sizeof(float));
        memcpy(outs[c], xbase, N * sizeof(float));
        // deemphasis: y[n] = x[n] + 0.85*y[n-1]
        float m = st.deemph_mem[c];
        for (int j = 0; j < N; j++) {
            float tmp = outs[c][j] + m;
            m = st.preemph_coef * tmp;
            outs[c][j] = tmp;
        }
        st.deemph_mem[c] = m;
    }
    st.postfilter_period_old = st.postfilter_period;
    st.postfilter_gain_old = st.postfilter_gain;
    st.postfilter_tapset_old = st.postfilter_tapset;
    st.postfilter_period = postfilter_pitch;
    st.postfilter_gain = postfilter_gain;
    st.postfilter_tapset = postfilter_tapset;
    if (LM != 0) {
        st.postfilter_period_old = st.postfilter_period;
        st.postfilter_gain_old = st.postfilter_gain;
        st.postfilter_tapset_old = st.postfilter_tapset;
    }

    // energy history bookkeeping
    if (!isTransient) {
        memcpy(st.oldLogE2, st.oldLogE, sizeof(st.oldLogE2));
        memcpy(st.oldLogE, st.oldE, sizeof(st.oldLogE));
    } else {
        for (int c = 0; c < 2; c++)
            for (int i = 0; i < NB_BANDS; i++)
                st.oldLogE[c][i] = std::min(st.oldLogE[c][i], st.oldE[c][i]);
    }
    for (int c = 0; c < 2; c++) {
        for (int i = 0; i < start; i++) {
            st.oldE[c][i] = 0;
            st.oldLogE[c][i] = st.oldLogE2[c][i] = -28.0f;
        }
        for (int i = end; i < NB_BANDS; i++) {
            st.oldE[c][i] = 0;
            st.oldLogE[c][i] = st.oldLogE2[c][i] = -28.0f;
        }
    }
    st.rng = rc.rng;
    return N;
}

// ---------------------------------------------------------------------------
// TOC / packet parsing (RFC 6716 §3)

struct OpusConfig {
    int mode;        // 0=SILK, 1=hybrid, 2=CELT
    int bandwidth;   // 0=NB 1=MB 2=WB 3=SWB 4=FB
    int frame_ms_x4; // frame size in ms*4 (10 -> 2.5ms)
    int stereo;
    int frame_samples48;  // per frame at 48 kHz
};

OpusConfig parse_toc(uint8_t toc) {
    OpusConfig c{};
    int config = toc >> 3;
    c.stereo = (toc >> 2) & 1;
    if (config < 12) {         // SILK-only: NB/MB/WB x 10/20/40/60
        c.mode = 0;
        c.bandwidth = config / 4;        // 0,1,2
        static const int ms4[4] = {40, 80, 160, 240};
        c.frame_ms_x4 = ms4[config % 4];
    } else if (config < 16) {  // hybrid: SWB/FB x 10/20
        c.mode = 1;
        c.bandwidth = 3 + (config - 12) / 2;
        c.frame_ms_x4 = (config & 1) ? 80 : 40;
    } else {                   // CELT-only: NB/WB/SWB/FB x 2.5/5/10/20
        c.mode = 2;
        static const int bw[4] = {0, 2, 3, 4};
        c.bandwidth = bw[(config - 16) / 4];
        static const int ms4[4] = {10, 20, 40, 80};
        c.frame_ms_x4 = ms4[config % 4];
    }
    c.frame_samples48 = 48000 * c.frame_ms_x4 / 4000;
    return c;
}

// split a packet into frames (RFC 6716 §3.2); returns frame count or -1
int parse_packet(const uint8_t* data, int len, OpusConfig* cfg,
                 const uint8_t* frames[48], int sizes[48]) {
    if (len < 1) return -1;
    *cfg = parse_toc(data[0]);
    int code = data[0] & 3;
    const uint8_t* p = data + 1;
    len -= 1;
    auto read_size = [&](int& sz) -> bool {
        if (len < 1) return false;
        int b = *p++;
        len--;
        if (b < 252) { sz = b; return true; }
        if (len < 1) return false;
        sz = b + 4 * (*p++);
        len--;
        return true;
    };
    if (code == 0) {
        frames[0] = p;
        sizes[0] = len;
        return 1;
    }
    if (code == 1) {
        if (len & 1) return -1;
        frames[0] = p;
        sizes[0] = len / 2;
        frames[1] = p + len / 2;
        sizes[1] = len / 2;
        return 2;
    }
    if (code == 2) {
        int s0;
        if (!read_size(s0) || s0 > len) return -1;
        frames[0] = p;
        sizes[0] = s0;
        frames[1] = p + s0;
        sizes[1] = len - s0;
        return 2;
    }
    // code 3
    if (len < 1) return -1;
    int fc_byte = *p++;
    len--;
    int M = fc_byte & 0x3F;
    int vbr = (fc_byte >> 7) & 1;
    int pad = (fc_byte >> 6) & 1;
    if (M == 0 || M > 48) return -1;
    if (pad) {
        int padding = 0;
        int b;
        do {
            if (len < 1) return -1;
            b = *p++;
            len--;
            padding += b == 255 ? 254 : b;
        } while (b == 255);
        if (padding > len) return -1;
        len -= padding;
    }
    if (vbr) {
        int total = 0;
        for (int i = 0; i < M - 1; i++) {
            int s;
            if (!read_size(s)) return -1;
            sizes[i] = s;
            total += s;
        }
        if (total > len) return -1;
        sizes[M - 1] = len - total;
        for (int i = 0; i < M; i++) {
            frames[i] = p;
            p += sizes[i];
        }
    } else {
        if (len % M) return -1;
        for (int i = 0; i < M; i++) {
            frames[i] = p + i * (len / M);
            sizes[i] = len / M;
        }
    }
    return M;
}

// CELT start/end bands per Opus operating point
void celt_band_range(const OpusConfig& c, int* start, int* end) {
    *start = c.mode == 1 ? 17 : 0;  // hybrid starts at band 17
    *end = opustab::celt_band_end[c.bandwidth];
}

// ---------------------------------------------------------------------------
// Stream-level decoder

struct SilkState;  // defined in the SILK section
SilkState* silk_state_new(int channels);
void silk_state_free(SilkState*);
// decodes the SILK part of one Opus frame; returns samples at 48 kHz
// written per channel into out (after internal resampling), or -1
int silk_decode(SilkState& st, RangeDec& rc, const OpusConfig& cfg,
                float* out_l, float* out_r);

// ---------------------------------------------------------------------------
// SILK decoder (RFC 6716 §4.2). Float synthesis; all range-decoded
// parameter paths use the mandated fixed-point arithmetic so the
// bitstream interpretation is exact.

constexpr int SILK_HISTORY = 322;
constexpr int SILK_MAX_LAG = 288 + 2;   // max pitch lag + LTP_ORDER/2
constexpr int LTP_ORDER = 5;

struct SilkSubframe {
    float gain = 0;
    int pitchlag = 0;
    float ltptaps[LTP_ORDER] = {0};
};

struct SilkFrameState {
    int coded = 0;
    int log_gain = 0;
    int16_t nlsf[16] = {0};
    float lpc[16] = {0};
    float output[2 * SILK_HISTORY] = {0};
    float lpc_history[2 * SILK_HISTORY] = {0};
    int primarylag = 0;
    int prev_voiced = 0;
};

struct SilkState {
    int midonly = 0;
    int subframes = 0;
    int sflength = 0;
    int flength = 0;
    int nlsf_interp_factor = 4;
    int bandwidth = 2;           // 0 NB / 1 MB / 2 WB
    int wb = 0;
    SilkFrameState frame[2];
    float prev_stereo_weights[2] = {0, 0};
    float stereo_weights[2] = {0, 0};
    int prev_coded_channels = 0;
    // output resampler state (per channel): input-rate tail samples
    std::vector<float> rs_tail[2];
};

SilkState* silk_state_new(int) { return new SilkState(); }
void silk_state_free(SilkState* s) { delete s; }

void silk_flush_frame(SilkFrameState& frame) {
    if (!frame.coded) return;
    memset(frame.output, 0, sizeof(frame.output));
    memset(frame.lpc_history, 0, sizeof(frame.lpc_history));
    memset(frame.lpc, 0, sizeof(frame.lpc));
    memset(frame.nlsf, 0, sizeof(frame.nlsf));
    frame.log_gain = 0;
    frame.primarylag = 0;
    frame.prev_voiced = 0;
    frame.coded = 0;
}

inline int64_t round_mull(int64_t a, int64_t b, int s) {
    return ((a * b >> (s - 1)) + 1) >> 1;
}
inline int sat16(int v) { return v < -32768 ? -32768 : v > 32767 ? 32767 : v; }
inline float clipf(float v, float lo, float hi) {
    return v < lo ? lo : v > hi ? hi : v;
}

void silk_lsp2poly(const int32_t* lsp, int32_t* pol, int half_order) {
    pol[0] = 65536;
    pol[1] = -lsp[0];
    for (int i = 1; i < half_order; i++) {
        pol[i + 1] = (int32_t)(pol[i - 1] * 2 -
                               round_mull(lsp[2 * i], pol[i], 16));
        for (int j = i; j > 1; j--)
            pol[j] += pol[j - 2] -
                      (int32_t)round_mull(lsp[2 * i], pol[j - 1], 16);
        pol[1] -= lsp[2 * i];
    }
}

int silk_is_lpc_stable(const int16_t* lpc, int order) {
    int32_t lpc32[2][16];
    int64_t totalinvgain = 1 << 30;
    int32_t* row = lpc32[0];
    int dc_resp = 0;
    for (int k = 0; k < order; k++) {
        dc_resp += lpc[k];
        row[k] = lpc[k] * 4096;
    }
    if (dc_resp >= 4096) return 0;
    for (int k = order - 1;; k--) {
        if (std::abs(row[k]) > 16773022) return 0;
        int64_t rc = -((int64_t)row[k] * 128);
        int64_t gaindiv = (1 << 30) - ((rc * rc) >> 32);
        totalinvgain = ((totalinvgain * gaindiv) >> 32) << 2;
        if (k == 0) return totalinvgain >= 107374;
        // approximate 1.0/gaindiv
        int fbits = RangeDec::ilog((uint32_t)gaindiv);
        int64_t gain = ((1 << 29) - 1) / (gaindiv >> (fbits + 1 - 16));
        int64_t error =
            (1 << 29) - (((gaindiv << (15 + 16 - fbits)) * gain) >> 16);
        gain = ((gain << 16) + ((error * gain) >> 13)) >> 16;
        int32_t* temp = lpc32[k & 1];
        for (int j = 0; j < k; j++) {
            int64_t x = row[j] - round_mull(row[k - j - 1], rc, 31);
            temp[j] = (int32_t)round_mull(x, gain, fbits - 16);
        }
        row = temp;
    }
}

void silk_lsf2lpc(const int16_t* nlsf, float* lpc_out, int order, int wb) {
    int32_t lsf[16], p[9], q[9], lpc32[16];
    int16_t lpc[16];
    for (int k = 0; k < order; k++) {
        int index = nlsf[k] >> 8;
        int offset = nlsf[k] & 255;
        int k2 = (order == 10) ? opustab::silk_lsf_ordering_nbmb[k]
                               : opustab::silk_lsf_ordering_wb[k];
        int32_t v = opustab::silk_cosine[index] * 256;
        v += (opustab::silk_cosine[index + 1] - opustab::silk_cosine[index]) *
             offset;
        lsf[k2] = (v + 4) >> 3;
    }
    silk_lsp2poly(lsf, p, order >> 1);
    silk_lsp2poly(lsf + 1, q, order >> 1);
    for (int k = 0; k < order >> 1; k++) {
        int32_t p_tmp = p[k + 1] + p[k];
        int32_t q_tmp = q[k + 1] - q[k];
        lpc32[k] = -q_tmp - p_tmp;
        lpc32[order - k - 1] = q_tmp - p_tmp;
    }
    int i;
    for (i = 0; i < 10; i++) {
        uint32_t maxabs = 0;
        int kmax = 0;
        for (int j = 0; j < order; j++) {
            uint32_t x = std::abs(lpc32[j]);
            if (x > maxabs) {
                maxabs = x;
                kmax = j;
            }
        }
        maxabs = (maxabs + 16) >> 5;
        if (maxabs > 32767) {
            maxabs = maxabs < 163838 ? maxabs : 163838;
            uint32_t chirp_base =
                65470 - (((uint64_t)(maxabs - 32767) << 14) /
                         ((maxabs * (kmax + 1)) >> 2));
            uint32_t chirp = chirp_base;
            for (int k = 0; k < order; k++) {
                lpc32[k] = (int32_t)round_mull(lpc32[k], chirp, 16);
                chirp = (chirp_base * chirp + 32768) >> 16;
            }
        } else {
            break;
        }
    }
    if (i == 10) {
        for (int k = 0; k < order; k++) {
            int x = (lpc32[k] + 16) >> 5;
            lpc[k] = sat16(x);
            lpc32[k] = lpc[k] * 32;
        }
    } else {
        for (int k = 0; k < order; k++) lpc[k] = (lpc32[k] + 16) >> 5;
    }
    for (i = 1; i <= 16 && !silk_is_lpc_stable(lpc, order); i++) {
        uint32_t chirp_base = 65536 - (1 << i);
        uint32_t chirp = chirp_base;
        for (int k = 0; k < order; k++) {
            lpc32[k] = (int32_t)round_mull(lpc32[k], chirp, 16);
            lpc[k] = (lpc32[k] + 16) >> 5;
            chirp = (chirp_base * chirp + 32768) >> 16;
        }
    }
    for (int k = 0; k < order; k++) lpc_out[k] = lpc[k] / 4096.0f;
}

void silk_stabilize_lsf(int16_t* nlsf, int order, const uint16_t* min_delta) {
    for (int pass = 0; pass < 20; pass++) {
        int k = 0, min_diff = 0;
        for (int i = 0; i < order + 1; i++) {
            int low = i != 0 ? nlsf[i - 1] : 0;
            int high = i != order ? nlsf[i] : 32768;
            int diff = (high - low) - min_delta[i];
            if (diff < min_diff) {
                min_diff = diff;
                k = i;
            }
        }
        if (min_diff == 0) return;
        if (k == 0) {
            nlsf[0] = min_delta[0];
        } else if (k == order) {
            nlsf[order - 1] = 32768 - min_delta[order];
        } else {
            int min_center = 0, max_center = 32768;
            for (int i = 0; i < k; i++) min_center += min_delta[i];
            min_center += min_delta[k] >> 1;
            for (int i = order; i > k; i--) max_center -= min_delta[i];
            max_center -= min_delta[k] >> 1;
            int center_val = nlsf[k - 1] + nlsf[k];
            center_val = (center_val >> 1) + (center_val & 1);
            center_val = imin(imax(center_val, min_center), max_center);
            nlsf[k - 1] = center_val - (min_delta[k] >> 1);
            nlsf[k] = nlsf[k - 1] + min_delta[k];
        }
    }
    // fallback: sort + push apart
    for (int i = 1; i < order; i++) {
        int value = nlsf[i], j;
        for (j = i - 1; j >= 0 && nlsf[j] > value; j--) nlsf[j + 1] = nlsf[j];
        nlsf[j + 1] = (int16_t)value;
    }
    if (nlsf[0] < min_delta[0]) nlsf[0] = min_delta[0];
    for (int i = 1; i < order; i++)
        nlsf[i] = imax(nlsf[i], imin(nlsf[i - 1] + min_delta[i], 32767));
    if (nlsf[order - 1] > 32768 - min_delta[order])
        nlsf[order - 1] = 32768 - min_delta[order];
    for (int i = order - 2; i >= 0; i--)
        if (nlsf[i] > nlsf[i + 1] - min_delta[i + 1])
            nlsf[i] = nlsf[i + 1] - min_delta[i + 1];
}

void silk_count_children(RangeDec& rc, int model, int32_t total,
                         int32_t child[2]) {
    if (total != 0) {
        child[0] = rc.dec_cdf(opustab::silk_model_pulse_location[model] +
                              (((total - 1 + 5) * (total - 1)) >> 1));
        child[1] = total - child[0];
    } else {
        child[0] = 0;
        child[1] = 0;
    }
}

void silk_decode_excitation(SilkState& s, RangeDec& rc, float* excitationf,
                            int qoffset_high, int active, int voiced) {
    uint32_t seed = rc.dec_cdf(opustab::silk_model_lcg_seed);
    int shellblocks = opustab::silk_shell_blocks[s.bandwidth][s.subframes >> 2];
    int ratelevel = rc.dec_cdf(opustab::silk_model_exc_rate[voiced]);
    uint8_t pulsecount[20], lsbcount[20] = {0};
    int32_t excitation[320];

    for (int i = 0; i < shellblocks; i++) {
        pulsecount[i] = rc.dec_cdf(opustab::silk_model_pulse_count[ratelevel]);
        if (pulsecount[i] == 17) {
            while (pulsecount[i] == 17 && ++lsbcount[i] != 10)
                pulsecount[i] = rc.dec_cdf(opustab::silk_model_pulse_count[9]);
            if (lsbcount[i] == 10)
                pulsecount[i] =
                    rc.dec_cdf(opustab::silk_model_pulse_count[10]);
        }
    }
    for (int i = 0; i < shellblocks; i++) {
        if (pulsecount[i] != 0) {
            int32_t* location = excitation + 16 * i;
            int32_t branch1[2], branch2[2], branch3[2];
            silk_count_children(rc, 0, pulsecount[i], branch1);
            for (int b = 0; b < 2; b++) {
                silk_count_children(rc, 1, branch1[b], branch2);
                for (int c = 0; c < 2; c++) {
                    silk_count_children(rc, 2, branch2[c], branch3);
                    for (int d = 0; d < 2; d++) {
                        silk_count_children(rc, 3, branch3[d], location);
                        location += 2;
                    }
                }
            }
        } else {
            memset(excitation + 16 * i, 0, 16 * sizeof(int32_t));
        }
    }
    for (int i = 0; i < shellblocks << 4; i++) {
        for (int bit = 0; bit < lsbcount[i >> 4]; bit++)
            excitation[i] =
                (excitation[i] << 1) |
                rc.dec_cdf(opustab::silk_model_excitation_lsb);
    }
    for (int i = 0; i < shellblocks << 4; i++) {
        if (excitation[i] != 0) {
            int sign = rc.dec_cdf(
                opustab::silk_model_excitation_sign[active + voiced]
                                                   [qoffset_high]
                                                   [imin(pulsecount[i >> 4],
                                                         6)]);
            if (sign == 0) excitation[i] *= -1;
        }
    }
    // RFC 4.2.7.8.6: e_Q23 = (e<<8) - sign(e)*20 + offset_Q23, then
    // pseudorandom sign inversion (offset row 0 = inactive/unvoiced,
    // row 1 = voiced; column = quantization offset type)
    int offset = opustab::silk_quant_offset[voiced][qoffset_high];
    for (int i = 0; i < shellblocks << 4; i++) {
        int value = excitation[i];
        excitation[i] = value * 256 + offset;
        if (value < 0) excitation[i] += 20;
        else if (value > 0) excitation[i] -= 20;
        seed = 196314165u * seed + 907633515u;
        if (seed & 0x80000000u) excitation[i] *= -1;
        seed += value;
        excitationf[i] = excitation[i] / 8388608.0f;
    }
}

void silk_decode_frame(SilkState& s, RangeDec& rc, int frame_num, int channel,
                       int coded_channels, int active, int active1) {
    SilkFrameState& frame = s.frame[channel];
    int order = s.wb ? 16 : 10;
    SilkSubframe sf[4];

    // stereo weights (mid channel of a stereo stream)
    if (coded_channels == 2 && channel == 0) {
        int n = rc.dec_cdf(opustab::silk_model_stereo_s1);
        int wi[2], ws[2], w[2];
        wi[0] = rc.dec_cdf(opustab::silk_model_stereo_s2) + 3 * (n / 5);
        ws[0] = rc.dec_cdf(opustab::silk_model_stereo_s3);
        wi[1] = rc.dec_cdf(opustab::silk_model_stereo_s2) + 3 * (n % 5);
        ws[1] = rc.dec_cdf(opustab::silk_model_stereo_s3);
        for (int i = 0; i < 2; i++)
            w[i] = opustab::silk_stereo_weights[wi[i]] +
                   (((opustab::silk_stereo_weights[wi[i] + 1] -
                      opustab::silk_stereo_weights[wi[i]]) *
                     6554) >>
                    16) *
                       (ws[i] * 2 + 1);
        s.stereo_weights[0] = (w[0] - w[1]) / 8192.0f;
        s.stereo_weights[1] = w[1] / 8192.0f;
        s.midonly =
            active1 ? 0 : rc.dec_cdf(opustab::silk_model_mid_only);
    }

    // frame type
    int qoffset_high, voiced;
    if (!active) {
        qoffset_high = rc.dec_cdf(opustab::silk_model_frame_type_inactive);
        voiced = 0;
    } else {
        int type = rc.dec_cdf(opustab::silk_model_frame_type_active);
        qoffset_high = type & 1;
        voiced = type >> 1;
    }

    // subframe gains
    for (int i = 0; i < s.subframes; i++) {
        int log_gain;
        if (i == 0 && (frame_num == 0 || !frame.coded)) {
            int x = rc.dec_cdf(
                opustab::silk_model_gain_highbits[active + voiced]);
            log_gain = (x << 3) | rc.dec_cdf(opustab::silk_model_gain_lowbits);
            if (frame.coded) log_gain = imax(log_gain, frame.log_gain - 16);
        } else {
            int delta_gain = rc.dec_cdf(opustab::silk_model_gain_delta);
            log_gain = imin(
                imax(imax(2 * delta_gain - 16,
                          frame.log_gain + delta_gain - 4),
                     0),
                63);
        }
        frame.log_gain = log_gain;
        // dequant via the mandated silk_log2lin integer approximation
        // of 2^(x/128) (Q16 gain)
        int lg = ((log_gain * 0x1D1C71) >> 16) + 2090;
        int gi = lg >> 7, gf = lg & 127;
        int64_t glin = 1LL << gi;
        glin += (glin >> 7) * (gf + (((174 * gf - 22272) * gf) >> 16));
        sf[i].gain = (float)glin * 1.52587890625e-05f;  // 2^-16
        if (getenv("OPUS_DEBUG"))
            fprintf(stderr, "sf%d log_gain=%d gain=%g voiced=%d active=%d\n",
                    i, log_gain, sf[i].gain, voiced, active);
    }

    // LSFs
    int16_t nlsf[16], nlsf_leadin[16];
    int lsf_i1 =
        rc.dec_cdf(opustab::silk_model_lsf_s1[s.wb][voiced]);
    int lsf_i2[16];
    const uint8_t* cb_sel = s.wb ? opustab::silk_lsf_s2_model_sel_wb[lsf_i1]
                                 : opustab::silk_lsf_s2_model_sel_nbmb[lsf_i1];
    for (int i = 0; i < order; i++) {
        int index = rc.dec_cdf(opustab::silk_model_lsf_s2[cb_sel[i]]) - 4;
        if (index == -4)
            index -= rc.dec_cdf(opustab::silk_model_lsf_s2_ext);
        else if (index == 4)
            index += rc.dec_cdf(opustab::silk_model_lsf_s2_ext);
        lsf_i2[i] = index;
    }
    // backwards prediction (RFC 4.2.7.5.2): res[k] = dequant(i2[k]) +
    // (res[k+1] * pred_weight[k]) >> 8, k descending
    int lsf_res[16];
    for (int i = order - 1; i >= 0; i--) {
        int qstep = s.wb ? 9830 : 11796;
        lsf_res[i] = lsf_i2[i] * 1024;
        if (lsf_i2[i] < 0) lsf_res[i] += 102;
        else if (lsf_i2[i] > 0) lsf_res[i] -= 102;
        lsf_res[i] = (lsf_res[i] * qstep) >> 16;
        if (i + 1 < order) {
            int wsel = s.wb ? opustab::silk_lsf_weight_sel_wb[lsf_i1][i]
                            : opustab::silk_lsf_weight_sel_nbmb[lsf_i1][i];
            int weight = s.wb ? opustab::silk_lsf_pred_weights_wb[wsel][i]
                              : opustab::silk_lsf_pred_weights_nbmb[wsel][i];
            lsf_res[i] += (lsf_res[i + 1] * weight) >> 8;
        }
    }
    const uint8_t* codebook = s.wb ? opustab::silk_lsf_codebook_wb[lsf_i1]
                                   : opustab::silk_lsf_codebook_nbmb[lsf_i1];
    for (int i = 0; i < order; i++) {
        int cur = codebook[i];
        int prev = i ? codebook[i - 1] : 0;
        int next = i + 1 < order ? codebook[i + 1] : 256;
        int weight_sq = (1024 / (cur - prev) + 1024 / (next - cur)) << 16;
        int ipart = RangeDec::ilog(weight_sq);
        int fpart = (weight_sq >> (ipart - 8)) & 127;
        int y = ((ipart & 1) ? 32768 : 46214) >> ((32 - ipart) >> 1);
        int weight = y + ((213 * fpart * y) >> 16);
        int value = cur * 128 + (lsf_res[i] * 16384) / weight;
        nlsf[i] = (int16_t)imin(imax(value, 0), 32767);
    }
    if (getenv("OPUS_DEBUG")) {
        fprintf(stderr, "raw_nlsf:");
        for (int i = 0; i < order; i++) fprintf(stderr, " %d", nlsf[i]);
        fprintf(stderr, "\nlsf_i1=%d lsf_res:", lsf_i1);
        for (int i = 0; i < order; i++) fprintf(stderr, " %d", lsf_res[i]);
        fprintf(stderr, "\n");
    }
    silk_stabilize_lsf(nlsf, order,
                       s.wb ? opustab::silk_lsf_min_spacing_wb
                            : opustab::silk_lsf_min_spacing_nbmb);
    float lpc[16], lpc_leadin[16];
    silk_lsf2lpc(nlsf, lpc, order, s.wb);
    if (getenv("OPUS_DEBUG")) {
        fprintf(stderr, "nlsf:");
        for (int i = 0; i < order; i++) fprintf(stderr, " %d", nlsf[i]);
        fprintf(stderr, "\nlpc:");
        for (int i = 0; i < order; i++) fprintf(stderr, " %g", lpc[i]);
        fprintf(stderr, "\n");
    }

    int has_lpc_leadin = 0;
    if (s.subframes == 4) {
        int offset =
            rc.dec_cdf(opustab::silk_model_lsf_interpolation_offset);
        if (getenv("OPUS_DEBUG"))
            fprintf(stderr, "interp offset=%d coded=%d\n", offset,
                    frame.coded);
        if (offset != 4 && frame.coded) {
            s.nlsf_interp_factor = offset;
            for (int i = 0; i < order; i++)
                nlsf_leadin[i] =
                    frame.nlsf[i] +
                    (int16_t)(((nlsf[i] - frame.nlsf[i]) * offset) >> 2);
            silk_lsf2lpc(nlsf_leadin, lpc_leadin, order, s.wb);
            has_lpc_leadin = 1;
        } else {
            s.nlsf_interp_factor = 4;
        }
    } else {
        s.nlsf_interp_factor = 4;
    }
    memcpy(frame.nlsf, nlsf, order * sizeof(int16_t));

    // pitch lags + LTP filter (voiced)
    float ltpscale = 15565.0f / 16384.0f;
    if (voiced) {
        int lag_absolute = (!frame_num || !frame.prev_voiced);
        int primarylag = frame.primarylag;
        if (!lag_absolute) {
            int delta = rc.dec_cdf(opustab::silk_model_pitch_delta);
            if (delta)
                primarylag = frame.primarylag + delta - 9;
            else
                lag_absolute = 1;
        }
        if (lag_absolute) {
            const uint16_t* lowbits_model[3] = {
                opustab::silk_model_pitch_lowbits_nb,
                opustab::silk_model_pitch_lowbits_mb,
                opustab::silk_model_pitch_lowbits_wb};
            int highbits = rc.dec_cdf(opustab::silk_model_pitch_highbits);
            int lowbits = rc.dec_cdf(lowbits_model[s.bandwidth]);
            primarylag = opustab::silk_pitch_min_lag[s.bandwidth] +
                         highbits * opustab::silk_pitch_scale[s.bandwidth] +
                         lowbits;
        }
        frame.primarylag = primarylag;

        const int8_t* offsets;
        if (s.subframes == 2) {
            offsets =
                s.bandwidth == 0
                    ? opustab::silk_pitch_offset_nb10ms[rc.dec_cdf(
                          opustab::silk_model_pitch_contour_nb10ms)]
                    : opustab::silk_pitch_offset_mbwb10ms[rc.dec_cdf(
                          opustab::silk_model_pitch_contour_mbwb10ms)];
        } else {
            offsets =
                s.bandwidth == 0
                    ? opustab::silk_pitch_offset_nb20ms[rc.dec_cdf(
                          opustab::silk_model_pitch_contour_nb20ms)]
                    : opustab::silk_pitch_offset_mbwb20ms[rc.dec_cdf(
                          opustab::silk_model_pitch_contour_mbwb20ms)];
        }
        for (int i = 0; i < s.subframes; i++)
            sf[i].pitchlag =
                imin(imax(primarylag + offsets[i],
                          (int)opustab::silk_pitch_min_lag[s.bandwidth]),
                     (int)opustab::silk_pitch_max_lag[s.bandwidth]);

        if (getenv("OPUS_DEBUG"))
            fprintf(stderr, "voiced frame: primarylag=%d lags=%d,%d,%d,%d\n",
                    primarylag, sf[0].pitchlag, sf[1].pitchlag,
                    sf[2].pitchlag, sf[3].pitchlag);
        int ltpfilter = rc.dec_cdf(opustab::silk_model_ltp_filter);
        const uint16_t* filter_sel[3] = {
            opustab::silk_model_ltp_filter0_sel,
            opustab::silk_model_ltp_filter1_sel,
            opustab::silk_model_ltp_filter2_sel};
        for (int i = 0; i < s.subframes; i++) {
            int index = rc.dec_cdf(filter_sel[ltpfilter]);
            const int8_t* taps =
                ltpfilter == 0 ? opustab::silk_ltp_filter0_taps[index]
                : ltpfilter == 1 ? opustab::silk_ltp_filter1_taps[index]
                                 : opustab::silk_ltp_filter2_taps[index];
            for (int j = 0; j < LTP_ORDER; j++)
                sf[i].ltptaps[j] = taps[j] / 128.0f;
        }
    }
    if (voiced && frame_num == 0)
        ltpscale = opustab::silk_ltp_scale_factor[rc.dec_cdf(
                       opustab::silk_model_ltp_scale_index)] /
                   16384.0f;

    // excitation
    float residual[SILK_MAX_LAG + 320];
    silk_decode_excitation(s, rc, residual + SILK_MAX_LAG, qoffset_high,
                           active, voiced);

    // synthesis
    for (int i = 0; i < s.subframes; i++) {
        const float* lpc_coeff = (i < 2 && has_lpc_leadin) ? lpc_leadin : lpc;
        float* dst = frame.output + SILK_HISTORY + i * s.sflength;
        float* resptr = residual + SILK_MAX_LAG + i * s.sflength;
        float* lpc_hist = frame.lpc_history + SILK_HISTORY + i * s.sflength;
        if (voiced) {
            int out_end;
            float rescale;
            if (i < 2 || s.nlsf_interp_factor == 4) {
                out_end = -i * s.sflength;
                rescale = ltpscale;
            } else {
                out_end = -(i - 2) * s.sflength;
                rescale = 1.0f;
            }
            for (int j = -sf[i].pitchlag - LTP_ORDER / 2; j < out_end; j++) {
                float sum = dst[j];
                for (int k = 0; k < order; k++)
                    sum -= lpc_coeff[k] * dst[j - k - 1];
                resptr[j] = clipf(sum, -1.0f, 1.0f) * rescale / sf[i].gain;
            }
            if (out_end) {
                float rescale2 = sf[i - 1].gain / sf[i].gain;
                for (int j = out_end; j < 0; j++) resptr[j] *= rescale2;
            }
            for (int j = 0; j < s.sflength; j++) {
                float sum = resptr[j];
                for (int k = 0; k < LTP_ORDER; k++)
                    sum += sf[i].ltptaps[k] *
                           resptr[j - sf[i].pitchlag + LTP_ORDER / 2 - k];
                resptr[j] = sum;
            }
        }
        if (getenv("OPUS_DEBUG2") && i == 3)
            for (int j = 0; j < 8; j++)
                fprintf(stderr, "sub3 res[%d]=%g\n", j, resptr[j]);
        // LPC synthesis
        for (int j = 0; j < s.sflength; j++) {
            float sum = resptr[j] * sf[i].gain;
            for (int k = 1; k <= order; k++)
                sum += lpc_coeff[k - 1] * lpc_hist[j - k];
            lpc_hist[j] = sum;
            dst[j] = clipf(sum, -1.0f, 1.0f);
        }
        if (getenv("OPUS_DEBUG") && i == 0)
            fprintf(stderr, "res[0..3]=%g %g %g %g out[0..3]=%g %g %g %g\n",
                    resptr[0], resptr[1], resptr[2], resptr[3],
                    dst[0], dst[1], dst[2], dst[3]);
    }

    frame.prev_voiced = voiced;
    memmove(frame.lpc_history, frame.lpc_history + s.flength,
            SILK_HISTORY * sizeof(float));
    memmove(frame.output, frame.output + s.flength,
            SILK_HISTORY * sizeof(float));
    frame.coded = 1;
}

void silk_unmix_ms(SilkState& s, float* l, float* r) {
    // note: called AFTER the per-frame history shift, so the just-
    // decoded frame sits at [SILK_HISTORY - flength, SILK_HISTORY)
    float* mid = s.frame[0].output + SILK_HISTORY - s.flength;
    float* side = s.frame[1].output + SILK_HISTORY - s.flength;
    float w0_prev = s.prev_stereo_weights[0];
    float w1_prev = s.prev_stereo_weights[1];
    float w0 = s.stereo_weights[0];
    float w1 = s.stereo_weights[1];
    int n1 = opustab::silk_stereo_interp_len[s.bandwidth];
    int i;
    for (i = 0; i < n1; i++) {
        float interp0 = w0_prev + i * (w0 - w0_prev) / n1;
        float interp1 = w1_prev + i * (w1 - w1_prev) / n1;
        float p0 = 0.25f * (mid[i - 2] + 2 * mid[i - 1] + mid[i]);
        l[i] = clipf((1 + interp1) * mid[i - 1] + side[i - 1] + interp0 * p0,
                     -1.0f, 1.0f);
        r[i] = clipf((1 - interp1) * mid[i - 1] - side[i - 1] - interp0 * p0,
                     -1.0f, 1.0f);
    }
    for (; i < s.flength; i++) {
        float p0 = 0.25f * (mid[i - 2] + 2 * mid[i - 1] + mid[i]);
        l[i] = clipf((1 + w1) * mid[i - 1] + side[i - 1] + w0 * p0, -1.0f,
                     1.0f);
        r[i] = clipf((1 - w1) * mid[i - 1] - side[i - 1] - w0 * p0, -1.0f,
                     1.0f);
    }
    memcpy(s.prev_stereo_weights, s.stereo_weights,
           sizeof(s.stereo_weights));
}

// windowed-sinc polyphase upsampler (8/12/16 kHz -> 48 kHz)
struct SincBank {
    int L;                       // upsample factor
    int taps;                    // per input sample
    std::vector<float> h;        // [L][taps]
};

const SincBank& sinc_bank(int L) {
    static SincBank banks[7];
    SincBank& b = banks[L];
    if (b.h.empty()) {
        b.L = L;
        b.taps = 33;                 // odd -> integer group delay
        b.h.resize(L * b.taps);
        double cutoff = 0.96 / 2.0;  // of the input rate
        double beta = 9.0;
        auto bessel_i0 = [](double x) {
            double s = 1, t = 1;
            for (int k = 1; k < 32; k++) {
                t *= (x / (2 * k)) * (x / (2 * k));
                s += t;
            }
            return s;
        };
        double i0b = bessel_i0(beta);
        int center = (b.taps - 1) * L / 2;  // in output-sample units
        for (int p = 0; p < L; p++) {
            for (int t = 0; t < b.taps; t++) {
                // output position of this tap relative to the filter center
                double m = (t * L + p) - center;
                double tt = m / L;  // in input samples
                double sinc = tt == 0
                                  ? 2 * cutoff
                                  : std::sin(2 * M_PI * cutoff * tt) /
                                        (M_PI * tt);
                double u = m / center;
                double win =
                    std::abs(u) <= 1
                        ? bessel_i0(beta * std::sqrt(1 - u * u)) / i0b
                        : 0.0;
                b.h[p * b.taps + t] = (float)(sinc * win);
            }
        }
    }
    return b;
}

// upsample `n` input samples to n*L output; tail keeps (taps-1) inputs
void sinc_resample(std::vector<float>& tail, const float* in, int n, int L,
                   float* out) {
    const SincBank& b = sinc_bank(L);
    int T = b.taps;
    std::vector<float> buf(tail.size() + n);
    memcpy(buf.data(), tail.data(), tail.size() * sizeof(float));
    memcpy(buf.data() + tail.size(), in, n * sizeof(float));
    // output sample (i, phase p) uses inputs buf[i .. i+T)
    for (int i = 0; i < n; i++) {
        for (int p = 0; p < L; p++) {
            const float* hh = &b.h[p * T];
            const float* x = buf.data() + i;
            float acc = 0;
            for (int t = 0; t < T; t++) acc += hh[T - 1 - t] * x[t];
            out[i * L + p] = acc;
        }
    }
    // keep last T-1 inputs (plus alignment) for next call
    tail.assign(buf.end() - (T - 1), buf.end());
}

// decode the SILK part of one Opus frame; writes 48 kHz samples
int silk_decode(SilkState& s, RangeDec& rc, const OpusConfig& cfg,
                float* out_l, float* out_r) {
    int coded_channels = cfg.stereo ? 2 : 1;
    int duration_ms = cfg.frame_ms_x4 / 4;
    // hybrid mode: SILK runs wideband
    int bandwidth = cfg.mode == 1 ? 2 : imin(cfg.bandwidth, 2);
    int nb_frames = 1 + (duration_ms > 20) + (duration_ms > 40);
    s.subframes = duration_ms / nb_frames / 5;
    s.bandwidth = bandwidth;
    s.wb = bandwidth == 2;
    s.sflength = 20 * (bandwidth + 2);
    s.flength = s.sflength * s.subframes;

    if (coded_channels > s.prev_coded_channels) silk_flush_frame(s.frame[1]);
    s.prev_coded_channels = coded_channels;

    int active[2][3] = {{0}}, redundancy[2] = {0, 0};
    for (int i = 0; i < coded_channels; i++) {
        for (int j = 0; j < nb_frames; j++)
            active[i][j] = rc.dec_bit_logp(1);
        redundancy[i] = rc.dec_bit_logp(1);
    }
    for (int i = 0; i < coded_channels; i++) {
        if (redundancy[i] && duration_ms > 20) {
            redundancy[i] =
                rc.dec_cdf(duration_ms == 40
                               ? opustab::silk_model_lbrr_flags_40
                               : opustab::silk_model_lbrr_flags_60) +
                1;
        }
    }
    // LBRR frames (decoded to keep the bitstream in sync)
    for (int i = 0; i < nb_frames; i++) {
        for (int j = 0; j < coded_channels; j++)
            if (redundancy[j] & (1 << i)) {
                int active1 =
                    (j == 0 && !(redundancy[1] & (1 << i))) ? 0 : 1;
                silk_decode_frame(s, rc, i, j, coded_channels, 1, active1);
            }
    }
    // regular frames
    int L = 48000 / (8000 * (bandwidth + 1 + (bandwidth == 2)));
    // rates: NB 8k (L=6), MB 12k (L=4), WB 16k (L=3)
    static const int LF[3] = {6, 4, 3};
    L = LF[bandwidth];
    int out48_per_frame = s.flength * L;
    if (s.rs_tail[0].empty()) {
        s.rs_tail[0].assign(sinc_bank(L).taps - 1, 0.0f);
        s.rs_tail[1].assign(sinc_bank(L).taps - 1, 0.0f);
    }
    std::vector<float> lbuf(s.flength), rbuf(s.flength);
    int total48 = 0;
    for (int i = 0; i < nb_frames; i++) {
        for (int j = 0; j < coded_channels; j++) {
            if (!(j == 1 && s.midonly))
                silk_decode_frame(s, rc, i, j, coded_channels, active[j][i],
                                  j == 0 ? (coded_channels == 2
                                                ? active[1][i]
                                                : 1)
                                         : 1);
        }
        if (coded_channels == 2) {
            if (s.midonly) silk_flush_frame(s.frame[1]);
            silk_unmix_ms(s, lbuf.data(), rbuf.data());
        } else {
            float* mid = s.frame[0].output + SILK_HISTORY - s.flength;
            memcpy(lbuf.data(), mid, s.flength * sizeof(float));
        }
        g_dump_silk.insert(g_dump_silk.end(), lbuf.begin(), lbuf.end());
        sinc_resample(s.rs_tail[0], lbuf.data(), s.flength, L,
                      out_l + total48);
        if (out_r)
            sinc_resample(s.rs_tail[1],
                          coded_channels == 2 ? rbuf.data() : lbuf.data(),
                          s.flength, L, out_r + total48);
        total48 += out48_per_frame;
    }
    return total48;
}

struct OpusStream {
    int channels = 1;
    CeltState celt;
    SilkState* silk = nullptr;
    int prev_mode = -1;
    bool celt_inited = false;
    // hybrid alignment: the SILK 48k path carries the resampler's group
    // delay; the CELT path is delayed to match (samples at 48 kHz)
    int celt_delay = 0;
    std::vector<float> celt_dline[2];

    explicit OpusStream(int ch) : channels(ch) {
        celt.reset(ch);
        // measured against the system decoder: its SILK 48 kHz path
        // trails CELT by 39 samples; ours trails by 48 (taps=33, L=3
        // polyphase), so delaying CELT 9 samples aligns the hybrid sum
        const char* d = getenv("OPUS_HYBRID_CELT_DELAY");
        celt_delay = d ? atoi(d) : 9;
    }
    ~OpusStream() { silk_state_free(silk); }

    // decode one packet; pcm is interleaved float48k [-1,1]; returns
    // samples per channel or -1
    int decode_packet(const uint8_t* data, int len, float* pcm,
                      int max_samp);
};

int OpusStream::decode_packet(const uint8_t* data, int len, float* pcm,
                              int max_samp) {
    if (len <= 0) return 0;  // DTX: no output here (caller emits silence)
    OpusConfig cfg;
    const uint8_t* frames[48];
    int sizes[48];
    int nframes = parse_packet(data, len, &cfg, frames, sizes);
    if (nframes < 0) return -1;
    int total = 0;
    for (int f = 0; f < nframes; f++) {
        int fs48 = cfg.frame_samples48;
        if (total + fs48 > max_samp) return -1;
        std::vector<float> cl(fs48, 0.0f), cr(fs48, 0.0f);
        RangeDec rc;
        rc.init(frames[f], sizes[f]);
        if (cfg.mode == 0 || cfg.mode == 1) {
            if (!silk)
                silk = silk_state_new(channels);
            int n = silk_decode(*silk, rc, cfg, cl.data(),
                                cfg.stereo ? cr.data() : nullptr);
            if (n < 0) return -1;
            if (!cfg.stereo) memcpy(cr.data(), cl.data(),
                                    fs48 * sizeof(float));
            // mode-transition redundancy block (RFC 6716 §3.4 / §4.4):
            // consume the signaling and shrink the raw-bit region; the
            // redundant CELT frame itself is for PLC and is skipped
            uint32_t bits8 = (uint32_t)sizes[f] * 8;
            int redundancy = 0;
            uint32_t red_size = 0;
            if (cfg.mode == 1 && rc.tell() + 37 <= bits8)
                redundancy = rc.dec_bit_logp(12);
            else if (cfg.mode == 0 && rc.tell() + 17 <= bits8)
                redundancy = 1;
            if (redundancy) {
                rc.dec_bit_logp(1);  // celt_to_silk position flag
                if (cfg.mode == 1) {
                    red_size = rc.dec_uint(256) + 2;
                    if (red_size <= rc.storage) rc.storage -= red_size;
                }
            }
        }
        if (cfg.mode == 1 || cfg.mode == 2) {
            // CELT part: LM from frame size (2.5/5/10/20ms only)
            int LM = 0;
            while ((120 << LM) != fs48 && LM < 4) LM++;
            if (LM >= 4) return -1;  // 40/60ms frames are SILK-only
            int start, end;
            celt_band_range(cfg, &start, &end);
            std::vector<float> el(fs48), er(fs48);
            int ch = cfg.stereo ? 2 : 1;
            if (celt.channels != ch || !celt_inited) {
                celt.reset(ch);
                celt_inited = true;
            }
            int n = celt_frame_decode(celt, rc, LM, start, end, el.data(),
                                      cfg.stereo ? er.data() : nullptr);
            if (n < 0) return -1;
            if (!cfg.stereo) memcpy(er.data(), el.data(),
                                    fs48 * sizeof(float));
            // the reference's MONO SILK output carries 2 extra samples
            // of delay (at the SILK rate) that its stereo unmix path
            // does not; match by delaying CELT 6 more in stereo
            int cd = celt_delay + (cfg.stereo ? 6 : 0);
            if (cfg.mode == 1 && cd > 0) {
                // run the CELT samples through the alignment delay line
                for (int c = 0; c < 2; c++) {
                    if ((int)celt_dline[c].size() != cd)
                        celt_dline[c].assign(cd, 0.0f);
                    float* buf_ = c == 0 ? el.data() : er.data();
                    std::vector<float> tmp(cd);
                    memcpy(tmp.data(), buf_ + fs48 - cd,
                           cd * sizeof(float));
                    memmove(buf_ + cd, buf_,
                            (fs48 - cd) * sizeof(float));
                    memcpy(buf_, celt_dline[c].data(),
                           cd * sizeof(float));
                    celt_dline[c] = tmp;
                }
            }
            for (int j = 0; j < fs48; j++) {
                cl[j] += el[j] * (1.0f / 32768);
                cr[j] += er[j] * (1.0f / 32768);
            }
        }
        // interleave out
        if (channels == 2) {
            for (int j = 0; j < fs48; j++) {
                pcm[2 * (total + j)] = cl[j];
                pcm[2 * (total + j) + 1] = cr[j];
            }
        } else {
            // downmix if the stream header says mono but packet stereo
            if (cfg.stereo)
                for (int j = 0; j < fs48; j++)
                    pcm[total + j] = 0.5f * (cl[j] + cr[j]);
            else
                for (int j = 0; j < fs48; j++) pcm[total + j] = cl[j];
        }
        total += fs48;
        prev_mode = cfg.mode;
    }
    return total;
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI

extern "C" {

// Packet-level decode for a sequence of length-prefixed packets
// (uint32 LE size + payload). Returns total frames (samples/channel)
// or -1. `channels` must match the encoder channel count.
long opus_pkt_decode(const uint8_t* data, long size, int channels,
                     float* out, long cap) {
    OpusStream stream(channels);
    long pos = 0, total = 0;
    while (pos + 4 <= size) {
        uint32_t plen;
        memcpy(&plen, data + pos, 4);
        pos += 4;
        if (pos + plen > (uint32_t)size) return -1;
        // generous per-packet bound: 120 ms
        int max_samp = 48000 * 120 / 1000;
        if ((total + max_samp) * channels > cap) return -1;
        int n = stream.decode_packet(data + pos, plen,
                                     out + total * channels, max_samp);
        if (n < 0) return -1;
        pos += plen;
        total += n;
    }
    return total;
}

long opus_test_get_freq(float* out, long cap) {
    long n = (long)g_dump_freq.size() < cap ? g_dump_freq.size() : cap;
    memcpy(out, g_dump_freq.data(), n * sizeof(float));
    return n;
}
// feed `frames` spectra of N2 bins each through the synthesis
// (mdct body + TDAC mirror + tail carry), concatenated output
long opus_test_mdct(const float* in, int n2, int frames, float* out) {
    std::vector<float> tail(OVERLAP / 2, 0.0f);
    for (int f = 0; f < frames; f++) {
        std::vector<float> syn(n2 + OVERLAP / 2, 0.0f);
        memcpy(syn.data(), tail.data(), (OVERLAP / 2) * sizeof(float));
        mdct_backward(in + f * n2, 1, syn.data(), n2);
        memcpy(tail.data(), syn.data() + n2, (OVERLAP / 2) * sizeof(float));
        memcpy(out + f * n2, syn.data(), n2 * sizeof(float));
    }
    return (long)frames * n2;
}
long opus_test_get_silk(float* out, long cap) {
    long n = (long)g_dump_silk.size() < cap ? g_dump_silk.size() : cap;
    memcpy(out, g_dump_silk.data(), n * sizeof(float));
    g_dump_silk.clear();
    return n;
}
long opus_test_get_energy(float* out, long cap) {
    long n = (long)g_dump_energy.size() < cap ? g_dump_energy.size() : cap;
    memcpy(out, g_dump_energy.data(), n * sizeof(float));
    return n;
}

// ---------------------------------------------------------------------------
// Ogg Opus file decode (RFC 7845): page demux, OpusHead (pre-skip,
// channel count, output gain), OpusTags skip, granule-based end trim.

namespace {

struct OggOpusReader {
    const uint8_t* data;
    size_t size;
    size_t pos = 0;
    uint32_t serial = 0;
    bool have_serial = false;
    std::vector<uint8_t> partial;  // packet continued across pages
    std::vector<std::vector<uint8_t>> packets;
    int64_t last_granule = -1;

    bool read_page() {
        // find "OggS"
        while (pos + 27 <= size &&
               !(data[pos] == 'O' && data[pos + 1] == 'g' &&
                 data[pos + 2] == 'g' && data[pos + 3] == 'S'))
            pos++;
        if (pos + 27 > size) return false;
        const uint8_t* p = data + pos;
        int hdr_type = p[5];
        int64_t granule;
        memcpy(&granule, p + 6, 8);
        uint32_t ser;
        memcpy(&ser, p + 14, 4);
        int nsegs = p[26];
        if (pos + 27 + nsegs > size) return false;
        const uint8_t* lace = p + 27;
        size_t body = pos + 27 + nsegs;
        size_t total = 0;
        for (int i = 0; i < nsegs; i++) total += lace[i];
        if (body + total > size) return false;
        if (!have_serial) {
            serial = ser;
            have_serial = true;
        }
        if (ser == serial) {
            if (!(hdr_type & 1)) partial.clear();  // fresh packet start
            const uint8_t* q = body + data;
            for (int i = 0; i < nsegs; i++) {
                partial.insert(partial.end(), q, q + lace[i]);
                q += lace[i];
                if (lace[i] < 255) {
                    packets.push_back(partial);
                    partial.clear();
                }
            }
            if (granule >= 0) last_granule = granule;
        }
        pos = body + total;
        return true;
    }
};

}  // namespace

extern "C" {

static long ogg_opus_parse(const uint8_t* data, long size,
                           OggOpusReader& rd, int* channels, int* preskip,
                           float* gain_lin) {
    rd.data = data;
    rd.size = (size_t)size;
    while (rd.read_page()) {}
    if (rd.packets.size() < 2) return -1;
    const auto& head = rd.packets[0];
    if (head.size() < 19 || memcmp(head.data(), "OpusHead", 8) != 0)
        return -1;
    *channels = head[9];
    *preskip = head[10] | (head[11] << 8);
    int16_t gain_q8 = (int16_t)(head[16] | (head[17] << 8));
    *gain_lin = std::pow(10.0f, gain_q8 / (20.0f * 256.0f));
    if (head[18] != 0) return -2;  // mapping family >0 unsupported
    if (*channels < 1 || *channels > 2) return -2;
    return (long)rd.packets.size();
}

long opus_file_info(const uint8_t* data, long size, int* sr, int* ch) {
    OggOpusReader rd;
    int channels, preskip;
    float gain;
    if (ogg_opus_parse(data, size, rd, &channels, &preskip, &gain) < 0)
        return -1;
    *sr = 48000;
    *ch = channels;
    if (rd.last_granule > preskip)
        return (long)(rd.last_granule - preskip);
    // no granule: bound by 120 ms per audio packet
    return (long)(rd.packets.size() - 2) * 5760;
}

long opus_file_decode(const uint8_t* data, long size, float* out, long cap,
                      int* sr, int* ch) {
    OggOpusReader rd;
    int channels, preskip;
    float gain;
    long npkts = ogg_opus_parse(data, size, rd, &channels, &preskip, &gain);
    if (npkts < 0) return npkts;
    *sr = 48000;
    *ch = channels;
    OpusStream stream(channels);
    long total = 0;
    // packets[1] is OpusTags; audio starts at index 2
    for (size_t i = 2; i < rd.packets.size(); i++) {
        const auto& p = rd.packets[i];
        if (p.empty()) continue;
        if ((total + 5760) * channels > cap) break;
        int n = stream.decode_packet(p.data(), (int)p.size(),
                                     out + total * channels, 5760);
        if (n < 0) return -3;
        total += n;
    }
    // apply output gain, drop pre-skip, trim to granule
    if (gain != 1.0f)
        for (long i = 0; i < total * channels; i++) out[i] *= gain;
    long start = preskip;
    long end = total;
    if (rd.last_granule > preskip &&
        rd.last_granule - preskip <= total - start)
        end = start + (long)(rd.last_granule - preskip);
    long frames = end > start ? end - start : 0;
    memmove(out, out + start * channels,
            frames * channels * sizeof(float));
    return frames;
}

}  // extern "C"

// --- test hooks: drive the range decoder op-by-op (differential vs
// the system implementation in tests; not part of the decode API) ----------
static RangeDec* g_test_rc = nullptr;
void opus_test_rc_init(const uint8_t* data, int size) {
    delete g_test_rc;
    g_test_rc = new RangeDec();
    g_test_rc->init(data, (uint32_t)size);
}
long opus_test_rc_cdf(const uint16_t* cdf) { return g_test_rc->dec_cdf(cdf); }
long opus_test_rc_log(uint32_t bits) { return g_test_rc->dec_bit_logp(bits); }
long opus_test_rc_uint(uint32_t ft) { return g_test_rc->dec_uint(ft); }
long opus_test_rc_raw(uint32_t n) { return g_test_rc->dec_bits(n); }
long opus_test_rc_laplace(uint32_t fs, int decay) {
    return ec_laplace_decode(*g_test_rc, fs, decay);
}
long opus_test_rc_tell(void) { return g_test_rc->tell(); }
long opus_test_rc_tellfrac(void) { return g_test_rc->tell_frac(); }

}  // extern "C"
