// Test-only oracle shim over the SYSTEM libavcodec/libavformat:
//   - av_encode_aac:  PCM -> .m4a / .aac fixture files (tests have no
//     other way to produce AAC bitstreams — no ffmpeg binary, no
//     network). Encoder feature toggles (TNS/PNS/IS/MS) select which
//     decoder tools each fixture exercises.
//   - av_decode_raw:  decode access units with libavcodec alone — the
//     sample-level oracle for our first-party aac_decoder.cpp, fed the
//     SAME AUs our demux produced (isolates core-decoder parity from
//     container handling).
//   - av_decode_file: end-to-end decode via libavformat+libavcodec
//     (oracle for container + priming/edit-list handling).
//
// This mirrors tests/test_mp3.py's libmpg123 oracle pattern: the
// production decode path never touches libav — tests skip if the
// system libraries are absent. Built by tests via utils/native.py
// load_native("av_oracle", extra_flags=[-lavformat -lavcodec -lavutil]).

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/channel_layout.h>
#include <libavutil/opt.h>
}

#include <cstring>
#include <string>
#include <vector>

namespace {

int apply_opts(AVCodecContext* ctx, const char* opts) {
    // "key=val:key=val" applied to the codec's private options
    if (!opts || !*opts) return 0;
    std::string s(opts);
    size_t p = 0;
    while (p < s.size()) {
        size_t colon = s.find(':', p);
        if (colon == std::string::npos) colon = s.size();
        size_t eq = s.find('=', p);
        if (eq != std::string::npos && eq < colon) {
            std::string k = s.substr(p, eq - p);
            std::string v = s.substr(eq + 1, colon - eq - 1);
            av_opt_set(ctx->priv_data, k.c_str(), v.c_str(), 0);
        }
        p = colon + 1;
    }
    return 0;
}

long read_frames(AVCodecContext* ctx, AVFrame* frame, float* out, long cap,
                 long& written, int ch) {
    int ret;
    while ((ret = avcodec_receive_frame(ctx, frame)) == 0) {
        long n = frame->nb_samples;
        if (written + n > cap) n = cap - written;
        for (long i = 0; i < n; i++)
            for (int c = 0; c < ch; c++)
                out[(written + i) * ch + c] =
                    ((const float*)frame->extended_data[c])[i];
        written += n;
        av_frame_unref(frame);
    }
    return ret == AVERROR(EAGAIN) || ret == AVERROR_EOF ? 0 : ret;
}

}  // namespace

extern "C" {

// interleaved float PCM -> encoded audio file with any named encoder
// ("aac" + mp4/adts, "libvorbis"/"vorbis" + ogg, ...). Returns 0.
long av_encode_audio(const float* pcm, long frames, int ch, int sr,
                     const char* path, const char* codec_name,
                     const char* container, int bitrate, const char* opts) {
    const AVCodec* codec = avcodec_find_encoder_by_name(codec_name);
    if (!codec) return -1;
    AVFormatContext* oc = nullptr;
    if (avformat_alloc_output_context2(&oc, nullptr, container, path) < 0)
        return -2;
    AVCodecContext* ctx = avcodec_alloc_context3(codec);
    ctx->sample_rate = sr;
    ctx->sample_fmt = AV_SAMPLE_FMT_FLTP;
    av_channel_layout_default(&ctx->ch_layout, ch);
    ctx->bit_rate = bitrate;
    ctx->time_base = {1, sr};
    ctx->strict_std_compliance = FF_COMPLIANCE_EXPERIMENTAL;
    if (oc->oformat->flags & AVFMT_GLOBALHEADER)
        ctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    apply_opts(ctx, opts);
    if (avcodec_open2(ctx, codec, nullptr) < 0) return -3;
    AVStream* st = avformat_new_stream(oc, nullptr);
    st->time_base = ctx->time_base;
    avcodec_parameters_from_context(st->codecpar, ctx);
    if (!(oc->oformat->flags & AVFMT_NOFILE)
        && avio_open(&oc->pb, path, AVIO_FLAG_WRITE) < 0)
        return -4;
    if (avformat_write_header(oc, nullptr) < 0) return -5;

    AVFrame* frame = av_frame_alloc();
    AVPacket* pkt = av_packet_alloc();
    long pos = 0;
    int64_t pts = 0;
    auto drain = [&]() -> int {
        int ret;
        while ((ret = avcodec_receive_packet(ctx, pkt)) == 0) {
            av_packet_rescale_ts(pkt, ctx->time_base, st->time_base);
            pkt->stream_index = 0;
            av_interleaved_write_frame(oc, pkt);
            av_packet_unref(pkt);
        }
        return ret == AVERROR(EAGAIN) || ret == AVERROR_EOF ? 0 : ret;
    };
    while (pos < frames) {
        long n = frames - pos;
        if (n > ctx->frame_size) n = ctx->frame_size;
        frame->nb_samples = (int)n;
        frame->format = AV_SAMPLE_FMT_FLTP;
        av_channel_layout_copy(&frame->ch_layout, &ctx->ch_layout);
        if (av_frame_get_buffer(frame, 0) < 0) return -6;
        for (int c = 0; c < ch; c++)
            for (long i = 0; i < n; i++)
                ((float*)frame->extended_data[c])[i] =
                    pcm[(pos + i) * ch + c];
        frame->pts = pts;
        pts += n;
        if (avcodec_send_frame(ctx, frame) < 0) return -7;
        av_frame_unref(frame);
        if (drain() < 0) return -8;
        pos += n;
    }
    avcodec_send_frame(ctx, nullptr);
    if (drain() < 0) return -9;
    av_write_trailer(oc);
    if (!(oc->oformat->flags & AVFMT_NOFILE)) avio_closep(&oc->pb);
    avcodec_free_context(&ctx);
    avformat_free_context(oc);
    av_frame_free(&frame);
    av_packet_free(&pkt);
    return 0;
}

// back-compat wrapper for the AAC fixtures
long av_encode_aac(const float* pcm, long frames, int ch, int sr,
                   const char* path, const char* container, int bitrate,
                   const char* opts) {
    return av_encode_audio(pcm, frames, ch, sr, path, "aac", container,
                           bitrate, opts);
}

// Decode raw access units with the given AudioSpecificConfig through
// libavcodec only. out: interleaved float, cap in frames. Returns
// frames written.
long av_decode_raw(const unsigned char* asc, long asc_len,
                   const unsigned char* data, const int* au_off,
                   const int* au_len, long n_aus,
                   float* out, long cap, int* sr, int* ch) {
    const AVCodec* codec = avcodec_find_decoder(AV_CODEC_ID_AAC);
    if (!codec) return -1;
    AVCodecContext* ctx = avcodec_alloc_context3(codec);
    ctx->extradata = (uint8_t*)av_mallocz(asc_len + AV_INPUT_BUFFER_PADDING_SIZE);
    std::memcpy(ctx->extradata, asc, asc_len);
    ctx->extradata_size = (int)asc_len;
    if (avcodec_open2(ctx, codec, nullptr) < 0) return -2;
    AVFrame* frame = av_frame_alloc();
    AVPacket* pkt = av_packet_alloc();
    long written = 0;
    int channels = 0;
    for (long i = 0; i < n_aus; i++) {
        av_new_packet(pkt, au_len[i]);
        std::memcpy(pkt->data, data + au_off[i], au_len[i]);
        if (avcodec_send_packet(ctx, pkt) < 0) return -3;
        av_packet_unref(pkt);
        if (!channels) channels = ctx->ch_layout.nb_channels;
        if (read_frames(ctx, frame, out, cap, written,
                        ctx->ch_layout.nb_channels) < 0)
            return -4;
    }
    avcodec_send_packet(ctx, nullptr);
    read_frames(ctx, frame, out, cap, written, ctx->ch_layout.nb_channels);
    *sr = ctx->sample_rate;
    *ch = ctx->ch_layout.nb_channels;
    avcodec_free_context(&ctx);
    av_frame_free(&frame);
    av_packet_free(&pkt);
    return written;
}

// End-to-end file decode via libavformat (applies edit lists /
// skip_samples the way any libav-based player would).
long av_decode_file(const char* path, float* out, long cap,
                    int* sr, int* ch) {
    AVFormatContext* ic = nullptr;
    if (avformat_open_input(&ic, path, nullptr, nullptr) < 0) return -1;
    if (avformat_find_stream_info(ic, nullptr) < 0) return -2;
    int si = av_find_best_stream(ic, AVMEDIA_TYPE_AUDIO, -1, -1, nullptr, 0);
    if (si < 0) return -3;
    const AVCodec* codec =
        avcodec_find_decoder(ic->streams[si]->codecpar->codec_id);
    AVCodecContext* ctx = avcodec_alloc_context3(codec);
    avcodec_parameters_to_context(ctx, ic->streams[si]->codecpar);
    if (avcodec_open2(ctx, codec, nullptr) < 0) return -4;
    AVFrame* frame = av_frame_alloc();
    AVPacket* pkt = av_packet_alloc();
    long written = 0;
    while (av_read_frame(ic, pkt) >= 0) {
        if (pkt->stream_index == si) {
            if (avcodec_send_packet(ctx, pkt) < 0) break;
            if (read_frames(ctx, frame, out, cap, written,
                            ctx->ch_layout.nb_channels) < 0)
                break;
        }
        av_packet_unref(pkt);
    }
    avcodec_send_packet(ctx, nullptr);
    read_frames(ctx, frame, out, cap, written, ctx->ch_layout.nb_channels);
    *sr = ctx->sample_rate;
    *ch = ctx->ch_layout.nb_channels;
    avcodec_free_context(&ctx);
    avformat_close_input(&ic);
    av_frame_free(&frame);
    av_packet_free(&pkt);
    return written;
}


// Decode raw Opus packets with a NAMED avcodec decoder ("opus" = the
// native float implementation, "libopus" = the reference wrapper) —
// lets tests compare two independent system decoders against ours.
long av_decode_opus(const unsigned char* data, const int* au_off,
                    const int* au_len, long n_aus, int channels,
                    const char* decoder_name, float* out, long cap) {
    const AVCodec* codec = avcodec_find_decoder_by_name(decoder_name);
    if (!codec) return -1;
    AVCodecContext* ctx = avcodec_alloc_context3(codec);
    ctx->sample_rate = 48000;
    av_channel_layout_default(&ctx->ch_layout, channels);
    if (avcodec_open2(ctx, codec, nullptr) < 0) return -2;
    AVFrame* frame = av_frame_alloc();
    AVPacket* pkt = av_packet_alloc();
    long written = 0;
    for (long i = 0; i < n_aus; i++) {
        av_new_packet(pkt, au_len[i]);
        std::memcpy(pkt->data, data + au_off[i], au_len[i]);
        if (avcodec_send_packet(ctx, pkt) < 0) return -3;
        av_packet_unref(pkt);
        if (read_frames(ctx, frame, out, cap, written,
                        ctx->ch_layout.nb_channels) < 0)
            return -4;
    }
    avcodec_send_packet(ctx, nullptr);
    read_frames(ctx, frame, out, cap, written, ctx->ch_layout.nb_channels);
    avcodec_free_context(&ctx);
    av_frame_free(&frame);
    av_packet_free(&pkt);
    return written;
}

}  // extern "C"\n