// Native codec shim over the FFmpeg libraries (libavformat/libavcodec/
// libavutil/libswresample) with a plain C ABI for ctypes.
//
// The reference uses the same libraries: libsndfile pulls in Vorbis/Opus/
// ALAC decoding for SFInputStream (reference src/sfinputstream.cc:75-149),
// and HLSOutputStream encodes AAC and muxes MPEG-TS directly against the
// libav API (reference src/hlsoutputstream.cc).  This shim provides the
// TPU-native framework's equivalents:
//
//   * ffs_open/ffs_read/...   streaming decode of any audio container/codec
//                             to interleaved float32 (Opus, ALAC, AAC, M4A,
//                             MPEG-TS, MP3, ...)
//   * ffs_probe               stream parameter probe (the reference shells
//                             out to ffprobe in src/hls.cc:164-211)
//   * ffs_encode              one-shot PCM -> compressed file encoder used
//                             for test fixtures and BER attack transforms
//   * ffh_open/ffh_write/...  the HLS segment writer: AAC-encode watermarked
//                             samples, drop the lead-in context frames, keep
//                             the segment window, mux to MPEG-TS at the
//                             original presentation timestamp
//
// Built as libffshim.so via native/Makefile; loaded by
// audiowmark_tpu/io/ffshim.py.  Every function reports errors through a
// caller-provided buffer instead of logging.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/audio_fifo.h>
#include <libavutil/avutil.h>
#include <libavutil/channel_layout.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
}

namespace {

// callers expect clean stderr (the CLI's output is part of its contract);
// anything below ERROR is suppressed
__attribute__((constructor)) void ffshim_init() {
  av_log_set_level(AV_LOG_ERROR);
}

void set_err(char *err, int errlen, const char *msg, int averr = 0) {
  if (!err || errlen <= 0)
    return;
  if (averr) {
    char buf[128];
    av_strerror(averr, buf, sizeof buf);
    snprintf(err, errlen, "%s: %s", msg, buf);
  } else {
    snprintf(err, errlen, "%s", msg);
  }
}

// ---------------------------------------------------------------------------
// streaming decoder
// ---------------------------------------------------------------------------

struct Decoder {
  AVFormatContext *fmt = nullptr;
  AVCodecContext *ctx = nullptr;
  SwrContext *swr = nullptr;
  AVPacket *pkt = nullptr;
  AVFrame *frame = nullptr;
  int stream_index = -1;
  int rate = 0;
  int channels = 0;
  bool draining = false;
  bool eof = false;
  std::vector<float> fifo;   // interleaved float32 awaiting read
  size_t fifo_pos = 0;

  ~Decoder() {
    if (swr) swr_free(&swr);
    if (ctx) avcodec_free_context(&ctx);
    if (fmt) avformat_close_input(&fmt);
    if (pkt) av_packet_free(&pkt);
    if (frame) av_frame_free(&frame);
  }
};

// lazily (re)configure the resampler from the actual decoded frame -- some
// codecs only report their true sample format/layout on the first frame
bool dec_config_swr(Decoder *d, const AVFrame *f) {
  if (d->swr)
    return true;
  AVChannelLayout out_layout;
  av_channel_layout_default(&out_layout, d->channels);
  AVChannelLayout in_layout;
  av_channel_layout_copy(&in_layout, &f->ch_layout);
  int rc = swr_alloc_set_opts2(&d->swr, &out_layout, AV_SAMPLE_FMT_FLT,
                               d->rate, &in_layout,
                               (AVSampleFormat)f->format, f->sample_rate,
                               0, nullptr);
  av_channel_layout_uninit(&out_layout);
  av_channel_layout_uninit(&in_layout);
  if (rc < 0 || swr_init(d->swr) < 0)
    return false;
  return true;
}

bool dec_push_frame(Decoder *d, const AVFrame *f) {
  if (!dec_config_swr(d, f))
    return false;
  int max_out = f->nb_samples + 256;
  size_t base = d->fifo.size();
  d->fifo.resize(base + (size_t)max_out * d->channels);
  uint8_t *outp = (uint8_t *)(d->fifo.data() + base);
  int got = swr_convert(d->swr, &outp, max_out,
                        (const uint8_t **)f->extended_data, f->nb_samples);
  if (got < 0)
    return false;
  d->fifo.resize(base + (size_t)got * d->channels);
  return true;
}

// decode until the fifo holds >= want frames or EOF
bool dec_fill(Decoder *d, size_t want_frames) {
  while (!d->eof &&
         (d->fifo.size() - d->fifo_pos) < want_frames * (size_t)d->channels) {
    if (!d->draining) {
      int rc = av_read_frame(d->fmt, d->pkt);
      if (rc == AVERROR_EOF) {
        d->draining = true;
        avcodec_send_packet(d->ctx, nullptr);
      } else if (rc < 0) {
        return false;
      } else {
        if (d->pkt->stream_index == d->stream_index)
          avcodec_send_packet(d->ctx, d->pkt);
        av_packet_unref(d->pkt);
      }
    }
    for (;;) {
      int rc = avcodec_receive_frame(d->ctx, d->frame);
      if (rc == AVERROR(EAGAIN))
        break;
      if (rc == AVERROR_EOF) {
        // flush delayed resampler samples
        if (d->swr) {
          int max_out = 4096;
          size_t base = d->fifo.size();
          d->fifo.resize(base + (size_t)max_out * d->channels);
          uint8_t *outp = (uint8_t *)(d->fifo.data() + base);
          int got = swr_convert(d->swr, &outp, max_out, nullptr, 0);
          d->fifo.resize(base + (size_t)(got > 0 ? got : 0) * d->channels);
        }
        d->eof = true;
        break;
      }
      if (rc < 0)
        return false;
      if (!dec_push_frame(d, d->frame))
        return false;
      av_frame_unref(d->frame);
    }
  }
  return true;
}

}  // namespace

extern "C" {

void *ffs_open(const char *path, const char *force_fmt, char *err,
               int errlen) {
  Decoder *d = new Decoder();
  const AVInputFormat *ifmt = nullptr;
  if (force_fmt && force_fmt[0]) {
    ifmt = av_find_input_format(force_fmt);
    if (!ifmt) {
      set_err(err, errlen, "unknown input format");
      delete d;
      return nullptr;
    }
  }
  int rc = avformat_open_input(&d->fmt, path, ifmt, nullptr);
  if (rc < 0) {
    set_err(err, errlen, "open failed", rc);
    delete d;
    return nullptr;
  }
  rc = avformat_find_stream_info(d->fmt, nullptr);
  if (rc < 0) {
    set_err(err, errlen, "no stream info", rc);
    delete d;
    return nullptr;
  }
  const AVCodec *codec = nullptr;
  d->stream_index =
      av_find_best_stream(d->fmt, AVMEDIA_TYPE_AUDIO, -1, -1, &codec, 0);
  if (d->stream_index < 0 || !codec) {
    set_err(err, errlen, "no audio stream");
    delete d;
    return nullptr;
  }
  AVStream *st = d->fmt->streams[d->stream_index];
  d->ctx = avcodec_alloc_context3(codec);
  if (!d->ctx || avcodec_parameters_to_context(d->ctx, st->codecpar) < 0 ||
      avcodec_open2(d->ctx, codec, nullptr) < 0) {
    set_err(err, errlen, "decoder open failed");
    delete d;
    return nullptr;
  }
  d->rate = d->ctx->sample_rate;
  d->channels = d->ctx->ch_layout.nb_channels;
  if (d->rate <= 0 || d->channels <= 0) {
    set_err(err, errlen, "bad stream parameters");
    delete d;
    return nullptr;
  }
  d->pkt = av_packet_alloc();
  d->frame = av_frame_alloc();
  return d;
}

int ffs_rate(void *h) { return ((Decoder *)h)->rate; }
int ffs_channels(void *h) { return ((Decoder *)h)->channels; }

int ffs_bit_depth(void *h) {
  Decoder *d = (Decoder *)h;
  if (d->ctx->bits_per_raw_sample > 0)
    return d->ctx->bits_per_raw_sample;
  // lossy codecs: report 24 like the reference's libsndfile vorbis path
  // (src/sfinputstream.cc:137-144) and its mp3 input (src/mp3inputstream.cc)
  return 24;
}

int ffs_codec_name(void *h, char *buf, int buflen) {
  Decoder *d = (Decoder *)h;
  snprintf(buf, buflen, "%s", avcodec_get_name(d->ctx->codec_id));
  return 0;
}

long long ffs_bit_rate(void *h) {
  Decoder *d = (Decoder *)h;
  if (d->ctx->bit_rate > 0)
    return d->ctx->bit_rate;
  return d->fmt->bit_rate;
}

// best-effort total frames from container metadata; -1 when unknown
long long ffs_duration_frames(void *h) {
  Decoder *d = (Decoder *)h;
  AVStream *st = d->fmt->streams[d->stream_index];
  if (st->duration > 0 && st->time_base.num > 0)
    return av_rescale_q(st->duration, st->time_base,
                        AVRational{1, d->rate});
  if (d->fmt->duration > 0)
    return av_rescale(d->fmt->duration, d->rate, AV_TIME_BASE);
  return -1;
}

long ffs_read(void *h, float *out, long max_frames) {
  Decoder *d = (Decoder *)h;
  if (!dec_fill(d, (size_t)max_frames))
    return -1;
  size_t avail = (d->fifo.size() - d->fifo_pos) / d->channels;
  size_t take = avail < (size_t)max_frames ? avail : (size_t)max_frames;
  memcpy(out, d->fifo.data() + d->fifo_pos,
         take * d->channels * sizeof(float));
  d->fifo_pos += take * d->channels;
  if (d->fifo_pos == d->fifo.size()) {
    d->fifo.clear();
    d->fifo_pos = 0;
  } else if (d->fifo_pos > (size_t)d->rate * d->channels) {
    d->fifo.erase(d->fifo.begin(), d->fifo.begin() + d->fifo_pos);
    d->fifo_pos = 0;
  }
  return (long)take;
}

void ffs_close(void *h) { delete (Decoder *)h; }

// ---------------------------------------------------------------------------
// probe (ffprobe equivalent for hls-prepare, reference src/hls.cc:164-211)
// ---------------------------------------------------------------------------

int ffs_probe(const char *path, char *out, int outlen, char *err,
              int errlen) {
  AVFormatContext *fmt = nullptr;
  int rc = avformat_open_input(&fmt, path, nullptr, nullptr);
  if (rc < 0) {
    set_err(err, errlen, "open failed", rc);
    return -1;
  }
  if ((rc = avformat_find_stream_info(fmt, nullptr)) < 0) {
    set_err(err, errlen, "no stream info", rc);
    avformat_close_input(&fmt);
    return -1;
  }
  int audio_index =
      av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, nullptr, 0);
  if (audio_index < 0) {
    set_err(err, errlen, "no audio stream");
    avformat_close_input(&fmt);
    return -1;
  }
  AVStream *st = fmt->streams[audio_index];
  char layout[128] = "";
  av_channel_layout_describe(&st->codecpar->ch_layout, layout, sizeof layout);
  double start_time = 0.0;
  if (st->start_time != AV_NOPTS_VALUE)
    start_time = st->start_time * av_q2d(st->time_base);
  std::string s;
  char line[256];
  snprintf(line, sizeof line, "nb_streams=%u\n", fmt->nb_streams);
  s += line;
  snprintf(line, sizeof line, "index=%d\n", audio_index);
  s += line;
  snprintf(line, sizeof line, "codec_name=%s\n",
           avcodec_get_name(st->codecpar->codec_id));
  s += line;
  snprintf(line, sizeof line, "channels=%d\n",
           st->codecpar->ch_layout.nb_channels);
  s += line;
  snprintf(line, sizeof line, "channel_layout=%s\n", layout);
  s += line;
  snprintf(line, sizeof line, "sample_rate=%d\n", st->codecpar->sample_rate);
  s += line;
  snprintf(line, sizeof line, "start_time=%.6f\n", start_time);
  s += line;
  snprintf(line, sizeof line, "bit_rate=%lld\n",
           (long long)(st->codecpar->bit_rate > 0 ? st->codecpar->bit_rate
                                                  : fmt->bit_rate));
  s += line;
  avformat_close_input(&fmt);
  if ((int)s.size() + 1 > outlen) {
    set_err(err, errlen, "probe buffer too small");
    return -1;
  }
  memcpy(out, s.c_str(), s.size() + 1);
  return (int)s.size();
}

// sum compressed audio payload bytes + sample count without decoding --
// the hls-prepare bitrate detection (the reference remuxes the playlist to
// ADTS and divides file size by master duration, src/hls.cc:306-318);
// understands m3u8 playlists via the hls demuxer as well as single files
int ffs_payload_stats(const char *path, long long *bytes,
                      long long *samples, int *rate, char *err, int errlen) {
  AVFormatContext *fmt = nullptr;
  int rc = avformat_open_input(&fmt, path, nullptr, nullptr);
  if (rc < 0) {
    set_err(err, errlen, "open failed", rc);
    return -1;
  }
  if ((rc = avformat_find_stream_info(fmt, nullptr)) < 0) {
    set_err(err, errlen, "no stream info", rc);
    avformat_close_input(&fmt);
    return -1;
  }
  int si = av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, nullptr, 0);
  if (si < 0) {
    set_err(err, errlen, "no audio stream");
    avformat_close_input(&fmt);
    return -1;
  }
  AVStream *st = fmt->streams[si];
  int frame_size = st->codecpar->frame_size > 0 ? st->codecpar->frame_size
                                                : 1024;
  *rate = st->codecpar->sample_rate;
  *bytes = 0;
  *samples = 0;
  AVPacket *pkt = av_packet_alloc();
  while (av_read_frame(fmt, pkt) >= 0) {
    if (pkt->stream_index == si) {
      *bytes += pkt->size;
      *samples += frame_size;
    }
    av_packet_unref(pkt);
  }
  av_packet_free(&pkt);
  avformat_close_input(&fmt);
  return 0;
}

// ---------------------------------------------------------------------------
// encoder core shared by ffs_encode and the HLS writer
// ---------------------------------------------------------------------------

namespace {

struct Encoder {
  AVFormatContext *ofmt = nullptr;
  AVCodecContext *enc = nullptr;
  SwrContext *swr = nullptr;
  AVStream *st = nullptr;
  AVPacket *pkt = nullptr;
  AVFrame *frame = nullptr;
  AVAudioFifo *fifo = nullptr;     // encoder-format samples awaiting a frame
  int in_rate = 0;
  int channels = 0;
  int frame_size = 0;
  int64_t next_pts = 0;            // in encoder time_base (1/enc rate)
  bool header_written = false;

  // HLS packet window (counted in encoder output packets)
  bool hls_mode = false;
  int64_t skip_packets = 0;        // cut_aac_frames + priming packets
  int64_t keep_packets = -1;       // <0: keep everything
  int64_t packet_count = 0;        // encoder packets seen
  int64_t kept_count = 0;
  int64_t pts_offset_90k = 0;      // mpegts presentation offset

  ~Encoder() {
    if (swr) swr_free(&swr);
    if (fifo) av_audio_fifo_free(fifo);
    if (enc) avcodec_free_context(&enc);
    if (ofmt) {
      if (ofmt->pb && !(ofmt->oformat->flags & AVFMT_NOFILE))
        avio_closep(&ofmt->pb);
      avformat_free_context(ofmt);
    }
    if (pkt) av_packet_free(&pkt);
    if (frame) av_frame_free(&frame);
  }
};

int enc_pick_rate(const AVCodec *codec, int want) {
  if (!codec->supported_samplerates)
    return want;
  int best = codec->supported_samplerates[0];
  for (const int *p = codec->supported_samplerates; *p; ++p) {
    if (*p == want)
      return want;
    if (llabs((long long)*p - want) < llabs((long long)best - want))
      best = *p;
  }
  return best;
}

AVSampleFormat enc_pick_fmt(const AVCodec *codec) {
  if (!codec->sample_fmts)
    return AV_SAMPLE_FMT_FLT;
  // prefer float formats to avoid a quantization step
  for (const AVSampleFormat *p = codec->sample_fmts;
       *p != AV_SAMPLE_FMT_NONE; ++p)
    if (*p == AV_SAMPLE_FMT_FLT || *p == AV_SAMPLE_FMT_FLTP)
      return *p;
  return codec->sample_fmts[0];
}

Encoder *enc_open(const char *path, const char *fmt_name,
                  const char *codec_name, int in_rate, int channels,
                  long long bit_rate, const char *layout, char *err,
                  int errlen) {
  Encoder *e = new Encoder();
  e->in_rate = in_rate;
  e->channels = channels;
  int rc = avformat_alloc_output_context2(&e->ofmt, nullptr, fmt_name, path);
  if (rc < 0 || !e->ofmt) {
    set_err(err, errlen, "output format alloc failed", rc);
    delete e;
    return nullptr;
  }
  const AVCodec *codec = avcodec_find_encoder_by_name(codec_name);
  if (!codec) {
    set_err(err, errlen, "encoder not available");
    delete e;
    return nullptr;
  }
  e->enc = avcodec_alloc_context3(codec);
  e->enc->sample_rate = enc_pick_rate(codec, in_rate);
  // honor an explicit layout name (e.g. "5.1(side)") when it matches the
  // channel count — the reference forwards the probed layout to the AAC
  // encoder (src/hls.cc channel_layout var -> hlsoutputstream)
  bool have_layout = false;
  if (layout && *layout) {
    AVChannelLayout want;
    if (av_channel_layout_from_string(&want, layout) >= 0) {
      if (want.nb_channels == channels) {
        av_channel_layout_copy(&e->enc->ch_layout, &want);
        have_layout = true;
      }
      av_channel_layout_uninit(&want);
    }
  }
  if (!have_layout)
    av_channel_layout_default(&e->enc->ch_layout, channels);
  e->enc->sample_fmt = enc_pick_fmt(codec);
  if (bit_rate > 0)
    e->enc->bit_rate = bit_rate;
  e->enc->time_base = AVRational{1, e->enc->sample_rate};
  if (e->ofmt->oformat->flags & AVFMT_GLOBALHEADER)
    e->enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  // the experimental native encoders (e.g. "opus") need explicit opt-in
  e->enc->strict_std_compliance = FF_COMPLIANCE_EXPERIMENTAL;
  rc = avcodec_open2(e->enc, codec, nullptr);
  if (rc < 0 && have_layout) {
    // encoder rejected the requested layout: fall back to the default
    av_channel_layout_uninit(&e->enc->ch_layout);
    av_channel_layout_default(&e->enc->ch_layout, channels);
    rc = avcodec_open2(e->enc, codec, nullptr);
  }
  if (rc < 0) {
    set_err(err, errlen, "encoder open failed", rc);
    delete e;
    return nullptr;
  }
  e->frame_size = e->enc->frame_size > 0 ? e->enc->frame_size : 4096;

  e->st = avformat_new_stream(e->ofmt, nullptr);
  if (!e->st ||
      avcodec_parameters_from_context(e->st->codecpar, e->enc) < 0) {
    set_err(err, errlen, "stream setup failed");
    delete e;
    return nullptr;
  }
  e->st->time_base = e->enc->time_base;

  AVChannelLayout in_layout;
  av_channel_layout_default(&in_layout, channels);
  rc = swr_alloc_set_opts2(&e->swr, &e->enc->ch_layout, e->enc->sample_fmt,
                           e->enc->sample_rate, &in_layout,
                           AV_SAMPLE_FMT_FLT, in_rate, 0, nullptr);
  av_channel_layout_uninit(&in_layout);
  if (rc < 0 || swr_init(e->swr) < 0) {
    set_err(err, errlen, "resampler init failed");
    delete e;
    return nullptr;
  }

  if (!(e->ofmt->oformat->flags & AVFMT_NOFILE)) {
    if ((rc = avio_open(&e->ofmt->pb, path, AVIO_FLAG_WRITE)) < 0) {
      set_err(err, errlen, "cannot open output file", rc);
      delete e;
      return nullptr;
    }
  }
  if ((rc = avformat_write_header(e->ofmt, nullptr)) < 0) {
    set_err(err, errlen, "write header failed", rc);
    delete e;
    return nullptr;
  }
  e->header_written = true;
  e->pkt = av_packet_alloc();
  e->frame = av_frame_alloc();
  e->fifo = av_audio_fifo_alloc(e->enc->sample_fmt, channels,
                                e->frame_size * 4);
  if (!e->pkt || !e->frame || !e->fifo) {
    set_err(err, errlen, "alloc failed");
    delete e;
    return nullptr;
  }
  return e;
}

// drain encoder packets, applying the HLS skip/keep window when enabled
int enc_drain_packets(Encoder *e) {
  for (;;) {
    int rc = avcodec_receive_packet(e->enc, e->pkt);
    if (rc == AVERROR(EAGAIN) || rc == AVERROR_EOF)
      return 0;
    if (rc < 0)
      return rc;
    bool keep = true;
    if (e->hls_mode) {
      int64_t idx = e->packet_count++;
      if (idx < e->skip_packets ||
          (e->keep_packets >= 0 &&
           idx >= e->skip_packets + e->keep_packets)) {
        keep = false;
      }
    }
    if (keep) {
      if (e->hls_mode) {
        // retimestamp kept packets contiguously from the pts offset
        // (reference: src/hlsoutputstream.cc pts bookkeeping)
        int64_t pts = e->kept_count * (int64_t)e->frame_size;
        e->pkt->pts = pts;
        e->pkt->dts = pts;
        e->pkt->duration = e->frame_size;
        e->kept_count++;
      }
      e->pkt->stream_index = e->st->index;
      av_packet_rescale_ts(e->pkt, e->enc->time_base, e->st->time_base);
      if (e->hls_mode) {
        int64_t off = av_rescale_q(e->pts_offset_90k, AVRational{1, 90000},
                                   e->st->time_base);
        if (e->pkt->pts != AV_NOPTS_VALUE)
          e->pkt->pts += off;
        if (e->pkt->dts != AV_NOPTS_VALUE)
          e->pkt->dts += off;
      }
      rc = av_interleaved_write_frame(e->ofmt, e->pkt);
      if (rc < 0)
        return rc;
    }
    av_packet_unref(e->pkt);
  }
}

// convert an interleaved float32 chunk to encoder format into the fifo
int enc_queue_input(Encoder *e, const float *samples, long n_frames) {
  int64_t out_cap =
      av_rescale_rnd(swr_get_delay(e->swr, e->in_rate) + n_frames,
                     e->enc->sample_rate, e->in_rate, AV_ROUND_UP) + 64;
  uint8_t **conv = nullptr;
  int linesize = 0;
  if (av_samples_alloc_array_and_samples(&conv, &linesize, e->channels,
                                         (int)out_cap, e->enc->sample_fmt,
                                         0) < 0)
    return -1;
  const uint8_t *inp = (const uint8_t *)samples;
  int got = swr_convert(e->swr, conv, (int)out_cap,
                        n_frames > 0 ? &inp : nullptr,
                        n_frames > 0 ? (int)n_frames : 0);
  int rc = 0;
  if (got < 0)
    rc = -1;
  else if (got > 0 && av_audio_fifo_write(e->fifo, (void **)conv, got) < got)
    rc = -1;
  if (conv) {
    av_freep(&conv[0]);
    av_freep(&conv);
  }
  return rc;
}

// pop one encoder frame of up to frame_size samples from the fifo and encode
int enc_emit_frame(Encoder *e, int nb) {
  e->frame->nb_samples = nb;
  av_channel_layout_copy(&e->frame->ch_layout, &e->enc->ch_layout);
  e->frame->format = e->enc->sample_fmt;
  e->frame->sample_rate = e->enc->sample_rate;
  if (av_frame_get_buffer(e->frame, 0) < 0)
    return -1;
  if (av_audio_fifo_read(e->fifo, (void **)e->frame->data, nb) < nb) {
    av_frame_unref(e->frame);
    return -1;
  }
  e->frame->pts = e->next_pts;
  e->next_pts += nb;
  int rc = avcodec_send_frame(e->enc, e->frame);
  av_frame_unref(e->frame);
  if (rc < 0)
    return rc;
  return enc_drain_packets(e);
}

// push interleaved float32 input; encodes all complete frames
int enc_write(Encoder *e, const float *samples, long n_frames) {
  if (enc_queue_input(e, samples, n_frames) < 0)
    return -1;
  while (av_audio_fifo_size(e->fifo) >= e->frame_size) {
    int rc = enc_emit_frame(e, e->frame_size);
    if (rc < 0)
      return rc;
  }
  return 0;
}

int enc_close(Encoder *e, char *err, int errlen) {
  // flush the resampler tail, then drain the fifo (short final frame ok)
  if (enc_queue_input(e, nullptr, 0) < 0) {
    set_err(err, errlen, "resampler flush failed");
    return -1;
  }
  while (av_audio_fifo_size(e->fifo) > 0) {
    int nb = av_audio_fifo_size(e->fifo);
    if (nb > e->frame_size)
      nb = e->frame_size;
    if (enc_emit_frame(e, nb) < 0) {
      set_err(err, errlen, "encode failed");
      return -1;
    }
  }
  avcodec_send_frame(e->enc, nullptr);
  int rc = enc_drain_packets(e);
  if (rc < 0) {
    set_err(err, errlen, "encoder flush failed", rc);
    return -1;
  }
  if (e->header_written && (rc = av_write_trailer(e->ofmt)) < 0) {
    set_err(err, errlen, "write trailer failed", rc);
    return -1;
  }
  return 0;
}

}  // namespace

// one-shot PCM -> file encode (fixtures, BER attacks)
int ffs_encode(const char *path, const char *fmt_name, const char *codec_name,
               int rate, int channels, long long bit_rate, const float *pcm,
               long long n_frames, char *err, int errlen) {
  Encoder *e = enc_open(path, fmt_name, codec_name, rate, channels, bit_rate,
                        nullptr, err, errlen);
  if (!e)
    return -1;
  const long chunk = 65536;
  long long done = 0;
  while (done < n_frames) {
    long n = (long long)chunk < n_frames - done ? chunk
                                                : (long)(n_frames - done);
    if (enc_write(e, pcm + (size_t)done * channels, n) < 0) {
      set_err(err, errlen, "encode failed");
      delete e;
      return -1;
    }
    done += n;
  }
  int rc = enc_close(e, err, errlen);
  delete e;
  return rc;
}

// encoder sample rate actually chosen for a codec (e.g. opus forces 48000)
int ffs_encoder_rate(const char *codec_name, int want) {
  const AVCodec *codec = avcodec_find_encoder_by_name(codec_name);
  if (!codec)
    return -1;
  return enc_pick_rate(codec, want);
}

int ffs_have_encoder(const char *codec_name) {
  return avcodec_find_encoder_by_name(codec_name) ? 1 : 0;
}

// ---------------------------------------------------------------------------
// HLS segment writer (reference: src/hlsoutputstream.cc)
// ---------------------------------------------------------------------------

void *ffh_open(const char *path, int rate, int channels, long long bit_rate,
               long long cut_aac_frames, long long keep_aac_frames,
               double pts_start, const char *layout, char *err, int errlen) {
  Encoder *e = enc_open(path, "mpegts", "aac", rate, channels, bit_rate,
                        layout, err, errlen);
  if (!e)
    return nullptr;
  e->hls_mode = true;
  // the encoder adds initial_padding samples of priming latency: with the
  // native aac encoder that is exactly one 1024-sample frame, so output
  // packet k holds input samples (k-1)*1024..k*1024; skip those priming
  // packets on top of the requested context cut
  // (reference pts shift: src/hls.cc:262-266)
  int64_t priming =
      (e->enc->initial_padding + e->frame_size / 2) / e->frame_size;
  e->skip_packets = cut_aac_frames + priming;
  e->keep_packets = keep_aac_frames;
  e->pts_offset_90k = (int64_t)(pts_start * 90000.0 + 0.5);
  return e;
}

long ffh_write(void *h, const float *samples, long n_frames) {
  Encoder *e = (Encoder *)h;
  if (enc_write(e, samples, n_frames) < 0)
    return -1;
  return n_frames;
}

int ffh_close(void *h, char *err, int errlen) {
  Encoder *e = (Encoder *)h;
  int rc = enc_close(e, err, errlen);
  delete e;
  return rc;
}

// ---------------------------------------------------------------------------
// video support (videowmark): stream counts, audio-replacement remux, and a
// synthetic test-video generator.  The reference's videowmark drives the
// ffmpeg CLI for these steps (reference src/videowmark); this provides the
// same operations against the libraries directly.
// ---------------------------------------------------------------------------

int ffs_stream_counts(const char *path, int *n_audio, int *n_video,
                      char *err, int errlen) {
  AVFormatContext *fmt = nullptr;
  int rc = avformat_open_input(&fmt, path, nullptr, nullptr);
  if (rc < 0) {
    set_err(err, errlen, "open failed", rc);
    return -1;
  }
  if ((rc = avformat_find_stream_info(fmt, nullptr)) < 0) {
    set_err(err, errlen, "no stream info", rc);
    avformat_close_input(&fmt);
    return -1;
  }
  *n_audio = 0;
  *n_video = 0;
  for (unsigned i = 0; i < fmt->nb_streams; i++) {
    AVMediaType t = fmt->streams[i]->codecpar->codec_type;
    if (t == AVMEDIA_TYPE_AUDIO)
      (*n_audio)++;
    else if (t == AVMEDIA_TYPE_VIDEO &&
             !(fmt->streams[i]->disposition & AV_DISPOSITION_ATTACHED_PIC))
      (*n_video)++;
  }
  avformat_close_input(&fmt);
  return 0;
}

// remux `in_path`, copying every non-audio stream and replacing the audio
// with a fresh encode of `audio_path` (the watermarked RF64/WAV) using the
// original audio codec and bit rate (reference: videowmark cmd_add's
// `-map 0:v -map 1:a -c:v copy -c:a <orig codec> -b:a <orig rate>`)
int ffr_remux_audio(const char *in_path, const char *audio_path,
                    const char *out_path, char *err, int errlen) {
  AVFormatContext *in_fmt = nullptr;
  int rc = avformat_open_input(&in_fmt, in_path, nullptr, nullptr);
  if (rc < 0) {
    set_err(err, errlen, "open input failed", rc);
    return -1;
  }
  if ((rc = avformat_find_stream_info(in_fmt, nullptr)) < 0) {
    set_err(err, errlen, "no stream info", rc);
    avformat_close_input(&in_fmt);
    return -1;
  }
  int audio_si =
      av_find_best_stream(in_fmt, AVMEDIA_TYPE_AUDIO, -1, -1, nullptr, 0);
  if (audio_si < 0) {
    set_err(err, errlen, "no audio stream in input");
    avformat_close_input(&in_fmt);
    return -1;
  }
  AVStream *in_audio = in_fmt->streams[audio_si];
  const char *audio_codec =
      avcodec_get_name(in_audio->codecpar->codec_id);
  long long bit_rate = in_audio->codecpar->bit_rate;

  // watermarked audio source
  Decoder *wav = (Decoder *)ffs_open(audio_path, nullptr, err, errlen);
  if (!wav) {
    avformat_close_input(&in_fmt);
    return -1;
  }

  AVFormatContext *out_fmt = nullptr;
  rc = avformat_alloc_output_context2(&out_fmt, nullptr, nullptr, out_path);
  if (rc < 0 || !out_fmt) {
    set_err(err, errlen, "output alloc failed", rc);
    ffs_close(wav);
    avformat_close_input(&in_fmt);
    return -1;
  }

  // copied streams keep their parameters; the audio stream is re-encoded
  std::vector<int> out_index(in_fmt->nb_streams, -1);
  for (unsigned i = 0; i < in_fmt->nb_streams; i++) {
    if ((int)i == audio_si)
      continue;
    AVStream *ist = in_fmt->streams[i];
    if (ist->codecpar->codec_type != AVMEDIA_TYPE_VIDEO &&
        ist->codecpar->codec_type != AVMEDIA_TYPE_SUBTITLE)
      continue;
    AVStream *ost = avformat_new_stream(out_fmt, nullptr);
    if (!ost ||
        avcodec_parameters_copy(ost->codecpar, ist->codecpar) < 0) {
      set_err(err, errlen, "stream copy setup failed");
      ffs_close(wav);
      avformat_close_input(&in_fmt);
      avformat_free_context(out_fmt);
      return -1;
    }
    ost->codecpar->codec_tag = 0;
    ost->time_base = ist->time_base;
    out_index[i] = ost->index;
  }

  const AVCodec *enc_codec = avcodec_find_encoder_by_name(audio_codec);
  if (!enc_codec)
    enc_codec = avcodec_find_encoder(in_audio->codecpar->codec_id);
  if (!enc_codec) {
    set_err(err, errlen, "no encoder for input audio codec");
    ffs_close(wav);
    avformat_close_input(&in_fmt);
    avformat_free_context(out_fmt);
    return -1;
  }
  AVCodecContext *enc = avcodec_alloc_context3(enc_codec);
  enc->sample_rate = enc_pick_rate(enc_codec, wav->rate);
  // keep the source stream's channel layout when it is fully specified
  // and matches the channel count (an UNSPEC order or a layout the
  // encoder rejects must not break the remux — fall back to the default)
  bool custom_layout = false;
  if (in_audio->codecpar->ch_layout.order != AV_CHANNEL_ORDER_UNSPEC &&
      in_audio->codecpar->ch_layout.nb_channels == wav->channels) {
    av_channel_layout_copy(&enc->ch_layout, &in_audio->codecpar->ch_layout);
    custom_layout = true;
  } else {
    av_channel_layout_default(&enc->ch_layout, wav->channels);
  }
  enc->sample_fmt = enc_pick_fmt(enc_codec);
  if (bit_rate > 0)
    enc->bit_rate = bit_rate;
  enc->time_base = AVRational{1, enc->sample_rate};
  if (out_fmt->oformat->flags & AVFMT_GLOBALHEADER)
    enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  enc->strict_std_compliance = FF_COMPLIANCE_EXPERIMENTAL;
  rc = avcodec_open2(enc, enc_codec, nullptr);
  if (rc < 0 && custom_layout) {
    // the encoder rejected the source layout (e.g. not in its ch_layouts
    // whitelist): retry with the default layout for the channel count
    avcodec_free_context(&enc);
    enc = avcodec_alloc_context3(enc_codec);
    enc->sample_rate = enc_pick_rate(enc_codec, wav->rate);
    av_channel_layout_default(&enc->ch_layout, wav->channels);
    enc->sample_fmt = enc_pick_fmt(enc_codec);
    if (bit_rate > 0)
      enc->bit_rate = bit_rate;
    enc->time_base = AVRational{1, enc->sample_rate};
    if (out_fmt->oformat->flags & AVFMT_GLOBALHEADER)
      enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    enc->strict_std_compliance = FF_COMPLIANCE_EXPERIMENTAL;
    rc = avcodec_open2(enc, enc_codec, nullptr);
  }
  if (rc < 0) {
    set_err(err, errlen, "audio encoder open failed", rc);
    avcodec_free_context(&enc);
    ffs_close(wav);
    avformat_close_input(&in_fmt);
    avformat_free_context(out_fmt);
    return -1;
  }
  AVStream *out_audio = avformat_new_stream(out_fmt, nullptr);
  avcodec_parameters_from_context(out_audio->codecpar, enc);
  out_audio->time_base = enc->time_base;

  SwrContext *swr = nullptr;
  AVChannelLayout in_layout;
  av_channel_layout_default(&in_layout, wav->channels);
  rc = swr_alloc_set_opts2(&swr, &enc->ch_layout, enc->sample_fmt,
                           enc->sample_rate, &in_layout, AV_SAMPLE_FMT_FLT,
                           wav->rate, 0, nullptr);
  av_channel_layout_uninit(&in_layout);
  int frame_size = enc->frame_size > 0 ? enc->frame_size : 4096;
  AVAudioFifo *fifo =
      av_audio_fifo_alloc(enc->sample_fmt, wav->channels, frame_size * 4);
  AVPacket *pkt = av_packet_alloc();
  AVFrame *frame = av_frame_alloc();

  bool fail = rc < 0 || swr_init(swr) < 0 || !fifo || !pkt || !frame;
  if (!fail && !(out_fmt->oformat->flags & AVFMT_NOFILE))
    fail = avio_open(&out_fmt->pb, out_path, AVIO_FLAG_WRITE) < 0;
  if (!fail)
    fail = avformat_write_header(out_fmt, nullptr) < 0;
  bool header_ok = !fail;

  // Start the replacement audio at the input audio stream's start time:
  // copied video/subtitle packets keep their original (rescaled)
  // timestamps, and TS captures routinely start at nonzero dts — encoding
  // from pts 0 would play the audio early by that offset.
  int64_t audio_pts = 0;      // samples encoded so far + start offset
  if (in_audio->start_time != AV_NOPTS_VALUE && in_audio->start_time > 0)
    audio_pts = av_rescale_q(in_audio->start_time, in_audio->time_base,
                             AVRational{1, enc->sample_rate});
  bool audio_eof = false;

  // audio encode helpers ----------------------------------------------------
  auto emit_audio = [&](int nb) -> bool {
    frame->nb_samples = nb;
    av_channel_layout_copy(&frame->ch_layout, &enc->ch_layout);
    frame->format = enc->sample_fmt;
    frame->sample_rate = enc->sample_rate;
    if (av_frame_get_buffer(frame, 0) < 0)
      return false;
    if (av_audio_fifo_read(fifo, (void **)frame->data, nb) < nb) {
      av_frame_unref(frame);
      return false;
    }
    frame->pts = audio_pts;
    audio_pts += nb;
    int r = avcodec_send_frame(enc, frame);
    av_frame_unref(frame);
    if (r < 0)
      return false;
    for (;;) {
      r = avcodec_receive_packet(enc, pkt);
      if (r == AVERROR(EAGAIN) || r == AVERROR_EOF)
        return true;
      if (r < 0)
        return false;
      pkt->stream_index = out_audio->index;
      av_packet_rescale_ts(pkt, enc->time_base, out_audio->time_base);
      if (av_interleaved_write_frame(out_fmt, pkt) < 0)
        return false;
      av_packet_unref(pkt);
    }
  };
  auto pump_audio = [&]() -> bool {
    // refill the fifo from the wav decoder and encode available frames
    while (!audio_eof && av_audio_fifo_size(fifo) < frame_size) {
      std::vector<float> buf((size_t)frame_size * wav->channels);
      long got = ffs_read(wav, buf.data(), frame_size);
      if (got < 0)
        return false;
      if (got == 0) {
        audio_eof = true;
        break;
      }
      int64_t cap = av_rescale_rnd(swr_get_delay(swr, wav->rate) + got,
                                   enc->sample_rate, wav->rate,
                                   AV_ROUND_UP) + 64;
      uint8_t **conv = nullptr;
      int linesize = 0;
      if (av_samples_alloc_array_and_samples(&conv, &linesize,
                                             wav->channels, (int)cap,
                                             enc->sample_fmt, 0) < 0)
        return false;
      const uint8_t *inp = (const uint8_t *)buf.data();
      int cgot = swr_convert(swr, conv, (int)cap, &inp, (int)got);
      bool ok = cgot >= 0 &&
                (cgot == 0 ||
                 av_audio_fifo_write(fifo, (void **)conv, cgot) == cgot);
      av_freep(&conv[0]);
      av_freep(&conv);
      if (!ok)
        return false;
    }
    while (av_audio_fifo_size(fifo) >= frame_size)
      if (!emit_audio(frame_size))
        return false;
    return true;
  };

  // copy passthrough packets; audio is pumped independently (the muxer's
  // interleaving queue orders packets by dts)
  if (!fail) {
    AVPacket *in_pkt = av_packet_alloc();
    int64_t copied_seconds = 0;
    while (av_read_frame(in_fmt, in_pkt) >= 0) {
      int oi = in_pkt->stream_index < (int)out_index.size()
                   ? out_index[in_pkt->stream_index]
                   : -1;
      if (oi < 0) {
        av_packet_unref(in_pkt);
        continue;
      }
      AVStream *ist = in_fmt->streams[in_pkt->stream_index];
      AVStream *ost = out_fmt->streams[oi];
      av_packet_rescale_ts(in_pkt, ist->time_base, ost->time_base);
      in_pkt->stream_index = oi;
      int64_t pkt_sec = in_pkt->dts != AV_NOPTS_VALUE
                            ? av_rescale_q(in_pkt->dts, ost->time_base,
                                           AVRational{1, 1})
                            : copied_seconds;
      if (av_interleaved_write_frame(out_fmt, in_pkt) < 0) {
        fail = true;
        break;
      }
      av_packet_unref(in_pkt);
      // keep audio roughly in step with the copied timeline
      while (!audio_eof &&
             audio_pts < (pkt_sec + 2) * (int64_t)enc->sample_rate) {
        if (!pump_audio()) {
          fail = true;
          break;
        }
        if (av_audio_fifo_size(fifo) == 0 && audio_eof)
          break;
      }
      copied_seconds = pkt_sec;
      if (fail)
        break;
    }
    av_packet_free(&in_pkt);
  }

  // drain remaining audio + encoder
  if (!fail) {
    while (!audio_eof)
      if (!pump_audio()) {
        fail = true;
        break;
      }
  }
  if (!fail) {
    // flush resampler tail and final short frame
    int64_t cap = 4096;
    uint8_t **conv = nullptr;
    int linesize = 0;
    if (av_samples_alloc_array_and_samples(&conv, &linesize, wav->channels,
                                           (int)cap, enc->sample_fmt,
                                           0) >= 0) {
      int cgot = swr_convert(swr, conv, (int)cap, nullptr, 0);
      if (cgot > 0)
        av_audio_fifo_write(fifo, (void **)conv, cgot);
      av_freep(&conv[0]);
      av_freep(&conv);
    }
    while (av_audio_fifo_size(fifo) > 0) {
      int nb = av_audio_fifo_size(fifo);
      if (nb > frame_size)
        nb = frame_size;
      if (!emit_audio(nb)) {
        fail = true;
        break;
      }
    }
  }
  if (!fail) {
    avcodec_send_frame(enc, nullptr);
    for (;;) {
      int r = avcodec_receive_packet(enc, pkt);
      if (r == AVERROR(EAGAIN) || r == AVERROR_EOF)
        break;
      if (r < 0) {
        fail = true;
        break;
      }
      pkt->stream_index = out_audio->index;
      av_packet_rescale_ts(pkt, enc->time_base, out_audio->time_base);
      if (av_interleaved_write_frame(out_fmt, pkt) < 0) {
        fail = true;
        break;
      }
      av_packet_unref(pkt);
    }
  }
  if (header_ok && av_write_trailer(out_fmt) < 0)
    fail = true;

  if (fail)
    set_err(err, errlen, "remux failed");
  av_frame_free(&frame);
  av_packet_free(&pkt);
  av_audio_fifo_free(fifo);
  swr_free(&swr);
  avcodec_free_context(&enc);
  if (out_fmt->pb && !(out_fmt->oformat->flags & AVFMT_NOFILE))
    avio_closep(&out_fmt->pb);
  avformat_free_context(out_fmt);
  ffs_close(wav);
  avformat_close_input(&in_fmt);
  return fail ? -1 : 0;
}

// synthetic mpeg4+aac test clip (fixture generator for the videowmark
// tests; this image has no video files and no ffmpeg CLI)
int ffv_make_test_video(const char *path, double seconds, int rate,
                        int channels, double ts_offset, char *err,
                        int errlen) {
  AVFormatContext *ofmt = nullptr;
  int rc = avformat_alloc_output_context2(&ofmt, nullptr, nullptr, path);
  if (rc < 0 || !ofmt) {
    set_err(err, errlen, "output alloc failed", rc);
    return -1;
  }
  const AVCodec *vcodec = avcodec_find_encoder(AV_CODEC_ID_MPEG4);
  const AVCodec *acodec = avcodec_find_encoder_by_name("aac");
  if (!vcodec || !acodec) {
    set_err(err, errlen, "mpeg4/aac encoders unavailable");
    avformat_free_context(ofmt);
    return -1;
  }
  const int W = 64, H = 64, FPS = 25;
  AVCodecContext *venc = avcodec_alloc_context3(vcodec);
  venc->width = W;
  venc->height = H;
  venc->pix_fmt = AV_PIX_FMT_YUV420P;
  venc->time_base = AVRational{1, FPS};
  venc->bit_rate = 100000;
  if (ofmt->oformat->flags & AVFMT_GLOBALHEADER)
    venc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  AVCodecContext *aenc = avcodec_alloc_context3(acodec);
  aenc->sample_rate = rate;
  av_channel_layout_default(&aenc->ch_layout, channels);
  aenc->sample_fmt = AV_SAMPLE_FMT_FLTP;
  aenc->bit_rate = 128000;
  aenc->time_base = AVRational{1, rate};
  if (ofmt->oformat->flags & AVFMT_GLOBALHEADER)
    aenc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (avcodec_open2(venc, vcodec, nullptr) < 0 ||
      avcodec_open2(aenc, acodec, nullptr) < 0) {
    set_err(err, errlen, "encoder open failed");
    avcodec_free_context(&venc);
    avcodec_free_context(&aenc);
    avformat_free_context(ofmt);
    return -1;
  }
  AVStream *vst = avformat_new_stream(ofmt, nullptr);
  avcodec_parameters_from_context(vst->codecpar, venc);
  vst->time_base = venc->time_base;
  AVStream *ast = avformat_new_stream(ofmt, nullptr);
  avcodec_parameters_from_context(ast->codecpar, aenc);
  ast->time_base = aenc->time_base;

  bool fail = false;
  if (!(ofmt->oformat->flags & AVFMT_NOFILE))
    fail = avio_open(&ofmt->pb, path, AVIO_FLAG_WRITE) < 0;
  if (!fail) {
    // nonzero ts_offset shifts every stream's timestamps (like a TS
    // capture whose streams do not start at zero) — used to test the
    // remux path's A/V alignment
    AVDictionary *mux_opts = nullptr;
    if (ts_offset > 0) {
      char buf[64];
      snprintf(buf, sizeof buf, "%f", ts_offset);
      av_dict_set(&mux_opts, "output_ts_offset", buf, 0);
    }
    fail = avformat_write_header(ofmt, &mux_opts) < 0;
    av_dict_free(&mux_opts);
  }

  AVPacket *pkt = av_packet_alloc();
  auto drain = [&](AVCodecContext *enc, AVStream *st,
                   AVRational tb) -> bool {
    for (;;) {
      int r = avcodec_receive_packet(enc, pkt);
      if (r == AVERROR(EAGAIN) || r == AVERROR_EOF)
        return true;
      if (r < 0)
        return false;
      pkt->stream_index = st->index;
      av_packet_rescale_ts(pkt, tb, st->time_base);
      if (av_interleaved_write_frame(ofmt, pkt) < 0)
        return false;
      av_packet_unref(pkt);
    }
  };

  int n_vframes = (int)(seconds * FPS);
  AVFrame *vf = av_frame_alloc();
  vf->format = AV_PIX_FMT_YUV420P;
  vf->width = W;
  vf->height = H;
  av_frame_get_buffer(vf, 0);
  for (int i = 0; i < n_vframes && !fail; i++) {
    av_frame_make_writable(vf);
    for (int y = 0; y < H; y++)
      for (int x = 0; x < W; x++)
        vf->data[0][y * vf->linesize[0] + x] =
            (uint8_t)((x + y + i * 4) & 0xff);
    memset(vf->data[1], 128, (size_t)vf->linesize[1] * H / 2);
    memset(vf->data[2], 128, (size_t)vf->linesize[2] * H / 2);
    vf->pts = i;
    fail = avcodec_send_frame(venc, vf) < 0 ||
           !drain(venc, vst, venc->time_base);
  }
  if (!fail) {
    avcodec_send_frame(venc, nullptr);
    fail = !drain(venc, vst, venc->time_base);
  }
  av_frame_free(&vf);

  // sine-sweep audio so the clip has real content to watermark
  int64_t n_aframes = (int64_t)(seconds * rate);
  int fs = aenc->frame_size > 0 ? aenc->frame_size : 1024;
  AVFrame *af = av_frame_alloc();
  int64_t pos = 0;
  double phase = 0.0;
  while (pos < n_aframes && !fail) {
    int nb = (int)(n_aframes - pos < fs ? n_aframes - pos : fs);
    af->nb_samples = nb;
    av_channel_layout_copy(&af->ch_layout, &aenc->ch_layout);
    af->format = AV_SAMPLE_FMT_FLTP;
    af->sample_rate = rate;
    av_frame_get_buffer(af, 0);
    for (int i = 0; i < nb; i++) {
      double t = (double)(pos + i) / rate;
      float v = (float)(0.25 * sin(phase + 2 * M_PI * (220 + 40 * t) * t));
      for (int c = 0; c < channels; c++)
        ((float *)af->data[c])[i] = v;
    }
    af->pts = pos;
    pos += nb;
    fail = avcodec_send_frame(aenc, af) < 0 ||
           !drain(aenc, ast, aenc->time_base);
    av_frame_unref(af);
  }
  if (!fail) {
    avcodec_send_frame(aenc, nullptr);
    fail = !drain(aenc, ast, aenc->time_base);
  }
  av_frame_free(&af);

  if (!fail)
    fail = av_write_trailer(ofmt) < 0;
  if (fail)
    set_err(err, errlen, "test video generation failed");
  av_packet_free(&pkt);
  avcodec_free_context(&venc);
  avcodec_free_context(&aenc);
  if (ofmt->pb && !(ofmt->oformat->flags & AVFMT_NOFILE))
    avio_closep(&ofmt->pb);
  avformat_free_context(ofmt);
  return fail ? -1 : 0;
}

}  // extern "C"
