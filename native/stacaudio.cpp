// stacaudio — in-process compressed-audio decode for the prep pipeline.
//
// The reference shells out to ffmpeg/sox/mpg123 to convert CommonVoice
// mp3 to 16 kHz wav (common_voice_prepare.py segment_audio; SURVEY.md
// §2.1). This module links the SAME decoders (libavformat/libavcodec/
// libswresample) directly into the process: no subprocess per clip, no
// temp wav files, and the decode loop releases the GIL so prep workers
// overlap. An encoder entry point exists so the decode path can be
// round-trip TESTED against real mp3 bytes wherever libmp3lame is
// present (it is in this image), and as a utility for building test
// fixtures.
//
// Exposed as a CPython extension (no pybind11 in this image), built
// optionally by setup.py: when the ffmpeg dev libraries are absent the
// extension is skipped and Python falls back to the CLI-tool
// auto-detection in prep/audio_convert.py.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/channel_layout.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
}

#include <cstring>
#include <string>
#include <vector>

namespace {

struct DecodeResult {
  std::vector<float> pcm;
  int sample_rate = 0;
  std::string error;
};

// Decode any libavformat-readable file to mono float32 at target_sr
// (target_sr == 0 keeps the native rate).
DecodeResult decode_file(const char* path, int target_sr) {
  DecodeResult res;
  AVFormatContext* fmt = nullptr;
  AVCodecContext* ctx = nullptr;
  SwrContext* swr = nullptr;
  AVPacket* pkt = nullptr;
  AVFrame* frame = nullptr;

  auto fail = [&](const std::string& msg) {
    res.error = msg;
    if (swr) swr_free(&swr);
    if (ctx) avcodec_free_context(&ctx);
    if (fmt) avformat_close_input(&fmt);
    if (pkt) av_packet_free(&pkt);
    if (frame) av_frame_free(&frame);
    return res;
  };

  if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0)
    return fail(std::string("cannot open ") + path);
  if (avformat_find_stream_info(fmt, nullptr) < 0)
    return fail("cannot read stream info");

  const AVCodec* dec = nullptr;
  int sidx = av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, &dec, 0);
  if (sidx < 0 || !dec) return fail("no audio stream");
  AVStream* st = fmt->streams[sidx];

  ctx = avcodec_alloc_context3(dec);
  if (!ctx || avcodec_parameters_to_context(ctx, st->codecpar) < 0)
    return fail("cannot init codec context");
  if (avcodec_open2(ctx, dec, nullptr) < 0) return fail("cannot open codec");
  if (ctx->ch_layout.nb_channels <= 0)
    av_channel_layout_default(&ctx->ch_layout, 1);

  const int out_sr = target_sr > 0 ? target_sr : ctx->sample_rate;
  AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
  if (swr_alloc_set_opts2(&swr, &mono, AV_SAMPLE_FMT_FLT, out_sr,
                          &ctx->ch_layout, ctx->sample_fmt,
                          ctx->sample_rate, 0, nullptr) < 0 ||
      swr_init(swr) < 0)
    return fail("cannot init resampler");

  pkt = av_packet_alloc();
  frame = av_frame_alloc();
  std::vector<float> buf;

  auto drain_frame = [&](AVFrame* f) {
    const int64_t in_n = f ? f->nb_samples : 0;
    const int64_t max_out = av_rescale_rnd(
        swr_get_delay(swr, ctx->sample_rate) + in_n, out_sr,
        ctx->sample_rate, AV_ROUND_UP) + 64;
    const size_t base = buf.size();
    buf.resize(base + static_cast<size_t>(max_out));
    uint8_t* outp = reinterpret_cast<uint8_t*>(buf.data() + base);
    const int got = swr_convert(
        swr, &outp, static_cast<int>(max_out),
        f ? const_cast<const uint8_t**>(f->extended_data) : nullptr,
        f ? f->nb_samples : 0);
    buf.resize(base + (got > 0 ? static_cast<size_t>(got) : 0));
    return got >= 0;
  };

  bool eof = false;
  while (!eof) {
    int r = av_read_frame(fmt, pkt);
    if (r < 0) {
      eof = true;
      avcodec_send_packet(ctx, nullptr);  // enter drain mode
    } else if (pkt->stream_index != sidx) {
      av_packet_unref(pkt);
      continue;
    } else {
      avcodec_send_packet(ctx, pkt);
      av_packet_unref(pkt);
    }
    while (true) {
      r = avcodec_receive_frame(ctx, frame);
      if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) break;
      if (r < 0) return fail("decode error");
      if (!drain_frame(frame)) return fail("resample error");
      av_frame_unref(frame);
    }
  }
  drain_frame(nullptr);  // flush the resampler tail

  res.pcm = std::move(buf);
  res.sample_rate = out_sr;
  swr_free(&swr);
  avcodec_free_context(&ctx);
  avformat_close_input(&fmt);
  av_packet_free(&pkt);
  av_frame_free(&frame);
  return res;
}

// decode(path: str, target_sr: int = 0) -> (bytes float32le mono, sr)
PyObject* py_decode(PyObject*, PyObject* args) {
  const char* path;
  int target_sr = 0;
  if (!PyArg_ParseTuple(args, "s|i", &path, &target_sr)) return nullptr;
  DecodeResult res;
  Py_BEGIN_ALLOW_THREADS
  res = decode_file(path, target_sr);
  Py_END_ALLOW_THREADS
  if (!res.error.empty()) {
    PyErr_SetString(PyExc_RuntimeError, res.error.c_str());
    return nullptr;
  }
  PyObject* bytes = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(res.pcm.data()),
      static_cast<Py_ssize_t>(res.pcm.size() * sizeof(float)));
  if (!bytes) return nullptr;
  PyObject* out = Py_BuildValue("(Ni)", bytes, res.sample_rate);
  return out;
}

std::string encode_file(const char* path, const float* pcm, int64_t n,
                        int sr, const char* codec_name, int64_t bit_rate) {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* ctx = nullptr;
  SwrContext* swr = nullptr;
  AVFrame* frame = nullptr;
  AVPacket* pkt = nullptr;
  std::string err;

  auto cleanup = [&]() {
    if (swr) swr_free(&swr);
    if (ctx) avcodec_free_context(&ctx);
    if (frame) av_frame_free(&frame);
    if (pkt) av_packet_free(&pkt);
    if (fmt) {
      if (!err.empty() || !(fmt->oformat->flags & AVFMT_NOFILE)) {
        if (fmt->pb) avio_closep(&fmt->pb);
      }
      avformat_free_context(fmt);
    }
  };
  auto fail = [&](const std::string& m) {
    err = m;
    cleanup();
    return err;
  };

  if (avformat_alloc_output_context2(&fmt, nullptr, nullptr, path) < 0)
    return fail(std::string("cannot infer container for ") + path);
  const AVCodec* enc = avcodec_find_encoder_by_name(codec_name);
  if (!enc) return fail(std::string("encoder not available: ") + codec_name);

  AVStream* st = avformat_new_stream(fmt, nullptr);
  ctx = avcodec_alloc_context3(enc);
  if (!st || !ctx) return fail("cannot alloc stream");
  ctx->sample_rate = sr;
  av_channel_layout_default(&ctx->ch_layout, 1);
  ctx->sample_fmt = AV_SAMPLE_FMT_FLTP;
  if (enc->sample_fmts) {  // pick a supported format, preferring fltp
    ctx->sample_fmt = enc->sample_fmts[0];
    for (const enum AVSampleFormat* f = enc->sample_fmts;
         *f != AV_SAMPLE_FMT_NONE; ++f)
      if (*f == AV_SAMPLE_FMT_FLTP) ctx->sample_fmt = AV_SAMPLE_FMT_FLTP;
  }
  ctx->bit_rate = bit_rate;
  if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
    ctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (avcodec_open2(ctx, enc, nullptr) < 0)
    return fail("cannot open encoder");
  if (avcodec_parameters_from_context(st->codecpar, ctx) < 0)
    return fail("cannot copy codec params");
  st->time_base = AVRational{1, sr};

  if (!(fmt->oformat->flags & AVFMT_NOFILE) &&
      avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0)
    return fail(std::string("cannot open output ") + path);
  if (avformat_write_header(fmt, nullptr) < 0)
    return fail("cannot write header");

  AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
  if (swr_alloc_set_opts2(&swr, &ctx->ch_layout, ctx->sample_fmt, sr,
                          &mono, AV_SAMPLE_FMT_FLT, sr, 0, nullptr) < 0 ||
      swr_init(swr) < 0)
    return fail("cannot init converter");

  const int fs = ctx->frame_size > 0 ? ctx->frame_size : 1024;
  frame = av_frame_alloc();
  pkt = av_packet_alloc();
  int64_t pos = 0, pts = 0;

  auto send_and_mux = [&](AVFrame* f) -> bool {
    if (avcodec_send_frame(ctx, f) < 0) return false;
    while (true) {
      int r = avcodec_receive_packet(ctx, pkt);
      if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) return true;
      if (r < 0) return false;
      av_packet_rescale_ts(pkt, ctx->time_base, st->time_base);
      pkt->stream_index = st->index;
      if (av_interleaved_write_frame(fmt, pkt) < 0) return false;
    }
  };

  while (pos < n) {
    const int chunk = static_cast<int>(std::min<int64_t>(fs, n - pos));
    av_frame_unref(frame);
    frame->nb_samples = fs;  // last frame zero-padded to the codec size
    av_channel_layout_copy(&frame->ch_layout, &ctx->ch_layout);
    frame->format = ctx->sample_fmt;
    frame->sample_rate = sr;
    if (av_frame_get_buffer(frame, 0) < 0) return fail("frame alloc");
    std::vector<float> padded(static_cast<size_t>(fs), 0.0f);
    std::memcpy(padded.data(), pcm + pos, chunk * sizeof(float));
    const uint8_t* inp = reinterpret_cast<const uint8_t*>(padded.data());
    if (swr_convert(swr, frame->extended_data, fs, &inp, fs) < 0)
      return fail("convert error");
    frame->pts = pts;
    pts += fs;
    if (!send_and_mux(frame)) return fail("encode error");
    pos += chunk;
  }
  if (!send_and_mux(nullptr)) return fail("encoder flush error");
  if (av_write_trailer(fmt) < 0) return fail("cannot write trailer");
  cleanup();
  return err;
}

// encode(path, pcm_f32le_bytes, sr, codec="libmp3lame", bit_rate=64000)
PyObject* py_encode(PyObject*, PyObject* args) {
  const char* path;
  Py_buffer buf;
  int sr;
  const char* codec = "libmp3lame";
  long long bit_rate = 64000;
  if (!PyArg_ParseTuple(args, "sy*i|sL", &path, &buf, &sr, &codec,
                        &bit_rate))
    return nullptr;
  std::string err;
  Py_BEGIN_ALLOW_THREADS
  err = encode_file(path, static_cast<const float*>(buf.buf),
                    static_cast<int64_t>(buf.len / sizeof(float)), sr,
                    codec, bit_rate);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&buf);
  if (!err.empty()) {
    PyErr_SetString(PyExc_RuntimeError, err.c_str());
    return nullptr;
  }
  Py_RETURN_NONE;
}

// has_encoder(name) -> bool
PyObject* py_has_encoder(PyObject*, PyObject* args) {
  const char* name;
  if (!PyArg_ParseTuple(args, "s", &name)) return nullptr;
  return PyBool_FromLong(avcodec_find_encoder_by_name(name) != nullptr);
}

PyObject* py_version(PyObject*, PyObject*) {
  return PyUnicode_FromFormat("avformat=%u avcodec=%u swresample=%u",
                              avformat_version(), avcodec_version(),
                              swresample_version());
}

PyMethodDef Methods[] = {
    {"decode", py_decode, METH_VARARGS,
     "decode(path, target_sr=0) -> (float32le mono bytes, sr)"},
    {"encode", py_encode, METH_VARARGS,
     "encode(path, pcm_f32le, sr, codec='libmp3lame', bit_rate=64000)"},
    {"has_encoder", py_has_encoder, METH_VARARGS,
     "has_encoder(name) -> bool"},
    {"version", py_version, METH_NOARGS, "linked ffmpeg lib versions"},
    {nullptr, nullptr, 0, nullptr},
};

struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_stacaudio",
    "in-process compressed-audio decode via libav*", -1, Methods,
    nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit__stacaudio(void) { return PyModule_Create(&moduledef); }
