// stacnative — native host-side runtime for the TPU speech-translation stack.
//
// Re-owns, in C++, the host hot paths the reference delegates to native
// libraries (SURVEY.md §2.2): audio decode (torchaudio/sox — used by every
// prep script and dataloader worker), polyphase resampling (SpeechBrain
// Resample / speed perturb), SentencePiece's C++ BPE encoder
// (dataio_and_utils.py:54-64 tokenizes every utterance), and the
// Levenshtein core of WER scoring (ErrorRateStats).
//
// Exposed as a CPython extension (no pybind11 in this image). All entry
// points release the GIL around the heavy loops so the data-loader thread
// overlaps with device compute.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

// ------------------------------------------------------------------ audio

// µ-law expansion (G.711), matching the numpy reference implementation.
static inline int16_t ulaw_to_pcm16(uint8_t u) {
  u = ~u;
  int sign = u & 0x80;
  int exponent = (u >> 4) & 0x07;
  int mantissa = u & 0x0F;
  int sample = ((mantissa << 3) + 0x84) << exponent;
  sample -= 0x84;
  return static_cast<int16_t>(sign ? -sample : sample);
}

static inline int16_t alaw_to_pcm16(uint8_t a) {
  a ^= 0x55;
  int sign = a & 0x80;
  int exponent = (a >> 4) & 0x07;
  int mantissa = a & 0x0F;
  int sample = exponent == 0 ? (mantissa << 4) + 8
                             : ((mantissa << 4) + 0x108)
                                   << (exponent > 1 ? exponent - 1 : 0);
  return static_cast<int16_t>(sign ? -sample : sample);
}

// pcm16_to_float(bytes, big_endian) -> bytes (float32 little-endian)
static PyObject* pcm16_to_float(PyObject*, PyObject* args) {
  Py_buffer buf;
  int big_endian = 0;
  if (!PyArg_ParseTuple(args, "y*|i", &buf, &big_endian)) return nullptr;
  const size_t n = buf.len / 2;
  PyObject* out = PyBytes_FromStringAndSize(nullptr, n * 4);
  if (!out) {
    PyBuffer_Release(&buf);
    return nullptr;
  }
  float* dst = reinterpret_cast<float*>(PyBytes_AS_STRING(out));
  const uint8_t* src = static_cast<const uint8_t*>(buf.buf);
  Py_BEGIN_ALLOW_THREADS
  for (size_t i = 0; i < n; ++i) {
    int16_t v = big_endian
                    ? static_cast<int16_t>((src[2 * i] << 8) | src[2 * i + 1])
                    : static_cast<int16_t>(src[2 * i] | (src[2 * i + 1] << 8));
    dst[i] = static_cast<float>(v) / 32768.0f;
  }
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&buf);
  return out;
}

// ulaw_to_float(bytes) -> bytes(float32); alaw_to_float(bytes) likewise
template <int16_t (*Decode)(uint8_t)>
static PyObject* law_to_float(PyObject*, PyObject* args) {
  Py_buffer buf;
  if (!PyArg_ParseTuple(args, "y*", &buf)) return nullptr;
  const size_t n = buf.len;
  PyObject* out = PyBytes_FromStringAndSize(nullptr, n * 4);
  if (!out) {
    PyBuffer_Release(&buf);
    return nullptr;
  }
  float* dst = reinterpret_cast<float*>(PyBytes_AS_STRING(out));
  const uint8_t* src = static_cast<const uint8_t*>(buf.buf);
  Py_BEGIN_ALLOW_THREADS
  for (size_t i = 0; i < n; ++i)
    dst[i] = static_cast<float>(Decode(src[i])) / 32768.0f;
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&buf);
  return out;
}

// ----------------------------------------------------------- resampling
// Kaiser-windowed-sinc polyphase resampler (scipy resample_poly family).

static double bessel_i0(double x) {
  double sum = 1.0, term = 1.0;
  for (int k = 1; k < 64; ++k) {
    term *= (x / (2.0 * k)) * (x / (2.0 * k));
    sum += term;
    if (term < 1e-16 * sum) break;
  }
  return sum;
}

// resample_poly(float32 bytes, up, down) -> float32 bytes
static PyObject* resample_poly_native(PyObject*, PyObject* args) {
  Py_buffer buf;
  int up, down;
  if (!PyArg_ParseTuple(args, "y*ii", &buf, &up, &down)) return nullptr;
  const size_t n_in = buf.len / 4;
  const float* x = static_cast<const float*>(buf.buf);

  // filter design: cutoff at min(1/up, 1/down), Kaiser beta 5.0,
  // half-width 10 zero crossings per phase (scipy default window=("kaiser",5))
  const int half = 10 * std::max(up, down);
  const int ntaps = 2 * half + 1;
  const double cutoff = 0.5 / std::max(up, down);
  const double beta = 5.0;

  std::vector<double> h(ntaps);
  const double i0b = bessel_i0(beta);
  for (int i = 0; i < ntaps; ++i) {
    const double m = i - half;
    double sinc = (m == 0) ? 2.0 * cutoff
                           : std::sin(2.0 * M_PI * cutoff * m) / (M_PI * m);
    const double r = m / half;
    const double w = bessel_i0(beta * std::sqrt(std::max(0.0, 1.0 - r * r))) / i0b;
    h[i] = sinc * w * up;
  }

  const size_t n_out = (n_in * static_cast<size_t>(up) + down - 1) / down;
  PyObject* out = PyBytes_FromStringAndSize(nullptr, n_out * 4);
  if (!out) {
    PyBuffer_Release(&buf);
    return nullptr;
  }
  float* y = reinterpret_cast<float*>(PyBytes_AS_STRING(out));

  Py_BEGIN_ALLOW_THREADS
  for (size_t j = 0; j < n_out; ++j) {
    // output sample j draws from upsampled index j*down
    const long long t = static_cast<long long>(j) * down;
    double acc = 0.0;
    // x[k] contributes via h[t - k*up + half]
    long long k_lo = (t - half + up - 1) / up;   // ceil((t-half)/up)
    long long k_hi = (t + half) / up;            // floor((t+half)/up)
    if (k_lo < 0) k_lo = 0;
    if (k_hi >= static_cast<long long>(n_in)) k_hi = n_in - 1;
    for (long long k = k_lo; k <= k_hi; ++k) {
      const long long tap = t - k * up + half;
      acc += static_cast<double>(x[k]) * h[tap];
    }
    y[j] = static_cast<float>(acc);
  }
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&buf);
  return out;
}

// -------------------------------------------------------- edit distance

// edit_stats(ref: list[str], hyp: list[str]) -> (ins, del, sub)
static PyObject* edit_stats(PyObject*, PyObject* args) {
  PyObject *ref_list, *hyp_list;
  if (!PyArg_ParseTuple(args, "OO", &ref_list, &hyp_list)) return nullptr;
  std::vector<std::string> ref, hyp;
  const Py_ssize_t nr = PySequence_Size(ref_list);
  const Py_ssize_t nh = PySequence_Size(hyp_list);
  ref.reserve(nr);
  hyp.reserve(nh);
  for (Py_ssize_t i = 0; i < nr; ++i) {
    PyObject* item = PySequence_GetItem(ref_list, i);
    ref.emplace_back(PyUnicode_AsUTF8(item));
    Py_DECREF(item);
  }
  for (Py_ssize_t i = 0; i < nh; ++i) {
    PyObject* item = PySequence_GetItem(hyp_list, i);
    hyp.emplace_back(PyUnicode_AsUTF8(item));
    Py_DECREF(item);
  }

  int ins = 0, del = 0, sub = 0;
  Py_BEGIN_ALLOW_THREADS {
    const size_t n = ref.size(), m = hyp.size();
    // cost encodes (edits, ins, del, sub) for backtrace-free tallying
    struct Cell { int d, i, del_, s; };
    std::vector<Cell> prev(m + 1), cur(m + 1);
    for (size_t j = 0; j <= m; ++j) prev[j] = {static_cast<int>(j),
                                               static_cast<int>(j), 0, 0};
    for (size_t i = 1; i <= n; ++i) {
      cur[0] = {static_cast<int>(i), 0, static_cast<int>(i), 0};
      for (size_t j = 1; j <= m; ++j) {
        const bool eq = ref[i - 1] == hyp[j - 1];
        const Cell& diag = prev[j - 1];
        const Cell& up = prev[j];
        const Cell& left = cur[j - 1];
        Cell best = {diag.d + (eq ? 0 : 1), diag.i, diag.del_,
                     diag.s + (eq ? 0 : 1)};
        if (left.d + 1 < best.d)
          best = {left.d + 1, left.i + 1, left.del_, left.s};
        if (up.d + 1 < best.d)
          best = {up.d + 1, up.i, up.del_ + 1, up.s};
        cur[j] = best;
      }
      std::swap(prev, cur);
    }
    ins = prev[m].i;
    del = prev[m].del_;
    sub = prev[m].s;
  }
  Py_END_ALLOW_THREADS
  return Py_BuildValue("(iii)", ins, del, sub);
}

// ------------------------------------------------------------ BPE encode

struct BpeVocab {
  std::unordered_map<std::string, int> piece_to_id;
  std::unordered_map<std::string, float> scores;
};

static std::unordered_map<long long, BpeVocab> g_vocabs;
static long long g_next_vocab = 1;

// bpe_load(pieces: list[str], scores: list[float]) -> handle
static PyObject* bpe_load(PyObject*, PyObject* args) {
  PyObject *pieces, *scores;
  if (!PyArg_ParseTuple(args, "OO", &pieces, &scores)) return nullptr;
  BpeVocab vocab;
  const Py_ssize_t n = PySequence_Size(pieces);
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject* p = PySequence_GetItem(pieces, i);
    PyObject* s = PySequence_GetItem(scores, i);
    std::string piece = PyUnicode_AsUTF8(p);
    if (!vocab.piece_to_id.count(piece)) {
      vocab.piece_to_id[piece] = static_cast<int>(i);
      vocab.scores[piece] = static_cast<float>(PyFloat_AsDouble(s));
    }
    Py_DECREF(p);
    Py_DECREF(s);
  }
  const long long handle = g_next_vocab++;
  g_vocabs[handle] = std::move(vocab);
  return PyLong_FromLongLong(handle);
}

// greedy highest-score merge (SentencePiece bpe_model semantics); the input
// is one pre-normalized segment with no user-defined symbols inside.
static void bpe_segment(const BpeVocab& vocab, const std::string& text,
                        int unk_id, std::vector<int>* out) {
  // split into UTF-8 characters
  std::vector<std::string> syms;
  for (size_t i = 0; i < text.size();) {
    size_t len = 1;
    const uint8_t c = text[i];
    if (c >= 0xF0) len = 4;
    else if (c >= 0xE0) len = 3;
    else if (c >= 0xC0) len = 2;
    syms.push_back(text.substr(i, len));
    i += len;
  }
  const int n = static_cast<int>(syms.size());
  if (n == 0) return;
  std::vector<int> nxt(n), prv(n);
  std::vector<char> alive(n, 1);
  for (int i = 0; i < n; ++i) {
    nxt[i] = i + 1;
    prv[i] = i - 1;
  }
  using Entry = std::tuple<float, int, std::string>;  // (-score, pos, merged)
  auto cmp = [](const Entry& a, const Entry& b) { return a > b; };
  std::priority_queue<Entry, std::vector<Entry>, decltype(cmp)> heap(cmp);
  auto push = [&](int i) {
    const int j = nxt[i];
    if (j >= n) return;
    const std::string merged = syms[i] + syms[j];
    auto it = vocab.scores.find(merged);
    if (it != vocab.scores.end()) heap.emplace(-it->second, i, merged);
  };
  for (int i = 0; i < n - 1; ++i) push(i);
  while (!heap.empty()) {
    auto [neg, i, merged] = heap.top();
    heap.pop();
    if (!alive[i]) continue;
    const int j = nxt[i];
    if (j >= n || !alive[j] || syms[i] + syms[j] != merged) continue;
    syms[i] = merged;
    alive[j] = 0;
    nxt[i] = nxt[j];
    if (nxt[i] < n) prv[nxt[i]] = i;
    push(i);
    if (prv[i] >= 0) push(prv[i]);
  }
  for (int i = 0; i < n; i = nxt[i]) {
    if (!alive[i]) break;  // unreachable: traversal follows alive chain
    auto it = vocab.piece_to_id.find(syms[i]);
    if (it != vocab.piece_to_id.end()) {
      out->push_back(it->second);
    } else {
      // unknown: per original character
      const std::string& s = syms[i];
      for (size_t k = 0; k < s.size();) {
        size_t len = 1;
        const uint8_t c = s[k];
        if (c >= 0xF0) len = 4;
        else if (c >= 0xE0) len = 3;
        else if (c >= 0xC0) len = 2;
        auto cit = vocab.piece_to_id.find(s.substr(k, len));
        out->push_back(cit != vocab.piece_to_id.end() ? cit->second : unk_id);
        k += len;
      }
    }
  }
}

// bpe_encode(handle, segment, unk_id) -> list[int]
static PyObject* bpe_encode(PyObject*, PyObject* args) {
  long long handle;
  const char* text;
  int unk_id;
  if (!PyArg_ParseTuple(args, "Lsi", &handle, &text, &unk_id)) return nullptr;
  auto it = g_vocabs.find(handle);
  if (it == g_vocabs.end()) {
    PyErr_SetString(PyExc_ValueError, "unknown BPE vocab handle");
    return nullptr;
  }
  std::vector<int> ids;
  std::string owned(text);
  Py_BEGIN_ALLOW_THREADS
  bpe_segment(it->second, owned, unk_id, &ids);
  Py_END_ALLOW_THREADS
  PyObject* out = PyList_New(ids.size());
  for (size_t i = 0; i < ids.size(); ++i)
    PyList_SET_ITEM(out, i, PyLong_FromLong(ids[i]));
  return out;
}

static PyMethodDef Methods[] = {
    {"pcm16_to_float", pcm16_to_float, METH_VARARGS,
     "PCM16 bytes -> float32 bytes"},
    {"ulaw_to_float", law_to_float<ulaw_to_pcm16>, METH_VARARGS,
     "mu-law bytes -> float32 bytes"},
    {"alaw_to_float", law_to_float<alaw_to_pcm16>, METH_VARARGS,
     "A-law bytes -> float32 bytes"},
    {"resample_poly", resample_poly_native, METH_VARARGS,
     "polyphase resample float32 bytes by up/down"},
    {"edit_stats", edit_stats, METH_VARARGS,
     "(ref words, hyp words) -> (ins, del, sub)"},
    {"bpe_load", bpe_load, METH_VARARGS, "load BPE vocab -> handle"},
    {"bpe_encode", bpe_encode, METH_VARARGS,
     "(handle, segment, unk_id) -> ids"},
    {nullptr, nullptr, 0, nullptr},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_stacnative",
    "Native host runtime: audio decode, resample, BPE, edit distance",
    -1, Methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__stacnative(void) { return PyModule_Create(&moduledef); }
