// Native serving front for dl_vqa_tpu (serve.py --native-front).
//
// The measured saturation wall of the Python daemon on a small host is
// NOT the device: it is the host core spending per-request time in
// Python — ThreadingHTTPServer spawn/parse, json, base64, PIL decode,
// tokenization (docs/SERVING.md load table). This library moves the
// entire per-request path into C++ threads:
//
//   HTTP accept/parse -> JSON body parse -> base64 decode -> in-memory
//   JPEG decode + PIL-parity resize/crop (transform.h) -> reference
//   tokenizer -> bounded request queue -> batch assembly (coalescing
//   window) -> [Python: ONE jitted forward per batch] -> response
//   formatting + socket writes.
//
// Python's role shrinks to the only thing that must be Python: the JAX
// dispatch loop. It blocks in vqa_front_next_batch (ctypes releases the
// GIL), runs the jitted u8-input forward (normalize + softmax + top-k
// in-graph), and returns the top-k ids/probs via vqa_front_complete.
// No Python runs per request — only per batch.
//
// Semantics mirrored from serve.py / predict.py (kept behaviorally
// identical so the native front is a drop-in):
//   * tokenizer: predict.Predictor.encode_questions — append '?' if
//     missing, lowercase, strip the '?', split on SINGLE spaces, vocab
//     lookup with 0 for unknown, clamp to max_question_length tokens,
//     length = max(n_tokens, 1). (Lowercasing is ASCII-only here;
//     Python's str.lower also lowers non-ASCII, but the training vocab
//     is built from lowered text so uppercase non-ASCII maps to
//     <unknown> on both paths in practice.)
//   * queueing: bounded queue -> 503 + `rejected` counter when full;
//     per-request timeout -> 504 + `timeouts`, with the entry marked
//     abandoned so the batcher drops it instead of running a zombie
//     forward; dispatch errors -> 500 + `errors` for the whole batch.
//   * metrics: same counter names as BatchingService.metrics() plus
//     latency p50/p99 over a bounded window.
//   * batching: wait for the first request, then coalesce stragglers up
//     to the window / max_batch. (Bucket padding happens on the Python
//     side, where the jitted shapes live.)
//
// Deltas from the Python front (documented in docs/SERVING.md): images
// must be JPEG (PNG/BMP get 415 — there is no PIL here), and top_k is
// capped by the in-graph lax.top_k width (400 above the cap).
//
// C ABI (ctypes-friendly; see dl_vqa_tpu/utils/native_front.py):
//   vqa_front_start(...)            -> 0 / error code
//   vqa_front_port()                -> bound port (after start)
//   vqa_front_set_question_vocab(words_blob, ids, n)   words '\n'-joined
//   vqa_front_set_answers(blob, n)  line i <-> 1-based answer id i+1
//   vqa_front_set_backend(name)     /healthz "backend" string
//   vqa_front_set_gauge(name, v)    extra integer metric (warmed_buckets)
//   vqa_front_generation()         -> id of the live front (see Front)
//   vqa_front_next_batch(generation, images_u8, questions_i32,
//                        lengths_i32, topks_i32, out_n, timeout_ms)
//                        -> batch_id, -1 on timeout, -2 after stop or
//                        on a generation mismatch
//   vqa_front_complete(generation, batch_id, topk_idx, topk_prob, k)
//   vqa_front_fail(generation, batch_id, message) -> 0/err
//   vqa_front_metrics_json(buf, len)
//   vqa_front_stop()
//   vqa_front_tokenize(question, out_ids, max_len) -> length (test hook)

#include <arpa/inet.h>
#include <netdb.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/socket.h>
#include <unistd.h>

#include <algorithm>
#include <atomic>
#include <cerrno>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <tuple>
#include <map>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

#include "transform.h"

namespace {

using Clock = std::chrono::steady_clock;

// ---------------------------------------------------------------- base64

// Lenient base64 decode mirroring Python's base64.b64decode default
// (validate=False): characters outside the alphabet are discarded;
// decoding stops at the first '='. Returns false only when the number
// of significant characters is not a valid base64 length.
struct Base64Table {
  int8_t v[256];
  Base64Table() {
    std::memset(v, -1, sizeof(v));
    const char* alphabet =
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";
    for (int i = 0; i < 64; ++i) v[uint8_t(alphabet[i])] = int8_t(i);
  }
};

bool Base64Decode(const char* in, size_t len, std::vector<uint8_t>* out) {
  // Magic static: thread-safe one-time init (concurrent first requests
  // previously raced on a check-then-write flag).
  static const Base64Table table;
  out->clear();
  out->reserve(len / 4 * 3);
  uint32_t acc = 0;
  int bits = 0;
  for (size_t i = 0; i < len; ++i) {
    const char c = in[i];
    if (c == '=') break;
    const int8_t v = table.v[uint8_t(c)];
    if (v < 0) continue;  // discard non-alphabet (Python default)
    acc = (acc << 6) | uint32_t(v);
    bits += 6;
    if (bits >= 8) {
      bits -= 8;
      out->push_back(uint8_t((acc >> bits) & 0xFF));
    }
  }
  // Valid base64 leaves 0, 2 ("==") or 4 ("=") spare bits — 6 spare bits
  // means a lone trailing character, which Python rejects.
  return bits != 6;
}

// ------------------------------------------------------------- JSON in

// Minimal JSON value for a flat request object. Nested containers are
// structurally skipped (kind OTHER) — the request schema has none.
struct JsonValue {
  enum Kind { STR, NUM, BOOL, NUL, OTHER } kind = NUL;
  std::string str;
  double num = 0.0;
  bool boolean = false;
};

struct JsonParser {
  const char* p;
  const char* end;
  std::string err;

  void SkipWs() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r'))
      ++p;
  }

  bool Fail(const char* what) {
    if (err.empty()) err = what;
    return false;
  }

  bool ParseString(std::string* out) {
    if (p >= end || *p != '"') return Fail("expected string");
    ++p;
    out->clear();
    while (p < end) {
      const char c = *p++;
      if (c == '"') return true;
      if (c == '\\') {
        if (p >= end) return Fail("bad escape");
        const char e = *p++;
        switch (e) {
          case '"': out->push_back('"'); break;
          case '\\': out->push_back('\\'); break;
          case '/': out->push_back('/'); break;
          case 'b': out->push_back('\b'); break;
          case 'f': out->push_back('\f'); break;
          case 'n': out->push_back('\n'); break;
          case 'r': out->push_back('\r'); break;
          case 't': out->push_back('\t'); break;
          case 'u': {
            if (end - p < 4) return Fail("bad \\u escape");
            uint32_t cp = 0;
            for (int i = 0; i < 4; ++i) {
              const char h = *p++;
              cp <<= 4;
              if (h >= '0' && h <= '9') cp |= uint32_t(h - '0');
              else if (h >= 'a' && h <= 'f') cp |= uint32_t(h - 'a' + 10);
              else if (h >= 'A' && h <= 'F') cp |= uint32_t(h - 'A' + 10);
              else return Fail("bad \\u escape");
            }
            // Surrogate pair -> code point.
            if (cp >= 0xD800 && cp <= 0xDBFF && end - p >= 6 && p[0] == '\\' &&
                p[1] == 'u') {
              uint32_t lo = 0;
              bool ok = true;
              for (int i = 2; i < 6; ++i) {
                const char h = p[i];
                lo <<= 4;
                if (h >= '0' && h <= '9') lo |= uint32_t(h - '0');
                else if (h >= 'a' && h <= 'f') lo |= uint32_t(h - 'a' + 10);
                else if (h >= 'A' && h <= 'F') lo |= uint32_t(h - 'A' + 10);
                else { ok = false; break; }
              }
              if (ok && lo >= 0xDC00 && lo <= 0xDFFF) {
                cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00);
                p += 6;
              }
            }
            // UTF-8 encode.
            if (cp < 0x80) {
              out->push_back(char(cp));
            } else if (cp < 0x800) {
              out->push_back(char(0xC0 | (cp >> 6)));
              out->push_back(char(0x80 | (cp & 0x3F)));
            } else if (cp < 0x10000) {
              out->push_back(char(0xE0 | (cp >> 12)));
              out->push_back(char(0x80 | ((cp >> 6) & 0x3F)));
              out->push_back(char(0x80 | (cp & 0x3F)));
            } else {
              out->push_back(char(0xF0 | (cp >> 18)));
              out->push_back(char(0x80 | ((cp >> 12) & 0x3F)));
              out->push_back(char(0x80 | ((cp >> 6) & 0x3F)));
              out->push_back(char(0x80 | (cp & 0x3F)));
            }
            break;
          }
          default:
            return Fail("bad escape");
        }
      } else {
        out->push_back(c);
      }
    }
    return Fail("unterminated string");
  }

  // Skip any JSON value (for nested containers we don't consume).
  bool SkipValue() {
    SkipWs();
    if (p >= end) return Fail("truncated value");
    if (*p == '"') {
      std::string sink;
      return ParseString(&sink);
    }
    if (*p == '{' || *p == '[') {
      const char open = *p;
      const char close = open == '{' ? '}' : ']';
      int depth = 0;
      while (p < end) {
        if (*p == '"') {
          std::string sink;
          if (!ParseString(&sink)) return false;
          continue;
        }
        if (*p == open) ++depth;
        if (*p == close && --depth == 0) {
          ++p;
          return true;
        }
        ++p;
      }
      return Fail("unbalanced container");
    }
    // number / true / false / null
    while (p < end && *p != ',' && *p != '}' && *p != ']' && *p != ' ' &&
           *p != '\t' && *p != '\n' && *p != '\r')
      ++p;
    return true;
  }

  bool ParseValue(JsonValue* v) {
    SkipWs();
    if (p >= end) return Fail("truncated value");
    if (*p == '"') {
      v->kind = JsonValue::STR;
      return ParseString(&v->str);
    }
    if (*p == '{' || *p == '[') {
      v->kind = JsonValue::OTHER;
      return SkipValue();
    }
    if (end - p >= 4 && std::strncmp(p, "true", 4) == 0) {
      v->kind = JsonValue::BOOL;
      v->boolean = true;
      p += 4;
      return true;
    }
    if (end - p >= 5 && std::strncmp(p, "false", 5) == 0) {
      v->kind = JsonValue::BOOL;
      v->boolean = false;
      p += 5;
      return true;
    }
    if (end - p >= 4 && std::strncmp(p, "null", 4) == 0) {
      v->kind = JsonValue::NUL;
      p += 4;
      return true;
    }
    char* numend = nullptr;
    v->num = std::strtod(p, &numend);
    if (numend == p || numend > end) return Fail("bad number");
    v->kind = JsonValue::NUM;
    p = numend;
    return true;
  }
};

// Parse the top-level request object into key -> value.
bool ParseJsonObject(const std::string& body,
                     std::map<std::string, JsonValue>* out, std::string* err) {
  JsonParser jp{body.data(), body.data() + body.size(), {}};
  jp.SkipWs();
  if (jp.p >= jp.end || *jp.p != '{') {
    *err = "body must be a JSON object";
    return false;
  }
  ++jp.p;
  jp.SkipWs();
  if (jp.p < jp.end && *jp.p == '}') return true;
  while (true) {
    jp.SkipWs();
    std::string key;
    if (!jp.ParseString(&key)) { *err = jp.err; return false; }
    jp.SkipWs();
    if (jp.p >= jp.end || *jp.p != ':') { *err = "expected ':'"; return false; }
    ++jp.p;
    JsonValue v;
    if (!jp.ParseValue(&v)) { *err = jp.err; return false; }
    (*out)[key] = std::move(v);
    jp.SkipWs();
    if (jp.p < jp.end && *jp.p == ',') { ++jp.p; continue; }
    if (jp.p < jp.end && *jp.p == '}') return true;
    *err = "expected ',' or '}'";
    return false;
  }
}

// ------------------------------------------------------------ JSON out

void AppendJsonEscaped(std::string* out, const std::string& s) {
  out->push_back('"');
  for (const char c : s) {
    switch (c) {
      case '"': *out += "\\\""; break;
      case '\\': *out += "\\\\"; break;
      case '\b': *out += "\\b"; break;
      case '\f': *out += "\\f"; break;
      case '\n': *out += "\\n"; break;
      case '\r': *out += "\\r"; break;
      case '\t': *out += "\\t"; break;
      default:
        if (uint8_t(c) < 0x20) {
          char buf[8];
          std::snprintf(buf, sizeof(buf), "\\u%04x", c);
          *out += buf;
        } else {
          out->push_back(c);
        }
    }
  }
  out->push_back('"');
}

std::string ErrorBody(const std::string& message) {
  std::string out = "{\"error\": ";
  AppendJsonEscaped(&out, message);
  out += "}";
  return out;
}

// ------------------------------------------------------------- request

struct Request {
  std::vector<uint8_t> image;    // [image_size, image_size, 3] u8 HWC
  std::vector<int32_t> tokens;   // [max_question_length]
  int32_t length = 1;
  int32_t top_k = 5;
  Clock::time_point enqueued;

  std::mutex mu;
  std::condition_variable cv;
  bool done = false;
  bool abandoned = false;
  int status = 0;
  std::string body;
};

using RequestPtr = std::shared_ptr<Request>;

// --------------------------------------------------------------- front

struct Front {
  // Process-global front instances are replaced by stop+start; every
  // batch-side ABI call carries the generation it was created against so
  // a stale dispatch thread (whose Python-side buffers are sized for the
  // OLD config) can never copy into buffers sized for a replaced front.
  int64_t generation = 0;

  // config
  int image_size = 224;
  double central_fraction = 0.875;
  int max_batch = 64;
  int window_us = 5000;
  int max_queue = 512;
  int max_question_length = 23;
  int topk_cap = 16;
  double request_timeout_s = 300.0;
  int max_conns = 512;

  // Immutable once the matching _set flag is true. The listener starts
  // accepting before Python uploads these, so /v1/answer returns 503
  // until both flags are set (the atomics order the map/vector writes
  // before any reader that observes true).
  std::unordered_map<std::string, int32_t> question_vocab;
  std::vector<std::string> answers;  // index i <-> 1-based answer id i+1
  std::atomic<bool> vocab_set{false};
  std::atomic<bool> answers_set{false};

  // listener
  int listen_fd = -1;
  int port = 0;
  std::atomic<int> open_conns{0};
  std::atomic<bool> stopping{false};

  // healthz
  std::mutex meta_mu;
  std::string backend = "unknown";

  // request queue
  std::mutex qmu;
  std::condition_variable qcv;
  std::deque<RequestPtr> queue;

  // in-flight batches (assembled, awaiting Python complete/fail)
  std::mutex inflight_mu;
  int64_t next_batch_id = 1;
  std::unordered_map<int64_t, std::vector<RequestPtr>> inflight;

  // metrics (names mirror serve.BatchingService.stats)
  std::mutex mmu;
  int64_t requests = 0, batches = 0, batched_requests = 0;
  int64_t errors = 0, timeouts = 0, rejected = 0;
  std::map<std::string, int64_t> gauges;
  std::deque<double> latencies_ms;  // bounded window, like the Python side

  // The accept thread runs detached holding its own shared_ptr, so the
  // destructor may run ON that thread after it drops the last reference —
  // it must never join. Closing the (already shut-down) listener is all
  // the cleanup there is.
  ~Front() {
    if (listen_fd >= 0) ::close(listen_fd);
  }
};

std::mutex g_front_mu;
std::shared_ptr<Front> g_front;

std::shared_ptr<Front> GetFront() {
  std::lock_guard<std::mutex> lk(g_front_mu);
  return g_front;
}

// ------------------------------------------------------------ tokenizer

// predict.Predictor.encode_questions semantics (see file docstring).
int32_t Tokenize(const Front& f, const std::string& question, int32_t* ids) {
  std::string s = question;
  if (s.empty() || s.back() != '?') s.push_back('?');
  s.pop_back();
  for (char& c : s)
    if (c >= 'A' && c <= 'Z') c = char(c + 32);

  std::memset(ids, 0, sizeof(int32_t) * size_t(f.max_question_length));
  int n = 0;
  size_t start = 0;
  for (size_t i = 0; i <= s.size() && n < f.max_question_length; ++i) {
    if (i == s.size() || s[i] == ' ') {
      const std::string token = s.substr(start, i - start);
      const auto it = f.question_vocab.find(token);
      ids[n++] = it == f.question_vocab.end() ? 0 : it->second;
      start = i + 1;
    }
  }
  return n < 1 ? 1 : int32_t(n);
}

// ----------------------------------------------------------------- http

bool SendAll(int fd, const char* data, size_t len) {
  size_t off = 0;
  while (off < len) {
    const ssize_t n = ::send(fd, data + off, len - off, MSG_NOSIGNAL);
    if (n < 0) {
      if (errno == EINTR) continue;
      return false;
    }
    off += size_t(n);
  }
  return true;
}

const char* StatusText(int code) {
  switch (code) {
    case 200: return "OK";
    case 400: return "Bad Request";
    case 404: return "Not Found";
    case 408: return "Request Timeout";
    case 413: return "Payload Too Large";
    case 415: return "Unsupported Media Type";
    case 500: return "Internal Server Error";
    case 503: return "Service Unavailable";
    case 504: return "Gateway Timeout";
    default: return "Error";
  }
}

bool WriteResponse(int fd, int code, const std::string& body, bool keep_alive) {
  char head[256];
  const int n = std::snprintf(
      head, sizeof(head),
      "HTTP/1.1 %d %s\r\nContent-Type: application/json\r\n"
      "Content-Length: %zu\r\nConnection: %s\r\n\r\n",
      code, StatusText(code), body.size(), keep_alive ? "keep-alive" : "close");
  if (n < 0 || n >= int(sizeof(head))) return false;
  return SendAll(fd, head, size_t(n)) && SendAll(fd, body.data(), body.size());
}

std::string LowerAscii(std::string s) {
  for (char& c : s)
    if (c >= 'A' && c <= 'Z') c = char(c + 32);
  return s;
}

constexpr size_t kMaxHeaderBytes = 64 << 10;
constexpr size_t kMaxBodyBytes = 32 << 20;  // serve.py MAX_BODY_BYTES

struct HttpRequest {
  std::string method;
  std::string path;
  std::string version;
  std::map<std::string, std::string> headers;  // lower-cased names
  std::string body;
  bool keep_alive = false;
};

// Read one HTTP request from fd using `carry` as the cross-request read
// buffer (keep-alive leftovers). Returns 0 on success, -1 on clean EOF /
// connection drop, or an HTTP status code the caller should reply with.
int ReadRequest(int fd, std::string* carry, HttpRequest* req) {
  // --- headers
  size_t header_end;
  while ((header_end = carry->find("\r\n\r\n")) == std::string::npos) {
    if (carry->size() > kMaxHeaderBytes) return 400;
    char buf[8192];
    const ssize_t n = ::recv(fd, buf, sizeof(buf), 0);
    if (n <= 0) return -1;  // EOF or timeout: drop the connection
    carry->append(buf, size_t(n));
  }
  const std::string head = carry->substr(0, header_end);
  carry->erase(0, header_end + 4);

  // request line
  size_t line_end = head.find("\r\n");
  const std::string line =
      line_end == std::string::npos ? head : head.substr(0, line_end);
  {
    const size_t sp1 = line.find(' ');
    const size_t sp2 = line.rfind(' ');
    if (sp1 == std::string::npos || sp2 == sp1) return 400;
    req->method = line.substr(0, sp1);
    req->path = line.substr(sp1 + 1, sp2 - sp1 - 1);
    req->version = line.substr(sp2 + 1);
  }

  // header fields
  size_t pos = line_end == std::string::npos ? head.size() : line_end + 2;
  while (pos < head.size()) {
    size_t eol = head.find("\r\n", pos);
    if (eol == std::string::npos) eol = head.size();
    const std::string field = head.substr(pos, eol - pos);
    pos = eol + 2;
    const size_t colon = field.find(':');
    if (colon == std::string::npos) continue;
    std::string name = LowerAscii(field.substr(0, colon));
    size_t vstart = colon + 1;
    while (vstart < field.size() && field[vstart] == ' ') ++vstart;
    req->headers[name] = field.substr(vstart);
  }

  const auto conn = req->headers.find("connection");
  req->keep_alive = req->version == "HTTP/1.1";
  if (conn != req->headers.end()) {
    const std::string v = LowerAscii(conn->second);
    if (v.find("close") != std::string::npos) req->keep_alive = false;
    if (v.find("keep-alive") != std::string::npos) req->keep_alive = true;
  }

  // --- body
  req->body.clear();
  const auto cl = req->headers.find("content-length");
  if (req->method == "POST") {
    if (cl == req->headers.end()) return 400;
    char* endp = nullptr;
    const long long length = std::strtoll(cl->second.c_str(), &endp, 10);
    if (endp == cl->second.c_str() || length <= 0) return 400;
    if (size_t(length) > kMaxBodyBytes) return 413;
    while (carry->size() < size_t(length)) {
      char buf[65536];
      const ssize_t n = ::recv(fd, buf, sizeof(buf), 0);
      if (n <= 0) return -1;
      carry->append(buf, size_t(n));
    }
    req->body = carry->substr(0, size_t(length));
    carry->erase(0, size_t(length));
  }
  return 0;
}

// ------------------------------------------------------------- metrics

std::string MetricsJson(Front& f) {
  int64_t requests, batches, batched, errors, timeouts, rejected;
  std::map<std::string, int64_t> gauges;
  std::vector<double> lat;
  {
    std::lock_guard<std::mutex> lk(f.mmu);
    requests = f.requests;
    batches = f.batches;
    batched = f.batched_requests;
    errors = f.errors;
    timeouts = f.timeouts;
    rejected = f.rejected;
    gauges = f.gauges;
    lat.assign(f.latencies_ms.begin(), f.latencies_ms.end());
  }
  char buf[512];
  std::snprintf(
      buf, sizeof(buf),
      "{\"requests\": %lld, \"batches\": %lld, \"batched_requests\": %lld, "
      "\"errors\": %lld, \"timeouts\": %lld, \"rejected\": %lld, "
      "\"mean_batch_size\": %.2f",
      static_cast<long long>(requests), static_cast<long long>(batches),
      static_cast<long long>(batched), static_cast<long long>(errors),
      static_cast<long long>(timeouts), static_cast<long long>(rejected),
      batches ? double(batched) / double(batches) : 0.0);
  std::string out = buf;
  for (const auto& g : gauges) {
    std::snprintf(buf, sizeof(buf), ", \"%s\": %lld", g.first.c_str(),
                  static_cast<long long>(g.second));
    out += buf;
  }
  if (!lat.empty()) {
    std::sort(lat.begin(), lat.end());
    const double p50 = lat[(lat.size() - 1) / 2];
    const double p99 =
        lat[std::min(lat.size() - 1, size_t(0.99 * double(lat.size())))];
    std::snprintf(buf, sizeof(buf),
                  ", \"latency_p50_ms\": %.2f, \"latency_p99_ms\": %.2f", p50,
                  p99);
    out += buf;
  }
  out += ", \"front\": \"native\"}";
  return out;
}

// ----------------------------------------------------- request handling

// Handle POST /v1/answer. Returns (status, body) to write.
std::pair<int, std::string> HandleAnswer(const std::shared_ptr<Front>& f,
                                         const std::string& body) {
  if (!f->vocab_set.load(std::memory_order_acquire) ||
      !f->answers_set.load(std::memory_order_acquire))
    return {503, ErrorBody("starting up: vocab not loaded yet; retry")};

  std::map<std::string, JsonValue> obj;
  std::string err;
  if (!ParseJsonObject(body, &obj, &err))
    return {400, ErrorBody("bad request: " + err)};

  const auto q_it = obj.find("question");
  if (q_it == obj.end() || q_it->second.kind != JsonValue::STR)
    return {400, ErrorBody("bad request: 'question' must be a string")};

  int top_k = 5;
  const auto k_it = obj.find("top_k");
  if (k_it != obj.end()) {
    // Range-check the DOUBLE before converting: double->int of an
    // out-of-range value (1e300, inf; nan fails the >= test) is UB.
    const double kn = k_it->second.num;
    if (k_it->second.kind != JsonValue::NUM)
      return {400, ErrorBody("bad request: 'top_k' must be a number")};
    if (!(kn >= 1.0))
      return {400, ErrorBody("bad request: 'top_k' must be >= 1")};
    if (kn > double(f->topk_cap))
      return {400, ErrorBody("bad request: 'top_k' exceeds the native "
                             "front's cap (" + std::to_string(f->topk_cap) +
                             "); raise --topk-cap or use the Python front")};
    top_k = int(kn);
  }

  const auto img_it = obj.find("image_b64");
  if (img_it == obj.end() || img_it->second.kind != JsonValue::STR)
    return {400, ErrorBody("bad request: 'image_b64' must be a string")};

  std::vector<uint8_t> jpeg;
  if (!Base64Decode(img_it->second.str.data(), img_it->second.str.size(),
                    &jpeg))
    return {400, ErrorBody("bad request: invalid base64 in 'image_b64'")};
  if (jpeg.size() < 3 || jpeg[0] != 0xFF || jpeg[1] != 0xD8)
    return {415, ErrorBody("native front decodes JPEG only (got a non-JPEG "
                           "image); use the Python front for PNG/BMP")};

  auto req = std::make_shared<Request>();
  req->image.resize(size_t(f->image_size) * f->image_size * 3);
  if (!vqa::TransformMem(jpeg.data(), jpeg.size(), f->image_size,
                         f->central_fraction, req->image.data()))
    return {400, ErrorBody("bad request: image decode failed")};

  req->tokens.resize(size_t(f->max_question_length));
  req->length = Tokenize(*f, q_it->second.str, req->tokens.data());
  req->top_k = top_k;
  req->enqueued = Clock::now();

  // Offered load is counted at enqueue (serve.py submit semantics).
  {
    std::lock_guard<std::mutex> lk(f->mmu);
    ++f->requests;
  }
  {
    std::unique_lock<std::mutex> lk(f->qmu);
    if (int(f->queue.size()) >= f->max_queue) {
      lk.unlock();
      std::lock_guard<std::mutex> mlk(f->mmu);
      ++f->rejected;
      return {503, ErrorBody("request queue full (" +
                             std::to_string(f->max_queue) + "); retry later")};
    }
    f->queue.push_back(req);
  }
  f->qcv.notify_one();

  // Wait for the dispatch loop.
  std::unique_lock<std::mutex> lk(req->mu);
  const bool completed = req->cv.wait_for(
      lk, std::chrono::duration<double>(f->request_timeout_s),
      [&] { return req->done; });
  if (!completed) {
    req->abandoned = true;  // batcher must drop it (zombie forwards)
    std::lock_guard<std::mutex> mlk(f->mmu);
    ++f->timeouts;
    return {504, ErrorBody("inference timed out")};
  }
  if (req->status == 200) {
    const double ms =
        std::chrono::duration<double, std::milli>(Clock::now() - req->enqueued)
            .count();
    std::lock_guard<std::mutex> mlk(f->mmu);
    f->latencies_ms.push_back(ms);
    while (f->latencies_ms.size() > 1000) f->latencies_ms.pop_front();
  }
  return {req->status, req->body};
}

void HandleConnection(std::shared_ptr<Front> f, int fd) {
  // Bound slow/dead clients: a blocked recv may hold this thread for at
  // most the timeout, then the connection is dropped.
  timeval tv{};
  tv.tv_sec = 60;
  ::setsockopt(fd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
  int one = 1;
  ::setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));

  std::string carry;
  while (!f->stopping.load()) {
    HttpRequest req;
    const int rc = ReadRequest(fd, &carry, &req);
    if (rc < 0) break;  // EOF / drop
    if (rc > 0) {
      WriteResponse(fd, rc, ErrorBody(StatusText(rc)), false);
      break;
    }

    int status;
    std::string body;
    bool keep_alive = req.keep_alive;
    if (req.method == "GET" && req.path == "/healthz") {
      std::string backend;
      {
        std::lock_guard<std::mutex> lk(f->meta_mu);
        backend = f->backend;
      }
      status = 200;
      body = "{\"status\": \"ok\", \"backend\": ";
      AppendJsonEscaped(&body, backend);
      body += ", \"front\": \"native\"}";
    } else if (req.method == "GET" && req.path == "/metrics") {
      status = 200;
      body = MetricsJson(*f);
    } else if (req.method == "POST" && req.path == "/v1/answer") {
      std::tie(status, body) = HandleAnswer(f, req.body);
    } else {
      status = 404;
      body = ErrorBody("not found");
    }
    if (!WriteResponse(fd, status, body, keep_alive)) break;
    if (!keep_alive) break;
  }
  ::close(fd);
  f->open_conns.fetch_sub(1);
}

void AcceptLoop(std::shared_ptr<Front> f) {
  while (!f->stopping.load()) {
    const int fd = ::accept(f->listen_fd, nullptr, nullptr);
    if (fd < 0) {
      if (f->stopping.load()) break;
      if (errno == EINTR) continue;
      if (errno == EBADF || errno == EINVAL) break;  // listener closed
      // Transient (ECONNABORTED, EMFILE/ENFILE fd exhaustion, EAGAIN,
      // ENOMEM): the ONE accept thread must survive these or the server
      // silently stops accepting forever. Back off briefly — EMFILE
      // clears when connection threads close their fds.
      std::this_thread::sleep_for(std::chrono::milliseconds(10));
      continue;
    }
    if (f->open_conns.fetch_add(1) >= f->max_conns) {
      // Immediate shed instead of an accept backlog that can only time
      // out (mirrors the bounded-queue 503 philosophy).
      WriteResponse(fd, 503, ErrorBody("connection limit reached"), false);
      ::close(fd);
      f->open_conns.fetch_sub(1);
      continue;
    }
    std::thread(HandleConnection, f, fd).detach();
  }
}

}  // namespace

// ------------------------------------------------------------------ ABI

extern "C" {

int vqa_front_start(const char* host, int port, int image_size,
                    double central_fraction, int max_batch, int window_us,
                    int max_queue, int max_question_length, int topk_cap,
                    double request_timeout_s, int max_conns) {
  {
    // Refuse to orphan a live front (one per process; stop it first).
    // Checked BEFORE binding so a refused start leaves no stray listener.
    std::lock_guard<std::mutex> lk(g_front_mu);
    if (g_front && !g_front->stopping.load()) return 5;
  }
  static std::atomic<int64_t> gen_counter{0};
  auto f = std::make_shared<Front>();
  f->generation = gen_counter.fetch_add(1) + 1;
  f->image_size = image_size;
  f->central_fraction = central_fraction;
  f->max_batch = max_batch;
  f->window_us = window_us;
  f->max_queue = max_queue > 0 ? max_queue : max_batch * 8;
  f->max_question_length = max_question_length;
  f->topk_cap = topk_cap;
  f->request_timeout_s = request_timeout_s;
  if (max_conns > 0) f->max_conns = max_conns;

  f->listen_fd = ::socket(AF_INET, SOCK_STREAM, 0);
  if (f->listen_fd < 0) return 1;
  int one = 1;
  ::setsockopt(f->listen_fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons(uint16_t(port));
  if (::inet_pton(AF_INET, host, &addr.sin_addr) != 1) {
    // Not a dotted quad — resolve hostnames ("localhost") like the
    // Python front's ThreadingHTTPServer does (IPv4 only here).
    addrinfo hints{};
    hints.ai_family = AF_INET;
    hints.ai_socktype = SOCK_STREAM;
    addrinfo* res = nullptr;
    if (::getaddrinfo(host, nullptr, &hints, &res) != 0 || res == nullptr)
      return 2;
    addr.sin_addr = reinterpret_cast<sockaddr_in*>(res->ai_addr)->sin_addr;
    ::freeaddrinfo(res);
  }
  if (::bind(f->listen_fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) !=
      0)
    return 3;
  if (::listen(f->listen_fd, 128) != 0) return 4;
  socklen_t alen = sizeof(addr);
  ::getsockname(f->listen_fd, reinterpret_cast<sockaddr*>(&addr), &alen);
  f->port = ntohs(addr.sin_port);

  std::thread(AcceptLoop, f).detach();

  std::lock_guard<std::mutex> lk(g_front_mu);
  g_front = std::move(f);
  return 0;
}

int vqa_front_port() {
  const auto f = GetFront();
  return f ? f->port : -1;
}

long long vqa_front_generation() {
  const auto f = GetFront();
  return f ? f->generation : -1;
}

int vqa_front_set_question_vocab(const char* blob, const int32_t* ids, int n) {
  const auto f = GetFront();
  if (!f) return 1;
  // Write-once: connection threads read the map lock-free after
  // observing vocab_set, so a re-upload on a live front would race.
  if (f->vocab_set.load()) return 3;
  f->question_vocab.clear();
  f->question_vocab.reserve(size_t(n) * 2);
  const char* p = blob;
  for (int i = 0; i < n; ++i) {
    const char* nl = std::strchr(p, '\n');
    if (!nl) return 2;  // blob must carry exactly n newline-terminated words
    f->question_vocab.emplace(std::string(p, nl), ids[i]);
    p = nl + 1;
  }
  f->vocab_set.store(true, std::memory_order_release);
  return 0;
}

int vqa_front_set_answers(const char* blob, int n) {
  const auto f = GetFront();
  if (!f) return 1;
  if (f->answers_set.load()) return 3;  // write-once (see vocab)
  f->answers.clear();
  f->answers.reserve(size_t(n));
  const char* p = blob;
  for (int i = 0; i < n; ++i) {
    const char* nl = std::strchr(p, '\n');
    if (!nl) return 2;
    f->answers.emplace_back(p, nl);
    p = nl + 1;
  }
  f->answers_set.store(true, std::memory_order_release);
  return 0;
}

int vqa_front_set_backend(const char* name) {
  const auto f = GetFront();
  if (!f) return 1;
  std::lock_guard<std::mutex> lk(f->meta_mu);
  f->backend = name;
  return 0;
}

int vqa_front_set_gauge(const char* name, long long value) {
  const auto f = GetFront();
  if (!f) return 1;
  std::lock_guard<std::mutex> lk(f->mmu);
  f->gauges[name] = value;
  return 0;
}

// Blocks (GIL released by ctypes) until a batch is ready. Fills the
// caller's [max_batch, ...] buffers with n <= max_batch rows and returns
// the batch id; -1 on timeout (no traffic), -2 after stop.
long long vqa_front_next_batch(long long generation, uint8_t* images,
                               int32_t* questions, int32_t* lengths,
                               int32_t* topks, int32_t* out_n,
                               int timeout_ms) {
  const auto f = GetFront();
  if (!f || f->generation != generation) return -2;
  const size_t img_bytes = size_t(f->image_size) * f->image_size * 3;

  std::vector<RequestPtr> batch;
  {
    std::unique_lock<std::mutex> lk(f->qmu);
    const bool got = f->qcv.wait_for(
        lk, std::chrono::milliseconds(timeout_ms),
        [&] { return f->stopping.load() || !f->queue.empty(); });
    if (f->stopping.load() && f->queue.empty()) return -2;
    if (!got) return -1;
    batch.push_back(f->queue.front());
    f->queue.pop_front();
    // Coalescing window: wait for stragglers (serve.py _drain semantics).
    const auto deadline =
        Clock::now() + std::chrono::microseconds(f->window_us);
    while (int(batch.size()) < f->max_batch) {
      if (f->queue.empty()) {
        if (!f->qcv.wait_until(lk, deadline, [&] {
              return f->stopping.load() || !f->queue.empty();
            }))
          break;
        if (f->stopping.load() && f->queue.empty()) break;
      }
      if (f->queue.empty()) break;
      batch.push_back(f->queue.front());
      f->queue.pop_front();
    }
  }

  // Drop abandoned (timed-out) entries; their handlers already replied.
  std::vector<RequestPtr> live;
  live.reserve(batch.size());
  for (auto& r : batch) {
    std::lock_guard<std::mutex> lk(r->mu);
    if (!r->abandoned) live.push_back(r);
  }
  if (live.empty()) {
    *out_n = 0;
    return -1;  // caller just loops
  }

  for (size_t i = 0; i < live.size(); ++i) {
    std::memcpy(images + i * img_bytes, live[i]->image.data(), img_bytes);
    std::memcpy(questions + i * size_t(f->max_question_length),
                live[i]->tokens.data(),
                sizeof(int32_t) * size_t(f->max_question_length));
    lengths[i] = live[i]->length;
    topks[i] = live[i]->top_k;
  }
  *out_n = int32_t(live.size());

  std::lock_guard<std::mutex> lk(f->inflight_mu);
  const int64_t id = f->next_batch_id++;
  f->inflight.emplace(id, std::move(live));
  return id;
}

// Python hands back the in-graph top-k: idx/prob are [n, k] row-major,
// idx holding 0-based answer-vocab positions (answer id - 1).
int vqa_front_complete(long long generation, long long batch_id,
                       const int32_t* topk_idx, const float* topk_prob,
                       int k) {
  const auto f = GetFront();
  if (!f || f->generation != generation) return 1;
  std::vector<RequestPtr> batch;
  {
    std::lock_guard<std::mutex> lk(f->inflight_mu);
    const auto it = f->inflight.find(batch_id);
    if (it == f->inflight.end()) return 2;
    batch = std::move(it->second);
    f->inflight.erase(it);
  }
  // Count BEFORE notifying: a client that saw its response must see the
  // counter already bumped when it reads /metrics next.
  {
    std::lock_guard<std::mutex> lk(f->mmu);
    ++f->batches;
    f->batched_requests += int64_t(batch.size());
  }
  for (size_t i = 0; i < batch.size(); ++i) {
    auto& r = batch[i];
    const int take = std::min(int(r->top_k), k);
    std::string body = "{\"answers\": [";
    for (int j = 0; j < take; ++j) {
      const int32_t idx = topk_idx[i * size_t(k) + j];
      const float prob = topk_prob[i * size_t(k) + j];
      if (j) body += ", ";
      body += "[";
      if (idx >= 0 && size_t(idx) < f->answers.size())
        AppendJsonEscaped(&body, f->answers[size_t(idx)]);
      else
        body += "\"<unk>\"";
      char num[32];
      std::snprintf(num, sizeof(num), ", %.8g]", double(prob));
      body += num;
    }
    body += "]}";
    std::lock_guard<std::mutex> lk(r->mu);
    r->status = 200;
    r->body = std::move(body);
    r->done = true;
    r->cv.notify_one();
  }
  return 0;
}

int vqa_front_fail(long long generation, long long batch_id,
                   const char* message) {
  const auto f = GetFront();
  if (!f || f->generation != generation) return 1;
  std::vector<RequestPtr> batch;
  {
    std::lock_guard<std::mutex> lk(f->inflight_mu);
    const auto it = f->inflight.find(batch_id);
    if (it == f->inflight.end()) return 2;
    batch = std::move(it->second);
    f->inflight.erase(it);
  }
  // Count BEFORE notifying (see vqa_front_complete).
  {
    std::lock_guard<std::mutex> lk(f->mmu);
    f->errors += int64_t(batch.size());
  }
  const std::string body = ErrorBody(message ? message : "inference failed");
  for (auto& r : batch) {
    std::lock_guard<std::mutex> lk(r->mu);
    r->status = 500;
    r->body = body;
    r->done = true;
    r->cv.notify_one();
  }
  return 0;
}

void vqa_front_metrics_json(char* buf, int buflen) {
  const auto f = GetFront();
  if (!f || buflen <= 0) return;
  const std::string s = MetricsJson(*f);
  const size_t n = std::min(s.size(), size_t(buflen - 1));
  std::memcpy(buf, s.data(), n);
  buf[n] = '\0';
}

void vqa_front_stop() {
  const auto f = GetFront();
  if (!f) return;
  f->stopping.store(true);
  // Unblock accept() by closing the listener; unblock the dispatcher and
  // fail everything still queued or in flight.
  ::shutdown(f->listen_fd, SHUT_RDWR);
  std::vector<RequestPtr> drop;
  {
    std::lock_guard<std::mutex> lk(f->qmu);
    drop.assign(f->queue.begin(), f->queue.end());
    f->queue.clear();
  }
  {
    std::lock_guard<std::mutex> lk(f->inflight_mu);
    for (auto& kv : f->inflight)
      for (auto& r : kv.second) drop.push_back(r);
    f->inflight.clear();
  }
  const std::string body = ErrorBody("server shutting down");
  for (auto& r : drop) {
    std::lock_guard<std::mutex> lk(r->mu);
    if (r->done) continue;
    r->status = 503;
    r->body = body;
    r->done = true;
    r->cv.notify_one();
  }
  f->qcv.notify_all();
}

// Test hook: run the native tokenizer standalone (parity tests compare
// against predict.Predictor.encode_questions).
int vqa_front_tokenize(const char* question, int32_t* out_ids, int max_len) {
  const auto f = GetFront();
  if (!f) return -1;
  if (max_len != f->max_question_length) return -2;
  return Tokenize(*f, question, out_ids);
}

}  // extern "C"
