// Native Pipes wordcount task — the compiled-C++ leg of the engine's
// Pipes surface (operators/pipes.py pipe_binary).
//
// Reference parity (semantics, not code): the reference ships C++ example
// UDFs run by its Pipes runtime — a map task emitting (token, 1) per
// whitespace-separated word and a reduce task summing counts
// (H/src/examples/pipes/impl/wordcount-simple.cc:27-63), framed by the
// VInt byte protocol (M/pipes/BinaryProtocol.java:62-80, Pipes.hh). This
// program is an original implementation of that contract: it speaks the
// same WritableUtils VInt framing over stdin/stdout and fuses map+combine
// (per-partition partial counts), leaving the final sum to the engine's
// shuffle — exactly how the reference pairs its C++ mapper with a
// combiner.
//
// Wire contract (mirrors operators/pipes.py, full control plane):
//   downstream: START(0)+version, SET_JOB_CONF(1)+flattened Text list,
//               SET_INPUT_TYPES(2)+2 Texts, RUN_MAP(3)+split+numReduces+
//               pipedInput, MAP_ITEM(4)+key+value per row, CLOSE(8).
//   upstream:   OUTPUT(50) per distinct token (value = decimal partial
//               count, byte-sorted token order via std::map — output is
//               deterministic per input set), then REGISTER_COUNTER(55) /
//               INCREMENT_COUNTER(56) for the WORDS counter, then
//               DONE(54).
//
// Tokenization matches the engine's q_wordcount oracle: split on runs of
// ASCII whitespace (regexp \s+), drop empties.

#include <cstdint>
#include <cstdio>

#include "pipes_transport.h"
#include <map>
#include <string>

static const int MSG_START = 0;
static const int MSG_SET_JOB_CONF = 1;
static const int MSG_SET_INPUT_TYPES = 2;
static const int MSG_RUN_MAP = 3;
static const int MSG_MAP_ITEM = 4;
static const int MSG_CLOSE = 8;
static const int MSG_OUTPUT = 50;
static const int MSG_DONE = 54;
static const int MSG_REGISTER_COUNTER = 55;
static const int MSG_INCREMENT_COUNTER = 56;

// WritableUtils.readVInt: single byte for -112..127, else a length byte
// then big-endian magnitude bytes. Returns false on clean EOF.
static bool read_vint(int64_t *out) {
  int c = getchar();
  if (c == EOF) return false;
  int8_t b = (int8_t)c;
  if (b >= -112) {
    *out = b;
    return true;
  }
  bool negative = b < -120;
  int size = negative ? -(b + 120) : -(b + 112);
  int64_t i = 0;
  for (int n = 0; n < size; n++) {
    c = getchar();
    if (c == EOF) return false;  // truncated; treat as close
    i = (i << 8) | (uint8_t)c;
  }
  *out = negative ? (i ^ -1LL) : i;
  return true;
}

static void write_vint(int64_t i) {
  if (i >= -112 && i <= 127) {
    putchar((int)(i & 0xFF));
    return;
  }
  int len = -112;
  if (i < 0) {
    i ^= -1LL;
    len = -120;
  }
  int64_t tmp = i;
  while (tmp) {
    tmp >>= 8;
    len--;
  }
  putchar(len & 0xFF);
  int size = (len >= -120) ? -(len + 112) : -(len + 120);
  for (int idx = size - 1; idx >= 0; idx--)
    putchar((int)((i >> (8 * idx)) & 0xFF));
}

static bool read_bytes(std::string *buf) {
  int64_t n;
  if (!read_vint(&n)) return false;
  buf->clear();
  buf->reserve((size_t)n);
  for (int64_t k = 0; k < n; k++) {
    int c = getchar();
    if (c == EOF) return false;
    buf->push_back((char)c);
  }
  return true;
}

static void write_frame(const std::string &key, const std::string &value) {
  write_vint(MSG_OUTPUT);
  write_vint((int64_t)key.size());
  fwrite(key.data(), 1, key.size(), stdout);
  write_vint((int64_t)value.size());
  fwrite(value.data(), 1, value.size(), stdout);
}

static bool is_space(char ch) {
  return ch == ' ' || ch == '\t' || ch == '\n' || ch == '\r' || ch == '\f' ||
         ch == '\v';
}

static void write_text(const std::string &s) {
  write_vint((int64_t)s.size());
  fwrite(s.data(), 1, s.size(), stdout);
}

int main() {
  if (int rc = pipes_connect_transport()) return rc;
  std::map<std::string, int64_t> counts;
  std::string key, value;
  int64_t code, n, total_words = 0;
  while (read_vint(&code)) {
    if (code == MSG_CLOSE) break;
    if (code == MSG_START) {
      if (!read_vint(&n) || n != 0) return 2;  // protocol version must be 0
    } else if (code == MSG_SET_JOB_CONF) {
      if (!read_vint(&n)) return 2;
      for (int64_t j = 0; j < n; j++)
        if (!read_bytes(&value)) return 2;  // conf consumed, unused
    } else if (code == MSG_SET_INPUT_TYPES) {
      if (!read_bytes(&key) || !read_bytes(&value)) return 2;
    } else if (code == MSG_RUN_MAP) {
      if (!read_bytes(&value)) return 2;            // split descriptor
      if (!read_vint(&n) || !read_vint(&n)) return 2;  // numReduces, pipedInput
    } else if (code == MSG_MAP_ITEM) {
      if (!read_bytes(&key) || !read_bytes(&value)) break;
      size_t i = 0, len = value.size();
      while (i < len) {
        while (i < len && is_space(value[i])) i++;
        size_t start = i;
        while (i < len && !is_space(value[i])) i++;
        if (i > start) {
          counts[value.substr(start, i - start)] += 1;
          total_words++;
        }
      }
    } else {
      return 2;  // bad downlink command
    }
  }
  for (const auto &kv : counts)
    write_frame(kv.first, std::to_string(kv.second));
  write_vint(MSG_REGISTER_COUNTER);
  write_vint(0);
  write_text("wordcount");
  write_text("WORDS");
  write_vint(MSG_INCREMENT_COUNTER);
  write_vint(0);
  write_vint(total_words);
  write_vint(MSG_DONE);
  fflush(stdout);
  return 0;
}
