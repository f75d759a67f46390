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
// Wire contract (mirrors operators/pipes.py):
//   downstream: frames (vint code, vint klen, key, vint vlen, value);
//               code 4 = MAP_ITEM, bare vint 8 = CLOSE (then EOF).
//   upstream:   frames code 50 = OUTPUT, one per distinct token, value =
//               decimal partial count; emitted in byte-sorted token order
//               (std::map) so output is deterministic per input set.
//
// Tokenization matches the engine's q_wordcount oracle: split on runs of
// ASCII whitespace (regexp \s+), drop empties.

#include <cstdint>
#include <cstdio>
#include <map>
#include <string>

static const int MSG_MAP_ITEM = 4;
static const int MSG_OUTPUT = 50;
static const int MSG_CLOSE = 8;

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

int main() {
  std::map<std::string, int64_t> counts;
  std::string key, value;
  int64_t code;
  while (read_vint(&code)) {
    if (code == MSG_CLOSE) break;
    if (!read_bytes(&key) || !read_bytes(&value)) break;
    if (code != MSG_MAP_ITEM) continue;
    size_t i = 0, n = value.size();
    while (i < n) {
      while (i < n && is_space(value[i])) i++;
      size_t start = i;
      while (i < n && !is_space(value[i])) i++;
      if (i > start) counts[value.substr(start, i - start)] += 1;
    }
  }
  for (const auto &kv : counts)
    write_frame(kv.first, std::to_string(kv.second));
  fflush(stdout);
  return 0;
}
