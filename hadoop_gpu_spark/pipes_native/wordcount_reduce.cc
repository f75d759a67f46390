// Native Pipes reduce task — the compiled-C++ reduce leg pairing
// pipes_native/wordcount.cc (map+combine). Together with the engine's
// shuffle/sort they form an all-native MapReduce wordcount: the engine
// contributes exactly what the reference's framework did (splits,
// shuffle, sort); both user legs are compiled code.
//
// Reference parity (semantics, not code): the reference's C++ reducer
// sums per-key counts (H/src/examples/pipes/impl/wordcount-simple.cc,
// WordCountReducer) over the grouped REDUCE_KEY/REDUCE_VALUE framing
// (M/pipes/BinaryProtocol.java:290-304). Original implementation of that
// wire contract over stdin/stdout.
//
// Wire contract (mirrors operators/pipes.py pipe_binary_reduce):
//   downstream: START(0)+version, SET_JOB_CONF(1)+flattened Text list,
//               SET_INPUT_TYPES(2)+2 Texts, RUN_REDUCE(5)+partition+
//               pipedOutput, then per group one REDUCE_KEY(6)+key and
//               one REDUCE_VALUE(7)+value per value, CLOSE(8).
//   upstream:   OUTPUT(50) per key group (value = decimal sum, emitted at
//               group boundary — input keys arrive sorted so output is
//               deterministic), GROUPS counter, DONE(54).

#include <cstdint>
#include <cstdio>

#include "pipes_transport.h"
#include <cstdlib>
#include <string>

static const int MSG_START = 0;
static const int MSG_SET_JOB_CONF = 1;
static const int MSG_SET_INPUT_TYPES = 2;
static const int MSG_RUN_REDUCE = 5;
static const int MSG_REDUCE_KEY = 6;
static const int MSG_REDUCE_VALUE = 7;
static const int MSG_CLOSE = 8;
static const int MSG_OUTPUT = 50;
static const int MSG_DONE = 54;
static const int MSG_REGISTER_COUNTER = 55;
static const int MSG_INCREMENT_COUNTER = 56;

// WritableUtils VInt codec — same as wordcount.cc.
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
    if (c == EOF) return false;
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

static void write_text(const std::string &s) {
  write_vint((int64_t)s.size());
  fwrite(s.data(), 1, s.size(), stdout);
}

static void emit(const std::string &key, int64_t sum) {
  write_vint(MSG_OUTPUT);
  write_text(key);
  write_text(std::to_string(sum));
}

int main() {
  if (int rc = pipes_connect_transport()) return rc;
  std::string key, value, current;
  bool have_key = false;
  int64_t code, n, sum = 0, groups = 0;
  while (read_vint(&code)) {
    if (code == MSG_CLOSE) break;
    if (code == MSG_START) {
      if (!read_vint(&n) || n != 0) return 2;
    } else if (code == MSG_SET_JOB_CONF) {
      if (!read_vint(&n)) return 2;
      for (int64_t j = 0; j < n; j++)
        if (!read_bytes(&value)) return 2;
    } else if (code == MSG_SET_INPUT_TYPES) {
      if (!read_bytes(&key) || !read_bytes(&value)) return 2;
    } else if (code == MSG_RUN_REDUCE) {
      if (!read_vint(&n) || !read_vint(&n)) return 2;  // partition, pipedOutput
    } else if (code == MSG_REDUCE_KEY) {
      if (!read_bytes(&key)) return 2;
      if (have_key) {  // group boundary: flush previous key's sum
        emit(current, sum);
        groups++;
      }
      current = key;
      sum = 0;
      have_key = true;
    } else if (code == MSG_REDUCE_VALUE) {
      if (!read_bytes(&value)) return 2;
      sum += atoll(value.c_str());
    } else {
      return 2;
    }
  }
  if (have_key) {
    emit(current, sum);
    groups++;
  }
  write_vint(MSG_REGISTER_COUNTER);
  write_vint(0);
  write_text("wordcount");
  write_text("GROUPS");
  write_vint(MSG_INCREMENT_COUNTER);
  write_vint(0);
  write_vint(groups);
  write_vint(MSG_DONE);
  fflush(stdout);
  return 0;
}
