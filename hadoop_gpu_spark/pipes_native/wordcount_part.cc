// Native Pipes map task with a CHILD partitioner — the engine-side
// analog of the reference's wordcount-part.cc example (a Mapper emitting
// (word, "1") plus a custom HadoopPipes::Partitioner; the framework
// receives PARTITIONED_OUTPUT frames and routes by the child's
// assignment). Original implementation of that wire contract.
//
// Wire contract (mirrors operators/pipes.py pipe_binary(num_reduces=N)):
//   downstream: the standard handshake; RUN_MAP carries numReduces > 0.
//   upstream:   PARTITIONED_OUTPUT(51) + vint partition + key + value,
//               one per word, partition = polynomial-31 byte hash of the
//               word mod numReduces (deterministic, engine-checkable);
//               INPUT_WORDS counter; DONE(54).

#include <cstdint>
#include <cstdio>

#include "pipes_transport.h"
#include <string>

static const int MSG_START = 0;
static const int MSG_SET_JOB_CONF = 1;
static const int MSG_SET_INPUT_TYPES = 2;
static const int MSG_RUN_MAP = 3;
static const int MSG_MAP_ITEM = 4;
static const int MSG_CLOSE = 8;
static const int MSG_PARTITIONED_OUTPUT = 51;
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

static bool is_space(char ch) {
  return ch == ' ' || ch == '\t' || ch == '\n' || ch == '\r' || ch == '\f' ||
         ch == '\v';
}

// Deterministic polynomial-31 hash (Java String.hashCode shape over raw
// bytes) — the Partitioner the engine-side test re-derives.
static int64_t part_of(const std::string &w, int64_t n_red) {
  uint32_t h = 0;
  for (unsigned char c : w) h = h * 31u + c;
  return (int64_t)(h % (uint32_t)n_red);
}

int main() {
  if (int rc = pipes_connect_transport()) return rc;
  std::string key, value;
  int64_t code, n, n_reduces = 1, words = 0;
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
    } else if (code == MSG_RUN_MAP) {
      if (!read_bytes(&value)) return 2;        // split descriptor
      if (!read_vint(&n_reduces)) return 2;     // the partitioner's modulus
      if (!read_vint(&n)) return 2;             // pipedInput
      if (n_reduces <= 0) n_reduces = 1;
    } else if (code == MSG_MAP_ITEM) {
      if (!read_bytes(&key) || !read_bytes(&value)) break;
      size_t i = 0, len = value.size();
      while (i < len) {
        while (i < len && is_space(value[i])) i++;
        size_t start = i;
        while (i < len && !is_space(value[i])) i++;
        if (i > start) {
          std::string w = value.substr(start, i - start);
          write_vint(MSG_PARTITIONED_OUTPUT);
          write_vint(part_of(w, n_reduces));
          write_text(w);
          write_text("1");
          words++;
        }
      }
    } else {
      return 2;
    }
  }
  write_vint(MSG_REGISTER_COUNTER);
  write_vint(0);
  write_text("WORDCOUNT");
  write_text("INPUT_WORDS");
  write_vint(MSG_INCREMENT_COUNTER);
  write_vint(0);
  write_vint(words);
  write_vint(MSG_DONE);
  fflush(stdout);
  return 0;
}
