// Native token-processing hot loop: stop-sequence byte matching and
// streaming hold-back computation.
//
// C++ counterpart of the byte-window stop-sequence evaluation the reference
// implements in its Rust router (reference: router/src/batcher.rs:786-807
// matches_stop_sequence; router/src/decoder.rs hold_back_bytes). The Python
// scheduler calls this per generated token for every active slot; at high
// slot counts and sub-millisecond steps this is the host-side hot path, so
// it lives in native code with a ctypes ABI (no pybind11 in this image).
//
// All offsets are BYTE offsets into the UTF-8 output stream; the Python
// layer slices the byte buffer and decodes at emission boundaries.
//
// Build: make -C native   (produces libtokenproc.so)

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Matcher {
  std::vector<std::string> seqs;
  std::string text;       // accumulated output bytes
  size_t max_len = 0;     // longest stop sequence
  int matched = -1;       // index of matched sequence, -1 if none
  size_t match_end = 0;   // byte offset just past the match
};

}  // namespace

extern "C" {

void* tp_create(const char* const* seqs, const int32_t* lens, int32_t n) {
  auto* m = new Matcher();
  m->seqs.reserve(n);
  for (int32_t i = 0; i < n; ++i) {
    m->seqs.emplace_back(seqs[i], static_cast<size_t>(lens[i]));
    if (m->seqs.back().size() > m->max_len) m->max_len = m->seqs.back().size();
  }
  return m;
}

void tp_destroy(void* h) { delete static_cast<Matcher*>(h); }

// Append a delta; returns the matched stop-sequence index (earliest end
// position wins, ties by sequence order) or -1. Out params: byte offset one
// past the end of the match in the full output.
int32_t tp_feed(void* h, const char* delta, int32_t len, uint64_t* match_end) {
  auto* m = static_cast<Matcher*>(h);
  if (m->matched >= 0) {
    *match_end = m->match_end;
    return m->matched;
  }
  size_t old_len = m->text.size();
  m->text.append(delta, static_cast<size_t>(len));
  if (m->seqs.empty()) return -1;

  // a new match must END inside the new region; start the scan max_len-1
  // bytes before it so boundary-spanning matches are found
  size_t scan_from = old_len >= m->max_len - 1 ? old_len - (m->max_len - 1) : 0;
  int32_t best = -1;
  size_t best_end = SIZE_MAX;
  for (size_t i = 0; i < m->seqs.size(); ++i) {
    const std::string& s = m->seqs[i];
    size_t pos = m->text.find(s, scan_from);
    if (pos != std::string::npos) {
      size_t end = pos + s.size();
      if (end < best_end) {
        best_end = end;
        best = static_cast<int32_t>(i);
      }
    }
  }
  if (best >= 0) {
    m->matched = best;
    m->match_end = best_end;
    *match_end = best_end;
  }
  return best;
}

// Bytes at the tail of the output that could still become part of a stop
// sequence; a streaming server must withhold them.
int32_t tp_held_back(void* h) {
  auto* m = static_cast<Matcher*>(h);
  if (m->seqs.empty() || m->matched >= 0) return 0;
  int32_t held = 0;
  for (const std::string& s : m->seqs) {
    size_t cap = s.size() - 1;
    if (cap > m->text.size()) cap = m->text.size();
    for (size_t k = cap; k >= 1; --k) {
      if (m->text.compare(m->text.size() - k, k, s, 0, k) == 0) {
        if (static_cast<int32_t>(k) > held) held = static_cast<int32_t>(k);
        break;
      }
    }
  }
  return held;
}

uint64_t tp_text_len(void* h) {
  return static_cast<Matcher*>(h)->text.size();
}

// Copy out the accumulated text, trimmed per include_stop_sequence.
// Returns number of bytes written (buffer must be tp_text_len long).
uint64_t tp_final_text(void* h, int32_t include_stop, char* out) {
  auto* m = static_cast<Matcher*>(h);
  size_t end = m->text.size();
  if (m->matched >= 0) {
    end = include_stop ? m->match_end
                       : m->match_end - m->seqs[m->matched].size();
  }
  std::memcpy(out, m->text.data(), end);
  return end;
}

}  // extern "C"
