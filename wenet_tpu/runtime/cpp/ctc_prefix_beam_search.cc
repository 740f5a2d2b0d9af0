// Incremental CTC prefix beam search, C ABI for ctypes.
//
// TPU-native rebuild of the serving hot loop
// (ref: runtime/core/decoder/ctc_prefix_beam_search.{h,cc}).  The chip
// produces CTC posteriors; this host-side search advances the beam per
// chunk.  Exposed as a plain C interface so the Python server loads it
// with ctypes (no pybind11 in the image).
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -o libctc_beam.so \
//            ctc_prefix_beam_search.cc

#include <algorithm>
#include <numeric>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <unordered_map>
#include <vector>

namespace {

constexpr float kNegInf = -std::numeric_limits<float>::infinity();

inline float LogAdd(float a, float b) {
  if (a == kNegInf) return b;
  if (b == kNegInf) return a;
  const float m = std::max(a, b);
  return m + std::log1p(std::exp(std::min(a, b) - m));
}

struct PrefixScore {
  float s = kNegInf;            // blank-ending score
  float ns = kNegInf;           // non-blank-ending score
  float v_s = kNegInf;          // viterbi blank-ending
  float v_ns = kNegInf;         // viterbi non-blank-ending
  float cur_token_prob = kNegInf;
  std::vector<int> times_s;
  std::vector<int> times_ns;

  float Score() const { return LogAdd(s, ns); }
  float ViterbiScore() const { return std::max(v_s, v_ns); }
  const std::vector<int>& Times() const {
    return v_s > v_ns ? times_s : times_ns;
  }
};

struct PrefixHash {
  size_t operator()(const std::vector<int>& p) const {
    size_t h = 0;
    for (int t : p) h = h * 1000003u + static_cast<size_t>(t + 1);
    return h;
  }
};

struct Searcher {
  int beam_size;
  int blank_id;
  int abs_time = 0;
  std::vector<std::pair<std::vector<int>, PrefixScore>> cur_hyps;

  void Reset() {
    abs_time = 0;
    cur_hyps.clear();
    PrefixScore root;
    root.s = 0.0f;
    root.v_s = 0.0f;
    root.v_ns = 0.0f;
    cur_hyps.emplace_back(std::vector<int>(), root);
  }

  void Search(const float* logp, int num_frames, int vocab) {
    const int first_beam = std::min(beam_size, vocab);
    std::vector<int> top_k(vocab);
    for (int t = 0; t < num_frames; ++t, ++abs_time) {
      const float* frame = logp + static_cast<int64_t>(t) * vocab;
      // partial top-k of this frame
      std::iota(top_k.begin(), top_k.end(), 0);
      std::partial_sort(top_k.begin(), top_k.begin() + first_beam,
                        top_k.end(), [&](int a, int b) {
                          return frame[a] > frame[b];
                        });
      std::unordered_map<std::vector<int>, PrefixScore, PrefixHash>
          next_hyps;
      next_hyps.reserve(cur_hyps.size() * first_beam * 2);
      for (int i = 0; i < first_beam; ++i) {
        const int u = top_k[i];
        const float prob = frame[u];
        for (auto& [prefix, ps] : cur_hyps) {
          const int last = prefix.empty() ? -1 : prefix.back();
          if (u == blank_id) {
            PrefixScore& next = next_hyps[prefix];
            next.s = LogAdd(next.s, ps.Score() + prob);
            next.v_s = ps.ViterbiScore() + prob;
            next.times_s = ps.Times();
          } else if (u == last) {
            {
              PrefixScore& next = next_hyps[prefix];
              next.ns = LogAdd(next.ns, ps.ns + prob);
              if (next.v_ns < ps.v_ns + prob) {
                next.v_ns = ps.v_ns + prob;
                if (next.cur_token_prob < prob) {
                  next.cur_token_prob = prob;
                  next.times_ns = ps.times_ns;
                  if (!next.times_ns.empty())
                    next.times_ns.back() = abs_time;
                }
              }
            }
            {
              std::vector<int> n_prefix = prefix;
              n_prefix.push_back(u);
              PrefixScore& next = next_hyps[n_prefix];
              next.ns = LogAdd(next.ns, ps.s + prob);
              if (next.v_ns < ps.v_s + prob) {
                next.v_ns = ps.v_s + prob;
                next.cur_token_prob = prob;
                next.times_ns = ps.times_s;
                next.times_ns.push_back(abs_time);
              }
            }
          } else {
            std::vector<int> n_prefix = prefix;
            n_prefix.push_back(u);
            PrefixScore& next = next_hyps[n_prefix];
            next.ns = LogAdd(next.ns, ps.Score() + prob);
            if (next.v_ns < ps.ViterbiScore() + prob) {
              next.v_ns = ps.ViterbiScore() + prob;
              next.cur_token_prob = prob;
              next.times_ns = ps.Times();
              next.times_ns.push_back(abs_time);
            }
          }
        }
      }
      // second prune: keep top beam_size by score
      std::vector<std::pair<std::vector<int>, PrefixScore>> arr(
          std::make_move_iterator(next_hyps.begin()),
          std::make_move_iterator(next_hyps.end()));
      const int keep =
          std::min<int>(beam_size, static_cast<int>(arr.size()));
      std::partial_sort(arr.begin(), arr.begin() + keep, arr.end(),
                        [](const auto& a, const auto& b) {
                          return a.second.Score() > b.second.Score();
                        });
      arr.resize(keep);
      cur_hyps = std::move(arr);
    }
  }
};

}  // namespace

extern "C" {

void* ctc_beam_create(int beam_size, int blank_id) {
  auto* s = new Searcher();
  s->beam_size = beam_size;
  s->blank_id = blank_id;
  s->Reset();
  return s;
}

void ctc_beam_destroy(void* h) { delete static_cast<Searcher*>(h); }

void ctc_beam_reset(void* h) { static_cast<Searcher*>(h)->Reset(); }

void ctc_beam_search(void* h, const float* logp, int num_frames,
                     int vocab) {
  static_cast<Searcher*>(h)->Search(logp, num_frames, vocab);
}

int ctc_beam_num_hyps(void* h) {
  return static_cast<int>(static_cast<Searcher*>(h)->cur_hyps.size());
}

int ctc_beam_hyp_len(void* h, int i) {
  return static_cast<int>(
      static_cast<Searcher*>(h)->cur_hyps[i].first.size());
}

void ctc_beam_hyp(void* h, int i, int* out_tokens, int* out_times,
                  float* out_score) {
  auto& [prefix, ps] = static_cast<Searcher*>(h)->cur_hyps[i];
  std::memcpy(out_tokens, prefix.data(), prefix.size() * sizeof(int));
  const auto& times = ps.Times();
  for (size_t j = 0; j < prefix.size(); ++j) {
    out_times[j] = j < times.size() ? times[j] : 0;
  }
  *out_score = ps.Score();
}

}  // extern "C"
