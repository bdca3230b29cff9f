// Native n-gram caption scorers: CIDEr-D and COCO corpus BLEU.
//
// This is the framework's native runtime component for the evaluation
// harness hot loop — the role the reference delegates to a Java COCO-caption
// stack through a subprocess (dmi/utils/eval_utils.py:183-207).  The Python
// scorers in dmi_tpu/evals are the semantic oracles; this library computes
// the same numbers orders of magnitude faster on large eval sets.
//
// Interface (ctypes): captions arrive as flat uint32 token-id arrays with
// per-caption lengths; n-grams hash into uint64 via splitmix-style mixing.
//
// Build: g++ -O2 -shared -fPIC -o _ngram_scorer.so ngram_scorer.cpp

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

constexpr int N_MAX = 4;
constexpr double SIGMA = 6.0;

// splitmix64 finalizer — full-avalanche element mixing (the boost-style
// (h<<6)+(h>>2) combine collides on small structured token ids)
inline uint64_t splitmix64(uint64_t x) {
  x += 0x9e3779b97f4a7c15ULL;
  x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ULL;
  x = (x ^ (x >> 27)) * 0x94d049bb133111ebULL;
  return x ^ (x >> 31);
}

inline uint64_t mix(uint64_t h, uint64_t v) {
  return splitmix64(h ^ splitmix64(v));
}

using Counts = std::unordered_map<uint64_t, int>;

// per-caption n-gram counts; counts[k] holds (k+1)-grams keyed by hash
struct NGrams {
  Counts counts[N_MAX];
  int len = 0;
};

NGrams precook(const uint32_t* toks, int len) {
  NGrams out;
  out.len = len;
  for (int n = 1; n <= N_MAX; ++n) {
    auto& c = out.counts[n - 1];
    for (int i = 0; i + n <= len; ++i) {
      uint64_t h = 1469598103934665603ULL ^ (uint64_t)n;
      for (int j = 0; j < n; ++j) h = mix(h, toks[i + j]);
      ++c[h];
    }
  }
  return out;
}

struct Vec {
  std::unordered_map<uint64_t, double> v[N_MAX];
  double norm[N_MAX] = {0, 0, 0, 0};
  long length = 0;  // counted from bigrams (pycocoevalcap quirk)
};

Vec counts_to_vec(const NGrams& g,
                  const std::unordered_map<uint64_t, double>& df_log,
                  double log_n) {
  Vec out;
  for (int k = 0; k < N_MAX; ++k) {
    for (const auto& [h, tf] : g.counts[k]) {
      auto it = df_log.find(h);
      double df = it == df_log.end() ? 0.0 : it->second;
      double val = double(tf) * (log_n - df);
      out.v[k][h] = val;
      out.norm[k] += val * val;
      if (k == 1) out.length += tf;
    }
    out.norm[k] = std::sqrt(out.norm[k]);
  }
  return out;
}

void sim(const Vec& h, const Vec& r, double out[N_MAX]) {
  double delta = double(h.length - r.length);
  double pen = std::exp(-(delta * delta) / (2 * SIGMA * SIGMA));
  for (int k = 0; k < N_MAX; ++k) {
    double acc = 0.0;
    for (const auto& [key, hv] : h.v[k]) {
      auto it = r.v[k].find(key);
      if (it == r.v[k].end()) continue;
      acc += std::min(hv, it->second) * it->second;
    }
    if (h.norm[k] != 0 && r.norm[k] != 0) acc /= h.norm[k] * r.norm[k];
    out[k] = acc * pen;
  }
}

}  // namespace

extern "C" {

// cand_tokens/cand_lens: n_images captions.  ref_tokens/ref_lens flat over
// all refs; refs_per_img[i] refs belong to image i, in order.
// per_image_out: n_images doubles.  Returns the corpus CIDEr-D.
double cider_d(const uint32_t* cand_tokens, const int32_t* cand_lens,
               int32_t n_images, const uint32_t* ref_tokens,
               const int32_t* ref_lens, const int32_t* refs_per_img,
               double* per_image_out) {
  std::vector<NGrams> cands(n_images);
  std::vector<std::vector<NGrams>> refs(n_images);

  const uint32_t* cp = cand_tokens;
  for (int i = 0; i < n_images; ++i) {
    cands[i] = precook(cp, cand_lens[i]);
    cp += cand_lens[i];
  }
  const uint32_t* rp = ref_tokens;
  const int32_t* rl = ref_lens;
  for (int i = 0; i < n_images; ++i) {
    refs[i].reserve(refs_per_img[i]);
    for (int j = 0; j < refs_per_img[i]; ++j) {
      refs[i].push_back(precook(rp, *rl));
      rp += *rl;
      ++rl;
    }
  }

  // document frequency: once per image over the union of its refs' n-grams
  std::unordered_map<uint64_t, int> df;
  for (int i = 0; i < n_images; ++i) {
    std::unordered_set<uint64_t> seen;
    for (const auto& r : refs[i])
      for (int k = 0; k < N_MAX; ++k)
        for (const auto& [h, _] : r.counts[k]) seen.insert(h);
    for (uint64_t h : seen) ++df[h];
  }
  std::unordered_map<uint64_t, double> df_log;
  df_log.reserve(df.size());
  for (const auto& [h, c] : df) df_log[h] = std::log(std::max(1.0, double(c)));
  double log_n = std::log(double(n_images));

  double total = 0.0;
  for (int i = 0; i < n_images; ++i) {
    Vec hv = counts_to_vec(cands[i], df_log, log_n);
    double per_n[N_MAX] = {0, 0, 0, 0};
    for (const auto& r : refs[i]) {
      Vec rv = counts_to_vec(r, df_log, log_n);
      double s[N_MAX];
      sim(hv, rv, s);
      for (int k = 0; k < N_MAX; ++k) per_n[k] += s[k];
    }
    double score = 0.0;
    for (int k = 0; k < N_MAX; ++k) score += per_n[k] / refs[i].size();
    score = score / N_MAX * 10.0;
    if (per_image_out) per_image_out[i] = score;
    total += score;
  }
  return total / n_images;
}

// COCO corpus BLEU 1..4 with 'closest' effective reference length.
// bleus_out: 4 doubles.
void coco_bleu(const uint32_t* cand_tokens, const int32_t* cand_lens,
               int32_t n_images, const uint32_t* ref_tokens,
               const int32_t* ref_lens, const int32_t* refs_per_img,
               double* bleus_out) {
  const double SMALL = 1e-9, TINY = 1e-15;
  long testlen_total = 0, reflen_total = 0;
  long guess[N_MAX] = {0, 0, 0, 0};
  long correct[N_MAX] = {0, 0, 0, 0};

  const uint32_t* cp = cand_tokens;
  const uint32_t* rp = ref_tokens;
  const int32_t* rl = ref_lens;
  for (int i = 0; i < n_images; ++i) {
    int tl = cand_lens[i];
    NGrams cand = precook(cp, tl);
    cp += tl;
    testlen_total += tl;

    // collect this image's refs
    std::vector<NGrams> refs;
    long best_diff = 1L << 60;
    long best_len = 0;
    for (int j = 0; j < refs_per_img[i]; ++j) {
      refs.push_back(precook(rp, *rl));
      long diff = std::abs(long(*rl) - long(tl));
      if (diff < best_diff || (diff == best_diff && *rl < best_len)) {
        best_diff = diff;
        best_len = *rl;
      }
      rp += *rl;
      ++rl;
    }
    reflen_total += best_len;

    for (int n = 1; n <= N_MAX; ++n) {
      Counts max_ref;
      for (const auto& r : refs)
        for (const auto& [h, c] : r.counts[n - 1]) {
          auto& m = max_ref[h];
          if (c > m) m = c;
        }
      long g = tl - n + 1;
      guess[n - 1] += g > 0 ? g : 0;
      for (const auto& [h, c] : cand.counts[n - 1]) {
        auto it = max_ref.find(h);
        if (it != max_ref.end())
          correct[n - 1] += std::min(c, it->second);
      }
    }
  }

  double running = 1.0;
  double ratio = (double(testlen_total) + TINY) / (double(reflen_total) + SMALL);
  for (int n = 0; n < N_MAX; ++n) {
    running *= (double(correct[n]) + TINY) / (double(guess[n]) + SMALL);
    double score = std::pow(running, 1.0 / (n + 1));
    if (ratio < 1.0) score *= std::exp(1.0 - 1.0 / ratio);
    bleus_out[n] = score;
  }
}

}  // extern "C"
