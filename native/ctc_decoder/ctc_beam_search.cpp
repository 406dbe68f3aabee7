// CTC prefix beam search with n-gram LM fusion + Levenshtein distance.
//
// Native equivalent of the reference's C++ decoder stack: the SWIG-wrapped
// OpenSeq2Seq `ctc_decoders` extension + KenLM Scorer used by
// /root/reference/beam_search.py (ctc_beam_search_decoder_batch with
// beam_size / num_processes / cutoff_prob / cutoff_top_n and an
// alpha/beta-weighted word LM), and the `editdistance` C extension used by
// utils/asr_metrics.py.  Implemented from scratch:
//
//   * ArpaLM: ARPA-format n-gram model loader with standard backoff
//     queries (the KenLM role).  log10 in the file, natural log internally.
//   * Prefix beam search over (blank, non-blank) path probabilities in log
//     space; per-frame candidate pruning by cutoff_top_n / cutoff_prob;
//     word-boundary LM scoring  alpha * ln P(w|h) + beta  (char-level LM
//     scoring when the vocabulary has no space symbol, e.g. Mandarin).
//   * Batch decode fanned out over a std::thread pool.
//
// C ABI only — consumed from Python via ctypes (no pybind11 in this image).

#include <algorithm>
#include <atomic>
#include <cctype>
#include <numeric>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <memory>
#include <sstream>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

constexpr float kNegInf = -1e30f;
constexpr double kLog10 = 2.302585092994046;  // ln(10)

inline float log_sum_exp(float a, float b) {
  if (a <= kNegInf) return b;
  if (b <= kNegInf) return a;
  float m = std::max(a, b);
  return m + std::log(std::exp(a - m) + std::exp(b - m));
}

// ---------------------------------------------------------------------------
// ARPA n-gram language model with backoff
// ---------------------------------------------------------------------------

struct NgramEntry {
  float logp;      // natural log
  float backoff;   // natural log
};

struct VectorHash {
  size_t operator()(const std::vector<int>& v) const {
    size_t h = 146527;
    for (int x : v) h = h * 1000003u + static_cast<size_t>(x) + 0x9e3779b9u;
    return h;
  }
};

class ArpaLM {
 public:
  bool Load(const std::string& path) {
    std::ifstream in(path);
    if (!in) return false;
    std::string line;
    int order = 0;
    bool in_data = false;
    while (std::getline(in, line)) {
      // strip trailing CR
      while (!line.empty() && (line.back() == '\r' || line.back() == '\n')) line.pop_back();
      if (line == "\\data\\") { in_data = true; continue; }
      if (line.rfind("ngram ", 0) == 0 && in_data) {
        max_order_ = std::max(max_order_, std::atoi(line.c_str() + 6));
        continue;
      }
      if (!line.empty() && line[0] == '\\') {
        if (line == "\\end\\") break;
        size_t dash = line.find("-grams:");
        if (dash != std::string::npos) {
          order = std::atoi(line.substr(1, dash - 1).c_str());
        }
        continue;
      }
      if (order == 0 || line.empty()) continue;

      std::istringstream ss(line);
      double logp10;
      if (!(ss >> logp10)) continue;
      std::vector<int> ids;
      ids.reserve(order);
      std::string word;
      for (int i = 0; i < order; ++i) {
        if (!(ss >> word)) break;
        ids.push_back(WordId(word, /*add=*/true));
      }
      if (static_cast<int>(ids.size()) != order) continue;
      double backoff10 = 0.0;
      bool has_backoff = static_cast<bool>(ss >> backoff10);
      NgramEntry e;
      e.logp = static_cast<float>(logp10 * kLog10);
      e.backoff = has_backoff ? static_cast<float>(backoff10 * kLog10) : 0.0f;
      tables_[order - 1][std::move(ids)] = e;
    }
    loaded_ = true;
    return true;
  }

  int WordId(const std::string& w, bool add = false) {
    auto it = vocab_.find(w);
    if (it != vocab_.end()) return it->second;
    if (!add) return -1;  // OOV
    int id = static_cast<int>(vocab_.size());
    vocab_.emplace(w, id);
    return id;
  }

  int unk_id() { return WordId("<unk>"); }
  int bos_id() { return WordId("<s>"); }
  int max_order() const { return max_order_; }
  bool loaded() const { return loaded_; }

  // P(w | history), natural log, with standard backoff recursion.
  float Score(const std::vector<int>& history, int word) const {
    std::vector<int> ngram;
    int ctx = std::min<int>(history.size(), max_order_ - 1);
    ngram.reserve(ctx + 1);
    for (int i = static_cast<int>(history.size()) - ctx;
         i < static_cast<int>(history.size()); ++i)
      ngram.push_back(history[i]);
    ngram.push_back(word);
    return ScoreNgram(ngram);
  }

 private:
  float ScoreNgram(const std::vector<int>& ngram) const {
    int n = static_cast<int>(ngram.size());
    if (n == 0) return kNegInf;
    if (n <= max_order_) {
      auto it = tables_[n - 1].find(ngram);
      if (it != tables_[n - 1].end()) return it->second.logp;
    }
    if (n == 1) return kNegInf;  // true OOV (caller maps to <unk> first)
    // backoff(history) + P(w | shorter history)
    float bo = 0.0f;
    std::vector<int> hist(ngram.begin(), ngram.end() - 1);
    if (static_cast<int>(hist.size()) <= max_order_) {
      auto it = tables_[hist.size() - 1].find(hist);
      if (it != tables_[hist.size() - 1].end()) bo = it->second.backoff;
    }
    std::vector<int> shorter(ngram.begin() + 1, ngram.end());
    return bo + ScoreNgram(shorter);
  }

  static constexpr int kMaxOrder = 9;
  std::unordered_map<std::string, int> vocab_;
  std::unordered_map<std::vector<int>, NgramEntry, VectorHash> tables_[kMaxOrder];
  int max_order_ = 0;
  bool loaded_ = false;
};

// ---------------------------------------------------------------------------
// Prefix beam search
// ---------------------------------------------------------------------------

struct Prefix {
  std::vector<int> chars;   // emitted label ids
  float p_b = kNegInf;      // prob of paths ending in blank
  float p_nb = kNegInf;     // prob of paths ending in the last char
  float lm_score = 0.0f;    // accumulated alpha*lnP + beta bonuses
  std::vector<int> words;   // completed LM word ids (history)
  int hot_node = 0;         // hotword-trie state (0 = root)
  float hot_accum = 0.0f;   // boost granted for the current partial match

  float total() const { return log_sum_exp(p_b, p_nb) + lm_score; }
};

// Character trie over vocab ids for hot-word (contextual-biasing) boosting.
// Shallow fusion: while a beam's trailing partial word tracks a hotword
// prefix it earns boost/len per matched char; falling off the trie (or
// hitting a word boundary mid-match) retracts the partial boost; reaching
// a terminal locks in exactly that word's full boost.
struct HotwordTrie {
  struct Node {
    std::unordered_map<int, int> next;  // vocab id -> node index
    float per_char = 0.0f;              // max boost/len through this node
    float terminal_boost = kNegInf;     // full boost if a hotword ends here
  };
  std::vector<Node> nodes{1};  // [0] = root

  void Add(const std::vector<int>& ids, float boost) {
    if (ids.empty()) return;
    float per_char = boost / static_cast<float>(ids.size());
    int cur = 0;
    for (int id : ids) {
      auto it = nodes[cur].next.find(id);
      if (it == nodes[cur].next.end()) {
        nodes.push_back(Node{});
        it = nodes[cur].next.emplace(id, static_cast<int>(nodes.size()) - 1).first;
      }
      cur = it->second;
      nodes[cur].per_char = std::max(nodes[cur].per_char, per_char);
    }
    nodes[cur].terminal_boost = std::max(nodes[cur].terminal_boost, boost);
  }

  bool empty() const { return nodes.size() == 1; }
};

struct PrefixHash {
  size_t operator()(const std::vector<int>& v) const { return VectorHash()(v); }
};

class Decoder {
 public:
  Decoder(std::vector<std::string> vocab, int beam_size, double alpha, double beta,
          double cutoff_prob, int cutoff_top_n, ArpaLM* lm)
      : vocab_(std::move(vocab)), beam_size_(beam_size), alpha_(alpha), beta_(beta),
        cutoff_prob_(cutoff_prob), cutoff_top_n_(cutoff_top_n), lm_(lm) {
    space_id_ = -1;
    for (size_t i = 0; i < vocab_.size(); ++i)
      if (vocab_[i] == " ") space_id_ = static_cast<int>(i);
    char_level_lm_ = (space_id_ < 0);  // e.g. Mandarin char LM
  }

  // log_probs: (T, C) row-major, C = vocab+1, blank = C-1.
  std::vector<int> Decode(const float* log_probs, int T, int C) const {
    const int blank = C - 1;
    std::vector<Prefix> beams(1);
    beams[0].p_b = 0.0f;

    std::vector<int> cand(C);
    for (int t = 0; t < T; ++t) {
      const float* row = log_probs + static_cast<int64_t>(t) * C;

      // candidate pruning: top cutoff_top_n by prob, cumulative cutoff_prob
      std::iota(cand.begin(), cand.end(), 0);
      int top_n = std::min(cutoff_top_n_ > 0 ? cutoff_top_n_ : C, C);
      std::partial_sort(cand.begin(), cand.begin() + top_n, cand.end(),
                        [row](int a, int b) { return row[a] > row[b]; });
      int n_cand = top_n;
      if (cutoff_prob_ < 1.0) {
        double cum = 0.0;
        for (int i = 0; i < top_n; ++i) {
          cum += std::exp(static_cast<double>(row[cand[i]]));
          if (cum >= cutoff_prob_) { n_cand = i + 1; break; }
        }
      }

      std::unordered_map<std::vector<int>, Prefix, PrefixHash> next;
      next.reserve(beams.size() * (n_cand + 1));
      auto upsert = [&](const Prefix& base, const std::vector<int>& chars) -> Prefix& {
        auto it = next.find(chars);
        if (it == next.end()) {
          Prefix p;
          p.chars = chars;
          p.lm_score = base.lm_score;
          p.words = base.words;
          p.hot_node = base.hot_node;
          p.hot_accum = base.hot_accum;
          it = next.emplace(chars, std::move(p)).first;
        }
        return it->second;
      };

      for (const Prefix& pre : beams) {
        float p_total = log_sum_exp(pre.p_b, pre.p_nb);
        for (int i = 0; i < n_cand; ++i) {
          int c = cand[i];
          float p = row[c];
          if (c == blank) {
            Prefix& nx = upsert(pre, pre.chars);
            nx.p_b = log_sum_exp(nx.p_b, p_total + p);
            continue;
          }
          bool repeat = !pre.chars.empty() && pre.chars.back() == c;
          if (repeat) {
            // same char, no blank in between: extends the same prefix
            Prefix& same = upsert(pre, pre.chars);
            same.p_nb = log_sum_exp(same.p_nb, pre.p_nb + p);
            // with blank in between: new char appended
            std::vector<int> ext = pre.chars;
            ext.push_back(c);
            Prefix& nx = upsert(pre, ext);
            ExtendScores(pre, nx, c);
            nx.p_nb = log_sum_exp(nx.p_nb, pre.p_b + p);
          } else {
            std::vector<int> ext = pre.chars;
            ext.push_back(c);
            Prefix& nx = upsert(pre, ext);
            ExtendScores(pre, nx, c);
            nx.p_nb = log_sum_exp(nx.p_nb, p_total + p);
          }
        }
      }

      // prune to beam_size by total score
      beams.clear();
      beams.reserve(next.size());
      for (auto& kv : next) beams.push_back(std::move(kv.second));
      int keep = std::min<int>(beam_size_, beams.size());
      std::partial_sort(beams.begin(), beams.begin() + keep, beams.end(),
                        [](const Prefix& a, const Prefix& b) { return a.total() > b.total(); });
      beams.resize(keep);
    }

    // score the trailing partial word at sequence end
    const Prefix* best = nullptr;
    float best_score = kNegInf;
    std::vector<float> finals(beams.size());
    for (size_t i = 0; i < beams.size(); ++i) {
      float s = beams[i].total();
      if (lm_ && lm_->loaded() && !char_level_lm_) {
        std::string word = TrailingWord(beams[i].chars);
        if (!word.empty()) s += WordBonus(beams[i].words, word);
      }
      s -= beams[i].hot_accum;  // retract an incomplete hotword match
      if (s > best_score) { best_score = s; best = &beams[i]; }
    }
    if (!best) return {};
    return best->chars;
  }

 public:
  void AddHotword(const std::vector<int>& ids, float boost) { hot_.Add(ids, boost); }

 private:
  // Extension scoring entry point: resets nx's score-state from `pre` so
  // the result is a pure function of (pre.chars, c) — an upsert may have
  // base-copied fields from a different (carried-forward) beam with the
  // same chars, and ApplyHotword's relative update must not stack on them.
  void ExtendScores(const Prefix& pre, Prefix& nx, int c) const {
    nx.lm_score = pre.lm_score;
    nx.words = pre.words;
    nx.hot_node = pre.hot_node;
    nx.hot_accum = pre.hot_accum;
    ApplyExtension(pre, nx, c);
    ApplyHotword(pre, nx, c);
  }

  // Hot-word biasing on appending char `c`: advance/retract the trie match.
  // Must run AFTER ApplyExtension (which overwrites nx.lm_score).  All
  // updates are deterministic functions of (pre, c), so re-applying on an
  // upsert-merged prefix writes the same values.
  void ApplyHotword(const Prefix& pre, Prefix& nx, int c) const {
    if (hot_.empty()) return;
    int node = pre.hot_node;
    float accum = pre.hot_accum;
    float delta = 0.0f;
    const bool word_level = (space_id_ >= 0);

    auto advance = [&](int from, int ch) -> bool {
      auto it = hot_.nodes[from].next.find(ch);
      if (it == hot_.nodes[from].next.end()) return false;
      node = it->second;
      float b = hot_.nodes[node].per_char;
      delta += b;
      accum += b;
      if (hot_.nodes[node].terminal_boost > kNegInf) {
        // completed hotword: lock in exactly its boost (longer hotwords
        // sharing this prefix keep matching; nested completions stack)
        delta += hot_.nodes[node].terminal_boost - accum;
        accum = 0.0f;
      }
      return true;
    };

    if (word_level && c == space_id_) {
      delta -= accum;  // word ended mid-match: retract the partial boost
      accum = 0.0f;
      node = 0;
    } else if (node >= 0 && advance(node, c)) {
      // matched — state already updated
    } else {
      delta -= accum;  // fell off the trie: retract
      accum = 0.0f;
      if (word_level) {
        node = -1;  // matches must start at word boundaries
      } else {
        node = 0;   // char-level (no space symbol): try restarting at c
        advance(0, c);
      }
    }
    nx.lm_score += delta;
    nx.hot_node = node;
    nx.hot_accum = accum;
  }

  // LM hook on appending char `c` to prefix `pre`, updating `nx` in place.
  void ApplyExtension(const Prefix& pre, Prefix& nx, int c) const {
    if (!lm_ || !lm_->loaded()) return;
    if (char_level_lm_) {
      int wid = lm_->WordId(vocab_[c]);
      if (wid < 0) wid = lm_->unk_id();
      float lp = (wid >= 0) ? lm_->Score(pre.words, wid) : kNegInf * 0 - 20.0f;
      nx.lm_score = pre.lm_score + static_cast<float>(alpha_) * lp + static_cast<float>(beta_);
      nx.words = pre.words;
      if (wid >= 0) nx.words.push_back(wid);
      return;
    }
    if (c == space_id_) {
      std::string word = TrailingWord(pre.chars);
      if (!word.empty()) {
        nx.lm_score = pre.lm_score + WordBonus(pre.words, word);
        nx.words = pre.words;
        int wid = lm_->WordId(word);
        if (wid < 0) wid = lm_->unk_id();
        if (wid >= 0) nx.words.push_back(wid);
      }
    }
  }

  float WordBonus(const std::vector<int>& history, const std::string& word) const {
    int wid = lm_->WordId(word);
    if (wid < 0) wid = lm_->unk_id();
    float lp = (wid >= 0) ? lm_->Score(history, wid) : -20.0f;
    if (lp <= kNegInf) lp = -20.0f;
    return static_cast<float>(alpha_) * lp + static_cast<float>(beta_);
  }

  std::string TrailingWord(const std::vector<int>& chars) const {
    std::string w;
    for (auto it = chars.rbegin(); it != chars.rend(); ++it) {
      if (*it == space_id_) break;
      w = vocab_[*it] + w;
    }
    return w;
  }

  std::vector<std::string> vocab_;
  int beam_size_;
  double alpha_, beta_, cutoff_prob_;
  int cutoff_top_n_;
  ArpaLM* lm_;
  int space_id_;
  bool char_level_lm_;
  HotwordTrie hot_;
};

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

void* lasr_lm_load(const char* arpa_path) {
  auto lm = std::make_unique<ArpaLM>();
  if (!lm->Load(arpa_path)) return nullptr;
  return lm.release();
}

void lasr_lm_free(void* lm) { delete static_cast<ArpaLM*>(lm); }

int lasr_lm_order(void* lm) { return static_cast<ArpaLM*>(lm)->max_order(); }

double lasr_lm_score_sentence(void* lm_ptr, const char* sentence) {
  // Score a whitespace-split sentence (for tests): sum ln P(w_i | history).
  auto* lm = static_cast<ArpaLM*>(lm_ptr);
  std::istringstream ss(sentence);
  std::string w;
  std::vector<int> hist;
  int bos = lm->bos_id();
  if (bos >= 0) hist.push_back(bos);
  double total = 0.0;
  while (ss >> w) {
    int wid = lm->WordId(w);
    if (wid < 0) wid = lm->unk_id();
    total += lm->Score(hist, wid);
    hist.push_back(wid);
  }
  return total;
}

void* lasr_decoder_create(const char** vocab, int vocab_size, int beam_size,
                          double alpha, double beta, double cutoff_prob,
                          int cutoff_top_n, void* lm) {
  std::vector<std::string> v(vocab, vocab + vocab_size);
  return new Decoder(std::move(v), beam_size, alpha, beta, cutoff_prob,
                     cutoff_top_n, static_cast<ArpaLM*>(lm));
}

void lasr_decoder_free(void* d) { delete static_cast<Decoder*>(d); }

// Register a hot word for contextual biasing: `ids` are vocab label ids
// (length n), boost is the total additive log-score granted when the word
// completes (partial matches earn boost/n per char, retracted on mismatch).
void lasr_decoder_add_hotword(void* d, const int* ids, int n, float boost) {
  static_cast<Decoder*>(d)->AddHotword(std::vector<int>(ids, ids + n), boost);
}

// Decode one utterance. Returns emitted length; out_ids must hold >= T ints.
int lasr_decode(void* d, const float* log_probs, int T, int C, int* out_ids) {
  std::vector<int> ids = static_cast<Decoder*>(d)->Decode(log_probs, T, C);
  std::copy(ids.begin(), ids.end(), out_ids);
  return static_cast<int>(ids.size());
}

// Batched decode over a thread pool (the reference's num_processes).
// log_probs: (B, T, C); lengths: per-sample valid T. out_ids: (B, T).
void lasr_decode_batch(void* d, const float* log_probs, const int* lengths,
                       int B, int T, int C, int num_threads, int* out_ids,
                       int* out_lens) {
  auto* dec = static_cast<Decoder*>(d);
  num_threads = std::max(1, num_threads);
  std::vector<std::thread> pool;
  std::atomic_int next_idx{0};
  auto worker = [&]() {
    for (;;) {
      int b = next_idx.fetch_add(1);
      if (b >= B) return;
      const float* lp = log_probs + static_cast<int64_t>(b) * T * C;
      out_lens[b] = lasr_decode(dec, lp, lengths[b], C,
                                out_ids + static_cast<int64_t>(b) * T);
    }
  };
  for (int i = 0; i < num_threads; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

// Levenshtein distance over int token ids (the editdistance C-ext role).
int lasr_editdistance(const int* a, int la, const int* b, int lb) {
  if (la < lb) { std::swap(a, b); std::swap(la, lb); }
  if (lb == 0) return la;
  std::vector<int> prev(lb + 1), cur(lb + 1);
  for (int j = 0; j <= lb; ++j) prev[j] = j;
  for (int i = 1; i <= la; ++i) {
    cur[0] = i;
    for (int j = 1; j <= lb; ++j) {
      cur[j] = std::min({prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1] ? 1 : 0)});
    }
    std::swap(prev, cur);
  }
  return prev[lb];
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Native WAV batch loader — the data-loader runtime component.
//
// Decodes PCM16/PCM32/float32 RIFF WAVE files straight into a caller-provided
// padded float32 batch buffer, fanned out over a thread pool and entirely
// outside the Python GIL, so host-side batch assembly overlaps device compute
// (the reference used 6 torch dataloader worker processes for this role).
// ---------------------------------------------------------------------------

#include <cstdio>

extern "C" {

// Decode one wav into out[0..max_samples); returns sample count (clamped),
// or -1 on error. offset: first sample of the crop window (reference
// sub_secquence); prev_sample receives the raw sample before the crop.
// Exactly one of out_f32 / out_i16 must be non-null: the i16 form keeps the
// raw PCM16 samples (mono PCM16 = straight memcpy) — half the bytes on the
// wire to the device, which rescales by 1/32768.
// Parse a RIFF WAVE image already in memory (the serving path hands us
// request bodies without touching disk; the file path below reads the file
// then delegates here).
static int parse_wav_mem_impl(const unsigned char* file, long fsize,
                              float* out_f32, int16_t* out_i16,
                              int max_samples, int offset, float* prev_sample,
                              int* sample_rate) {
  if (fsize < 12 || std::memcmp(file, "RIFF", 4) != 0 ||
      std::memcmp(file + 8, "WAVE", 4) != 0) return -1;

  int audio_format = 0, channels = 1, bits = 16, sr = 0;
  long data_pos = -1; unsigned data_size = 0;
  long pos = 12;
  while (pos + 8 <= fsize) {
    const unsigned char* chunk = file + pos;
    unsigned size = chunk[4] | (chunk[5] << 8) | (chunk[6] << 16) |
                    (unsigned(chunk[7]) << 24);
    pos += 8;
    if (std::memcmp(chunk, "fmt ", 4) == 0) {
      if (pos + 16 > fsize) return -1;
      const unsigned char* fmt = file + pos;
      audio_format = fmt[0] | (fmt[1] << 8);
      channels = fmt[2] | (fmt[3] << 8);
      sr = fmt[4] | (fmt[5] << 8) | (fmt[6] << 16) | (unsigned(fmt[7]) << 24);
      bits = fmt[14] | (fmt[15] << 8);
    } else if (std::memcmp(chunk, "data", 4) == 0) {
      if (pos + long(size) > fsize) return -1;  // truncated body
      data_pos = pos;
      data_size = size;
    }
    pos += size + (size & 1);
  }
  if (data_pos < 0 || sr == 0 || channels <= 0 || bits < 8) return -1;
  if (sample_rate) *sample_rate = sr;

  const unsigned char* raw = file + data_pos;
  const int bytes_per = bits / 8;
  const long n_frames = data_size / (bytes_per * channels);

  auto sample_at = [&](long i) -> float {  // mono-mixed frame i
    double acc = 0.0;
    for (int ch = 0; ch < channels; ++ch) {
      const unsigned char* p = raw + (i * channels + ch) * bytes_per;
      if (audio_format == 3 && bits == 32) {
        float v; std::memcpy(&v, p, 4); acc += v;
      } else if (bits == 16) {
        int16_t v = int16_t(p[0] | (p[1] << 8)); acc += v / 32768.0;
      } else if (bits == 32) {
        int32_t v; std::memcpy(&v, p, 4); acc += v / 2147483648.0;
      } else if (bits == 8) {
        acc += (int(p[0]) - 128) / 128.0;
      }
    }
    return float(acc / channels);
  };

  if (prev_sample) *prev_sample = (offset > 0 && offset <= n_frames)
      ? sample_at(offset - 1) : 0.0f;
  long n = n_frames - offset;
  if (n < 0) n = 0;
  if (n > max_samples) n = max_samples;
  // fast path: mono PCM16 (the prep scripts' output format)
  if (channels == 1 && bits == 16 && audio_format != 3) {
    const unsigned char* p = raw + offset * 2;
    if (out_i16) {
      std::memcpy(out_i16, p, size_t(n) * 2);  // little-endian both sides
    } else {
      for (long i = 0; i < n; ++i)
        out_f32[i] = int16_t(p[2 * i] | (p[2 * i + 1] << 8)) / 32768.0f;
    }
  } else if (out_i16) {
    for (long i = 0; i < n; ++i) {
      float v = sample_at(offset + i) * 32768.0f;
      v = std::max(-32768.0f, std::min(32767.0f, v));
      out_i16[i] = int16_t(std::lrintf(v));
    }
  } else {
    for (long i = 0; i < n; ++i) out_f32[i] = sample_at(offset + i);
  }
  return int(n);
}

static int load_wav_impl(const char* path, float* out_f32, int16_t* out_i16,
                         int max_samples, int offset, float* prev_sample,
                         int* sample_rate) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long fsize = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (fsize <= 0) { std::fclose(f); return -1; }
  std::vector<unsigned char> file(static_cast<size_t>(fsize));
  if (std::fread(file.data(), 1, size_t(fsize), f) != size_t(fsize)) {
    std::fclose(f); return -1;
  }
  std::fclose(f);
  return parse_wav_mem_impl(file.data(), fsize, out_f32, out_i16, max_samples,
                            offset, prev_sample, sample_rate);
}

int lasr_load_wav(const char* path, float* out, int max_samples,
                  int offset, float* prev_sample, int* sample_rate) {
  return load_wav_impl(path, out, nullptr, max_samples, offset, prev_sample,
                       sample_rate);
}

int lasr_load_wav_i16(const char* path, int16_t* out, int max_samples,
                      int offset, float* prev_sample, int* sample_rate) {
  return load_wav_impl(path, nullptr, out, max_samples, offset, prev_sample,
                       sample_rate);
}

// Batched: fill a (B, max_samples) row-major float32 OR int16 buffer from B
// paths over a thread pool. lens/prev/srs receive per-row results (-1 =
// error). Exactly one of out_f32/out_i16 is non-null.
static void load_wav_batch_impl(const char** paths, const int* offsets, int B,
                                float* out_f32, int16_t* out_i16,
                                int max_samples, int num_threads,
                                int* lens, float* prevs, int* srs) {
  num_threads = std::max(1, num_threads);
  std::atomic_int next{0};
  auto worker = [&]() {
    for (;;) {
      int b = next.fetch_add(1);
      if (b >= B) return;
      lens[b] = load_wav_impl(
          paths[b],
          out_f32 ? out_f32 + int64_t(b) * max_samples : nullptr,
          out_i16 ? out_i16 + int64_t(b) * max_samples : nullptr,
          max_samples, offsets ? offsets[b] : 0,
          prevs ? prevs + b : nullptr, srs ? srs + b : nullptr);
    }
  };
  std::vector<std::thread> pool;
  for (int i = 0; i < num_threads; ++i) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
}

void lasr_load_wav_batch(const char** paths, const int* offsets, int B,
                         float* out, int max_samples, int num_threads,
                         int* lens, float* prevs, int* srs) {
  load_wav_batch_impl(paths, offsets, B, out, nullptr, max_samples,
                      num_threads, lens, prevs, srs);
}

void lasr_load_wav_batch_i16(const char** paths, const int* offsets, int B,
                             int16_t* out, int max_samples, int num_threads,
                             int* lens, float* prevs, int* srs) {
  load_wav_batch_impl(paths, offsets, B, nullptr, out, max_samples,
                      num_threads, lens, prevs, srs);
}

// Batched decode of IN-MEMORY wav images (the serving runtime: request
// bodies are decoded once per device batch over this pool, GIL-free,
// instead of per-request Python threads).  lens[b] = -1 marks a malformed
// body.
void lasr_parse_wav_batch_mem(const unsigned char** bufs, const long* sizes,
                              int B, float* out, int max_samples,
                              int num_threads, int* lens, int* srs) {
  num_threads = std::max(1, num_threads);
  std::atomic_int next{0};
  auto worker = [&]() {
    for (;;) {
      int b = next.fetch_add(1);
      if (b >= B) return;
      lens[b] = parse_wav_mem_impl(bufs[b], sizes[b],
                                   out + int64_t(b) * max_samples, nullptr,
                                   max_samples, 0, nullptr,
                                   srs ? srs + b : nullptr);
    }
  };
  std::vector<std::thread> pool;
  for (int i = 0; i < num_threads && i < B; ++i) pool.emplace_back(worker);
  if (pool.empty()) worker();
  for (auto& t : pool) t.join();
}

}  // extern "C"
