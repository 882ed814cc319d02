// Native single-host BPE trainer hot loop.
//
// This is a C++ port of tokenizers_tpu/trainers/bpe_trainer.py steps 4-5
// (pair counting + the (count desc, pair asc) heap merge loop with lazy
// count revalidation and incremental per-site deltas) — the same algorithm
// the reference implements in Rust (models/bpe/trainer.rs:420-593,
// word.rs:107-160), written from our Python implementation, not from the
// Rust source.  The Python trainer remains the oracle; tests assert the
// two produce identical merges.
//
// Scope: the per-merge corpus work is inherently serial in merge order and
// tiny per merge once counts decay — exactly the shape a CPU core wins at.
// The device trainers (ops/bpe_train_dense.py, ops/bpe_train_step.py) stay
// the multi-chip path (sharded corpus, psum'd deltas); this core is the
// single-host fast path the reference also runs natively.
//
// Build: g++ -O2 -shared -fPIC -std=c++17 (see native/__init__.py).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <queue>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Entry {
  int64_t count;
  uint64_t pair;
  uint64_t seq;
  int32_t pos_idx;  // index into the pos-set arena
};

// priority_queue pops the LARGEST element; "less" = lower priority.
// Priority: count desc, then pair asc, then seq asc (= Python heapq on
// (-count, pair, seq), = reference trainer.rs:30-39).
struct Less {
  bool operator()(const Entry& a, const Entry& b) const {
    if (a.count != b.count) return a.count < b.count;
    if (a.pair != b.pair) return a.pair > b.pair;
    return a.seq > b.seq;
  }
};

inline uint64_t key(int32_t a, int32_t b) {
  return (static_cast<uint64_t>(static_cast<uint32_t>(a)) << 32) |
         static_cast<uint32_t>(b);
}

// exact port of _merge_word_inplace: merge all (c1, c2) occurrences
// leftmost-first non-overlapping; record pair-count deltas (post-merge
// left neighbor, pre-merge right neighbor) gated by max_token_length.
void merge_word(std::vector<int32_t>& w, std::vector<int32_t>& lens,
                int32_t c1, int32_t c2, int32_t repl, int64_t max_len,
                std::vector<std::pair<uint64_t, int>>& changes) {
  changes.clear();
  size_t i = 0;
  while (i < w.size()) {
    if (w[i] == c1 && i + 1 < w.size() && w[i + 1] == c2) {
      int64_t new_len = static_cast<int64_t>(lens[i]) + lens[i + 1];
      if (i > 0) {
        changes.emplace_back(key(w[i - 1], c1), -1);
        if (lens[i - 1] + new_len < max_len) {
          changes.emplace_back(key(w[i - 1], repl), 1);
        }
      }
      w[i] = repl;
      lens[i] = static_cast<int32_t>(new_len);
      w.erase(w.begin() + i + 1);
      lens.erase(lens.begin() + i + 1);
      if (i < w.size() - 1) {
        changes.emplace_back(key(c2, w[i + 1]), -1);
        if (lens[i + 1] + new_len < max_len) {
          changes.emplace_back(key(repl, w[i + 1]), 1);
        }
      }
    }
    i += 1;
  }
}

}  // namespace

extern "C" {

// Returns the number of merges written (3 int32 per merge: a, b, new_id),
// or -1 if `cap` merges would be exceeded.
int64_t bpe_train_core(
    const int32_t* word_ids, const int64_t* word_off, const int64_t* counts,
    int64_t n_words, const uint8_t* vocab_bytes, const int64_t* vocab_off,
    int64_t n_vocab, const uint8_t* prefix_bytes, int64_t prefix_len,
    int64_t vocab_size, int64_t min_frequency, int64_t max_token_length,
    int32_t* out_pairs, int64_t cap) {
  // ---- vocab strings + reuse map -------------------------------------
  std::vector<std::string> id_to_word;
  id_to_word.reserve(static_cast<size_t>(vocab_size) + 16);
  std::unordered_map<std::string, int32_t> word_to_id;
  word_to_id.reserve(static_cast<size_t>(vocab_size) * 2);
  for (int64_t v = 0; v < n_vocab; ++v) {
    id_to_word.emplace_back(
        reinterpret_cast<const char*>(vocab_bytes) + vocab_off[v],
        static_cast<size_t>(vocab_off[v + 1] - vocab_off[v]));
    word_to_id[id_to_word.back()] = static_cast<int32_t>(v);
  }
  const std::string prefix(reinterpret_cast<const char*>(prefix_bytes),
                           static_cast<size_t>(prefix_len));

  // ---- tokenized words ------------------------------------------------
  std::vector<std::vector<int32_t>> words(static_cast<size_t>(n_words));
  std::vector<std::vector<int32_t>> lens(static_cast<size_t>(n_words));
  for (int64_t i = 0; i < n_words; ++i) {
    const int64_t s = word_off[i], e = word_off[i + 1];
    words[i].assign(word_ids + s, word_ids + e);
    lens[i].assign(static_cast<size_t>(e - s), 1);
  }

  // ---- step 4: initial pair counts + position sets --------------------
  std::unordered_map<uint64_t, int64_t> pair_counts;
  pair_counts.reserve(static_cast<size_t>(n_words) * 4);
  std::unordered_map<uint64_t, std::vector<int32_t>> wtu;
  wtu.reserve(static_cast<size_t>(n_words) * 4);
  for (int64_t i = 0; i < n_words; ++i) {
    const auto& w = words[i];
    for (size_t j = 0; j + 1 < w.size(); ++j) {
      const uint64_t p = key(w[j], w[j + 1]);
      pair_counts[p] += counts[i];
      auto& v = wtu[p];
      if (v.empty() || v.back() != static_cast<int32_t>(i)) {
        v.push_back(static_cast<int32_t>(i));
      }
    }
  }

  std::vector<std::vector<int32_t>> arena;
  arena.reserve(wtu.size() * 2);
  std::priority_queue<Entry, std::vector<Entry>, Less> heap;
  uint64_t seq = 0;
  for (auto& kv : wtu) {
    const int64_t c = pair_counts[kv.first];
    if (c > 0) {
      // initial sets are built in word order and deduped on append above
      arena.emplace_back(std::move(kv.second));
      heap.push(Entry{c, kv.first, seq++,
                      static_cast<int32_t>(arena.size() - 1)});
    }
  }
  wtu.clear();

  // ---- step 5: merge loop ---------------------------------------------
  int64_t n_cur = n_vocab;
  int64_t n_merges = 0;
  std::vector<std::pair<uint64_t, int>> changes;
  std::unordered_map<uint64_t, std::vector<int32_t>> round_wtu;
  while (true) {
    if (n_cur >= vocab_size) break;
    if (heap.empty()) break;
    Entry e = heap.top();
    heap.pop();
    auto it = pair_counts.find(e.pair);
    const int64_t current = (it == pair_counts.end()) ? 0 : it->second;
    if (e.count != current) {
      e.count = current;
      e.seq = seq++;
      heap.push(e);  // same pos set, revalidated count
      continue;
    }
    if (e.count < 1 || min_frequency > e.count) break;

    const int32_t a = static_cast<int32_t>(e.pair >> 32);
    const int32_t b = static_cast<int32_t>(e.pair & 0xFFFFFFFFu);
    const std::string& part_a = id_to_word[a];
    std::string part_b = id_to_word[b];
    if (!prefix.empty() && part_b.size() >= prefix.size() &&
        std::memcmp(part_b.data(), prefix.data(), prefix.size()) == 0) {
      part_b = part_b.substr(prefix.size());
    }
    std::string new_token = part_a + part_b;
    int32_t new_id;
    auto vit = word_to_id.find(new_token);
    if (vit != word_to_id.end()) {
      new_id = vit->second;
    } else {
      new_id = static_cast<int32_t>(id_to_word.size());
      id_to_word.push_back(new_token);
      word_to_id.emplace(std::move(new_token), new_id);
      n_cur += 1;
    }
    if (n_merges >= cap) return -1;
    out_pairs[n_merges * 3 + 0] = a;
    out_pairs[n_merges * 3 + 1] = b;
    out_pairs[n_merges * 3 + 2] = new_id;
    n_merges += 1;

    // apply at all recorded positions, ascending, deduped (set semantics)
    std::vector<int32_t>& pos = arena[e.pos_idx];
    std::sort(pos.begin(), pos.end());
    pos.erase(std::unique(pos.begin(), pos.end()), pos.end());
    round_wtu.clear();
    for (const int32_t i : pos) {
      merge_word(words[i], lens[i], a, b, new_id, max_token_length, changes);
      for (const auto& ch : changes) {
        pair_counts[ch.first] += ch.second * counts[i];
        if (ch.second > 0) {
          auto& v = round_wtu[ch.first];
          if (v.empty() || v.back() != i) v.push_back(i);
        }
      }
    }
    for (auto& kv : round_wtu) {
      const int64_t c = pair_counts[kv.first];
      if (c > 0) {
        arena.emplace_back(std::move(kv.second));
        heap.push(Entry{c, kv.first, seq++,
                        static_cast<int32_t>(arena.size() - 1)});
      }
    }
  }
  return n_merges;
}

}  // extern "C"
