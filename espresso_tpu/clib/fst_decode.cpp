// Token-passing Viterbi beam decoder over a decoding graph (HCLG-style FST).
//
// TPU-native rebuild of the hybrid path's external Kaldi decoder invocation
// (reference: espresso/dump_posteriors.py:148+ piping matrices to Kaldi's
// latgen-faster-mapped, examples/asr_wsj/run_chain_e2e.sh:218-222). Instead
// of an external process, the graph is loaded from OpenFst text format on
// the Python side and decoded here over the dumped log-likelihood matrix.
//
// Conventions (matching the "mapped" decoder's contract):
//   - arc input label il > 0 indexes log-likelihood column il-1 (pdf id);
//     il == 0 is an epsilon (non-emitting) arc traversed within a frame
//   - arc weight is the graph cost (tropical semiring, lower is better);
//     acoustic cost of an emitting arc at frame t is
//     -acoustic_scale * loglikes[t][il-1]
//   - output labels (words) are collected along the best path; 0s dropped
//
// Graph layout: arcs sorted by source state (CSR): arc_offsets[S+1],
// arc_dst/arc_il/arc_ol/arc_w arrays. final_w[s] = final cost or +inf.
//
// Pruning: per-frame beam around the running best cost plus a max_active
// histogram cutoff, the same control surface as the reference decoder's
// --beam / --max-active flags.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>
#include <limits>

namespace {

constexpr float kInf = std::numeric_limits<float>::infinity();

struct Token {
  float cost;
  int32_t back;    // arena index of the predecessor token (-1 for start)
  int32_t olabel;  // output label on the arc that created this token
};

struct Frame {
  std::vector<int32_t> states;  // active states this frame
  std::vector<int32_t> toks;    // arena index per active state
};

}  // namespace

extern "C" {

// Returns n >= 0 (the number of output labels on the best FINAL path) or
// the encoding -(n + 1) when no final state was reached (the best
// non-final token is backtraced instead; n is still its label count).
// At most min(n, out_cap) labels are written to out_labels — compare the
// decoded count against out_cap and retry with a larger buffer on
// truncation (epsilon word arcs are not bounded by T, so no T-derived cap
// is safe a priori). best_cost_out receives the total path cost
// (including the final weight when reached). Returns INT32_MIN only for
// the degenerate no-token case (empty graph).
int32_t fst_viterbi_decode(
    const int32_t* arc_offsets,  // [S+1]
    const int32_t* arc_dst,      // [A]
    const int32_t* arc_il,       // [A]
    const int32_t* arc_ol,       // [A]
    const float* arc_w,          // [A]
    const float* final_w,        // [S] (+inf when not final)
    int32_t num_states, int32_t start_state,
    const float* loglikes,  // [T * P] row-major
    int32_t T, int32_t P,
    float acoustic_scale, float beam, int32_t max_active,
    int32_t* out_labels, int32_t out_cap, float* best_cost_out) {
  std::vector<Token> arena;
  arena.reserve(4096);

  // state -> token index for the frame being built, epoch-stamped so the
  // map resets in O(active) instead of O(S)
  std::vector<int32_t> tok_of_state(num_states, -1);
  std::vector<int32_t> stamp(num_states, -1);

  Frame cur;
  auto relax = [&](Frame& f, int epoch, int32_t state, float cost,
                   int32_t back, int32_t olabel) -> bool {
    if (stamp[state] != epoch) {
      stamp[state] = epoch;
      tok_of_state[state] = (int32_t)arena.size();
      arena.push_back({cost, back, olabel});
      f.states.push_back(state);
      f.toks.push_back(tok_of_state[state]);
      return true;
    }
    Token& t = arena[tok_of_state[state]];
    if (cost < t.cost) {
      t = {cost, back, olabel};
      return true;
    }
    return false;
  };

  // epsilon closure of frame f (in-place): repeatedly relax eps arcs from
  // states whose tokens improved. Queue-based; graph eps-cycles with
  // non-negative cost terminate because costs strictly decrease on update.
  auto eps_closure = [&](Frame& f, int epoch) {
    std::vector<int32_t> queue(f.states.begin(), f.states.end());
    size_t qi = 0;
    while (qi < queue.size()) {
      int32_t s = queue[qi++];
      float c = arena[tok_of_state[s]].cost;
      int32_t my_tok = tok_of_state[s];
      for (int32_t a = arc_offsets[s]; a < arc_offsets[s + 1]; ++a) {
        if (arc_il[a] != 0) continue;
        if (relax(f, epoch, arc_dst[a], c + arc_w[a], my_tok, arc_ol[a]))
          queue.push_back(arc_dst[a]);
      }
    }
  };

  int epoch = 0;
  relax(cur, epoch, start_state, 0.0f, -1, 0);
  eps_closure(cur, epoch);

  for (int32_t t = 0; t < T; ++t) {
    // beam + max_active pruning of the current frame before expansion
    float best = kInf;
    for (int32_t tk : cur.toks) best = std::min(best, arena[tk].cost);
    float cutoff = best + beam;
    if (max_active > 0 && (int32_t)cur.states.size() > max_active) {
      std::vector<float> costs;
      costs.reserve(cur.toks.size());
      for (int32_t tk : cur.toks) costs.push_back(arena[tk].cost);
      std::nth_element(costs.begin(), costs.begin() + max_active - 1,
                       costs.end());
      cutoff = std::min(cutoff, costs[max_active - 1]);
    }

    Frame next;
    ++epoch;
    const float* ll = loglikes + (size_t)t * P;
    for (size_t i = 0; i < cur.states.size(); ++i) {
      int32_t s = cur.states[i];
      float c = arena[cur.toks[i]].cost;
      if (c > cutoff) continue;
      for (int32_t a = arc_offsets[s]; a < arc_offsets[s + 1]; ++a) {
        int32_t il = arc_il[a];
        if (il == 0) continue;  // eps handled in closure
        if (il - 1 >= P) continue;
        float nc = c + arc_w[a] - acoustic_scale * ll[il - 1];
        if (nc > cutoff + beam) continue;
        relax(next, epoch, arc_dst[a], nc, cur.toks[i], arc_ol[a]);
      }
    }
    eps_closure(next, epoch);
    if (next.states.empty()) break;  // decode died; backtrace best so far
    cur = std::move(next);
  }

  // pick the best token, preferring final states
  int32_t best_tok = -1;
  float best_cost = kInf;
  bool reached_final = false;
  for (size_t i = 0; i < cur.states.size(); ++i) {
    float fw = final_w[cur.states[i]];
    if (fw < kInf) {
      float c = arena[cur.toks[i]].cost + fw;
      if (!reached_final || c < best_cost) {
        best_cost = c;
        best_tok = cur.toks[i];
        reached_final = true;
      }
    }
  }
  if (!reached_final) {
    for (size_t i = 0; i < cur.states.size(); ++i) {
      float c = arena[cur.toks[i]].cost;
      if (c < best_cost) {
        best_cost = c;
        best_tok = cur.toks[i];
      }
    }
  }
  *best_cost_out = best_cost;
  if (best_tok < 0) return std::numeric_limits<int32_t>::min();

  // backtrace, collecting non-epsilon output labels
  std::vector<int32_t> rev;
  for (int32_t tk = best_tok; tk >= 0; tk = arena[tk].back)
    if (arena[tk].olabel != 0) rev.push_back(arena[tk].olabel);
  int32_t n = (int32_t)rev.size();
  int32_t n_write = std::min(n, out_cap);
  for (int32_t i = 0; i < n_write; ++i)
    out_labels[i] = rev[rev.size() - 1 - i];
  return reached_final ? n : -(n + 1);
}

}  // extern "C"
