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

// ---------------------------------------------------------------------------
// Lattice-generating decoder.
//
// Rebuild of the *lattice* part of the reference decode stage: the recipe's
// latgen-faster-mapped --lattice-beam=8 writes lattice archives that the
// scoring stage rescales (lattice-scale), penalizes (lattice-add-penalty),
// best-paths at a sweep of LM weights, and LM-rescores (steps/lmrescore.sh)
// — examples/asr_wsj/run_chain_e2e.sh:218-233 in the reference. The 1-best
// decoder above cannot feed any of that; this one emits the pruned token
// lattice itself.
//
// Algorithm (same contract as Kaldi's LatticeFasterDecoder, original
// implementation): token passing where every arc expansion that survives
// the beam records a forward link (src token, dst token, ilabel, olabel,
// graph cost, scaled acoustic cost). Tokens are per (frame, graph state).
// After the final frame — and periodically every kPruneInterval frames,
// which keeps the backward passes and the final emit cheap (dead links are
// tombstoned, not compacted) — a backward pass computes each token/link's
// "extra cost"
// (how much worse than the best path the best path THROUGH it is) and
// deletes everything beyond lattice_beam. The surviving token graph IS the
// lattice: graph and acoustic costs stay separate so downstream rescaling
// and LM rescoring are exact.
//
// Cutoffs per frame follow the Kaldi control surface: beam around the best
// token, tightened to the max_active-th best, loosened to keep at least
// min_active tokens alive.

namespace {

struct LatToken {
  float cost;          // alpha: best cost from start to this token
  float extra;         // extra cost from the latest backward pass
  int32_t state;       // graph state
  int32_t frame;       // 0..T (frame 0 = before consuming any loglike)
  int32_t links_head;  // first outgoing link (-1 = none), linked list
  bool eps_expanded;   // eps arcs already expanded (links recorded once)
};

struct LatLink {
  int32_t src, dst;  // token ids
  int32_t il, ol;    // input (pdf+1 / 0) and output (word / 0) labels
  float g, a;        // graph cost, acoustic cost (already acoustic_scaled)
  int32_t next;      // next link of src (-1 = end)
  bool dead;         // tombstone set by pruning
};

struct LatticeResult {
  // compacted output arrays (token ids renumbered 0..n_nodes-1, node 0 =
  // the start token; topological in frame order)
  std::vector<int32_t> node_frame;
  std::vector<float> node_final;  // final cost (+inf = non-final)
  std::vector<int32_t> arc_src, arc_dst, arc_il, arc_ol;
  std::vector<float> arc_g, arc_a;
  int32_t status = 0;  // 1 final reached, 0 partial, -1 dead
  float best_cost = kInf;
};

constexpr int32_t kPruneInterval = 25;

class LatticeDecoder {
 public:
  LatticeDecoder(const int32_t* arc_offsets, const int32_t* arc_dst,
                 const int32_t* arc_il, const int32_t* arc_ol,
                 const float* arc_w, const float* final_w,
                 int32_t num_states, int32_t start_state, float ascale,
                 float beam, float lattice_beam, int32_t min_active,
                 int32_t max_active)
      : offs_(arc_offsets), dst_(arc_dst), il_(arc_il), ol_(arc_ol),
        w_(arc_w), final_(final_w), S_(num_states), start_(start_state),
        ascale_(ascale), beam_(beam), lat_beam_(lattice_beam),
        min_active_(min_active), max_active_(max_active),
        tok_of_state_(num_states, -1), stamp_(num_states, -1) {}

  LatticeResult Decode(const float* loglikes, int32_t T, int32_t P) {
    frames_.assign(1, {});
    epoch_ = 0;
    NewToken(0, start_, 0.0f);
    EpsClosure(0);

    int32_t t = 0;
    for (; t < T; ++t) {
      float cutoff = FrameCutoff(t);
      frames_.push_back({});
      ++epoch_;
      const float* ll = loglikes + (size_t)t * P;
      // next-frame adaptive cutoff: seeded at +inf, tightened as tokens
      // arrive so late expansions prune against the emerging best
      float next_cutoff = kInf;
      for (int32_t ti : frames_[t]) {
        // copy, not reference: GetToken below can grow toks_ and
        // reallocate, which would dangle a held LatToken&
        const float tok_cost = toks_[ti].cost;
        const int32_t tok_state = toks_[ti].state;
        if (tok_cost > cutoff) continue;
        for (int32_t a = offs_[tok_state]; a < offs_[tok_state + 1]; ++a) {
          int32_t il = il_[a];
          if (il == 0) continue;
          if (il - 1 >= P) continue;
          float ac = -ascale_ * ll[il - 1];
          float nc = tok_cost + w_[a] + ac;
          if (nc > next_cutoff) continue;
          if (nc + beam_ < next_cutoff) next_cutoff = nc + beam_;
          int32_t di = GetToken(t + 1, dst_[a], nc);
          AddLink(ti, di, il, ol_[a], w_[a], ac);
        }
      }
      if (frames_[t + 1].empty()) {  // decode died; lattice up to frame t
        frames_.pop_back();
        break;
      }
      EpsClosure(t + 1);
      if ((t + 1) % kPruneInterval == 0) PruneActive(t + 1, false);
    }

    int32_t last = (int32_t)frames_.size() - 1;
    bool reached_final = false;
    for (int32_t ti : frames_[last])
      if (final_[toks_[ti].state] < kInf) reached_final = true;
    PruneActive(last, reached_final);
    return Emit(last, reached_final);
  }

 private:
  int32_t NewToken(int32_t frame, int32_t state, float cost) {
    stamp_[state] = epoch_;
    tok_of_state_[state] = (int32_t)toks_.size();
    toks_.push_back({cost, 0.0f, state, frame, -1, false});
    frames_[frame].push_back(tok_of_state_[state]);
    return tok_of_state_[state];
  }

  // get-or-create the frame's token for `state`, min-updating its cost
  int32_t GetToken(int32_t frame, int32_t state, float cost) {
    if (stamp_[state] != epoch_) return NewToken(frame, state, cost);
    int32_t ti = tok_of_state_[state];
    if (cost < toks_[ti].cost) toks_[ti].cost = cost;
    return ti;
  }

  void AddLink(int32_t src, int32_t dst, int32_t il, int32_t ol, float g,
               float a) {
    links_.push_back({src, dst, il, ol, g, a, toks_[src].links_head, false});
    toks_[src].links_head = (int32_t)links_.size() - 1;
  }

  // epsilon closure of a frame: expand each token's eps arcs once
  // (recording links), and keep relaxing costs through the recorded links
  // until the frame's costs converge (eps cycles have non-negative cost, so
  // strict improvements terminate)
  void EpsClosure(int32_t frame) {
    std::vector<int32_t> queue(frames_[frame].begin(), frames_[frame].end());
    size_t qi = 0;
    while (qi < queue.size()) {
      int32_t ti = queue[qi++];
      float c = toks_[ti].cost;
      int32_t state = toks_[ti].state;
      if (!toks_[ti].eps_expanded) {
        toks_[ti].eps_expanded = true;
        for (int32_t a = offs_[state]; a < offs_[state + 1]; ++a) {
          if (il_[a] != 0) continue;
          float nc = c + w_[a];
          size_t before = toks_.size();
          int32_t di = GetToken(frame, dst_[a], nc);
          AddLink(ti, di, 0, ol_[a], w_[a], 0.0f);
          if (toks_.size() > before || toks_[di].cost == nc)
            queue.push_back(di);
        }
      } else {
        // already expanded: relax costs through existing eps links only
        for (int32_t li = toks_[ti].links_head; li >= 0;
             li = links_[li].next) {
          const LatLink& l = links_[li];
          if (l.il != 0) continue;
          float nc = c + l.g;
          if (nc < toks_[l.dst].cost) {
            toks_[l.dst].cost = nc;
            queue.push_back(l.dst);
          }
        }
      }
    }
  }

  float FrameCutoff(int32_t frame) {
    float best = kInf;
    auto& ft = frames_[frame];
    for (int32_t ti : ft) best = std::min(best, toks_[ti].cost);
    float cutoff = best + beam_;
    if (max_active_ > 0 && (int32_t)ft.size() > max_active_) {
      std::vector<float> costs;
      costs.reserve(ft.size());
      for (int32_t ti : ft) costs.push_back(toks_[ti].cost);
      std::nth_element(costs.begin(), costs.begin() + max_active_ - 1,
                       costs.end());
      float max_cut = costs[max_active_ - 1];
      if (max_cut < cutoff) {
        cutoff = max_cut;
        // keep at least min_active alive when max_active over-tightens
        if (min_active_ > 0 && (int32_t)ft.size() > min_active_) {
          std::nth_element(costs.begin(), costs.begin() + min_active_ - 1,
                           costs.end());
          cutoff = std::max(cutoff, costs[min_active_ - 1]);
        }
      }
    }
    return cutoff;
  }

  // backward extra-cost pruning up to `last` (Kaldi PruneActiveTokens):
  // beta(tok) = best cost from tok to the pruning frontier; kill links and
  // tokens whose best through-path is > lattice_beam worse than the best.
  // At the frontier, beta = final cost when use_final, else 0 (the partial
  // / mid-decode convention).
  void PruneActive(int32_t last, bool use_final) {
    std::vector<float> beta(toks_.size(), kInf);
    float best_total = kInf;
    for (int32_t ti : frames_[last]) {
      float f = use_final ? final_[toks_[ti].state] : 0.0f;
      beta[ti] = f;
    }
    for (int32_t fr = last; fr >= 0; --fr) {
      // within-frame eps links can chain (and, in principle, cycle with
      // non-negative cost): iterate to fixpoint; emitting links point to
      // fr+1 whose betas are already final
      bool changed = true;
      size_t guard = 0;
      while (changed && guard++ <= frames_[fr].size() + 1) {
        changed = false;
        for (int32_t ti : frames_[fr]) {
          float b = beta[ti];
          for (int32_t li = toks_[ti].links_head; li >= 0;
               li = links_[li].next) {
            const LatLink& l = links_[li];
            if (l.dead) continue;
            float nb = l.g + l.a + beta[l.dst];
            if (nb < b) b = nb;
          }
          if (b < beta[ti]) {
            beta[ti] = b;
            changed = true;
          }
        }
      }
      if (fr == 0)
        for (int32_t ti : frames_[0])
          best_total = std::min(best_total, toks_[ti].cost + beta[ti]);
    }
    const float margin = lat_beam_ + 1e-4f;  // float-noise slack, like Kaldi
    for (auto& l : links_) {
      if (l.dead) continue;
      float through = toks_[l.src].cost + l.g + l.a + beta[l.dst];
      if (through > best_total + margin) l.dead = true;
    }
    for (size_t ti = 0; ti < toks_.size(); ++ti)
      toks_[ti].extra = toks_[ti].cost + beta[ti] - best_total;
    best_total_ = best_total;
  }

  LatticeResult Emit(int32_t last, bool reached_final) {
    LatticeResult out;
    out.status = toks_.empty() ? -1 : (reached_final ? 1 : 0);
    out.best_cost = best_total_;
    if (toks_.empty()) return out;
    const float margin = lat_beam_ + 1e-4f;
    std::vector<int32_t> remap(toks_.size(), -1);
    // frame-major node order (frames_ lists are creation-ordered)
    for (auto& ft : frames_)
      for (int32_t ti : ft)
        if (toks_[ti].extra <= margin) {
          remap[ti] = (int32_t)out.node_frame.size();
          out.node_frame.push_back(toks_[ti].frame);
          float f = kInf;
          if (toks_[ti].frame == last)
            f = reached_final ? final_[toks_[ti].state] : 0.0f;
          out.node_final.push_back(f);
        }
    for (const auto& l : links_) {
      if (l.dead || remap[l.src] < 0 || remap[l.dst] < 0) continue;
      out.arc_src.push_back(remap[l.src]);
      out.arc_dst.push_back(remap[l.dst]);
      out.arc_il.push_back(l.il);
      out.arc_ol.push_back(l.ol);
      out.arc_g.push_back(l.g);
      out.arc_a.push_back(l.a);
    }
    return out;
  }

  const int32_t *offs_, *dst_, *il_, *ol_;
  const float *w_, *final_;
  int32_t S_, start_;
  float ascale_, beam_, lat_beam_;
  int32_t min_active_, max_active_;
  std::vector<int32_t> tok_of_state_, stamp_;
  int32_t epoch_ = 0;
  std::vector<LatToken> toks_;
  std::vector<LatLink> links_;
  std::vector<std::vector<int32_t>> frames_;
  float best_total_ = kInf;
};

}  // namespace

extern "C" {

// Decode to a lattice. Returns an opaque handle (free with lattice_free);
// *status_out = 1 if a final state was reached, 0 partial, -1 dead.
void* fst_lattice_decode(
    const int32_t* arc_offsets, const int32_t* arc_dst,
    const int32_t* arc_il, const int32_t* arc_ol, const float* arc_w,
    const float* final_w, int32_t num_states, int32_t start_state,
    const float* loglikes, int32_t T, int32_t P, float acoustic_scale,
    float beam, float lattice_beam, int32_t min_active, int32_t max_active,
    int32_t* status_out, float* best_cost_out) {
  LatticeDecoder dec(arc_offsets, arc_dst, arc_il, arc_ol, arc_w, final_w,
                     num_states, start_state, acoustic_scale, beam,
                     lattice_beam, min_active, max_active);
  auto* res = new LatticeResult(dec.Decode(loglikes, T, P));
  *status_out = res->status;
  *best_cost_out = res->best_cost;
  return res;
}

void lattice_sizes(void* handle, int32_t* n_nodes, int32_t* n_arcs) {
  auto* r = reinterpret_cast<LatticeResult*>(handle);
  *n_nodes = (int32_t)r->node_frame.size();
  *n_arcs = (int32_t)r->arc_src.size();
}

void lattice_copy(void* handle, int32_t* node_frame, float* node_final,
                  int32_t* arc_src, int32_t* arc_dst, int32_t* arc_il,
                  int32_t* arc_ol, float* arc_g, float* arc_a) {
  auto* r = reinterpret_cast<LatticeResult*>(handle);
  std::memcpy(node_frame, r->node_frame.data(),
              r->node_frame.size() * sizeof(int32_t));
  std::memcpy(node_final, r->node_final.data(),
              r->node_final.size() * sizeof(float));
  std::memcpy(arc_src, r->arc_src.data(),
              r->arc_src.size() * sizeof(int32_t));
  std::memcpy(arc_dst, r->arc_dst.data(),
              r->arc_dst.size() * sizeof(int32_t));
  std::memcpy(arc_il, r->arc_il.data(), r->arc_il.size() * sizeof(int32_t));
  std::memcpy(arc_ol, r->arc_ol.data(), r->arc_ol.size() * sizeof(int32_t));
  std::memcpy(arc_g, r->arc_g.data(), r->arc_g.size() * sizeof(float));
  std::memcpy(arc_a, r->arc_a.data(), r->arc_a.size() * sizeof(float));
}

void lattice_free(void* handle) {
  delete reinterpret_cast<LatticeResult*>(handle);
}

}  // extern "C"
