"""In-tree FST Viterbi decoder (clib/fst_decode.cpp + tools/fst_decoder.py)
vs a brute-force all-paths oracle, plus native/NumPy agreement and the
OpenFst text-format loader.

Rebuilds the reference's external Kaldi decoding step
(espresso/dump_posteriors.py:148+, run_chain_e2e.sh:218-222
latgen-faster-mapped): arc ilabel>0 indexes loglike column ilabel-1,
ilabel==0 is epsilon, graph costs are tropical.
"""

import itertools

import numpy as np
import pytest

from espresso_tpu.tools.fst_decoder import DecodingGraph, FstDecoder


def _toy_graph():
    """3-word loop graph over 4 pdfs with epsilon word arcs and self-loops.

    state 0: start/loop state; words A(1) B(2) C(3) each have a 2-pdf
    left-to-right chain with self-loops, entered by an epsilon arc carrying
    the word label, returning to the loop state via an epsilon arc.
    """
    arcs = []
    finals = [(0, 0.0)]
    next_state = 1
    for w, (p1, p2) in [(1, (1, 2)), (2, (2, 3)), (3, (4, 1))]:
        s1, s2 = next_state, next_state + 1
        next_state += 2
        arcs.append((0, s1, 0, w, 0.7))       # eps entry, emits word label
        arcs.append((s1, s1, p1, 0, 0.4))     # self-loop pdf p1
        arcs.append((s1, s2, p2, 0, 0.3))     # advance to pdf p2
        arcs.append((s2, s2, p2, 0, 0.4))     # self-loop pdf p2
        arcs.append((s2, 0, 0, 0, 0.2))       # eps back to loop state
    return DecodingGraph.from_arcs(arcs, finals, start=0)


def _brute_force(graph, ll, acoustic_scale):
    """Exact best path by exhaustive DFS over arc sequences (small T)."""
    T = ll.shape[0]
    g = graph
    best = [np.inf, None]

    def arcs_from(s):
        return range(int(g.arc_offsets[s]), int(g.arc_offsets[s + 1]))

    def rec(state, t, cost, words, eps_chain):
        # NOTE: no branch-and-bound on partial cost — acoustic terms can be
        # negative, so a partial cost is not a lower bound on the total.
        if t == T and np.isfinite(g.final_w[state]):
            total = cost + float(g.final_w[state])
            if total < best[0]:
                best[0], best[1] = total, list(words)
        for a in arcs_from(state):
            il = int(g.arc_il[a])
            d = int(g.arc_dst[a])
            w = float(g.arc_w[a])
            ol = int(g.arc_ol[a])
            if il == 0:
                # bound epsilon chains to avoid infinite loops in the oracle
                if len(eps_chain) > 2 * graph.num_states:
                    continue
                rec(d, t, cost + w, words + [ol] if ol else words,
                    eps_chain + [a])
            elif t < T:
                ac = -acoustic_scale * float(ll[t, il - 1])
                rec(d, t + 1, cost + w + ac,
                    words + [ol] if ol else words, [])

    rec(g.start, 0, 0.0, [], [])
    return best[1], best[0]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_viterbi_matches_brute_force(seed):
    g = _toy_graph()
    rng = np.random.default_rng(seed)
    T = 6
    ll = rng.standard_normal((T, 5)).astype(np.float32)
    dec = FstDecoder(g, acoustic_scale=1.0, beam=1e9, max_active=0)
    words, cost, final = dec.decode(ll)
    ref_words, ref_cost = _brute_force(g, ll, 1.0)
    assert final
    assert words == ref_words, (words, ref_words)
    np.testing.assert_allclose(cost, ref_cost, rtol=1e-5)


def test_native_matches_numpy():
    g = _toy_graph()
    rng = np.random.default_rng(7)
    ll = rng.standard_normal((20, 5)).astype(np.float32)
    dec = FstDecoder(g, acoustic_scale=0.8, beam=12.0, max_active=50)
    if dec._lib is None:
        pytest.skip("native lib unavailable")
    w_nat, c_nat, f_nat = dec.decode(ll)
    w_np, c_np, f_np = dec._decode_numpy(ll)
    assert w_nat == w_np
    assert f_nat == f_np
    np.testing.assert_allclose(c_nat, c_np, rtol=1e-5)


def test_acoustic_scale_and_beam_controls():
    g = _toy_graph()
    rng = np.random.default_rng(3)
    ll = rng.standard_normal((10, 5)).astype(np.float32)
    wide = FstDecoder(g, acoustic_scale=1.0, beam=1e9, max_active=0)
    w_wide, c_wide, _ = wide.decode(ll)
    # a generous finite beam must reproduce the unpruned result
    pruned = FstDecoder(g, acoustic_scale=1.0, beam=20.0, max_active=100)
    w_pruned, c_pruned, _ = pruned.decode(ll)
    assert w_wide == w_pruned
    np.testing.assert_allclose(c_wide, c_pruned, rtol=1e-5)
    # scale changes the acoustic/graph tradeoff => generally different cost
    scaled = FstDecoder(g, acoustic_scale=0.1, beam=1e9, max_active=0)
    _, c_scaled, _ = scaled.decode(ll)
    assert abs(c_scaled - c_wide) > 1e-3


def test_text_fst_round_trip(tmp_path):
    path = tmp_path / "toy.fst.txt"
    path.write_text(
        "0 1 0 5 0.5\n"
        "1 1 1 0 0.1\n"
        "1 2 2 0 0.2\n"
        "2 2 2 0 0.1\n"
        "2 1.5\n"
    )
    g = DecodingGraph.load_text(str(path))
    assert g.start == 0
    assert g.num_states == 3
    rng = np.random.default_rng(0)
    ll = rng.standard_normal((4, 2)).astype(np.float32)
    dec = FstDecoder(g, acoustic_scale=1.0, beam=1e9, max_active=0)
    words, cost, final = dec.decode(ll)
    ref_words, ref_cost = _brute_force(g, ll, 1.0)
    assert final
    assert words == ref_words
    np.testing.assert_allclose(cost, ref_cost, rtol=1e-5)
