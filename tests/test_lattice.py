"""Lattice generation + lattice operations vs brute-force oracles.

Covers the in-tree rebuild of the reference's lattice pipeline
(run_chain_e2e.sh:218-233): clib fst_lattice_decode (native + NumPy mirror),
tools/lattice scale/penalty/best-path/sweep, tools/arpa backoff scoring, and
ARPA LM rescoring (lattice-lmrescore semantics, incl. the subtract-old /
add-new LM swap of steps/lmrescore.sh mode 3).
"""

import math

import numpy as np
import pytest

from espresso_tpu.tools import lattice as L
from espresso_tpu.tools.arpa import LN10, ArpaLM
from espresso_tpu.tools.fst_decoder import DecodingGraph, FstDecoder
from tests.test_fst_decoder import _toy_graph


def _all_word_seq_costs(graph, ll, acoustic_scale, margin=None):
    """Exhaustive DFS: best cost per complete word sequence (the oracle
    the lattice must reproduce within the lattice beam)."""
    T = ll.shape[0]
    g = graph
    best: dict = {}

    def rec(state, t, cost, words, eps_depth):
        if t == T and np.isfinite(g.final_w[state]):
            key = tuple(words)
            tot = cost + float(g.final_w[state])
            if key not in best or tot < best[key]:
                best[key] = tot
        for a in range(int(g.arc_offsets[state]), int(g.arc_offsets[state + 1])):
            il = int(g.arc_il[a])
            d = int(g.arc_dst[a])
            w = float(g.arc_w[a])
            ol = int(g.arc_ol[a])
            if il == 0:
                if eps_depth > 2 * graph.num_states:
                    continue
                rec(d, t, cost + w, words + [ol] if ol else words,
                    eps_depth + 1)
            elif t < T:
                ac = -acoustic_scale * float(ll[t, il - 1])
                rec(d, t + 1, cost + w + ac,
                    words + [ol] if ol else words, 0)

    rec(g.start, 0, 0.0, [], 0)
    return best


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_lattice_contains_all_paths_within_beam(seed):
    """Kaldi lattice contract: with a wide decode beam, every word sequence
    whose best path is within lattice_beam of the best appears in the
    lattice at EXACTLY its best cost, and no lattice path beats the graph's
    true best for its word sequence."""
    g = _toy_graph()
    rng = np.random.default_rng(seed)
    T = 5
    ll = rng.standard_normal((T, 5)).astype(np.float32)
    lattice_beam = 4.0
    dec = FstDecoder(g, acoustic_scale=1.0, beam=1e9, max_active=0)
    lat, status = dec.decode_lattice(ll, lattice_beam=lattice_beam)
    assert status == "final"

    oracle = _all_word_seq_costs(g, ll, 1.0)
    best_cost = min(oracle.values())
    lat_paths: dict = {}
    for seq, cost in L.enumerate_paths(lat):
        if seq not in lat_paths or cost < lat_paths[seq]:
            lat_paths[seq] = cost
    # (a) completeness + exactness within the beam
    for seq, cost in oracle.items():
        if cost <= best_cost + lattice_beam - 1e-3:
            assert seq in lat_paths, (seq, cost, best_cost)
            np.testing.assert_allclose(lat_paths[seq], cost, rtol=1e-5)
    # (b) no underestimation anywhere
    for seq, cost in lat_paths.items():
        assert seq in oracle, seq
        assert cost >= oracle[seq] - 1e-4, (seq, cost, oracle[seq])
    # (c) lattice best path == Viterbi 1-best
    words, vcost, final = dec.decode(ll)
    bp, bc = L.best_path(lat)
    assert bp == words
    np.testing.assert_allclose(bc, vcost, rtol=1e-5)


def test_native_matches_numpy_lattice():
    g = _toy_graph()
    rng = np.random.default_rng(7)
    ll = rng.standard_normal((12, 5)).astype(np.float32)
    dec = FstDecoder(g, acoustic_scale=0.8, beam=10.0, max_active=40)
    if dec._lib is None:
        pytest.skip("native lib unavailable")
    lat_n, st_n = dec.decode_lattice(ll, lattice_beam=5.0, min_active=5)
    lat_p, st_p = dec._decode_lattice_numpy(ll, 5.0, 5)
    assert st_n == st_p
    assert lat_n.num_nodes == lat_p.num_nodes
    assert lat_n.num_arcs == lat_p.num_arcs
    np.testing.assert_array_equal(lat_n.node_frame, lat_p.node_frame)
    np.testing.assert_allclose(lat_n.node_final, lat_p.node_final)

    def arc_set(lat):
        # arc ORDER is emit-internal (C++ walks global creation order, the
        # NumPy mirror walks per-token lists) — compare as sorted tuples
        return sorted(
            zip(
                lat.arc_src.tolist(), lat.arc_dst.tolist(),
                lat.arc_il.tolist(), lat.arc_ol.tolist(),
                np.round(lat.arc_g, 5).tolist(),
                np.round(lat.arc_a, 5).tolist(),
            )
        )

    assert arc_set(lat_n) == arc_set(lat_p)


def test_scale_penalty_best_path_vs_enumeration():
    """best_path at swept (acoustic, lm, wip) must equal brute-force over
    the enumerated lattice paths with manually recomputed costs; and the
    materialized scaled()/with_penalty() lattices must agree with the
    on-the-fly sweep."""
    g = _toy_graph()
    rng = np.random.default_rng(3)
    ll = rng.standard_normal((5, 5)).astype(np.float32)
    dec = FstDecoder(g, acoustic_scale=1.0, beam=1e9, max_active=0)
    lat, _ = dec.decode_lattice(ll, lattice_beam=8.0)
    paths = L.enumerate_paths(lat)
    # enumerate with separate g/a sums for manual rescaling
    arcs_from: dict = {}
    for a in range(lat.num_arcs):
        arcs_from.setdefault(int(lat.arc_src[a]), []).append(a)

    ga_paths = []

    def rec(node, gsum, asum, words, nw, depth):
        if depth > 4 * lat.num_nodes:
            return
        f = float(lat.node_final[node])
        if np.isfinite(f):
            ga_paths.append((tuple(words), gsum + f, asum, nw))
        for a in arcs_from.get(node, []):
            ol = int(lat.arc_ol[a])
            rec(int(lat.arc_dst[a]), gsum + float(lat.arc_g[a]),
                asum + float(lat.arc_a[a]),
                words + [ol] if ol else words, nw + (ol != 0), depth + 1)

    rec(0, 0.0, 0.0, [], 0, 0)
    assert ga_paths

    for ac, lm, wip in [(1.0, 1.0, 0.0), (0.1, 1.0, 0.5), (10.0 / 13, 1.0, 1.0),
                        (1.0, 2.5, 0.0)]:
        manual = min(
            lm * g_ + ac * a_ + wip * nw for (_w, g_, a_, nw) in ga_paths
        )
        words, cost = L.best_path(
            lat, acoustic_scale=ac, lm_scale=lm, word_ins_penalty=wip
        )
        np.testing.assert_allclose(cost, manual, rtol=1e-5)
        # materialized ops route
        lat2 = lat.scaled(acoustic_scale=ac, lm_scale=lm).with_penalty(wip)
        w2, c2 = L.best_path(lat2)
        assert w2 == words
        np.testing.assert_allclose(c2, manual, rtol=1e-5)


def test_best_path_sweep_matches_single_points():
    g = _toy_graph()
    rng = np.random.default_rng(5)
    ll = rng.standard_normal((6, 5)).astype(np.float32)
    dec = FstDecoder(g, acoustic_scale=1.0, beam=1e9, max_active=0)
    lat, _ = dec.decode_lattice(ll, lattice_beam=8.0)
    acs = np.asarray([10.0 / l for l in range(7, 12)], np.float32)
    wips = np.zeros_like(acs) + 0.5
    swept = L.best_path_sweep(
        lat, acoustic_scale=acs, lm_scale=1.0, word_ins_penalty=wips
    )
    for i, (ac, wip) in enumerate(zip(acs, wips)):
        w, c = L.best_path(
            lat, acoustic_scale=float(ac), word_ins_penalty=float(wip)
        )
        assert swept[i][0] == w
        np.testing.assert_allclose(swept[i][1], c, rtol=1e-5)


ARPA_SMALL = """\\data\\
ngram 1=6
ngram 2=4

\\1-grams:
-0.8 <s> -0.3
-0.9 </s>
-0.5 a -0.2
-0.6 b -0.25
-0.7 c -0.1
-1.5 <unk>

\\2-grams:
-0.3 <s> a -0.1
-0.4 a b
-0.2 b </s>
-0.5 a c

\\end\\
"""

ARPA_BIG = """\\data\\
ngram 1=6
ngram 2=5

\\1-grams:
-0.7 <s> -0.2
-0.8 </s>
-0.45 a -0.3
-0.75 b -0.15
-0.5 c -0.2
-1.2 <unk>

\\2-grams:
-0.25 <s> a
-0.2 a c
-0.9 a b
-0.15 c </s>
-0.3 b a

\\end\\
"""


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_arpa_backoff_scoring(tmp_path):
    lm = ArpaLM.load(_write(tmp_path, "lm.arpa", ARPA_SMALL))
    assert lm.order == 2
    assert abs(lm.logprob(("<s>",), "a") - (-0.3)) < 1e-9  # exact bigram
    assert abs(lm.logprob(("a",), "b") - (-0.4)) < 1e-9
    # backoff: no "b c" -> bo(b) + p(c) = -0.25 + -0.7
    assert abs(lm.logprob(("b",), "c") - (-0.95)) < 1e-9
    # OOV -> <unk> with backoff: bo(a) + p(<unk>)
    assert abs(lm.logprob(("a",), "zzz") - (-1.7)) < 1e-9
    # sentence cost: <s> a b </s> all as bigrams
    c = lm.sentence_cost(["a", "b"])
    assert abs(c - (-(-0.3 - 0.4 - 0.2) * LN10)) < 1e-9
    # final from an unseen history backs off: "c </s>" missing ->
    # bo(c) + p(</s>) = -0.1 + -0.9
    assert abs(lm.final_cost(("c",)) - (1.0 * LN10)) < 1e-9


@pytest.mark.parametrize("lm_scale", [1.0, 0.7])
def test_lmrescore_matches_brute_force(tmp_path, lm_scale):
    g = _toy_graph()
    rng = np.random.default_rng(1)
    ll = rng.standard_normal((5, 5)).astype(np.float32)
    dec = FstDecoder(g, acoustic_scale=1.0, beam=1e9, max_active=0)
    lat, _ = dec.decode_lattice(ll, lattice_beam=6.0)
    id2word = {1: "a", 2: "b", 3: "c"}
    lm = ArpaLM.load(_write(tmp_path, "lm.arpa", ARPA_SMALL))
    resc = L.lmrescore(lat, lm, id2word, lm_scale=lm_scale)
    best_manual, best_seq = np.inf, None
    seqs: dict = {}
    for seq, cost in L.enumerate_paths(lat):
        if seq not in seqs or cost < seqs[seq]:
            seqs[seq] = cost
    for seq, cost in seqs.items():
        tot = cost + lm_scale * lm.sentence_cost([id2word[i] for i in seq])
        if tot < best_manual:
            best_manual, best_seq = tot, seq
    bp, bc = L.best_path(resc)
    assert tuple(bp) == best_seq
    np.testing.assert_allclose(bc, best_manual, rtol=1e-5)


def test_lmrescore_swap_old_for_new(tmp_path):
    """steps/lmrescore.sh mode 3: subtract the old LM (lm_scale=-1), add the
    new one (+1). Verify against brute force: cost - old + new per path."""
    g = _toy_graph()
    rng = np.random.default_rng(4)
    ll = rng.standard_normal((4, 5)).astype(np.float32)
    dec = FstDecoder(g, acoustic_scale=1.0, beam=1e9, max_active=0)
    lat, _ = dec.decode_lattice(ll, lattice_beam=6.0)
    id2word = {1: "a", 2: "b", 3: "c"}
    old = ArpaLM.load(_write(tmp_path, "old.arpa", ARPA_SMALL))
    new = ArpaLM.load(_write(tmp_path, "new.arpa", ARPA_BIG))
    swapped = L.lmrescore(
        L.lmrescore(lat, old, id2word, lm_scale=-1.0), new, id2word,
        lm_scale=1.0,
    )
    seqs: dict = {}
    for seq, cost in L.enumerate_paths(lat):
        if seq not in seqs or cost < seqs[seq]:
            seqs[seq] = cost
    best_manual, best_seq = np.inf, None
    for seq, cost in seqs.items():
        words = [id2word[i] for i in seq]
        tot = cost - old.sentence_cost(words) + new.sentence_cost(words)
        if tot < best_manual:
            best_manual, best_seq = tot, seq
    bp, bc = L.best_path(swapped)
    assert tuple(bp) == best_seq
    np.testing.assert_allclose(bc, best_manual, rtol=1e-4)


def test_partial_lattice_no_final():
    """A graph whose final state is unreachable in T frames still emits a
    usable (partial) lattice, mirroring --allow-partial=true."""
    # linear graph needing 3 emissions to reach the final state
    arcs = [
        (0, 1, 1, 7, 0.0),
        (1, 2, 1, 0, 0.0),
        (2, 3, 1, 0, 0.0),
    ]
    g = DecodingGraph.from_arcs(arcs, finals=[(3, 0.0)], start=0)
    ll = np.zeros((2, 1), np.float32)  # only 2 frames: can't reach state 3
    dec = FstDecoder(g, acoustic_scale=1.0, beam=1e9, max_active=0)
    lat, status = dec.decode_lattice(ll, lattice_beam=4.0)
    assert status == "partial"
    words, cost = L.best_path(lat)
    assert words == [7]
    lat_np, status_np = dec._decode_lattice_numpy(ll, 4.0, 20)
    assert status_np == "partial"
    assert lat_np.num_nodes == lat.num_nodes


def test_score_sweep_picks_best_point(tmp_path):
    """The LMWT x WIP sweep evaluates the full grid and returns the
    argmin-WER point; per-point WERs match single-point rescoring."""
    g = _toy_graph()
    rng = np.random.default_rng(9)
    dec = FstDecoder(g, acoustic_scale=1.0, beam=1e9, max_active=0)
    id2word = {1: "a", 2: "b", 3: "c"}
    lats, refs = {}, {}
    for u in range(3):
        ll = rng.standard_normal((5, 5)).astype(np.float32)
        lat, _ = dec.decode_lattice(ll, lattice_beam=8.0)
        utt = f"utt{u}"
        lats[utt] = lat
        # reference = the best path at one mid-sweep operating point, so at
        # least that grid point achieves WER 0
        words, _ = L.best_path(lat, acoustic_scale=10.0 / 10)
        refs[utt] = " ".join(id2word[i] for i in words)
    results, best_key = L.score_sweep(
        lats, refs, id2word, lmwts=range(7, 14), wips=(0.0, 0.5),
        pre_acoustic_scale=10.0,
    )
    assert len(results) == 7 * 2
    assert best_key in results
    assert results[best_key]["wer"] <= results[(10, 0.0)]["wer"]
    assert results[(10, 0.0)]["wer"] == 0.0
    # spot-check one grid point against a manual best-path run
    lmwt, wip = 8, 0.5
    manual_hyp = {}
    for utt, lat in lats.items():
        w, _ = L.best_path(
            lat, acoustic_scale=10.0 / lmwt, word_ins_penalty=wip
        )
        manual_hyp[utt] = " ".join(id2word[i] for i in w)
    assert manual_hyp == results[(lmwt, wip)]["hypos"]


def test_lattice_archive_roundtrip(tmp_path):
    g = _toy_graph()
    rng = np.random.default_rng(2)
    dec = FstDecoder(g, acoustic_scale=1.0, beam=1e9, max_active=0)
    lats = {}
    for u in range(2):
        ll = rng.standard_normal((4, 5)).astype(np.float32)
        lats[f"utt{u}"], _ = dec.decode_lattice(ll, lattice_beam=5.0)
    path = str(tmp_path / "lat.npz")
    L.write_lattice_archive(path, lats)
    back = L.read_lattice_archive(path)
    assert set(back) == set(lats)
    for u in lats:
        for f in ("node_frame", "node_final", "arc_src", "arc_dst",
                  "arc_il", "arc_ol", "arc_g", "arc_a"):
            np.testing.assert_array_equal(
                getattr(lats[u], f), getattr(back[u], f)
            )
