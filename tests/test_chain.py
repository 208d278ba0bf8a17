"""LF-MMI chain loss tests: brute-force forward + finite-difference gradient,
plus end-to-end chunked chain training."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espresso_tpu.ops.chain import DenominatorGraph, chain_loss

FST_TEXT = """
0 1 1 1 0.5
0 2 2 2 1.0
1 1 3 3 0.2
1 2 2 2 0.9
2 0 4 4 0.1
2 2 1 1 0.7
1 0.3
2 0.0
"""


def _graph():
    return DenominatorGraph.from_fst_text(FST_TEXT)


def _brute_den(g, lpb, L):
    arcs = list(zip(g.from_state, g.to_state, g.pdf, g.weight))
    alpha = {0: 0.0}
    for t in range(L):
        new = {}
        for f, to, p, w in arcs:
            if f in alpha:
                sc = alpha[f] + w + lpb[t, p]
                new[to] = np.logaddexp(new[to], sc) if to in new else sc
        alpha = new
    tot = -np.inf
    for s, a in alpha.items():
        if g.final_weights[s] > -1e29:
            tot = np.logaddexp(tot, a + g.final_weights[s])
    return tot


def test_fst_text_parsing():
    g = _graph()
    assert g.num_states == 3
    assert len(g.from_state) == 6
    assert g.final_weights[0] < -1e29  # state 0 non-final
    assert abs(g.final_weights[1] + 0.3) < 1e-6


def test_chain_loss_matches_bruteforce():
    g = _graph()
    rng = np.random.default_rng(0)
    B, T, V = 2, 5, 4
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    lengths = np.array([5, 3])
    targets = rng.integers(0, V, (B, T)).astype(np.int32)
    targets[1, 3:] = -1
    loss = np.asarray(
        chain_loss(
            jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(lengths), g
        )
    )
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1), np.float64)
    for b, L in enumerate(lengths):
        den = _brute_den(g, lp[b], L)
        num = sum(lp[b, t, targets[b, t]] for t in range(L) if targets[b, t] >= 0)
        assert abs(loss[b] - (-(num - den))) < 1e-3


def test_chain_loss_gradcheck():
    g = _graph()
    rng = np.random.default_rng(1)
    B, T, V = 2, 4, 4
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    lengths = np.array([4, 3])
    targets = rng.integers(0, V, (B, T)).astype(np.int32)
    fs = jax.jit(
        lambda x: chain_loss(
            x, jnp.asarray(targets), jnp.asarray(lengths), g
        ).sum()
    )
    gr = jax.grad(fs)(jnp.asarray(logits))
    eps = 1e-2
    for idx in [(0, 0, 1), (0, 2, 3), (1, 1, 0), (1, 2, 2)]:
        e = np.zeros_like(logits)
        e[idx] = eps
        numg = (fs(jnp.asarray(logits + e)) - fs(jnp.asarray(logits - e))) / (
            2 * eps
        )
        assert abs(float(gr[idx]) - float(numg)) < 1e-2


def test_lf_mmi_training_e2e(tmp_path):
    from espresso_tpu.cli.train import main as train_main
    from tests.test_hybrid_e2e import NUM_PDF, make_hybrid_corpus

    d = str(tmp_path)
    make_hybrid_corpus(d, "train", num_utts=8, seed=0)
    make_hybrid_corpus(d, "valid", num_utts=4, seed=1)
    # simple ergodic denominator graph over NUM_PDF pdfs (self-loop + advance)
    lines = []
    for p in range(NUM_PDF):
        lines.append(f"0 0 {p + 1} {p + 1} 1.0")
    lines.append("0 0.0")
    g = DenominatorGraph.from_fst_text("\n".join(lines))
    gp = os.path.join(d, "den.npz")
    g.save(gp)

    stats = train_main(
        [
            f"dataset.data={d}",
            f"checkpoint.save_dir={d}/ckpt",
            "task.name=speech_recognition_hybrid",
            f"task.num_targets={NUM_PDF}",
            "task.chunk_width=20",
            "task.chunk_left_context=5",
            "task.chunk_right_context=5",
            "dataset.feat_dim=8",
            "dataset.batch_size=4",
            "model.name=speech_tdnn",
            "model.hidden_sizes=(16,16)",
            "model.kernel_sizes=(3,3)",
            "model.strides=(1,1)",
            "model.dilations=(1,1)",
            "model.norm_type=layer",
            "criterion.name=lf_mmi_loss",
            f"criterion.denominator_graph_path={gp}",
            "optimization.max_epoch=2",
            "optimization.lr=0.01",
            "optimization.clip_norm=2.0",
            "common.log_interval=20",
            "common.dtype=float32",
        ]
    )
    assert np.isfinite(stats["loss"])


def _brute_den_leaky(g, lpb, L, coeff, pi):
    """Brute-force leaky-HMM denominator: explicit alpha over all states with
    the per-frame leak alpha'(s) = alpha(s) + coeff*pi(s)*sum(alpha)."""
    S = g.num_states
    arcs = list(zip(g.from_state, g.to_state, g.pdf, g.weight))
    alpha = np.full(S, -np.inf)
    alpha[0] = 0.0
    for t in range(L):
        tot = np.logaddexp.reduce(alpha)
        dash = np.logaddexp(alpha, np.log(coeff) + np.log(pi) + tot)
        new = np.full(S, -np.inf)
        for f, to, p, w in arcs:
            new[to] = np.logaddexp(new[to], dash[f] + w + lpb[t, p])
        alpha = new
    fin = np.where(g.final_weights > -1e29, g.final_weights, -np.inf)
    return np.logaddexp.reduce(alpha + fin)


def test_leaky_probs_modes():
    g = _graph()
    for mode in ("uniform", "transition", "stationary"):
        pi = g.leaky_probs(mode)
        assert pi.shape == (g.num_states,)
        assert abs(pi.sum() - 1.0) < 1e-5
        assert (pi >= 0).all()
    assert np.allclose(g.leaky_probs("uniform"), 1.0 / g.num_states)


def test_chain_loss_leaky_matches_bruteforce():
    g = _graph()
    rng = np.random.default_rng(2)
    B, T, V = 2, 5, 4
    coeff = 0.1  # large leak so the test is sensitive
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    lengths = np.array([5, 4])
    targets = rng.integers(0, V, (B, T)).astype(np.int32)
    loss = np.asarray(
        chain_loss(
            jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(lengths),
            g, leaky_hmm_coefficient=coeff, leaky_mode="stationary",
        )
    )
    loss_noleak = np.asarray(
        chain_loss(
            jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(lengths), g
        )
    )
    pi = g.leaky_probs("stationary").astype(np.float64)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1), np.float64)
    for b, L in enumerate(lengths):
        den = _brute_den_leaky(g, lp[b], L, coeff, pi)
        num = sum(lp[b, t, targets[b, t]] for t in range(L) if targets[b, t] >= 0)
        assert abs(loss[b] - (-(num - den))) < 1e-3
        # the leak adds paths: denominator must grow -> loss grows
        assert loss[b] > loss_noleak[b]


def test_chain_loss_leaky_gradcheck():
    g = _graph()
    rng = np.random.default_rng(3)
    B, T, V = 2, 4, 4
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    lengths = np.array([4, 3])
    targets = rng.integers(0, V, (B, T)).astype(np.int32)
    fs = jax.jit(
        lambda x: chain_loss(
            x, jnp.asarray(targets), jnp.asarray(lengths), g,
            leaky_hmm_coefficient=0.05,
        ).sum()
    )
    gr = jax.grad(fs)(jnp.asarray(logits))
    eps = 1e-2
    for idx in [(0, 0, 1), (0, 2, 3), (1, 1, 0), (1, 2, 2)]:
        e = np.zeros_like(logits)
        e[idx] = eps
        numg = (fs(jnp.asarray(logits + e)) - fs(jnp.asarray(logits - e))) / (
            2 * eps
        )
        assert abs(float(gr[idx]) - float(numg)) < 1e-2


def test_from_fst_binary(tmp_path):
    """Hand-written OpenFst StdVectorFst binary (magic 2125659606, version-2
    layout) must parse to the same graph as the text format."""
    import struct

    g_txt = _graph()

    def wstr(s):
        return struct.pack("<i", len(s)) + s.encode()

    arcs_by_state = {}
    for f, t, p, w in zip(g_txt.from_state, g_txt.to_state, g_txt.pdf, g_txt.weight):
        arcs_by_state.setdefault(int(f), []).append((int(p) + 1, int(p) + 1, -float(w), int(t)))
    blob = struct.pack("<i", 2125659606)
    blob += wstr("vector") + wstr("standard")
    blob += struct.pack("<i", 2)  # version
    blob += struct.pack("<i", 0)  # flags
    blob += struct.pack("<q", 0)  # properties
    blob += struct.pack("<q", 0)  # start
    blob += struct.pack("<q", g_txt.num_states)
    blob += struct.pack("<q", len(g_txt.from_state))
    for s in range(g_txt.num_states):
        fw = -float(g_txt.final_weights[s]) if g_txt.final_weights[s] > -1e29 else float("inf")
        blob += struct.pack("<f", fw)
        arcs = arcs_by_state.get(s, [])
        blob += struct.pack("<q", len(arcs))
        for il, ol, w, ns in arcs:
            blob += struct.pack("<iifi", il, ol, w, ns)
    p = tmp_path / "den.fst"
    p.write_bytes(blob)

    g_bin = DenominatorGraph.load(str(p))
    assert g_bin.num_states == g_txt.num_states
    # arcs may be reordered; compare as sorted tuples
    key = lambda g: sorted(
        zip(g.from_state.tolist(), g.to_state.tolist(), g.pdf.tolist(),
            np.round(g.weight, 5).tolist())
    )
    assert key(g_bin) == key(g_txt)
    assert np.allclose(g_bin.final_weights, g_txt.final_weights)

    # kaldi \0B-wrapped variant parses too
    p2 = tmp_path / "den_kaldi.fst"
    p2.write_bytes(b"\x00B" + blob)
    g_k = DenominatorGraph.from_fst_binary(str(p2))
    assert key(g_k) == key(g_txt)
