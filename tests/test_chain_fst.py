"""Per-utterance numerator-FST chain loss (full PyChain parity):
linear-chain FSTs must reproduce the alignment numerator exactly; branching
FSTs are checked against brute-force path enumeration; binary FST round-trip
(including archive offsets); end-to-end chain training from a manifest."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espresso_tpu.ops.chain import (
    DenominatorGraph,
    chain_loss,
    chain_loss_fst,
    pack_numerator_graphs,
)

DEN_TEXT = """
0 1 1 1 0.5
0 2 2 2 1.0
1 1 3 3 0.2
1 2 2 2 0.9
2 0 4 4 0.1
2 2 1 1 0.7
1 0.3
2 0.0
"""


def _den():
    return DenominatorGraph.from_fst_text(DEN_TEXT)


def _linear_fst(ali):
    """Linear acceptor accepting exactly the alignment sequence."""
    lines = [f"{i} {i + 1} {p + 1} {p + 1} 0.0" for i, p in enumerate(ali)]
    lines.append(f"{len(ali)} 0.0")
    return DenominatorGraph.from_fst_text("\n".join(lines))


def test_linear_fst_matches_alignment_numerator():
    den = _den()
    rng = np.random.default_rng(0)
    B, T, V = 3, 6, 4
    logits = jnp.asarray(rng.standard_normal((B, T, V)), jnp.float32)
    lengths = np.array([6, 4, 5])
    alis = [rng.integers(0, V, L) for L in lengths]
    targets = np.full((B, T), -1, np.int32)
    for b, a in enumerate(alis):
        targets[b, : len(a)] = a
    graphs = [_linear_fst(a) for a in alis]
    packed = pack_numerator_graphs(graphs)
    num_arrays = tuple(
        jnp.asarray(packed[k])
        for k in ("num_from", "num_to", "num_pdf", "num_weight", "num_final")
    )
    f_ali = lambda x: chain_loss(
        x, jnp.asarray(targets), jnp.asarray(lengths), den
    ).sum()
    f_fst = lambda x: chain_loss_fst(x, jnp.asarray(lengths), num_arrays, den).sum()
    assert abs(float(f_ali(logits)) - float(f_fst(logits))) < 1e-3
    g_ali = jax.grad(f_ali)(logits)
    g_fst = jax.grad(f_fst)(logits)
    np.testing.assert_allclose(np.asarray(g_ali), np.asarray(g_fst), atol=1e-4)


def _brute_fst_score(g, lp, L):
    """Enumerate all accepted paths of length L through graph g."""
    from itertools import product

    arcs_by_state = {}
    for f, t, p, w in zip(g.from_state, g.to_state, g.pdf, g.weight):
        arcs_by_state.setdefault(int(f), []).append((int(t), int(p), float(w)))
    total = -np.inf
    stack = [(0, 0, 0.0)]  # (state, t, score)
    while stack:
        s, t, sc = stack.pop()
        if t == L:
            if g.final_weights[s] > -1e29:
                total = np.logaddexp(total, sc + g.final_weights[s])
            continue
        for to, p, w in arcs_by_state.get(s, []):
            stack.append((to, t + 1, sc + w + lp[t, p]))
    return total


def test_branching_fst_vs_bruteforce():
    den = _den()
    # numerator with genuine alternatives: state 0 -> {1 via pdf0, 1 via pdf1}
    # -> self-loop pdf2 -> final
    num_text = """
0 1 1 1 0.7
0 1 2 2 0.3
1 1 3 3 0.5
1 2 4 4 0.5
1 0.2
2 0.0
"""
    g = DenominatorGraph.from_fst_text(num_text)
    rng = np.random.default_rng(1)
    B, T, V = 2, 5, 4
    logits = jnp.asarray(rng.standard_normal((B, T, V)), jnp.float32)
    lengths = np.array([5, 3])
    packed = pack_numerator_graphs([g, g])
    num_arrays = tuple(
        jnp.asarray(packed[k])
        for k in ("num_from", "num_to", "num_pdf", "num_weight", "num_final")
    )
    losses = np.asarray(
        chain_loss_fst(logits, jnp.asarray(lengths), num_arrays, den)
    )
    lp = np.asarray(jax.nn.log_softmax(logits, -1), np.float64)
    from tests.test_chain import _brute_den

    for b, L in enumerate(lengths):
        num = _brute_fst_score(g, lp[b], L)
        d = _brute_den(den, lp[b], L)
        assert abs(losses[b] - (-(num - d))) < 1e-3


def test_fst_gradcheck_branching():
    den = _den()
    g = DenominatorGraph.from_fst_text(
        "0 1 1 1 0.6\n0 1 3 3 0.4\n1 1 2 2 1.0\n1 0.0"
    )
    rng = np.random.default_rng(2)
    B, T, V = 2, 4, 4
    logits = jnp.asarray(rng.standard_normal((B, T, V)), jnp.float32)
    lengths = jnp.asarray(np.array([4, 3]))
    packed = pack_numerator_graphs([g, g])
    num_arrays = tuple(
        jnp.asarray(packed[k])
        for k in ("num_from", "num_to", "num_pdf", "num_weight", "num_final")
    )
    fs = jax.jit(lambda x: chain_loss_fst(x, lengths, num_arrays, den).sum())
    gr = jax.grad(fs)(logits)
    eps = 1e-2
    base = np.asarray(logits)
    for idx in [(0, 0, 1), (0, 2, 3), (1, 1, 0), (1, 2, 2)]:
        e = np.zeros_like(base)
        e[idx] = eps
        numg = (fs(jnp.asarray(base + e)) - fs(jnp.asarray(base - e))) / (2 * eps)
        assert abs(float(gr[idx]) - float(numg)) < 1e-2


def test_fst_binary_roundtrip_and_offset(tmp_path):
    g = _den()
    raw = g.to_fst_binary()
    p = os.path.join(str(tmp_path), "archive.bin")
    with open(p, "wb") as f:
        f.write(b"padding-bytes")
        off = f.tell()
        f.write(raw)
    g2 = DenominatorGraph.load(f"{p}:{off}")
    np.testing.assert_array_equal(g.from_state, g2.from_state)
    np.testing.assert_array_equal(g.to_state, g2.to_state)
    np.testing.assert_array_equal(g.pdf, g2.pdf)
    np.testing.assert_allclose(g.weight, g2.weight, atol=1e-6)
    np.testing.assert_allclose(g.final_weights, g2.final_weights, atol=1e-6)


def test_chain_fst_training_e2e(tmp_path):
    import json

    from espresso_tpu.cli.train import main as train_main
    from espresso_tpu.data import kaldi_io
    from tests.test_hybrid_e2e import NUM_PDF

    d = str(tmp_path)
    rng = np.random.default_rng(0)
    for split, n in (("train", 8), ("valid", 4)):
        ark = os.path.join(d, f"{split}.ark")
        fst_ark = os.path.join(d, f"{split}.fst.ark")
        manifest = {}
        with open(ark, "wb") as fa, open(fst_ark, "wb") as ff:
            for i in range(n):
                utt = f"{split}_{i:03d}"
                T = int(rng.integers(20, 40))
                ali = rng.integers(0, NUM_PDF, T)
                mat = rng.standard_normal((T, 8)).astype(np.float32) * 0.1
                mat[:, 0] = ali / NUM_PDF  # leak the label
                fa.write((utt + " ").encode())
                pos = fa.tell()
                kaldi_io.write_mat(fa, mat)
                fst_off = ff.tell()
                ff.write(_linear_fst(ali).to_fst_binary())
                manifest[utt] = {
                    "feat": f"{ark}:{pos}",
                    "numerator_fst": f"{fst_ark}:{fst_off}",
                    "utt2num_frames": str(T),
                }
        with open(os.path.join(d, f"{split}.json"), "w") as f:
            json.dump(manifest, f)
    # ergodic denominator over all pdfs
    lines = [f"0 0 {p + 1} {p + 1} 1.0" for p in range(NUM_PDF)]
    lines.append("0 0.0")
    gp = os.path.join(d, "den.npz")
    DenominatorGraph.from_fst_text("\n".join(lines)).save(gp)

    stats = train_main(
        [
            f"dataset.data={d}",
            f"checkpoint.save_dir={d}/ckpt",
            "task.name=speech_recognition_hybrid",
            f"task.num_targets={NUM_PDF}",
            "model.name=speech_tdnn",
            "model.hidden_sizes=(16,16)",
            "model.kernel_sizes=(3,3)",
            "model.strides=(1,1)",
            "model.dilations=(1,1)",
            "model.norm_type=layer",
            "criterion.name=lf_mmi_loss",
            f"criterion.denominator_graph_path={gp}",
            "criterion.leaky_hmm_coefficient=1e-4",
            "dataset.feat_dim=8",
            "dataset.batch_size=4",
            "optimization.max_epoch=2",
            "optimization.lr=0.01",
            "dataset.num_batch_buckets=2",
            "common.log_interval=5",
            "common.dtype=float32",
        ]
    )
    assert np.isfinite(stats["loss"])
