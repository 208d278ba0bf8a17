"""End-to-end hybrid lattice decoding: train a tiny TDNN, dump posteriors,
decode them with the in-tree FST decoder CLI (cli/latgen.py) over a
pdf-loop graph, and score WER against the collapsed alignments.

In-tree replacement for the reference's external Kaldi step
(run_chain_e2e.sh:218-222: latgen-faster-mapped + lattice best path)."""

import json
import os
from collections import OrderedDict

import numpy as np

from espresso_tpu.data import kaldi_io
from tests.test_hybrid_e2e import NUM_PDF


def make_onehot_corpus(root, split, num_utts, seed):
    """Hybrid corpus whose features carry a strong one-hot pdf leak, so a
    tiny TDNN reaches near-perfect frame accuracy in a few epochs and the
    decoded word sequence is discriminative (unlike the weak-leak corpus
    in test_hybrid_e2e, which only needs loss-goes-down)."""
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    feat_ark = os.path.join(root, f"{split}_feats.ark")
    ali_ark = os.path.join(root, f"{split}_ali.ark")
    manifest = OrderedDict()
    with open(feat_ark, "wb") as ff, open(ali_ark, "wb") as fa:
        for i in range(num_utts):
            utt = f"{split}_utt{i:03d}"
            T = int(rng.integers(40, 80))
            # runs of 3-8 frames per pdf (HMM-ish), one-hot leak + noise
            ali = []
            while len(ali) < T:
                ali += [int(rng.integers(0, NUM_PDF))] * int(
                    rng.integers(3, 9)
                )
            ali = np.asarray(ali[:T], np.int32)
            mat = rng.standard_normal((T, NUM_PDF)).astype(np.float32) * 0.2
            mat[np.arange(T), ali] += 3.0
            ff.write((utt + " ").encode())
            foff = ff.tell()
            kaldi_io.write_mat(ff, mat)
            fa.write((utt + " ").encode())
            aoff = fa.tell()
            kaldi_io.write_vec_int(fa, ali)
            manifest[utt] = {
                "feat": f"{feat_ark}:{foff}",
                "alignment": f"{ali_ark}:{aoff}",
                "utt2num_frames": str(T),
            }
    with open(os.path.join(root, f"{split}.json"), "w") as f:
        json.dump(manifest, f)


ARGS = [
    "task.name=speech_recognition_hybrid",
    f"task.num_targets={NUM_PDF}",
    "task.chunk_width=20",
    "task.chunk_left_context=5",
    "task.chunk_right_context=5",
    f"dataset.feat_dim={NUM_PDF}",
    "dataset.batch_size=4",
    "model.name=speech_tdnn",
    "model.hidden_sizes=(32,32)",
    "model.kernel_sizes=(3,3)",
    "model.strides=(1,1)",
    "model.dilations=(1,1)",
    "model.norm_type=layer",
    "criterion.name=subsampled_cross_entropy_with_accuracy",
    "optimization.lr=0.02",
    "optimization.clip_norm=2.0",
    "common.log_interval=20",
    "common.dtype=float32",
]


def _write_pdf_loop_graph(path):
    """Loop graph: each pdf p is a one-pdf 'word' w=p+1 with a self-loop.

    state 0 = start/final loop state; per pdf: eps entry emitting the word,
    emitting self-loops, eps exit. Small entry cost discourages spurious
    switches so runs of a pdf collapse to one word."""
    # emitting entry arcs (0 -> s) so a word always consumes >= 1 frame
    lines = []
    s = 1
    for p in range(NUM_PDF):
        il, ol = p + 1, p + 1
        lines.append(f"0 {s} {il} {ol} 1.0")
        lines.append(f"{s} {s} {il} 0 0.0")
        lines.append(f"{s} 0 0 0 0.0")
        s += 1
    lines.append("0 0.0")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def _collapse(ali):
    out = []
    for a in ali:
        if not out or out[-1] != a:
            out.append(int(a))
    return out


def test_latgen_pipeline(tmp_path):
    from espresso_tpu.cli.dump_posteriors import main as dump_main
    from espresso_tpu.cli.latgen import main as latgen_main
    from espresso_tpu.cli.train import main as train_main
    from espresso_tpu.data import kaldi_io

    d = str(tmp_path)
    make_onehot_corpus(d, "train", num_utts=12, seed=0)
    make_onehot_corpus(d, "valid", num_utts=4, seed=1)
    make_onehot_corpus(d, "test", num_utts=4, seed=2)

    args = [f"dataset.data={d}", f"checkpoint.save_dir={d}/ckpt"] + ARGS
    train_main(args + ["optimization.max_epoch=6"])
    out_ark = os.path.join(d, "post.ark")
    n = dump_main(
        args + ["dataset.gen_subset=test", f"generation.results_path={out_ark}"]
    )
    assert n == 4

    graph_path = os.path.join(d, "graph.fst.txt")
    _write_pdf_loop_graph(graph_path)
    words_path = os.path.join(d, "words.txt")
    with open(words_path, "w") as f:
        f.write("<eps> 0\n")
        for p in range(NUM_PDF):
            f.write(f"pdf{p} {p + 1}\n")

    # reference text from the collapsed alignments
    with open(os.path.join(d, "test.json")) as f:
        manifest = json.load(f)
    ref_path = os.path.join(d, "test_text")
    with open(ref_path, "w") as f:
        for utt, entry in manifest.items():
            a = kaldi_io.read_vec_int(entry["alignment"])
            f.write(
                utt + " " + " ".join(f"pdf{p}" for p in _collapse(a)) + "\n"
            )

    results = os.path.join(d, "decode_test")
    n = latgen_main(
        [
            "--posteriors", out_ark,
            "--graph", graph_path,
            "--words", words_path,
            "--acoustic-scale", "1.0",
            "--beam", "1000000",
            "--max-active", "0",
            "--results-path", results,
            "--ref", ref_path,
        ]
    )
    assert n == 4
    with open(os.path.join(results, "decoded_results.txt")) as f:
        lines = [l.strip() for l in f if l.strip()]
    assert len(lines) == 4
    hyp_words = {l.split()[0]: l.split()[1:] for l in lines}
    for utt, words in hyp_words.items():
        assert len(words) >= 1
        assert all(w.startswith("pdf") for w in words)
    wer_txt = open(os.path.join(results, "wer")).read()
    assert "WER" in wer_txt
    assert os.path.exists(os.path.join(results, "aligned_results.txt"))
    # the one-hot leak makes frame classification nearly perfect; the
    # collapsed decode should recover most of the word sequence
    import re

    m = re.search(r"WER[^0-9]*([0-9.]+)", wer_txt)
    assert m is not None, wer_txt
    assert float(m.group(1)) < 30.0, wer_txt
    one_best_wer = float(m.group(1))

    # --- full reference pipeline (run_chain_e2e.sh:218-233): lattice
    # generation -> LMWT x WIP sweep scoring -> ARPA LM rescoring ---
    from espresso_tpu.cli.lmrescore import main as lmrescore_main
    from espresso_tpu.cli.score_lattices import main as score_main
    from espresso_tpu.tools.lattice import read_lattice_archive

    lat_results = os.path.join(d, "decode_test_lat")
    lat_path = os.path.join(lat_results, "lat.npz")
    os.makedirs(lat_results, exist_ok=True)
    n = latgen_main(
        [
            "--posteriors", out_ark,
            "--graph", graph_path,
            "--words", words_path,
            "--acoustic-scale", "1.0",
            "--beam", "1000000",
            "--lattice-beam", "10.0",
            "--max-active", "0",
            "--lattices-path", lat_path,
            "--results-path", lat_results,
            "--ref", ref_path,
        ]
    )
    assert n == 4
    lats = read_lattice_archive(lat_path)
    assert set(lats) == set(manifest)
    assert all(lat.num_arcs > 0 for lat in lats.values())

    scoring = os.path.join(lat_results, "scoring")
    best_wer = score_main(
        [
            "--lattices", lat_path,
            "--words", words_path,
            "--ref", ref_path,
            "--results-path", scoring,
            "--min-lmwt", "1",
            "--max-lmwt", "3",
            "--wip", "0.0,0.5",
            "--pre-acoustic-scale", "1.0",
        ]
    )
    # lattice-beam 10 at beam inf contains the 1-best path; the sweep
    # includes (lmwt=1, wip=0) = the decode operating point, so the best
    # sweep point can only match or beat the fixed-scale 1-best WER
    assert best_wer <= one_best_wer + 1e-6
    assert os.path.exists(os.path.join(scoring, "best_wer"))
    assert os.path.exists(os.path.join(scoring, "wer_1_0.0"))

    # unigram ARPA over the pdf words: uniform old LM swapped for one that
    # matches the test-set word frequencies (must not break the pipeline)
    ref_words = [
        w for line in open(ref_path) for w in line.split()[1:]
    ]
    vocab = sorted(set(ref_words))
    uni = 1.0 / (len(vocab) + 2)
    old_arpa = os.path.join(d, "old.arpa")
    with open(old_arpa, "w") as f:
        f.write("\\data\\\nngram 1=%d\n\n\\1-grams:\n" % (len(vocab) + 2))
        for w in ["<s>", "</s>"] + vocab:
            f.write("%.4f %s\n" % (np.log10(uni), w))
        f.write("\n\\end\\\n")
    new_arpa = os.path.join(d, "new.arpa")
    tot = len(ref_words) + 2
    with open(new_arpa, "w") as f:
        f.write("\\data\\\nngram 1=%d\n\n\\1-grams:\n" % (len(vocab) + 2))
        bos_lp = np.log10(1.0 / tot)
        f.write("%.4f <s>\n%.4f </s>\n" % (bos_lp, bos_lp))
        for w in vocab:
            f.write(
                "%.4f %s\n" % (np.log10(ref_words.count(w) / tot), w)
            )
        f.write("\n\\end\\\n")

    fg_path = os.path.join(d, "decode_test_fg", "lat.npz")
    n = lmrescore_main(
        [
            "--lattices", lat_path,
            "--words", words_path,
            "--old-arpa", old_arpa,
            "--arpa", new_arpa,
            "--out", fg_path,
        ]
    )
    assert n == 4
    fg_scoring = os.path.join(d, "decode_test_fg", "scoring")
    fg_wer = score_main(
        [
            "--lattices", fg_path,
            "--words", words_path,
            "--ref", ref_path,
            "--results-path", fg_scoring,
            "--min-lmwt", "1",
            "--max-lmwt", "3",
            "--wip", "0.0,0.5",
            "--pre-acoustic-scale", "1.0",
        ]
    )
    assert np.isfinite(fg_wer)
