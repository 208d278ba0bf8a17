"""Sweep-score a lattice archive: the reference's local/score.sh stage.

The reference scores Kaldi lattices by launching, for every LMWT in
[min,max] and word-insertion-penalty in {0.0, 0.5, 1.0}, a
``lattice-scale --inv-acoustic-scale=$LMWT | lattice-add-penalty |
lattice-best-path`` pipeline and picking the best WER with
utils/best_wer.sh (called from examples/asr_wsj/run_chain_e2e.sh:224). The
in-tree version evaluates the whole grid in one vectorized best-path pass
per lattice (tools/lattice.best_path_sweep).

The recipe's ``lattice-scale --acoustic-scale=10.0`` pre-scale (applied as
the lattices are archived, run_chain_e2e.sh:223) is ``--pre-acoustic-scale``
here — the sweep then runs at acoustic_scale = pre/LMWT.

Usage:
    python -m espresso_tpu.cli.score_lattices \
        --lattices exp/decode_test/lat.npz --words graph/words.txt \
        --ref data/test_text --results-path exp/decode_test \
        --min-lmwt 7 --max-lmwt 17 --wip 0.0,0.5,1.0 \
        --pre-acoustic-scale 10.0

Writes per-point ``wer_{lmwt}_{wip}`` files, ``best_wer`` (the winning
point + its result line), and the winning point's transcripts/alignment as
``decoded_results.txt`` / ``aligned_results.txt``.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

from espresso_tpu.cli.logging_utils import setup_logging

logger = logging.getLogger("espresso_tpu.score_lattices")


def main(argv=None):
    setup_logging()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--lattices", required=True, help="lattice npz archive")
    p.add_argument("--words", required=True, help="words.txt symbol table")
    p.add_argument("--ref", required=True, help="reference text")
    p.add_argument("--results-path", required=True)
    p.add_argument("--min-lmwt", type=int, default=7)
    p.add_argument("--max-lmwt", type=int, default=17)
    p.add_argument("--wip", default="0.0,0.5,1.0")
    p.add_argument("--pre-acoustic-scale", type=float, default=10.0)
    args = p.parse_args(argv if argv is not None else sys.argv[1:])

    from espresso_tpu.cli.latgen import load_words
    from espresso_tpu.tools.lattice import read_lattice_archive, score_sweep

    lats = read_lattice_archive(args.lattices)
    id2word = load_words(args.words)
    refs = {}
    with open(args.ref) as f:
        for line in f:
            parts = line.split(maxsplit=1)
            if parts:
                refs[parts[0]] = parts[1].strip() if len(parts) > 1 else ""
    wips = [float(w) for w in args.wip.split(",") if w != ""]
    lmwts = range(args.min_lmwt, args.max_lmwt + 1)
    results, best_key = score_sweep(
        lats,
        refs,
        id2word,
        lmwts=lmwts,
        wips=wips,
        pre_acoustic_scale=args.pre_acoustic_scale,
    )
    os.makedirs(args.results_path, exist_ok=True)
    for (lmwt, wip), res in results.items():
        with open(
            os.path.join(args.results_path, f"wer_{lmwt}_{wip}"), "w"
        ) as f:
            f.write(res["scorer"].result_string())
    assert best_key is not None, "no scored utterances"
    best = results[best_key]
    with open(os.path.join(args.results_path, "best_wer"), "w") as f:
        f.write(
            f"lmwt={best_key[0]} wip={best_key[1]}\n"
            + best["scorer"].result_string()
        )
    with open(
        os.path.join(args.results_path, "decoded_results.txt"), "w"
    ) as f:
        for utt, hyp in best["hypos"].items():
            f.write(f"{utt} {hyp}\n")
    with open(
        os.path.join(args.results_path, "aligned_results.txt"), "w"
    ) as f:
        f.write(best["scorer"].aligned_results)
    logger.info(
        "best WER %.2f%% at lmwt=%d wip=%.1f (%d grid points)",
        best["wer"], best_key[0], best_key[1], len(results),
    )
    return best["wer"]


if __name__ == "__main__":
    main()
