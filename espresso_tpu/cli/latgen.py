"""Decode dumped posteriors with the in-tree FST decoder (1-best or lattice).

In-tree replacement for the reference's external Kaldi decoding step: the
recipe pipes dump_posteriors output to ``latgen-faster-mapped
--lattice-beam=8`` with an HCLG graph, writing lattice archives that the
scoring stage rescales and sweeps (examples/asr_wsj/run_chain_e2e.sh:218-222
in the reference). Here the graph is an OpenFst text-format file and the
decoder is clib/fst_decode.cpp (token-passing beam search).

With ``--lattices-path`` the full reference behavior runs: a pruned lattice
per utterance (``--lattice-beam``, ``--min-active``) written to one npz
archive, with ``decoded_results.txt`` carrying each lattice's best path at
the decode scales (downstream: cli.score_lattices for the LMWT x WIP sweep,
cli.lmrescore for ARPA LM rescoring). Without it, the lighter 1-best
Viterbi decoder runs.

Usage:
    python -m espresso_tpu.cli.latgen \
        --posteriors exp/posteriors_test.ark \
        --graph graph/HCLG.fst.txt --words graph/words.txt \
        --acoustic-scale 1.0 --beam 15 --lattice-beam 8 --max-active 7000 \
        --lattices-path exp/decode_test/lat.npz \
        --results-path exp/decode_test [--ref data/test_text]

Outputs ``decoded_results.txt`` (utt_id + words per line) and, when a
reference text is given, ``wer`` + ``aligned_results.txt`` via the same
scorer as speech_recognize.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

from espresso_tpu.cli.logging_utils import setup_logging

logger = logging.getLogger("espresso_tpu.latgen")


def load_words(path: str):
    """OpenFst symbol table: ``word id`` per line."""
    id2word = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                id2word[int(parts[1])] = parts[0]
    return id2word


def main(argv=None):
    setup_logging()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--posteriors", required=True, help="ark of loglikes")
    p.add_argument("--graph", required=True, help="text-format decoding FST")
    p.add_argument("--words", help="words.txt symbol table (else raw ids)")
    p.add_argument("--acoustic-scale", type=float, default=1.0)
    p.add_argument("--beam", type=float, default=15.0)
    p.add_argument("--lattice-beam", type=float, default=8.0)
    p.add_argument("--min-active", type=int, default=20)
    p.add_argument("--max-active", type=int, default=7000)
    p.add_argument(
        "--lattices-path",
        help="write a pruned lattice archive (npz) — the reference's "
        "latgen-faster-mapped lattice output; 1-best only when absent",
    )
    p.add_argument("--results-path", required=True)
    p.add_argument("--ref", help="reference text (utt_id words...) for WER")
    args = p.parse_args(argv if argv is not None else sys.argv[1:])

    from espresso_tpu.data import kaldi_io
    from espresso_tpu.tools.fst_decoder import DecodingGraph, FstDecoder
    from espresso_tpu.tools.lattice import best_path, write_lattice_archive

    graph = DecodingGraph.load_text(args.graph)
    logger.info(
        "graph: %d states, %d arcs", graph.num_states, len(graph.arc_dst)
    )
    id2word = load_words(args.words) if args.words else None
    decoder = FstDecoder(
        graph,
        acoustic_scale=args.acoustic_scale,
        beam=args.beam,
        max_active=args.max_active,
    )

    os.makedirs(args.results_path, exist_ok=True)
    hypos = {}
    lats = {}
    num = 0
    with open(os.path.join(args.results_path, "decoded_results.txt"), "w") as f:
        for utt_id, ll in kaldi_io.read_mat_ark(args.posteriors):
            if args.lattices_path:
                lat, status = decoder.decode_lattice(
                    ll,
                    lattice_beam=args.lattice_beam,
                    min_active=args.min_active,
                )
                if status != "final":
                    logger.warning("%s: no final state reached", utt_id)
                lats[utt_id] = lat
                labels, _cost = best_path(lat)
            else:
                labels, cost, reached_final = decoder.decode(ll)
                if not reached_final:
                    logger.warning("%s: no final state reached", utt_id)
            words = (
                [id2word.get(i, f"<{i}>") for i in labels]
                if id2word
                else [str(i) for i in labels]
            )
            hypos[utt_id] = " ".join(words)
            f.write(f"{utt_id} {hypos[utt_id]}\n")
            num += 1
    if args.lattices_path:
        write_lattice_archive(args.lattices_path, lats)
        logger.info(
            "wrote %d lattices to %s", len(lats), args.lattices_path
        )
    logger.info("decoded %d utterances", num)

    if args.ref:
        from espresso_tpu.tools.wer import Scorer

        refs = {}
        with open(args.ref) as f:
            for line in f:
                parts = line.split(maxsplit=1)
                if parts:
                    refs[parts[0]] = parts[1].strip() if len(parts) > 1 else ""
        scorer = Scorer()
        for utt_id, hypo in hypos.items():
            if utt_id in refs:
                scorer.add_evaluation(utt_id, refs[utt_id], hypo)
        with open(os.path.join(args.results_path, "wer"), "w") as f:
            f.write(scorer.result_string())
        with open(
            os.path.join(args.results_path, "aligned_results.txt"), "w"
        ) as f:
            f.write(scorer.aligned_results)
        logger.info("WER: %s", scorer.result_string().strip())
    return num


if __name__ == "__main__":
    main()
