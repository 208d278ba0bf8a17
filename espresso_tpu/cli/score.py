"""Offline scoring CLI (rebuild of fairseq_cli/score.py): BLEU / chrF / WER
between a system-output file and a reference file, one sentence per line.

Usage:
    python -m espresso_tpu.cli.score --sys hyp.txt --ref ref.txt \
        [--metric bleu|chrf|wer] [--order 4] [--sentence-bleu]
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> float:
    p = argparse.ArgumentParser(description="score hypotheses against references")
    p.add_argument("--sys", "-s", required=True, help="system output file")
    p.add_argument("--ref", "-r", required=True, help="reference file")
    p.add_argument(
        "--metric", choices=("bleu", "chrf", "wer"), default="bleu"
    )
    p.add_argument("--order", type=int, default=4, help="BLEU n-gram order")
    p.add_argument(
        "--sentence-bleu",
        action="store_true",
        help="print smoothed per-sentence BLEU instead of corpus BLEU",
    )
    p.add_argument(
        "--ignore-case", action="store_true", help="lowercase before scoring"
    )
    args = p.parse_args(argv)

    with open(args.sys, encoding="utf-8") as f:
        hyps = [l.rstrip("\n") for l in f]
    with open(args.ref, encoding="utf-8") as f:
        refs = [l.rstrip("\n") for l in f]
    if len(hyps) != len(refs):
        raise SystemExit(
            f"line count mismatch: {len(hyps)} hyps vs {len(refs)} refs"
        )
    if args.ignore_case:
        hyps = [h.lower() for h in hyps]
        refs = [r.lower() for r in refs]

    if args.metric == "bleu":
        from espresso_tpu.tools.scoring import BleuScorer, sentence_bleu

        if args.sentence_bleu:
            total = 0.0
            for i, (h, r) in enumerate(zip(hyps, refs)):
                s = sentence_bleu(r.split(), h.split(), max_order=args.order)
                print(f"{i}\t{s:.2f}")
                total += s
            avg = total / max(len(hyps), 1)
            print(f"avg sentence BLEU = {avg:.2f}")
            return avg
        scorer = BleuScorer(max_order=args.order)
        for h, r in zip(hyps, refs):
            scorer.add(r.split(), h.split())
        print(scorer.result_string())
        return scorer.score()
    if args.metric == "chrf":
        from espresso_tpu.tools.scoring import ChrFScorer

        scorer = ChrFScorer()
        for h, r in zip(hyps, refs):
            scorer.add(r, h)
        print(scorer.result_string())
        return scorer.score()
    # wer
    from espresso_tpu.tools.wer import edit_distance

    errs, words = 0, 0
    for h, r in zip(hyps, refs):
        _, counts = edit_distance(r.split(), h.split())
        errs += counts["sub"] + counts["ins"] + counts["del"]
        words += len(r.split())
    wer = 100.0 * errs / max(words, 1)
    print(f"WER = {wer:.2f} ({errs} errors / {words} words)")
    return wer


if __name__ == "__main__":
    main(sys.argv[1:])
