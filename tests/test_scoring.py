"""BLEU/chrF scoring (libbleu / fairseq scoring equivalents)."""

import math

import pytest

from espresso_tpu.tools.scoring import BleuScorer, ChrFScorer, sentence_bleu


def test_bleu_perfect_match():
    s = BleuScorer()
    s.add("the cat sat on the mat".split(), "the cat sat on the mat".split())
    assert abs(s.score() - 100.0) < 1e-9
    assert "BLEU4 = 100.00" in s.result_string()


def test_bleu_known_value():
    # hand-computed: ref = a b c d e f g, hyp = a b c d e f h
    # p1=6/7, p2=5/6, p3=4/5, p4=3/4; BP=1 (equal length)
    s = BleuScorer()
    s.add("a b c d e f g".split(), "a b c d e f h".split())
    expect = 100.0 * math.exp(
        (math.log(6 / 7) + math.log(5 / 6) + math.log(4 / 5) + math.log(3 / 4))
        / 4
    )
    assert abs(s.score() - expect) < 1e-9


def test_bleu_brevity_penalty():
    s = BleuScorer(max_order=1)
    s.add("a b c d".split(), "a b".split())  # p1=1, BP=exp(1-4/2)
    assert abs(s.score() - 100.0 * math.exp(1 - 2.0)) < 1e-9


def test_bleu_clipping():
    # hyp repeats "the": clipped unigram matches = count in ref (2)
    s = BleuScorer(max_order=1)
    s.add("the cat the mat".split(), "the the the the".split())
    assert abs(s.score() - 100.0 * 2 / 4) < 1e-9


def test_bleu_corpus_accumulation():
    # corpus BLEU is computed from summed counts, not averaged sentences
    s = BleuScorer(max_order=1)
    s.add("a b".split(), "a b".split())
    s.add("c d".split(), "x y".split())
    assert abs(s.score() - 100.0 * 2 / 4) < 1e-9


def test_sentence_bleu_smoothing_nonzero():
    v = sentence_bleu("a b c".split(), "a x c".split())
    assert 0.0 < v < 100.0


def test_chrf_perfect_and_orders():
    c = ChrFScorer()
    c.add("hello world", "hello world")
    assert abs(c.score() - 100.0) < 1e-9
    c2 = ChrFScorer()
    c2.add("abcd", "abxd")
    assert 0.0 < c2.score() < 100.0


def test_score_cli(tmp_path):
    import os

    from espresso_tpu.cli.score import main

    hyp = os.path.join(str(tmp_path), "hyp.txt")
    ref = os.path.join(str(tmp_path), "ref.txt")
    with open(hyp, "w") as f:
        f.write("the cat sat on the mat\nhello there big world\n")
    with open(ref, "w") as f:
        f.write("the cat sat on the mat\nhello there wide world\n")
    bleu = main(["--sys", hyp, "--ref", ref])
    assert 0.0 < bleu <= 100.0
    chrf = main(["--sys", hyp, "--ref", ref, "--metric", "chrf"])
    assert 0.0 < chrf <= 100.0
    wer = main(["--sys", hyp, "--ref", ref, "--metric", "wer"])
    assert abs(wer - 100.0 / 10) < 1e-6  # 1 substitution / 10 ref words
    sb = main(["--sys", hyp, "--ref", ref, "--sentence-bleu"])
    assert 0.0 < sb <= 100.0
