import numpy as np

from espresso_tpu.tools.wer import Scorer, aligned_print, edit_distance


def test_edit_distance_golden():
    # golden cases in the spirit of tests/espresso/test_speech_utils.py
    ref = "a b c d".split()
    hyp = "a b c d".split()
    _, c = edit_distance(ref, hyp)
    assert (c["sub"], c["ins"], c["del"], c["corr"]) == (0, 0, 0, 4)

    hyp = "a x c".split()
    _, c = edit_distance(ref, hyp)
    assert c["sub"] == 1 and c["del"] == 1 and c["ins"] == 0
    assert c["words"] == 4

    hyp = "a b b c d e".split()
    _, c = edit_distance(ref, hyp)
    assert c["ins"] == 2 and c["sub"] == 0 and c["del"] == 0

    _, c = edit_distance([], "a b".split())
    assert c["ins"] == 2 and c["words"] == 0
    _, c = edit_distance("a b".split(), [])
    assert c["del"] == 2


def test_scorer_wer_cer():
    s = Scorer()
    s.add_evaluation("utt1", "the cat sat", "the cat sat")
    assert s.wer() == 0.0
    s.add_evaluation("utt2", "the dog ran", "the dog walked")
    # 1 sub out of 6 ref words
    assert abs(s.wer() - 100.0 / 6.0) < 1e-6
    assert s.tot_word_count() == 6
    assert s.cer() > 0.0
    assert "utt2" in s.aligned_results
    assert "WER" in s.result_string()


def test_aligned_print_format():
    ref, hyp = "a bb".split(), "a cc dd".split()
    _, c = edit_distance(ref, hyp)
    out = aligned_print(ref, hyp, c["steps"])
    lines = out.splitlines()
    assert lines[0].startswith("REF:")
    assert lines[1].startswith("HYP:")
    assert lines[2].startswith("STP:")


def test_output_filter(tmp_path):
    f = tmp_path / "filter.txt"
    f.write_text("s/%HESITATION/ /\n<noise>\n")
    s = Scorer(wer_output_filter=str(f))
    s.add_evaluation("u1", "hello <noise> world", "hello world")
    assert s.wer() == 0.0


def test_native_edit_distance_matches_python():
    from espresso_tpu.clib import batched_edit_counts

    rng = np.random.default_rng(0)
    refs, hyps = [], []
    for _ in range(20):
        n = int(rng.integers(0, 30))
        m = int(rng.integers(0, 30))
        refs.append(rng.integers(0, 5, n).tolist())
        hyps.append(rng.integers(0, 5, m).tolist())
    out = batched_edit_counts(refs, hyps)
    if out is None:
        import pytest

        pytest.skip("no native toolchain")
    for b, (r, h) in enumerate(zip(refs, hyps)):
        _, c = edit_distance([str(x) for x in r], [str(x) for x in h])
        assert (
            tuple(int(v) for v in out[b])
            == (c["corr"], c["sub"], c["ins"], c["del"])
        ), (b, out[b], c)
