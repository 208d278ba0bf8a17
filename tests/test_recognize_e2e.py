"""End-to-end recognition test: short train + beam-search decode through the
public CLIs, checking espresso-format output files."""

import os
import shutil

import numpy as np

from tests.utils import make_corpus

ARGS = [
    "dataset.max_tokens=1600",
    "dataset.num_batch_buckets=1",
    "dataset.required_batch_size_multiple=2",
    "dataset.feat_dim=8",
    "model.name=speech_lstm",
    "model.conv_channels=(4,)",
    "model.conv_kernel_sizes=((3,3),)",
    "model.conv_strides=((2,2),)",
    "model.encoder_hidden_size=24",
    "model.encoder_layers=1",
    "model.decoder_embed_dim=12",
    "model.decoder_hidden_size=24",
    "model.decoder_out_embed_dim=24",
    "model.decoder_layers=1",
    "model.attention_dim=24",
    "model.dropout=0.0",
    "optimization.lr=0.005",
    "optimization.clip_norm=2.0",
    "common.log_interval=50",
    "common.dtype=float32",
]


def test_train_then_recognize(tmp_path):
    from espresso_tpu.cli.speech_recognize import main as rec_main
    from espresso_tpu.cli.train import main as train_main

    d = str(tmp_path)
    make_corpus(d, "train", num_utts=16, feat_dim=8, seed=0, max_words=3)
    make_corpus(d, "valid", num_utts=8, feat_dim=8, seed=1, max_words=3)
    shutil.copy(f"{d}/train.json", f"{d}/test.json")

    args = [f"dataset.data={d}", f"checkpoint.save_dir={d}/ckpt"] + ARGS
    train_main(args + ["optimization.max_epoch=5"])
    res = rec_main(
        args
        + [
            "generation.beam=4",
            "generation.max_len_b=30",
            f"generation.results_path={d}/decode",
        ]
    )
    assert res["num_utts"] == 16
    assert 0.0 <= res["wer"]  # computed
    for name in ("decoded_results.txt", "wer", "cer", "aligned_results.txt"):
        assert os.path.exists(os.path.join(d, "decode", name)), name
    wer_text = open(os.path.join(d, "decode", "wer")).read()
    assert wer_text.startswith("WER:")


def test_interactive_cli(tmp_path, capsys):
    """Train briefly, then decode stdin-listed feat rxfilenames through the
    interactive REPL (fairseq_cli/interactive.py pattern)."""
    import io
    import json
    import sys as _sys

    from espresso_tpu.cli.interactive import main as interactive_main
    from espresso_tpu.cli.train import main as train_main
    from tests.utils import make_corpus

    d = str(tmp_path)
    make_corpus(d, "train", num_utts=12, feat_dim=8, seed=0)
    make_corpus(d, "valid", num_utts=4, feat_dim=8, seed=1)
    args = [
        f"dataset.data={d}",
        f"checkpoint.save_dir={d}/ckpt",
        f"dataset.dict={d}/dict.txt",
        "dataset.feat_dim=8",
        "dataset.batch_size=4",
        "model.name=speech_lstm",
        "model.conv_channels=(4,)",
        "model.conv_kernel_sizes=((3,3),)",
        "model.conv_strides=((2,2),)",
        "model.encoder_hidden_size=16",
        "model.encoder_layers=1",
        "model.decoder_embed_dim=8",
        "model.decoder_hidden_size=16",
        "model.decoder_out_embed_dim=16",
        "model.decoder_layers=1",
        "model.attention_dim=16",
        "model.dropout=0.0",
        "common.dtype=float32",
    ]
    train_main(args + ["optimization.max_epoch=1", "optimization.lr=0.003"])

    # pull two audio rxfilenames out of the valid manifest
    with open(f"{d}/valid.json") as f:
        manifest = json.load(f)
    lines = []
    for utt_id, rec in list(manifest.items())[:2]:
        lines.append(f"{utt_id}\t{rec['feat']}\n")
    old_stdin = _sys.stdin
    _sys.stdin = io.StringIO("".join(lines))
    try:
        n = interactive_main(args + ["generation.beam=2", "generation.nbest=2"])
    finally:
        _sys.stdin = old_stdin
    assert n == 2
    out = capsys.readouterr().out
    assert out.count("S-") == 2
    assert out.count("H-") == 4  # nbest=2 per utterance
