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
            "generation.print_alignment=true",
            f"generation.results_path={d}/decode",
        ]
    )
    assert res["num_utts"] == 16
    assert 0.0 <= res["wer"]  # computed
    for name in ("decoded_results.txt", "wer", "cer", "aligned_results.txt"):
        assert os.path.exists(os.path.join(d, "decode", name)), name
    wer_text = open(os.path.join(d, "decode", "wer")).read()
    assert wer_text.startswith("WER:")
    # --print-alignment artifacts: exact matrices + rendered heatmaps
    # (reference speech_recognize.py:265-314)
    attn = np.load(os.path.join(d, "decode", "attn.npz"))
    assert len(attn.files) > 0
    plots = os.listdir(os.path.join(d, "decode", "attn_plots"))
    assert len(plots) == len(attn.files)
    assert all(p.endswith(".pdf") for p in plots)


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


TRANSDUCER_ARGS = [
    "dataset.max_tokens=1600",
    "dataset.num_batch_buckets=1",
    "dataset.required_batch_size_multiple=2",
    "dataset.feat_dim=8",
    "model.name=speech_transformer_transducer",
    "model.encoder.conv_channels=(4,)",
    "model.encoder.conv_kernel_sizes=((3,3),)",
    "model.encoder.conv_strides=((2,2),)",
    "model.encoder.encoder_embed_dim=16",
    "model.encoder.encoder_ffn_dim=32",
    "model.encoder.encoder_layers=1",
    "model.encoder.encoder_heads=2",
    "model.encoder.dropout=0.0",
    "model.pred_embed_dim=8",
    "model.pred_hidden_size=16",
    "model.pred_layers=1",
    "model.pred_dropout=0.0",
    "model.joint_dim=16",
    "criterion.name=transducer_loss",
    "optimization.lr=0.003",
    "common.dtype=float32",
]


def test_recognize_with_lm_fusion_e2e(tmp_path):
    """Full LM-fusion pipeline through the public CLIs (the reference's
    flagship decode mode, examples/asr_librispeech/run.sh:266-290): train a
    transducer, train a subword LSTM LM on the corpus text
    (language_modeling_for_asr), then recognize with generation.lm_path +
    lm_weight (renormalized shallow fusion inside the AES beam search)."""
    import json as _json

    from espresso_tpu.cli.speech_recognize import main as rec_main
    from espresso_tpu.cli.train import main as train_main
    from espresso_tpu.data.encoders import CharactersAsr

    d = str(tmp_path)
    make_corpus(d, "train", num_utts=12, feat_dim=8, seed=0, max_words=3)
    make_corpus(d, "valid", num_utts=6, feat_dim=8, seed=1, max_words=3)
    shutil.copy(f"{d}/train.json", f"{d}/test.json")

    # LM text: char-tokenized corpus transcripts (the recipes' Stage "prep
    # LM data" cut of the text column, run.sh:62)
    tok = CharactersAsr()
    for split in ("train", "valid"):
        with open(os.path.join(d, f"{split}.json")) as f:
            manifest = _json.load(f)
        with open(os.path.join(d, f"lm_{split}.txt"), "w") as f:
            for entry in manifest.values():
                f.write(tok.encode(entry["text"]) + "\n")

    train_main(
        [f"dataset.data={d}", f"checkpoint.save_dir={d}/ckpt"]
        + TRANSDUCER_ARGS
        + ["optimization.max_epoch=2"]
    )
    train_main(
        [
            f"dataset.data={d}",
            f"checkpoint.save_dir={d}/lm",
            "task.name=language_modeling_for_asr",
            "dataset.train_subset=lm_train",
            "dataset.valid_subset=lm_valid",
            "dataset.max_tokens=256",
            "dataset.required_batch_size_multiple=1",
            "model.name=lstm_lm_espresso",
            "model.embed_dim=8",
            "model.hidden_size=16",
            "model.out_embed_dim=8",
            "model.num_layers=1",
            "model.dropout=0.0",
            "criterion.name=cross_entropy_v2",
            "optimization.max_epoch=1",
            "optimization.lr=0.01",
            "common.dtype=float32",
        ]
    )

    res = rec_main(
        [f"dataset.data={d}", f"checkpoint.save_dir={d}/ckpt"]
        + TRANSDUCER_ARGS
        + [
            "generation.beam=4",
            f"generation.lm_path={d}/lm",
            "generation.lm_weight=0.4",
            f"generation.results_path={d}/decode_lm",
        ]
    )
    assert res["num_utts"] == 12
    assert 0.0 <= res["wer"]
    for name in ("decoded_results.txt", "wer", "aligned_results.txt"):
        assert os.path.exists(os.path.join(d, "decode_lm", name)), name
