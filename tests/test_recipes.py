"""Recipe yamls train + decode end-to-end on a tiny corpus.

Each example config (examples/asr_*/*.yaml) is exercised through the real
CLIs with size-shrinking overrides (the yaml supplies the wiring — task,
criterion, arch, LR schedule, SpecAugment — the overrides only shrink
dimensions/epochs so the test runs in seconds). Mirrors the reference's
tests/test_binaries.py model-family smoke tests (SURVEY.md §4)."""

import os

import numpy as np
import pytest

from tests.utils import make_corpus

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SHRINK_COMMON = [
    "dataset.feat_dim=8",
    "dataset.max_tokens=800",
    "dataset.num_batch_buckets=2",
    "dataset.required_batch_size_multiple=2",
    "dataset.max_source_positions=200",
    "dataset.max_target_positions=50",
    "optimization.max_epoch=1",
    "optimization.update_freq=[1]",
    "common.dtype=float32",
    "common.log_interval=5",
]

SHRINK_LSTM = [
    "model.conv_channels=(4,)",
    "model.conv_kernel_sizes=((3,3),)",
    "model.conv_strides=((2,2),)",
    "model.encoder_hidden_size=12",
    "model.encoder_layers=1",
    "model.decoder_embed_dim=8",
    "model.decoder_hidden_size=12",
    "model.decoder_out_embed_dim=12",
    "model.decoder_layers=1",
    "model.attention_dim=12",
    "model.dropout=0.0",
]

SHRINK_TRANSFORMER = [
    "model.conv_channels=(4,)",
    "model.conv_kernel_sizes=((3,3),)",
    "model.conv_strides=((2,2),)",
    "model.encoder_embed_dim=16",
    "model.encoder_ffn_dim=32",
    "model.encoder_layers=2",
    "model.encoder_heads=2",
    "model.decoder_embed_dim=16",
    "model.decoder_ffn_dim=32",
    "model.decoder_layers=1",
    "model.decoder_heads=2",
    "model.dropout=0.0",
]

SHRINK_TRANSFORMER_CTC = [
    "model.encoder.conv_channels=(4,)",
    "model.encoder.conv_kernel_sizes=((3,3),)",
    "model.encoder.conv_strides=((2,2),)",
    "model.encoder.encoder_embed_dim=16",
    "model.encoder.encoder_ffn_dim=32",
    "model.encoder.encoder_layers=2",
    "model.encoder.encoder_heads=2",
    "model.encoder.dropout=0.0",
]

SHRINK_TRANSDUCER = [
    "model.encoder.conv_channels=(4,)",
    "model.encoder.conv_kernel_sizes=((3,3),)",
    "model.encoder.conv_strides=((2,2),)",
    "model.encoder.encoder_embed_dim=16",
    "model.encoder.encoder_ffn_dim=32",
    "model.encoder.encoder_layers=2",
    "model.encoder.encoder_heads=2",
    "model.encoder.dropout=0.0",
    "model.pred_embed_dim=8",
    "model.pred_hidden_size=12",
    "model.pred_layers=1",
    "model.pred_dropout=0.0",
    "model.joint_dim=12",
]

RECIPES = [
    ("asr_librispeech/lstm_specaug_librispeech.yaml", SHRINK_LSTM),
    ("asr_librispeech/transformer_librispeech.yaml", SHRINK_TRANSFORMER),
    ("asr_librispeech/transformer_ctc_librispeech.yaml",
     SHRINK_TRANSFORMER_CTC),
    ("asr_librispeech/conformer_transducer_librispeech.yaml",
     SHRINK_TRANSDUCER),
    ("asr_swbd/lstm_specaug_swbd.yaml", SHRINK_LSTM),
]


@pytest.mark.parametrize("recipe,shrink", RECIPES,
                         ids=[r[0].split("/")[-1] for r in RECIPES])
def test_recipe_yaml_trains_and_decodes(tmp_path, recipe, shrink):
    root = str(tmp_path)
    make_corpus(root, "train", num_utts=12, feat_dim=8, seed=0)
    make_corpus(root, "valid", num_utts=6, feat_dim=8, seed=1)
    make_corpus(root, "test", num_utts=6, feat_dim=8, seed=2)
    config = os.path.join(REPO, "examples", recipe)
    save_dir = os.path.join(root, "ckpt")

    from espresso_tpu.cli.train import main as train_main

    metrics = train_main(
        ["--config", config]
        + SHRINK_COMMON
        + shrink
        + [
            f"dataset.data={root}",
            f"checkpoint.save_dir={save_dir}",
        ]
    )
    assert np.isfinite(metrics["loss"]), recipe

    from espresso_tpu.cli.speech_recognize import main as rec_main

    results = os.path.join(root, "decode")
    rec_main(
        ["--config", config]
        + SHRINK_COMMON
        + shrink
        + [
            f"dataset.data={root}",
            "dataset.gen_subset=test",
            f"checkpoint.save_dir={save_dir}",
            "generation.beam=4",
            "generation.lm_weight=0.0",
            "generation.eos_factor=1.5"
            if "ctc" not in recipe and "transducer" not in recipe
            else "generation.lm_weight=0.0",
            f"generation.results_path={results}",
        ]
    )
    for name in ("decoded_results.txt", "wer", "aligned_results.txt"):
        assert os.path.exists(os.path.join(results, name)), (recipe, name)
