"""End-to-end binary tests: tiny corpus + short train + decode through the
public CLI (the reference's tests/test_binaries.py pattern, SURVEY.md §4)."""

import os

import numpy as np
import pytest

from tests.utils import make_corpus

BASE_ARGS = [
    "dataset.max_tokens=800",
    "dataset.num_batch_buckets=2",
    "dataset.required_batch_size_multiple=2",
    "dataset.feat_dim=8",
    "optimization.lr=0.003",
    "optimization.clip_norm=2.0",
    "common.log_interval=5",
    "common.dtype=float32",
]

SMALL_LSTM = [
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
]

SMALL_TRANSFORMER = [
    "model.name=speech_transformer",
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


def _corpus(tmp_path):
    d = str(tmp_path)
    make_corpus(d, "train", num_utts=24, feat_dim=8, seed=0)
    make_corpus(d, "valid", num_utts=8, feat_dim=8, seed=1)
    return d


def test_train_lstm_loss_decreases(tmp_path):
    from espresso_tpu.cli.train import main

    d = _corpus(tmp_path)
    stats = main(
        [f"dataset.data={d}", f"checkpoint.save_dir={d}/ckpt"]
        + BASE_ARGS
        + SMALL_LSTM
        + ["optimization.max_epoch=2"]
    )
    assert stats["loss"] < 2.85  # below initial ~ln(18)
    assert "valid_wer" in stats
    assert os.path.isdir(os.path.join(d, "ckpt", "checkpoint_last"))
    assert os.path.isdir(os.path.join(d, "ckpt", "checkpoint_best"))


def test_train_resume_from_checkpoint(tmp_path):
    from espresso_tpu.cli.train import main

    d = _corpus(tmp_path)
    args = (
        [f"dataset.data={d}", f"checkpoint.save_dir={d}/ckpt"]
        + BASE_ARGS
        + SMALL_LSTM
    )
    main(args + ["optimization.max_epoch=1"])
    stats = main(args + ["optimization.max_epoch=2"])  # resumes epoch 2
    assert stats["loss"] < 2.9


def test_train_transformer_ls_ce(tmp_path):
    from espresso_tpu.cli.train import main

    d = _corpus(tmp_path)
    stats = main(
        [f"dataset.data={d}", f"checkpoint.save_dir={d}/ckpt"]
        + BASE_ARGS
        + SMALL_TRANSFORMER
        + [
            "optimization.max_epoch=1",
            "criterion.label_smoothing=0.1",
            "lr_scheduler.name=tri_stage",
            "lr_scheduler.warmup_updates=4",
            "lr_scheduler.hold_steps=4",
            "lr_scheduler.decay_steps=10",
        ]
    )
    assert np.isfinite(stats["loss"])


def test_train_bf16_mixed_precision(tmp_path):
    """common.dtype=bfloat16: bf16 compute with fp32 master params.
    Training must converge comparably to fp32 (the params cast is inside
    the jitted step; master params and grads accumulate fp32)."""
    from espresso_tpu.cli.train import main

    d = _corpus(tmp_path)
    args = (
        [f"dataset.data={d}", f"checkpoint.save_dir={d}/ckpt_bf16"]
        + [a for a in BASE_ARGS if not a.startswith("common.dtype")]
        + SMALL_LSTM
        + ["common.dtype=bfloat16", "optimization.max_epoch=2"]
    )
    stats = main(args)
    assert np.isfinite(stats["loss"])
    assert stats["loss"] < 2.9  # learning, not just running
    # master params stayed fp32 on disk
    import jax
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        saved = ckptr.restore(
            os.path.join(d, "ckpt_bf16", "checkpoint_last", "state")
        )
    leaf_dtypes = {
        str(v.dtype)
        for v in jax.tree_util.tree_leaves(saved["params"])
        if hasattr(v, "dtype")
    }
    assert leaf_dtypes == {"float32"}, leaf_dtypes


def test_train_ctc(tmp_path):
    from espresso_tpu.cli.train import main

    d = _corpus(tmp_path)
    stats = main(
        [f"dataset.data={d}", f"checkpoint.save_dir={d}/ckpt"]
        + BASE_ARGS
        + [
            "model.name=speech_lstm_encoder_model",
            "model.encoder.conv_channels=(4,)",
            "model.encoder.conv_kernel_sizes=((3,3),)",
            "model.encoder.conv_strides=((2,2),)",
            "model.encoder.encoder_hidden_size=16",
            "model.encoder.encoder_layers=1",
            "model.encoder.dropout=0.0",
            "criterion.name=ctc_loss",
            "optimization.max_epoch=1",
        ]
    )
    assert np.isfinite(stats["loss"])
    assert "valid_wer" in stats


def test_train_transducer(tmp_path):
    from espresso_tpu.cli.train import main

    d = _corpus(tmp_path)
    stats = main(
        [f"dataset.data={d}", f"checkpoint.save_dir={d}/ckpt"]
        + BASE_ARGS
        + [
            "model.name=speech_transformer_transducer",
            "model.encoder.conv_channels=(4,)",
            "model.encoder.conv_kernel_sizes=((3,3),)",
            "model.encoder.conv_strides=((2,2),)",
            "model.encoder.encoder_embed_dim=16",
            "model.encoder.encoder_ffn_dim=32",
            "model.encoder.encoder_layers=1",
            "model.encoder.encoder_heads=2",
            "model.encoder.encoder_layer_type=conformer",
            "model.encoder.encoder_pos_type=relative",
            "model.encoder.dropout=0.0",
            "model.pred_embed_dim=8",
            "model.pred_hidden_size=16",
            "model.pred_layers=1",
            "model.pred_dropout=0.0",
            "model.joint_dim=16",
            "criterion.name=transducer_loss",
            "optimization.max_epoch=1",
            "lr_scheduler.name=noam",
            "lr_scheduler.warmup_updates=10",
            "lr_scheduler.model_size=16",
            "optimization.lr=1.0",
        ]
    )
    assert np.isfinite(stats["loss"])


def test_train_update_freq_grad_accum(tmp_path):
    from espresso_tpu.cli.train import main

    d = _corpus(tmp_path)
    stats = main(
        [f"dataset.data={d}", f"checkpoint.save_dir={d}/ckpt"]
        + BASE_ARGS
        + SMALL_LSTM
        + ["optimization.max_epoch=1", "optimization.update_freq=2"]
    )
    assert np.isfinite(stats["loss"])


def test_validate_cli_matches_training_valid_loss(tmp_path):
    from espresso_tpu.cli.train import main as train_main
    from espresso_tpu.cli.validate import main as validate_main

    d = _corpus(tmp_path)
    args = (
        [f"dataset.data={d}", f"checkpoint.save_dir={d}/ckpt",
         f"dataset.dict={d}/dict.txt"]
        + BASE_ARGS
        + SMALL_LSTM
    )
    stats = train_main(args + ["optimization.max_epoch=1"])
    out = validate_main(args + ["dataset.valid_subset=valid"])
    assert "valid" in out
    assert abs(out["valid"]["loss"] - stats["valid_loss"]) < 1e-3
