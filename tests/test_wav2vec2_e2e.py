"""End-to-end wav2vec2 pretraining + CTC fine-tuning through the train CLI
(fairseq tasks/audio_pretraining.py + wav2vec2_asr fine-tune recipes)."""

import tempfile

from tests.test_device_features import make_wave_corpus

TINY_W2V = [
    "model.conv_layers=((8,10,5),(8,3,2),(8,2,2))",
    "model.encoder_embed_dim=16",
    "model.encoder_ffn_dim=32",
    "model.encoder_layers=2",
    "model.encoder_heads=2",
    "model.conv_pos=8",
    "model.conv_pos_groups=2",
    "model.dropout=0.0",
    "model.quantizer_entries=6",
    "model.vq_dim=8",
    "model.num_negatives=4",
    "model.final_dim=8",
    "model.mask_length=3",
]

BASE = [
    "dataset.feature_type=waveform",
    "dataset.max_tokens=400",
    "dataset.num_batch_buckets=1",
    "dataset.required_batch_size_multiple=2",
    "dataset.feat_dim=8",
    "optimization.lr=0.001",
    "optimization.max_epoch=1",
    "common.log_interval=5",
    "common.dtype=float32",
]


def test_wav2vec2_pretrain_cli(tmp_path):
    from espresso_tpu.cli.train import main as train_main

    d = str(tmp_path)
    make_wave_corpus(d, "train", 6, seed=0)
    make_wave_corpus(d, "valid", 4, seed=1)
    stats = train_main(
        [
            f"dataset.data={d}",
            f"checkpoint.save_dir={d}/ckpt",
            "task.name=audio_pretraining",
            "criterion.name=wav2vec2_criterion",
            "model.name=wav2vec2",
        ]
        + TINY_W2V
        + BASE
    )
    import numpy as np

    assert np.isfinite(stats["loss"])


def test_wav2vec2_ctc_finetune_cli(tmp_path):
    from espresso_tpu.cli.train import main as train_main

    d = str(tmp_path)
    make_wave_corpus(d, "train", 6, seed=0)
    make_wave_corpus(d, "valid", 4, seed=1)
    stats = train_main(
        [
            f"dataset.data={d}",
            f"checkpoint.save_dir={d}/ckpt",
            "criterion.name=ctc_loss",
            "model.name=wav2vec2_ctc",
        ]
        + [a.replace("model.", "model.w2v.") for a in TINY_W2V]
        + BASE
    )
    assert "valid_wer" in stats
