"""Hub from_pretrained interface (fairseq/hub_utils.py equivalent)."""

import glob
import os

from tests.test_device_features import make_wave_corpus

ARGS = [
    "dataset.max_tokens=1600",
    "dataset.num_batch_buckets=1",
    "dataset.required_batch_size_multiple=2",
    "dataset.feat_dim=8",
    "dataset.feature_type=fbank",
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
    "optimization.lr=0.003",
    "common.log_interval=50",
    "common.dtype=float32",
    "optimization.max_epoch=1",
]


def test_from_pretrained_transcribes(tmp_path):
    import espresso_tpu.hub as hub
    from espresso_tpu.cli.train import main as train_main

    d = str(tmp_path)
    make_wave_corpus(d, "train", 6, seed=0)
    make_wave_corpus(d, "valid", 4, seed=1)
    make_wave_corpus(d, "test", 4, seed=2)
    train_main(
        [f"dataset.data={d}", f"checkpoint.save_dir={d}/ckpt"] + ARGS
    )
    asr = hub.from_pretrained(
        f"{d}/ckpt",
        data_dir=d,
        beam=2,
        **{
            "dataset.feat_dim": 8,
            "dataset.feature_type": "fbank",
            "dataset.gen_subset": "test",
            "generation.max_len_b": 20,
        },
    )
    wavs = sorted(glob.glob(os.path.join(d, "*.wav")))[:2]
    out = asr.transcribe(wavs)
    assert len(out) == 2
    assert all(isinstance(t, str) for t in out)
    nb = asr.transcribe(wavs[:1], nbest=2)
    assert len(nb) == 1 and 1 <= len(nb[0]) <= 2
