"""On-device feature extraction path: wave manifests -> fused fbank inside
the jitted train step (the reference's on-the-fly torchaudio path moved onto
the TPU)."""

import json
import os
import wave as wavmod
from collections import OrderedDict

import numpy as np
import pytest


def make_wave_corpus(root, split, num_utts=8, seed=0):
    rng = np.random.default_rng(seed)
    words = ["ab", "cd", "efg"]
    manifest = OrderedDict()
    for i in range(num_utts):
        utt = f"{split}_{i:03d}"
        S = int(rng.integers(8000, 16000))
        pcm = (rng.standard_normal(S) * 3000).astype("<i2")
        p = os.path.join(root, f"{utt}.wav")
        with wavmod.open(p, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(pcm.tobytes())
        manifest[utt] = {
            "wave": p,
            "text": " ".join(rng.choice(words, size=rng.integers(1, 4))),
        }
    with open(os.path.join(root, f"{split}.json"), "w") as f:
        json.dump(manifest, f)
    dict_path = os.path.join(root, "dict.txt")
    if not os.path.exists(dict_path):
        with open(dict_path, "w") as f:
            for s in ["<space>"] + sorted("abcdefg"):
                f.write(f"{s} 10\n")


def test_device_fbank_training_and_decode(tmp_path):
    from espresso_tpu.cli.speech_recognize import main as rec_main
    from espresso_tpu.cli.train import main as train_main

    d = str(tmp_path)
    make_wave_corpus(d, "train", 8, seed=0)
    make_wave_corpus(d, "valid", 4, seed=1)
    make_wave_corpus(d, "test", 4, seed=2)
    args = [
        f"dataset.data={d}",
        f"checkpoint.save_dir={d}/ckpt",
        "dataset.feature_type=device_fbank",
        "dataset.feat_dim=40",
        "dataset.max_tokens=4000",
        "dataset.num_batch_buckets=2",
        "dataset.required_batch_size_multiple=2",
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
        "dataset.specaugment_config={'F': 5, 'num_freq_masks': 1, 'T': 10, 'num_time_masks': 1}",
        "optimization.max_epoch=1",
        "optimization.lr=0.003",
        "common.log_interval=5",
        "common.dtype=float32",
    ]
    stats = train_main(args)
    assert np.isfinite(stats["loss"])
    assert "valid_wer" in stats
    res = rec_main(
        args
        + [
            "generation.beam=2",
            "generation.max_len_b=15",
            f"generation.results_path={d}/decode",
        ]
    )
    assert res["num_utts"] == 4
    assert os.path.exists(os.path.join(d, "decode", "wer"))
