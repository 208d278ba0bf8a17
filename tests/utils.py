"""Shared test helpers: tiny synthetic ASR corpus generation.

Mirrors the reference test strategy (tests/utils.py create_dummy_data +
tests/espresso/test_asr_dataset.py: random Kaldi ark matrices + random
transcripts + dictionary + JSON manifest), so end-to-end tests run the real
CLI surface on a tiny corpus.
"""

from __future__ import annotations

import json
import os
from collections import OrderedDict
from typing import List, Tuple

import numpy as np

from espresso_tpu.data import kaldi_io

VOCAB = list("abcdefg")


def make_corpus(
    root: str,
    split: str,
    num_utts: int = 24,
    feat_dim: int = 12,
    min_frames: int = 30,
    max_frames: int = 90,
    min_words: int = 1,
    max_words: int = 5,
    seed: int = 0,
) -> Tuple[str, str]:
    """Write {split}.json + ark + dict files under root. Returns (json, dict)."""
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    ark_path = os.path.join(root, f"{split}.ark")
    manifest = OrderedDict()
    words = ["".join(rng.choice(VOCAB, size=rng.integers(2, 5))) for _ in range(20)]
    with open(ark_path, "wb") as f:
        for i in range(num_utts):
            utt_id = f"{split}_utt{i:03d}"
            T = int(rng.integers(min_frames, max_frames + 1))
            mat = rng.standard_normal((T, feat_dim)).astype(np.float32)
            f.write((utt_id + " ").encode())
            offset = f.tell()
            kaldi_io.write_mat(f, mat)
            n_words = int(rng.integers(min_words, max_words + 1))
            text = " ".join(rng.choice(words, size=n_words))
            manifest[utt_id] = {
                "feat": f"{ark_path}:{offset}",
                "text": text,
                "utt2num_frames": str(T),
            }
    json_path = os.path.join(root, f"{split}.json")
    with open(json_path, "w") as f:
        json.dump(manifest, f, indent=2)
    # char dictionary
    dict_path = os.path.join(root, "dict.txt")
    if not os.path.exists(dict_path):
        syms = ["<space>"] + sorted(set(VOCAB))
        with open(dict_path, "w") as f:
            for s in syms:
                f.write(f"{s} 100\n")
    return json_path, dict_path
