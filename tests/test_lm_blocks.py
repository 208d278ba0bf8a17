"""Binarized mmap LM data + token-block packing
(espresso_tpu/data/indexed_dataset.py vs the reference's
fairseq/data/indexed_dataset.py + token_block_utils_fast.pyx semantics),
including the prep-CLI binarizer and an end-to-end CLI LM train/eval run."""

import os

import numpy as np
import pytest

from espresso_tpu.data.dictionary import AsrDictionary
from espresso_tpu.data.indexed_dataset import (
    LMBlockDataset,
    MMapTokenDataset,
    token_block_slices,
    write_binarized,
)

WORDS = ["ab", "cd", "ef", "gh", "ij", "kl"]


def _make_lm_corpus(root, split, num_sents=30, seed=0):
    rng = np.random.default_rng(seed)
    lines = []
    for _ in range(num_sents):
        n = int(rng.integers(1, 7))
        lines.append(" ".join(rng.choice(WORDS, size=n)))
    with open(os.path.join(root, f"{split}.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return lines


def _make_dict(root):
    d = AsrDictionary()
    for w in WORDS:
        d.add_symbol(w)
    path = os.path.join(root, "dict.txt")
    d.save(path)
    return path, d


def test_binarize_roundtrip(tmp_path):
    root = str(tmp_path)
    lines = _make_lm_corpus(root, "train")
    dict_path, d = _make_dict(root)

    from espresso_tpu.cli.prep import main as prep_main

    prefix = os.path.join(root, "train")
    assert (
        prep_main(
            [
                "binarize",
                "--text",
                os.path.join(root, "train.txt"),
                "--dict",
                dict_path,
                "--output-prefix",
                prefix,
            ]
        )
        == 0
    )
    ds = MMapTokenDataset(prefix)
    assert len(ds) == len(lines)
    for i, line in enumerate(lines):
        np.testing.assert_array_equal(
            ds.sentence(i), d.encode_line(line, append_eos=True)
        )
    assert ds.total_tokens == sum(len(line.split()) + 1 for line in lines)


def test_token_block_modes():
    sizes = np.array([3, 5, 2, 7, 1])
    # none: fixed-size slices over the 18-token stream
    sl = token_block_slices(sizes, 4, "none")
    np.testing.assert_array_equal(
        sl, [[0, 4], [4, 8], [8, 12], [12, 16], [16, 18]]
    )
    # eos: one sentence per block
    sl = token_block_slices(sizes, 4, "eos")
    np.testing.assert_array_equal(
        sl, [[0, 3], [3, 8], [8, 10], [10, 17], [17, 18]]
    )
    # complete: greedy whole-sentence packing <= block_size; oversized
    # sentences get their own block
    sl = token_block_slices(sizes, 8, "complete")
    np.testing.assert_array_equal(sl, [[0, 8], [8, 10], [10, 18]])
    # an oversized sentence becomes its own block
    sl = token_block_slices(np.array([3, 9, 2]), 4, "complete")
    np.testing.assert_array_equal(sl, [[0, 3], [3, 12], [12, 14]])


def test_block_dataset_collate_alignment(tmp_path):
    root = str(tmp_path)
    _make_lm_corpus(root, "train", num_sents=20, seed=3)
    dict_path, d = _make_dict(root)
    prefix = os.path.join(root, "train")
    write_binarized(
        prefix,
        (
            d.encode_line(line, append_eos=True)
            for line in open(prefix + ".txt")
            if line.strip()
        ),
    )
    ds = LMBlockDataset(prefix, d, block_size=8, break_mode="none")
    stream = np.asarray(ds.data.tokens)
    # all blocks except the last are exactly block_size
    assert (ds.src_sizes[:-1] == 8).all()
    specs = ds.make_batch_specs(
        max_tokens=64, max_sentences=4, shuffle=False,
        required_batch_size_multiple=1,
    )
    seen = 0
    for spec in specs:
        batch = ds.collate(spec)
        for row in range(batch["nsentences"]):
            idx = int(spec.indices[row])
            s, e = (int(x) for x in ds.slices[idx])
            n = int(batch["tgt_lengths"][row])
            assert n == e - s
            np.testing.assert_array_equal(
                batch["target"][row, :n], stream[s:e]
            )
            # prev is the stream shifted by one (eos at stream start):
            # context crosses block boundaries like TokenBlockDataset
            if s == 0:
                assert batch["prev_output_tokens"][row, 0] == d.eos()
                np.testing.assert_array_equal(
                    batch["prev_output_tokens"][row, 1:n], stream[: e - 1]
                )
            else:
                np.testing.assert_array_equal(
                    batch["prev_output_tokens"][row, :n], stream[s - 1 : e - 1]
                )
            seen += 1
    assert seen == len(ds)


def test_lm_train_and_eval_binarized_e2e(tmp_path):
    """binarize -> CLI train (lstm LM) -> CLI eval_lm, O(batch) memory path."""
    root = str(tmp_path)
    _make_lm_corpus(root, "train", num_sents=40, seed=0)
    _make_lm_corpus(root, "valid", num_sents=10, seed=1)
    _make_lm_corpus(root, "test", num_sents=10, seed=2)
    dict_path, d = _make_dict(root)

    from espresso_tpu.cli.prep import main as prep_main

    for split in ("train", "valid"):
        prep_main(
            [
                "binarize",
                "--text",
                os.path.join(root, f"{split}.txt"),
                "--dict",
                dict_path,
                "--output-prefix",
                os.path.join(root, split),
            ]
        )
        os.remove(os.path.join(root, f"{split}.txt"))  # force the .bin path

    from espresso_tpu.cli.train import main as train_main

    save_dir = os.path.join(root, "ckpt")
    args = [
        f"dataset.data={root}",
        f"dataset.dict={dict_path}",
        "task.name=language_modeling_for_asr",
        "dataset.tokens_per_sample=16",
        "dataset.max_tokens=128",
        "dataset.required_batch_size_multiple=1",
        "dataset.num_batch_buckets=1",
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
        f"checkpoint.save_dir={save_dir}",
    ]
    metrics = train_main(args)
    assert np.isfinite(metrics["loss"])
    # eval_lm on the text test split (decode-side path unchanged)
    from espresso_tpu.cli.eval_lm import main as eval_main

    rc = eval_main(
        args[:4]
        + [
            "dataset.gen_subset=test",
            "dataset.max_tokens=128",
            "dataset.required_batch_size_multiple=1",
            f"checkpoint.save_dir={save_dir}",
        ]
    )
    assert np.isfinite(rc["ppl"]) and rc["ntokens"] > 0
    # the .bin paths trained through LMBlockDataset (not the txt fallback)
    assert os.path.exists(os.path.join(root, "train.bin"))
