"""Hybrid HMM-DNN path: chunked xent training + posterior dumping."""

import json
import os
from collections import OrderedDict

import numpy as np
import pytest

from espresso_tpu.data import kaldi_io

NUM_PDF = 10


def make_hybrid_corpus(root, split, num_utts=12, feat_dim=8, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    feat_ark = os.path.join(root, f"{split}_feats.ark")
    ali_ark = os.path.join(root, f"{split}_ali.ark")
    manifest = OrderedDict()
    with open(feat_ark, "wb") as ff, open(ali_ark, "wb") as fa:
        for i in range(num_utts):
            utt = f"{split}_utt{i:03d}"
            T = int(rng.integers(40, 80))
            # make features informative of the alignment labels
            ali = rng.integers(0, NUM_PDF, size=T).astype(np.int32)
            mat = rng.standard_normal((T, feat_dim)).astype(np.float32) * 0.1
            mat[:, 0] = ali / NUM_PDF  # leak the label
            ff.write((utt + " ").encode())
            foff = ff.tell()
            kaldi_io.write_mat(ff, mat)
            fa.write((utt + " ").encode())
            aoff = fa.tell()
            kaldi_io.write_vec_int(fa, ali)
            manifest[utt] = {
                "feat": f"{feat_ark}:{foff}",
                "alignment": f"{ali_ark}:{aoff}",
                "utt2num_frames": str(T),
            }
    with open(os.path.join(root, f"{split}.json"), "w") as f:
        json.dump(manifest, f)


ARGS = [
    "task.name=speech_recognition_hybrid",
    f"task.num_targets={NUM_PDF}",
    "task.chunk_width=20",
    "task.chunk_left_context=5",
    "task.chunk_right_context=5",
    "dataset.feat_dim=8",
    "dataset.batch_size=4",
    "model.name=speech_tdnn",
    "model.hidden_sizes=(16,16)",
    "model.kernel_sizes=(3,3)",
    "model.strides=(1,1)",
    "model.dilations=(1,1)",
    "model.norm_type=layer",
    "criterion.name=subsampled_cross_entropy_with_accuracy",
    "optimization.lr=0.01",
    "optimization.clip_norm=2.0",
    "common.log_interval=20",
    "common.dtype=float32",
]


def test_hybrid_chunked_training_and_dump(tmp_path):
    from espresso_tpu.cli.dump_posteriors import main as dump_main
    from espresso_tpu.cli.train import main as train_main

    d = str(tmp_path)
    make_hybrid_corpus(d, "train", seed=0)
    make_hybrid_corpus(d, "valid", num_utts=4, seed=1)
    make_hybrid_corpus(d, "test", num_utts=4, seed=2)

    args = [f"dataset.data={d}", f"checkpoint.save_dir={d}/ckpt"] + ARGS
    stats = train_main(args + ["optimization.max_epoch=4"])
    assert np.isfinite(stats["loss"])
    assert stats["loss"] < np.log(NUM_PDF)  # learned something from the leak

    out_ark = os.path.join(d, "post.ark")
    n = dump_main(
        args
        + [
            "dataset.gen_subset=test",
            f"generation.results_path={out_ark}",
        ]
    )
    assert n == 4
    mats = dict(kaldi_io.read_mat_ark(out_ark))
    assert len(mats) == 4
    for utt, mat in mats.items():
        assert mat.shape[1] == NUM_PDF
        assert np.isfinite(mat).all()
        # log-probs: rows should logsumexp to ~0 (no prior subtracted)
        lse = np.log(np.exp(mat).sum(axis=1))
        assert np.abs(lse).max() < 1e-3


def test_hybrid_with_state_prior(tmp_path):
    from espresso_tpu.cli.dump_posteriors import main as dump_main
    from espresso_tpu.cli.train import main as train_main

    d = str(tmp_path)
    make_hybrid_corpus(d, "train", num_utts=6, seed=0)
    make_hybrid_corpus(d, "valid", num_utts=2, seed=1)
    make_hybrid_corpus(d, "test", num_utts=2, seed=2)
    prior = np.full(NUM_PDF, 1.0 / NUM_PDF, np.float32)
    prior_path = os.path.join(d, "prior.npy")
    np.save(prior_path, prior)

    args = [f"dataset.data={d}", f"checkpoint.save_dir={d}/ckpt"] + ARGS
    train_main(args + ["optimization.max_epoch=1"])
    out_ark = os.path.join(d, "post_prior.ark")
    n = dump_main(
        args
        + [
            "dataset.gen_subset=test",
            f"generation.results_path={out_ark}",
            f"task.initial_state_prior_path={prior_path}",
        ]
    )
    assert n == 2
    mats = dict(kaldi_io.read_mat_ark(out_ark))
    # with uniform prior subtracted, rows logsumexp to log(NUM_PDF)
    for mat in mats.values():
        lse = np.log(np.exp(mat - np.log(NUM_PDF)).sum(axis=1))
        assert np.abs(lse).max() < 1e-3


def test_chunked_dump_matches_whole(tmp_path):
    """Chunk-wise dumped posteriors re-stitched must equal a whole-utterance
    dump wherever the TDNN receptive field (radius 2 here) fits inside the
    chunk context (5 frames): i.e. everywhere except the utterance edges,
    which differ by replicate- vs zero-padding."""
    from espresso_tpu.cli.dump_posteriors import main as dump_main
    from espresso_tpu.cli.train import main as train_main

    d = str(tmp_path)
    make_hybrid_corpus(d, "train", num_utts=6, seed=0)
    make_hybrid_corpus(d, "valid", num_utts=2, seed=1)
    make_hybrid_corpus(d, "test", num_utts=2, seed=2)

    args = [f"dataset.data={d}", f"checkpoint.save_dir={d}/ckpt"] + ARGS
    train_main(args + ["optimization.max_epoch=1"])
    chunked_ark = os.path.join(d, "post_chunked.ark")
    whole_ark = os.path.join(d, "post_whole.ark")
    dump_main(args + ["dataset.gen_subset=test",
                      f"generation.results_path={chunked_ark}"])
    dump_main(args + ["dataset.gen_subset=test", "task.chunk_width=0",
                      f"generation.results_path={whole_ark}"])
    chunked = dict(kaldi_io.read_mat_ark(chunked_ark))
    whole = dict(kaldi_io.read_mat_ark(whole_ark))
    assert set(chunked) == set(whole)
    radius = 2
    for utt in whole:
        assert chunked[utt].shape == whole[utt].shape, utt
        err = np.abs(chunked[utt][radius:-radius] - whole[utt][radius:-radius]).max()
        assert err < 1e-4, (utt, err)
