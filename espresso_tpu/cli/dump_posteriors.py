"""Dump hybrid-model posteriors for Kaldi lattice decoding.

Rebuild of espresso/dump_posteriors.py: forward the hybrid model over a test
split, subtract the log state prior (:143-146; prior from file or the task's
updated prior :83-115), and write Kaldi matrices — to a plain ark, or into a
``| copy-matrix ark:- ark:-`` style pipe consumed by Kaldi's
``latgen-faster-mapped`` (examples/asr_wsj/run_chain_e2e.sh:218-222).

Supports chunked re-stitching for chunk-trained models: whole utterances are
decoded in overlapping chunks and the label windows are concatenated.

Usage:
    python -m espresso_tpu.cli.dump_posteriors dataset.data=DIR \
        task.name=speech_recognition_hybrid task.num_targets=N \
        checkpoint.save_dir=ckpts \
        generation.results_path="ark:| copy-matrix ark:- ark:out.ark"
"""

from __future__ import annotations

import logging

from espresso_tpu.cli.logging_utils import setup_logging
import os
import sys
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from espresso_tpu.config import parse_config
from espresso_tpu.data import kaldi_io
from espresso_tpu.tasks import setup_task
from espresso_tpu.train.checkpoint import load_checkpoint_state
from espresso_tpu.train.trainer import build_optimizer, create_train_state

logger = logging.getLogger("espresso_tpu.dump_posteriors")


def main(argv=None):
    setup_logging()
    cfg = parse_config(argv if argv is not None else sys.argv[1:])
    from espresso_tpu.config import apply_saved_model_cfg

    apply_saved_model_cfg(cfg, argv if argv is not None else sys.argv[1:])
    # chunk-trained models are dumped chunk-by-chunk and re-stitched
    # (reference dump_posteriors.py:185-218); the dataset itself loads whole
    # utterances
    chunk_w = cfg.task.chunk_width or 0
    chunk_left = cfg.task.chunk_left_context or 0
    chunk_right = cfg.task.chunk_right_context or 0
    cfg.task.chunk_width = 0
    task = setup_task(cfg)
    ds = task.load_dataset(cfg.dataset.gen_subset)
    model = task.build_model()

    specs = ds.make_batch_specs(
        max_tokens=cfg.dataset.max_tokens or 16000,
        max_sentences=cfg.dataset.batch_size,
        shuffle=False,
    )
    sample = ds.collate(specs[0])
    optimizer, _ = build_optimizer(cfg)
    state = create_train_state(
        model,
        optimizer,
        {k: jnp.asarray(v) for k, v in sample.items() if isinstance(v, np.ndarray)},
        jax.random.PRNGKey(0),
    )
    path = os.path.join(cfg.checkpoint.save_dir, cfg.checkpoint.restore_file)
    if os.path.exists(path):
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state
        )
        state, _ = load_checkpoint_state(path, abstract)
        logger.info("loaded %s", path)
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    if cfg.common.dtype == "bfloat16":
        from espresso_tpu.train.trainer import cast_floats

        variables = cast_floats(variables, jnp.bfloat16)

    # state prior (reference :83-115)
    log_prior = None
    if cfg.task.initial_state_prior_path:
        prior = np.load(cfg.task.initial_state_prior_path)
        log_prior = jnp.asarray(np.log(np.maximum(prior, 1e-8)))
    elif task.state_prior is not None:
        log_prior = jnp.asarray(
            np.log(np.maximum(np.asarray(task.state_prior), 1e-8))
        )

    @jax.jit
    def forward(variables, frames, lengths):
        logits, enc = model.apply(variables, frames, lengths)
        lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        if log_prior is not None:
            lprobs = lprobs - log_prior
        return lprobs, enc.src_lengths

    @jax.jit
    def forward_chunks(variables, frames):
        # frames: [C, left + w + right, F] -> central label window lprobs
        lengths = jnp.full((frames.shape[0],), frames.shape[1], jnp.int32)
        logits, _ = model.apply(variables, frames, lengths)
        lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        lprobs = jax.lax.dynamic_slice_in_dim(lprobs, chunk_left, chunk_w, 1)
        if log_prior is not None:
            lprobs = lprobs - log_prior
        return lprobs

    def dump_chunked(f, utt_id, mat):
        """Sequential chunks with replicate-padded context, batched in one
        forward; label windows concatenate back to the whole utterance."""
        L = len(mat)
        starts = list(range(0, max(L, 1), chunk_w))
        chunks = []
        for s in starts:
            begin = max(0, s - chunk_left)
            end = s + chunk_w + chunk_right
            src = mat[begin:end]
            lp_pad = max(0, chunk_left - s)
            rp_pad = max(0, end - L)
            if lp_pad or rp_pad:
                src = np.concatenate(
                    [
                        np.repeat(src[:1], lp_pad, 0),
                        src,
                        np.repeat(src[-1:], rp_pad, 0),
                    ]
                )
            chunks.append(src)
        C = len(chunks)
        # pad chunk count to a multiple of 8 to bound compiled shapes
        C_pad = ((C + 7) // 8) * 8
        frames = np.zeros((C_pad,) + chunks[0].shape, np.float32)
        frames[:C] = np.stack(chunks)
        lprobs = np.asarray(forward_chunks(variables, jnp.asarray(frames)))
        whole = lprobs[:C].reshape(C * chunk_w, -1)[:L]
        kaldi_io.write_mat(f, whole, key=utt_id)

    wx = cfg.generation.results_path or "posteriors.ark"
    f = kaldi_io.open_or_fd(wx.lstrip("ark:") if wx.startswith("ark:") else wx, "wb")
    num = 0
    try:
        if chunk_w > 0:
            for spec in specs:
                batch = ds.collate(spec)
                for b in range(len(batch["utt_ids"])):
                    if batch["weight"][b] <= 0:
                        continue
                    L = int(batch["src_lengths"][b])
                    dump_chunked(
                        f,
                        batch["utt_ids"][b],
                        batch["src_frames"][b][:L],
                    )
                    num += 1
        else:
            for spec in specs:
                batch = ds.collate(spec)
                lprobs, out_lengths = forward(
                    variables,
                    jnp.asarray(batch["src_frames"]),
                    jnp.asarray(batch["src_lengths"]),
                )
                lprobs = np.asarray(lprobs)
                out_lengths = np.asarray(out_lengths)
                for b in range(lprobs.shape[0]):
                    if batch["weight"][b] <= 0:
                        continue
                    kaldi_io.write_mat(
                        f, lprobs[b, : out_lengths[b]], key=batch["utt_ids"][b]
                    )
                    num += 1
    finally:
        f.close()
    logger.info("dumped posteriors for %d utterances to %s", num, wx)
    return num


if __name__ == "__main__":
    main()
