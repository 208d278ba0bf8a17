"""LM perplexity evaluation (fairseq_cli/eval_lm.py equivalent).

Used by the reference recipes' LM stage (examples/asr_librispeech/run.sh
:195-207). Computes token-level perplexity of {gen_subset}.txt under a
trained LM checkpoint.

Usage:
    python -m espresso_tpu.cli.eval_lm dataset.data=DIR \
        task.name=language_modeling_for_asr model.name=lstm_lm_espresso \
        checkpoint.save_dir=lm_ckpts dataset.gen_subset=test
"""

from __future__ import annotations

import logging

from espresso_tpu.cli.logging_utils import setup_logging
import math
import sys

import jax
import jax.numpy as jnp
import numpy as np

from espresso_tpu.config import parse_config
from espresso_tpu.criterions import build_criterion
from espresso_tpu.tasks import setup_task
from espresso_tpu.train.checkpoint import load_checkpoint_state
from espresso_tpu.train.trainer import (
    build_optimizer,
    create_train_state,
    make_valid_step,
)

logger = logging.getLogger("espresso_tpu.eval_lm")


def main(argv=None):
    setup_logging()
    cfg = parse_config(argv if argv is not None else sys.argv[1:])
    from espresso_tpu.config import apply_saved_model_cfg

    apply_saved_model_cfg(cfg, argv if argv is not None else sys.argv[1:])
    cfg.criterion.name = "cross_entropy_v2"
    task = setup_task(cfg)
    ds = task.load_dataset(cfg.dataset.gen_subset)
    model = task.build_model()
    criterion = build_criterion(cfg.criterion, task)

    specs = ds.make_batch_specs(
        max_tokens=cfg.dataset.max_tokens,
        max_sentences=cfg.dataset.batch_size or 32,
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
    import os

    path = os.path.join(cfg.checkpoint.save_dir, cfg.checkpoint.restore_file)
    if os.path.exists(path):
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state
        )
        state, _ = load_checkpoint_state(path, abstract)
        logger.info("loaded %s", path)

    valid_step = jax.jit(make_valid_step(model, criterion, cfg))
    total_nll = 0.0
    total_tokens = 0
    for spec in specs:
        batch = ds.collate(spec)
        stats = valid_step(
            state,
            {k: jnp.asarray(v) for k, v in batch.items() if isinstance(v, np.ndarray)},
        )
        total_nll += float(stats["nll_loss"])
        total_tokens += float(stats["ntokens"])
    nll = total_nll / max(total_tokens, 1)
    ppl = math.exp(min(nll, 50))
    logger.info(
        "Evaluated %d tokens: avg nll %.4f, perplexity %.2f",
        int(total_tokens),
        nll,
        ppl,
    )
    return {"nll_loss": nll, "ppl": ppl, "ntokens": total_tokens}


if __name__ == "__main__":
    main()
