"""Standalone validation CLI (rebuild of fairseq_cli/validate.py): load a
trained checkpoint, run the criterion over one or more splits, and print
the aggregated metrics (loss + WER/CER for E2E ASR tasks) without training.

Usage:
    python -m espresso_tpu.cli.validate --config cfg.yaml dataset.data=DIR \
        checkpoint.save_dir=ckpts dataset.valid_subset=valid,test
"""

from __future__ import annotations

import logging

from espresso_tpu.cli.logging_utils import setup_logging
import sys
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from espresso_tpu.config import parse_config
from espresso_tpu.criterions import build_criterion
from espresso_tpu.tasks import setup_task

logger = logging.getLogger("espresso_tpu.validate")


def main(argv=None) -> Dict[str, Dict[str, float]]:
    setup_logging()
    cfg = parse_config(argv if argv is not None else sys.argv[1:])
    from espresso_tpu.config import apply_saved_model_cfg

    apply_saved_model_cfg(cfg, argv if argv is not None else sys.argv[1:])
    task = setup_task(cfg)
    criterion = build_criterion(cfg.criterion, task)

    from espresso_tpu.cli.speech_recognize import load_model_for_decoding
    from espresso_tpu.cli.train import validate
    from espresso_tpu.train.trainer import make_valid_step

    # restore params from the checkpoint (gen_subset drives the shape probe;
    # point it at the first validation split)
    vs = cfg.dataset.valid_subset
    splits = [s for s in (vs.split(",") if isinstance(vs, str) else vs) if s]
    cfg.dataset.gen_subset = splits[0]
    model, variables = load_model_for_decoding(cfg, task)

    valid_step = make_valid_step(model, criterion, cfg)

    class _State:
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

    all_stats: Dict[str, Dict[str, float]] = {}
    for split in splits:
        ds = task.load_dataset(split)
        itr = task.get_batch_iterator(
            ds,
            cfg.dataset.max_tokens,
            cfg.dataset.batch_size,
            seed=cfg.common.seed,
            shuffle=False,
        ).next_epoch_itr()
        stats = validate(
            cfg, task, model, criterion, valid_step, _State, itr, None
        )
        logger.info(
            "%s | %s",
            split,
            " | ".join(f"{k} {v:.4g}" for k, v in sorted(stats.items())),
        )
        all_stats[split] = stats
    return all_stats


if __name__ == "__main__":
    main(sys.argv[1:])
