"""Average model parameters over multiple checkpoints.

Rebuild of scripts/average_checkpoints.py (used by the reference swbd recipe):
averages the param pytrees of N checkpoints into a new checkpoint directory.

Usage:
    python -m espresso_tpu.cli.average_checkpoints \
        --inputs ckpt/checkpoint28 ckpt/checkpoint29 ckpt/checkpoint30 \
        --output ckpt/checkpoint_avg
    # or: --inputs ckpt --num-epoch-checkpoints 5  (last 5 epoch ckpts)
"""

from __future__ import annotations

import argparse
import json
import logging

from espresso_tpu.cli.logging_utils import setup_logging
import os
import re
import sys

import jax
import numpy as np

setup_logging()
logger = logging.getLogger("espresso_tpu.average_checkpoints")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--inputs", nargs="+", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--num-epoch-checkpoints", type=int, default=None)
    args = p.parse_args(argv)

    paths = args.inputs
    if args.num_epoch_checkpoints is not None:
        assert len(paths) == 1, "--num-epoch-checkpoints expects one directory"
        root = paths[0]
        epochs = sorted(
            int(m.group(1))
            for name in os.listdir(root)
            if (m := re.fullmatch(r"checkpoint(\d+)", name))
        )
        paths = [
            os.path.join(root, f"checkpoint{e}")
            for e in epochs[-args.num_epoch_checkpoints :]
        ]
    logger.info("averaging %d checkpoints: %s", len(paths), paths)

    import orbax.checkpoint as ocp

    acc = None
    host_state = {}
    with ocp.StandardCheckpointer() as ckptr:
        for path in paths:
            state = ckptr.restore(os.path.join(os.path.abspath(path), "state"))
            hs_path = os.path.join(path, "host_state.json")
            if os.path.exists(hs_path):
                host_state = json.load(open(hs_path))
            params = state["params"]
            if acc is None:
                template = state
                acc = jax.tree_util.tree_map(
                    lambda x: np.asarray(x, np.float64), params
                )
            else:
                acc = jax.tree_util.tree_map(
                    lambda a, x: a + np.asarray(x, np.float64), acc, params
                )
        avg = jax.tree_util.tree_map(
            lambda a: (a / len(paths)).astype(np.float32), acc
        )
        template["params"] = avg
        out = os.path.abspath(args.output)
        ckptr.save(os.path.join(out, "state"), template)
    with open(os.path.join(out, "host_state.json"), "w") as f:
        json.dump(host_state, f)
    logger.info("wrote averaged checkpoint to %s", args.output)


if __name__ == "__main__":
    main()
