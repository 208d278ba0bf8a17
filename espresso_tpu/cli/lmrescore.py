"""Rescore a lattice archive with ARPA n-gram LMs.

Rebuild of the reference's lattice LM-rescoring stages
(examples/asr_wsj/run_chain_e2e.sh:228-231):

  * ``steps/lmrescore.sh --mode 3`` — replace the decoding LM with a bigger
    one: compose with the OLD G at lm-scale -1 (subtracting its scores),
    then with the NEW G at +1. Here: ``--old-arpa`` + ``--arpa``.
  * ``steps/lmrescore_const_arpa.sh`` — same, the new LM held as a
    const-arpa; the in-tree ArpaLM automaton plays both roles.

The composition runs on word labels against the deterministic backoff
automaton (tools/arpa.ArpaLM), keeping graph and acoustic costs separate —
downstream sweep scoring (cli.score_lattices) applies unchanged.

Usage:
    python -m espresso_tpu.cli.lmrescore \
        --lattices exp/decode/lat.npz --words graph/words.txt \
        --old-arpa lm_tgpr.arpa --arpa lm_fg.arpa \
        --out exp/decode_fg/lat.npz [--lm-scale 1.0]
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

from espresso_tpu.cli.logging_utils import setup_logging

logger = logging.getLogger("espresso_tpu.lmrescore")


def main(argv=None):
    setup_logging()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--lattices", required=True, help="input npz archive")
    p.add_argument("--words", required=True, help="words.txt symbol table")
    p.add_argument(
        "--old-arpa",
        help="LM to SUBTRACT (the one compiled into the decoding graph); "
        "omit to only add --arpa scores",
    )
    p.add_argument("--arpa", required=True, help="LM to add")
    p.add_argument("--lm-scale", type=float, default=1.0)
    p.add_argument("--out", required=True, help="output npz archive")
    args = p.parse_args(argv if argv is not None else sys.argv[1:])

    from espresso_tpu.cli.latgen import load_words
    from espresso_tpu.tools.arpa import ArpaLM
    from espresso_tpu.tools.lattice import (
        lmrescore,
        read_lattice_archive,
        write_lattice_archive,
    )

    lats = read_lattice_archive(args.lattices)
    id2word = load_words(args.words)
    old_lm = ArpaLM.load(args.old_arpa) if args.old_arpa else None
    new_lm = ArpaLM.load(args.arpa)
    out = {}
    for utt, lat in lats.items():
        if old_lm is not None:
            lat = lmrescore(lat, old_lm, id2word, lm_scale=-args.lm_scale)
        out[utt] = lmrescore(lat, new_lm, id2word, lm_scale=args.lm_scale)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    write_lattice_archive(args.out, out)
    logger.info(
        "rescored %d lattices (%s -> %s)", len(out),
        args.old_arpa or "none", args.arpa,
    )
    return len(out)


if __name__ == "__main__":
    main()
