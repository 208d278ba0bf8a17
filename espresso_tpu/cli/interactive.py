"""Interactive recognition REPL (rebuild of fairseq_cli/interactive.py for
the ASR setting): read audio specs from stdin (or ``--input`` file), decode
each with the trained model, and print fairseq-style result lines:

    S-<i>   <input spec>
    H-<i>   <score> <hypothesis>

Each input line is ``[utt_id<TAB>]audio`` where audio is a wave path, a
Kaldi feats rxfilename (``ark:offset``), or a shell pipe ending in ``|``
(the manifest kinds of espresso/tasks/speech_recognition.py:144-159).
Lines are buffered into batches of ``--buffer-size`` before decoding
(reference interactive.py --buffer-size batching).

Usage:
    echo "/path/utt1.wav" | python -m espresso_tpu.cli.interactive \
        --config cfg.yaml checkpoint.save_dir=ckpts dataset.dict=dict.txt
"""

from __future__ import annotations

import json
import logging

from espresso_tpu.cli.logging_utils import setup_logging
import os
import re
import sys
import tempfile
from collections import OrderedDict
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from espresso_tpu.config import parse_config
from espresso_tpu.tasks import setup_task

logger = logging.getLogger("espresso_tpu.interactive")

_WAVE_EXT = re.compile(r"\.(wav|wv1|wv2|flac|sph|ogg)$", re.IGNORECASE)


def _kind(audio: str) -> str:
    if audio.rstrip().endswith("|"):
        return "command"
    if _WAVE_EXT.search(audio):
        return "wave"
    return "feat"


def _parse_lines(lines: List[str]) -> List[Tuple[str, str]]:
    out = []
    for i, line in enumerate(lines):
        line = line.rstrip("\n")
        if not line:
            continue
        if "\t" in line:
            utt_id, audio = line.split("\t", 1)
        else:
            utt_id, audio = f"utt{i:06d}", line
        out.append((utt_id, audio))
    return out


def main(argv=None) -> int:
    setup_logging(stream=sys.stderr)
    argv = list(argv if argv is not None else sys.argv[1:])
    input_path: Optional[str] = None
    buffer_size = 16
    if "--input" in argv:
        i = argv.index("--input")
        input_path = argv[i + 1]
        del argv[i : i + 2]
    if "--buffer-size" in argv:
        i = argv.index("--buffer-size")
        buffer_size = int(argv[i + 1])
        del argv[i : i + 2]
    cfg = parse_config(argv)
    from espresso_tpu.config import apply_saved_model_cfg

    apply_saved_model_cfg(cfg, argv)

    src = open(input_path, encoding="utf-8") if input_path else sys.stdin
    entries = _parse_lines(src.readlines())
    if input_path:
        src.close()
    if not entries:
        logger.warning("no input lines")
        return 0

    # materialize a manifest so the normal task/data path does the reading
    # (kind inference, fbank on wave/command inputs, bucketing)
    tmpdir = tempfile.mkdtemp(prefix="espresso_interactive_")
    manifest = OrderedDict()
    for utt_id, audio in entries:
        manifest[utt_id] = {_kind(audio): audio}
    with open(os.path.join(tmpdir, "interactive.json"), "w") as f:
        json.dump(manifest, f)
    if not cfg.dataset.dict or not os.path.isabs(cfg.dataset.dict):
        cfg.dataset.dict = os.path.join(
            cfg.dataset.data or ".", cfg.dataset.dict or "dict.txt"
        )
    cfg.dataset.data = tmpdir
    cfg.dataset.gen_subset = "interactive"
    cfg.dataset.batch_size = cfg.dataset.batch_size or buffer_size

    task = setup_task(cfg)
    ds = task.load_dataset("interactive")

    from espresso_tpu.cli.speech_recognize import (
        build_lm,
        load_model_for_decoding,
    )
    from espresso_tpu.train.trainer import make_device_feature_fn

    model, variables = load_model_for_decoding(cfg, task)
    lm, lm_variables = build_lm(cfg, task)
    generator = task.build_generator(
        model, cfg.generation, lm=lm, lm_weight=cfg.generation.lm_weight
    )
    if lm is not None and hasattr(generator, "lm_variables"):
        generator.lm_variables = lm_variables
    prepare_features = make_device_feature_fn(cfg)

    order = {u: i for i, (u, _) in enumerate(entries)}
    audio_of = dict(entries)
    n = 0
    itr = task.get_batch_iterator(
        ds, cfg.dataset.max_tokens, cfg.dataset.batch_size, shuffle=False
    ).next_epoch_itr()
    results = {}
    for group in itr:
        for i in range(group["prev_output_tokens"].shape[0]):
            mb = {
                k: v[i] for k, v in group.items() if isinstance(v, np.ndarray)
            }
            dec_mb = prepare_features(
                {k: jnp.asarray(v) for k, v in mb.items()}
            )
            dec_mb = {
                k: np.asarray(v) if hasattr(v, "shape") else v
                for k, v in dec_mb.items()
            }
            hypos = generator.decode(variables, dec_mb)
            for b, hyp_list in enumerate(hypos):
                if mb["weight"][b] <= 0:
                    continue
                utt_id = group["utt_ids"][i][b]
                results[utt_id] = [
                    (
                        float(h["score"]),
                        task.dictionary.tokens_to_sentence(
                            task.dictionary.string(h["tokens"])
                        ),
                    )
                    for h in hyp_list[: max(cfg.generation.nbest, 1)]
                ]
                n += 1
    # print in input order
    for utt_id, _ in entries:
        idx = order[utt_id]
        print(f"S-{idx}\t{audio_of[utt_id]}")
        for score, text in results.get(utt_id, []):
            print(f"H-{idx}\t{score:.4f}\t{text}")
    logger.info("recognized %d utterances", n)
    return n


if __name__ == "__main__":
    main(sys.argv[1:])
