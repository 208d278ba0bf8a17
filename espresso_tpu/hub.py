"""Hub-style convenience API (fairseq/hub_utils.py equivalent).

``from_pretrained(ckpt_dir, data_dir)`` loads a trained checkpoint (model
reconstructed from the saved ``model_cfg.json``, like
GeneratorHubInterface's saved-cfg restore) and returns an interface whose
``transcribe()`` accepts wave paths / Kaldi rxfilenames / feature arrays and
returns text.

    import espresso_tpu.hub as hub
    asr = hub.from_pretrained("ckpts", data_dir="data", beam=10)
    print(asr.transcribe(["utt1.wav", "utt2.wav"]))
"""

from __future__ import annotations

import json
import os
import tempfile
from collections import OrderedDict
from typing import Dict, List, Optional, Sequence, Union

import jax.numpy as jnp
import numpy as np


class EspressoHubInterface:
    def __init__(self, cfg, task, model, variables, generator, prepare_features):
        self.cfg = cfg
        self.task = task
        self.model = model
        self.variables = variables
        self.generator = generator
        self._prepare = prepare_features

    @property
    def dictionary(self):
        return self.task.dictionary

    def transcribe(
        self, inputs: Sequence[str], nbest: int = 1
    ) -> Union[List[str], List[List[str]]]:
        """inputs: wave paths / 'ark:offset' feature rxfilenames. Returns the
        1-best transcript per input (or n-best lists when nbest > 1)."""
        import shutil

        from espresso_tpu.cli.interactive import _kind

        tmpdir = tempfile.mkdtemp(prefix="espresso_hub_")
        manifest = OrderedDict()
        ids = []
        for i, audio in enumerate(inputs):
            utt = f"hub_utt{i:06d}"
            ids.append(utt)
            manifest[utt] = {_kind(audio): audio}
        with open(os.path.join(tmpdir, "hub.json"), "w") as f:
            json.dump(manifest, f)
        saved_data = self.cfg.dataset.data
        self.task.datasets.pop("hub", None)
        self.cfg.dataset.data = tmpdir
        results: Dict[str, List[str]] = {}
        try:
            try:
                ds = self.task.load_dataset("hub")
            finally:
                self.cfg.dataset.data = saved_data
            itr = self.task.get_batch_iterator(
                ds,
                self.cfg.dataset.max_tokens,
                self.cfg.dataset.batch_size or 8,
                shuffle=False,
            ).next_epoch_itr()
            for group in itr:
                for i in range(group["prev_output_tokens"].shape[0]):
                    mb = {
                        k: v[i]
                        for k, v in group.items()
                        if isinstance(v, np.ndarray)
                    }
                    dec = self._prepare(
                        {k: jnp.asarray(v) for k, v in mb.items()}
                    )
                    dec = {
                        k: np.asarray(v) if hasattr(v, "shape") else v
                        for k, v in dec.items()
                    }
                    hypos = self.generator.decode(self.variables, dec)
                    for b, hyp_list in enumerate(hypos):
                        if mb["weight"][b] <= 0:
                            continue
                        utt_id = group["utt_ids"][i][b]
                        results[utt_id] = [
                            self.dictionary.tokens_to_sentence(
                                self.dictionary.string(h["tokens"])
                            )
                            for h in hyp_list[:nbest]
                        ]
        finally:
            # an exception mid-decode must not leak the tmpdir or leave the
            # 'hub' dataset cached on the task
            shutil.rmtree(tmpdir, ignore_errors=True)
            self.task.datasets.pop("hub", None)
        if nbest == 1:
            return [results.get(u, [""])[0] for u in ids]
        return [results.get(u, []) for u in ids]


def from_pretrained(
    ckpt_dir: str,
    data_dir: Optional[str] = None,
    dict_path: Optional[str] = None,
    beam: int = 1,
    **overrides,
) -> EspressoHubInterface:
    """Build a decode-ready interface from a train-CLI checkpoint directory.
    ``overrides`` are dotted config keys (e.g. generation.lm_weight=0.4)."""
    from espresso_tpu.cli.speech_recognize import (
        build_lm,
        load_model_for_decoding,
    )
    from espresso_tpu.config import apply_saved_model_cfg, parse_config
    from espresso_tpu.tasks import setup_task
    from espresso_tpu.train.trainer import make_device_feature_fn

    argv = [f"{k}={v}" for k, v in overrides.items()]
    cfg = parse_config(argv)
    cfg.checkpoint.save_dir = ckpt_dir
    cfg.generation.beam = beam
    if data_dir:
        cfg.dataset.data = data_dir
    if dict_path:
        cfg.dataset.dict = dict_path
    elif not cfg.dataset.dict:
        for cand in (
            os.path.join(ckpt_dir, "dict.txt"),
            os.path.join(cfg.dataset.data or ".", "dict.txt"),
        ):
            if os.path.exists(cand):
                cfg.dataset.dict = cand
                break
    apply_saved_model_cfg(cfg, argv)
    task = setup_task(cfg)
    model, variables = load_model_for_decoding(cfg, task)
    lm, lm_variables = build_lm(cfg, task)
    generator = task.build_generator(
        model, cfg.generation, lm=lm, lm_weight=cfg.generation.lm_weight
    )
    if lm is not None and hasattr(generator, "lm_variables"):
        generator.lm_variables = lm_variables
    return EspressoHubInterface(
        cfg, task, model, variables, generator, make_device_feature_fn(cfg)
    )
