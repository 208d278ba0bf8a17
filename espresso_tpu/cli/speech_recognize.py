"""Recognition entry point (espresso-compatible outputs).

Rebuild of espresso/speech_recognize.py: loads a trained checkpoint, decodes
a test split with the task-selected generator (beam search / CTC /
transducer; LM fusion wiring :111-166), prints hypotheses, and writes
``decoded_results.txt``, ``wer``, ``cer``, ``aligned_results.txt``
(:341-387) plus decode throughput ("Recognized N utterances ...", :326-334).

Usage:
    python -m espresso_tpu.cli.speech_recognize --config cfg.yaml \
        dataset.data=DIR dataset.gen_subset=test generation.beam=10 \
        checkpoint.save_dir=ckpts [generation.lm_path=... generation.lm_weight=0.47]
"""

from __future__ import annotations

import json
import logging

from espresso_tpu.cli.logging_utils import setup_logging
import os
import sys
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from espresso_tpu.config import EspressoConfig, parse_config
from espresso_tpu.tasks import setup_task
from espresso_tpu.tools.wer import Scorer
from espresso_tpu.train.checkpoint import load_checkpoint_state
from espresso_tpu.train.trainer import build_optimizer, create_train_state

logger = logging.getLogger("espresso_tpu.recognize")


def load_model_for_decoding(cfg: EspressoConfig, task):
    """Build the model and restore checkpoint params (reference
    load_model_ensemble, checkpoint_utils.py:347)."""
    model = task.build_model()
    # init to get the shape tree, then restore
    ds = task.load_dataset(cfg.dataset.gen_subset)
    spec = ds.make_batch_specs(
        max_tokens=cfg.dataset.max_tokens,
        max_sentences=cfg.dataset.batch_size or 8,
        num_buckets=1,
        shuffle=False,
    )[0]
    sample = ds.collate(spec)
    optimizer, _ = build_optimizer(cfg)
    from espresso_tpu.train.trainer import make_device_feature_fn

    sample = make_device_feature_fn(cfg)(
        {
            k: jnp.asarray(v)
            for k, v in sample.items()
            if isinstance(v, np.ndarray)
        }
    )
    state = create_train_state(model, optimizer, sample, jax.random.PRNGKey(0))
    path = os.path.join(
        cfg.checkpoint.save_dir, cfg.checkpoint.restore_file
    )
    if os.path.exists(path):
        # raw restore: decode needs only params/batch_stats, and converted
        # checkpoints (cli/convert_espresso_checkpoint) carry an empty
        # opt_state a full-TrainState abstract restore would reject
        from espresso_tpu.train.checkpoint import load_raw_checkpoint

        raw = load_raw_checkpoint(path)
        ref_ts = jax.tree_util.tree_structure(state.params)
        got_ts = jax.tree_util.tree_structure(raw["params"])
        if ref_ts != got_ts:
            raise ValueError(
                f"checkpoint params tree does not match the model config:"
                f"\ncheckpoint={got_ts}\nmodel={ref_ts}"
            )
        state = state.replace(
            params=raw["params"],
            batch_stats=raw.get("batch_stats") or {},
        )
        logger.info("loaded checkpoint %s", path)
    else:
        logger.warning("no checkpoint at %s — decoding with random init", path)
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    if cfg.common.dtype == "bfloat16":
        # bf16 decode: eval-only, so the whole tree (incl. batchnorm
        # running stats, used elementwise) can drop to bf16; softmaxes and
        # beam scores stay fp32 inside the decoders
        from espresso_tpu.train.trainer import cast_floats

        variables = cast_floats(variables, jnp.bfloat16)
    return model, variables


def _load_lm_checkpoint(ckpt_dir: str):
    """Load an LM trained by this framework: checkpoint dir with
    model_cfg.json (written by the train CLI) and checkpoint_last/state."""
    import orbax.checkpoint as ocp

    from espresso_tpu.registry import ARCHITECTURES, MODELS

    with open(os.path.join(ckpt_dir, "model_cfg.json")) as f:
        blob = json.load(f)
    name = blob.get("name") or "lstm_lm_espresso"
    base = ARCHITECTURES[name][0] if name in ARCHITECTURES else name
    cfg_cls = MODELS.config_class(base)
    cfg_kwargs = {
        k: tuple(v) if isinstance(v, list) else v
        for k, v in blob["config"].items()
    }
    lm_cfg = cfg_cls(**cfg_kwargs)
    lm = MODELS.build(base, lm_cfg)
    state_path = os.path.join(
        os.path.abspath(ckpt_dir), "checkpoint_last", "state"
    )
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(state_path)
    return lm, {"params": state["params"]}, lm_cfg


def build_lm(cfg: EspressoConfig, task):
    """LM fusion wiring (reference speech_recognize.py:111-166):
      * subword LM only  -> shallow fusion inside the beam search
      * word LM only     -> TensorizedLookaheadLanguageModel
      * subword + word   -> MultiLevelLanguageModel
    """
    gen = cfg.generation
    sub_lm = sub_vars = word_lm = word_vars = None
    word_dict = None
    if gen.lm_path:
        sub_lm, sub_vars, _ = _load_lm_checkpoint(gen.lm_path)
    if gen.word_lm_path:
        word_lm, word_vars, _ = _load_lm_checkpoint(gen.word_lm_path)
        word_dict_path = os.path.join(gen.word_lm_path, "dict.txt")
        from espresso_tpu.data.dictionary import AsrDictionary

        word_dict = AsrDictionary.load(word_dict_path)
    if word_lm is not None and sub_lm is not None:
        from espresso_tpu.models.lookahead_lm import MultiLevelLanguageModel

        lm = MultiLevelLanguageModel(
            word_lm,
            word_vars,
            sub_lm,
            sub_vars,
            word_dict,
            task.dictionary,
            subwordlm_weight=gen.subwordlm_weight,
            oov_penalty=gen.oov_penalty,
            open_vocab=gen.open_vocab,
        )
        return lm, None
    if word_lm is not None:
        from espresso_tpu.models.lookahead_lm import (
            TensorizedLookaheadLanguageModel,
        )

        lm = TensorizedLookaheadLanguageModel(
            word_lm,
            word_vars,
            word_dict,
            task.dictionary,
            oov_penalty=gen.oov_penalty,
            open_vocab=gen.open_vocab,
        )
        return lm, None
    if sub_lm is not None:
        return sub_lm, sub_vars
    return None, None


def main(argv=None) -> Dict[str, float]:
    setup_logging()
    cfg = parse_config(argv if argv is not None else sys.argv[1:])
    from espresso_tpu.config import apply_saved_model_cfg

    apply_saved_model_cfg(cfg, argv if argv is not None else sys.argv[1:])
    task = setup_task(cfg)
    ds = task.load_dataset(cfg.dataset.gen_subset)
    model, variables = load_model_for_decoding(cfg, task)
    lm, lm_variables = build_lm(cfg, task)
    generator = task.build_generator(
        model, cfg.generation, lm=lm, lm_weight=cfg.generation.lm_weight
    )
    if lm is not None and hasattr(generator, "lm_variables"):
        generator.lm_variables = lm_variables

    itr = task.get_batch_iterator(
        ds,
        cfg.dataset.max_tokens,
        cfg.dataset.batch_size or 8,
        shuffle=False,
    ).next_epoch_itr()

    from espresso_tpu.train.trainer import make_device_feature_fn

    prepare_features = make_device_feature_fn(cfg)
    scorer = Scorer(task.dictionary, cfg.generation.wer_output_filter)
    attn_store: Dict[str, Any] = {}
    hyp_strs: Dict[str, str] = {}

    def collect_attention(dec_mb, hypos, utt_ids):
        """Exact attention for the 1-best hypothesis by teacher-forcing it
        through the decoder (reference --print-alignment attention plots,
        speech_recognize.py:265-314)."""
        if not hasattr(model, "decode_sequence"):
            return
        eos = task.dictionary.eos()
        for b, hyp_list in enumerate(hypos):
            toks = hyp_list[0]["tokens"]
            if dec_mb["weight"][b] <= 0 or len(toks) == 0:
                continue
            prev = np.concatenate([[eos], toks]).astype(np.int32)
            enc = model.apply(
                variables,
                jnp.asarray(dec_mb["src_frames"][b : b + 1]),
                jnp.asarray(dec_mb["src_lengths"][b : b + 1]),
                method="encode",
            )
            out = model.apply(
                variables,
                jnp.asarray(prev[None]),
                enc,
                method="decode_sequence",
            )
            attn = out[1][1] if isinstance(out, tuple) else None
            if attn is not None:
                attn_store[utt_ids[b]] = np.asarray(attn[0])

    num_utts = 0
    num_tokens = 0
    # multi-chip serving: shard each decode batch over the data axis
    # (replaces the reference's per-process --num-shards/--shard-id split,
    # speech_recognize.py:178-192, with one GSPMD sharding annotation)
    decode_mesh = None
    if jax.device_count() > 1 and cfg.distributed.data_parallel_size != 1:
        from espresso_tpu.parallel.mesh import make_mesh

        decode_mesh = make_mesh(data_parallel_size=-1, model_parallel_size=1)
        logger.info(
            "data-parallel decode over %d devices", decode_mesh.devices.size
        )

    t0 = time.perf_counter()
    has_ref = False
    # depth-1 decode pipeline: launch the next minibatch's device search
    # before collecting (device->host transfer + host scoring of) the
    # previous one — the transfer and the Python-side WER bookkeeping
    # overlap the next batch's compute (generators without decode_async
    # degrade to the synchronous loop)
    can_pipeline = hasattr(generator, "decode_async")
    pending = None

    def consume(item):
        nonlocal num_utts, num_tokens, has_ref
        handle, mb, dec_mb, utt_ids = item
        hypos = generator.collect(handle) if can_pipeline else handle
        if cfg.generation.print_alignment:
            collect_attention(dec_mb, hypos, utt_ids)
        for b, hyp_list in enumerate(hypos):
            if mb["weight"][b] <= 0:
                continue
            num_utts += 1
            best = hyp_list[0]
            num_tokens += len(best["tokens"])
            hyp_str = task.dictionary.tokens_to_sentence(
                task.dictionary.string(best["tokens"])
            )
            if cfg.generation.print_alignment:
                hyp_strs[utt_ids[b]] = hyp_str
            scorer.add_prediction(utt_ids[b], hyp_str)
            if mb["tgt_lengths"][b] > 0:
                has_ref = True
                tgt = mb["target"][b][: mb["tgt_lengths"][b]]
                ref_str = task.dictionary.tokens_to_sentence(
                    task.dictionary.string(
                        tgt, extra_symbols_to_ignore={task.dictionary.pad()}
                    )
                )
                scorer.add_evaluation(utt_ids[b], ref_str, hyp_str)

    for group in itr:
        for i in range(group["prev_output_tokens"].shape[0]):
            mb = {
                k: v[i] for k, v in group.items() if isinstance(v, np.ndarray)
            }
            dec_mb = prepare_features({k: jnp.asarray(v) for k, v in mb.items()})
            dec_mb = {
                k: np.asarray(v) if hasattr(v, "shape") else v
                for k, v in dec_mb.items()
            }
            dec_vars = variables
            B_mb = dec_mb["src_lengths"].shape[0]
            if decode_mesh is not None and B_mb % decode_mesh.devices.size == 0:
                from espresso_tpu.decode.api import shard_for_decode

                dec_vars, dec_mb = shard_for_decode(
                    decode_mesh, variables, dec_mb
                )
            utt_ids = group["utt_ids"][i]
            if can_pipeline:
                handle = generator.decode_async(dec_vars, dec_mb)
            else:
                handle = generator.decode(dec_vars, dec_mb)
            if pending is not None:
                consume(pending)
            pending = (handle, mb, dec_mb, utt_ids)
    if pending is not None:
        consume(pending)
    elapsed = time.perf_counter() - t0
    logger.info(
        "Recognized %d utterances in %.1fs (%.2f sentences/s, %.2f tokens/s)",
        num_utts,
        elapsed,
        num_utts / max(elapsed, 1e-6),
        num_tokens / max(elapsed, 1e-6),
    )

    results: Dict[str, float] = {"num_utts": num_utts}
    out_dir = cfg.generation.results_path or cfg.checkpoint.save_dir
    os.makedirs(out_dir, exist_ok=True)
    if attn_store:
        np.savez(os.path.join(out_dir, "attn.npz"), **attn_store)
        # human-readable heatmaps next to the exact matrices (reference
        # speech_recognize.py:305-314 -> tools/utils.py plot_attention)
        from espresso_tpu.tools.plot import plot_attention

        plot_dir = os.path.join(out_dir, "attn_plots")
        for uid, attn in attn_store.items():
            plot_attention(attn, hyp_strs.get(uid, ""), uid, plot_dir)
        logger.info(
            "saved %d attention matrices to attn.npz (+ plots in %s)",
            len(attn_store),
            plot_dir,
        )
    with open(os.path.join(out_dir, "decoded_results.txt"), "w") as f:
        f.write(scorer.results)
    if has_ref:
        results["wer"] = scorer.wer()
        results["cer"] = scorer.cer()
        with open(os.path.join(out_dir, "wer"), "w") as f:
            f.write(
                f"WER: {scorer.wer():.2f}%, "
                f"{scorer.tot_word_error()} / {scorer.tot_word_count()}\n"
            )
        with open(os.path.join(out_dir, "cer"), "w") as f:
            f.write(
                f"CER: {scorer.cer():.2f}%, "
                f"{scorer.tot_char_error()} / {scorer.tot_char_count()}\n"
            )
        with open(os.path.join(out_dir, "aligned_results.txt"), "w") as f:
            f.write(scorer.aligned_results)
        logger.info("WER: %.2f%%  CER: %.2f%%", scorer.wer(), scorer.cer())
    return results


if __name__ == "__main__":
    main()
