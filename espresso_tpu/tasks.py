"""Tasks: dataset/model/criterion wiring.

Rebuild of espresso/tasks/speech_recognition.py
(`SpeechRecognitionEspressoTask`, :272): loads the AsrDictionary (blank=bos
for CTC/transducer criteria, :324-328), probes feat_dim from the validation
manifest (:355-378), builds datasets from JSON manifests (:414-469), the
model from the named architecture, the criterion, and the per-criterion
validation decoder (:479-518). The hybrid task
(speech_recognition_hybrid.py:363) and LM task
(language_modeling_for_asr.py) share the surface.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Any, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

import espresso_tpu.models  # noqa: F401 — populate the model registry
from espresso_tpu.config import EspressoConfig
from espresso_tpu.data import kaldi_io
from espresso_tpu.data.dataset import AsrDataset
from espresso_tpu.data.dictionary import AsrDictionary
from espresso_tpu.data.encoders import CharactersAsr
from espresso_tpu.data.iterators import EpochBatchIterator
from espresso_tpu.data.manifest import load_manifest
from espresso_tpu.registry import MODELS, TASKS, apply_architecture

logger = logging.getLogger(__name__)


@TASKS.register("speech_recognition_espresso")
class SpeechRecognitionEspressoTask:
    """End-to-end ASR task (reference speech_recognition.py:272)."""

    def __init__(self, cfg: EspressoConfig):
        self.cfg = cfg
        crit = cfg.criterion.name
        enable_bos = crit in ("ctc_loss", "transducer_loss")
        self.autoregressive = crit not in ("ctc_loss", "transducer_loss")
        # transducer prev_output_tokens is eos-led (input feeding) while the
        # loss consumes raw targets: keep autoregressive-style collation but
        # loss strips via lengths.
        if crit == "transducer_loss":
            self.autoregressive = True
        dict_path = cfg.dataset.dict or os.path.join(
            cfg.dataset.data, "dict.txt"
        )
        self.dictionary = AsrDictionary.load(
            dict_path,
            enable_bos=enable_bos,
            non_lang_syms=cfg.dataset.non_lang_syms,
        )
        self.tokenizer = CharactersAsr()
        self.datasets: Dict[str, AsrDataset] = {}
        self.feat_dim = cfg.dataset.feat_dim

    # -- data ---------------------------------------------------------------
    def load_dataset(self, split: str) -> AsrDataset:
        if split in self.datasets:
            return self.datasets[split]
        entries = load_manifest(self.cfg.dataset.data, split)
        device_feats = self.cfg.dataset.feature_type in ("device_fbank", "waveform")
        dcfg = self.cfg.dataset
        is_train = split == dcfg.train_subset
        noise = None
        if is_train and dcfg.noise_augment_path:
            from espresso_tpu.features.transforms import NoiseAugment

            noise = NoiseAugment(
                dcfg.noise_augment_path,
                snr_min=dcfg.noise_snr_min,
                snr_max=dcfg.noise_snr_max,
                rate=dcfg.noise_rate,
                seed=self.cfg.common.seed,
            )
        ds = AsrDataset(
            entries,
            self.dictionary,
            feat_dim=self.cfg.dataset.feat_dim,
            feature_type=self.cfg.dataset.feature_type,
            sample_rate=self.cfg.dataset.sample_rate,
            autoregressive=self.autoregressive,
            tokenizer=self.tokenizer,
            global_cmvn_stats_path=(
                None if device_feats else self.cfg.dataset.global_cmvn_stats_path
            ),
            device_features=device_feats,
            speed_perturb_rates=dcfg.speed_perturb,
            apply_delta_deltas=dcfg.delta_deltas and not device_feats,
            noise_augment=noise,
            transforms_seed=self.cfg.common.seed,
            is_train=is_train,
        )
        if device_feats:
            if dcfg.delta_deltas:
                # deltas are appended on device after fbank
                self.feat_dim = 3 * dcfg.feat_dim
        else:
            # probe feat dim from the first utterance (reference :355-378)
            probe = ds.get_features(0)
            if probe.shape[1] != self.feat_dim:
                logger.info("probed feat_dim=%d from data", probe.shape[1])
                self.feat_dim = probe.shape[1]
        self.datasets[split] = ds
        return ds

    def get_batch_iterator(
        self,
        dataset: AsrDataset,
        max_tokens: Optional[int],
        max_sentences: Optional[int],
        seed: int = 1,
        num_shards: int = 1,
        shard_id: int = 0,
        shuffle: bool = True,
        epoch: int = 1,
        update_freq: int = 1,
    ) -> EpochBatchIterator:
        dcfg = self.cfg.dataset

        extra = {}
        if dcfg.batch_based_on_both_src_tgt and isinstance(dataset, AsrDataset):
            extra["batch_based_on_both_src_tgt"] = True

        def make_batches(ep: int):
            specs = dataset.make_batch_specs(
                max_tokens=max_tokens,
                max_sentences=max_sentences,
                num_buckets=dcfg.num_batch_buckets,
                required_batch_size_multiple=dcfg.required_batch_size_multiple,
                max_source_positions=dcfg.max_source_positions,
                max_target_positions=dcfg.max_target_positions,
                shuffle=shuffle,
                seed=seed,
                epoch=ep,
                **extra,
            )
            return dataset.group_specs(specs, update_freq)

        return EpochBatchIterator(
            make_batches,
            dataset.collate_group,
            seed=seed,
            num_shards=num_shards,
            shard_id=shard_id,
            buffer_size=dcfg.data_buffer_size,
            shuffle=shuffle,
            epoch=epoch,
            num_workers=dcfg.num_workers,
            worker_backend=dcfg.worker_backend,
        )

    # -- model --------------------------------------------------------------
    def build_model(self):
        model_section = dict(self.cfg.model)
        arch = model_section.pop("name")
        # resolve arch preset -> base model name
        from espresso_tpu.registry import ARCHITECTURES

        base_name = ARCHITECTURES[arch][0] if arch in ARCHITECTURES else arch
        cfg_cls = MODELS.config_class(base_name)
        model_cfg = cfg_cls()
        apply_architecture(arch, model_cfg)
        # user overrides from the model config section (nested dicts merge
        # into nested sub-configs, e.g. model.encoder.*)
        def merge(target, overrides: Dict[str, Any]):
            for key, value in overrides.items():
                if not hasattr(target, key):
                    raise KeyError(f"unknown model config key {key!r}")
                cur = getattr(target, key)
                if dataclasses.is_dataclass(cur) and isinstance(value, dict):
                    merge(cur, value)
                    continue
                if isinstance(cur, tuple):
                    if isinstance(value, (int, float)):
                        value = (value,)
                    if isinstance(value, (list, tuple)):
                        value = tuple(
                            tuple(v) if isinstance(v, (list, tuple)) else v
                            for v in value
                        )
                setattr(target, key, value)

        merge(model_cfg, model_section)
        model_cfg.vocab_size = (
            len(self.dictionary)
            if self.dictionary is not None
            else self.cfg.task.num_targets
        )
        model_cfg.feat_dim = self.feat_dim
        if hasattr(model_cfg, "pad_index") and self.dictionary is not None:
            model_cfg.pad_index = self.dictionary.pad()
        # activation checkpointing (common.remat=full)
        if self.cfg.common.remat != "none":
            for target in (model_cfg, getattr(model_cfg, "encoder", None)):
                if target is not None and hasattr(target, "remat"):
                    target.remat = True
        model_cls = MODELS.get(base_name)
        self.model_cfg = model_cfg
        return model_cls(model_cfg)

    def build_criterion(self):
        from espresso_tpu.criterions import build_criterion

        return build_criterion(self.cfg.criterion, self)

    # -- decoding hooks (per-criterion validation decoder, reference
    # :479-518) --------------------------------------------------------------
    def build_valid_decoder(self, model):
        crit = self.cfg.criterion.name
        if crit in ("wav2vec2_criterion", "hubert_criterion"):
            return None  # self-supervised pretraining: no WER decode
        if crit == "transducer_loss":
            from espresso_tpu.decode.transducer_greedy import (
                TransducerGreedyDecoder,
            )

            return TransducerGreedyDecoder(model, self.dictionary)
        if crit == "ctc_loss":
            from espresso_tpu.decode.ctc_decoder import CTCGreedyDecoder

            return CTCGreedyDecoder(model, self.dictionary)
        from espresso_tpu.decode.greedy import SimpleGreedyDecoder

        return SimpleGreedyDecoder(model, self.dictionary)

    def build_generator(self, model, gen_cfg=None, lm=None, lm_weight=0.0):
        """Inference-time decoder selection (reference :526-596)."""
        gen_cfg = gen_cfg or self.cfg.generation
        crit = self.cfg.criterion.name
        if crit == "transducer_loss":
            if gen_cfg.beam <= 1:
                from espresso_tpu.decode.transducer_greedy import (
                    TransducerGreedyDecoder,
                )

                return TransducerGreedyDecoder(
                    model,
                    self.dictionary,
                    max_num_expansions_per_step=gen_cfg.max_num_expansions_per_step,
                    model_predicts_eos=gen_cfg.model_predicts_eos,
                    max_out_factor=gen_cfg.max_out_factor,
                )
            from espresso_tpu.decode.transducer_beam import (
                TransducerBeamSearchDecoder,
            )

            return TransducerBeamSearchDecoder(
                model,
                self.dictionary,
                beam_size=gen_cfg.beam,
                expansion_beta=gen_cfg.expansion_beta,
                expansion_gamma=gen_cfg.expansion_gamma,
                max_num_expansions_per_step=gen_cfg.max_num_expansions_per_step,
                lm=lm,
                lm_weight=lm_weight,
                model_predicts_eos=gen_cfg.model_predicts_eos,
                prefix_alpha=gen_cfg.prefix_alpha,
                max_out_factor=gen_cfg.max_out_factor,
            )
        if crit == "ctc_loss":
            if gen_cfg.beam > 1:
                from espresso_tpu.decode.ctc_decoder import (
                    CTCPrefixBeamSearchDecoder,
                )

                return CTCPrefixBeamSearchDecoder(
                    model,
                    self.dictionary,
                    beam_size=gen_cfg.beam,
                    lm=lm,
                    lm_weight=lm_weight,
                )
            from espresso_tpu.decode.ctc_decoder import CTCGreedyDecoder

            return CTCGreedyDecoder(model, self.dictionary)
        from espresso_tpu.decode.beam_search import BeamSearchDecoder

        return BeamSearchDecoder(
            model,
            self.dictionary,
            beam_size=gen_cfg.beam,
            max_len_a=gen_cfg.max_len_a,
            max_len_b=gen_cfg.max_len_b,
            min_len=gen_cfg.min_len,
            len_penalty=gen_cfg.lenpen,
            eos_factor=gen_cfg.eos_factor,
            temperature=gen_cfg.temperature,
            lm=lm,
            lm_weight=lm_weight,
            sampling=gen_cfg.sampling,
            sampling_topk=gen_cfg.sampling_topk,
            sampling_topp=gen_cfg.sampling_topp,
            no_repeat_ngram_size=gen_cfg.no_repeat_ngram_size,
            diverse_beam_groups=gen_cfg.diverse_beam_groups,
            diverse_beam_strength=gen_cfg.diverse_beam_strength,
        )


@TASKS.register("speech_recognition_hybrid")
class SpeechRecognitionHybridTask(SpeechRecognitionEspressoTask):
    """Hybrid HMM-DNN task (espresso/tasks/speech_recognition_hybrid.py:363):
    targets are pdf-id alignments (cross-entropy) or numerator FSTs (LF-MMI);
    supports chunk-wise training with context frames and label delay, and
    HMM-state prior estimation/update (:101-122, :594)."""

    def __init__(self, cfg: EspressoConfig):
        self.cfg = cfg
        self.num_targets = cfg.task.num_targets
        assert self.num_targets > 0, "task.num_targets required for hybrid"
        self.datasets = {}
        self.feat_dim = cfg.dataset.feat_dim
        self.autoregressive = False
        self.dictionary = None
        self.state_prior = None
        if cfg.task.initial_state_prior_path:
            self.state_prior = np.load(cfg.task.initial_state_prior_path)

    def load_dataset(self, split: str):
        if split in self.datasets:
            return self.datasets[split]
        from espresso_tpu.data.xent_dataset import AsrXentDataset, XentEntry

        entries = load_manifest(self.cfg.dataset.data, split)
        if entries and entries[0].numerator_fst:
            # per-utterance numerator FSTs -> LF-MMI chain dataset
            # (reference asr_chain_dataset.py; alignments fall through to xent)
            from espresso_tpu.data.chain_dataset import AsrChainDataset

            ds = AsrChainDataset.from_manifest(
                entries, feat_dim=self.cfg.dataset.feat_dim
            )
            probe = kaldi_io.read_mat(ds.entries[0].feat)
            if probe.shape[1] != self.feat_dim:
                self.feat_dim = probe.shape[1]
            self.datasets[split] = ds
            return ds
        xent_entries = [
            XentEntry(
                utt_id=e.utt_id,
                feat=e.audio,
                alignment=e.alignment,
                num_frames=e.num_frames,
            )
            for e in entries
        ]
        tcfg = self.cfg.task
        ds = AsrXentDataset(
            xent_entries,
            feat_dim=self.cfg.dataset.feat_dim,
            chunk_width=tcfg.chunk_width,
            chunk_left_context=tcfg.chunk_left_context,
            chunk_right_context=tcfg.chunk_right_context,
            label_delay=tcfg.label_delay,
            seed=self.cfg.common.seed,
        )
        probe = kaldi_io.read_mat(xent_entries[0].feat)
        if probe.shape[1] != self.feat_dim:
            self.feat_dim = probe.shape[1]
        self.datasets[split] = ds
        return ds

    def build_valid_decoder(self, model):
        return None  # hybrid WER comes from Kaldi lattice decoding

    def update_state_prior(self, avg_posteriors: np.ndarray):
        """Running smoothing of the state prior from model posteriors
        (reference update_state_prior :594)."""
        lam = self.cfg.task.state_prior_update_smoothing
        if self.state_prior is None:
            self.state_prior = avg_posteriors
        else:
            self.state_prior = (1 - lam) * self.state_prior + lam * avg_posteriors

    @property
    def dictionary_or_none(self):
        return None


class _PdfDictionary:
    """Minimal dictionary facade for hybrid tasks (pdf-id targets)."""

    def __init__(self, num_targets: int):
        self.num_targets = num_targets

    def pad(self) -> int:
        return -1

    def __len__(self) -> int:
        return self.num_targets


@TASKS.register("audio_pretraining")
class AudioPretrainingTask(SpeechRecognitionEspressoTask):
    """Self-supervised pretraining on raw audio (fairseq
    tasks/audio_pretraining.py + hubert_pretraining.py): wave manifests
    with dataset.feature_type=waveform feed samples straight to
    wav2vec2/hubert; no decoding during validation."""

    def build_valid_decoder(self, model):
        return None

    def build_generator(self, model, gen_cfg=None, lm=None, lm_weight=0.0):
        raise NotImplementedError(
            "pretrained trunks decode after fine-tuning (wav2vec2_ctc)"
        )


@TASKS.register("language_modeling_for_asr")
class LanguageModelingForASRTask(SpeechRecognitionEspressoTask):
    """LM task (espresso/tasks/language_modeling_for_asr.py): trains
    subword/word LMs used for fusion. Data = {split}.txt, one sentence per
    line, encoded with the AsrDictionary (``--dict``)."""

    def __init__(self, cfg: EspressoConfig):
        self.cfg = cfg
        dict_path = cfg.dataset.dict or os.path.join(cfg.dataset.data, "dict.txt")
        self.dictionary = AsrDictionary.load(
            dict_path, non_lang_syms=cfg.dataset.non_lang_syms
        )
        self.tokenizer = None  # LM text is pre-tokenized (reference recipes)
        self.datasets = {}
        self.feat_dim = 0
        self.autoregressive = True

    def load_dataset(self, split: str):
        if split in self.datasets:
            return self.datasets[split]
        prefix = os.path.join(self.cfg.dataset.data, split)
        if os.path.exists(prefix + ".bin"):
            # binarized mmap stream (cli/prep.py binarize): O(batch) memory,
            # token-block packing (fairseq indexed_dataset +
            # token_block_utils semantics)
            from espresso_tpu.data.indexed_dataset import LMBlockDataset

            ds = LMBlockDataset(
                prefix,
                self.dictionary,
                block_size=self.cfg.dataset.tokens_per_sample,
                break_mode=self.cfg.dataset.sample_break_mode,
            )
        else:
            from espresso_tpu.data.lm_dataset import LMTextDataset

            ds = LMTextDataset(
                prefix + ".txt", self.dictionary, tokenizer=self.tokenizer
            )
        self.datasets[split] = ds
        return ds

    def build_valid_decoder(self, model):
        return None  # perplexity only

    def build_generator(self, model, gen_cfg=None, lm=None, lm_weight=0.0):
        raise NotImplementedError("use eval_lm for language models")


def setup_task(cfg: EspressoConfig):
    return TASKS.build(cfg.task.name, cfg)
