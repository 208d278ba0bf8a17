"""Criterions: pure loss functions over (model, variables, batch).

Rebuild of the espresso criterion set (espresso/criterions/):
  * ``cross_entropy_v2`` (cross_entropy_v2.py) — plain CE
  * ``label_smoothed_cross_entropy_v2`` (label_smoothed_cross_entropy_v2.py)
    — uniform/unigram/temporal smoothing
  * ``ctc_loss`` (ctc_loss.py:86-97) — CTC over encoder log-probs, blank=bos,
    EOS stripped from targets
  * ``transducer_loss`` (transducer_loss.py:131-140) — RNNT NLL over the
    joint lattice, optional include_eos

Interface: ``criterion(model, variables, batch, rngs, train) ->
(loss, sample_size, logging_dict)`` — a pure function of arrays so the whole
thing jits into the train step. ``batch["weight"]`` rows of 0 (bucket shape
padding) contribute nothing to loss or counts. Logging dicts contain only
summable scalars (the reference's logging_outputs_can_be_summed fast path,
trainer.py:1368-1449).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from espresso_tpu.config import CriterionSection
from espresso_tpu.ops.ctc import ctc_loss as ctc_loss_fn
from espresso_tpu.ops.losses import (
    cross_entropy_loss,
    label_smoothed_cross_entropy,
)
from espresso_tpu.ops.rnnt import rnnt_loss as rnnt_loss_fn
from espresso_tpu.registry import CRITERIONS


def _apply_model(model, variables, batch, rngs, train, ss_prob=1.0):
    """Run the model's training forward, handling batch_stats mutability.
    Batches without ``src_frames`` are language-model batches (LM task)."""
    kwargs = dict(train=train)
    static_off = isinstance(ss_prob, (int, float)) and ss_prob >= 1.0
    if not static_off:
        kwargs["ss_prob"] = ss_prob
    mutable = ["batch_stats"] if (train and "batch_stats" in variables) else False
    if "src_frames" not in batch:
        kwargs.pop("ss_prob", None)
        out = model.apply(
            variables,
            batch["prev_output_tokens"],
            rngs=rngs,
            mutable=mutable,
            **kwargs,
        )
        if mutable:
            logits, updates = out
            return logits, None, updates
        return out, None, {}
    out = model.apply(
        variables,
        batch["src_frames"],
        batch["src_lengths"],
        batch["prev_output_tokens"],
        rngs=rngs,
        mutable=mutable,
        **kwargs,
    )
    if mutable:
        (logits, enc), updates = out
        return logits, enc, updates
    logits, enc = out
    return logits, enc, {}


class CECriterionBase:
    logging_keys = ("loss", "nll_loss", "ntokens")

    def __init__(self, cfg: CriterionSection, task):
        self.cfg = cfg
        self.task = task
        self.pad = task.dictionary.pad()
        self.sentence_avg = False
        self.unigram = None
        if cfg.smoothing_type == "unigram":
            import numpy as np

            from espresso_tpu.ops.losses import unigram_probs_from_counts

            self.unigram = jnp.asarray(
                unigram_probs_from_counts(
                    np.asarray(task.dictionary.count, dtype=np.float64),
                    cfg.unigram_pseudo_count,
                    self.pad,
                )
            )

    def _mask(self, batch):
        return (batch["target"] != self.pad) & (batch["weight"][:, None] > 0)

    def sample_size(self, batch):
        return jnp.maximum(self._mask(batch).sum(), 1)


@CRITERIONS.register("cross_entropy_v2")
class CrossEntropyV2(CECriterionBase):
    def __call__(self, model, variables, batch, rngs=None, train=False, ss_prob=1.0):
        logits, _, updates = _apply_model(model, variables, batch, rngs, train, ss_prob)
        mask = self._mask(batch)
        loss, nll = cross_entropy_loss(logits, batch["target"], mask)
        ntokens = mask.sum()
        logging = {"loss": loss, "nll_loss": nll, "ntokens": ntokens}
        return loss, jnp.maximum(ntokens, 1), logging, updates


@CRITERIONS.register("label_smoothed_cross_entropy_v2")
class LabelSmoothedCrossEntropyV2(CECriterionBase):
    def __call__(self, model, variables, batch, rngs=None, train=False, ss_prob=1.0):
        logits, _, updates = _apply_model(model, variables, batch, rngs, train, ss_prob)
        mask = self._mask(batch)
        loss, nll = label_smoothed_cross_entropy(
            logits,
            batch["target"],
            mask,
            self.cfg.label_smoothing,
            smoothing_type=self.cfg.smoothing_type,
            pad_index=self.pad,
            unigram_probs=self.unigram,
        )
        ntokens = mask.sum()
        logging = {"loss": loss, "nll_loss": nll, "ntokens": ntokens}
        return loss, jnp.maximum(ntokens, 1), logging, updates


@CRITERIONS.register("ctc_loss")
class CTCCriterion:
    """CTC over encoder outputs (reference ctc_loss.py). blank = bos
    (speech_recognition.py:324-328); targets have no EOS (non-autoregressive
    dataset) or get it stripped via the mask."""

    logging_keys = ("loss", "ntokens")

    def __init__(self, cfg: CriterionSection, task):
        self.cfg = cfg
        self.task = task
        self.pad = task.dictionary.pad()
        self.eos = task.dictionary.eos()
        self.blank = task.dictionary.blank()

    def __call__(self, model, variables, batch, rngs=None, train=False, ss_prob=1.0):
        logits, enc, updates = _apply_model(model, variables, batch, rngs, train)
        # strip EOS from targets if present (reference :76-83)
        target = batch["target"]
        tgt_lengths = batch["tgt_lengths"]
        is_eos = target == self.eos
        target = jnp.where(is_eos, self.pad, target)
        tgt_lengths = tgt_lengths - is_eos.sum(axis=1)
        losses = ctc_loss_fn(
            logits,
            enc.src_lengths,
            target,
            tgt_lengths,
            blank=self.blank,
            zero_infinity=self.cfg.zero_infinity,
        )
        loss = (losses * batch["weight"]).sum()
        ntokens = (tgt_lengths * batch["weight"]).sum()
        sample_size = jnp.maximum(ntokens, 1)
        logging = {"loss": loss, "ntokens": ntokens}
        return loss, sample_size, logging, updates


@CRITERIONS.register("transducer_loss")
class TransducerCriterion:
    """RNNT loss on the full joint lattice (reference transducer_loss.py:131).

    The dataset for transducer training is non-autoregressive (targets
    without EOS) unless include_eos is set, matching the task wiring
    (transducer_loss.py:40 II-link)."""

    logging_keys = ("loss", "nsentences")

    def __init__(self, cfg: CriterionSection, task):
        self.cfg = cfg
        self.task = task
        self.pad = task.dictionary.pad()
        self.blank = task.dictionary.blank()
        self.fused = getattr(cfg, "fused_transducer", True)

    def __call__(self, model, variables, batch, rngs=None, train=False, ss_prob=1.0):
        if self.fused and hasattr(model, "forward_fused"):
            return self._fused(model, variables, batch, rngs, train)
        lattice, enc, updates = _apply_model(model, variables, batch, rngs, train)
        # lattice [B, T, U+1, V]: prev_output_tokens has length U+1 (eos-led)
        losses = rnnt_loss_fn(
            lattice,
            batch["target"][:, : lattice.shape[2] - 1],
            enc.src_lengths,
            jnp.minimum(batch["tgt_lengths"], lattice.shape[2] - 1),
            blank=self.blank,
        )
        loss = (losses * batch["weight"]).sum()
        nsentences = jnp.maximum(batch["weight"].sum(), 1)
        logging = {"loss": loss, "nsentences": nsentences}
        return loss, nsentences, logging, updates

    def _fused(self, model, variables, batch, rngs, train):
        """Lattice-free path (ops/rnnt_fused): peak memory O(B·U·V) per frame
        instead of the B×T×U×V lattice."""
        from espresso_tpu.ops.rnnt_fused import rnnt_loss_fused

        mutable = (
            ["batch_stats"] if (train and "batch_stats" in variables) else False
        )
        out = model.apply(
            variables,
            batch["src_frames"],
            batch["src_lengths"],
            batch["prev_output_tokens"],
            train=train,
            rngs=rngs,
            mutable=mutable,
            method="forward_fused",
        )
        if mutable:
            (enc_proj, dec_proj, enc), updates = out
        else:
            enc_proj, dec_proj, enc = out
            updates = {}
        fc = variables["params"]["joint"]["fc_out"]
        U1 = dec_proj.shape[1]
        losses = rnnt_loss_fused(
            enc_proj,
            dec_proj,
            fc["kernel"],
            fc["bias"],
            batch["target"][:, : U1 - 1],
            enc.src_lengths,
            jnp.minimum(batch["tgt_lengths"], U1 - 1),
            self.blank,
        )
        loss = (losses * batch["weight"]).sum()
        nsentences = jnp.maximum(batch["weight"].sum(), 1)
        logging = {"loss": loss, "nsentences": nsentences}
        return loss, nsentences, logging, updates


@CRITERIONS.register("adaptive_loss")
class AdaptiveLoss(CECriterionBase):
    """CE through an adaptive-softmax output layer (fairseq/criterions/
    adaptive_loss.py). Scores only the target's cluster via
    ``model.target_lprobs`` — the full [B, U, V] table is never built."""

    def __call__(self, model, variables, batch, rngs=None, train=False, ss_prob=1.0):
        assert "src_frames" not in batch, "adaptive_loss is an LM criterion"
        mutable = (
            ["batch_stats"] if (train and "batch_stats" in variables) else False
        )
        out = model.apply(
            variables,
            batch["prev_output_tokens"],
            batch["target"],
            train=train,
            rngs=rngs,
            mutable=mutable,
            method="target_lprobs",
        )
        if mutable:
            lp, updates = out
        else:
            lp, updates = out, {}
        mask = self._mask(batch)
        loss = -jnp.where(mask, lp, 0.0).sum()
        ntokens = mask.sum()
        logging = {"loss": loss, "nll_loss": loss, "ntokens": ntokens}
        return loss, jnp.maximum(ntokens, 1), logging, updates


@CRITERIONS.register("wav2vec2_criterion")
class Wav2Vec2Criterion:
    """InfoNCE + codebook diversity + feature penalty
    (fairseq/criterions/wav2vec_criterion.py). The model output's class 0 is
    the true quantized target; loss counts only masked frames."""

    logging_keys = ("loss", "contrastive_loss", "ntokens", "correct")

    def __init__(self, cfg: CriterionSection, task):
        self.cfg = cfg
        self.diversity_weight = cfg.diversity_loss_weight
        self.features_pen_weight = cfg.features_penalty_weight

    def __call__(
        self, model, variables, batch, rngs=None, train=False, ss_prob=1.0,
        step=None,
    ):
        # Gumbel temperature anneal max(end, start*decay^update)
        # (fairseq wav2vec2 latent_temp). Eval calls carry no update
        # counter; use the annealed floor so validation contrastive loss is
        # comparable to late-training loss (the reference evaluates at the
        # current annealed temperature)
        if step is not None:
            temp = jnp.maximum(
                self.cfg.gumbel_temp_end,
                self.cfg.gumbel_temp_start
                * self.cfg.gumbel_temp_decay ** step.astype(jnp.float32),
            )
        else:
            temp = self.cfg.gumbel_temp_end
        out = model.apply(
            variables,
            batch["src_frames"],
            batch["src_lengths"],
            train=train,
            rngs=rngs,
            gumbel_temp=temp,
        )
        logits = out["logits"].astype(jnp.float32)  # [B, T, 1+K]
        lse = jax.nn.logsumexp(
            jnp.where(jnp.isfinite(logits), logits, -1e9), axis=-1
        )
        nll = lse - logits[..., 0]
        count_mask = out["mask"] & (batch["weight"][:, None] > 0)
        contrastive = jnp.where(count_mask, nll, 0.0).sum()
        ntokens = count_mask.sum()
        n_vars = out["num_vars"]
        diversity = (
            (n_vars - out["prob_perplexity"]) / n_vars * ntokens
        )
        loss = (
            contrastive
            + self.diversity_weight * diversity
            + self.features_pen_weight * out["features_pen"] * ntokens
        )
        correct = jnp.where(
            count_mask, (jnp.argmax(logits, -1) == 0).astype(jnp.float32), 0.0
        ).sum()
        logging = {
            "loss": loss,
            "contrastive_loss": contrastive,
            "ntokens": ntokens,
            "correct": correct,
        }
        return loss, jnp.maximum(ntokens, 1), logging, {}


@CRITERIONS.register("hubert_criterion")
class HubertCriterion:
    """Masked (and optionally unmasked) cluster-unit CE
    (fairseq/criterions/hubert_criterion.py). batch["target"] holds
    per-frame integer units at the label rate; they are resampled to the
    extractor frame rate with a nearest-index gather."""

    logging_keys = ("loss", "ntokens", "correct")

    def __init__(self, cfg: CriterionSection, task):
        self.cfg = cfg

    def __call__(self, model, variables, batch, rngs=None, train=False, ss_prob=1.0):
        out = model.apply(
            variables,
            batch["src_frames"],
            batch["src_lengths"],
            train=train,
            rngs=rngs,
        )
        logits = out["logits"].astype(jnp.float32)  # [B, T, V]
        B, T, V = logits.shape
        target = batch["target"]  # [B, W] ints, -1 or pad for invalid
        W = target.shape[1]
        # nearest-index resample label stream to the latent frame rate
        tgt_lengths = jnp.maximum((target >= 0).sum(axis=1), 1)
        pos = (
            jnp.arange(T)[None, :]
            * tgt_lengths[:, None]
            // jnp.maximum(out["lengths"], 1)[:, None]
        )
        pos = jnp.minimum(pos, W - 1)
        frame_target = jnp.take_along_axis(target, pos, axis=1)  # [B, T]
        valid = (
            out["padding_mask"]
            & (frame_target >= 0)
            & (batch["weight"][:, None] > 0)
        )
        model_cfg = model.cfg
        w_masked = model_cfg.pred_masked_weight
        w_nomask = model_cfg.pred_nomask_weight
        weight = jnp.where(out["mask"], w_masked, w_nomask)
        weight = jnp.where(valid, weight, 0.0)
        lp = jax.nn.log_softmax(logits, axis=-1)
        safe_t = jnp.maximum(frame_target, 0)
        nll = -jnp.take_along_axis(lp, safe_t[..., None], -1)[..., 0]
        loss = (nll * weight).sum()
        count_mask = valid & out["mask"]
        ntokens = count_mask.sum()
        correct = jnp.where(
            count_mask,
            (jnp.argmax(logits, -1) == safe_t).astype(jnp.float32),
            0.0,
        ).sum()
        logging = {"loss": loss, "ntokens": ntokens, "correct": correct}
        return loss, jnp.maximum(ntokens, 1), logging, {}


def build_criterion(cfg: CriterionSection, task):
    return CRITERIONS.build(cfg.name, cfg, task)


@CRITERIONS.register("subsampled_cross_entropy_with_accuracy")
class SubsampledCrossEntropyWithAccuracy:
    """Hybrid frame-level CE + frame accuracy
    (espresso/criterions/subsampled_cross_entropy_with_accuracy.py).

    Model logits [B, T', num_targets] are aligned to the label window: in
    chunked training the label chunk sits ``chunk_left_context`` frames into
    the (context-padded) input, so logits are cropped to
    [left : left + W] before the CE; whole-utterance mode crops/subsamples to
    the target length. Targets use -1 padding (xent_dataset.PAD_TARGET).
    """

    logging_keys = ("loss", "ntokens", "num_correct")

    def __init__(self, cfg: CriterionSection, task):
        self.cfg = cfg
        self.task = task
        self.left = getattr(task.cfg.task, "chunk_left_context", 0)

    def __call__(self, model, variables, batch, rngs=None, train=False, ss_prob=1.0):
        logits, enc, updates = _apply_model(model, variables, batch, rngs, train)
        target = batch["target"]  # [B, W] with -1 padding
        B, W = target.shape
        Tp = logits.shape[1]
        if Tp >= self.left + W:
            logits = jax.lax.dynamic_slice_in_dim(logits, self.left, W, axis=1)
        elif Tp != W:
            # model subsampled: pick every r-th frame of the targets instead
            r = -(-W // Tp)
            target = target[:, ::r][:, :Tp]
            W = Tp
        mask = (target >= 0) & (batch["weight"][:, None] > 0)
        safe_target = jnp.maximum(target, 0)
        lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(lprobs, safe_target[..., None], axis=-1)[..., 0]
        loss = jnp.where(mask, nll, 0.0).sum()
        pred = jnp.argmax(lprobs, axis=-1)
        correct = jnp.where(mask, (pred == safe_target).astype(jnp.float32), 0.0).sum()
        ntokens = mask.sum()
        logging = {"loss": loss, "ntokens": ntokens, "num_correct": correct}
        return loss, jnp.maximum(ntokens, 1), logging, updates


@CRITERIONS.register("lf_mmi_loss")
class LFMMICriterion:
    """Lattice-free MMI (espresso/criterions/lf_mmi_loss.py:42-137, PyChain
    replaced by ops/chain.py's on-device forward-backward). Requires
    ``criterion.denominator_graph_path`` (npz/fst/txt; convert Kaldi
    den.fst with DenominatorGraph.from_fst_text). Numerator = per-utterance
    numerator FSTs when the batch carries packed graph arrays
    (chain_dataset.py; full pychain parity), else frame alignments from the
    manifest."""

    logging_keys = ("loss", "ntokens")

    def __init__(self, cfg: CriterionSection, task):
        from espresso_tpu.ops.chain import DenominatorGraph

        self.cfg = cfg
        self.task = task
        assert cfg.denominator_graph_path, (
            "criterion.denominator_graph_path required for lf_mmi_loss"
        )
        self.graph = DenominatorGraph.load(cfg.denominator_graph_path)
        self.left = getattr(task.cfg.task, "chunk_left_context", 0)

    def __call__(self, model, variables, batch, rngs=None, train=False, ss_prob=1.0):
        from espresso_tpu.ops.chain import chain_loss, chain_loss_fst

        logits, enc, updates = _apply_model(model, variables, batch, rngs, train)
        target = batch["target"]
        B, W = target.shape
        Tp = logits.shape[1]
        if Tp >= self.left + W:
            logits = jax.lax.dynamic_slice_in_dim(logits, self.left, W, axis=1)
        if "num_from" in batch:
            # per-utterance numerator FSTs (chain_dataset.py). If the model
            # subsampled (Tp < W), scale the supervision lengths to the
            # output frame rate (kaldi frame_subsampling_factor semantics).
            Tl = logits.shape[1]
            lengths = jnp.minimum(batch["tgt_lengths"], W)
            if Tl < W:
                lengths = jnp.minimum((lengths * Tl + W - 1) // W, Tl)
            losses = chain_loss_fst(
                logits,
                lengths,
                (
                    batch["num_from"],
                    batch["num_to"],
                    batch["num_pdf"],
                    batch["num_weight"],
                    batch["num_final"],
                ),
                self.graph,
                leaky_hmm_coefficient=self.cfg.leaky_hmm_coefficient,
                leaky_mode=self.cfg.leaky_hmm_mode,
            )
            loss = (losses * batch["weight"]).sum()
            ntokens = (lengths * batch["weight"]).sum()
            logging = {"loss": loss, "ntokens": ntokens}
            return loss, jnp.maximum(ntokens, 1), logging, updates
        lengths = jnp.minimum(batch["tgt_lengths"], W)
        losses = chain_loss(
            logits,
            target,
            lengths,
            self.graph,
            leaky_hmm_coefficient=self.cfg.leaky_hmm_coefficient,
            leaky_mode=self.cfg.leaky_hmm_mode,
        )
        loss = (losses * batch["weight"]).sum()
        ntokens = (lengths * batch["weight"]).sum()
        logging = {"loss": loss, "ntokens": ntokens}
        return loss, jnp.maximum(ntokens, 1), logging, updates
