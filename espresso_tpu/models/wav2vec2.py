"""wav2vec 2.0 and HuBERT self-supervised speech models.

Rebuild of fairseq/models/wav2vec/wav2vec2.py (conv feature extractor,
span masking, Gumbel vector quantizer, transformer context network,
InfoNCE contrastive objective), fairseq/models/wav2vec/wav2vec2_asr.py
(CTC fine-tuning head), and fairseq/models/hubert/hubert.py (masked
cluster-label prediction).

TPU re-design notes:
  * Span masking (fairseq compute_mask_indices — a numpy per-batch loop) is
    static-shape on device: a fixed number of span starts per row is chosen
    with a top-k over random scores restricted to valid frames, and spans
    are dilated with a static roll-OR loop (mask_length is a compile-time
    constant).
  * Negative sampling (buffered_arange + randint loop) becomes one
    jax.random.randint + a +1 shift to exclude the positive, gathered with
    vmap'd takes — no host sync.
  * The quantizer's hard Gumbel argmax uses the straight-through trick with
    one-hot matmuls onto the codebook (MXU-friendly; no scatter).
  * All variable-length handling is padding masks; every shape is static.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from espresso_tpu.models.base import EncoderOut
from espresso_tpu.modules.conformer import TransformerEncoderLayer
from espresso_tpu.registry import MODELS, register_architecture

# (channels, kernel, stride) stack; fairseq wav2vec2 default — 320x total
# subsampling => ~49 Hz latents from 16 kHz audio
DEFAULT_CONV_LAYERS: Tuple[Tuple[int, int, int], ...] = (
    (512, 10, 5),
    (512, 3, 2),
    (512, 3, 2),
    (512, 3, 2),
    (512, 3, 2),
    (512, 2, 2),
    (512, 2, 2),
)


@dataclass
class Wav2Vec2Config:
    name: str = "wav2vec2"
    vocab_size: int = 0  # unused in pretraining (parity field)
    feat_dim: int = 1  # raw waveform input
    conv_layers: Tuple[Tuple[int, int, int], ...] = DEFAULT_CONV_LAYERS
    extractor_mode: str = "default"  # default (group-norm first) | layer_norm
    encoder_embed_dim: int = 768
    encoder_ffn_dim: int = 3072
    encoder_layers: int = 12
    encoder_heads: int = 12
    conv_pos: int = 128  # conv positional embedding kernel
    conv_pos_groups: int = 16
    dropout: float = 0.1
    mask_prob: float = 0.65
    mask_length: int = 10
    # quantizer
    quantizer_groups: int = 2
    quantizer_entries: int = 320
    vq_dim: int = 256
    gumbel_temp: float = 2.0  # start temp; criterion anneals per update
    # contrastive
    num_negatives: int = 100
    logit_temp: float = 0.1
    final_dim: int = 256
    pad_index: int = 1
    # scale gradients flowing into the conv extractor (reference
    # wav2vec2 feature_grad_mult; base recipe uses 0.1)
    feature_grad_mult: float = 0.1


def _conv_out_length(length, kernel: int, stride: int):
    return (length - kernel) // stride + 1


def extractor_output_lengths(
    conv_layers, lengths: jnp.ndarray
) -> jnp.ndarray:
    out = lengths
    for _, k, s in conv_layers:
        out = (out - k) // s + 1
    return jnp.maximum(out, 1)


class ConvFeatureExtractor(nn.Module):
    """Strided 1-D conv stack over raw waveform (wav2vec2.py
    ConvFeatureExtractionModel)."""

    conv_layers: Tuple[Tuple[int, int, int], ...]
    mode: str = "default"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, wav: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = wav[..., None]  # [B, N, 1]
        for i, (ch, k, s) in enumerate(self.conv_layers):
            x = nn.Conv(
                ch,
                kernel_size=(k,),
                strides=(s,),
                padding="VALID",
                use_bias=False,
                name=f"conv{i}",
            )(x)
            if i == 0 and self.mode == "default":
                x = nn.GroupNorm(num_groups=ch, name="group_norm")(x)
            elif self.mode == "layer_norm":
                x = nn.LayerNorm(name=f"ln{i}")(x)
            x = nn.gelu(x)
        return x  # [B, T', C]


def compute_span_mask(
    rng: jax.Array,
    B: int,
    T: int,
    lengths: jnp.ndarray,
    mask_prob: float,
    mask_length: int,
) -> jnp.ndarray:
    """Static-shape span masking (fairseq compute_mask_indices semantics:
    ~mask_prob fraction of frames covered by spans of mask_length).
    Start count is the compile-time worst case; rows shorter than T mask
    proportionally fewer frames because starts falling on padding are
    dropped."""
    num_starts = max(1, int(mask_prob * T / float(mask_length)))
    scores = jax.random.uniform(rng, (B, T))
    valid = jnp.arange(T)[None, :] < (lengths[:, None] - mask_length + 1)
    # prefer valid positions; keep per-row count proportional to length by
    # zeroing starts on padding after top-k
    scores = jnp.where(valid, scores, -1.0)
    _, starts = jax.lax.top_k(scores, num_starts)  # [B, num_starts]
    start_valid = jnp.take_along_axis(valid, starts, axis=1)
    onehot = jnp.zeros((B, T), bool)
    onehot = onehot.at[
        jnp.arange(B)[:, None].repeat(num_starts, 1), starts
    ].set(start_valid)
    mask = onehot
    for _ in range(mask_length - 1):
        onehot = jnp.roll(onehot, 1, axis=1).at[:, 0].set(False)
        mask = mask | onehot
    return mask & (jnp.arange(T)[None, :] < lengths[:, None])


class GumbelVectorQuantizer(nn.Module):
    """Product-quantization codebook with straight-through Gumbel softmax
    (fairseq/modules/gumbel_vector_quantizer.py)."""

    input_dim: int
    groups: int
    entries: int
    vq_dim: int

    def setup(self):
        assert self.vq_dim % self.groups == 0
        self.codebook = self.param(
            "codebook",
            nn.initializers.uniform(scale=1.0),
            (self.groups, self.entries, self.vq_dim // self.groups),
        )
        self.weight_proj = nn.Dense(self.groups * self.entries, name="weight_proj")

    def __call__(
        self,
        x: jnp.ndarray,  # [B, T, C]
        temp: float = 1.0,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ):
        B, T, _ = x.shape
        logits = self.weight_proj(x).reshape(B, T, self.groups, self.entries)
        logits = logits.astype(jnp.float32)
        if train and rng is not None:
            g = -jnp.log(
                -jnp.log(jax.random.uniform(rng, logits.shape, minval=1e-9) + 1e-9)
            )
            soft = jax.nn.softmax((logits + g) / temp, axis=-1)
        else:
            soft = jax.nn.softmax(logits / temp, axis=-1)
        hard = jax.nn.one_hot(jnp.argmax(soft, axis=-1), self.entries, dtype=soft.dtype)
        onehot = hard + soft - jax.lax.stop_gradient(soft)  # straight-through
        # [B,T,G,E] @ [G,E,D/G] -> [B,T,G,D/G]
        q = jnp.einsum("btge,ged->btgd", onehot, self.codebook)
        q = q.reshape(B, T, self.vq_dim)
        # diversity statistics: avg softmax over batch*time per group
        avg_probs = jax.nn.softmax(logits, axis=-1).mean(axis=(0, 1))  # [G, E]
        prob_perplexity = jnp.exp(
            -jnp.sum(avg_probs * jnp.log(avg_probs + 1e-7), axis=-1)
        ).sum()
        return q, prob_perplexity


class _ContextNetwork(nn.Module):
    """Conv positional embedding + transformer stack (wav2vec2 encoder)."""

    cfg: Any

    @nn.compact
    def __call__(self, x, padding_mask, train):
        cfg = self.cfg
        pos = nn.Conv(
            cfg.encoder_embed_dim,
            kernel_size=(cfg.conv_pos,),
            feature_group_count=cfg.conv_pos_groups,
            padding="SAME",
            name="pos_conv",
        )(x)
        x = x + nn.gelu(pos)
        x = nn.LayerNorm(name="pre_norm")(x)
        if cfg.dropout > 0.0 and train:
            x = nn.Dropout(rate=cfg.dropout)(x, deterministic=False)
        for i in range(cfg.encoder_layers):
            x = TransformerEncoderLayer(
                cfg.encoder_embed_dim,
                cfg.encoder_ffn_dim,
                cfg.encoder_heads,
                dropout=cfg.dropout,
                name=f"layer{i}",
            )(x, padding_mask=padding_mask, train=train)
        return x


@MODELS.register("wav2vec2", config=Wav2Vec2Config)
class Wav2Vec2Model(nn.Module):
    cfg: Wav2Vec2Config

    def setup(self):
        cfg = self.cfg
        self.extractor = ConvFeatureExtractor(
            cfg.conv_layers, mode=cfg.extractor_mode, name="extractor"
        )
        C = cfg.conv_layers[-1][0]
        self.layer_norm_feats = nn.LayerNorm(name="layer_norm_feats")
        self.post_proj = nn.Dense(cfg.encoder_embed_dim, name="post_proj")
        self.mask_emb = self.param(
            "mask_emb",
            nn.initializers.uniform(scale=1.0),
            (cfg.encoder_embed_dim,),
        )
        self.quantizer = GumbelVectorQuantizer(
            C,
            cfg.quantizer_groups,
            cfg.quantizer_entries,
            cfg.vq_dim,
            name="quantizer",
        )
        self.project_q = nn.Dense(cfg.final_dim, name="project_q")
        self.context = _ContextNetwork(cfg, name="context")
        self.final_proj = nn.Dense(cfg.final_dim, name="final_proj")

    def features(self, wav: jnp.ndarray, num_samples: jnp.ndarray, train=False):
        feats = self.extractor(wav, train=train)  # [B, T, C]
        gm = self.cfg.feature_grad_mult
        if train and gm != 1.0:
            # forward value unchanged; backward into the extractor scaled
            # by gm (reference feature_grad_mult, GradMultiply)
            feats = feats * gm + jax.lax.stop_gradient(feats * (1.0 - gm))
        lengths = extractor_output_lengths(self.cfg.conv_layers, num_samples)
        lengths = jnp.minimum(lengths, feats.shape[1])
        return feats, lengths

    def __call__(
        self,
        wav: jnp.ndarray,  # [B, N] raw waveform
        num_samples: jnp.ndarray,  # [B]
        prev_output_tokens=None,  # parity arg
        train: bool = False,
        gumbel_temp: Optional[float] = None,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        feats, lengths = self.features(wav, num_samples, train=train)
        B, T, _ = feats.shape
        features_pen = (feats.astype(jnp.float32) ** 2).mean()
        feats = self.layer_norm_feats(feats)

        if train:
            mask_rng = self.make_rng("dropout")
            neg_rng = jax.random.fold_in(mask_rng, 1)
            gum_rng = jax.random.fold_in(mask_rng, 2)
        else:
            mask_rng = neg_rng = gum_rng = jax.random.PRNGKey(0)
        mask = compute_span_mask(
            mask_rng, B, T, lengths, cfg.mask_prob, cfg.mask_length
        )

        # targets from the UNMASKED latents (pre-context)
        q, prob_perplexity = self.quantizer(
            feats,
            temp=gumbel_temp if gumbel_temp is not None else cfg.gumbel_temp,
            train=train,
            rng=gum_rng,
        )
        y = self.project_q(q)  # [B, T, F]

        x = self.post_proj(feats)
        x = jnp.where(mask[..., None], self.mask_emb[None, None].astype(x.dtype), x)
        padding_mask = jnp.arange(T)[None, :] < lengths[:, None]
        c = self.context(x, padding_mask, train)
        cx = self.final_proj(c)  # [B, T, F]

        # negatives: uniform over the row's valid frames, excluding self —
        # draws land in [0, len-1) and the >=t shift maps them to
        # [0, len-1] \ {t}, so no negative ever collides with the positive
        # (masked-out padding rows included: their draws stay below t)
        high = jnp.maximum(lengths - 1, 1)[:, None, None]
        neg_idx = jax.random.randint(
            neg_rng, (B, T, cfg.num_negatives), 0, high
        )
        tpos = jnp.arange(T)[None, :, None]
        neg_idx = jnp.where(neg_idx >= tpos, neg_idx + 1, neg_idx)
        neg_idx = jnp.minimum(neg_idx, T - 1)
        negs = jax.vmap(lambda yb, ib: yb[ib])(y, neg_idx)  # [B,T,K,F]

        def cos(a, b):
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-8)
            b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-8)
            return (a * b).sum(-1)

        pos_logit = cos(cx, y)[..., None]  # [B,T,1]
        neg_logit = cos(cx[:, :, None, :], negs)  # [B,T,K]
        # neg_is_pos masking (reference wav2vec2.py:544-560): sampling
        # excludes the positive's INDEX, but early in VQ training distinct
        # frames often quantize to the same codeword — a negative whose
        # quantized vector equals the positive is not a wrong class and must
        # not receive contrastive gradient; mask its logit to -inf
        neg_is_pos = (y[:, :, None, :] == negs).all(-1)  # [B,T,K]
        neg_logit = jnp.where(neg_is_pos, -jnp.inf, neg_logit)
        logits = (
            jnp.concatenate([pos_logit, neg_logit], axis=-1) / cfg.logit_temp
        )
        return {
            "logits": logits,  # [B, T, 1+K]; target class = 0
            "mask": mask,
            "padding_mask": padding_mask,
            "lengths": lengths,
            "prob_perplexity": prob_perplexity,
            "num_vars": cfg.quantizer_groups * cfg.quantizer_entries,
            "features_pen": features_pen,
        }

    def encode(
        self, wav: jnp.ndarray, num_samples: jnp.ndarray, train: bool = False
    ) -> EncoderOut:
        """Fine-tuning/inference trunk: no masking, no quantizer."""
        feats, lengths = self.features(wav, num_samples, train=train)
        feats = self.layer_norm_feats(feats)
        x = self.post_proj(feats)
        T = x.shape[1]
        padding_mask = jnp.arange(T)[None, :] < lengths[:, None]
        c = self.context(x, padding_mask, train)
        return EncoderOut(
            encoder_out=c, encoder_padding_mask=padding_mask, src_lengths=lengths
        )


@dataclass
class Wav2Vec2CtcConfig:
    name: str = "wav2vec2_ctc"
    vocab_size: int = 0
    feat_dim: int = 1
    w2v: Wav2Vec2Config = field(default_factory=Wav2Vec2Config)
    final_dropout: float = 0.0
    pad_index: int = 1


@MODELS.register("wav2vec2_ctc", config=Wav2Vec2CtcConfig)
class Wav2Vec2CtcModel(nn.Module):
    """CTC fine-tuning head over a wav2vec2 trunk
    (fairseq/models/wav2vec/wav2vec2_asr.py Wav2VecCtc)."""

    cfg: Wav2Vec2CtcConfig

    def setup(self):
        self.w2v = Wav2Vec2Model(self.cfg.w2v, name="w2v")
        self.drop = nn.Dropout(rate=self.cfg.final_dropout)
        self.fc_out = nn.Dense(self.cfg.vocab_size, name="fc_out")

    def __call__(
        self,
        src_frames: jnp.ndarray,  # [B, N] waveform
        src_lengths: jnp.ndarray,
        prev_output_tokens=None,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, EncoderOut]:
        enc = self.w2v.encode(src_frames, src_lengths, train=train)
        x = enc.encoder_out
        if self.cfg.final_dropout > 0.0 and train:
            x = self.drop(x, deterministic=False)
        return self.fc_out(x), enc

    def encode(self, src_frames, src_lengths, train: bool = False) -> EncoderOut:
        return self.w2v.encode(src_frames, src_lengths, train=train)

    def output_logits(self, enc: EncoderOut) -> jnp.ndarray:
        return self.fc_out(enc.encoder_out)


@dataclass
class HubertConfig:
    name: str = "hubert"
    vocab_size: int = 0  # cluster-label vocabulary (num k-means units)
    feat_dim: int = 1
    conv_layers: Tuple[Tuple[int, int, int], ...] = DEFAULT_CONV_LAYERS
    extractor_mode: str = "default"
    encoder_embed_dim: int = 768
    encoder_ffn_dim: int = 3072
    encoder_layers: int = 12
    encoder_heads: int = 12
    conv_pos: int = 128
    conv_pos_groups: int = 16
    dropout: float = 0.1
    mask_prob: float = 0.8
    mask_length: int = 10
    final_dim: int = 256
    logit_temp: float = 0.1
    pred_masked_weight: float = 1.0
    pred_nomask_weight: float = 0.0
    pad_index: int = 1


@MODELS.register("hubert", config=HubertConfig)
class HubertModel(nn.Module):
    """Masked prediction of frame-level cluster labels
    (fairseq/models/hubert/hubert.py). Targets = per-frame integer units
    (k-means over MFCC/latents, the reference's label .km files — here an
    alignment-style int stream resampled to the extractor frame rate)."""

    cfg: HubertConfig

    def setup(self):
        cfg = self.cfg
        self.extractor = ConvFeatureExtractor(
            cfg.conv_layers, mode=cfg.extractor_mode, name="extractor"
        )
        self.layer_norm_feats = nn.LayerNorm(name="layer_norm_feats")
        self.post_proj = nn.Dense(cfg.encoder_embed_dim, name="post_proj")
        self.mask_emb = self.param(
            "mask_emb",
            nn.initializers.uniform(scale=1.0),
            (cfg.encoder_embed_dim,),
        )
        self.context = _ContextNetwork(cfg, name="context")
        self.final_proj = nn.Dense(cfg.final_dim, name="final_proj")
        self.label_emb = self.param(
            "label_emb",
            nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.final_dim),
        )

    def __call__(
        self,
        wav: jnp.ndarray,  # [B, N]
        num_samples: jnp.ndarray,
        prev_output_tokens=None,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        feats = self.extractor(wav, train=train)
        lengths = extractor_output_lengths(cfg.conv_layers, num_samples)
        lengths = jnp.minimum(lengths, feats.shape[1])
        B, T, _ = feats.shape
        feats = self.layer_norm_feats(feats)
        x = self.post_proj(feats)
        if train:
            mask_rng = self.make_rng("dropout")
        else:
            mask_rng = jax.random.PRNGKey(0)
        mask = compute_span_mask(
            mask_rng, B, T, lengths, cfg.mask_prob, cfg.mask_length
        )
        x = jnp.where(mask[..., None], self.mask_emb[None, None].astype(x.dtype), x)
        padding_mask = jnp.arange(T)[None, :] < lengths[:, None]
        c = self.context(x, padding_mask, train)
        proj = self.final_proj(c)  # [B, T, F]
        emb = self.label_emb
        proj_n = proj / (jnp.linalg.norm(proj, axis=-1, keepdims=True) + 1e-8)
        emb_n = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-8)
        logits = (
            jnp.einsum("btf,vf->btv", proj_n, emb_n) / cfg.logit_temp
        )
        return {
            "logits": logits,  # [B, T, num_units]
            "mask": mask,
            "padding_mask": padding_mask,
            "lengths": lengths,
        }

    def encode(
        self, wav: jnp.ndarray, num_samples: jnp.ndarray, train: bool = False
    ) -> EncoderOut:
        feats = self.extractor(wav, train=train)
        lengths = extractor_output_lengths(self.cfg.conv_layers, num_samples)
        lengths = jnp.minimum(lengths, feats.shape[1])
        feats = self.layer_norm_feats(feats)
        x = self.post_proj(feats)
        T = x.shape[1]
        padding_mask = jnp.arange(T)[None, :] < lengths[:, None]
        c = self.context(x, padding_mask, train)
        return EncoderOut(
            encoder_out=c, encoder_padding_mask=padding_mask, src_lengths=lengths
        )


@register_architecture("wav2vec2", "wav2vec2_base")
def _arch_w2v_base(cfg: Wav2Vec2Config):
    pass  # defaults are the BASE config


@register_architecture("wav2vec2", "wav2vec2_large")
def _arch_w2v_large(cfg: Wav2Vec2Config):
    cfg.encoder_embed_dim = 1024
    cfg.encoder_ffn_dim = 4096
    cfg.encoder_layers = 24
    cfg.encoder_heads = 16
    cfg.extractor_mode = "layer_norm"
    cfg.final_dim = 768
    cfg.vq_dim = 768


@register_architecture("hubert", "hubert_base")
def _arch_hubert_base(cfg: HubertConfig):
    pass
