"""Speech Transformer / Conformer encoder-decoder (``speech_transformer``).

Rebuild of espresso/models/transformer/ (speech_transformer_base.py:28,
speech_transformer_encoder.py:44, speech_transformer_decoder.py:43):

  * Encoder: ConvFrontend subsampling → fc0 input projection (:79) →
    absolute sinusoidal or relative positional embeddings (:95-158) →
    N layers of type ``transformer`` or ``conformer`` (:196-201), with
    chunk-streaming attention masks (:226-263 → ops.masking) and limited
    left/right context windows.
  * Decoder: pre-norm causal transformer with cross-attention; incremental
    decoding via explicit per-layer cache pytrees (self k/v ring + static
    encoder k/v) usable inside lax.while_loop beam search.
  * Encoder-only variant for CTC/hybrid heads is in
    ``speech_transformer_encoder_model`` style: set ``decoder_layers=0`` and
    use ``encode`` + an output head.

Named architectures speech_transformer_{wsj,librispeech,swbd}
(speech_transformer_legacy.py:180-210).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from espresso_tpu.models.base import EncoderOut
from espresso_tpu.modules.attention import MultiheadAttention
from espresso_tpu.modules.base_layer import BaseLayer
from espresso_tpu.modules.conformer import (
    ConformerEncoderLayer,
    TransformerEncoderLayer,
)
from espresso_tpu.modules.conv_frontend import ConvFrontend
from espresso_tpu.modules.positional import (
    RelativePositionalEmbedding,
    sinusoidal_positions,
)
from espresso_tpu.ops.masking import NEG_INF, chunk_streaming_mask, limited_context_mask
from espresso_tpu.registry import MODELS, register_architecture


@dataclass
class SpeechTransformerConfig:
    name: str = "speech_transformer"
    feat_dim: int = 80
    vocab_size: int = 0
    # conv front-end
    conv_channels: Tuple[int, ...] = (64, 64, 128, 128)
    conv_kernel_sizes: Tuple[Tuple[int, int], ...] = ((3, 3),) * 4
    conv_strides: Tuple[Tuple[int, int], ...] = ((1, 1), (2, 2), (1, 1), (2, 2))
    conv_norm_type: str = "batch"
    # encoder
    encoder_embed_dim: int = 256
    encoder_ffn_dim: int = 1024
    encoder_layers: int = 12
    encoder_heads: int = 4
    encoder_layer_type: str = "transformer"  # transformer | conformer
    encoder_pos_type: str = "abs"  # abs | relative | rotary | none
    encoder_relative_max_size: int = 1024
    encoder_learned_pos: bool = False
    depthwise_conv_kernel_size: int = 31
    conformer_norm_type: str = "batch"
    # streaming / limited context (speech_transformer_encoder.py:226-263)
    chunk_size: int = 0
    chunk_left_window: int = 0
    chunk_right_window: int = 0
    context_left: int = -1  # -1 = unlimited
    context_right: int = -1
    # rematerialize encoder layers in the backward pass (activation
    # checkpointing; reference checkpoint_activations wrapper,
    # speech_transformer_encoder.py:205-208)
    remat: bool = False
    # LayerDrop (fairseq/modules/layer_drop.py; Fan et al. 2019): each layer
    # is skipped with this probability during training. Under jit the layer
    # still computes and its output is gated (static graph) — the
    # regularization is identical, only the torch-side compute saving is not
    # replicated (irrelevant on TPU: dynamic graphs would force recompiles)
    encoder_layerdrop: float = 0.0
    decoder_layerdrop: float = 0.0
    # decoder
    decoder_embed_dim: int = 256
    decoder_ffn_dim: int = 1024
    decoder_layers: int = 6
    decoder_heads: int = 4
    decoder_learned_pos: bool = False
    share_decoder_input_output_embed: bool = True
    max_target_positions: int = 1024
    # BASE MoE layers interleaved among decoder layers (reference
    # --base-layers/--base-sublayers/--base-shuffle, fairseq BaseLayer);
    # experts shard over the 'model' mesh axis (expert parallelism)
    base_layers: int = 0
    base_experts: int = 4
    base_sublayers: int = 1
    base_shuffle: bool = True
    dropout: float = 0.1
    pad_index: int = 1
    # GPipe pipeline parallelism over the 'stage' mesh axis: encoder layers
    # are stacked (leading layer axis, sharded on 'stage') and scheduled
    # with parallel/pipeline.gpipe. Set by the train CLI from
    # distributed.pipeline_parallel_size.
    pipeline_stages: int = 1
    pipeline_microbatches: int = 4
    # sequence parallelism: constrain encoder activations to shard the time
    # axis over the 'model' mesh axis at layer boundaries (Megatron-SP
    # residual/LN regions); GSPMD inserts the all-gather/reduce-scatter
    # pairs around attention/FFN. Set by the train CLI from
    # distributed.sequence_parallel.
    sequence_parallel: bool = False


class _PipeLayerBody(nn.Module):
    """One homogeneous encoder layer, wrapped into nn.scan's
    (carry, ...) -> (carry, None) shape so pipeline configs materialize
    their parameters with a stacked leading layer axis."""

    cfg: SpeechTransformerConfig

    @nn.compact
    def __call__(self, x, padding_mask, attn_mask, rel_pos, train):
        cfg = self.cfg
        x = _make_encoder_layer(cfg, name="layer")(
            x, padding_mask, attn_mask, rel_pos, train
        )
        return x, None


def _make_encoder_layer(cfg: SpeechTransformerConfig, name: str):
    if cfg.encoder_layer_type == "conformer":
        return ConformerEncoderLayer(
            cfg.encoder_embed_dim,
            cfg.encoder_ffn_dim,
            cfg.encoder_heads,
            depthwise_kernel_size=cfg.depthwise_conv_kernel_size,
            dropout=cfg.dropout,
            use_relative_pos=cfg.encoder_pos_type == "relative",
            use_rotary=cfg.encoder_pos_type == "rotary",
            conv_norm_type=cfg.conformer_norm_type,
            name=name,
        )
    return TransformerEncoderLayer(
        cfg.encoder_embed_dim,
        cfg.encoder_ffn_dim,
        cfg.encoder_heads,
        dropout=cfg.dropout,
        use_relative_pos=cfg.encoder_pos_type == "relative",
        use_rotary=cfg.encoder_pos_type == "rotary",
        name=name,
    )


class SpeechTransformerEncoder(nn.Module):
    cfg: SpeechTransformerConfig

    @nn.compact
    def __call__(
        self,
        src_frames: jnp.ndarray,
        src_lengths: jnp.ndarray,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> EncoderOut:
        cfg = self.cfg
        x, lengths = ConvFrontend(
            out_channels=cfg.conv_channels,
            kernel_sizes=cfg.conv_kernel_sizes,
            strides=cfg.conv_strides,
            norm_type=cfg.conv_norm_type,
            name="conv",
        )(src_frames, src_lengths, train=train)
        x = nn.Dense(cfg.encoder_embed_dim, name="fc0")(x)  # reference :79
        T = x.shape[1]
        # no embed_scale: the reference forces embed_scale=1.0 whenever fc0
        # is present (speech_transformer_encoder.py:81-86), and our fc0 is
        # unconditional — scaling here would break checkpoint-conversion
        # parity (tests/test_convert.py full-model logits test)
        rel_pos = None
        if cfg.encoder_pos_type == "abs":
            x = x + sinusoidal_positions(T, cfg.encoder_embed_dim).astype(x.dtype)
        elif cfg.encoder_pos_type == "relative":
            rel_pos = RelativePositionalEmbedding(
                cfg.encoder_embed_dim,
                max_size=cfg.encoder_relative_max_size,
                learned=cfg.encoder_learned_pos,
                name="rel_pos",
            )(T).astype(x.dtype)
        if cfg.dropout > 0.0 and train:
            x = nn.Dropout(rate=cfg.dropout)(x, deterministic=False)

        padding_mask = jnp.arange(T)[None, :] < lengths[:, None]
        attn_mask = None
        if cfg.chunk_size > 0:
            attn_mask = chunk_streaming_mask(
                T,
                cfg.chunk_size,
                cfg.chunk_left_window,
                cfg.chunk_right_window,
                rng=rng if train else None,
            )
        elif cfg.context_left >= 0 or cfg.context_right >= 0:
            attn_mask = limited_context_mask(
                T,
                cfg.context_left if cfg.context_left >= 0 else None,
                cfg.context_right if cfg.context_right >= 0 else None,
            )

        if cfg.pipeline_stages > 1:
            x = self._pipelined_layers(
                x, padding_mask, attn_mask, rel_pos, train
            )
            x = nn.LayerNorm(name="final_norm")(x)
            return EncoderOut(
                encoder_out=x,
                encoder_padding_mask=padding_mask,
                src_lengths=lengths,
            )

        seq_constraint = None
        if cfg.sequence_parallel:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from espresso_tpu.parallel.mesh import get_global_mesh

            seq_constraint = NamedSharding(
                get_global_mesh(), P("data", "model", None)
            )
            x = jax.lax.with_sharding_constraint(x, seq_constraint)

        conformer_cls = ConformerEncoderLayer
        transformer_cls = TransformerEncoderLayer
        if cfg.remat:
            conformer_cls = nn.remat(ConformerEncoderLayer, static_argnums=(5,))
            transformer_cls = nn.remat(TransformerEncoderLayer, static_argnums=(5,))
        for i in range(cfg.encoder_layers):
            x_in = x
            if cfg.encoder_layer_type == "conformer":
                x = conformer_cls(
                    cfg.encoder_embed_dim,
                    cfg.encoder_ffn_dim,
                    cfg.encoder_heads,
                    depthwise_kernel_size=cfg.depthwise_conv_kernel_size,
                    dropout=cfg.dropout,
                    use_relative_pos=cfg.encoder_pos_type == "relative",
                    use_rotary=cfg.encoder_pos_type == "rotary",
                    conv_norm_type=cfg.conformer_norm_type,
                    name=f"layer{i}",
                )(x, padding_mask, attn_mask, rel_pos, train)
            else:
                x = transformer_cls(
                    cfg.encoder_embed_dim,
                    cfg.encoder_ffn_dim,
                    cfg.encoder_heads,
                    dropout=cfg.dropout,
                    use_relative_pos=cfg.encoder_pos_type == "relative",
                    use_rotary=cfg.encoder_pos_type == "rotary",
                    name=f"layer{i}",
                )(x, padding_mask, attn_mask, rel_pos, train)
            if cfg.encoder_layerdrop > 0.0 and train:
                keep = jax.random.bernoulli(
                    jax.random.fold_in(self.make_rng("dropout"), i),
                    1.0 - cfg.encoder_layerdrop,
                )
                x = jnp.where(keep, x, x_in)
            if seq_constraint is not None:
                # re-anchor the sequence sharding at each residual boundary
                x = jax.lax.with_sharding_constraint(x, seq_constraint)
        x = nn.LayerNorm(name="final_norm")(x)
        return EncoderOut(
            encoder_out=x, encoder_padding_mask=padding_mask, src_lengths=lengths
        )

    def _pipelined_layers(self, x, padding_mask, attn_mask, rel_pos, train):
        """GPipe schedule over the 'stage' mesh axis: params materialize
        via nn.scan (stacked [L, ...]); at apply time the stack runs through
        parallel/pipeline.gpipe with microbatches (reference
        fairseq/model_parallel pipeline transformer, re-designed TPU-first:
        shard_map + ppermute instead of torch Pipe)."""
        cfg = self.cfg
        L, S = cfg.encoder_layers, cfg.pipeline_stages
        assert L % S == 0, (L, S)
        if cfg.encoder_layer_type == "conformer":
            assert cfg.conformer_norm_type != "batch", (
                "pipelined conformer needs conformer_norm_type=layer"
                " (batch stats don't ride the pipeline)"
            )
        ScanLayers = nn.scan(
            _PipeLayerBody,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(nn.broadcast,) * 4,
            length=L,
        )
        if self.is_initializing():
            x, _ = ScanLayers(cfg, name="pipe_layers")(
                x, padding_mask, attn_mask, rel_pos, train
            )
            return x
        from espresso_tpu.parallel.mesh import get_global_mesh
        from espresso_tpu.parallel.pipeline import gpipe

        mesh = get_global_mesh()
        stacked = self.variables["params"]["pipe_layers"]
        per_stage = jax.tree_util.tree_map(
            lambda a: a.reshape(S, L // S, *a.shape[1:]), stacked
        )
        use_dropout = train and cfg.dropout > 0.0 and self.has_rng("dropout")
        base_key = self.make_rng("dropout") if use_dropout else None
        layer_mod = _make_encoder_layer(cfg, name=None)
        B = x.shape[0]
        M = min(cfg.pipeline_microbatches, B)
        while B % M != 0:
            M -= 1
        mb_idx = jnp.repeat(jnp.arange(M, dtype=jnp.int32), B // M)

        def stage_fn(p_stage, payload, const):
            xx, pm, idx = payload
            a_mask, rp, key = const
            s = jax.lax.axis_index("stage")
            for j in range(L // S):
                p_j = jax.tree_util.tree_map(lambda a: a[j], p_stage)
                rngs = None
                if key is not None:
                    k = jax.random.fold_in(key, s * 8191 + j)
                    rngs = {"dropout": jax.random.fold_in(k, idx[0])}
                xx = layer_mod.apply(
                    {"params": p_j["layer"]},
                    xx,
                    pm,
                    a_mask,
                    rp,
                    train,
                    rngs=rngs,
                )
            return xx, pm, idx

        out, _, _ = gpipe(
            stage_fn,
            per_stage,
            (x, padding_mask, mb_idx),
            num_microbatches=M,
            mesh=mesh,
            const=(attn_mask, rel_pos, base_key),
        )
        return out


class TransformerDecoderLayer(nn.Module):
    embed_dim: int
    ffn_dim: int
    num_heads: int
    dropout: float = 0.0

    def setup(self):
        self.self_attn = MultiheadAttention(
            self.embed_dim, self.num_heads, dropout=self.dropout
        )
        self.cross_attn = MultiheadAttention(
            self.embed_dim, self.num_heads, dropout=self.dropout
        )
        self.self_attn_layer_norm = nn.LayerNorm()
        self.cross_attn_layer_norm = nn.LayerNorm()
        self.final_layer_norm = nn.LayerNorm()
        self.fc1 = nn.Dense(self.ffn_dim)
        self.fc2 = nn.Dense(self.embed_dim)

    def __call__(
        self,
        x: jnp.ndarray,
        enc_out: jnp.ndarray,
        enc_mask: jnp.ndarray,
        self_attn_mask: Optional[jnp.ndarray] = None,
        cache: Optional[Dict[str, Any]] = None,
        cache_index: Optional[jnp.ndarray] = None,
        train: bool = False,
    ):
        deterministic = not train
        h = self.self_attn_layer_norm(x)
        h, _, new_self_cache = self.self_attn(
            h,
            h,
            h,
            attn_mask=self_attn_mask,
            cache=cache.get("self") if cache else None,
            cache_index=cache_index,
            deterministic=deterministic,
        )
        x = x + h
        h = self.cross_attn_layer_norm(x)
        if cache is not None and "cross" in cache:
            h, attn, _ = self.cross_attn(
                h,
                enc_out,
                enc_out,
                key_padding_mask=enc_mask,
                cache=cache["cross"],
                deterministic=deterministic,
                need_weights=True,
            )
        else:
            h, attn, _ = self.cross_attn(
                h,
                enc_out,
                enc_out,
                key_padding_mask=enc_mask,
                deterministic=deterministic,
                need_weights=True,
            )
        x = x + h
        h = self.final_layer_norm(x)
        h = self.fc2(nn.relu(self.fc1(h)))
        x = x + h
        new_cache = None
        if cache is not None:
            new_cache = dict(cache)
            if new_self_cache is not None:
                new_cache["self"] = new_self_cache
        return x, attn, new_cache

    def make_cache(self, B: int, max_len: int, enc_out: jnp.ndarray):
        Dh = self.embed_dim // self.num_heads
        return {
            "self": {
                "k": jnp.zeros((B, max_len, self.num_heads, Dh), enc_out.dtype),
                "v": jnp.zeros((B, max_len, self.num_heads, Dh), enc_out.dtype),
            },
            "cross": self.cross_attn.make_cross_attention_cache(enc_out),
        }


@MODELS.register("speech_transformer", config=SpeechTransformerConfig)
class SpeechTransformerModel(nn.Module):
    cfg: SpeechTransformerConfig

    def setup(self):
        cfg = self.cfg
        self.encoder = SpeechTransformerEncoder(cfg, name="encoder")
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, cfg.decoder_embed_dim, name="embed_tokens"
        )
        self.decoder_layers_list = [
            TransformerDecoderLayer(
                cfg.decoder_embed_dim,
                cfg.decoder_ffn_dim,
                cfg.decoder_heads,
                dropout=cfg.dropout,
                name=f"declayer{i}",
            )
            for i in range(cfg.decoder_layers)
        ]
        # BASE MoE layers at reference positions (i+1)·L/(B+1) — applied
        # after the decoder layer with that 1-based index
        self.base_positions = tuple(
            (i + 1) * cfg.decoder_layers // (cfg.base_layers + 1)
            for i in range(cfg.base_layers)
        )
        self.base_layers_list = [
            BaseLayer(
                embed_dim=cfg.decoder_embed_dim,
                ffn_dim=cfg.decoder_ffn_dim,
                num_experts=cfg.base_experts,
                sublayers=cfg.base_sublayers,
                shuffle=cfg.base_shuffle,
                name=f"base{i}",
            )
            for i in range(cfg.base_layers)
        ]
        self.decoder_norm = nn.LayerNorm(name="decoder_norm")
        self.drop_dec = nn.Dropout(rate=cfg.dropout)
        if not cfg.share_decoder_input_output_embed:
            self.fc_out = nn.Dense(cfg.vocab_size, name="fc_out")

    # -- training forward ----------------------------------------------------
    def __call__(
        self,
        src_frames: jnp.ndarray,
        src_lengths: jnp.ndarray,
        prev_output_tokens: jnp.ndarray,
        train: bool = False,
        ss_prob: float = 1.0,  # unused (parity arg)
    ) -> Tuple[jnp.ndarray, EncoderOut]:
        enc = self.encoder(src_frames, src_lengths, train=train)
        logits = self.decode_sequence(prev_output_tokens, enc, train=train)
        return logits, enc

    def encode(self, src_frames, src_lengths, train: bool = False) -> EncoderOut:
        return self.encoder(src_frames, src_lengths, train=train)

    def decode_sequence(
        self, prev_output_tokens: jnp.ndarray, enc: EncoderOut, train: bool = False
    ) -> jnp.ndarray:
        cfg = self.cfg
        B, U = prev_output_tokens.shape
        x = self.embed_tokens(prev_output_tokens) * (cfg.decoder_embed_dim ** 0.5)
        x = x + sinusoidal_positions(U, cfg.decoder_embed_dim).astype(x.dtype)
        if cfg.dropout > 0.0 and train:
            x = self.drop_dec(x, deterministic=False)
        causal = jnp.where(
            jnp.tril(jnp.ones((U, U), bool)), 0.0, NEG_INF
        ).astype(jnp.float32)
        for j, layer in enumerate(self.decoder_layers_list):
            x_in = x
            x, _, _ = layer(
                x,
                enc.encoder_out,
                enc.encoder_padding_mask,
                self_attn_mask=causal,
                train=train,
            )
            if cfg.decoder_layerdrop > 0.0 and train:
                keep = jax.random.bernoulli(
                    jax.random.fold_in(self.make_rng("dropout"), 1000 + j),
                    1.0 - cfg.decoder_layerdrop,
                )
                x = jnp.where(keep, x, x_in)
            for b, pos in enumerate(self.base_positions):
                if pos == j + 1:
                    x = self.base_layers_list[b](x, train=train)
        x = self.decoder_norm(x)
        return self.output_projection(x)

    def output_projection(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.cfg.share_decoder_input_output_embed:
            return self.embed_tokens.attend(x)
        return self.fc_out(x)

    # -- incremental decoding --------------------------------------------------
    def init_cache(self, enc: EncoderOut, max_len: int) -> List[Dict[str, Any]]:
        B = enc.encoder_out.shape[0]
        return [
            layer.make_cache(B, max_len, enc.encoder_out)
            for layer in self.decoder_layers_list
        ]

    def decode_step(
        self,
        tokens: jnp.ndarray,  # [B]
        step_index: jnp.ndarray,  # scalar int
        cache: List[Dict[str, Any]],
        enc: EncoderOut,
    ):
        cfg = self.cfg
        B = tokens.shape[0]
        x = self.embed_tokens(tokens)[:, None, :] * (cfg.decoder_embed_dim ** 0.5)
        pos_table = sinusoidal_positions(
            cfg.max_target_positions, cfg.decoder_embed_dim
        )
        x = x + jax.lax.dynamic_slice(
            pos_table, (step_index, 0), (1, cfg.decoder_embed_dim)
        )[None].astype(x.dtype)
        new_cache = []
        attn = None
        for j, (layer, layer_cache) in enumerate(
            zip(self.decoder_layers_list, cache)
        ):
            x, attn, updated = layer(
                x,
                enc.encoder_out,
                enc.encoder_padding_mask,
                cache=layer_cache,
                cache_index=step_index,
            )
            new_cache.append(updated)
            for b, pos in enumerate(self.base_positions):
                if pos == j + 1:
                    # greedy per-token routing at decode time (stateless)
                    x = self.base_layers_list[b](x, train=False)
        x = self.decoder_norm(x)
        logits = self.output_projection(x)[:, 0]
        return logits, new_cache, (attn[:, 0] if attn is not None else None)


# -- named architectures (speech_transformer_legacy.py:180-210) ---------------


@register_architecture("speech_transformer", "speech_transformer_wsj")
def _arch_st_wsj(cfg: SpeechTransformerConfig):
    pass  # base defaults match wsj


@register_architecture("speech_transformer", "speech_transformer_librispeech")
def _arch_st_librispeech(cfg: SpeechTransformerConfig):
    cfg.encoder_embed_dim = 512
    cfg.encoder_ffn_dim = 2048
    cfg.encoder_layers = 12
    cfg.encoder_heads = 8
    cfg.decoder_embed_dim = 512
    cfg.decoder_ffn_dim = 2048
    cfg.decoder_layers = 6
    cfg.decoder_heads = 8
    cfg.dropout = 0.1


@register_architecture("speech_transformer", "speech_transformer_swbd")
def _arch_st_swbd(cfg: SpeechTransformerConfig):
    cfg.encoder_embed_dim = 512
    cfg.encoder_ffn_dim = 2048
    cfg.encoder_layers = 12
    cfg.encoder_heads = 8
    cfg.decoder_embed_dim = 512
    cfg.decoder_ffn_dim = 2048
    cfg.decoder_layers = 6
    cfg.decoder_heads = 8
    cfg.dropout = 0.15
