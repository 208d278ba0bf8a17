"""Model-interface contract checker over every registered model family
(reference tests/speech_recognition/asr_test_base.py: shape/type contracts of
encoder/decoder outputs enforced generically).

Contracts checked per model:
  * __call__ with the family's canonical batch runs and returns finite values
  * speech models: logits leading dims match (B, ...), vocab last
  * encode() (where present) returns EncoderOut with consistent
    [B, T', D] / [B, T'] / [B] shapes, mask rows matching src_lengths
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import espresso_tpu.models  # noqa: F401 (registration)
from espresso_tpu.models.base import EncoderOut
from espresso_tpu.registry import MODELS

V = 13
FEAT = 8
TINY_ENC = dict(
    feat_dim=FEAT,
    vocab_size=V,
    conv_channels=(4,),
    conv_kernel_sizes=((3, 3),),
    conv_strides=((2, 2),),
    encoder_embed_dim=16,
    encoder_ffn_dim=32,
    encoder_layers=2,
    encoder_heads=2,
    dropout=0.0,
)
TINY_W2V = dict(
    conv_layers=((8, 10, 5), (8, 3, 2)),
    encoder_embed_dim=16,
    encoder_ffn_dim=32,
    encoder_layers=2,
    encoder_heads=2,
    conv_pos=8,
    conv_pos_groups=2,
    dropout=0.0,
    final_dim=8,
    mask_length=3,
)


def _make(name):
    """(model, batch_kind) for each registry entry; batch_kind in
    {frames, waveform, tokens}."""
    from espresso_tpu.models.encoder_models import (
        LSTMEncoderModelConfig,
        TransformerEncoderModelConfig,
    )
    from espresso_tpu.models.lstm_lm import LSTMLMConfig
    from espresso_tpu.models.speech_lstm import SpeechLSTMConfig
    from espresso_tpu.models.speech_tdnn import SpeechTdnnConfig
    from espresso_tpu.models.speech_transformer import SpeechTransformerConfig
    from espresso_tpu.models.transducer import TransducerConfig
    from espresso_tpu.models.transformer_lm import TransformerLMConfig
    from espresso_tpu.models.wav2vec2 import (
        HubertConfig,
        Wav2Vec2Config,
        Wav2Vec2CtcConfig,
    )

    enc_cfg = SpeechTransformerConfig(**TINY_ENC)
    lstm_small = dict(
        feat_dim=FEAT,
        vocab_size=V,
        conv_channels=(4,),
        conv_kernel_sizes=((3, 3),),
        conv_strides=((2, 2),),
        encoder_hidden_size=12,
        encoder_layers=1,
        decoder_embed_dim=8,
        decoder_hidden_size=12,
        decoder_out_embed_dim=12,
        decoder_layers=1,
        attention_dim=12,
        dropout=0.0,
    )
    table = {
        "speech_lstm": (SpeechLSTMConfig(**lstm_small), "frames"),
        "speech_transformer": (
            SpeechTransformerConfig(
                **TINY_ENC,
                decoder_embed_dim=16,
                decoder_ffn_dim=32,
                decoder_layers=1,
                decoder_heads=2,
            ),
            "frames",
        ),
        "speech_transformer_transducer": (
            TransducerConfig(
                feat_dim=FEAT,
                vocab_size=V,
                encoder=enc_cfg,
                pred_embed_dim=8,
                pred_hidden_size=12,
                pred_layers=1,
                pred_dropout=0.0,
                joint_dim=12,
            ),
            "frames",
        ),
        "speech_tdnn": (
            SpeechTdnnConfig(
                feat_dim=FEAT,
                vocab_size=V,
                hidden_sizes=(16, 16),
                kernel_sizes=(3, 3),
                strides=(1, 1),
                dilations=(1, 2),
                dropout=0.0,
            ),
            "frames",
        ),
        "speech_transformer_encoder_model": (
            TransformerEncoderModelConfig(
                feat_dim=FEAT, vocab_size=V, encoder=enc_cfg
            ),
            "frames",
        ),
        "speech_lstm_encoder_model": (
            LSTMEncoderModelConfig(
                feat_dim=FEAT,
                vocab_size=V,
                encoder=SpeechLSTMConfig(**lstm_small),
            ),
            "frames",
        ),
        "lstm_lm_espresso": (
            LSTMLMConfig(
                vocab_size=V,
                embed_dim=8,
                hidden_size=12,
                out_embed_dim=12,
                num_layers=1,
                dropout=0.0,
            ),
            "tokens",
        ),
        "transformer_lm": (
            TransformerLMConfig(
                vocab_size=V,
                embed_dim=16,
                ffn_dim=32,
                layers=1,
                heads=2,
                dropout=0.0,
            ),
            "tokens",
        ),
        "wav2vec2": (
            Wav2Vec2Config(
                **TINY_W2V,
                quantizer_entries=5,
                vq_dim=8,
                num_negatives=2,
            ),
            "waveform",
        ),
        "wav2vec2_ctc": (
            Wav2Vec2CtcConfig(
                vocab_size=V,
                w2v=Wav2Vec2Config(
                    **TINY_W2V, quantizer_entries=5, vq_dim=8, num_negatives=2
                ),
            ),
            "waveform",
        ),
        "hubert": (HubertConfig(vocab_size=V, **TINY_W2V), "waveform"),
    }
    cfg, kind = table[name]
    return MODELS.build(name, cfg), kind


@pytest.mark.parametrize("name", [
    "speech_lstm",
    "speech_transformer",
    "speech_transformer_transducer",
    "speech_tdnn",
    "speech_transformer_encoder_model",
    "speech_lstm_encoder_model",
    "lstm_lm_espresso",
    "transformer_lm",
    "wav2vec2",
    "wav2vec2_ctc",
    "hubert",
])
def test_model_contract(name):
    assert name in MODELS, f"{name} not registered"
    model, kind = _make(name)
    rng = np.random.default_rng(0)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    B = 2
    if kind == "tokens":
        tokens = jnp.asarray(rng.integers(2, V, (B, 5)), jnp.int32)
        variables = model.init(rngs, tokens)
        out = model.apply(variables, tokens)
        assert out.shape[:2] == (B, 5) and out.shape[-1] == V
        assert np.isfinite(np.asarray(out)).all()
        return
    if kind == "waveform":
        src = jnp.asarray(rng.standard_normal((B, 400)), jnp.float32)
        lengths = jnp.asarray([400, 300])
    else:
        src = jnp.asarray(rng.standard_normal((B, 20, FEAT)), jnp.float32)
        lengths = jnp.asarray([20, 14])
    prev = jnp.asarray(rng.integers(2, V, (B, 4)), jnp.int32)
    variables = model.init(rngs, src, lengths, prev)
    out = model.apply(variables, src, lengths, prev)
    if isinstance(out, tuple):
        logits = out[0]
        assert logits.shape[0] == B and logits.shape[-1] == V
        assert np.isfinite(np.asarray(logits)).all()
    elif isinstance(out, dict):
        # wav2vec2 contrastive logits: row 0 is the positive (must be
        # finite); negative rows may be exactly -inf where the sampled
        # negative's quantized vector collides with the positive (the
        # reference's neg_is_pos masking, fairseq wav2vec2.py:544-560)
        logits = np.asarray(out["logits"])
        assert not np.isnan(logits).any()
        assert np.isfinite(logits[..., 0]).all()
    # encode() contract
    if hasattr(model, "encode"):
        enc = model.apply(variables, src, lengths, method="encode")
        assert isinstance(enc, EncoderOut)
        Bo, Tp, D = enc.encoder_out.shape
        assert Bo == B
        assert enc.encoder_padding_mask.shape == (B, Tp)
        assert enc.src_lengths.shape == (B,)
        mask_rows = np.asarray(enc.encoder_padding_mask).sum(axis=1)
        np.testing.assert_array_equal(mask_rows, np.asarray(enc.src_lengths))
        # monotone: shorter input -> no longer output
        assert int(enc.src_lengths[1]) <= int(enc.src_lengths[0])
